"""Routing-partitioned index (ES _routing): bucket math, routed build,
pruned routed search, and the I/O-isolation proof."""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores
from splade_ray.corpus import synth_corpus
from splade_ray.routing import (
    build_routed_index,
    load_routing,
    routed_search,
    routing_bucket,
)

N = 150
NB = 6


def _routes() -> list[str]:
    return [f"tenant{i % 9}" for i in range(N)]


@pytest.fixture()
def routed(ray_session, tmp_path):
    t = synth_corpus(N, seed=55)
    texts = t["content"].to_pylist()
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N, dtype=np.int64)),
                "content": t["content"],
                "tenant": pa.array(_routes(), pa.string()),
            }
        ),
        corpus,
    )
    root = str(tmp_path / "routed")
    build_routed_index(
        corpus, root, routing_col="tenant", n_buckets=NB,
        text_col="content", id_col="doc_id", rows_per_segment=20,
    )
    return root, texts


def _brute_run(doc_ids, texts, queries, p):
    """BM25 over the given subcorpus under its own stats."""
    n = len(doc_ids)
    lens = np.array([len(t.split()) for t in texts], np.float64)
    # use term_counts for exact analyzer parity
    tcs = [term_counts(t) for t in texts]
    lens = np.array([sum(c.values()) for c in tcs], np.float64)
    avgdl = lens.sum() / n
    rows = []
    for qid, qtext in queries:
        scores = np.zeros(n, np.float64)
        q = term_counts(qtext)
        for term in sorted(q):
            pos = np.array([i for i, c in enumerate(tcs) if term in c], np.int64)
            if pos.size == 0:
                continue
            tf = np.array([tcs[i][term] for i in pos], np.float64)
            w = idf(pos.size, n) * q[term]
            scores[pos] += w * tf_component(tf, lens[pos], avgdl, p)
        docs, scs = topk_from_scores(np.asarray(doc_ids, np.int64), scores,
                                     p.top_k, p.threshold)
        rows.extend(
            (qid, r + 1, int(d), float(s))
            for r, (d, s) in enumerate(zip(docs, scs))
        )
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


QUERIES = [(1, "def parse merge"), (2, "return x1")]


def test_routing_bucket_deterministic():
    b1 = routing_bucket(["a", "b", "a"], 16)
    b2 = routing_bucket(["a", "b", "a"], 16)
    assert (b1 == b2).all() and b1[0] == b1[2]
    assert set(routing_bucket([f"k{i}" for i in range(100)], 4)) <= set(range(4))


def test_routed_search_matches_bruteforce_subcorpus(routed):
    root, texts = routed
    routes = np.array(_routes())
    p = BM25Params(top_k=8)
    routing = ["tenant3", "tenant7"]
    got = routed_search(root, QUERIES, p, routing=routing)
    # probed scope = all docs whose tenant hashes into the probed buckets
    probed = set(routing_bucket(routing, NB).tolist())
    in_scope = np.flatnonzero(
        np.isin(routing_bucket(routes, NB), list(probed))
    )
    want = _brute_run(in_scope, [texts[i] for i in in_scope], QUERIES, p)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-12
    )
    # same-bucket docs with a DIFFERENT routing value are visible (ES
    # semantics: routing selects buckets, it does not filter docs)
    assert in_scope.size > (routes == "tenant3").sum() + (routes == "tenant7").sum() - 1


def test_routed_search_unrouted_covers_corpus(routed):
    root, texts = routed
    p = BM25Params(top_k=8)
    got = routed_search(root, QUERIES, p, routing=None)
    want = _brute_run(np.arange(N), texts, QUERIES, p)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-12
    )


def test_routed_search_reads_only_probed_buckets(routed, tmp_path):
    """I/O isolation: destroy every unprobed bucket's index; the routed
    query must still answer (it never opens them)."""
    root, texts = routed
    p = BM25Params(top_k=5)
    routing = ["tenant3"]
    before = routed_search(root, QUERIES, p, routing=routing)
    probed = set(routing_bucket(routing, NB).tolist())
    for b in load_routing(root)["buckets"]:
        if b not in probed:
            shutil.rmtree(f"{root}/bucket={b:05d}")
    after = routed_search(root, QUERIES, p, routing=routing)
    pd.testing.assert_frame_equal(before, after)
    assert (before["bucket"].isin(list(probed))).all()


def test_maintain_routed_compacts_buckets_preserving_results(routed):
    from splade_ray.routing import load_routing, maintain_routed

    root, texts = routed
    p = BM25Params(top_k=6)
    before = routed_search(root, QUERIES, p, routing=None)
    rep = maintain_routed(root, max_segments=1)
    import os

    from splade_ray.build import load_manifest

    for b in load_routing(root)["buckets"]:
        m = load_manifest(os.path.join(root, f"bucket={b:05d}", "index"))
        assert m["n_segments"] == 1, (b, rep[b])
    after = routed_search(root, QUERIES, p, routing=None)
    pd.testing.assert_frame_equal(before, after)
