"""Dirichlet query-likelihood similarity tests: scalar parity, BMW/auto
routing, quantized rejection, CLI."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts, tokenize
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.query import search

N = 120
MU = 500.0


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=11)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(np.arange(N, dtype=np.int64)), "content": t["content"]}
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id", rows_per_segment=30)
    return index_dir, t["content"].to_pylist()


def _scalar_ql(texts, queries, mu, top_k):
    """Scalar QL: per matching term qtf*max(0, ln(1+tf/(mu*cf/C)) +
    ln(mu/(dl+mu))); score desc, doc_id asc; score > 0."""
    toks = [tokenize(t or "") for t in texts]
    c_total = sum(len(t) for t in toks)
    cf = Counter(t for tt in toks for t in tt)
    rows = []
    for qid, qtext in queries:
        q = term_counts(qtext)
        scored = []
        for did, tt in enumerate(toks):
            tc = Counter(tt)
            s = 0.0
            for term in sorted(q):
                tf = tc.get(term, 0)
                if tf == 0 or term not in cf:
                    continue
                contrib = math.log1p(tf / (mu * cf[term] / c_total)) + math.log(
                    mu / (len(tt) + mu)
                )
                s += q[term] * max(0.0, contrib)
            if s > 0:
                scored.append((did, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(scored[:top_k], start=1):
            rows.append((qid, r, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def test_ql_matches_scalar(built):
    index_dir, texts = built
    queries = [(1, texts[3][:50]), (2, texts[70][:40]), (3, "def parse merge")]
    run = search(index_dir, queries, BM25Params(top_k=8), scoring="ql", mu=MU)
    want = _scalar_ql(texts, queries, MU, 8)
    assert run["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        run["score"].to_numpy(np.float64), want["score"].to_numpy(np.float64),
        rtol=1e-12,
    )


def test_ql_bmw_auto_route_to_exact(built):
    index_dir, texts = built
    queries = [(1, "def parse merge"), (2, texts[50][:40])]
    base = search(index_dir, queries, BM25Params(top_k=10), scoring="ql", mu=MU)
    for method in ("bmw", "auto"):
        got = search(
            index_dir, queries, BM25Params(top_k=10), method=method,
            scoring="ql", mu=MU,
        )
        pd.testing.assert_frame_equal(got.reset_index(drop=True), base.reset_index(drop=True))


def test_ql_rejects_quantized(built):
    index_dir, _ = built
    with pytest.raises(ValueError, match="quantized"):
        search(index_dir, [(1, "def")], BM25Params(), method="quantized", scoring="ql")


def test_ql_ranks_differ_from_bm25_somewhere(built):
    # sanity: the similarity actually changes the scoring function
    index_dir, texts = built
    queries = [(i, texts[i * 7][:60]) for i in range(1, 10)]
    a = search(index_dir, queries, BM25Params(top_k=10), scoring="bm25")
    b = search(index_dir, queries, BM25Params(top_k=10), scoring="ql", mu=MU)
    assert not a["score"].equals(b["score"])


def test_cli_query_ql(built, tmp_path, capsys):
    from splade_ray.cli import main

    index_dir, texts = built
    qf = tmp_path / "q.tsv"
    qf.write_text("1\tdef parse merge\n")
    out = str(tmp_path / "run.parquet")
    rc = main(["query", "--index", index_dir, "--queries", str(qf), "--out", out,
               "--scoring", "ql", "--mu", str(MU), "--method", "exact"])
    assert rc == 0
    got = pd.read_parquet(out)
    want = search(index_dir, [(1, "def parse merge")], BM25Params(top_k=10),
                  scoring="ql", mu=MU)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


# --------------------------------------------------------------------------
# search_after pagination (shares the fixture)
# --------------------------------------------------------------------------


def test_search_after_pages_tile_topk(built):
    index_dir, texts = built
    queries = [(1, texts[3][:60]), (2, texts[70][:50])]
    full = search(index_dir, queries, BM25Params(top_k=20))
    p1 = search(index_dir, queries, BM25Params(top_k=5))
    cursor = {
        int(q): (float(g["score"].iloc[-1]), int(g["doc_id"].iloc[-1]))
        for q, g in p1.groupby("query_id")
    }
    p2 = search(index_dir, queries, BM25Params(top_k=5), after=cursor)
    for qid in (1, 2):
        f = full[full["query_id"] == qid]
        a = p1[p1["query_id"] == qid]["doc_id"].tolist()
        b = p2[p2["query_id"] == qid]["doc_id"].tolist()
        assert a + b == f["doc_id"].tolist()[: len(a) + len(b)]
        assert p2[p2["query_id"] == qid]["rank"].tolist() == list(range(1, len(b) + 1))


def test_search_after_methods_agree(built):
    index_dir, texts = built
    queries = [(1, "def parse merge")]
    p1 = search(index_dir, queries, BM25Params(top_k=4))
    cursor = {1: (float(p1["score"].iloc[-1]), int(p1["doc_id"].iloc[-1]))}
    base = search(index_dir, queries, BM25Params(top_k=4), after=cursor)
    for method in ("bmw", "auto"):
        got = search(index_dir, queries, BM25Params(top_k=4), method=method, after=cursor)
        pd.testing.assert_frame_equal(got.reset_index(drop=True), base.reset_index(drop=True))


def test_search_after_rejects_quantized(built):
    index_dir, _ = built
    with pytest.raises(ValueError, match="search_after"):
        search(index_dir, [(1, "def")], BM25Params(), method="quantized",
               after={1: (1.0, 0)})


def test_searcher_and_router_support_ql_and_after(built):
    import ray

    from splade_ray.query import QueryRouter, Searcher, search as _search

    index_dir, texts = built
    queries = [(1, texts[3][:50]), (2, "def parse merge")]
    want_ql = _search(index_dir, queries, BM25Params(top_k=6), scoring="ql", mu=MU)
    p1 = _search(index_dir, queries, BM25Params(top_k=3))
    cursor = {
        int(q): (float(g["score"].iloc[-1]), int(g["doc_id"].iloc[-1]))
        for q, g in p1.groupby("query_id")
    }
    want_p2 = _search(index_dir, queries, BM25Params(top_k=3), after=cursor)

    s = Searcher(index_dir, num_shards=2)
    try:
        got_ql = s.search(queries, BM25Params(top_k=6), scoring="ql", mu=MU)
        pd.testing.assert_frame_equal(
            got_ql.reset_index(drop=True), want_ql.reset_index(drop=True)
        )
        got_p2 = s.search(queries, BM25Params(top_k=3), after=cursor)
        pd.testing.assert_frame_equal(
            got_p2.reset_index(drop=True), want_p2.reset_index(drop=True)
        )
    finally:
        s.shutdown()

    r = QueryRouter.remote(index_dir, num_shards=2)
    try:
        got_ql = ray.get(r.search.remote(queries, BM25Params(top_k=6), scoring="ql", mu=MU))
        pd.testing.assert_frame_equal(
            got_ql.reset_index(drop=True), want_ql.reset_index(drop=True)
        )
        got_p2 = ray.get(r.search.remote(queries, BM25Params(top_k=3), after=cursor))
        pd.testing.assert_frame_equal(
            got_p2.reset_index(drop=True), want_p2.reset_index(drop=True)
        )
    finally:
        ray.kill(r)
