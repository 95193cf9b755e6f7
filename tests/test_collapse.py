"""Field-collapse tests: brute-force parity, per-key uniqueness, tombstones."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.collapse import collapse_search
from splade_ray.corpus import synth_corpus
from splade_ray.oracle import OracleIndex

N = 120


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=23)
    keys = [f"repo{i % 9}" for i in range(N)]
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N, dtype=np.int64)),
                "content": t["content"],
                "repo_key": pa.array(keys),
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(
        corpus, index_dir, text_col="content", id_col="doc_id",
        rows_per_segment=30, extra_doc_cols=("repo_key",),
    )
    return index_dir, t["content"].to_pylist(), keys


def _scalar_collapse(texts, keys, queries, top_k):
    oi = OracleIndex(list(range(len(texts))), texts, BM25Params(top_k=len(texts)))
    full = oi.search(queries)
    rows = []
    for qid, g in full.groupby("query_id"):
        seen, out = set(), []
        for _, r in g.iterrows():  # already (score desc, doc asc) ranked
            k = keys[int(r["doc_id"])]
            if k in seen:
                continue
            seen.add(k)
            out.append((int(qid), len(out) + 1, int(r["doc_id"]), k, float(r["score"])))
            if len(out) == top_k:
                break
        rows.extend(out)
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "collapse_key", "score"]
    )


def test_collapse_matches_scalar(built):
    index_dir, texts, keys = built
    queries = [(1, texts[3][:50]), (2, texts[60][:40]), (3, "def parse merge")]
    got = collapse_search(
        index_dir, queries, BM25Params(top_k=5), collapse_col="repo_key"
    )
    want = _scalar_collapse(texts, keys, queries, 5)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )


def test_collapse_keys_unique_per_query(built):
    index_dir, texts, _ = built
    got = collapse_search(
        index_dir, [(1, texts[10][:80])], BM25Params(top_k=20), collapse_col="repo_key"
    )
    assert got["collapse_key"].is_unique
    assert got["rank"].tolist() == list(range(1, len(got) + 1))


def test_collapse_respects_tombstones(built):
    from splade_ray.delete import delete_docs

    index_dir, texts, keys = built
    queries = [(1, texts[3][:50])]
    base = collapse_search(index_dir, queries, BM25Params(top_k=5), collapse_col="repo_key")
    gone = [int(base["doc_id"].iloc[0])]
    delete_docs(index_dir, gone)
    after = collapse_search(index_dir, queries, BM25Params(top_k=5), collapse_col="repo_key")
    assert not set(after["doc_id"]) & set(gone)
    want = _scalar_collapse(
        [t if i not in gone else "" for i, t in enumerate(texts)], keys, queries, 5
    )
    assert after["doc_id"].tolist() == want["doc_id"].tolist()


def test_cli_collapse(built, tmp_path, capsys):
    from splade_ray.cli import main

    index_dir, texts, _ = built
    q = texts[3][:50].replace("\n", " ").replace("\t", " ")
    qf = tmp_path / "q.tsv"
    qf.write_text(f"1\t{q}\n")
    out = str(tmp_path / "run.parquet")
    rc = main(["collapse", "--index", index_dir, "--queries", str(qf),
               "--out", out, "--collapse-col", "repo_key", "--top-k", "5"])
    assert rc == 0
    got = pd.read_parquet(out)
    want = collapse_search(index_dir, [(1, q)], BM25Params(top_k=5),
                           collapse_col="repo_key")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def _scalar_diversified(texts, keys, queries, top_k, cap):
    """ES diversified_sampler greedy: scan score-desc, keep while the
    doc's key has < cap kept docs, stop at top_k."""
    oi = OracleIndex(list(range(len(texts))), texts, BM25Params(top_k=len(texts)))
    full = oi.search(queries)
    rows = []
    for qid, g in full.groupby("query_id"):
        seen, out = {}, []
        for _, r in g.iterrows():
            k = keys[int(r["doc_id"])]
            if seen.get(k, 0) >= cap:
                continue
            seen[k] = seen.get(k, 0) + 1
            out.append((int(qid), len(out) + 1, int(r["doc_id"]), k, float(r["score"])))
            if len(out) == top_k:
                break
        rows.extend(out)
    return pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "collapse_key", "score"]
    )


def test_diversified_cap_matches_greedy(built):
    index_dir, texts, keys = built
    queries = [(1, "def parse merge"), (2, "return x1 += 1")]
    p = BM25Params(top_k=12)
    for cap in (2, 3):
        got = collapse_search(index_dir, queries, p, collapse_col="repo_key",
                              max_docs_per_key=cap)
        want = _scalar_diversified(texts, keys, queries, 12, cap)
        assert got["doc_id"].tolist() == want["doc_id"].tolist()
        np.testing.assert_allclose(
            got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-12
        )
        # cap respected
        assert got.groupby(["query_id", "collapse_key"]).size().max() <= cap
    # cap=1 stays the plain collapse
    got1 = collapse_search(index_dir, queries, p, collapse_col="repo_key")
    want1 = _scalar_collapse(texts, keys, queries, 12)
    assert got1["doc_id"].tolist() == want1["doc_id"].tolist()
