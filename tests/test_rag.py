"""RAG pipeline: chunk index build + parent-ranked retrieval parity
against a scalar chunk-level reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params, idf, tf_component
from splade_ray.ops.chunk import chunk_texts  # noqa: F401 (contract dep)
from splade_ray.pipelines.rag import build_chunk_index, rag_search

N = 60
SIZE, OVERLAP = 6, 2


def _texts():
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    rng = np.random.RandomState(13)
    return [
        " ".join(rng.choice(words, size=rng.randint(3, 30)))
        for _ in range(N)
    ]


def _scalar_chunks(text):
    toks = text.split()
    n, stride = len(toks), SIZE - OVERLAP
    out, s = [], 0
    while n:
        out.append(" ".join(toks[s:s + SIZE]))
        if s + SIZE >= n:
            break
        s += stride
    return out


@pytest.fixture()
def built(ray_session, tmp_path):
    texts = _texts()
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(N, dtype=np.int64)),
                  "text": pa.array(texts)}),
        corpus,
    )
    root = str(tmp_path / "rag")
    m = build_chunk_index(corpus, root, size=SIZE, overlap=OVERLAP,
                          rows_per_segment=40)
    return root, texts, m


def test_rag_parent_ranking_matches_scalar(built):
    root, texts, manifest = built
    # the chunk index holds every chunk
    all_chunks = [(i, c) for i, t in enumerate(texts)
                  for c in _scalar_chunks(t)]
    assert manifest["n_docs"] == len(all_chunks)

    p = BM25Params(top_k=8)
    queries = [(1, "alpha beta"), (2, "kappa")]
    got = rag_search(root, queries, p, score_mode="max", top_k=8)

    # scalar reference: BM25 over chunks, parent = max matching chunk
    tcs = [term_counts(c) for _, c in all_chunks]
    lens = np.array([sum(c.values()) for c in tcs], np.float64)
    avgdl = lens.sum() / len(tcs)
    for qid, qtext in queries:
        scores = np.zeros(len(tcs), np.float64)
        q = term_counts(qtext)
        for term in sorted(q):
            pos = np.array([i for i, c in enumerate(tcs) if term in c],
                           np.int64)
            if pos.size == 0:
                continue
            tf = np.array([tcs[i][term] for i in pos], np.float64)
            w = idf(pos.size, len(tcs)) * q[term]
            scores[pos] += w * tf_component(tf, lens[pos], avgdl, p)
        best: dict[int, float] = {}
        cnt: dict[int, int] = {}
        for (doc, _), s in zip(all_chunks, scores):
            if s > 0:
                best[doc] = max(best.get(doc, -np.inf), s)
                cnt[doc] = cnt.get(doc, 0) + 1
        want = sorted(best.items(), key=lambda kv: (-kv[1], str(kv[0])))[:8]
        g = got[got["query_id"] == qid]
        assert g["parent"].tolist() == [str(d) for d, _ in want]
        np.testing.assert_allclose(
            g["score"].to_numpy(), [s for _, s in want], rtol=1e-12
        )
        assert g["n_children"].tolist() == [cnt[d] for d, _ in want]


def test_rag_build_resumes(built):
    root, texts, m1 = built
    m2 = build_chunk_index(
        str(root) + "/../c.parquet", root, size=SIZE, overlap=OVERLAP,
        rows_per_segment=40,
    )
    assert m2["n_segments_skipped"] == m2["n_segments"]  # full resume
    assert m2["n_docs"] == m1["n_docs"]


def test_rag_search_chunks_payloads(built):
    from splade_ray.pipelines.rag import rag_search_chunks

    root, texts, _ = built
    p = BM25Params(top_k=6)
    got = rag_search_chunks(root, [(1, "alpha beta"), (2, "kappa")], p)
    assert not got.empty
    for _, r in got.iterrows():
        # the fetched chunk text is the right window of the right doc
        want = _scalar_chunks(texts[int(r["doc_id"])])[int(r["chunk_id"])]
        assert r["chunk"] == want
        # and it actually contains a query term
    # ranks are the plain chunk-level BM25 run's
    from splade_ray.query import search

    run = search(f"{root}/index", [(1, "alpha beta"), (2, "kappa")], p)
    assert got["score"].tolist() == run["score"].tolist()


def test_cli_rag(ray_session, tmp_path, capsys):
    import json

    from splade_ray.cli import main

    texts = _texts()
    corpus = str(tmp_path / "rc.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(N, dtype=np.int64)),
                  "text": pa.array(texts)}),
        corpus,
    )
    idx = str(tmp_path / "ragcli")
    assert main(["rag-build", "--corpus", corpus, "--index", idx,
                 "--size", str(SIZE), "--overlap", str(OVERLAP),
                 "--text-col", "text", "--rows-per-segment", "40"]) == 0
    queries = tmp_path / "q.tsv"
    queries.write_text("1\talpha beta\n")
    out = str(tmp_path / "run.parquet")
    assert main(["rag-search", "--index", idx, "--queries", str(queries),
                 "--out", out, "--chunks", "--top-k", "4"]) == 0
    run = pq.read_table(out).to_pandas()
    assert len(run) == 4 and "chunk" in run.columns
    out2 = str(tmp_path / "run2.parquet")
    assert main(["rag-search", "--index", idx, "--queries", str(queries),
                 "--out", out2, "--top-k", "4"]) == 0
    run2 = pq.read_table(out2).to_pandas()
    assert "parent" in run2.columns and len(run2) == 4


def test_has_parent_children_of_top_parents(built):
    """has_parent (ES): every child chunk of each top parent, carrying the
    parent's block-join score/rank; equals rag_search ⨝ scalar chunks."""
    from splade_ray.pipelines.rag import has_parent_search

    root, texts, _ = built
    qs = [(1, "alpha beta"), (2, "kappa iota"), (3, "zzz_nohit")]
    p = BM25Params(top_k=10)
    parents = rag_search(root, qs, p, score_mode="max", top_k=4)
    got = has_parent_search(root, qs, p, score_mode="max", parent_top_k=4)
    rows = []
    for _, r in parents.iterrows():
        pid = int(r["parent"])
        for ci, c in enumerate(_scalar_chunks(texts[pid])):
            rows.append((int(r["query_id"]), int(r["rank"]), r["parent"],
                         float(r["score"]), ci, c))
    want = pd.DataFrame(rows, columns=[
        "query_id", "parent_rank", "parent", "parent_score", "chunk_id",
        "chunk"]).sort_values(
        ["query_id", "parent_rank", "chunk_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert 3 not in set(got["query_id"])  # no-hit query yields no children

    # injectable parent run: a hand-ranked frame flows through verbatim
    inj = parents[parents["query_id"] == 1].head(1)
    got2 = has_parent_search(root, qs, p, parents_run=inj)
    assert set(got2["parent"]) == set(inj["parent"])
    assert (got2["parent_rank"] == int(inj["rank"].iloc[0])).all()


def test_has_parent_empty(built):
    from splade_ray.pipelines.rag import has_parent_search

    root, _, _ = built
    out = has_parent_search(root, [(9, "zzz_nothing")], BM25Params())
    assert out.empty and list(out.columns) == [
        "query_id", "parent_rank", "parent", "parent_score", "chunk_id",
        "chunk"]
