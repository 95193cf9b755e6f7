"""Rescore-window tests (Elasticsearch rescore / Lucene QueryRescorer):
scalar parity across score modes, unrescored-query passthrough, window/topk
contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts, tokenize
from splade_ray.bm25 import BM25Params, idf, tf_component
from splade_ray.build import build_index
from splade_ray.oracle import OracleIndex
from splade_ray.positions import build_positions
from splade_ray.rescore import rescore_phrase

TEXTS = [
    "hash join table scan hash join",
    "sort merge batch sort",
    "hash table join",          # 'hash join' absent, terms present
    "join hash",                # reversed
    "sort merge merge sort batch",
    "table scan filter",
    "",
    "hash join hash join hash join",
    "merge sort",
    "batch batch sort merge batch",
]
N = len(TEXTS)


@pytest.fixture(scope="module")
def rescore_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("rescore")
    corpus = str(root / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(N, dtype=np.int64), "text": TEXTS}), corpus
    )
    index_dir = str(root / "index")
    build_index(corpus, index_dir, text_col="text", id_col="doc_id", rows_per_segment=4)
    build_positions(index_dir)
    return index_dir


def _scalar_phrase_count(text, phrase_toks):
    toks = tokenize(text)
    k = len(phrase_toks)
    if k == 0 or len(toks) < k:
        return 0
    return sum(1 for i in range(len(toks) - k + 1) if toks[i : i + k] == phrase_toks)


def _brute(queries, phrases, *, top_k, window, mode, qw, rqw):
    p = BM25Params(top_k=top_k)
    oi = OracleIndex(np.arange(N, dtype=np.int64), TEXTS, BM25Params(top_k=window))
    base = oi.search(queries)
    rows = []
    for qid, _ in queries:
        g = base[base.query_id == qid]
        ptoks = tokenize(phrases[qid]) if qid in phrases else None
        scored = []
        if ptoks:
            counts = {d: _scalar_phrase_count(TEXTS[d], ptoks) for d in range(N)}
            df = sum(1 for c in counts.values() if c > 0)
        for r in g.itertuples():
            prim = qw * r.score
            cnt = counts.get(r.doc_id, 0) if ptoks else 0
            if ptoks and cnt > 0 and df > 0:
                dl = np.array([len(tokenize(TEXTS[r.doc_id]))], np.int64)
                s2 = rqw * float(
                    idf(df, oi.n_docs)
                    * tf_component(np.array([cnt], np.int64), dl, oi.avgdl, p)[0]
                )
                comb = {
                    "total": prim + s2,
                    "multiply": prim * s2,
                    "avg": (prim + s2) / 2,
                    "max": max(prim, s2),
                    "min": min(prim, s2),
                }[mode]
            else:
                comb = prim
            scored.append((r.doc_id, comb))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(scored[:top_k], start=1):
            rows.append((qid, r, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


QUERIES = [(1, "hash join"), (2, "sort merge batch"), (3, "table scan")]
PHRASES = {1: "hash join", 2: "sort merge"}  # qid 3 unrescored


@pytest.mark.parametrize("mode", ["total", "multiply", "avg", "max", "min"])
def test_rescore_matches_scalar(rescore_index, mode):
    got = rescore_phrase(
        rescore_index, QUERIES, BM25Params(top_k=5), phrases=PHRASES,
        window_size=8, score_mode=mode, query_weight=0.7,
        rescore_query_weight=1.3,
    )
    want = _brute(
        QUERIES, PHRASES, top_k=5, window=8, mode=mode, qw=0.7, rqw=1.3
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False, rtol=1e-12
    )


def test_rescore_reorders_vs_base(rescore_index):
    """The phrase pass must actually change the ranking somewhere: doc 7
    (3x exact 'hash join') outscores longer docs under total mode."""
    from splade_ray.query import search

    base = search(rescore_index, [(1, "hash join")], BM25Params(top_k=5))
    got = rescore_phrase(
        rescore_index, [(1, "hash join")], BM25Params(top_k=5),
        phrases={1: "hash join"}, window_size=8,
    )
    assert got["doc_id"].tolist() != base["doc_id"].tolist() or not np.allclose(
        got["score"].to_numpy(), base["score"].to_numpy()
    )
    # docs with no phrase match keep pure primary (qw=1): doc 2/3 scores
    # equal their base scores
    b = dict(zip(base["doc_id"], base["score"]))
    for r in got.itertuples():
        if r.doc_id in (2, 3):
            assert np.isclose(r.score, b[r.doc_id])


def test_rescore_default_phrase_is_query_text(rescore_index):
    got = rescore_phrase(
        rescore_index, [(1, "hash join")], BM25Params(top_k=4), window_size=6
    )
    explicit = rescore_phrase(
        rescore_index, [(1, "hash join")], BM25Params(top_k=4),
        phrases={1: "hash join"}, window_size=6,
    )
    pd.testing.assert_frame_equal(got, explicit)


def test_rescore_contract_errors(rescore_index):
    with pytest.raises(ValueError, match="window_size"):
        rescore_phrase(rescore_index, QUERIES, BM25Params(top_k=10), window_size=5)
    with pytest.raises(ValueError, match="score_mode"):
        rescore_phrase(
            rescore_index, QUERIES, BM25Params(top_k=2), window_size=5,
            score_mode="sum",
        )
