"""Similarity-registry tests for the lmjm (Jelinek-Mercer QL) and tfidf
(Lucene ClassicSimilarity) scoring modes: scalar parity, BMW/auto routing,
quantized rejection, explain-sum reconstruction."""

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
from splade_ray.query import explain, search

N = 120
LAM = 0.25


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=23)
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


def _scalar(texts, queries, top_k, contrib_fn):
    """Shared scalar harness: per matching term contrib_fn(qtf, tf, dl,
    term-stats); score desc, doc_id asc; score > 0."""
    toks = [tokenize(t or "") for t in texts]
    n_docs = len(toks)
    c_total = sum(len(t) for t in toks)
    cf = Counter(t for tt in toks for t in tt)
    df = Counter(t for tt in toks for t in set(tt))
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
                s += contrib_fn(
                    q[term], tf, len(tt),
                    cf=cf[term], df=df[term], n=n_docs, c=c_total,
                )
            if s > 0:
                scored.append((did, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(scored[:top_k], start=1):
            rows.append((qid, r, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def _lmjm_contrib(qtf, tf, dl, *, cf, df, n, c):
    w = LAM * cf / c
    return qtf * math.log1p(((1.0 - LAM) * tf / dl) / w)


def _tfidf_contrib(qtf, tf, dl, *, cf, df, n, c):
    idf_c = 1.0 + math.log(n / (df + 1.0))
    return (idf_c * idf_c * qtf) * math.sqrt(tf) / math.sqrt(dl)


DFR_C = 1.0


def _dfr_contrib(qtf, tf, dl, *, cf, df, n, c):
    avgdl = c / n
    tfn = tf * math.log2(1.0 + DFR_C * avgdl / dl)
    return qtf * math.log2((n + 1.0) / (df + 0.5)) * tfn / (tfn + 1.0)


QUERY_SETS = {
    "lmjm": _lmjm_contrib,
    "tfidf": _tfidf_contrib,
    "dfr": _dfr_contrib,
}


@pytest.mark.parametrize("mode", sorted(QUERY_SETS))
def test_similarity_matches_scalar(built, mode):
    index_dir, texts = built
    queries = [(1, texts[3][:50]), (2, texts[70][:40]), (3, "def parse merge")]
    run = search(index_dir, queries, BM25Params(top_k=8), scoring=mode, lam=LAM)
    want = _scalar(texts, queries, 8, QUERY_SETS[mode])
    assert run["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        run["score"].to_numpy(np.float64), want["score"].to_numpy(np.float64),
        rtol=1e-12,
    )


@pytest.mark.parametrize("mode", sorted(QUERY_SETS))
def test_similarity_bmw_auto_route_to_exact(built, mode):
    index_dir, texts = built
    queries = [(1, "def parse merge"), (2, texts[50][:40])]
    base = search(index_dir, queries, BM25Params(top_k=10), scoring=mode, lam=LAM)
    for method in ("bmw", "auto"):
        got = search(
            index_dir, queries, BM25Params(top_k=10), method=method,
            scoring=mode, lam=LAM,
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), base.reset_index(drop=True)
        )


@pytest.mark.parametrize("mode", sorted(QUERY_SETS))
def test_similarity_rejects_quantized(built, mode):
    index_dir, _ = built
    with pytest.raises(ValueError, match="quantized"):
        search(index_dir, [(1, "def")], BM25Params(), method="quantized", scoring=mode)


@pytest.mark.parametrize("mode", sorted(QUERY_SETS))
def test_explain_sums_to_run_score(built, mode):
    index_dir, texts = built
    queries = [(1, texts[3][:50]), (2, "def parse merge")]
    run = search(index_dir, queries, BM25Params(top_k=5), scoring=mode, lam=LAM)
    ex = explain(
        index_dir, queries, run["doc_id"].unique().tolist(),
        BM25Params(), scoring=mode, lam=LAM,
    )
    sums = ex.groupby(["query_id", "doc_id"])["contrib"].sum()
    for _, r in run.iterrows():
        np.testing.assert_allclose(
            sums.loc[(r["query_id"], r["doc_id"])], r["score"], rtol=1e-12
        )


def test_similarities_rank_differently_somewhere(built):
    # sanity: the three non-BM25 modes are genuinely different functions
    index_dir, texts = built
    queries = [(i, texts[i * 7][:60]) for i in range(1, 10)]
    runs = {
        m: search(index_dir, queries, BM25Params(top_k=10), scoring=m, lam=LAM)
        for m in ("bm25", "lmjm", "tfidf", "dfr")
    }
    orders = {
        m: r.sort_values(["query_id", "rank"])["doc_id"].tolist()
        for m, r in runs.items()
    }
    assert orders["bm25"] != orders["lmjm"]
    assert orders["bm25"] != orders["tfidf"]
    assert orders["lmjm"] != orders["tfidf"]
    assert orders["bm25"] != orders["dfr"]


def test_unknown_scoring_raises(built):
    index_dir, _ = built
    with pytest.raises(ValueError, match="unknown scoring"):
        search(index_dir, [(1, "def")], BM25Params(), scoring="ib_spl")
