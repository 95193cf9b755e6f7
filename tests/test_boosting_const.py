"""boosting query (soft must_not) + ConstantScoreQuery tests: scalar
parity, demotion semantics, empty clauses, tombstone interaction."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts, tokenize
from splade_ray.bm25 import BM25Params
from splade_ray.boolq import boosting_search, constant_score_search
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus

N = 120
NB = 0.4


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=31)
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


def _scalar_boosting(texts, queries, nb, top_k, k1=1.2, b=0.75):
    toks = [tokenize(t or "") for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    df = Counter(t for tt in toks for t in set(tt))
    rows = []
    for qid, spec in queries:
        pos = term_counts(spec.get("positive", "") or "")
        neg = sorted(term_counts(spec.get("negative", "") or ""))
        scored = []
        for did, tt in enumerate(toks):
            tc = Counter(tt)
            s = 0.0
            for term in sorted(pos):
                tf = tc.get(term, 0)
                if tf == 0 or term not in df:
                    continue
                idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
                s += (
                    idf * pos[term] * tf * (k1 + 1)
                    / (tf + k1 * (1 - b + b * len(tt) / avgdl))
                )
            if s <= 0:
                continue
            if any(tc.get(t, 0) > 0 for t in neg):
                s *= nb
            scored.append((did, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(scored[:top_k], start=1):
            rows.append((qid, r, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def test_boosting_matches_scalar(built):
    index_dir, texts = built
    w = sorted(term_counts(texts[3]))
    queries = [
        (1, {"positive": " ".join(w[:3]), "negative": w[-1] if w else "zz"}),
        (2, {"positive": texts[70][:40], "negative": texts[5][:15]}),
        (3, {"positive": "def parse merge", "negative": ""}),
    ]
    run = boosting_search(index_dir, queries, BM25Params(top_k=8), negative_boost=NB)
    want = _scalar_boosting(texts, queries, NB, 8)
    assert run["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        run["score"].to_numpy(np.float64), want["score"].to_numpy(np.float64),
        rtol=1e-12,
    )


def test_boosting_demotes_but_keeps_matching(built):
    index_dir, texts = built
    # negative == positive: every match is demoted, none excluded
    term = sorted(term_counts(texts[0]))[0]
    base = boosting_search(
        index_dir, [(1, {"positive": term, "negative": ""})],
        BM25Params(top_k=50), negative_boost=NB,
    )
    demoted = boosting_search(
        index_dir, [(1, {"positive": term, "negative": term})],
        BM25Params(top_k=50), negative_boost=NB,
    )
    assert sorted(demoted["doc_id"]) == sorted(base["doc_id"])
    m = base.merge(demoted, on="doc_id", suffixes=("_b", "_d"))
    np.testing.assert_allclose(
        m["score_d"].to_numpy(), NB * m["score_b"].to_numpy(), rtol=1e-12
    )


def test_constant_score_is_first_k_matches(built):
    index_dir, texts = built
    term = sorted(term_counts(texts[0]))[0]
    run = constant_score_search(
        index_dir, [(1, term), (2, "zzqx")], BM25Params(top_k=5), boost=2.5
    )
    toks = [set(tokenize(t or "")) for t in texts]
    want = [d for d, tt in enumerate(toks) if term in tt][:5]
    assert run[run.query_id == 1]["doc_id"].tolist() == want
    assert (run["score"] == 2.5).all()
    assert (run.query_id == 2).sum() == 0  # no match -> no rows


def test_constant_score_or_semantics(built):
    index_dir, texts = built
    t1 = sorted(term_counts(texts[0]))[0]
    t2 = sorted(term_counts(texts[1]))[0]
    run = constant_score_search(
        index_dir, [(1, f"{t1} {t2}")], BM25Params(top_k=200), boost=1.0
    )
    toks = [set(tokenize(t or "")) for t in texts]
    want = sorted(d for d, tt in enumerate(toks) if t1 in tt or t2 in tt)
    assert run["doc_id"].tolist() == want[:200]


def _scalar_common(texts, queries, cutoff, top_k, k1=1.2, b=0.75):
    toks = [tokenize(t or "") for t in texts]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    df = Counter(t for tt in toks for t in set(tt))
    rows = []
    for qid, text in queries:
        q = term_counts(text)
        terms = [t for t in sorted(q) if t in df]
        low = [t for t in terms if df[t] / n <= cutoff]
        scored = []
        for did, tt in enumerate(toks):
            tc = Counter(tt)
            if low:
                if not any(tc.get(t, 0) for t in low):
                    continue
            s = 0.0
            for t in terms:
                tf = tc.get(t, 0)
                if tf == 0:
                    continue
                w = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += (w * q[t]) * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(tt) / avgdl)
                )
            if s > 0:
                scored.append((did, s))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(scored[:top_k], start=1):
            rows.append((qid, r, d, s))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def test_common_terms_matches_scalar(built):
    from splade_ray.boolq import common_terms_search

    index_dir, texts = built
    # synth corpus: COMMON keywords (def/return/...) are in >50% of docs,
    # IDENT_POOL words rarer, rare_token_* unique — cutoff 0.3 splits them
    queries = [
        (1, "def parse merge"),
        (2, "return return index"),
        (3, "rare_token_20 def class"),   # unique token drives matching
        (4, "def class if"),              # likely all-common -> OR fallback
    ]
    got = common_terms_search(
        index_dir, queries, BM25Params(top_k=8), cutoff_frequency=0.3
    )
    want = _scalar_common(texts, queries, 0.3, 8)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(np.float64), want["score"].to_numpy(np.float64),
        rtol=1e-12,
    )


def test_common_terms_gates_on_low(built):
    """A doc with common terms but no low-frequency term must not match
    when the query has low-frequency terms."""
    from splade_ray.boolq import common_terms_search

    index_dir, texts = built
    queries = [(1, "rare_token_3 def")]
    got = common_terms_search(
        index_dir, queries, BM25Params(top_k=50), cutoff_frequency=0.3
    )
    hits = set(got["doc_id"])
    assert hits  # the rare token's doc matches
    for d in hits:
        assert "rare_token_3" in tokenize(texts[d])
