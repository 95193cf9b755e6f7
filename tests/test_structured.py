"""Structural queries (ids / exists / pinned), distance_feature bonus and
match_bool_prefix — brute-force parity tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts, tokenize
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.oracle import OracleIndex
from splade_ray.structured import exists_search, ids_search, pinned_search

N = 120


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=77)
    texts = t["content"].to_pylist()
    sizes = np.array([len(x) for x in texts], np.int64)
    # url is null on every third doc — the exists-query probe
    urls = [None if i % 3 == 0 else f"u{i}" for i in range(N)]
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N, dtype=np.int64)),
                "content": t["content"],
                "n_bytes": pa.array(sizes),
                "url": pa.array(urls, pa.string()),
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(
        corpus, index_dir, text_col="content", id_col="doc_id",
        rows_per_segment=30, extra_doc_cols=("n_bytes", "url"),
    )
    return index_dir, texts, sizes


QUERIES = [(1, "def parse merge"), (2, "return x1 += 1")]


def _dense_scores(oi: OracleIndex, text: str, p: BM25Params) -> np.ndarray:
    scores = np.zeros(oi.n_docs, np.float64)
    q = term_counts(text)
    for term in sorted(q):
        if term not in oi.postings:
            continue
        pos, tf = oi.postings[term]
        w = idf(len(pos), oi.n_docs) * q[term]
        scores[pos] += w * tf_component(tf, oi.doc_lens[pos], oi.avgdl, p)
    return scores


def test_ids_search(built):
    index_dir, texts, _ = built
    got = ids_search(index_dir, {1: [5, 99, 100000, 3], 2: [117], 3: []})
    g1 = got[got["query_id"] == 1]
    assert g1["doc_id"].tolist() == [3, 5, 99]  # missing id dropped, sorted
    assert g1["rank"].tolist() == [1, 2, 3]
    assert (g1["score"] == 1.0).all()
    assert got[got["query_id"] == 2]["doc_id"].tolist() == [117]
    assert got[got["query_id"] == 3].empty


def test_ids_search_respects_tombstones(built):
    from splade_ray.delete import delete_docs

    index_dir, _, _ = built
    delete_docs(index_dir, [5])
    got = ids_search(index_dir, {1: [5, 3]})
    assert got["doc_id"].tolist() == [3]


def test_exists_search_matches_bruteforce(built):
    index_dir, texts, _ = built
    p = BM25Params(top_k=8)
    got = exists_search(index_dir, QUERIES, p, col="url")
    oi = OracleIndex(list(range(N)), texts, p)
    has_url = np.array([i % 3 != 0 for i in range(N)])
    rows = []
    for qid, text in QUERIES:
        scores = np.where(has_url, _dense_scores(oi, text, p), 0.0)
        docs, scs = topk_from_scores(oi.doc_ids, scores, p.top_k, p.threshold)
        rows.extend(
            (qid, r + 1, int(d), float(s))
            for r, (d, s) in enumerate(zip(docs, scs))
        )
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["doc_id"] % 3 != 0).all()


def test_pinned_search(built):
    from splade_ray.query import search

    index_dir, texts, _ = built
    p = BM25Params(top_k=6)
    pins = {1: [50, 999999, 7], 2: []}
    got = pinned_search(index_dir, QUERIES, p, pinned=pins)
    g1 = got[got["query_id"] == 1]
    # pinned (existing) ids first, given order, then organic minus pinned
    assert g1["doc_id"].tolist()[:2] == [50, 7]
    assert g1["is_pinned"].tolist()[:2] == [1, 1]
    assert (g1["is_pinned"].tolist()[2:] == [0] * (len(g1) - 2))
    assert len(g1) == 6
    organic = search(index_dir, QUERIES, BM25Params(top_k=10))
    o1 = [d for d in organic[organic["query_id"] == 1]["doc_id"] if d not in (50, 7)]
    assert g1["doc_id"].tolist()[2:] == o1[:4]
    # no pins -> identical to plain search
    g2 = got[got["query_id"] == 2].reset_index(drop=True)
    plain = search(index_dir, QUERIES, p)
    p2 = plain[plain["query_id"] == 2].reset_index(drop=True)
    assert g2["doc_id"].tolist() == p2["doc_id"].tolist()
    np.testing.assert_allclose(g2["score"].to_numpy(), p2["score"].to_numpy())


def test_terms_lookup_search(built, tmp_path):
    from splade_ray.structured import terms_lookup_search

    index_dir, _, _ = built
    lookup = str(tmp_path / "lk.parquet")
    # urls are f"u{i}" with nulls on i % 3 == 0, so u1/u2/u7 all exist
    pq.write_table(
        pa.table({
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "urls": pa.array([["u7", "u1", "u2"], [], None],
                             pa.list_(pa.string())),
        }),
        lookup,
    )
    lookups = {1: 10, 2: 11, 3: 12, 4: 99}
    got = terms_lookup_search(
        index_dir, lookups, field="url", lookup_path=lookup,
        lookup_field="urls",
    )
    g1 = got[got["query_id"] == 1]
    assert g1["doc_id"].tolist() == [1, 2, 7]  # doc_id asc, not given order
    assert g1["rank"].tolist() == [1, 2, 3]
    assert (g1["score"] == 1.0).all()
    # empty set, null set and missing lookup row all match nothing
    for q in (2, 3, 4):
        assert got[got["query_id"] == q].empty
    # per-query cap
    capped = terms_lookup_search(
        index_dir, lookups, field="url", lookup_path=lookup,
        lookup_field="urls", top_k=2,
    )
    assert capped[capped["query_id"] == 1]["doc_id"].tolist() == [1, 2]


def test_terms_lookup_respects_tombstones(built, tmp_path):
    from splade_ray.delete import delete_docs
    from splade_ray.structured import terms_lookup_search

    index_dir, _, _ = built
    lookup = str(tmp_path / "lk.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([10], pa.int64()),
            "urls": pa.array([["u7", "u1", "u2"]], pa.list_(pa.string())),
        }),
        lookup,
    )
    delete_docs(index_dir, [2])
    got = terms_lookup_search(
        index_dir, {1: 10}, field="url", lookup_path=lookup,
        lookup_field="urls",
    )
    assert got["doc_id"].tolist() == [1, 7]


def test_terms_lookup_list_field(ray_session, tmp_path):
    """Matching against a list<string> doc-values column: a doc matches
    when ANY of its tags is in the looked-up set, and a scalar (non-list)
    lookup_field value works too."""
    from splade_ray.structured import terms_lookup_search

    tags = [["red", "blue"], ["green"], [], ["blue"], None, ["red"]]
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(6, dtype=np.int64)),
            "content": pa.array([f"doc number {i}" for i in range(6)]),
            "tags": pa.array(tags, pa.list_(pa.string())),
        }),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(
        corpus, index_dir, text_col="content", id_col="doc_id",
        rows_per_segment=3, extra_doc_cols=("tags",),
    )
    lookup = str(tmp_path / "lk.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "want": pa.array([["red", "green"], ["blue"]],
                             pa.list_(pa.string())),
        }),
        lookup,
    )
    got = terms_lookup_search(
        index_dir, {1: 1, 2: 2}, field="tags", lookup_path=lookup,
        lookup_field="want",
    )
    assert got[got["query_id"] == 1]["doc_id"].tolist() == [0, 1, 5]
    assert got[got["query_id"] == 2]["doc_id"].tolist() == [0, 3]


def test_distance_feature_matches_bruteforce(built):
    from splade_ray.docvalues import rank_feature_search

    index_dir, texts, sizes = built
    p = BM25Params(top_k=8)
    origin, pivot, boost = 400.0, 150.0, 2.5
    got = rank_feature_search(
        index_dir, QUERIES, p,
        rank_features=[{"field": "n_bytes", "boost": boost,
                        "function": {"distance": {"origin": origin,
                                                  "pivot": pivot}}}],
    )
    oi = OracleIndex(list(range(N)), texts, p)
    bonus = boost * (pivot / (pivot + np.abs(sizes.astype(np.float64) - origin)))
    rows = []
    for qid, text in QUERIES:
        scores = _dense_scores(oi, text, p)
        scores = np.where(scores > 0, scores + bonus, scores)
        docs, scs = topk_from_scores(oi.doc_ids, scores, p.top_k, p.threshold)
        rows.extend(
            (qid, r + 1, int(d), float(s))
            for r, (d, s) in enumerate(zip(docs, scs))
        )
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-12
    )


def test_match_bool_prefix_matches_composition(built):
    from splade_ray.query import search
    from splade_ray.suggest import expand_prefix, match_bool_prefix_search

    index_dir, texts, _ = built
    p = BM25Params(top_k=8)
    queries = [(1, "def parse par"), (2, "return re")]
    got = match_bool_prefix_search(index_dir, queries, p, max_terms=10)
    expanded = []
    for qid, text in queries:
        toks = tokenize(text)
        terms = toks[:-1] + expand_prefix(index_dir, toks[-1], max_terms=10)
        expanded.append((qid, " ".join(terms)))
    want = search(index_dir, expanded, p)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the prefix really expanded to >1 lexicon term
    assert len(expand_prefix(index_dir, "par", max_terms=10)) > 1


def test_field_stats_agg(built):
    from splade_ray.docvalues import field_stats_agg
    from splade_ray.oracle import OracleIndex as OI

    index_dir, texts, sizes = built
    oi = OI(list(range(N)), texts)
    got = field_stats_agg(index_dir, QUERIES, col="url")
    for qid, text in QUERIES:
        m = np.zeros(N, bool)
        for term in term_counts(text):
            if term in oi.postings:
                m[oi.postings[term][0]] = True
        has = np.array([i % 3 != 0 for i in range(N)])
        g = got[got["query_id"] == qid].iloc[0]
        assert g["n_value"] == int((m & has).sum())
        assert g["n_missing"] == int((m & ~has).sum())
        assert g["n_distinct"] == int((m & has).sum())  # urls are unique
    # low-cardinality distinct over the never-null numeric column
    got2 = field_stats_agg(index_dir, QUERIES, col="n_bytes")
    for qid, text in QUERIES:
        m = np.zeros(N, bool)
        for term in term_counts(text):
            if term in oi.postings:
                m[oi.postings[term][0]] = True
        g = got2[got2["query_id"] == qid].iloc[0]
        assert g["n_missing"] == 0
        assert g["n_value"] == int(m.sum())
        assert g["n_distinct"] == len(set(sizes[m].tolist()))
