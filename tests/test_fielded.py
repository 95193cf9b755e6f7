"""Fielded (BM25F-style weighted-field) retrieval vs an in-memory oracle.

score(q, d) = Σ_f w_f · BM25_f(q, d_f), each field with its own df / doc
lengths / avgdl. The oracle composes per-field OracleIndex dense scores in
the same (sorted-field, sorted-term) float order, so runs compare
bit-identically before the deterministic top-k cut.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import tokenize
from splade_ray.bm25 import BM25Params, topk_from_scores
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.oracle import OracleIndex
from splade_ray.query import search, search_fielded

QUERIES = [
    (0, "def parse buffer"),
    (1, "merge heap score"),
    (2, "rare_token_3"),
    (3, "zzz_not_in_vocab"),
    (4, "import import index"),
    (5, "the int for while class"),
]
WEIGHTS = {"body": 1.0, "title": 2.5}
PARAMS = BM25Params(top_k=8)


def _title(text: str) -> str:
    return " ".join(tokenize(text)[:6])


@pytest.fixture(scope="module")
def fielded(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("fielded")
    t = synth_corpus(300, seed=7)
    body = t["content"].to_pylist()
    titles = [_title(x) for x in body]
    doc_ids = list(range(300))
    corpus = pa.table({"doc_id": doc_ids, "body": body, "title": titles})
    corpus_path = str(root / "corpus.parquet")
    pq.write_table(corpus, corpus_path)
    dirs = {}
    for field in ("body", "title"):
        d = str(root / f"idx-{field}")
        build_index(
            corpus_path, d, text_col=field, id_col="doc_id",
            rows_per_segment=70, block_size=16,
        )
        dirs[field] = d
    return dirs, doc_ids, body, titles


def _oracle_fielded(doc_ids, fields_texts, weights, params):
    ois = {f: OracleIndex(doc_ids, texts, params) for f, texts in fields_texts.items()}
    ids = np.asarray(doc_ids, np.int64)
    rows = []
    for qid, text in QUERIES:
        total = np.zeros(ids.size, np.float64)
        for f in sorted(ois):
            oi = ois[f]
            scores = np.zeros(ids.size, np.float64)
            from splade_ray.analysis import term_counts
            from splade_ray.bm25 import idf, tf_component

            q = term_counts(text)
            for term in sorted(q):
                if term not in oi.postings:
                    continue
                pos, tf = oi.postings[term]
                w = idf(len(pos), oi.n_docs) * q[term]
                scores[pos] += w * tf_component(tf, oi.doc_lens[pos], oi.avgdl, params)
            total = total + weights[f] * scores
        docs, scs = topk_from_scores(ids, total, params.top_k, params.threshold)
        rows.extend(
            (int(qid), r, int(d), float(s))
            for r, (d, s) in enumerate(zip(docs, scs), start=1)
        )
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def test_fielded_matches_oracle(fielded):
    dirs, doc_ids, body, titles = fielded
    run = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS)
    want = _oracle_fielded(
        doc_ids, {"body": body, "title": titles}, WEIGHTS, PARAMS
    )
    got = run.reset_index(drop=True)
    got["rank"] = got["rank"].astype(int)
    want["rank"] = want["rank"].astype(int)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fielded_single_field_equals_search(fielded):
    """weights={body: 1} over one field reduces to plain BM25 search."""
    dirs, *_ = fielded
    a = search_fielded({"body": dirs["body"]}, QUERIES, {"body": 1.0}, PARAMS)
    b = search(dirs["body"], QUERIES, PARAMS)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def test_fielded_weight_shifts_ranking(fielded):
    """A heavy title weight must be able to change the winner for a query
    whose terms sit in some titles: sanity that both fields contribute."""
    dirs, doc_ids, body, titles = fielded
    light = search_fielded(dirs, QUERIES, {"body": 1.0, "title": 0.0001}, PARAMS)
    heavy = search_fielded(dirs, QUERIES, {"body": 0.0001, "title": 100.0}, PARAMS)
    assert not light.equals(heavy)


def test_fielded_misaligned_raises(ray_session, tmp_path):
    """Indexes with different segmentation are rejected up front."""
    t = synth_corpus(120, seed=3)
    corpus = pa.table(
        {
            "doc_id": list(range(120)),
            "body": t["content"].to_pylist(),
            "title": [_title(x) for x in t["content"].to_pylist()],
        }
    )
    p = str(tmp_path / "c.parquet")
    pq.write_table(corpus, p)
    d1, d2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(p, d1, text_col="body", id_col="doc_id", rows_per_segment=40)
    build_index(p, d2, text_col="title", id_col="doc_id", rows_per_segment=60)
    with pytest.raises(ValueError, match="segment counts"):
        search_fielded({"body": d1, "title": d2}, QUERIES, WEIGHTS, PARAMS)


def test_segment_index_empty_term_list(fielded):
    """A field whose query terms all miss its lexicon loads NO postings
    (regression: isin([]) binds a null-typed set and Arrow raises)."""
    from splade_ray.build import segment_dirs
    from splade_ray.query import SegmentIndex

    dirs, *_ = fielded
    si = SegmentIndex(segment_dirs(dirs["body"])[0], terms=[])
    assert si.postings.num_rows == 0
    assert si.posting("anything") is None


# ------------------------------------------------------------------ BM25F

def _oracle_bm25f(doc_ids, fields_texts, weights, params, field_b=None):
    """True BM25F in the kernel's exact float order: per segmentless corpus,
    fold w_f·tf/B_f across sorted fields into tfa per term, saturate once,
    idf over the document-level union df."""
    from splade_ray.analysis import term_counts
    from splade_ray.bm25 import idf

    ois = {f: OracleIndex(doc_ids, texts, params) for f, texts in fields_texts.items()}
    fields = sorted(ois)
    ids = np.asarray(doc_ids, np.int64)
    n = ids.size
    b_map = {f: (field_b or {}).get(f, params.b) for f in fields}
    B = {
        f: (1.0 - b_map[f]) + b_map[f] * ois[f].doc_lens.astype(np.float64) / ois[f].avgdl
        for f in fields
    }
    # union df per term over all fields
    union_df = {}
    all_terms = set()
    for f in fields:
        all_terms |= set(ois[f].postings)
    for t in all_terms:
        seen = None
        for f in fields:
            got = ois[f].postings.get(t)
            if got is None:
                continue
            seen = got[0] if seen is None else np.union1d(seen, got[0])
        union_df[t] = int(seen.size)
    rows = []
    for qid, text in QUERIES:
        q = term_counts(text)
        scores = np.zeros(n, np.float64)
        hit = False
        for term in sorted(q):
            if term not in union_df:
                continue
            tfa = np.zeros(n, np.float64)
            for f in fields:
                got = ois[f].postings.get(term)
                if got is None:
                    continue
                pos, tf = got
                tfa[pos] += (weights[f] * tf.astype(np.float64)) / B[f][pos]
            w = idf(union_df[term], ois[fields[0]].n_docs)
            scores += (q[term] * w * (params.k1 + 1.0)) * (tfa / (params.k1 + tfa))
            hit = True
        if not hit:
            continue
        docs, scs = topk_from_scores(ids, scores, params.top_k, params.threshold)
        rows.extend(
            (int(qid), r, int(d), float(s))
            for r, (d, s) in enumerate(zip(docs, scs), start=1)
        )
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def test_bm25f_matches_oracle(fielded):
    """Kernel BM25F == in-memory oracle (same fold/sum order; exact doc ids
    and ranks, scores to float tolerance across the segment split)."""
    dirs, doc_ids, body, titles = fielded
    run = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="bm25f")
    want = _oracle_bm25f(doc_ids, {"body": body, "title": titles}, WEIGHTS, PARAMS)
    got = run.reset_index(drop=True)
    assert got[["query_id", "rank", "doc_id"]].astype(int).values.tolist() == \
        want[["query_id", "rank", "doc_id"]].astype(int).values.tolist()
    np.testing.assert_allclose(got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-12)


def test_bm25f_per_field_b(fielded):
    """Per-field b changes scores (title unnormalized, body fully normalized)
    and still matches the oracle under the same field_b map."""
    dirs, doc_ids, body, titles = fielded
    fb = {"body": 0.9, "title": 0.0}
    run = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="bm25f", field_b=fb)
    want = _oracle_bm25f(
        doc_ids, {"body": body, "title": titles}, WEIGHTS, PARAMS, field_b=fb
    )
    got = run.reset_index(drop=True)
    assert got[["query_id", "rank", "doc_id"]].astype(int).values.tolist() == \
        want[["query_id", "rank", "doc_id"]].astype(int).values.tolist()
    np.testing.assert_allclose(got["score"].to_numpy(), want["score"].to_numpy(), rtol=1e-12)
    base = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="bm25f")
    assert not base.equals(run)


def test_bm25f_single_field_reduces_to_bm25(fielded):
    """One field, weight 1: tfa = tf/B and idf_union = idf, so
    idf·(k1+1)·tfa/(k1+tfa) = idf·tf·(k1+1)/(tf+k1·B) — algebraically plain
    BM25. Ranks/docs must match `search`; scores to float tolerance."""
    dirs, *_ = fielded
    a = search_fielded({"body": dirs["body"]}, QUERIES, {"body": 1.0}, PARAMS, mode="bm25f")
    b = search(dirs["body"], QUERIES, PARAMS)
    assert a[["query_id", "rank", "doc_id"]].astype(int).values.tolist() == \
        b[["query_id", "rank", "doc_id"]].astype(int).values.tolist()
    np.testing.assert_allclose(a["score"].to_numpy(), b["score"].to_numpy(), rtol=1e-9)


def test_bm25f_differs_from_weighted_sum(fielded):
    """Fold-before-saturation must NOT equal saturate-then-sum on a corpus
    where query terms hit both fields (the semantic point of BM25F)."""
    dirs, *_ = fielded
    f = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="bm25f")
    s = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="sum")
    assert not np.allclose(
        f.sort_values(["query_id", "rank"])["score"].to_numpy()[: len(s)],
        s.sort_values(["query_id", "rank"])["score"].to_numpy()[: len(f)],
    )


def test_bm25f_unknown_mode_raises(fielded):
    dirs, *_ = fielded
    with pytest.raises(ValueError, match="unknown fielded mode"):
        search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="bm25g")


def test_fielded_per_field_analyzer(ray_session, tmp_path):
    """sum-mode `analyzers` routes QUERY tokenization per field: a 'py'
    (underscore-splitting) analyzer on the path field makes the query term
    `parse_buffer` match a path index built with the same analyzer, while
    the body field (collection-wide class, underscore kept) does not split
    it."""
    docs = [
        "src/parse/buffer.py",
        "src/merge/heap.py",
        "docs/readme.md",
    ]
    bodies = [
        "parse_buffer reads bytes",
        "heap merge for runs",
        "plain prose here",
    ]
    corpus = pa.table(
        {
            "doc_id": [0, 1, 2],
            "body": bodies,
            "path": docs,
            "pl": ["py"] * 3,
        }
    )
    p = str(tmp_path / "c.parquet")
    pq.write_table(corpus, p)
    dirs = {}
    for field, lang_col in (("body", None), ("path", "pl")):
        d = str(tmp_path / f"i-{field}")
        build_index(
            p, d, text_col=field, id_col="doc_id", rows_per_segment=10,
            lang_col=lang_col,
        )
        dirs[field] = d
    run = search_fielded(
        dirs,
        [(0, "parse_buffer")],
        {"body": 1.0, "path": 1.0},
        BM25Params(top_k=3),
        analyzers={"path": "py"},
    )
    # 'py' analyzer splits the query into parse+buffer -> hits doc 0's path
    # AND doc 0's body keeps the whole-token parse_buffer match
    assert 0 in set(run["doc_id"])
    top = run[run["rank"] == 1].iloc[0]
    assert int(top["doc_id"]) == 0


# ----------------------------------------------------------------- dis_max

def _oracle_dismax(doc_ids, fields_texts, weights, params, tie):
    """Per-field dense BM25 arrays (same float order as the kernel), combined
    as max + tie·(sum − max)."""
    from splade_ray.analysis import term_counts
    from splade_ray.bm25 import idf, tf_component

    ois = {f: OracleIndex(doc_ids, texts, params) for f, texts in fields_texts.items()}
    ids = np.asarray(doc_ids, np.int64)
    rows = []
    for qid, text in QUERIES:
        denses = []
        for f in sorted(ois):
            oi = ois[f]
            scores = np.zeros(ids.size, np.float64)
            q = term_counts(text)
            hit = False
            for term in sorted(q):
                if term not in oi.postings:
                    continue
                pos, tf = oi.postings[term]
                w = idf(len(pos), oi.n_docs) * q[term]
                scores[pos] += w * tf_component(tf, oi.doc_lens[pos], oi.avgdl, params)
                hit = True
            if hit:
                denses.append(weights[f] * scores)
        if not denses:
            continue
        best = np.maximum.reduce(denses)
        total = best if tie == 0.0 else best + tie * (np.add.reduce(denses) - best)
        docs, scs = topk_from_scores(ids, total, params.top_k, params.threshold)
        rows.extend(
            (int(qid), r, int(d), float(s))
            for r, (d, s) in enumerate(zip(docs, scs), start=1)
        )
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


@pytest.mark.parametrize("tie", [0.0, 0.3])
def test_dismax_matches_oracle(fielded, tie):
    dirs, doc_ids, body, titles = fielded
    run = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="dismax",
                         tie_breaker=tie)
    want = _oracle_dismax(
        doc_ids, {"body": body, "title": titles}, WEIGHTS, PARAMS, tie
    )
    got = run.reset_index(drop=True)
    got["rank"] = got["rank"].astype(int)
    want["rank"] = want["rank"].astype(int)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dismax_differs_from_sum_and_single_field_reduces(fielded):
    dirs, *_ = fielded
    dm = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="dismax")
    sm = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="sum")
    assert not dm.equals(sm)  # max ≠ sum when terms hit both fields
    # one field: max == sum == plain search
    a = search_fielded({"body": dirs["body"]}, QUERIES, {"body": 1.0}, PARAMS,
                       mode="dismax", tie_breaker=0.7)
    b = search(dirs["body"], QUERIES, PARAMS)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def test_dismax_bad_tie_breaker_raises(fielded):
    dirs, *_ = fielded
    with pytest.raises(ValueError, match="tie_breaker"):
        search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="dismax",
                       tie_breaker=1.5)


def _oracle_cross_fields(doc_ids, fields_texts, weights, params):
    """Term-centric: blended idf (df = max over fields), per-term best
    weighted field contribution, summed over terms."""
    from splade_ray.analysis import term_counts
    from splade_ray.bm25 import idf, tf_component

    ois = {f: OracleIndex(doc_ids, texts, params) for f, texts in fields_texts.items()}
    ids = np.asarray(doc_ids, np.int64)
    n_docs = ids.size
    rows = []
    for qid, text in QUERIES:
        q = term_counts(text)
        total = np.zeros(ids.size, np.float64)
        hit = False
        for term in sorted(q):
            df_blend = max(
                (len(oi.postings[term][0]) for oi in ois.values()
                 if term in oi.postings),
                default=0,
            )
            if df_blend == 0:
                continue
            best = None
            for f in sorted(ois):
                oi = ois[f]
                if term not in oi.postings:
                    continue
                pos, tf = oi.postings[term]
                contrib = np.zeros(ids.size, np.float64)
                contrib[pos] = weights[f] * tf_component(
                    tf, oi.doc_lens[pos], oi.avgdl, params
                )
                best = contrib if best is None else np.maximum(best, contrib)
            hit = True
            total += (idf(df_blend, n_docs) * q[term]) * best
        if not hit:
            continue
        docs, scs = topk_from_scores(ids, total, params.top_k, params.threshold)
        for r, (d, s) in enumerate(zip(docs, scs), start=1):
            rows.append((qid, r, int(d), float(s)))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def test_cross_fields_matches_oracle(fielded):
    dirs, doc_ids, body, titles = fielded
    got = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode="cross_fields")
    want = _oracle_cross_fields(
        doc_ids, {"body": body, "title": titles}, WEIGHTS, PARAMS
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(np.float64), want["score"].to_numpy(np.float64),
        rtol=1e-12,
    )


def test_cross_fields_differs_from_sum_and_dismax(fielded):
    dirs, *_ = fielded
    runs = {
        m: search_fielded(dirs, QUERIES, WEIGHTS, PARAMS, mode=m)
        for m in ("sum", "dismax", "cross_fields")
    }
    orders = {
        m: r.sort_values(["query_id", "rank"])[["doc_id", "score"]].round(9)
           .to_records(index=False).tolist()
        for m, r in runs.items()
    }
    assert orders["cross_fields"] != orders["sum"]
    assert orders["cross_fields"] != orders["dismax"]
