"""Doc-values (range filter / sort-by-field / counts / histogram),
SynonymQuery scoring, and wildcard expansion — brute-force parity tests."""

import fnmatch

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.docvalues import (
    match_counts,
    numeric_histogram,
    range_search,
    sort_search,
)
from splade_ray.oracle import OracleIndex
from splade_ray.suggest import expand_wildcard, wildcard_search
from splade_ray.synonyms import synonym_search

N = 140


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=31)
    texts = t["content"].to_pylist()
    sizes = np.array([len(x) for x in texts], np.int64)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N, dtype=np.int64)),
                "content": t["content"],
                "n_bytes": pa.array(sizes),
                "cat": pa.array(_cats(), pa.string()),
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(
        corpus, index_dir, text_col="content", id_col="doc_id",
        rows_per_segment=35, extra_doc_cols=("n_bytes", "cat"),
    )
    return index_dir, texts, sizes


def _cats() -> list[str]:
    """Deterministic string sidecar column (5 categories)."""
    return [f"s{i % 5}" for i in range(N)]


QUERIES = [(1, "def parse merge"), (2, "return x1 += 1"), (3, "zzz_nosuchterm")]


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


def _matched(oi: OracleIndex, text: str) -> np.ndarray:
    m = np.zeros(oi.n_docs, bool)
    for term in term_counts(text):
        if term in oi.postings:
            m[oi.postings[term][0]] = True
    return m


def test_range_search_matches_bruteforce(built):
    index_dir, texts, sizes = built
    p = BM25Params(top_k=7)
    lo, hi = 150, 700
    got = range_search(index_dir, QUERIES, p, numeric_col="n_bytes", lo=lo, hi=hi)
    oi = OracleIndex(list(range(N)), texts, p)
    keep = (sizes >= lo) & (sizes <= hi)
    rows = []
    for qid, text in QUERIES:
        scores = np.where(keep, _dense_scores(oi, text, p), -np.inf)
        docs, scs = topk_from_scores(oi.doc_ids, scores, p.top_k, p.threshold)
        rows.extend(
            (qid, r + 1, int(d), float(s)) for r, (d, s) in enumerate(zip(docs, scs))
        )
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["doc_id"].map(lambda d: lo <= sizes[d] <= hi).all()


def test_range_search_unbounded_equals_search(built):
    index_dir, texts, _ = built
    from splade_ray.query import search

    p = BM25Params(top_k=5)
    got = range_search(index_dir, QUERIES[:2], p, numeric_col="n_bytes")
    want = search(index_dir, QUERIES[:2], p)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_sort_search_matches_bruteforce(built):
    index_dir, texts, sizes = built
    oi = OracleIndex(list(range(N)), texts)
    for desc in (True, False):
        got = sort_search(
            index_dir, QUERIES, sort_col="n_bytes", descending=desc, top_k=6
        )
        rows = []
        for qid, text in QUERIES:
            cand = np.flatnonzero(_matched(oi, text))
            order = cand[np.lexsort((cand, -sizes[cand] if desc else sizes[cand]))]
            for r, d in enumerate(order[:6]):
                rows.append((qid, r + 1, int(d), int(sizes[d])))
        want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "sort_value"])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_match_counts_and_histogram(built):
    index_dir, texts, sizes = built
    oi = OracleIndex(list(range(N)), texts)
    got = match_counts(index_dir, QUERIES)
    want = {qid: int(_matched(oi, text).sum()) for qid, text in QUERIES}
    assert dict(zip(got["query_id"], got["n_docs"])) == want
    assert want[3] == 0  # no-match query still gets its zero row

    interval = 200
    hist = numeric_histogram(
        index_dir, QUERIES[:2], numeric_col="n_bytes", interval=interval
    )
    for qid, text in QUERIES[:2]:
        m = _matched(oi, text)
        b = (sizes[m] // interval) * interval
        wantc = pd.Series(b).value_counts().sort_index()
        gotc = hist[hist["query_id"] == qid].set_index("bucket")["n_docs"]
        assert gotc.to_dict() == wantc.to_dict()
    # histogram mass equals the match count
    tot = hist.groupby("query_id")["n_docs"].sum().to_dict()
    assert tot == {q: want[q] for q in tot}


def test_docvalues_respect_tombstones(built, tmp_path):
    index_dir, texts, sizes = built
    from splade_ray.delete import delete_docs

    oi = OracleIndex(list(range(N)), texts)
    qid, text = QUERIES[0]
    dead = [int(d) for d in np.flatnonzero(_matched(oi, text))[:3]]
    before = match_counts(index_dir, [(qid, text)])["n_docs"].iloc[0]
    delete_docs(index_dir, dead)
    after = match_counts(index_dir, [(qid, text)])["n_docs"].iloc[0]
    assert after == before - len(dead)
    got = sort_search(index_dir, [(qid, text)], sort_col="n_bytes", top_k=N)
    assert not set(dead) & set(got["doc_id"])


def test_synonym_search_matches_bruteforce(built):
    index_dir, texts, sizes = built
    p = BM25Params(top_k=8)
    syn = {"def": ["fn", "func"], "merge": ["join"]}
    queries = [(1, "def parse"), (2, "merge sort def")]
    got = synonym_search(index_dir, queries, syn, p)

    oi = OracleIndex(list(range(N)), texts, p)
    rows = []
    for qid, text in queries:
        q = term_counts(text)
        scores = np.zeros(N, np.float64)
        for t in sorted(q):
            members = sorted({t, *syn.get(t, [])} & set(oi.postings))
            if not members:
                continue
            tf_fold = np.zeros(N, np.int64)
            for m in members:
                pos, tf = oi.postings[m]
                tf_fold[pos] += tf
            df_g = max(len(oi.postings[m][0]) for m in members)
            mpos = np.flatnonzero(tf_fold)
            w = idf(df_g, N) * q[t]
            scores[mpos] += w * tf_component(
                tf_fold[mpos], oi.doc_lens[mpos], oi.avgdl, p
            )
        docs, scs = topk_from_scores(oi.doc_ids, scores, p.top_k, p.threshold)
        rows.extend(
            (qid, r + 1, int(d), float(s)) for r, (d, s) in enumerate(zip(docs, scs))
        )
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_synonym_group_is_one_term_not_or_query(built):
    """A doc containing both spellings is saturated once (summed tf), not
    rewarded twice — the SynonymQuery-vs-BooleanQuery distinction."""
    index_dir, texts, _ = built
    from splade_ray.query import search

    p = BM25Params(top_k=N)
    syn_run = synonym_search(index_dir, [(1, "def")], {"def": ["return"]}, p)
    or_run = search(index_dir, [(1, "def return")], p)
    both = [
        i for i, tx in enumerate(texts)
        if "def" in term_counts(tx) and "return" in term_counts(tx)
    ]
    assert both, "fixture must contain docs with both terms"
    s_syn = syn_run.set_index("doc_id")["score"]
    s_or = or_run.set_index("doc_id")["score"]
    d = both[0]
    assert s_syn[d] < s_or[d]  # folded tf saturates below the two-term sum


def test_wildcard_expansion_and_search(built):
    index_dir, texts, _ = built
    vocab = sorted({t for tx in texts for t in term_counts(tx)})
    for pattern in ("par*", "*urn", "x?", "merge"):
        got = expand_wildcard(index_dir, pattern, max_terms=50)
        want = sorted(fnmatch.filter(vocab, pattern))[:50]
        assert got == want, pattern

    from splade_ray.query import search

    p = BM25Params(top_k=6)
    run = wildcard_search(index_dir, [(1, "par*")], p)
    expanded = " ".join(expand_wildcard(index_dir, "par*", max_terms=128))
    want = search(index_dir, [(1, expanded)], p)
    pd.testing.assert_frame_equal(run, want, check_dtype=False)


def test_regexp_expansion_and_search(built):
    import re

    from splade_ray.suggest import expand_regexp, regexp_search

    index_dir, texts, _ = built
    vocab = sorted({t for tx in texts for t in term_counts(tx)})
    for pattern in ("par.*", ".*urn", "x.", "merge", "m[ae]rge[sd]?",
                    "(sun|moon)s?", "p.{2}t.*"):
        got = expand_regexp(index_dir, pattern, max_terms=50)
        rx = re.compile(pattern)
        want = sorted(t for t in vocab if rx.fullmatch(t))[:50]
        assert got == want, pattern
    # anchored: a mid-term match is NOT a hit (the ES RegexpQuery contract)
    assert all("ar" in t and t.startswith("par")
               for t in expand_regexp(index_dir, "par.*"))
    assert expand_regexp(index_dir, "urn") == (
        ["urn"] if "urn" in vocab else [])

    from splade_ray.query import search

    p = BM25Params(top_k=6)
    run = regexp_search(index_dir, [(1, "par.*")], p)
    expanded = " ".join(expand_regexp(index_dir, "par.*", max_terms=128))
    want = search(index_dir, [(1, expanded)], p)
    pd.testing.assert_frame_equal(run, want, check_dtype=False)
    # no expansion -> typed empty run
    none = regexp_search(index_dir, [(1, "zzz.*qqq")], p)
    assert none.empty and list(none.columns) == list(run.columns)

    with pytest.raises(ValueError, match="empty"):
        expand_regexp(index_dir, "")


def test_regexp_prefix_pushdown_quantifier_and_alternation(ray_session,
                                                           tmp_path):
    """The pushdown prefix must back off when the first metachar
    quantifies the last literal ('ab*' matches 'a'; 'ab?c' matches 'ac')
    and must be dropped entirely for a top-level alternation
    ('sun|moon' matches 'moon') — Lucene CompiledAutomaton.commonPrefix
    semantics (round-3 ADVICE high item)."""
    import re

    from splade_ray.suggest import expand_regexp

    words = ["a", "ab", "abb", "abc", "ac", "sun", "suns", "moon", "xy"]
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "content": pa.array([" ".join(words)])}),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id")
    for pattern in ("ab*", "ab?c", "sun|moon", "a|b", "ab{0,1}", "ab{1,2}",
                    "(sun)|(moon)s?", "[am].*"):
        rx = re.compile(pattern)
        want = sorted(w for w in words if rx.fullmatch(w))
        assert expand_regexp(index_dir, pattern) == want, pattern


def test_range_filter_on_all_serving_paths(built):
    """search(range_filter) across exact/bmw/auto kernels and the persistent
    Searcher all return the identical filtered run (BMW routes to exact)."""
    from splade_ray.query import Searcher, search

    index_dir, texts, sizes = built
    p = BM25Params(top_k=7)
    rf = ("n_bytes", 150, 700)
    base = range_search(
        index_dir, QUERIES, p, numeric_col="n_bytes", lo=150, hi=700
    )
    for method in ("exact", "bmw", "auto"):
        got = search(index_dir, QUERIES, p, method=method, range_filter=rf)
        pd.testing.assert_frame_equal(got, base, check_dtype=False)
    s = Searcher(index_dir, num_shards=2)
    got = s.search(QUERIES, p, range_filter=rf)
    s.shutdown()
    pd.testing.assert_frame_equal(got, base, check_dtype=False)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        search(index_dir, QUERIES, p, method="quantized", range_filter=rf)


def test_numeric_stats_matches_bruteforce(built):
    from splade_ray.docvalues import numeric_stats

    index_dir, texts, sizes = built
    oi = OracleIndex(list(range(N)), texts)
    got = numeric_stats(index_dir, QUERIES, numeric_col="n_bytes")
    rows = []
    for qid, text in QUERIES:
        m = _matched(oi, text)
        if not m.any():
            continue
        v = sizes[m]
        rows.append((qid, int(m.sum()), int(v.sum()), int(v.min()), int(v.max())))
    want = pd.DataFrame(
        rows, columns=["query_id", "n_docs", "sum_value", "min_value", "max_value"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert 3 not in got["query_id"].values  # zero-match query omitted


def test_extended_stats_variance(built):
    from splade_ray.docvalues import extended_stats_derive, numeric_stats

    index_dir, texts, sizes = built
    oi = OracleIndex(list(range(N)), texts)
    got = numeric_stats(index_dir, QUERIES, numeric_col="n_bytes", extended=True)
    derived = extended_stats_derive(got)
    for _, r in got.iterrows():
        m = _matched(oi, dict(QUERIES)[r["query_id"]])
        v = sizes[m]
        assert r["sum_sq"] == int((v.astype(np.int64) ** 2).sum())
        d = derived[derived.query_id == r["query_id"]].iloc[0]
        np.testing.assert_allclose(d["avg"], v.mean(), rtol=1e-12)
        np.testing.assert_allclose(d["variance"], v.var(), rtol=1e-9)
        np.testing.assert_allclose(d["std_deviation"], v.std(), rtol=1e-9)


def test_sort_search_after_pages_tile(built):
    index_dir, texts, sizes = built
    qid, text = QUERIES[0]
    full = sort_search(index_dir, [(qid, text)], sort_col="n_bytes", top_k=10_000)
    pages, cur = [], None
    while True:
        page = sort_search(
            index_dir, [(qid, text)], sort_col="n_bytes", top_k=5,
            after={qid: cur} if cur else None,
        )
        if page.empty:
            break
        assert page["rank"].tolist() == list(range(1, len(page) + 1))
        pages.append(page)
        last = page.iloc[-1]
        cur = (int(last["sort_value"]), int(last["doc_id"]))
        if len(page) < 5:
            break
    tiled = pd.concat(pages, ignore_index=True)
    assert tiled["doc_id"].tolist() == full["doc_id"].tolist()
    assert tiled["sort_value"].tolist() == full["sort_value"].tolist()


def test_string_range_filter_matches_postfilter(built):
    """TermRangeQuery analog: string bounds on a string sidecar column
    filter lexicographically, identical to a post-filter of the unfiltered
    run (the filter never changes corpus stats)."""
    index_dir, texts, _ = built
    cats = np.array(_cats())
    p = BM25Params(top_k=N)
    full = range_search(index_dir, QUERIES[:2], p, numeric_col="cat")
    lo, hi = "s1", "s3"
    got = range_search(index_dir, QUERIES[:2], p, numeric_col="cat", lo=lo, hi=hi)
    keep = full[full["doc_id"].map(lambda d: lo <= cats[d] <= hi)].copy()
    keep["rank"] = (
        keep.groupby("query_id").cumcount().add(1).to_numpy(np.int32)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), keep.reset_index(drop=True), check_dtype=False
    )
    assert 0 < len(got) < len(full)

    # string bounds on a numeric column must raise, not silently compare
    with pytest.raises((TypeError, Exception)):
        range_search(index_dir, QUERIES[:1], p, numeric_col="n_bytes", lo="s1")


def test_multi_sort_search_matches_bruteforce(built):
    """Multi-field Sort (string asc, numeric desc, doc_id asc tie)."""
    index_dir, texts, sizes = built
    cats = np.array(_cats())
    oi = OracleIndex(list(range(N)), texts)
    got = sort_search(
        index_dir, QUERIES, sort_keys=[("cat", False), ("n_bytes", True)],
        top_k=9,
    )
    rows = []
    for qid, text in QUERIES:
        cand = np.flatnonzero(_matched(oi, text))
        df = pd.DataFrame(
            {"doc_id": cand, "cat": cats[cand], "n_bytes": sizes[cand]}
        ).sort_values(
            ["cat", "n_bytes", "doc_id"], ascending=[True, False, True],
            kind="mergesort",
        )
        for r, t in enumerate(df.head(9).itertuples()):
            rows.append((qid, r + 1, int(t.doc_id), t.cat, int(t.n_bytes)))
    want = pd.DataFrame(
        rows, columns=["query_id", "rank", "doc_id", "cat", "n_bytes"]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_multi_sort_after_pages_tile(built):
    index_dir, texts, _ = built
    qid, text = QUERIES[0]
    keys = [("cat", False), ("n_bytes", True)]
    full = sort_search(index_dir, [(qid, text)], sort_keys=keys, top_k=10_000)
    pages, cur = [], None
    while True:
        page = sort_search(
            index_dir, [(qid, text)], sort_keys=keys, top_k=4,
            after={qid: cur} if cur else None,
        )
        if page.empty:
            break
        assert page["rank"].tolist() == list(range(1, len(page) + 1))
        pages.append(page)
        last = page.iloc[-1]
        cur = (str(last["cat"]), int(last["n_bytes"]), int(last["doc_id"]))
        if len(page) < 4:
            break
    tiled = pd.concat(pages, ignore_index=True)
    assert tiled["doc_id"].tolist() == full["doc_id"].tolist()
    assert tiled["cat"].tolist() == full["cat"].tolist()


def test_boolean_search_range_filter(built):
    """BooleanQuery FILTER clause: range_filter constrains boolean matches
    exactly like a post-filter on the unfiltered run."""
    from splade_ray.boolq import boolean_search

    index_dir, texts, sizes = built
    q = [(1, {"should": "def parse merge return"})]
    p = BM25Params(top_k=N)
    full = boolean_search(index_dir, q, p)
    lo, hi = 150, 700
    got = boolean_search(index_dir, q, p, range_filter=("n_bytes", lo, hi))
    keep = full[full["doc_id"].map(lambda d: lo <= sizes[d] <= hi)].copy()
    keep["rank"] = np.arange(1, len(keep) + 1, dtype=np.int32)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), keep.reset_index(drop=True), check_dtype=False
    )
    assert len(got) < len(full)


def test_explain_sums_to_run_score(built):
    """Lucene explain analog: per-term contribs sum bit-exactly to the run
    score for both BM25 and QL; global df column matches the corpus."""
    from splade_ray.query import explain, search

    index_dir, texts, _ = built
    p = BM25Params(top_k=5)
    oi = OracleIndex(list(range(N)), texts, p)
    for scoring in ("bm25", "ql"):
        run = search(index_dir, QUERIES[:2], p, scoring=scoring)
        exp = explain(
            index_dir, QUERIES[:2], run["doc_id"].tolist(), p, scoring=scoring
        )
        sums = exp.groupby(["query_id", "doc_id"])["contrib"].sum()
        for r in run.itertuples():
            # fixed per-term iteration order on both sides -> exact sums
            # are equal up to summation-order association; allow 1e-12
            assert abs(sums[(r.query_id, r.doc_id)] - r.score) < 1e-9
    # df column is the GLOBAL docFreq
    exp = explain(index_dir, [(1, "def")], [0, 1, 2, 3, 4, 5])
    want_df = len(oi.postings["def"][0])
    assert (exp[exp["term"] == "def"]["df"] == want_df).all()


def test_explain_excludes_tombstoned_docs(built):
    from splade_ray.delete import delete_docs
    from splade_ray.query import explain, search

    index_dir, texts, _ = built
    run = search(index_dir, QUERIES[:1], BM25Params(top_k=3))
    victim = int(run["doc_id"].iloc[0])
    delete_docs(index_dir, [victim])
    exp = explain(index_dir, QUERIES[:1], [victim])
    assert exp.empty


def test_cli_explain(built, tmp_path, capsys):
    import json

    from splade_ray.cli import main
    from splade_ray.query import explain, search

    index_dir, texts, _ = built
    q = tmp_path / "q.tsv"
    q.write_text("1\tdef parse merge\n")
    run = search(index_dir, [(1, "def parse merge")], BM25Params(top_k=3))
    ids = ",".join(str(d) for d in run["doc_id"])
    out = str(tmp_path / "explain.parquet")
    assert main(["explain", "--index", index_dir, "--queries", str(q),
                 "--doc-ids", ids, "--out", out]) == 0
    got = pd.read_parquet(out)
    want = explain(index_dir, [(1, "def parse merge")],
                   run["doc_id"].tolist(), BM25Params())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------- function_score

FS = [
    {"field_value_factor": {"field": "n_bytes", "factor": 0.01,
                            "modifier": "log1p"}},
    {"gauss": {"field": "n_bytes", "origin": 400.0, "scale": 250.0,
               "offset": 30.0, "decay": 0.5}},
    {"exp": {"field": "n_bytes", "origin": 0.0, "scale": 900.0,
             "decay": 0.6}},
    {"linear": {"field": "n_bytes", "origin": 150.0, "scale": 300.0,
                "decay": 0.3}},
]


def _fs_multiplier(sizes: np.ndarray) -> np.ndarray:
    """Brute ES closed forms, independent of the kernel's code path."""
    v = sizes.astype(np.float64)
    fvf = np.log1p(0.01 * v)
    d_g = np.maximum(0.0, np.abs(v - 400.0) - 30.0)
    gauss = np.exp(-(d_g ** 2) / (2 * (-(250.0 ** 2) / (2 * np.log(0.5)))))
    d_e = np.maximum(0.0, np.abs(v))
    expf = np.exp(np.log(0.6) / 900.0 * d_e)
    d_l = np.maximum(0.0, np.abs(v - 150.0))
    s = 300.0 / 0.7
    lin = np.maximum(0.0, (s - d_l) / s)
    return fvf * gauss * expf * lin


def test_function_score_matches_bruteforce(built):
    from splade_ray.docvalues import function_score_search

    index_dir, texts, sizes = built
    p = BM25Params(top_k=8)
    got = function_score_search(index_dir, QUERIES, p, functions=FS)
    oi = OracleIndex(list(range(N)), texts, p)
    mult = _fs_multiplier(sizes)
    rows = []
    for qid, text in QUERIES:
        scores = _dense_scores(oi, text, p) * mult
        docs, scs = topk_from_scores(oi.doc_ids, scores, p.top_k, p.threshold)
        rows.extend(
            (qid, r + 1, int(d), float(s)) for r, (d, s) in enumerate(zip(docs, scs))
        )
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12, rtol=1e-12)


def test_function_score_bmw_routes_to_exact(built):
    """method='bmw'/'auto' with functions returns the identical run (block-max
    bounds don't model multipliers, so the kernel must route to exact)."""
    from splade_ray.query import search

    index_dir, _, _ = built
    p = BM25Params(top_k=6)
    exact = search(index_dir, QUERIES[:2], p, functions=FS)
    for m in ("bmw", "auto"):
        got = search(index_dir, QUERIES[:2], p, method=m, functions=FS)
        pd.testing.assert_frame_equal(got, exact, check_dtype=False)


def test_function_score_validation(built):
    from splade_ray.query import canonical_functions, search

    index_dir, _, _ = built
    with pytest.raises(ValueError, match="modifier"):
        canonical_functions([{"field_value_factor": {"field": "x", "modifier": "sq"}}])
    with pytest.raises(ValueError, match="decay"):
        canonical_functions([{"gauss": {"field": "x", "origin": 0, "scale": 10,
                                        "decay": 1.0}}])
    with pytest.raises(ValueError, match="unknown score function"):
        canonical_functions([{"random_score": {}}])
    with pytest.raises(ValueError, match="float kernels"):
        search(index_dir, QUERIES[:1], BM25Params(), method="quantized",
               functions=FS)


# ---------------------------------------------------------------- block join

def test_block_join_matches_bruteforce(built):
    """All five score modes vs a driver-side brute aggregate over the `cat`
    parent column (children of one parent deliberately span segments:
    cat = i % 5 with rows_per_segment=35)."""
    from splade_ray.docvalues import block_join_search

    index_dir, texts, _ = built
    p = BM25Params(top_k=4)
    cats = np.array(_cats())
    oi = OracleIndex(list(range(N)), texts, p)
    for mode in ("max", "sum", "min", "avg", "count"):
        got = block_join_search(index_dir, QUERIES, p, parent_col="cat",
                                score_mode=mode, top_k=4)
        rows = []
        for qid, text in QUERIES:
            scores = _dense_scores(oi, text, p)
            hit = np.flatnonzero(scores > 0)
            if hit.size == 0:
                continue
            df = pd.DataFrame({"parent": cats[hit], "score": scores[hit]})
            g = df.groupby("parent")["score"]
            agg = {"max": g.max(), "sum": g.sum(), "min": g.min(),
                   "avg": g.mean(), "count": g.count().astype(float)}[mode]
            n = g.count()
            a = pd.DataFrame({"score": agg, "n_children": n}).reset_index()
            a = a.sort_values(["score", "parent"], ascending=[False, True],
                              kind="mergesort").head(4)
            rows.extend((qid, r + 1, pr, sc, int(nc)) for r, (pr, sc, nc) in
                        enumerate(zip(a["parent"], a["score"], a["n_children"])))
        want = pd.DataFrame(rows, columns=["query_id", "rank", "parent",
                                           "score", "n_children"])
        pd.testing.assert_frame_equal(
            got, want, check_dtype=False, atol=1e-9, rtol=1e-9,
        )


def test_block_join_children_span_segments(built):
    """Sanity: at least one returned parent has children in more than one
    segment (the cross-segment partial-combine path is exercised)."""
    from splade_ray.docvalues import block_join_search

    index_dir, texts, _ = built
    got = block_join_search(index_dir, QUERIES[:1], BM25Params(),
                            parent_col="cat", score_mode="count", top_k=5)
    # 35 docs/segment, cat = i % 5: any parent with > 7 children must span
    assert (got["n_children"] > 7).any()
    with pytest.raises(ValueError, match="score_mode"):
        block_join_search(index_dir, QUERIES[:1], BM25Params(),
                          parent_col="cat", score_mode="geo", top_k=5)


# ---------------------------------------------------------------- rank_feature

RF = [
    {"field": "n_bytes", "boost": 2.0, "function": {"saturation": {"pivot": 300.0}}},
    {"field": "n_bytes", "boost": 0.3, "function": {"log": {"scaling_factor": 1.0}}},
    {"field": "n_bytes", "boost": 1.5,
     "function": {"sigmoid": {"pivot": 400.0, "exponent": 2.0}}},
    {"field": "n_bytes", "boost": 0.002, "function": {"linear": {}}},
]


def test_rank_feature_matches_bruteforce(built):
    from splade_ray.docvalues import rank_feature_search

    index_dir, texts, sizes = built
    p = BM25Params(top_k=8)
    got = rank_feature_search(index_dir, QUERIES, p, rank_features=RF)
    v = sizes.astype(np.float64)
    bonus = (2.0 * (v / (v + 300.0)) + 0.3 * np.log(1.0 + v)
             + 1.5 * (v ** 2 / (v ** 2 + 400.0 ** 2)) + 0.002 * v)
    oi = OracleIndex(list(range(N)), texts, p)
    rows = []
    for qid, text in QUERIES:
        base = _dense_scores(oi, text, p)
        scores = np.where(base > 0, base + bonus, base)
        docs, scs = topk_from_scores(oi.doc_ids, scores, p.top_k, p.threshold)
        rows.extend(
            (qid, r + 1, int(d), float(s)) for r, (d, s) in enumerate(zip(docs, scs))
        )
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-12, rtol=1e-12)


def test_rank_feature_never_matches_nonmatching_docs(built):
    """A query with zero matching terms returns nothing even though every
    doc has a positive rank_feature bonus."""
    from splade_ray.docvalues import rank_feature_search

    index_dir, _, _ = built
    got = rank_feature_search(index_dir, [(9, "zzz_nosuchterm")],
                              BM25Params(top_k=5), rank_features=RF)
    assert got.empty


# ---------------------------------------------------------------- composite agg

def test_composite_agg_pages_match_bruteforce(built):
    """Full pagination sweep: pages chained via after_keys reproduce the
    brute (cat,) bucket list exactly, counts complete on every page."""
    from splade_ray.docvalues import composite_agg

    index_dir, texts, _ = built
    cats = np.array(_cats())
    oi = OracleIndex(list(range(N)), texts, BM25Params())
    for qid, text in QUERIES[:2]:
        m = _matched(oi, text)
        want = (
            pd.DataFrame({"cat": cats[np.flatnonzero(m)]})
            .groupby("cat", as_index=False).size()
            .rename(columns={"size": "n_docs"})
            .sort_values("cat").reset_index(drop=True)
        )
        got_rows = []
        after = None
        while True:
            page, ak = composite_agg(index_dir, [(qid, text)],
                                     sources=["cat"], size=2, after=after)
            if page.empty:
                break
            got_rows.append(page)
            after = ak
        got = (pd.concat(got_rows, ignore_index=True)[["cat", "n_docs"]]
               if got_rows else pd.DataFrame(columns=["cat", "n_docs"]))
        pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                      check_dtype=False)


def test_composite_agg_multi_source_order(built):
    """Two sources: ascending (cat, n_bytes) tuple order, page boundary in
    the middle of one cat group."""
    from splade_ray.docvalues import composite_agg

    index_dir, texts, sizes = built
    cats = np.array(_cats())
    oi = OracleIndex(list(range(N)), texts, BM25Params())
    qid, text = QUERIES[0]
    m = np.flatnonzero(_matched(oi, text))
    want = (
        pd.DataFrame({"cat": cats[m], "n_bytes": sizes[m]})
        .groupby(["cat", "n_bytes"], as_index=False).size()
        .rename(columns={"size": "n_docs"})
        .sort_values(["cat", "n_bytes"]).reset_index(drop=True)
    )
    p1, ak = composite_agg(index_dir, [(qid, text)],
                           sources=["cat", "n_bytes"], size=7)
    p2, _ = composite_agg(index_dir, [(qid, text)],
                          sources=["cat", "n_bytes"], size=7, after=ak)
    got = pd.concat([p1, p2], ignore_index=True)[["cat", "n_bytes", "n_docs"]]
    pd.testing.assert_frame_equal(got, want.head(14), check_dtype=False)


def test_top_hits_matches_bruteforce(built):
    from splade_ray.docvalues import top_hits_agg

    index_dir, texts, _ = built
    p = BM25Params(top_k=10)
    got = top_hits_agg(
        index_dir, QUERIES, p, group_col="cat", hits_per_bucket=2
    )
    oi = OracleIndex(np.arange(N, dtype=np.int64), texts, p)
    cats = _cats()
    want_rows = []
    for qid, text in QUERIES:
        scores = _dense_scores(oi, text, p)
        by_bucket: dict = {}
        for d in np.flatnonzero(scores > 0):
            by_bucket.setdefault(cats[d], []).append((d, scores[d]))
        for b in sorted(by_bucket):
            hits = sorted(by_bucket[b], key=lambda x: (-x[1], x[0]))[:2]
            for r, (d, s) in enumerate(hits, start=1):
                want_rows.append((qid, b, r, d, s))
    want = pd.DataFrame(
        want_rows, columns=["query_id", "bucket", "hit_rank", "doc_id", "score"]
    )
    assert got[["query_id", "bucket", "hit_rank", "doc_id"]].values.tolist() == \
        want[["query_id", "bucket", "hit_rank", "doc_id"]].values.tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(np.float64), want["score"].to_numpy(np.float64),
        rtol=1e-12,
    )


def test_adjacency_matrix_matches_bruteforce(built):
    from splade_ray.analysis import tokenize
    from splade_ray.facets import adjacency_matrix

    index_dir, texts, _ = built
    filters = [
        ("a_def", "def"),
        ("b_parse", "parse merge"),
        ("c_rare", "rare_token_3"),
        ("d_none", "zzz_nada"),
    ]
    got = adjacency_matrix(index_dir, filters)
    masks = {}
    for name, ftext in filters:
        fts = set(term_counts(ftext))
        masks[name] = np.array(
            [bool(fts & set(tokenize(t))) for t in texts], bool
        )
    want = []
    ns = sorted(masks)
    for i, a in enumerate(ns):
        for b in ns[i:]:
            c = int(np.count_nonzero(masks[a] & masks[b]))
            if c:
                want.append((a, b, c))
    assert [tuple(r) for r in got.values.tolist()] == want


def test_adjacency_matrix_duplicate_names_raise(built):
    from splade_ray.facets import adjacency_matrix

    with pytest.raises(ValueError, match="unique"):
        adjacency_matrix(built[0], [("x", "def"), ("x", "parse")])


def test_terms_set_matches_bruteforce(ray_session, tmp_path):
    from splade_ray.docvalues import terms_set_search

    t = synth_corpus(90, seed=13)
    texts = t["content"].to_pylist()
    req = np.arange(90, dtype=np.int64) % 4  # 0 never matches (ES guard)
    corpus = str(tmp_path / "ts.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(90, dtype=np.int64)),
                "content": t["content"],
                "req": pa.array(req),
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "ts-index")
    build_index(
        corpus, index_dir, text_col="content", id_col="doc_id",
        rows_per_segment=25, extra_doc_cols=("req",),
    )
    queries = [(1, "def parse merge"), (2, "return index"), (3, "zzz_nope")]
    p = BM25Params(top_k=12)
    got = terms_set_search(index_dir, queries, p, msm_col="req")
    oi = OracleIndex(np.arange(90, dtype=np.int64), texts, p)
    rows = []
    from splade_ray.analysis import tokenize

    for qid, text in queries:
        scores = _dense_scores(oi, text, p)
        qterms = {w for w in term_counts(text) if w in oi.postings}
        scored = []
        for d in range(90):
            present = sum(1 for w in qterms if w in set(tokenize(texts[d])))
            if req[d] >= 1 and present >= req[d] and scores[d] > 0:
                scored.append((d, scores[d]))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for r, (d, s) in enumerate(scored[:12], start=1):
            rows.append((qid, r, d, s))
    want = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    np.testing.assert_allclose(
        got["score"].to_numpy(np.float64), want["score"].to_numpy(np.float64),
        rtol=1e-12,
    )


def test_filters_and_range_agg(built):
    from splade_ray.docvalues import filters_agg, range_agg

    index_dir, texts, sizes = built
    oi = OracleIndex(list(range(N)), texts)
    cats = np.array(_cats())
    filters = {
        "small": ("range", "n_bytes", None, 300),
        "big": ("range", "n_bytes", 301, None),
        "s0s1": ("terms", "cat", ["s0", "s1"]),
    }
    got = filters_agg(index_dir, QUERIES, filters=filters)
    # every (query, filter) pair appears, zero-match query included
    assert len(got) == len(QUERIES) * len(filters)
    for qid, text in QUERIES:
        m = _matched(oi, text)
        want = {
            "small": int((m & (sizes <= 300)).sum()),
            "big": int((m & (sizes >= 301)).sum()),
            "s0s1": int((m & np.isin(cats, ["s0", "s1"])).sum()),
        }
        g = got[got["query_id"] == qid].set_index("filter")["n_docs"].to_dict()
        assert g == want

    ranges = [(None, 200), (200, 500), (500, None), (100, 400)]
    ra = range_agg(index_dir, QUERIES, numeric_col="n_bytes", ranges=ranges)
    assert len(ra) == len(QUERIES) * len(ranges)
    from splade_ray.docvalues import range_key

    for qid, text in QUERIES:
        m = _matched(oi, text)
        for lo, hi in ranges:
            keep = m.copy()
            if lo is not None:
                keep &= sizes >= lo
            if hi is not None:
                keep &= sizes < hi  # exclusive `to`
            row = ra[(ra["query_id"] == qid) & (ra["range_key"] == range_key(lo, hi))]
            assert row["n_docs"].iloc[0] == int(keep.sum())


def test_multi_terms_and_rare_terms(built):
    from splade_ray.docvalues import multi_terms_agg, rare_terms_agg

    index_dir, texts, sizes = built
    oi = OracleIndex(list(range(N)), texts)
    cats = np.array(_cats())
    band = (sizes // 300).astype(str)

    # build the index's own (cat, n_bytes//300) tuples? multi_terms over
    # (cat,) x sidecar n_bytes isn't a tuple of strings — use (cat, cat2)
    # where cat2 rides as a second string column: reuse cat + band via a
    # fresh index would be heavy; instead check (cat, n_bytes) tuples by
    # re-deriving from the sidecars the index already has.
    got = multi_terms_agg(index_dir, QUERIES[:2], cols=["cat", "n_bytes"], top=5)
    for qid, text in QUERIES[:2]:
        m = _matched(oi, text)
        df = pd.DataFrame({"cat": cats[m], "n_bytes": sizes[m]})
        cnt = df.groupby(["cat", "n_bytes"], as_index=False).size()
        cnt = cnt.sort_values(["size", "cat", "n_bytes"],
                              ascending=[False, True, True], kind="mergesort")
        want = cnt.head(5)
        g = got[got["query_id"] == qid]
        assert g["n_docs"].tolist() == want["size"].tolist()
        assert g["cat"].tolist() == want["cat"].tolist()
        assert list(g["rank"]) == list(range(1, len(g) + 1))

    # rare n_bytes values (doc lengths are near-unique -> plenty of rares)
    rt = rare_terms_agg(index_dir, QUERIES[:2], col="n_bytes", max_doc_count=1)
    for qid, text in QUERIES[:2]:
        m = _matched(oi, text)
        vc = pd.Series(sizes[m]).value_counts()
        want = sorted(str(v) for v, c in vc.items() if c <= 1)
        g = rt[rt["query_id"] == qid]
        assert g["value"].tolist() == want
        assert (g["n_docs"] == 1).all()


def test_weighted_avg_agg(built):
    from splade_ray.docvalues import weighted_avg_agg

    index_dir, texts, sizes = built
    oi = OracleIndex(list(range(N)), texts)
    # weight = n_bytes itself is legal but degenerate; reuse n_bytes as value
    # and n_bytes as weight to validate the partials exactly
    got = weighted_avg_agg(index_dir, QUERIES, value_col="n_bytes",
                           weight_col="n_bytes")
    for qid, text in QUERIES:
        m = _matched(oi, text)
        g = got[got["query_id"] == qid]
        if not m.any():
            assert g.empty
            continue
        v = sizes[m].astype(np.int64)
        assert g["n_docs"].iloc[0] == int(m.sum())
        assert g["sum_vw"].iloc[0] == int((v * v).sum())
        assert g["sum_w"].iloc[0] == int(v.sum())


def test_match_percentiles_exact(built):
    from splade_ray.docvalues import match_percentiles

    index_dir, texts, sizes = built
    oi = OracleIndex(list(range(N)), texts)
    percents = (25.0, 50.0, 90.0, 100.0)
    got = match_percentiles(index_dir, QUERIES[:2], numeric_col="n_bytes",
                            percents=percents)
    for qid, text in QUERIES[:2]:
        m = _matched(oi, text)
        v = np.sort(sizes[m])
        for p in percents:
            need = max(int(np.ceil(p / 100.0 * v.size)), 1)
            want = int(v[need - 1])  # smallest value with cum >= need
            row = got[(got["query_id"] == qid) & (got["percent"] == p)]
            assert row["value"].iloc[0] == want, (qid, p)
    # p=100 is the max
    for qid, text in QUERIES[:2]:
        m = _matched(oi, text)
        row = got[(got["query_id"] == qid) & (got["percent"] == 100.0)]
        assert row["value"].iloc[0] == sizes[m].max()


def test_sort_index_layer_parity_and_resume(built):
    """Derived sort-order layer (Lucene index-time-sort analog): the
    early-terminating gather path returns byte-identical results to the
    lexsort path, across plain / searchAfter / tombstoned calls; rebuild
    skips; direction mismatch falls back."""
    from splade_ray.build import segment_dirs
    from splade_ray.docvalues import (
        _load_sort_index,
        build_sort_index,
        sort_search,
    )

    index_dir, texts, sizes = built
    p_args = dict(sort_col="n_bytes", descending=True, top_k=6)
    before = sort_search(index_dir, QUERIES, **p_args)
    r = build_sort_index(index_dir, "n_bytes", descending=True)
    assert r["n_built"] == r["n_segments"] > 0
    # layer present on every segment and the declared direction only
    seg = segment_dirs(index_dir)[0]
    assert _load_sort_index(seg, "n_bytes", True) is not None
    assert _load_sort_index(seg, "n_bytes", False) is None
    after_l = sort_search(index_dir, QUERIES, **p_args)
    pd.testing.assert_frame_equal(after_l, before)
    # ascending query on a descending layer: falls back, still correct
    asc = sort_search(index_dir, QUERIES, sort_col="n_bytes",
                      descending=False, top_k=6)
    assert (asc.groupby("query_id")["sort_value"].apply(
        lambda s: (s.diff().dropna() >= 0).all())).all()
    # searchAfter through the layer path
    cursors = {
        int(qid): (int(g["sort_value"].iloc[-1]), int(g["doc_id"].iloc[-1]))
        for qid, g in after_l.groupby("query_id")
    }
    page2 = sort_search(index_dir, QUERIES, after=cursors, **p_args)
    plain_cursor = sort_search(index_dir, QUERIES, after=cursors,
                               sort_col="n_bytes", descending=True, top_k=6)
    pd.testing.assert_frame_equal(page2, plain_cursor)
    # resume: nothing rebuilds
    r2 = build_sort_index(index_dir, "n_bytes", descending=True)
    assert r2["n_built"] == 0
    # tombstones respected through the gather path
    from splade_ray.delete import delete_docs

    victim = int(before["doc_id"].iloc[0])
    delete_docs(index_dir, [victim])
    gone = sort_search(index_dir, QUERIES, **p_args)
    assert victim not in set(gone["doc_id"])


def test_multi_key_sort_index_layer_parity_and_resume(built):
    """Multi-key derived sort-order layer (Lucene multi-field index sort,
    string key included): gather path byte-identical to the lexsort path
    across plain / searchAfter / tombstoned calls; resume skips; a
    different key spec or direction falls back."""
    from splade_ray.build import segment_dirs
    from splade_ray.docvalues import (
        _load_sort_index_multi,
        build_sort_index,
        sort_search,
    )

    index_dir, texts, sizes = built
    keys = [("cat", False), ("n_bytes", True)]
    p_args = dict(sort_keys=keys, top_k=6)
    before = sort_search(index_dir, QUERIES, **p_args)
    r = build_sort_index(index_dir, keys=keys)
    assert r["n_built"] == r["n_segments"] > 0
    seg = segment_dirs(index_dir)[0]
    assert _load_sort_index_multi(seg, keys) is not None
    assert _load_sort_index_multi(seg, [("cat", True), ("n_bytes", True)]) is None
    assert _load_sort_index_multi(seg, [("n_bytes", True), ("cat", False)]) is None
    after_l = sort_search(index_dir, QUERIES, **p_args)
    pd.testing.assert_frame_equal(after_l, before)
    # flipped direction on one key: falls back to lexsort, still correct
    flipped = sort_search(
        index_dir, QUERIES, sort_keys=[("cat", True), ("n_bytes", True)],
        top_k=6,
    )
    assert (flipped.groupby("query_id")["cat"].apply(
        lambda s: (s.iloc[:-1].to_numpy() >= s.iloc[1:].to_numpy()).all()
        if len(s) > 1 else True)).all()
    # searchAfter through the multi-key layer path
    cursors = {
        int(qid): (str(g["cat"].iloc[-1]), int(g["n_bytes"].iloc[-1]),
                   int(g["doc_id"].iloc[-1]))
        for qid, g in after_l.groupby("query_id")
    }
    page2 = sort_search(index_dir, QUERIES, after=cursors, **p_args)
    assert (page2["rank"].groupby(page2["query_id"]).first() == 1).all()
    # page2 equals rows 7..12 of the full ordering
    full = sort_search(index_dir, QUERIES, sort_keys=keys, top_k=12)
    want2 = full[full["rank"] > 6].copy()
    want2["rank"] -= 6
    pd.testing.assert_frame_equal(
        page2.reset_index(drop=True), want2.reset_index(drop=True),
        check_dtype=False,
    )
    # resume: nothing rebuilds; single-key layer coexists independently
    assert build_sort_index(index_dir, keys=keys)["n_built"] == 0
    r_single = build_sort_index(index_dir, "n_bytes", descending=True)
    assert r_single["n_built"] == r_single["n_segments"]
    assert build_sort_index(index_dir, keys=keys)["n_built"] == 0
    # tombstones respected through the gather path
    from splade_ray.delete import delete_docs

    victim = int(before["doc_id"].iloc[0])
    delete_docs(index_dir, [victim])
    gone = sort_search(index_dir, QUERIES, **p_args)
    assert victim not in set(gone["doc_id"])


def test_build_sort_index_arg_validation(built):
    from splade_ray.docvalues import build_sort_index

    index_dir, _, _ = built
    with pytest.raises(ValueError):
        build_sort_index(index_dir)
    with pytest.raises(ValueError):
        build_sort_index(index_dir, "n_bytes", keys=[("cat", False)])


def test_sort_perm_property(built, tmp_path):
    """Property: the multi-key permutation kernel (_sort_perm) equals a
    pandas lexicographic sort for random key specs over numeric + string
    columns, any direction mix."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from splade_ray.build import segment_dirs
    from splade_ray.docvalues import _sort_perm

    index_dir, _, _ = built
    seg = segment_dirs(index_dir)[0]
    import pyarrow.parquet as _pq

    dl = _pq.read_table(f"{seg}/doclens.parquet")
    ids = dl["doc_id"].to_numpy(zero_copy_only=False)
    frame = dl.to_pandas()

    @settings(max_examples=40, deadline=None)
    @given(
        keys=st.lists(
            st.tuples(st.sampled_from(["n_bytes", "cat"]), st.booleans()),
            min_size=1, max_size=3),
    )
    def check(keys):
        perm = _sort_perm(seg, keys, ids)
        cols = [c for c, _ in keys] + ["doc_id"]
        asc = [not d for _, d in keys] + [True]
        want = frame.sort_values(cols, ascending=asc,
                                 kind="mergesort").index.to_numpy()
        assert (perm == want).all(), keys

    check()
