"""Boolean-filtered BM25 retrieval: must / should / must_not clauses.

Beyond-reference operator (the reference scores pure bags of words,
``transformer_evaluator.py:142-193``): a query is three clause texts —
documents must contain EVERY ``must`` term, must contain NO ``must_not``
term, and are scored by BM25 over the ``must`` + ``should`` terms. This is
the classic boolean+ranked fulltext shape (Lucene's BooleanQuery with
MUST/SHOULD/MUST_NOT occurs).

Execution reuses the scatter-gather skeleton of ``splade_ray.query``:
clause terms are prepared driver-side (idf from the lexicon via
predicate-pushdown read), broadcast to one task per segment, filtered and
scored against the segment's postings, and the per-segment candidate heaps
merge through the same small ``groupby(query_id)`` reduce. Segments
partition the doc space, so clause evaluation is local to a segment: a doc
satisfies its must/must_not constraints entirely within the one segment
that holds it.

Semantics pinned for the oracle: a doc qualifies iff (every must term has
tf > 0) AND (no must_not term present) AND score > 0; score = the exact
BM25 sum over distinct must+should terms (clause texts are bags — a term's
qtf is its count across both clauses). Ties break (score desc, doc_id asc).

``minimum_should_match`` (per-query key, Lucene BooleanQuery's msm): when
the query has should terms, a doc additionally needs >= m DISTINCT should
terms present. m larger than the number of distinct should terms matches
nothing (Lucene semantics); m = 0 (default) keeps should purely optional.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import ray.data as rd

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores
from splade_ray.build import load_manifest, segment_dirs
from splade_ray.query import RUN_COLUMNS, SegmentIndex, merge_topk


def prepare_bool_queries(
    index_dir: str,
    queries: list[tuple[int, dict]],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
    stats_override: dict | None = None,
) -> dict:
    """Driver-side prep. Each query is ``(qid, {"must": text, "should":
    text, "must_not": text})`` (clauses optional). Returns the small
    broadcastable dict: per query the must term list, must_not term list,
    and (term, qtf, idf) scoring list over must+should.

    ``stats_override`` replaces the index's own corpus statistics (n_docs,
    avgdl, dfs) — the federated-search hook (``multi.boolean_search_multi``
    scores every member under the MultiReader union stats)."""
    params = params or BM25Params()
    if stats_override is not None:
        n_docs, avgdl = stats_override["n_docs"], stats_override["avgdl"]
    else:
        manifest = load_manifest(index_dir)
        n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]
    prepared = {}
    for qid, spec in queries:
        must = term_counts(spec.get("must", "") or "", query_lang)
        should = term_counts(spec.get("should", "") or "", query_lang)
        must_not = term_counts(spec.get("must_not", "") or "", query_lang)
        prepared[int(qid)] = {
            "must": sorted(must),
            "must_not": sorted(must_not),
            "should": sorted(should),
            "msm": int(spec.get("minimum_should_match", 0)),
            "score_tf": dict(must + should),  # Counter + Counter sums counts
        }
    score_terms = sorted({t for p in prepared.values() for t in p["score_tf"]})
    dfs: dict[str, int] = {}
    if stats_override is not None:
        dfs = {t: stats_override["dfs"][t] for t in score_terms
               if t in stats_override["dfs"]}
    elif score_terms:
        lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
            columns=["term", "df"], filter=pads.field("term").isin(score_terms)
        )
        dfs = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))
    for p in prepared.values():
        p["score"] = [
            (t, int(qtf), idf(dfs[t], n_docs))
            for t, qtf in sorted(p["score_tf"].items())
            if t in dfs
        ]
        del p["score_tf"]
    all_terms = sorted(
        {t for p in prepared.values() for t, _, _ in p["score"]}
        | {t for p in prepared.values() for t in p["must_not"]}
        | {t for p in prepared.values() for t in p["must"]}
    )
    return {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "params": params,
        "queries": prepared,
        "terms": all_terms,
    }


def score_segment_bool(seg: SegmentIndex, prepared: dict) -> list[tuple[int, int, float]]:
    """Boolean-filtered BM25 over one segment. Docs excluded by must /
    must_not clauses are masked OUT of the accumulator before the top-k."""
    p: BM25Params = prepared["params"]
    avgdl = prepared["avgdl"]
    n = seg.doc_ids.size
    rows: list[tuple[int, int, float]] = []

    # the shared decoded-posting cache (also applies tombstone filtering)
    positions = seg.pos_tfs

    # numeric doc-values FILTER clause (Lucene BooleanQuery FILTER occur):
    # constrains matches like a must clause, contributes no score
    base_allowed = seg.range_keep_mask(prepared)

    for qid, q in prepared["queries"].items():
        allowed = (
            base_allowed.copy() if base_allowed is not None else np.ones(n, bool)
        )
        dead = False
        for t in q["must"]:
            pos, _ = positions(t)
            if pos.size == 0:
                dead = True
                break
            m = np.zeros(n, bool)
            m[pos] = True
            allowed &= m
        if dead or not allowed.any():
            continue
        for t in q["must_not"]:
            pos, _ = positions(t)
            if pos.size:
                allowed[pos] = False
        if not allowed.any():
            continue
        msm = q.get("msm", 0)
        if msm > 0 and q.get("should"):
            # Lucene minimum_should_match: >= msm DISTINCT should terms
            # present; msm beyond the distinct-term count matches nothing
            cnt = np.zeros(n, np.int32)
            for t in q["should"]:
                pos, _ = positions(t)
                if pos.size:
                    cnt[pos] += 1
            allowed &= cnt >= msm
            if not allowed.any():
                continue
        scores = np.zeros(n, np.float64)
        for term, qtf, w in q["score"]:
            pos, tfs = positions(term)
            if pos.size == 0:
                continue
            scores[pos] += (w * qtf) * tf_component(tfs, seg.doc_lens[pos], avgdl, p)
        scores[~allowed] = 0.0
        docs, scs = topk_from_scores(seg.doc_ids, scores, p.top_k, p.threshold)
        rows.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
    return rows


def _bool_batch(batch: pa.Table, *, prepared: dict) -> pa.Table:
    rows: list[tuple[int, int, float]] = []
    for seg_dir in batch["seg_dir"].to_pylist():
        seg = SegmentIndex(
            seg_dir, prepared["terms"], tombstones=prepared.get("tombstones")
        )
        rows.extend(score_segment_bool(seg, prepared))
    return pa.table(
        {
            "query_id": pa.array(np.array([r[0] for r in rows], np.int64)),
            "doc_id": pa.array(np.array([r[1] for r in rows], np.int64)),
            "score": pa.array(np.array([r[2] for r in rows], np.float64)),
        }
    )


def boolean_search(
    index_dir: str,
    queries: list[tuple[int, dict]],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
    range_filter: tuple[str, float | None, float | None] | None = None,
    concurrency: int | None = None,
    stats_override: dict | None = None,
) -> pd.DataFrame:
    """One-shot boolean retrieval: run table (query_id, rank, doc_id, score)
    sorted by (query_id, rank). Same fan-out shape as ``query.search`` —
    one task per segment, lexicon-pruned parquet reads, heap merge.

    ``range_filter=(col, lo, hi)`` adds a numeric doc-values FILTER clause
    (constrains every query's matches, contributes no score)."""
    params = params or BM25Params()
    prepared = prepare_bool_queries(index_dir, queries, params,
                                    query_lang=query_lang,
                                    stats_override=stats_override)
    if range_filter:
        prepared = {**prepared, "range_filter": range_filter}
    from splade_ray.delete import load_tombstones

    tomb = load_tombstones(index_dir)
    if tomb.size:
        # tombstoned docs drop out of every clause via pos_tfs filtering
        # (a deleted doc can neither match a must clause nor block via
        # must_not — it simply no longer exists)
        prepared = {**prepared, "tombstones": tomb}
    segs = segment_dirs(index_dir)
    cand = rd.from_items(
        [{"seg_dir": s} for s in segs], override_num_blocks=len(segs)
    ).map_batches(
        _bool_batch,
        batch_format="pyarrow",
        batch_size=1,
        fn_kwargs={"prepared": prepared},
        concurrency=concurrency,
    )
    run = cand.groupby("query_id").map_groups(
        merge_topk, batch_format="pandas", fn_kwargs={"top_k": params.top_k}
    )
    pdf = run.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64, "score": np.float64}
        )
    return pdf.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _run_frame(cand, top_k: int) -> pd.DataFrame:
    """Shared per-segment-candidates -> sorted run-table reduce."""
    run = cand.groupby("query_id").map_groups(
        merge_topk, batch_format="pandas", fn_kwargs={"top_k": top_k}
    )
    pdf = run.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64, "score": np.float64}
        )
    return pdf.sort_values(["query_id", "rank"]).reset_index(drop=True)


def _segment_candidates(index_dir: str, prepared: dict, kernel, concurrency=None):
    """One task per segment running ``kernel(seg, prepared)`` -> candidate
    rows — the boolean-search fan-out, parameterized by scoring kernel."""
    from splade_ray.delete import load_tombstones

    tomb = load_tombstones(index_dir)
    if tomb.size:
        prepared = {**prepared, "tombstones": tomb}

    def batch_fn(batch: pa.Table) -> pa.Table:
        rows: list[tuple[int, int, float]] = []
        for seg_dir in batch["seg_dir"].to_pylist():
            seg = SegmentIndex(
                seg_dir, prepared["terms"], tombstones=prepared.get("tombstones")
            )
            rows.extend(kernel(seg, prepared))
        return pa.table(
            {
                "query_id": pa.array(np.array([r[0] for r in rows], np.int64)),
                "doc_id": pa.array(np.array([r[1] for r in rows], np.int64)),
                "score": pa.array(np.array([r[2] for r in rows], np.float64)),
            }
        )

    segs = segment_dirs(index_dir)
    return rd.from_items(
        [{"seg_dir": s} for s in segs], override_num_blocks=len(segs)
    ).map_batches(
        batch_fn, batch_format="pyarrow", batch_size=1, concurrency=concurrency
    )


def _score_segment_boosting(seg: SegmentIndex, prepared: dict):
    """ES boosting query over one segment: positive BM25 score, demoted by
    ``negative_boost`` for docs matching ANY negative term. Matching is
    positive-only (a doc matching only negative terms does not match)."""
    p: BM25Params = prepared["params"]
    avgdl = prepared["avgdl"]
    nb = float(prepared["negative_boost"])
    n = seg.doc_ids.size
    rows: list[tuple[int, int, float]] = []
    for qid, q in prepared["queries"].items():
        scores = np.zeros(n, np.float64)
        for term, qtf, w in q["score"]:
            pos, tfs = seg.pos_tfs(term)
            if pos.size == 0:
                continue
            scores[pos] += (w * qtf) * tf_component(tfs, seg.doc_lens[pos], avgdl, p)
        if not scores.any():
            continue
        neg = np.zeros(n, bool)
        for t in q["negative"]:
            pos, _ = seg.pos_tfs(t)
            if pos.size:
                neg[pos] = True
        if neg.any():
            # demotion AFTER full positive accumulation, BEFORE the
            # per-segment cut — top-k is exact under the demoted score
            scores = np.where(neg, scores * nb, scores)
        docs, scs = topk_from_scores(seg.doc_ids, scores, p.top_k, p.threshold)
        rows.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
    return rows


def boosting_search(
    index_dir: str,
    queries: list[tuple[int, dict]],
    params: BM25Params | None = None,
    *,
    negative_boost: float = 0.5,
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Elasticsearch/Lucene ``boosting`` query: each query is ``(qid,
    {"positive": text, "negative": text})`` — docs are matched and scored
    by BM25 over the positive terms; any doc also containing a negative
    term keeps matching but its score is multiplied by ``negative_boost``
    (0 < nb < 1 demotes without excluding — the soft must_not). Returns
    the standard run table; same fan-out as :func:`boolean_search`.

    Beyond-reference operator (the reference has no boolean structure,
    ``transformer_evaluator.py:142-193``); semantics follow Lucene's
    BoostingQuery (queries/mlt module) / ES `boosting`."""
    params = params or BM25Params()
    manifest = load_manifest(index_dir)
    n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]
    prepared_q: dict[int, dict] = {}
    for qid, spec in queries:
        pos_c = term_counts(spec.get("positive", "") or "", query_lang)
        neg_c = term_counts(spec.get("negative", "") or "", query_lang)
        prepared_q[int(qid)] = {"pos_tf": pos_c, "negative": sorted(neg_c)}
    score_terms = sorted({t for q in prepared_q.values() for t in q["pos_tf"]})
    dfs: dict[str, int] = {}
    if score_terms:
        lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
            columns=["term", "df"], filter=pads.field("term").isin(score_terms)
        )
        dfs = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))
    for q in prepared_q.values():
        q["score"] = [
            (t, int(qtf), idf(dfs[t], n_docs))
            for t, qtf in sorted(q["pos_tf"].items())
            if t in dfs
        ]
        del q["pos_tf"]
    prepared = {
        "avgdl": avgdl,
        "params": params,
        "negative_boost": float(negative_boost),
        "queries": prepared_q,
        "terms": sorted(
            {t for q in prepared_q.values() for t, _, _ in q["score"]}
            | {t for q in prepared_q.values() for t in q["negative"]}
        ),
    }
    cand = _segment_candidates(
        index_dir, prepared, _score_segment_boosting, concurrency=concurrency
    )
    return _run_frame(cand, params.top_k)


def _score_segment_const(seg: SegmentIndex, prepared: dict):
    """ConstantScoreQuery over one segment: every doc matching ANY query
    term scores exactly ``boost`` — ties resolve doc_id asc, so the run is
    the first top_k matching doc ids."""
    p: BM25Params = prepared["params"]
    boost = float(prepared["boost"])
    n = seg.doc_ids.size
    rows: list[tuple[int, int, float]] = []
    for qid, terms in prepared["queries"].items():
        m = np.zeros(n, bool)
        for t in terms:
            pos, _ = seg.pos_tfs(t)
            if pos.size:
                m[pos] = True
        if not m.any():
            continue
        scores = np.where(m, boost, 0.0)
        docs, scs = topk_from_scores(seg.doc_ids, scores, p.top_k, p.threshold)
        rows.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
    return rows


def constant_score_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    boost: float = 1.0,
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Lucene ConstantScoreQuery / ES ``constant_score``: the wrapped filter
    is the OR of the query's terms; every matching doc scores exactly
    ``boost`` (no tf/idf/length influence), so ranking degenerates to the
    deterministic (score desc, doc_id asc) tie-break — the run is the first
    ``top_k`` matching doc ids per query. The shape rescoring-free filter
    contexts use (cache-friendly in Lucene; here: no per-doc float work
    beyond the mask)."""
    params = params or BM25Params()
    prepared_q = {
        int(qid): sorted(term_counts(text or "", query_lang))
        for qid, text in queries
    }
    prepared = {
        "params": params,
        "boost": float(boost),
        "queries": prepared_q,
        "terms": sorted({t for ts in prepared_q.values() for t in ts}),
    }
    cand = _segment_candidates(
        index_dir, prepared, _score_segment_const, concurrency=concurrency
    )
    return _run_frame(cand, params.top_k)


def prepare_common_terms(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    cutoff_frequency: float = 0.01,
    query_lang: str | None = None,
) -> dict:
    """Driver prep for CommonTermsQuery (Lucene/ES): query terms split by
    GLOBAL document frequency — ``df/n_docs <= cutoff_frequency`` is
    low-frequency (selective, drives matching), the rest are common (score
    only). Per query: the low-term list and the (term, qtf, idf) scoring
    list over ALL terms."""
    params = params or BM25Params()
    manifest = load_manifest(index_dir)
    n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]
    tokenized = {int(qid): term_counts(text, query_lang) for qid, text in queries}
    all_terms = sorted({t for c in tokenized.values() for t in c})
    dfs: dict[str, int] = {}
    if all_terms:
        lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
            columns=["term", "df"], filter=pads.field("term").isin(all_terms)
        )
        dfs = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))
    prepared = {}
    for qid, c in tokenized.items():
        low = sorted(
            t for t in c if t in dfs and dfs[t] / n_docs <= cutoff_frequency
        )
        prepared[qid] = {
            "low": low,
            "score": [
                (t, int(c[t]), idf(dfs[t], n_docs))
                for t in sorted(c)
                if t in dfs
            ],
        }
    return {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "params": params,
        "queries": prepared,
        "terms": sorted({t for p in prepared.values() for t, _, _ in p["score"]}),
    }


def score_segment_common(seg: SegmentIndex, prepared: dict) -> list[tuple[int, int, float]]:
    """CommonTermsQuery over one segment: when the query HAS low-frequency
    terms, only docs containing at least one of them are candidates (the
    Lucene low_freq OR clause); common terms then add score where present.
    A query with no low-frequency terms degrades to a plain OR over its
    common terms (Lucene fallback). Score = BM25 over every matching query
    term."""
    p: BM25Params = prepared["params"]
    avgdl = prepared["avgdl"]
    n = seg.doc_ids.size
    rows: list[tuple[int, int, float]] = []
    positions = seg.pos_tfs
    for qid, q in prepared["queries"].items():
        scores = np.zeros(n, np.float64)
        hit = False
        for term, qtf, w in q["score"]:
            pos, tfs = positions(term)
            if pos.size == 0:
                continue
            hit = True
            scores[pos] += (w * qtf) * tf_component(tfs, seg.doc_lens[pos], avgdl, p)
        if not hit:
            continue
        if q["low"]:
            allowed = np.zeros(n, bool)
            for t in q["low"]:
                pos, _ = positions(t)
                if pos.size:
                    allowed[pos] = True
            scores[~allowed] = 0.0
        docs, scs = topk_from_scores(seg.doc_ids, scores, p.top_k, p.threshold)
        rows.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
    return rows


def common_terms_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    cutoff_frequency: float = 0.01,
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """CommonTermsQuery retrieval (Lucene CommonTermsQuery / ES
    common-terms): stopword-like high-df terms never gate matching — they
    only refine scores of docs selected by the low-df terms. Run table
    (query_id, rank, doc_id, score), same fan-out/merge as boolean_search.
    """
    params = params or BM25Params()
    prepared = prepare_common_terms(
        index_dir, queries, params,
        cutoff_frequency=cutoff_frequency, query_lang=query_lang,
    )
    cand = _segment_candidates(
        index_dir, prepared, score_segment_common, concurrency=concurrency
    )
    return _run_frame(cand, params.top_k)
