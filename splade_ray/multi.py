"""Federated multi-index search — the Lucene ``MultiReader`` / ES
cross-index (alias) query.

The reference serves exactly one index per process
(``transformer_evaluator.py:57-65`` loads a single ``array_index.h5py``);
production deployments query several indices at once (per-tenant shards,
time-partitioned indices, an alias spanning both) and must score them under
ONE statistics universe, or the same document text ranks differently
depending on which member it lives in.

Semantics (MultiReader contract):

- **Combined stats.** ``N = sum(n_docs)``, ``avgdl = sum(sum_doc_len)/N``,
  ``df(t) = sum(df_i(t))``, ``cf(t) = sum(cf_i(t))`` across members. Each
  member's scatter-gather then runs with these via the
  ``prepare_queries(stats_override=...)`` hook — per-member top-k under
  GLOBAL weights is a sound superset of the global top-k, so the final
  merge is exact.
- **Merge.** Per query, the members' k-sized runs merge by
  ``(score desc, doc_id asc)`` — with globally unique doc ids this is
  bit-identical to a single index over the union corpus (tested). The
  member position is carried in an ``index`` column for routing; id
  uniqueness across members is the caller's contract (Lucene MultiReader
  likewise rebases, it does not dedupe).

Scale shape: stats combination reads only the query terms' lexicon rows
per member (pushdown isin) + the member manifests; the heavy work is the
members' own scatter-gather pipelines; the merge is members x k rows.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params
from splade_ray.build import load_manifest
from splade_ray.query import search

MULTI_RUN_COLUMNS = ["query_id", "rank", "index", "doc_id", "score"]


def combined_stats(
    index_dirs: list[str],
    queries: list[tuple[int, str]],
    *,
    query_lang: str | None = None,
) -> dict:
    """MultiReader statistics union over the member indices, restricted to
    the query terms (all any caller can ever need): ``{"n_docs", "avgdl",
    "c_total", "dfs", "cfs"}``."""
    if not index_dirs:
        raise ValueError("at least one index required")
    if query_lang is None:
        query_lang = load_manifest(index_dirs[0]).get("analyzer")
    all_terms = sorted(
        {t for _, text in queries for t in term_counts(text, query_lang)}
    )
    n_docs = 0
    sum_dl = 0
    dfs: dict[str, int] = {}
    cfs: dict[str, int] = {}
    for d in index_dirs:
        m = load_manifest(d)
        n_docs += int(m["n_docs"])
        sum_dl += int(m.get("sum_doc_len") or round(m["avgdl"] * m["n_docs"]))
        if all_terms:
            lex = pads.dataset(os.path.join(d, "lexicon")).to_table(
                columns=["term", "df", "cf"],
                filter=pads.field("term").isin(all_terms),
            )
            for t, df, cf in zip(
                lex["term"].to_pylist(), lex["df"].to_pylist(), lex["cf"].to_pylist()
            ):
                dfs[t] = dfs.get(t, 0) + int(df)
                cfs[t] = cfs.get(t, 0) + int(cf)
    return {
        "n_docs": n_docs,
        "avgdl": (sum_dl / n_docs) if n_docs else 1.0,
        "c_total": sum_dl,
        "dfs": dfs,
        "cfs": cfs,
    }


def search_multi(
    index_dirs: list[str],
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    method: str = "exact",
    query_lang: str | None = None,
    scoring: str = "bm25",
    mu: float = 2000.0,
    lam: float = 0.1,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Top-k retrieval over the union of ``index_dirs`` under combined
    statistics. Returns (query_id, rank, index, doc_id, score) sorted by
    (query_id, rank) — ``index`` is the member's position in
    ``index_dirs``."""
    params = params or BM25Params()
    stats = combined_stats(index_dirs, queries, query_lang=query_lang)
    parts = []
    for i, d in enumerate(index_dirs):
        run = search(
            d, queries, params, method=method, query_lang=query_lang,
            scoring=scoring, mu=mu, lam=lam, concurrency=concurrency,
            stats_override=stats,
        )
        run = run.copy()
        run["index"] = np.int64(i)
        parts.append(run)
    return _merge_member_runs(parts, params.top_k)


def _merge_member_runs(
    parts: list[pd.DataFrame], top_k: int, id_col: str = "query_id"
) -> pd.DataFrame:
    """Merge the members' k-sized runs by (score desc, doc_id asc) — with
    globally unique doc ids this is bit-identical to a single index over
    the union corpus. Each part must already carry an ``index`` column."""
    cols = [id_col, "rank", "index", "doc_id", "score"]
    pdf = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
    if pdf.empty:
        return pd.DataFrame(columns=cols).astype(
            {id_col: np.int64, "rank": np.int32, "index": np.int64,
             "doc_id": np.int64, "score": np.float64}
        )
    pdf = pdf.sort_values(
        [id_col, "score", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    pdf["rank"] = pdf.groupby(id_col).cumcount().add(1).astype(np.int32)
    pdf = pdf[pdf["rank"] <= top_k]
    return pdf.reset_index(drop=True)[cols]


def boolean_search_multi(
    index_dirs: list[str],
    queries: list[tuple[int, dict]],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
    range_filter: tuple[str, float | None, float | None] | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Federated boolean retrieval: each member's must/must_not masking runs
    locally, scoring runs under the MultiReader union statistics
    (``prepare_bool_queries(stats_override=...)``), and the k-sized member
    runs merge exactly — per-member top-k under GLOBAL weights is a sound
    superset of the global top-k because clause masks are doc-local."""
    from splade_ray.boolq import boolean_search

    params = params or BM25Params()
    # stats terms = every clause's terms (must/should score; must_not only
    # masks but costs nothing to include in the pushdown)
    texts = [
        (qid, " ".join(str(v) for v in spec.values() if v))
        for qid, spec in queries
    ]
    stats = combined_stats(index_dirs, texts, query_lang=query_lang)
    parts = []
    for i, d in enumerate(index_dirs):
        run = boolean_search(
            d, queries, params, query_lang=query_lang,
            range_filter=range_filter, concurrency=concurrency,
            stats_override=stats,
        )
        run = run.copy()
        run["index"] = np.int64(i)
        parts.append(run)
    return _merge_member_runs(parts, params.top_k)


def phrase_topk_multi(
    index_dirs: list[str],
    phrases: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Federated BM25-ranked phrase retrieval. The phrase is one virtual
    term, so the union statistics are ``df(phrase) = Σ df_i(phrase)`` plus
    the members' summed (n_docs, sum_doc_len): each member's candidates are
    extracted ONCE (positions pass), its local phrase dfs feed the global
    sum, and the same candidates re-rank under the global weights — no
    second postings pass."""
    from splade_ray.bm25 import idf
    from splade_ray.positions import _phrase_candidates, _phrase_rank, phrase_dfs

    params = params or BM25Params()
    n_docs, sum_dl = 0, 0
    for d in index_dirs:
        m = load_manifest(d)
        n_docs += int(m["n_docs"])
        sum_dl += int(m.get("sum_doc_len") or round(m["avgdl"] * m["n_docs"]))
    avgdl = (sum_dl / n_docs) if n_docs else 1.0

    cands = []
    dfs: dict[int, int] = {}
    for d in index_dirs:
        cand = _phrase_candidates(
            d, phrases, query_lang=query_lang,
            concurrency=concurrency, with_doc_len=True,
        )
        if cand is not None:
            cand = cand.materialize()  # consumed twice: df count + ranking
            for pid, df in phrase_dfs(cand).items():
                dfs[pid] = dfs.get(pid, 0) + df
        cands.append(cand)

    cols = ["phrase_id", "rank", "index", "doc_id", "score"]
    if not dfs:
        return pd.DataFrame(columns=cols).astype(
            {"phrase_id": np.int64, "rank": np.int32, "index": np.int64,
             "doc_id": np.int64, "score": np.float64}
        )
    w = {pid: idf(df, n_docs) for pid, df in dfs.items()}
    parts = []
    for i, cand in enumerate(cands):
        if cand is None:
            continue
        run = _phrase_rank(cand, w, avgdl, params)
        run = run.copy()
        run["index"] = np.int64(i)
        parts.append(run)
    return _merge_member_runs(parts, params.top_k, id_col="phrase_id")


def search_fielded_multi(
    members: list[dict[str, str]],
    queries: list[tuple[int, str]],
    weights: dict[str, float],
    params: BM25Params | None = None,
    *,
    mode: str = "sum",
    tie_breaker: float = 0.0,
    analyzers: dict[str, str] | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Federated fielded retrieval (``sum`` / ``dismax`` modes): each member
    is a {field: index_dir} mapping; per FIELD the union statistics combine
    across members (a field is its own statistics universe in Lucene), then
    every member's aligned-segment scoring runs under those stats and the
    k-sized runs merge exactly."""
    from splade_ray.query import search_fielded

    params = params or BM25Params()
    if not members:
        raise ValueError("at least one member required")
    fields = sorted(members[0])
    for m in members:
        if sorted(m) != fields:
            raise ValueError(f"members disagree on fields: {sorted(m)} vs {fields}")
    stats = {
        f: combined_stats(
            [m[f] for m in members], queries,
            query_lang=(analyzers or {}).get(f),
        )
        for f in fields
    }
    parts = []
    for i, m in enumerate(members):
        run = search_fielded(
            m, queries, weights, params, mode=mode, tie_breaker=tie_breaker,
            analyzers=analyzers, concurrency=concurrency,
            stats_override=stats,
        )
        run = run.copy()
        run["index"] = np.int64(i)
        parts.append(run)
    return _merge_member_runs(parts, params.top_k)
