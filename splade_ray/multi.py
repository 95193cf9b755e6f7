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
            scoring=scoring, mu=mu, concurrency=concurrency,
            stats_override=stats,
        )
        run = run.copy()
        run["index"] = np.int64(i)
        parts.append(run)
    pdf = pd.concat(parts, ignore_index=True)
    if pdf.empty:
        return pd.DataFrame(columns=MULTI_RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "index": np.int64,
             "doc_id": np.int64, "score": np.float64}
        )
    pdf = pdf.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    pdf["rank"] = pdf.groupby("query_id").cumcount().add(1).astype(np.int32)
    pdf = pdf[pdf["rank"] <= params.top_k]
    return pdf.reset_index(drop=True)[MULTI_RUN_COLUMNS]
