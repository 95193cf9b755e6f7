"""Rank fusion: combine ranked runs from different retrievers.

The hybrid-search primitive (Elasticsearch RRF, Vespa/Anserini fusion
baselines) the reference lacks — its hybrid experiments interpolate raw
scores offline. Reciprocal Rank Fusion (Cormack et al., SIGIR 2009):

    rrf(d) = sum_runs  w_r / (k + rank_r(d))

over every run that retrieved d. Rank-based, so it needs no score
calibration between retrievers (BM25 vs QL vs ANN cosine). Pinned
semantics: ranks are the runs' own 1-based ranks; docs missing from a run
contribute nothing; ties break (rrf desc, doc_id asc); top_k rows per
query returned with ranks reassigned.

Scale shape: runs are top-k-sized per query by construction (queries x k
rows), so fusion is a driver-side pandas reduce — the same k-sized-merge
argument as merge_topk. Fusing runs too large for that would reuse the
candidate groupby shape of query.search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

FUSED_COLUMNS = ["query_id", "rank", "doc_id", "rrf"]


def rrf_fuse(
    runs: list[pd.DataFrame],
    *,
    k: int = 60,
    weights: list[float] | None = None,
    top_k: int = 10,
) -> pd.DataFrame:
    """Fuse run tables (query_id, rank, doc_id, ...) into an RRF-ranked run
    (query_id, rank, doc_id, rrf)."""
    if not runs:
        raise ValueError("need at least one run")
    weights = weights or [1.0] * len(runs)
    if len(weights) != len(runs):
        raise ValueError("one weight per run")
    parts = []
    for run, w in zip(runs, weights):
        p = run[["query_id", "doc_id", "rank"]].copy()
        p["rrf"] = w / (k + p["rank"].astype(np.float64))
        parts.append(p[["query_id", "doc_id", "rrf"]])
    allp = pd.concat(parts, ignore_index=True)
    fused = allp.groupby(["query_id", "doc_id"], as_index=False)["rrf"].sum()
    fused = fused.sort_values(
        ["query_id", "rrf", "doc_id"], ascending=[True, False, True], kind="mergesort"
    )
    fused["rank"] = fused.groupby("query_id").cumcount().add(1).astype(np.int32)
    fused = fused[fused["rank"] <= top_k]
    return fused.reset_index(drop=True)[FUSED_COLUMNS]


def linear_fuse(
    runs: list[pd.DataFrame],
    *,
    weights: list[float] | None = None,
    top_k: int = 10,
    score_col: str = "score",
) -> pd.DataFrame:
    """Normalized linear score fusion (the ES ``retriever.linear`` with the
    ``minmax`` normalizer): per run and per query, scores rescale to
    ``(s - min) / (max - min)`` over that run's retrieved rows (a
    degenerate single-score page normalizes to 1.0 — the doc IS the run's
    best); the fused score is the weighted sum over runs, docs missing
    from a run contribute nothing. Ties break (score desc, doc_id asc);
    top_k rows per query, ranks reassigned. Returns
    (query_id, rank, doc_id, fused).

    Same k-sized-merge scale shape as :func:`rrf_fuse` — inputs are
    top-k-sized runs, so fusion is a driver-side pandas reduce."""
    if not runs:
        raise ValueError("need at least one run")
    weights = weights or [1.0] * len(runs)
    if len(weights) != len(runs):
        raise ValueError("one weight per run")
    parts = []
    for run, w in zip(runs, weights):
        p = run[["query_id", "doc_id", score_col]].copy()
        g = p.groupby("query_id")[score_col]
        lo, hi = g.transform("min"), g.transform("max")
        span = (hi - lo).to_numpy(np.float64)
        norm = np.where(
            span > 0,
            (p[score_col].to_numpy(np.float64) - lo.to_numpy(np.float64))
            / np.where(span > 0, span, 1.0),
            1.0,
        )
        p["fused"] = w * norm
        parts.append(p[["query_id", "doc_id", "fused"]])
    allp = pd.concat(parts, ignore_index=True)
    fused = allp.groupby(["query_id", "doc_id"], as_index=False)["fused"].sum()
    fused = fused.sort_values(
        ["query_id", "fused", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    fused["rank"] = fused.groupby("query_id").cumcount().add(1).astype(np.int32)
    fused = fused[fused["rank"] <= top_k]
    return fused.reset_index(drop=True)[["query_id", "rank", "doc_id", "fused"]]
