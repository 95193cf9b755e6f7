"""Field-collapsed retrieval: top-k with at most one document per key.

The Lucene grouping / Elasticsearch ``collapse`` surface the reference
lacks (its run is a flat ranked list, ``transformer_evaluator.py:172-188``):
rank documents by BM25, keep only the BEST document per value of a
categorical doc column (repo, host, source...), return the top-k of the
survivors. For the code corpus this is "best file per repo" — the search
results page every code-search engine shows.

Exact semantics (pinned for SQL mirroring): per query, a doc survives iff
no other doc with the same key sorts before it in (score desc, doc_id asc)
order; survivors are then ranked by the same order, top-k returned.

Scale shape: the collapse key rides in the segments' ``doclens`` sidecar
(build with ``extra_doc_cols=(collapse_col,)``), so collapsing is
segment-local: each segment emits its per-key best candidate —
queries x (distinct keys in segment) rows, NOT top-k x segments — and the
driver reduces that small table with one groupby. No doc ids beyond the
candidates cross the object store; text never moves.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from splade_ray.bm25 import BM25Params
from splade_ray.build import segment_dirs
from splade_ray.query import SegmentIndex, prepare_queries

COLLAPSE_COLUMNS = ["query_id", "rank", "doc_id", "collapse_key", "score"]


def segment_collapse_rows(seg: "SegmentIndex", prepared: dict,
                          collapse_col: str,
                          max_docs_per_key: int = 1) -> pa.Table:
    """Per-key best-``max_docs_per_key`` candidate rows for one LOADED
    segment — shared by the Dataset pipeline (:func:`collapse_search`)
    and the serving shard actors (``IndexShardActor.collapse`` →
    ``QueryRouter.collapse_search``): dense scoring, then the first
    ``c`` occurrences per key in rank order (c=1 is ES collapse; c>1 the
    diversified-sampler cap). The key column's dictionary encode is
    cached on the segment (``SegmentIndex.facet_codes``)."""
    p: BM25Params = prepared["params"]
    c = int(max_docs_per_key)
    _, codes, values = seg.facet_codes(collapse_col, False)
    rows: list[tuple[int, str, int, float]] = []
    for qid in prepared["queries"]:
        scores = seg.dense_query_scores(qid, prepared)
        if scores is None:
            continue
        cand = np.flatnonzero(scores > p.threshold)
        if cand.size == 0:
            continue
        # rank order, then position-within-key < c = per-key best c
        order = cand[np.lexsort((seg.doc_ids[cand], -scores[cand], codes[cand]))]
        g = codes[order]
        first = np.concatenate(([0], np.flatnonzero(g[1:] != g[:-1]) + 1))
        pos = np.arange(g.size) - np.repeat(
            first, np.diff(np.concatenate((first, [g.size])))
        )
        for j in order[pos < c]:
            rows.append((qid, values[codes[j]], int(seg.doc_ids[j]), float(scores[j])))
    return pa.table(
        {
            "query_id": pa.array(np.array([r[0] for r in rows], np.int64)),
            "collapse_key": pa.array([r[1] for r in rows], pa.string()),
            "doc_id": pa.array(np.array([r[2] for r in rows], np.int64)),
            "score": pa.array(np.array([r[3] for r in rows], np.float64)),
        }
    )


def merge_collapse_rows(pdf: pd.DataFrame, *, top_k: int,
                        max_docs_per_key: int = 1) -> pd.DataFrame:
    """Combine per-segment collapse partials: per-(query, key) global
    best ``max_docs_per_key``, then per-query rank + cut — shared by the
    Dataset reducer and the router endpoint. The merge table is
    queries × keys sized, driver-safe by the same argument as
    facet_counts."""
    if pdf.empty:
        return pd.DataFrame(columns=COLLAPSE_COLUMNS).astype(
            {
                "query_id": np.int64,
                "rank": np.int32,
                "doc_id": np.int64,
                "collapse_key": object,
                "score": np.float64,
            }
        )
    pdf = pdf.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True], kind="mergesort"
    )
    best = (
        pdf.groupby(["query_id", "collapse_key"], as_index=False, sort=False)
        .head(max_docs_per_key)
    )
    best = best.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True], kind="mergesort"
    )
    best["rank"] = best.groupby("query_id").cumcount().add(1).astype(np.int32)
    best = best[best["rank"] <= top_k]
    return best.reset_index(drop=True)[COLLAPSE_COLUMNS]


def collapse_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    collapse_col: str,
    max_docs_per_key: int = 1,
    query_lang: str | None = None,
    scoring: str = "bm25",
    mu: float = 2000.0,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Collapsed run table (query_id, rank, doc_id, collapse_key, score):
    top-k docs per query with at most ``max_docs_per_key`` docs per
    ``collapse_col`` value. The default 1 is ES ``collapse``; a cap > 1 is
    the ES ``diversified_sampler`` greedy (scan score-descending, keep a doc
    iff its key's kept-count is below the cap — equivalently: key-rank <=
    cap, then global rank + cut)."""
    from splade_ray.delete import load_tombstones

    if max_docs_per_key < 1:
        raise ValueError("max_docs_per_key must be >= 1")

    params = params or BM25Params()
    prepared = prepare_queries(
        index_dir, queries, params, query_lang=query_lang, scoring=scoring, mu=mu
    )
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    segs = segment_dirs(index_dir)

    def task(batch: pa.Table) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        parts = []
        for seg_dir in batch["seg_dir"].to_pylist():
            seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
            parts.append(segment_collapse_rows(seg, prep, collapse_col,
                                               max_docs_per_key))
        return pa.concat_tables(parts)

    pdf = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", batch_size=1, concurrency=concurrency)
        .to_pandas()
    )
    return merge_collapse_rows(pdf, top_k=params.top_k,
                               max_docs_per_key=max_docs_per_key)
