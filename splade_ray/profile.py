"""Query profiling — the ES ``_profile`` API analog.

The reference reports only end-to-end retrieval time per run
(``transformer_evaluator.py:160-170`` wall-clock prints); operators need
to know WHERE a slow query spends its time. ``profile_search`` runs the
standard per-segment exact kernel under instrumentation and returns one
row per (segment, query): the query's term count and posting mass in
that segment (df_sum — the exact-kernel cost driver, see the BMW regime
table in BASELINE.md), the candidate count, and the decode/score
wall-times. Rows are segments × queries — profiling output, not a data
product (timings are machine-dependent by nature; the df/candidate
columns are deterministic and testable).

Scale shape: identical to a search fan-out — one task per segment, rows
out are aggregate-sized."""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from splade_ray.bm25 import BM25Params
from splade_ray.docvalues import _segment_pipeline
from splade_ray.query import SegmentIndex, prepare_queries

PROFILE_COLUMNS = ["segment", "query_id", "n_terms", "df_sum",
                   "n_candidates", "decode_ms", "score_ms"]


def profile_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """Instrumented exact-kernel pass. Returns PROFILE_COLUMNS rows sorted
    by (segment, query_id); decode_ms covers posting decode (cold — each
    profiled segment starts unread), score_ms the dense accumulation +
    top-k cut."""
    from splade_ray.delete import load_tombstones

    params = params or BM25Params()
    prepared = prepare_queries(index_dir, queries, params,
                               query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table({c: pa.array([], pa.int64() if c not in
                                  ("decode_ms", "score_ms") else pa.float64())
                      for c in PROFILE_COLUMNS if c != "segment"}
                     | {"segment": pa.array([], pa.string())})

    def per_segment(seg_dir: str) -> pa.Table:
        from splade_ray.bm25 import topk_from_scores

        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        name = os.path.basename(seg_dir)
        p: BM25Params = prep["params"]
        out = {c: [] for c in PROFILE_COLUMNS}
        for qid, terms in prep["queries"].items():
            t0 = time.monotonic()
            df_sum = 0
            for term, _, _ in terms:
                pos, _ = seg.pos_tfs(term)
                df_sum += int(pos.size)
            t1 = time.monotonic()
            scores = seg.dense_query_scores(qid, prep)
            if scores is None:
                cand, n_cand = None, 0
            else:
                docs, _ = topk_from_scores(seg.doc_ids, scores, p.top_k,
                                           p.threshold)
                n_cand = int((scores > p.threshold).sum())
            t2 = time.monotonic()
            out["segment"].append(name)
            out["query_id"].append(int(qid))
            out["n_terms"].append(len(terms))
            out["df_sum"].append(df_sum)
            out["n_candidates"].append(n_cand)
            out["decode_ms"].append((t1 - t0) * 1e3)
            out["score_ms"].append((t2 - t1) * 1e3)
        return pa.table(
            {
                "segment": pa.array(out["segment"], pa.string()),
                "query_id": pa.array(out["query_id"], pa.int64()),
                "n_terms": pa.array(out["n_terms"], pa.int64()),
                "df_sum": pa.array(out["df_sum"], pa.int64()),
                "n_candidates": pa.array(out["n_candidates"], pa.int64()),
                "decode_ms": pa.array(out["decode_ms"], pa.float64()),
                "score_ms": pa.array(out["score_ms"], pa.float64()),
            }
        )

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        return pd.DataFrame(columns=PROFILE_COLUMNS)
    return pdf.sort_values(["segment", "query_id"]).reset_index(drop=True)[
        PROFILE_COLUMNS
    ]
