"""Facet counts: per-query match counts grouped by a document attribute.

The Lucene-faceting analog the reference lacks (its evaluator only emits
ranked lists + metrics sidecars, ``transformer_evaluator.py:172-188``): for
each query, how many LIVE documents match (contain ≥1 query term, i.e.
would receive a BM25 score), broken down by a categorical doc column (lang,
repo, source ...). The facet column rides in the segments' ``doclens``
sidecar — build the index with ``extra_doc_cols=(facet_col,)``.

Scale shape: counting is segment-local (union of the query terms' posting
positions → one bincount over dictionary-encoded facet values); only
(query, facet, count) rows — queries × facet-cardinality sized — leave each
segment, and the final sum is a driver-side groupby over that tiny table.
No shuffle, no doc ids cross the object store.
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


FACET_COUNT_COLS = ["query_id", "facet", "n_docs"]
FACET_STATS_PARTIAL_COLS = ["query_id", "facet", "n_docs",
                            "s_sum", "s_min", "s_max"]
FACET_STATS_COLS = ["query_id", "facet", "n_docs",
                    "sum_v", "min_v", "max_v", "avg_v"]


def segment_facet_rows(seg: "SegmentIndex", prep: dict, spec: dict) -> pa.Table:
    """Per-segment facet partials from a LOADED segment — the one kernel
    shared by the Dataset pipelines (:func:`facet_counts`,
    :func:`facet_stats_agg`) and the serving shard actors
    (``IndexShardActor.facet`` → ``QueryRouter.facet_search``), so the
    two paths cannot drift. The facet column's dictionary encode is
    cached on the segment (``SegmentIndex.facet_codes``) — query-
    independent, computed once per resident segment. ``spec``:

    - ``{"kind": "counts", "facet_col", "shard_size", "multivalued"}`` —
      (query_id, facet, n_docs) partials;
    - ``{"kind": "stats", "facet_col", "metric_col"}`` — mergeable
      (query_id, facet, n_docs, s_sum, s_min, s_max) partials."""
    kind = spec["kind"]
    facet_col = spec["facet_col"]
    if kind == "counts":
        shard_size = spec.get("shard_size")
        parents, codes, values = seg.facet_codes(
            facet_col, bool(spec.get("multivalued")))
        rows: list[tuple[int, str, int]] = []
        for qid, terms in prep["queries"].items():
            matched = np.zeros(seg.doc_ids.size, bool)
            for term, _, _ in terms:
                pos, _ = seg.pos_tfs(term)  # tombstone-filtered
                matched[pos] = True
            if not matched.any():
                continue
            if parents is not None:
                counts = np.bincount(codes[matched[parents]],
                                     minlength=len(values))
            else:
                counts = np.bincount(codes[matched], minlength=len(values))
            nz = np.flatnonzero(counts)
            if shard_size is not None and nz.size > shard_size:
                # ES shard_size cap: local top by (count desc, facet asc)
                vals_nz = np.array([values[i] for i in nz], object)
                order = np.lexsort((vals_nz, -counts[nz]))[:shard_size]
                nz = nz[order]
            for i in nz.tolist():
                rows.append((qid, values[i], int(counts[i])))
        return pa.table({
            "query_id": pa.array(np.array([r[0] for r in rows], np.int64)),
            "facet": pa.array([r[1] for r in rows], pa.string()),
            "n_docs": pa.array(np.array([r[2] for r in rows], np.int64)),
        })
    if kind == "stats":
        _, codes, values = seg.facet_codes(facet_col, False)
        vals = seg.doc_values(spec["metric_col"]).astype(np.float64)
        rows2: list[tuple] = []
        for qid, terms in prep["queries"].items():
            matched = np.zeros(seg.doc_ids.size, bool)
            for term, _, _ in terms:
                pos, _ = seg.pos_tfs(term)
                matched[pos] = True
            if not matched.any():
                continue
            mc, mv = codes[matched], vals[matched]
            cnt = np.bincount(mc, minlength=len(values))
            ssum = np.bincount(mc, weights=mv, minlength=len(values))
            smin = np.full(len(values), np.inf)
            np.minimum.at(smin, mc, mv)
            smax = np.full(len(values), -np.inf)
            np.maximum.at(smax, mc, mv)
            for i in np.flatnonzero(cnt):
                rows2.append((qid, values[i], int(cnt[i]), float(ssum[i]),
                              float(smin[i]), float(smax[i])))
        return pa.table({
            "query_id": pa.array(np.array([r[0] for r in rows2], np.int64)),
            "facet": pa.array([r[1] for r in rows2], pa.string()),
            "n_docs": pa.array(np.array([r[2] for r in rows2], np.int64)),
            "s_sum": pa.array(np.array([r[3] for r in rows2], np.float64)),
            "s_min": pa.array(np.array([r[4] for r in rows2], np.float64)),
            "s_max": pa.array(np.array([r[5] for r in rows2], np.float64)),
        })
    raise ValueError(f"unknown facet kind {kind!r}")


def merge_facet_rows(pdf: pd.DataFrame, spec: dict,
                     top: int | None = None) -> pd.DataFrame:
    """Combine per-segment facet partials into the final frame — shared by
    the Dataset reducers and the router endpoint (parity by
    construction). ``top`` keeps the N largest buckets per query by
    (n_docs desc, facet asc), ES terms-agg ordering; output re-sorted by
    (query_id, facet)."""
    kind = spec["kind"]
    if kind == "counts":
        if pdf.empty:
            return pd.DataFrame({
                "query_id": pd.Series([], dtype=np.int64),
                "facet": pd.Series([], dtype=str),
                "n_docs": pd.Series([], dtype=np.int64),
            })
        out = (
            pdf.groupby(["query_id", "facet"], as_index=False)["n_docs"]
            .sum()  # queries × facet-cardinality rows — tiny
            .sort_values(["query_id", "facet"])
            .reset_index(drop=True)
        )
    elif kind == "stats":
        if pdf.empty:
            return pd.DataFrame(columns=FACET_STATS_COLS).astype(
                {"query_id": np.int64, "facet": str, "n_docs": np.int64,
                 "sum_v": np.float64, "min_v": np.float64,
                 "max_v": np.float64, "avg_v": np.float64})
        out = pdf.groupby(["query_id", "facet"], as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_v=("s_sum", "sum"),
            min_v=("s_min", "min"), max_v=("s_max", "max"),
        )
        out["avg_v"] = out["sum_v"] / out["n_docs"]
    else:
        raise ValueError(f"unknown facet kind {kind!r}")
    if top is not None:
        out = (
            out.sort_values(["query_id", "n_docs", "facet"],
                            ascending=[True, False, True], kind="mergesort")
            .groupby("query_id", sort=True)
            .head(top)
        )
    cols = FACET_COUNT_COLS if kind == "counts" else FACET_STATS_COLS
    return (out.sort_values(["query_id", "facet"])
            .reset_index(drop=True)[cols])


def _facet_segment(
    seg_dir: str, prepared: dict, facet_col: str, tombstones,
    shard_size: int | None = None, multivalued: bool = False,
) -> list[tuple[int, str, int]]:
    seg = SegmentIndex(seg_dir, prepared["terms"], tombstones=tombstones)
    t = segment_facet_rows(seg, prepared, {
        "kind": "counts", "facet_col": facet_col,
        "shard_size": shard_size, "multivalued": multivalued})
    return list(zip(t["query_id"].to_pylist(), t["facet"].to_pylist(),
                    t["n_docs"].to_pylist()))


def facet_counts(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    facet_col: str = "lang",
    params: BM25Params | None = None,
    query_lang: str | None = None,
    top: int | None = None,
    shard_size: int | None = None,
    multivalued: bool = False,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """(query_id, facet, n_docs) for every query — n_docs = live documents
    containing at least one query term, counted exactly. Sorted by
    (query_id, facet).

    ``multivalued=True`` treats ``facet_col`` as a list<string> column
    (ES array fields: tags, categories): a doc counts once per DISTINCT
    value it carries. The explode + dedupe happens once per segment,
    query-independent.

    ``top`` keeps only the N most frequent facets per query (the ES terms
    aggregation; ordering pinned to (n_docs desc, facet asc), output then
    re-sorted by (query_id, facet)). Counts stay EXACT by default — every
    segment emits its full per-query facet table. For high-cardinality
    facet columns pass ``shard_size`` to cap each segment's emission to
    its local top ``shard_size`` facets per query (the ES shard_size
    approximation: global counts can then undercount facets that are
    locally rare everywhere; ES defaults to ``1.5·top + 10``)."""
    from splade_ray.delete import load_tombstones

    prepared = prepare_queries(index_dir, queries, params, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    segs = segment_dirs(index_dir)

    def task(batch: pa.Table) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        rows: list[tuple[int, str, int]] = []
        for seg_dir in batch["seg_dir"].to_pylist():
            rows.extend(_facet_segment(seg_dir, prep, facet_col, t,
                                       shard_size, multivalued))
        return pa.table(
            {
                "query_id": pa.array(np.array([r[0] for r in rows], np.int64)),
                "facet": pa.array([r[1] for r in rows], pa.string()),
                "n_docs": pa.array(np.array([r[2] for r in rows], np.int64)),
            }
        )

    pdf = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", batch_size=1, concurrency=concurrency)
        .to_pandas()
    )
    return merge_facet_rows(pdf, {"kind": "counts"}, top)


def facet_stats_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    facet_col: str,
    metric_col: str,
    params: BM25Params | None = None,
    query_lang: str | None = None,
    top: int | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """ES sub-aggregation: a ``terms`` bucket over ``facet_col`` with a
    nested ``stats`` metric over ``metric_col`` — per query, per facet
    value, the (n_docs, sum, min, max, avg) of the numeric doc-values
    column across live matching docs. The one common ES aggregation shape
    round 3 still lacked (terms + per-bucket metric aggs composed in ONE
    pass; reference-class engines nest ``stats``/``top_hits`` under
    ``terms``).

    Scale shape: identical to :func:`facet_counts` — each segment emits
    mergeable per-(query, facet) PARTIALS (count, sum, min, max), so what
    crosses the object store is queries x facet-cardinality x 4 numbers
    regardless of corpus size, and avg is derived after the combine
    (never averaged across segments). ``top`` keeps the N largest buckets
    per query by (n_docs desc, facet asc), ES terms-agg ordering.

    Returns (query_id, facet, n_docs, sum_v, min_v, max_v, avg_v) sorted
    by (query_id, facet)."""
    from splade_ray.delete import load_tombstones

    prepared = prepare_queries(index_dir, queries, params, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    segs = segment_dirs(index_dir)

    spec = {"kind": "stats", "facet_col": facet_col, "metric_col": metric_col}

    def task(batch: pa.Table) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        parts = []
        for seg_dir in batch["seg_dir"].to_pylist():
            seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
            parts.append(segment_facet_rows(seg, prep, spec))
        return pa.concat_tables(parts)

    pdf = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", batch_size=1,
                     concurrency=concurrency)
        .to_pandas()
    )
    return merge_facet_rows(pdf, spec, top)


def adjacency_matrix(
    index_dir: str,
    filters: list[tuple[str, str]],
    *,
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """adjacency_matrix aggregation (Elasticsearch): given named term
    filters, the number of LIVE docs matching each filter and each filter
    PAIR intersection (upper triangle, ES's `a`, `b`, `a&b` buckets;
    empty intersections omitted like ES). A filter matches a doc when the
    doc contains >= 1 of its terms (filter text analyzed like a query).

    Rows: (filter_a, filter_b, doc_count) with filter_a <= filter_b, sorted.
    Scale shape: per segment one boolean mask per filter over the segment's
    docs (union of posting positions), pair counts via mask dot products —
    filters² × segments partial rows, summed driver-side. No shuffle."""
    from splade_ray.analysis import term_counts
    from splade_ray.delete import load_tombstones

    names = [n for n, _ in filters]
    if len(set(names)) != len(names):
        raise ValueError("filter names must be unique")
    tokenized = {n: sorted(term_counts(text, query_lang)) for n, text in filters}
    all_terms = sorted({t for ts in tokenized.values() for t in ts})
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    spec_ref = ray.put({"tokenized": tokenized, "terms": all_terms})

    def task(batch: pa.Table) -> pa.Table:
        spec = ray.get(spec_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        out_a, out_b, out_n = [], [], []
        for seg_dir in batch["seg_dir"].to_pylist():
            seg = SegmentIndex(seg_dir, spec["terms"], tombstones=t)
            n = seg.doc_ids.size
            masks = {}
            for name, terms in spec["tokenized"].items():
                m = np.zeros(n, bool)
                for term in terms:
                    pos, _ = seg.pos_tfs(term)
                    if pos.size:
                        m[pos] = True
                masks[name] = m
            ns = sorted(masks)
            for i, a in enumerate(ns):
                for b in ns[i:]:
                    c = int(np.count_nonzero(masks[a] & masks[b]))
                    if c:
                        out_a.append(a)
                        out_b.append(b)
                        out_n.append(c)
        return pa.table(
            {
                "filter_a": pa.array(out_a, pa.string()),
                "filter_b": pa.array(out_b, pa.string()),
                "doc_count": pa.array(np.asarray(out_n, np.int64)),
            }
        )

    segs = segment_dirs(index_dir)
    pdf = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", batch_size=1,
                     concurrency=concurrency)
        .to_pandas()
    )
    if pdf.empty:
        return pd.DataFrame(
            {"filter_a": pd.Series([], dtype=object),
             "filter_b": pd.Series([], dtype=object),
             "doc_count": pd.Series([], dtype=np.int64)}
        )
    out = (
        pdf.groupby(["filter_a", "filter_b"], as_index=False)["doc_count"]
        .sum()
        .sort_values(["filter_a", "filter_b"])
        .reset_index(drop=True)
    )
    out["doc_count"] = out["doc_count"].astype(np.int64)
    return out
