"""Geo retrieval over sidecar lat/lon doc-values: the ES ``geo_distance``
and ``geo_bounding_box`` queries and the ``geotile_grid`` aggregation.

The reference has no geo surface at all (its evaluator emits a flat BM25
run only, ``splade/tasks/transformer_evaluator.py:172-188``); production
engines filter and aggregate on indexed coordinates. Coordinates live as
two numeric doc-values columns carried into each segment's doclens sidecar
at build time (``build_index(extra_doc_cols=("lat", "lon"))``), so every
geo kernel is a per-segment vectorized pass — no shuffle, no extra index
structure, I/O bounded by the two float columns.

Determinism contract: distances are ranked at 1e-4 m precision
(``round4(distance) asc, doc_id asc``) — haversine over identical doubles
agrees across numpy / SQL trig implementations to ~1 ulp (~1e-9 m at
earth scale), so rounding at 0.1 mm makes the order reproducible across
engines while remaining a total order users would accept.

Scale shape: all three kernels follow the repo's scatter pattern — the
query prep broadcasts once (``ray.put``), each segment emits only its
top-k rows (distance/bbox) or its per-tile partial counts (grid; at most
``4^zoom`` tiles per query per segment, and the zoom<=8 contract keeps
the merge driver-side small), and the merge is k-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from splade_ray.docvalues import _matched_mask, _numeric_column, _segment_pipeline
from splade_ray.query import SegmentIndex, prepare_queries

EARTH_RADIUS_M = 6371000.0


def round4(a) -> np.ndarray:
    """Half-up rounding at 1e-4 — matches the oracle SQL's
    ``floor(x*10000 + 0.5)/10000`` exactly."""
    return np.floor(np.asarray(a, np.float64) * 1e4 + 0.5) / 1e4


def haversine_m(lat, lon, origin: tuple[float, float]) -> np.ndarray:
    """Vectorized haversine distance (meters) from ``origin=(lat, lon)``
    degrees to arrays of degrees."""
    olat, olon = np.radians(float(origin[0])), np.radians(float(origin[1]))
    rlat = np.radians(np.asarray(lat, np.float64))
    rlon = np.radians(np.asarray(lon, np.float64))
    a = (np.sin((rlat - olat) / 2.0) ** 2
         + np.cos(olat) * np.cos(rlat) * np.sin((rlon - olon) / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def haversine_sql(lat_expr: str, lon_expr: str,
                  origin: tuple[float, float]) -> str:
    """DuckDB mirror of :func:`haversine_m` (same formula, same constant)."""
    olat, olon = float(origin[0]), float(origin[1])
    return (
        f"2.0 * {EARTH_RADIUS_M} * asin(sqrt("
        f"pow(sin((radians({lat_expr}) - radians({olat})) / 2), 2)"
        f" + cos(radians({olat})) * cos(radians({lat_expr}))"
        f" * pow(sin((radians({lon_expr}) - radians({olon})) / 2), 2)))"
    )


def geotile_xy(lat, lon, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Web-mercator tile coordinates (the ES ``geotile_grid`` key z/x/y):
    x = floor((lon+180)/360 * 2^z),
    y = floor((1 - asinh(tan(lat_rad))/pi)/2 * 2^z), clamped to the grid."""
    n = 1 << zoom
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    x = np.floor((lon + 180.0) / 360.0 * n)
    rlat = np.radians(lat)
    y = np.floor((1.0 - np.arcsinh(np.tan(rlat)) / np.pi) / 2.0 * n)
    x = np.clip(x, 0, n - 1).astype(np.int64)
    y = np.clip(y, 0, n - 1).astype(np.int64)
    return x, y


def geotile_sql(lat_expr: str, lon_expr: str, zoom: int) -> tuple[str, str]:
    """DuckDB mirror of :func:`geotile_xy` — (x_expr, y_expr); asinh is
    spelled ln(t + sqrt(t*t + 1))."""
    n = 1 << zoom
    x = (f"least(greatest(floor(({lon_expr} + 180.0) / 360.0 * {n}), 0), "
         f"{n - 1})::BIGINT")
    t = f"tan(radians({lat_expr}))"
    asinh = f"ln({t} + sqrt({t} * {t} + 1))"
    y = (f"least(greatest(floor((1.0 - {asinh} / pi()) / 2.0 * {n}), 0), "
         f"{n - 1})::BIGINT")
    return x, y


def _geo_columns(seg_dir: str, lat_col: str, lon_col: str):
    return (_numeric_column(seg_dir, lat_col).astype(np.float64),
            _numeric_column(seg_dir, lon_col).astype(np.float64))


def geo_distance_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    origin: tuple[float, float],
    radius_m: float,
    lat_col: str = "lat",
    lon_col: str = "lon",
    top_k: int = 10,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``geo_distance`` filter + ``_geo_distance`` sort: live docs
    containing >=1 query term whose haversine distance from ``origin`` is
    <= ``radius_m``, ranked nearest-first (round4(distance) asc, tie
    doc_id asc), per-query ``top_k``. Returns
    (query_id, rank, doc_id, distance_r). The radius test and the
    per-segment top-k cut both run inside the segment, so only k rows per
    (segment, query) leave the object store."""
    from splade_ray.delete import load_tombstones

    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    empty = pa.table({
        "query_id": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
        "distance_r": pa.array([], pa.float64()),
    })

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        lat, lon = _geo_columns(seg_dir, lat_col, lon_col)
        dist = round4(haversine_m(lat, lon, origin))
        inside = dist <= float(radius_m)
        parts = []
        for qid, terms in prep["queries"].items():
            cand = np.flatnonzero(_matched_mask(seg, terms) & inside)
            if cand.size == 0:
                continue
            order = np.lexsort((seg.doc_ids[cand], dist[cand]))
            take = cand[order[:top_k]]
            parts.append(pa.table({
                "query_id": pa.array(np.full(take.size, qid, np.int64)),
                "doc_id": pa.array(seg.doc_ids[take]),
                "distance_r": pa.array(dist[take]),
            }))
        return pa.concat_tables(parts) if parts else empty

    cols = ["query_id", "rank", "doc_id", "distance_r"]
    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        return pd.DataFrame(columns=cols).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64,
             "distance_r": np.float64})
    pdf = pdf.sort_values(["query_id", "distance_r", "doc_id"],
                          kind="mergesort")
    pdf["rank"] = pdf.groupby("query_id").cumcount().add(1).astype(np.int32)
    pdf = pdf[pdf["rank"] <= top_k]
    return pdf.reset_index(drop=True)[cols]


def geo_bbox_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    lat_range: tuple[float, float],
    lon_range: tuple[float, float],
    lat_col: str = "lat",
    lon_col: str = "lon",
    top_k: int | None = None,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``geo_bounding_box`` as a constant-score filter: live docs
    containing >=1 query term with lat/lon inside the closed box, score
    1.0, ranked doc_id asc, optional per-query ``top_k`` cap. A
    ``lon_range`` with left > right is the ES antimeridian-crossing box
    (wraps at ±180): lon >= left OR lon <= right. Returns
    (query_id, rank, doc_id, score)."""
    from splade_ray.delete import load_tombstones

    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    empty = pa.table({
        "query_id": pa.array([], pa.int64()),
        "doc_id": pa.array([], pa.int64()),
    })

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        lat, lon = _geo_columns(seg_dir, lat_col, lon_col)
        lo, hi = float(lon_range[0]), float(lon_range[1])
        lon_ok = ((lon >= lo) & (lon <= hi)) if lo <= hi \
            else ((lon >= lo) | (lon <= hi))  # antimeridian wrap
        inside = ((lat >= float(lat_range[0])) & (lat <= float(lat_range[1]))
                  & lon_ok)
        parts = []
        for qid, terms in prep["queries"].items():
            cand = np.flatnonzero(_matched_mask(seg, terms) & inside)
            if cand.size == 0:
                continue
            take = cand[np.argsort(seg.doc_ids[cand])]
            if top_k is not None:
                take = take[:top_k]  # per-segment pre-cut; merge re-cuts
            parts.append(pa.table({
                "query_id": pa.array(np.full(take.size, qid, np.int64)),
                "doc_id": pa.array(seg.doc_ids[take]),
            }))
        return pa.concat_tables(parts) if parts else empty

    cols = ["query_id", "rank", "doc_id", "score"]
    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        return pd.DataFrame(columns=cols).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64,
             "score": np.float64})
    pdf = pdf.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount().add(1).astype(np.int32)
    if top_k is not None:
        pdf = pdf[pdf["rank"] <= top_k]
    pdf["score"] = 1.0
    return pdf.reset_index(drop=True)[cols]


def geotile_grid_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    zoom: int,
    size: int = 10,
    lat_col: str = "lat",
    lon_col: str = "lon",
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``geotile_grid`` aggregation: per query, exact doc counts per
    web-mercator tile over the matching live docs, top ``size`` tiles by
    (n_docs desc, x asc, y asc). Returns (query_id, zoom, x, y, n_docs).

    Segments emit per-tile PARTIAL counts (bincount over the candidate
    tile codes — at most 4^zoom rows per query per segment, so keep
    zoom <= 8 for the driver-side merge; counts are exact because the
    per-segment emission is complete, not capped)."""
    from splade_ray.delete import load_tombstones

    if zoom < 0 or zoom > 8:
        raise ValueError("geotile_grid_agg supports 0 <= zoom <= 8 "
                         "(4^zoom partial rows per query per segment)")
    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    empty = pa.table({
        "query_id": pa.array([], pa.int64()),
        "x": pa.array([], pa.int64()),
        "y": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
    })

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        lat, lon = _geo_columns(seg_dir, lat_col, lon_col)
        tx, ty = geotile_xy(lat, lon, zoom)
        code = tx * (1 << zoom) + ty
        parts = []
        for qid, terms in prep["queries"].items():
            cand = np.flatnonzero(_matched_mask(seg, terms))
            if cand.size == 0:
                continue
            uniq, counts = np.unique(code[cand], return_counts=True)
            parts.append(pa.table({
                "query_id": pa.array(np.full(uniq.size, qid, np.int64)),
                "x": pa.array(uniq // (1 << zoom)),
                "y": pa.array(uniq % (1 << zoom)),
                "n": pa.array(counts.astype(np.int64)),
            }))
        return pa.concat_tables(parts) if parts else empty

    cols = ["query_id", "zoom", "x", "y", "n_docs"]
    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        return pd.DataFrame(columns=cols).astype(np.int64)
    agg = (pdf.groupby(["query_id", "x", "y"], as_index=False)["n"].sum()
           .rename(columns={"n": "n_docs"}))
    agg = agg.sort_values(["query_id", "n_docs", "x", "y"],
                          ascending=[True, False, True, True])
    agg = agg.groupby("query_id").head(size).reset_index(drop=True)
    agg["zoom"] = int(zoom)
    return agg[cols].astype(np.int64)


def geo_distance_rings_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    origin: tuple[float, float],
    edges_m: list[float],
    lat_col: str = "lat",
    lon_col: str = "lon",
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``geo_distance`` aggregation: exact doc counts per distance ring
    around ``origin`` over the matching live docs. ``edges_m`` (ascending)
    splits distances into len(edges)+1 half-open rings
    [0, e1), [e1, e2), ..., [e_last, inf); every ring appears for every
    query (zero counts included, the ES ranges contract). Distances use
    the same round4-metre determinism contract as geo_distance_search.
    Returns (query_id, ring, from_m, to_m, n_docs) with to_m NaN on the
    open last ring.

    Scale shape: segments emit one bincount row per (query, ring) — the
    partial table is queries x rings regardless of corpus size."""
    from splade_ray.delete import load_tombstones

    edges = [float(e) for e in edges_m]
    if edges != sorted(edges) or len(set(edges)) != len(edges) or not edges:
        raise ValueError("edges_m must be non-empty, ascending, distinct")
    n_rings = len(edges) + 1
    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    empty = pa.table({
        "query_id": pa.array([], pa.int64()),
        "ring": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
    })

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        lat, lon = _geo_columns(seg_dir, lat_col, lon_col)
        ring = np.searchsorted(np.asarray(edges),
                               round4(haversine_m(lat, lon, origin)),
                               side="right")
        parts = []
        for qid, terms in prep["queries"].items():
            cand = np.flatnonzero(_matched_mask(seg, terms))
            if cand.size == 0:
                continue
            counts = np.bincount(ring[cand], minlength=n_rings)
            nz = np.flatnonzero(counts)
            parts.append(pa.table({
                "query_id": pa.array(np.full(nz.size, qid, np.int64)),
                "ring": pa.array(nz.astype(np.int64)),
                "n": pa.array(counts[nz].astype(np.int64)),
            }))
        return pa.concat_tables(parts) if parts else empty

    cols = ["query_id", "ring", "from_m", "to_m", "n_docs"]
    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    lo = np.array([0.0, *edges])
    hi = np.array([*edges, np.nan])
    grid = pd.DataFrame([
        {"query_id": int(qid), "ring": r}
        for qid, _ in queries for r in range(n_rings)
    ])
    agg = (pdf.groupby(["query_id", "ring"], as_index=False)["n"].sum()
           if len(pdf) else pdf.rename(columns={"n": "n"}))
    out = grid.merge(agg, how="left", on=["query_id", "ring"])
    out["n_docs"] = out["n"].fillna(0).astype(np.int64) if "n" in out else 0
    out["from_m"] = lo[out["ring"].to_numpy()]
    out["to_m"] = hi[out["ring"].to_numpy()]
    out = out.sort_values(["query_id", "ring"]).reset_index(drop=True)
    out["query_id"] = out["query_id"].astype(np.int64)
    out["ring"] = out["ring"].astype(np.int64)
    return out[cols]
