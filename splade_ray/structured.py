"""Structural queries: ids, exists, pinned, terms-lookup.

Lucene/Elasticsearch query shapes that select or re-order docs by
identity and field presence rather than text relevance — surfaces the
reference lacks (its evaluator emits a flat BM25 run only,
``transformer_evaluator.py:172-188``) but any production retrieval engine
exposes:

- **ids_search** (ES ``ids`` query / Lucene TermInSetQuery on _id): fetch
  the requested ids that EXIST and are live, constant score 1.0, ordered
  by doc_id asc.
- **exists_search** (ES ``exists`` query / Lucene FieldExistsQuery as a
  FILTER clause): BM25 restricted to docs whose sidecar doc-values column
  is non-null — the mask applies inside each segment BEFORE its top-k cut
  (the tombstone / range-filter pre-cut contract), so results stay exact.
- **pinned_search** (ES ``pinned`` query): per query, promote the given
  ids — in their given order — above the organic BM25 results; organic
  rows exclude pinned ids, ranks run continuously, total rows = top_k.

Scale shape: ids_search reads ONLY the doclens ``doc_id`` column with a
pushdown ``isin`` filter (row groups whose [min,max] misses every wanted
id never load); exists_search piggybacks the standard per-segment dense
kernel (the null mask is query-independent, computed once per segment);
pinned_search adds one k-sized stitch on top of a plain search — pinned
id sets are top-k-sized by construction, so driver state stays O(k·q).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from splade_ray.bm25 import BM25Params
from splade_ray.build import segment_dirs
from splade_ray.docvalues import _segment_pipeline
from splade_ray.query import RUN_COLUMNS, SegmentIndex, prepare_queries

IDS_COLUMNS = ["query_id", "rank", "doc_id", "score"]


def ids_search(
    index_dir: str,
    id_sets: dict[int, list[int]],
    *,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``ids`` query: per query, the requested doc ids that exist in the
    index and are live (not tombstoned), constant score 1.0, ranked by
    doc_id asc. Unknown and deleted ids are silently dropped (the ES
    contract — an ids query never errors on a missing id).

    Each segment reads only its doclens ``doc_id`` column under a pushdown
    ``isin`` filter, so I/O is bounded by the id sets, not the corpus."""
    from splade_ray.delete import load_tombstones

    wanted = np.unique(
        np.concatenate(
            [np.asarray(list(ids), np.int64) for ids in id_sets.values()]
            or [np.empty(0, np.int64)]
        )
    )
    tomb = load_tombstones(index_dir)
    if tomb.size:
        wanted = np.setdiff1d(wanted, tomb)
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    if wanted.size == 0:
        found = np.empty(0, np.int64)
    else:
        wanted_ref = ray.put(wanted)

        def per_segment(seg_dir: str) -> pa.Table:
            w = ray.get(wanted_ref)
            path = os.path.join(seg_dir, "doclens.parquet")
            pf = pq.ParquetFile(path)
            idx = pf.schema_arrow.get_field_index("doc_id")
            parts = []
            for g in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(g).column(idx).statistics
                if st is not None and st.has_min_max:
                    lo, hi = int(st.min), int(st.max)
                    j = np.searchsorted(w, lo)
                    # no wanted id inside this row group's [min, max]
                    if j >= w.size or w[j] > hi:
                        continue
                arr = pf.read_row_group(g, columns=["doc_id"])["doc_id"]
                hit = pc.filter(arr, pc.is_in(arr, value_set=pa.array(w)))
                if len(hit):
                    parts.append(pa.table({"doc_id": hit}))
            return pa.concat_tables(parts) if parts else empty

        pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
        found = np.unique(pdf["doc_id"].to_numpy(np.int64)) if len(pdf) else (
            np.empty(0, np.int64))
    rows = []
    for qid in sorted(id_sets):
        live = np.intersect1d(
            np.asarray(list(id_sets[qid]), np.int64), found
        )
        rows.extend(
            (int(qid), r + 1, int(d), 1.0) for r, d in enumerate(np.sort(live))
        )
    out = pd.DataFrame(rows, columns=IDS_COLUMNS)
    return out.astype({"query_id": np.int64, "rank": np.int32,
                       "doc_id": np.int64, "score": np.float64})


def terms_lookup_search(
    index_dir: str,
    lookups: dict[int, int],
    *,
    field: str,
    lookup_path: str,
    lookup_field: str,
    lookup_id_col: str = "doc_id",
    top_k: int | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES terms-lookup query (``terms`` with ``index``/``id``/``path``):
    per query, fetch the term set from ONE row of a lookup table, then
    select live docs whose ``field`` doc-values (string or list<string>)
    contain ANY of those values. Constant score 1.0, ranked doc_id asc
    (the ES constant-score filter contract), per-query cap ``top_k``.
    A missing lookup row or empty value set matches nothing (the ES
    contract — never an error).

    Scale shape: the lookup fetch is ONE pushdown isin read of the
    lookup table (row groups missing every wanted id never load); the
    value sets broadcast once; each segment explodes its doc-values
    column once and evaluates every query's is_in against the same
    exploded arrays. Reference gap anchor: the reference has no
    field-filtered retrieval at all (flat BM25 run only,
    ``splade/tasks/transformer_evaluator.py:172-188``)."""
    import pyarrow.dataset as pads

    from splade_ray.delete import load_tombstones

    wanted = sorted({int(v) for v in lookups.values()})
    tbl = pads.dataset(lookup_path).to_table(
        columns=[lookup_id_col, lookup_field],
        filter=pads.field(lookup_id_col).isin(wanted),
    )
    by_id: dict[int, set] = {}
    idvals = tbl[lookup_id_col].to_pylist()
    fvals = tbl[lookup_field].to_pylist()
    for i, v in zip(idvals, fvals):
        if v is None:
            continue
        vals = v if isinstance(v, list) else [v]
        by_id.setdefault(int(i), set()).update(x for x in vals if x is not None)
    value_sets = {int(q): sorted(by_id.get(int(lid), ()))
                  for q, lid in lookups.items()}
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "doc_id": pa.array([], pa.int64())})
    tomb = load_tombstones(index_dir)
    sets_ref = ray.put(value_sets)
    tomb_ref = ray.put(tomb) if tomb.size else None

    def per_segment(seg_dir: str) -> pa.Table:
        sets = ray.get(sets_ref)
        t = pq.read_table(os.path.join(seg_dir, "doclens.parquet"),
                          columns=["doc_id", field])
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = t[field].combine_chunks()
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            flat = col.flatten()
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            parents = np.repeat(np.arange(len(col)), np.diff(offs))
        else:
            flat, parents = col, np.arange(len(col))
        live = np.ones(ids.size, bool)
        if tomb_ref is not None:
            live = ~np.isin(ids, ray.get(tomb_ref))
        parts = []
        for qid, vals in sets.items():
            if not vals:
                continue
            hit = pc.is_in(flat, value_set=pa.array(vals, flat.type)
                           ).to_numpy(zero_copy_only=False)
            mask = np.zeros(ids.size, bool)
            mask[parents[hit]] = True
            mask &= live
            if mask.any():
                parts.append(pa.table({
                    "query_id": pa.array(
                        np.full(int(mask.sum()), qid, np.int64)),
                    "doc_id": pa.array(ids[mask]),
                }))
        return pa.concat_tables(parts) if parts else empty

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    pdf = pdf.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    if top_k is not None:
        pdf = pdf[pdf["rank"] <= top_k]
    pdf["score"] = 1.0
    out = pdf[IDS_COLUMNS].reset_index(drop=True)
    return out.astype({"query_id": np.int64, "rank": np.int32,
                       "doc_id": np.int64, "score": np.float64})


def exists_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    col: str,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES bool query = text MUST + ``exists`` FILTER: BM25 top-k over live
    docs whose sidecar doc-values column is non-null. The null mask is
    query-independent (one validity read per segment) and applies BEFORE
    the per-segment cut, so deep results are exact."""
    from splade_ray.bm25 import topk_from_scores
    from splade_ray.delete import load_tombstones
    from splade_ray.query import merge_topk

    params = params or BM25Params()
    prepared = prepare_queries(index_dir, queries, params, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        arr = pq.read_table(
            os.path.join(seg_dir, "doclens.parquet"), columns=[col]
        )[col].combine_chunks()
        present = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        p: BM25Params = prep["params"]
        out = {k: [] for k in ("query_id", "doc_id", "score")}
        for qid in prep["queries"]:
            scores = seg.dense_query_scores(qid, prep)
            if scores is None:
                continue
            scores = np.where(present, scores, 0.0)
            docs, scs = topk_from_scores(seg.doc_ids, scores, p.top_k, p.threshold)
            out["query_id"].extend([qid] * docs.size)
            out["doc_id"].extend(docs.tolist())
            out["score"].extend(scs.tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
            }
        )

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32,
             "doc_id": np.int64, "score": np.float64}
        )
    out = (
        pdf.groupby("query_id", group_keys=False)[pdf.columns]
        .apply(merge_topk, top_k=params.top_k)
        .reset_index(drop=True)
    )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)[RUN_COLUMNS]


PINNED_COLUMNS = ["query_id", "rank", "doc_id", "is_pinned", "score"]


def pinned_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    pinned: dict[int, list[int]],
    query_lang: str | None = None,
    method: str = "exact",
    concurrency=None,
) -> pd.DataFrame:
    """ES ``pinned`` query: per query the pinned ids — in their GIVEN order,
    filtered to ids that exist and are live — rank first, then the organic
    BM25 results excluding pinned ids; ranks run continuously and total rows
    cap at ``params.top_k``. Pinned rows carry is_pinned=1 and score 0.0
    (ES uses a synthetic huge score; a constant keeps the frame exact),
    organic rows their BM25 score.

    One plain search (over-fetched by the max pinned-set size so exclusion
    can't starve the organic tail) + one ids_search existence probe + a
    k-sized driver stitch."""
    from splade_ray.query import search

    params = params or BM25Params()
    extra = max((len(v) for v in pinned.values()), default=0)
    organic = search(
        index_dir, queries,
        BM25Params(k1=params.k1, b=params.b, top_k=params.top_k + extra,
                   threshold=params.threshold),
        method=method, query_lang=query_lang, concurrency=concurrency,
    )
    exist = ids_search(index_dir, pinned, concurrency=concurrency)
    live = {
        int(q): set(g["doc_id"].tolist())
        for q, g in exist.groupby("query_id")
    }
    rows = []
    for qid, _ in queries:
        qid = int(qid)
        pins = [d for d in pinned.get(qid, []) if d in live.get(qid, set())]
        seen, ordered = set(), []
        for d in pins:  # given order, first occurrence wins
            if d not in seen:
                seen.add(d)
                ordered.append(d)
        for d in ordered:
            rows.append((qid, int(d), 1, 0.0))
        g = organic[organic["query_id"] == qid]
        for d, s in zip(g["doc_id"], g["score"]):
            if int(d) not in seen:
                rows.append((qid, int(d), 0, float(s)))
    out = pd.DataFrame(rows, columns=["query_id", "doc_id", "is_pinned", "score"])
    if out.empty:
        return pd.DataFrame(columns=PINNED_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64,
             "is_pinned": np.int64, "score": np.float64}
        )
    out["rank"] = out.groupby("query_id").cumcount().add(1).astype(np.int32)
    out = out[out["rank"] <= params.top_k]
    out["is_pinned"] = out["is_pinned"].astype(np.int64)
    return out.reset_index(drop=True)[PINNED_COLUMNS]
