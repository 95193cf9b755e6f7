"""Numeric doc-values: range-filtered retrieval, sort-by-field, total-hit
counts and histogram aggregations.

The Lucene doc-values surface the reference lacks (its evaluator emits a
flat BM25 run only, ``transformer_evaluator.py:172-188``): production
engines filter matches by a numeric attribute (PointRangeQuery), sort
results by a field instead of score (``Sort.LONG``), report total hit
counts (TotalHitCountCollector) and aggregate matches into numeric buckets
(the Elasticsearch ``histogram`` aggregation). All four run here over a
numeric column carried in the segments' ``doclens`` sidecar — build the
index with ``extra_doc_cols=(numeric_col,)``.

Pinned semantics (SQL-mirrorable):

- **range_search**: BM25 over live docs with ``lo <= v <= hi`` (inclusive;
  ``None`` = unbounded). The filter applies INSIDE each segment before its
  top-k cut, so deep results are exact without over-fetching — the same
  pre-cut contract as tombstones and ``search_after``.
- **sort_search**: docs matching >=1 query term (live), ordered by
  ``(value desc|asc, doc_id asc)``, top-k; rows carry the sort value.
- **match_counts**: per query, the exact number of live matching docs.
- **numeric_histogram**: per query, live-match counts per bucket
  ``(v // interval) * interval`` (int64 floor division — buckets are the
  inclusive lower bounds, negative values floor toward -inf like DuckDB's
  integer ``//``).

Scale shape: everything is segment-local over the union of the query
terms' posting positions (one decoded pass per term, shared across the
four ops); what leaves each segment is candidate-sized (range_search,
sort_search: <= top_k rows per query) or aggregate-sized (counts: one row
per query; histogram: queries x buckets-in-segment rows). The driver
reduce is a tiny groupby. No shuffle, no doc text moves.
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

SORT_COLUMNS = ["query_id", "rank", "doc_id", "sort_value"]


def _numeric_column(seg_dir: str, col: str) -> np.ndarray:
    """The sidecar numeric column aligned to the segment's doc_ids."""
    arr = pq.read_table(os.path.join(seg_dir, "doclens.parquet"), columns=[col])[
        col
    ].to_numpy(zero_copy_only=False)
    if not np.issubdtype(arr.dtype, np.number):
        raise TypeError(f"doc column {col!r} is not numeric (dtype {arr.dtype})")
    return arr


def _matched_mask(seg: SegmentIndex, terms: list[tuple[str, int, float]]) -> np.ndarray:
    """Live docs containing >=1 of the query's terms (tombstone-filtered by
    pos_tfs, decoded postings cached across queries in the segment)."""
    matched = np.zeros(seg.doc_ids.size, bool)
    for term, _, _ in terms:
        pos, _ = seg.pos_tfs(term)
        matched[pos] = True
    return matched


def _segment_pipeline(index_dir: str, segment_task, schema: pa.Table,
                      concurrency=None) -> pd.DataFrame:
    """Run ``segment_task(seg_dir) -> pa.Table`` over every segment (one
    work item each) and collect the small per-segment outputs."""
    segs = segment_dirs(index_dir)

    def task(batch: pa.Table) -> pa.Table:
        parts = [segment_task(s) for s in batch["seg_dir"].to_pylist()]
        parts = [p for p in parts if p is not None and len(p)]
        return pa.concat_tables(parts) if parts else schema

    return (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", batch_size=1,
                     concurrency=concurrency)
        .to_pandas()
    )


def range_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    numeric_col: str,
    lo: float | str | None = None,
    hi: float | str | None = None,
    query_lang: str | None = None,
    scoring: str = "bm25",
    mu: float = 2000.0,
    concurrency=None,
) -> pd.DataFrame:
    """BM25 (or QL) top-k restricted to live docs whose ``numeric_col`` lies
    in the inclusive range [lo, hi] — Lucene BooleanQuery(query MUST,
    PointRangeQuery FILTER). String bounds over a string sidecar column give
    the lexicographic TermRangeQuery (binary collation, matching DuckDB's
    default string order). A thin wrapper over
    :func:`splade_ray.query.search` with ``range_filter`` — the mask is
    applied inside each segment's exact kernel before its top-k cut, and the
    same option works on the persistent Searcher / QueryRouter paths."""
    from splade_ray.query import search

    return search(
        index_dir,
        queries,
        params,
        query_lang=query_lang,
        scoring=scoring,
        mu=mu,
        concurrency=concurrency,
        range_filter=(numeric_col, lo, hi),
    )


def function_score_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    functions: list[dict],
    query_lang: str | None = None,
    scoring: str = "bm25",
    mu: float = 2000.0,
    concurrency=None,
) -> pd.DataFrame:
    """Elasticsearch function_score retrieval (boost_mode/score_mode =
    multiply): final score = BM25 (or QL) × the product of the given
    functions — ``field_value_factor`` (factor/modifier none|log1p|sqrt)
    and the ``gauss``/``exp``/``linear`` numeric decay shapes — all
    computed from sidecar doc-values columns (build the index with
    ``extra_doc_cols=(field,)``).

    The per-doc multiplier is query-independent: each segment computes it
    once per spec (cached for the actor's lifetime) and applies it BEFORE
    its top-k cut, so results are exact under the modified score (not an ES
    ``rescore`` of a base-score window). Scale shape = the plain search
    fan-out: nothing new shuffles, k-sized rows per (segment, query) merge.

    Thin wrapper over :func:`splade_ray.query.search(functions=...)`; the
    spec format is documented on :func:`splade_ray.query.canonical_functions`.
    """
    from splade_ray.query import search

    return search(
        index_dir,
        queries,
        params,
        query_lang=query_lang,
        scoring=scoring,
        mu=mu,
        concurrency=concurrency,
        functions=functions,
    )


def rank_feature_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    rank_features: list[dict],
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``rank_feature`` retrieval: the text query plus rank_feature
    clauses in one bool query — matching docs' scores get ``Σ boost × f(v)``
    added (saturation / log / sigmoid / linear over a sidecar doc-values
    field; non-matching docs never enter). The bonus vector is query-
    independent (computed once per segment per spec, cached) and applies
    BEFORE the per-segment cut. Spec format:
    :func:`splade_ray.query.canonical_rank_features`."""
    from splade_ray.query import search

    return search(
        index_dir, queries, params, query_lang=query_lang,
        concurrency=concurrency, rank_features=rank_features,
    )


SORT_INDEX_VERSION = 1


def _sortmap_paths(seg_dir: str, col: str | None,
                   keys: list[tuple[str, bool]] | None) -> tuple[str, str]:
    """(parquet, json-sidecar) paths for a sort layer. Single-key layers
    keep the readable ``sortmap-<col>`` name; multi-key layers use a
    digest of the key spec (column names may repeat across layers and can
    contain path-hostile characters)."""
    import hashlib
    import json

    if keys is None:
        out = os.path.join(seg_dir, f"sortmap-{col}.parquet")
    else:
        spec = json.dumps([[c, bool(d)] for c, d in keys])
        digest = hashlib.sha1(spec.encode()).hexdigest()[:12]
        out = os.path.join(seg_dir, f"sortmap-mk-{digest}.parquet")
    return out, out + ".json"


def _sort_perm(seg_dir: str, keys: list[tuple[str, bool]],
               ids: np.ndarray) -> np.ndarray:
    """Row permutation ordering the segment by ``keys`` then doc_id asc.
    Numeric keys sort by (negated-for-descending) value; string keys by
    per-segment np.unique codes — codepoint order, the same collation the
    query path and DuckDB use."""
    sortkeys = []
    for c, desc in keys:
        vals = pq.read_table(
            os.path.join(seg_dir, "doclens.parquet"), columns=[c]
        )[c].to_numpy(zero_copy_only=False)
        if not np.issubdtype(vals.dtype, np.number):
            _, vals = np.unique(vals.astype(str), return_inverse=True)
        sortkeys.append(-vals if desc else vals)
    return np.lexsort((ids, *reversed(sortkeys))).astype(np.int32)


def build_sort_index(
    index_dir: str,
    col: str | None = None,
    *,
    descending: bool = True,
    keys: list[tuple[str, bool]] | None = None,
    concurrency=None,
) -> dict:
    """Derived per-segment SORT-ORDER layer — the Lucene index-time-sort
    analog expressed as a doc-values permutation (segments themselves stay
    in ascending-doc_id order, the invariant every posting/tombstone
    kernel relies on): for each segment, a ``sortmap-*.parquet`` holds
    the row positions ordered by the sort spec (final tie -> doc_id asc).
    :func:`sort_search` then serves a matching sort query by a
    single boolean GATHER down the permutation — no per-query lexsort, no
    np.unique, early-terminating at the per-segment cut exactly like
    Lucene's sorted-index early termination.

    Two spec shapes, mirroring :func:`sort_search`:

    - ``col=<numeric col>`` (+ ``descending``): the single-key layer.
    - ``keys=[(col, descending), ...]`` (Lucene multi-field index sort,
      ``SortField.STRING`` included): numeric or string columns; string
      order is codepoint collation, matching the query path and DuckDB.
      Layers are independent — an index may carry several (one file per
      spec, multi-key names digest-keyed).

    Resumable per segment (tmp + atomic rename; existing maps with a
    matching params manifest are skipped); a direction or version change
    rebuilds. Returns {"n_segments", "n_built"}."""
    import json

    from splade_ray.build import segment_dirs

    if (col is None) == (keys is None):
        raise ValueError("pass exactly one of col / keys")
    keyspec = [(col, bool(descending))] if keys is None else [
        (c, bool(d)) for c, d in keys]
    if keys is None:
        params = {"version": SORT_INDEX_VERSION, "col": col,
                  "descending": bool(descending)}
    else:
        params = {"version": SORT_INDEX_VERSION,
                  "keys": [[c, d] for c, d in keyspec]}

    segs = segment_dirs(index_dir)

    def one(seg_dir: str) -> pa.Table:
        out_path, meta_path = _sortmap_paths(
            seg_dir, col, None if keys is None else keyspec)
        if os.path.exists(out_path) and os.path.exists(meta_path):
            with open(meta_path) as f:
                if json.load(f) == params:
                    return pa.table({"built": pa.array([0], pa.int64())})
        if keys is None:
            # single-key fast path: validates the column is numeric
            _numeric_column(seg_dir, col)
        ids = pq.read_table(
            os.path.join(seg_dir, "doclens.parquet"), columns=["doc_id"]
        )["doc_id"].to_numpy(zero_copy_only=False)
        perm = _sort_perm(seg_dir, keyspec, ids)
        tmp = out_path + f".tmp-{os.getpid()}"
        pq.write_table(pa.table({"pos": pa.array(perm, pa.int32())}), tmp)
        os.rename(tmp, out_path)
        with open(meta_path + ".tmp", "w") as f:
            json.dump(params, f)
        os.rename(meta_path + ".tmp", meta_path)
        return pa.table({"built": pa.array([1], pa.int64())})

    empty = pa.table({"built": pa.array([], pa.int64())})
    pdf = _segment_pipeline(index_dir, one, empty, concurrency)
    return {"n_segments": len(segs),
            "n_built": int(pdf["built"].sum()) if not pdf.empty else 0}


def _load_sortmap(out_path: str, meta_path: str, params: dict):
    import json

    if not (os.path.exists(out_path) and os.path.exists(meta_path)):
        return None
    with open(meta_path) as f:
        if json.load(f) != params:
            return None
    return pq.read_table(out_path, columns=["pos"])["pos"].to_numpy(
        zero_copy_only=False).astype(np.int64)


def _load_sort_index(seg_dir: str, col: str, descending: bool):
    """The segment's single-key sort permutation if a matching layer
    exists, else None (callers fall back to the lexsort path)."""
    out_path, meta_path = _sortmap_paths(seg_dir, col, None)
    return _load_sortmap(out_path, meta_path,
                         {"version": SORT_INDEX_VERSION, "col": col,
                          "descending": bool(descending)})


def _load_sort_index_multi(seg_dir: str, keys: list[tuple[str, bool]]):
    """The segment's multi-key sort permutation for exactly ``keys``, else
    None."""
    keyspec = [(c, bool(d)) for c, d in keys]
    out_path, meta_path = _sortmap_paths(seg_dir, None, keyspec)
    return _load_sortmap(out_path, meta_path,
                         {"version": SORT_INDEX_VERSION,
                          "keys": [[c, d] for c, d in keyspec]})


def sort_empty_table(keys: list[tuple[str, bool]], single: bool) -> pa.Table:
    """Typed empty result table for a sort spec (value columns int64 for
    the single numeric key, col-named for multi-key)."""
    value_names = ["sort_value"] if single else [c for c, _ in keys]
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            **{n: pa.array([], pa.int64()) for n in value_names},
        }
    )


def segment_sort_rows(
    seg: SegmentIndex,
    prep: dict,
    keys: list[tuple[str, bool]],
    *,
    single: bool,
    top_k: int,
    after: dict[int, tuple] | None = None,
    empty: pa.Table | None = None,
) -> pa.Table:
    """Per-segment sort-query kernel, shared by the Dataset pipeline
    (:func:`sort_search`) and the serving shard actors
    (``IndexShardActor.sort`` → ``QueryRouter.sort_search``): matched
    candidates per query, exclusive ``after`` cursor applied BEFORE the
    per-segment cut, then either the derived sort-order layer's
    early-terminating permutation gather (when the spec matches a built
    layer) or the per-key np.unique-codes lexsort. Returns <= top_k rows
    per (query, segment). Doc-values load through ``seg.doc_values``
    (cached on the SegmentIndex — free on repeated serving calls)."""
    sort_col, descending = keys[0]
    value_names = ["sort_value"] if single else [c for c, _ in keys]
    if empty is None:
        empty = sort_empty_table(keys, single)
    if single:
        vals = seg.doc_values(sort_col)
        if not np.issubdtype(vals.dtype, np.number):
            raise TypeError(
                f"doc column {sort_col!r} is not numeric (dtype {vals.dtype})")
        colvals = {sort_col: vals}
    else:
        colvals = {c: seg.doc_values(c) for c, _ in keys}
    # derived sort-order layer (build_sort_index): when the query's
    # sort spec matches a built layer (single- or multi-key), the
    # per-query lexsort+unique collapses to one boolean gather down
    # the precomputed permutation — Lucene sorted-index early
    # termination. Cached on the SegmentIndex (False = known-absent) so
    # long-lived serving shards pay the layer read once per spec.
    perm_cache = getattr(seg, "_sortperms", None)
    if perm_cache is None:
        perm_cache = seg._sortperms = {}
    spec = tuple(keys) + (bool(single),)
    perm = perm_cache.get(spec)
    if perm is None:
        perm = (_load_sort_index(seg.seg_dir, sort_col, descending)
                if single else _load_sort_index_multi(seg.seg_dir, keys))
        perm_cache[spec] = perm if perm is not None else False
    elif perm is False:
        perm = None
    out = {"query_id": [], "doc_id": []}
    out.update({n: [] for n in value_names})
    for qid, terms in prep["queries"].items():
        cand = np.flatnonzero(_matched_mask(seg, terms))
        cur = (after or {}).get(qid)
        if cur is not None:
            # exclusive cursor, applied BEFORE the per-segment cut:
            # strictly-after = lexicographic tuple comparison over the
            # sort keys, final tie broken by doc_id asc
            *v0s, d0 = cur
            if len(v0s) != len(keys):
                raise ValueError(
                    f"after cursor for query {qid} has {len(v0s)} sort "
                    f"values, expected {len(keys)}"
                )
            cd = seg.doc_ids[cand]
            keep = np.zeros(cand.size, bool)
            eq = np.ones(cand.size, bool)
            for (c, desc), v0 in zip(keys, v0s):
                cv = colvals[c][cand]
                keep |= eq & ((cv < v0) if desc else (cv > v0))
                eq &= cv == v0
            keep |= eq & (cd > d0)
            cand = cand[keep]
        if cand.size == 0:
            continue
        if perm is not None:
            mask = np.zeros(seg.doc_ids.size, bool)
            mask[cand] = True
            take = perm[mask[perm]][:top_k]  # early-terminating gather
        else:
            # per-key codes via np.unique: one uniform, vectorized
            # ordering for numeric AND string keys (descending =
            # negated codes)
            sortkeys = []
            for c, desc in keys:
                _, codes = np.unique(colvals[c][cand],
                                     return_inverse=True)
                sortkeys.append(-codes if desc else codes)
            order = np.lexsort((seg.doc_ids[cand], *reversed(sortkeys)))
            take = cand[order[:top_k]]  # per-segment cut: k rows leave
        out["query_id"].extend([qid] * take.size)
        out["doc_id"].extend(seg.doc_ids[take].tolist())
        for (c, _), n in zip(keys, value_names):
            out[n].extend(colvals[c][take].tolist())
    # value columns typed from the ACTUAL doc-values dtype even when this
    # segment matched nothing (an int64-typed empty beside a string-typed
    # neighbor breaks strict concat on the serving path)
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            **{n: pa.array(np.asarray(out[n]) if out[n]
                           else colvals[c][:0])
               for (c, _), n in zip(keys, value_names)},
        }
    )


def merge_sort_rows(
    pdf: pd.DataFrame,
    keys: list[tuple[str, bool]],
    *,
    single: bool,
    top_k: int,
) -> pd.DataFrame:
    """Driver/coordinator-side merge of per-segment sort rows: global
    order over the sort keys (final tie doc_id asc), rank, cut."""
    value_names = ["sort_value"] if single else [c for c, _ in keys]
    out_columns = ["query_id", "rank", "doc_id", *value_names]
    if pdf.empty:
        out = pd.DataFrame(columns=out_columns)
        return out.astype({"query_id": np.int64, "rank": np.int32,
                           "doc_id": np.int64})
    pdf = pdf.sort_values(
        ["query_id", *value_names, "doc_id"],
        ascending=[True, *[not d for _, d in keys], True],
        kind="mergesort",
    )
    pdf["rank"] = pdf.groupby("query_id").cumcount().add(1).astype(np.int32)
    pdf = pdf[pdf["rank"] <= top_k]
    return pdf.reset_index(drop=True)[out_columns]


def sort_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    sort_col: str | None = None,
    descending: bool = True,
    sort_keys: list[tuple[str, bool]] | None = None,
    top_k: int = 10,
    query_lang: str | None = None,
    after: dict[int, tuple] | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """Top-k live docs matching >=1 query term, ordered by sidecar doc
    columns instead of score (Lucene ``Sort`` over doc-values; final tie ->
    doc_id asc).

    Two call shapes:

    - ``sort_col=<numeric col>`` (Lucene ``Sort.LONG``): returns
      (query_id, rank, doc_id, sort_value).
    - ``sort_keys=[(col, descending), ...]`` (Lucene multi-field ``Sort``,
      ``SortField.STRING`` included): columns may be numeric or string
      (string order = codepoint / binary collation, matching DuckDB's
      default); returns (query_id, rank, doc_id, <col>...) with one value
      column per sort key, named after the column.

    ``after`` paginates (Lucene searchAfter with sort fields): per query an
    exclusive ``(*sort_values, doc_id)`` cursor; the page holds the next
    ``top_k`` rows strictly after it in the sort order, filtered INSIDE
    each segment before its cut — deep pages exact, ranks restart at 1."""
    from splade_ray.delete import load_tombstones

    if (sort_col is None) == (sort_keys is None):
        raise ValueError("pass exactly one of sort_col / sort_keys")
    single = sort_keys is None
    keys = [(sort_col, descending)] if single else list(sort_keys)

    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    empty = sort_empty_table(keys, single)

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        return segment_sort_rows(seg, prep, keys, single=single,
                                 top_k=top_k, after=after, empty=empty)

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    return merge_sort_rows(pdf, keys, single=single, top_k=top_k)


def _seg_numeric_values(seg: SegmentIndex, col: str,
                        require_int: bool = False) -> np.ndarray:
    """Cached numeric doc-values from a SegmentIndex (serving-path
    friendly), with the same type contracts as ``_numeric_column`` /
    ``numeric_stats``."""
    vals = seg.doc_values(col)
    if not np.issubdtype(vals.dtype, np.number):
        raise TypeError(f"doc column {col!r} is not numeric ({vals.dtype})")
    if require_int and not np.issubdtype(vals.dtype, np.integer):
        raise TypeError(
            f"numeric_stats is integer-exact; {col!r} is {vals.dtype} — "
            "pre-cast or use numeric_histogram")
    return vals


def segment_agg_rows(seg: SegmentIndex, prep: dict, spec: dict) -> pa.Table:
    """Per-segment partial rows for a metric aggregation over live
    matches, shared by the Dataset pipelines and the serving shard actors
    (``IndexShardActor.agg`` → ``QueryRouter.agg_search``). ``spec``:

    - ``{"kind": "count"}`` — TotalHitCountCollector partials;
    - ``{"kind": "stats", "col", "extended"}`` — ES stats /
      extended_stats integer partials;
    - ``{"kind": "histogram", "col", "interval"}`` — ES histogram bucket
      partials."""
    kind = spec["kind"]
    if kind == "count":
        qids, counts = [], []
        for qid, terms in prep["queries"].items():
            n = int(_matched_mask(seg, terms).sum())
            if n:
                qids.append(qid)
                counts.append(n)
        return pa.table({"query_id": pa.array(qids, pa.int64()),
                         "n_docs": pa.array(counts, pa.int64())})
    if kind == "stats":
        extended = bool(spec.get("extended"))
        vals = _seg_numeric_values(seg, spec["col"],
                                   require_int=True).astype(np.int64)
        cols = ["query_id", "n_docs", "sum_value", "min_value", "max_value"]
        if extended:
            cols.append("sum_sq")
        out = {k: [] for k in cols}
        for qid, terms in prep["queries"].items():
            m = _matched_mask(seg, terms)
            if not m.any():
                continue
            v = vals[m]
            out["query_id"].append(qid)
            out["n_docs"].append(int(m.sum()))
            out["sum_value"].append(int(v.sum()))
            out["min_value"].append(int(v.min()))
            out["max_value"].append(int(v.max()))
            if extended:
                out["sum_sq"].append(int((v * v).sum()))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})
    if kind == "histogram":
        interval = int(spec["interval"])
        vals = _seg_numeric_values(seg, spec["col"])
        buckets = np.floor_divide(vals, interval).astype(np.int64) * interval
        out = {"query_id": [], "bucket": [], "n_docs": []}
        for qid, terms in prep["queries"].items():
            matched = _matched_mask(seg, terms)
            if not matched.any():
                continue
            uniq, counts = np.unique(buckets[matched], return_counts=True)
            out["query_id"].extend([qid] * uniq.size)
            out["bucket"].extend(uniq.tolist())
            out["n_docs"].extend(counts.tolist())
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})
    raise ValueError(f"unknown agg kind {kind!r}")


def merge_agg_rows(pdf: pd.DataFrame, spec: dict,
                   queries: list[tuple[int, str]]) -> pd.DataFrame:
    """Coordinator-side combine of :func:`segment_agg_rows` partials —
    plain integer sums/mins/maxes, query-count-sized."""
    kind = spec["kind"]
    if kind == "count":
        base = pd.DataFrame({"query_id": np.array(
            sorted({int(q) for q, _ in queries}), np.int64)})
        if pdf.empty:
            base["n_docs"] = np.int64(0)
            return base
        agg = pdf.groupby("query_id", as_index=False)["n_docs"].sum()
        out = base.merge(agg, on="query_id", how="left")
        out["n_docs"] = out["n_docs"].fillna(0).astype(np.int64)
        return out.sort_values("query_id").reset_index(drop=True)
    if kind == "stats":
        aggs = dict(
            n_docs=("n_docs", "sum"),
            sum_value=("sum_value", "sum"),
            min_value=("min_value", "min"),
            max_value=("max_value", "max"),
        )
        if spec.get("extended"):
            aggs["sum_sq"] = ("sum_sq", "sum")
        if pdf.empty:
            return pd.DataFrame(
                {k: pd.Series([], dtype=np.int64)
                 for k in ["query_id", *aggs]})
        return (pdf.groupby("query_id", as_index=False).agg(**aggs)
                .sort_values("query_id").reset_index(drop=True))
    if kind == "histogram":
        if pdf.empty:
            return pd.DataFrame(
                {k: pd.Series([], dtype=np.int64)
                 for k in ["query_id", "bucket", "n_docs"]})
        return (pdf.groupby(["query_id", "bucket"], as_index=False)["n_docs"]
                .sum().sort_values(["query_id", "bucket"])
                .reset_index(drop=True))
    raise ValueError(f"unknown agg kind {kind!r}")


def match_counts(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """(query_id, n_docs): exact count of live docs containing >=1 query
    term (Lucene TotalHitCountCollector). Queries with zero matches get a
    zero row, so every input query appears."""
    from splade_ray.delete import load_tombstones

    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), "n_docs": pa.array([], pa.int64())}
    )

    spec = {"kind": "count"}

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        return segment_agg_rows(seg, prep, spec)

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    return merge_agg_rows(pdf, spec, queries)


def numeric_stats(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    numeric_col: str,
    extended: bool = False,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """(query_id, n_docs, sum_value, min_value, max_value[, sum_sq]): metric
    aggregation of the sidecar numeric column over each query's live
    matches (the Elasticsearch ``stats`` aggregation; avg = sum/n is left
    to the caller so every emitted column stays integer-exact for int64
    doc values). ``extended=True`` adds the sum-of-squares partial (the ES
    ``extended_stats`` sketch: variance = (sum_sq - sum²/n)/n, derive with
    :func:`extended_stats_derive`) — still one integer per (segment, query),
    merged by plain sums, so the shuffle stays query-count-sized. Queries
    with zero matches are omitted (min/max of an empty set is undefined);
    sorted by query_id."""
    from splade_ray.delete import load_tombstones

    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "sum_value": pa.array([], pa.int64()),
            "min_value": pa.array([], pa.int64()),
            "max_value": pa.array([], pa.int64()),
        }
    )

    spec = {"kind": "stats", "col": numeric_col, "extended": bool(extended)}

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        return segment_agg_rows(seg, prep, spec)

    if extended:
        empty = empty.append_column("sum_sq", pa.array([], pa.int64()))
    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    return merge_agg_rows(pdf, spec, queries)


def extended_stats_derive(stats: pd.DataFrame) -> pd.DataFrame:
    """Driver-side closing of the extended_stats sketch: adds the ES
    derived columns avg, variance (population, the ES default) and
    std_deviation from the integer partials. Input = ``numeric_stats(...,
    extended=True)`` output (query-count-sized)."""
    out = stats.copy()
    n = out["n_docs"].to_numpy(np.float64)
    s = out["sum_value"].to_numpy(np.float64)
    sq = out["sum_sq"].to_numpy(np.float64)
    out["avg"] = s / n
    var = sq / n - (s / n) ** 2
    out["variance"] = np.maximum(var, 0.0)  # clamp float cancellation
    out["std_deviation"] = np.sqrt(out["variance"].to_numpy())
    return out


def numeric_histogram(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    numeric_col: str,
    interval: int,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """(query_id, bucket, n_docs): live-match counts per numeric bucket,
    ``bucket = (v // interval) * interval`` (inclusive lower bound; int64
    floor division, negatives floor toward -inf) — the Elasticsearch
    ``histogram`` aggregation over matches. Empty buckets are omitted;
    sorted by (query_id, bucket)."""
    from splade_ray.delete import load_tombstones

    if interval <= 0:
        raise ValueError("interval must be positive")
    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
        }
    )

    spec = {"kind": "histogram", "col": numeric_col, "interval": interval}

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        return segment_agg_rows(seg, prep, spec)

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    return merge_agg_rows(pdf, spec, queries)


BLOCK_JOIN_COLUMNS = ["query_id", "rank", "parent", "score", "n_children"]


def block_join_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    parent_col: str,
    score_mode: str = "max",
    top_k: int = 10,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """Parent-ranked retrieval (Lucene ToParentBlockJoinQuery / ES
    ``has_child``): children are the indexed docs, a parent is every
    distinct value of the ``parent_col`` sidecar doc-values column, and
    parents rank by aggregating their MATCHING children's scores
    (BM25 > 0):

    - ``score_mode`` ∈ max | sum | min | avg | count (ES has_child modes;
      ``count`` = ``none`` + total-hits, score is the child count);
    - ties break (score desc, parent asc); parents with no matching child
      don't appear. Rows carry ``n_children`` = matching-child count.

    Unlike Lucene's single-block layout, children of one parent may span
    segments: each segment emits ONE partial row per (query, parent-in-
    segment) — (sum, max, min, count) partials, associatively combined —
    so what leaves a segment is aggregate-sized, never child-sized. The
    driver reduce is a parents × queries groupby (the facet-aggregation
    contract: parent cardinality must be aggregate-small; for web-scale
    parent keys pre-bucket by hash and push this through a Ray groupby)."""
    from splade_ray.delete import load_tombstones

    params = params or BM25Params()
    if score_mode not in ("max", "sum", "min", "avg", "count"):
        raise ValueError(f"unknown score_mode {score_mode!r}")
    prepared = prepare_queries(index_dir, queries, params, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "parent": pa.array([], pa.string()),
            "s_sum": pa.array([], pa.float64()),
            "s_max": pa.array([], pa.float64()),
            "s_min": pa.array([], pa.float64()),
            "n_children": pa.array([], pa.int64()),
        }
    )

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        parents = seg.doc_values(parent_col)
        out = {k: [] for k in ("query_id", "parent", "s_sum", "s_max",
                               "s_min", "n_children")}
        for qid in prep["queries"]:
            scores = seg.dense_query_scores(qid, prep)
            if scores is None:
                continue
            hit = np.flatnonzero(scores > params.threshold)
            if hit.size == 0:
                continue
            sc = scores[hit]
            u, inv = np.unique(parents[hit], return_inverse=True)
            s_sum = np.bincount(inv, weights=sc, minlength=u.size)
            s_max = np.full(u.size, -np.inf)
            np.maximum.at(s_max, inv, sc)
            s_min = np.full(u.size, np.inf)
            np.minimum.at(s_min, inv, sc)
            cnt = np.bincount(inv, minlength=u.size)
            out["query_id"].extend([qid] * u.size)
            out["parent"].extend(u.tolist())
            out["s_sum"].extend(s_sum.tolist())
            out["s_max"].extend(s_max.tolist())
            out["s_min"].extend(s_min.tolist())
            out["n_children"].extend(cnt.tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "parent": pa.array([str(p) for p in out["parent"]], pa.string()),
                "s_sum": pa.array(out["s_sum"], pa.float64()),
                "s_max": pa.array(out["s_max"], pa.float64()),
                "s_min": pa.array(out["s_min"], pa.float64()),
                "n_children": pa.array(out["n_children"], pa.int64()),
            }
        )

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        out = pd.DataFrame(columns=BLOCK_JOIN_COLUMNS)
        return out.astype({"query_id": np.int64, "rank": np.int32,
                           "score": np.float64, "n_children": np.int64})
    agg = pdf.groupby(["query_id", "parent"], as_index=False).agg(
        s_sum=("s_sum", "sum"), s_max=("s_max", "max"),
        s_min=("s_min", "min"), n_children=("n_children", "sum"),
    )
    if score_mode == "sum":
        agg["score"] = agg["s_sum"]
    elif score_mode == "max":
        agg["score"] = agg["s_max"]
    elif score_mode == "min":
        agg["score"] = agg["s_min"]
    elif score_mode == "avg":
        agg["score"] = agg["s_sum"] / agg["n_children"]
    else:  # count
        agg["score"] = agg["n_children"].astype(np.float64)
    agg = agg.sort_values(["query_id", "score", "parent"],
                          ascending=[True, False, True], kind="mergesort")
    agg["rank"] = agg.groupby("query_id").cumcount().add(1).astype(np.int32)
    agg = agg[agg["rank"] <= top_k]
    agg["n_children"] = agg["n_children"].astype(np.int64)
    return agg.reset_index(drop=True)[BLOCK_JOIN_COLUMNS]


def composite_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    sources: list[str],
    size: int = 10,
    after: dict[int, tuple] | None = None,
    query_lang: str | None = None,
    concurrency=None,
) -> tuple[pd.DataFrame, dict[int, tuple]]:
    """ES ``composite`` aggregation over live matching docs: buckets are
    the distinct tuples of the ``sources`` sidecar doc-values columns,
    paged in ascending bucket-key order (string = binary collation,
    numeric = numeric; final order is the full tuple). Returns
    ``(page, after_keys)`` — page rows are (query_id, <source cols...>,
    n_docs) and ``after_keys[qid]`` is the page's last bucket tuple (the
    cursor for the next call, ES ``after``).

    Pushdown paging: each segment emits only its FIRST ``size`` buckets
    strictly after the cursor (plus their partial counts). Any bucket in
    the global page is, in every segment containing it, preceded by a
    subset of the union's preceding buckets (< size), so it is inside
    that segment's emitted prefix — counts on the page are complete while
    per-segment output stays O(queries × size), never bucket-space-sized.
    The driver reduce is a page-sized groupby."""
    from splade_ray.delete import load_tombstones

    if not sources:
        raise ValueError("composite_agg needs at least one source column")
    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    after = after or {}

    def per_segment(seg_dir: str) -> pa.Table | None:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        colvals = {c: seg.doc_values(c) for c in sources}
        parts = []
        for qid, terms in prep["queries"].items():
            hit = np.flatnonzero(_matched_mask(seg, terms))
            if hit.size == 0:
                continue
            g = (
                pd.DataFrame({c: colvals[c][hit] for c in sources})
                .groupby(sources, as_index=False, sort=True)
                .size()
                .rename(columns={"size": "n_docs"})
            )
            cur = after.get(qid)
            if cur is not None:
                # strictly-after cursor, ascending lexicographic tuples
                keep = np.zeros(len(g), bool)
                eq = np.ones(len(g), bool)
                for c, v0 in zip(sources, cur):
                    cv = g[c].to_numpy()
                    keep |= eq & (cv > v0)
                    eq &= cv == v0
                g = g[keep]
            g = g.head(size).copy()  # segment's page-candidate prefix
            if len(g):
                g.insert(0, "query_id", np.int64(qid))
                parts.append(g)
        if not parts:
            return None
        return pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                    preserve_index=False)

    empty_pd = pd.DataFrame(columns=["query_id", *sources, "n_docs"])
    empty = pa.Table.from_pandas(empty_pd.astype({"query_id": np.int64,
                                                  "n_docs": np.int64}),
                                 preserve_index=False)
    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        return empty_pd.astype({"query_id": np.int64, "n_docs": np.int64}), {}
    agg = pdf.groupby(["query_id", *sources], as_index=False)["n_docs"].sum()
    agg = agg.sort_values(["query_id", *sources], kind="mergesort")
    agg = agg.groupby("query_id").head(size).reset_index(drop=True)
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    after_keys = {
        int(q): tuple(g.iloc[-1][c] for c in sources)
        for q, g in agg.groupby("query_id")
    }
    return agg[["query_id", *sources, "n_docs"]], after_keys


TOP_HITS_COLUMNS = ["query_id", "bucket", "hit_rank", "doc_id", "score"]


def top_hits_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    group_col: str,
    hits_per_bucket: int = 3,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """top_hits aggregation (Elasticsearch): group each query's matches by
    a doc-values column and keep the best ``hits_per_bucket`` docs per
    bucket, ranked (score desc, doc_id asc). Rows: (query_id, bucket,
    hit_rank, doc_id, score) sorted by (query_id, bucket, hit_rank).

    Scale shape: each segment emits at most queries × buckets-in-segment ×
    k rows (local per-bucket top-k via one lexsort — no Python loop over
    docs); the driver reduce re-cuts the same ordering over partials.
    Bucket cardinality must be aggregate-small like every facet op here —
    pre-bucket by hash for web-scale key sets."""
    from splade_ray.delete import load_tombstones

    params = params or BM25Params()
    k = int(hits_per_bucket)
    if k < 1:
        raise ValueError("hits_per_bucket must be >= 1")
    prepared = prepare_queries(index_dir, queries, params, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        return segment_top_hits_rows(seg, prep, group_col, k,
                                     params.threshold)

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    return merge_top_hits_rows(pdf, k)


def segment_top_hits_rows(seg: "SegmentIndex", prep: dict, group_col: str,
                          k: int, threshold: float) -> pa.Table:
    """One segment's top_hits partials — shared by the Dataset pipeline
    (:func:`top_hits_agg`) and the serving shard actors
    (``IndexShardActor.facet`` → ``QueryRouter.facet_search``): at most
    queries × buckets-in-segment × k (query_id, bucket, doc_id, score)
    rows, local per-bucket top-k via one lexsort."""
    buckets = seg.doc_values(group_col)
    out = {n: [] for n in ("query_id", "bucket", "doc_id", "score")}
    for qid in prep["queries"]:
        scores = seg.dense_query_scores(qid, prep)
        if scores is None:
            continue
        hit = np.flatnonzero(scores > threshold)
        if hit.size == 0:
            continue
        sc, docs = scores[hit], seg.doc_ids[hit]
        u, inv = np.unique(buckets[hit], return_inverse=True)
        # local per-bucket top-k: one lexsort (bucket, -score, doc_id),
        # then position-within-group < k
        order = np.lexsort((docs, -sc, inv))
        g = inv[order]
        first = np.concatenate(([0], np.flatnonzero(g[1:] != g[:-1]) + 1))
        pos_in_group = np.arange(g.size) - np.repeat(
            first, np.diff(np.concatenate((first, [g.size])))
        )
        keep = order[pos_in_group < k]
        out["query_id"].extend([qid] * keep.size)
        out["bucket"].extend(str(b) for b in u[inv[keep]])
        out["doc_id"].extend(docs[keep].tolist())
        out["score"].extend(sc[keep].tolist())
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], pa.int64()),
            "bucket": pa.array(out["bucket"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "score": pa.array(out["score"], pa.float64()),
        }
    )


def merge_top_hits_rows(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """Combine top_hits partials: re-cut the same (score desc, doc_id asc)
    ordering over the union and assign hit_rank — shared by the Dataset
    reducer and the router endpoint."""
    if pdf.empty:
        out = pd.DataFrame(columns=TOP_HITS_COLUMNS)
        return out.astype({"query_id": np.int64, "bucket": str,
                           "hit_rank": np.int64, "doc_id": np.int64,
                           "score": np.float64})
    pdf = pdf.sort_values(
        ["query_id", "bucket", "score", "doc_id"],
        ascending=[True, True, False, True], kind="mergesort",
    )
    pdf["hit_rank"] = (
        pdf.groupby(["query_id", "bucket"]).cumcount().add(1).astype(np.int64)
    )
    pdf = pdf[pdf["hit_rank"] <= k]
    return pdf.reset_index(drop=True)[TOP_HITS_COLUMNS]


def _filter_mask(spec: tuple, colvals: dict, n: int) -> np.ndarray:
    """Boolean doc mask for one named-filter predicate spec:
    ``("range", col, lo, hi)`` (inclusive, None = unbounded) or
    ``("terms", col, [values...])`` (exact membership)."""
    kind = spec[0]
    if kind == "range":
        _, col, lo, hi = spec
        v = colvals[col]
        m = np.ones(n, bool)
        if lo is not None:
            m &= v >= lo
        if hi is not None:
            m &= v <= hi
        return m
    if kind == "terms":
        _, col, values = spec
        return np.isin(colvals[col], np.asarray(list(values)))
    raise ValueError(f"unknown filter kind {kind!r}")


def filters_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    filters: dict[str, tuple],
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``filters`` aggregation: named buckets of each query's live
    matches, one bucket per entry of ``filters`` — ``{name: ("range", col,
    lo, hi) | ("terms", col, [values...])}`` over sidecar doc-values
    columns. Returns (query_id, filter, n_docs) for EVERY (query, filter)
    pair (empty buckets = 0, the ES contract), sorted by (query_id, filter).

    Scale shape: filter masks are query-independent — computed once per
    segment and reused across queries; each segment emits at most
    queries × len(filters) count rows."""
    from splade_ray.delete import load_tombstones

    if not filters:
        raise ValueError("filters_agg needs at least one named filter")
    names = sorted(filters)
    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "filter": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
        }
    )

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        cols = {c for spec in filters.values() for c in [spec[1]]}
        colvals = {c: seg.doc_values(c) for c in cols}
        masks = {
            name: _filter_mask(filters[name], colvals, seg.doc_ids.size)
            for name in names
        }
        out = {"query_id": [], "filter": [], "n_docs": []}
        for qid, terms in prep["queries"].items():
            matched = _matched_mask(seg, terms)
            if not matched.any():
                continue
            for name in names:
                n = int((matched & masks[name]).sum())
                if n:
                    out["query_id"].append(qid)
                    out["filter"].append(name)
                    out["n_docs"].append(n)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "filter": pa.array(out["filter"], pa.string()),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
            }
        )

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    qids = sorted({int(q) for q, _ in queries})
    base = pd.DataFrame(
        [(q, n) for q in qids for n in names], columns=["query_id", "filter"]
    )
    base["query_id"] = base["query_id"].astype(np.int64)
    if pdf.empty:
        base["n_docs"] = np.int64(0)
        return base
    agg = pdf.groupby(["query_id", "filter"], as_index=False)["n_docs"].sum()
    out = base.merge(agg, on=["query_id", "filter"], how="left")
    out["n_docs"] = out["n_docs"].fillna(0).astype(np.int64)
    return out.sort_values(["query_id", "filter"]).reset_index(drop=True)


def range_key(lo, hi) -> str:
    """The ES range-agg bucket key: "lo-hi" with "*" for an open bound."""
    fmt = lambda v: "*" if v is None else str(v)  # noqa: E731
    return f"{fmt(lo)}-{fmt(hi)}"


def range_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    numeric_col: str,
    ranges: list[tuple],
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``range`` aggregation over matches: per query, live-match counts
    per explicit range — ``from`` INCLUSIVE, ``to`` EXCLUSIVE (the ES
    contract, unlike the inclusive doc-values range *filter*), ``None`` =
    unbounded. Ranges may overlap (a doc counts in every range containing
    it). Returns (query_id, range_key, n_docs) for every (query, range)
    pair including empty buckets, sorted by (query_id, range_key)."""
    from splade_ray.delete import load_tombstones

    if not ranges:
        raise ValueError("range_agg needs at least one range")
    keys = [range_key(lo, hi) for lo, hi in ranges]
    if len(set(keys)) != len(keys):
        raise ValueError("duplicate range keys")
    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "range_key": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
        }
    )

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        v = _numeric_column(seg_dir, numeric_col)
        masks = []
        for (lo, hi), key in zip(ranges, keys):
            m = np.ones(v.size, bool)
            if lo is not None:
                m &= v >= lo
            if hi is not None:
                m &= v < hi  # exclusive upper bound: the ES range-agg `to`
            masks.append((key, m))
        out = {"query_id": [], "range_key": [], "n_docs": []}
        for qid, terms in prep["queries"].items():
            matched = _matched_mask(seg, terms)
            if not matched.any():
                continue
            for key, m in masks:
                n = int((matched & m).sum())
                if n:
                    out["query_id"].append(qid)
                    out["range_key"].append(key)
                    out["n_docs"].append(n)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "range_key": pa.array(out["range_key"], pa.string()),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
            }
        )

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    qids = sorted({int(q) for q, _ in queries})
    base = pd.DataFrame(
        [(q, k) for q in qids for k in keys], columns=["query_id", "range_key"]
    )
    base["query_id"] = base["query_id"].astype(np.int64)
    if pdf.empty:
        base["n_docs"] = np.int64(0)
        return base.sort_values(["query_id", "range_key"]).reset_index(drop=True)
    agg = pdf.groupby(["query_id", "range_key"], as_index=False)["n_docs"].sum()
    out = base.merge(agg, on=["query_id", "range_key"], how="left")
    out["n_docs"] = out["n_docs"].fillna(0).astype(np.int64)
    return out.sort_values(["query_id", "range_key"]).reset_index(drop=True)


def multi_terms_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    cols: list[str],
    top: int = 10,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``multi_terms`` aggregation: per query, the ``top`` most frequent
    value TUPLES of the given doc-values columns over live matches, ordered
    (n_docs desc, tuple asc) — ties pinned like the terms agg. Returns
    (query_id, rank, <col>..., n_docs) sorted by (query_id, rank). Counts
    are EXACT: each segment emits its full per-query tuple table (tuple
    cardinality must be aggregate-small, the facet contract)."""
    from splade_ray.delete import load_tombstones

    if not cols or len(cols) < 2:
        raise ValueError("multi_terms_agg needs >= 2 source columns")
    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty_pd = pd.DataFrame(columns=["query_id", *cols, "n_docs"])
    empty = pa.Table.from_pandas(
        empty_pd.astype({"query_id": np.int64, "n_docs": np.int64}),
        preserve_index=False,
    )

    def per_segment(seg_dir: str) -> pa.Table | None:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        colvals = {c: seg.doc_values(c) for c in cols}
        parts = []
        for qid, terms in prep["queries"].items():
            hit = np.flatnonzero(_matched_mask(seg, terms))
            if hit.size == 0:
                continue
            g = (
                pd.DataFrame({c: colvals[c][hit] for c in cols})
                .groupby(cols, as_index=False)
                .size()
                .rename(columns={"size": "n_docs"})
            )
            g.insert(0, "query_id", np.int64(qid))
            parts.append(g)
        if not parts:
            return None
        return pa.Table.from_pandas(
            pd.concat(parts, ignore_index=True), preserve_index=False
        )

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    out_cols = ["query_id", "rank", *cols, "n_docs"]
    if pdf.empty:
        out = pd.DataFrame(columns=out_cols)
        return out.astype({"query_id": np.int64, "rank": np.int64,
                           "n_docs": np.int64})
    agg = pdf.groupby(["query_id", *cols], as_index=False)["n_docs"].sum()
    agg = agg.sort_values(["query_id", "n_docs", *cols],
                          ascending=[True, False, *[True] * len(cols)],
                          kind="mergesort")
    agg["rank"] = agg.groupby("query_id").cumcount().add(1).astype(np.int64)
    agg = agg[agg["rank"] <= top]
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    return agg.reset_index(drop=True)[out_cols]


def rare_terms_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    col: str,
    max_doc_count: int = 1,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``rare_terms`` aggregation (exact form): per query, the doc-values
    column's values whose GLOBAL live-match count is <= ``max_doc_count``,
    ascending by value. ES approximates with a CuckooFilter; counts here are
    exact — rarity is a global property, so every segment emits its full
    per-query value counts (facet-cardinality-sized) and the driver keeps
    values whose summed count is under the cap. Returns (query_id, value,
    n_docs) sorted by (query_id, value)."""
    from splade_ray.delete import load_tombstones

    if max_doc_count < 1:
        raise ValueError("max_doc_count must be >= 1")
    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "value": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
        }
    )

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        vals = seg.doc_values(col)
        out = {"query_id": [], "value": [], "n_docs": []}
        for qid, terms in prep["queries"].items():
            hit = np.flatnonzero(_matched_mask(seg, terms))
            if hit.size == 0:
                continue
            u, counts = np.unique(vals[hit], return_counts=True)
            out["query_id"].extend([qid] * u.size)
            out["value"].extend(str(v) for v in u)
            out["n_docs"].extend(counts.tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "value": pa.array(out["value"], pa.string()),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
            }
        )

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=str),
                "n_docs": pd.Series([], dtype=np.int64),
            }
        )
    agg = pdf.groupby(["query_id", "value"], as_index=False)["n_docs"].sum()
    agg = agg[agg["n_docs"] <= max_doc_count]
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    return agg.sort_values(["query_id", "value"]).reset_index(drop=True)


def match_percentiles(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    numeric_col: str,
    percents: tuple[float, ...] = (25.0, 50.0, 75.0, 95.0, 99.0),
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``percentiles`` aggregation over matches, EXACT discrete form
    (ES approximates with t-digest): per query and percent p, the smallest
    column value v with |{matches ≤ v}| ≥ ⌈p/100 · n⌉ — DuckDB's
    ``quantile_disc`` contract, so the mirror is one SQL call. Returns
    (query_id, percent, value), sorted.

    Exactness rides the facet contract: each segment emits its per-query
    (value, count) table — bounded by the column's value cardinality, not
    row count — and the driver resolves percentiles from the merged
    cumulative counts."""
    from splade_ray.delete import load_tombstones

    if not percents or any(not 0 < p <= 100 for p in percents):
        raise ValueError("percents must be in (0, 100]")
    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "value": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
        }
    )

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        vals = _numeric_column(seg_dir, numeric_col).astype(np.int64)
        out = {"query_id": [], "value": [], "n_docs": []}
        for qid, terms in prep["queries"].items():
            m = _matched_mask(seg, terms)
            if not m.any():
                continue
            u, counts = np.unique(vals[m], return_counts=True)
            out["query_id"].extend([qid] * u.size)
            out["value"].extend(u.tolist())
            out["n_docs"].extend(counts.tolist())
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    cols = ["query_id", "percent", "value"]
    if pdf.empty:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64 if c != "percent"
                                          else np.float64) for c in cols})
    agg = (
        pdf.groupby(["query_id", "value"], as_index=False)["n_docs"].sum()
        .sort_values(["query_id", "value"])
    )
    rows = []
    for qid, g in agg.groupby("query_id"):
        cum = g["n_docs"].cumsum().to_numpy()
        n = int(cum[-1])
        v = g["value"].to_numpy()
        for p in percents:
            need = int(np.ceil(p / 100.0 * n))
            idx = int(np.searchsorted(cum, max(need, 1)))
            rows.append((int(qid), float(p), int(v[idx])))
    out = pd.DataFrame(rows, columns=cols)
    return out.astype({"query_id": np.int64, "percent": np.float64,
                       "value": np.int64}).sort_values(
        ["query_id", "percent"]).reset_index(drop=True)


def field_stats_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    col: str,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """The ES ``value_count`` + ``missing`` + ``cardinality`` metric trio in
    ONE per-segment pass over a (possibly nullable) doc-values column:
    per query over live matches, (n_value = docs with a non-null value,
    n_missing = docs with a null, n_distinct = exact distinct non-null
    values). ES approximates cardinality with HyperLogLog++; counts here
    are exact under the facet contract (each segment emits its per-query
    distinct-value table — bounded by the column's cardinality; for
    web-scale key spaces use the KMV sketch in ``ops.sketch`` instead).
    Queries with zero matches are omitted; sorted by query_id."""
    from splade_ray.delete import load_tombstones

    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "value": pa.array([], pa.string()),
            "n_docs": pa.array([], pa.int64()),
        }
    )

    def per_segment(seg_dir: str) -> pa.Table:
        import pyarrow.compute as pc

        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        arr = pq.read_table(
            os.path.join(seg_dir, "doclens.parquet"), columns=[col]
        )[col].combine_chunks()
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        vals = np.asarray(arr.to_pylist(), object)
        out = {"query_id": [], "value": [], "n_docs": []}
        for qid, terms in prep["queries"].items():
            m = _matched_mask(seg, terms)
            if not m.any():
                continue
            hit_valid = m & valid
            if hit_valid.any():
                u, counts = np.unique(vals[hit_valid], return_counts=True)
                out["query_id"].extend([qid] * u.size)
                out["value"].extend(str(v) for v in u)
                out["n_docs"].extend(counts.tolist())
            n_null = int((m & ~valid).sum())
            if n_null:
                out["query_id"].append(qid)
                out["value"].append(None)
                out["n_docs"].append(n_null)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "value": pa.array(out["value"], pa.string()),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
            }
        )

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        return pd.DataFrame(
            {k: pd.Series([], dtype=np.int64)
             for k in ["query_id", "n_value", "n_missing", "n_distinct"]}
        )
    isnull = pdf["value"].isna()
    out = pd.DataFrame(
        {
            "n_value": pdf[~isnull].groupby("query_id")["n_docs"].sum(),
            "n_missing": pdf[isnull].groupby("query_id")["n_docs"].sum(),
            "n_distinct": pdf[~isnull].groupby("query_id")["value"].nunique(),
        }
    )
    out = out.fillna(0).astype(np.int64).reset_index()
    return out.sort_values("query_id").reset_index(drop=True)[
        ["query_id", "n_value", "n_missing", "n_distinct"]
    ]


def weighted_avg_agg(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    value_col: str,
    weight_col: str,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``weighted_avg`` aggregation over matches: per query the integer
    partials (n_docs, sum_vw = Σ value·weight, sum_w = Σ weight) over live
    matching docs — the weighted mean derives driver-side as sum_vw/sum_w so
    every emitted column stays integer-exact (the numeric_stats contract).
    Both columns must be integer sidecar doc-values. Queries with zero
    matches are omitted; sorted by query_id."""
    from splade_ray.delete import load_tombstones

    prepared = prepare_queries(index_dir, queries, query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "sum_vw": pa.array([], pa.int64()),
            "sum_w": pa.array([], pa.int64()),
        }
    )

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        v = _numeric_column(seg_dir, value_col)
        w = _numeric_column(seg_dir, weight_col)
        if not (np.issubdtype(v.dtype, np.integer)
                and np.issubdtype(w.dtype, np.integer)):
            raise TypeError(
                "weighted_avg_agg is integer-exact; "
                f"{value_col!r}/{weight_col!r} must be integer columns"
            )
        v, w = v.astype(np.int64), w.astype(np.int64)
        out = {"query_id": [], "n_docs": [], "sum_vw": [], "sum_w": []}
        for qid, terms in prep["queries"].items():
            m = _matched_mask(seg, terms)
            if not m.any():
                continue
            out["query_id"].append(qid)
            out["n_docs"].append(int(m.sum()))
            out["sum_vw"].append(int((v[m] * w[m]).sum()))
            out["sum_w"].append(int(w[m].sum()))
        return pa.table({k: pa.array(c, pa.int64()) for k, c in out.items()})

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    if pdf.empty:
        return pd.DataFrame(
            {k: pd.Series([], dtype=np.int64)
             for k in ["query_id", "n_docs", "sum_vw", "sum_w"]}
        )
    return (
        pdf.groupby("query_id", as_index=False)
        .agg(n_docs=("n_docs", "sum"), sum_vw=("sum_vw", "sum"),
             sum_w=("sum_w", "sum"))
        .sort_values("query_id")
        .reset_index(drop=True)
    )


def terms_set_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    msm_col: str,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """terms_set query (Elasticsearch): a doc matches when it contains at
    least ``m`` DISTINCT query terms, where ``m`` is the doc's own value of
    the ``msm_col`` doc-values column (minimum_should_match_field). Pinned:
    docs with ``m < 1`` never match (ES's script guard), ``m`` above the
    query's distinct-term count never matches; matching docs score plain
    BM25 over the query terms, run contract (score desc, doc_id asc),
    score > threshold.

    The per-doc requirement makes this the one boolean face a global
    minimum_should_match can't express; execution is the standard
    per-segment mask + dense-score kernel."""
    from splade_ray.delete import load_tombstones

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
        req = seg.numeric_values(msm_col).astype(np.int64)
        n = seg.doc_ids.size
        out = {k: [] for k in ("query_id", "doc_id", "score")}
        p: BM25Params = prep["params"]
        for qid, terms in prep["queries"].items():
            cnt = np.zeros(n, np.int64)
            for term, _, _ in terms:
                pos, _ = seg.pos_tfs(term)
                if pos.size:
                    cnt[pos] += 1  # terms are distinct in the prepared list
            allowed = (req >= 1) & (cnt >= req)
            if not allowed.any():
                continue
            scores = seg.dense_query_scores(qid, prep)
            if scores is None:
                continue
            scores[~allowed] = 0.0
            from splade_ray.bm25 import topk_from_scores

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
    from splade_ray.query import RUN_COLUMNS, merge_topk

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
