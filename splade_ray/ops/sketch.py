"""Distributed summary sketches: exact quantiles + KMV distinct counting.

LLM-pipeline dataset profiling ops the reference lacks (its only stats are
mean L0 / FLOPS sidecars, ``transformer_evaluator.py:174-185``):

- :func:`value_quantiles` — EXACT quantiles of a bounded-cardinality integer
  column (doc lengths, char counts, token counts ...) without a global
  sort: per-batch value-count partials, one (group, value)-sized groupby,
  driver-side cumsum over the distinct-value table. The shuffle carries
  distinct-value rows, not data rows — for length-like columns that's
  thousands of rows at any corpus scale, vs the full-data exchange
  ``ds.sort`` would pay. Selection rule pinned to DuckDB ``quantile_disc``:
  1-based rank ``max(ceil(q·n), 1)``.
- :func:`kmv_distinct` — k-minimum-values distinct-count sketch (Bar-Yossef
  et al. 2002): per group keep the k smallest 63-bit value hashes; estimate
  ``(k-1) · 2^63 / kth_min``. Deterministic (no RNG — the hash is
  sha256-prefix, the same mirror every signature oracle uses), mergeable
  (min-merge), and integer-exact against a HUGEINT SQL twin. When a group
  has fewer than k distinct values the sketch IS the exact count.

Both ops are partitioning-invariant: partial states are commutative
monoids, so re-runs and different block layouts give identical results.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

_SCALE = 1 << 63  # hash domain after the >>1 fold (fits int64)


def quantile_rank(q: float, n: int) -> int:
    """DuckDB quantile_disc's 1-based rank: max(ceil(q·n), 1)."""
    return max(int(np.ceil(q * n)), 1)


def value_quantiles(
    ds: Dataset,
    col: str,
    qs: list[float],
    *,
    by: str | None = None,
) -> pd.DataFrame:
    """Exact quantiles of an integer column, optionally per group.

    Returns ``(by?, q_mille, value)`` sorted — ``q_mille`` is the quantile
    in integer permille (0.5 → 500) so every output column is integer/string
    (hash-stable). Contract: ``col`` has bounded distinct cardinality (the
    value-count table must fit on the driver); lengths/counts qualify,
    arbitrary floats don't."""
    keys = ([by] if by else []) + [col]

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys)
        g = t.group_by(keys).aggregate([([], "count_all")])
        return g.rename_columns(keys + ["cnt"])

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # distinct-value-sized
    )
    rows = []
    groups = counts.groupby(by) if by else [(None, counts)]
    for gkey, g in groups:
        g = g.sort_values(col)
        vals = g[col].to_numpy()
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        for q in qs:
            r = quantile_rank(q, n)
            v = vals[np.searchsorted(cum, r)]
            row = {"q_mille": int(round(q * 1000)), "value": int(v)}
            if by:
                row[by] = gkey
            rows.append(row)
    out = pd.DataFrame(rows)
    sort_cols = ([by] if by else []) + ["q_mille"]
    return out.sort_values(sort_cols).reset_index(drop=True)[
        ([by] if by else []) + ["q_mille", "value"]
    ]


def value_quantiles_float(
    ds: Dataset,
    col: str,
    qs: list[float],
    *,
    by: str | None = None,
    scale: int = 100,
) -> pd.DataFrame:
    """Exact quantiles of a FLOAT column at fixed-point resolution: values
    quantize to ``floor(v*scale + 0.5)`` integer codes (the repo-wide
    round-half-up), :func:`value_quantiles` runs exactly on the codes, and
    ``value_fp`` returns the code (value = value_fp/scale, within
    1/(2*scale) of the true float quantile). This keeps the
    distinct-value-sized shuffle contract for unbounded float columns —
    the cardinality bound becomes the value RANGE x scale, not the row
    count — and every emitted column stays integer (hash-stable)."""

    def quantize(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes = np.floor(v * scale + 0.5).astype(np.int64)
        cols = {"_fp": pa.array(codes)}
        if by:
            cols[by] = batch[by]
        return pa.table(cols)

    out = value_quantiles(
        ds.map_batches(quantize, batch_format="pyarrow"), "_fp", qs, by=by
    )
    return out.rename(columns={"value": "value_fp"})


def hash_value63(v: str) -> int:
    """63-bit value hash: sha256-prefix uint64 >> 1 (drops the sign bit so
    the value fits BIGINT on both sides). DuckDB mirror:
    ``(('0x' || substr(sha256(v), 1, 16))::UBIGINT >> 1)::BIGINT``."""
    return int.from_bytes(hashlib.sha256(v.encode()).digest()[:8], "big") >> 1


def kmv_estimate(k_used: int, k: int, kth_min: int) -> int:
    """Integer KMV estimate: exact count below k, else (k-1)·2^63 // kth."""
    if k_used < k:
        return k_used
    return ((k - 1) * _SCALE) // kth_min


def _kmv_min_merge(tbl: pa.Table, k: int, by: str | None) -> pa.Table:
    """Min-merge KMV partials: per group keep the k smallest distinct
    hashes. Same schema in and out, so it can run at any tree level."""
    hv = tbl["hv"].to_numpy(zero_copy_only=False).astype(np.int64)
    if by is None:
        sel = np.unique(hv)[:k]
        return pa.table({"hv": pa.array(sel)})
    grp = tbl[by]
    if isinstance(grp, pa.ChunkedArray):
        grp = grp.combine_chunks()
    genc = grp.dictionary_encode()
    gcodes = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    gvals = genc.dictionary.to_pylist()
    g_out, h_out = [], []
    for gi in np.unique(gcodes):
        sel = np.unique(hv[gcodes == gi])[:k]
        g_out.extend([gvals[int(gi)]] * sel.size)
        h_out.append(sel)
    return pa.table(
        {
            by: pa.array(g_out, pa.string()),
            "hv": pa.array(np.concatenate(h_out) if h_out else np.empty(0, np.int64)),
        }
    )


def _mg_compress(
    vals: np.ndarray, cnts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Compress exact/merged counters to <= k Misra-Gries counters: subtract
    the (k+1)-th largest count from every counter and drop the non-positive
    ones (the merge-compress of Agarwal et al., PODS'12 "Mergeable
    Summaries"). Returns (vals, cnts, decrement)."""
    if vals.size <= k:
        return vals, cnts, 0
    order = np.argsort(-cnts, kind="stable")
    d = int(cnts[order[k]])
    keep = order[:k]
    new = cnts[keep] - d
    pos = new > 0
    if not pos.any():
        # all counters cancelled (uniform distribution): keep one zeroed
        # counter so the decrement mass (err) still has a row to ride on
        return vals[keep[:1]], np.zeros(1, np.int64), d
    return vals[keep][pos], new[pos], d


def heavy_hitters(
    ds: Dataset,
    col: str,
    *,
    k: int = 256,
    top_n: int = 10,
    fan_in: int = 32,
) -> tuple[pd.DataFrame, int, bool]:
    """Top-``top_n`` most frequent values of a string column via a
    Misra-Gries heavy-hitters sketch + an EXACT recount of the candidates.

    Unlike the exact path (a full ``groupby(col)`` — a distinct-value-sized
    shuffle), the sketch pass moves at most ``k`` counters per block: each
    batch's exact counts compress to <= k Misra-Gries counters, partials
    coalesce into ``fan_in`` blocks and merge-compress (mergeable-summaries
    semantics: counter sums, then one decrement), and one final task yields
    <= k candidates. A second streaming pass recounts ONLY the candidates
    exactly (broadcast isin, bincount partials, k-sized groupby).

    Returns ``(frame, err_bound, proven)``: frame = (rank, value, count)
    with EXACT counts, ordered (count desc, value asc); ``err_bound`` = the
    summed decrements, an upper bound on any non-candidate's true count;
    ``proven`` = True when the top_n-th exact count exceeds ``err_bound``
    + the largest non-top-n candidate count — then the frame IS the exact
    global top-n (the classic MG certificate). Deterministic and
    partitioning-safe: the certificate, not the partitioning, decides
    whether the answer is exact."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        enc = vals.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = np.bincount(codes, minlength=len(enc.dictionary))
        uniq = np.asarray(enc.dictionary.to_pylist(), object)
        v, c, d = _mg_compress(uniq, cnts.astype(np.int64), k)
        return pa.table(
            {
                "value": pa.array(v.tolist(), pa.string()),
                "cnt": pa.array(c, pa.int64()),
                "err": pa.array(
                    np.concatenate(([d], np.zeros(max(v.size - 1, 0), np.int64)))
                    if v.size else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        vals = np.asarray(batch["value"].to_pylist(), object)
        cnts = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        err = int(batch["err"].to_numpy(zero_copy_only=False).sum())
        uniq, inv = np.unique(vals, return_inverse=True)
        summed = np.zeros(uniq.size, np.int64)
        np.add.at(summed, inv, cnts)
        v, c, d = _mg_compress(uniq.astype(object), summed, k)
        return pa.table(
            {
                "value": pa.array(v.tolist(), pa.string()),
                "cnt": pa.array(c, pa.int64()),
                "err": pa.array(
                    np.concatenate(([err + d], np.zeros(max(v.size - 1, 0), np.int64)))
                    if v.size else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    sketch = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(fan_in)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    if sketch.empty:
        return (
            pd.DataFrame({"rank": pd.Series([], dtype=np.int64),
                          "value": pd.Series([], dtype=object),
                          "count": pd.Series([], dtype=np.int64)}),
            0,
            True,
        )
    err_bound = int(sketch["err"].sum())
    candidates = sorted(sketch["value"].tolist())

    # exact recount of the k-sized candidate set: broadcast isin filter,
    # bincount partials, candidate-sized groupby
    import ray

    cand_ref = ray.put(np.asarray(candidates, object))

    def recount(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        vals = batch[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        arr = np.asarray(vals.to_pylist(), object)
        pos = np.searchsorted(cand, arr)
        pos = np.minimum(pos, cand.size - 1)
        hit = cand[pos] == arr
        cnts = np.bincount(pos[hit], minlength=cand.size)
        nz = np.flatnonzero(cnts)
        return pa.table(
            {
                "value": pa.array(cand[nz].tolist(), pa.string()),
                "count": pa.array(cnts[nz], pa.int64()),
            }
        )

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("value")
        .sum("count")
        .to_pandas()
        .rename(columns={"sum(count)": "count"})
    )
    exact = exact.sort_values(["count", "value"], ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
    head = exact.head(top_n).copy()
    head.insert(0, "rank", np.arange(1, len(head) + 1, dtype=np.int64))
    # certificate: every non-candidate's true count is <= err_bound; the
    # candidates' counts are exact, so the frame is the exact global top-n
    # iff nothing outside the candidate set could reach the n-th count
    nth = int(head["count"].iloc[-1]) if len(head) else 0
    proven = err_bound == 0 or (len(head) == top_n and nth > err_bound)
    return head.reset_index(drop=True), err_bound, bool(proven)


_HH_SEP = "\x00"


def heavy_hitters_by(
    ds: Dataset,
    col: str,
    by: str,
    *,
    k: int = 256,
    top_n: int = 10,
    fan_in: int = 32,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Per-group top-``top_n`` frequent values — the grouped Misra-Gries
    variant of :func:`heavy_hitters` (top URLs per lang, top types per day).

    Same three-stage shape as the global sketch, with the sketch state keyed
    by group: each block emits <= k counters PER GROUP seen in the block
    (the per-group k budget of Agarwal et al.'s mergeable summaries), blocks
    coalesce into ``fan_in`` merge-compress tasks, one final merge yields
    <= k candidates per group, and a second streaming pass recounts the
    (group, value) candidate pairs exactly via one broadcast sorted key
    array. The shuffle never carries the distinct-value table — only
    ``fan_in · k · n_groups`` counter rows.

    Contract: neither ``by`` nor ``col`` values contain NUL (the pair-key
    separator); group cardinality is bounded (langs, types — not user ids).

    Returns ``(frame, cert)``: frame = (by, rank, value, count) with EXACT
    counts, ordered (by asc, count desc, value asc); cert = (by, err_bound,
    proven) — the per-group MG certificate, True when that group's frame is
    provably the exact top-n."""

    def _mg_rows(gvals, vvals, cnts, errs, out_by, out_v, out_c, out_e):
        """Compress one group's counters, append rows + one err row."""
        v, c, d = _mg_compress(vvals, cnts, k)
        out_by.extend([gvals] * v.size)
        out_v.extend(v.tolist())
        out_c.append(c)
        e = np.zeros(v.size, np.int64)
        if e.size:
            e[0] = errs + d
        out_e.append(e)

    def _emit(out_by, out_v, out_c, out_e) -> pa.Table:
        return pa.table(
            {
                by: pa.array(out_by, pa.string()),
                "value": pa.array(out_v, pa.string()),
                "cnt": pa.array(
                    np.concatenate(out_c) if out_c else np.empty(0, np.int64)
                ),
                "err": pa.array(
                    np.concatenate(out_e) if out_e else np.empty(0, np.int64)
                ),
            }
        )

    def partial(batch: pa.Table) -> pa.Table:
        g = batch[by]
        v = batch[col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        keys = pa.compute.binary_join_element_wise(
            g.cast(pa.string()), v.cast(pa.string()), _HH_SEP
        )
        enc = keys.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = np.bincount(codes, minlength=len(enc.dictionary)).astype(np.int64)
        pairs = enc.dictionary.to_pylist()  # distinct pairs only
        gs = np.asarray([p.split(_HH_SEP, 1)[0] for p in pairs], object)
        vs = np.asarray([p.split(_HH_SEP, 1)[1] for p in pairs], object)
        out_by, out_v, out_c, out_e = [], [], [], []
        for gv in np.unique(gs):
            m = gs == gv
            _mg_rows(gv, vs[m], cnts[m], 0, out_by, out_v, out_c, out_e)
        return _emit(out_by, out_v, out_c, out_e)

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        gs = np.asarray(batch[by].to_pylist(), object)
        vs = np.asarray(batch["value"].to_pylist(), object)
        cnts = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        errs = batch["err"].to_numpy(zero_copy_only=False).astype(np.int64)
        out_by, out_v, out_c, out_e = [], [], [], []
        for gv in np.unique(gs):
            m = gs == gv
            uniq, inv = np.unique(vs[m], return_inverse=True)
            summed = np.zeros(uniq.size, np.int64)
            np.add.at(summed, inv, cnts[m])
            _mg_rows(gv, uniq.astype(object), summed, int(errs[m].sum()),
                     out_by, out_v, out_c, out_e)
        return _emit(out_by, out_v, out_c, out_e)

    sketch = (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(fan_in)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    empty_frame = pd.DataFrame(
        {by: pd.Series([], dtype=object),
         "rank": pd.Series([], dtype=np.int64),
         "value": pd.Series([], dtype=object),
         "count": pd.Series([], dtype=np.int64)}
    )
    empty_cert = pd.DataFrame(
        {by: pd.Series([], dtype=object),
         "err_bound": pd.Series([], dtype=np.int64),
         "proven": pd.Series([], dtype=bool)}
    )
    if sketch.empty:
        return empty_frame, empty_cert
    err_by = sketch.groupby(by)["err"].sum().astype(int).to_dict()
    # NOTE: pandas Series + str concat silently drops NUL characters, so
    # the pair keys are built with plain Python concatenation
    cand_keys = np.asarray(
        sorted(g + _HH_SEP + v for g, v in zip(sketch[by], sketch["value"])),
        object,
    )

    import ray

    cand_ref = ray.put(cand_keys)

    def recount(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        g = batch[by]
        v = batch[col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        keys = pa.compute.binary_join_element_wise(
            g.cast(pa.string()), v.cast(pa.string()), _HH_SEP
        )
        arr = np.asarray(keys.to_pylist(), object)
        pos = np.searchsorted(cand, arr)
        pos = np.minimum(pos, cand.size - 1)
        hit = cand[pos] == arr
        cnts = np.bincount(pos[hit], minlength=cand.size)
        nz = np.flatnonzero(cnts)
        return pa.table(
            {
                "key": pa.array(cand[nz].tolist(), pa.string()),
                "count": pa.array(cnts[nz], pa.int64()),
            }
        )

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("key")
        .sum("count")
        .to_pandas()
        .rename(columns={"sum(count)": "count"})
    )
    split = exact["key"].str.split(_HH_SEP, n=1, expand=True)
    exact[by], exact["value"] = split[0], split[1]
    exact = exact.sort_values(
        [by, "count", "value"], ascending=[True, False, True], kind="mergesort"
    )
    frames, certs = [], []
    for gv, g in exact.groupby(by, sort=True):
        head = g.head(top_n)[[by, "value", "count"]].copy()
        head.insert(1, "rank", np.arange(1, len(head) + 1, dtype=np.int64))
        err = int(err_by.get(gv, 0))
        nth = int(head["count"].iloc[-1]) if len(head) else 0
        proven = err == 0 or (len(head) == top_n and nth > err)
        frames.append(head)
        certs.append({by: gv, "err_bound": err, "proven": bool(proven)})
    frame = pd.concat(frames, ignore_index=True) if frames else empty_frame
    cert = pd.DataFrame(certs) if certs else empty_cert
    return frame, cert


def kmv_distinct(
    ds: Dataset,
    col: str,
    k: int = 1024,
    *,
    by: str | None = None,
    fan_in: int = 32,
) -> pd.DataFrame:
    """KMV distinct-count sketch over a string column, optionally grouped.

    Returns ``(by?, k_used, kth_min, est_distinct)`` — all integers, so the
    result is bit-exact reproducible and SQL-mirrorable. Each batch emits at
    most k hashes per group (hash unique values once via dictionary
    encoding); partials then coalesce into ``fan_in`` blocks that min-merge
    in parallel (min-merge is associative), so the driver reads at most
    ``fan_in·k`` rows per group no matter how many input blocks there were
    — at 1e6-block scale the reduce is a tree, not a driver concat."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col]
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        enc = vals.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_pylist()
        uh = np.array([hash_value63(v) for v in uniq], np.int64)
        if by:
            grp = batch[by]
            if isinstance(grp, pa.ChunkedArray):
                grp = grp.combine_chunks()
            genc = grp.dictionary_encode()
            gcodes = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            gvals = genc.dictionary.to_pylist()
            pair = np.unique(gcodes * np.int64(len(uniq)) + codes)
            g_out, h_out = [], []
            pg = pair // len(uniq)
            ph = uh[pair % len(uniq)]
            for gi in np.unique(pg):
                sel = np.sort(ph[pg == gi])[:k]
                g_out.extend([gvals[int(gi)]] * sel.size)
                h_out.append(sel)
            return pa.table(
                {
                    by: pa.array(g_out, pa.string()),
                    "hv": pa.array(
                        np.concatenate(h_out) if h_out else np.empty(0, np.int64)
                    ),
                }
            )
        sel = np.sort(np.unique(uh))[:k]
        return pa.table({"hv": pa.array(sel)})

    pdf = (
        ds.map_batches(partial, batch_format="pyarrow")
        # shuffle-less coalesce to fan_in blocks, each min-merged in place:
        # bounds the driver's final merge input to fan_in·k rows per group
        .repartition(fan_in)
        .map_batches(
            lambda t: _kmv_min_merge(t, k, by),
            batch_format="pyarrow",
            batch_size=None,
        )
        .to_pandas()
    )
    rows = []
    groups = pdf.groupby(by) if by else [(None, pdf)]
    for gkey, g in groups:
        hv = np.unique(g["hv"].to_numpy())[:k]
        k_used = int(hv.size)
        kth = int(hv[-1]) if k_used else 0
        row = {
            "k_used": k_used,
            "kth_min": kth,
            "est_distinct": kmv_estimate(k_used, k, kth),
        }
        if by:
            row[by] = gkey
        rows.append(row)
    out = pd.DataFrame(rows)
    cols = ([by] if by else []) + ["k_used", "kth_min", "est_distinct"]
    if by:
        out = out.sort_values(by)
    return out.reset_index(drop=True)[cols]


def percentile_ranks(
    ds: Dataset,
    col: str,
    values: list[int],
    *,
    by: str | None = None,
) -> pd.DataFrame:
    """percentile_ranks aggregation (Elasticsearch, inverted percentiles):
    for each provided threshold, the percentage of rows with
    ``col <= threshold``, optionally per group. Returns
    ``(by?, value, n_le, n_total, pct_mille)`` — ``pct_mille`` is the rank
    in integer permille (floor(1000·n_le/n + 0.5)) so every column stays
    integer/string (hash-stable).

    One combiner pass: each batch emits per-(group, threshold) counts —
    groups × thresholds partial rows — merged by a tiny groupby. Exact (no
    TDigest approximation needed: thresholds are given, so ranks are plain
    counts)."""
    from ray.data.aggregate import Sum

    vals = sorted(int(v) for v in values)
    varr = np.asarray(vals, np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        x = batch[col].to_numpy(zero_copy_only=False).astype(np.int64)
        out: dict[str, list] = {"value": [], "n_le": [], "n_total": []}
        if by:
            out[by] = []
            keys = batch[by].to_pylist()
            order = np.argsort(np.asarray(keys, object), kind="stable")
            xs = x[order]
            ks = [keys[i] for i in order]
            starts = [0] + [
                i for i in range(1, len(ks)) if ks[i] != ks[i - 1]
            ] + [len(ks)]
            for s, e in zip(starts[:-1], starts[1:]):
                seg = np.sort(xs[s:e])
                n_le = np.searchsorted(seg, varr, side="right")
                out[by].extend([ks[s]] * varr.size)
                out["value"].extend(vals)
                out["n_le"].extend(n_le.tolist())
                out["n_total"].extend([e - s] * varr.size)
        else:
            seg = np.sort(x)
            n_le = np.searchsorted(seg, varr, side="right")
            out["value"].extend(vals)
            out["n_le"].extend(n_le.tolist())
            out["n_total"].extend([x.size] * varr.size)
        cols = {}
        if by:
            cols[by] = pa.array(out[by], pa.string())
        cols["value"] = pa.array(np.asarray(out["value"], np.int64))
        cols["n_le"] = pa.array(np.asarray(out["n_le"], np.int64))
        cols["n_total"] = pa.array(np.asarray(out["n_total"], np.int64))
        return pa.table(cols)

    part = ds.map_batches(partial, batch_format="pyarrow")
    keys = ([by] if by else []) + ["value"]
    agg = part.groupby(keys).aggregate(
        Sum("n_le", alias_name="n_le"), Sum("n_total", alias_name="n_total")
    )
    pdf = agg.to_pandas()
    pdf["pct_mille"] = (
        np.floor(1000.0 * pdf["n_le"].to_numpy(np.float64)
                 / np.maximum(pdf["n_total"].to_numpy(np.float64), 1.0) + 0.5)
    ).astype(np.int64)
    for c in ("n_le", "n_total"):
        pdf[c] = pdf[c].astype(np.int64)
    return (
        pdf.sort_values(keys).reset_index(drop=True)[
            keys + ["n_le", "n_total", "pct_mille"]
        ]
    )
