"""Temporal operators over event streams: tumbling windows, session
windows, as-of joins.

The reference is strictly batch with no temporal concepts (SURVEY §2.9);
these are the streaming-shaped operators a large-scale training-data /
telemetry pipeline needs, built from Ray Data primitives:

- **Tumbling-window aggregate** — the partial-aggregation pattern: each
  ``map_batches`` task pre-aggregates its batch per (window, key) so the
  ``groupby`` shuffle moves O(windows × keys) combiner rows, not O(events).
- **Sessionization** — gap-based session windows. A per-user
  ``groupby(user).map_groups`` would pay one Python call per user (the
  round-3 coarse-key lesson, BASELINE.md stats audit); instead events
  shuffle on a SALTED COARSE user key (``user_id % n_groups``, ≤ a few ×
  cluster cores groups) and each group sessionizes ALL its users in one
  vectorized lexsort + gap-scan kernel. A user's events land in exactly one
  group, so results are exact; skew is bounded by the hash of user ids.
- **As-of join** — for each left event the most recent right event of the
  same key with ``right.ts <= left.ts`` (ties: larger right ts, then larger
  right event id — pinned so the SQL oracle can mirror it). Both sides
  shuffle on the same coarse key and each group resolves matches with one
  merged lexsort + cumulative-count pass (no per-user loop, no per-row
  search).

All value aggregates are integer cents (``floor(value·100 + 0.5)``) and all
times int64 epoch-µs, so every operator has a bit-exact DuckDB mirror.

Partitioning assumption (documented per the north rule): sessionize /
asof_join co-locate rows by ``user_id % n_groups``; at 100 TB the shuffle
is one all-to-all of the (pruned) event columns, and n_groups should be
sized ≥ cluster cores. A single user's events must fit one task's memory —
true for any real per-user event history.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

DEFAULT_GROUPS = 256


def _check_groups(n_groups: int) -> None:
    """Coarse keys use ``user & (n_groups-1)``: power of two, ids >= 0."""
    if n_groups < 1 or n_groups & (n_groups - 1):
        raise ValueError(f"n_groups must be a power of two, got {n_groups}")


def _shuffle_partitions(cap: int) -> int:
    """Groupby shuffle width: ~2× cluster cores, capped at the group-key
    cardinality. Ray's default (one partition per input block) spends
    seconds of pure scheduling on small inputs and under-partitions huge
    ones; tying width to the cluster does the right thing at both ends
    (measured: sessionize over 100k events 4.6 s -> 1.5 s at 32 cpus)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(1, min(cap, 2 * cpus))


def _cents(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.floor(v * 100 + 0.5).astype(np.int64)


def _ts_us(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return a.cast(pa.int64()).to_numpy(zero_copy_only=False)


def tumbling_window_agg(
    ds: Dataset,
    window_us: int,
    *,
    hop_us: int | None = None,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> Dataset:
    """Per (window, key): event count and sum/min/max of the value in
    integer cents. Pre-aggregated inside each batch (combiner), then a
    windows×keys-sized ``groupby`` merge — the shuffle never carries event
    rows.

    ``hop_us`` turns tumbling into HOPPING (sliding) windows: every
    ``hop_us`` a window of length ``window_us`` opens, so each event lands
    in ``window_us // hop_us`` windows (must divide evenly). The combiner
    replicates events into their windows batch-locally; the shuffle still
    carries only (window, key) partials."""
    hop = hop_us or window_us
    if window_us % hop:
        raise ValueError(f"hop_us {hop} must divide window_us {window_us}")
    n_win = window_us // hop

    def partial(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch[ts_col])
        base = (ts // hop) * hop
        cents = _cents(batch[value_col])
        if n_win == 1:
            win, keys_rep, cents_rep = base, batch[key_col], pa.array(cents)
        else:
            win = np.concatenate([base - j * hop for j in range(n_win)])
            keys = (
                batch[key_col].combine_chunks()
                if isinstance(batch[key_col], pa.ChunkedArray)
                else batch[key_col]
            )
            idx = pa.array(np.tile(np.arange(len(batch), dtype=np.int64), n_win))
            keys_rep = keys.take(idx)
            cents_rep = pa.array(np.tile(cents, n_win))
        t = pa.table(
            {
                "window_start_us": pa.array(win),
                key_col: keys_rep,
                "c": cents_rep,
            }
        )
        g = t.group_by(["window_start_us", key_col]).aggregate(
            [("c", "count"), ("c", "sum"), ("c", "min"), ("c", "max")]
        )
        return pa.table(
            {
                "window_start_us": g["window_start_us"],
                key_col: g[key_col],
                "n_events": g["c_count"].cast(pa.int64()),
                "sum_value_c": g["c_sum"].cast(pa.int64()),
                "min_value_c": g["c_min"].cast(pa.int64()),
                "max_value_c": g["c_max"].cast(pa.int64()),
            }
        )

    part = ds.map_batches(partial, batch_format="pyarrow")
    return part.groupby(
        ["window_start_us", key_col], num_partitions=_shuffle_partitions(1 << 20)
    ).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_c", alias_name="sum_value_c"),
        Min("min_value_c", alias_name="min_value_c"),
        Max("max_value_c", alias_name="max_value_c"),
    )


def _sessionize_group(
    batch: pa.Table, *, gap_us: int, user_col: str, id_col: str, has_value: bool
) -> pa.Table:
    """Vectorized multi-user sessionization of one coarse group."""
    users = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch["_ts_us"].to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, ts, users))
    u_s, t_s, i_s = users[order], ts[order], ids[order]
    n = u_s.size
    if n == 0:
        cols = {
            user_col: pa.array([], pa.int64()),
            "session_start_us": pa.array([], pa.int64()),
            "session_end_us": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
        }
        if has_value:
            cols["sum_value_c"] = pa.array([], pa.int64())
        return pa.table(cols)
    new_sess = np.concatenate(
        ([True], (u_s[1:] != u_s[:-1]) | (t_s[1:] - t_s[:-1] > gap_us))
    )
    starts = np.flatnonzero(new_sess)
    counts = np.diff(np.concatenate((starts, [n])))
    ends = starts + counts - 1
    cols = {
        user_col: pa.array(u_s[starts]),
        "session_start_us": pa.array(t_s[starts]),
        "session_end_us": pa.array(t_s[ends]),
        "n_events": pa.array(counts.astype(np.int64)),
    }
    if has_value:
        cents = _cents(batch["_value"])[order]
        cols["sum_value_c"] = pa.array(np.add.reduceat(cents, starts))
    return pa.table(cols)


def sessionize(
    ds: Dataset,
    gap_us: int,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str | None = "value",
    n_groups: int = DEFAULT_GROUPS,
) -> Dataset:
    """Gap-based session windows per user: one output row per session with
    (user, start, end, n_events[, sum_value_c]). A new session starts when
    the gap to the previous event of the same user EXCEEDS ``gap_us``
    (ordering ties broken by event id, pinned for the oracle)."""
    _check_groups(n_groups)

    def prep(batch: pa.Table) -> pa.Table:
        cols = {
            user_col: batch[user_col].cast(pa.int64()),
            id_col: batch[id_col].cast(pa.int64()),
            "_ts_us": pa.array(_ts_us(batch[ts_col])),
            "_cg": pc.cast(
                pc.bit_wise_and(batch[user_col].cast(pa.int64()), n_groups - 1),
                pa.int64(),
            ),
        }
        if value_col is not None:
            cols["_value"] = batch[value_col]
        return pa.table(cols)

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    return prepped.groupby(
        "_cg", num_partitions=_shuffle_partitions(n_groups)
    ).map_groups(
        _sessionize_group,
        batch_format="pyarrow",
        fn_kwargs={
            "gap_us": gap_us,
            "user_col": user_col,
            "id_col": id_col,
            "has_value": value_col is not None,
        },
    )


def _asof_group(
    batch: pa.Table, *, user_col: str, id_col: str
) -> pa.Table:
    """Merged-rank as-of resolution for one coarse group: counts, for every
    left row, the right rows of the same user at or before it in one
    lexsort + cumsum — no per-user loop."""
    side = batch["_side"].to_numpy(zero_copy_only=False)  # 0=right, 1=left
    users = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch["_ts_us"].to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    # primary (user, ts); rights before lefts at equal ts (inclusive <=);
    # ids last so right ties resolve to the LARGEST id being "most recent"
    order = np.lexsort((ids, side, ts, users))
    u_o, t_o, i_o, s_o = users[order], ts[order], ids[order], side[order]
    is_right = s_o == 0
    cum_right = np.cumsum(is_right)
    # right rows in their own sorted order (same relative order as in `order`)
    r_pos = np.flatnonzero(is_right)
    r_users, r_ts, r_ids = u_o[r_pos], t_o[r_pos], i_o[r_pos]
    l_pos = np.flatnonzero(~is_right)
    l_users, l_ts, l_ids = u_o[l_pos], t_o[l_pos], i_o[l_pos]
    if r_pos.size == 0:  # group holds no right rows: every left unmatched
        out_rid = np.full(l_pos.size, -1, np.int64)
        out_rts = np.full(l_pos.size, -1, np.int64)
        gap = np.full(l_pos.size, -1, np.int64)
    else:
        n_le = cum_right[l_pos]  # rights at-or-before each left (any user <= u)
        prefix = np.searchsorted(r_users, l_users, side="left")
        idx = n_le - prefix - 1  # within-user right index, -1 = none
        matched = idx >= 0
        sel = prefix + np.where(matched, idx, 0)
        sel = np.minimum(sel, r_pos.size - 1)  # unmatched rows: any valid index
        out_rid = np.where(matched, r_ids[sel], -1)
        out_rts = np.where(matched, r_ts[sel], -1)
        gap = np.where(matched, l_ts - r_ts[sel], -1)
    return pa.table(
        {
            "left_id": pa.array(l_ids),
            user_col: pa.array(l_users),
            "left_ts_us": pa.array(l_ts),
            "right_id": pa.array(out_rid),
            "right_ts_us": pa.array(out_rts),
            "gap_us": pa.array(gap),
        }
    )


def _funnel_group(
    batch: pa.Table, *, steps: list[str], within_us: int, user_col: str, id_col: str
) -> pa.Table:
    """Vectorized greedy funnel for one coarse group: all users advance
    through the step chain together — per step one searchsorted over that
    step's event indices, no per-user loop."""
    users = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch["_ts_us"].to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    types = batch["_type"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, ts, users))
    u_s, t_s, ty_s = users[order], ts[order], types[order]
    n = u_s.size
    if n == 0:
        return pa.table(
            {
                user_col: pa.array([], pa.int64()),
                "depth": pa.array([], pa.int64()),
                "t_first_us": pa.array([], pa.int64()),
                "t_last_us": pa.array([], pa.int64()),
            }
        )
    ustart = np.concatenate(([0], np.flatnonzero(u_s[1:] != u_s[:-1]) + 1))
    uend = np.concatenate((ustart[1:], [n]))
    uniq_users = u_s[ustart]
    nu = uniq_users.size
    depth = np.zeros(nu, np.int64)
    t_first = np.full(nu, -1, np.int64)
    t_last = np.full(nu, -1, np.int64)
    # cur = index (in sorted order) of the last matched step; advance past it
    cur = ustart - 1  # "before the user's first event"
    deadline = np.full(nu, np.iinfo(np.int64).max)
    alive = np.ones(nu, bool)
    for j, step in enumerate(steps):
        m = np.flatnonzero(ty_s == step)  # ascending global indices
        if m.size == 0:
            break
        # per-user slice of m, then first match strictly after cur
        lo = np.searchsorted(m, ustart)
        hi = np.searchsorted(m, uend)
        cand = np.maximum(np.searchsorted(m, cur, side="right"), lo)
        ok = alive & (cand < hi)
        sel = m[np.minimum(cand, m.size - 1)]
        ok &= t_s[sel] <= deadline
        alive = ok
        if not ok.any():
            break
        cur = np.where(ok, sel, cur)
        depth[ok] = j + 1
        t_last[ok] = t_s[sel][ok]
        if j == 0:
            t_first[ok] = t_s[sel][ok]
            deadline = np.where(ok, t_first + within_us, deadline)
    return pa.table(
        {
            user_col: pa.array(uniq_users),
            "depth": pa.array(depth),
            "t_first_us": pa.array(t_first),
            "t_last_us": pa.array(t_last),
        }
    )


def funnel(
    ds: Dataset,
    steps: list[str],
    within_us: int,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    n_groups: int = DEFAULT_GROUPS,
) -> Dataset:
    """Greedy funnel analysis: per user, how deep into the ordered step
    chain they get. Semantics pinned for the oracle: step 1 anchors at the
    user's FIRST step-1 event (by (ts, id)); each later step matches the
    first event strictly after the previous match (in (ts, id) order) of
    the right type with ``ts <= t_first + within_us``. Greedy-first, not
    maximal — the classic first-touch funnel. Output per user:
    (depth, t_first_us, t_last_us), -1 sentinels when depth is 0.

    One coarse-key shuffle of the pruned event columns; each group runs the
    whole chain vectorized (one searchsorted per step over that step's
    event indices — no per-user loop)."""
    _check_groups(n_groups)
    if not steps:
        raise ValueError("steps must be non-empty")

    def prep(batch: pa.Table) -> pa.Table:
        u = batch[user_col].cast(pa.int64())
        return pa.table(
            {
                user_col: u,
                id_col: batch[id_col].cast(pa.int64()),
                "_ts_us": pa.array(_ts_us(batch[ts_col])),
                "_type": batch[type_col],
                "_cg": pc.cast(pc.bit_wise_and(u, n_groups - 1), pa.int64()),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_cg", num_partitions=_shuffle_partitions(n_groups))
        .map_groups(
            _funnel_group,
            batch_format="pyarrow",
            fn_kwargs={
                "steps": steps, "within_us": within_us,
                "user_col": user_col, "id_col": id_col,
            },
        )
    )


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    n_groups: int = DEFAULT_GROUPS,
) -> Dataset:
    """As-of join: each left row matched to the most recent right row of the
    same user with ``right.ts <= left.ts`` (ties: larger right ts wins, then
    larger right id). Unmatched lefts keep -1 sentinels. Both sides shuffle
    once on the coarse user key; each group resolves every match in one
    vectorized pass."""
    _check_groups(n_groups)

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            u = batch[user_col].cast(pa.int64())
            return pa.table(
                {
                    user_col: u,
                    id_col: batch[id_col].cast(pa.int64()),
                    "_ts_us": pa.array(_ts_us(batch[ts_col])),
                    "_side": pa.array(np.full(len(batch), side, np.int64)),
                    "_cg": pc.cast(pc.bit_wise_and(u, n_groups - 1), pa.int64()),
                }
            )

        return fn

    tagged = right.map_batches(prep(0), batch_format="pyarrow").union(
        left.map_batches(prep(1), batch_format="pyarrow")
    )
    return tagged.groupby(
        "_cg", num_partitions=_shuffle_partitions(n_groups)
    ).map_groups(
        _asof_group,
        batch_format="pyarrow",
        fn_kwargs={"user_col": user_col, "id_col": id_col},
    )


def bucket_pipeline(
    buckets,
    *,
    key_col: str = "event_type",
    sort_col: str = "window_start_us",
    metric_col: str = "sum_value_c",
    count_col: str = "n_events",
    window: int = 3,
    serial_lag: int = 1,
    fill_empty_us: int | None = None,
):
    """Elasticsearch pipeline aggregations over a parent date-histogram
    result (the ``tumbling_window_agg`` bucket table): per key, ordered by
    window start,

    - ``cum_sum``   — cumulative_sum of the metric (exact integer);
    - ``deriv``     — derivative (metric minus previous bucket; the first
      bucket of each key has no derivative, like ES);
    - ``mov_avg``   — moving_fn unweighted average over the trailing
      ``window`` buckets INCLUDING the current one (partial windows
      computed, ES MovingFunctions.unweightedAvg shape);
    - ``per_event`` — bucket_script ``metric / count`` (null when the
      bucket is empty);
    - ``serial_diff`` — serial_diff with ``serial_lag`` (metric minus the
      bucket ``serial_lag`` steps back; null for the first ``serial_lag``
      buckets of each key — lag 1 equals the derivative).

    ``fill_empty_us`` densifies each key's series on that stride between
    its min and max window (date_histogram min_doc_count=0): inserted
    buckets have metric/count 0 and participate in the pipeline math.

    Scale shape: pipeline aggs are a reduce-phase computation in ES (the
    coordinating node walks the final bucket list); the bucket table is
    windows x keys — bounded by time range, not event count — so the
    driver-side vectorized pass is the faithful analog. The parent
    aggregation is the distributed part (batch-local combiners + a
    partial-sized shuffle, ``tumbling_window_agg``)."""
    import pandas as pd

    pdf = buckets.to_pandas() if hasattr(buckets, "to_pandas") else buckets.copy()
    pdf = pdf.sort_values([key_col, sort_col], kind="mergesort").reset_index(drop=True)
    if fill_empty_us:
        filled = []
        for key, g in pdf.groupby(key_col, sort=False):
            lo, hi = int(g[sort_col].min()), int(g[sort_col].max())
            full = pd.DataFrame(
                {sort_col: np.arange(lo, hi + 1, fill_empty_us, dtype=np.int64)}
            )
            m = full.merge(g, how="left", on=sort_col)
            m[key_col] = key
            m[metric_col] = m[metric_col].fillna(0).astype(np.int64)
            m[count_col] = m[count_col].fillna(0).astype(np.int64)
            filled.append(m)
        pdf = pd.concat(filled, ignore_index=True)
    g = pdf.groupby(key_col, sort=False)[metric_col]
    pdf["cum_sum"] = g.cumsum().astype(np.int64)
    pdf["deriv"] = g.diff()
    pdf["serial_diff"] = g.diff(periods=serial_lag)
    pdf["mov_avg"] = (
        g.rolling(window, min_periods=1).mean().reset_index(level=0, drop=True)
    )
    with np.errstate(invalid="ignore"):
        pdf["per_event"] = np.where(
            pdf[count_col].to_numpy() > 0,
            pdf[metric_col].to_numpy(np.float64)
            / np.maximum(pdf[count_col].to_numpy(np.float64), 1.0),
            np.nan,
        )
    return pdf.reset_index(drop=True)


# The ES auto_date_histogram rounding ladder (seconds -> years), in
# microseconds. The chosen interval is the SMALLEST step whose bucket
# count fits the target; if even the largest step overflows the target,
# the largest is used anyway (the ES contract caps the ladder too).
AUTO_HIST_LADDER_US: tuple[int, ...] = tuple(
    s * 1_000_000
    for s in (
        1, 5, 10, 30,                      # seconds
        60, 300, 600, 1800,                # minutes
        3600, 3 * 3600, 12 * 3600,         # hours
        86400, 7 * 86400, 30 * 86400,      # day / week / month
        90 * 86400, 365 * 86400,           # quarter / year
    )
)


def auto_histogram_interval(
    mn_us: int, mx_us: int, target_buckets: int,
    ladder: tuple[int, ...] = AUTO_HIST_LADDER_US,
) -> int:
    """Smallest ladder step whose floor-aligned bucket count over
    [mn, mx] fits ``target_buckets`` (integer arithmetic — the SQL mirror
    computes the identical expression)."""
    for step in ladder:
        if mx_us // step - mn_us // step + 1 <= target_buckets:
            return step
    return ladder[-1]


def auto_date_histogram(
    ds: Dataset,
    *,
    target_buckets: int = 50,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    ladder: tuple[int, ...] = AUTO_HIST_LADDER_US,
) -> tuple[Dataset, int]:
    """ES ``auto_date_histogram``: pick the interval from the rounding
    ladder so the histogram has at most ``target_buckets`` buckets, then
    aggregate — returns ``(windowed aggregate Dataset, interval_us)``.

    Two passes, both aggregate-shaped: a min/max timestamp reduce (one
    16-byte row per batch) fixes the interval, then the standard tumbling
    combiner whose shuffle carries only (window, key) partials."""
    if target_buckets < 1:
        raise ValueError("target_buckets must be >= 1")

    def mm(batch: pa.Table) -> pa.Table:
        ts = _ts_us(batch[ts_col])
        return pa.table(
            {"mn": pa.array([int(ts.min())], pa.int64()),
             "mx": pa.array([int(ts.max())], pa.int64())}
        )

    pdf = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    if pdf.empty:
        raise ValueError("auto_date_histogram over an empty dataset")
    step = auto_histogram_interval(
        int(pdf["mn"].min()), int(pdf["mx"].max()), target_buckets, ladder
    )
    out = tumbling_window_agg(
        ds, step, ts_col=ts_col, key_col=key_col, value_col=value_col
    )
    return out, step
