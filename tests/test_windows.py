"""Temporal operators (ops/windows): tumbling windows, sessions, as-of."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.windows import asof_join, sessionize, tumbling_window_agg

US = 1_000_000
HOUR = 3600 * US


def _events_table(rows):
    """rows = [(event_id, ts_us, user_id, event_type, value)]"""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


def test_tumbling_window_agg(ray_session):
    rows = [
        (0, 10 * US, 1, "click", 1.10),
        (1, HOUR - 1, 1, "click", 2.00),     # same window as 0
        (2, HOUR, 2, "click", 3.33),         # boundary -> next window
        (3, HOUR + 5, 2, "view", 0.07),
        (4, 3 * HOUR, 3, "click", -1.50),    # negative value
    ]
    out = (
        tumbling_window_agg(rd.from_arrow(_events_table(rows)), HOUR)
        .to_pandas()
        .sort_values(["window_start_us", "event_type"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [
            (0, "click", 2, 310, 110, 200),
            (HOUR, "click", 1, 333, 333, 333),
            (HOUR, "view", 1, 7, 7, 7),
            (3 * HOUR, "click", 1, -150, -150, -150),
        ],
        columns=[
            "window_start_us", "event_type", "n_events",
            "sum_value_c", "min_value_c", "max_value_c",
        ],
    )
    pd.testing.assert_frame_equal(out[want.columns].astype(want.dtypes.to_dict()), want)


def scalar_sessions(rows, gap_us):
    by_user = {}
    for eid, ts, u, _, v in rows:
        by_user.setdefault(u, []).append((ts, eid, v))
    out = []
    for u, evs in by_user.items():
        evs.sort()
        cur = None
        for ts, eid, v in evs:
            c = int(np.floor(v * 100 + 0.5))
            if cur is None or ts - cur[1] > gap_us:
                if cur:
                    out.append((u, *cur))
                cur = [ts, ts, 1, c]
            else:
                cur[1] = ts
                cur[2] += 1
                cur[3] += c
        if cur:
            out.append((u, *cur))
    return (
        pd.DataFrame(
            out,
            columns=["user_id", "session_start_us", "session_end_us", "n_events", "sum_value_c"],
        )
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )


def test_sessionize_matches_scalar(ray_session):
    gap = 60 * US
    rows = [
        (0, 0, 1, "e", 1.0),
        (1, 30 * US, 1, "e", 1.0),
        (2, 90 * US, 1, "e", 1.0),            # exactly gap after #1 -> SAME session
        (3, 90 * US + 60 * US + 1, 1, "e", 1.0),  # gap+1 -> new session
        (4, 0, 2, "e", 2.5),                  # other user, own session
        (5, 10 * US, 3, "e", 0.0),            # single-event session
    ]
    out = (
        sessionize(rd.from_arrow(_events_table(rows)), gap, n_groups=4)
        .to_pandas()
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )
    want = scalar_sessions(rows, gap)
    pd.testing.assert_frame_equal(out[want.columns].astype(want.dtypes.to_dict()), want)
    # boundary semantics: events 0,1,2 are one session (gap == gap_us keeps)
    u1 = want[want.user_id == 1]
    assert u1.n_events.tolist() == [3, 1]


def test_sessionize_randomized_scalar_parity(ray_session):
    rng = np.random.default_rng(5)
    n = 600
    rows = [
        (
            i,
            int(rng.integers(0, 50_000) * US),
            int(rng.integers(0, 12)),
            "e",
            float(np.round(rng.normal(10, 5), 2)),
        )
        for i in range(n)
    ]
    gap = 500 * US
    out = (
        sessionize(rd.from_arrow(_events_table(rows)), gap, n_groups=8)
        .to_pandas()
        .sort_values(["user_id", "session_start_us"])
        .reset_index(drop=True)
    )
    want = scalar_sessions(rows, gap)
    pd.testing.assert_frame_equal(out[want.columns].astype(want.dtypes.to_dict()), want)


def test_sessionize_rejects_bad_groups(ray_session):
    with pytest.raises(ValueError, match="power of two"):
        sessionize(rd.from_arrow(_events_table([])), 1, n_groups=6)


def scalar_asof(left_rows, right_rows):
    out = []
    for eid, ts, u, _, _ in left_rows:
        cands = [
            (rts, rid)
            for rid, rts, ru, _, _ in right_rows
            if ru == u and rts <= ts
        ]
        if cands:
            rts, rid = max(cands)
            out.append((eid, u, ts, rid, rts, ts - rts))
        else:
            out.append((eid, u, ts, -1, -1, -1))
    return (
        pd.DataFrame(
            out,
            columns=["left_id", "user_id", "left_ts_us", "right_id", "right_ts_us", "gap_us"],
        )
        .sort_values("left_id")
        .reset_index(drop=True)
    )


def test_asof_join_matches_scalar(ray_session):
    right = [
        (100, 10 * US, 1, "s", 0.0),
        (101, 50 * US, 1, "s", 0.0),
        (102, 50 * US, 1, "s", 0.0),   # tie ts with 101 -> larger id wins
        (103, 5 * US, 2, "s", 0.0),
    ]
    left = [
        (0, 5 * US, 1, "p", 0.0),      # before any signup of user 1 -> -1
        (1, 10 * US, 1, "p", 0.0),     # equal ts -> inclusive match 100
        (2, 60 * US, 1, "p", 0.0),     # tie: id 102 over 101
        (3, 7 * US, 2, "p", 0.0),
        (4, 1 * US, 3, "p", 0.0),      # user with no signups
    ]
    out = (
        asof_join(
            rd.from_arrow(_events_table(left)),
            rd.from_arrow(_events_table(right)),
            n_groups=4,
        )
        .to_pandas()
        .sort_values("left_id")
        .reset_index(drop=True)
    )
    want = scalar_asof(left, right)
    pd.testing.assert_frame_equal(out[want.columns].astype(want.dtypes.to_dict()), want)
    assert out.set_index("left_id").right_id.to_dict() == {
        0: -1, 1: 100, 2: 102, 3: 103, 4: -1
    }


def test_asof_join_randomized_scalar_parity(ray_session):
    rng = np.random.default_rng(9)
    left = [
        (i, int(rng.integers(0, 10_000) * US), int(rng.integers(0, 10)), "p", 0.0)
        for i in range(300)
    ]
    right = [
        (1000 + i, int(rng.integers(0, 10_000) * US), int(rng.integers(0, 10)), "s", 0.0)
        for i in range(200)
    ]
    out = (
        asof_join(
            rd.from_arrow(_events_table(left)),
            rd.from_arrow(_events_table(right)),
            n_groups=8,
        )
        .to_pandas()
        .sort_values("left_id")
        .reset_index(drop=True)
    )
    want = scalar_asof(left, right)
    pd.testing.assert_frame_equal(out[want.columns].astype(want.dtypes.to_dict()), want)


def test_hopping_window_agg(ray_session):
    """1h window, 30m hop: each event lands in 2 windows; totals replicate."""
    rows = [
        (0, 10 * US, 1, "click", 1.00),        # windows starting 0 and -30m
        (1, 45 * 60 * US, 1, "click", 2.00),   # windows 30m and 0
        (2, HOUR + 10, 2, "view", 4.00),       # windows 1h and 30m
    ]
    hop = 30 * 60 * US
    out = (
        tumbling_window_agg(rd.from_arrow(_events_table(rows)), HOUR, hop_us=hop)
        .to_pandas()
        .sort_values(["window_start_us", "event_type"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        [
            (-hop, "click", 1, 100, 100, 100),
            (0, "click", 2, 300, 100, 200),
            (hop, "click", 1, 200, 200, 200),
            (hop, "view", 1, 400, 400, 400),
            (HOUR, "view", 1, 400, 400, 400),
        ],
        columns=[
            "window_start_us", "event_type", "n_events",
            "sum_value_c", "min_value_c", "max_value_c",
        ],
    )
    pd.testing.assert_frame_equal(out[want.columns].astype(want.dtypes.to_dict()), want)
    # every event appears in exactly window/hop = 2 windows
    assert out.n_events.sum() == 2 * len(rows)


def test_hopping_rejects_nondivisible(ray_session):
    with pytest.raises(ValueError, match="divide"):
        tumbling_window_agg(rd.from_arrow(_events_table([])), HOUR, hop_us=7)


def scalar_funnel(rows, steps, within_us):
    """Greedy first-touch funnel by direct iteration."""
    by_user = {}
    for eid, ts, u, ty, _ in rows:
        by_user.setdefault(u, []).append((ts, eid, ty))
    out = []
    for u, evs in by_user.items():
        evs.sort()
        depth, t_first, t_last = 0, -1, -1
        pos = -1  # index of last matched event in evs
        deadline = None
        for step in steps:
            nxt = next(
                (
                    i
                    for i in range(pos + 1, len(evs))
                    if evs[i][2] == step
                    and (deadline is None or evs[i][0] <= deadline)
                ),
                None,
            )
            if nxt is None:
                break
            pos = nxt
            depth += 1
            t_last = evs[nxt][0]
            if depth == 1:
                t_first = evs[nxt][0]
                deadline = t_first + within_us
        out.append((u, depth, t_first, t_last))
    return (
        pd.DataFrame(out, columns=["user_id", "depth", "t_first_us", "t_last_us"])
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def test_funnel_matches_scalar(ray_session):
    from splade_ray.ops.windows import funnel

    steps = ["signup", "click", "purchase"]
    W = 100 * US
    rows = [
        # user 1: full conversion inside window
        (0, 0, 1, "signup", 0.0),
        (1, 10 * US, 1, "click", 0.0),
        (2, 50 * US, 1, "purchase", 0.0),
        # user 2: purchase BEFORE click -> depth 2 only
        (3, 0, 2, "signup", 0.0),
        (4, 5 * US, 2, "purchase", 0.0),
        (5, 10 * US, 2, "click", 0.0),
        (6, 200 * US, 2, "purchase", 0.0),  # outside window
        # user 3: no signup -> depth 0
        (7, 0, 3, "click", 0.0),
        # user 4: second signup would convert, greedy anchors on first
        (8, 0, 4, "signup", 0.0),
        (9, 500 * US, 4, "signup", 0.0),
        (10, 510 * US, 4, "click", 0.0),
        (11, 520 * US, 4, "purchase", 0.0),
        # user 5: click at exactly the deadline (inclusive)
        (12, 0, 5, "signup", 0.0),
        (13, 100 * US, 5, "click", 0.0),
    ]
    got = (
        funnel(rd.from_arrow(_events_table(rows)), steps, W, n_groups=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = scalar_funnel(rows, steps, W)
    pd.testing.assert_frame_equal(got[want.columns].astype(want.dtypes.to_dict()), want)
    by = want.set_index("user_id")
    assert by.loc[1].depth == 3
    assert by.loc[2].depth == 2          # greedy: early purchase not reused
    assert by.loc[3].depth == 0 and by.loc[3].t_first_us == -1
    assert by.loc[4].depth == 1          # anchored on FIRST signup, window passed
    assert by.loc[5].depth == 2          # deadline inclusive


def test_funnel_randomized_scalar_parity(ray_session):
    from splade_ray.ops.windows import funnel

    rng = np.random.default_rng(13)
    types = ["signup", "click", "purchase", "view"]
    rows = [
        (
            i,
            int(rng.integers(0, 5_000) * US),
            int(rng.integers(0, 15)),
            types[int(rng.integers(0, 4))],
            0.0,
        )
        for i in range(800)
    ]
    steps = ["signup", "click", "purchase"]
    W = 800 * US
    got = (
        funnel(rd.from_arrow(_events_table(rows)), steps, W, n_groups=8)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = scalar_funnel(rows, steps, W)
    pd.testing.assert_frame_equal(got[want.columns].astype(want.dtypes.to_dict()), want)


def test_bucket_pipeline_matches_scalar(ray_session):
    """Pipeline aggs over a hand-built bucket frame: cumulative sum,
    derivative (first bucket null), trailing moving average with partial
    windows, per-event ratio."""
    from splade_ray.ops.windows import bucket_pipeline

    buckets = pd.DataFrame(
        {
            "window_start_us": [0, 10, 20, 40, 0, 10],
            "event_type": ["a", "a", "a", "a", "b", "b"],
            "n_events": [2, 1, 4, 1, 1, 2],
            "sum_value_c": [10, 30, 20, 40, 7, 9],
        }
    )
    out = bucket_pipeline(
        buckets, window=2, metric_col="sum_value_c", count_col="n_events"
    )
    a = out[out.event_type == "a"]
    assert a["cum_sum"].tolist() == [10, 40, 60, 100]
    assert np.isnan(a["deriv"].iloc[0]) and a["deriv"].tolist()[1:] == [20, -10, 20]
    np.testing.assert_allclose(a["mov_avg"].to_numpy(), [10, 20, 25, 30])
    np.testing.assert_allclose(a["per_event"].to_numpy(), [5, 30, 5, 40])
    b = out[out.event_type == "b"]
    assert b["cum_sum"].tolist() == [7, 16]
    assert np.isnan(b["deriv"].iloc[0])


def test_bucket_pipeline_fill_empty(ray_session):
    """fill_empty densifies each key's stride (date_histogram
    min_doc_count=0): inserted buckets are zeros and shift the pipeline."""
    from splade_ray.ops.windows import bucket_pipeline

    buckets = pd.DataFrame(
        {
            "window_start_us": [0, 30],
            "event_type": ["a", "a"],
            "n_events": [1, 1],
            "sum_value_c": [10, 40],
        }
    )
    out = bucket_pipeline(buckets, window=2, fill_empty_us=10)
    assert out["window_start_us"].tolist() == [0, 10, 20, 30]
    assert out["sum_value_c"].tolist() == [10, 0, 0, 40]
    assert out["cum_sum"].tolist() == [10, 10, 10, 50]
    assert out["deriv"].tolist()[1:] == [-10, 0, 40]
    np.testing.assert_allclose(out["mov_avg"].to_numpy(), [10, 5, 0, 20])
    assert np.isnan(out["per_event"].iloc[1])  # empty bucket -> null script


def test_matrix_stats_and_moments_match_numpy(ray_session):
    """Moment sketch == direct numpy over the concatenated data, across
    multi-block datasets (partial merge correctness)."""
    from splade_ray.ops.moments import field_moments, matrix_stats

    rng = np.random.RandomState(7)
    x = rng.randint(0, 500, 1000).astype(np.int64)
    y = (x // 3 + rng.randint(0, 50, 1000)).astype(np.int64)
    ds = rd.from_arrow(pa.table({"x": x, "y": y})).repartition(7)

    ms = matrix_stats(ds, ["x", "y"])
    xy = ms.set_index(["field_a", "field_b"])
    np.testing.assert_allclose(
        xy.loc[("x", "x"), "cov"], np.var(x, ddof=1), rtol=1e-10
    )
    np.testing.assert_allclose(
        xy.loc[("x", "y"), "cov"], np.cov(x, y, ddof=1)[0, 1], rtol=1e-10
    )
    np.testing.assert_allclose(
        xy.loc[("x", "y"), "corr"], np.corrcoef(x, y)[0, 1], rtol=1e-10
    )
    assert np.isclose(xy.loc[("y", "y"), "corr"], 1.0)

    fm = field_moments(ds, ["x"]).iloc[0]
    xf = x.astype(np.float64)
    m = xf.mean()
    m2 = ((xf - m) ** 2).mean()
    m3 = ((xf - m) ** 3).mean()
    m4 = ((xf - m) ** 4).mean()
    np.testing.assert_allclose(fm["mean"], m, rtol=1e-12)
    np.testing.assert_allclose(fm["variance"], np.var(x, ddof=1), rtol=1e-9)
    np.testing.assert_allclose(fm["skewness"], m3 / m2**1.5, rtol=1e-7)
    np.testing.assert_allclose(fm["kurtosis"], m4 / m2**2, rtol=1e-7)


def test_auto_date_histogram_picks_ladder_interval(ray_session):
    import ray.data as rd

    from splade_ray.ops.windows import (
        AUTO_HIST_LADDER_US,
        auto_date_histogram,
        auto_histogram_interval,
        tumbling_window_agg,
    )

    # 1000 events over ~3 hours -> 1h step fits 10 buckets, 30m doesn't
    base = 1_700_000_000_000_000
    n = 1000
    ts = base + (np.arange(n) * 11_000_000)  # 11s apart ~ 3.05h span
    t = pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": pa.array([f"e{i % 3}" for i in range(n)]),
            "value": pa.array(np.linspace(0, 10, n)),
        }
    )
    ds = rd.from_arrow(t).repartition(4)
    out, step = auto_date_histogram(ds, target_buckets=6)
    want_step = auto_histogram_interval(int(ts[0]), int(ts[-1]), 6)
    assert step == want_step == 3600 * 1_000_000
    got = out.to_pandas().sort_values(["window_start_us", "event_type"])
    want = (
        tumbling_window_agg(ds, step)
        .to_pandas().sort_values(["window_start_us", "event_type"])
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True)
    )
    assert got["window_start_us"].nunique() <= 6
    # ladder fallback: an impossible target returns the largest step
    assert (
        auto_histogram_interval(int(ts[0]), int(ts[0]) + 10**15, 1)
        == AUTO_HIST_LADDER_US[-1]
    )
