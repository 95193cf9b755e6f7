"""GROUP BY ROLLUP aggregate: scalar parity + partitioning invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.rollup import INT_ALL, STR_ALL, rollup_agg


def _brute(pdf: pd.DataFrame, keys):
    cents = np.floor(pdf["value"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64)
    g = pdf.copy()
    g["_c"] = cents
    out = []
    for lvl in range(len(keys), -1, -1):
        h = g.copy()
        for k in keys[lvl:]:
            h[k] = STR_ALL if g[k].dtype == object else INT_ALL
        agg = (
            h.groupby(keys)["_c"]
            .agg(n="count", sum_cents="sum", min_cents="min", max_cents="max")
            .reset_index()
        )
        agg.insert(0, "level", lvl)
        out.append(agg)
    res = pd.concat(out, ignore_index=True)
    return res.sort_values(["level", *keys]).reset_index(drop=True).astype(
        {"level": np.int64, "n": np.int64, "sum_cents": np.int64,
         "min_cents": np.int64, "max_cents": np.int64}
    )


def test_rollup_matches_bruteforce(ray_session):
    rng = np.random.default_rng(8)
    n = 400
    pdf = pd.DataFrame(
        {
            "event_type": rng.choice(["click", "view", "buy"], n),
            "cohort": rng.integers(0, 4, n).astype(np.int64),
            "value": rng.uniform(-5, 50, n).round(3),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))
    for parts in (1, 7):
        got = (
            rollup_agg(ds.repartition(parts), ["event_type", "cohort"])
            .to_pandas()
            .sort_values(["level", "event_type", "cohort"])
            .reset_index(drop=True)
        )
        want = _brute(pdf, ["event_type", "cohort"])
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # level arithmetic: grand total row aggregates everything
    total = got[got["level"] == 0]
    assert len(total) == 1
    assert total["n"].iloc[0] == n


def test_rollup_levels_are_consistent(ray_session):
    pdf = pd.DataFrame(
        {"k": ["a", "a", "b"], "value": [1.0, 2.0, 3.0]}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))
    got = rollup_agg(ds, ["k"]).to_pandas()
    lvl1 = got[got["level"] == 1]
    lvl0 = got[got["level"] == 0]
    assert lvl1["sum_cents"].sum() == lvl0["sum_cents"].iloc[0] == 600
    assert lvl0["k"].iloc[0] == STR_ALL
