"""Grouped top-N (ops/topn) tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from splade_ray.ops.topn import grouped_topn


def scalar_topn(df, keys, order_col, tie_col, n, descending=True):
    out = []
    for _, g in df.groupby(keys):
        g = g.sort_values(
            [order_col, tie_col], ascending=[not descending, True], kind="mergesort"
        ).head(n)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g[keys + ["rank", tie_col, order_col]])
    return (
        pd.concat(out)
        .sort_values(keys + ["rank"])
        .reset_index(drop=True)
    )


def test_grouped_topn_matches_scalar(ray_session):
    rng = np.random.default_rng(2)
    n = 2000
    df = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], n),
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(0, 50, n).astype(np.int64),  # many ties
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(9)
    got = (
        grouped_topn(ds, "k", "v", n=7, tie_col="id")
        .to_pandas()
        .sort_values(["k", "rank"])
        .reset_index(drop=True)
    )
    want = scalar_topn(df, ["k"], "v", "id", 7)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_grouped_topn_multikey_ascending(ray_session):
    rng = np.random.default_rng(4)
    n = 800
    df = pd.DataFrame(
        {
            "k1": rng.choice(["x", "y"], n),
            "k2": rng.integers(0, 3, n).astype(np.int64),
            "id": np.arange(n, dtype=np.int64),
            "v": rng.integers(-100, 100, n).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    got = (
        grouped_topn(ds, ["k1", "k2"], "v", n=3, tie_col="id", descending=False)
        .to_pandas()
        .sort_values(["k1", "k2", "rank"])
        .reset_index(drop=True)
    )
    want = scalar_topn(df, ["k1", "k2"], "v", "id", 3, descending=False)
    pd.testing.assert_frame_equal(got[want.columns], want)


def test_grouped_topn_small_groups(ray_session):
    """Groups smaller than n come back whole; single-row dataset works."""
    df = pd.DataFrame({"k": ["a", "a", "b"], "id": [0, 1, 2], "v": [5, 9, 1]})
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    got = grouped_topn(ds, "k", "v", n=10, tie_col="id").to_pandas()
    assert len(got) == 3
    a = got[got.k == "a"].sort_values("rank")
    assert a.id.tolist() == [1, 0]  # 9 before 5
