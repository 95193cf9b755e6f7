"""Exact-quantile + KMV distinct-sketch tests."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd
from splade_ray.ops.sketch import (
    hash_value63,
    kmv_distinct,
    kmv_estimate,
    quantile_rank,
    value_quantiles,
)


def test_quantile_rank_matches_duckdb():
    rng = np.random.RandomState(3)
    vals = rng.randint(0, 50, size=237)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    want = duckdb.sql(
        "select quantile_disc(v, $qs) from (select unnest($v::BIGINT[]) v)",
        params={"qs": qs, "v": vals.tolist()},
    ).fetchone()[0]
    s = np.sort(vals)
    got = [int(s[quantile_rank(q, vals.size) - 1]) for q in qs]
    assert got == list(want)


def test_value_quantiles_grouped(ray_session):
    rng = np.random.RandomState(7)
    n = 5000
    langs = np.array(["en", "fr", "zh"])[rng.randint(0, 3, n)]
    vals = rng.randint(0, 400, n)
    ds = rd.from_arrow(
        pa.table({"lang": pa.array(langs.tolist()), "v": pa.array(vals, pa.int64())})
    ).repartition(13)
    qs = [0.1, 0.5, 0.9]
    got = value_quantiles(ds, "v", qs, by="lang")
    for lang in ["en", "fr", "zh"]:
        sub = np.sort(vals[langs == lang])
        for q in qs:
            want = int(sub[quantile_rank(q, sub.size) - 1])
            row = got[(got["lang"] == lang) & (got["q_mille"] == int(q * 1000))]
            assert int(row["value"].iloc[0]) == want, (lang, q)

    # partitioning invariance
    got2 = value_quantiles(
        rd.from_arrow(
            pa.table({"lang": pa.array(langs.tolist()), "v": pa.array(vals, pa.int64())})
        ).repartition(2),
        "v", qs, by="lang",
    )
    pd.testing.assert_frame_equal(got, got2)


def test_hash_value63_sql_mirror():
    vals = ["alpha", "beta", "注释", ""]
    got = [hash_value63(v) for v in vals]
    want = [
        duckdb.sql(
            "select (('0x' || substr(sha256($v), 1, 16))::UBIGINT >> 1)::BIGINT",
            params={"v": v},
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_kmv_exact_below_k(ray_session):
    ds = rd.from_arrow(
        pa.table({"t": pa.array([f"tok{i % 37}" for i in range(1000)])})
    ).repartition(5)
    out = kmv_distinct(ds, "t", k=64)
    assert out["k_used"].iloc[0] == 37 and out["est_distinct"].iloc[0] == 37


def test_kmv_estimate_accuracy_and_determinism(ray_session):
    n_true = 5000
    vals = [f"value-{i}" for i in range(n_true)]
    ds = rd.from_arrow(pa.table({"t": pa.array(vals * 2)})).repartition(17)
    out = kmv_distinct(ds, "t", k=256)
    est = int(out["est_distinct"].iloc[0])
    assert abs(est - n_true) / n_true < 0.15  # k=256 -> ~6% std
    # deterministic across partitionings
    out2 = kmv_distinct(
        rd.from_arrow(pa.table({"t": pa.array(vals * 2)})).repartition(3), "t", k=256
    )
    pd.testing.assert_frame_equal(out, out2)
    # estimate formula is pure integer math
    assert est == kmv_estimate(256, 256, int(out["kth_min"].iloc[0]))


def test_kmv_grouped(ray_session):
    rows_lang, rows_t = [], []
    for i in range(800):
        rows_lang.append("en" if i % 2 == 0 else "fr")
        rows_t.append(f"w{i % (100 if i % 2 == 0 else 23)}")
    ds = rd.from_arrow(
        pa.table({"lang": pa.array(rows_lang), "t": pa.array(rows_t)})
    ).repartition(7)
    out = kmv_distinct(ds, "t", k=512, by="lang")
    # even i -> even residues mod 100 only (50 distinct); odd i covers all 23
    assert dict(zip(out["lang"], out["est_distinct"])) == {"en": 50, "fr": 23}


def test_kmv_tree_reduce_invariant_to_fan_in(ray_session):
    """The intermediate min-merge stage (bounds driver input to fan_in*k
    rows per group) never changes the sketch: min-merge is associative."""
    vals = [f"v{i % 700}" for i in range(3000)]
    langs = ["en" if i % 3 else "de" for i in range(3000)]
    tbl = pa.table({"lang": pa.array(langs), "t": pa.array(vals)})
    base = kmv_distinct(rd.from_arrow(tbl).repartition(25), "t", k=128, by="lang")
    for fan_in in (1, 2, 40):
        got = kmv_distinct(
            rd.from_arrow(tbl).repartition(25), "t", k=128, by="lang", fan_in=fan_in
        )
        pd.testing.assert_frame_equal(got, base), fan_in


def test_heavy_hitters_proven_exact_on_skew(ray_session):
    """Zipf-skewed data, distinct >> k: the MG candidates + exact recount
    reproduce the exact top-n with a positive certificate."""
    from splade_ray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(11)
    # 10 heavy values (thousands of occurrences) + 5000 singleton-ish tails
    heavy = np.repeat([f"h{i:02d}" for i in range(10)],
                      [4000 - 300 * i for i in range(10)])
    tail = np.array([f"t{i:05d}" for i in rng.integers(0, 5000, 3000)])
    vals = np.concatenate([heavy, tail])
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals.tolist(), pa.string())}))
    ds = ds.repartition(8)

    got, err, proven = heavy_hitters(ds, "v", k=64, top_n=10)
    assert proven
    exact = pd.Series(vals).value_counts()
    want_vals = [f"h{i:02d}" for i in range(10)]
    assert got["value"].tolist() == want_vals
    assert got["count"].tolist() == [int(exact[v]) for v in want_vals]
    assert err > 0  # compression really happened (distinct 5000 >> k 64)


def test_heavy_hitters_exact_when_distinct_below_k(ray_session):
    vals = ["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"]
    from splade_ray.ops.sketch import heavy_hitters

    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())})).repartition(3)
    got, err, proven = heavy_hitters(ds, "v", k=16, top_n=3)
    assert err == 0 and proven
    assert got["value"].tolist() == ["a", "b", "c"]
    assert got["count"].tolist() == [5, 3, 2]


def test_heavy_hitters_unproven_on_uniform(ray_session):
    """Uniform data with distinct >> k cannot be certified — the op must
    say so rather than return a silently-wrong top-n."""
    from splade_ray.ops.sketch import heavy_hitters

    vals = [f"u{i:04d}" for i in range(2000)] * 2
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())})).repartition(8)
    got, err, proven = heavy_hitters(ds, "v", k=32, top_n=5)
    assert not proven
    assert err > 0


def test_value_quantiles_float_fixed_point(ray_session):
    """Float quantiles at fixed-point resolution: parity with DuckDB
    quantile_disc over the same integer codes, per group."""
    from splade_ray.ops.sketch import value_quantiles_float

    rng = np.random.default_rng(6)
    vals = np.round(rng.uniform(-3, 30, 1000), 4)
    grp = rng.choice(["x", "y"], 1000)
    ds = rd.from_arrow(
        pa.table({"value": pa.array(vals), "g": pa.array(grp.tolist())})
    ).repartition(5)
    got = value_quantiles_float(ds, "value", [0.1, 0.5, 0.9], by="g", scale=100)
    codes = np.floor(vals * 100 + 0.5).astype(np.int64)
    want = duckdb.sql(
        """
        SELECT g, q_mille, value_fp FROM (
          SELECT g, unnest([100, 500, 900]) AS q_mille,
                 unnest([quantile_disc(c, 0.1), quantile_disc(c, 0.5),
                         quantile_disc(c, 0.9)]) AS value_fp
          FROM (SELECT UNNEST(?) AS c, UNNEST(?) AS g) GROUP BY g
        ) ORDER BY g, q_mille
        """,
        params=[codes.tolist(), grp.tolist()],
    ).df()
    assert got["value_fp"].tolist() == want["value_fp"].tolist()
    assert got["q_mille"].tolist() == want["q_mille"].tolist()

def test_heavy_hitters_by_proven_exact_on_skew(ray_session):
    """Grouped MG: per-group top-n with per-group certificates matches the
    exact per-group value_counts on skewed data."""
    from splade_ray.ops.sketch import heavy_hitters_by

    rng = np.random.default_rng(17)
    rows_g, rows_v = [], []
    for g, base in (("en", 3000), ("de", 1500)):
        heavy = np.repeat([f"{g}h{i}" for i in range(5)],
                          [base - 200 * i for i in range(5)])
        tail = np.array([f"{g}t{i:05d}" for i in rng.integers(0, 3000, 1500)])
        vals = np.concatenate([heavy, tail])
        rows_g.extend([g] * vals.size)
        rows_v.extend(vals.tolist())
    perm = rng.permutation(len(rows_v))
    tbl = pa.table({
        "lang": pa.array(np.asarray(rows_g, object)[perm].tolist(), pa.string()),
        "v": pa.array(np.asarray(rows_v, object)[perm].tolist(), pa.string()),
    })
    ds = rd.from_arrow(tbl).repartition(8)
    frame, cert = heavy_hitters_by(ds, "v", "lang", k=64, top_n=5)
    assert cert["proven"].all()
    assert (cert["err_bound"] > 0).any()  # compression really happened
    df = pd.DataFrame({"lang": rows_g, "v": rows_v})
    for g in ("en", "de"):
        exact = df[df["lang"] == g]["v"].value_counts()
        got = frame[frame["lang"] == g]
        assert got["value"].tolist() == [f"{g}h{i}" for i in range(5)]
        assert got["count"].tolist() == [int(exact[f"{g}h{i}"]) for i in range(5)]
        assert got["rank"].tolist() == [1, 2, 3, 4, 5]


def test_heavy_hitters_by_partitioning_invariant(ray_session):
    """Same answer at any block layout / fan-in (mergeable summaries)."""
    from splade_ray.ops.sketch import heavy_hitters_by

    vals = (["a"] * 50 + ["b"] * 30 + ["c"] * 10 +
            [f"z{i}" for i in range(40)])
    langs = ["x" if i % 2 else "y" for i in range(len(vals))]
    tbl = pa.table({"lang": pa.array(langs), "v": pa.array(vals)})
    base = None
    for parts, fan_in in ((1, 1), (4, 2), (16, 32)):
        ds = rd.from_arrow(tbl).repartition(parts)
        frame, cert = heavy_hitters_by(ds, "v", "lang", k=8, top_n=3,
                                       fan_in=fan_in)
        if base is None:
            base = (frame, cert)
        else:
            pd.testing.assert_frame_equal(frame, base[0])
            pd.testing.assert_frame_equal(cert, base[1])


def test_percentile_ranks_matches_numpy(ray_session):
    import ray.data as rd

    from splade_ray.ops.sketch import percentile_ranks

    rng = np.random.RandomState(5)
    vals = rng.randint(0, 1000, 5000).astype(np.int64)
    groups = np.array(["g%d" % (i % 3) for i in range(5000)], object)
    ds = rd.from_arrow(
        pa.table({"v": vals, "g": pa.array(groups, pa.string())})
    ).repartition(9)
    thresholds = [0, 100, 499, 999, 2000]
    got = percentile_ranks(ds, "v", thresholds, by="g")
    for g in ("g0", "g1", "g2"):
        sub = vals[groups == g]
        for t in thresholds:
            row = got[(got.g == g) & (got.value == t)].iloc[0]
            n_le = int((sub <= t).sum())
            assert row["n_le"] == n_le and row["n_total"] == sub.size
            assert row["pct_mille"] == int(
                np.floor(1000.0 * n_le / sub.size + 0.5)
            )
    # global (ungrouped) variant
    g2 = percentile_ranks(ds, "v", [500])
    assert g2.iloc[0]["n_le"] == int((vals <= 500).sum())
    assert g2.iloc[0]["n_total"] == 5000
