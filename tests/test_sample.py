"""Deterministic sampling / split-assignment tests (ops/sample)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.sample import (
    BUCKETS,
    _buckets,
    bottomk_sample,
    hash_sample,
    split_assign,
    threshold,
)


def _ds(n, blocks=5):
    t = pa.table({"doc_id": np.arange(n, dtype=np.int64),
                  "lang": ["l%d" % (i % 3) for i in range(n)]})
    return rd.from_arrow(t).repartition(blocks)


def test_hash_sample_deterministic_and_partition_invariant(ray_session):
    a = sorted(hash_sample(_ds(2000, blocks=3), 0.2, seed=1).to_pandas().doc_id)
    b = sorted(hash_sample(_ds(2000, blocks=17), 0.2, seed=1).to_pandas().doc_id)
    assert a == b and len(a) > 0
    # scalar reference: bucket < threshold
    ids = np.arange(2000, dtype=np.int64)
    want = ids[_buckets(ids, 1) < threshold(0.2)].tolist()
    assert a == want
    # rate ~ 20% (law of large numbers at n=2000, generous band)
    assert 0.1 < len(a) / 2000 < 0.3
    # different seed -> different membership
    c = sorted(hash_sample(_ds(2000), 0.2, seed=2).to_pandas().doc_id)
    assert c != a


def test_hash_sample_rate_edges(ray_session):
    assert len(hash_sample(_ds(300), 0.0).to_pandas()) == 0
    assert len(hash_sample(_ds(300), 1.0).to_pandas()) == 300
    with pytest.raises(ValueError):
        hash_sample(_ds(10), 1.5)


def test_split_assign_partitions_exactly(ray_session):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = split_assign(_ds(3000), fr, seed=3).to_pandas()
    assert len(out) == 3000
    assert set(out.split) <= set(fr)
    # every row exactly one label; fractions roughly honored
    frac = out.split.value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    # scalar reference via bucket thresholds
    names = sorted(fr)
    bounds = np.array([threshold(c) for c in np.cumsum([fr[n] for n in names])])
    bounds[-1] = BUCKETS
    b = _buckets(out.doc_id.to_numpy().astype(np.int64), 3)
    want = np.array(names, dtype=object)[np.searchsorted(bounds, b, side="right")]
    assert (out.split.to_numpy() == want).all()
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(_ds(10), {"a": 0.5, "b": 0.4})


def test_split_disjoint_from_sample_seeds(ray_session):
    """Same seed: hash_sample(rate) == rows whose split falls in the first
    rate-mass of sorted split names — membership composes consistently."""
    out = split_assign(_ds(500), {"a": 0.1, "b": 0.9}, seed=5).to_pandas()
    samp = hash_sample(_ds(500), 0.1, seed=5).to_pandas()
    assert sorted(out[out.split == "a"].doc_id) == sorted(samp.doc_id)


def test_bottomk_sample(ray_session):
    got = bottomk_sample(_ds(1000, blocks=7), 50, seed=9)
    assert got.sample_rank.tolist() == list(range(1, 51))
    # scalar reference: 50 smallest (hash, id)
    from splade_ray.ops.sample import _hash64

    ids = np.arange(1000, dtype=np.int64)
    h = _hash64(ids, 9)
    want = ids[np.lexsort((ids, h))[:50]].tolist()
    assert got.doc_id.tolist() == want
    # k > n returns all rows ranked
    small = bottomk_sample(_ds(7, blocks=3), 50, seed=9)
    assert len(small) == 7
    # empty dataset
    empty = bottomk_sample(
        rd.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())})), 5
    )
    assert len(empty) == 0 and list(empty.columns) == ["doc_id", "sample_rank"]


def test_stratified_sample_nesting_and_parity(ray_session):
    """Per-stratum membership == hash_sample at that stratum's rate; raising
    a rate only adds rows (nesting); unknown strata use default_rate."""
    from splade_ray.ops.sample import stratified_sample

    rates = {"l0": 0.05, "l1": 0.5}
    ds = _ds(2000, blocks=7)
    out = stratified_sample(
        ds, rates, strata_col="lang", seed=7, default_rate=0.25
    ).to_pandas()

    for lang, rate in rates.items():
        sub = _ds(2000).filter(lambda r, L=lang: r["lang"] == L)
        want = set(hash_sample(sub, rate, seed=7).to_pandas()["doc_id"])
        got = set(out[out["lang"] == lang]["doc_id"])
        assert got == want, lang

    # default-rate stratum (l2, unlisted): membership == hash_sample at 0.25
    l2 = _ds(2000).filter(lambda r: r["lang"] == "l2")
    want = set(hash_sample(l2, 0.25, seed=7).to_pandas()["doc_id"])
    assert set(out[out["lang"] == "l2"]["doc_id"]) == want

    # nesting: raising a rate is a superset
    bigger = stratified_sample(
        _ds(2000), {"l0": 0.1, "l1": 0.5}, strata_col="lang", seed=7,
        default_rate=0.25,
    ).to_pandas()
    assert set(out["doc_id"]) <= set(bigger["doc_id"])

    # partitioning invariance
    again = stratified_sample(
        _ds(2000, blocks=17), rates, strata_col="lang", seed=7, default_rate=0.25
    ).to_pandas()
    assert sorted(again["doc_id"]) == sorted(out["doc_id"])


def test_temperature_targets_apportionment():
    from splade_ray.ops.sample import temperature_targets

    counts = {"en": 1000, "fr": 100, "zh": 10}
    t = temperature_targets(counts, alpha=0.5, target=100)
    # largest-remainder: quotas sum exactly to target (no cap binds here)
    assert sum(t.values()) == 100
    # alpha=0.5 flattens: fr/zh get more than proportional share
    assert t["fr"] > 100 * 100 // 1110 and t["zh"] > 100 * 10 // 1110
    # alpha=1 reproduces proportional apportionment
    t1 = temperature_targets(counts, alpha=1.0, target=111)
    assert t1 == {"en": 100, "fr": 10, "zh": 1}
    # cap binds: a tiny group can't exceed its size
    t2 = temperature_targets({"a": 2, "b": 1000}, alpha=0.1, target=500)
    assert t2["a"] <= 2 and sum(t2.values()) <= 500


def test_temperature_sample_matches_bruteforce(ray_session):
    from splade_ray.ops.sample import _hash64, temperature_sample, temperature_targets

    n = 900
    langs = ["l%d" % (i % 4) for i in range(n)]
    ids = np.arange(n, dtype=np.int64)
    out, targets = temperature_sample(
        _ds(n, blocks=7), group_col="lang", id_col="doc_id",
        alpha=0.5, target=120, seed=3,
    )
    got = out.to_pandas().sort_values("doc_id")
    counts = pd.Series(["l%d" % (i % 3) for i in range(n)]).value_counts().to_dict()
    # _ds uses lang = i % 3
    want_t = temperature_targets(counts, alpha=0.5, target=120)
    assert targets == want_t
    # brute force: per group, bottom-t by (hash, id)
    df = pd.DataFrame({"doc_id": ids, "lang": ["l%d" % (i % 3) for i in range(n)]})
    df["h"] = _hash64(ids, 3)
    sel = []
    for g, gdf in df.groupby("lang"):
        sel.extend(gdf.sort_values(["h", "doc_id"]).head(want_t[g])["doc_id"])
    assert sorted(got["doc_id"]) == sorted(sel)
    # per-group counts match quotas
    assert got.groupby("lang").size().to_dict() == want_t
    # partitioning invariance
    out2, _ = temperature_sample(
        _ds(n, blocks=2), group_col="lang", id_col="doc_id",
        alpha=0.5, target=120, seed=3,
    )
    assert sorted(out2.to_pandas()["doc_id"]) == sorted(got["doc_id"])


def test_train_shards_deterministic_and_partition_invariant(ray_session):
    from splade_ray.ops.sample import train_shards

    key = ["doc_id", "shard", "pos"]
    a = train_shards(_ds(500, blocks=3), 8, seed=2).to_pandas()
    b = train_shards(_ds(500, blocks=17), 8, seed=2).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id")[key].reset_index(drop=True),
        b.sort_values("doc_id")[key].reset_index(drop=True),
    )
    # every row exactly once; pos contiguous 0..n-1 within each shard
    assert sorted(a.doc_id) == list(range(500))
    for _, g in a.groupby("shard"):
        assert sorted(g.pos) == list(range(len(g)))
    # it IS a shuffle: within-shard pos order differs from id order
    one = a[a["shard"] == a["shard"].iloc[0]].sort_values("pos")
    assert list(one.doc_id) != sorted(one.doc_id)
    with pytest.raises(ValueError, match="n_shards"):
        train_shards(_ds(10), 0)


def test_write_train_shards_reproducible_and_resumable(ray_session, tmp_path):
    from splade_ray.ops.sample import write_train_shards

    out = tmp_path / "shards"
    m1 = write_train_shards(_ds(300, blocks=4), str(out), 4, seed=1)
    assert not m1["skipped"].any() and int(m1["n_rows"].sum()) == 300
    files = sorted(out.glob("shard=*.parquet"))
    assert len(files) == len(m1)
    bytes1 = {f.name: f.read_bytes() for f in files}
    # resume: everything skipped, bytes untouched
    m2 = write_train_shards(_ds(300, blocks=9), str(out), 4, seed=1)
    assert m2["skipped"].all()
    assert {f.name: f.read_bytes() for f in sorted(out.glob("shard=*.parquet"))} == bytes1
    # fresh write under a DIFFERENT partitioning -> byte-identical shards
    out2 = tmp_path / "shards2"
    write_train_shards(_ds(300, blocks=9), str(out2), 4, seed=1)
    bytes2 = {f.name: f.read_bytes()
              for f in sorted(out2.glob("shard=*.parquet"))}
    assert bytes2 == bytes1
    # resume with DIFFERENT params must refuse, not silently keep stale data
    for kwargs in ({"seed": 2}, {"id_col": "other"}):
        with pytest.raises(ValueError, match="refusing to resume"):
            write_train_shards(_ds(300), str(out), 4,
                               **{"seed": 1, **kwargs})
    with pytest.raises(ValueError, match="refusing to resume"):
        write_train_shards(_ds(300), str(out), 8, seed=1)
