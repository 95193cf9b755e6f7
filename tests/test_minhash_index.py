"""Persisted MinHash-LSH index: build once, probe increments (daily-crawl
near-dup). Both probe regimes must agree with the one-shot pair scan."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.dedup import (
    minhash_index_build,
    minhash_index_probe,
)


def _corpus():
    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs for the long trip",
        "sphinx of black quartz judge my vow tonight before dawn",
        "completely unrelated text about ray data pipelines and arrow",
    ]
    old_docs = [{"doc_id": i, "text": t} for i, t in enumerate(base)]
    new_docs = [
        # near-dup of old 0 (one word changed)
        {"doc_id": 100, "text": "the quick brown fox jumps over the lazy cat again and again"},
        # exact dup of old 2
        {"doc_id": 101, "text": base[2]},
        # novel
        {"doc_id": 102, "text": "nothing like anything stored in the index at all"},
    ]
    return old_docs, new_docs


@pytest.mark.parametrize("force_shuffle", [False, True])
def test_probe_finds_near_dups(ray_session, tmp_path, force_shuffle):
    old_docs, new_docs = _corpus()
    idx = str(tmp_path / "lsh")
    params = minhash_index_build(
        rd.from_items(old_docs).repartition(2), idx,
        num_perm=32, bands=16, shingle_k=2)
    assert params["num_perm"] == 32
    kwargs = {"pushdown_max_rows": 0} if force_shuffle else {}
    out = minhash_index_probe(
        rd.from_items(new_docs).repartition(2), idx,
        min_est_jaccard=0.5, **kwargs,
    ).to_pandas().sort_values(["new_doc", "old_doc"]).reset_index(drop=True)
    got = set(zip(out["new_doc"], out["old_doc"]))
    assert (101, 2) in got          # exact dup always collides
    assert (100, 0) in got          # near-dup collides in >=1 band
    assert not any(nd == 102 for nd, _ in got)
    exact = out[(out["new_doc"] == 101)]
    assert int(exact["n_match"].iloc[0]) == 32  # identical signatures


def test_build_refuses_param_mismatch_and_resumes(ray_session, tmp_path):
    old_docs, _ = _corpus()
    idx = str(tmp_path / "lsh")
    ds = rd.from_items(old_docs)
    p1 = minhash_index_build(ds, idx, num_perm=32, bands=8)
    p2 = minhash_index_build(ds, idx, num_perm=32, bands=8)  # reuse ok
    assert p1 == p2
    with pytest.raises(ValueError, match="refusing"):
        minhash_index_build(ds, idx, num_perm=64, bands=8)
    with pytest.raises(ValueError, match="bands must divide"):
        minhash_index_build(ds, str(tmp_path / "x"), num_perm=32, bands=7)


def test_probe_empty_increment(ray_session, tmp_path):
    old_docs, _ = _corpus()
    idx = str(tmp_path / "lsh")
    minhash_index_build(rd.from_items(old_docs), idx, num_perm=32, bands=8)
    empty = rd.from_arrow(pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
    ds_out = minhash_index_probe(empty, idx)
    assert ds_out.count() == 0
    # schema survives on the Dataset (to_pandas drops it for 0-block data)
    assert set(ds_out.schema().names) == {"new_doc", "old_doc", "n_match"}


def test_cli_lsh_build_probe(ray_session, tmp_path, capsys):
    import pyarrow.parquet as pq
    import ray.data as rd

    from splade_ray.cli import main

    old_docs, new_docs = _corpus()
    d1, d2 = tmp_path / "old", tmp_path / "new"
    for d, rows in ((d1, old_docs), (d2, new_docs)):
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows]),
        }), str(d / "p.parquet"))
    idx = str(tmp_path / "lsh")
    assert main(["lsh-build", "--corpus", str(d1), "--index", idx,
                 "--num-perm", "32", "--bands", "16", "--shingle-k", "2"]) == 0
    out = str(tmp_path / "pairs")
    assert main(["lsh-probe", "--corpus", str(d2), "--index", idx,
                 "--out", out]) == 0
    got = rd.read_parquet(out).to_pandas()
    assert (101, 2) in set(zip(got["new_doc"], got["old_doc"]))


def test_minhash_index_append_and_clean_tag(ray_session, tmp_path):
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.dedup import (
        minhash_index_append,
        minhash_index_build,
        minhash_index_clean_tag,
        minhash_index_probe,
    )

    def corpus(ids, texts):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
        }))

    base = ("shared boilerplate sentence repeated across increments with "
            "plenty of words to shingle over for the minhash signatures")
    idx = str(tmp_path / "idx")
    minhash_index_build(corpus([1], [base]), idx)
    r = minhash_index_append(
        corpus([2], [base.replace("plenty", "loads")]), idx, tag="day2")
    assert r["n_docs"] == 1 and r["n_band_rows"] > 0
    # probe a copy: both the built doc and the appended doc collide
    probe = minhash_index_probe(
        corpus([9], [base]), idx, min_est_jaccard=0.3).to_pandas()
    assert set(probe["old_doc"]) == {1, 2}
    # re-append same tag: idempotent (clean-first), not doubled
    minhash_index_append(
        corpus([2], [base.replace("plenty", "loads")]), idx, tag="day2")
    probe2 = minhash_index_probe(
        corpus([9], [base]), idx, min_est_jaccard=0.3).to_pandas()
    assert len(probe2) == len(probe)
    # clean removes the increment entirely
    n = minhash_index_clean_tag(idx, "day2")
    assert n > 0
    probe3 = minhash_index_probe(
        corpus([9], [base]), idx, min_est_jaccard=0.3).to_pandas()
    assert set(probe3["old_doc"]) == {1}
    # tag validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad increment tag"):
        minhash_index_clean_tag(idx, "no/slashes")
    # appending to a missing index refuses
    with _pytest.raises(FileNotFoundError):
        minhash_index_append(corpus([3], [base]), str(tmp_path / "nope"),
                             tag="x")


def test_minhash_index_append_crash_recovery_and_compact(ray_session,
                                                         tmp_path):
    """A partial (crashed) tagged append is repaired by the clean-first
    rerun; compaction folds increment files into one per partition with
    identical probe results, and survives its own interruption windows."""
    import os
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.dedup import (
        minhash_index_append,
        minhash_index_build,
        minhash_index_compact,
        minhash_index_probe,
    )

    def corpus(ids, texts):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
        }))

    base = ("shared boilerplate sentence repeated across increments with "
            "plenty of words to shingle over for the minhash signatures")
    idx = str(tmp_path / "idx")
    minhash_index_build(corpus([1], [base]), idx)

    # simulate a crashed append: a stray partial file under the same tag
    stray = os.path.join(idx, "sigs", "inc-day2-99.parquet")
    shutil.copy(os.path.join(idx, "sigs",
                             sorted(os.listdir(os.path.join(idx, "sigs")))[0]),
                stray)
    minhash_index_append(
        corpus([2], [base.replace("plenty", "loads")]), idx, tag="day2")
    assert not os.path.exists(stray)  # cleaned before the rewrite

    def probe():
        return minhash_index_probe(
            corpus([9], [base]), idx, min_est_jaccard=0.3
        ).to_pandas().sort_values("old_doc").reset_index(drop=True)

    before = probe()
    assert set(before["old_doc"]) == {1, 2}

    r = minhash_index_compact(idx)
    assert r["files_after"] < r["sigs_files_before"] + r["bands_files_before"]
    for root, _, files in os.walk(os.path.join(idx, "bands")):
        assert len([f for f in files if f.endswith(".parquet")]) <= 1
    after = probe()
    import pandas as pd

    pd.testing.assert_frame_equal(after, before)

    # interruption window: old moved aside, new in place is complete; a
    # stale .old/.new dir from a crash is cleared by the next compact
    os.makedirs(os.path.join(idx, "sigs.old"), exist_ok=True)
    os.makedirs(os.path.join(idx, "bands.new"), exist_ok=True)
    minhash_index_compact(idx)
    assert not os.path.isdir(os.path.join(idx, "sigs.old"))
    assert not os.path.isdir(os.path.join(idx, "bands.new"))
    pd.testing.assert_frame_equal(probe(), before)
    # crash AFTER live moved to .old but before .new renamed in: recovery
    shutil.move(os.path.join(idx, "sigs"), os.path.join(idx, "sigs.old"))
    minhash_index_compact(idx)
    pd.testing.assert_frame_equal(probe(), before)


def test_cli_lsh_append_compact(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as pq
    import ray.data as rd

    from splade_ray.cli import main

    old_docs, new_docs = _corpus()
    d1, d2 = tmp_path / "old", tmp_path / "new"
    for d, rows in ((d1, old_docs), (d2, new_docs)):
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows]),
        }), str(d / "p.parquet"))
    idx = str(tmp_path / "lsh")
    assert main(["lsh-build", "--corpus", str(d1), "--index", idx,
                 "--num-perm", "32", "--bands", "16", "--shingle-k", "2"]) == 0
    assert main(["lsh-append", "--corpus", str(d2), "--index", idx,
                 "--tag", "day2"]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["n_docs"] == len(new_docs)
    out1 = str(tmp_path / "p1")
    assert main(["lsh-probe", "--corpus", str(d2), "--index", idx,
                 "--out", out1]) == 0
    before = rd.read_parquet(out1).to_pandas()
    # appended docs now probe-visible (self matches present)
    assert set(before["new_doc"]) & {r["doc_id"] for r in new_docs}
    assert main(["lsh-compact", "--index", idx]) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["files_after"] > 0
    out2 = str(tmp_path / "p2")
    assert main(["lsh-probe", "--corpus", str(d2), "--index", idx,
                 "--out", out2]) == 0
    after = rd.read_parquet(out2).to_pandas()
    key = ["new_doc", "old_doc", "n_match"]
    assert sorted(map(tuple, after[key].values.tolist())) == \
        sorted(map(tuple, before[key].values.tolist()))


def test_lsh_index_snapshot_chain(ray_session, tmp_path):
    """The generic snapshot machinery covers LSH index dirs: full snapshot
    -> incremental snapshot after an append (unchanged files hard-linked
    from the base) -> restore -> probe parity."""
    import os

    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.dedup import (
        minhash_index_append,
        minhash_index_build,
        minhash_index_probe,
    )
    from splade_ray.snapshot import restore, snapshot, verify_snapshot

    def corpus(ids, texts):
        return rd.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts),
        }))

    base = ("shared boilerplate sentence repeated across increments with "
            "plenty of words to shingle over for the minhash signatures")
    idx = str(tmp_path / "idx")
    minhash_index_build(corpus([1], [base]), idx)
    s1 = str(tmp_path / "snap1")
    m1 = snapshot(idx, s1)
    assert m1["n_files"] > 0
    assert verify_snapshot(s1)["ok"]

    minhash_index_append(corpus([2], [base.replace("plenty", "loads")]),
                         idx, tag="day2")
    s2 = str(tmp_path / "snap2")
    m2 = snapshot(idx, s2, base_snap=s1)
    # the base's files were reused as hard links, not copied
    linked = [f for f in m2["files"]
              if os.stat(os.path.join(s2, "data", f["rel"])).st_nlink > 1]
    assert len(linked) >= m1["n_files"]

    want = minhash_index_probe(
        corpus([9], [base]), idx, min_est_jaccard=0.3
    ).to_pandas().sort_values("old_doc").reset_index(drop=True)
    rest = str(tmp_path / "restored")
    restore(s2, rest)
    got = minhash_index_probe(
        corpus([9], [base]), rest, min_est_jaccard=0.3
    ).to_pandas().sort_values("old_doc").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert set(got["old_doc"]) == {1, 2}


def test_probe_regime_auto_routes_by_increment_size(
        ray_session, tmp_path, monkeypatch):
    """The pushdown/shuffle choice is made from the MEASURED band-row
    count of the increment, never caller opt-in: the same call crosses
    to the shuffle regime when the increment outgrows
    ``pushdown_max_rows`` — and both regimes return identical pairs."""
    import splade_ray.ops.dedup as dd

    old_docs, new_docs = _corpus()
    idx = str(tmp_path / "lsh")
    minhash_index_build(rd.from_items(old_docs), idx,
                        num_perm=32, bands=16, shingle_k=2)
    calls = []
    real_push, real_shuf = dd._probe_pairs_pushdown, dd._probe_pairs_shuffle
    monkeypatch.setattr(dd, "_probe_pairs_pushdown",
                        lambda *a, **k: (calls.append("pushdown"),
                                         real_push(*a, **k))[1])
    monkeypatch.setattr(dd, "_probe_pairs_shuffle",
                        lambda *a, **k: (calls.append("shuffle"),
                                         real_shuf(*a, **k))[1])
    inc = rd.from_items(new_docs)
    # 3 docs × 16 bands = 48 band rows: below 100 -> pushdown
    small = minhash_index_probe(
        inc, idx, min_est_jaccard=0.5, pushdown_max_rows=100
    ).to_pandas().sort_values(["new_doc", "old_doc"]).reset_index(drop=True)
    assert calls == ["pushdown"]
    # same increment, threshold below its 48 band rows -> shuffle
    big = minhash_index_probe(
        inc, idx, min_est_jaccard=0.5, pushdown_max_rows=40
    ).to_pandas().sort_values(["new_doc", "old_doc"]).reset_index(drop=True)
    assert calls == ["pushdown", "shuffle"]
    import pandas as pd

    pd.testing.assert_frame_equal(small, big)
