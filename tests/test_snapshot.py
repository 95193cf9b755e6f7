"""Snapshot / restore lifecycle: verified copy, corruption detection,
crash-resume, and search parity after restore."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.snapshot import (
    load_snapshot_manifest,
    restore,
    snapshot,
    verify_snapshot,
)

N = 60


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=41)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(N, dtype=np.int64)),
                  "content": t["content"]}),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=20)
    return index_dir


def test_snapshot_restore_roundtrip(built, tmp_path):
    from splade_ray.query import search

    index_dir = built
    p = BM25Params(top_k=5)
    queries = [(1, "def parse merge")]
    before = search(index_dir, queries, p)

    snap = str(tmp_path / "snap")
    m = snapshot(index_dir, snap)
    assert m["n_files"] > 0 and verify_snapshot(snap)["ok"]

    restored = str(tmp_path / "restored")
    out = restore(snap, restored)
    assert out["n_files"] == m["n_files"]
    after = search(restored, queries, p)
    pd.testing.assert_frame_equal(before, after)


def test_snapshot_detects_corruption_and_restore_refuses(built, tmp_path):
    index_dir = built
    snap = str(tmp_path / "snap")
    snapshot(index_dir, snap)
    # flip bytes in one payload file
    mf = load_snapshot_manifest(snap)
    victim = os.path.join(snap, "data", mf["files"][0]["rel"])
    with open(victim, "r+b") as fh:
        fh.write(b"\x00corrupt\x00")
    v = verify_snapshot(snap)
    assert not v["ok"] and mf["files"][0]["rel"] in v["bad"]
    with pytest.raises(IOError):
        restore(snap, str(tmp_path / "r2"))
    # restore refuses a non-empty target without force
    tgt = tmp_path / "nonempty"
    tgt.mkdir()
    (tgt / "x").write_text("y")
    with pytest.raises(FileExistsError):
        restore(snap, str(tgt))


def test_snapshot_resume_skips_copied_files(built, tmp_path):
    """A half-finished snapshot (no manifest) resumes: existing files with
    the right size are not re-copied (mtime unchanged)."""
    index_dir = built
    snap = str(tmp_path / "snap")
    snapshot(index_dir, snap)
    manifest_path = os.path.join(snap, "snapshot.json")
    os.remove(manifest_path)  # simulate crash before manifest write
    mf_files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(snap, "data")) for f in fs
    )
    mtimes = {f: os.path.getmtime(f) for f in mf_files}
    m = snapshot(index_dir, snap)  # resume
    assert os.path.exists(manifest_path) and m["n_files"] == len(mf_files)
    assert all(os.path.getmtime(f) == mtimes[f] for f in mf_files)


def test_cli_snapshot(built, tmp_path, capsys):
    from splade_ray.cli import main

    snap = str(tmp_path / "snap")
    assert main(["snapshot", "--mode", "create", "--index", built,
                 "--snap", snap]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_files"] > 0
    assert main(["snapshot", "--mode", "verify", "--snap", snap]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["ok"]


def test_incremental_snapshot_hard_links_unchanged_files(built, tmp_path):
    """A second snapshot with base= hard-links unchanged files (st_nlink
    2) and copies only changed ones; both snapshots restore standalone."""
    from splade_ray.delete import delete_docs

    index_dir = built
    s1 = str(tmp_path / "s1")
    snapshot(index_dir, s1)
    # change exactly one file (tombstones appear)
    delete_docs(index_dir, [1])
    s2 = str(tmp_path / "s2")
    m2 = snapshot(index_dir, s2, base_snap=s1)
    assert verify_snapshot(s2)["ok"]
    m1 = load_snapshot_manifest(s1)
    sha1 = {f["rel"]: f["sha256"] for f in m1["files"]}
    linked = changed = 0
    for f in m2["files"]:
        p = os.path.join(s2, "data", f["rel"])
        if sha1.get(f["rel"]) == f["sha256"]:
            assert os.stat(p).st_nlink >= 2, f["rel"]  # shared payload
            linked += 1
        else:
            changed += 1
    assert linked > 0 and changed >= 1  # tombstones.parquet is new
    # the incremental snapshot restores standalone
    r = str(tmp_path / "r")
    restore(s2, r)
    from splade_ray.delete import load_tombstones

    assert load_tombstones(r).tolist() == [1]
