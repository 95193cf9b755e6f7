"""Index snapshot / restore — the ES snapshot-API analog for a
filesystem-contract index.

The reference's index is a directory of HDF5/json files with no
backup story (``splade/indexing/inverted_index.py:81-94`` writes once,
in place). A snapshot is a verified, resumable copy of an index directory: the file
list is enumerated driver-side (names only), the byte copying + sha256
hashing fans out as a Ray Data pipeline (one task per file batch — at
10^5-segment scale the copy is embarrassingly parallel and the driver
never holds file bytes), and the manifest (relative path, size, sha256
per file) is written LAST, so a half-finished snapshot is never mistaken
for a complete one. Re-running a crashed snapshot copies only files that
are missing or size-mismatched (ES incremental-snapshot semantics at file
granularity). ``restore`` replays the copy in the other direction and
re-verifies every file's sha256 against the manifest; ``verify_snapshot``
re-hashes a snapshot in place.

The per-file sha256 doubles as the integrity chain to the build's own
``content_sha_rollup`` lineage: a restored index passes ``cli verify``
because the bytes are identical, not merely present.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

import pyarrow as pa
import ray.data as rd

SNAPSHOT_MANIFEST = "snapshot.json"
_DATA = "data"


def _file_list(root: str) -> list[str]:
    out = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        for chunk in iter(lambda: fh.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _copy_batch(batch: pa.Table, *, src_root: str, dst_root: str,
                base_root: str | None = None,
                base_files: dict | None = None) -> pa.Table:
    """Copy + hash a batch of files (one Ray task). Skips files already
    present at the destination with the right size (crash resume). With a
    base snapshot (``base_root`` + its {rel: (size, sha)} manifest), a
    source file whose bytes hash to the base's entry is HARD-LINKED from
    the base instead of copied — the ES incremental-snapshot shape: only
    changed files cost bytes."""
    rels, sizes, shas = [], [], []
    for rel in batch["rel"].to_pylist():
        src = os.path.join(src_root, rel)
        dst = os.path.join(dst_root, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        want = os.path.getsize(src)
        if not (os.path.exists(dst) and os.path.getsize(dst) == want):
            linked = False
            if base_files is not None and rel in base_files:
                b_size, b_sha = base_files[rel]
                if b_size == want and _sha256_file(src) == b_sha:
                    tmp = dst + ".tmp-copy"
                    if os.path.exists(tmp):
                        os.remove(tmp)
                    os.link(os.path.join(base_root, rel), tmp)
                    os.replace(tmp, dst)
                    linked = True
            if not linked:
                tmp = dst + ".tmp-copy"
                shutil.copyfile(src, tmp)
                os.replace(tmp, dst)
        rels.append(rel)
        sizes.append(want)
        shas.append(_sha256_file(dst))
    return pa.table(
        {
            "rel": pa.array(rels, pa.string()),
            "size": pa.array(sizes, pa.int64()),
            "sha256": pa.array(shas, pa.string()),
        }
    )


def _run_copy(src_root: str, dst_root: str, rels: list[str],
              concurrency=None, base_root: str | None = None,
              base_files: dict | None = None) -> list[dict]:
    blocks = max(1, min(len(rels), 64))
    rows = (
        rd.from_items([{"rel": r} for r in rels], override_num_blocks=blocks)
        .map_batches(
            _copy_batch, batch_format="pyarrow",
            fn_kwargs=dict(src_root=src_root, dst_root=dst_root,
                           base_root=base_root, base_files=base_files),
            concurrency=concurrency,
        )
        .take_all()
    )
    return sorted(rows, key=lambda r: r["rel"])


def snapshot(index_dir: str, snap_dir: str, *, base_snap: str | None = None,
             concurrency=None) -> dict:
    """Snapshot ``index_dir`` into ``snap_dir`` (verified parallel copy;
    manifest written last). ``base_snap`` points at a previous snapshot of
    the same index: files whose bytes match the base are hard-linked from
    it instead of copied (incremental snapshots — only changed segments
    cost bytes; each snapshot dir still restores standalone because links
    ARE the payload). Returns the snapshot manifest."""
    if not os.path.isdir(index_dir):
        raise FileNotFoundError(index_dir)
    rels = _file_list(index_dir)
    if not rels:
        raise ValueError(f"nothing to snapshot under {index_dir}")
    base_root = base_files = None
    if base_snap is not None:
        bm = load_snapshot_manifest(base_snap)
        base_root = os.path.join(base_snap, _DATA)
        base_files = {f["rel"]: (f["size"], f["sha256"]) for f in bm["files"]}
    data = os.path.join(snap_dir, _DATA)
    os.makedirs(data, exist_ok=True)
    files = _run_copy(index_dir, data, rels, concurrency,
                      base_root=base_root, base_files=base_files)
    manifest = {
        "n_files": len(files),
        "total_bytes": int(sum(f["size"] for f in files)),
        "files": files,
    }
    tmp = os.path.join(snap_dir, "." + SNAPSHOT_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(snap_dir, SNAPSHOT_MANIFEST))
    return manifest


def load_snapshot_manifest(snap_dir: str) -> dict:
    with open(os.path.join(snap_dir, SNAPSHOT_MANIFEST)) as fh:
        return json.load(fh)


def verify_snapshot(snap_dir: str, *, concurrency=None) -> dict:
    """Re-hash every snapshot file against the manifest. Returns
    {ok, n_files, bad: [rel...]}; a missing file counts as bad."""
    manifest = load_snapshot_manifest(snap_dir)
    data = os.path.join(snap_dir, _DATA)
    want = {f["rel"]: (f["size"], f["sha256"]) for f in manifest["files"]}
    present = [r for r in sorted(want) if os.path.exists(os.path.join(data, r))]
    # src == dst: the copy is a size-matched no-op, so this is a pure
    # fanned-out re-hash of the snapshot payload
    got = {
        r["rel"]: (r["size"], r["sha256"])
        for r in _run_copy(data, data, present, concurrency)
    } if present else {}
    bad = sorted(r for r in want if got.get(r) != want[r])
    return {"ok": not bad, "n_files": len(want), "bad": bad}


def restore(snap_dir: str, index_dir: str, *, force: bool = False,
            concurrency=None) -> dict:
    """Restore a snapshot into ``index_dir`` (refuses a non-empty target
    unless ``force``), verifying every restored file's sha256 against the
    snapshot manifest. Returns {n_files, total_bytes}."""
    manifest = load_snapshot_manifest(snap_dir)
    if os.path.isdir(index_dir) and os.listdir(index_dir) and not force:
        raise FileExistsError(
            f"{index_dir} is not empty — pass force=True to overwrite"
        )
    data = os.path.join(snap_dir, _DATA)
    want = {f["rel"]: f["sha256"] for f in manifest["files"]}
    files = _run_copy(data, index_dir, sorted(want), concurrency)
    bad = sorted(f["rel"] for f in files if want[f["rel"]] != f["sha256"])
    if bad:
        raise IOError(f"restore verification failed for {len(bad)} files: "
                      f"{bad[:5]}...")
    return {"n_files": len(files),
            "total_bytes": int(sum(f["size"] for f in files))}
