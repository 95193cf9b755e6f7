"""Segment compaction (tiered merge) for long-lived / incremental indexes.

Many small segments are the natural residue of resumable builds and
incremental corpus drops; every query then pays per-segment fixed costs
(open, term lookup, heap merge). Compaction merges groups of ``group_size``
CONSECUTIVE segments into one, using the same order-preserving
concatenation the salted term-index path uses: posting lists of consecutive
segments are doc-id-range disjoint, so merging a term's lists is byte-level
concatenation with exactly one varbyte value re-encoded per run
(``codec.rewrite_first_delta``) and block-max metadata concatenated with
offset shifts — the posting bytes themselves are never re-encoded. Blocks
stay ragged at the seams (a merged list's last-source block may be short);
every reader (exact decode, block decode, BMW windows) works from the
offset arrays, not a fixed stride, so ragged blocks are fine.

One Ray task per output segment; the group replaces its first source
directory atomically and the global manifest is rewritten. A compacted
index serves queries identically (tested bit-for-bit for exact and BMW);
derived quantized layers (``postings_q.parquet``) are invalidated and must
be rebuilt. Re-running ``build_index`` over the same corpus afterwards will
NOT skip-match compacted segments (their provenance spec is synthetic) —
compaction is for completed indexes.

Reference pressure point: the reference reloads its whole index as one
HDF5 file (``splade/indexing/inverted_index.py:23-46``) and never
compacts; at 1e12-file scale segment counts in the 1e5-1e6 range make
tiered merge a first-class maintenance op (ROADMAP #5).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from splade_ray.codec import rewrite_first_delta
from splade_ray.segments import POSTINGS_SCHEMA


def merge_posting_rows(rows: list[dict]) -> dict:
    """Merge one term's posting rows from consecutive (doc-id-disjoint,
    ascending) segments into a single encoded posting."""
    docs_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    first, last, tf_max, dl_min = [], [], [], []
    doc_off, tf_off = [0], [0]
    prev_last = 0
    df = cf = 0
    for r in rows:
        enc = bytes(r["docs_enc"])
        offs = r["bm_doc_off"]
        delta = 0
        if docs_parts:
            new_enc = rewrite_first_delta(enc, int(r["bm_first_doc"][0]), prev_last)
            delta = len(new_enc) - len(enc)
            enc = new_enc
        base = doc_off[-1]
        # offs = [0, o1, ..., total]; rewriting the run's first varbyte value
        # changes block 0's byte length, shifting every later offset by delta
        doc_off.extend(base + o + delta for o in offs[1:])
        tbase = tf_off[-1]
        tf_off.extend(tbase + o for o in r["bm_tf_off"][1:])
        docs_parts.append(enc)
        tf_parts.append(bytes(r["tfs_enc"]))
        first.extend(r["bm_first_doc"])
        last.extend(r["bm_last_doc"])
        tf_max.extend(r["bm_tf_max"])
        dl_min.extend(r["bm_dl_min"])
        prev_last = int(r["bm_last_doc"][-1])
        df += int(r["df"])
        cf += int(r["cf"])
    return {
        "df": df,
        "cf": cf,
        "docs_enc": b"".join(docs_parts),
        "tfs_enc": b"".join(tf_parts),
        "bm_first_doc": first,
        "bm_last_doc": last,
        "bm_tf_max": tf_max,
        "bm_dl_min": dl_min,
        "bm_doc_off": doc_off,
        "bm_tf_off": tf_off,
    }


def _seg_dir(index_dir: str, seg_id: int) -> str:
    return os.path.join(index_dir, "segments", f"seg={seg_id:06d}")


def _lineage_slices(manifest: dict) -> list[dict]:
    """A segment's corpus slices: its own (path, row_start, num_rows), or —
    for an already-compacted segment — the recorded flattened sources."""
    got = manifest.get("sources")
    if got is not None:
        return got
    return [{k: manifest[k] for k in ("path", "row_start", "num_rows")}]


def _purge_merge_posting_rows(
    rows: list[dict],
    all_doc_ids: "np.ndarray",
    deleted: "np.ndarray",
    live_ids: "np.ndarray",
    live_lens: "np.ndarray",
    block_size: int,
) -> dict | None:
    """Decode-path merge of one term's posting rows with tombstoned docs
    masked out, re-encoded fresh (the byte-concat fast path can't drop
    docs). Returns None when no live doc remains for the term."""
    from splade_ray.segments import decode_posting, encode_posting

    docs_parts, tf_parts = [], []
    for r in rows:
        d, t = decode_posting(bytes(r["docs_enc"]), bytes(r["tfs_enc"]), int(r["df"]))
        docs_parts.append(d)
        tf_parts.append(t)
    docs = np.concatenate(docs_parts)
    tfs = np.concatenate(tf_parts)
    keep = ~deleted[np.searchsorted(all_doc_ids, docs)]
    if not keep.any():
        return None
    docs, tfs = docs[keep], tfs[keep]
    dls = live_lens[np.searchsorted(live_ids, docs)]
    return encode_posting(docs, tfs, dls, block_size)


def _merge_group(
    index_dir: str,
    ids: list[int],
    compact_run: str,
    tomb: "np.ndarray | None" = None,
) -> dict:
    """Merge one group of consecutive segments; returns the new manifest.

    ``tomb``: sorted tombstoned doc ids — when any fall inside this group,
    the merge switches from byte-concat to a decode→mask→re-encode pass so
    the rewrite both merges AND purges in one I/O pass (fused
    ``maintain --purge``); groups untouched by tombstones keep the cheap
    concat path."""
    from splade_ray.delete import deleted_mask_for

    seg_dirs = [_seg_dir(index_dir, i) for i in ids]
    doclens = [pq.read_table(os.path.join(d, "doclens.parquet")) for d in seg_dirs]
    prev_max = None
    for dl in doclens:
        ids_np = dl["doc_id"].to_numpy()
        if prev_max is not None and ids_np.size and int(ids_np.min()) <= prev_max:
            raise ValueError(
                "compaction requires consecutive segments with disjoint "
                "ascending doc-id ranges"
            )
        if ids_np.size:
            prev_max = int(ids_np.max())
    merged_dl = pa.concat_tables(doclens)

    all_doc_ids = merged_dl["doc_id"].to_numpy().astype(np.int64)
    deleted = deleted_mask_for(all_doc_ids, tomb) if tomb is not None else None
    if deleted is not None:
        keep_rows = np.flatnonzero(~deleted)
        merged_dl = merged_dl.take(pa.array(keep_rows))
        live_ids = all_doc_ids[keep_rows]
        live_lens = merged_dl["doc_len"].to_numpy().astype(np.int64)

    per_term: dict[str, list[dict]] = defaultdict(list)
    manifests = []
    for d in seg_dirs:
        with open(os.path.join(d, "manifest.json")) as fh:
            manifests.append(json.load(fh))
        for row in pq.read_table(os.path.join(d, "postings.parquet")).to_pylist():
            per_term[row["term"]].append(row)
    rows_out = {name: [] for name in POSTINGS_SCHEMA.names}
    block_size = manifests[0]["block_size"]
    for term in sorted(per_term):
        if deleted is None:
            merged = merge_posting_rows(per_term[term])
        else:
            merged = _purge_merge_posting_rows(
                per_term[term], all_doc_ids, deleted, live_ids, live_lens, block_size
            )
            if merged is None:
                continue
        rows_out["term"].append(term)
        for k, v in merged.items():
            rows_out[k].append(v)
    postings = pa.table(rows_out, schema=POSTINGS_SCHEMA)

    shas = merged_dl["content_sha256"].to_pylist()
    manifest = {
        "schema_version": manifests[0]["schema_version"],
        "completed": True,
        "build_run": compact_run,
        "seg_id": ids[0],
        "path": "<compacted>",
        "row_start": -1,
        "num_rows": int(sum(m["num_rows"] for m in manifests)),
        "doc_id_start": manifests[0].get("doc_id_start"),
        "n_docs": int(merged_dl.num_rows),
        "n_postings": (
            int(sum(m["n_postings"] for m in manifests))
            if deleted is None
            else (int(postings["df"].to_numpy().sum()) if postings.num_rows else 0)
        ),
        "n_terms": int(postings.num_rows),
        "sum_doc_len": (
            int(sum(m["sum_doc_len"] for m in manifests))
            if deleted is None
            else int(live_lens.sum())
        ),
        "content_sha_rollup": hashlib.sha256("".join(shas).encode()).hexdigest(),
        "block_size": manifests[0]["block_size"],
        "build_secs": 0.0,
        "compacted_from": ids,
        # flattened corpus lineage so derived layers (positions/trigrams)
        # can re-read the merged segment's text after compaction
        "sources": [s for m in manifests for s in _lineage_slices(m)],
    }

    tmp = os.path.join(index_dir, "segments", f".tmp-compact-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(postings, os.path.join(tmp, "postings.parquet"))
    pq.write_table(merged_dl, os.path.join(tmp, "doclens.parquet"))
    with open(os.path.join(tmp, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    # STAGE only — the source dirs stay intact until the driver has
    # journaled the whole compaction (crash-safety: a crash here leaves the
    # index exactly as it was, plus a harmless staged dir that the next run
    # overwrites)
    staged = seg_dirs[0] + ".merged"
    if os.path.exists(staged):
        shutil.rmtree(staged)
    os.rename(tmp, staged)
    return manifest


def _journal_path(index_dir: str) -> str:
    return os.path.join(index_dir, "compact-journal.json")


def _finalize_compaction(index_dir: str, journal: dict) -> dict:
    """Swap staged merged dirs into place, delete superseded source dirs,
    rewrite the global manifest, drop derived quantized layers, remove the
    journal. Every step is idempotent, so a crash anywhere in here is healed
    by re-running (``recover_compaction``): staged dirs that were already
    swapped are detected by their manifest's ``build_run``."""
    from splade_ray.build import load_manifest

    run = journal["run"]
    for g in journal["groups"]:
        keep_dir = _seg_dir(index_dir, int(g["keep"]))
        staged = keep_dir + ".merged"
        if os.path.exists(staged):
            shutil.rmtree(keep_dir, ignore_errors=True)
            os.rename(staged, keep_dir)
        else:
            # already swapped by a previous (crashed) finalize attempt
            with open(os.path.join(keep_dir, "manifest.json")) as fh:
                if json.load(fh).get("build_run") != run:
                    raise RuntimeError(
                        f"compaction journal {run} names {keep_dir} but neither a "
                        "staged dir nor a swapped result exists — manual repair needed"
                    )
        for rid in g["remove"]:
            shutil.rmtree(_seg_dir(index_dir, int(rid)), ignore_errors=True)

    manifest = load_manifest(index_dir)
    kept = sorted(int(s) for s in journal["kept"])
    if manifest["segments"] != kept:  # idempotent across finalize retries
        manifest["segments"] = kept
        manifest["n_segments"] = len(kept)
        manifest.setdefault("compactions", 0)
        manifest["compactions"] += 1
        with open(os.path.join(index_dir, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=1)
    # a pure merge leaves the lexicon's CONTENT valid (df/cf totals are
    # unchanged), only its segment coverage moved — restate the meta so a
    # later append can still merge incrementally
    from splade_ray.build import _write_lexicon_meta

    _write_lexicon_meta(index_dir, kept)
    # EVERY derived layer (quantized/positions/trigrams) is stale after a
    # merge: merged dirs are staged fresh without layer files, so a layer
    # manifest claiming completeness would crash queries on the missing
    # files. Mark existing layer manifests pending (queries refuse until the
    # layer is re-derived); untouched segments keep their files. For
    # positions/trigrams (per-segment text) the re-derive then only rebuilds
    # merged segments; the quantized builder additionally compares its
    # recorded corpus_stats against the post-compaction manifest and
    # rebuilds EVERYTHING when a fused purge changed the global statistics
    # (impacts bake them in) — and reuses untouched segments when a pure
    # merge left the stats intact.
    from splade_ray.delete import _invalidate_layers

    _invalidate_layers(index_dir)
    os.remove(_journal_path(index_dir))
    return manifest


def recover_compaction(index_dir: str) -> dict | None:
    """Complete a compaction that crashed after journaling (staged merged
    dirs are self-contained, so finishing is always safe). Returns the
    updated manifest, or None when no journal exists. A crash BEFORE the
    journal was written needs no recovery at all — sources were untouched."""
    jp = _journal_path(index_dir)
    if not os.path.exists(jp):
        return None
    with open(jp) as fh:
        journal = json.load(fh)
    return _finalize_compaction(index_dir, journal)


def compact_segments(
    index_dir: str, *, group_size: int = 8, purge: bool = False
) -> dict:
    """Merge every run of ``group_size`` consecutive segments into one.
    Returns the updated global manifest. One Ray task per output segment.

    Crash-safe protocol (round-2 ADVICE item 2): (1) every group's merged
    segment is STAGED next to its target dir while the sources stay intact;
    (2) the driver writes a journal naming every swap; (3) swaps + source
    deletes + manifest rewrite happen journaled-forward — a crash at any
    point either leaves the old index fully intact (pre-journal) or is
    completed by ``recover_compaction`` (post-journal).

    ``purge=True`` fuses tombstone purging into the same rewrite pass
    (Lucene's merge-with-deletes): merged groups decode→mask→re-encode in
    one I/O pass instead of compact-then-purge writing everything twice;
    singleton groups go through the in-place ``_purge_segment`` flip. A
    crash between finalize and the lexicon/stats refresh leaves tombstones
    in place, which every query path still filters logically — re-running
    heals (purged segments no-op)."""
    import ray

    from splade_ray.build import load_manifest
    from splade_ray.delete import load_tombstones, rebuild_lexicon_and_stats

    recover_compaction(index_dir)  # heal any previously crashed run first
    manifest = load_manifest(index_dir)
    segs = manifest["segments"]
    tomb = load_tombstones(index_dir) if purge else np.empty(0, np.int64)
    if len(segs) <= 1 or group_size <= 1:
        if tomb.size:
            from splade_ray.delete import purge_deletes

            return purge_deletes(index_dir)
        return manifest
    groups = [segs[i : i + group_size] for i in range(0, len(segs), group_size)]
    compact_run = f"compact-{uuid.uuid4().hex}"
    tomb_ref = ray.put(tomb) if tomb.size else None
    block_size = manifest.get("block_size", 128)

    def task(batch: pa.Table) -> pa.Table:
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        done = []
        for ids in batch["ids"].to_pylist():
            ids = [int(i) for i in ids]
            if len(ids) > 1:
                _merge_group(index_dir, ids, compact_run, tomb=t)
            elif t is not None:
                from splade_ray.delete import _purge_segment

                _purge_segment(_seg_dir(index_dir, ids[0]), t, block_size)
            done.append(ids[0])
        return pa.table({"seg_id": pa.array(done, pa.int64())})

    kept = (
        rd.from_items([{"ids": g} for g in groups], override_num_blocks=len(groups))
        .map_batches(task, batch_format="pyarrow")
        .to_pandas()["seg_id"]
        .tolist()
    )
    journal = {
        "run": compact_run,
        "kept": sorted(int(k) for k in kept),
        "groups": [
            {"keep": int(g[0]), "remove": [int(i) for i in g[1:]]}
            for g in groups
            if len(g) > 1
        ],
    }
    tmp_j = _journal_path(index_dir) + ".tmp"
    with open(tmp_j, "w") as fh:
        json.dump(journal, fh)
    os.replace(tmp_j, _journal_path(index_dir))
    manifest = _finalize_compaction(index_dir, journal)
    if tomb.size:
        manifest = rebuild_lexicon_and_stats(index_dir)
    return manifest
