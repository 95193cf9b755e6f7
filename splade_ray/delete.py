"""Document deletion: tombstones (instant, logical) + purge (physical).

The reference's index is immutable once written (``array_index.h5py``,
``splade/indexing/inverted_index.py:81-94``) — removing a document means a
full rebuild. This module adds the Lucene-style two-phase contract a served
index needs:

- :func:`delete_docs` appends doc ids to a sorted tombstone table at the
  index root. Deletion is O(tombstones) and immediate: every query path
  filters tombstoned docs BEFORE its per-segment top-k cut (so the global
  merge stays exact), while corpus statistics (df, avgdl, N) keep their
  build-time values — exactly Lucene's visible-deletes-before-merge
  semantics.
- :func:`purge_deletes` physically rewrites only the segments that contain
  tombstoned docs (decode → mask → re-encode, block-max metadata rebuilt),
  rebuilds the global lexicon through the same streaming (term, df, cf)
  groupby as the initial build, refreshes the global manifest (so df/avgdl/N
  now reflect the reduced corpus), invalidates derived layers
  (quantized/positions/trigrams) for re-derivation, and clears the
  tombstones. Resumable: a crash mid-purge leaves tombstones in place and
  already-rewritten segments simply have nothing left to drop on re-run.

Scale shape: tombstone filtering is a per-segment ``searchsorted`` against a
broadcast sorted id array (``ray.put`` once, read per actor); purge is one
task per AFFECTED segment plus the lexicon-sized shuffle the build already
pays. Nothing corpus-sized sits on the driver.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from splade_ray.segments import decode_posting, encode_posting

TOMBSTONES = "tombstones.parquet"
# derived-layer sidecars a physical rewrite invalidates
_LAYERS = {
    "quantized.json": "postings_q.parquet",
    "positions.json": "positions.parquet",
    "trigrams.json": "trigrams.parquet",
}


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique tombstoned doc ids (empty array when none)."""
    p = os.path.join(index_dir, TOMBSTONES)
    if not os.path.exists(p):
        return np.empty(0, np.int64)
    return pq.read_table(p)["doc_id"].to_numpy().astype(np.int64)


def delete_docs(index_dir: str, doc_ids) -> dict:
    """Tombstone docs (logical delete, visible to every query path at once).
    Idempotent; unknown ids are accepted (they simply never match)."""
    new = np.unique(np.asarray(list(doc_ids), np.int64))
    old = load_tombstones(index_dir)
    merged = np.union1d(old, new)
    tmp = os.path.join(index_dir, ".tmp-" + TOMBSTONES)
    pq.write_table(pa.table({"doc_id": pa.array(merged, pa.int64())}), tmp)
    os.replace(tmp, os.path.join(index_dir, TOMBSTONES))
    return {"n_tombstones": int(merged.size), "n_added": int(merged.size - old.size)}


def deleted_mask_for(doc_ids: np.ndarray, tombstones: np.ndarray | None) -> np.ndarray | None:
    """Bool mask (True = deleted) aligned to ``doc_ids`` (ascending), or
    None when no doc in this segment is tombstoned."""
    if tombstones is None or tombstones.size == 0 or doc_ids.size == 0:
        return None
    idx = np.searchsorted(tombstones, doc_ids)
    idx = np.minimum(idx, tombstones.size - 1)
    m = tombstones[idx] == doc_ids
    return m if m.any() else None


def _invalidate_layers(index_dir: str) -> None:
    """Mark every existing derived-layer manifest pending — a physical
    rewrite changes posting payloads, so the layers must be re-derived
    (their builders resume per segment and only rebuild removed files)."""
    for name in _LAYERS:
        p = os.path.join(index_dir, name)
        if os.path.exists(p):
            with open(p) as fh:
                man = json.load(fh)
            man["pending"] = True
            with open(p, "w") as fh:
                json.dump(man, fh)


def rederive_layers(index_dir: str) -> dict:
    """Re-derive every derived layer present on this index, each under the
    config its own manifest records (quantized: factor/k1/b; trigrams:
    max_df_frac; positions: analyzer cols). The builders are per-segment
    resumable, so after a purge/compaction only invalidated segments pay
    I/O — except the quantized layer, which rebuilds fully whenever the
    global stats changed (its impacts bake them in). One call restores a
    maintained index to fully-derived state (ROADMAP round-3 #5)."""
    report: dict = {}
    qpath = os.path.join(index_dir, "quantized.json")
    if os.path.exists(qpath):
        from splade_ray.bm25 import BM25Params
        from splade_ray.quantized import build_quantized_postings

        with open(qpath) as fh:
            q = json.load(fh)
        report["quantized"] = build_quantized_postings(
            index_dir, BM25Params(k1=q["k1"], b=q["b"]), factor=q["factor"]
        )
    if os.path.exists(os.path.join(index_dir, "positions.json")):
        from splade_ray.positions import build_positions

        report["positions"] = build_positions(index_dir)
    tpath = os.path.join(index_dir, "trigrams.json")
    if os.path.exists(tpath):
        from splade_ray.trigram import build_trigrams

        with open(tpath) as fh:
            t = json.load(fh)
        report["trigrams"] = build_trigrams(index_dir, max_df_frac=t.get("max_df_frac"))
    return report


def _purge_segment(seg_dir: str, tomb: np.ndarray, block_size: int) -> dict:
    """Rewrite one segment without its tombstoned docs. Returns the updated
    segment manifest. No-op (manifest returned as-is) when the segment holds
    no tombstoned doc."""
    with open(os.path.join(seg_dir, "manifest.json")) as fh:
        man = json.load(fh)
    dl = pq.read_table(os.path.join(seg_dir, "doclens.parquet"))
    doc_ids = dl["doc_id"].to_numpy().astype(np.int64)
    deleted = deleted_mask_for(doc_ids, tomb)
    if deleted is None:
        return man
    keep_rows = np.flatnonzero(~deleted)
    new_dl = dl.take(pa.array(keep_rows))
    live_ids = doc_ids[keep_rows]
    live_lens = new_dl["doc_len"].to_numpy().astype(np.int64)

    src = pq.read_table(os.path.join(seg_dir, "postings.parquet"))
    rows: list[dict] = []
    for i in range(src.num_rows):
        df = src["df"][i].as_py()
        docs, tfs = decode_posting(
            src["docs_enc"][i].as_py(), src["tfs_enc"][i].as_py(), df
        )
        pos = np.searchsorted(doc_ids, docs)
        keep = ~deleted[pos]
        if not keep.any():
            continue
        docs, tfs = docs[keep], tfs[keep]
        dls = live_lens[np.searchsorted(live_ids, docs)]
        rows.append({"term": src["term"][i].as_py(), **encode_posting(docs, tfs, dls, block_size)})

    from splade_ray.segments import POSTINGS_SCHEMA

    new_post = (
        pa.Table.from_pylist(rows, schema=POSTINGS_SCHEMA)
        if rows
        else POSTINGS_SCHEMA.empty_table()
    )
    man = {
        **man,
        "n_docs": int(live_ids.size),
        "n_postings": int(new_post["df"].to_numpy().sum()) if new_post.num_rows else 0,
        "n_terms": int(new_post.num_rows),
        "sum_doc_len": int(live_lens.sum()),
        "purged": True,
    }
    # stage new files, then flip them in place (rename per file is atomic;
    # a crash between renames is healed by the re-run: already-swapped
    # files contain no tombstoned docs, so the re-run no-ops on them)
    tmp_p = os.path.join(seg_dir, ".tmp-postings.parquet")
    tmp_d = os.path.join(seg_dir, ".tmp-doclens.parquet")
    tmp_m = os.path.join(seg_dir, ".tmp-manifest.json")
    pq.write_table(new_post, tmp_p)
    pq.write_table(new_dl, tmp_d)
    with open(tmp_m, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp_p, os.path.join(seg_dir, "postings.parquet"))
    os.replace(tmp_d, os.path.join(seg_dir, "doclens.parquet"))
    os.replace(tmp_m, os.path.join(seg_dir, "manifest.json"))
    # derived layers of THIS segment are stale — drop their files so the
    # layer builders re-derive exactly these segments
    for sidecar in _LAYERS.values():
        p = os.path.join(seg_dir, sidecar)
        if os.path.exists(p):
            os.remove(p)
    return man


def purge_deletes(index_dir: str, *, concurrency: int | None = None) -> dict:
    """Physically remove tombstoned docs (Lucene merge-with-deletes analog).

    One Ray task per segment: segments without tombstoned docs only pay the
    doclens read + the (term, df, cf) projection for the lexicon rebuild;
    affected segments decode → mask → re-encode. The lexicon is rebuilt with
    the same streaming groupby as ``build_index`` and the global manifest is
    refreshed, so post-purge BM25 statistics reflect the reduced corpus."""
    from ray.data.aggregate import Sum

    from splade_ray.build import load_manifest, segment_dirs

    man = load_manifest(index_dir)
    tomb = load_tombstones(index_dir)
    segs = segment_dirs(index_dir)
    if tomb.size == 0:
        return {**man, "n_purged_docs": 0}
    _invalidate_layers(index_dir)
    tomb_ref = ray.put(tomb)
    block_size = man.get("block_size", 128)

    def task(batch: pa.Table) -> pa.Table:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        t = ray.get(tomb_ref)
        out: list[pa.Table] = []
        for seg_dir in batch["seg_dir"].to_pylist():
            _purge_segment(seg_dir, t, block_size)  # writes its manifest
            out.append(
                pq.read_table(
                    os.path.join(seg_dir, "postings.parquet"),
                    columns=["term", "df", "cf"],
                )
            )
        return pa.concat_tables(out)

    # ONE streaming pipeline: per-segment rewrite tasks emit their (term,
    # df, cf) projections straight into the lexicon groupby (the same
    # shuffle shape as build_index); per-segment manifests land on disk and
    # are re-read segment-count-sized afterwards — nothing vocab×segments
    # ever sits on the driver.
    lex = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", batch_size=1, concurrency=concurrency)
        .groupby("term", num_partitions=max(1, len(segs) // 16))
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
    )
    import shutil
    import uuid

    tmp_lex = os.path.join(index_dir, f".tmp-lexicon-{uuid.uuid4().hex[:8]}")
    lex.write_parquet(tmp_lex)
    lex_dir = os.path.join(index_dir, "lexicon")
    if os.path.exists(lex_dir):
        shutil.rmtree(lex_dir)
    os.rename(tmp_lex, lex_dir)
    from splade_ray.build import _write_lexicon_meta

    _write_lexicon_meta(index_dir, man["segments"])

    manifests = []
    for s in segs:
        with open(os.path.join(s, "manifest.json")) as fh:
            manifests.append(json.load(fh))
    n_docs = sum(m["n_docs"] for m in manifests)
    sum_dl = sum(m["sum_doc_len"] for m in manifests)
    n_purged = man["n_docs"] - n_docs
    new_man = {
        **man,
        "n_docs": n_docs,
        "n_postings": sum(m["n_postings"] for m in manifests),
        "sum_doc_len": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 1.0,
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as fh:
        json.dump(new_man, fh, indent=1)
    os.remove(os.path.join(index_dir, TOMBSTONES))
    return {**new_man, "n_purged_docs": int(n_purged)}


def rebuild_lexicon_and_stats(index_dir: str, *, concurrency: int | None = None) -> dict:
    """Recompute the global lexicon + manifest statistics from the segments
    as they are on disk, then drop the tombstones file (the caller asserts
    the segments no longer contain tombstoned docs — e.g. after a fused
    merge+purge compaction). Column-pruned (term, df, cf) reads only; the
    shuffle is the same lexicon-sized groupby as ``build_index``."""
    import shutil
    import uuid

    from ray.data.aggregate import Sum

    from splade_ray.build import load_manifest, segment_dirs

    man = load_manifest(index_dir)
    segs = segment_dirs(index_dir)

    def project(batch: pa.Table) -> pa.Table:
        out = [
            pq.read_table(
                os.path.join(s, "postings.parquet"), columns=["term", "df", "cf"]
            )
            for s in batch["seg_dir"].to_pylist()
        ]
        return pa.concat_tables(out)

    lex = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(project, batch_format="pyarrow", batch_size=1, concurrency=concurrency)
        .groupby("term", num_partitions=max(1, len(segs) // 16))
        .aggregate(Sum("df", alias_name="df"), Sum("cf", alias_name="cf"))
    )
    tmp_lex = os.path.join(index_dir, f".tmp-lexicon-{uuid.uuid4().hex[:8]}")
    lex.write_parquet(tmp_lex)
    lex_dir = os.path.join(index_dir, "lexicon")
    if os.path.exists(lex_dir):
        shutil.rmtree(lex_dir)
    os.rename(tmp_lex, lex_dir)
    from splade_ray.build import _write_lexicon_meta

    _write_lexicon_meta(index_dir, man["segments"])

    manifests = []
    for s in segs:
        with open(os.path.join(s, "manifest.json")) as fh:
            manifests.append(json.load(fh))
    n_docs = sum(m["n_docs"] for m in manifests)
    sum_dl = sum(m["sum_doc_len"] for m in manifests)
    n_purged = man["n_docs"] - n_docs
    new_man = {
        **man,
        "n_docs": n_docs,
        "n_postings": sum(m["n_postings"] for m in manifests),
        "sum_doc_len": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 1.0,
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as fh:
        json.dump(new_man, fh, indent=1)
    tp = os.path.join(index_dir, TOMBSTONES)
    if os.path.exists(tp):
        os.remove(tp)
    return {**new_man, "n_purged_docs": int(n_purged)}


def delete_by_query(
    index_dir: str,
    query_text: str,
    *,
    mode: str = "any",
    query_lang: str | None = None,
    concurrency=None,
) -> dict:
    """ES _delete_by_query: tombstone every LIVE doc matching the query —
    ``mode="any"`` (>=1 query term present, the match-query OR semantics)
    or ``mode="all"`` (every distinct query term present, the AND form).
    Returns {n_matched, n_deleted_total}. Matching runs per segment over
    decoded postings; only matched doc ids leave each segment (deletion
    output is match-sized by nature — the tombstone table then holds
    them, which is the same O(deleted) cost Lucene pays in its del docs
    bitsets)."""
    from splade_ray.docvalues import _segment_pipeline
    from splade_ray.query import SegmentIndex, prepare_queries

    if mode not in ("any", "all"):
        raise ValueError(f"unknown mode {mode!r}")
    prepared = prepare_queries(index_dir, [(0, query_text)],
                               query_lang=query_lang)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)

    empty = pa.table({"doc_id": pa.array([], pa.int64())})

    def per_segment(seg_dir: str) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
        terms = prep["queries"][0]
        if not terms:
            return empty
        if mode == "any":
            m = np.zeros(seg.doc_ids.size, bool)
            for term, _, _ in terms:
                pos, _ = seg.pos_tfs(term)
                m[pos] = True
        else:
            m = np.ones(seg.doc_ids.size, bool)
            for term, _, _ in terms:
                pos, _ = seg.pos_tfs(term)
                hit = np.zeros(seg.doc_ids.size, bool)
                hit[pos] = True
                m &= hit
        return pa.table({"doc_id": pa.array(seg.doc_ids[m], pa.int64())})

    pdf = _segment_pipeline(index_dir, per_segment, empty, concurrency)
    matched = (np.unique(pdf["doc_id"].to_numpy(np.int64))
               if len(pdf) else np.empty(0, np.int64))
    out = delete_docs(index_dir, matched)
    return {"n_matched": int(matched.size),
            "n_tombstones": out["n_tombstones"]}
