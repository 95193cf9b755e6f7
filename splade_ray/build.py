"""Resumable, fragment-partitioned index build (Ray Data pipeline).

Replaces the reference's single-writer build loop (``splade/index.py:14-35`` →
``SparseIndexing.index``, ``splade/tasks/transformer_evaluator.py:31-76``)
with a shuffle-free Ray Data design:

- The corpus is partitioned into *segments* = contiguous row ranges of the
  input Parquet files, planned driver-side from file metadata only. Segment
  boundaries derive from (file order, row offset), so they are identical at
  any parallelism level — this is what makes doc-id assignment deterministic
  (the reference's sequential counter, ``transformer_evaluator.py:47-51``,
  becomes ``global_row_offset + local_row``) and builds resumable.
- A ``map_batches`` stage over the segment specs tokenizes, computes the
  per-row content sha256 invariant, and writes each segment atomically
  (tmp dir + rename) with a lineage manifest. The heavy data (postings)
  never crosses the object store — only manifest rows do.
- The only shuffle is lexicon-sized: per-segment term stats (already
  pre-aggregated) are ``groupby(term).sum``-merged into the global lexicon
  (the hierarchical merge of the north rule; analog of ``index_dist.json``,
  ``inverted_index.py:90-94``).

On re-run, segments with a valid manifest are skipped (per-partition
checkpointing; Ray gives task retries, the layout gives job resume).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from splade_ray.analysis import analyze_docs, analyzer_config_hash
from splade_ray.segments import BLOCK_SIZE, build_segment_tables

SCHEMA_VERSION = 2

MANIFEST_SCHEMA = pa.schema(
    [
        ("seg_id", pa.int64()),
        ("path", pa.string()),
        ("row_start", pa.int64()),
        ("num_rows", pa.int64()),
        ("n_docs", pa.int64()),
        ("n_postings", pa.int64()),
        ("n_terms", pa.int64()),
        ("sum_doc_len", pa.int64()),
        ("content_sha_rollup", pa.string()),
        ("build_secs", pa.float64()),
        ("skipped", pa.bool_()),
    ]
)


def plan_segments(paths: list[str], rows_per_segment: int) -> list[dict]:
    """Plan contiguous row-range segments from Parquet footers (driver-side,
    metadata only). Deterministic for a given input layout."""
    specs = []
    global_row = 0
    seg_id = 0
    for path in sorted(paths):
        n = pq.ParquetFile(path).metadata.num_rows
        start = 0
        while start < n:
            cnt = min(rows_per_segment, n - start)
            specs.append(
                {
                    "seg_id": seg_id,
                    "path": path,
                    "row_start": start,
                    "num_rows": cnt,
                    "doc_id_start": global_row + start,
                }
            )
            seg_id += 1
            start += cnt
        global_row += n
    return specs


def _read_slice(path: str, row_start: int, num_rows: int, columns: list[str]) -> pa.Table:
    """Read a contiguous row slice, touching only the overlapping row groups
    (at scale segments align with row groups, so the over-read is bounded by
    one row-group on each side)."""
    f = pq.ParquetFile(path)
    first = 0
    groups, offset_in_sel = [], None
    for g in range(f.metadata.num_row_groups):
        n = f.metadata.row_group(g).num_rows
        if first + n > row_start and first < row_start + num_rows:
            if offset_in_sel is None:
                offset_in_sel = row_start - first
            groups.append(g)
        first += n
    t = f.read_row_groups(groups, columns=columns)
    return t.slice(offset_in_sel or 0, num_rows)


def read_lineage_slices(manifest: dict, columns: list[str]) -> pa.Table:
    """Concatenate the corpus slices a segment was built from. Plain
    segments have one (path, row_start, num_rows) slice; compacted segments
    record their flattened ``sources`` (splade_ray.compact._lineage_slices),
    in doc-id order."""
    srcs = manifest.get("sources") or [
        {k: manifest[k] for k in ("path", "row_start", "num_rows")}
    ]
    return pa.concat_tables(
        [_read_slice(s["path"], s["row_start"], s["num_rows"], columns) for s in srcs]
    )


def _read_rows(path: str, abs_rows: np.ndarray, columns: list[str]) -> pa.Table | None:
    """Read specific (sorted ascending) absolute row indices of one parquet
    file, touching only the row groups that contain them."""
    f = pq.ParquetFile(path)
    first, i = 0, 0
    parts = []
    for g in range(f.metadata.num_row_groups):
        if i >= abs_rows.size:
            break
        n = f.metadata.row_group(g).num_rows
        j = int(np.searchsorted(abs_rows, first + n))
        if j > i:
            t = f.read_row_group(g, columns=columns)
            parts.append(t.take(pa.array(abs_rows[i:j] - first)))
            i = j
        first += n
    return pa.concat_tables(parts) if parts else None


def read_lineage_rows(manifest: dict, columns: list[str], rows: np.ndarray) -> pa.Table | None:
    """Read only the given SEGMENT-RELATIVE rows (sorted ascending) of the
    segment's corpus lineage — candidate-pruned verification I/O: only row
    groups containing a requested row are touched, so reading k candidate
    docs out of an N-doc segment costs O(k/rows_per_group) group reads, not
    a full slice scan. Returns None when ``rows`` is empty."""
    srcs = manifest.get("sources") or [
        {k: manifest[k] for k in ("path", "row_start", "num_rows")}
    ]
    out, base = [], 0
    for s in srcs:
        hi = base + s["num_rows"]
        sel = rows[(rows >= base) & (rows < hi)]
        if sel.size:
            t = _read_rows(s["path"], sel - base + s["row_start"], columns)
            if t is not None:
                out.append(t)
        base = hi
    return pa.concat_tables(out) if out else None


def _seg_dir(index_dir: str, seg_id: int) -> str:
    return os.path.join(index_dir, "segments", f"seg={seg_id:06d}")


def _manifest_valid(
    seg_dir: str, spec: dict, lang_col: str | None = None, analyzer: str | None = None
) -> dict | None:
    mpath = os.path.join(seg_dir, "manifest.json")
    if not os.path.exists(mpath):
        return None
    try:
        with open(mpath) as fh:
            m = json.load(fh)
    except (OSError, json.JSONDecodeError):
        return None
    same = (
        m.get("schema_version") == SCHEMA_VERSION
        and m.get("completed") is True
        and m.get("path") == spec["path"]
        and m.get("row_start") == spec["row_start"]
        and m.get("num_rows") == spec["num_rows"]
        and m.get("doc_id_start") == spec["doc_id_start"]
        and m.get("lang_col") == lang_col
        and m.get("analyzer") == analyzer
        and os.path.exists(os.path.join(seg_dir, "postings.parquet"))
        and os.path.exists(os.path.join(seg_dir, "doclens.parquet"))
    )
    return m if same else None


def build_segments_batch(
    batch: pa.Table,
    *,
    index_dir: str,
    text_col: str,
    id_col: str | None,
    block_size: int = BLOCK_SIZE,
    extra_doc_cols: tuple[str, ...] = (),
    lang_col: str | None = None,
    analyzer: str | None = None,
    build_run: str | None = None,
    emit_term_stats: bool = False,
) -> pa.Table:
    """Build (or skip) one segment per input spec row. Stateless task: the
    tokenizer regex is module-level-compiled, all other state is per-call.

    With ``emit_term_stats=True`` the task's output is the segment's
    pre-aggregated (term, df, cf) rows instead of a manifest row, so the
    global lexicon ``groupby(term)`` consumes the build stage directly —
    one streaming pipeline, no barrier and no second read of the postings
    (skipped segments read back just those three columns)."""
    # Arrow's internal pool defaults to all cores *per worker process*; with
    # one Ray task per core that oversubscribes ~32x and stragglers appear.
    # Each task is one core's worth of work — keep Arrow single-threaded.
    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
    out = {name: [] for name in MANIFEST_SCHEMA.names}
    stats_parts: list[pa.Table] = []

    def emit(spec, m, skipped):
        out["seg_id"].append(spec["seg_id"])
        out["path"].append(spec["path"])
        out["row_start"].append(spec["row_start"])
        out["num_rows"].append(spec["num_rows"])
        out["n_docs"].append(m["n_docs"])
        out["n_postings"].append(m["n_postings"])
        out["n_terms"].append(m["n_terms"])
        out["sum_doc_len"].append(m["sum_doc_len"])
        out["content_sha_rollup"].append(m["content_sha_rollup"])
        out["build_secs"].append(m["build_secs"])
        out["skipped"].append(skipped)

    for spec in batch.to_pylist():
        seg_dir = _seg_dir(index_dir, spec["seg_id"])
        existing = _manifest_valid(seg_dir, spec, lang_col, analyzer)
        if existing is not None:
            emit(spec, existing, True)
            if emit_term_stats:
                stats_parts.append(
                    pq.read_table(
                        os.path.join(seg_dir, "postings.parquet"),
                        columns=["term", "df", "cf"],
                    )
                )
            continue
        t0 = time.monotonic()
        cols = [text_col] + [c for c in extra_doc_cols if c != text_col]
        if lang_col and lang_col not in cols:
            cols.append(lang_col)
        if id_col:
            cols = [id_col] + cols
        tbl = _read_slice(spec["path"], spec["row_start"], spec["num_rows"], cols)
        if id_col:
            doc_id_arr = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            doc_id_arr = spec["doc_id_start"] + np.arange(len(tbl), dtype=np.int64)
            tbl = tbl.append_column("doc_id", pa.array(doc_id_arr))
        order = np.argsort(doc_id_arr, kind="stable")  # posting lists need asc doc ids
        if not np.array_equal(order, np.arange(len(tbl))):
            tbl = tbl.take(pa.array(order))
        eff_id_col = id_col or "doc_id"

        # per-row content sha256 — the north-rule invariant vs the source table
        from splade_ray.codec import sha256_hex

        shas = sha256_hex(tbl[text_col])
        flat, doc_ids, doc_lens = analyze_docs(
            tbl, id_col=eff_id_col, text_col=text_col, lang_col=lang_col,
            analyzer=analyzer,
        )
        postings = build_segment_tables(flat, doc_ids, doc_lens, block_size)

        tmp = os.path.join(index_dir, "segments", f".tmp-{spec['seg_id']:06d}-{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp, exist_ok=True)
        pq.write_table(postings, os.path.join(tmp, "postings.parquet"))
        doclens_cols = {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "doc_len": pa.array(doc_lens, pa.int64()),
            "content_sha256": pa.array(shas, pa.string()),
        }
        for c in extra_doc_cols:
            doclens_cols[c] = tbl[c]
        pq.write_table(pa.table(doclens_cols), os.path.join(tmp, "doclens.parquet"))
        manifest = {
            "schema_version": SCHEMA_VERSION,
            "completed": True,
            "build_run": build_run,
            **{k: spec[k] for k in ("seg_id", "path", "row_start", "num_rows", "doc_id_start")},
            "lang_col": lang_col,
            "analyzer": analyzer,
            "n_docs": int(len(doc_ids)),
            "n_postings": int(flat.num_rows),
            "n_terms": int(postings.num_rows),
            "sum_doc_len": int(doc_lens.sum()),
            "content_sha_rollup": hashlib.sha256("".join(shas).encode()).hexdigest(),
            "block_size": block_size,
            "build_secs": time.monotonic() - t0,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as fh:
            json.dump(manifest, fh)
        if os.path.exists(seg_dir):
            shutil.rmtree(seg_dir)
        os.rename(tmp, seg_dir)
        emit(spec, manifest, False)
        if emit_term_stats:
            stats_parts.append(postings.select(["term", "df", "cf"]))
    if emit_term_stats:
        if not stats_parts:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64()),
                 "cf": pa.array([], pa.int64())}
            )
        return pa.concat_tables(stats_parts)
    return pa.table(out, schema=MANIFEST_SCHEMA)


_LEX_SCHEMA = pa.schema([
    ("term", pa.string()), ("df", pa.int64()), ("cf", pa.int64()),
])


def _merge_lexicon(stats_ds, *, n_segments: int):
    """Vocab-sized lexicon merge: coarse-key groupby (term hash folded to
    ~one group per CPU) with a vectorized dictionary-encode + bincount
    kernel; each group's output is term-sorted, so every lexicon file
    carries tight per-row-group term min/max stats and
    ``prepare_queries``'s isin pushdown prunes inside every file (global
    cross-group order buys nothing more for point lookups and would cost
    an extra all-to-all).

    Replaces the native per-term ``groupby("term").aggregate(Sum)``: that
    path shuffled every partial row into ``n_segments/16`` partitions and
    aggregated term-by-term — 20.9 s vs 2.6 s at 4.8M partials / 200k
    distinct terms (round-5 Zipf bench leg). The shuffle here moves the
    same slim (term, df, cf) partials once; everything after is
    numpy-vectorized."""
    from splade_ray.ops.dedup import _coarse_key, _shuffle_groups
    from splade_ray.term_index import _term_hashes

    n_groups = _shuffle_groups(None)

    def add_gk(b: pa.Table) -> pa.Table:
        hs, _ = _term_hashes(b["term"])
        return b.append_column("gk", pa.array(_coarse_key([hs], n_groups)))

    def agg(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _LEX_SCHEMA.empty_table()
        t = (g["term"].combine_chunks()
             if isinstance(g["term"], pa.ChunkedArray) else g["term"])
        enc = t.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nu = len(enc.dictionary)
        dfs = np.bincount(codes, weights=g["df"].to_numpy(zero_copy_only=False),
                          minlength=nu).astype(np.int64)
        cfs = np.bincount(codes, weights=g["cf"].to_numpy(zero_copy_only=False),
                          minlength=nu).astype(np.int64)
        # term-sorted WITHIN the group: each lexicon file then carries
        # tight per-row-group term min/max stats, so prepare_queries's
        # isin pushdown prunes inside every file — a global cross-group
        # sort (an extra all-to-all, ~1.2 s fixed on this box) buys
        # nothing more for point lookups
        import pyarrow.compute as _pc

        order = _pc.sort_indices(enc.dictionary)
        ordn = order.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"term": enc.dictionary.take(order).cast(pa.string()),
                         "df": pa.array(dfs[ordn]), "cf": pa.array(cfs[ordn])},
                        schema=_LEX_SCHEMA)

    return (
        stats_ds.map_batches(add_gk, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(agg, batch_format="pyarrow")
    )


def build_index(
    corpus_paths: str | list[str],
    index_dir: str,
    *,
    text_col: str = "content",
    id_col: str | None = None,
    rows_per_segment: int = 50_000,
    block_size: int = BLOCK_SIZE,
    extra_doc_cols: tuple[str, ...] = (),
    lang_col: str | None = None,
    analyzer: str | None = None,
    concurrency: int | None = None,
) -> dict:
    """Build (or resume) the full index. Returns the global manifest dict.

    ``id_col=None`` assigns dense doc ids from the deterministic global row
    position; passing an existing id column preserves external ids.
    ``lang_col`` analyzes each doc with its language's registered token
    class (``analysis.ANALYZERS``) — the per-collection tokenizer-config
    analog; a lang_col change invalidates segment skip-matching.
    ``analyzer`` (a registered name, e.g. "en_light") applies ONE analyzer
    — token filters included — to every doc; recorded in the manifest so
    ``search`` analyzes query text the same way by default.
    """
    if lang_col and analyzer:
        raise ValueError("pass lang_col or analyzer, not both")
    if isinstance(corpus_paths, str):
        p = corpus_paths
        corpus_paths = (
            sorted(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
            )
            if os.path.isdir(p)
            else [p]
        )
    os.makedirs(os.path.join(index_dir, "segments"), exist_ok=True)
    specs = plan_segments(corpus_paths, rows_per_segment)
    t0 = time.monotonic()
    build_run = uuid.uuid4().hex

    # ONE streaming pipeline: segment build/skip tasks emit their
    # pre-aggregated (term, df, cf) partials straight into the lexicon
    # groupby — no barrier between the stages and no second read of the
    # postings. Shuffle width scales with segment count (a fixed
    # default-200 partition count is pure overhead on small builds and a
    # bottleneck on huge ones).
    stats_ds = rd.from_items(specs, override_num_blocks=len(specs)).map_batches(
        build_segments_batch,
        batch_format="pyarrow",
        batch_size=1,  # one segment per task -> retries and skips are per segment
        fn_kwargs=dict(
            index_dir=index_dir,
            text_col=text_col,
            id_col=id_col,
            block_size=block_size,
            extra_doc_cols=extra_doc_cols,
            lang_col=lang_col,
            analyzer=analyzer,
            build_run=build_run,
            emit_term_stats=True,
        ),
        concurrency=concurrency,
    )
    lex = _merge_lexicon(stats_ds, n_segments=len(specs))
    tmp_lex = os.path.join(index_dir, f".tmp-lexicon-{uuid.uuid4().hex[:8]}")
    lex.write_parquet(tmp_lex)  # consumes the pipeline (segments + lexicon)
    lex_dir = os.path.join(index_dir, "lexicon")
    if os.path.exists(lex_dir):
        shutil.rmtree(lex_dir)
    os.rename(tmp_lex, lex_dir)
    _write_lexicon_meta(index_dir, [s["seg_id"] for s in specs])

    # Collect per-segment manifests in the deterministic global segment
    # order. The result is manifest-sized either way (it becomes the global
    # manifest the driver holds); what must not be sequential at 1e5-1e6
    # segments is the file-open loop — above a threshold the reads fan out
    # as Ray tasks (ROADMAP #2).
    import pandas as pd

    def _read_manifest(seg_id: int) -> dict:
        with open(os.path.join(_seg_dir(index_dir, seg_id), "manifest.json")) as fh:
            m = json.load(fh)
        m.setdefault("build_run", None)
        return m

    if len(specs) <= 1000:
        rows = [_read_manifest(s["seg_id"]) for s in specs]
    else:
        def _read_batch(batch: pa.Table) -> pa.Table:
            ms = [_read_manifest(int(i)) for i in batch["seg_id"].to_pylist()]
            return pa.table({"manifest_json": pa.array([json.dumps(m) for m in ms])})

        blocks = max(1, len(specs) // 64)
        rows = [
            json.loads(r["manifest_json"])
            for r in rd.from_items(
                [{"seg_id": s["seg_id"]} for s in specs], override_num_blocks=blocks
            )
            .map_batches(_read_batch, batch_format="pyarrow")
            .take_all()
        ]
    manifests = pd.DataFrame(rows).sort_values("seg_id").reset_index(drop=True)
    manifests["skipped"] = manifests["build_run"] != build_run

    n_docs = int(manifests["n_docs"].sum())
    sum_dl = int(manifests["sum_doc_len"].sum())
    global_manifest = {
        "schema_version": SCHEMA_VERSION,
        "block_size": block_size,
        "text_col": text_col,
        "lang_col": lang_col,
        "analyzer": analyzer,
        "analyzer_hash": analyzer_config_hash(lang_col, analyzer),
        "id_col": id_col,
        "extra_doc_cols": list(extra_doc_cols),
        "n_docs": n_docs,
        "n_postings": int(manifests["n_postings"].sum()),
        "sum_doc_len": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 1.0,
        "n_segments": len(specs),
        "segments": [int(s) for s in manifests["seg_id"]],
        "n_segments_skipped": int(manifests["skipped"].sum()),
        "build_secs": time.monotonic() - t0,
        "docs_per_sec": n_docs / max(time.monotonic() - t0, 1e-9),
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as fh:
        json.dump(global_manifest, fh, indent=1)
    return global_manifest


def load_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "manifest.json")) as fh:
        return json.load(fh)


def _lexicon_meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "lexicon_meta.json")


def _write_lexicon_meta(index_dir: str, segments) -> None:
    """Record which segments the lexicon on disk was aggregated from — the
    idempotence guard for incremental appends (a crashed append that already
    merged the lexicon must not merge the same stats twice on re-run)."""
    tmp = _lexicon_meta_path(index_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"segments": sorted(int(s) for s in segments)}, fh)
    os.replace(tmp, _lexicon_meta_path(index_dir))


def _read_lexicon_meta(index_dir: str) -> list[int] | None:
    p = _lexicon_meta_path(index_dir)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return [int(s) for s in json.load(fh)["segments"]]


def _max_doc_id(index_dir: str) -> int:
    """Largest doc id on disk (-1 when empty), from Parquet footer
    statistics only — no data pages read; falls back to a column read for
    files written without stats."""
    mx = -1
    for s in segment_dirs(index_dir):
        path = os.path.join(s, "doclens.parquet")
        pf = pq.ParquetFile(path)
        idx = pf.schema_arrow.get_field_index("doc_id")
        seg_max = None
        for g in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                seg_max = None
                break
            seg_max = max(seg_max or -1, int(st.max))
        if seg_max is None:
            arr = pq.read_table(path, columns=["doc_id"])["doc_id"]
            seg_max = int(pa.compute.max(arr).as_py()) if len(arr) else -1
        mx = max(mx, seg_max)
    return mx


def append_index(
    index_dir: str,
    corpus_paths: str | list[str],
    *,
    rows_per_segment: int = 50_000,
    extra_doc_cols: tuple[str, ...] | None = None,
    concurrency: int | None = None,
) -> dict:
    """Append new documents to an existing index as NEW segments — the
    Lucene ``addDocuments`` / incremental-indexing surface (the reference
    can only rebuild from scratch, ``splade/index.py:14-35``).

    Build config (text_col, id_col, analyzer, block_size, extra doc cols)
    comes from the index's own manifest, so appended segments are
    byte-compatible with the originals. Dense builds (``id_col=None``)
    continue doc ids after the largest id on disk (footer statistics only);
    external-id builds take ids from the id column — uniqueness vs the
    existing corpus is the caller's contract, as with app-assigned Lucene
    ids.

    The lexicon is merged INCREMENTALLY: only the new segments' (term, df,
    cf) partials stream into a groupby union with the existing lexicon —
    O(new data + vocab), never a re-read of old segments. A
    ``lexicon_meta.json`` guard records the segment set each lexicon
    aggregated, so a crashed append re-runs to the identical state (skip-
    valid segments rebuild for free, an already-merged lexicon is not
    merged twice); an unrecognized meta (e.g. legacy index mid-maintenance)
    falls back to a full rebuild from every segment.

    Global stats (n_docs, avgdl) are restated, so all derived layers are
    marked pending (quantized impacts bake the stats in; positions/trigram
    builders resume per segment and only the new segments pay I/O on
    ``maintain --rederive``). Tombstones are untouched.
    """
    man = load_manifest(index_dir)
    text_col, id_col = man["text_col"], man["id_col"]
    lang_col, analyzer = man.get("lang_col"), man.get("analyzer")
    built_hash = man.get("analyzer_hash")
    if built_hash is not None:
        now_hash = analyzer_config_hash(lang_col, analyzer)
        if now_hash != built_hash:
            raise ValueError(
                "analyzer configuration changed since this index was built "
                f"(manifest hash {built_hash}, current {now_hash}): appending "
                "would mix token classes between old and new segments. "
                "Rebuild the index, or restore the original analyzer registry."
            )
    block_size = man["block_size"]
    if extra_doc_cols is None:
        extra_doc_cols = tuple(man.get("extra_doc_cols") or ())
    if isinstance(corpus_paths, str):
        p = corpus_paths
        corpus_paths = (
            sorted(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
            )
            if os.path.isdir(p)
            else [p]
        )
    old_segs = [int(s) for s in man["segments"]]
    seg_base = (max(old_segs) + 1) if old_segs else 0
    doc_base = (_max_doc_id(index_dir) + 1) if id_col is None else 0

    t0 = time.monotonic()
    specs = plan_segments(corpus_paths, rows_per_segment)

    # source slices already in the index (by exact lineage triple) are
    # skipped, so re-running a COMPLETED append is a no-op rather than a
    # duplicate add — the retry contract a driver-managed pipeline needs
    existing_slices = set()
    for sid in old_segs:
        with open(os.path.join(_seg_dir(index_dir, sid), "manifest.json")) as fh:
            m = json.load(fh)
        for src in m.get("sources") or [
            {k: m[k] for k in ("path", "row_start", "num_rows")}
        ]:
            existing_slices.add(
                (src["path"], int(src["row_start"]), int(src["num_rows"]))
            )
    specs = [
        sp for sp in specs
        if (sp["path"], sp["row_start"], sp["num_rows"]) not in existing_slices
    ]
    running = doc_base
    for i, sp in enumerate(specs):
        sp["seg_id"] = seg_base + i
        if id_col is None:
            sp["doc_id_start"] = running
        running += sp["num_rows"]
    if not specs:
        return {**man, "n_segments_skipped": 0, "n_new_segments": 0}
    build_run = uuid.uuid4().hex

    stats_ds = rd.from_items(specs, override_num_blocks=len(specs)).map_batches(
        build_segments_batch,
        batch_format="pyarrow",
        batch_size=1,
        fn_kwargs=dict(
            index_dir=index_dir,
            text_col=text_col,
            id_col=id_col,
            block_size=block_size,
            extra_doc_cols=extra_doc_cols,
            lang_col=lang_col,
            analyzer=analyzer,
            build_run=build_run,
            emit_term_stats=True,
        ),
        concurrency=concurrency,
    ).select_columns(["term", "df", "cf"])

    new_ids = [sp["seg_id"] for sp in specs]
    target = sorted(old_segs + new_ids)
    meta = _read_lexicon_meta(index_dir)
    lex_dir = os.path.join(index_dir, "lexicon")
    if meta == target:
        # crash recovery: lexicon already covers the appended segments;
        # drive the pipeline anyway so missing segment dirs (a crash mid-
        # build) are completed — valid ones skip
        stats_ds.count()
    else:
        if meta is None or meta == sorted(old_segs):
            # every completed index state has lexicon == manifest segments,
            # so the incremental merge is sound; meta==None is a legacy
            # index in a completed state
            from splade_ray.io import read_parquet_clean

            # metadata-stripped read: a raw read_parquet block whose schema
            # carries parquet metadata unions against the stats blocks as a
            # "different schema" (the round-2 V10 warning class; this was
            # the one remaining emitter, round-3 VERDICT item 4)
            merged = stats_ds.union(
                read_parquet_clean(
                    lex_dir, columns=["term", "df", "cf"]
                )
            )
        else:
            # unknown coverage (interrupted maintenance op): full rebuild
            def project(batch: pa.Table) -> pa.Table:
                out = [
                    pq.read_table(
                        os.path.join(s, "postings.parquet"),
                        columns=["term", "df", "cf"],
                    )
                    for s in batch["seg_dir"].to_pylist()
                ]
                return pa.concat_tables(out)

            stats_ds.count()  # ensure new segments exist before re-reading
            all_dirs = [_seg_dir(index_dir, s) for s in target]
            merged = rd.from_items(
                [{"seg_dir": s} for s in all_dirs],
                override_num_blocks=len(all_dirs),
            ).map_batches(project, batch_format="pyarrow", batch_size=1,
                          concurrency=concurrency)
        lex = _merge_lexicon(merged, n_segments=len(target))
        tmp_lex = os.path.join(index_dir, f".tmp-lexicon-{uuid.uuid4().hex[:8]}")
        lex.write_parquet(tmp_lex)
        if os.path.exists(lex_dir):
            shutil.rmtree(lex_dir)
        os.rename(tmp_lex, lex_dir)
        _write_lexicon_meta(index_dir, target)

    new_manifests = []
    for sp in specs:
        with open(os.path.join(_seg_dir(index_dir, sp["seg_id"]), "manifest.json")) as fh:
            m = json.load(fh)
        m.setdefault("build_run", None)
        new_manifests.append(m)
    n_new_docs = sum(m["n_docs"] for m in new_manifests)
    n_docs = man["n_docs"] + n_new_docs
    sum_dl = man["sum_doc_len"] + sum(m["sum_doc_len"] for m in new_manifests)

    # stats change invalidates derived layers BEFORE the manifest flips —
    # a crash between the two leaves pending layers over the old manifest,
    # which a rederive restores harmlessly
    from splade_ray.delete import _invalidate_layers

    _invalidate_layers(index_dir)

    global_manifest = {
        **man,
        "n_docs": n_docs,
        "n_postings": man["n_postings"] + sum(m["n_postings"] for m in new_manifests),
        "sum_doc_len": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 1.0,
        "n_segments": len(old_segs) + len(new_ids),
        "segments": old_segs + new_ids,
        "n_new_segments": len(new_ids),
        "n_segments_skipped": sum(
            1 for m in new_manifests if m["build_run"] != build_run
        ),
        "build_secs": time.monotonic() - t0,
        "docs_per_sec": n_new_docs / max(time.monotonic() - t0, 1e-9),
    }
    with open(os.path.join(index_dir, "manifest.json"), "w") as fh:
        json.dump(global_manifest, fh, indent=1)
    return global_manifest


def segment_dirs(index_dir: str) -> list[str]:
    m = load_manifest(index_dir)
    return [_seg_dir(index_dir, s) for s in m["segments"]]
