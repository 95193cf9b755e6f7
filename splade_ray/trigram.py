"""Trigram index layer + exact substring search (code-search style).

The reference retrieves by bag-of-words impact scoring
(``splade/tasks/transformer_evaluator.py:142-193``) and has no substring
capability; for a source-code corpus (the ``input_hint`` table) exact
substring/identifier search is the other query users run every day. This
layer implements the classic trigram-index design (Google Code Search /
``rg``-style candidate pruning): per segment, a posting list of ascending
doc ids for every distinct byte trigram of ``lower(content)``; a query for
needle ``q`` intersects the posting lists of the needle's trigrams
(rarest-first, early exit) to get a candidate set, then VERIFIES candidates
against the actual text — so results are exact regardless of trigram
collisions, and the oracle mirror is plain ``contains(lower(text), q)``.

Build is a DERIVED layer over a built index, exactly like the positional
layer (``splade_ray.positions``): one resumable Ray task per segment
re-reads that segment's corpus slice via its lineage manifest and writes
``trigrams.parquet`` beside the segment's postings, crash-safe via the same
pending-marker protocol.

Scale shape: posting lists are segment-local (doc ids within one segment),
so no posting ever crosses the object store; the query scatter is the same
segment grid as BM25 ``search``. Verification reads each candidate
segment's text slice ONLY when candidates survive the intersection — for
selective needles most segments are pruned by a missing trigram before any
text I/O. Occurrence counts use non-overlapping left-to-right semantics
(Arrow ``count_substring``), which equals DuckDB's
``(length(x)-length(replace(x,q,'')))/length(q)``.

Needles shorter than 3 bytes cannot be pruned by trigrams; they fall back
to a verification scan of every segment (documented, logged).
"""

from __future__ import annotations

import json
import logging
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from splade_ray.codec import varbyte_decode, varbyte_encode_bulk

logger = logging.getLogger(__name__)

TRIGRAM_SCHEMA = pa.schema(
    [
        ("tri", pa.int32()),  # b0<<16 | b1<<8 | b2 of the lowered UTF-8 bytes
        ("df", pa.int64()),
        ("docs_enc", pa.binary()),  # delta+varbyte ascending doc ids
    ]
)


def _string_bytes(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 byte buffer, per-row offsets) of a string array."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = texts.cast(pa.large_string())  # one offset dtype for both inputs
    n = len(texts)
    off = np.frombuffer(texts.buffers()[1], np.int64)[texts.offset : texts.offset + n + 1]
    data = texts.buffers()[2]
    buf = np.frombuffer(data, np.uint8) if data is not None else np.empty(0, np.uint8)
    return buf[off[0] : off[-1]], (off - off[0]).astype(np.int64)


def _lowered_bytes(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 byte buffer, per-row offsets) of ``utf8_lower(texts)``."""
    return _string_bytes(pc.utf8_lower(texts))


def _trigram_keys(buf: np.ndarray) -> np.ndarray:
    """int32 packed trigram at every byte position (positions 0..len-3)."""
    if buf.size < 3:
        return np.empty(0, np.int32)
    k = (
        (buf[:-2].astype(np.int32) << 16)
        | (buf[1:-1].astype(np.int32) << 8)
        | buf[2:].astype(np.int32)
    )
    return k


def doc_trigrams(texts: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (row_index, trigram) pairs over a text column, vectorized:
    one trigram scan over the flat lowered byte buffer, boundary-crossing
    positions masked out by per-row offsets, dedup via one packed
    ``np.unique``. Returns (rows, tris) sorted by (tri, row)."""
    buf, off = _lowered_bytes(texts)
    keys = _trigram_keys(buf)
    if keys.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int32)
    pos = np.arange(keys.size, dtype=np.int64)
    row = np.searchsorted(off, pos, side="right") - 1
    # keep positions whose full 3 bytes sit inside one row
    keep = pos + 3 <= off[row + 1]
    row, keys = row[keep], keys[keep]
    packed = (row.astype(np.int64) << 24) | keys.astype(np.int64)
    packed = np.unique(packed)
    rows = packed >> 24
    tris = (packed & 0xFFFFFF).astype(np.int32)
    order = np.lexsort((rows, tris))
    return rows[order], tris[order]


def build_trigram_table(
    texts: pa.Array | pa.ChunkedArray,
    doc_ids: np.ndarray,
    *,
    max_df: int | None = None,
) -> pa.Table:
    """Trigram postings for one segment's documents (doc_ids ascending).

    ``max_df`` caps the layer's size: a trigram appearing in more than
    ``max_df`` docs keeps its row (df intact) but stores EMPTY
    ``docs_enc`` — the query side treats such a row as "present in
    (effectively) every doc": it contributes no pruning but also never
    proves absence, so capped layers stay exact (verification is the
    source of truth either way). For code corpora ubiquitous trigrams
    (``def``, ``ing``, `` = ``) dominate posting bytes while pruning
    nothing."""
    rows, tris = doc_trigrams(texts)
    if rows.size == 0:
        return pa.table({k: [] for k in TRIGRAM_SCHEMA.names}, schema=TRIGRAM_SCHEMA)
    docs = doc_ids[rows]
    start = np.concatenate(([0], np.flatnonzero(tris[1:] != tris[:-1]) + 1))
    counts = np.diff(np.concatenate((start, [tris.size])))
    deltas = np.empty(docs.size, np.int64)
    deltas[0] = docs[0]
    np.subtract(docs[1:], docs[:-1], out=deltas[1:])
    deltas[start] = docs[start]
    # ONE bulk varbyte pass over all posting values (varbyte is per-value
    # independent, so per-trigram encodings are byte ranges of the single
    # buffer) instead of one encode call per trigram — the per-call numpy
    # overhead dominated the layer build (ROADMAP round-3 #8)
    capped = counts > max_df if max_df is not None else np.zeros(counts.size, bool)
    if capped.any():
        enc_vals = deltas[~np.repeat(capped, counts)]
    else:
        enc_vals = deltas
    buf, nbytes = varbyte_encode_bulk(enc_vals)
    bytes_cum = np.concatenate(([0], np.cumsum(nbytes)))
    kept_ends = np.cumsum(np.where(capped, 0, counts))
    offsets = np.concatenate(([0], bytes_cum[kept_ends])).astype(np.int32)
    docs_enc = pa.Array.from_buffers(
        pa.binary(),
        counts.size,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(buf.tobytes())],
    )
    out = {
        "tri": pa.array(tris[start], pa.int32()),
        "df": pa.array(counts, pa.int64()),
        "docs_enc": docs_enc,
    }
    return pa.table(out, schema=TRIGRAM_SCHEMA)


def _trigrams_for_segment(
    seg_dir: str,
    text_col: str,
    id_col: str | None,
    max_df_frac: float | None = None,
) -> int:
    from splade_ray.build import read_lineage_slices

    with open(os.path.join(seg_dir, "manifest.json")) as fh:
        m = json.load(fh)
    cols = [text_col] + ([id_col] if id_col else [])
    tbl = read_lineage_slices(m, cols)
    if id_col:
        doc_id_arr = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        doc_id_arr = m["doc_id_start"] + np.arange(len(tbl), dtype=np.int64)
    order = np.argsort(doc_id_arr, kind="stable")
    if not np.array_equal(order, np.arange(len(tbl))):
        tbl = tbl.take(pa.array(order))
        doc_id_arr = doc_id_arr[order]
    # membership source of truth is the segment's doclens (the corpus slice
    # still contains docs a purge physically removed)
    live = pq.read_table(
        os.path.join(seg_dir, "doclens.parquet"), columns=["doc_id"]
    )["doc_id"].to_numpy().astype(np.int64)
    if live.size != doc_id_arr.size:
        keep = np.flatnonzero(np.isin(doc_id_arr, live))
        tbl = tbl.take(pa.array(keep))
        doc_id_arr = doc_id_arr[keep]
    max_df = (
        max(1, int(max_df_frac * doc_id_arr.size)) if max_df_frac is not None else None
    )
    out = build_trigram_table(tbl[text_col], doc_id_arr, max_df=max_df)
    tmp = os.path.join(seg_dir, ".tmp-trigrams.parquet")
    pq.write_table(out, tmp)
    os.replace(tmp, os.path.join(seg_dir, "trigrams.parquet"))
    return out.num_rows


def build_trigrams(
    index_dir: str,
    *,
    max_df_frac: float | None = None,
    concurrency: int | None = None,
) -> dict:
    """Derive the trigram layer for every segment (one Ray task per segment;
    existing trigrams.parquet reused — resumable; pending-marker protocol as
    in the positional/quantized layers).

    ``max_df_frac``: drop posting bytes of trigrams present in more than
    this fraction of a segment's docs (see ``build_trigram_table``) —
    typically shrinks the layer several-fold on code corpora with zero
    recall loss. Changing the cap invalidates and rebuilds the layer."""
    from splade_ray.build import load_manifest, segment_dirs

    man = load_manifest(index_dir)
    text_col, id_col = man["text_col"], man.get("id_col")
    tpath = os.path.join(index_dir, "trigrams.json")
    prev = None
    if os.path.exists(tpath):
        with open(tpath) as fh:
            prev = json.load(fh)
    all_segs = segment_dirs(index_dir)
    if (
        prev is None
        or prev.get("text_col") != text_col
        or prev.get("max_df_frac") != max_df_frac
    ):
        for s in all_segs:
            p = os.path.join(s, "trigrams.parquet")
            if os.path.exists(p):
                os.remove(p)
    with open(tpath, "w") as fh:
        json.dump(
            {"text_col": text_col, "max_df_frac": max_df_frac, "pending": True}, fh
        )
    segs = [s for s in all_segs if not os.path.exists(os.path.join(s, "trigrams.parquet"))]

    def task(batch: pa.Table) -> pa.Table:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)
        counts = [
            _trigrams_for_segment(s, text_col, id_col, max_df_frac)
            for s in batch["seg"].to_pylist()
        ]
        return pa.table({"n_tris": pa.array(counts, pa.int64())})

    n_tris = 0
    if segs:
        n_tris = int(
            rd.from_items([{"seg": s} for s in segs], override_num_blocks=len(segs))
            .map_batches(task, batch_format="pyarrow", concurrency=concurrency)
            .sum("n_tris")
        )
    manifest = {
        "text_col": text_col,
        "max_df_frac": max_df_frac,
        "n_segments": len(all_segs),
        "n_segments_skipped": len(all_segs) - len(segs),
        "n_tris_built": n_tris,
    }
    with open(tpath, "w") as fh:
        json.dump(manifest, fh)
    return manifest


def load_trigrams_manifest(index_dir: str) -> dict:
    tpath = os.path.join(index_dir, "trigrams.json")
    if not os.path.exists(tpath):
        raise FileNotFoundError(
            "trigram layer not built — run splade_ray.trigram.build_trigrams(index_dir) first"
        )
    with open(tpath) as fh:
        man = json.load(fh)
    if man.get("pending"):
        raise ValueError(
            "trigram layer build is pending/crashed — re-run build_trigrams(index_dir)"
        )
    return man


# ------------------------------------------------------------------ querying


def needle_trigrams(needle: str) -> np.ndarray:
    """Distinct packed trigrams of the lowered needle (byte semantics match
    the build side: both go through utf8_lower → UTF-8 bytes)."""
    buf, off = _lowered_bytes(pa.array([needle], pa.string()))
    return np.unique(_trigram_keys(buf))


_NO_MATCH = np.empty(0, np.int64)  # proof: no doc in the segment can match


def _load_tri_rows(seg_dir: str, all_tris: np.ndarray) -> dict[int, tuple[int, bytes]]:
    """ONE filtered read of a segment's trigram postings covering the union
    of every query's trigrams — multi-query workloads pay one parquet read
    per segment, not one per (segment, query). Returns tri -> (df, enc)."""
    import pyarrow.dataset as pads

    src = pads.dataset(os.path.join(seg_dir, "trigrams.parquet"))
    tbl = src.to_table(filter=pads.field("tri").isin(pa.array(all_tris, pa.int32())))
    return {
        int(t): (int(d), e)
        for t, d, e in zip(
            tbl["tri"].to_pylist(), tbl["df"].to_pylist(), tbl["docs_enc"].to_pylist()
        )
    }


def _segment_candidates(
    rows: dict[int, tuple[int, bytes]], tris: np.ndarray
) -> np.ndarray | None:
    """Doc ids in this segment containing ALL the needle's trigrams, from a
    preloaded ``_load_tri_rows`` map. An EMPTY array means the layer PROVES
    no doc can match (some trigram absent, or the intersection is empty);
    ``None`` means the layer proves nothing (every required trigram row is
    df-capped: present but posting bytes dropped) and the caller must
    verify all live docs. Rarest-first intersection with early exit."""
    hits = [rows.get(int(t)) for t in tris]
    if any(h is None for h in hits):
        return _NO_MATCH  # some required trigram appears in no doc
    hits.sort(key=lambda h: h[0])
    cand: np.ndarray | None = None
    for df, enc in hits:
        if len(enc) == 0 and df > 0:
            continue  # df-capped row: present in "too many" docs to prune
        docs = np.cumsum(varbyte_decode(enc, df).astype(np.int64))
        cand = docs if cand is None else cand[np.isin(cand, docs, assume_unique=True)]
        if cand.size == 0:
            return _NO_MATCH
    return cand  # None = every row capped: no pruning information


# read the full slice when candidates cover more than this fraction of the
# segment (row-group takes would touch every group anyway)
_ROW_PRUNE_FRAC = 0.25


def _candidate_texts(
    seg_dir: str,
    m: dict,
    text_col: str,
    id_col: str | None,
    cand: np.ndarray | None,
    ids_cache: dict,
):
    """(doc_ids, text array) of the docs to verify in this segment.
    ``cand=None`` = every live doc (full-slice read). Selective candidate
    sets read ONLY the row groups containing candidate rows
    (build.read_lineage_rows), so verification I/O scales with the
    candidate count, not the segment size. ``ids_cache`` memoizes the
    per-segment id column across needles."""
    from splade_ray.build import read_lineage_rows, read_lineage_slices

    n_total = int(sum(s["num_rows"] for s in m.get("sources") or [m]))
    if cand is not None and cand.size <= _ROW_PRUNE_FRAC * n_total:
        if id_col:
            if seg_dir not in ids_cache:
                ids_cache[seg_dir] = (
                    read_lineage_slices(m, [id_col])[id_col]
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                )
            all_ids = ids_cache[seg_dir]
            rows = np.flatnonzero(np.isin(all_ids, cand))
            ids = all_ids[rows]
        else:
            rows = (cand - m["doc_id_start"]).astype(np.int64)
            rows = rows[(rows >= 0) & (rows < n_total)]
            ids = m["doc_id_start"] + rows
        if rows.size == 0:
            return ids[:0], pa.array([], pa.string())
        tbl = read_lineage_rows(m, [text_col], rows)
        return ids, tbl[text_col]

    cols = [text_col] + ([id_col] if id_col else [])
    tbl = read_lineage_slices(m, cols)
    if id_col:
        doc_id_arr = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        doc_id_arr = m["doc_id_start"] + np.arange(len(tbl), dtype=np.int64)
    if cand is None:
        # full verification scans every LIVE doc (the corpus slice may
        # still contain docs a purge removed)
        cand = pq.read_table(
            os.path.join(seg_dir, "doclens.parquet"), columns=["doc_id"]
        )["doc_id"].to_numpy().astype(np.int64)
    sel = np.flatnonzero(np.isin(doc_id_arr, cand))
    if sel.size != doc_id_arr.size:
        tbl = tbl.take(pa.array(sel))
        doc_id_arr = doc_id_arr[sel]
    return doc_id_arr, tbl[text_col]


def _verify_candidates(
    seg_dir: str,
    text_col: str,
    id_col: str | None,
    cand: np.ndarray | None,
    needle: str,
    ids_cache: dict,
    want_texts: bool = False,
    case_insensitive: bool = True,
) -> tuple[np.ndarray, np.ndarray, pa.Array | None]:
    """(doc_ids, non-overlapping occurrence counts, matched texts or None)
    of docs whose text actually contains the needle (both sides lowered in
    case-insensitive mode). ``cand=None`` means scan the whole segment
    (short-needle fallback)."""
    with open(os.path.join(seg_dir, "manifest.json")) as fh:
        m = json.load(fh)
    doc_id_arr, texts = _candidate_texts(seg_dir, m, text_col, id_col, cand, ids_cache)
    if case_insensitive:
        hay, ndl = pc.utf8_lower(texts), needle.lower()
    else:
        hay, ndl = texts, needle
    counts = pc.count_substring(hay, ndl).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts).astype(np.int64)
    keep = counts > 0
    kept_texts = None
    if want_texts:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        kept_texts = texts.take(pa.array(np.flatnonzero(keep)))
    return doc_id_arr[keep], counts[keep], kept_texts


# ---------------------------------------------------------------- snippets


def _char_pos_from_byte(texts: pa.Array, byte_off: np.ndarray) -> np.ndarray:
    """Per-row 0-based CHARACTER position of a per-row BYTE offset (Arrow's
    find_substring returns bytes; DuckDB's position() counts characters —
    this is the bridge that keeps the SQL mirror exact)."""
    buf, off = _string_bytes(texts)
    pref = np.concatenate(([0], np.cumsum((buf & 0xC0) != 0x80)))
    g = off[:-1] + byte_off
    return (pref[g] - pref[off[:-1]]).astype(np.int64)


def _char_windows(texts: pa.Array, pos_chars: np.ndarray, width: int, tail: int) -> pa.Array:
    """Snippet strings: characters ``[max(0, pos-width), pos+tail)`` of each
    text, sliced on codepoint boundaries from the flat byte buffer (one
    vectorized gather; no per-row Python). DuckDB mirror:
    ``substr(text, greatest(1, pos1 - width), pos1 + tail - greatest(1, pos1 - width))``
    with ``pos1`` the 1-based character position."""
    buf, off = _string_bytes(texts)
    cp = (buf & 0xC0) != 0x80
    pref = np.concatenate(([0], np.cumsum(cp)))
    base, end = pref[off[:-1]], pref[off[1:]]
    starts_c = base + np.maximum(pos_chars - width, 0)
    ends_c = np.minimum(base + pos_chars + tail, end)
    cp_idx = np.append(np.flatnonzero(cp).astype(np.int64), buf.size)
    b_s, b_e = cp_idx[starts_c], cp_idx[ends_c]
    lens = b_e - b_s
    total = int(lens.sum())
    if total:
        pos = np.arange(total, dtype=np.int64)
        grp_start = np.concatenate(([0], np.cumsum(lens)[:-1]))
        values = buf[pos + np.repeat(b_s - grp_start, lens)]
    else:
        values = np.empty(0, np.uint8)
    out_off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    return pa.Array.from_buffers(
        pa.string(),
        len(texts),
        [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(values.tobytes())],
    )


def _match_snippets(
    texts: pa.Array,
    needle: str | None,
    pattern: str | None,
    width: int,
    case_insensitive: bool = True,
) -> tuple[np.ndarray, pa.Array]:
    """(1-based char positions, snippet strings) of the FIRST match in each
    text (every text is a verified match). Case-insensitive mode finds the
    position in the LOWERED text (same rule as the count kernels and the
    DuckDB ``position(... in lower(text))`` mirror); case-sensitive mode
    searches the original. The window is always cut from the ORIGINAL
    text. Substring windows span ``len(needle)+width`` past the start;
    regex windows use a fixed ``width+16`` tail (the match length is not
    returned by the find kernel)."""
    hay = pc.utf8_lower(texts) if case_insensitive else texts
    if isinstance(hay, pa.ChunkedArray):
        hay = hay.combine_chunks()
    if needle is not None:
        n = needle.lower() if case_insensitive else needle
        bo = pc.find_substring(hay, n)
        tail = len(n) + width
    else:
        # ignore_case (in ci mode) so patterns with uppercase literals
        # still find their leftmost match in the lowered haystack
        bo = pc.find_substring_regex(hay, pattern, ignore_case=case_insensitive)
        tail = width + 16
    byte_off = bo.to_numpy(zero_copy_only=False).astype(np.int64)
    pos = _char_pos_from_byte(hay, byte_off)
    return pos + 1, _char_windows(texts, pos, width, tail)


def substring_search(
    index_dir: str,
    needles: list[tuple[int, str]],
    *,
    case_insensitive: bool = True,
    snippets: bool = False,
    width: int = 30,
    concurrency: int | None = None,
):
    """Exact substring search over the indexed corpus.

    Returns a pandas DataFrame ``(query_id, doc_id, n_occurrences)`` sorted
    by (query_id, doc_id) — EVERY matching doc, not top-k, since substring
    match is a filter, not a ranking. Segments partition the doc space, so
    per-segment results concatenate with no merge shuffle; the driver sees
    only match rows.

    ``case_insensitive=False`` matches exact case: the lowered trigram
    layer still prunes (``needle ⊂ text`` implies
    ``lower(needle) ⊂ lower(text)``, so lowered candidates are a sound
    superset) and verification counts against the original text.

    ``snippets=True`` adds ``pos`` (1-based char position of the first
    occurrence in the lowered text, = DuckDB ``position(n in lower(t))``;
    original text in case-sensitive mode) and ``snippet`` (chars
    ``[pos-width, pos+len(needle)+width)`` of the ORIGINAL text) —
    computed from the texts already in memory for verification, zero
    extra I/O."""
    import pandas as pd

    from splade_ray.build import load_manifest, segment_dirs

    from splade_ray.delete import load_tombstones

    load_trigrams_manifest(index_dir)
    man = load_manifest(index_dir)
    text_col, id_col = man["text_col"], man.get("id_col")
    _t = load_tombstones(index_dir)
    tomb = _t if _t.size else None
    prepared: list[tuple[int, str, np.ndarray]] = []
    for qid, needle in needles:
        tris = needle_trigrams(needle)
        if tris.size == 0:
            logger.warning(
                "needle %r shorter than 3 bytes: trigram pruning impossible, "
                "falling back to full verification scan",
                needle,
            )
        prepared.append((qid, needle, tris))

    all_tris = np.unique(np.concatenate([t for _, _, t in prepared] or [np.empty(0, np.int32)]))

    def task(batch: pa.Table) -> pa.Table:
        qids, docs_out, cnts_out = [], [], []
        pos_out, snip_out = [], []
        ids_cache: dict = {}
        for seg_dir in batch["seg_dir"].to_pylist():
            tri_rows = _load_tri_rows(seg_dir, all_tris) if all_tris.size else {}
            for qid, needle, tris in prepared:
                if tris.size > 0:
                    cand = _segment_candidates(tri_rows, tris)
                    if cand is not None and cand.size == 0:
                        continue  # layer proves no match in this segment
                    # cand=None: all trigrams df-capped — verify all live docs
                else:
                    cand = None
                docs, cnts, texts = _verify_candidates(
                    seg_dir, text_col, id_col, cand, needle, ids_cache,
                    want_texts=snippets, case_insensitive=case_insensitive,
                )
                if tomb is not None and docs.size:
                    # logical deletes: substring match is a filter (complete
                    # result set), so post-filtering is exact
                    keep = ~np.isin(docs, tomb)
                    docs, cnts = docs[keep], cnts[keep]
                    if snippets:
                        texts = texts.take(pa.array(np.flatnonzero(keep)))
                if snippets and docs.size:
                    p, s = _match_snippets(
                        texts, needle, None, width, case_insensitive
                    )
                    pos_out.append(p)
                    snip_out.append(s)
                qids.extend([qid] * docs.size)
                docs_out.append(docs)
                cnts_out.append(cnts)
        cols = {
            "query_id": pa.array(np.asarray(qids, np.int64)),
            "doc_id": pa.array(
                np.concatenate(docs_out) if docs_out else np.empty(0, np.int64)
            ),
            "n_occurrences": pa.array(
                np.concatenate(cnts_out) if cnts_out else np.empty(0, np.int64)
            ),
        }
        if snippets:
            cols["pos"] = pa.array(
                np.concatenate(pos_out) if pos_out else np.empty(0, np.int64)
            )
            cols["snippet"] = (
                pa.concat_arrays(snip_out) if snip_out else pa.array([], pa.string())
            )
        return pa.table(cols)

    segs = segment_dirs(index_dir)
    out = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", concurrency=concurrency)
        .to_pandas()
    )
    if out.empty:
        cols = {
            "query_id": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "n_occurrences": pd.Series([], dtype=np.int64),
        }
        if snippets:
            cols["pos"] = pd.Series([], dtype=np.int64)
            cols["snippet"] = pd.Series([], dtype=str)
        out = pd.DataFrame(cols)
    return out.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


# ------------------------------------------------ regex -> trigram pruning

try:  # Python 3.11+: the sre parser moved under re._parser
    from re import _parser as _sre
except ImportError:  # pragma: no cover
    import sre_parse as _sre


# bounds for the literal-run alternative set: a char class with at most
# _MAX_CLASS_CHARS literal chars multiplies the run's alternatives; the run
# flushes when the product would exceed _MAX_RUN_ALTS (the flushed prefix is
# still a sound requirement)
_MAX_CLASS_CHARS = 4
_MAX_RUN_ALTS = 16


def _literal_body(sub) -> str | None:
    """The literal string a repeat body always matches, or None when the
    body is not purely literal (groups unwrap: ``(abc){2}``)."""
    if all(str(o) == "LITERAL" for o, _ in sub):
        return "".join(chr(a) for _, a in sub)
    if len(sub) == 1 and str(sub[0][0]) == "SUBPATTERN":
        return _literal_body(sub[0][1][3])
    return None


def _seq_literals(seq) -> list[set[str]]:
    """Conservative required-literal analysis of one sre node sequence
    (the Cox code-search trick, simplified to AND-of-OR form): returns
    groups where every match of the sequence must contain AT LEAST ONE
    literal from EACH group. The contiguous literal run is a bounded SET
    of alternatives, so small character classes stay analyzable
    (``[Tt]oken`` requires "token" after lowering; ``[ab]cde`` requires
    "acde"-or-"bcde"). Sound but not complete — unanalyzable constructs
    just contribute nothing (never a wrong prune)."""
    groups: list[set[str]] = []
    run: list[str] = [""]

    def flush():
        nonlocal run
        if run != [""]:
            alts = {s.lower() for s in run}
            # a match uses exactly ONE alternative, so the group is usable
            # only if EVERY alternative is trigram-prunable
            if all(len(s.encode("utf-8")) >= 3 for s in alts):
                groups.append(alts)
        run = [""]

    for op, av in seq:
        name = str(op)
        if name == "LITERAL":
            run = [r + chr(av) for r in run]
            continue
        if name == "IN":
            chars = [chr(a) for o, a in av if str(o) == "LITERAL"]
            if len(chars) == len(av) and 0 < len(chars) <= _MAX_CLASS_CHARS:
                if len(run) * len(chars) > _MAX_RUN_ALTS:
                    flush()  # the prefix is still a sound requirement
                run = [r + c for r in run for c in chars]
                continue
            flush()  # NEGATE/RANGE/CATEGORY or too wide: breaks the run
            continue
        if name == "SUBPATTERN":
            flush()
            groups.extend(_seq_literals(av[3]))
            continue
        if name in ("MAX_REPEAT", "MIN_REPEAT", "POSSESSIVE_REPEAT"):
            mn, mx, sub = av
            body = _literal_body(sub)
            if mn >= 1 and body:
                # the repeat's first mn iterations are adjacent to the
                # preceding literal run, so run+body*mn is one required
                # substring ('zzz+' requires 'zzz', 'ab{3}c' requires
                # 'abbb', '(abc){2,}' requires 'abcabc'); for an EXACT
                # repeat ({n}) the following literal is adjacent too, so
                # the run continues ('ab{3}c' -> 'abbbc')
                reps = min(int(mn), max(1, 32 // len(body)))
                run = [r + body * reps for r in run]
                if not (mn == mx and reps == mn):
                    flush()
                continue
            flush()
            if mn >= 1:  # the body must occur at least once
                groups.extend(_seq_literals(sub))
            continue
        if name == "BRANCH":
            flush()
            # one representative required literal per alternative; the
            # whole group is usable only if EVERY alternative yields one
            reps: set[str] = set()
            ok = True
            for alt in av[1]:
                alt_groups = _seq_literals(alt)
                if not alt_groups:
                    ok = False
                    break
                reps.update(min(alt_groups, key=len))
            if ok:
                groups.append(reps)
            continue
        if name == "ATOMIC_GROUP":
            flush()
            groups.extend(_seq_literals(av))
            continue
        if name == "AT":  # anchors don't break a literal run's adjacency
            continue
        # ANY, NOT_LITERAL, ASSERT, GROUPREF, ... : breaks the run,
        # contributes no requirement
        flush()
    flush()
    return groups


def required_trigram_groups(pattern: str) -> list[list[np.ndarray]]:
    """AND-of-OR trigram condition for a regex: a matching doc must, for
    every group, contain ALL trigrams of at least one of the group's
    literals. Empty list = no pruning possible (full scan). Raises
    ``re.error`` on an invalid pattern (same as the verifier would)."""
    groups = _seq_literals(_sre.parse(pattern))
    out: list[list[np.ndarray]] = []
    for g in groups:
        tri_alts = [needle_trigrams(lit) for lit in sorted(g)]
        if any(t.size == 0 for t in tri_alts):
            continue  # an alternative too short to prune voids the group
        out.append(tri_alts)
    return out


def _regex_candidates(
    tri_rows: dict[int, tuple[int, bytes]], groups: list[list[np.ndarray]]
) -> np.ndarray | None:
    """Docs in this segment satisfying the AND-of-OR trigram condition.
    Same contract as ``_segment_candidates``: EMPTY array = the layer
    proves no doc can match; ``None`` = no pruning information (every
    group was voided by a df-capped alternative)."""
    cand: np.ndarray | None = None
    for alts in groups:
        docs = np.empty(0, np.int64)
        capped = False
        for tris in alts:
            d = _segment_candidates(tri_rows, tris)
            if d is None:
                # this alternative can't prune, so the whole OR group can't
                capped = True
                break
            if d.size:
                docs = np.union1d(docs, d)
        if capped:
            continue
        cand = docs if cand is None else cand[np.isin(cand, docs, assume_unique=True)]
        if cand.size == 0:
            return cand  # proven: no alternative of a required group matches
    return cand  # None = every group capped: no pruning information


def regex_search(
    index_dir: str,
    patterns: list[tuple[int, str]],
    *,
    case_insensitive: bool = True,
    snippets: bool = False,
    width: int = 30,
    concurrency: int | None = None,
):
    """Exact regex search accelerated by the trigram layer: candidate docs
    from the pattern's required-literal trigram condition, verified with
    the RE2 kernel (leftmost non-overlapping occurrence counts). Patterns
    with no extractable literals fall back to a full verification scan of
    live docs (logged). Returns (query_id, doc_id, n_occurrences) sorted.

    ``snippets=True`` adds ``pos`` (1-based char position of the leftmost
    match in the lowered text) and ``snippet`` (chars
    ``[pos-width, pos+width+16)`` of the ORIGINAL text — the find kernel
    does not return the match length, so the tail is fixed)."""
    import pandas as pd

    from splade_ray.build import load_manifest, segment_dirs
    from splade_ray.delete import load_tombstones

    load_trigrams_manifest(index_dir)
    man = load_manifest(index_dir)
    text_col, id_col = man["text_col"], man.get("id_col")
    _t = load_tombstones(index_dir)
    tomb = _t if _t.size else None
    prepared = []
    for qid, pat in patterns:
        groups = required_trigram_groups(pat)
        if not groups:
            logger.warning(
                "regex %r has no extractable required literals >=3 bytes: "
                "falling back to full verification scan",
                pat,
            )
        prepared.append((qid, pat, groups))

    all_tris = np.unique(
        np.concatenate(
            [t for _, _, gs in prepared for alts in gs for t in alts]
            or [np.empty(0, np.int32)]
        )
    )

    def task(batch: pa.Table) -> pa.Table:
        qids, docs_out, cnts_out = [], [], []
        pos_out, snip_out = [], []
        ids_cache: dict = {}
        for seg_dir in batch["seg_dir"].to_pylist():
            with open(os.path.join(seg_dir, "manifest.json")) as fh:
                m = json.load(fh)
            tri_rows = _load_tri_rows(seg_dir, all_tris) if all_tris.size else {}
            for qid, pat, groups in prepared:
                if groups:
                    cand = _regex_candidates(tri_rows, groups)
                    if cand is not None and cand.size == 0:
                        continue  # layer proves no match in this segment
                    # cand=None: capped rows voided every group — verify all
                else:
                    cand = None
                ids, texts = _candidate_texts(
                    seg_dir, m, text_col, id_col, cand, ids_cache
                )
                c = pc.count_substring_regex(
                    texts, pat, ignore_case=case_insensitive
                ).to_numpy(zero_copy_only=False)
                c = np.nan_to_num(c).astype(np.int64)
                keep = c > 0
                docs, cnts = ids[keep], c[keep]
                if tomb is not None and docs.size:
                    live = ~np.isin(docs, tomb)
                    docs, cnts = docs[live], cnts[live]
                    keep[np.flatnonzero(keep)[~live]] = False
                if snippets and docs.size:
                    if isinstance(texts, pa.ChunkedArray):
                        texts = texts.combine_chunks()
                    kept_texts = texts.take(pa.array(np.flatnonzero(keep)))
                    p, s = _match_snippets(
                        kept_texts, None, pat, width, case_insensitive
                    )
                    pos_out.append(p)
                    snip_out.append(s)
                qids.extend([qid] * docs.size)
                docs_out.append(docs)
                cnts_out.append(cnts)
        cols = {
            "query_id": pa.array(np.asarray(qids, np.int64)),
            "doc_id": pa.array(
                np.concatenate(docs_out) if docs_out else np.empty(0, np.int64)
            ),
            "n_occurrences": pa.array(
                np.concatenate(cnts_out) if cnts_out else np.empty(0, np.int64)
            ),
        }
        if snippets:
            cols["pos"] = pa.array(
                np.concatenate(pos_out) if pos_out else np.empty(0, np.int64)
            )
            cols["snippet"] = (
                pa.concat_arrays(snip_out) if snip_out else pa.array([], pa.string())
            )
        return pa.table(cols)

    segs = segment_dirs(index_dir)
    out = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", concurrency=concurrency)
        .to_pandas()
    )
    if out.empty:
        cols = {
            "query_id": pd.Series([], dtype=np.int64),
            "doc_id": pd.Series([], dtype=np.int64),
            "n_occurrences": pd.Series([], dtype=np.int64),
        }
        if snippets:
            cols["pos"] = pd.Series([], dtype=np.int64)
            cols["snippet"] = pd.Series([], dtype=str)
        out = pd.DataFrame(cols)
    return out.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def grep_scan(
    ds,
    patterns: list[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    regex: bool = False,
    case_insensitive: bool = True,
):
    """Baseline full-scan substring/regex search over a Dataset — the
    no-index path (and the only path for regex). One stateless map_batches;
    Arrow ``match_substring(_regex)`` kernels, match rows only leave each
    task."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        id_type = ids.type
        text = batch[text_col]
        qids, id_out, cnt_out = [], [], []
        for qid, pat in patterns:
            if regex:
                c = pc.count_substring_regex(
                    text, pat, ignore_case=case_insensitive
                ).to_numpy(zero_copy_only=False)
                c = np.nan_to_num(c).astype(np.int64)
                keep = np.flatnonzero(c > 0)
                cnts = c[keep]
            else:
                hay = pc.utf8_lower(text) if case_insensitive else text
                ndl = pat.lower() if case_insensitive else pat
                c = pc.count_substring(hay, ndl).to_numpy(zero_copy_only=False)
                c = np.nan_to_num(c).astype(np.int64)
                keep = np.flatnonzero(c > 0)
                cnts = c[keep]
            qids.extend([qid] * keep.size)
            id_out.append(ids.take(pa.array(keep)))
            cnt_out.append(cnts)
        return pa.table(
            {
                "query_id": pa.array(np.asarray(qids, np.int64)),
                id_col: (
                    pa.concat_arrays(id_out)
                    if id_out
                    else pa.array([], id_type)
                ),
                "n_occurrences": pa.array(
                    np.concatenate(cnt_out) if cnt_out else np.empty(0, np.int64)
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")
