"""Posting-segment encode/decode.

A *segment* is the per-partition inverted index: for one contiguous slice of
documents, a term-sorted table of delta+varbyte-compressed posting lists with
block-max metadata, plus a doc-length sidecar. It replaces the reference's
``IndexDictOfArray`` HDF5 layout (``splade/indexing/inverted_index.py:75-94``)
with columnar Parquet, and its block-max layer mirrors the PISA recipe the
reference uses for latency numbers (``efficient_splade_pisa/README.md:28-38``).

Posting rows: ``term:string`` (sorted), ``df:int64``, ``cf:int64``,
``docs_enc:binary`` (delta+varbyte over ascending doc ids — byte-identical to
a single unblocked stream), ``tfs_enc:binary`` (varbyte tf runs), and per
128-posting block: ``bm_first_doc``, ``bm_last_doc``, ``bm_tf_max``,
``bm_dl_min`` (ints; the float upper bound is evaluated at query time with
the global avgdl — this keeps the build single-pass), ``bm_doc_off`` /
``bm_tf_off`` (byte offsets, len = nblocks+1, for block-wise decode).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from splade_ray.codec import varbyte_decode, varbyte_encode

BLOCK_SIZE = 128

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("cf", pa.int64()),
        ("docs_enc", pa.binary()),
        ("tfs_enc", pa.binary()),
        ("bm_first_doc", pa.list_(pa.int64())),
        ("bm_last_doc", pa.list_(pa.int64())),
        ("bm_tf_max", pa.list_(pa.int64())),
        ("bm_dl_min", pa.list_(pa.int64())),
        ("bm_doc_off", pa.list_(pa.int64())),
        ("bm_tf_off", pa.list_(pa.int64())),
    ]
)


def encode_posting(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block_size: int = BLOCK_SIZE
) -> dict:
    """Encode one term's posting list (doc-id ascending)."""
    n = doc_ids.size
    docs_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    first, last, tf_max, dl_min = [], [], [], []
    doc_off, tf_off = [0], [0]
    prev_last = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        blk_docs = doc_ids[s:e]
        deltas = np.empty(e - s, np.int64)
        deltas[0] = blk_docs[0] - prev_last
        np.subtract(blk_docs[1:], blk_docs[:-1], out=deltas[1:])
        docs_parts.append(varbyte_encode(deltas))
        tf_parts.append(varbyte_encode(tfs[s:e]))
        first.append(int(blk_docs[0]))
        last.append(int(blk_docs[-1]))
        tf_max.append(int(tfs[s:e].max()))
        dl_min.append(int(dls[s:e].min()))
        doc_off.append(doc_off[-1] + len(docs_parts[-1]))
        tf_off.append(tf_off[-1] + len(tf_parts[-1]))
        prev_last = int(blk_docs[-1])
    return {
        "df": n,
        "cf": int(tfs.sum()),
        "docs_enc": b"".join(docs_parts),
        "tfs_enc": b"".join(tf_parts),
        "bm_first_doc": first,
        "bm_last_doc": last,
        "bm_tf_max": tf_max,
        "bm_dl_min": dl_min,
        "bm_doc_off": doc_off,
        "bm_tf_off": tf_off,
    }


def decode_posting(docs_enc: bytes, tfs_enc: bytes, df: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode a full posting list -> (doc_ids asc int64, tfs int64)."""
    doc_ids = np.cumsum(varbyte_decode(docs_enc, df).astype(np.int64))
    tfs = varbyte_decode(tfs_enc, df).astype(np.int64)
    return doc_ids, tfs


def decode_block(
    docs_enc: bytes, tfs_enc: bytes, bm_doc_off, bm_tf_off, bm_last_doc, block_i: int
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single posting block without touching the rest of the list."""
    prev_last = bm_last_doc[block_i - 1] if block_i > 0 else 0
    d = varbyte_decode(docs_enc[bm_doc_off[block_i] : bm_doc_off[block_i + 1]]).astype(np.int64)
    doc_ids = prev_last + np.cumsum(d)
    tfs = varbyte_decode(tfs_enc[bm_tf_off[block_i] : bm_tf_off[block_i + 1]]).astype(np.int64)
    return doc_ids, tfs


def encode_runs_bulk(
    docs: np.ndarray,
    vals: np.ndarray,
    starts: np.ndarray,
    block_size: int = BLOCK_SIZE,
    *,
    block_min_arrays: tuple[np.ndarray, ...] = (),
) -> dict:
    """Vectorized bulk encoder for MANY posting lists at once: ``docs``
    (ascending within each run), a parallel ``vals`` stream (tf or
    quantized impact), and the run ``starts``. One bulk varbyte encode for
    every run's doc deltas, one for every val, reduceat for the per-block
    maxima (of ``vals``) and minima (of each ``block_min_arrays`` entry),
    scatter arithmetic for the block offset lists. Byte-for-byte identical
    to per-run :func:`encode_posting` (parity-tested): a block's first
    delta ``blk_docs[0] - prev_last`` EQUALS the plain adjacent delta, so
    the stream is one unblocked delta+varbyte run and blocks are pure
    offset metadata.

    Returns a dict of arrays aligned to runs: ``df`` (np), ``docs_enc`` /
    ``vals_enc`` (pa.BinaryArray), ``bm_first_doc`` / ``bm_last_doc`` /
    ``bm_val_max`` / ``bm_doc_off`` / ``bm_val_off`` (pa list arrays),
    plus ``bm_min_0``... for each min array."""
    from splade_ray.codec import varbyte_encode_bulk

    n = docs.size
    n_runs = starts.size
    ends = np.concatenate((starts[1:], [n]))
    df = ends - starts
    run_of = np.repeat(np.arange(n_runs, dtype=np.int64), df)
    in_run = np.arange(n, dtype=np.int64) - starts[run_of]

    # delta stream: absolute first value per run, adjacent deltas after
    d = np.empty(n, np.int64)
    d[0] = docs[0]
    np.subtract(docs[1:], docs[:-1], out=d[1:])
    d[starts] = docs[starts]
    doc_buf, doc_nb = varbyte_encode_bulk(d)
    val_buf, val_nb = varbyte_encode_bulk(vals)
    doc_bs = np.cumsum(doc_nb) - doc_nb  # byte start of each posting
    val_bs = np.cumsum(val_nb) - val_nb
    doc_run_start = doc_bs[starts]
    val_run_start = val_bs[starts]
    doc_run_end = np.concatenate((doc_run_start[1:], [doc_buf.size]))
    val_run_end = np.concatenate((val_run_start[1:], [val_buf.size]))

    # block structure: positions where in_run % block_size == 0
    is_blk = (in_run % block_size) == 0
    blk_starts = np.flatnonzero(is_blk)
    blk_run = run_of[blk_starts]
    nblocks = np.bincount(blk_run, minlength=n_runs).astype(np.int64)
    blk_ends = np.concatenate((blk_starts[1:], [n]))
    same_run = np.empty(blk_starts.size, bool)
    same_run[:-1] = blk_run[1:] == blk_run[:-1]
    same_run[-1] = False
    blk_ends = np.where(same_run, blk_ends, ends[blk_run])

    def list_col(values: np.ndarray, counts: np.ndarray) -> pa.Array:
        offs = np.empty(counts.size + 1, np.int64)
        offs[0] = 0
        np.cumsum(counts, out=offs[1:])
        return pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pa.array(values, pa.int64()))

    # per-run offset lists (nblocks+1 entries: block starts + total bytes),
    # built by scatter: entry slot L[r]+k = block k's relative byte offset,
    # slot L[r]+nblocks[r] = the run's byte length
    def off_col(pos_bs: np.ndarray, run_start: np.ndarray,
                run_end: np.ndarray) -> pa.Array:
        counts = nblocks + 1
        L = np.cumsum(counts) - counts
        out = np.empty(int(counts.sum()), np.int64)
        blk_in_run = np.arange(blk_starts.size, dtype=np.int64) - np.cumsum(
            np.concatenate(([0], nblocks)))[blk_run]
        out[L[blk_run] + blk_in_run] = pos_bs[blk_starts] - run_start[blk_run]
        out[L + nblocks] = run_end - run_start
        return list_col(out, counts)

    def slice_bin(buf: np.ndarray, run_start: np.ndarray,
                  run_end: np.ndarray) -> pa.Array:
        offs = np.empty(n_runs + 1, np.int64)
        offs[:-1] = run_start
        offs[-1] = run_end[-1]
        # run byte ranges are contiguous in run order, so slices share one
        # buffer (offs monotone); binary() (int32 offsets) matches the
        # schema — per-segment postings stay far below 2 GiB
        return pa.BinaryArray.from_buffers(
            pa.binary(), n_runs,
            [None, pa.py_buffer(offs.astype(np.int32)),
             pa.py_buffer(np.ascontiguousarray(buf))])

    out = {
        "df": df,
        "docs_enc": slice_bin(doc_buf, doc_run_start, doc_run_end),
        "vals_enc": slice_bin(val_buf, val_run_start, val_run_end),
        "bm_first_doc": list_col(docs[blk_starts], nblocks),
        "bm_last_doc": list_col(docs[blk_ends - 1], nblocks),
        "bm_val_max": list_col(np.maximum.reduceat(vals, blk_starts), nblocks),
        "bm_doc_off": off_col(doc_bs, doc_run_start, doc_run_end),
        "bm_val_off": off_col(val_bs, val_run_start, val_run_end),
    }
    for i, arr in enumerate(block_min_arrays):
        out[f"bm_min_{i}"] = list_col(
            np.minimum.reduceat(arr, blk_starts), nblocks)
    return out


def build_segment_tables(
    flat: pa.Table,
    doc_ids: np.ndarray,
    doc_lens: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> pa.Table:
    """Turn a (term, pos, tf) flat table — sorted by (term asc, pos asc), pos
    indexing into doc-id-ascending ``doc_ids`` — into the term-sorted postings
    table. Posting lists are doc-id-sorted by construction, the same invariant
    the reference gets from its sequential doc counter
    (``transformer_evaluator.py:47-51``).

    Fully vectorized via :func:`encode_runs_bulk` — row-for-row identical
    to per-term :func:`encode_posting` (parity-tested). The previous
    one-Python-iteration-per-distinct-term loop was invisible at a 31-term
    vocabulary and dominated the build at a realistic one (50k distinct
    terms per segment on the round-5 Zipf bench)."""
    terms = flat["term"].combine_chunks() if isinstance(flat["term"], pa.ChunkedArray) else flat["term"]
    pos = flat["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    tfs = flat["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(pos)
    if not n:
        return POSTINGS_SCHEMA.empty_table()
    neq = pc.not_equal(terms.slice(1), terms.slice(0, n - 1))
    starts = np.concatenate(([0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1))
    enc = encode_runs_bulk(doc_ids[pos], tfs, starts, block_size,
                           block_min_arrays=(doc_lens[pos],))
    return pa.table(
        {
            "term": terms.take(pa.array(starts, pa.int64())),
            "df": pa.array(enc["df"], pa.int64()),
            "cf": pa.array(np.add.reduceat(tfs, starts), pa.int64()),
            "docs_enc": enc["docs_enc"],
            "tfs_enc": enc["vals_enc"],
            "bm_first_doc": enc["bm_first_doc"],
            "bm_last_doc": enc["bm_last_doc"],
            "bm_tf_max": enc["bm_val_max"],
            "bm_dl_min": enc["bm_min_0"],
            "bm_doc_off": enc["bm_doc_off"],
            "bm_tf_off": enc["bm_val_off"],
        },
        schema=POSTINGS_SCHEMA,
    )
