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

    Term run boundaries are found with one vectorized adjacent-compare; the
    only Python loop is one iteration per distinct term (posting encode)."""
    terms = flat["term"].combine_chunks() if isinstance(flat["term"], pa.ChunkedArray) else flat["term"]
    pos = flat["pos"].to_numpy(zero_copy_only=False).astype(np.int64)
    tfs = flat["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(pos)
    rows = {name: [] for name in POSTINGS_SCHEMA.names}
    if n:
        neq = pc.not_equal(terms.slice(1), terms.slice(0, n - 1))
        bounds = np.concatenate(
            ([0], np.flatnonzero(neq.to_numpy(zero_copy_only=False)) + 1, [n])
        )
        d_all, tf_col, dl_all = doc_ids[pos], tfs, doc_lens[pos]
        for i in range(bounds.size - 1):
            s, e = int(bounds[i]), int(bounds[i + 1])
            enc = encode_posting(d_all[s:e], tf_col[s:e], dl_all[s:e], block_size)
            rows["term"].append(terms[s].as_py())
            for k, v in enc.items():
                rows[k].append(v)
    return pa.table(rows, schema=POSTINGS_SCHEMA)
