"""Posting-list codecs: delta + varbyte compression, impact quantization.

The reference stores posting lists as raw parallel ``int32``/``float32``
arrays (``splade/indexing/inverted_index.py:35-38,77-79``). The north rule
requires delta-encoded, varbyte-compressed doc-id lists with quantized
impacts; the reference's own "serious" index (PISA ``block_simdbp`` +
block-max windows, ``efficient_splade_pisa/README.md:28-38``) is the
semantics model. Everything here is vectorized numpy — no per-int Python
loops (the loops below are per *byte-significance level*, max ~10
iterations, independent of list length).
"""

from __future__ import annotations

import numpy as np

U7 = np.uint64(7)
U0x7F = np.uint64(0x7F)


def varbyte_encode_bulk(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Encode a non-negative int array as LEB128-style varbytes, returning
    (uint8 byte array, per-value byte counts). Encoding is per-value
    independent, so the byte array of a concatenation equals the
    concatenation of byte arrays — callers can encode MANY lists in one
    call and slice per-list ranges out of the single buffer."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if a.size == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    nbytes = np.ones(a.size, np.int64)
    v = a >> U7
    while v.any():
        nbytes += v > 0
        v >>= U7
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(int(ends[-1]), np.uint8)
    vals = a.copy()
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        idx = starts[mask] + k
        byte = (vals[mask] & U0x7F).astype(np.uint8)
        cont = (nbytes[mask] - 1 > k).astype(np.uint8)
        out[idx] = byte | (cont << 7)
        vals[mask] >>= U7
    return out, nbytes


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a non-negative int array as LEB128-style varbytes (7 data bits
    per byte, high bit = continuation)."""
    return varbyte_encode_bulk(values)[0].tobytes()


def varbyte_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode varbytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else buf
    if b.size == 0:
        return np.empty(0, np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    n = ends.size
    starts = np.empty(n, np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    group = np.repeat(np.arange(n, dtype=np.int64), lengths)
    k = np.arange(b.size, dtype=np.int64) - starts[group]
    contrib = (b.astype(np.uint64) & U0x7F) << (k.astype(np.uint64) * U7)
    vals = np.zeros(n, np.uint64)
    np.bitwise_or.at(vals, group, contrib)
    if count is not None and n != count:
        raise ValueError(f"varbyte_decode: expected {count} values, got {n}")
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing int array -> first value + successive deltas."""
    a = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if a.size == 0:
        return a.astype(np.uint64)
    d = np.empty(a.size, np.int64)
    d[0] = a[0]
    np.subtract(a[1:], a[:-1], out=d[1:])
    if a.size > 1 and d[1:].min() <= 0:
        raise ValueError("delta_encode requires strictly increasing input")
    return d.astype(np.uint64)


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.int64))


def encode_doc_ids(sorted_doc_ids: np.ndarray) -> bytes:
    return varbyte_encode(delta_encode(sorted_doc_ids))


def decode_doc_ids(buf: bytes, count: int | None = None) -> np.ndarray:
    return delta_decode(varbyte_decode(buf, count))


def quantize_impacts(values: np.ndarray, factor: int = 100) -> np.ndarray:
    """Impact quantization à la the reference's Anserini export:
    ``np.rint(value * quantization_factor)`` (transformer_evaluator.py:228-235,
    factor 100 per README.md:177-183). We use floor(x*f + 0.5) so Python,
    numpy and SQL agree on halfway cases (rint is round-half-even)."""
    return np.floor(np.asarray(values, np.float64) * factor + 0.5).astype(np.int64)


def rewrite_first_delta(docs_enc: bytes, first_abs: int, prev_last: int) -> bytes:
    """Rewrite the leading varbyte value of a delta-encoded doc-id list so two
    independently-encoded runs concatenate into one valid stream.

    Sub-lists built per (term, salt) partition store their first doc id as an
    absolute value; when concatenating doc-id-range-disjoint sub-lists in salt
    order, the first value of every run after the first becomes
    ``first_abs - prev_last``. Only one varbyte value is re-encoded — the rest
    of the buffer is copied verbatim (order-preserving merge, SURVEY.md §4)."""
    b = np.frombuffer(docs_enc, np.uint8)
    if b.size == 0:
        return docs_enc
    end = int(np.flatnonzero((b & 0x80) == 0)[0])
    new_first = varbyte_encode(np.array([first_abs - prev_last], np.int64))
    return new_first + b[end + 1 :].tobytes()


def sha256_hex(values) -> list[str]:
    """Per-row sha256 hexdigest of a string column (None -> empty string) —
    the north-rule content invariant. One shared helper: there is no Arrow
    sha256 kernel, so the per-row hashlib loop is inherent; keeping a single
    copy avoids the three divergent implementations flagged in round 2."""
    import hashlib

    return [
        hashlib.sha256((x or "").encode("utf-8")).hexdigest()
        for x in (values.to_pylist() if hasattr(values, "to_pylist") else values)
    ]


def concat_binary_column(col) -> np.ndarray:
    """Concatenated uint8 stream of a binary column's values — zero-copy:
    values of an Arrow binary array are stored back-to-back in offset
    order, so the concatenation is one slice of the value buffer. Used by
    the bulk posting decoders (quantized layer, exports) to decode a whole
    segment's lists in one varbyte pass instead of per-term."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint8)
    otype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], otype)[col.offset:col.offset + n + 1]
    data = np.frombuffer(col.buffers()[2], np.uint8)
    return data[offs[0]:offs[-1]]
