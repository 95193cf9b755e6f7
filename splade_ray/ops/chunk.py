"""Token-window chunking — the RAG / context-window preprocessing step.

The reference truncates every document to ``max_length`` tokens and
discards the rest (``splade/datasets/datasets.py`` tokenizer truncation);
retrieval over long documents instead SPLITS each into overlapping
token windows and indexes the chunks. Pinned contract (SQL-mirrorable):

- ``stride = size − overlap`` (must be > 0);
- chunk starts are ``0, stride, 2·stride, …`` while ``start < n_tokens``,
  STOPPING after the first chunk that reaches the document end (a start
  is emitted iff it is 0 or the previous chunk ended before n_tokens) —
  no empty and no fully-redundant trailing chunks;
- chunk text = the analyzed tokens ``[start, start+size)`` joined by a
  single space (the analyzer is the same one the index uses, so chunk
  text re-tokenizes to itself).

Fully vectorized: one tokenize pass per batch, chunk token indices built
with repeat/arange arithmetic over the flat token array, texts
reassembled with one ``binary_join`` — no per-row Python. Output is
``n_tokens/stride`` rows per doc; each batch's output leaves the task as
ordinary rows (flat_map shape), so chunking streams at corpus scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from splade_ray.analysis import tokenize_column


def chunk_batch(
    batch: pa.Table, *, size: int, overlap: int,
    text_col: str = "text", id_col: str = "doc_id",
) -> pa.Table:
    stride = size - overlap
    terms, par, doc_lens = tokenize_column(batch[text_col])
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    lens = np.asarray(doc_lens, np.int64)
    n_docs = lens.size
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_off = np.zeros(n_docs + 1, np.int64)
    np.cumsum(lens, out=doc_off[1:])

    # starts per doc: 0, stride, ... while start < n AND (start == 0 or
    # previous chunk ended before n) -> count = max(1, ceil((n-size)/stride)+1)
    # for n > 0; 0 chunks for empty docs
    n_chunks = np.where(
        lens == 0, 0, np.maximum(1, -((lens - size) // -stride) + 1)
    ).astype(np.int64)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.string()),
            }
        )
    chunk_doc = np.repeat(np.arange(n_docs), n_chunks)
    c_off = np.zeros(n_docs + 1, np.int64)
    np.cumsum(n_chunks, out=c_off[1:])
    chunk_id = np.arange(total) - c_off[chunk_doc]
    starts = chunk_id * stride
    c_len = np.minimum(size, lens[chunk_doc] - starts)

    # flat token indices for every chunk: repeat/arange arithmetic
    tok_off = np.zeros(total + 1, np.int64)
    np.cumsum(c_len, out=tok_off[1:])
    flat_n = int(tok_off[-1])
    within = np.arange(flat_n) - np.repeat(tok_off[:-1], c_len)
    tok_idx = doc_off[chunk_doc].repeat(c_len) + starts.repeat(c_len) + within

    la = pa.ListArray.from_arrays(
        pa.array(tok_off, pa.int64()).cast(pa.int32()),
        terms.take(pa.array(tok_idx)),
    )
    return pa.table(
        {
            id_col: pa.array(ids[chunk_doc], pa.int64()),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "n_tokens": pa.array(c_len, pa.int64()),
            "chunk": pc.binary_join(la, " ").cast(pa.string()),
        }
    )


def chunk_texts(
    ds: Dataset,
    *,
    size: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Dataset:
    """Split every document into overlapping token windows (see module
    contract). Returns (id_col, chunk_id, n_tokens, chunk) rows."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    return ds.map_batches(
        chunk_batch, batch_format="pyarrow",
        fn_kwargs=dict(size=size, overlap=overlap,
                       text_col=text_col, id_col=id_col),
    )
