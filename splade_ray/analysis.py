"""Text/code analysis: tokenizer + per-batch postings extraction.

Reference semantics: the splade collection reader normalizes text
(``splade/datasets/datasets.py:82-88``) and the HF tokenizer turns it into
term ids (``splade/datasets/dataloaders.py:89-101``); sparsification to
(term, weight) pairs happens at ``splade/tasks/transformer_evaluator.py:45-47``.
Our analyzer replaces the learned encoder with a deterministic code tokenizer:
lowercase + ``[a-z0-9_]+`` word extraction, so a document becomes a bag of
``(term, tf)`` pairs.  The exact same tokenization is expressible in ANSI SQL
(``regexp_extract_all(lower(text), '[a-z0-9_]+')``), which is what makes every
downstream operator oracle-checkable.

The hot path is fully vectorized Arrow: ``utf8_lower`` → ``split_pattern_regex``
on the complement class (split on non-token runs ≡ findall of the token class)
→ ``list_flatten``/``list_parent_indices`` → C++ hash ``group_by`` for tf
counts. No per-row Python in any batch function.

The scalar ``tokenize``/``term_counts`` used for query prep and tests are a
thin wrapper over the SAME Arrow kernel — not an independent Python
reimplementation. This is load-bearing for non-ASCII text: Python's
``str.lower`` applies full Unicode case mapping ('İ' → 'i' + combining dot,
which the token class then splits), while Arrow's ``utf8_lower`` (and
DuckDB's ``lower``, the oracle) map 'İ' → 'i'. Routing both sides through
one kernel keeps query terms equal to indexed terms for such inputs.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# One token class for code and prose alike: identifiers (with underscores),
# numbers, keywords. Mirrors DuckDB `regexp_extract_all(lower(x), TOKEN_SQL)`.
TOKEN_PATTERN = r"[a-z0-9_]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)
TOKEN_SQL = TOKEN_PATTERN
SPLIT_PATTERN = r"[^a-z0-9_]+"  # complement class: split ≡ findall


def tokenize(text: str) -> list[str]:
    """Tokenize one string through the same Arrow kernel as the vectorized
    column path (see module docstring: Python ``str.lower`` diverges from
    ``utf8_lower`` on full-Unicode case mapping)."""
    terms, _, _ = tokenize_column(pa.array([text], pa.string()))
    return terms.to_pylist()


def term_counts(text: str) -> Counter:
    return Counter(tokenize(text))


def tokenize_column(texts: pa.Array | pa.ChunkedArray):
    """Vectorized tokenization of a string column.

    Returns ``(terms, parents, doc_lens)``: the flat token array, the row
    index of each token, and per-row token counts (nulls count as 0).
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    tok_lists = pc.split_pattern_regex(pc.utf8_lower(texts), SPLIT_PATTERN)
    flat = pc.list_flatten(tok_lists)
    parents = pc.list_parent_indices(tok_lists)
    mask = pc.not_equal(flat, "")  # boundary splits produce empty strings
    terms = flat.filter(mask)
    par = parents.filter(mask).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_lens = np.bincount(par, minlength=n).astype(np.int64)
    return terms, par, doc_lens


def term_frequency_table(texts: pa.Array | pa.ChunkedArray):
    """Vectorized (row, term, tf) extraction for a string column.

    Returns ``(tf_table, doc_lens)`` where tf_table has columns
    ``row:int64, term:string, tf:int64`` (unordered — hash-group output)."""
    terms, par, doc_lens = tokenize_column(texts)
    g = (
        pa.table({"row": pa.array(par, pa.int64()), "term": terms})
        .group_by(["row", "term"])
        .aggregate([([], "count_all")])
    )
    tf_tbl = pa.table(
        {"row": g["row"], "term": g["term"], "tf": g["count_all"].cast(pa.int64())}
    )
    return tf_tbl, doc_lens


def postings_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Flat-map a batch of documents to postings rows ``(term, doc_id, tf)``.

    One input row expands to one output row per distinct term (COO triplets,
    the reference's central intermediate — transformer_evaluator.py:45-47).
    """
    tf_tbl, _ = term_frequency_table(batch[text_col])
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = tf_tbl["row"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "term": tf_tbl["term"],
            "doc_id": pa.array(doc_ids[rows], pa.int64()),
            "tf": tf_tbl["tf"],
        }
    )


def postings_with_dl_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """``postings_batch`` plus the parent doc's length: ``(term, doc_id, tf,
    dl)``. The dl column makes the rows self-contained for term-keyed
    consumers (the join-based BM25 quantizer) that never see the doc again."""
    tf_tbl, doc_lens = term_frequency_table(batch[text_col])
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = tf_tbl["row"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "term": tf_tbl["term"],
            "doc_id": pa.array(doc_ids[rows], pa.int64()),
            "tf": tf_tbl["tf"],
            "dl": pa.array(doc_lens[rows], pa.int64()),
        }
    )


def doc_stats_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc token stats: ``(doc_id, n_tokens, n_distinct)``."""
    tf_tbl, doc_lens = term_frequency_table(batch[text_col])
    rows = tf_tbl["row"].to_numpy(zero_copy_only=False)
    n_distinct = np.bincount(rows, minlength=len(batch)).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_tokens": pa.array(doc_lens),
            "n_distinct": pa.array(n_distinct),
        }
    )


def analyze_docs(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"):
    """Analyze a batch fully in one pass for the segment builder.

    Returns ``(flat, doc_ids, doc_lens)`` where ``flat`` is a pyarrow table
    ``(term, pos, tf)`` sorted by (term asc, pos asc) — ``pos`` indexes into
    the batch, so posting lists come out doc-id-sorted as long as the batch
    rows are doc-id ascending (the builder guarantees it; the same invariant
    the reference gets from its sequential doc counter,
    transformer_evaluator.py:47-51)."""
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    tf_tbl, doc_lens = term_frequency_table(batch[text_col])
    flat = pa.table(
        {"term": tf_tbl["term"], "pos": tf_tbl["row"], "tf": tf_tbl["tf"]}
    ).sort_by([("term", "ascending"), ("pos", "ascending")])
    return flat, doc_ids, doc_lens
