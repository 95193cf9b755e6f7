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

All batch functions are Arrow-in / Arrow-out (``batch_format="pyarrow"``) and
avoid per-row Python except the regex scan itself (string tokenization is
inherently per-string; the regex is compiled once at module import).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pyarrow as pa

# One token class for code and prose alike: identifiers (with underscores),
# numbers, keywords. Mirrors DuckDB `regexp_extract_all(lower(x), TOKEN_SQL)`.
TOKEN_PATTERN = r"[a-z0-9_]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)
TOKEN_SQL = TOKEN_PATTERN


def tokenize(text: str) -> list[str]:
    """Tokenize one string. The single source of truth for analysis."""
    return TOKEN_RE.findall(text.lower())


def term_counts(text: str) -> Counter:
    return Counter(tokenize(text))


def postings_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Flat-map a batch of documents to postings rows ``(term, doc_id, tf)``.

    One input row expands to one output row per distinct term (COO triplets,
    the reference's central intermediate — transformer_evaluator.py:45-47).
    """
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
    terms: list[str] = []
    out_docs: list[int] = []
    tfs: list[int] = []
    for did, text in zip(doc_ids, batch[text_col].to_pylist()):
        if text is None:
            continue
        c = term_counts(text)
        terms.extend(c.keys())
        out_docs.extend([did] * len(c))
        tfs.extend(c.values())
    return pa.table(
        {
            "term": pa.array(terms, pa.string()),
            "doc_id": pa.array(out_docs, pa.int64()),
            "tf": pa.array(tfs, pa.int64()),
        }
    )


def doc_stats_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc token stats: ``(doc_id, n_tokens, n_distinct)``."""
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
    n_tokens = np.empty(len(doc_ids), np.int64)
    n_distinct = np.empty(len(doc_ids), np.int64)
    for i, text in enumerate(batch[text_col].to_pylist()):
        toks = tokenize(text) if text is not None else []
        n_tokens[i] = len(toks)
        n_distinct[i] = len(set(toks))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n_tokens),
            "n_distinct": pa.array(n_distinct),
        }
    )


def analyze_docs(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"):
    """Analyze a batch fully in one pass: returns (per-doc term Counters,
    doc_ids ndarray, doc_lens ndarray). Used by the segment builder."""
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    counters: list[Counter] = []
    doc_lens = np.empty(len(doc_ids), np.int64)
    for i, text in enumerate(batch[text_col].to_pylist()):
        toks = tokenize(text) if text is not None else []
        doc_lens[i] = len(toks)
        counters.append(Counter(toks))
    return counters, doc_ids, doc_lens
