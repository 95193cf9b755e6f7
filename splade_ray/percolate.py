"""Percolator: match a document STREAM against stored queries (reverse
search) — the Elasticsearch percolate / Lucene Monitor (Luwak) surface.

The reference only ever searches documents with ad-hoc queries
(``transformer_evaluator.py:142-193``); alerting/routing pipelines need the
inverse: thousands of REGISTERED queries, and for every incoming document
the set of queries it satisfies. Pinned semantics (SQL-mirrorable):

- a stored query is its analyzed DISTINCT term set;
- ``mode="all"`` (default): a query matches a doc iff EVERY query term
  occurs in the doc (conjunctive — the alert shape);
- ``mode="any"``: iff at least one term occurs (disjunctive);
- queries whose analysis yields no terms never match.

Scale shape: the stored-query set is alert-sized (thousands), so it
broadcasts once via ``ray.put`` and each actor builds its term->query
inverted map ONCE in ``__init__`` (the Lucene Monitor pre-index). The doc
stream is a pure map_batches scan — zero shuffle, output is (doc_id,
query_id) match pairs. Per batch everything is vectorized: one tokenize
kernel, distinct (doc, term) pairs via np.unique, searchsorted against the
stored vocabulary, CSR expansion to (doc, query) hits, and one bincount
per batch to compare matched-term counts against each query's arity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from splade_ray.analysis import term_counts, tokenize_column


def build_query_table(
    queries: list[tuple[int, str]], *, query_lang: str | None = None
) -> dict:
    """Driver-side registration: analyzed distinct term sets, flattened to
    parallel arrays (vocab-sorted CSR: term -> query ids)."""
    qids, arities = [], []
    pairs: list[tuple[str, int]] = []
    for qid, text in queries:
        terms = sorted(term_counts(text, query_lang))
        if not terms:
            continue
        qids.append(int(qid))
        arities.append(len(terms))
        pairs.extend((t, int(qid)) for t in terms)
    pairs.sort()
    vocab = np.array(sorted({t for t, _ in pairs}), object)
    # CSR offsets: for vocab[i], query ids live in flat[off[i]:off[i+1]]
    terms_arr = np.array([t for t, _ in pairs], object)
    flat = np.array([q for _, q in pairs], np.int64)
    off = np.searchsorted(terms_arr, vocab, side="left")
    off = np.append(off, len(terms_arr))
    return {
        "vocab": vocab,
        "flat_qids": flat,
        "offsets": off.astype(np.int64),
        "qids": np.array(qids, np.int64),
        "arity": dict(zip(qids, arities)),
    }


class PercolateStage:
    """Actor-pool stage: the broadcast query table is fetched once per
    actor; each batch of docs emits its (doc_id, query_id) matches."""

    def __init__(self, table_ref, *, mode: str, text_col: str, id_col: str,
                 query_lang: str | None = None):
        if mode not in ("all", "any"):
            raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
        self.t = ray.get(table_ref) if isinstance(table_ref, ray.ObjectRef) else table_ref
        self.mode = mode
        self.text_col = text_col
        self.id_col = id_col
        self.query_lang = query_lang
        # dense query index for the per-batch bincount
        self.qpos = {int(q): i for i, q in enumerate(self.t["qids"])}
        self.flat_qpos = np.array(
            [self.qpos[int(q)] for q in self.t["flat_qids"]], np.int64
        )
        self.arity_arr = np.array(
            [self.t["arity"][int(q)] for q in self.t["qids"]], np.int64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "query_id": pa.array([], pa.int64())}
        )
        n = batch.num_rows
        if n == 0 or self.t["vocab"].size == 0:
            return empty
        from splade_ray.analysis import analyzer_pattern

        pattern = (
            analyzer_pattern(self.query_lang) if self.query_lang is not None else None
        )
        terms, par, _ = tokenize_column(batch[self.text_col], pattern)
        if len(terms) == 0:
            return empty
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # distinct (doc, term) pairs via dictionary codes — tf is
        # irrelevant to percolation, one np.unique over int keys
        enc = terms.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nt = len(enc.dictionary)
        _, first = np.unique(par * nt + codes, return_index=True)
        dpar, dcode = par[first], codes[first]
        # map each batch-dictionary token to the stored vocabulary once
        vocab = self.t["vocab"]
        dict_toks = np.asarray(enc.dictionary.to_pylist(), object)
        vpos = np.searchsorted(vocab, dict_toks)
        vpos = np.clip(vpos, 0, max(vocab.size - 1, 0))
        vhit = vocab[vpos] == dict_toks
        hit = vhit[dcode]
        dpar, pos = dpar[hit], vpos[dcode[hit]]
        if dpar.size == 0:
            return empty
        off = self.t["offsets"]
        counts = (off[pos + 1] - off[pos]).astype(np.int64)
        # CSR expansion: each (doc, term) hit fans out to its query ids
        doc_rep = np.repeat(dpar, counts)
        idx = np.repeat(off[pos], counts) + (
            np.arange(int(counts.sum())) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        q_rep = self.flat_qpos[idx]
        # sparse per-(doc, query) matched-term counts — no dense n x nq
        nq = self.t["qids"].size
        keys, mcount = np.unique(doc_rep * nq + q_rep, return_counts=True)
        di, qi = keys // nq, keys % nq
        ok = mcount == self.arity_arr[qi] if self.mode == "all" else mcount >= 1
        return pa.table(
            {
                "doc_id": pa.array(ids[di[ok]], pa.int64()),
                "query_id": pa.array(self.t["qids"][qi[ok]], pa.int64()),
            }
        )


def percolate(
    docs: Dataset,
    queries: list[tuple[int, str]],
    *,
    mode: str = "all",
    text_col: str = "text",
    id_col: str = "doc_id",
    query_lang: str | None = None,
    concurrency=None,
) -> Dataset:
    """(doc_id, query_id) pairs for every stored query each doc satisfies —
    a streaming scan against the broadcast registered-query table."""
    table_ref = ray.put(build_query_table(queries, query_lang=query_lang))
    return docs.map_batches(
        PercolateStage,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "table_ref": table_ref,
            "mode": mode,
            "text_col": text_col,
            "id_col": id_col,
            "query_lang": query_lang,
        },
        concurrency=concurrency or (1, 8),
    )


def percolate_df(docs, queries, **kw) -> pd.DataFrame:
    """Convenience: percolate + sorted pandas result."""
    pdf = percolate(docs, queries, **kw).to_pandas()
    if pdf.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "query_id": pd.Series([], dtype=np.int64),
            }
        )
    return pdf.sort_values(["doc_id", "query_id"]).reset_index(drop=True)
