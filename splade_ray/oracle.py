"""Single-process numpy BM25 oracle retriever.

Mirrors the reference's retrieval semantics — term-at-a-time accumulation
over posting lists, threshold filter, top-k selection
(``numba_score_float`` + ``select_topk``,
``splade/tasks/transformer_evaluator.py:83-111``) — with the deterministic
tie-break defined in FIXTURES.md §4 (score desc, doc_id asc). This is the
pytest parity target for the distributed engine: the Ray pipeline's run table
must match this oracle's docIDs and scores exactly (same float64 fixed-order
accumulation).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores


class OracleIndex:
    """In-memory inverted index over a small corpus (pandas/pyarrow input)."""

    def __init__(self, doc_ids, texts, params: BM25Params | None = None):
        self.params = params or BM25Params()
        self.doc_ids = np.asarray(doc_ids, np.int64)
        self.pos = {int(d): i for i, d in enumerate(self.doc_ids)}
        self.n_docs = len(self.doc_ids)
        self.postings: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        lens = np.zeros(self.n_docs, np.int64)
        acc: dict[str, list[tuple[int, int]]] = {}
        for i, text in enumerate(texts):
            c = term_counts(text or "")
            lens[i] = sum(c.values())
            for t, tf in c.items():
                acc.setdefault(t, []).append((i, tf))
        for t, pairs in acc.items():
            pairs.sort()  # ascending doc position == insertion order here
            pos = np.array([p for p, _ in pairs], np.int64)
            tf = np.array([f for _, f in pairs], np.int64)
            self.postings[t] = (pos, tf)
        self.doc_lens = lens
        self.avgdl = float(lens.sum()) / self.n_docs if self.n_docs else 1.0

    def search_one(self, text: str) -> tuple[np.ndarray, np.ndarray]:
        p = self.params
        scores = np.zeros(self.n_docs, np.float64)
        q = term_counts(text)
        for term in sorted(q):  # fixed term order -> fixed summation order
            if term not in self.postings:
                continue
            pos, tf = self.postings[term]
            # (idf * qtf) first, then the array multiply — the same float-op
            # order as the distributed kernels (bitwise-identical scores).
            w = idf(len(pos), self.n_docs) * q[term]
            scores[pos] += w * tf_component(tf, self.doc_lens[pos], self.avgdl, p)
        return topk_from_scores(self.doc_ids, scores, p.top_k, p.threshold)

    def search(self, queries: list[tuple[int, str]]) -> pd.DataFrame:
        rows = []
        for qid, text in queries:
            doc_ids, scores = self.search_one(text)
            for r, (d, s) in enumerate(zip(doc_ids, scores), start=1):
                rows.append((int(qid), r, int(d), float(s)))
        return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
