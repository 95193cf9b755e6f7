"""BM25 scoring math.

In the reference the per-(query-term, doc) contribution is ``q_val * d_val``
over learned impacts (``numba_score_float``,
``splade/tasks/transformer_evaluator.py:92-111``). Our engine replaces the
learned impacts with Okapi BM25: contribution =
``qtf * idf(term) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))`` with
``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``. All accumulation is float64 in a
fixed order (terms sorted ascending, postings doc-id-sorted) so results are
bit-identical across cluster sizes (SURVEY.md §4 'Ordering').
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BM25Params:
    k1: float = 1.2
    b: float = 0.75
    top_k: int = 10
    # Score threshold, reference default 0 (conf/retrieve_evaluate/all.yaml);
    # only docs with score > threshold are returned.
    threshold: float = 0.0


def idf(df: float, n_docs: float) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def idf_bulk(df: np.ndarray, n_docs: float) -> np.ndarray:
    """Vectorized ``idf`` over a df column (float64, same formula)."""
    df = df.astype(np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_component(tf: np.ndarray, dl: np.ndarray, avgdl: float, p: BM25Params) -> np.ndarray:
    """Doc-side BM25 term weight (without idf), vectorized float64."""
    tf = tf.astype(np.float64)
    denom = tf + p.k1 * (1.0 - p.b + p.b * dl.astype(np.float64) / avgdl)
    return tf * (p.k1 + 1.0) / denom


def term_upper_bound(tf_max: float, dl_min: float, avgdl: float, p: BM25Params) -> float:
    """Upper bound of ``tf_component`` over a posting block given the block's
    max tf and min doc length: the component is monotone increasing in tf and
    decreasing in dl, so f(tf_max, dl_min) dominates. Storing (tf_max, dl_min)
    instead of a precomputed float bound keeps segment builds single-pass
    (avgdl is only known globally; the bound is evaluated at query time)."""
    denom = tf_max + p.k1 * (1.0 - p.b + p.b * dl_min / avgdl)
    return tf_max * (p.k1 + 1.0) / denom


def topk_from_scores(
    doc_ids: np.ndarray, scores: np.ndarray, k: int, threshold: float
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic top-k: score desc, tie-break doc_id asc; scores must be
    > threshold. A deterministic refinement of the reference's tie-unstable
    ``select_topk`` (transformer_evaluator.py:83-90)."""
    mask = scores > threshold
    doc_ids = doc_ids[mask]
    scores = scores[mask]
    if doc_ids.size == 0:
        return doc_ids.astype(np.int64), scores
    if doc_ids.size > k:
        # Candidates = every doc scoring >= the k-th best score (ties at the
        # cut included); the exact lexsort below decides final order.
        cut = np.partition(-scores, k - 1)[k - 1]
        cand = np.flatnonzero(-scores <= cut)
    else:
        cand = np.arange(doc_ids.size)
    order = np.lexsort((doc_ids[cand], -scores[cand]))
    sel = cand[order][:k]
    return doc_ids[sel].astype(np.int64), scores[sel]
