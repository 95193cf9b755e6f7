"""Run evaluation: MRR@k and recall@k against qrels.

Driver-side (runs are tiny: Q × k rows) — same placement choice as the
reference, which evaluates with pytrec_eval after retrieval
(``splade/evaluate.py:13-42``, ``splade/utils/metrics.py:16-43``). Inputs are
our canonical tables: run (query_id, rank, doc_id, score) and qrel
(query_id, doc_id, rel).
"""

from __future__ import annotations

import pandas as pd


def mrr_at_k(run: pd.DataFrame, qrel: pd.DataFrame, k: int = 10) -> float:
    rel = {(int(q), int(d)) for q, d, r in zip(qrel["query_id"], qrel["doc_id"], qrel["rel"]) if r > 0}
    qids = sorted(set(int(q) for q in qrel["query_id"]))
    total = 0.0
    top = run[run["rank"] <= k]
    by_q = {q: g.sort_values("rank") for q, g in top.groupby("query_id")}
    for q in qids:
        g = by_q.get(q)
        if g is None:
            continue
        for rank, doc in zip(g["rank"], g["doc_id"]):
            if (q, int(doc)) in rel:
                total += 1.0 / rank
                break
    return total / max(len(qids), 1)


def ndcg_at_k(run: pd.DataFrame, qrel: pd.DataFrame, k: int = 10) -> float:
    """Graded nDCG@k with the standard log2 discount (the pytrec_eval
    measure the reference requests via `utils/metrics.py:25-43`)."""
    import math

    rel: dict[int, dict[int, int]] = {}
    for q, d, r in zip(qrel["query_id"], qrel["doc_id"], qrel["rel"]):
        rel.setdefault(int(q), {})[int(d)] = int(r)
    top = run[run["rank"] <= k]
    total = 0.0
    for q, grades in rel.items():
        g = top[top["query_id"] == q].sort_values("rank")
        dcg = sum(
            grades.get(int(d), 0) / math.log2(rank + 1)
            for rank, d in zip(g["rank"], g["doc_id"])
        )
        ideal = sorted(grades.values(), reverse=True)[:k]
        idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal))
        total += (dcg / idcg) if idcg > 0 else 0.0
    return total / max(len(rel), 1)


def recall_at_k(run: pd.DataFrame, qrel: pd.DataFrame, k: int = 10) -> float:
    rel: dict[int, set[int]] = {}
    for q, d, r in zip(qrel["query_id"], qrel["doc_id"], qrel["rel"]):
        if r > 0:
            rel.setdefault(int(q), set()).add(int(d))
    top = run[run["rank"] <= k]
    got = 0.0
    for q, docs in rel.items():
        retrieved = set(int(d) for d in top[top["query_id"] == q]["doc_id"])
        got += len(retrieved & docs) / len(docs)
    return got / max(len(rel), 1)
