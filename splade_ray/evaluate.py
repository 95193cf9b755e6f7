"""Run evaluation: MRR@k, recall@k, nDCG@k, MAP@k against qrels, plus a
pytrec_eval-style measure-string registry.

Driver-side (runs are tiny: Q × k rows) — same placement choice as the
reference, which evaluates with pytrec_eval after retrieval
(``splade/evaluate.py:13-42``, ``splade/utils/metrics.py:16-43``). Inputs are
our canonical tables: run (query_id, rank, doc_id, score) and qrel
(query_id, doc_id, rel). Ids may be ints (dense) or strings (external —
BEIR); both sides are normalized identically before matching.
"""

from __future__ import annotations

import pandas as pd


def _key(v):
    """Normalize an id for matching: integer-like -> int, else str. Applied
    to BOTH run and qrel sides so dense int64 and external string ids join."""
    try:
        return int(v)
    except (TypeError, ValueError):
        return str(v)


def binary_qrel_guard(qrel: pd.DataFrame, measure: str = "mrr") -> None:
    """The reference refuses rank-based measures over graded qrels
    (``splade/evaluation/eval.py:14-15``: MRR is only defined for binary
    relevance). Raises ValueError when any rel is outside {0, 1}."""
    bad = set(int(r) for r in qrel["rel"]) - {0, 1}
    if bad:
        raise ValueError(
            f"{measure} requires binary qrels (rel in {{0,1}}); found grades {sorted(bad)} "
            "— use ndcg@k for graded relevance"
        )


def mrr_at_k(run: pd.DataFrame, qrel: pd.DataFrame, k: int = 10) -> float:
    binary_qrel_guard(qrel, f"mrr@{k}")
    rel = {(_key(q), _key(d)) for q, d, r in zip(qrel["query_id"], qrel["doc_id"], qrel["rel"]) if r > 0}
    qids = sorted(set(_key(q) for q in qrel["query_id"]), key=str)
    total = 0.0
    top = run[run["rank"] <= k]
    by_q = {_key(q): g.sort_values("rank") for q, g in top.groupby("query_id")}
    for q in qids:
        g = by_q.get(q)
        if g is None:
            continue
        for rank, doc in zip(g["rank"], g["doc_id"]):
            if (q, _key(doc)) in rel:
                total += 1.0 / rank
                break
    return total / max(len(qids), 1)


def map_at_k(run: pd.DataFrame, qrel: pd.DataFrame, k: int = 10) -> float:
    """Mean average precision@k — trec_eval ``map_cut.k`` semantics: the
    precision sum over relevant hits in the top k, normalized by R (the
    query's TOTAL relevant count, not min(R, k))."""
    binary_qrel_guard(qrel, f"map@{k}")
    rel: dict = {}
    for q, d, r in zip(qrel["query_id"], qrel["doc_id"], qrel["rel"]):
        if int(r) > 0:
            rel.setdefault(_key(q), set()).add(_key(d))
    top = run[run["rank"] <= k]
    by_q = {_key(q): g.sort_values("rank") for q, g in top.groupby("query_id")}
    total = 0.0
    for q, docs in rel.items():
        g = by_q.get(q)
        if g is None:
            continue
        hits = 0
        ap = 0.0
        for rank, doc in zip(g["rank"], g["doc_id"]):
            if _key(doc) in docs:
                hits += 1
                ap += hits / rank
        total += ap / len(docs)
    return total / max(len(rel), 1)


def ndcg_at_k(run: pd.DataFrame, qrel: pd.DataFrame, k: int = 10) -> float:
    """Graded nDCG@k with the standard log2 discount (the pytrec_eval
    measure the reference requests via `utils/metrics.py:25-43`)."""
    import math

    rel: dict = {}
    for q, d, r in zip(qrel["query_id"], qrel["doc_id"], qrel["rel"]):
        rel.setdefault(_key(q), {})[_key(d)] = int(r)
    top = run.copy()
    top = top[top["rank"] <= k]
    top["_q"] = [_key(q) for q in top["query_id"]]
    total = 0.0
    for q, grades in rel.items():
        g = top[top["_q"] == q].sort_values("rank")
        dcg = sum(
            grades.get(_key(d), 0) / math.log2(rank + 1)
            for rank, d in zip(g["rank"], g["doc_id"])
        )
        ideal = sorted(grades.values(), reverse=True)[:k]
        idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal))
        total += (dcg / idcg) if idcg > 0 else 0.0
    return total / max(len(rel), 1)


def recall_at_k(run: pd.DataFrame, qrel: pd.DataFrame, k: int = 10) -> float:
    rel: dict = {}
    for q, d, r in zip(qrel["query_id"], qrel["doc_id"], qrel["rel"]):
        if r > 0:
            rel.setdefault(_key(q), set()).add(_key(d))
    top = run.copy()
    top = top[top["rank"] <= k]
    top["_q"] = [_key(q) for q in top["query_id"]]
    got = 0.0
    for q, docs in rel.items():
        retrieved = set(_key(d) for d in top[top["_q"] == q]["doc_id"])
        got += len(retrieved & docs) / len(docs)
    return got / max(len(rel), 1)


# ---------------------------------------------------------------- registry

MEASURES = {
    "mrr": mrr_at_k,
    "map": map_at_k,
    "ndcg": ndcg_at_k,
    "recall": recall_at_k,
}


def evaluate_run(
    run: pd.DataFrame, qrel: pd.DataFrame, measures: list[str] | None = None
) -> dict[str, float]:
    """pytrec_eval-style entry: measure strings like ``mrr@10``, ``map@100``,
    ``ndcg@10``, ``recall@1000`` (the reference accepts arbitrary measure
    lists the same way, ``utils/metrics.py:16-43``). Returns {measure: value};
    unknown names raise with the registry contents."""
    out: dict[str, float] = {}
    for m in measures or ["mrr@10", "ndcg@10", "recall@10"]:
        name, _, ks = m.partition("@")
        fn = MEASURES.get(name.strip().lower())
        if fn is None:
            raise ValueError(f"unknown measure {m!r}; registry: {sorted(MEASURES)}")
        k = int(ks) if ks else 10
        out[m] = fn(run, qrel, k)
    return out
