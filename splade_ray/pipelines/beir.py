"""BEIR end-to-end evaluation: dataset dir -> index -> retrieve -> self-hit
filter -> metrics, as ONE composition (the analog of ``splade/beir_eval.py:
22-97``, which wires GenericDataLoader -> SparseIndexing -> SparseRetrieval ->
EvaluateRetrieval in a single entry).

Layout expected under ``data_dir`` (the standard BEIR unpacked form):
``corpus.jsonl`` ({_id, title, text}), ``queries.jsonl`` ({_id, text}),
``qrels/<split>.tsv`` (query-id \t corpus-id \t score).

Id handling mirrors the reference's id_dict remap
(``transformer_evaluator.py:49-50,153-154``): external string ids live at the
boundaries only — queries get dense ints for the scatter-gather, the run's
dense doc ids are joined back to ``external_id`` with the pushdown fetch
(O(k) driver state), and evaluation runs entirely in external-id space.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from splade_ray.adapters import (
    beir_corpus_to_parquet,
    read_beir_qrels,
    read_beir_queries,
)
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.evaluate import evaluate_run
from splade_ray.pipelines.flagship import join_doc_info
from splade_ray.query import search


def beir_eval(
    data_dir: str,
    work_dir: str,
    *,
    split: str = "test",
    params: BM25Params | None = None,
    method: str = "exact",
    measures: list[str] | None = None,
    drop_self_hits: bool = True,
    rows_per_segment: int = 50_000,
) -> dict:
    """Run the full BEIR flow; returns ``{"run": DataFrame, "metrics": dict}``.

    The run frame is (query_id, rank, doc_id, score) in EXTERNAL id space,
    ranks renumbered after the self-hit filter (``beir_eval.py:82-88`` —
    quora's corpus contains the queries themselves)."""
    params = params or BM25Params()
    corpus_pq = os.path.join(work_dir, "corpus")
    index_dir = os.path.join(work_dir, "index")
    if not os.path.isdir(corpus_pq) or not os.listdir(corpus_pq):
        beir_corpus_to_parquet(os.path.join(data_dir, "corpus.jsonl"), corpus_pq)
    build_index(
        corpus_pq,
        index_dir,
        text_col="text",
        id_col=None,  # dense ids from the canonical external-id sort
        rows_per_segment=rows_per_segment,
        extra_doc_cols=("external_id",),
    )
    queries = read_beir_queries(os.path.join(data_dir, "queries.jsonl"))
    qrel = read_beir_qrels(os.path.join(data_dir, "qrels", f"{split}.tsv"))

    dense_queries = [(i, text) for i, (_qid, text) in enumerate(queries)]
    qid_of = {i: qid for i, (qid, _text) in enumerate(queries)}
    run = search(index_dir, dense_queries, params, method=method)
    run = join_doc_info(index_dir, run, columns=("external_id",))
    run["query_id"] = run["query_id"].map(qid_of)
    run["doc_id"] = run["external_id"].astype(str)
    if drop_self_hits:
        run = run[run["doc_id"] != run["query_id"].astype(str)]
    run = run.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True], kind="mergesort"
    ).reset_index(drop=True)
    run["rank"] = run.groupby("query_id").cumcount().to_numpy(np.int64) + 1
    run = run[["query_id", "rank", "doc_id", "score"]]
    # default measures are grade-safe (mrr/map guard against graded qrels —
    # pass them explicitly for binary-qrel datasets)
    metrics = evaluate_run(run, qrel, measures or ["ndcg@10", "recall@10"])
    return {"run": run, "metrics": metrics}
