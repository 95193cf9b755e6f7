"""Determinism across partitionings: the run table must be identical no
matter how the corpus is segmented or how many workers score it — the
in-session proxy for the N-vs-4N cluster criterion (fresh-process two-level
evidence lives in bench.py --scaling)."""

import numpy as np

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import write_synth_corpus
from splade_ray.query import search

QUERIES = [
    (0, "def parse buffer"),
    (1, "merge heap score index"),
    (2, "import class return"),
]


def test_run_invariant_to_segmentation(ray_session, tmp_path):
    corpus = str(tmp_path / "corpus")
    write_synth_corpus(corpus, n_docs=250, seed=9, n_files=2)
    runs = []
    for i, (rps, blk, conc) in enumerate([(40, 8, 1), (125, 64, 2), (250, 128, 3)]):
        idx = str(tmp_path / f"index{i}")
        build_index(corpus, idx, text_col="content", rows_per_segment=rps, block_size=blk)
        runs.append(search(idx, QUERIES, BM25Params(top_k=10), concurrency=conc))
    for other in runs[1:]:
        assert runs[0]["query_id"].tolist() == other["query_id"].tolist()
        assert runs[0]["doc_id"].tolist() == other["doc_id"].tolist()
        # bit-identical scores: fixed-order float64 accumulation everywhere
        assert np.array_equal(runs[0]["score"].to_numpy(), other["score"].to_numpy())


def test_evaluate_metrics():
    import pandas as pd

    from splade_ray.evaluate import mrr_at_k, recall_at_k

    run = pd.DataFrame(
        {
            "query_id": [0, 0, 0, 1, 1],
            "rank": [1, 2, 3, 1, 2],
            "doc_id": [10, 11, 12, 20, 21],
            "score": [3.0, 2.0, 1.0, 5.0, 4.0],
        }
    )
    qrel = pd.DataFrame(
        {"query_id": [0, 1, 1], "doc_id": [11, 20, 99], "rel": [1, 1, 1]}
    )
    assert mrr_at_k(run, qrel, 10) == (0.5 + 1.0) / 2
    assert recall_at_k(run, qrel, 10) == (1.0 + 0.5) / 2
