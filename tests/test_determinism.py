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


def test_incremental_corpus_drop(ray_session, tmp_path):
    """Appending a new corpus file that sorts AFTER the existing ones is an
    incremental drop: the re-run build skip-matches every old segment
    (specs unchanged: same path/row-range/doc_id_start), builds only the
    new file's segments, and the refreshed lexicon/manifest cover the
    union. (A file sorting BEFORE existing ones shifts global ids and
    rebuilds — by design: ids are derived from the canonical layout.)"""
    import pyarrow.parquet as pq

    from splade_ray.bm25 import BM25Params
    from splade_ray.build import build_index, load_manifest
    from splade_ray.corpus import synth_corpus
    from splade_ray.query import search

    d = tmp_path / "corpus"
    d.mkdir()
    t = synth_corpus(120, seed=9)
    pq.write_table(t.slice(0, 60), str(d / "drop-000.parquet"))
    pq.write_table(t.slice(60, 30), str(d / "drop-001.parquet"))
    idx = str(tmp_path / "idx")
    m1 = build_index(str(d), idx, text_col="content", rows_per_segment=20)
    assert m1["n_docs"] == 90

    # drop 2 arrives
    pq.write_table(t.slice(90, 30), str(d / "drop-002.parquet"))
    m2 = build_index(str(d), idx, text_col="content", rows_per_segment=20)
    assert m2["n_docs"] == 120
    # every pre-existing segment was skip-matched, only the new ones built
    assert m2["n_segments_skipped"] == m1["n_segments"]
    assert m2["n_segments"] == m1["n_segments"] + 2

    # the new docs are searchable and ids continue the global order
    manifest = load_manifest(idx)
    assert manifest["n_docs"] == 120
    run = search(idx, [(0, "rare_token_105")], BM25Params(top_k=3))
    assert 105 in set(run["doc_id"])
