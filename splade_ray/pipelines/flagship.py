"""Flagship pipeline: corpus (input_hint shape) -> index -> BM25 top-k run.

The end-to-end analog of ``python -m splade.all``'s index+retrieve portion
(``splade/all.py:14-21`` minus training): ingest the source-code corpus
table, build the partitioned inverted index (resumable, sha256-invariant),
answer a query set, and join dense doc ids back to (repo, path) at the
output boundary — external ids are applied only at the end, like the
reference's ``doc_ids`` remap (``transformer_evaluator.py:173``).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index, segment_dirs
from splade_ray.corpus import documents_as_corpus
from splade_ray.query import search

FLAGSHIP_QUERIES = [
    (0, "hash join table"),
    (1, "sort merge batch"),
    (2, "spark stream window"),
    (3, "vector filter scan"),
    (4, "customer query value"),
    (5, "group row key part"),
    (6, "zzzoov"),
    (7, "the a fast slow big small data"),
]


def run_flagship(sf_dir: str, work_dir: str, *, params: BM25Params | None = None,
                 method: str = "exact", rows_per_segment: int = 2000) -> pd.DataFrame:
    """Build (or resume) an index over the corpus-shaped adaptation of
    ``documents`` and return the run table joined with (repo, path)."""
    corpus_dir = os.path.join(work_dir, "corpus")
    index_dir = os.path.join(work_dir, "index")
    if not os.path.exists(os.path.join(corpus_dir, "corpus-000.parquet")):
        documents_as_corpus(sf_dir, corpus_dir)
    build_index(
        corpus_dir,
        index_dir,
        text_col="content",
        id_col=None,  # dense ids assigned from deterministic global row position
        rows_per_segment=rows_per_segment,
        extra_doc_cols=("repo", "path"),
    )
    run = search(index_dir, FLAGSHIP_QUERIES, params or BM25Params(), method=method)
    # external-id join at the output boundary only
    doc_info = pd.concat(
        [
            pq.read_table(
                os.path.join(seg, "doclens.parquet"), columns=["doc_id", "repo", "path"]
            ).to_pandas()
            for seg in segment_dirs(index_dir)
        ],
        ignore_index=True,
    )
    return run.merge(doc_info, on="doc_id", how="left")
