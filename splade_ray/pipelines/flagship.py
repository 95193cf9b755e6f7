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
import pyarrow as pa

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


def fetch_doc_info(
    index_dir: str,
    doc_ids: list[int],
    *,
    columns: tuple[str, ...] = ("repo", "path"),
) -> pa.Table:
    """Candidate-set doc-metadata fetch with predicate pushdown: ONE
    ``pyarrow.dataset`` scan over every segment's ``doclens.parquet`` with an
    ``isin(doc_ids)`` filter, so only row groups whose doc-id range overlaps
    the candidates are read and only candidate rows are returned — O(k)
    driver state, never O(corpus). This is the output-boundary analog of the
    reference's ``doc_ids`` positional remap (transformer_evaluator.py:173),
    same strategy as the rerank pushdown (rerank.py:57-65)."""
    import pyarrow.dataset as pads

    paths = [os.path.join(seg, "doclens.parquet") for seg in segment_dirs(index_dir)]
    cand = sorted({int(d) for d in doc_ids})
    return pads.dataset(paths).to_table(
        columns=["doc_id", *columns], filter=pads.field("doc_id").isin(cand)
    )


def join_doc_info(
    index_dir: str,
    run: pd.DataFrame,
    *,
    columns: tuple[str, ...] = ("repo", "path"),
    pushdown_max_ids: int = 100_000,
) -> pd.DataFrame:
    """Join a run's dense doc ids back to external doc metadata.

    Top-k-sized runs (the common case) use the pushdown scan above; a run
    larger than ``pushdown_max_ids`` distinct docs (a full-corpus sweep) is
    joined with a Ray Data hash join instead — the doclens tables stream,
    nothing corpus-sized lands on the driver."""
    cand = run["doc_id"].unique()
    if len(cand) <= pushdown_max_ids:
        info = fetch_doc_info(index_dir, cand.tolist(), columns=columns).to_pandas()
        return run.merge(info, on="doc_id", how="left")
    import ray.data as rd

    from splade_ray.io import read_parquet_clean
    from splade_ray.prune import join_partitions

    paths = [os.path.join(seg, "doclens.parquet") for seg in segment_dirs(index_dir)]
    info_ds = read_parquet_clean(paths, columns=["doc_id", *columns])
    n = join_partitions(8)
    joined = rd.from_pandas(run).repartition(n).join(
        info_ds, join_type="inner", num_partitions=n, on=("doc_id",)
    )
    return joined.to_pandas()


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
    # external-id join at the output boundary only; run is top-k-sized ->
    # pushdown fetch of exactly the candidate rows
    return join_doc_info(index_dir, run)
