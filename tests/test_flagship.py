"""Flagship pipeline output-boundary join: the driver must hold only
candidate-sized doc metadata (round-2 VERDICT item 1), never an
O(corpus) concat of every segment's doclens."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from splade_ray.build import build_index, segment_dirs
from splade_ray.corpus import write_synth_corpus
from splade_ray.pipelines.flagship import fetch_doc_info, join_doc_info, run_flagship


def _small_index(tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    index_dir = str(tmp_path / "index")
    write_synth_corpus(corpus_dir, 200, n_files=3)
    build_index(
        corpus_dir, index_dir, text_col="content", rows_per_segment=40,
        extra_doc_cols=("repo", "path"),
    )
    return index_dir


def test_fetch_doc_info_reads_only_candidate_rows(ray_session, tmp_path):
    """The pushdown fetch returns EXACTLY the candidate rows — the isin
    filter is applied at the scan, so driver state is O(k) not O(corpus)
    (pattern: test_ivf_search_reads_only_probed_partitions)."""
    index_dir = _small_index(tmp_path)
    cand = [3, 57, 120, 199]
    info = fetch_doc_info(index_dir, cand)
    assert info.num_rows == len(cand)  # not one row more than the candidates
    assert sorted(info["doc_id"].to_pylist()) == cand
    assert set(info.column_names) == {"doc_id", "repo", "path"}


def test_join_doc_info_matches_full_concat(ray_session, tmp_path):
    index_dir = _small_index(tmp_path)
    run = pd.DataFrame(
        {
            "query_id": np.array([0, 0, 1], np.int64),
            "rank": np.array([1, 2, 1], np.int32),
            "doc_id": np.array([10, 77, 150], np.int64),
            "score": np.array([2.0, 1.5, 0.9], np.float64),
        }
    )
    got = join_doc_info(index_dir, run).sort_values("doc_id").reset_index(drop=True)
    # oracle: brute-force concat of all segment doclens
    full = pd.concat(
        [
            pq.read_table(
                os.path.join(s, "doclens.parquet"), columns=["doc_id", "repo", "path"]
            ).to_pandas()
            for s in segment_dirs(index_dir)
        ]
    )
    want = run.merge(full, on="doc_id", how="left").sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_run_flagship_smoke(ray_session, tmp_path, sf_dir):
    out = run_flagship(sf_dir, str(tmp_path / "flg"))
    assert len(out) > 0
    assert {"query_id", "rank", "doc_id", "score", "repo", "path"} <= set(out.columns)
    assert out["repo"].notna().all() and out["path"].notna().all()
    # dense ids equal documents.doc_id (documents_as_corpus preserves order)
    assert out["path"].str.fullmatch(r"docs/\d+\.txt").all()
