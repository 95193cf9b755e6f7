"""Searcher request cache (ES request-cache analog)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd
import pytest

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.query import Searcher, search


@pytest.fixture()
def index(ray_session, tmp_path):
    t = synth_corpus(60, seed=13)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(60, dtype=np.int64)),
                  "content": t["content"]}), corpus)
    d = str(tmp_path / "index")
    build_index(corpus, d, text_col="content", id_col="doc_id",
                rows_per_segment=20)
    return d


def test_cache_hits_and_parity(index):
    s = Searcher(index, num_shards=2, cache_size=8)
    qs = [(1, "def parse"), (2, "merge sort"), (3, "zzz_nohit")]
    p = BM25Params(top_k=5)
    first = s.search(qs, p)
    assert s.cache_misses == 3 and s.cache_hits == 0
    second = s.search(qs, p)
    assert s.cache_hits == 3
    pd.testing.assert_frame_equal(first, second)
    # parity with the uncached pipeline
    want = search(index, qs, p)
    pd.testing.assert_frame_equal(first, want, check_dtype=False)
    # same text under a new qid reuses nothing (key includes qid-specific
    # cursor only; text is shared) -> hit
    third = s.search([(9, "def parse")], p)
    assert s.cache_hits == 4
    assert (third["query_id"] == 9).all()
    # different params miss
    s.search(qs, BM25Params(top_k=3))
    assert s.cache_misses == 6
    s.shutdown()


def test_cache_eviction_still_returns_results(index):
    s = Searcher(index, num_shards=2, cache_size=1)
    qs = [(1, "def parse"), (2, "merge sort")]
    p = BM25Params(top_k=5)
    out = s.search(qs, p)
    assert set(out["query_id"]) == {1, 2}
    want = search(index, qs, p)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    s.shutdown()


def test_cache_disabled_by_default(index):
    s = Searcher(index, num_shards=2)
    qs = [(1, "def parse")]
    s.search(qs, BM25Params(top_k=5))
    s.search(qs, BM25Params(top_k=5))
    assert s.cache_hits == 0 and s.cache_misses == 0
    s.shutdown()
