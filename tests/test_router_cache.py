"""QueryRouter-level request cache (ES request cache at the coordinating
tier): hits skip admission AND the shard fan-out; parity with the
uncached router and the batch query pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.query import QueryRouter, search


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


def test_router_cache_hits_and_parity(index):
    r = QueryRouter.remote(index, num_shards=2, cache_size=8)
    qs = [(1, "def parse"), (2, "merge sort"), (3, "zzz_nohit")]
    p = BM25Params(top_k=5)
    first = ray.get(r.search.remote(qs, p))
    st = ray.get(r.stats.remote())
    assert st["cache_misses"] == 3 and st["cache_hits"] == 0
    assert st["admitted"] == 1
    second = ray.get(r.search.remote(qs, p))
    st = ray.get(r.stats.remote())
    assert st["cache_hits"] == 3
    # full-hit request never took an admission slot
    assert st["admitted"] == 1
    pd.testing.assert_frame_equal(first, second)
    # parity with the uncached batch pipeline
    want = search(index, qs, p)
    pd.testing.assert_frame_equal(first, want, check_dtype=False)
    # same text under a new qid -> hit (key is text+knobs, not qid)
    third = ray.get(r.search.remote([(9, "def parse")], p))
    st = ray.get(r.stats.remote())
    assert st["cache_hits"] == 4 and st["admitted"] == 1
    assert (third["query_id"] == 9).all()
    # different params miss and fan out
    ray.get(r.search.remote(qs, BM25Params(top_k=3)))
    st = ray.get(r.stats.remote())
    assert st["cache_misses"] == 6 and st["admitted"] == 2
    ray.get(r.shutdown.remote())
    ray.kill(r)


def test_router_cache_mixed_batch_fans_out_misses_only(index):
    r = QueryRouter.remote(index, num_shards=2, cache_size=8)
    p = BM25Params(top_k=5)
    ray.get(r.search.remote([(1, "def parse")], p))
    # batch of one hit + one miss: one admission, one miss recorded
    out = ray.get(r.search.remote([(1, "def parse"), (2, "merge sort")], p))
    st = ray.get(r.stats.remote())
    assert st["cache_hits"] == 1 and st["cache_misses"] == 2
    assert st["admitted"] == 2
    want = search(index, [(1, "def parse"), (2, "merge sort")], p)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    ray.get(r.shutdown.remote())
    ray.kill(r)


def test_router_cache_eviction_still_returns_results(index):
    r = QueryRouter.remote(index, num_shards=2, cache_size=1)
    qs = [(1, "def parse"), (2, "merge sort")]
    p = BM25Params(top_k=5)
    out = ray.get(r.search.remote(qs, p))
    assert set(out["query_id"]) == {1, 2}
    want = search(index, qs, p)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    ray.get(r.shutdown.remote())
    ray.kill(r)


def test_router_cache_disabled_by_default(index):
    r = QueryRouter.remote(index, num_shards=2)
    qs = [(1, "def parse")]
    p = BM25Params(top_k=5)
    a = ray.get(r.search.remote(qs, p))
    b = ray.get(r.search.remote(qs, p))
    st = ray.get(r.stats.remote())
    assert st["cache_hits"] == 0 and st["cache_misses"] == 0
    assert st["admitted"] == 2
    pd.testing.assert_frame_equal(a, b)
    ray.get(r.shutdown.remote())
    ray.kill(r)


def test_router_cache_hit_survives_eviction_during_fetch(index):
    # regression (round-5 ADVICE, high): with cache_size=1, a batch of
    # [hit, miss] evicts the hit's entry when the miss result is inserted;
    # assembly must use the frame snapshotted at check time instead of
    # re-reading the cache (which KeyError'd here before the fix)
    r = QueryRouter.remote(index, num_shards=2, cache_size=1)
    p = BM25Params(top_k=5)
    ray.get(r.search.remote([(1, "def parse")], p))  # warm the one slot
    out = ray.get(r.search.remote([(1, "def parse"), (2, "merge sort")], p))
    st = ray.get(r.stats.remote())
    assert st["cache_hits"] == 1 and st["cache_misses"] == 2
    want = search(index, [(1, "def parse"), (2, "merge sort")], p)
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    ray.get(r.shutdown.remote())
    ray.kill(r)


def test_router_cache_repeated_qid_two_texts_not_conflated(index):
    # regression (round-5 ADVICE, low): a batch repeating one qid under
    # two DIFFERENT texts used to collapse to one bookkeeping key — the
    # second text's rows leaked into the first's cache entry. Bookkeeping
    # is per-position now and misses fetch in unique-qid waves.
    r = QueryRouter.remote(index, num_shards=2, cache_size=8)
    p = BM25Params(top_k=5)
    out = ray.get(r.search.remote([(7, "def parse"), (7, "merge sort")], p))
    a = search(index, [(7, "def parse")], p)
    b = search(index, [(7, "merge sort")], p)
    want = (
        pd.concat([a, b], ignore_index=True)
        .sort_values(["query_id", "rank", "doc_id", "score"])
        .reset_index(drop=True)
    )
    got = (out.sort_values(["query_id", "rank", "doc_id", "score"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the cache entries themselves stayed clean: each text alone now hits
    # and returns exactly its own rows
    one = ray.get(r.search.remote([(7, "merge sort")], p))
    st = ray.get(r.stats.remote())
    assert st["cache_hits"] == 1
    pd.testing.assert_frame_equal(one, b, check_dtype=False)
    ray.get(r.shutdown.remote())
    ray.kill(r)


def test_router_cache_same_text_two_qids_single_fetch(index):
    # same text (= same cache key, qid is not part of it) under two qids
    # in one cold batch: fetched once, each position re-stamped with its
    # own qid
    r = QueryRouter.remote(index, num_shards=2, cache_size=8)
    p = BM25Params(top_k=5)
    out = ray.get(r.search.remote([(1, "def parse"), (2, "def parse")], p))
    st = ray.get(r.stats.remote())
    assert st["admitted"] == 1  # one wave, one fan-out
    assert set(out["query_id"]) == {1, 2}
    one = search(index, [(1, "def parse")], p)
    got1 = out[out["query_id"] == 1].reset_index(drop=True)
    got2 = out[out["query_id"] == 2].reset_index(drop=True)
    pd.testing.assert_frame_equal(got1, one, check_dtype=False)
    assert (got2.drop(columns=["query_id"]).to_numpy()
            == got1.drop(columns=["query_id"]).to_numpy()).all()
    ray.get(r.shutdown.remote())
    ray.kill(r)
