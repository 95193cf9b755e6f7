"""Serving-tier sort queries: QueryRouter.sort_search parity with the
batch docvalues.sort_search pipeline (single + multi-key, layer present
or not, searchAfter, admission accounting)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.docvalues import build_sort_index, sort_search
from splade_ray.query import QueryRouter

N = 90
QUERIES = [(1, "def parse merge"), (2, "return x1 += 1"), (3, "zzz_none")]


@pytest.fixture()
def index(ray_session, tmp_path):
    t = synth_corpus(N, seed=31)
    sizes = np.array([len(x) for x in t["content"].to_pylist()], np.int64)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(N, dtype=np.int64)),
            "content": t["content"],
            "n_bytes": pa.array(sizes),
            "cat": pa.array([f"s{i % 4}" for i in range(N)], pa.string()),
        }), corpus)
    d = str(tmp_path / "index")
    build_index(corpus, d, text_col="content", id_col="doc_id",
                rows_per_segment=25, extra_doc_cols=("n_bytes", "cat"))
    return d


def test_router_sort_parity(index):
    r = QueryRouter.remote(index, num_shards=2)
    # single key
    want = sort_search(index, QUERIES, sort_col="n_bytes", top_k=7)
    got = ray.get(r.sort_search.remote(QUERIES, sort_col="n_bytes", top_k=7))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # multi-key with a string column
    keys = [("cat", False), ("n_bytes", True)]
    want_m = sort_search(index, QUERIES, sort_keys=keys, top_k=7)
    got_m = ray.get(r.sort_search.remote(QUERIES, sort_keys=keys, top_k=7))
    pd.testing.assert_frame_equal(got_m, want_m, check_dtype=False)
    # searchAfter cursor through the router
    cursors = {
        int(qid): (str(g["cat"].iloc[-1]), int(g["n_bytes"].iloc[-1]),
                   int(g["doc_id"].iloc[-1]))
        for qid, g in got_m.groupby("query_id")
    }
    want_2 = sort_search(index, QUERIES, sort_keys=keys, top_k=7,
                         after=cursors)
    got_2 = ray.get(r.sort_search.remote(QUERIES, sort_keys=keys, top_k=7,
                                         after=cursors))
    pd.testing.assert_frame_equal(got_2, want_2, check_dtype=False)
    # sort requests take admission slots like scoring requests
    st = ray.get(r.stats.remote())
    assert st["admitted"] == 3
    # BM25 still serves through the same router
    bm = ray.get(r.search.remote(QUERIES[:1], BM25Params(top_k=3)))
    assert not bm.empty
    ray.get(r.shutdown.remote())
    ray.kill(r)


def test_router_sort_uses_layer_and_validates(index):
    keys = [("cat", False), ("n_bytes", True)]
    build_sort_index(index, keys=keys)
    build_sort_index(index, "n_bytes", descending=True)
    r = QueryRouter.remote(index, num_shards=2)
    want = sort_search(index, QUERIES, sort_keys=keys, top_k=6)
    # two calls: the second serves permutations from the actor cache
    got1 = ray.get(r.sort_search.remote(QUERIES, sort_keys=keys, top_k=6))
    got2 = ray.get(r.sort_search.remote(QUERIES, sort_keys=keys, top_k=6))
    pd.testing.assert_frame_equal(got1, want, check_dtype=False)
    pd.testing.assert_frame_equal(got2, want, check_dtype=False)
    ws = sort_search(index, QUERIES, sort_col="n_bytes", top_k=6)
    gs = ray.get(r.sort_search.remote(QUERIES, sort_col="n_bytes", top_k=6))
    pd.testing.assert_frame_equal(gs, ws, check_dtype=False)
    # spec validation
    with pytest.raises(ray.exceptions.RayTaskError):
        ray.get(r.sort_search.remote(QUERIES))
    ray.get(r.shutdown.remote())
    ray.kill(r)


def test_router_agg_parity(index):
    """QueryRouter.agg_search parity with match_counts / numeric_stats /
    numeric_histogram for count / stats / extended stats / histogram."""
    from splade_ray.docvalues import (
        match_counts,
        numeric_histogram,
        numeric_stats,
    )

    r = QueryRouter.remote(index, num_shards=2)
    got_c = ray.get(r.agg_search.remote(QUERIES, kind="count"))
    pd.testing.assert_frame_equal(
        got_c, match_counts(index, QUERIES), check_dtype=False)
    got_s = ray.get(r.agg_search.remote(QUERIES, kind="stats",
                                        col="n_bytes"))
    pd.testing.assert_frame_equal(
        got_s, numeric_stats(index, QUERIES, numeric_col="n_bytes"),
        check_dtype=False)
    got_e = ray.get(r.agg_search.remote(QUERIES, kind="stats",
                                        col="n_bytes", extended=True))
    pd.testing.assert_frame_equal(
        got_e, numeric_stats(index, QUERIES, numeric_col="n_bytes",
                             extended=True),
        check_dtype=False)
    got_h = ray.get(r.agg_search.remote(QUERIES, kind="histogram",
                                        col="n_bytes", interval=40))
    pd.testing.assert_frame_equal(
        got_h, numeric_histogram(index, QUERIES, numeric_col="n_bytes",
                                 interval=40),
        check_dtype=False)
    st = ray.get(r.stats.remote())
    assert st["admitted"] == 4  # aggs take admission slots too
    # validation surfaces cleanly
    with pytest.raises(ray.exceptions.RayTaskError):
        ray.get(r.agg_search.remote(QUERIES, kind="stats"))
    with pytest.raises(ray.exceptions.RayTaskError):
        ray.get(r.agg_search.remote(QUERIES, kind="histogram",
                                    col="n_bytes", interval=0))
    with pytest.raises(ray.exceptions.RayTaskError):
        ray.get(r.agg_search.remote(QUERIES, kind="percentile"))
    ray.get(r.shutdown.remote())
    ray.kill(r)


def test_router_sort_agg_request_cache(index):
    """Sort and agg results share the router request cache: repeat
    requests hit (no admission slot), parity preserved, spec changes
    miss, scoring keys stay disjoint."""
    r = QueryRouter.remote(index, num_shards=2, cache_size=64)
    keys = [("cat", False), ("n_bytes", True)]
    a1 = ray.get(r.sort_search.remote(QUERIES, sort_keys=keys, top_k=5))
    a2 = ray.get(r.sort_search.remote(QUERIES, sort_keys=keys, top_k=5))
    pd.testing.assert_frame_equal(a1, a2)
    st = ray.get(r.stats.remote())
    assert st["admitted"] == 1 and st["cache_hits"] == len(QUERIES)
    b1 = ray.get(r.agg_search.remote(QUERIES, kind="histogram",
                                     col="n_bytes", interval=40))
    b2 = ray.get(r.agg_search.remote(QUERIES, kind="histogram",
                                     col="n_bytes", interval=40))
    pd.testing.assert_frame_equal(b1, b2)
    st = ray.get(r.stats.remote())
    assert st["admitted"] == 2
    # spec change (interval) misses; scoring request has its own keys
    ray.get(r.agg_search.remote(QUERIES, kind="histogram",
                                col="n_bytes", interval=20))
    ray.get(r.search.remote(QUERIES, BM25Params(top_k=5)))
    st = ray.get(r.stats.remote())
    assert st["admitted"] == 4
    # parity with batch pipelines through the cached router
    from splade_ray.docvalues import numeric_histogram

    pd.testing.assert_frame_equal(
        b2, numeric_histogram(index, QUERIES, numeric_col="n_bytes",
                              interval=40),
        check_dtype=False)
    want = sort_search(index, QUERIES, sort_keys=keys, top_k=5)
    pd.testing.assert_frame_equal(a2, want, check_dtype=False)
    ray.get(r.shutdown.remote())
    ray.kill(r)
