"""Federated multi-index search: combined-stats parity with a single index
over the union corpus (the Lucene MultiReader contract)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.multi import combined_stats, search_multi
from splade_ray.query import search

N = 140
QUERIES = [(1, "def parse merge"), (2, "return x1 += 1"), (3, "select value")]


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=13)
    ids = np.arange(N, dtype=np.int64)
    full = pa.table({"doc_id": pa.array(ids), "text": t["content"]})
    pq.write_table(full, str(tmp_path / "full.parquet"))
    pq.write_table(full.slice(0, 80), str(tmp_path / "a.parquet"))
    pq.write_table(full.slice(80, 60), str(tmp_path / "b.parquet"))

    union = str(tmp_path / "union")
    build_index(str(tmp_path / "full.parquet"), union, text_col="text",
                id_col="doc_id", rows_per_segment=35)
    members = []
    for name in ("a", "b"):
        d = str(tmp_path / f"idx_{name}")
        build_index(str(tmp_path / f"{name}.parquet"), d, text_col="text",
                    id_col="doc_id", rows_per_segment=35)
        members.append(d)
    return union, members


def test_search_multi_matches_union_index(built):
    union, members = built
    p = BM25Params(top_k=12)
    for scoring in ("bm25", "ql"):
        got = search_multi(members, QUERIES, p, scoring=scoring)
        want = search(union, QUERIES, p, scoring=scoring)
        pd.testing.assert_frame_equal(
            got[["query_id", "rank", "doc_id", "score"]], want,
            check_dtype=False,
        )
    # the index column routes each hit to its member
    got = search_multi(members, QUERIES, p)
    assert ((got["doc_id"] < 80) == (got["index"] == 0)).all()


def test_search_multi_stats_are_union(built):
    union, members = built
    from splade_ray.build import load_manifest

    s = combined_stats(members, QUERIES)
    um = load_manifest(union)
    assert s["n_docs"] == um["n_docs"]
    assert abs(s["avgdl"] - um["avgdl"]) < 1e-12

    # single-member federation == plain search on that member
    p = BM25Params(top_k=8)
    got = search_multi(members[:1], QUERIES, p)
    want = search(members[0], QUERIES, p)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "score"]], want, check_dtype=False
    )


def test_search_multi_member_ranks_differ_from_isolated(built):
    """Scoring a member under its OWN stats ranks differently than under
    the union (df/avgdl shift) — the point of combined statistics."""
    union, members = built
    p = BM25Params(top_k=12)
    fed = search_multi(members, QUERIES, p)
    iso = search(members[0], QUERIES, p)
    fed0 = fed[(fed["index"] == 0) & (fed["query_id"] == 1)]
    iso0 = iso[iso["query_id"] == 1]
    common = set(fed0["doc_id"]) & set(iso0["doc_id"])
    assert common
    f = fed0.set_index("doc_id")["score"]
    i = iso0.set_index("doc_id")["score"]
    assert any(abs(f[d] - i[d]) > 1e-9 for d in common)

def test_boolean_search_multi_matches_union_index(built):
    from splade_ray.boolq import boolean_search
    from splade_ray.multi import boolean_search_multi

    union, members = built
    bq = [
        (1, {"must": "def", "should": "parse merge"}),
        (2, {"should": "return value", "must_not": "select"}),
        (3, {"must": "x1", "should": "select value"}),
    ]
    p = BM25Params(top_k=12)
    got = boolean_search_multi(members, bq, p)
    want = boolean_search(union, bq, p)
    pd.testing.assert_frame_equal(
        got[["query_id", "rank", "doc_id", "score"]], want, check_dtype=False
    )
    assert ((got["doc_id"] < 80) == (got["index"] == 0)).all()


def test_phrase_topk_multi_matches_union_index(built, tmp_path):
    from splade_ray.multi import phrase_topk_multi
    from splade_ray.positions import build_positions, phrase_topk

    union, members = built
    for d in [union, *members]:
        build_positions(d)
    phrases = [(1, "def parse"), (2, "return x1")]
    p = BM25Params(top_k=10)
    got = phrase_topk_multi(members, phrases, p)
    want = phrase_topk(union, phrases, p)
    pd.testing.assert_frame_equal(
        got[["phrase_id", "rank", "doc_id", "score"]], want, check_dtype=False
    )
    assert ((got["doc_id"] < 80) == (got["index"] == 0)).all()


def test_search_fielded_multi_matches_union_index(built, tmp_path):
    """Two-field federation: per-field union stats -> parity with the
    per-field union indexes, for both sum and dismax modes."""
    from splade_ray.multi import search_fielded_multi
    from splade_ray.query import search_fielded

    t = synth_corpus(N, seed=13)
    ids = np.arange(N, dtype=np.int64)
    title = pa.array([s.split("\n")[0][:40] for s in t["content"].to_pylist()])
    full = pa.table({"doc_id": pa.array(ids), "text": t["content"],
                     "title": title})
    slices = {"full": full, "a": full.slice(0, 80), "b": full.slice(80, 60)}
    built_f = {}
    for name, tbl in slices.items():
        pq.write_table(tbl, str(tmp_path / f"f_{name}.parquet"))
        built_f[name] = {}
        for fld in ("text", "title"):
            d = str(tmp_path / f"fidx_{name}_{fld}")
            build_index(str(tmp_path / f"f_{name}.parquet"), d, text_col=fld,
                        id_col="doc_id", rows_per_segment=35)
            built_f[name][fld] = d
    weights = {"text": 1.0, "title": 2.0}
    p = BM25Params(top_k=12)
    for mode in ("sum", "dismax"):
        got = search_fielded_multi(
            [built_f["a"], built_f["b"]], QUERIES, weights, p, mode=mode
        )
        want = search_fielded(built_f["full"], QUERIES, weights, p, mode=mode)
        pd.testing.assert_frame_equal(
            got[["query_id", "rank", "doc_id", "score"]], want,
            check_dtype=False,
        )
