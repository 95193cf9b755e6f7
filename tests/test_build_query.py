"""End-to-end: Ray-built index + distributed scatter-gather BM25 == numpy oracle."""

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pandas as pd
import pytest

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index, load_manifest, segment_dirs
from splade_ray.corpus import synth_corpus, write_synth_corpus
from splade_ray.oracle import OracleIndex
from splade_ray.query import Searcher, search

QUERIES = [
    (0, "def parse buffer"),
    (1, "merge heap score"),
    (2, "rare_token_3"),
    (3, "zzz_not_in_vocab"),
    (4, "import import index"),  # repeated query term -> qtf=2
    (5, "the int for while class"),  # ubiquitous terms (skew stress)
]


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    corpus_dir = str(root / "corpus")
    index_dir = str(root / "index")
    write_synth_corpus(corpus_dir, n_docs=400, seed=42, n_files=3)
    manifest = build_index(
        corpus_dir, index_dir, text_col="content", rows_per_segment=60, block_size=16
    )
    return corpus_dir, index_dir, manifest


def _oracle_run(params=None):
    t = synth_corpus(400, seed=42)
    oi = OracleIndex(np.arange(400), t["content"].to_pylist(), params)
    return oi.search(QUERIES)


def test_manifest_counts(built):
    _, index_dir, manifest = built
    assert manifest["n_docs"] == 400
    assert manifest["n_segments"] == 9  # 3 files of 134/134/132 rows, 60 rows/segment
    assert manifest["avgdl"] > 0


def test_compaction_preserves_results(ray_session, tmp_path):
    """Tiered merge: 9 segments -> 3 -> 1; exact AND BMW runs bit-identical
    before/after (BMW exercises the merged ragged block metadata), sha
    invariant still verifies, manifest counts consistent."""
    from splade_ray.compact import compact_segments
    from splade_ray.ingest import verify_sha_invariant

    corpus = str(tmp_path / "c")
    write_synth_corpus(corpus, 400, seed=42, n_files=3)
    idx = str(tmp_path / "i")
    build_index(corpus, idx, text_col="content", rows_per_segment=60, block_size=16)
    p = BM25Params(top_k=10)
    before_exact = search(idx, QUERIES, p, method="exact")
    before_bmw = search(idx, QUERIES, p, method="bmw")

    m = compact_segments(idx, group_size=4)
    assert m["n_segments"] == 3
    pd.testing.assert_frame_equal(before_exact, search(idx, QUERIES, p, method="exact"))
    pd.testing.assert_frame_equal(before_bmw, search(idx, QUERIES, p, method="bmw"))
    rep = verify_sha_invariant(idx, corpus)
    assert rep == {"n_docs": 400, "segment_rollups_ok": True, "source_checked": True}

    # second tier: 3 -> 1
    m = compact_segments(idx, group_size=8)
    assert m["n_segments"] == 1 and m["compactions"] == 2
    pd.testing.assert_frame_equal(before_exact, search(idx, QUERIES, p, method="exact"))
    pd.testing.assert_frame_equal(before_bmw, search(idx, QUERIES, p, method="bmw"))


def test_quantized_scoring_matches_manual(built):
    """Integer quantized run == manual Σ qtf·impact_q over the corpus, with
    impact_q = floor(idf·tf_comp·100 + 0.5) (the quantized_export values);
    mismatched BM25 params must be refused."""
    from splade_ray.analysis import term_counts
    from splade_ray.bm25 import idf, tf_component
    from splade_ray.quantized import build_quantized_postings

    _, index_dir, manifest = built
    rep = build_quantized_postings(index_dir, BM25Params())
    assert rep["factor"] == 100
    run = search(index_dir, QUERIES, BM25Params(top_k=10), method="quantized")

    # manual quantized scores
    t = synth_corpus(400, seed=42)
    texts = t["content"].to_pylist()
    counts = [term_counts(x) for x in texts]
    dls = np.array([sum(c.values()) for c in counts], np.float64)
    n = len(texts)
    avgdl = dls.mean()
    dfm: dict[str, int] = {}
    for c in counts:
        for term in c:
            dfm[term] = dfm.get(term, 0) + 1
    p = BM25Params()
    exp_rows = []
    for qid, qtext in QUERIES:
        scores = np.zeros(n, np.int64)
        for term, qtf in sorted(term_counts(qtext).items()):
            if term not in dfm:
                continue
            w = idf(dfm[term], n)
            for d, c in enumerate(counts):
                tf = c.get(term)
                if tf:
                    imp = int(np.floor(
                        w * float(tf_component(np.array([tf], float),
                                               dls[d:d + 1], avgdl, p)[0]) * 100 + 0.5))
                    if imp > 0:
                        scores[d] += qtf * imp
        order = np.lexsort((np.arange(n), -scores))
        kept = [(qid, int(d), int(scores[d])) for d in order if scores[d] > 0][:10]
        exp_rows.extend(kept)
    got = [(int(q), int(d), int(s)) for q, d, s in
           zip(run["query_id"], run["doc_id"], run["score"])]
    assert got == exp_rows

    with pytest.raises(ValueError, match="quantized layer built with"):
        search(index_dir, QUERIES, BM25Params(k1=2.0), method="quantized")


def test_run_matches_oracle_exactly(built):
    _, index_dir, _ = built
    run = search(index_dir, QUERIES)
    expected = _oracle_run()
    assert len(run) == len(expected)
    er = expected.reset_index(drop=True)
    rr = run.reset_index(drop=True)
    assert rr["query_id"].tolist() == er["query_id"].tolist()
    assert rr["rank"].tolist() == er["rank"].tolist()
    assert rr["doc_id"].tolist() == er["doc_id"].tolist()
    # float64 fixed-order accumulation -> exact equality
    assert np.array_equal(rr["score"].to_numpy(), er["score"].to_numpy())


def test_searcher_actor_pool_matches(built):
    _, index_dir, _ = built
    s = Searcher(index_dir, num_shards=3)
    try:
        run = s.search(QUERIES)
    finally:
        s.shutdown()
    expected = _oracle_run()
    assert run["doc_id"].tolist() == expected["doc_id"].tolist()
    assert np.array_equal(run["score"].to_numpy(), expected["score"].to_numpy())


def test_threshold_and_topk_params(built):
    _, index_dir, _ = built
    p = BM25Params(top_k=3, threshold=0.5)
    run = search(index_dir, QUERIES, p)
    expected = _oracle_run(p)
    assert run["doc_id"].tolist() == expected["doc_id"].tolist()
    assert (run.groupby("query_id").size() <= 3).all()
    assert (run["score"] > 0.5).all()


def test_sha256_invariant(built):
    corpus_dir, index_dir, _ = built
    import hashlib

    src = pq.read_table(corpus_dir, columns=["content"])
    want = [hashlib.sha256(x.encode()).hexdigest() for x in src["content"].to_pylist()]
    got = []
    for seg in segment_dirs(index_dir):
        t = pq.read_table(os.path.join(seg, "doclens.parquet"))
        got.extend(t["content_sha256"].to_pylist())
    assert got == want


def test_empty_docs_counted_not_posted(built):
    _, index_dir, _ = built
    n = 0
    for seg in segment_dirs(index_dir):
        t = pq.read_table(os.path.join(seg, "doclens.parquet"))
        n += t.num_rows
    assert n == 400  # empty docs keep their docs row (doc_len=0), no postings


def test_resume_skips_valid_segments(built, tmp_path):
    corpus_dir, index_dir, _ = built
    m1 = load_manifest(index_dir)
    # delete one segment -> rebuild only that one
    victim = segment_dirs(index_dir)[2]
    import shutil

    shutil.rmtree(victim)
    m2 = build_index(
        corpus_dir, index_dir, text_col="content", rows_per_segment=60, block_size=16
    )
    assert m2["n_segments_skipped"] == m2["n_segments"] - 1
    assert m2["n_docs"] == m1["n_docs"]
    assert m2["n_postings"] == m1["n_postings"]
    # rebuilt index still answers identically
    run = search(index_dir, QUERIES)
    expected = _oracle_run()
    assert run["doc_id"].tolist() == expected["doc_id"].tolist()
    assert np.array_equal(run["score"].to_numpy(), expected["score"].to_numpy())


def test_lexicon_matches_flat_groupby(built):
    _, index_dir, _ = built
    import collections

    from splade_ray.analysis import term_counts

    t = synth_corpus(400, seed=42)
    df = collections.Counter()
    cf = collections.Counter()
    for text in t["content"].to_pylist():
        c = term_counts(text)
        df.update(c.keys())
        for k, v in c.items():
            cf[k] += v
    lex = pq.read_table(os.path.join(index_dir, "lexicon"))
    got = {
        t_: (d, c)
        for t_, d, c in zip(
            lex["term"].to_pylist(), lex["df"].to_pylist(), lex["cf"].to_pylist()
        )
    }
    assert got == {k: (df[k], cf[k]) for k in df}


def test_resume_after_simulated_crash(ray_session, tmp_path):
    """Kill-mid-build semantics (SURVEY.md §5): a leftover .tmp segment dir,
    a missing segment and a corrupted manifest are all rebuilt on re-run;
    untouched segments are skipped; final index equals a clean build."""
    import glob
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    from splade_ray.build import build_index
    from splade_ray.corpus import write_synth_corpus

    corpus = str(tmp_path / "corpus")
    write_synth_corpus(corpus, 120, seed=11, n_files=2)
    idx = str(tmp_path / "idx")
    m0 = build_index(corpus, idx, text_col="content", rows_per_segment=30)
    clean = {
        seg: pq.read_table(seg + "/postings.parquet")
        for seg in sorted(glob.glob(idx + "/segments/seg=*"))
    }

    # simulate a crash: leftover tmp dir, one segment gone, one manifest corrupt
    os.makedirs(idx + "/segments/.tmp-000001-deadbeef", exist_ok=True)
    shutil.rmtree(idx + "/segments/seg=000002")
    mpath = idx + "/segments/seg=000000/manifest.json"
    with open(mpath, "w") as fh:
        fh.write("{ truncated")

    m1 = build_index(corpus, idx, text_col="content", rows_per_segment=30)
    assert m1["n_segments"] == m0["n_segments"]
    assert m1["n_segments_skipped"] == m0["n_segments"] - 2  # two rebuilt
    for seg, want in clean.items():
        assert pq.read_table(seg + "/postings.parquet").equals(want), seg
    assert json.load(open(mpath))["completed"] is True


def test_search_query_chunking(ray_session, tmp_path):
    """Chunked query scatter (segments x chunks grid) returns the identical
    run as a single chunk."""
    from splade_ray.bm25 import BM25Params
    from splade_ray.build import build_index
    from splade_ray.corpus import write_synth_corpus
    from splade_ray.query import search

    corpus = str(tmp_path / "c")
    write_synth_corpus(corpus, 100, seed=21, n_files=2)
    idx = str(tmp_path / "i")
    build_index(corpus, idx, text_col="content", rows_per_segment=40)
    queries = [(i, f"def return ident_{i % 5} parse stream") for i in range(9)]
    p = BM25Params(top_k=5)
    one = search(idx, queries, p, query_chunk_size=100)
    many = search(idx, queries, p, query_chunk_size=2)  # 5 chunks x 3 segments
    pd.testing.assert_frame_equal(one, many)


def test_search_auto_matches_exact(ray_session, tmp_path):
    """The adaptive kernel (density-based exact/BMW switch) returns the
    identical run to the exact kernel — including the mixed case where some
    query terms are ubiquitous (dense) and others rare (sparse)."""
    from splade_ray.bm25 import BM25Params
    from splade_ray.build import build_index
    from splade_ray.corpus import write_synth_corpus
    from splade_ray.query import search

    corpus = str(tmp_path / "c")
    write_synth_corpus(corpus, 150, seed=33, n_files=2)
    idx = str(tmp_path / "i")
    build_index(corpus, idx, text_col="content", rows_per_segment=50)
    queries = [
        (0, "def return parse"),          # dense: keywords in most docs
        (1, "rare_token_20"),             # sparse: unique token
        (2, "def rare_token_54 stream"),  # mixed
    ]
    p = BM25Params(top_k=7)
    exact = search(idx, queries, p, method="exact")
    auto = search(idx, queries, p, method="auto")
    pd.testing.assert_frame_equal(exact, auto)

    # small segments route everything exact; force the BMW leg by dropping
    # the size gate and re-check identity of the split path
    from unittest import mock

    from splade_ray.query import SegmentIndex

    with mock.patch.object(SegmentIndex, "AUTO_MIN_DOCS_FOR_BMW", 1), \
         mock.patch.object(SegmentIndex, "AUTO_DENSITY_CUTOFF", 0.5):
        auto_split = search(idx, queries, p, method="auto")
    pd.testing.assert_frame_equal(exact, auto_split)


def test_quantized_bmw_matches_quantized_exact(built):
    """The integer block-skipping kernel returns exactly the quantized exact
    scorer's runs (same scores, same tie order) — including repeated-term
    queries and ubiquitous-term (skew) queries."""
    from splade_ray.quantized import build_quantized_postings

    _, index_dir, _ = built
    build_quantized_postings(index_dir, BM25Params())
    p = BM25Params(top_k=10)
    exact = search(index_dir, QUERIES, p, method="quantized")
    bmw = search(index_dir, QUERIES, p, method="quantized_bmw")
    pd.testing.assert_frame_equal(exact, bmw)


def test_lang_aware_build_and_query(ray_session, tmp_path):
    """build_index(lang_col=...): each doc tokenized by its language's
    registered analyzer; query analyzed per query_lang. Identifier
    'alpha_beta' is searchable as 'alpha' in a py doc (underscore splits)
    but only as the whole identifier in a js doc; changing lang_col
    invalidates segment skip-matching."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "c"
    d.mkdir()
    t = pa.table(
        {
            "repo": ["r"] * 4,
            "path": [f"p{i}" for i in range(4)],
            "commit": ["x"] * 4,
            "lang": ["py", "js", "py", "js"],
            "content": [
                "alpha_beta gamma",
                "alpha_beta gamma",
                "delta epsilon",
                "delta epsilon",
            ],
        }
    )
    pq.write_table(t, str(d / "a.parquet"))
    idx = str(tmp_path / "i")
    m = build_index(str(d), idx, text_col="content", lang_col="lang",
                    rows_per_segment=2)
    assert m["lang_col"] == "lang"

    p = BM25Params(top_k=5)
    # 'alpha' exists only via the py analyzer's underscore split -> doc 0
    run = search(idx, [(0, "alpha")], p, query_lang="py")
    assert run["doc_id"].tolist() == [0]
    # the whole identifier is a term only in the js doc -> doc 1
    run = search(idx, [(0, "alpha_beta")], p)
    assert run["doc_id"].tolist() == [1]
    # terms common to both analyzers hit both docs
    run = search(idx, [(0, "gamma")], p)
    assert sorted(run["doc_id"]) == [0, 1]

    # rebuild with same lang_col skips; without lang_col rebuilds everything
    m2 = build_index(str(d), idx, text_col="content", lang_col="lang",
                     rows_per_segment=2)
    assert m2["n_segments_skipped"] == m2["n_segments"]
    m3 = build_index(str(d), idx, text_col="content", rows_per_segment=2)
    assert m3["n_segments_skipped"] == 0


def test_query_router_matches_searcher(built):
    """The serving router (one-call fan-out/merge inside an actor) returns
    the same runs as the driver-side Searcher, for float and quantized
    kernels."""
    import ray as _ray

    from splade_ray.quantized import build_quantized_postings
    from splade_ray.query import QueryRouter

    _, index_dir, _ = built
    build_quantized_postings(index_dir, BM25Params())
    for method in ("exact", "quantized"):
        router = QueryRouter.remote(index_dir, num_shards=3, method=method)
        try:
            got = _ray.get(router.search.remote(QUERIES, BM25Params(top_k=10)))
        finally:
            _ray.get(router.shutdown.remote())
            _ray.kill(router)
        s = Searcher(index_dir, num_shards=3, method=method)
        try:
            want = s.search(QUERIES, BM25Params(top_k=10))
        finally:
            s.shutdown()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True)
        )


def test_requantize_with_new_params_invalidates_layer(ray_session, tmp_path):
    """Changing (factor, k1, b) must rebuild every segment's postings_q, not
    skip stale files under a fresh manifest."""
    from splade_ray.quantized import build_quantized_postings

    corpus = str(tmp_path / "c")
    write_synth_corpus(corpus, 80, seed=6, n_files=1)
    idx = str(tmp_path / "i")
    build_index(corpus, idx, text_col="content", rows_per_segment=40)
    r1 = build_quantized_postings(idx, BM25Params(), factor=100)
    assert r1["segments_quantized"] == 2
    # same params -> all skipped
    r2 = build_quantized_postings(idx, BM25Params(), factor=100)
    assert r2["segments_quantized"] == 0
    # new factor -> full rebuild, and scores scale with the new factor
    r3 = build_quantized_postings(idx, BM25Params(), factor=1000)
    assert r3["segments_quantized"] == 2
    run100 = None
    run1000 = search(idx, [(0, "def parse")], BM25Params(top_k=3), method="quantized")
    build_quantized_postings(idx, BM25Params(), factor=100)
    run100 = search(idx, [(0, "def parse")], BM25Params(top_k=3), method="quantized")
    assert (run1000["score"].to_numpy() > run100["score"].to_numpy() * 5).all()


def test_quantized_pending_marker_blocks_and_recovers(ray_session, tmp_path):
    """Crash-safe quantized layer (round-2 ADVICE item 1): the manifest is
    written pending=true BEFORE segment tasks; a pending layer refuses to
    serve; stale per-segment files from an unknown or crashed run are
    invalidated, never silently mixed."""
    import json as _json

    from splade_ray.quantized import build_quantized_postings, load_quantized_manifest

    corpus = str(tmp_path / "c")
    write_synth_corpus(corpus, 80, seed=6, n_files=1)
    idx = str(tmp_path / "i")
    build_index(corpus, idx, text_col="content", rows_per_segment=40)
    r1 = build_quantized_postings(idx, BM25Params(), factor=100)
    assert r1["segments_quantized"] == 2
    assert not load_quantized_manifest(idx).get("pending")

    # simulate a factor-change run that crashed right after the marker:
    # pending manifest on disk -> every consumer must refuse
    qpath = os.path.join(idx, "quantized.json")
    with open(qpath, "w") as fh:
        _json.dump({"factor": 1000, "k1": 1.2, "b": 0.75, "pending": True}, fh)
    with pytest.raises(ValueError, match="pending"):
        search(idx, [(0, "def parse")], BM25Params(top_k=3), method="quantized")
    with pytest.raises(ValueError, match="pending"):
        Searcher(idx, method="quantized")

    # re-running with the ORIGINAL params must invalidate the (unknown-mix)
    # per-segment files recorded under the crashed run's params
    r2 = build_quantized_postings(idx, BM25Params(), factor=100)
    assert r2["segments_quantized"] == 2  # full rebuild, nothing skipped
    assert not load_quantized_manifest(idx).get("pending")
    run = search(idx, [(0, "def parse")], BM25Params(top_k=3), method="quantized")
    assert len(run) > 0

    # missing manifest but files present (legacy/unknown provenance) ->
    # rebuild everything
    os.remove(qpath)
    r3 = build_quantized_postings(idx, BM25Params(), factor=100)
    assert r3["segments_quantized"] == 2


def test_searcher_quantized_param_mismatch_raises(ray_session, tmp_path):
    """Searcher/QueryRouter must validate per-call (k1, b) against the
    quantized layer like search() does (round-2 ADVICE item 5)."""
    from splade_ray.quantized import build_quantized_postings

    corpus = str(tmp_path / "c")
    write_synth_corpus(corpus, 60, seed=7, n_files=1)
    idx = str(tmp_path / "i")
    build_index(corpus, idx, text_col="content", rows_per_segment=60)
    build_quantized_postings(idx, BM25Params(), factor=100)
    s = Searcher(idx, method="quantized")
    try:
        ok = s.search([(0, "def parse")], BM25Params(top_k=3))
        assert len(ok) > 0
        with pytest.raises(ValueError, match="k1"):
            s.search([(0, "def parse")], BM25Params(k1=2.0, top_k=3))
    finally:
        s.shutdown()


def test_compaction_crash_after_journal_recovers(ray_session, tmp_path):
    """Crash-safe compaction (round-2 ADVICE item 2): a crash after the
    journal is written loses nothing — recover_compaction completes the
    swap and the index serves identical results. A crash BEFORE the journal
    leaves the original segments untouched."""
    from splade_ray import compact as compact_mod
    from splade_ray.compact import compact_segments, recover_compaction

    corpus = str(tmp_path / "c")
    write_synth_corpus(corpus, 300, seed=9, n_files=2)
    idx = str(tmp_path / "i")
    build_index(corpus, idx, text_col="content", rows_per_segment=50)
    before = search(idx, QUERIES, BM25Params(top_k=5))
    n_segs_before = load_manifest(idx)["n_segments"]
    assert n_segs_before > 2

    # crash right after the journal lands: stage everything, journal, boom
    real_finalize = compact_mod._finalize_compaction

    def boom(index_dir, journal):
        raise RuntimeError("simulated crash after journal write")

    compact_mod._finalize_compaction = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            compact_segments(idx, group_size=3)
    finally:
        compact_mod._finalize_compaction = real_finalize

    # journal exists; sources are fully intact -> index still serves
    assert os.path.exists(os.path.join(idx, "compact-journal.json"))
    assert load_manifest(idx)["n_segments"] == n_segs_before
    mid = search(idx, QUERIES, BM25Params(top_k=5))
    pd.testing.assert_frame_equal(mid, before)

    # recovery completes the compaction
    manifest = recover_compaction(idx)
    assert manifest is not None
    assert not os.path.exists(os.path.join(idx, "compact-journal.json"))
    assert manifest["n_segments"] < n_segs_before
    after = search(idx, QUERIES, BM25Params(top_k=5))
    pd.testing.assert_frame_equal(after, before)
    # idempotent: nothing left to recover
    assert recover_compaction(idx) is None


def test_query_router_backpressure_sheds(built):
    """Bounded admission (ROADMAP: serving backpressure): with
    max_inflight=2 and slow shards, a burst of 8 concurrent requests gets
    exactly 2 admitted and 6 shed with RouterOverloaded — the router never
    queues unboundedly. Admitted requests return correct runs; counters
    reconcile."""
    import ray as _ray

    from splade_ray.query import QueryRouter, RouterOverloaded

    _, index_dir, _ = built
    router = QueryRouter.remote(
        index_dir, num_shards=2, max_inflight=2, simulate_shard_latency_s=1.0
    )
    try:
        refs = [router.search.remote(QUERIES, BM25Params(top_k=10)) for _ in range(8)]
        runs, n_shed = [], 0
        for r in refs:
            try:
                runs.append(_ray.get(r))
            except _ray.exceptions.RayTaskError as e:
                assert isinstance(e.cause, RouterOverloaded), e.cause
                n_shed += 1
        stats = _ray.get(router.stats.remote())
        assert n_shed == 6 and stats["shed"] == 6 and stats["admitted"] == 2
        assert stats["inflight"] == 0
        want = search(index_dir, QUERIES, BM25Params(top_k=10))
        for run in runs:
            pd.testing.assert_frame_equal(run.reset_index(drop=True), want)
    finally:
        _ray.get(router.shutdown.remote())
        _ray.kill(router)


def test_router_pool_failover_and_backoff(built):
    """RouterPool: sequential searches round-robin both replicas and
    return correct runs; under slow-shard load a shed request fails over /
    retries instead of raising, and only an impossible budget surfaces
    RouterOverloaded to the caller."""
    import ray as _ray

    from splade_ray.query import RouterPool, RouterOverloaded

    _, index_dir, _ = built
    want = search(index_dir, QUERIES, BM25Params(top_k=10))

    pool = RouterPool(index_dir, n_routers=2, num_shards=2, max_inflight=1)
    try:
        for _ in range(4):  # hits each replica twice
            run = pool.search(QUERIES, BM25Params(top_k=10))
            pd.testing.assert_frame_equal(run.reset_index(drop=True), want)
        st = pool.stats()
        assert st["admitted"] == 4 and st["shed"] == 0
        assert [p["admitted"] for p in st["replicas"]] == [2, 2]  # round-robin
    finally:
        pool.shutdown()

    # slow replicas, one in-flight slot each: saturate both, then a pooled
    # search with backoff must still succeed (retries > 0), and one with
    # max_sweeps exhausted under persistent saturation raises. Async actors
    # do NOT guarantee task start order, so wait until the hogs are
    # actually ADMITTED (inflight == 1 on each replica) before probing.
    import time

    pool = RouterPool(
        index_dir, n_routers=2, num_shards=2, max_inflight=1,
        simulate_shard_latency_s=1.2,
    )
    try:
        hog1 = pool.submit(QUERIES, BM25Params(top_k=10))
        hog2 = pool.submit(QUERIES, BM25Params(top_k=10))
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:
            if all(p["inflight"] == 1 for p in pool.stats()["replicas"]):
                break
            time.sleep(0.02)
        else:
            raise AssertionError("hogs never admitted")
        try:
            pool.search(QUERIES, BM25Params(top_k=10), max_sweeps=1)
            raised = False
        except RouterOverloaded:
            raised = True
        assert raised  # one sweep, both replicas busy -> surfaces shed
        run = pool.search(QUERIES, BM25Params(top_k=10), max_sweeps=10, backoff_s=0.2)
        pd.testing.assert_frame_equal(run.reset_index(drop=True), want)
        assert pool.stats()["client_retries"] >= 2
        for h in (hog1, hog2):
            pd.testing.assert_frame_equal(_ray.get(h).reset_index(drop=True), want)
    finally:
        pool.shutdown()


def test_query_router_queue_and_deadline(built):
    """Bounded waiting queue + deadline shedding (ROADMAP: deadline-based
    shedding instead of one admission window): (1) with queue_cap, a burst
    over max_inflight queues and ALL complete; (2) a waiter whose deadline
    expires sheds with reason='deadline'; (3) arrivals past the queue cap
    shed immediately with reason='queue_full'."""
    import time as _time

    import ray as _ray

    from splade_ray.query import QueryRouter, RouterOverloaded

    _, index_dir, _ = built
    want = search(index_dir, QUERIES, BM25Params(top_k=10))

    # (1) queue absorbs the burst
    router = QueryRouter.remote(
        index_dir, num_shards=2, max_inflight=1, queue_cap=8,
        simulate_shard_latency_s=0.25,
    )
    try:
        refs = [router.search.remote(QUERIES, BM25Params(top_k=10)) for _ in range(4)]
        for r in refs:
            pd.testing.assert_frame_equal(_ray.get(r).reset_index(drop=True), want)
        st = _ray.get(router.stats.remote())
        assert st["admitted"] == 4 and st["shed"] == 0 and st["waiting"] == 0
        assert len(st["shard_latency_ema_s"]) == 2  # per-shard EMAs exported
    finally:
        _ray.get(router.shutdown.remote())
        _ray.kill(router)

    # (2) + (3) deadline and queue_full shedding under a held slot
    router = QueryRouter.remote(
        index_dir, num_shards=2, max_inflight=1, queue_cap=1,
        simulate_shard_latency_s=1.5,
    )
    try:
        hog = router.search.remote(QUERIES, BM25Params(top_k=10))
        deadline = _time.monotonic() + 10
        while _time.monotonic() < deadline:
            if _ray.get(router.stats.remote())["inflight"] == 1:
                break
            _time.sleep(0.02)
        else:
            raise AssertionError("hog never admitted")
        # waiter with a too-short deadline -> sheds with reason=deadline;
        # wait for it to actually shed so it frees the single queue slot
        w = router.search.remote(QUERIES, BM25Params(top_k=10), deadline_s=0.2)
        deadline = _time.monotonic() + 10
        while _time.monotonic() < deadline:
            if _ray.get(router.stats.remote())["shed_deadline"] >= 1:
                break
            _time.sleep(0.02)
        else:
            raise AssertionError("deadline waiter never shed")
        # occupy the single queue slot with a patient waiter, then overflow
        patient = router.search.remote(QUERIES, BM25Params(top_k=10))
        deadline = _time.monotonic() + 10
        while _time.monotonic() < deadline:
            if _ray.get(router.stats.remote())["waiting"] >= 1:
                break
            _time.sleep(0.02)
        else:
            raise AssertionError("patient waiter never queued")
        overflow = router.search.remote(QUERIES, BM25Params(top_k=10))
        reasons = {}
        for name, ref in (("w", w), ("overflow", overflow)):
            try:
                _ray.get(ref)
            except _ray.exceptions.RayTaskError as e:
                assert isinstance(e.cause, RouterOverloaded), e.cause
                reasons[name] = e.cause.reason
        assert reasons.get("w") == "deadline"
        assert reasons.get("overflow") == "queue_full"
        # hog and the patient waiter both complete correctly
        pd.testing.assert_frame_equal(_ray.get(hog).reset_index(drop=True), want)
        pd.testing.assert_frame_equal(_ray.get(patient).reset_index(drop=True), want)
        st = _ray.get(router.stats.remote())
        assert st["shed_deadline"] >= 1 and st["shed_queue_full"] >= 1
        assert st["admitted"] == 2 and st["inflight"] == 0 and st["waiting"] == 0
    finally:
        _ray.get(router.shutdown.remote())
        _ray.kill(router)
