"""Deletion tests: tombstones (logical) + purge (physical rewrite)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index, load_manifest
from splade_ray.corpus import synth_corpus
from splade_ray.delete import delete_docs, load_tombstones, purge_deletes
from splade_ray.query import search

QUERIES = [(0, "def parse"), (1, "return merge"), (2, "rare_token_20")]


def _write_corpus(tmp_path, n=150, seed=9, name="c.parquet", exclude=()):
    t = synth_corpus(n, seed=seed)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "content": t["content"]})
    if exclude:
        keep = ~np.isin(ids, np.asarray(sorted(exclude), np.int64))
        tbl = tbl.filter(pa.array(keep))
    p = str(tmp_path / name)
    pq.write_table(tbl, p)
    return p


@pytest.fixture()
def built(ray_session, tmp_path):
    corpus = _write_corpus(tmp_path)
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=25)
    return index_dir


def test_tombstones_filter_all_methods(built):
    params = BM25Params(top_k=10)
    before = search(built, QUERIES, params)
    victims = set(before[before["query_id"] == 0]["doc_id"].head(3)) | {
        int(before[before["query_id"] == 1]["doc_id"].iloc[0])
    }
    rep = delete_docs(built, victims)
    assert rep["n_tombstones"] == len(victims)

    for method in ("exact", "bmw", "auto"):
        after = search(built, QUERIES, params, method=method)
        assert not set(after["doc_id"]) & victims, method
        # Lucene semantics: surviving docs keep their build-time scores
        # (stats unchanged until purge)
        key = ["query_id", "doc_id"]
        m = before.merge(after, on=key, suffixes=("_b", "_a"))
        assert np.allclose(m["score_b"], m["score_a"]), method

    # deleting is idempotent
    rep2 = delete_docs(built, victims)
    assert rep2["n_added"] == 0 and rep2["n_tombstones"] == len(victims)


def test_tombstones_quantized_paths(built, tmp_path):
    from splade_ray.quantized import build_quantized_postings

    build_quantized_postings(built)
    params = BM25Params(top_k=10)
    base = search(built, QUERIES, params, method="quantized")
    victims = set(base[base["query_id"] == 0]["doc_id"].head(2))
    delete_docs(built, victims)
    q = search(built, QUERIES, params, method="quantized")
    qb = search(built, QUERIES, params, method="quantized_bmw")
    assert not set(q["doc_id"]) & victims
    pd.testing.assert_frame_equal(q, qb)


def test_purge_matches_fresh_build(built, tmp_path):
    """After purge, scores equal a from-scratch index over the reduced
    corpus — df/avgdl/N fully restated, postings physically rewritten."""
    params = BM25Params(top_k=10)
    before = search(built, QUERIES, params)
    victims = sorted(set(before["doc_id"].head(4)) | {0, 37, 149})
    delete_docs(built, victims)
    man = purge_deletes(built)
    assert man["n_purged_docs"] == len(victims)
    assert load_tombstones(built).size == 0
    assert load_manifest(built)["n_docs"] == 150 - len(victims)

    fresh_corpus = _write_corpus(tmp_path, name="c2.parquet", exclude=victims)
    fresh_idx = str(tmp_path / "index2")
    build_index(fresh_corpus, fresh_idx, text_col="content", id_col="doc_id",
                rows_per_segment=25)
    got = search(built, QUERIES, params)
    want = search(fresh_idx, QUERIES, params)
    pd.testing.assert_frame_equal(got, want)

    # purge with no tombstones is a no-op
    man2 = purge_deletes(built)
    assert man2["n_purged_docs"] == 0


def test_purge_invalidates_derived_layers(built):
    from splade_ray.positions import build_positions, phrase_search
    from splade_ray.quantized import build_quantized_postings
    from splade_ray.trigram import build_trigrams, substring_search

    build_positions(built)
    build_quantized_postings(built)
    build_trigrams(built)
    delete_docs(built, [5, 6, 7])
    purge_deletes(built)
    with pytest.raises(ValueError, match="pending"):
        phrase_search(built, [(0, "def parse")])
    with pytest.raises(ValueError, match="pending"):
        substring_search(built, [(0, "merge")])
    with pytest.raises(ValueError, match="pending"):
        search(built, QUERIES, BM25Params(top_k=5), method="quantized")
    # re-derive: only the rewritten segments rebuild
    rep = build_positions(built)
    assert rep["n_segments_skipped"] > 0
    phrase_search(built, [(0, "def parse")])
    rep_t = build_trigrams(built)
    assert rep_t["n_segments_skipped"] > 0
    hits = substring_search(built, [(0, "merge")])
    assert not set(hits["doc_id"]) & {5, 6, 7}


def test_boolean_search_respects_tombstones(built):
    from splade_ray.boolq import boolean_search

    params = BM25Params(top_k=10)
    base = boolean_search(built, [(0, {"must": "def"})], params)
    victim = int(base["doc_id"].iloc[0])
    delete_docs(built, [victim])
    after = boolean_search(built, [(0, {"must": "def"})], params)
    assert victim not in set(after["doc_id"])


def test_cli_delete_purge(ray_session, tmp_path, capsys):
    from splade_ray.cli import main

    corpus_dir = tmp_path / "cd"
    corpus_dir.mkdir()
    _write_corpus(corpus_dir, n=60, name="part-0.parquet")
    idx = str(tmp_path / "idx")
    assert main(["build", "--corpus", str(corpus_dir), "--index", idx,
                 "--text-col", "content", "--id-col", "doc_id",
                 "--rows-per-segment", "20"]) == 0
    capsys.readouterr()
    assert main(["delete", "--index", idx, "--doc-ids", "1,2,3"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_tombstones"] == 3
    assert main(["purge", "--index", idx]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_purged_docs"] == 3 and rep["n_docs"] == 57


def test_compaction_invalidates_all_derived_layers(ray_session, tmp_path):
    """A merge leaves merged dirs without layer files — positions/trigram
    manifests must flip to pending (queries refuse) and re-derive only the
    merged segments."""
    from splade_ray.compact import compact_segments
    from splade_ray.positions import build_positions, phrase_search
    from splade_ray.trigram import build_trigrams, substring_search

    corpus = _write_corpus(tmp_path, n=100)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, text_col="content", id_col="doc_id",
                rows_per_segment=20)
    build_positions(idx)
    build_trigrams(idx)
    before = phrase_search(idx, [(0, "def")])
    compact_segments(idx, group_size=2)
    with pytest.raises(ValueError, match="pending"):
        phrase_search(idx, [(0, "def")])
    with pytest.raises(ValueError, match="pending"):
        substring_search(idx, [(0, "merge")])
    rep = build_positions(idx)
    # 5 source segments merge as (0,1),(2,3),(4): the two merged dirs
    # rebuild from their recorded lineage sources, the untouched singleton
    # keeps its file and is skipped
    assert rep["n_segments"] == 3 and rep["n_segments_skipped"] == 1
    build_trigrams(idx)
    after = phrase_search(idx, [(0, "def")])
    pd.testing.assert_frame_equal(before, after)


def test_fused_compact_purge_matches_fresh_build(built, tmp_path):
    """maintain --purge semantics: ONE rewrite pass both merges segments
    and drops tombstoned docs; scores equal a from-scratch index over the
    reduced corpus (different segmentation — global stats restated)."""
    from splade_ray.compact import compact_segments

    params = BM25Params(top_k=10)
    before = search(built, QUERIES, params)
    # victims span merged groups AND the trailing singleton group (6
    # segments of 25 docs, group_size=5 -> groups [5 segs] + [1 seg])
    victims = sorted(set(before["doc_id"].head(4)) | {0, 37, 149})
    delete_docs(built, victims)
    man = compact_segments(built, group_size=5, purge=True)
    assert man["n_segments"] == 2
    assert man["n_purged_docs"] == len(victims)
    assert load_tombstones(built).size == 0
    assert load_manifest(built)["n_docs"] == 150 - len(victims)

    fresh_corpus = _write_corpus(tmp_path, name="c2.parquet", exclude=victims)
    fresh_idx = str(tmp_path / "index2")
    build_index(fresh_corpus, fresh_idx, text_col="content", id_col="doc_id",
                rows_per_segment=25)
    for method in ("exact", "bmw"):
        got = search(built, QUERIES, params, method=method)
        want = search(fresh_idx, QUERIES, params, method=method)
        pd.testing.assert_frame_equal(got, want), method

    # idempotent: a second fused pass with nothing tombstoned no-ops
    man2 = compact_segments(built, group_size=5, purge=True)
    assert man2["n_segments"] == 1  # plain compaction proceeds


def test_quantized_rederive_after_purge_matches_fresh_build(built, ray_session, tmp_path):
    """Quantized impacts bake in GLOBAL stats (n_docs, avgdl, df); after a
    purge the layer must rebuild EVERY segment, not just rewritten ones —
    partial reuse mixes old-N and new-N impacts (regression: corpus_stats
    reuse key). Also covers the empty-segment quantize crash (isin([]))."""
    from splade_ray.quantized import build_quantized_postings

    build_quantized_postings(built)
    gone = list(range(0, 25)) + [30, 40]  # segment 0 fully emptied + spread
    delete_docs(built, gone)
    purge_deletes(built)
    rep = build_quantized_postings(built)
    assert rep["n_segments_skipped"] == 0  # stats changed -> full rebuild

    corpus2 = _write_corpus(tmp_path, name="c2.parquet", exclude=gone)
    idx2 = str(tmp_path / "index2")
    build_index(corpus2, idx2, text_col="content", id_col="doc_id",
                rows_per_segment=25)
    build_quantized_postings(idx2)
    a = search(built, QUERIES, BM25Params(top_k=10), method="quantized")
    b = search(idx2, QUERIES, BM25Params(top_k=10), method="quantized")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))

    # unchanged stats + same params -> every segment reused
    rep2 = build_quantized_postings(built)
    assert rep2["segments_quantized"] == 0 and rep2["n_segments_skipped"] > 0


def test_maintain_rederive_restores_all_layers(built, ray_session, capsys):
    """`maintain --purge --rederive` leaves the index fully derived: every
    layer rebuilt under its recorded config and immediately queryable."""
    from splade_ray.cli import main
    from splade_ray.positions import phrase_search
    from splade_ray.quantized import build_quantized_postings
    from splade_ray.positions import build_positions
    from splade_ray.trigram import build_trigrams, substring_search

    build_quantized_postings(built)
    build_positions(built)
    build_trigrams(built, max_df_frac=0.5)
    delete_docs(built, [5, 6, 7])
    rc = main(["maintain", "--index", built, "--max-segments", "3",
               "--purge", "--rederive"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["purged"] and set(rep["rederived"]) == {"quantized", "positions", "trigrams"}
    # all three layers answer queries again, without the purged docs
    run = search(built, QUERIES, BM25Params(top_k=10), method="quantized")
    assert not set(run["doc_id"]) & {5, 6, 7}
    phrase_search(built, [(0, "def parse")])
    hits = substring_search(built, [(0, "merge")])
    assert not set(hits["doc_id"]) & {5, 6, 7}
    # trigram cap preserved from the layer's own manifest
    with open(os.path.join(built, "trigrams.json")) as fh:
        assert json.load(fh)["max_df_frac"] == 0.5


def test_delete_by_query_modes(ray_session, tmp_path):
    from splade_ray.analysis import term_counts
    from splade_ray.delete import delete_by_query
    from splade_ray.query import search

    corpus = _write_corpus(tmp_path)
    index_dir = str(tmp_path / "dbq-index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=25)
    texts = pq.read_table(corpus)["content"].to_pylist()
    q = "def return"
    toks = set(term_counts(q))
    want_any = {i for i, t in enumerate(texts)
                if toks & set(term_counts(t))}
    want_all = {i for i, t in enumerate(texts)
                if toks <= set(term_counts(t))}
    out = delete_by_query(index_dir, q, mode="all")
    assert out["n_matched"] == len(want_all)
    assert set(load_tombstones(index_dir).tolist()) == want_all
    out2 = delete_by_query(index_dir, q, mode="any")
    assert out2["n_matched"] == len(want_any - want_all)  # live-only rematch
    assert set(load_tombstones(index_dir).tolist()) == want_any
    # no matching doc can appear in any later run
    run = search(index_dir, [(1, q)], BM25Params(top_k=50))
    assert run.empty
