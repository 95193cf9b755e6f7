"""Incremental index append (Lucene addDocuments analog): appended
segments must be bit-compatible with a fresh build over the full corpus,
appends must be idempotent/resumable, and derived layers must go stale."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.bm25 import BM25Params
from splade_ray.build import append_index, build_index, load_manifest
from splade_ray.corpus import synth_corpus
from splade_ray.query import search

QUERIES = [(1, "def parse merge"), (2, "return x1 += 1"), (3, "select value")]


def _write(tbl: pa.Table, path: str) -> str:
    pq.write_table(tbl, path)
    return path


@pytest.fixture()
def corpora(ray_session, tmp_path):
    full = synth_corpus(160, seed=77)
    a = _write(full.slice(0, 100), str(tmp_path / "a.parquet"))
    b = _write(full.slice(100, 60), str(tmp_path / "b.parquet"))
    return str(tmp_path), a, b


def test_append_matches_fresh_build(corpora, tmp_path):
    """Dense-id append: search over (build A; append B) is bit-identical to
    a fresh build over A+B — doc ids continue after the largest on disk and
    global stats (df, avgdl, N) restate."""
    root, a, b = corpora
    inc = str(tmp_path / "inc")
    build_index(a, inc, text_col="content", rows_per_segment=40)
    man = append_index(inc, b, rows_per_segment=40)
    assert man["n_docs"] == 160

    fresh = str(tmp_path / "fresh")
    build_index([a, b], fresh, text_col="content", rows_per_segment=40)

    p = BM25Params(top_k=20)
    for method in ("exact", "bmw"):
        got = search(inc, QUERIES, p, method=method)
        want = search(fresh, QUERIES, p, method=method)
        pd.testing.assert_frame_equal(got, want)

    # the merged lexicon equals the fresh build's
    lex_inc = pq.read_table(os.path.join(inc, "lexicon")).to_pandas()
    lex_fresh = pq.read_table(os.path.join(fresh, "lexicon")).to_pandas()
    lex_inc = lex_inc.sort_values("term").reset_index(drop=True)
    lex_fresh = lex_fresh.sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(lex_inc, lex_fresh)


def test_append_is_idempotent(corpora, tmp_path):
    root, a, b = corpora
    inc = str(tmp_path / "inc")
    build_index(a, inc, text_col="content", rows_per_segment=40)
    append_index(inc, b, rows_per_segment=40)
    before = search(inc, QUERIES, BM25Params(top_k=15))
    man2 = append_index(inc, b, rows_per_segment=40)
    # every source slice is already in the index (lineage match): no-op
    assert man2["n_new_segments"] == 0
    assert man2["n_docs"] == 160
    after = search(inc, QUERIES, BM25Params(top_k=15))
    pd.testing.assert_frame_equal(before, after)


def test_append_recovers_after_lexicon_merge_crash(corpora, tmp_path):
    """Crash window: lexicon merged + meta written, manifest not yet —
    re-running the append converges without double-counting df/cf."""
    root, a, b = corpora
    inc = str(tmp_path / "inc")
    build_index(a, inc, text_col="content", rows_per_segment=40)
    man_path = os.path.join(inc, "manifest.json")
    old_man = open(man_path).read()
    append_index(inc, b, rows_per_segment=40)
    # simulate the crash: roll the global manifest back to pre-append
    with open(man_path, "w") as fh:
        fh.write(old_man)
    man = append_index(inc, b, rows_per_segment=40)
    assert man["n_docs"] == 160

    fresh = str(tmp_path / "fresh")
    build_index([a, b], fresh, text_col="content", rows_per_segment=40)
    lex_inc = (
        pq.read_table(os.path.join(inc, "lexicon"))
        .to_pandas().sort_values("term").reset_index(drop=True)
    )
    lex_fresh = (
        pq.read_table(os.path.join(fresh, "lexicon"))
        .to_pandas().sort_values("term").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(lex_inc, lex_fresh)


def test_append_external_ids_and_sidecars(corpora, tmp_path):
    """External-id corpus with extra doc cols: config comes from the index
    manifest, sidecar columns flow into appended segments."""
    root, a, b = corpora
    ta = pq.read_table(a)
    tb = pq.read_table(b)

    def with_ids(t, start):
        n = len(t)
        return pa.table({
            "ext_id": pa.array(np.arange(start, start + n, dtype=np.int64) * 7),
            "content": t["content"],
            "nb": pa.array([len(x) for x in t["content"].to_pylist()], pa.int64()),
        })

    a2 = _write(with_ids(ta, 0), str(tmp_path / "a2.parquet"))
    b2 = _write(with_ids(tb, 100), str(tmp_path / "b2.parquet"))
    inc = str(tmp_path / "inc2")
    build_index(a2, inc, text_col="content", id_col="ext_id",
                rows_per_segment=40, extra_doc_cols=("nb",))
    append_index(inc, b2, rows_per_segment=40)
    fresh = str(tmp_path / "fresh2")
    build_index([a2, b2], fresh, text_col="content", id_col="ext_id",
                rows_per_segment=40, extra_doc_cols=("nb",))
    got = search(inc, QUERIES, BM25Params(top_k=20))
    want = search(fresh, QUERIES, BM25Params(top_k=20))
    pd.testing.assert_frame_equal(got, want)
    # appended segments carry the sidecar column
    from splade_ray.docvalues import sort_search
    s = sort_search(inc, QUERIES[:1], sort_col="nb", top_k=5)
    assert len(s) > 0


def test_append_invalidates_derived_layers_and_keeps_tombstones(
    corpora, tmp_path
):
    root, a, b = corpora
    inc = str(tmp_path / "inc3")
    build_index(a, inc, text_col="content", rows_per_segment=40)
    from splade_ray.delete import delete_docs, load_tombstones
    from splade_ray.quantized import build_quantized_postings

    build_quantized_postings(inc, factor=100)
    delete_docs(inc, [3, 5])
    append_index(inc, b, rows_per_segment=40)
    qman = json.load(open(os.path.join(inc, "quantized.json")))
    assert qman.get("pending") is True  # stats changed -> layer stale
    with pytest.raises(Exception):
        search(inc, QUERIES, BM25Params(top_k=5), method="quantized")
    assert load_tombstones(inc).tolist() == [3, 5]
    # rederive restores the quantized layer; parity vs a fresh build that
    # quantized the full corpus under the same params (same method both
    # sides — quantization rounds scores, so exact ordering may differ)
    from splade_ray.delete import rederive_layers

    rederive_layers(inc)
    fresh = str(tmp_path / "fresh3")
    build_index([a, b], fresh, text_col="content", rows_per_segment=40)
    build_quantized_postings(fresh, factor=100)
    run_q = search(inc, QUERIES, BM25Params(top_k=10), method="quantized")
    want_q = search(fresh, QUERIES, BM25Params(top_k=10), method="quantized")
    pd.testing.assert_frame_equal(run_q, want_q)


def test_append_cli(corpora, tmp_path, capsys):
    from splade_ray.cli import main

    root, a, b = corpora
    inc = str(tmp_path / "inc4")
    build_index(a, inc, text_col="content", rows_per_segment=40)
    assert main(["append", "--index", inc, "--corpus", b,
                 "--rows-per-segment", "40"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 160
    assert load_manifest(inc)["n_segments"] == 5

def test_append_refuses_on_analyzer_registry_change(corpora, tmp_path):
    """The manifest records an analyzer-config hash; an append run under a
    mutated ANALYZERS registry must refuse rather than silently mix token
    classes between old and new segments."""
    from splade_ray.analysis import ANALYZERS, register_analyzer

    root, a, b = corpora
    b3 = b
    inc = str(tmp_path / "inc5")
    build_index(a, inc, text_col="content", lang_col="lang",
                rows_per_segment=40)
    assert "analyzer_hash" in load_manifest(inc)
    old = ANALYZERS.get("py")
    register_analyzer("py", r"[a-z0-9_]+")  # mutate the registry
    try:
        with pytest.raises(ValueError, match="analyzer configuration changed"):
            append_index(inc, b3, rows_per_segment=40)
    finally:
        ANALYZERS["py"] = old
    # with the registry restored the append proceeds
    man = append_index(inc, b3, rows_per_segment=40)
    assert man["n_docs"] == 160
