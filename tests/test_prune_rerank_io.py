"""Pruning / FLOPS / rerank / interchange-format tests.

Reference semantics mirrored: prune_by_value (pruning/prune_doc_index.py:12-14),
prune_by_size (:17-19), prune_by_term_quantile (pruning/prune_quantile.py:40-43),
FLOPS (splade/flops.py:55-60), rerank join + self-hit filter
(splade/datasets/rerank.py:17-89, beir_eval.py:82-88), TSV collection parsing
(splade/datasets/datasets.py:82-88), run.json shape
(transformer_evaluator.py:186-188), qrel trec→json
(utils/processing_trec_eval.py:10-19), Anserini export incl. the empty-doc
filler (transformer_evaluator.py:228-247,235-239).
"""

import json
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params, idf, tf_component

TEXTS = [
    "def foo bar foo foo",
    "bar baz qux",
    "foo",
    "lonely_term def def bar",
    "def def def def def",
    "",
]


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS, pa.string()),
            }
        )
    )


def expected_impacts(factor=100, params=BM25Params()):
    counts = [term_counts(t) for t in TEXTS]
    dls = [sum(c.values()) for c in counts]
    n = len(TEXTS)
    avgdl = sum(dls) / n
    dfm = {}
    for c in counts:
        for t in c:
            dfm[t] = dfm.get(t, 0) + 1
    rows = {}
    for i, c in enumerate(counts):
        for t, tf in c.items():
            imp = idf(dfm[t], n) * float(
                tf_component(np.array([tf], float), np.array([dls[i]], float), avgdl, params)[0]
            )
            q = math.floor(imp * factor + 0.5)
            if q > 0:
                rows[(i, t)] = q
    return rows


def test_quantized_impacts_matches_manual(docs_ds):
    from splade_ray.prune import quantized_impacts

    got = quantized_impacts(docs_ds).to_pandas()
    got_map = {(d, t): v for d, t, v in zip(got["doc_id"], got["term"], got["impact_q"])}
    assert got_map == expected_impacts()


def test_quantized_impacts_join_parity(docs_ds):
    """The term-keyed-join df flow (unbounded-vocabulary path) must produce
    exactly the broadcast path's numbers."""
    from splade_ray.prune import quantized_impacts

    got = quantized_impacts(docs_ds, df_mode="join").to_pandas()
    got_map = {(d, t): v for d, t, v in zip(got["doc_id"], got["term"], got["impact_q"])}
    assert got_map == expected_impacts()


def test_prune_by_size_exact_on_scattered_layout(docs_ds):
    """exact=True must not depend on doc-contiguous blocks: feed it the
    join-path impacts (term-scattered) and require the same rows the fast
    path selects from doc-contiguous input."""
    from splade_ray.prune import prune_by_size, quantized_impacts

    fast = (
        prune_by_size(quantized_impacts(docs_ds), size=2)
        .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    exact = (
        prune_by_size(quantized_impacts(docs_ds, df_mode="join"), size=2, exact=True)
        .to_pandas()[["doc_id", "term", "impact_q"]]
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    )
    assert fast.equals(exact)


def test_anserini_join_mode_and_content(docs_ds, ray_session):
    from splade_ray.io import anserini_doc_rows

    a = anserini_doc_rows(docs_ds).to_pandas().sort_values("id").reset_index(drop=True)
    b = (
        anserini_doc_rows(docs_ds, df_mode="join")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    assert a.equals(b)
    c = anserini_doc_rows(docs_ds, include_content=True).to_pandas()
    assert list(c.columns) == ["id", "vector_json", "content"]
    assert sorted(c["content"]) == sorted(TEXTS)


def test_prune_by_value(docs_ds):
    from splade_ray.prune import prune_by_value, quantized_impacts

    exp = {k: v for k, v in expected_impacts().items() if v > 30}
    got = prune_by_value(quantized_impacts(docs_ds), threshold=0.3).to_pandas()
    assert {(d, t): v for d, t, v in zip(got["doc_id"], got["term"], got["impact_q"])} == exp


def test_prune_by_size(docs_ds):
    from splade_ray.prune import prune_by_size, quantized_impacts

    got = prune_by_size(quantized_impacts(docs_ds), size=1).to_pandas()
    # one (top) term per doc that has any posting
    assert got.groupby("doc_id").size().max() == 1
    exp = expected_impacts()
    for d, t, v in zip(got["doc_id"], got["term"], got["impact_q"]):
        best = max(
            (val, term) for (dd, term), val in exp.items() if dd == d
        )  # (impact desc); tie term asc handled below
        best_val = best[0]
        best_terms = sorted(term for (dd, term), val in exp.items() if dd == d and val == best_val)
        assert v == best_val and t == best_terms[0]


def test_prune_by_term_quantile(docs_ds):
    from splade_ray.prune import prune_by_term_quantile, quantized_impacts

    exp_imp = expected_impacts()
    by_term: dict[str, list[int]] = {}
    for (_, t), v in exp_imp.items():
        by_term.setdefault(t, []).append(v)
    thr = {t: np.quantile(np.array(v, float), 0.5) for t, v in by_term.items()}
    exp = {k: v for k, v in exp_imp.items() if v > thr[k[1]]}
    got = prune_by_term_quantile(quantized_impacts(docs_ds), quantile=0.5).to_pandas()
    assert {(d, t): v for d, t, v in zip(got["doc_id"], got["term"], got["impact_q"])} == exp


def test_flops_metric(docs_ds):
    from splade_ray.flops import flops_metric

    queries = [(0, "foo bar"), (1, "def zzz_absent"), (2, "foo")]
    got = flops_metric(docs_ds, queries)
    dfm = {}
    for t in TEXTS:
        for term in term_counts(t):
            dfm[term] = dfm.get(term, 0) + 1
    qdf = {"foo": 2, "bar": 1, "def": 1, "zzz_absent": 1}
    exp = sum(dfm.get(t, 0) / len(TEXTS) * c / 3 for t, c in qdf.items())
    assert got == pytest.approx(exp, abs=1e-12)


def test_rerank_input_and_self_hit(docs_ds, ray_session):
    from splade_ray.rerank import rerank_input

    run = pd.DataFrame(
        {"query_id": [0, 0, 1], "rank": [1, 2, 1], "doc_id": [0, 3, 4]}
    )
    queries = [(0, "foo bar"), (1, "def")]
    got = rerank_input(docs_ds, run, queries).to_pandas()
    # (0,0) dropped as self-hit
    assert set(zip(got["query_id"], got["doc_id"])) == {(0, 3), (1, 4)}
    row = got[(got["query_id"] == 0)].iloc[0]
    assert row["q_text"] == "foo bar" and row["d_text"] == TEXTS[3] and row["rank"] == 2


def test_rerank_input_pushdown_strategy(docs_ds, ray_session, tmp_path):
    """Small runs must take the predicate-pushdown read (filter=isin over
    the candidate ids; O(k) I/O) and produce exactly the streaming path's
    rows; a run larger than pushdown_max_ids must stream."""
    from unittest import mock

    import ray.data as rd

    from splade_ray.rerank import rerank_input

    pq_path = str(tmp_path / "docs.parquet")
    pa_tbl = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    import pyarrow.parquet as pqm

    pqm.write_table(pa_tbl, pq_path)
    run = pd.DataFrame(
        {"query_id": [100, 100, 101], "rank": [1, 2, 1], "doc_id": [0, 3, 4]}
    )
    queries = [(100, "foo bar"), (101, "def")]
    streamed = (
        rerank_input(docs_ds, run, queries)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    captured = {}
    real_read = rd.read_parquet

    def recording_read(paths, **kw):
        captured.update(kw)
        return real_read(paths, **kw)

    with mock.patch.object(rd, "read_parquet", recording_read):
        pushed = (
            rerank_input(None, run, queries, docs_path=pq_path)
            .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
    assert "filter" in captured and captured["filter"] is not None
    assert streamed.equals(pushed)
    # large run (above the id cap) -> no filter pushdown, full stream
    captured.clear()
    with mock.patch.object(rd, "read_parquet", recording_read):
        rerank_input(None, run, queries, docs_path=pq_path, pushdown_max_ids=1).count()
    assert "filter" not in captured


def test_rerank_lexical_ordering(docs_ds, ray_session):
    from splade_ray.rerank import rerank, rerank_input

    run = pd.DataFrame(
        {"query_id": [9, 9, 9], "rank": [1, 2, 3], "doc_id": [2, 0, 1]}
    )
    queries = [(9, "foo bar")]
    out = rerank(rerank_input(docs_ds, run, queries), concurrency=1)
    # overlaps: doc2 {foo}=1, doc0 {foo,bar}=2, doc1 {bar}=1
    assert list(out["doc_id"]) == [0, 2, 1]  # overlap desc, then first-stage rank
    assert list(out["overlap"]) == [2, 1, 1]
    assert list(out["new_rank"]) == [1, 2, 3]


def test_tsv_collection_roundtrip(tmp_path, ray_session):
    from splade_ray.io import read_tsv_collection

    p = tmp_path / "raw.tsv"
    p.write_text("0\thello world\n1\twith\ttab inside\n2\t\n")
    got = read_tsv_collection(str(p)).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(got["id"]) == [0, 1, 2]
    # extra tab joined back with a space (datasets.py:82-88)
    assert list(got["text"]) == ["hello world", "with tab inside", ""]


def test_run_json_roundtrip(tmp_path):
    from splade_ray.io import read_run_json, write_run_json

    run = pd.DataFrame(
        {
            "query_id": [0, 0, 1],
            "rank": [1, 2, 1],
            "doc_id": [5, 3, 7],
            "score": [2.5, 1.25, 0.5],
        }
    )
    path = str(tmp_path / "run.json")
    write_run_json(run, path)
    nested = json.load(open(path))
    assert nested == {"0": {"5": 2.5, "3": 1.25}, "1": {"7": 0.5}}
    back = read_run_json(path)
    pd.testing.assert_frame_equal(back, run)


def test_trec_qrel_converter(tmp_path):
    from splade_ray.io import qrel_to_table, trec_qrel_to_json

    p = tmp_path / "qrel.tsv"
    p.write_text("10\t0\t100\t1\n10\t0\t101\t0\n11\t0\t100\t2\n")
    nested = trec_qrel_to_json(str(p))
    assert nested == {"10": {"100": 1, "101": 0}, "11": {"100": 2}}
    assert (tmp_path / "qrel.json").exists()
    tbl = qrel_to_table(nested)
    assert len(tbl) == 3 and set(tbl.columns) == {"query_id", "doc_id", "rel"}


def test_anserini_doc_rows_with_empty_doc(docs_ds, ray_session):
    from splade_ray.io import EMPTY_DOC_FILLER, anserini_doc_rows

    got = anserini_doc_rows(docs_ds).to_pandas().sort_values("id").reset_index(drop=True)
    assert list(got["id"]) == list(range(len(TEXTS)))  # every doc has a row
    exp = expected_impacts()
    for i in range(len(TEXTS)):
        vec = json.loads(got["vector_json"][i])
        exp_vec = {t: v for (d, t), v in exp.items() if d == i}
        assert vec == (exp_vec if exp_vec else {EMPTY_DOC_FILLER: 1})


def test_anserini_query_line():
    from splade_ray.io import anserini_query_line

    assert anserini_query_line(3, {"b": 2, "a": 1}) == "3\ta b b"


def test_ndcg_at_k():
    from splade_ray.evaluate import ndcg_at_k

    run = pd.DataFrame(
        {"query_id": [0, 0, 0], "rank": [1, 2, 3], "doc_id": [10, 11, 12], "score": [3.0, 2.0, 1.0]}
    )
    qrel = pd.DataFrame({"query_id": [0, 0], "doc_id": [11, 99], "rel": [2, 1]})
    # dcg = 2/log2(3); idcg = 2/log2(2) + 1/log2(3)
    exp = (2 / math.log2(3)) / (2 + 1 / math.log2(3))
    assert ndcg_at_k(run, qrel, k=3) == pytest.approx(exp)


def test_trec_run_roundtrip(tmp_path):
    from splade_ray.io import read_trec_run, write_trec_run

    run = pd.DataFrame(
        {
            "query_id": [1, 1, 2],
            "rank": [1, 2, 1],
            "doc_id": [10, 11, 12],
            "score": [3.5, 2.0, 9.0],
        }
    )
    p = str(tmp_path / "run.trec")
    write_trec_run(run, p)
    assert open(p).readline() == "1 Q0 10 1 3.5 splade_ray\n"
    back = read_trec_run(p)
    pd.testing.assert_frame_equal(back, run)
    capped = read_trec_run(p, top_k=1)
    assert list(capped["rank"]) == [1, 1]


def test_pairwise_rerank():
    from splade_ray.rerank import pairwise_rerank

    scored = pd.DataFrame(
        {
            "query_id": [7, 7, 7, 8],
            "rank": [1, 2, 3, 1],
            "doc_id": [10, 11, 12, 20],
            "overlap": [1, 3, 1, 0],
        }
    )
    out = pairwise_rerank(scored)
    q7 = out[out["query_id"] == 7]
    # doc11 beats both (wins2 = 4); docs 10/12 tie each other (wins2 = 1 each)
    assert list(q7["doc_id"]) == [11, 10, 12]
    assert list(q7["wins2"]) == [4, 1, 1]
    assert list(q7["new_rank"]) == [1, 2, 3]
    q8 = out[out["query_id"] == 8]
    assert list(q8["wins2"]) == [0] and list(q8["new_rank"]) == [1]


def test_beir_adapter_roundtrip(ray_session, tmp_path):
    """BEIR corpus/queries/qrels adapters: title+' '+text fold, id-sorted
    canonical parquet, qrel table shape (datasets.py:101-122 analog)."""
    import json as _json

    from splade_ray.adapters import (
        beir_corpus_to_parquet,
        read_beir_corpus,
        read_beir_qrels,
        read_beir_queries,
    )

    corpus = tmp_path / "corpus.jsonl"
    with open(corpus, "w") as fh:
        for row in [
            {"_id": "d2", "title": "B title", "text": "second doc"},
            {"_id": "d1", "title": "A title", "text": "first doc"},
            {"_id": "d3", "title": "", "text": "no title"},
        ]:
            fh.write(_json.dumps(row) + "\n")
    ds = read_beir_corpus(str(corpus)).to_pandas().sort_values("external_id")
    assert ds["text"].tolist() == ["A title first doc", "B title second doc", "no title"]

    out = beir_corpus_to_parquet(str(corpus), str(tmp_path / "pq"))
    import ray.data as rd

    got = rd.read_parquet(out).to_pandas()
    assert got["external_id"].tolist() == ["d1", "d2", "d3"]  # sorted canonical order

    queries = tmp_path / "queries.jsonl"
    with open(queries, "w") as fh:
        fh.write(_json.dumps({"_id": "q1", "text": "first"}) + "\n")
    assert read_beir_queries(str(queries)) == [("q1", "first")]

    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("query-id\tcorpus-id\tscore\nq1\td1\t1\nq1\td3\t0\n")
    qt = read_beir_qrels(str(qrels))
    assert qt.values.tolist() == [["q1", "d1", 1], ["q1", "d3", 0]]


def test_ir_datasets_adapter_gated(ray_session, monkeypatch):
    """Without the package the adapter raises a clear ImportError; with a
    stubbed module it streams (external_id, text) rows."""
    import sys
    import types

    import pytest as _pytest

    from splade_ray import adapters

    sys.modules.pop("ir_datasets", None)
    with _pytest.raises(ImportError, match="ir_datasets"):
        adapters.read_ir_dataset("x")

    stub = types.ModuleType("ir_datasets")
    Doc = __import__("collections").namedtuple("Doc", ["doc_id", "title", "body"])

    class _DS:
        def docs_iter(self):
            return iter([Doc("a", "t1", "b1"), Doc("b", "t2", "b2")])

    stub.load = lambda name: _DS()
    monkeypatch.setitem(sys.modules, "ir_datasets", stub)
    got = adapters.read_ir_dataset("stub/x").to_pandas()
    assert got["external_id"].tolist() == ["a", "b"]
    assert got["text"].tolist() == ["t1 b1", "t2 b2"]


def test_beir_qrels_numeric_ids_stay_strings(tmp_path):
    """Numeric-looking BEIR ids must still parse as strings (the dtype keys
    must match the header names, not positions — round-2 ADVICE item 3)."""
    from splade_ray.adapters import read_beir_qrels

    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("query-id\tcorpus-id\tscore\n100\t2003\t1\n101\t2004\t2\n")
    qt = read_beir_qrels(str(qrels))
    assert qt["query_id"].tolist() == ["100", "101"]
    assert qt["doc_id"].tolist() == ["2003", "2004"]
    assert qt["rel"].tolist() == [1, 2]


def test_ir_datasets_adapter_streams_chunks(ray_session, monkeypatch):
    """docs_iter() must stream into bounded per-chunk blocks, honoring
    batch_size, not materialize the whole corpus driver-side (round-2
    ADVICE item 4)."""
    import sys
    import types

    from splade_ray import adapters

    Doc = __import__("collections").namedtuple("Doc", ["doc_id", "body"])

    class _DS:
        def docs_iter(self):
            return iter([Doc(str(i), f"body {i}") for i in range(10)])

    stub = types.ModuleType("ir_datasets")
    stub.load = lambda name: _DS()
    monkeypatch.setitem(sys.modules, "ir_datasets", stub)
    ds = adapters.read_ir_dataset("stub/x", batch_size=3)
    assert ds.num_blocks() == 4  # ceil(10 / 3) chunk blocks, not one big list
    got = ds.to_pandas()
    assert got["external_id"].tolist() == [str(i) for i in range(10)]


def test_flops_from_index_matches_pipeline(ray_session, tmp_path):
    """The index-reuse FLOPS path (lexicon pushdown, no corpus scan) equals
    the distributed postings-pipeline numerator (flops.py:48 analog)."""
    import ray.data as rd

    from splade_ray.build import build_index
    from splade_ray.corpus import synth_corpus, write_synth_corpus
    from splade_ray.flops import flops_from_index, flops_numerator

    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    write_synth_corpus(corpus, 150, seed=4, n_files=2)
    build_index(corpus, idx, text_col="content", rows_per_segment=60)
    queries = [(0, "def parse buffer"), (1, "merge heap zzz_nope"), (2, "def def import")]
    import pyarrow as pa

    t = synth_corpus(150, seed=4)
    t = t.append_column("doc_id", pa.array(range(150), pa.int64()))
    ds = rd.from_arrow(t)
    num, n_docs = flops_numerator(ds, queries, text_col="content")
    got = flops_from_index(idx, queries)
    assert got["flops_num"] == num
    assert got["n_docs"] == n_docs == 150
    assert got["flops"] == num / (150 * 3)


def test_term_vectors(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_ray.io import term_vectors

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["the cat and the hat", "", "cat cat dog"]),
        }
    )
    p = str(tmp_path / "docs.parquet")
    pq.write_table(docs, p)
    tv = term_vectors(p, [1, 3, 2])
    want = pd.DataFrame(
        [
            (1, "and", 1, "3"),
            (1, "cat", 1, "2"),
            (1, "hat", 1, "5"),
            (1, "the", 2, "1,4"),
            (3, "cat", 2, "1,2"),
            (3, "dog", 1, "3"),
        ],
        columns=["doc_id", "term", "tf", "positions"],
    )
    pd.testing.assert_frame_equal(tv, want, check_dtype=False)
