"""Fielded (BM25F-style weighted-field) retrieval vs an in-memory oracle.

score(q, d) = Σ_f w_f · BM25_f(q, d_f), each field with its own df / doc
lengths / avgdl. The oracle composes per-field OracleIndex dense scores in
the same (sorted-field, sorted-term) float order, so runs compare
bit-identically before the deterministic top-k cut.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import tokenize
from splade_ray.bm25 import BM25Params, topk_from_scores
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.oracle import OracleIndex
from splade_ray.query import search, search_fielded

QUERIES = [
    (0, "def parse buffer"),
    (1, "merge heap score"),
    (2, "rare_token_3"),
    (3, "zzz_not_in_vocab"),
    (4, "import import index"),
    (5, "the int for while class"),
]
WEIGHTS = {"body": 1.0, "title": 2.5}
PARAMS = BM25Params(top_k=8)


def _title(text: str) -> str:
    return " ".join(tokenize(text)[:6])


@pytest.fixture(scope="module")
def fielded(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("fielded")
    t = synth_corpus(300, seed=7)
    body = t["content"].to_pylist()
    titles = [_title(x) for x in body]
    doc_ids = list(range(300))
    corpus = pa.table({"doc_id": doc_ids, "body": body, "title": titles})
    corpus_path = str(root / "corpus.parquet")
    pq.write_table(corpus, corpus_path)
    dirs = {}
    for field in ("body", "title"):
        d = str(root / f"idx-{field}")
        build_index(
            corpus_path, d, text_col=field, id_col="doc_id",
            rows_per_segment=70, block_size=16,
        )
        dirs[field] = d
    return dirs, doc_ids, body, titles


def _oracle_fielded(doc_ids, fields_texts, weights, params):
    ois = {f: OracleIndex(doc_ids, texts, params) for f, texts in fields_texts.items()}
    ids = np.asarray(doc_ids, np.int64)
    rows = []
    for qid, text in QUERIES:
        total = np.zeros(ids.size, np.float64)
        for f in sorted(ois):
            oi = ois[f]
            scores = np.zeros(ids.size, np.float64)
            from splade_ray.analysis import term_counts
            from splade_ray.bm25 import idf, tf_component

            q = term_counts(text)
            for term in sorted(q):
                if term not in oi.postings:
                    continue
                pos, tf = oi.postings[term]
                w = idf(len(pos), oi.n_docs) * q[term]
                scores[pos] += w * tf_component(tf, oi.doc_lens[pos], oi.avgdl, params)
            total = total + weights[f] * scores
        docs, scs = topk_from_scores(ids, total, params.top_k, params.threshold)
        rows.extend(
            (int(qid), r, int(d), float(s))
            for r, (d, s) in enumerate(zip(docs, scs), start=1)
        )
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def test_fielded_matches_oracle(fielded):
    dirs, doc_ids, body, titles = fielded
    run = search_fielded(dirs, QUERIES, WEIGHTS, PARAMS)
    want = _oracle_fielded(
        doc_ids, {"body": body, "title": titles}, WEIGHTS, PARAMS
    )
    got = run.reset_index(drop=True)
    got["rank"] = got["rank"].astype(int)
    want["rank"] = want["rank"].astype(int)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fielded_single_field_equals_search(fielded):
    """weights={body: 1} over one field reduces to plain BM25 search."""
    dirs, *_ = fielded
    a = search_fielded({"body": dirs["body"]}, QUERIES, {"body": 1.0}, PARAMS)
    b = search(dirs["body"], QUERIES, PARAMS)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def test_fielded_weight_shifts_ranking(fielded):
    """A heavy title weight must be able to change the winner for a query
    whose terms sit in some titles: sanity that both fields contribute."""
    dirs, doc_ids, body, titles = fielded
    light = search_fielded(dirs, QUERIES, {"body": 1.0, "title": 0.0001}, PARAMS)
    heavy = search_fielded(dirs, QUERIES, {"body": 0.0001, "title": 100.0}, PARAMS)
    assert not light.equals(heavy)


def test_fielded_misaligned_raises(ray_session, tmp_path):
    """Indexes with different segmentation are rejected up front."""
    t = synth_corpus(120, seed=3)
    corpus = pa.table(
        {
            "doc_id": list(range(120)),
            "body": t["content"].to_pylist(),
            "title": [_title(x) for x in t["content"].to_pylist()],
        }
    )
    p = str(tmp_path / "c.parquet")
    pq.write_table(corpus, p)
    d1, d2 = str(tmp_path / "i1"), str(tmp_path / "i2")
    build_index(p, d1, text_col="body", id_col="doc_id", rows_per_segment=40)
    build_index(p, d2, text_col="title", id_col="doc_id", rows_per_segment=60)
    with pytest.raises(ValueError, match="segment counts"):
        search_fielded({"body": d1, "title": d2}, QUERIES, WEIGHTS, PARAMS)


def test_segment_index_empty_term_list(fielded):
    """A field whose query terms all miss its lexicon loads NO postings
    (regression: isin([]) binds a null-typed set and Arrow raises)."""
    from splade_ray.build import segment_dirs
    from splade_ray.query import SegmentIndex

    dirs, *_ = fielded
    si = SegmentIndex(segment_dirs(dirs["body"])[0], terms=[])
    assert si.postings.num_rows == 0
    assert si.posting("anything") is None
