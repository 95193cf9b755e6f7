"""RM3 pseudo-relevance-feedback tests: pinned term-mining ordering and
full-run parity against a scalar re-implementation on the numpy oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts, tokenize
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.oracle import OracleIndex
from splade_ray.rm3 import mine_expansion_terms, rm3_search

N = 100


@pytest.fixture()
def corpus_and_index(ray_session, tmp_path):
    t = synth_corpus(N, seed=33)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N, dtype=np.int64)),
                "content": t["content"],
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id", rows_per_segment=25)
    return corpus, index_dir, t["content"].to_pylist()


def _scalar_rm3(texts, queries, *, fb_docs, fb_terms, exp_qtf, top_k):
    """Reference RM3 on the numpy oracle: feedback pass, (fb_tf desc, df asc,
    term asc) mining with own-term exclusion, expanded pass."""
    ids = list(range(len(texts)))
    fb = OracleIndex(ids, texts, BM25Params(top_k=fb_docs)).search(queries)
    df = {}
    for d in texts:
        for term in set(tokenize(d)):
            df[term] = df.get(term, 0) + 1
    exp_rows, expanded = [], []
    for qid, qtext in queries:
        own = set(term_counts(qtext))
        sums = {}
        for d in fb[fb["query_id"] == qid]["doc_id"]:
            for t, tf in term_counts(texts[int(d)]).items():
                if t not in own:
                    sums[t] = sums.get(t, 0) + tf
        ranked = sorted(sums, key=lambda t: (-sums[t], df[t], t))[:fb_terms]
        exp_rows.extend((qid, t, sums[t], df[t]) for t in ranked)
        expanded.append((qid, qtext + (" " + " ".join(ranked * exp_qtf) if ranked else "")))
    run = OracleIndex(ids, texts, BM25Params(top_k=top_k)).search(expanded)
    return pd.DataFrame(exp_rows, columns=["query_id", "term", "fb_tf", "df"]), run


def test_mine_expansion_terms_ordering_and_exclusion(corpus_and_index):
    corpus, index_dir, texts = corpus_and_index
    queries = [(1, texts[3][:40]), (2, texts[50][:60])]
    from splade_ray.query import search

    fb_run = search(index_dir, queries, BM25Params(top_k=4))
    got = mine_expansion_terms(
        index_dir, corpus, queries, fb_run, fb_terms=6, text_col="content"
    )
    want, _ = _scalar_rm3(texts, queries, fb_docs=4, fb_terms=6, exp_qtf=1, top_k=10)
    for qid, _ in queries:
        g = got[got["query_id"] == qid].reset_index(drop=True)
        w = want[want["query_id"] == qid].reset_index(drop=True)
        assert g["term"].tolist() == w["term"].tolist()
        assert g["fb_tf"].tolist() == w["fb_tf"].tolist()
        assert g["df"].tolist() == w["df"].tolist()
        own = set(term_counts(dict(queries)[qid]))
        assert not (set(g["term"]) & own)


def test_rm3_search_matches_scalar(corpus_and_index):
    corpus, index_dir, texts = corpus_and_index
    queries = [(1, texts[3][:40]), (2, texts[50][:60]), (3, texts[77][:30])]
    run = rm3_search(
        index_dir, corpus, queries,
        BM25Params(top_k=8), fb_docs=5, fb_terms=6, exp_qtf=2, text_col="content",
    )
    _, want = _scalar_rm3(texts, queries, fb_docs=5, fb_terms=6, exp_qtf=2, top_k=8)
    assert run["doc_id"].tolist() == want["doc_id"].tolist()
    assert run["rank"].tolist() == want["rank"].tolist()
    np.testing.assert_array_equal(
        run["score"].to_numpy(np.float64), want["score"].to_numpy(np.float64)
    )


def test_cli_rm3(corpus_and_index, tmp_path, capsys):
    from splade_ray.cli import main

    corpus, index_dir, texts = corpus_and_index
    q1 = texts[3][:40].replace("\n", " ").replace("\t", " ")
    q2 = texts[50][:60].replace("\n", " ").replace("\t", " ")
    qf = tmp_path / "q.tsv"
    qf.write_text(f"1\t{q1}\n2\t{q2}\n")
    out = str(tmp_path / "run.parquet")
    rc = main([
        "rm3", "--index", index_dir, "--corpus", corpus, "--queries", str(qf),
        "--out", out, "--fb-docs", "4", "--fb-terms", "6", "--top-k", "7",
        "--text-col", "content",
    ])
    assert rc == 0
    got = pd.read_parquet(out)
    assert set(got["query_id"]) == {1, 2}
    assert got.groupby("query_id")["rank"].max().le(7).all()
    want = rm3_search(
        index_dir, corpus, [(1, q1), (2, q2)],
        BM25Params(top_k=7), fb_docs=4, fb_terms=6, text_col="content",
    )
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_rm3_no_feedback_falls_back_to_plain(corpus_and_index):
    corpus, index_dir, texts = corpus_and_index
    from splade_ray.query import search

    queries = [(9, "zzzzqqqq xxyyzz")]  # matches nothing
    run = rm3_search(index_dir, corpus, queries, BM25Params(top_k=5))
    plain = search(index_dir, queries, BM25Params(top_k=5))
    pd.testing.assert_frame_equal(run.reset_index(drop=True), plain.reset_index(drop=True))
