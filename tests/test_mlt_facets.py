"""More-like-this + facet-count tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts, tokenize
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.facets import facet_counts
from splade_ray.mlt import more_like_this, select_terms
from splade_ray.query import search

N = 120


@pytest.fixture()
def corpus_and_index(ray_session, tmp_path):
    t = synth_corpus(N, seed=21)
    langs = [["en", "fr", "zh"][i % 3] for i in range(N)]
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N, dtype=np.int64)),
                "content": t["content"],
                "facet_lang": pa.array(langs),
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(
        corpus, index_dir, text_col="content", id_col="doc_id",
        rows_per_segment=30, extra_doc_cols=("facet_lang",),
    )
    return corpus, index_dir, [x for x in t["content"].to_pylist()], langs


def test_select_terms_ordering(corpus_and_index):
    corpus, index_dir, texts, _ = corpus_and_index
    got = select_terms(index_dir, {0: texts[0]}, m_terms=5)[0]
    # recompute expected by the pinned (tf desc, df asc, term asc) ordering
    tf = term_counts(texts[0])
    df = {}
    for d in texts:
        for term in set(tokenize(d)):
            df[term] = df.get(term, 0) + 1
    want = sorted(tf, key=lambda t: (-tf[t], df[t], t))[:5]
    assert got == want


def test_more_like_this_excludes_seed_and_ranks(corpus_and_index):
    corpus, index_dir, texts, _ = corpus_and_index
    seeds = [0, 7, 55]
    run = more_like_this(
        index_dir, corpus, seeds, m_terms=6,
        params=BM25Params(top_k=5), text_col="content",
    )
    assert set(run["query_id"]) <= set(seeds)
    assert not any(run["query_id"] == run["doc_id"])
    for sid in seeds:
        g = run[run["query_id"] == sid]
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 5
        # parity with a plain search over the selected terms, self removed
        terms = select_terms(index_dir, {sid: texts[sid]}, 6)[sid]
        ref = search(index_dir, [(sid, " ".join(terms))], BM25Params(top_k=6))
        ref = ref[ref["doc_id"] != sid].head(5)
        assert list(g["doc_id"]) == list(ref["doc_id"])
        assert np.allclose(g["score"].to_numpy(), ref["score"].to_numpy())

    with pytest.raises(KeyError, match="not found"):
        more_like_this(index_dir, corpus, [10**9], text_col="content")


def test_facet_counts_matches_bruteforce(corpus_and_index):
    corpus, index_dir, texts, langs = corpus_and_index
    queries = [(0, "def parse"), (1, "rare_token_20"), (2, "zzz_absent")]
    got = facet_counts(index_dir, queries, facet_col="facet_lang")
    exp = {}
    for qid, qtext in queries:
        qterms = set(tokenize(qtext))
        for i, d in enumerate(texts):
            if qterms & set(tokenize(d)):
                exp[(qid, langs[i])] = exp.get((qid, langs[i]), 0) + 1
    assert {(r.query_id, r.facet): r.n_docs for r in got.itertuples()} == exp


def test_facet_counts_respects_tombstones(corpus_and_index):
    from splade_ray.delete import delete_docs

    corpus, index_dir, texts, langs = corpus_and_index
    queries = [(0, "def")]
    before = facet_counts(index_dir, queries, facet_col="facet_lang")
    # delete every matching 'en' doc -> the en facet row must shrink/vanish
    en_matches = [
        i for i, d in enumerate(texts) if "def" in tokenize(d) and langs[i] == "en"
    ]
    delete_docs(index_dir, en_matches)
    after = facet_counts(index_dir, queries, facet_col="facet_lang")
    a = dict(zip(zip(after["query_id"], after["facet"]), after["n_docs"]))
    b = dict(zip(zip(before["query_id"], before["facet"]), before["n_docs"]))
    assert (0, "en") not in a
    assert a[(0, "fr")] == b[(0, "fr")] and a[(0, "zh")] == b[(0, "zh")]


def test_cli_mlt_facets(corpus_and_index, tmp_path, capsys):
    import json

    from splade_ray.cli import main

    corpus, index_dir, texts, langs = corpus_and_index
    out = str(tmp_path / "mlt.parquet")
    assert main(["mlt", "--index", index_dir, "--corpus", corpus,
                 "--seeds", "0,7", "--out", out, "--m-terms", "5",
                 "--top-k", "3", "--text-col", "content"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["seeds"] == 2 and rep["rows"] > 0
    run = pd.read_parquet(out)
    assert not any(run["query_id"] == run["doc_id"])

    q = tmp_path / "q.tsv"
    q.write_text("0\tdef parse\n")
    out2 = str(tmp_path / "facets.parquet")
    assert main(["facets", "--index", index_dir, "--queries", str(q),
                 "--facet-col", "facet_lang", "--out", out2]) == 0
    fc = pd.read_parquet(out2)
    assert set(fc.columns) == {"query_id", "facet", "n_docs"} and len(fc) > 0


def test_facet_counts_top_and_shard_size(corpus_and_index):
    """top-N terms aggregation: pinned (n_docs desc, facet asc) cut; a
    generous shard_size leaves exact counts untouched."""
    corpus, index_dir, texts, langs = corpus_and_index
    queries = [(0, "def parse"), (1, "rare_token_20")]
    full = facet_counts(index_dir, queries, facet_col="facet_lang")
    got = facet_counts(index_dir, queries, facet_col="facet_lang", top=2)
    want = (
        full.sort_values(["query_id", "n_docs", "facet"],
                         ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=True)
        .head(2)
        .sort_values(["query_id", "facet"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got.groupby("query_id").size() <= 2).all()

    exact = facet_counts(
        index_dir, queries, facet_col="facet_lang", shard_size=1000
    )
    pd.testing.assert_frame_equal(exact, full, check_dtype=False)


def test_facet_counts_multivalued(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_ray.analysis import term_counts
    from splade_ray.build import build_index
    from splade_ray.corpus import synth_corpus
    from splade_ray.facets import facet_counts

    n = 90
    t = synth_corpus(n, seed=61)
    texts = t["content"].to_pylist()
    # duplicate tag inside a doc whenever i%5 == i%7 -> dedupe must bind
    tags = [[f"t{i % 5}", f"t{i % 7}"] for i in range(n)]
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "content": t["content"],
                "tags": pa.array(tags, pa.list_(pa.string())),
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=25, extra_doc_cols=("tags",))
    queries = [(1, "def parse merge"), (2, "return x1")]
    got = facet_counts(index_dir, queries, facet_col="tags",
                       multivalued=True)
    for qid, text in queries:
        toks = set(term_counts(text))
        matched = [i for i, tx in enumerate(texts)
                   if toks & set(term_counts(tx))]
        want: dict = {}
        for i in matched:
            for tag in set(tags[i]):  # distinct per doc
                want[tag] = want.get(tag, 0) + 1
        g = got[got["query_id"] == qid].set_index("facet")["n_docs"].to_dict()
        assert g == want, qid
    # a doc with a repeated tag counts once (dedupe proof): doc 3 has
    # tags [t3, t3]
    assert tags[3][0] == tags[3][1]


@pytest.fixture()
def stats_index(ray_session, tmp_path):
    t = synth_corpus(N, seed=27)
    texts = t["content"].to_pylist()
    langs = [["en", "fr", "zh"][i % 3] for i in range(N)]
    sizes = np.array([len(x) for x in texts], np.int64)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N, dtype=np.int64)),
                "content": t["content"],
                "facet_lang": pa.array(langs),
                "n_bytes": pa.array(sizes),
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(
        corpus, index_dir, text_col="content", id_col="doc_id",
        rows_per_segment=30, extra_doc_cols=("facet_lang", "n_bytes"),
    )
    return index_dir, texts, langs, sizes


def test_facet_stats_agg_matches_bruteforce(stats_index):
    from splade_ray.facets import facet_stats_agg

    index_dir, texts, langs, sizes = stats_index
    queries = [(0, "def parse"), (1, "rare_token_20"), (2, "zzz_absent")]
    got = facet_stats_agg(index_dir, queries, facet_col="facet_lang",
                          metric_col="n_bytes")
    exp: dict[tuple[int, str], list[int]] = {}
    for qid, qtext in queries:
        qterms = set(tokenize(qtext))
        for i, d in enumerate(texts):
            if qterms & set(tokenize(d)):
                exp.setdefault((qid, langs[i]), []).append(int(sizes[i]))
    assert len(got) == len(exp)
    for r in got.itertuples():
        vals = exp[(r.query_id, r.facet)]
        assert r.n_docs == len(vals)
        assert r.sum_v == sum(vals)
        assert r.min_v == min(vals) and r.max_v == max(vals)
        assert abs(r.avg_v - sum(vals) / len(vals)) < 1e-12


def test_facet_stats_agg_top_and_tombstones(stats_index):
    from splade_ray.delete import delete_docs
    from splade_ray.facets import facet_stats_agg

    index_dir, texts, langs, sizes = stats_index
    queries = [(0, "def")]
    full = facet_stats_agg(index_dir, queries, facet_col="facet_lang",
                           metric_col="n_bytes")
    top1 = facet_stats_agg(index_dir, queries, facet_col="facet_lang",
                           metric_col="n_bytes", top=1)
    # top=1 keeps the largest bucket by (n_docs desc, facet asc)
    best = full.sort_values(["n_docs", "facet"],
                            ascending=[False, True]).iloc[0]
    assert len(top1) == 1 and top1.iloc[0]["facet"] == best["facet"]
    # tombstones shrink the en bucket's stats
    en = [i for i, d in enumerate(texts)
          if "def" in tokenize(d) and langs[i] == "en"]
    delete_docs(index_dir, en)
    after = facet_stats_agg(index_dir, queries, facet_col="facet_lang",
                            metric_col="n_bytes")
    assert "en" not in set(after["facet"])
    fr_b = full[full["facet"] == "fr"].iloc[0]
    fr_a = after[after["facet"] == "fr"].iloc[0]
    assert fr_a["n_docs"] == fr_b["n_docs"] and fr_a["sum_v"] == fr_b["sum_v"]
