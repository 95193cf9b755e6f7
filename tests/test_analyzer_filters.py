"""Token-filter analyzer chain (stopwords + Harman s-stemmer): kernel parity
with the DuckDB mirror, post-filter doc lengths, and the end-to-end
build_index(analyzer=...) path including manifest-default query analysis,
skip-match invalidation and the positional layer."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from splade_ray.analysis import (
    EN_STOPWORDS,
    Analyzer,
    analyzer_sql,
    get_analyzer,
    register_analyzer,
    s_stem_array,
    s_stem_sql,
    tokenize,
    tokenize_column,
)
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.query import search

DOCS = [
    "The cats chased the dogs into their houses",
    "a cat chases a dog",
    "Bodies of water: lakes seas oceans",
    "the body of this lake goes south",
    "fixes bugs and classes of buses",
    "bus fix class goes",
    "",
]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    p = tmp_path_factory.mktemp("stemcorpus") / "docs.parquet"
    pd.DataFrame(
        {
            "repo": "r",
            "path": [f"f{i}" for i in range(len(DOCS))],
            "commit": "c",
            "lang": "en",
            "content": DOCS,
        }
    ).to_parquet(p)
    return str(p)


def test_s_stem_pinned_cases():
    toks = ["cats", "bodies", "goes", "trees", "classes", "bus", "boss",
            "ies", "es", "s", "as", "dies", "fixes", "run", "houses"]
    got = s_stem_array(pa.array(toks)).to_pylist()
    assert got == ["cat", "body", "goes", "trees", "classe", "bus", "boss",
                   "ie", "es", "s", "as", "dy", "fixe", "run", "house"]
    # SQL CASE mirrors the kernel token-for-token
    sql = duckdb.sql(
        f"SELECT {s_stem_sql('t')} FROM (SELECT unnest(?) AS t)", params=[toks]
    ).fetchall()
    assert [r[0] for r in sql] == got


def test_s_stem_sql_parity_random():
    rng = np.random.default_rng(7)
    alphabet = list("abesiu_0")
    toks = [
        "".join(rng.choice(alphabet, size=rng.integers(1, 9)))
        for _ in range(500)
    ]
    got = s_stem_array(pa.array(toks)).to_pylist()
    sql = duckdb.sql(
        f"SELECT {s_stem_sql('t')} FROM (SELECT unnest(?) AS t)", params=[toks]
    ).fetchall()
    assert [r[0] for r in sql] == got


def test_stopword_filter_and_order():
    # stopwords removed BEFORE stemming: 'these' is a stopword and is gone,
    # not stemmed to 'these'->... ; 'theses' is not a stopword and stems.
    assert tokenize("these theses the thesis", "en_light") == ["these", "thesi"]
    assert tokenize("these theses", "en_stop") == ["theses"]


def test_doc_lens_count_post_filter_tokens():
    t, par, dl = tokenize_column(
        pa.array(["the big cats run", "a an the", None]), get_analyzer("en_light")
    )
    assert t.to_pylist() == ["big", "cat", "run"]
    assert dl.tolist() == [3, 0, 0]


def test_register_analyzer_with_filters():
    register_analyzer("t_stop", stopwords=("foo",), stem="s")
    try:
        assert tokenize("foo bars", "t_stop") == ["bar"]
        a = get_analyzer("t_stop")
        assert a.stopwords == frozenset({"foo"}) and a.stem == "s"
    finally:
        from splade_ray.analysis import ANALYZERS

        del ANALYZERS["t_stop"]


def test_analyzer_sql_matches_kernel_on_docs():
    got = []
    for i, d in enumerate(DOCS):
        got += [(i, t) for t in tokenize(d, "en_light")]
    rows = duckdb.sql(
        f"SELECT doc_id, unnest({analyzer_sql('en_light')}) AS term FROM "
        "(SELECT unnest(range(len(?))) AS doc_id, unnest(?) AS text)",
        params=[DOCS, DOCS],
    ).fetchall()
    assert sorted(rows) == sorted(got)


def test_bad_stem_name_raises():
    with pytest.raises(ValueError):
        Analyzer(stem="porter")


def test_build_with_analyzer_end_to_end(corpus, tmp_path):
    index_dir = str(tmp_path / "idx")
    m = build_index(corpus, index_dir, text_col="content", rows_per_segment=3,
                    analyzer="en_light")
    assert m["analyzer"] == "en_light"
    # doc lengths are post-filter: doc 1 'a cat chases a dog' -> cat, chase, dog
    import pyarrow.dataset as pads

    from splade_ray.build import segment_dirs

    dls = (
        pads.dataset([os.path.join(d, "doclens.parquet") for d in segment_dirs(index_dir)])
        .to_table()
        .to_pandas()
        .sort_values("doc_id")
    )
    assert dls["doc_len"].tolist()[1] == 3
    # query text goes through the SAME chain by default (manifest analyzer):
    # 'the cats' analyzes to ['cat'], matching stemmed doc terms
    run = search(index_dir, [(1, "the cats")], BM25Params(top_k=10))
    assert set(run["doc_id"]) == {0, 1}  # both cat docs, stopword ignored
    # explicit collection-wide analyzer finds nothing ('cats' not indexed)
    run_raw = search(index_dir, [(1, "cats")], BM25Params(top_k=10), query_lang="")
    assert run_raw.empty


def test_analyzer_change_invalidates_segments(corpus, tmp_path):
    index_dir = str(tmp_path / "idx2")
    m1 = build_index(corpus, index_dir, text_col="content", rows_per_segment=3,
                     analyzer="en_light")
    m2 = build_index(corpus, index_dir, text_col="content", rows_per_segment=3,
                     analyzer="en_light")
    assert m2["n_segments_skipped"] == m2["n_segments"]
    m3 = build_index(corpus, index_dir, text_col="content", rows_per_segment=3)
    assert m3["n_segments_skipped"] == 0
    run = search(index_dir, [(1, "cats")], BM25Params(top_k=10))
    assert set(run["doc_id"]) == {0}


def test_build_rejects_lang_col_plus_analyzer(corpus, tmp_path):
    with pytest.raises(ValueError):
        build_index(corpus, str(tmp_path / "x"), text_col="content",
                    lang_col="lang", analyzer="en_light")


def test_positions_layer_respects_analyzer(corpus, tmp_path):
    from splade_ray.positions import build_positions, phrase_search

    index_dir = str(tmp_path / "idxp")
    build_index(corpus, index_dir, text_col="content", rows_per_segment=3,
                analyzer="en_light")
    pm = build_positions(index_dir)
    assert pm["analyzer"] == "en_light"
    # 'the cats chased' -> [cat, chase]; stopword removal shifts positions so
    # the stemmed bigram is adjacent in doc 0
    hits = phrase_search(index_dir, [(1, "the cats chased")])
    assert list(hits["doc_id"]) == [0]


CODE_DOCS = [
    "def getUserName(self): return self.userName",
    "class XMLHttpRequest: parseHTTP2Frames = get_user_name",
    "GetUserName OR getusername or GET_USER_NAME",
]


def test_code_analyzer_camel_split():
    assert tokenize("getUserName", "code") == ["get", "user", "name"]
    assert tokenize("get_user_name", "code") == ["get", "user", "name"]
    assert tokenize("GetUserName", "code") == ["get", "user", "name"]
    assert tokenize("XMLHttpRequest", "code") == ["xml", "http", "request"]
    assert tokenize("parseHTTP2Frames", "code") == ["parse", "http2", "frames"]
    # the default analyzer keeps identifiers whole (lowercased)
    assert tokenize("getUserName get_user_name") == [
        "getusername", "get_user_name"]


def test_code_analyzer_sql_matches_kernel():
    got = []
    for i, d in enumerate(CODE_DOCS):
        got += [(i, t) for t in tokenize(d, "code")]
    rows = duckdb.sql(
        f"SELECT doc_id, unnest({analyzer_sql('code')}) AS term FROM "
        "(SELECT unnest(range(len(?))) AS doc_id, unnest(?) AS text)",
        params=[CODE_DOCS, CODE_DOCS],
    ).fetchall()
    assert sorted(rows) == sorted(got)


def test_register_analyzer_camel():
    register_analyzer("t_camel", r"[a-z0-9]+", camel=True)
    try:
        assert tokenize("fooBarBaz", "t_camel") == ["foo", "bar", "baz"]
        assert get_analyzer("t_camel").camel
    finally:
        from splade_ray.analysis import ANALYZERS

        del ANALYZERS["t_camel"]


def test_build_with_code_analyzer_end_to_end(ray_session, tmp_path):
    import numpy as np
    import pyarrow.parquet as pq

    from splade_ray.bm25 import BM25Params
    from splade_ray.query import search

    corpus = str(tmp_path / "code.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "content": [
                "def getUserName(): pass",
                "def fetch_rows(): pass",
                "class UserNameError: pass",
            ],
        }),
        corpus,
    )
    index_dir = str(tmp_path / "idx")
    m = build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                    rows_per_segment=2, analyzer="code")
    assert m["analyzer"] == "code"
    # 'user' reaches both camelCase docs; the query analyzes through the
    # same chain (manifest-recorded), so camel query text works too
    run = search(index_dir, [(1, "user"), (2, "userName")],
                 BM25Params(top_k=5))
    assert set(run[run.query_id == 1]["doc_id"]) == {0, 2}
    assert set(run[run.query_id == 2]["doc_id"]) == {0, 2}
