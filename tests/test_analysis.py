import numpy as np
import pyarrow as pa

from splade_ray.analysis import doc_stats_batch, postings_batch, term_counts, tokenize
from splade_ray.bm25 import BM25Params, topk_from_scores
from splade_ray.oracle import OracleIndex


def test_tokenize_basic():
    assert tokenize("Def Foo_bar(x1): return x1+2") == [
        "def", "foo_bar", "x1", "return", "x1", "2",
    ]


def test_tokenize_unicode_and_empty():
    assert tokenize("") == []
    assert tokenize("   \n\t ") == []
    # CJK / accents are not in [a-z0-9_] -> dropped, same as the SQL oracle
    assert tokenize("注释 ünïcode λ abc") == ["n", "code", "abc"]


def test_tokenize_scalar_vectorized_parity_nonascii():
    """Scalar tokenize must agree with the vectorized column kernel AND the
    DuckDB oracle on full-Unicode case mapping. Python's str.lower maps
    'İ' -> 'i' + combining dot (the combining mark then splits the token);
    Arrow's utf8_lower and DuckDB's lower map 'İ' -> 'i'. The scalar path
    wraps the Arrow kernel, so all three agree (round-1 ADVICE, medium)."""
    import duckdb

    from splade_ray.analysis import TOKEN_SQL, tokenize_column

    cases = ["İstanbul", "STRASSE ß", "ÇOCUK İki", "mixed İd_3 Σσς"]
    for text in cases:
        scalar = tokenize(text)
        terms, par, _ = tokenize_column(pa.array([text], pa.string()))
        assert scalar == terms.to_pylist(), text
        sql = duckdb.sql(
            "SELECT unnest(regexp_extract_all(lower(?), ?))", params=[text, TOKEN_SQL]
        ).fetchall()
        assert scalar == [r[0] for r in sql], text
    assert tokenize("İstanbul") == ["istanbul"]


def test_per_lang_analyzers():
    """Registry behavior: code langs split identifiers on '_', zh keeps han
    runs, fr keeps accents, unregistered langs use the default class."""
    from splade_ray.analysis import postings_by_lang_batch, register_analyzer

    b = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["foo_bar baz", "foo_bar baz", "这是中文 test", "café naïve"],
            "lang": ["py", "en", "zh", "fr"],
        }
    )
    rows = {
        (d, t): f
        for t, d, f in zip(*[postings_by_lang_batch(b)[c].to_pylist() for c in ("term", "doc_id", "tf")])
    }
    assert (0, "foo") in rows and (0, "bar") in rows and (0, "foo_bar") not in rows
    assert (1, "foo_bar") in rows  # default analyzer keeps underscores
    assert (2, "这是中文") in rows
    assert (3, "café") in rows and (3, "naïve") in rows

    # extension surface: register an override and see it take effect
    register_analyzer("digits", "[0-9]+")
    b2 = pa.table(
        {"doc_id": pa.array([9], pa.int64()), "text": ["ab12cd34"], "lang": ["digits"]}
    )
    out2 = postings_by_lang_batch(b2)
    assert sorted(out2["term"].to_pylist()) == ["12", "34"]
    from splade_ray.analysis import ANALYZERS

    del ANALYZERS["digits"]


def test_postings_batch():
    t = pa.table({"doc_id": [7, 8], "text": ["a b a", "b"]})
    out = postings_batch(t)
    rows = sorted(zip(out["term"].to_pylist(), out["doc_id"].to_pylist(), out["tf"].to_pylist()))
    assert rows == [("a", 7, 2), ("b", 7, 1), ("b", 8, 1)]


def test_doc_stats_batch_handles_null():
    t = pa.table({"doc_id": [1, 2], "text": pa.array(["a a b", None], pa.string())})
    out = doc_stats_batch(t)
    assert out["n_tokens"].to_pylist() == [3, 0]
    assert out["n_distinct"].to_pylist() == [2, 0]


def test_topk_tiebreak_docid_asc():
    docs = np.array([5, 3, 9, 1], np.int64)
    scores = np.array([1.0, 2.0, 2.0, 0.5])
    d, s = topk_from_scores(docs, scores, k=3, threshold=0.0)
    assert d.tolist() == [3, 9, 5]  # 2.0 tie -> doc_id asc
    assert s.tolist() == [2.0, 2.0, 1.0]


def test_topk_threshold_excludes_equal():
    docs = np.array([1, 2], np.int64)
    scores = np.array([0.4, 0.41])
    d, _ = topk_from_scores(docs, scores, k=5, threshold=0.4)
    assert d.tolist() == [2]  # strictly greater, matching `scores > threshold`


def test_oracle_bm25_manual():
    # two docs, hand-checkable BM25
    oi = OracleIndex([0, 1], ["a b", "a a a"], BM25Params(top_k=10))
    docs, scores = oi.search_one("a")
    assert set(docs.tolist()) == {0, 1}
    # doc1 has higher tf for 'a' -> ranks first
    assert docs[0] == 1 and scores[0] > scores[1]


def test_oracle_qtf_multiplies():
    oi = OracleIndex([0, 1], ["a b", "c d"], BM25Params())
    d1, s1 = oi.search_one("a")
    d2, s2 = oi.search_one("a a")
    assert np.array_equal(d1, d2)
    assert np.allclose(s2, 2 * s1)
