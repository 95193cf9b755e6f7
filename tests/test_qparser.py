"""Lucene classic query-string parsing + unified execution — brute parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts, tokenize
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores
from splade_ray.build import build_index
from splade_ray.positions import build_positions
from splade_ray.qparser import parse_query_string, query_string_search

TEXTS = [
    "the quick brown fox jumps over the lazy dog the quick brown fox",
    "a b a b a b",
    "",
    "!!! ...",
    "quick brown dog",
    "fox fox fox lazy",
    "x a a a y quick",
    "one_token",
    "brown dog sleeps near the quick fox",
    "lazy a b fox quick brown",
]


@pytest.fixture(scope="module")
def qs_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("qstring")
    corpus = str(root / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(len(TEXTS), dtype=np.int64),
                  "text": TEXTS}),
        corpus,
    )
    index_dir = str(root / "index")
    build_index(corpus, index_dir, text_col="text", id_col="doc_id",
                rows_per_segment=4)
    build_positions(index_dir)
    return index_dir


def _phrase_count(text: str, ph: tuple) -> int:
    toks = tokenize(text)
    k = len(ph)
    if k == 0 or len(toks) < k:
        return 0
    return sum(1 for i in range(len(toks) - k + 1)
               if tuple(toks[i:i + k]) == ph)


def brute(queries, params):
    """Direct evaluation of the pinned scoring contract over TEXTS."""
    n_docs = len(TEXTS)
    doc_toks = [tokenize(t) for t in TEXTS]
    doc_lens = np.array([len(t) for t in doc_toks], np.float64)
    avgdl = doc_lens.mean()
    rows = []
    for qid, qs in queries:
        spec = parse_query_string(qs)
        assert not spec.expand, "brute() covers non-expanding queries"
        scores = np.zeros(n_docs)
        qtfs = spec.must + spec.should
        for term, qtf in sorted(qtfs.items()):
            tfs = np.array([t.count(term) for t in doc_toks], np.float64)
            df = int((tfs > 0).sum())
            if df == 0:
                continue
            pos = tfs > 0
            scores[pos] += (idf(df, n_docs) * qtf) * tf_component(
                tfs[pos], doc_lens[pos], avgdl, params)
        for ph in (*spec.must_phrases, *spec.should_phrases):
            cnts = np.array([_phrase_count(t, ph) for t in TEXTS], np.float64)
            df = int((cnts > 0).sum())
            if df == 0:
                continue
            pos = cnts > 0
            scores[pos] += idf(df, n_docs) * tf_component(
                cnts[pos], doc_lens[pos], avgdl, params)
        allowed = np.ones(n_docs, bool)
        for term in spec.must:
            allowed &= np.array([term in t for t in doc_toks])
        for ph in spec.must_phrases:
            allowed &= np.array([_phrase_count(t, ph) > 0 for t in TEXTS])
        for term in spec.must_not:
            allowed &= np.array([term not in t for t in doc_toks])
        for ph in spec.not_phrases:
            allowed &= np.array([_phrase_count(t, ph) == 0 for t in TEXTS])
        scores[~allowed] = 0.0
        docs, scs = topk_from_scores(
            np.arange(n_docs, dtype=np.int64), scores, params.top_k,
            params.threshold)
        rows.extend((qid, r + 1, int(d), float(s))
                    for r, (d, s) in enumerate(zip(docs, scs)))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


QS_QUERIES = [
    (1, 'quick brown'),                          # plain should terms
    (2, '+fox -dog lazy'),                       # must / must_not / should
    (3, '"quick brown" fox'),                    # optional phrase + term
    (4, '+"quick brown" -"lazy dog"'),           # must phrase + not phrase
    (5, '"a b" x'),                              # overlapping phrase counts
    (6, '+quick +brown +fox'),                   # conjunctive
    (7, 'zzz_missing "no such phrase"'),         # nothing matches
    (8, '-quick fox'),                           # pure negation + should
]


def test_query_string_matches_bruteforce(qs_index):
    p = BM25Params(top_k=8)
    got = query_string_search(qs_index, QS_QUERIES, p)
    want = brute(QS_QUERIES, p)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  atol=1e-12, rtol=1e-12)


def test_query_string_expansions(qs_index):
    """Fuzzy (~1) and prefix (*) clauses expand over the lexicon into
    qtf=1 SHOULD terms; the expanded query reproduces the hand-expanded
    equivalent."""
    p = BM25Params(top_k=6)
    got_fz = query_string_search(qs_index, [(1, 'quik~1 dog')], p)
    want_fz = query_string_search(qs_index, [(1, 'quick dog')], p)
    pd.testing.assert_frame_equal(got_fz, want_fz, check_dtype=False)
    got_px = query_string_search(qs_index, [(2, 'laz*')], p)
    want_px = query_string_search(qs_index, [(2, 'lazy')], p)
    pd.testing.assert_frame_equal(got_px, want_px, check_dtype=False)
    # /regex/ clause: anchored RE2 expansion (Lucene RegexpQuery syntax)
    got_rx = query_string_search(qs_index, [(3, '/la.y/ dog')], p)
    want_rx = query_string_search(qs_index, [(3, 'lazy dog')], p)
    pd.testing.assert_frame_equal(got_rx, want_rx, check_dtype=False)


def test_parse_shapes():
    s = parse_query_string('+a -b c "d e" +"f g" -"h i" j~1 k*')
    assert dict(s.must) == {"a": 1}
    assert s.must_not == {"b"}
    assert dict(s.should) == {"c": 1}
    assert s.should_phrases == [("d", "e")]
    assert s.must_phrases == [("f", "g")]
    assert s.not_phrases == [("h", "i")]
    assert ("fuzzy", "j", 1) in s.expand and ("prefix", "k") in s.expand
    s_rx = parse_query_string('/ab.*c/ x')
    assert ("regexp", "ab.*c") in s_rx.expand
    assert dict(s_rx.should) == {"x": 1}
    # repeated clause words accumulate qtf; bare ~ defaults to distance 2
    s2 = parse_query_string('cat cat +cat m~')
    assert dict(s2.should) == {"cat": 2} and dict(s2.must) == {"cat": 1}
    assert ("fuzzy", "m", 2) in s2.expand


def test_cli_qsearch(qs_index, tmp_path):
    import json

    from splade_ray.cli import main

    q = tmp_path / "q.tsv"
    q.write_text('1\t+fox -dog lazy\n2\t"quick brown" fox\n')
    out = str(tmp_path / "run.parquet")
    assert main(["qsearch", "--index", qs_index, "--queries", str(q),
                 "--out", out, "--top-k", "5"]) == 0
    got = pd.read_parquet(out)
    want = query_string_search(
        qs_index, [(1, "+fox -dog lazy"), (2, '"quick brown" fox')],
        BM25Params(top_k=5))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
