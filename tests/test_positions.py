"""Positional layer + phrase search + boolean retrieval tests."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import tokenize
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores
from splade_ray.build import build_index
from splade_ray.codec import varbyte_decode
from splade_ray.corpus import synth_corpus
from splade_ray.positions import (
    SegmentPositions,
    build_positions,
    build_positions_table,
    load_positions_manifest,
    phrase_search,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog the quick brown fox",
    "a b a b a b",
    "",
    "!!! ...",                       # tokenizes to nothing
    "quick brown",
    "fox fox fox",
    "x a a a y",                     # overlapping 'a a' -> 2
    "one_token",
]


def scalar_positions(texts):
    """{term: {doc_i: [positions]}} by direct Python iteration."""
    out = {}
    for i, text in enumerate(texts):
        for p, t in enumerate(tokenize(text)):
            out.setdefault(t, {}).setdefault(i, []).append(p)
    return out


def scalar_phrase_count(text, phrase_toks):
    toks = tokenize(text)
    k = len(phrase_toks)
    if k == 0 or len(toks) < k:
        return 0
    return sum(
        1 for i in range(len(toks) - k + 1) if toks[i : i + k] == phrase_toks
    )


def test_positions_table_scalar_parity():
    """Every (term, doc) position stream decodes back to the direct Python
    scan, across empty docs, repeats and single-token docs."""
    doc_ids = np.arange(10, 10 + len(TEXTS), dtype=np.int64)
    t = build_positions_table(pa.array(TEXTS, pa.string()), doc_ids)
    ref = scalar_positions(TEXTS)
    assert sorted(t["term"].to_pylist()) == sorted(ref)
    for i, term in enumerate(t["term"].to_pylist()):
        df = t["df"][i].as_py()
        docs = np.cumsum(varbyte_decode(t["docs_enc"][i].as_py(), df).astype(np.int64))
        tf = varbyte_decode(t["tf_enc"][i].as_py(), df).astype(np.int64)
        blen = varbyte_decode(t["len_enc"][i].as_py(), df).astype(np.int64)
        want = ref[term]
        assert docs.tolist() == [10 + d for d in sorted(want)], term
        assert tf.tolist() == [len(want[d]) for d in sorted(want)], term
        assert t["n_pos"][i].as_py() == sum(len(v) for v in want.values())
        # decode every stream and compare positions
        buf = np.frombuffer(t["pos_enc"][i].as_py(), np.uint8)
        starts = np.concatenate(([0], np.cumsum(blen)))
        for j, d in enumerate(sorted(want)):
            deltas = varbyte_decode(buf[starts[j] : starts[j + 1]], int(tf[j]))
            assert np.cumsum(deltas.astype(np.int64)).tolist() == want[d], (term, d)


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("positions")
    corpus = str(root / "c.parquet")
    pq.write_table(
        pa.table(
            {"doc_id": np.arange(len(TEXTS), dtype=np.int64), "text": TEXTS}
        ),
        corpus,
    )
    index_dir = str(root / "index")
    build_index(corpus, index_dir, text_col="text", id_col="doc_id", rows_per_segment=3)
    build_positions(index_dir)
    return index_dir


PHRASES = [
    (0, "quick brown fox"),
    (1, "a b"),
    (2, "a a"),
    (3, "fox"),
    (4, "the quick brown fox jumps"),
    (5, "zzz not_here"),
    (6, "..."),           # tokenizes to nothing -> matches nothing
    (7, "one_token"),
]


def test_phrase_search_matches_python(pos_index):
    got = phrase_search(pos_index, PHRASES)
    rows = []
    for pid, text in PHRASES:
        toks = tokenize(text)
        if not toks:
            continue
        for d, doc_text in enumerate(TEXTS):
            c = scalar_phrase_count(doc_text, toks)
            if c:
                rows.append((pid, d, c))
    want = pd.DataFrame(rows, columns=["phrase_id", "doc_id", "phrase_count"])
    want = want.sort_values(["phrase_id", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64)
    )
    # spot-check overlapping semantics: 'a a' in 'x a a a y' counts 2
    assert got[(got.phrase_id == 2) & (got.doc_id == 6)].phrase_count.item() == 2


def test_phrase_search_synth_corpus_parity(ray_session, tmp_path):
    """Larger randomized corpus across many segments: engine == Python scan
    for bigram/trigram phrases drawn from the corpus itself."""
    t = synth_corpus(300, seed=7)
    texts = t["content"].to_pylist()
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(300, dtype=np.int64), "content": texts}), corpus
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id", rows_per_segment=40)
    build_positions(index_dir)
    toks0 = tokenize(texts[0])
    phrases = [
        (0, " ".join(toks0[:2])),
        (1, " ".join(toks0[3:6])),
        (2, " ".join(toks0[:1])),
    ]
    got = phrase_search(index_dir, phrases)
    rows = []
    for pid, text in phrases:
        ptoks = tokenize(text)
        for d, doc_text in enumerate(texts):
            c = scalar_phrase_count(doc_text, ptoks)
            if c:
                rows.append((pid, d, c))
    want = (
        pd.DataFrame(rows, columns=["phrase_id", "doc_id", "phrase_count"])
        .sort_values(["phrase_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


def test_build_positions_resumable_and_pending(pos_index):
    # second run skips every segment
    man = build_positions(pos_index)
    assert man["n_segments_skipped"] == man["n_segments"]
    # pending marker blocks querying
    ppath = os.path.join(pos_index, "positions.json")
    with open(ppath) as fh:
        good = json.load(fh)
    with open(ppath, "w") as fh:
        json.dump({**good, "pending": True}, fh)
    with pytest.raises(ValueError, match="pending"):
        load_positions_manifest(pos_index)
    with pytest.raises(ValueError, match="pending"):
        phrase_search(pos_index, PHRASES)
    # completing the build recovers (skips segments, rewrites manifest)
    man = build_positions(pos_index)
    assert man["n_segments_skipped"] == man["n_segments"]
    load_positions_manifest(pos_index)


def test_positions_by_lang_analyzer(ray_session, tmp_path):
    """Index built with lang_col: positions follow each doc's registered
    token class (py splits identifiers on underscores), so a phrase over
    the split tokens matches."""
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": [0, 1],
                "text": ["foo_bar baz", "foo_bar baz"],
                "lang": ["py", "en"],
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(
        corpus, index_dir, text_col="text", id_col="doc_id",
        lang_col="lang", rows_per_segment=10,
    )
    build_positions(index_dir)
    # doc 0 (py): tokens foo, bar, baz -> phrase "foo bar" matches
    # doc 1 (en fallback): token foo_bar stays whole -> no match
    got = phrase_search(index_dir, [(0, "foo bar"), (1, "foo_bar baz")])
    by = {(r.phrase_id, r.doc_id): r.phrase_count for r in got.itertuples()}
    assert by == {(0, 0): 1, (1, 1): 1}


# ----------------------------------------------------------------- boolean


def brute_boolean(texts, doc_ids, queries, params):
    """Direct Python boolean+BM25 reference (OracleIndex semantics with
    clause filters)."""
    from splade_ray.analysis import term_counts
    from splade_ray.oracle import OracleIndex

    oi = OracleIndex(doc_ids, texts, params)
    rows = []
    for qid, spec in queries:
        must = sorted(term_counts(spec.get("must", "") or ""))
        must_not = sorted(term_counts(spec.get("must_not", "") or ""))
        score_tf = term_counts(spec.get("must", "") or "") + term_counts(
            spec.get("should", "") or ""
        )
        scores = np.zeros(oi.n_docs, np.float64)
        for term in sorted(score_tf):
            if term not in oi.postings:
                continue
            pos, tf = oi.postings[term]
            w = idf(len(pos), oi.n_docs) * score_tf[term]
            scores[pos] += w * tf_component(tf, oi.doc_lens[pos], oi.avgdl, params)
        allowed = np.ones(oi.n_docs, bool)
        for t in must:
            m = np.zeros(oi.n_docs, bool)
            if t in oi.postings:
                m[oi.postings[t][0]] = True
            allowed &= m
        for t in must_not:
            if t in oi.postings:
                allowed[oi.postings[t][0]] = False
        should = sorted(term_counts(spec.get("should", "") or ""))
        msm = int(spec.get("minimum_should_match", 0))
        if msm > 0 and should:
            cnt = np.zeros(oi.n_docs, np.int32)
            for t in should:
                if t in oi.postings:
                    cnt[oi.postings[t][0]] += 1
            allowed &= cnt >= msm
        scores[~allowed] = 0.0
        docs, scs = topk_from_scores(oi.doc_ids, scores, params.top_k, params.threshold)
        for r, (d, s) in enumerate(zip(docs, scs), start=1):
            rows.append((int(qid), r, int(d), float(s)))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


BOOL_QS = [
    (1, {"must": "fox", "should": "lazy dog"}),
    (2, {"must": "quick brown", "must_not": "dog"}),
    (3, {"should": "a b"}),
    (4, {"must": "zzz"}),
    (5, {"must": "fox", "must_not": "fox"}),
    (6, {"must_not": "the", "should": "quick fox a"}),
]


def test_boolean_search_matches_bruteforce(pos_index):
    from splade_ray.boolq import boolean_search

    params = BM25Params(top_k=5)
    got = boolean_search(pos_index, BOOL_QS, params)
    want = brute_boolean(
        TEXTS, np.arange(len(TEXTS), dtype=np.int64), BOOL_QS, params
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"rank": np.int64}),
        want.astype({"rank": np.int64}),
    )
    # semantics spot checks
    by_q = {q: set(g.doc_id) for q, g in got.groupby("query_id")}
    assert by_q.get(4) is None          # must term absent everywhere
    assert by_q.get(5) is None          # must & must_not same term
    assert 0 not in by_q.get(2, set())  # doc 0 has 'dog' -> excluded


def test_boolean_minimum_should_match(pos_index):
    """Lucene msm semantics: >= m DISTINCT should terms present; m beyond
    the distinct-term count matches nothing; m=0 keeps should optional."""
    from splade_ray.boolq import boolean_search

    params = BM25Params(top_k=10)
    qs = [
        (1, {"should": "quick lazy dog", "minimum_should_match": 2}),
        (2, {"must": "fox", "should": "lazy dog", "minimum_should_match": 1}),
        (3, {"should": "quick lazy", "minimum_should_match": 3}),  # m > |should|
        (4, {"should": "quick lazy dog", "minimum_should_match": 0}),
    ]
    got = boolean_search(pos_index, qs, params)
    want = brute_boolean(
        TEXTS, np.arange(len(TEXTS), dtype=np.int64), qs, params
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"rank": np.int64}),
        want.astype({"rank": np.int64}),
    )
    by_q = {q: set(g.doc_id) for q, g in got.groupby("query_id")}
    assert by_q.get(3) is None                     # msm > distinct should terms
    assert by_q.get(1, set()) < by_q.get(4, set())  # msm=2 strictly shrinks msm=0


def test_boolean_search_synth_corpus(ray_session, tmp_path):
    from splade_ray.boolq import boolean_search

    t = synth_corpus(250, seed=11)
    texts = t["content"].to_pylist()
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(250, dtype=np.int64), "content": texts}), corpus
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id", rows_per_segment=40)
    toks = tokenize(texts[0])
    qs = [
        (0, {"must": toks[0], "should": " ".join(toks[1:3])}),
        (1, {"must": " ".join(toks[:2]), "must_not": toks[3]}),
        (2, {"should": " ".join(toks[:4]), "must_not": toks[0]}),
    ]
    params = BM25Params(top_k=10)
    got = boolean_search(index_dir, qs, params)
    want = brute_boolean(texts, np.arange(250, dtype=np.int64), qs, params)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"rank": np.int64}),
        want.astype({"rank": np.int64}),
    )


def test_phrase_and_boolean_oracle_parity_duckdb(ray_session, tmp_path):
    """Local twin of the driver's correctness gate for `phrase_search` and
    `boolean_topk`: the generated DuckDB SQL reproduces the Ray results on
    a small documents table."""
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    import __ray_entry__ as e

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    t = synth_corpus(120, seed=3)
    docs = pa.table(
        {"doc_id": np.arange(120, dtype=np.int64), "text": t["content"]}
    )
    pq.write_table(docs, os.path.join(sf_dir, "documents.parquet"))
    con = duckdb.connect()
    con.register("documents", docs.to_pandas())
    for name, qfn, sql in [
        ("phrase_search", e.q_phrase_search, e._phrase_sql()),
        ("boolean_topk", e.q_boolean_topk, e._boolean_sql()),
    ]:
        got = qfn(sf_dir)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        want = con.execute(sql).df()
        cols = sorted(got.columns)
        assert cols == sorted(want.columns), name
        key = [c for c in cols if not c.startswith("score")]
        got = got.sort_values(key).reset_index(drop=True)[cols]
        want = want.sort_values(key).reset_index(drop=True)[cols]
        for c in cols:
            assert got[c].astype(np.float64).tolist() == pytest.approx(
                want[c].astype(np.float64).tolist()
            ), (name, c)


def test_phrase_topk_matches_bruteforce(pos_index):
    """phrase_topk == brute-force BM25 with the phrase as one virtual term
    (tf = occurrence count, df = matching docs)."""
    from splade_ray.positions import phrase_topk

    params = BM25Params(top_k=3)
    got = phrase_topk(pos_index, PHRASES, params)
    # brute force over TEXTS
    doc_lens = [len(tokenize(t)) for t in TEXTS]
    n = len(TEXTS)
    avgdl = sum(doc_lens) / n
    rows = []
    for pid, text in PHRASES:
        ptoks = tokenize(text)
        if not ptoks:
            continue
        matches = [
            (d, scalar_phrase_count(t, ptoks))
            for d, t in enumerate(TEXTS)
            if scalar_phrase_count(t, ptoks) > 0
        ]
        if not matches:
            continue
        w = idf(len(matches), n)
        scored = sorted(
            (
                (
                    -w * float(tf_component(
                        np.array([c], np.int64), np.array([doc_lens[d]], np.int64),
                        avgdl, params,
                    )[0]),
                    d,
                )
                for d, c in matches
            ),
        )[: params.top_k]
        for r, (negs, d) in enumerate(scored, start=1):
            rows.append((pid, r, d, -negs))
    want = pd.DataFrame(rows, columns=["phrase_id", "rank", "doc_id", "score"])
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"rank": np.int64}),
        want.astype({"rank": np.int64}),
    )


def _brute_near(texts, queries, slop):
    """Greedy ordered-chain starts within span <= k-1+slop."""
    from splade_ray.analysis import tokenize

    out = {}
    for pid, q in queries:
        qt = tokenize(q)
        k = len(qt)
        for did, tx in enumerate(texts):
            toks = tokenize(tx)
            n = 0
            for i, t0 in enumerate(toks):
                if t0 != qt[0]:
                    continue
                cur = i
                ok = True
                for t in qt[1:]:
                    nxt = next((j for j in range(cur + 1, len(toks))
                                if toks[j] == t), None)
                    if nxt is None:
                        ok = False
                        break
                    cur = nxt
                if ok and cur - i <= k - 1 + slop:
                    n += 1
            if n:
                out[(pid, did)] = n
    return out


def test_near_search_matches_bruteforce(pos_index):
    from splade_ray.positions import near_search

    index_dir, texts = pos_index, TEXTS
    queries = [(1, "quick fox"), (2, "a b"), (3, "fox dog"),
               (4, "the quick fox"), (5, "a a")]
    for slop in (0, 1, 3):
        got = near_search(index_dir, queries, slop=slop)
        want = _brute_near(texts, queries, slop)
        assert {
            (r.phrase_id, r.doc_id): r.phrase_count for r in got.itertuples()
        } == want, slop
    # slop=0 == exact phrase semantics
    near0 = near_search(index_dir, queries, slop=0)
    ph = phrase_search(index_dir, queries)
    pd.testing.assert_frame_equal(near0, ph, check_dtype=False)


def _brute_near_unordered(texts, queries, slop):
    """Starts = occurrences of any query term with every term in
    [p, p+k-1+slop]."""
    from splade_ray.analysis import tokenize

    out = {}
    for pid, q in queries:
        qt = list(dict.fromkeys(tokenize(q)))
        qt_set = set(tokenize(q))
        k = len(tokenize(q))
        bound = k - 1 + slop
        for did, tx in enumerate(texts):
            toks = tokenize(tx)
            n = 0
            for p, t in enumerate(toks):
                if t not in qt_set:
                    continue
                window = set(toks[p : p + bound + 1])
                if all(t2 in window for t2 in qt_set):
                    n += 1
            if n:
                out[(pid, did)] = n
    return out


def test_near_search_unordered_matches_bruteforce(pos_index):
    from splade_ray.positions import near_search

    queries = [(1, "fox quick"), (2, "b a"), (3, "dog fox the"), (4, "a a")]
    for slop in (0, 2, 5):
        got = near_search(pos_index, queries, slop=slop, ordered=False)
        want = _brute_near_unordered(TEXTS, queries, slop)
        assert {
            (r.phrase_id, r.doc_id): r.phrase_count for r in got.itertuples()
        } == want, slop


def test_span_first_matches_bruteforce(pos_index):
    from splade_ray.positions import span_first_search

    queries = [(1, "fox"), (2, "a"), (3, "one_token"), (4, "zzz_absent")]
    for limit in (1, 3, 6):
        got = span_first_search(pos_index, queries, limit=limit)
        want = {}
        for qid, q in queries:
            (t,) = tokenize(q)
            for did, tx in enumerate(TEXTS):
                n = sum(1 for p, tok in enumerate(tokenize(tx))
                        if tok == t and p < limit)
                if n:
                    want[(qid, did)] = n
        assert {
            (r.query_id, r.doc_id): r.n_occ for r in got.itertuples()
        } == want, limit


def test_span_not_matches_bruteforce(pos_index):
    from splade_ray.positions import span_not_search

    queries = [
        (1, {"include": "fox", "exclude": "quick"}),
        (2, {"include": "a", "exclude": "b"}),
        (3, {"include": "a", "exclude": "zzz_absent"}),
        (4, {"include": "zzz_absent", "exclude": "a"}),
    ]
    for pre, post in ((0, 0), (1, 0), (0, 2), (2, 3)):
        got = span_not_search(pos_index, queries, pre=pre, post=post)
        want = {}
        for qid, q in queries:
            (inc,) = tokenize(q["include"])
            (exc,) = tokenize(q["exclude"])
            for did, tx in enumerate(TEXTS):
                toks = tokenize(tx)
                xpos = [p for p, t in enumerate(toks) if t == exc]
                n = sum(
                    1 for p, t in enumerate(toks)
                    if t == inc
                    and not any(p - pre <= x <= p + post for x in xpos)
                )
                if n:
                    want[(qid, did)] = n
        assert {
            (r.query_id, r.doc_id): r.n_occ for r in got.itertuples()
        } == want, (pre, post)


def test_span_not_rejects_multiterm(pos_index):
    from splade_ray.positions import span_not_search

    with pytest.raises(ValueError, match="single-term"):
        span_not_search(pos_index, [(1, {"include": "a b", "exclude": "c"})])


def _brute_multi_phrase(texts, slot_queries):
    """{(pid, doc): count} by direct scan: slot i matches any alternative
    token at start+i."""
    want = {}
    for pid, slots in slot_queries:
        k = len(slots)
        if k == 0 or any(not s for s in slots):
            continue
        for did, tx in enumerate(texts):
            toks = tokenize(tx)
            n = sum(
                1
                for i in range(len(toks) - k + 1)
                if all(toks[i + j] in slots[j] for j in range(k))
            )
            if n:
                want[(pid, did)] = n
    return want


def test_multi_phrase_matches_bruteforce(pos_index):
    from splade_ray.positions import multi_phrase_search

    queries = [
        (1, [["quick"], ["brown", "lazy"]]),          # OR in slot 2
        (2, [["the"], ["quick", "lazy"], ["brown", "dog"]]),
        (3, [["a", "b"], ["a", "b"]]),                # every bigram in doc 1
        (4, [["fox", "dog"]]),                        # single-slot union (tf sum)
        (5, [["quick"], ["zzz_absent"]]),             # dead slot -> no match
        (6, [["x", "y"], ["a"]]),
    ]
    got = multi_phrase_search(pos_index, queries)
    want = _brute_multi_phrase(TEXTS, queries)
    assert {
        (r.phrase_id, r.doc_id): r.phrase_count for r in got.itertuples()
    } == want
    # single-alt slots reduce exactly to phrase_search
    from splade_ray.positions import phrase_search

    single = [(pid, " ".join(s[0] for s in slots))
              for pid, slots in [(10, [["quick"], ["brown"]]), (11, [["a"], ["b"]])]]
    ps = phrase_search(pos_index, single)
    mp = multi_phrase_search(
        pos_index, [(10, [["quick"], ["brown"]]), (11, [["a"], ["b"]])]
    )
    pd.testing.assert_frame_equal(ps, mp)


def test_multi_phrase_rejects_multitoken_alt(pos_index):
    from splade_ray.positions import multi_phrase_search

    with pytest.raises(ValueError, match="single-token"):
        multi_phrase_search(pos_index, [(1, [["quick brown"], ["fox"]])])


def test_match_phrase_prefix_bruteforce(pos_index):
    from splade_ray.positions import match_phrase_prefix_search

    queries = [
        (1, "quick bro"),     # -> brown
        (2, "the qui"),
        (3, "fo"),            # single-token prefix: fox occurrences sum
        (4, "lazy do"),
        (5, "quick zzz"),     # no expansion -> no rows
        (6, "one_tok"),
    ]
    got = match_phrase_prefix_search(pos_index, queries, max_expansions=100)
    want = {}
    for pid, text in queries:
        toks = tokenize(text)
        head, pre = toks[:-1], toks[-1]
        k = len(toks)
        for did, tx in enumerate(TEXTS):
            dt = tokenize(tx)
            n = sum(
                1
                for i in range(len(dt) - k + 1)
                if dt[i : i + k - 1] == head and dt[i + k - 1].startswith(pre)
            )
            if n:
                want[(pid, did)] = n
    assert {
        (r.phrase_id, r.doc_id): r.phrase_count for r in got.itertuples()
    } == want


def test_match_phrase_prefix_expansion_cap(pos_index):
    """max_expansions keeps only the lexicographically-first expansions
    (Lucene rewrite cap): with cap=1 the prefix 'f' must behave as its
    first lexicon term only."""
    from splade_ray.positions import match_phrase_prefix_search
    from splade_ray.suggest import expand_prefix

    full = expand_prefix(pos_index, "f", max_terms=100)
    assert len(full) >= 1
    first = full[0]
    capped = match_phrase_prefix_search(pos_index, [(1, "f")], max_expansions=1)
    want = {}
    for did, tx in enumerate(TEXTS):
        n = sum(1 for t in tokenize(tx) if t == first)
        if n:
            want[(1, did)] = n
    assert {
        (r.phrase_id, r.doc_id): r.phrase_count for r in capped.itertuples()
    } == want


def _brute_spans(toks, big, slop):
    """Greedy ordered-chain spans [(start, end)] of big within slop."""
    spans = []
    k = len(big)
    bound = k - 1 + slop
    for p0, t in enumerate(toks):
        if t != big[0]:
            continue
        cur = p0
        ok = True
        for nxt in big[1:]:
            fol = next((j for j in range(cur + 1, len(toks)) if toks[j] == nxt), None)
            if fol is None:
                ok = False
                break
            cur = fol
        if ok and cur - p0 <= bound:
            spans.append((p0, cur))
    return spans


@pytest.mark.parametrize("mode", ["containing", "within"])
def test_span_containing_within_bruteforce(pos_index, mode):
    from splade_ray.positions import span_containing_search, span_within_search

    fn = span_containing_search if mode == "containing" else span_within_search
    queries = [
        (1, {"big": "quick fox", "little": "brown"}),   # brown between them
        (2, {"big": "a b", "little": "a"}),             # little = a big term
        (3, {"big": "the dog", "little": "lazy"}),
        (4, {"big": "x y", "little": "a"}),             # x..y spans the a's
        (5, {"big": "fox", "little": "fox"}),           # zero-length spans
        (6, {"big": "quick fox", "little": "zzz_none"}),
    ]
    for slop in (0, 1, 2, 4):
        got = fn(pos_index, queries, slop=slop)
        want = {}
        for qid, q in queries:
            big, (little,) = tokenize(q["big"]), tokenize(q["little"])
            for did, tx in enumerate(TEXTS):
                toks = tokenize(tx)
                spans = _brute_spans(toks, big, slop)
                lpos = [p for p, t in enumerate(toks) if t == little]
                if mode == "containing":
                    n = sum(1 for s, e in spans if any(s <= p <= e for p in lpos))
                else:
                    n = sum(1 for p in lpos if any(s <= p <= e for s, e in spans))
                if n:
                    want[(qid, did)] = n
        assert {
            (r.query_id, r.doc_id): r.n_spans for r in got.itertuples()
        } == want, (mode, slop)


def test_span_rel_rejects_multiterm_little(pos_index):
    from splade_ray.positions import span_containing_search

    with pytest.raises(ValueError, match="single-term"):
        span_containing_search(pos_index, [(1, {"big": "a b", "little": "a b"})])
