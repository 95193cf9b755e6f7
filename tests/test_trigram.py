"""Trigram substring-search layer tests."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.trigram import (
    build_trigram_table,
    build_trigrams,
    doc_trigrams,
    grep_scan,
    needle_trigrams,
    substring_search,
)

TEXTS = [
    "Hello World",
    "def foo_bar(x): return x",
    "",
    "ab",                      # shorter than one trigram
    "aaaa",                    # repeated trigram within one doc
    "déf ünïcode",             # multi-byte UTF-8
    "hello hello hello",
]


def scalar_trigrams(text):
    b = text.lower().encode("utf-8")
    return {b[i : i + 3] for i in range(len(b) - 2)}


def test_doc_trigrams_scalar_parity():
    rows, tris = doc_trigrams(pa.array(TEXTS, pa.string()))
    got = {}
    for r, t in zip(rows.tolist(), tris.tolist()):
        got.setdefault(r, set()).add(bytes([t >> 16, (t >> 8) & 0xFF, t & 0xFF]))
    for i, text in enumerate(TEXTS):
        assert got.get(i, set()) == scalar_trigrams(text), f"doc {i}"


def test_trigram_table_no_cross_doc_trigrams():
    """Trigrams spanning adjacent docs in the flat buffer must not appear."""
    t = build_trigram_table(pa.array(["xyz", "zyx"], pa.string()), np.array([0, 1]))
    tris = {
        bytes([k >> 16, (k >> 8) & 0xFF, k & 0xFF]) for k in t["tri"].to_pylist()
    }
    assert tris == {b"xyz", b"zyx"}


def test_substring_search_matches_bruteforce(ray_session, tmp_path):
    t = synth_corpus(200, seed=13)
    texts = t["content"].to_pylist()
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(200, dtype=np.int64), "content": texts}), corpus
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id", rows_per_segment=30)
    man = build_trigrams(index_dir)
    assert man["n_segments"] == 7

    # needles: common token, rare token, absent string, case-mixed,
    # sub-3-byte fallback, multi-byte unicode
    needles = [
        (0, "return"),
        (1, "rare_token_37"),
        (2, "no_such_string_anywhere"),
        (3, "RETURN"),
        (4, "x"),
        (5, "注"),
    ]
    got = substring_search(index_dir, needles)
    exp = []
    for qid, ndl in needles:
        n = ndl.lower()
        for d, text in enumerate(texts):
            c = text.lower().count(n)
            if c > 0:
                exp.append((qid, d, c))
    exp.sort()
    assert list(map(tuple, got[["query_id", "doc_id", "n_occurrences"]].values)) == exp


def test_substring_search_resumable(ray_session, tmp_path):
    t = synth_corpus(60, seed=5)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {"doc_id": np.arange(60, dtype=np.int64), "content": t["content"]}
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id", rows_per_segment=20)
    m1 = build_trigrams(index_dir)
    assert m1["n_segments_skipped"] == 0
    m2 = build_trigrams(index_dir)
    assert m2["n_segments_skipped"] == m2["n_segments"] == 3

    # crash mid-build: pending marker forces query-side refusal
    tpath = os.path.join(index_dir, "trigrams.json")
    import json

    with open(tpath, "w") as fh:
        json.dump({"text_col": "content", "pending": True}, fh)
    with pytest.raises(ValueError, match="pending"):
        substring_search(index_dir, [(0, "return")])
    build_trigrams(index_dir)
    substring_search(index_dir, [(0, "return")])


def test_grep_scan_substring_and_regex(ray_session):
    import ray.data as rd

    texts = ["Foo bar foo", "bar", "foobar FOO", "", "fo"]
    ds = rd.from_arrow(
        pa.table({"doc_id": np.arange(5, dtype=np.int64), "text": texts})
    )
    sub = grep_scan(ds, [(0, "foo")], id_col="doc_id").to_pandas()
    sub = sub.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    assert list(map(tuple, sub.values)) == [(0, 0, 2), (0, 2, 2)]

    rex = grep_scan(
        rd.from_arrow(pa.table({"doc_id": np.arange(5, dtype=np.int64), "text": texts})),
        [(1, r"fo+")],
        id_col="doc_id",
        regex=True,
    ).to_pandas()
    rex = rex.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    assert list(map(tuple, rex.values)) == [(1, 0, 2), (1, 2, 2), (1, 4, 1)]


def test_required_trigram_groups_soundness():
    from splade_ray.trigram import required_trigram_groups

    def tris(s):
        b = s.encode()
        return {b[i:i + 3] for i in range(len(b) - 2)}

    # group sizes / shapes for representative patterns
    assert required_trigram_groups(r"ab+c") == []          # no 3-byte literal
    assert len(required_trigram_groups(r"zzz+")) == 1       # run+body fold
    assert len(required_trigram_groups(r"batch\s+batch")) == 2
    assert required_trigram_groups(r"foo|ab") == []         # short alternative voids
    g = required_trigram_groups(r"foobar|bazqux")
    assert len(g) == 1 and len(g[0]) == 2                   # OR group


def test_required_literals_char_classes():
    """Small character classes multiply the literal run's alternative set
    (bounded); big/negated/range classes break the run conservatively."""
    from splade_ray.trigram import _seq_literals, _sre

    def lits(pat):
        return _seq_literals(_sre.parse(pat))

    assert lits(r"[Tt]oken") == [{"token"}]          # lowering dedupes
    assert lits(r"colo[uU]r") == [{"colour"}]
    assert lits(r"[ab]cde") == [{"acde", "bcde"}]
    assert lits(r"[ab]cd[ef]") == [{"acde", "acdf", "bcde", "bcdf"}]
    assert lits(r"[0-9]abc") == [{"abc"}]            # range breaks, run restarts
    assert lits(r"[^x]abc") == [{"abc"}]             # negated class breaks
    assert lits(r"[abcde]xyz") == [{"xyz"}]          # class too wide (5 > 4)
    # alternative-set cap: 5 classes would be 32 alts; the first 4 flush
    # as a sound 16-alt group, the 5th restarts the run
    g = lits(r"[ab][cd][ef][gh][ij]kl")
    assert len(g) == 2 and len(g[0]) == 16 and g[1] == {"ikl", "jkl"}
    # nested-branch soundness regression: requiring only the longest
    # literal of the inner OR group would wrongly prune 'bazqux' matches
    g = lits(r"(?:(?:foobar|bazqux)|hello)")
    assert g == [{"foobar", "bazqux", "hello"}]


def test_regex_search_matches_full_scan(ray_session, tmp_path):
    import re

    import ray.data as rd

    from splade_ray.trigram import build_trigrams, grep_scan, regex_search

    t = synth_corpus(150, seed=31)
    texts = t["content"].to_pylist()
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(150, dtype=np.int64), "content": texts}), corpus
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=25)
    build_trigrams(index_dir)
    pats = [
        (0, r"return\s+\w+"),        # literal + class
        (1, r"rare_token_\d+"),      # selective prefix
        (2, r"def|class"),           # OR group, both >=3 bytes
        (3, r"x\d"),                 # no pruning possible -> fallback
        (4, r"no_such_literal_zzz"),
        (5, r"[Rr]eturn"),           # small char class folds into the run
        (6, r"rare_[st]oken_1"),     # class mid-run
        (7, r"[0-9]+ merge"),        # range class breaks, literal prunes
    ]
    pruned = regex_search(index_dir, pats)
    ds = rd.from_arrow(
        pa.table({"doc_id": np.arange(150, dtype=np.int64), "text": texts})
    )
    full = (
        grep_scan(ds, pats, regex=True)
        .to_pandas()
        .sort_values(["query_id", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pruned, full)
    # and against plain re (overlap semantics: leftmost non-overlapping)
    for qid, pat in pats:
        want = {
            (qid, i, len(re.findall(pat, tx, re.I)))
            for i, tx in enumerate(texts)
            if re.search(pat, tx, re.I)
        }
        got = {
            tuple(r)
            for r in pruned[pruned["query_id"] == qid][
                ["query_id", "doc_id", "n_occurrences"]
            ].values
        }
        assert got == want, pat


def test_df_capped_layer_exact_and_smaller(ray_session, tmp_path):
    """max_df_frac drops posting bytes of ubiquitous trigrams; results stay
    identical to the uncapped layer (capped rows read as 'all docs')."""
    import glob

    from splade_ray.trigram import regex_search

    t = synth_corpus(200, seed=13)
    texts = t["content"].to_pylist()
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(200, dtype=np.int64), "content": texts}), corpus
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=30)
    needles = [(0, "return"), (1, "rare_token_37"), (2, "absent_zzz_string"),
               (3, "x")]
    pats = [(0, r"return\s+\w+"), (1, r"rare_token_\d+")]

    build_trigrams(index_dir)
    uncapped_sub = substring_search(index_dir, needles)
    uncapped_rex = regex_search(index_dir, pats)
    size_full = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(index_dir, "segments", "seg=*", "trigrams.parquet"))
    )

    man = build_trigrams(index_dir, max_df_frac=0.2)  # cap change invalidates
    assert man["n_segments_skipped"] == 0 and man["max_df_frac"] == 0.2
    capped_sub = substring_search(index_dir, needles)
    capped_rex = regex_search(index_dir, pats)
    size_capped = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(index_dir, "segments", "seg=*", "trigrams.parquet"))
    )

    pd.testing.assert_frame_equal(capped_sub, uncapped_sub)
    pd.testing.assert_frame_equal(capped_rex, uncapped_rex)
    assert size_capped < size_full
    # capped rows really exist: df intact, docs_enc emptied
    seg = sorted(glob.glob(os.path.join(index_dir, "segments", "seg=*", "trigrams.parquet")))[0]
    tt = pq.read_table(seg)
    enc_len = np.array([len(b) for b in tt["docs_enc"].to_pylist()])
    dfs = tt["df"].to_numpy()
    assert ((enc_len == 0) & (dfs > 0)).any()
    # a needle whose trigrams are ALL capped still verifies exactly
    ndl = "return"  # ubiquitous in the synth corpus
    tris_capped = {int(k) for k, e in zip(tt["tri"].to_pylist(), enc_len) if e == 0}
    from splade_ray.trigram import needle_trigrams as _nt

    if set(_nt(ndl).tolist()) <= tris_capped:
        pass  # full-scan fallback exercised above by needle 0 already


def test_verification_reads_only_candidate_row_groups(ray_session, tmp_path, monkeypatch):
    """Candidate-pruned verification I/O: a selective needle must touch only
    the parquet row groups containing candidate rows, not the whole slice
    (pattern: test_ivf_search_reads_only_probed_partitions)."""
    from splade_ray.trigram import (
        _segment_candidates,
        _verify_candidates,
        build_trigrams,
        needle_trigrams,
    )

    texts = [f"common filler tokens row {i}" for i in range(200)]
    texts[7] = texts[7] + " xqzneedle"
    texts[150] = texts[150] + " xqzneedle"
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(200, dtype=np.int64), "content": texts}),
        corpus,
        row_group_size=10,  # 20 groups
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=200)
    build_trigrams(index_dir)

    from splade_ray.trigram import _load_tri_rows

    seg = os.path.join(index_dir, "segments", "seg=000000")
    tris = needle_trigrams("xqzneedle")
    cand = _segment_candidates(_load_tri_rows(seg, tris), tris)
    assert cand is not None and set(cand.tolist()) == {7, 150}

    groups_read = []
    orig = pq.ParquetFile.read_row_group

    def spy(self, g, *a, **kw):
        groups_read.append(g)
        return orig(self, g, *a, **kw)

    monkeypatch.setattr(pq.ParquetFile, "read_row_group", spy)
    docs, cnts, _ = _verify_candidates(seg, "content", "doc_id", cand, "xqzneedle", {})
    assert docs.tolist() == [7, 150] and cnts.tolist() == [1, 1]
    # candidates sit in row groups 0 (row 7) and 15 (row 150); the id-column
    # pass reads the full slice via read_row_groups (not read_row_group), so
    # the spy sees ONLY the two text-group reads
    assert sorted(set(groups_read)) == [0, 15]


def test_snippets_substring_and_regex(ray_session, tmp_path):
    """Snippet columns: pos = 1-based char position of the first match in
    the lowered text (DuckDB position() parity), snippet = char window of
    the ORIGINAL text; unicode-safe (codepoint slicing, not bytes)."""
    import re

    from splade_ray.trigram import regex_search, substring_search

    texts = [
        "Héllo wörld ZSEARCHZ end of line",
        "zsearchz at the very start",
        "tail position zsearchz",
        "日本語の zsearchz テキストです",
        "no match here",
        "double zsearchz and zsearchz again",
    ]
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "content": texts}), corpus
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=2)
    build_trigrams(index_dir)

    W = 5
    got = substring_search(index_dir, [(0, "ZseArchZ")], snippets=True, width=W)
    assert list(got.columns) == ["query_id", "doc_id", "n_occurrences", "pos", "snippet"]
    for _, r in got.iterrows():
        t = texts[int(r.doc_id)]
        p0 = t.lower().index("zsearchz")
        assert r.pos == p0 + 1
        assert r.snippet == t[max(0, p0 - W): p0 + len("zsearchz") + W]

    pat = r"zsearchz\s+\w+"
    gotr = regex_search(index_dir, [(0, pat)], snippets=True, width=W)
    # RE2 \w is ASCII-only (re.ASCII mirrors that): doc 3's unicode tail
    # does not match, doc 0's upper-case hit does (ignore_case)
    assert set(gotr.doc_id) == {0, 1, 5}
    for _, r in gotr.iterrows():
        t = texts[int(r.doc_id)]
        m = re.search(pat, t.lower(), re.ASCII)
        assert r.pos == m.start() + 1
        assert r.snippet == t[max(0, m.start() - W): m.start() + W + 16]


def test_case_sensitive_search(ray_session, tmp_path):
    """case_insensitive=False: lowered trigram candidates are a sound
    superset; verification (and snippets) use the original case."""
    import re

    from splade_ray.trigram import regex_search, substring_search

    texts = [
        "Return of the KING",
        "return lowercase only",
        "RETURN UPPER ONLY",
        "no match at all",
        "mixed Return and return twice",
    ]
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(len(texts), dtype=np.int64),
                  "content": texts}), corpus
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=2)
    build_trigrams(index_dir)

    cs = substring_search(index_dir, [(0, "Return")], case_insensitive=False,
                          snippets=True, width=3)
    assert set(cs.doc_id) == {0, 4}
    for _, r in cs.iterrows():
        t = texts[int(r.doc_id)]
        assert r.n_occurrences == t.count("Return")
        p0 = t.index("Return")
        assert r.pos == p0 + 1
        assert r.snippet == t[max(0, p0 - 3): p0 + len("Return") + 3]

    ci = substring_search(index_dir, [(0, "Return")])
    assert set(ci.doc_id) == {0, 1, 2, 4}

    csr = regex_search(index_dir, [(0, r"Return\s+\w+")], case_insensitive=False)
    want = {(i, len(re.findall(r"Return\s+\w+", t, re.ASCII)))
            for i, t in enumerate(texts) if re.search(r"Return\s+\w+", t, re.ASCII)}
    assert {(d, c) for d, c in zip(csr.doc_id, csr.n_occurrences)} == want


def test_required_literals_repeat_counts():
    """Exact/minimum repeat counts of literal bodies fold into the run."""
    from splade_ray.trigram import _seq_literals, _sre

    def lits(pat):
        return _seq_literals(_sre.parse(pat))

    assert lits(r"ab{3}c") == [{"abbbc"}]        # exact repeat: run continues
    assert lits(r"(abc){2,}") == [{"abcabc"}]    # min 2: both required, then flush
    assert lits(r"(ab){2}cd") == [{"ababcd"}]
    assert lits(r"ab{2,5}c") == [{"abb"}]        # {2,5}: only 2 guaranteed, flush
    assert lits(r"zzz+") == [{"zzz"}]
    assert lits(r"(x){40}yz") == [{"x" * 32}]    # rep cap bounds the string
