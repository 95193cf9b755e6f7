"""Snippet (keyword-in-context) extraction: pinned semantics + brute-force parity."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import tokenize
from splade_ray.snippets import best_window, snippets_for_run


def brute_best(tokens, terms, window):
    """O(n·w) reference: max occurrences, smallest start, 1-based."""
    n = len(tokens)
    if n == 0:
        return 1, 0, ""
    if n <= window:
        return 1, sum(t in terms for t in tokens), " ".join(tokens)
    best = (-1, -1)
    for i in range(n - window + 1):
        c = sum(t in terms for t in tokens[i : i + window])
        if c > best[0]:
            best = (c, i)
    i = best[1]
    return i + 1, best[0], " ".join(tokens[i : i + window])


def test_best_window_pinned_cases():
    toks = "a b q q b a q a a a".split()
    # window 3: counts at starts 1..8 = [1,2,2,1,1,1,1,0]; first max at start 2
    assert best_window(toks, {"q"}, 3) == (2, 2, "b q q")
    # whole doc shorter than window
    assert best_window(["x", "q"], {"q"}, 5) == (1, 1, "x q")
    # no matches anywhere -> first window, count 0
    assert best_window(toks, {"zz"}, 4) == (1, 0, "a b q q")
    assert best_window([], {"q"}, 4) == (1, 0, "")


def test_best_window_matches_bruteforce_randomized():
    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(12)]
    for _ in range(200):
        n = int(rng.integers(0, 40))
        toks = [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]
        terms = {vocab[int(i)] for i in rng.integers(0, len(vocab), 3)}
        w = int(rng.integers(1, 12))
        assert best_window(toks, terms, w) == brute_best(toks, terms, w)


def test_snippets_for_run_pushdown(tmp_path):
    docs = {
        0: "alpha beta gamma delta alpha alpha zeta",
        1: "beta beta beta alpha",
        2: "unrelated words only here",
    }
    p = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": list(docs), "text": list(docs.values())}), p
    )
    run = pd.DataFrame(
        {"query_id": [7, 7, 8], "rank": [1, 2, 1], "doc_id": [0, 1, 2],
         "score": [2.0, 1.0, 0.5]}
    )
    queries = [(7, "alpha zeta"), (8, "nothing matches")]
    out = snippets_for_run(p, run, queries, window=3)
    assert list(out.columns) == ["query_id", "doc_id", "start", "n_match", "snippet"]
    by = {(r.query_id, r.doc_id): r for r in out.itertuples()}
    assert by[(7, 0)].start == 5 and by[(7, 0)].n_match == 3
    assert by[(7, 0)].snippet == "alpha alpha zeta"
    assert by[(7, 1)].start == 2 and by[(7, 1)].n_match == 1
    assert by[(7, 1)].snippet == "beta beta alpha"
    assert by[(8, 2)].n_match == 0 and by[(8, 2)].start == 1

    # analyzer semantics: snippet is over lowered analyzer tokens
    assert by[(7, 0)].snippet == " ".join(tokenize(docs[0])[4:7])


def brute_best_distinct(tokens, terms, window):
    n = len(tokens)
    if n == 0:
        return 1, 0, 0, ""
    if n <= window:
        nd = len({t for t in tokens if t in terms})
        return 1, nd, sum(t in terms for t in tokens), " ".join(tokens)
    best = (-1, -1, -1)  # (nd, occ, -i) maximized
    for i in range(n - window + 1):
        w = tokens[i : i + window]
        nd = len({t for t in w if t in terms})
        occ = sum(t in w for t in []) or sum(t in terms for t in w)
        key = (nd, occ, -i)
        if key > best:
            best = key
    nd, occ, neg_i = best
    i = -neg_i
    return i + 1, nd, occ, " ".join(tokens[i : i + window])


def test_best_window_distinct_prefers_coverage():
    from splade_ray.snippets import best_window_distinct

    toks = "q q q x x a b x q x".split()
    # occurrences mode would pick start 1 (q q q = 3 occ); distinct mode
    # must pick the window covering both a and b
    start, nd, occ, snip = best_window_distinct(toks, {"q", "a", "b"}, 3)
    assert (start, nd, occ, snip) == (5, 2, 2, "x a b")  # ties -> smallest start


def test_best_window_distinct_matches_bruteforce_randomized():
    import numpy as np

    from splade_ray.snippets import best_window_distinct

    rng = np.random.default_rng(23)
    vocab = [f"t{i}" for i in range(8)]
    for _ in range(300):
        n = int(rng.integers(0, 30))
        toks = [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]
        terms = {vocab[int(i)] for i in rng.integers(0, len(vocab), 3)}
        w = int(rng.integers(1, 10))
        assert best_window_distinct(toks, terms, w) == brute_best_distinct(
            toks, terms, w
        ), (toks, sorted(terms), w)


def test_snippets_distinct_mode(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_ray.snippets import snippets_for_run

    p = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": [0], "text": ["q q q x x a b x q x"]}), p
    )
    run = pd.DataFrame({"query_id": [1], "rank": [1], "doc_id": [0], "score": [1.0]})
    out = snippets_for_run(p, run, [(1, "q a b")], window=3, mode="distinct")
    assert list(out.columns) == [
        "query_id", "doc_id", "start", "n_distinct", "n_match", "snippet"
    ]
    assert out.iloc[0].tolist() == [1, 0, 5, 2, 2, "x a b"]


def test_tokens_with_sentence_flags_parity():
    """Sentence splitting must not change the flat token sequence."""
    from splade_ray.snippets import tokens_with_sentence_flags

    text = "Alpha beta. Gamma delta!\nEpsilon? zeta... eta"
    toks, flags = tokens_with_sentence_flags(text)
    assert toks == tokenize(text)
    # sentence starts: alpha, gamma, epsilon, zeta, eta
    assert flags.tolist() == [1, 0, 1, 0, 1, 1, 1]


def test_best_window_sentence_prefers_boundary():
    """Two windows with equal (distinct, occurrences): the sentence-aligned
    one wins even though it starts LATER (the non-sentence mode would take
    the earlier start)."""
    from splade_ray.snippets import (
        best_window_distinct,
        best_window_sentence,
        tokens_with_sentence_flags,
    )

    #            1   2 3   4   5 6   7
    text = "pad q x. q y z. tail"
    toks, flags = tokens_with_sentence_flags(text)
    assert toks == ["pad", "q", "x", "q", "y", "z", "tail"]
    assert flags.tolist() == [1, 0, 0, 1, 0, 0, 1]
    # window 3, term q: starts 1..5 occurrences = [2,2,1,1,0]; distinct same
    # shape. Distinct mode takes start 1; sentence mode has no aligned
    # window among the maxima... make maxima {2,4}: use window 4:
    # occurrences at starts 1..4 = [2,2,1,1] -> still first-max at 1.
    d = best_window_distinct(toks, {"q"}, 4)
    assert d[0] == 1
    s = best_window_sentence(toks, flags, {"q"}, 4)
    # starts 1..4: occ [2,2,1,1], aligned [1,0,0,1] -> (1,2,occ2,aligned1)
    assert s[:4] == (1, 1, 2, 1)

    # now a case where alignment flips the pick: equal-max at 2 and 4,
    # only 4 aligned
    text2 = "x q y. q z w"
    toks2, flags2 = tokens_with_sentence_flags(text2)
    # tokens: x q y q z w ; flags 1 0 0 1 0 0
    # window 3 occ for {q}: starts 1..4 = [1,2,2,1]; maxima {2,3}; aligned
    # flags at starts = [1,0,0,1] -> neither max aligned -> first max 2
    s2 = best_window_sentence(toks2, flags2, {"q"}, 3)
    assert s2[0] == 2 and s2[3] == 0
    # terms {q, w}: occ starts 1..4 = [1,2,2,2]; distinct = [1,1,1,2] ->
    # start 4 wins on distinct and is aligned
    s3 = best_window_sentence(toks2, flags2, {"q", "w"}, 3)
    assert s3[:4] == (4, 2, 2, 1)


def test_best_window_sentence_matches_bruteforce_randomized():
    from splade_ray.snippets import best_window_sentence

    rng = np.random.default_rng(17)
    vocab = [f"t{i}" for i in range(8)]
    for _ in range(200):
        n = int(rng.integers(0, 30))
        toks = [vocab[int(i)] for i in rng.integers(0, len(vocab), n)]
        flags = rng.integers(0, 2, n).astype(np.int64)
        if n:
            flags[0] = 1
        terms = {vocab[int(i)] for i in rng.integers(0, len(vocab), 2)}
        w = int(rng.integers(1, 10))
        got = best_window_sentence(toks, flags, terms, w)
        # brute force the full ordering
        if n == 0:
            assert got == (1, 0, 0, 1, "")
            continue
        if n <= w:
            nd = len({t for t in toks if t in terms})
            assert got == (1, nd, sum(t in terms for t in toks), 1, " ".join(toks))
            continue
        best = None
        for i in range(n - w + 1):
            win = toks[i : i + w]
            key = (
                len({t for t in win if t in terms}),
                sum(t in terms for t in win),
                int(flags[i]),
                -i,
            )
            if best is None or key > best[0]:
                best = (key, i)
        i = best[1]
        want = (
            i + 1,
            len({t for t in toks[i : i + w] if t in terms}),
            sum(t in terms for t in toks[i : i + w]),
            int(flags[i]),
            " ".join(toks[i : i + w]),
        )
        assert got == want


def test_snippets_sentence_mode(tmp_path):
    docs = {
        0: "noise q here. q target sentence! trailing words",
        1: "q alpha q",
    }
    p = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {"doc_id": list(docs), "text": list(docs.values())}
        ),
        p,
    )
    run = pd.DataFrame(
        {"query_id": [0, 0], "rank": [1, 2], "doc_id": [0, 1], "score": [2.0, 1.0]}
    )
    out = snippets_for_run(p, run, [(0, "q")], window=3, mode="sentence")
    assert list(out.columns) == [
        "query_id", "doc_id", "start", "n_distinct", "n_match", "aligned", "snippet",
    ]
    row1 = out[out["doc_id"] == 1].iloc[0]
    assert (int(row1["start"]), int(row1["aligned"]), row1["snippet"]) == (1, 1, "q alpha q")
    with pytest.raises(ValueError, match="unknown snippet mode"):
        snippets_for_run(p, run, [(0, "q")], window=3, mode="paragraph")


def test_top_fragments_fixed_tiles():
    from splade_ray.snippets import top_fragments

    toks = "a b c a a d e a x y z q".split()
    terms = {"a"}
    # tiles of 4: [a b c a]=2, [a d e a]=2, [x y z q]=0
    got = top_fragments(toks, terms, 4, 3)
    assert got == [(1, 1, 2, "a b c a"), (2, 5, 2, "a d e a")]
    # n_fragments caps; tie broken by start asc
    assert top_fragments(toks, terms, 4, 1) == [(1, 1, 2, "a b c a")]
    # short tail tile included and cut short
    got2 = top_fragments("a b c d a".split(), {"a"}, 4, 5)
    assert got2 == [(1, 1, 1, "a b c d"), (2, 5, 1, "a")]
    # no matches / empty input -> no fragments
    assert top_fragments(toks, {"zz"}, 4, 3) == []
    assert top_fragments([], {"a"}, 4, 3) == []
