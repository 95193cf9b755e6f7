"""Prefix/fuzzy expansion tests: vectorized Levenshtein parity, pinned
suggestion ordering, prefix cap determinism, retrieval equivalence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import tokenize
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.query import search
from splade_ray.suggest import (
    expand_prefix,
    fuzzy_search,
    levenshtein_bulk,
    prefix_search,
    suggest_terms,
)

N = 100


def _py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j - 1] + (ca != cb), prev[j] + 1, cur[-1] + 1))
        prev = cur
    return prev[-1]


def test_levenshtein_bulk_matches_scalar():
    rng = np.random.RandomState(5)
    alpha = list("abcdef")
    cands = np.array(
        ["".join(rng.choice(alpha, rng.randint(0, 9)).tolist()) for _ in range(200)],
        object,
    )
    for q in ["", "ace", "fedcba", "abcabc"]:
        got = levenshtein_bulk(q, cands)
        want = np.array([_py_lev(q, c) for c in cands], np.int64)
        np.testing.assert_array_equal(got, want)


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=17)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {"doc_id": pa.array(np.arange(N, dtype=np.int64)), "content": t["content"]}
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id", rows_per_segment=25)
    return index_dir, t["content"].to_pylist()


def test_suggest_terms_pinned_ordering(built):
    index_dir, texts = built
    # global lexicon + df recomputed scalar-side
    df = {}
    for d in texts:
        for term in set(tokenize(d)):
            df[term] = df.get(term, 0) + 1
    q = "pars"  # near 'parse'
    got = suggest_terms(index_dir, [(1, q)], max_dist=2, m=6, batch_size=7)
    cand = [(t, _py_lev(q, t), df[t]) for t in df if _py_lev(q, t) <= 2]
    cand.sort(key=lambda x: (x[1], -x[2], x[0]))
    want = cand[:6]
    assert list(zip(got["term"], got["dist"], got["df"])) == want


def test_expand_prefix_cap_and_order(built):
    index_dir, texts = built
    full = expand_prefix(index_dir, "pa", max_terms=1000)
    assert full == sorted(full)
    capped = expand_prefix(index_dir, "pa", max_terms=2)
    assert capped == full[:2]
    vocab = {t for d in texts for t in tokenize(d)}
    assert set(full) == {t for t in vocab if t.startswith("pa")}


def test_prefix_search_equals_expanded_or_query(built):
    index_dir, _ = built
    terms = expand_prefix(index_dir, "pa", max_terms=128)
    want = search(index_dir, [(1, " ".join(terms))], BM25Params(top_k=10))
    got = prefix_search(index_dir, [(1, "pa")], BM25Params(top_k=10))
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_fuzzy_search_uses_suggestions(built):
    index_dir, _ = built
    sugg = suggest_terms(index_dir, [(1, "pars")], max_dist=1, m=16)
    want = search(index_dir, [(1, " ".join(sugg["term"]))], BM25Params(top_k=10))
    got = fuzzy_search(index_dir, [(1, "pars")], BM25Params(top_k=10), max_dist=1)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))


def test_prefix_no_match_empty(built):
    index_dir, _ = built
    got = prefix_search(index_dir, [(1, "zzzzzz")], BM25Params(top_k=5))
    assert got.empty


def test_cli_suggest_modes(built, tmp_path, capsys):
    import json as _json

    from splade_ray.cli import main

    index_dir, _ = built
    qf = tmp_path / "q.tsv"
    qf.write_text("1\tpars\n")
    out = str(tmp_path / "sugg.parquet")
    rc = main(["suggest", "--index", index_dir, "--queries", str(qf),
               "--out", out, "--mode", "terms", "--max-dist", "2", "-m", "4"])
    assert rc == 0
    got = pd.read_parquet(out)
    want = suggest_terms(index_dir, [(1, "pars")], max_dist=2, m=4)
    assert got["term"].tolist() == want["term"].tolist()
    out2 = str(tmp_path / "pref.parquet")
    rc = main(["suggest", "--index", index_dir, "--queries", str(qf),
               "--out", out2, "--mode", "prefix", "--top-k", "5"])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["mode"] == "prefix" and summary["rows"] > 0


def _scalar_dl(a: str, b: str) -> int:
    """Reference unrestricted Damerau-Levenshtein (Lowrance-Wagner)."""
    da = {}
    big = len(a) + len(b)
    d = [[big] * (len(b) + 2) for _ in range(len(a) + 2)]
    for i in range(len(a) + 1):
        d[i + 1][1] = i
    for j in range(len(b) + 1):
        d[1][j + 1] = j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            k, l = da.get(b[j - 1], 0), db
            cost = 0 if a[i - 1] == b[j - 1] else 1
            if cost == 0:
                db = j
            d[i + 1][j + 1] = min(
                d[i][j] + cost, d[i + 1][j] + 1, d[i][j + 1] + 1,
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),
            )
        da[a[i - 1]] = i
    return d[len(a) + 1][len(b) + 1]


def test_damerau_bulk_matches_scalar():
    import random

    from splade_ray.suggest import damerau_levenshtein_bulk

    rng = random.Random(11)
    words = ["", "a", "ca", "abc", "ab", "ba", "spark", "sprak", "abcdef", "abcfed"]
    words += ["".join(rng.choices("abcde", k=rng.randint(0, 8))) for _ in range(200)]
    for q in ["ca", "abc", "spark", "", "deabc", "aabb"]:
        got = damerau_levenshtein_bulk(q, np.asarray(words, object))
        want = np.array([_scalar_dl(q, w) for w in words], np.int64)
        np.testing.assert_array_equal(got, want, err_msg=q)
    # the unrestricted-vs-OSA witness: transposition then edit inside it
    assert damerau_levenshtein_bulk("ca", np.asarray(["abc"], object))[0] == 2


def test_suggest_transpositions_changes_metric(built):
    from splade_ray.suggest import suggest_terms

    index_dir, _ = built
    # 'hsard' is one adjacent swap from the vocab term 'shard': dist 1
    # under DL, 2 under plain Levenshtein
    lev = suggest_terms(index_dir, [(1, "hsard")], max_dist=2, m=8)
    dl = suggest_terms(
        index_dir, [(1, "hsard")], max_dist=2, m=8, transpositions=True
    )
    lev_d = dict(zip(lev["term"], lev["dist"]))
    dl_d = dict(zip(dl["term"], dl["dist"]))
    if "shard" in lev_d:
        assert lev_d["shard"] == 2
    assert dl_d.get("shard") == 1


def test_complete_prefix(built):
    from splade_ray.suggest import complete_prefix

    index_dir, texts = built
    from collections import Counter

    from splade_ray.analysis import term_counts

    dfc = Counter()
    for t in texts:
        dfc.update(set(term_counts(t)))
    got = complete_prefix(index_dir, [(1, "re"), (2, "pa")], m=3)
    for qid, prefix in [(1, "re"), (2, "pa")]:
        want = sorted(
            ((term, n) for term, n in dfc.items() if term.startswith(prefix)),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        g = got[got["query_id"] == qid]
        assert list(zip(g["term"], g["df"])) == want
        assert g["sugg_rank"].tolist() == list(range(1, len(want) + 1))
