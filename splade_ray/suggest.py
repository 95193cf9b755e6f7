"""Prefix queries and fuzzy term suggestion over the lexicon.

The reference's query side takes literal analyzed terms only
(``splade/tasks/transformer_evaluator.py:162-168``); production lexical
engines add multi-term expansion on top of the same index: Lucene's
PrefixQuery (``term*``), FuzzyQuery (edit-distance expansion) and the
spell-checking suggester. This module pins deterministic variants of all
three over this repo's lexicon table:

- **Prefix expansion**: all lexicon terms starting with a prefix, ascending
  term order, capped at ``max_terms`` (the Lucene ``maxClauseCount``
  analog — a cap, applied on a DETERMINISTIC ordering so results are
  reproducible and SQL-mirrorable).
- **Fuzzy suggestion**: top-``m`` lexicon terms by
  ``(levenshtein asc, df desc, term asc)`` within ``max_dist`` — the
  did-you-mean surface. The Levenshtein kernel is a numpy DP vectorized
  across the candidate array (no per-pair Python loop); candidates are
  pre-pruned by the length band ``|len(c) - len(q)| <= max_dist`` (a
  guaranteed lower bound on edit distance). DuckDB's ``levenshtein()``
  mirrors it exactly.
- **Prefix / fuzzy retrieval**: the expanded term set joins the standard
  BM25 scatter-gather (:func:`splade_ray.query.search`) as an OR-query
  with qtf=1 per expanded term (the documented scoring contract; Lucene's
  blended/constant-score variants are alternatives we deliberately do not
  emulate — plain BM25 keeps one scoring function across the engine).

Scale shape: the lexicon is vocab-sized. Prefix expansion is a pushdown
range read (only matching rows leave storage). Fuzzy suggestion streams the
lexicon through ``map_batches`` with the vectorized DP and reduces
per-batch top-m candidates — no full materialization, work O(vocab x |q|).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads

from splade_ray.bm25 import BM25Params
from splade_ray.query import RUN_COLUMNS, search

SUGGEST_COLUMNS = ["query_id", "term", "dist", "df"]


def levenshtein_bulk(q: str, cands: np.ndarray) -> np.ndarray:
    """Edit distances from ``q`` to every candidate string, one numpy DP
    vectorized across candidates: O(len(q) * max_len) array ops.

    Candidates are padded into a (n, max_len) int32 codepoint matrix; the
    classic row-by-row DP runs over q's characters with the inner column
    loop vectorized per position across all candidates."""
    n = cands.size
    if n == 0:
        return np.empty(0, np.int64)
    lens = np.array([len(c) for c in cands], np.int64)
    m = int(lens.max()) if n else 0
    mat = np.zeros((n, m), np.int32)
    for i, c in enumerate(cands):  # padding pass; the DP below is vectorized
        mat[i, : len(c)] = np.frombuffer(c.encode("utf-32-le"), np.uint32).astype(
            np.int32
        )
    prev = np.broadcast_to(np.arange(m + 1, dtype=np.int64), (n, m + 1)).copy()
    qcodes = np.frombuffer(q.encode("utf-32-le"), np.uint32).astype(np.int32)
    for i, qc in enumerate(qcodes, start=1):
        cur = np.empty((n, m + 1), np.int64)
        cur[:, 0] = i
        sub = prev[:, :-1] + (mat != qc)  # substitution / match
        dele = prev[:, 1:] + 1  # deletion (from q)
        np.minimum(sub, dele, out=sub)
        # insertion needs the running row minimum -> sequential over columns,
        # but each step is vectorized across all n candidates
        for j in range(1, m + 1):
            cur[:, j] = np.minimum(sub[:, j - 1], cur[:, j - 1] + 1)
        prev = cur
    return prev[np.arange(n), lens]


def damerau_levenshtein_bulk(q: str, cands: np.ndarray) -> np.ndarray:
    """TRUE (unrestricted) Damerau-Levenshtein distances from ``q`` to every
    candidate — insert / delete / substitute / transpose-adjacent, with the
    transposed pair still editable afterwards (DL("ca","abc")=2 where the
    restricted OSA metric gives 3). Matches Lucene FuzzyQuery
    transpositions=true and DuckDB ``damerau_levenshtein`` exactly.

    Vectorized across candidates: the classic da/db algorithm (Lowrance &
    Wagner) with the full (n, |q|+2, max_len+2) DP tensor kept so the
    transposition term can gather ``d[k][l]`` at per-candidate (k, l); the
    row loop runs over q's characters and the column loop over candidate
    positions, every inner op an (n,)-vector. Memory is n·|q|·max_len int64
    — callers stream candidates in batches."""
    n = cands.size
    if n == 0:
        return np.empty(0, np.int64)
    lens = np.array([len(c) for c in cands], np.int64)
    m = int(lens.max())
    L = len(q)
    mat = np.zeros((n, m), np.int32)
    for i, c in enumerate(cands):  # padding pass; the DP below is vectorized
        mat[i, : len(c)] = np.frombuffer(c.encode("utf-32-le"), np.uint32).astype(
            np.int32
        )
    qcodes = np.frombuffer(q.encode("utf-32-le"), np.uint32).astype(np.int32)
    big = L + m  # the algorithm's maxdist sentinel
    # d indices are offset by 1: d[:, i+1, j+1] = distance(q[:i], c[:j])
    d = np.empty((n, L + 2, m + 2), np.int64)
    d[:, 0, :] = big
    d[:, :, 0] = big
    d[:, 1, 1:] = np.arange(m + 1, dtype=np.int64)
    d[:, 1:, 1] = np.arange(L + 1, dtype=np.int64)
    rows = np.arange(n)
    # K[:, j] = last row index i' (1-based) with q[i'-1] == cands[:, j],
    # among rows processed so far (the per-candidate `da` map, realized per
    # column since it is only ever read at b[j-1])
    K = np.zeros((n, m), np.int64)
    for i in range(1, L + 1):
        qc = qcodes[i - 1]
        db = np.zeros(n, np.int64)
        for j in range(1, m + 1):
            match = mat[:, j - 1] == qc
            cost = (~match).astype(np.int64)
            k = K[:, j - 1]
            l = db.copy()
            db = np.where(match, j, db)
            best = np.minimum(
                d[:, i, j] + cost,            # substitution / match
                np.minimum(d[:, i + 1, j] + 1,  # insertion into q side
                           d[:, i, j + 1] + 1)  # deletion
            )
            # transposition: d[k][l] + (i-k-1) + 1 + (j-l-1); k=l=0 rows hit
            # the `big` sentinel and never win
            trans = d[rows, k, l] + (i - k - 1) + 1 + (j - l - 1)
            d[:, i + 1, j + 1] = np.minimum(best, trans)
        K[:, :][mat == qc] = i
    return d[rows, L + 1, lens + 1]


def expand_prefix(index_dir: str, prefix: str, *, max_terms: int = 128) -> list[str]:
    """Lexicon terms starting with ``prefix``, ascending, first ``max_terms``
    (pushdown range read: term >= prefix AND term < prefix+MAXCHAR)."""
    if not prefix:
        raise ValueError("empty prefix")
    hi = prefix + "\U0010ffff"
    flt = (pads.field("term") >= prefix) & (pads.field("term") < hi)
    tbl = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
        columns=["term"], filter=flt
    )
    return sorted(tbl["term"].to_pylist())[:max_terms]


def complete_prefix(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    m: int = 8,
) -> pd.DataFrame:
    """Completion suggester (the ES completion / Lucene SuggestField
    analog, popularity-weighted): per (query_id, prefix) the top ``m``
    lexicon terms starting with the prefix, ordered by (df desc, term asc)
    — document frequency as the suggestion weight. Returns (query_id,
    sugg_rank, term, df).

    Each prefix is ONE pushdown range read of the lexicon (term >= prefix
    AND term < prefix+MAXCHAR), so cost is bounded by the prefix's subtrie,
    never the vocabulary."""
    rows = []
    for qid, prefix in queries:
        if not prefix:
            raise ValueError("empty prefix")
        hi = prefix + "\U0010ffff"
        flt = (pads.field("term") >= prefix) & (pads.field("term") < hi)
        tbl = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
            columns=["term", "df"], filter=flt
        )
        df = tbl.to_pandas().sort_values(
            ["df", "term"], ascending=[False, True], kind="mergesort"
        ).head(m)
        for r, (term, dfv) in enumerate(zip(df["term"], df["df"]), start=1):
            rows.append((int(qid), r, term, int(dfv)))
    out = pd.DataFrame(rows, columns=["query_id", "sugg_rank", "term", "df"])
    return out.astype({"query_id": np.int64, "sugg_rank": np.int64,
                       "df": np.int64})


def expand_wildcard(
    index_dir: str, pattern: str, *, max_terms: int = 128
) -> list[str]:
    """Lexicon terms matching a Lucene WildcardQuery pattern (``*`` = any
    run, ``?`` = exactly one char), ascending term order, first
    ``max_terms``. The literal prefix before the first wildcard prunes the
    lexicon read to a pushdown range (the Lucene PrefixCodedTerms seek
    analog); the remainder is one anchored RE2 match over the pruned rows.
    A pattern with no wildcard is an exact-term lookup."""
    import re

    if not pattern:
        raise ValueError("empty pattern")
    cut = min(
        (i for i, ch in enumerate(pattern) if ch in "*?"), default=len(pattern)
    )
    prefix = pattern[:cut]
    flt = None
    if prefix:
        flt = (pads.field("term") >= prefix) & (
            pads.field("term") < prefix + "\U0010ffff"
        )
    tbl = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
        columns=["term"], filter=flt
    )
    rx = re.compile(
        "".join(
            ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
            for ch in pattern
        )
    )
    terms = [t for t in tbl["term"].to_pylist() if rx.fullmatch(t)]
    return sorted(terms)[:max_terms]


def wildcard_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    max_terms: int = 128,
    method: str = "exact",
    concurrency: int | None = None,
) -> pd.DataFrame:
    """WildcardQuery retrieval: each query string is a wildcard pattern; the
    run is BM25 over the expanded OR-term set (qtf=1 per term, the same
    documented contract as prefix_search)."""
    params = params or BM25Params()
    expanded = []
    for qid, pattern in queries:
        terms = expand_wildcard(index_dir, pattern, max_terms=max_terms)
        if terms:
            expanded.append((int(qid), " ".join(terms)))
    if not expanded:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64,
             "score": np.float64}
        )
    return search(index_dir, expanded, params, method=method, concurrency=concurrency)


def _has_top_level_alternation(pattern: str) -> bool:
    """True when the pattern has a ``|`` at paren depth 0 outside any
    character class — the whole-pattern alternation that makes a leading
    literal prefix unsound for pushdown pruning."""
    depth = 0
    in_class = False
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(depth - 1, 0)
        elif ch == "|" and depth == 0:
            return True
        i += 1
    return False


def expand_regexp(
    index_dir: str, pattern: str, *, max_terms: int = 128
) -> list[str]:
    """Lexicon terms fully matching an anchored regexp — the ES
    RegexpQuery / Lucene RegexpQuery contract: the pattern matches the
    ENTIRE term, never a substring. The literal prefix before the first
    regex metacharacter prunes the lexicon read to a pushdown range
    (Lucene extracts the same prefix from the compiled automaton via
    ``CompiledAutomaton.commonPrefix``); the match itself is ONE
    vectorized RE2 kernel over the pruned term column
    (``pc.match_substring_regex`` with ``^(?:pattern)$``), no Python
    loop. RE2 semantics = no backreferences, mirroring Lucene's
    automaton-only operator set. Ascending term order, first
    ``max_terms``.

    Prefix extraction mirrors ``CompiledAutomaton.commonPrefix``
    semantics: a ``*``, ``?`` or ``{`` quantifier right after the
    literal run makes the run's LAST char optional/repeated (back off
    one char — ``ab*`` must still match ``a``), and a top-level ``|``
    invalidates any prefix (``sun|moon`` — ``moon`` shares no prefix
    with ``sun``)."""
    import pyarrow.compute as pc

    if not pattern:
        raise ValueError("empty pattern")
    cut = next(
        (i for i, ch in enumerate(pattern) if not (ch.isalnum() or ch == "_")),
        len(pattern),
    )
    prefix = pattern[:cut]
    if cut < len(pattern) and pattern[cut] in "*?{":
        prefix = prefix[:-1]  # quantifier makes the last literal optional
    if _has_top_level_alternation(pattern):
        prefix = ""
    flt = None
    if prefix:
        flt = (pads.field("term") >= prefix) & (
            pads.field("term") < prefix + "\U0010ffff"
        )
    tbl = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
        columns=["term"], filter=flt
    )
    mask = pc.match_substring_regex(tbl["term"], f"^(?:{pattern})$")
    terms = tbl["term"].filter(mask).to_pylist()
    return sorted(terms)[:max_terms]


def regexp_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    max_terms: int = 128,
    method: str = "exact",
    concurrency: int | None = None,
) -> pd.DataFrame:
    """RegexpQuery retrieval: each query string is an anchored regexp; the
    run is BM25 over the expanded OR-term set (qtf=1 per term, the same
    documented contract as prefix_search / wildcard_search)."""
    params = params or BM25Params()
    expanded = []
    for qid, pattern in queries:
        terms = expand_regexp(index_dir, pattern, max_terms=max_terms)
        if terms:
            expanded.append((int(qid), " ".join(terms)))
    if not expanded:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64,
             "score": np.float64}
        )
    return search(index_dir, expanded, params, method=method, concurrency=concurrency)


def suggest_terms(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    max_dist: int = 2,
    m: int = 5,
    batch_size: int = 8192,
    transpositions: bool = False,
) -> pd.DataFrame:
    """Did-you-mean table (query_id, term, dist, df): per query term the top
    ``m`` lexicon terms by (levenshtein asc, df desc, term asc) within
    ``max_dist``. Streams the lexicon (length-band pre-prune + vectorized
    DP per batch), reducing per-batch candidates to a driver-side top-m.

    ``transpositions=True`` switches the metric to true Damerau-Levenshtein
    (adjacent swap = one edit; Lucene FuzzyQuery's default): the length
    band stays a valid lower bound since a transposition changes length by
    zero."""
    from splade_ray.io import read_parquet_clean

    lex = read_parquet_clean(
        os.path.join(index_dir, "lexicon"), columns=["term", "df"]
    )
    qs = [(int(qid), t) for qid, t in queries]

    def score_batch(batch: pa.Table) -> pa.Table:
        terms = np.asarray(batch["term"].to_pylist(), object)
        dfs = batch["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.array([len(t) for t in terms], np.int64)
        out = {"query_id": [], "term": [], "dist": [], "df": []}
        for qid, q in qs:
            band = np.abs(lens - len(q)) <= max_dist
            if not band.any():
                continue
            cand, cdf = terms[band], dfs[band]
            d = (damerau_levenshtein_bulk if transpositions else levenshtein_bulk)(
                q, cand
            )
            hit = d <= max_dist
            if not hit.any():
                continue
            # per-batch top-m by the pinned ordering bounds the reduce size
            order = np.lexsort((cand[hit], -cdf[hit], d[hit]))[:m]
            out["query_id"].extend([qid] * order.size)
            out["term"].extend(cand[hit][order].tolist())
            out["dist"].extend(d[hit][order].tolist())
            out["df"].extend(cdf[hit][order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "term": pa.array(out["term"], pa.string()),
                "dist": pa.array(out["dist"], pa.int64()),
                "df": pa.array(out["df"], pa.int64()),
            }
        )

    parts = lex.map_batches(
        score_batch, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame(columns=SUGGEST_COLUMNS).astype(
            {"query_id": np.int64, "term": object, "dist": np.int64, "df": np.int64}
        )
    parts = parts.sort_values(
        ["query_id", "dist", "df", "term"], ascending=[True, True, False, True]
    )
    return (
        parts.groupby("query_id", sort=True)
        .head(m)
        .reset_index(drop=True)[SUGGEST_COLUMNS]
    )


def prefix_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    max_terms: int = 128,
    method: str = "exact",
    concurrency: int | None = None,
) -> pd.DataFrame:
    """PrefixQuery retrieval: each query string is a prefix; the run is BM25
    over the expanded OR-term set (qtf=1 per term). A prefix matching no
    lexicon term contributes no rows."""
    params = params or BM25Params()
    expanded = []
    for qid, prefix in queries:
        terms = expand_prefix(index_dir, prefix, max_terms=max_terms)
        if terms:
            expanded.append((int(qid), " ".join(terms)))
    if not expanded:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64, "score": np.float64}
        )
    return search(index_dir, expanded, params, method=method, concurrency=concurrency)


def match_bool_prefix_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    max_terms: int = 50,
    query_lang: str | None = None,
    method: str = "exact",
    concurrency: int | None = None,
) -> pd.DataFrame:
    """ES ``match_bool_prefix``: the query text is analyzed, every token but
    the last becomes a plain term clause (query tf preserved), and the LAST
    token expands as a prefix (ascending lexicon order, capped at
    ``max_terms`` — the Lucene rewrite cap), each expanded term contributing
    qtf=1. All clauses are bool-should: scores sum, so an expansion that
    collides with a fixed term simply adds to its qtf (pinned semantics).
    ``query_lang`` selects the analyzer for per-lang indexes; the default
    matches the collection-wide token class."""
    from splade_ray.analysis import tokenize

    params = params or BM25Params()
    expanded = []
    for qid, text in queries:
        toks = tokenize(text or "", query_lang)
        if not toks:
            continue
        *fixed, pre = toks
        terms = list(fixed) + expand_prefix(index_dir, pre, max_terms=max_terms)
        if terms:
            expanded.append((int(qid), " ".join(terms)))
    if not expanded:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64, "score": np.float64}
        )
    return search(index_dir, expanded, params, method=method,
                  query_lang=query_lang, concurrency=concurrency)


def fuzzy_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    max_dist: int = 1,
    max_terms: int = 16,
    method: str = "exact",
    concurrency: int | None = None,
    transpositions: bool = False,
) -> pd.DataFrame:
    """FuzzyQuery retrieval: each query string is a single term; the run is
    BM25 over the lexicon terms within ``max_dist`` edits (the top
    ``max_terms`` by the suggestion ordering), qtf=1 per expanded term.
    ``transpositions=True`` uses Damerau-Levenshtein (the Lucene FuzzyQuery
    default metric)."""
    params = params or BM25Params()
    sugg = suggest_terms(index_dir, queries, max_dist=max_dist, m=max_terms,
                         transpositions=transpositions)
    expanded = [
        (int(qid), " ".join(g["term"].tolist()))
        for qid, g in sugg.groupby("query_id", sort=True)
    ]
    if not expanded:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64, "score": np.float64}
        )
    return search(index_dir, expanded, params, method=method, concurrency=concurrency)
