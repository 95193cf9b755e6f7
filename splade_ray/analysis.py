"""Text/code analysis: tokenizer + per-batch postings extraction.

Reference semantics: the splade collection reader normalizes text
(``splade/datasets/datasets.py:82-88``) and the HF tokenizer turns it into
term ids (``splade/datasets/dataloaders.py:89-101``); sparsification to
(term, weight) pairs happens at ``splade/tasks/transformer_evaluator.py:45-47``.
Our analyzer replaces the learned encoder with a deterministic code tokenizer:
lowercase + ``[a-z0-9_]+`` word extraction, so a document becomes a bag of
``(term, tf)`` pairs.  The exact same tokenization is expressible in ANSI SQL
(``regexp_extract_all(lower(text), '[a-z0-9_]+')``), which is what makes every
downstream operator oracle-checkable.

The hot path is fully vectorized Arrow: ``utf8_lower`` → ``split_pattern_regex``
on the complement class (split on non-token runs ≡ findall of the token class)
→ ``list_flatten``/``list_parent_indices`` → C++ hash ``group_by`` for tf
counts. No per-row Python in any batch function.

The scalar ``tokenize``/``term_counts`` used for query prep and tests are a
thin wrapper over the SAME Arrow kernel — not an independent Python
reimplementation. This is load-bearing for non-ASCII text: Python's
``str.lower`` applies full Unicode case mapping ('İ' → 'i' + combining dot,
which the token class then splits), while Arrow's ``utf8_lower`` (and
DuckDB's ``lower``, the oracle) map 'İ' → 'i'. Routing both sides through
one kernel keeps query terms equal to indexed terms for such inputs.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# One token class for code and prose alike: identifiers (with underscores),
# numbers, keywords. Mirrors DuckDB `regexp_extract_all(lower(x), TOKEN_SQL)`.
TOKEN_PATTERN = r"[a-z0-9_]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)
TOKEN_SQL = TOKEN_PATTERN
SPLIT_PATTERN = r"[^a-z0-9_]+"  # complement class: split ≡ findall

# ---------------------------------------------------------------- analyzers
# Per-language token classes (SURVEY §2.10 extension surface; the analog of
# the reference's per-collection tokenizer config —
# conf/train/config/splade.yaml max_length / dataloaders.py:89-101). Every
# pattern MUST be a single character class + '+' so (a) the vectorized
# split-on-complement kernel applies and (b) the DuckDB oracle can mirror it
# verbatim with regexp_extract_all. Unregistered langs fall back to
# TOKEN_PATTERN.
#
# An entry may also be an ``Analyzer``: the same char-class tokenizer plus
# token FILTERS (the Lucene TokenFilter chain analog) — stopword removal
# then light stemming — each filter vectorized Arrow on the Ray side and
# rendered verbatim into the DuckDB oracle by ``analyzer_sql`` so the two
# can't drift.


def _split_pattern(token_pattern: str) -> str:
    """Complement class of a `[...]+` token pattern (split ≡ findall)."""
    if not (token_pattern.startswith("[") and token_pattern.endswith("]+")):
        raise ValueError(f"analyzer pattern must be a char class: {token_pattern!r}")
    return "[^" + token_pattern[1:-2] + "]+"


@dataclass(frozen=True)
class Analyzer:
    """Tokenizer char class + optional token-filter chain.

    ``stopwords`` are removed AFTER tokenization and BEFORE stemming (the
    Lucene EnglishAnalyzer filter order). ``stem`` currently supports
    ``"s"`` — the Harman (1991) s-stemmer, three suffix rules with the
    exclusions terminal (an excluded word is kept, it does not fall through
    to a later rule) and minimum-length guards so stemming never produces a
    sub-2-char token: ies→y (len≥4, not eies/aies), es→e (len≥4, not
    aes/ees/oes), s→'' (len≥3, not us/ss).

    BM25 doc length counts POST-filter tokens (Lucene: norms store the
    number of indexed tokens).

    ``camel=True`` enables the code-identifier pre-split (the Lucene
    WordDelimiterGraphFilter splitOnCaseChange analog): BEFORE
    lowercasing, a space is inserted at lower→Upper and acronym→Word
    boundaries (``getUserName`` → ``get User Name``, ``XMLHttpRequest``
    → ``XML Http Request``), so camelCase identifiers index as their
    parts. Both substitutions are RE2 (pyarrow replace_substring_regex
    on the Ray side, DuckDB regexp_replace in the oracle) with identical
    rewrite syntax, so the mirror is verbatim."""

    pattern: str = r"[a-z0-9_]+"
    stopwords: frozenset[str] = field(default_factory=frozenset)
    stem: str | None = None
    camel: bool = False

    def __post_init__(self):
        _split_pattern(self.pattern)  # validates the char-class shape
        if self.stem not in (None, "s"):
            raise ValueError(f"unknown stemmer {self.stem!r} (expected None or 's')")
        object.__setattr__(self, "stopwords", frozenset(self.stopwords))

    @property
    def has_filters(self) -> bool:
        return bool(self.stopwords) or self.stem is not None

    def sort_key(self) -> tuple:
        return (self.pattern, self.stem or "", ",".join(sorted(self.stopwords)),
                "camel" if self.camel else "")


# code-identifier boundaries (order-independent): lower/digit→Upper, then
# acronym→TitleWord. RE2 rewrite syntax is shared by pyarrow and DuckDB.
CAMEL_SUBS: tuple[tuple[str, str], ...] = (
    (r"([a-z0-9])([A-Z])", r"\1 \2"),
    (r"([A-Z])([A-Z][a-z])", r"\1 \2"),
)


# The classic 33-word English stop set (Lucene EnglishAnalyzer default).
EN_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

_ACCENTED = "àáâäçèéêëìíîïñòóôöùúûüßœ"
ANALYZERS: dict[str, str | Analyzer] = {
    # CJK text: han runs are tokens too (not dropped)
    "zh": r"[a-z0-9_一-鿿]+",
    # latin languages: keep accented letters inside tokens
    "fr": f"[a-z0-9_{_ACCENTED}]+",
    "es": f"[a-z0-9_{_ACCENTED}]+",
    "de": f"[a-z0-9_{_ACCENTED}]+",
    # code: underscore is an identifier SEPARATOR (foo_bar -> foo, bar)
    "py": r"[a-z0-9]+",
    "go": r"[a-z0-9]+",
    "c": r"[a-z0-9]+",
    # opt-in English filter chains (not tied to any corpus lang value)
    "en_stop": Analyzer(stopwords=EN_STOPWORDS),
    "en_light": Analyzer(stopwords=EN_STOPWORDS, stem="s"),
    # source code: camelCase pre-split + underscore as separator, so
    # getUserName / get_user_name / GetUserName all index as get,user,name
    "code": Analyzer(pattern=r"[a-z0-9]+", camel=True),
}


def register_analyzer(
    lang: str,
    token_pattern: str = TOKEN_PATTERN,
    *,
    stopwords=(),
    stem: str | None = None,
    camel: bool = False,
) -> None:
    """Extension hook: register/override a language's analyzer (token class
    + optional camelCase pre-split + stopword/stem filter chain)."""
    if stopwords or stem or camel:
        ANALYZERS[lang] = Analyzer(token_pattern, frozenset(stopwords), stem,
                                   camel)
    else:
        _split_pattern(token_pattern)  # validates the shape
        ANALYZERS[lang] = token_pattern


def get_analyzer(lang: str | None) -> Analyzer:
    """The full Analyzer for a lang name (pattern-only entries wrapped)."""
    spec = ANALYZERS.get(lang or "", TOKEN_PATTERN)
    return spec if isinstance(spec, Analyzer) else Analyzer(spec)


def analyzer_pattern(lang: str | None) -> str:
    return get_analyzer(lang).pattern


def analyzer_config_hash(lang_col: str | None = None, analyzer: str | None = None) -> str:
    """Deterministic digest of the analyzer configuration a build depends on.

    Recorded in the index manifest and re-checked by ``append_index``: an
    append run whose ANALYZERS registry differs from the one the index was
    built with would silently mix token classes between old and new segments
    (Lucene refuses a mismatched Analyzer the same way — per-field analyzers
    are part of the IndexWriterConfig). ``analyzer=name`` builds hash only
    that entry; ``lang_col`` builds hash the whole registry plus the default
    (any lang value may appear in future appends); plain builds hash the
    default token class.
    """
    import hashlib

    if analyzer:
        items = [(analyzer,) + get_analyzer(analyzer).sort_key()]
    elif lang_col:
        items = sorted((k,) + get_analyzer(k).sort_key() for k in ANALYZERS)
        items.append(("",) + Analyzer(TOKEN_PATTERN).sort_key())
    else:
        items = [("",) + Analyzer(TOKEN_PATTERN).sort_key()]
    return hashlib.sha256(repr(items).encode()).hexdigest()[:16]


def s_stem_array(terms: pa.Array) -> pa.Array:
    """Vectorized Harman s-stemmer (see ``Analyzer``). Priority waterfall
    with terminal exclusions, mirrored character-for-character by
    ``s_stem_sql`` — intended for ASCII token classes (suffix tests are
    codepoint-based on both sides)."""
    t = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
    ln = pc.utf8_length(t)

    def ends(s: str):
        return pc.ends_with(t, pattern=s)

    drop1 = pc.utf8_slice_codeunits(t, 0, stop=-1)
    ies_y = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(t, 0, stop=-3), pa.scalar("y"), ""
    )
    c_ies = pc.and_(ends("ies"), pc.greater_equal(ln, 4))
    r_ies = pc.if_else(pc.or_(ends("eies"), ends("aies")), t, ies_y)
    c_es = pc.and_(ends("es"), pc.greater_equal(ln, 4))
    r_es = pc.if_else(
        pc.or_(pc.or_(ends("aes"), ends("ees")), ends("oes")), t, drop1
    )
    c_s = pc.and_(ends("s"), pc.greater_equal(ln, 3))
    r_s = pc.if_else(pc.or_(ends("us"), ends("ss")), t, drop1)
    return pc.if_else(c_ies, r_ies, pc.if_else(c_es, r_es, pc.if_else(c_s, r_s, t)))


def s_stem_sql(var: str = "t") -> str:
    """DuckDB CASE expression mirroring ``s_stem_array`` exactly (LIKE is
    safe here: tokens may contain '_' but the patterns don't)."""
    return (
        f"CASE WHEN {var} LIKE '%ies' AND length({var}) >= 4 THEN "
        f"(CASE WHEN {var} LIKE '%eies' OR {var} LIKE '%aies' THEN {var} "
        f"ELSE substr({var}, 1, length({var}) - 3) || 'y' END) "
        f"WHEN {var} LIKE '%es' AND length({var}) >= 4 THEN "
        f"(CASE WHEN {var} LIKE '%aes' OR {var} LIKE '%ees' OR {var} LIKE '%oes' THEN {var} "
        f"ELSE substr({var}, 1, length({var}) - 1) END) "
        f"WHEN {var} LIKE '%s' AND length({var}) >= 3 THEN "
        f"(CASE WHEN {var} LIKE '%us' OR {var} LIKE '%ss' THEN {var} "
        f"ELSE substr({var}, 1, length({var}) - 1) END) "
        f"ELSE {var} END"
    )


def analyzer_sql(lang: str | None, var: str = "text") -> str:
    """DuckDB list-of-tokens expression for a registered analyzer — the
    oracle-side twin of ``tokenize_column(texts, get_analyzer(lang))``,
    generated FROM the registry so SQL and Ray can't drift. ``var`` is the
    RAW string expression (the camel pre-split must see original case;
    lower() is applied here)."""
    a = get_analyzer(lang)
    for pat, rewrite in (CAMEL_SUBS if a.camel else ()):
        var = f"regexp_replace({var}, '{pat}', '{rewrite}', 'g')"
    expr = f"regexp_extract_all(lower({var}), '{a.pattern}')"
    if a.stopwords:
        stop_list = ", ".join(f"'{w}'" for w in sorted(a.stopwords))
        expr = f"list_filter({expr}, t -> t NOT IN ({stop_list}))"
    if a.stem == "s":
        expr = f"list_transform({expr}, t -> {s_stem_sql('t')})"
    return expr


def _apply_token_filters(terms: pa.Array, par: np.ndarray, analyzer: Analyzer):
    """Stopword removal then stemming over the flat token array (parents
    kept aligned). Vectorized: one is_in mask + the branch-free stem CASE."""
    if analyzer.stopwords:
        keep = pc.invert(
            pc.is_in(terms, value_set=pa.array(sorted(analyzer.stopwords), pa.string()))
        )
        terms = terms.filter(keep)
        par = par[keep.to_numpy(zero_copy_only=False)]
    if analyzer.stem == "s":
        terms = s_stem_array(terms)
    return terms, par


def tokenize(text: str, lang: str | None = None) -> list[str]:
    """Tokenize one string through the same Arrow kernel as the vectorized
    column path (see module docstring: Python ``str.lower`` diverges from
    ``utf8_lower`` on full-Unicode case mapping). ``lang`` selects a
    registered analyzer; None uses the collection-wide class."""
    spec = get_analyzer(lang) if lang is not None else None
    terms, _, _ = tokenize_column(pa.array([text], pa.string()), spec)
    return terms.to_pylist()


def term_counts(text: str, lang: str | None = None) -> Counter:
    return Counter(tokenize(text, lang))


def tokenize_column(
    texts: pa.Array | pa.ChunkedArray, token_pattern: str | Analyzer | None = None
):
    """Vectorized tokenization of a string column.

    Returns ``(terms, parents, doc_lens)``: the flat token array, the row
    index of each token, and per-row token counts (nulls count as 0).
    ``token_pattern`` (a ``[...]+`` char class, or an ``Analyzer`` whose
    filter chain is applied after tokenization) selects the analyzer;
    default is the collection-wide ``TOKEN_PATTERN``. With filters,
    ``doc_lens`` counts POST-filter tokens (the Lucene norm contract).
    """
    analyzer = token_pattern if isinstance(token_pattern, Analyzer) else None
    pattern = analyzer.pattern if analyzer is not None else token_pattern
    split = SPLIT_PATTERN if pattern is None else _split_pattern(pattern)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if analyzer is not None and analyzer.camel:
        for pat, rewrite in CAMEL_SUBS:
            texts = pc.replace_substring_regex(
                texts, pattern=pat, replacement=rewrite
            )
    tok_lists = pc.split_pattern_regex(pc.utf8_lower(texts), split)
    flat = pc.list_flatten(tok_lists)
    parents = pc.list_parent_indices(tok_lists)
    mask = pc.not_equal(flat, "")  # boundary splits produce empty strings
    terms = flat.filter(mask)
    par = parents.filter(mask).to_numpy(zero_copy_only=False).astype(np.int64)
    if analyzer is not None and analyzer.has_filters:
        terms, par = _apply_token_filters(terms, par, analyzer)
    doc_lens = np.bincount(par, minlength=n).astype(np.int64)
    return terms, par, doc_lens


def tokenize_column_by_lang(
    texts: pa.Array | pa.ChunkedArray, langs: pa.Array | pa.ChunkedArray
):
    """Vectorized per-language tokenization: rows are grouped by lang, each
    group runs through its registered analyzer's kernel, and the flat
    outputs are reassembled against the ORIGINAL row indices. Same return
    shape as ``tokenize_column`` (token order within the batch follows lang
    grouping — irrelevant to tf counting, which is order-free)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if isinstance(langs, pa.ChunkedArray):
        langs = langs.combine_chunks()
    n = len(texts)
    lang_arr = np.asarray(langs.to_pylist(), dtype=object)
    doc_lens = np.zeros(n, np.int64)
    term_parts: list[pa.Array] = []
    par_parts: list[np.ndarray] = []
    by_pattern: dict[Analyzer, list[np.ndarray]] = {}
    for lang in set(lang_arr):
        a = get_analyzer(lang)
        idx = np.flatnonzero(lang_arr == lang)
        by_pattern.setdefault(a, []).append(idx)
    for a in sorted(by_pattern, key=Analyzer.sort_key):
        idx = np.sort(np.concatenate(by_pattern[a]))
        sub_terms, sub_par, sub_lens = tokenize_column(texts.take(pa.array(idx)), a)
        term_parts.append(sub_terms)
        par_parts.append(idx[sub_par])
        doc_lens[idx] = sub_lens
    if not term_parts:
        return pa.array([], pa.string()), np.array([], np.int64), doc_lens
    terms = pa.concat_arrays(
        [t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t for t in term_parts]
    )
    par = (
        np.concatenate(par_parts) if par_parts else np.array([], np.int64)
    ).astype(np.int64)
    return terms, par, doc_lens


def postings_by_lang_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> pa.Table:
    """``postings_batch`` with the per-language analyzer registry: flat
    ``(term, doc_id, tf)`` rows where each doc was tokenized by its lang's
    registered token class (VERDICT round-1 item 4)."""
    terms, par, _ = tokenize_column_by_lang(batch[text_col], batch[lang_col])
    g = (
        pa.table({"row": pa.array(par, pa.int64()), "term": terms})
        .group_by(["row", "term"])
        .aggregate([([], "count_all")])
    )
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = g["row"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "term": g["term"],
            "doc_id": pa.array(doc_ids[rows], pa.int64()),
            "tf": g["count_all"].cast(pa.int64()),
        }
    )


def term_frequency_table(
    texts: pa.Array | pa.ChunkedArray, token_pattern: str | Analyzer | None = None
):
    """Vectorized (row, term, tf) extraction for a string column.

    Returns ``(tf_table, doc_lens)`` where tf_table has columns
    ``row:int64, term:string, tf:int64`` (unordered — hash-group output)."""
    terms, par, doc_lens = tokenize_column(texts, token_pattern)
    g = (
        pa.table({"row": pa.array(par, pa.int64()), "term": terms})
        .group_by(["row", "term"])
        .aggregate([([], "count_all")])
    )
    tf_tbl = pa.table(
        {"row": g["row"], "term": g["term"], "tf": g["count_all"].cast(pa.int64())}
    )
    return tf_tbl, doc_lens


def postings_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str | None = None,
) -> pa.Table:
    """Flat-map a batch of documents to postings rows ``(term, doc_id, tf)``.

    One input row expands to one output row per distinct term (COO triplets,
    the reference's central intermediate — transformer_evaluator.py:45-47).
    ``analyzer`` (registered name) applies that analyzer — filters included —
    to every row."""
    spec = get_analyzer(analyzer) if analyzer is not None else None
    tf_tbl, _ = term_frequency_table(batch[text_col], spec)
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = tf_tbl["row"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "term": tf_tbl["term"],
            "doc_id": pa.array(doc_ids[rows], pa.int64()),
            "tf": tf_tbl["tf"],
        }
    )


def postings_with_dl_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """``postings_batch`` plus the parent doc's length: ``(term, doc_id, tf,
    dl)``. The dl column makes the rows self-contained for term-keyed
    consumers (the join-based BM25 quantizer) that never see the doc again."""
    tf_tbl, doc_lens = term_frequency_table(batch[text_col])
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    rows = tf_tbl["row"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "term": tf_tbl["term"],
            "doc_id": pa.array(doc_ids[rows], pa.int64()),
            "tf": tf_tbl["tf"],
            "dl": pa.array(doc_lens[rows], pa.int64()),
        }
    )


def doc_stats_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc token stats: ``(doc_id, n_tokens, n_distinct)``."""
    tf_tbl, doc_lens = term_frequency_table(batch[text_col])
    rows = tf_tbl["row"].to_numpy(zero_copy_only=False)
    n_distinct = np.bincount(rows, minlength=len(batch)).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_tokens": pa.array(doc_lens),
            "n_distinct": pa.array(n_distinct),
        }
    )


def analyze_docs(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str | None = None,
    analyzer: str | None = None,
):
    """Analyze a batch fully in one pass for the segment builder.

    Returns ``(flat, doc_ids, doc_lens)`` where ``flat`` is a pyarrow table
    ``(term, pos, tf)`` sorted by (term asc, pos asc) — ``pos`` indexes into
    the batch, so posting lists come out doc-id-sorted as long as the batch
    rows are doc-id ascending (the builder guarantees it; the same invariant
    the reference gets from its sequential doc counter,
    transformer_evaluator.py:47-51).

    ``lang_col`` routes each doc through its language's registered analyzer
    (``ANALYZERS``) instead of the collection-wide token class; ``analyzer``
    (a registered name) applies ONE analyzer — filter chain included — to
    every doc (mutually exclusive with lang_col)."""
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if lang_col is None:
        spec = get_analyzer(analyzer) if analyzer is not None else None
        tf_tbl, doc_lens = term_frequency_table(batch[text_col], spec)
    else:
        terms, par, doc_lens = tokenize_column_by_lang(batch[text_col], batch[lang_col])
        g = (
            pa.table({"row": pa.array(par, pa.int64()), "term": terms})
            .group_by(["row", "term"])
            .aggregate([([], "count_all")])
        )
        tf_tbl = pa.table(
            {"row": g["row"], "term": g["term"], "tf": g["count_all"].cast(pa.int64())}
        )
    flat = pa.table(
        {"term": tf_tbl["term"], "pos": tf_tbl["row"], "tf": tf_tbl["tf"]}
    ).sort_by([("term", "ascending"), ("pos", "ascending")])
    return flat, doc_ids, doc_lens
