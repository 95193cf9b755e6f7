"""Text analysis operators: quality scoring, token counting, language-ID
heuristic, document fingerprinting. All are single-pass ``map_batches``
stages; the quality metrics mirror what a pretraining-data pipeline filters
on (length / character-class ratios / stopword ratio).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "for", "on"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "una", "es", "por"},
    "de": {"der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "une", "est"},
    "zh": set(),  # no space-delimited stopwords; cjk_ratio is the signal
}
CJK_RE = re.compile(r"[一-鿿]")


def _count_regex(texts, pattern: str) -> np.ndarray:
    """Per-row non-overlapping regex match count, vectorized (nulls -> 0)."""
    import pyarrow.compute as pc

    c = pc.count_substring_regex(texts, pattern)
    return np.asarray(c.fill_null(0), dtype=np.int64)


def quality_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """(doc_id, n_tokens, alpha_ratio_r, digit_ratio_r) — ratios rounded to
    4dp with round-half-up so the SQL oracle matches exactly. Fully
    vectorized Arrow kernels (char-class counts + utf8_length)."""
    import pyarrow.compute as pc

    from splade_ray.analysis import tokenize_column

    texts = batch[text_col]
    _, _, n_tokens = tokenize_column(texts)
    length = np.maximum(
        np.asarray(pc.utf8_length(texts).fill_null(0), dtype=np.int64), 1
    ).astype(np.float64)
    alpha = _count_regex(texts, "[a-zA-Z]")
    digit = _count_regex(texts, "[0-9]")
    r4 = lambda x: np.floor(x * 1e4 + 0.5) / 1e4
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "alpha_ratio_r": pa.array(r4(alpha / length), pa.float64()),
            "digit_ratio_r": pa.array(r4(digit / length), pa.float64()),
        }
    )


def gopher_rules_batch(batch: pa.Table, *, text_col: str = "text",
                       min_words: int = 50, max_words: int = 100_000) -> pa.Table:
    """Gopher-style quality-rule flags per doc (Rae et al. 2021, public
    rule set), as one vectorized ``map_batches`` stage.

    Every emitted fact is an INTEGER count and every rule an integer-exact
    comparison (e.g. mean word length in [3,10] ⇔ ``3·n_words ≤
    n_nonws_chars ≤ 10·n_words``) so the whole table — including the final
    ``pass_gopher`` conjunction — has a bit-exact DuckDB mirror (the
    flaky-rational-oracle lesson from the FLOPS metric: never round floats
    at a comparison boundary). Regex counts use RE2 pattern strings shared
    verbatim with the SQL mirror (Arrow and DuckDB both embed RE2).

    Rules: word count in [min_words, max_words]; mean word length in
    [3, 10]; symbol-to-word ratio (# or ...) ≤ 0.1; ≥ 80% of words contain
    an alphabetic char; ≤ 90% of lines start with a bullet; ≤ 30% of lines
    end with an ellipsis; ≥ 2 distinct common stopwords present."""
    import pyarrow.compute as pc

    texts = batch[text_col]
    n_words = _count_regex(texts, r"\S+")
    n_ws = _count_regex(texts, r"\s")
    n_chars = np.asarray(pc.utf8_length(texts).fill_null(0), dtype=np.int64)
    n_nonws = n_chars - n_ws
    n_symbols = _count_regex(texts, r"#|\.\.\.")
    n_alpha_words = _count_regex(texts, r"\S*[a-zA-Z]\S*")
    n_lines = _count_regex(texts, r"\n") + 1
    n_bullet_lines = _count_regex(texts, r"(?m)^[ \t]*[-*•]")
    n_ellipsis_lines = _count_regex(texts, r"(?m)(\.\.\.|…)[ \t]*$")
    stop = np.zeros(len(n_words), dtype=np.int64)
    for w in ("the", "and", "of", "to", "in"):
        hit = pc.match_substring_regex(texts, rf"(?i)\b{w}\b").fill_null(False)
        stop += np.asarray(hit, dtype=np.int64)
    ok = (
        (n_words >= min_words) & (n_words <= max_words)
        & (3 * n_words <= n_nonws) & (n_nonws <= 10 * n_words)
        & (10 * n_symbols <= n_words)
        & (5 * n_alpha_words >= 4 * n_words)
        & (10 * n_bullet_lines <= 9 * n_lines)
        & (10 * n_ellipsis_lines <= 3 * n_lines)
        & (stop >= 2)
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_nonws_chars": pa.array(n_nonws, pa.int64()),
            "n_symbols": pa.array(n_symbols, pa.int64()),
            "n_alpha_words": pa.array(n_alpha_words, pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_bullet_lines": pa.array(n_bullet_lines, pa.int64()),
            "n_ellipsis_lines": pa.array(n_ellipsis_lines, pa.int64()),
            "n_stop_present": pa.array(stop, pa.int64()),
            "pass_gopher": pa.array(ok, pa.bool_()),
        }
    )


def c4_rules_batch(batch: pa.Table, *, text_col: str = "text",
                   min_terminal_lines: int = 3, min_line_words: int = 5) -> pa.Table:
    """C4-style quality-rule flags per doc (Raffel et al. 2020 §2.2, the
    public heuristics), one vectorized stage in the gopher_rules mold —
    every fact an integer count, every rule integer-exact, RE2 patterns
    shared verbatim with the DuckDB mirror.

    Facts/rules (the deterministic subset of C4's line filters, applied
    doc-level since our unit is the document):
    - ``n_lines`` / ``n_terminal_lines`` (lines ending in . ! ? or a
      closing quote after one): C4 keeps only terminal-punctuation lines
      and drops pages with fewer than ``min_terminal_lines`` sentences.
    - ``n_short_lines``: lines with fewer than ``min_line_words`` words
      (C4 drops those lines; we count them).
    - ``has_lorem``: the lorem-ipsum boilerplate marker.
    - ``has_brace``: a curly brace (C4 removes pages containing '{').
    - ``has_javascript``: the word 'javascript' (C4's cookie-warning line
      filter).
    - ``pass_c4`` = no lorem, no brace, no javascript, and
      ``n_terminal_lines >= min_terminal_lines``."""
    import pyarrow.compute as pc

    texts = batch[text_col]
    n_lines = _count_regex(texts, r"\n") + 1
    n_terminal = _count_regex(texts, r"(?m)[.!?][\"')\]]?[ \t]*$")
    # a line with < min_line_words words = at most (min_line_words-1) \S+ runs
    n_nonempty_lines = _count_regex(texts, r"(?m)^[ \t]*\S.*$")
    upper = min_line_words - 1
    n_long_lines = _count_regex(
        texts, r"(?m)^[ \t]*(?:\S+[ \t]+){" + str(upper) + r",}\S+.*$"
    )
    n_short = n_nonempty_lines - n_long_lines
    lorem = np.asarray(
        pc.match_substring_regex(texts, r"(?i)lorem ipsum").fill_null(False)
    )
    brace = np.asarray(pc.match_substring(texts, "{").fill_null(False))
    js = np.asarray(
        pc.match_substring_regex(texts, r"(?i)\bjavascript\b").fill_null(False)
    )
    ok = ~lorem & ~brace & ~js & (n_terminal >= min_terminal_lines)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_terminal_lines": pa.array(n_terminal, pa.int64()),
            "n_short_lines": pa.array(n_short, pa.int64()),
            "has_lorem": pa.array(lorem, pa.bool_()),
            "has_brace": pa.array(brace, pa.bool_()),
            "has_javascript": pa.array(js, pa.bool_()),
            "pass_c4": pa.array(ok, pa.bool_()),
        }
    )


def token_count_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish sub-word piece count per doc —
    vectorized regex-count kernels."""
    texts = batch[text_col]
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "ws_tokens": pa.array(_count_regex(texts, r"\S+"), pa.int64()),
            "bpe_tokens": pa.array(
                _count_regex(texts, r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), pa.int64()
            ),
        }
    )


LANGS = sorted(lang for lang, sw in STOPWORDS.items() if sw)


def langid_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: stopword hit-rate per language + CJK ratio.
    Deterministic; intended as a filter feature, not a classifier.

    Vectorized: one ``is_in`` membership pass per language over the batch's
    flat token array, reduced per doc with ``bincount``; CJK detection via a
    regex-count kernel. Ties in the stopword scores resolve to the
    alphabetically-first language (argmax over sorted-language rows)."""
    import pyarrow.compute as pc

    from splade_ray.analysis import tokenize_column

    texts = batch[text_col]
    n_rows = len(texts)
    terms, par, doc_lens = tokenize_column(texts)
    n = np.maximum(doc_lens, 1).astype(np.float64)
    scores = np.zeros((len(LANGS), n_rows), np.float64)
    for li, lang in enumerate(LANGS):
        hit = np.asarray(
            pc.is_in(terms, value_set=pa.array(sorted(STOPWORDS[lang]), pa.string()))
        )
        scores[li] = np.bincount(par[hit], minlength=n_rows) / n
    best_idx = np.argmax(scores, axis=0)
    conf = scores[best_idx, np.arange(n_rows)]
    langs = np.array(LANGS, object)[best_idx]
    langs[conf == 0.0] = "unknown"
    cjk = _count_regex(texts, CJK_RE.pattern).astype(np.float64)
    length = np.maximum(
        np.asarray(pc.utf8_length(texts).fill_null(0), dtype=np.int64), 1
    ).astype(np.float64)
    is_cjk = cjk > 0
    langs[is_cjk] = "zh"
    conf = np.where(is_cjk, np.minimum(1.0, cjk / length * 4.0), conf)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "pred_lang": pa.array(langs.tolist(), pa.string()),
            "confidence": pa.array(np.round(conf, 4), pa.float64()),
        }
    )


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text", window: int = 8) -> pa.Table:
    """Rolling polynomial hash fingerprint: min of all ``window``-token
    rolling hashes (a winnowing-style document signature, deterministic);
    docs shorter than the window get the polynomial fold of all their
    tokens (empty docs hash to 0).

    Vectorized over the whole batch: token hashes are computed once per
    *unique* token (dictionary-encoded), the rolling hash runs in ``window``
    vectorized passes over the flattened token array with doc-boundary
    windows masked out, and per-doc minima come from ``np.minimum.at``."""
    from splade_ray.analysis import tokenize_column

    P = np.uint64(1099511628211)
    texts = batch[text_col]
    n_rows = len(texts)
    terms, par, doc_lens = tokenize_column(texts)
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    enc = terms.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    if uniq:
        uh = np.array([hash_token(t) for t in uniq], np.uint64)
        hs = uh[enc.indices.to_numpy(zero_copy_only=False)]
    else:
        hs = np.array([], np.uint64)
    starts = np.concatenate(([0], np.cumsum(doc_lens)))[:-1].astype(np.int64)
    fps = np.zeros(n_rows, np.uint64)

    with np.errstate(over="ignore"):
        # windowed path: global rolling hash over the flat array, positions
        # whose window crosses a doc boundary masked out
        m = hs.size - window + 1
        long_mask = doc_lens >= window
        if m > 0 and long_mask.any():
            roll = np.zeros(m, np.uint64)
            for i in range(window):
                roll = roll * P + hs[i : i + m]
            valid = par[:m] == par[window - 1 : window - 1 + m]
            mins = np.full(n_rows, np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64)
            np.minimum.at(mins, par[:m][valid], roll[valid])
            fps[long_mask] = mins[long_mask]
        # short-doc path: polynomial fold of all tokens, iterated over token
        # position (≤ window-1 vectorized passes)
        short = ~long_mask
        if short.any():
            max_len = int(doc_lens[short].max())
            acc = np.zeros(n_rows, np.uint64)
            for i in range(max_len):
                sel = short & (doc_lens > i)
                acc[sel] = acc[sel] * P + hs[starts[sel] + i]
            fps[short] = acc[short]

    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "fingerprint": pa.array(fps, pa.uint64()),
        }
    )


def _gram_hashes(hs: np.ndarray, par: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat ``n``-gram rolling-fold hashes (uint64 wraparound, FNV prime —
    the ``fingerprint_batch`` fold) over a batch's flat token-hash array,
    with grams that cross a doc boundary masked out. Returns
    ``(gram_hash uint64, doc_index int64)``; docs with < n tokens
    contribute nothing."""
    P = np.uint64(1099511628211)
    m = hs.size - n + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    with np.errstate(over="ignore"):
        roll = np.zeros(m, np.uint64)
        for i in range(n):
            roll = roll * P + hs[i : i + m]
    valid = par[:m] == par[n - 1 : n - 1 + m]
    return roll[valid], par[:m][valid]


def _top_gram_per_doc(
    grams: np.ndarray, par: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per doc: (count of the most frequent gram, that gram's hash) with a
    deterministic tie-break (smallest hash among max-count grams). All
    sort/reduceat kernels — no Python loop over docs."""
    top_c = np.zeros(n_rows, np.int64)
    top_g = np.zeros(n_rows, np.uint64)
    if grams.size == 0:
        return top_c, top_g
    order = np.lexsort((grams, par))
    g_s, p_s = grams[order], par[order]
    bound = np.flatnonzero((p_s[1:] != p_s[:-1]) | (g_s[1:] != g_s[:-1])) + 1
    starts = np.concatenate(([0], bound))
    counts = np.diff(np.concatenate((starts, [g_s.size])))
    run_p, run_g = p_s[starts], g_s[starts]
    # pick per doc: max count, then min gram hash — order runs by
    # (doc, -count, gram) and take the first run of each doc
    pick = np.lexsort((run_g, -counts, run_p))
    first = np.unique(run_p[pick], return_index=True)[1]
    sel = pick[first]
    top_c[run_p[sel]] = counts[sel]
    top_g[run_p[sel]] = run_g[sel]
    return top_c, top_g


def repetition_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Within-document repetition stats (the Gopher repetition filters, Rae
    et al. 2021 §A1.1, token-fraction variant): per doc the most frequent
    2-gram / 3-gram and the duplicated-5-gram mass, plus integer-exact rule
    flags. Every fact is an integer count or a 64-bit gram hash, and every
    rule an integer cross-multiplied comparison, so the whole table has a
    bit-exact DuckDB mirror (gram hash = the ``fingerprint_batch`` rolling
    fold over sha256-prefix token hashes, reproduced in HUGEINT SQL).

    Rules (token-fraction analogs of Gopher's character fractions):
    top-2-gram mass ``2·top2_count ≤ 0.20·n_tokens``; top-3-gram mass
    ``3·top3_count ≤ 0.18·n_tokens``; duplicate-5-gram occurrences
    ``dup5_count ≤ 0.15·n_grams5``. Docs too short to form a gram pass
    trivially (counts 0). Tie-breaks: smallest gram hash among max-count
    grams."""
    from splade_ray.ops.dedup import _flat_token_hashes

    texts = batch[text_col]
    hs, par, doc_lens = _flat_token_hashes(texts)
    n_rows = doc_lens.size
    top2_c, top2_g = _top_gram_per_doc(*_gram_hashes(hs, par, 2), n_rows)
    top3_c, top3_g = _top_gram_per_doc(*_gram_hashes(hs, par, 3), n_rows)
    g5, p5 = _gram_hashes(hs, par, 5)
    n5 = np.bincount(p5, minlength=n_rows).astype(np.int64)
    if g5.size:
        # distinct 5-grams per doc: count run boundaries in the sorted stream
        order = np.lexsort((g5, p5))
        g_s, p_s = g5[order], p5[order]
        new_run = np.concatenate(
            ([True], (p_s[1:] != p_s[:-1]) | (g_s[1:] != g_s[:-1]))
        )
        distinct5 = np.bincount(p_s[new_run], minlength=n_rows).astype(np.int64)
    else:
        distinct5 = np.zeros(n_rows, np.int64)
    dup5 = n5 - distinct5
    rep2 = 10 * top2_c > doc_lens          # 2·c/n > 1/5
    rep3 = 50 * top3_c > 3 * doc_lens      # 3·c/n > 9/50
    rep5 = 20 * dup5 > 3 * n5              # dup/n5 > 3/20
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_tokens": pa.array(doc_lens, pa.int64()),
            "top2_count": pa.array(top2_c, pa.int64()),
            "top2_gram": pa.array(top2_g, pa.uint64()),
            "top3_count": pa.array(top3_c, pa.int64()),
            "top3_gram": pa.array(top3_g, pa.uint64()),
            "n_grams5": pa.array(n5, pa.int64()),
            "dup5_count": pa.array(dup5, pa.int64()),
            "rep_top2": pa.array(rep2, pa.bool_()),
            "rep_top3": pa.array(rep3, pa.bool_()),
            "rep_dup5": pa.array(rep5, pa.bool_()),
            "pass_repetition": pa.array(~(rep2 | rep3 | rep5), pa.bool_()),
        }
    )


def hash_token(t: str) -> np.uint64:
    """64-bit token hash = first 8 bytes of sha256 (big-endian). sha256 is
    chosen over blake2b so every hash-derived operator (fingerprint, minhash,
    simhash) has an exact ANSI-SQL mirror:
    ``('0x' || substr(sha256(t), 1, 16))::UBIGINT`` in DuckDB."""
    import hashlib

    return np.uint64(int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "big"))
