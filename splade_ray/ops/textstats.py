"""Text analysis operators: quality scoring, token counting, language-ID
heuristic, document fingerprinting. All are single-pass ``map_batches``
stages; the quality metrics mirror what a pretraining-data pipeline filters
on (length / character-class ratios / stopword ratio).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from splade_ray.analysis import tokenize

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


def langid_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: stopword hit-rate per language + CJK ratio.
    Deterministic; intended as a filter feature, not a classifier."""
    doc_ids, langs, confs = [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
        t = (text or "").lower()
        toks = tokenize(t)
        n = max(len(toks), 1)
        if CJK_RE.search(t):
            best, conf = "zh", min(1.0, len(CJK_RE.findall(t)) / max(len(t), 1) * 4)
        else:
            scores = {
                lang: sum(tok in sw for tok in toks) / n
                for lang, sw in STOPWORDS.items()
                if sw
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            conf = scores[best]
            if conf == 0.0:
                best = "unknown"
        doc_ids.append(did)
        langs.append(best)
        confs.append(round(float(conf), 4))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "pred_lang": pa.array(langs, pa.string()),
            "confidence": pa.array(confs, pa.float64()),
        }
    )


def fingerprint_batch(batch: pa.Table, *, text_col: str = "text", window: int = 8) -> pa.Table:
    """Rolling polynomial hash fingerprint: min-hash of all ``window``-token
    rolling hashes (a winnowing-style document signature, deterministic)."""
    P = np.uint64(1099511628211)
    doc_ids, fps = [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
        toks = tokenize(text or "")
        hs = np.array(
            [hash_token(t) for t in toks] or [0], dtype=np.uint64
        )
        if hs.size >= window:
            roll = np.zeros(hs.size - window + 1, np.uint64)
            for i in range(window):
                roll = roll * P + hs[i : i + roll.size]
            fp = int(roll.min())
        else:
            acc = np.uint64(0)
            for h in hs:
                acc = acc * P + h
            fp = int(acc)
        doc_ids.append(did)
        fps.append(fp)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "fingerprint": pa.array(np.array(fps, np.uint64), pa.uint64()),
        }
    )


def hash_token(t: str) -> np.uint64:
    import hashlib

    return np.uint64(
        int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
    )
