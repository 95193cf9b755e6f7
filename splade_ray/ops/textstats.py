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

ALPHA_RE = re.compile(r"[a-zA-Z]")
DIGIT_RE = re.compile(r"[0-9]")
WS_RE = re.compile(r"\S+")
# BPE-ish sub-word pieces: letter runs, digit runs, or single non-space symbol
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")

STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "for", "on"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "una", "es", "por"},
    "de": {"der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "une", "est"},
    "zh": set(),  # no space-delimited stopwords; cjk_ratio is the signal
}
CJK_RE = re.compile(r"[一-鿿]")


def quality_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """(doc_id, n_tokens, alpha_ratio_r, digit_ratio_r) — ratios rounded to
    4dp with round-half-up so the SQL oracle matches exactly."""
    doc_ids, n_tokens, alpha_r, digit_r = [], [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
        t = text or ""
        L = max(len(t), 1)
        doc_ids.append(did)
        n_tokens.append(len(tokenize(t)))
        alpha_r.append(np.floor(len(ALPHA_RE.findall(t)) / L * 1e4 + 0.5) / 1e4)
        digit_r.append(np.floor(len(DIGIT_RE.findall(t)) / L * 1e4 + 0.5) / 1e4)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "alpha_ratio_r": pa.array(alpha_r, pa.float64()),
            "digit_ratio_r": pa.array(digit_r, pa.float64()),
        }
    )


def token_count_batch(batch: pa.Table, *, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish sub-word piece count per doc."""
    doc_ids, ws, bpe = [], [], []
    for did, text in zip(batch["doc_id"].to_pylist(), batch[text_col].to_pylist()):
        t = text or ""
        doc_ids.append(did)
        ws.append(len(WS_RE.findall(t)))
        bpe.append(len(BPE_RE.findall(t)))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "ws_tokens": pa.array(ws, pa.int64()),
            "bpe_tokens": pa.array(bpe, pa.int64()),
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
