"""BPE tokenizer training + application over a Ray Data corpus.

A training-data pipeline needs to LEARN its tokenizer from the corpus it
curates (Sennrich et al., ACL 2016 "Neural Machine Translation of Rare
Words with Subword Units"; the GPT-2/SentencePiece-BPE family). The
reference ships a frozen HuggingFace vocabulary
(``splade/models/transformer_rep.py:141`` — 30522 fixed entries); here the
vocabulary is fit to the data:

1. **Word counts** (:func:`bpe_word_counts`) — the distributed part.
   Classic BPE trains on the word-frequency DICTIONARY, not the corpus
   stream: tokenize each batch (the repo's Arrow kernel), count words
   batch-locally, one (word, count) groupby. The shuffle carries distinct
   words x blocks combiner rows; ``min_count`` prunes the long tail so the
   driver table stays vocab-sized (the standard frequency floor — at
   100 TB the distinct-word dictionary above any sane floor is MBs, and
   every dropped word is below it in EVERY possible merge order).
2. **Merge learning** (:func:`bpe_train`) — inherently sequential
   (merge i+1 depends on i), so it runs driver-side over the dictionary,
   exactly like subword-nmt/HF trainers. Deterministic: ties on pair
   count break lexicographically.
3. **Application** (:func:`bpe_apply`) — distributed again: a streaming
   ``map_batches`` that segments each UNIQUE word once per batch
   (dictionary-encode; the corpus pays per distinct word, not per token)
   with the broadcast merge ranks, then gathers per-doc subword counts.

Word = the repo-wide token class (``analysis.TOKEN_PATTERN``); symbols are
characters with the Sennrich ``</w>`` end-of-word marker, so merges never
cross word boundaries.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

EOW = "</w>"


def bpe_word_counts(
    docs,
    *,
    text_col: str = "text",
    min_count: int = 1,
) -> pd.DataFrame:
    """Distributed (word, count) dictionary, sorted (count desc, word asc).
    Batch-local combiners -> one word-keyed groupby; ``min_count`` floors
    the tail so the driver table stays dictionary-sized."""
    from splade_ray.analysis import tokenize_column

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )
        if batch.num_rows == 0:
            return empty
        terms, _, _ = tokenize_column(batch[text_col])
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        if len(terms) == 0:
            return empty
        enc = terms.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(codes, minlength=len(enc.dictionary))
        return pa.table(
            {"word": enc.dictionary, "cnt": pa.array(cnt.astype(np.int64))}
        )

    pdf = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .sum("cnt")
        .to_pandas()
        .rename(columns={"sum(cnt)": "count"})
    )
    if min_count > 1:
        pdf = pdf[pdf["count"] >= min_count]
    pdf = pdf.sort_values(["count", "word"], ascending=[False, True],
                          kind="mergesort")
    return pdf.reset_index(drop=True)[["word", "count"]]


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _dict_fingerprint(word_counts: pd.DataFrame) -> str:
    """Digest of the (word, count) dictionary a checkpoint was trained on —
    a resumed run against a DIFFERENT dictionary must start over, not splice
    two merge histories."""
    import hashlib

    h = hashlib.sha256()
    for w, c in zip(word_counts["word"], word_counts["count"]):
        h.update(w.encode())
        h.update(int(c).to_bytes(8, "big", signed=True))
    return h.hexdigest()[:16]


def bpe_train(
    word_counts: pd.DataFrame,
    n_merges: int,
    *,
    top_k_words: int | None = None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 200,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a (word, count) dictionary —
    the Sennrich et al. 2016 loop with incremental pair-count maintenance.
    Ties on pair frequency break lexicographically (subword-nmt's
    determinism contract). Returns merges in learned order.

    100-TB controls (ROADMAP: count-threshold schedule + checkpointing):

    - ``top_k_words`` trains on the top-K dictionary slice by (count desc,
      word asc) — the standard truncation (HF/SentencePiece both cap the
      training dictionary): beyond the ``min_count`` floor applied in
      :func:`bpe_word_counts`, this bounds driver memory by K regardless of
      how heavy the surviving tail is.
    - ``checkpoint_path`` makes the sequential driver loop crash-safe:
      every ``checkpoint_every`` merges the learned prefix is written
      atomically (tmp+rename) as JSON with a dictionary fingerprint; a
      re-run replays the prefix onto the dictionary (the rank-order replay
      is exactly :func:`segment_word`) and continues from merge i+1. A
      fingerprint or param mismatch ignores the stale checkpoint.
    """
    import json
    import os

    if top_k_words is not None:
        word_counts = word_counts.head(top_k_words)

    done: list[tuple[str, str]] = []
    fp = None
    if checkpoint_path:
        fp = _dict_fingerprint(word_counts)
        if os.path.exists(checkpoint_path):
            with open(checkpoint_path) as fh:
                ck = json.load(fh)
            if ck.get("fingerprint") == fp and ck.get("n_merges") == n_merges:
                done = [tuple(p) for p in ck["merges"]][:n_merges]

    def _checkpoint(merges: list[tuple[str, str]]) -> None:
        if not checkpoint_path:
            return
        tmp = checkpoint_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"fingerprint": fp, "n_merges": n_merges,
                 "merges": [list(p) for p in merges]},
                fh,
            )
        os.replace(tmp, checkpoint_path)

    if len(done) >= n_merges:
        return done[:n_merges]

    if done:
        # replay the checkpointed prefix: lowest-rank-first segmentation is
        # equivalent to applying merges in learned order
        ranks = {p: i for i, p in enumerate(done)}
        words = [segment_word(w, ranks) for w in word_counts["word"]]
    else:
        words = [list(_symbols(w)) for w in word_counts["word"]]
    counts = word_counts["count"].to_numpy(np.int64)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        c = int(counts[wi])
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = list(done)
    for _ in range(n_merges - len(merges)):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] <= 0:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            syms = words[wi]
            c = int(counts[wi])

            def bump(p: tuple[str, str], d: int) -> None:
                v = pair_counts.get(p, 0) + d
                if v <= 0:
                    pair_counts.pop(p, None)
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(wi)
                        if not s:
                            pair_words.pop(p, None)
                else:
                    pair_counts[p] = v
                    pair_words.setdefault(p, set()).add(wi)

            i = 0
            out: list[str] = []
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    if out:
                        bump((out[-1], syms[i]), -c)
                        bump((out[-1], new_sym), +c)
                    if i + 2 < len(syms):
                        bump((syms[i + 1], syms[i + 2]), -c)
                        # the right-neighbour pair is re-added below when
                        # the loop visits it, unless it is also merged;
                        # add the (new_sym, right) pair now
                        bump((new_sym, syms[i + 2]), +c)
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
        # remove the merged pair itself
        pair_counts.pop(best, None)
        pair_words.pop(best, None)
        if len(merges) % checkpoint_every == 0:
            _checkpoint(merges)
    _checkpoint(merges)
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the lowest-rank
    adjacent pair (the standard BPE inference loop)."""
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class _BpeApplyStage:
    """Actor-pool apply: merge ranks broadcast once; each batch segments
    only its UNIQUE words (dictionary-encode) and gathers per-doc counts."""

    def __init__(self, merges_ref, *, text_col: str, id_col: str):
        import ray

        merges = ray.get(merges_ref)
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from splade_ray.analysis import tokenize_column

        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "n_subwords": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        terms, par, _ = tokenize_column(batch[self.text_col])
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        n = batch.num_rows
        if len(terms) == 0:
            z = np.zeros(n, np.int64)
            return pa.table(
                {"doc_id": pa.array(ids), "n_words": pa.array(z),
                 "n_subwords": pa.array(z)}
            )
        enc = terms.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pieces = np.array(
            [len(segment_word(w, self.ranks)) for w in enc.dictionary.to_pylist()],
            np.int64,
        )
        n_words = np.bincount(par, minlength=n)
        n_sub = np.bincount(par, weights=pieces[codes], minlength=n)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words.astype(np.int64)),
                "n_subwords": pa.array(n_sub.astype(np.int64)),
            }
        )


def bpe_apply(
    docs,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-doc subword statistics under a learned merge list: returns a
    Dataset of (doc_id, n_words, n_subwords) — the token-budget numbers a
    packing/pricing stage needs. Streaming scan; merges broadcast once."""
    import ray

    merges_ref = ray.put([tuple(p) for p in merges])
    return docs.map_batches(
        _BpeApplyStage,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs=dict(
            merges_ref=merges_ref, text_col=text_col, id_col=id_col
        ),
    )
