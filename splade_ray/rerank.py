"""Rerank stage: run ⋈ queries ⋈ documents join + second-pass scoring.

Mirrors the reference's rerank data flow (``splade/rerank.py:18-100``):
its ``RerankDataset`` joins the first-stage run with the query and document
collections via preloaded dicts (``splade/datasets/rerank.py:17-89``, J1 in
SURVEY.md §2.4), applies the self-hit filter (``splade/beir_eval.py:82-88``,
M13), and feeds (query text, doc text) pairs to a cross-encoder
(``transformer_evaluator.py:270-374``, T4).

Ray-Data shape: the run and query set are tiny (Q × k rows) — broadcast via
``ray.put`` once and joined inside ``map_batches`` while *streaming* the
document table (broadcast-small-side hash join; the doc table is the 100 TB
side and never shuffles). The second-pass scorer is an actor-pool stage; the
neural cross-encoder of the reference is replaced by a deterministic lexical
overlap scorer (model inference is out of scope per SURVEY.md — the plumbing
, batching and actor lifecycle are the real part).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from splade_ray.analysis import term_counts, tokenize


def rerank_input(
    docs_ds: rd.Dataset | None,
    run: pd.DataFrame,
    queries: list[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_self_hits: bool = True,
    docs_path: str | list[str] | None = None,
    pushdown_max_ids: int = 100_000,
) -> rd.Dataset:
    """(query_id, rank, doc_id, q_text, d_text) candidate pairs.

    ``run`` must have columns (query_id, rank, doc_id). Self-hits
    (doc_id == query_id) are dropped like the reference's BEIR-quora guard
    (beir_eval.py:82-88).

    Two read strategies (round-1 VERDICT item 4): streaming the whole doc
    table is the right shape when the run is large (reranking a full-corpus
    sweep), but the common case is a top-k-sized run — when ``docs_path`` is
    given and the candidate set is ≤ ``pushdown_max_ids``, the doc text is
    fetched with a predicate-pushdown ``read_parquet(filter=id.isin(...))``
    so only row groups containing candidates leave storage: O(k) I/O
    instead of O(corpus)."""
    small = run[["query_id", "rank", "doc_id"]].copy()
    if drop_self_hits:
        small = small[small["doc_id"] != small["query_id"]]
    if docs_path is not None and small["doc_id"].nunique() <= pushdown_max_ids:
        import pyarrow.dataset as pads

        cand = sorted(small["doc_id"].unique().tolist())
        docs_ds = rd.read_parquet(
            docs_path,
            columns=[id_col, text_col],
            filter=pads.field(id_col).isin(cand),
        )
    elif docs_ds is None:
        from splade_ray.io import read_parquet_clean

        docs_ds = read_parquet_clean(docs_path, columns=[id_col, text_col])
    q_text = {int(q): t for q, t in queries}
    small_ref = ray.put((small, q_text))

    def join(batch: pa.Table) -> pa.Table:
        run_df, qt = ray.get(small_ref)
        b = pa.table({"doc_id": batch[id_col], "d_text": batch[text_col]}).to_pandas()
        out = run_df.merge(b, on="doc_id", how="inner")
        out["q_text"] = out["query_id"].map(qt)
        return pa.table(
            {
                "query_id": pa.array(out["query_id"].to_numpy(np.int64)),
                "rank": pa.array(out["rank"].to_numpy(np.int64)),
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
                "q_text": pa.array(out["q_text"].astype(str)),
                "d_text": pa.array(out["d_text"].astype(str)),
            }
        )

    return docs_ds.map_batches(join, batch_format="pyarrow", batch_size=1024)


class LexicalReranker:
    """Actor-pool second-pass scorer (T4 stand-in for the cross-encoder).

    Deterministic pair score: the number of *distinct* query terms present in
    the document. The stateful part (per-actor setup in ``__init__``, batch
    scoring in ``__call__``) is exactly where a learned model would load its
    weights (``transformer_rank.py:13-103`` analog)."""

    def __init__(self):
        # per-actor setup happens once (model-load placement); the tokenizer
        # regex is module-level-compiled already, so nothing heavy here
        self._cache: dict[str, frozenset[str]] = {}

    def _q_terms(self, q_text: str) -> frozenset[str]:
        got = self._cache.get(q_text)
        if got is None:
            got = self._cache[q_text] = frozenset(term_counts(q_text))
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        overlaps = np.empty(len(batch), np.int64)
        for i, (q_text, d_text) in enumerate(
            zip(batch["q_text"].to_pylist(), batch["d_text"].to_pylist())
        ):
            overlaps[i] = len(self._q_terms(q_text) & set(tokenize(d_text)))
        return batch.append_column("overlap", pa.array(overlaps, pa.int64()))


def pairwise_rerank(scored: pd.DataFrame) -> pd.DataFrame:
    """duoT5-style pairwise-preference aggregation
    (``transformer_evaluator.py:328-340``): each candidate's score is its
    win count over the other candidates of the same query — 1 per strictly
    higher ``overlap``, 0.5 per tie (self-pairs excluded) — doubled to stay
    integral (``wins2``); re-ranked by (wins2 desc, first-stage rank asc,
    doc_id asc). Driver-side: candidate sets are top-k sized."""
    out = []
    for qid, g in scored.groupby("query_id"):
        ov = g["overlap"].to_numpy(np.int64)
        wins2 = (
            2 * (ov[:, None] > ov[None, :]).sum(axis=1)
            + (ov[:, None] == ov[None, :]).sum(axis=1)
            - 1  # self-tie
        )
        gg = g.copy()
        gg["wins2"] = wins2
        out.append(gg)
    res = pd.concat(out, ignore_index=True).sort_values(
        ["query_id", "wins2", "rank", "doc_id"], ascending=[True, False, True, True]
    )
    res["new_rank"] = res.groupby("query_id").cumcount() + 1
    return res[["query_id", "new_rank", "doc_id", "wins2", "rank"]].reset_index(drop=True)


def rerank(
    pairs: rd.Dataset,
    *,
    top_k: int | None = None,
    concurrency=(1, 4),
) -> pd.DataFrame:
    """Score pairs with the actor pool and re-rank per query by
    (overlap desc, first-stage rank asc, doc_id asc) — deterministic, like
    the pairwise aggregation + position tie-break of the reference
    (transformer_evaluator.py:328-340)."""
    scored = pairs.map_batches(
        LexicalReranker, batch_format="pyarrow", batch_size=512, concurrency=concurrency
    ).to_pandas()
    scored = scored.sort_values(
        ["query_id", "overlap", "rank", "doc_id"], ascending=[True, False, True, True]
    )
    scored["new_rank"] = scored.groupby("query_id").cumcount() + 1
    if top_k is not None:
        scored = scored[scored["new_rank"] <= top_k]
    return scored[["query_id", "new_rank", "doc_id", "overlap", "rank"]].reset_index(drop=True)
