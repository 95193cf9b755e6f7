"""More-like-this: seed documents as queries (Lucene MLT analog).

The reference retrieves for TEXT queries only (``conf/retrieve`` flow,
``splade/tasks/transformer_evaluator.py:142-193``); "find documents similar
to this one" is the other retrieval entry users of a fulltext engine expect.
Semantics pinned for exactness (and SQL mirroring):

1. The seed doc's terms are ranked by ``(tf desc, df asc, term asc)`` — most
   frequent in the doc, rarest in the corpus — and the top ``m_terms``
   become the query, each with query-tf 1. This integer ordering is the
   deterministic variant of Lucene MLT's tf·idf term selection (same
   monotonicity per factor, no float ranking in the selection step).
2. Retrieval = the standard BM25 scatter-gather (:func:`splade_ray.query.search`)
   over that term set, with the seed itself removed (self-hit filter, the
   reference's qrel-aware filter analog, rerank.py M13) and ranks reassigned
   — the engine searches ``top_k + 1`` then drops the seed, so the returned
   top-k is exact.

Scale shape: seed text is fetched with a pushdown ``isin`` scan (O(seeds)
rows leave storage, the flagship/rerank pattern); term selection is
seed-sized driver work; everything else is the existing query path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params
from splade_ray.query import RUN_COLUMNS, search


def select_terms(
    index_dir: str, seed_texts: dict[int, str], m_terms: int, query_lang: str | None = None
) -> dict[int, list[str]]:
    """Top-``m_terms`` per seed by (tf desc, df asc, term asc). Terms absent
    from the lexicon (df unknown) are dropped — they can't score anyway."""
    counts = {sid: term_counts(t, query_lang) for sid, t in seed_texts.items()}
    all_terms = sorted({t for c in counts.values() for t in c})
    if not all_terms:
        return {sid: [] for sid in seed_texts}
    lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
        columns=["term", "df"], filter=pads.field("term").isin(all_terms)
    )
    dfs = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))
    out: dict[int, list[str]] = {}
    for sid, c in counts.items():
        ranked = sorted(
            ((t, tf) for t, tf in c.items() if t in dfs),
            key=lambda x: (-x[1], dfs[x[0]], x[0]),
        )
        out[sid] = [t for t, _ in ranked[:m_terms]]
    return out


def more_like_this(
    index_dir: str,
    corpus_path: str,
    seed_ids: list[int],
    *,
    m_terms: int = 10,
    params: BM25Params | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Run table (query_id = seed doc id, rank, doc_id, score), top-k similar
    docs per seed, seed excluded."""
    params = params or BM25Params()
    flt = pads.field(id_col).isin([int(s) for s in seed_ids])
    tbl = pads.dataset(corpus_path).to_table(columns=[id_col, text_col], filter=flt)
    seed_texts = dict(
        zip(
            tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64).tolist(),
            tbl[text_col].to_pylist(),
        )
    )
    missing = set(map(int, seed_ids)) - set(seed_texts)
    if missing:
        raise KeyError(f"seed doc ids not found in corpus: {sorted(missing)}")
    terms = select_terms(index_dir, seed_texts, m_terms, query_lang)
    queries = [(sid, " ".join(ts)) for sid, ts in terms.items() if ts]
    if not queries:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64, "score": np.float64}
        )
    over = BM25Params(
        k1=params.k1, b=params.b, top_k=params.top_k + 1, threshold=params.threshold
    )
    run = search(
        index_dir, queries, over, query_lang=query_lang, concurrency=concurrency
    )
    run = run[run["doc_id"] != run["query_id"]].copy()  # self-hit filter
    run["rank"] = run.groupby("query_id").cumcount().add(1).astype(np.int32)
    run = run[run["rank"] <= params.top_k]
    return run.reset_index(drop=True)[RUN_COLUMNS]
