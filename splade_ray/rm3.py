"""RM3-style pseudo-relevance-feedback query expansion.

The reference retrieves each query exactly once with its encoded
representation (``splade/tasks/transformer_evaluator.py:142-193``); classic
lexical engines (Indri, Anserini's ``-rm3`` flag) improve recall by a second
pass: retrieve, mine expansion terms from the top feedback documents, and
re-retrieve with the enriched query (Abdul-Jaleel et al. 2004, "UMass at
TREC 2004"). This module is the deterministic integer variant of that loop,
pinned so every step has an exact DuckDB mirror:

1. **Feedback pass** — the standard BM25 scatter-gather
   (:func:`splade_ray.query.search`) at ``top_k = fb_docs``.
2. **Term mining** — feedback docs' texts arrive via the pushdown ``isin``
   scan (O(queries x fb_docs) rows leave storage, the flagship/rerank/MLT
   pattern); per query, candidate terms are ranked by
   ``(sum of tf across that query's feedback docs DESC, corpus df ASC,
   term ASC)`` and the top ``fb_terms`` NOT already in the (analyzed)
   query are kept. Same monotonicity per factor as the floating-point
   relevance-model weights, no float ranking in the selection step — the
   MLT selection contract (mlt.py) applied to feedback sets.
3. **Expanded pass** — the query's original terms keep their query-tfs;
   each expansion term joins with query-tf ``exp_qtf`` (default 1, the
   integer analog of RM3's interpolation weight). Retrieval is the same
   BM25 scatter-gather over the expanded term multiset.

Scale shape: both passes are the existing query path (segments x chunks
work grid, k-sized merges); term mining is feedback-set-sized driver work;
the only extra I/O is the O(fb) pushdown text fetch and one lexicon
``isin`` read for dfs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params
from splade_ray.query import RUN_COLUMNS, search

EXPANSION_COLUMNS = ["query_id", "term", "fb_tf", "df"]


def mine_expansion_terms(
    index_dir: str,
    corpus_path: str,
    queries: list[tuple[int, str]],
    fb_run: pd.DataFrame,
    *,
    fb_terms: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_lang: str | None = None,
) -> pd.DataFrame:
    """Expansion table (query_id, term, fb_tf, df): the top ``fb_terms``
    feedback terms per query, excluding the query's own analyzed terms.

    ``fb_run`` is the feedback-pass run table; its texts are fetched with a
    single pushdown ``isin`` scan. ``fb_tf`` sums term frequency over the
    query's feedback docs; ties break by rarest corpus ``df`` then term."""
    if fb_run.empty:
        return pd.DataFrame(columns=EXPANSION_COLUMNS).astype(
            {"query_id": np.int64, "term": object, "fb_tf": np.int64, "df": np.int64}
        )
    fb_ids = sorted({int(d) for d in fb_run["doc_id"]})
    flt = pads.field(id_col).isin(fb_ids)
    tbl = pads.dataset(corpus_path).to_table(columns=[id_col, text_col], filter=flt)
    doc_counts = {
        int(i): term_counts(t, query_lang)
        for i, t in zip(
            tbl[id_col].to_numpy(zero_copy_only=False).tolist(), tbl[text_col].to_pylist()
        )
    }

    # per-query candidate sums, minus the query's own analyzed terms
    own = {qid: set(term_counts(text, query_lang)) for qid, text in queries}
    cand: dict[int, dict[str, int]] = {}
    for qid, grp in fb_run.groupby("query_id"):
        sums: dict[str, int] = {}
        for d in grp["doc_id"]:
            for t, tf in doc_counts.get(int(d), {}).items():
                sums[t] = sums.get(t, 0) + int(tf)
        qown = own.get(int(qid), set())
        cand[int(qid)] = {t: s for t, s in sums.items() if t not in qown}

    all_terms = sorted({t for c in cand.values() for t in c})
    if not all_terms:
        return pd.DataFrame(columns=EXPANSION_COLUMNS).astype(
            {"query_id": np.int64, "term": object, "fb_tf": np.int64, "df": np.int64}
        )
    lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
        columns=["term", "df"], filter=pads.field("term").isin(all_terms)
    )
    dfs = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))

    rows: list[tuple[int, str, int, int]] = []
    for qid in sorted(cand):
        ranked = sorted(
            ((t, s) for t, s in cand[qid].items() if t in dfs),
            key=lambda x: (-x[1], dfs[x[0]], x[0]),
        )
        rows.extend((qid, t, s, int(dfs[t])) for t, s in ranked[:fb_terms])
    out = pd.DataFrame(rows, columns=EXPANSION_COLUMNS)
    return out.astype({"query_id": np.int64, "fb_tf": np.int64, "df": np.int64})


def rm3_search(
    index_dir: str,
    corpus_path: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    fb_docs: int = 5,
    fb_terms: int = 8,
    exp_qtf: int = 1,
    method: str = "exact",
    text_col: str = "text",
    id_col: str = "doc_id",
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """Two-pass RM3-style retrieval: feedback search at ``fb_docs``, integer
    term mining, expanded search at ``params.top_k``. Returns the final run
    table (query_id, rank, doc_id, score). A query whose feedback pass
    returns nothing (or yields no expansion terms) re-runs unchanged."""
    params = params or BM25Params()
    fb_params = BM25Params(
        k1=params.k1, b=params.b, top_k=fb_docs, threshold=params.threshold
    )
    fb_run = search(
        index_dir, queries, fb_params, method=method,
        query_lang=query_lang, concurrency=concurrency,
    )
    exp = mine_expansion_terms(
        index_dir, corpus_path, queries, fb_run,
        fb_terms=fb_terms, text_col=text_col, id_col=id_col, query_lang=query_lang,
    )
    by_q = exp.groupby("query_id")["term"].apply(list).to_dict() if not exp.empty else {}
    expanded = [
        (qid, text + (" " + " ".join(by_q[qid] * exp_qtf) if by_q.get(qid) else ""))
        for qid, text in queries
    ]
    run = search(
        index_dir, expanded, params, method=method,
        query_lang=query_lang, concurrency=concurrency,
    )
    return run[RUN_COLUMNS]
