"""Significant-terms aggregation (Elasticsearch ``significant_terms`` /
``significant_text``): terms overrepresented in a query's matching docs
relative to the whole corpus.

The reference emits a flat run only (``transformer_evaluator.py:172-188``);
production engines surface "what is special about these matches" via a
foreground-vs-background term contrast. Exact counting over ALL matches
needs a forward index, so Elasticsearch documents sampling the foreground
from the top hits (the ``sampler`` aggregation idiom) — that is the shape
implemented here, and it is the scalable one:

1. **Foreground** — the top ``fg_k`` BM25 hits per query (k-bounded, the
   standard scatter-gather); their texts arrive via the pushdown ``isin``
   scan (O(queries x fg_k) rows leave storage — the rerank/MLT/RM3
   pattern).
2. **Counting** — ``fg_count`` = number of the query's foreground docs
   CONTAINING the term (doc presence, not tf — the ES contract);
   ``fg_total`` = foreground size actually retrieved. Background ``df``
   comes from one lexicon ``isin`` read, ``bg_total`` = corpus N from the
   manifest (stats retained under logical deletes, Lucene-style).
3. **JLH score** (the ES default): with ``fgp = fg_count/fg_total`` and
   ``bgp = df/bg_total``, terms where ``fgp > bgp`` score
   ``(fgp - bgp) * (fgp / bgp)``; others drop. Pinned ordering
   ``(score DESC, fg_count DESC, term ASC)``, top ``top_m`` per query.

Everything after the run is foreground-sized driver work; no shuffle, no
corpus scan.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params
from splade_ray.build import load_manifest
from splade_ray.query import search

SIG_COLUMNS = ["query_id", "rank", "term", "fg_count", "fg_total", "df", "score"]


def _empty() -> pd.DataFrame:
    return pd.DataFrame(columns=SIG_COLUMNS).astype(
        {
            "query_id": np.int64,
            "rank": np.int64,
            "term": object,
            "fg_count": np.int64,
            "fg_total": np.int64,
            "df": np.int64,
            "score": np.float64,
        }
    )


def significant_terms(
    index_dir: str,
    corpus_path: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    fg_k: int = 10,
    top_m: int = 10,
    method: str = "exact",
    text_col: str = "text",
    id_col: str = "doc_id",
    query_lang: str | None = None,
    fg_run: pd.DataFrame | None = None,
) -> pd.DataFrame:
    """Top ``top_m`` JLH-significant terms per query over the top ``fg_k``
    BM25 hits. Returns (query_id, rank, term, fg_count, fg_total, df,
    score). Pass ``fg_run`` (columns query_id, doc_id) to supply the
    foreground sample yourself — e.g. a tie-stable re-ranked run, or any
    external candidate set — instead of the internal fg_k search."""
    p = params or BM25Params()
    if fg_run is not None:
        run = fg_run
    else:
        run = search(
            index_dir,
            queries,
            BM25Params(k1=p.k1, b=p.b, top_k=fg_k, threshold=p.threshold),
            method=method,
            query_lang=query_lang,
        )
    if run.empty:
        return _empty()

    fg_ids = sorted({int(d) for d in run["doc_id"]})
    flt = pads.field(id_col).isin(fg_ids)
    tbl = pads.dataset(corpus_path).to_table(columns=[id_col, text_col], filter=flt)
    doc_terms = {
        int(i): set(term_counts(t, query_lang))
        for i, t in zip(
            tbl[id_col].to_numpy(zero_copy_only=False).tolist(),
            tbl[text_col].to_pylist(),
        )
    }

    # per-query doc-presence counts over the foreground
    fg_counts: dict[int, dict[str, int]] = {}
    fg_totals: dict[int, int] = {}
    for qid, grp in run.groupby("query_id"):
        c: dict[str, int] = {}
        for d in grp["doc_id"]:
            for t in doc_terms.get(int(d), ()):
                c[t] = c.get(t, 0) + 1
        fg_counts[int(qid)] = c
        fg_totals[int(qid)] = int(len(grp))

    all_terms = sorted({t for c in fg_counts.values() for t in c})
    if not all_terms:
        return _empty()
    lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
        columns=["term", "df"], filter=pads.field("term").isin(all_terms)
    )
    dfs = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))
    bg_total = int(load_manifest(index_dir)["n_docs"])

    rows: list[tuple] = []
    for qid in sorted(fg_counts):
        fg_total = fg_totals[qid]
        scored = []
        for t, fc in fg_counts[qid].items():
            df = dfs.get(t)
            if df is None:
                continue  # per-lang analyzer asymmetry: unindexed term
            fgp = fc / fg_total
            bgp = df / bg_total
            if fgp <= bgp:
                continue  # ES keeps positively-significant terms only
            scored.append((t, fc, int(df), (fgp - bgp) * (fgp / bgp)))
        scored.sort(key=lambda x: (-x[3], -x[1], x[0]))
        for r, (t, fc, df, s) in enumerate(scored[:top_m], start=1):
            rows.append((qid, r, t, fc, fg_total, df, s))
    if not rows:
        return _empty()
    out = pd.DataFrame(rows, columns=SIG_COLUMNS)
    return out.astype(
        {
            "query_id": np.int64,
            "rank": np.int64,
            "fg_count": np.int64,
            "fg_total": np.int64,
            "df": np.int64,
            "score": np.float64,
        }
    )
