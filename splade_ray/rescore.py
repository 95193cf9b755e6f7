"""Query rescoring (Elasticsearch `rescore` / Lucene QueryRescorer).

Two-pass retrieval: a cheap first-pass BM25 ranking produces a per-query
window of ``window_size`` candidates; a more precise second-pass query — a
match_phrase over the same text — rescores ONLY that window, and the two
scores combine per ``score_mode`` (Lucene ``QueryRescorer.combine``):
docs matching the rescore query get ``combine(qw*primary, rqw*secondary)``,
docs that don't keep ``qw*primary``. Only the window re-sorts.

The reference exposes single-pass ranking only
(``splade/tasks/transformer_evaluator.py:142-193``); rescore is a
beyond-reference fulltext face. Scale shape: pass 1 is the standard
scatter-gather ``query.search``; pass 2 reuses the positional phrase
matcher — the per-segment match Dataset is filtered down to the broadcast
window doc set BEFORE collection, while the phrase's global df (its idf
input) comes from the unfiltered match stream, exactly like
``positions.phrase_topk``. Everything the driver touches is window-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from splade_ray.bm25 import BM25Params, idf, tf_component

RESCORE_MODES = ("total", "multiply", "avg", "max", "min")


def _combine(mode: str, prim: np.ndarray, sec: np.ndarray, matched: np.ndarray) -> np.ndarray:
    if mode == "total":
        comb = prim + sec
    elif mode == "multiply":
        comb = prim * sec
    elif mode == "avg":
        comb = (prim + sec) / 2.0
    elif mode == "max":
        comb = np.maximum(prim, sec)
    elif mode == "min":
        comb = np.minimum(prim, sec)
    else:
        raise ValueError(f"unknown score_mode {mode!r} (expected {RESCORE_MODES})")
    return np.where(matched, comb, prim)


def rescore_phrase(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    phrases: dict[int, str] | None = None,
    window_size: int = 50,
    score_mode: str = "total",
    query_weight: float = 1.0,
    rescore_query_weight: float = 1.0,
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """BM25 first pass + match_phrase second pass over the top
    ``window_size`` candidates. ``phrases`` maps query_id -> rescore phrase
    text (default: the query's own text, the classic ES
    "rescore with match_phrase" shape); queries with no phrase entry keep
    their primary ranking. The secondary score is the phrase-as-one-virtual-
    term BM25 of ``phrase_topk`` (global phrase df -> idf, tf = occurrence
    count). Returns (query_id, rank, doc_id, score) with ranks re-cut to
    ``params.top_k`` inside the rescored window.
    """
    from splade_ray.build import load_manifest
    from splade_ray.positions import _phrase_candidates, phrase_dfs
    from splade_ray.query import search

    params = params or BM25Params()
    if score_mode not in RESCORE_MODES:
        raise ValueError(f"unknown score_mode {score_mode!r} (expected {RESCORE_MODES})")
    if window_size < params.top_k:
        raise ValueError("window_size must be >= params.top_k")
    first = BM25Params(
        k1=params.k1, b=params.b, top_k=window_size, threshold=params.threshold
    )
    base = search(
        index_dir, queries, first, query_lang=query_lang, concurrency=concurrency
    )
    if phrases is None:
        phrases = dict(queries)
    phrase_list = [(int(qid), phrases[int(qid)]) for qid, _ in queries
                   if int(qid) in phrases]

    sec = pd.DataFrame(columns=["query_id", "doc_id", "sec_score"])
    cand = _phrase_candidates(
        index_dir, phrase_list, query_lang=query_lang,
        concurrency=concurrency, with_doc_len=True,
    ) if phrase_list else None
    if cand is not None and not base.empty:
        cand = cand.materialize()  # consumed twice: global df + window filter
        dfs = phrase_dfs(cand)
        if dfs:
            man = load_manifest(index_dir)
            n_docs, avgdl = man["n_docs"], man["avgdl"]
            w = {pid: idf(df, n_docs) for pid, df in dfs.items()}
            # broadcast the window's per-query doc sets (window-sized)
            window = {
                int(q): np.sort(g["doc_id"].to_numpy(np.int64))
                for q, g in base.groupby("query_id")
            }
            window_ref = ray.put(window)
            w_ref = ray.put(w)

            def score_window(batch: pa.Table) -> pa.Table:
                win = ray.get(window_ref)
                wts = ray.get(w_ref)
                pids = batch["phrase_id"].to_numpy(zero_copy_only=False)
                docs = batch["doc_id"].to_numpy(zero_copy_only=False)
                tf = batch["phrase_count"].to_numpy(zero_copy_only=False)
                dl = batch["doc_len"].to_numpy(zero_copy_only=False)
                keep = np.zeros(pids.size, bool)
                ws = np.zeros(pids.size, np.float64)
                for pid in np.unique(pids):  # few phrases, not rows
                    m = pids == pid
                    docset = win.get(int(pid))
                    if docset is not None:
                        keep[m] = np.isin(docs[m], docset, assume_unique=False)
                    ws[m] = wts.get(int(pid), 0.0)
                s = ws * tf_component(tf, dl, avgdl, params)
                return pa.table(
                    {
                        "query_id": pa.array(pids[keep]),
                        "doc_id": pa.array(docs[keep]),
                        "sec_score": pa.array(s[keep]),
                    }
                )

            sec = cand.map_batches(score_window, batch_format="pyarrow").to_pandas()

    out_cols = ["query_id", "rank", "doc_id", "score"]
    if base.empty:
        return pd.DataFrame(columns=out_cols).astype(
            {"query_id": np.int64, "rank": np.int64,
             "doc_id": np.int64, "score": np.float64}
        )
    m = base.merge(sec, how="left", on=["query_id", "doc_id"])
    matched = m["sec_score"].notna().to_numpy()
    prim = query_weight * m["score"].to_numpy(np.float64)
    s2 = rescore_query_weight * np.nan_to_num(m["sec_score"].to_numpy(np.float64))
    m["score"] = _combine(score_mode, prim, s2, matched)
    m = m.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True],
        kind="mergesort",
    )
    m["rank"] = m.groupby("query_id").cumcount() + 1
    m = m[m["rank"] <= params.top_k].reset_index(drop=True)
    m["rank"] = m["rank"].astype(np.int64)
    return m[out_cols]
