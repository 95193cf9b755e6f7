"""Query-time synonym expansion with Lucene SynonymQuery scoring.

The reference scores literal analyzed terms only
(``transformer_evaluator.py:162-168``); production engines expand a query
term into its synonym group at query time and score the group AS ONE TERM
so documents aren't double-rewarded for containing several spellings.
Lucene's SynonymQuery (public semantics, pinned here):

- per document, the group's term frequency is the SUM of the member terms'
  tfs;
- the group's document frequency (for idf) is the MAX of the member terms'
  dfs (SynonymQuery builds its TermStatistics with ``docFreq = max``,
  ``totalTermFreq = sum``);
- BM25 saturation applies to the summed tf — NOT per member — so the score
  is ``idf(max_df) * qtf * tf_sat(sum_tf)``.

Group membership is defined over ANALYZED terms (the synonym map's keys and
values must be single analyzer-output tokens; multi-token entries raise).
A member absent from the lexicon simply drops out of its group; a group
with no present member contributes nothing.

Scale shape: identical to :func:`splade_ray.query.search` — the prepared
group table (queries x groups, driver-tiny) broadcasts via ``ray.put``;
scoring is segment-local over the union of member postings (dense fold of
member tfs per group, one scatter-add per member); <= top_k rows per query
leave each segment; the driver merge is the standard k-sized
``merge_topk`` groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores
from splade_ray.build import load_manifest
from splade_ray.query import RUN_COLUMNS, SegmentIndex, merge_topk


def _analyzed_single(token: str, query_lang: str | None) -> str:
    toks = sorted(term_counts(token, query_lang))
    if len(toks) != 1:
        raise ValueError(
            f"synonym map entries must analyze to exactly one token; "
            f"{token!r} -> {toks}"
        )
    return toks[0]


def prepare_synonym_queries(
    index_dir: str,
    queries: list[tuple[int, str]],
    synonyms: dict[str, list[str]],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
) -> dict:
    """Driver-side prep: tokenize, expand each analyzed query term into its
    synonym group, look up per-member dfs from the lexicon (pushdown), and
    pin the group weight = idf(max member df). Returns the broadcastable
    prepared dict; ``queries`` maps qid -> [(members tuple, qtf, weight)]."""
    import os

    import pyarrow.dataset as pads

    params = params or BM25Params()
    manifest = load_manifest(index_dir)
    n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]
    syn_map = {
        _analyzed_single(k, query_lang): sorted(
            {_analyzed_single(s, query_lang) for s in v}
        )
        for k, v in synonyms.items()
    }
    tokenized = {int(qid): term_counts(text, query_lang) for qid, text in queries}
    groups: dict[str, tuple[str, ...]] = {}
    for c in tokenized.values():
        for t in c:
            members = tuple(sorted({t, *syn_map.get(t, ())}))
            groups[t] = members
    all_terms = sorted({m for ms in groups.values() for m in ms})
    dfs: dict[str, int] = {}
    if all_terms:
        lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
            columns=["term", "df"], filter=pads.field("term").isin(all_terms)
        )
        dfs = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))
    prepared_queries: dict[int, list[tuple[tuple[str, ...], int, float]]] = {}
    for qid, c in tokenized.items():
        entries = []
        for t in sorted(c):
            present = tuple(m for m in groups[t] if m in dfs)
            if not present:
                continue
            df_g = max(dfs[m] for m in present)  # Lucene: docFreq = max
            entries.append((present, int(c[t]), idf(df_g, n_docs)))
        prepared_queries[qid] = entries
    return {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "params": params,
        "queries": prepared_queries,
        "terms": sorted({m for es in prepared_queries.values() for ms, _, _ in es
                         for m in ms}),
    }


def _score_segment_synonyms(
    seg: SegmentIndex, prepared: dict
) -> list[tuple[int, int, float]]:
    """Exact per-segment kernel: per group, fold member tfs into one dense
    tf array (SynonymQuery's summed freq), saturate once, scatter-add."""
    p: BM25Params = prepared["params"]
    avgdl = prepared["avgdl"]
    n = seg.doc_ids.size
    rows: list[tuple[int, int, float]] = []
    for qid, entries in prepared["queries"].items():
        scores = np.zeros(n, np.float64)
        hit = False
        for members, qtf, w in entries:
            tf_fold = np.zeros(n, np.int64)
            for m in members:
                pos, tfs = seg.pos_tfs(m)
                if pos.size:
                    tf_fold[pos] += tfs
            mpos = np.flatnonzero(tf_fold)
            if mpos.size == 0:
                continue
            hit = True
            scores[mpos] += (w * qtf) * tf_component(
                tf_fold[mpos], seg.doc_lens[mpos], avgdl, p
            )
        if not hit:
            continue
        docs, scs = topk_from_scores(seg.doc_ids, scores, p.top_k, p.threshold)
        rows.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
    return rows


def synonym_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    synonyms: dict[str, list[str]],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """Top-k retrieval with query-time synonym groups scored as single
    terms (Lucene SynonymQuery). Returns the standard run table."""
    import ray.data as rd

    from splade_ray.build import segment_dirs
    from splade_ray.delete import load_tombstones

    params = params or BM25Params()
    prepared = prepare_synonym_queries(
        index_dir, queries, synonyms, params, query_lang=query_lang
    )
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    segs = segment_dirs(index_dir)

    def task(batch: pa.Table) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        rows: list[tuple[int, int, float]] = []
        for seg_dir in batch["seg_dir"].to_pylist():
            seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
            rows.extend(_score_segment_synonyms(seg, prep))
        return pa.table(
            {
                "query_id": pa.array(np.array([r[0] for r in rows], np.int64)),
                "doc_id": pa.array(np.array([r[1] for r in rows], np.int64)),
                "score": pa.array(np.array([r[2] for r in rows], np.float64)),
            }
        )

    pdf = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", batch_size=1,
                     concurrency=concurrency)
        .to_pandas()
    )
    if pdf.empty:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64,
             "score": np.float64}
        )
    out = (
        pdf.groupby("query_id", group_keys=False)[pdf.columns]
        .apply(merge_topk, top_k=params.top_k)
        .reset_index(drop=True)
    )
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)[RUN_COLUMNS]
