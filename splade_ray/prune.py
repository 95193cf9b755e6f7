"""Index pruning transforms over flat quantized-impact postings.

Reference semantics (mirrored exactly, re-expressed as Ray Data stages):

- ``quantized_impacts``: the Anserini-style impact quantization
  ``np.rint(value * quantization_factor)`` keeping values > 0
  (``splade/tasks/transformer_evaluator.py:228-235``; factor 100 per
  ``README.md:177-183``), with BM25 idf·tf as the value in place of the
  learned rep.
- ``prune_by_value``: keep ``value > threshold * factor``
  (``pruning/prune_doc_index.py:12-14``). Stateless filter — doc-local.
- ``prune_by_size``: per-doc top-k terms by value desc
  (``pruning/prune_doc_index.py:17-19``). Doc-local, no shuffle.
- ``prune_by_term_quantile``: two-pass global prune — per-term
  ``np.quantile(values, q)`` threshold, then keep ``value > threshold[term]``
  (``pruning/prune_quantile.py:40-43,14-16``). Pass 1 is the one wide step
  (groupby term); pass 2 broadcasts the lexicon-sized threshold table via
  ``ray.put`` instead of a shuffle join (J4 in SURVEY.md §2.4).

All values are quantized int64 impacts, so threshold comparisons are exact
and reproducible across engines (the DuckDB oracle uses ``quantile_cont``,
which matches ``np.quantile``'s default linear interpolation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from splade_ray.analysis import doc_stats_batch, postings_batch
from splade_ray.bm25 import BM25Params, idf as bm25_idf, tf_component

QUANT_FACTOR = 100


def collection_stats(
    docs_ds: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Collection-level BM25 context: doc lengths, per-term df, N, avgdl.

    The df map is lexicon-sized (small side) and the dl map is one int per
    doc; both are broadcast via ``ray.put`` by callers. At 100 TB the dl map
    would instead live as a per-segment doclens file (as the index build
    does, splade_ray/build.py) — this helper serves the standalone flat-
    postings transforms."""
    kw = {"id_col": id_col, "text_col": text_col}
    stats_df = (
        docs_ds.map_batches(doc_stats_batch, batch_format="pyarrow", batch_size=512, fn_kwargs=kw)
        .select_columns(["doc_id", "n_tokens"])
        .to_pandas()
    )
    n_docs = len(stats_df)
    avgdl = stats_df["n_tokens"].sum() / max(n_docs, 1)
    dl_map = dict(zip(stats_df["doc_id"], stats_df["n_tokens"]))
    flat = docs_ds.map_batches(postings_batch, batch_format="pyarrow", batch_size=512, fn_kwargs=kw)
    df_counts = flat.groupby("term").count().to_pandas()
    df_map = dict(zip(df_counts["term"], df_counts["count()"]))
    return {"df": df_map, "dl": dl_map, "n": n_docs, "avgdl": avgdl}


def quantized_impacts(
    docs_ds: rd.Dataset,
    params: BM25Params | None = None,
    factor: int = QUANT_FACTOR,
    stats: dict | None = None,
) -> rd.Dataset:
    """(doc_id, term, impact_q) with impact_q = round_half_up(idf·tf_comp·factor) > 0."""
    params = params or BM25Params()
    ctx_ref = ray.put(stats or collection_stats(docs_ds))

    def quantize(batch: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        terms = batch["term"].to_pylist()
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = np.array([ctx["dl"][d] for d in doc_ids], np.float64)
        w = np.array([bm25_idf(ctx["df"][t], ctx["n"]) for t in terms], np.float64)
        impact = w * tf_component(tf, dl, ctx["avgdl"], params)
        q = np.floor(impact * factor + 0.5).astype(np.int64)
        keep = q > 0
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep], pa.int64()),
                "term": pa.array([t for t, k in zip(terms, keep) if k], pa.string()),
                "impact_q": pa.array(q[keep], pa.int64()),
            }
        )

    flat = docs_ds.map_batches(postings_batch, batch_format="pyarrow", batch_size=512)
    return flat.map_batches(quantize, batch_format="pyarrow", batch_size=4096)


def prune_by_value(impacts: rd.Dataset, threshold: float, factor: int = QUANT_FACTOR) -> rd.Dataset:
    """Keep postings with impact_q > threshold*factor (prune_doc_index.py:12-14)."""
    cut = threshold * factor

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch["impact_q"], pa.scalar(cut)))

    return impacts.map_batches(flt, batch_format="pyarrow", batch_size=8192)


def prune_by_size(impacts: rd.Dataset, size: int) -> rd.Dataset:
    """Per-doc top-`size` terms by impact desc, tie term asc
    (prune_doc_index.py:17-19). Requires doc-local batches (postings for one
    doc never straddle a batch — true for the analyzer output, which emits a
    doc's postings contiguously inside one batch)."""

    def topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["doc_id", "impact_q", "term"], ascending=[True, False, True])
        df = df.groupby("doc_id", sort=False).head(size)
        return pa.Table.from_pandas(df, preserve_index=False)

    return impacts.map_batches(topk, batch_format="pyarrow", batch_size=8192)


def term_quantile_thresholds(impacts: rd.Dataset, quantile: float) -> pd.DataFrame:
    """Pass 1 of the quantile prune: per-term np.quantile over all impact
    values (exact, like the reference's full-gather — prune_quantile.py:40-43).
    Output is lexicon-sized: (term, threshold)."""

    def q_group(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "term": [group["term"].iloc[0]],
                "threshold": [float(np.quantile(group["impact_q"].to_numpy(np.float64), quantile))],
            }
        )

    return impacts.groupby("term").map_groups(q_group, batch_format="pandas").to_pandas()


def prune_by_term_quantile(impacts: rd.Dataset, quantile: float) -> rd.Dataset:
    """Two-pass global prune: keep impact_q > per-term quantile threshold
    (prune_quantile.py:14-16 — strict >)."""
    thresholds = term_quantile_thresholds(impacts, quantile)
    thr_ref = ray.put(dict(zip(thresholds["term"], thresholds["threshold"])))

    def flt(batch: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        vals = batch["impact_q"].to_numpy(zero_copy_only=False).astype(np.float64)
        cuts = np.array([thr[t] for t in batch["term"].to_pylist()], np.float64)
        return batch.filter(pa.array(vals > cuts))

    return impacts.map_batches(flt, batch_format="pyarrow", batch_size=8192)
