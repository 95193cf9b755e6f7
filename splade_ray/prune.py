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


def global_term_stats(
    docs_ds: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """The broadcastable side of BM25 quantization: per-term df (lexicon-
    sized), N and avgdl — NO per-doc state (doc lengths are re-derived
    batch-locally by consumers; a per-doc map would not broadcast at 1e12
    rows)."""
    from ray.data.aggregate import Count, Sum

    kw = {"id_col": id_col, "text_col": text_col}
    agg = (
        docs_ds.map_batches(doc_stats_batch, batch_format="pyarrow", batch_size=512, fn_kwargs=kw)
        .aggregate(Count(alias_name="n"), Sum("n_tokens", alias_name="sum_dl"))
    )
    n_docs = int(agg["n"])
    avgdl = (agg["sum_dl"] or 0) / max(n_docs, 1)
    flat = docs_ds.map_batches(postings_batch, batch_format="pyarrow", batch_size=512, fn_kwargs=kw)
    df_counts = flat.groupby("term").count().to_pandas()
    df_map = dict(zip(df_counts["term"], df_counts["count()"]))
    return {"df": df_map, "n": n_docs, "avgdl": avgdl}


def quantized_impacts(
    docs_ds: rd.Dataset,
    params: BM25Params | None = None,
    factor: int = QUANT_FACTOR,
    stats: dict | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """(doc_id, term, impact_q) with impact_q = round_half_up(idf·tf_comp·factor) > 0.

    Doc-local single pass over the streaming documents table: tf and doc
    length come from the batch itself; only the lexicon-sized df map + (N,
    avgdl) are broadcast (``ray.put`` once)."""
    from splade_ray.analysis import term_frequency_table

    params = params or BM25Params()
    ctx_ref = ray.put(stats or global_term_stats(docs_ds, id_col=id_col, text_col=text_col))

    def quantize(batch: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tf_tbl, doc_lens = term_frequency_table(batch[text_col])
        rows = tf_tbl["row"].to_numpy(zero_copy_only=False)
        tf = tf_tbl["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        terms = tf_tbl["term"].to_pylist()
        dl = doc_lens[rows].astype(np.float64)
        w = np.array([bm25_idf(ctx["df"][t], ctx["n"]) for t in terms], np.float64)
        impact = w * tf_component(tf, dl, ctx["avgdl"], params)
        q = np.floor(impact * factor + 0.5).astype(np.int64)
        keep = q > 0
        out = pa.table(
            {
                "doc_id": pa.array(doc_ids[rows][keep], pa.int64()),
                "term": pa.array([t for t, k in zip(terms, keep) if k], pa.string()),
                "impact_q": pa.array(q[keep], pa.int64()),
            }
        )
        # hash-group output is doc-scattered; keep each doc's rows contiguous
        # inside the block so doc-local consumers (prune_by_size, the
        # Anserini fold) can process whole blocks safely
        return out.sort_by([("doc_id", "ascending"), ("term", "ascending")])

    return docs_ds.map_batches(quantize, batch_format="pyarrow", batch_size=1024)


def prune_by_value(impacts: rd.Dataset, threshold: float, factor: int = QUANT_FACTOR) -> rd.Dataset:
    """Keep postings with impact_q > threshold*factor (prune_doc_index.py:12-14)."""
    cut = threshold * factor

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch["impact_q"], pa.scalar(cut)))

    return impacts.map_batches(flt, batch_format="pyarrow", batch_size=8192)


def prune_by_size(impacts: rd.Dataset, size: int) -> rd.Dataset:
    """Per-doc top-`size` terms by impact desc, tie term asc
    (prune_doc_index.py:17-19). Doc-local: processes whole upstream blocks
    (``batch_size=None``) so a doc's postings — contiguous within their
    block by construction — are never split across batches."""

    def topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["doc_id", "impact_q", "term"], ascending=[True, False, True])
        df = df.groupby("doc_id", sort=False).head(size)
        return pa.Table.from_pandas(df, preserve_index=False)

    return impacts.map_batches(topk, batch_format="pyarrow", batch_size=None)


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
