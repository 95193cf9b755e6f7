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

Rounding note: quantization uses ``floor(x*factor + 0.5)`` (round half UP) —
a deliberate divergence from the reference's ``np.rint`` (half-to-even,
``transformer_evaluator.py:229``) chosen so the DuckDB oracle's ``round()``
matches bit-for-bit. Exact .5 ties therefore differ from the reference by
one quantization unit; everything else is identical.

df scaling note: two data flows for the per-term df needed by idf —
``global_term_stats`` broadcasts a vocab-sized dict (right for bounded
natural-language vocabularies), while ``quantized_impacts(df_mode="join")``
replaces the broadcast with a term-keyed hash join (right for unbounded
identifier vocabularies, e.g. a 1e12-file code corpus, where the dict would
grow with the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from splade_ray.analysis import doc_stats_batch, postings_batch, postings_with_dl_batch
from splade_ray.bm25 import BM25Params, idf_bulk, tf_component

QUANT_FACTOR = 100


def collection_scalars(
    docs_ds: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[int, float]:
    """(n_docs, avgdl) — two scalars, the only driver-side state the
    quantizer ever needs regardless of corpus size."""
    from ray.data.aggregate import Count, Sum

    kw = {"id_col": id_col, "text_col": text_col}
    agg = (
        docs_ds.map_batches(doc_stats_batch, batch_format="pyarrow", batch_size=512, fn_kwargs=kw)
        .aggregate(Count(alias_name="n"), Sum("n_tokens", alias_name="sum_dl"))
    )
    n_docs = int(agg["n"])
    avgdl = (agg["sum_dl"] or 0) / max(n_docs, 1)
    return n_docs, avgdl


def global_term_stats(
    docs_ds: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """The broadcastable side of BM25 quantization: per-term df (lexicon-
    sized), N and avgdl — NO per-doc state (doc lengths are re-derived
    batch-locally by consumers; a per-doc map would not broadcast at 1e12
    rows). The df dict itself is vocab-sized: fine for bounded vocabularies,
    use ``df_mode="join"`` when vocabulary grows with the corpus."""
    kw = {"id_col": id_col, "text_col": text_col}
    n_docs, avgdl = collection_scalars(docs_ds, **kw)
    flat = docs_ds.map_batches(postings_batch, batch_format="pyarrow", batch_size=512, fn_kwargs=kw)
    df_counts = flat.groupby("term").count().to_pandas()
    df_map = dict(zip(df_counts["term"], df_counts["count()"]))
    return {"df": df_map, "n": n_docs, "avgdl": avgdl}


def join_partitions(requested: int | None = None) -> int:
    """Pick a hash-join partition count that cannot deadlock the streaming
    executor: Ray's join aggregator actors reserve 0.125 CPU per partition,
    so cap partitions at 2x the cluster CPU count (≤ 1/4 of the CPU budget
    per join) unless the caller sized it explicitly for their cluster."""
    if requested is not None:
        return requested
    cpus = 4.0
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU", 4.0)
    return max(2, min(16, int(cpus) * 2))


def _df_lookup(terms: pa.Array | pa.ChunkedArray, df_map: dict) -> np.ndarray:
    """Vectorized term→df: dictionary-encode so the Python dict is probed
    once per *unique* term in the batch, not once per posting row."""
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    enc = terms.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    df_uniq = np.array([df_map[t] for t in uniq], np.float64)
    return df_uniq[enc.indices.to_numpy(zero_copy_only=False)]


def quantized_impacts(
    docs_ds: rd.Dataset,
    params: BM25Params | None = None,
    factor: int = QUANT_FACTOR,
    stats: dict | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_mode: str = "broadcast",
    df_ds: rd.Dataset | None = None,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """(doc_id, term, impact_q) with impact_q = round_half_up(idf·tf_comp·factor) > 0.

    Two df data flows (see module docstring):

    - ``df_mode="broadcast"``: doc-local single pass; tf and doc length come
      from the batch itself; only the lexicon-sized df map + (N, avgdl) are
      broadcast (``ray.put`` once). Output blocks keep each doc's rows
      contiguous (doc-local consumers may rely on it).
    - ``df_mode="join"``: no vocab-sized driver state anywhere — flat
      ``(term, doc_id, tf, dl)`` rows hash-join a ``(term, df)`` dataset on
      ``term``. ``df_ds`` defaults to a groupby over the same flat rows; pass
      the built index's lexicon (``read_parquet(lexicon_dir)``, columns
      ``term, df``) to skip that pass. Output is TERM-scattered: doc-local
      consumers must use their exact/shuffled variants
      (``prune_by_size(exact=True)``).
    """
    params = params or BM25Params()
    if df_mode == "join":
        return _quantized_impacts_join(
            docs_ds, params, factor,
            id_col=id_col, text_col=text_col, df_ds=df_ds,
            num_partitions=num_partitions,
        )
    from splade_ray.analysis import term_frequency_table

    ctx_ref = ray.put(stats or global_term_stats(docs_ds, id_col=id_col, text_col=text_col))

    def quantize(batch: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tf_tbl, doc_lens = term_frequency_table(batch[text_col])
        rows = tf_tbl["row"].to_numpy(zero_copy_only=False)
        tf = tf_tbl["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = doc_lens[rows].astype(np.float64)
        w = idf_bulk(_df_lookup(tf_tbl["term"], ctx["df"]), ctx["n"])
        impact = w * tf_component(tf, dl, ctx["avgdl"], params)
        q = np.floor(impact * factor + 0.5).astype(np.int64)
        keep = q > 0
        out = pa.table(
            {
                "doc_id": pa.array(doc_ids[rows][keep], pa.int64()),
                "term": tf_tbl["term"].filter(pa.array(keep)),
                "impact_q": pa.array(q[keep], pa.int64()),
            }
        )
        # hash-group output is doc-scattered; keep each doc's rows contiguous
        # inside the block so doc-local consumers (prune_by_size, the
        # Anserini fold) can process whole blocks safely
        return out.sort_by([("doc_id", "ascending"), ("term", "ascending")])

    return docs_ds.map_batches(quantize, batch_format="pyarrow", batch_size=1024)


def _quantized_impacts_join(
    docs_ds: rd.Dataset,
    params: BM25Params,
    factor: int,
    *,
    id_col: str,
    text_col: str,
    df_ds: rd.Dataset | None,
    num_partitions: int,
) -> rd.Dataset:
    """The unbounded-vocabulary path: term-keyed hash join instead of a
    vocab-sized broadcast (VERDICT round-1 item 2)."""
    kw = {"id_col": id_col, "text_col": text_col}
    n_docs, avgdl = collection_scalars(docs_ds, **kw)
    flat = docs_ds.map_batches(
        postings_with_dl_batch, batch_format="pyarrow", batch_size=1024, fn_kwargs=kw
    )
    if df_ds is None:
        df_ds = (
            docs_ds.map_batches(
                postings_batch, batch_format="pyarrow", batch_size=512, fn_kwargs=kw
            )
            .groupby("term")
            .count()
            .rename_columns({"count()": "df"})
        )
    else:
        df_ds = df_ds.select_columns(["term", "df"])
    joined = flat.join(
        df_ds, join_type="inner", num_partitions=join_partitions(num_partitions),
        on=("term",),
    )

    def quantize(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        impact = idf_bulk(dfv, n_docs) * tf_component(tf, dl, avgdl, params)
        q = np.floor(impact * factor + 0.5).astype(np.int64)
        keep = pa.array(q > 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"].filter(keep),
                "term": batch["term"].filter(keep),
                "impact_q": pa.array(q[q > 0], pa.int64()),
            }
        )

    return joined.map_batches(quantize, batch_format="pyarrow", batch_size=8192)


def prune_by_value(impacts: rd.Dataset, threshold: float, factor: int = QUANT_FACTOR) -> rd.Dataset:
    """Keep postings with impact_q > threshold*factor (prune_doc_index.py:12-14)."""
    cut = threshold * factor

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater(batch["impact_q"], pa.scalar(cut)))

    return impacts.map_batches(flt, batch_format="pyarrow", batch_size=8192)


def prune_by_size(impacts: rd.Dataset, size: int, *, exact: bool = False) -> rd.Dataset:
    """Per-doc top-`size` terms by impact desc, tie term asc
    (prune_doc_index.py:17-19).

    Default (``exact=False``) is doc-local: processes whole upstream blocks
    (``batch_size=None``) and RELIES on each doc's postings being contiguous
    within one block — true straight out of ``quantized_impacts``'s
    broadcast path, NOT true after any re-batching stage or the join path.
    ``exact=True`` is layout-independent: the block-local top-k still runs
    first as a safe combiner (a doc's global top-k rows are a subset of the
    union of its per-block top-ks), then an exact per-doc selection over the
    ~size-rows-per-doc remainder via a doc_id-keyed shuffle."""

    def topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["doc_id", "impact_q", "term"], ascending=[True, False, True])
        df = df.groupby("doc_id", sort=False).head(size)
        return pa.Table.from_pandas(df, preserve_index=False)

    fast = impacts.map_batches(topk, batch_format="pyarrow", batch_size=None)
    if not exact:
        return fast

    def g_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(
            ["impact_q", "term"], ascending=[False, True]
        ).head(size)

    return fast.groupby("doc_id").map_groups(g_topk, batch_format="pandas")


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
