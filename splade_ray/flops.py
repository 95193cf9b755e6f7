"""FLOPS metric: expected per-query posting-overlap cost.

Mirrors ``splade/flops.py:16-28,55-60``: for each term t,
``p_d(t) = df_docs(t) / N_docs`` and ``p_q(t) = df_queries(t) / N_queries``
(document frequency = number of docs/queries *containing* t, the length of
the posting list — ``create_index_dist``, flops.py:24-28); the metric is
``FLOPS = Σ_t p_d(t) · p_q(t)``.

Ray-Data shape: one distributed ``groupby(term).count()`` over the document
postings (the doc-side index_dist); the query side is computed driver-side
(query sets are small — the reference uses 100k dev queries, still
driver-tractable as a dict) and the final dot product is a lexicon-sized
driver reduction, matching the reference's placement.
"""

from __future__ import annotations

import ray.data as rd

from splade_ray.analysis import postings_batch, term_counts


def doc_term_df(docs_ds: rd.Dataset, *, id_col: str = "doc_id", text_col: str = "text") -> rd.Dataset:
    """Distributed doc-side index_dist: (term, df)."""
    flat = docs_ds.map_batches(
        postings_batch,
        batch_format="pyarrow",
        batch_size=512,
        fn_kwargs={"id_col": id_col, "text_col": text_col},
    )
    return flat.groupby("term").count()


def flops_numerator(
    docs_ds: rd.Dataset,
    queries: list[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[int, int]:
    """(Σ_t df_d(t)·df_q(t), n_docs) — the exact integer form of the FLOPS
    metric (``flops_metric`` = numerator / (n_docs · n_queries)). Integer so
    it is reproducible regardless of float summation order; same in-pipeline
    query-term filter as ``flops_metric``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    q_df: dict[str, int] = {}
    for _, text in queries:
        for t in term_counts(text):
            q_df[t] = q_df.get(t, 0) + 1
    n_docs = docs_ds.count()
    if not n_docs or not q_df:
        return 0, int(n_docs)
    q_term_set = pa.array(sorted(q_df), pa.string())
    df_tbl = (
        doc_term_df(docs_ds, id_col=id_col, text_col=text_col)
        .map_batches(
            lambda b: b.filter(pc.is_in(b["term"], value_set=q_term_set)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    df_map = dict(zip(df_tbl["term"], df_tbl["count()"]))
    num = sum(int(df_map[t]) * qdf for t, qdf in q_df.items() if t in df_map)
    return int(num), int(n_docs)


def flops_metric(
    docs_ds: rd.Dataset,
    queries: list[tuple[int, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> float:
    """Σ_t (df_d(t)/N) · (df_q(t)/Q) over terms active on both sides.

    Only terms active on the QUERY side contribute, so the doc-side
    ``groupby(term).count()`` output is filtered to the query-term set
    *inside the pipeline* before reaching the driver — the driver never
    holds vocab-sized state (round-1 VERDICT item 2)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    q_df: dict[str, int] = {}
    for _, text in queries:
        for t in term_counts(text):  # distinct terms per query
            q_df[t] = q_df.get(t, 0) + 1
    n_q = len(queries)
    n_docs = docs_ds.count()
    if not n_docs or not n_q or not q_df:
        return 0.0
    q_term_set = pa.array(sorted(q_df), pa.string())
    df_tbl = (
        doc_term_df(docs_ds, id_col=id_col, text_col=text_col)
        .map_batches(
            lambda b: b.filter(pc.is_in(b["term"], value_set=q_term_set)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    df_map = dict(zip(df_tbl["term"], df_tbl["count()"]))
    return sum(
        (df_map[t] / n_docs) * (qdf / n_q) for t, qdf in q_df.items() if t in df_map
    )


def flops_from_index(index_dir: str, queries: list[tuple[int, str]]) -> dict:
    """FLOPS from a BUILT index — the reference's ``force_new=False`` reuse
    path (``splade/flops.py:48``: the finished index doubles as the
    statistics store, no corpus re-scan). Reads ONLY the lexicon rows of the
    query's terms (predicate-pushdown ``isin``) plus the global manifest, so
    cost is O(query vocabulary), independent of corpus size.

    Returns the integer-exact form plus the float metric:
    ``{"flops_num", "n_docs", "n_queries", "flops"}`` with
    ``flops = flops_num / (n_docs · n_queries)``."""
    import os

    import pyarrow.dataset as pads

    from splade_ray.build import load_manifest

    q_df: dict[str, int] = {}
    for _, text in queries:
        for t in term_counts(text):
            q_df[t] = q_df.get(t, 0) + 1
    manifest = load_manifest(index_dir)
    n_docs, n_q = int(manifest["n_docs"]), len(queries)
    if not n_docs or not q_df:
        return {"flops_num": 0, "n_docs": n_docs, "n_queries": n_q, "flops": 0.0}
    lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
        columns=["term", "df"],
        filter=pads.field("term").isin(sorted(q_df)),
    )
    df_map = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))
    num = sum(int(df_map[t]) * qdf for t, qdf in q_df.items() if t in df_map)
    return {
        "flops_num": int(num),
        "n_docs": n_docs,
        "n_queries": n_q,
        "flops": num / (n_docs * n_q),
    }
