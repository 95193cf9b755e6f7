"""RAG pipeline: chunk → index → chunk-level BM25 → parent-ranked docs.

The composition every retrieval-augmented system runs over long
documents (the reference instead truncates to ``max_length`` and ranks
whole docs): split each document into overlapping token windows
(``ops.chunk``), index the CHUNKS as first-class docs with their parent
id riding as a doc-values column, score queries against chunks, and rank
parents by aggregating their matching chunks' scores — exactly the
ToParentBlockJoin contract ``docvalues.block_join_search`` already
implements, so the parent step reuses that kernel unchanged.

Chunk ids are ``doc_id · CHUNK_BASE + chunk_id`` (deterministic, join-free
parent recovery; documents must have < CHUNK_BASE chunks). Every stage
streams: chunking is a flat map, the index build is the standard
segment-checkpointed one, and the parent reduce is aggregate-sized.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

from splade_ray.bm25 import BM25Params

CHUNK_BASE = 100_000


def build_chunk_index(
    corpus_paths,
    index_dir: str,
    *,
    size: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    rows_per_segment: int = 50_000,
    concurrency=None,
) -> dict:
    """Chunk the corpus and build the chunk-level index (chunk_uid =
    doc_id·CHUNK_BASE + chunk_id as the external id, parent doc id as a
    doc-values column). Returns the index manifest. The chunked parquet
    persists beside the index (``<index_dir>/chunks``), so rebuilding
    resumes both stages."""
    from splade_ray.build import build_index
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.chunk import chunk_texts

    os.makedirs(index_dir, exist_ok=True)
    chunks_dir = os.path.join(index_dir, "chunks")
    if not os.path.isdir(chunks_dir) or not os.listdir(chunks_dir):
        def add_ids(batch: pa.Table) -> pa.Table:
            import numpy as np

            ids = batch[id_col].to_numpy(zero_copy_only=False).astype("int64")
            cid = batch["chunk_id"].to_numpy(zero_copy_only=False)
            if cid.size and int(cid.max()) >= CHUNK_BASE:
                raise ValueError(f"document has >= {CHUNK_BASE} chunks")
            uid = ids * CHUNK_BASE + cid
            batch = batch.append_column("chunk_uid", pa.array(uid, pa.int64()))
            return batch.append_column(
                "parent", pa.array([str(i) for i in ids], pa.string())
            )

        tmp = chunks_dir + ".tmp"
        (
            chunk_texts(
                read_parquet_clean(corpus_paths, columns=[id_col, text_col]),
                size=size, overlap=overlap,
                text_col=text_col, id_col=id_col,
            )
            .map_batches(add_ids, batch_format="pyarrow")
            .write_parquet(tmp)
        )
        os.rename(tmp, chunks_dir)
    return build_index(
        chunks_dir, os.path.join(index_dir, "index"),
        text_col="chunk", id_col="chunk_uid",
        rows_per_segment=rows_per_segment,
        extra_doc_cols=("parent",), concurrency=concurrency,
    )


def rag_search_chunks(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    concurrency=None,
) -> pd.DataFrame:
    """Chunk-level retrieval with payloads — the frame a RAG system feeds
    its generator: the top-k CHUNKS per query (plain BM25 over the chunk
    index) with their parent doc id and text. Chunk texts are fetched with
    a predicate-pushdown ``isin`` read of the persisted chunk parquet
    (k·queries candidate ids — only row groups containing candidates leave
    storage, the rerank_input pattern). Returns
    (query_id, rank, doc_id, chunk_id, score, chunk)."""
    import pyarrow.dataset as pads

    from splade_ray.query import search

    params = params or BM25Params()
    run = search(os.path.join(index_dir, "index"), queries, params,
                 concurrency=concurrency)
    if run.empty:
        return pd.DataFrame(
            columns=["query_id", "rank", "doc_id", "chunk_id", "score",
                     "chunk"]
        )
    cand = sorted(set(run["doc_id"].tolist()))
    tbl = pads.dataset(os.path.join(index_dir, "chunks")).to_table(
        columns=["chunk_uid", "doc_id", "chunk_id", "chunk"],
        filter=pads.field("chunk_uid").isin(cand),
    ).to_pandas()
    out = run.merge(tbl.rename(columns={"chunk_uid": "doc_id",
                                        "doc_id": "parent_doc"}),
                    on="doc_id", how="left")
    out = out.rename(columns={"doc_id": "chunk_uid"})
    out["doc_id"] = out["parent_doc"].astype("int64")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)[
        ["query_id", "rank", "doc_id", "chunk_id", "score", "chunk"]
    ]


def rag_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    score_mode: str = "max",
    top_k: int = 10,
    concurrency=None,
) -> pd.DataFrame:
    """Parent-ranked retrieval over a chunk index: parents = documents,
    children = their chunks, parent score aggregates ALL matching chunks
    (block-join semantics — ``score_mode`` ∈ max|sum|min|avg|count).
    Returns (query_id, rank, parent, score, n_children); ``n_children``
    = the doc's matching-chunk count."""
    from splade_ray.docvalues import block_join_search

    return block_join_search(
        os.path.join(index_dir, "index"), queries, params,
        parent_col="parent", score_mode=score_mode, top_k=top_k,
        concurrency=concurrency,
    )


def has_parent_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    score_mode: str = "max",
    parent_top_k: int = 10,
    parents_run: pd.DataFrame | None = None,
    concurrency=None,
) -> pd.DataFrame:
    """ES ``has_parent`` query over the chunk layer — the symmetric face
    of :func:`rag_search` (which is ``has_child``/ToParentBlockJoin): the
    parent-side query ranks parents by block-join aggregation, and every
    CHILD chunk of a top parent comes back carrying its parent's
    aggregated score and rank (ES ``score=true``: children inherit the
    parent score). Children are fetched with ONE predicate-pushdown isin
    read over the persisted chunk parquet — (top parents × their chunk
    counts) rows, never the corpus.

    ``parents_run`` injects an external parent ranking frame
    (query_id, rank, parent, score, ...) in place of the internal
    ``rag_search`` call — the injectable-candidates pattern
    (sigterms.significant_terms(fg_run=...)) that lets callers supply a
    tie-stable ranking. Returns (query_id, parent_rank, parent,
    parent_score, chunk_id, chunk) ordered by (query_id, parent_rank,
    chunk_id)."""
    import pyarrow.dataset as pads

    cols = ["query_id", "parent_rank", "parent", "parent_score",
            "chunk_id", "chunk"]
    parents = (parents_run if parents_run is not None else rag_search(
        index_dir, queries, params, score_mode=score_mode,
        top_k=parent_top_k, concurrency=concurrency))
    if parents.empty:
        return pd.DataFrame(columns=cols)
    pids = sorted({int(p) for p in parents["parent"]})
    tbl = pads.dataset(os.path.join(index_dir, "chunks")).to_table(
        columns=["doc_id", "chunk_id", "chunk"],
        filter=pads.field("doc_id").isin(pids),
    ).to_pandas()
    tbl["parent"] = tbl["doc_id"].astype(str)
    score_col = "score" if "score" in parents.columns else "parent_score"
    rank_col = "rank" if "rank" in parents.columns else "parent_rank"
    out = parents.rename(columns={rank_col: "parent_rank",
                                  score_col: "parent_score"}).merge(
        tbl[["parent", "chunk_id", "chunk"]], on="parent", how="inner")
    return out.sort_values(
        ["query_id", "parent_rank", "chunk_id"]).reset_index(drop=True)[cols]
