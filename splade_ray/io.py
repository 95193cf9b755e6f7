"""Readers / writers for the reference's interchange formats.

- TSV collection (``id \\t text``): the reference's corpus format
  (``CollectionDatasetPreLoad``, ``splade/datasets/datasets.py:65-98`` —
  split on tab, first field is the id, extra tabs joined back, newlines
  already stripped by line framing). Ours streams through ``read_text``
  instead of preloading a dict.
- run.json: nested ``{q_id(str): {doc_id(str): score}}``
  (``transformer_evaluator.py:147,172-173,186-188``).
- trec-tsv qrel → qrel.json (``splade/utils/processing_trec_eval.py:10-19``).
- Anserini export: docs JSONL ``{id, content, vector:{term: int}}`` and
  queries TSV with each term repeated ``freq`` times
  (``EncodeAnserini.index``, ``transformer_evaluator.py:214-247``; empty
  docs get a filler token, ``:235-239``).
"""

from __future__ import annotations

import json
import os
from collections import defaultdict

import pandas as pd
import pyarrow as pa
import ray.data as rd

EMPTY_DOC_FILLER = "a"  # analog of the reference's [unused993] filler token


def stub_fsspec_http() -> None:
    """Make Ray Data's ``fsspec.implementations.http`` probe deterministic.

    Every read/write path probes ``from fsspec.implementations.http import
    HTTPFileSystem`` (ray.data path_util._is_http_filesystem). In this env
    fsspec is present but aiohttp is not, so the probe fails — and a FAILED
    import is not cached, so two pipelines probing CONCURRENTLY (the
    overlapped dedup writes) race the partially-initialized module: one
    thread gets ``ImportError: cannot import name`` instead of
    ``ModuleNotFoundError`` and Ray's narrow except lets it crash the write.
    Registering a stub module with a never-instantiated HTTPFileSystem class
    makes every probe succeed cheaply; isinstance checks against it are
    False for all real filesystems, which is the correct semantics (no http
    filesystem exists here). Idempotent."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401

        return  # real import works; nothing to do
    except ImportError:
        pass
    import sys
    import types

    mod = types.ModuleType("fsspec.implementations.http")
    mod.HTTPFileSystem = type("HTTPFileSystem", (), {})
    sys.modules["fsspec.implementations.http"] = mod


def strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Zero-copy drop of schema-level metadata. Parquet files written by
    pandas attach a ``b'pandas'`` metadata blob; a ``pa.Schema`` carrying ANY
    metadata is unhashable, which makes Ray Data's per-batch schema
    deduplication log ``Failed to hash the schemas`` on every block concat.
    Stripping once at the read boundary keeps every downstream schema
    hashable."""
    return batch.replace_schema_metadata(None)


def read_parquet_clean(paths, *, columns=None, **kwargs) -> rd.Dataset:
    """``read_parquet`` + ``strip_schema_metadata`` — the standard corpus
    read entry; see ``strip_schema_metadata`` for why."""
    ds = rd.read_parquet(paths, columns=columns, **kwargs)
    return ds.map_batches(
        strip_schema_metadata,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def read_tsv_collection(path: str) -> rd.Dataset:
    """Stream a reference-style TSV collection into (id:int64, text:string).

    Tab-separated; fields beyond the second are joined back with a space,
    mirroring ``datasets.py:82-88``."""

    def parse(batch: pa.Table) -> pa.Table:
        ids, texts = [], []
        for line in batch["text"].to_pylist():
            if not line:
                continue
            parts = line.split("\t")
            ids.append(int(parts[0]))
            texts.append(" ".join(parts[1:]))
        return pa.table({"id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})

    return rd.read_text(path).map_batches(parse, batch_format="pyarrow")


def run_to_nested(run: pd.DataFrame) -> dict:
    """Run table (query_id, rank, doc_id, score) → the reference's nested
    run dict shape, rank order preserved by insertion order."""
    out: dict[str, dict[str, float]] = defaultdict(dict)
    for q, _, d, s in run.sort_values(["query_id", "rank"])[
        ["query_id", "rank", "doc_id", "score"]
    ].itertuples(index=False):
        out[str(int(q))][str(int(d))] = float(s)
    return dict(out)


def write_run_json(run: pd.DataFrame, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        json.dump(run_to_nested(run), fh)


def read_run_json(path: str) -> pd.DataFrame:
    """run.json → run table; rank re-derived by (score desc, doc_id asc)."""
    with open(path) as fh:
        nested = json.load(fh)
    rows = [
        (int(q), int(d), float(s)) for q, docs in nested.items() for d, s in docs.items()
    ]
    df = pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])
    df = df.sort_values(["query_id", "score", "doc_id"], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    return df[["query_id", "rank", "doc_id", "score"]].reset_index(drop=True)


def read_trec_run(path: str, top_k: int | None = None) -> pd.DataFrame:
    """TREC 6-column run file (``qid Q0 docid rank score tag``,
    whitespace-separated) → run table, optionally capped at top_k — the
    reference's rerank-input reader (``splade/datasets/rerank.py:37-54``:
    splits on whitespace, keeps ``position <= top_k``)."""
    rows = []
    with open(path) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) < 6:
                continue
            qid, _, did, rank, score = parts[0], parts[1], parts[2], int(parts[3]), float(parts[4])
            if top_k is not None and rank > top_k:
                continue
            rows.append((int(qid), rank, int(did), score))
    df = pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
    return df.sort_values(["query_id", "rank"]).reset_index(drop=True)


def write_trec_run(run: pd.DataFrame, path: str, tag: str = "splade_ray") -> None:
    """Run table → TREC 6-column format."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        for q, r, d, s in run.sort_values(["query_id", "rank"])[
            ["query_id", "rank", "doc_id", "score"]
        ].itertuples(index=False):
            fh.write(f"{int(q)} Q0 {int(d)} {int(r)} {s} {tag}\n")


def trec_qrel_to_json(qrel_path: str, out_path: str | None = None) -> dict:
    """trec-tsv qrel (``q_id \\t _ \\t d_id \\t rel``) → nested qrel dict,
    optionally written as qrel.json next to the input
    (processing_trec_eval.py:10-19)."""
    nested: dict[str, dict[str, int]] = defaultdict(dict)
    with open(qrel_path) as fh:
        for line in fh:
            if not line.strip():
                continue
            q_id, _, d_id, rel = line.rstrip("\n").split("\t")
            nested[q_id][d_id] = int(rel)
    nested = dict(nested)
    if out_path is None:
        out_path = os.path.join(os.path.dirname(qrel_path) or ".", "qrel.json")
    with open(out_path, "w") as fh:
        json.dump(nested, fh)
    return nested


def qrel_to_table(nested: dict) -> pd.DataFrame:
    rows = [
        (int(q), int(d), int(r)) for q, docs in nested.items() for d, r in docs.items()
    ]
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "rel"])


def anserini_doc_rows(
    docs_ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    params=None,
    factor: int = 100,
    stats: dict | None = None,
    include_content: bool = False,
    df_mode: str = "broadcast",
) -> rd.Dataset:
    """One row per document ``(id, vector_json[, content])`` in the Anserini
    JSONL vector shape, quantized BM25 impacts as the weights. Every doc
    gets a row; docs whose vector is empty get the filler token
    (transformer_evaluator.py:235-239). Consume with ``write_json`` /
    ``write_parquet`` for the on-disk artifact.

    ``include_content=True`` adds the reference interchange format's
    ``content`` field (transformer_evaluator.py:241); the default omits it
    to keep the export narrow — the artifact is then NOT directly
    Anserini-ingestible without re-joining the text.

    df flows mirror ``prune.quantized_impacts``: ``"broadcast"`` is a
    doc-local single pass with the vocab-sized df map shipped once via
    ``ray.put`` (bounded vocabularies); ``"join"`` computes impacts through
    a term-keyed hash join and re-groups per doc — no vocab-sized driver
    state, for corpora whose identifier vocabulary grows with the corpus."""
    import numpy as np
    import ray

    from splade_ray.analysis import term_frequency_table
    from splade_ray.bm25 import BM25Params, idf_bulk, tf_component
    from splade_ray.prune import _df_lookup, global_term_stats

    params = params or BM25Params()
    if df_mode == "join":
        return _anserini_doc_rows_join(
            docs_ds, params=params, factor=factor,
            id_col=id_col, text_col=text_col, include_content=include_content,
        )
    ctx_ref = ray.put(stats or global_term_stats(docs_ds, id_col=id_col, text_col=text_col))

    def fold(batch: pa.Table) -> pa.Table:
        ctx = ray.get(ctx_ref)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tf_tbl, doc_lens = term_frequency_table(batch[text_col])
        rows = tf_tbl["row"].to_numpy(zero_copy_only=False)
        tfs = tf_tbl["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        terms = tf_tbl["term"].to_pylist()
        dl = doc_lens[rows].astype(np.float64)
        w = idf_bulk(_df_lookup(tf_tbl["term"], ctx["df"]), ctx["n"])
        q = np.floor(w * tf_component(tfs, dl, ctx["avgdl"], params) * factor + 0.5).astype(np.int64)
        vecs: list[dict[str, int]] = [{} for _ in doc_ids]
        for r, t, v in zip(rows, terms, q):
            if v > 0:
                vecs[r][t] = int(v)
        out_json = [
            json.dumps(v if v else {EMPTY_DOC_FILLER: 1}, sort_keys=True) for v in vecs
        ]
        cols = {
            "id": pa.array(doc_ids, pa.int64()),
            "vector_json": pa.array(out_json, pa.string()),
        }
        if include_content:
            cols["content"] = batch[text_col]
        return pa.table(cols)

    return docs_ds.map_batches(fold, batch_format="pyarrow", batch_size=1024)


def _anserini_doc_rows_join(
    docs_ds: rd.Dataset,
    *,
    params,
    factor: int,
    id_col: str,
    text_col: str,
    include_content: bool,
) -> rd.Dataset:
    """Join-path Anserini export: term-keyed impacts → per-doc fold →
    left-outer join back to the doc-id spine so empty/fully-pruned docs
    still get their filler row."""
    import pandas as pd

    from splade_ray.prune import quantized_impacts

    imp = quantized_impacts(
        docs_ds, params, factor, id_col=id_col, text_col=text_col, df_mode="join"
    )

    def fold_group(group: pd.DataFrame) -> pd.DataFrame:
        vec = dict(
            sorted(zip(group["term"], (int(v) for v in group["impact_q"])))
        )
        return pd.DataFrame(
            {"id": [int(group["doc_id"].iloc[0])],
             "vector_json": [json.dumps(vec, sort_keys=True)]}
        )

    folded = imp.groupby("doc_id").map_groups(fold_group, batch_format="pandas")

    spine_cols = [id_col] + ([text_col] if include_content else [])

    def spine_batch(batch: pa.Table) -> pa.Table:
        cols = {"id": batch[id_col].cast(pa.int64())}
        if include_content:
            cols["content"] = batch[text_col]
        return pa.table(cols)

    spine = docs_ds.select_columns(spine_cols).map_batches(
        spine_batch, batch_format="pyarrow"
    )
    from splade_ray.prune import join_partitions

    joined = spine.join(
        folded, join_type="left_outer", num_partitions=join_partitions(None),
        on=("id",),
    )

    def fill(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        filler = json.dumps({EMPTY_DOC_FILLER: 1})
        vj = pc.fill_null(batch["vector_json"], filler)
        cols = {"id": batch["id"], "vector_json": vj}
        if include_content:
            cols["content"] = batch["content"]
        return pa.table(cols)

    return joined.map_batches(fill, batch_format="pyarrow")


def anserini_query_line(query_id: int, term_freqs: dict[str, int]) -> str:
    """One Anserini impact-query TSV line: term repeated freq times
    (transformer_evaluator.py:243-247)."""
    body = " ".join(" ".join([t] * int(f)) for t, f in sorted(term_freqs.items()))
    return f"{query_id}\t{body}"


def term_vectors(
    corpus_paths: str | list[str],
    doc_ids: list[int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str | None = None,
) -> pd.DataFrame:
    """Per-doc term vectors (doc_id, term, tf, positions) — the Lucene
    TermVectors API analog (per-document view of the index the reference
    never exposes; its vectors live only inside the HDF5 eval dump,
    transformer_evaluator.py:208-218). ``positions`` is the comma-joined
    ascending 1-based token ordinals of the term's occurrences.

    Recomputed from the corpus with the pushdown ``isin`` fetch (Lucene
    likewise stores term vectors beside the docs, not in the postings —
    reconstructing from a term-major index would decode every posting).
    The candidate set is API-sized (a handful of docs), so the per-doc
    Python loop below is not a hot path. Sorted by (doc_id, term)."""
    from splade_ray.analysis import tokenize
    from splade_ray.snippets import fetch_texts

    pdf = fetch_texts(corpus_paths, doc_ids, id_col=id_col, text_col=text_col)
    rows: list[tuple[int, str, int, str]] = []
    for did, text in zip(pdf[id_col], pdf[text_col]):
        pos: dict[str, list[int]] = {}
        for i, t in enumerate(tokenize(text or "", lang), start=1):
            pos.setdefault(t, []).append(i)
        for t in sorted(pos):
            rows.append(
                (int(did), t, len(pos[t]), ",".join(str(p) for p in pos[t]))
            )
    out = pd.DataFrame(rows, columns=["doc_id", "term", "tf", "positions"])
    return out.sort_values(["doc_id", "term"]).reset_index(drop=True).astype(
        {"doc_id": "int64", "tf": "int64"}
    )
