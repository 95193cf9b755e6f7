"""Alternative-corpus adapters: BEIR and ir_datasets.

Mirrors the reference's multi-corpus entry points re-expressed as streaming
Ray Data reads:

- BEIR (``BeirDataset``, ``splade/datasets/datasets.py:101-122``; loaded via
  ``GenericDataLoader`` in ``splade/beir_eval.py:60``): on-disk layout is
  ``corpus.jsonl`` (``{_id, title, text}``), ``queries.jsonl``
  (``{_id, text}``) and ``qrels/<split>.tsv`` (``query-id \\t corpus-id \\t
  score``). The document text is ``title + " " + text`` exactly like the
  reference's ``value["title"] + " " + value["text"]``.
- ir_datasets (``IR_Dataset`` / ``IR_Dataset_NoLoad``,
  ``datasets.py:165-235``): gated behind an import-try — the package is not
  vendored; when present, documents stream through ``from_items`` batches
  instead of the reference's full-dict preload.

BEIR ids are external strings; the engine keeps external ids at the
boundary (SURVEY §1.3 invariant 3) — ``beir_corpus_to_parquet`` writes a
canonically _id-sorted Parquet corpus so ``build_index(id_col=None)``
assigns the same dense ids on every run/layout.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd


def read_beir_corpus(corpus_jsonl: str) -> rd.Dataset:
    """Stream a BEIR ``corpus.jsonl`` into ``(external_id, text)`` rows with
    ``text = title + " " + text`` (datasets.py:113-118)."""

    def fold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        title = pc.fill_null(batch["title"], "") if "title" in batch.column_names else pa.array([""] * batch.num_rows)
        text = pc.fill_null(batch["text"], "")
        joined = pc.utf8_trim_whitespace(
            pc.binary_join_element_wise(title, text, " ")
        )
        return pa.table(
            {
                "external_id": batch["_id"].cast(pa.string()),
                "text": joined,
            }
        )

    return rd.read_json(corpus_jsonl).map_batches(fold, batch_format="pyarrow")


def beir_corpus_to_parquet(corpus_jsonl: str, out_dir: str) -> str:
    """Canonicalize a BEIR corpus for indexing: one global sort by external
    id, written as Parquet; ``build_index(out_dir, id_col=None)`` then
    assigns layout-invariant dense ids (the J3 external↔dense boundary)."""
    ds = read_beir_corpus(corpus_jsonl).sort("external_id")
    ds.write_parquet(out_dir)
    return out_dir


def read_beir_queries(queries_jsonl: str) -> list[tuple[str, str]]:
    """``queries.jsonl`` → [(query_id, text)] (query sets are driver-sized
    in the reference too — retrieve.py:26-28)."""
    import json

    out = []
    with open(queries_jsonl) as fh:
        for line in fh:
            if not line.strip():
                continue
            row = json.loads(line)
            out.append((str(row["_id"]), row["text"]))
    return out


def read_beir_qrels(qrels_tsv: str) -> pd.DataFrame:
    """BEIR qrels TSV (header ``query-id corpus-id score``) → table
    (query_id, doc_id, rel) with string ids (external-id space)."""
    # the TSV has a header row, so dtype keys must be the column NAMES —
    # positional {0: str} keys would be silently ignored by pandas and the
    # ids would parse as int64, breaking the string external-id contract
    df = pd.read_csv(qrels_tsv, sep="\t", header=0)
    df.columns = ["query_id", "doc_id", "rel"]
    df["query_id"] = df["query_id"].astype(str)
    df["doc_id"] = df["doc_id"].astype(str)
    df["rel"] = df["rel"].astype(int)
    return df


def read_ir_dataset(name: str, *, batch_size: int = 4096) -> rd.Dataset:
    """Stream an ir_datasets corpus as ``(external_id, text)`` rows.

    The reference preloads every doc into a dict (``IR_Dataset.__init__``,
    datasets.py:171-186) or defers to ``docs_store`` lookups
    (``IR_Dataset_NoLoad``); here docs stream through ``from_items`` in
    bounded batches. Requires the optional ``ir_datasets`` package."""
    try:
        import ir_datasets
    except ImportError as e:  # pragma: no cover - exercised via stub in tests
        raise ImportError(
            "ir_datasets is not installed; the adapter is gated (SURVEY §2.1 S6)"
        ) from e

    import ray

    dataset = ir_datasets.load(name)
    schema = pa.schema([("external_id", pa.string()), ("text", pa.string())])

    def _chunk_table(ids: list[str], texts: list[str]) -> pa.Table:
        return pa.table({"external_id": ids, "text": texts}, schema=schema)

    # stream docs_iter() in batch_size-sized chunks: each chunk becomes one
    # Arrow block ray.put() into the object store immediately, so driver
    # memory is bounded by ONE chunk (the object store spills the rest) —
    # unlike the reference's full-dict preload (datasets.py:171-186)
    refs, ids, texts = [], [], []
    for doc in dataset.docs_iter():
        # mirrors the reference's field fold: everything after doc_id joined
        # (datasets.py:179-183 concatenates the non-id fields)
        ids.append(str(doc[0]))
        texts.append(" ".join(str(v) for v in tuple(doc)[1:]))
        if len(ids) >= batch_size:
            refs.append(ray.put(_chunk_table(ids, texts)))
            ids, texts = [], []
    if ids:
        refs.append(ray.put(_chunk_table(ids, texts)))
    if not refs:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow_refs(refs)
