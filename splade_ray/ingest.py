"""Corpus ingest: canonical ordering + invariant verification.

Doc-id determinism (SURVEY.md §7 M0 / §4 'Ordering'): the reference's dense
ids come from a sequential counter over a fixed input order
(``transformer_evaluator.py:47-51``). Our build derives ids from (file
order, row offset) — deterministic for a given corpus *layout*. When the
layout itself is not canonical (files arrive in arbitrary order / sizes),
``canonicalize_corpus`` imposes a content-derived total order with ONE
explicit global sort by (repo, path, commit), written as partitioned
Parquet; ids assigned downstream by ``build_index`` are then invariant to
how the raw corpus was sharded. This is the engine's only full-data sort
and is deliberately separated from the build (run once per corpus drop).

``verify_sha_invariant`` re-checks the north rule's per-row content sha256
equality between a built index and its source corpus, streaming both sides.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data as rd

SORT_KEYS = ("repo", "path", "commit")


def canonicalize_corpus(
    corpus_paths: str | list[str],
    out_dir: str,
    *,
    sort_keys: tuple[str, ...] = SORT_KEYS,
    num_blocks: int | None = None,
) -> str:
    """Globally sort the corpus by ``sort_keys`` and write partitioned
    Parquet to ``out_dir``. The one all-to-all exchange of ingest; every
    later stage partitions on contiguous row ranges of this output."""
    ds = rd.read_parquet(corpus_paths)
    ds = ds.sort(list(sort_keys))
    if num_blocks:
        ds = ds.repartition(num_blocks)
    ds.write_parquet(out_dir)
    return out_dir


def _sha_batch(batch: pa.Table, *, text_col: str) -> pa.Table:
    shas = [
        hashlib.sha256((x or "").encode("utf-8")).hexdigest()
        for x in batch[text_col].to_pylist()
    ]
    return pa.table({"content_sha256": pa.array(shas, pa.string())})


def verify_sha_invariant(index_dir: str, corpus_paths: str | list[str] | None = None) -> dict:
    """Check the per-row content sha256 invariant of a built index.

    Two levels:
    - segment-level: each segment's stored per-doc ``content_sha256`` column
      rolls up (sha256 of concatenation, in doc order) to the manifest's
      ``content_sha_rollup`` — detects index corruption;
    - source-level (when ``corpus_paths`` given): the multiset of per-row
      sha256 over the source corpus equals the multiset stored in the index
      — detects lost/duplicated/mutated rows end to end.
    Returns a report dict; raises AssertionError on mismatch.
    """
    import json

    import pyarrow.parquet as pq

    from splade_ray.build import load_manifest, segment_dirs

    manifest = load_manifest(index_dir)
    n_checked = 0
    seg_shas: list[str] = []
    for seg in segment_dirs(index_dir):
        with open(os.path.join(seg, "manifest.json")) as fh:
            m = json.load(fh)
        col = pq.read_table(
            os.path.join(seg, "doclens.parquet"), columns=["content_sha256"]
        )["content_sha256"].to_pylist()
        rollup = hashlib.sha256("".join(col).encode()).hexdigest()
        assert rollup == m["content_sha_rollup"], f"segment rollup mismatch: {seg}"
        seg_shas.extend(col)
        n_checked += len(col)

    report = {"n_docs": n_checked, "segment_rollups_ok": True, "source_checked": False}
    if corpus_paths is not None:
        text_col = manifest["text_col"]
        src = rd.read_parquet(corpus_paths, columns=[text_col]).map_batches(
            _sha_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
        )
        src_counts = src.groupby("content_sha256").count().to_pandas()
        src_map = dict(zip(src_counts["content_sha256"], src_counts["count()"]))
        idx_map: dict[str, int] = {}
        for s in seg_shas:
            idx_map[s] = idx_map.get(s, 0) + 1
        assert src_map == idx_map, "source/index sha256 multiset mismatch"
        report["source_checked"] = True
    return report
