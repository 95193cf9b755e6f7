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
    from splade_ray.io import read_parquet_clean

    ds = read_parquet_clean(corpus_paths)
    ds = ds.sort(list(sort_keys))
    if num_blocks:
        ds = ds.repartition(num_blocks)
    ds.write_parquet(out_dir)
    return out_dir


def _sha_batch(batch: pa.Table, *, text_col: str) -> pa.Table:
    from splade_ray.codec import sha256_hex

    return pa.table({"content_sha256": pa.array(sha256_hex(batch[text_col]), pa.string())})


def _rollup_batch(batch: pa.Table) -> pa.Table:
    """Verify one or more segments' sha rollups (runs inside a Ray task).

    Reads each segment's own doclens column — per-task memory is bounded by
    one segment, never the corpus.
    """
    import json

    import pyarrow.parquet as pq

    segs, n_docs, ok = [], [], []
    for seg in batch["seg"].to_pylist():
        with open(os.path.join(seg, "manifest.json")) as fh:
            m = json.load(fh)
        col = pq.read_table(
            os.path.join(seg, "doclens.parquet"), columns=["content_sha256"]
        )["content_sha256"].to_pylist()
        rollup = hashlib.sha256("".join(col).encode()).hexdigest()
        segs.append(seg)
        n_docs.append(len(col))
        ok.append(rollup == m["content_sha_rollup"])
    return pa.table(
        {
            "seg": pa.array(segs, pa.string()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "ok": pa.array(ok, pa.bool_()),
        }
    )


def _tag_delta(batch: pa.Table, *, delta: int) -> pa.Table:
    return pa.table(
        {
            "content_sha256": batch["content_sha256"],
            "delta": pa.array([delta] * batch.num_rows, pa.int64()),
        }
    )


def verify_sha_invariant(index_dir: str, corpus_paths: str | list[str] | None = None) -> dict:
    """Check the per-row content sha256 invariant of a built index.

    Two levels, both fully distributed (driver state is bounded by the
    segment list the manifest already holds — never corpus cardinality):
    - segment-level: each segment's stored per-doc ``content_sha256`` column
      rolls up (sha256 of concatenation, in doc order) to the manifest's
      ``content_sha_rollup`` — one Ray task per segment, reduced to
      (total docs, #bad segments) — detects index corruption;
    - source-level (when ``corpus_paths`` given): the multiset of per-row
      sha256 over the source corpus equals the multiset stored in the index.
      Compared as a signed-count groupby: union source rows tagged +1 with
      index rows tagged -1, sum per sha, and stream-count nonzero sums —
      detects lost/duplicated/mutated rows end to end without ever
      materializing either multiset.
    Returns a report dict; raises AssertionError on mismatch.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from splade_ray.build import load_manifest, segment_dirs

    manifest = load_manifest(index_dir)
    segs = segment_dirs(index_dir)
    roll = rd.from_items(
        [{"seg": s} for s in segs], override_num_blocks=len(segs)
    ).map_batches(_rollup_batch, batch_format="pyarrow")
    agg = roll.map_batches(
        lambda b: pa.table(
            {"n_docs": b["n_docs"], "bad": pc.cast(pc.invert(b["ok"]), pa.int64())}
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("n_docs"), Sum("bad"))
    if agg["sum(bad)"]:
        bad = roll.map_batches(
            lambda b: b.filter(pc.invert(b["ok"])), batch_format="pyarrow"
        ).take(5)
        raise AssertionError(
            f"segment rollup mismatch ({agg['sum(bad)']} segments), e.g. "
            + ", ".join(r["seg"] for r in bad)
        )
    n_checked = int(agg["sum(n_docs)"] or 0)

    report = {"n_docs": n_checked, "segment_rollups_ok": True, "source_checked": False}
    if corpus_paths is not None:
        text_col = manifest["text_col"]
        from splade_ray.io import read_parquet_clean

        src = (
            read_parquet_clean(corpus_paths, columns=[text_col])
            .map_batches(
                _sha_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
            )
            .map_batches(_tag_delta, batch_format="pyarrow", fn_kwargs={"delta": 1})
        )
        idx_side = rd.read_parquet(
            [os.path.join(s, "doclens.parquet") for s in segs],
            columns=["content_sha256"],
        ).map_batches(_tag_delta, batch_format="pyarrow", fn_kwargs={"delta": -1})
        diff = src.union(idx_side).groupby("content_sha256").sum("delta")
        n_bad = diff.map_batches(
            lambda b: b.filter(pc.not_equal(b["sum(delta)"], 0)),
            batch_format="pyarrow",
        ).count()
        assert n_bad == 0, (
            f"source/index sha256 multiset mismatch: {n_bad} distinct shas differ"
        )
        report["source_checked"] = True
    return report
