"""Routing-partitioned index: the ES ``_routing`` / shard-key contract.

The reference searches one monolithic index per run (its retrieval
loop loads a single sparse matrix, ``splade/tasks/transformer_evaluator.py:90-134``);
production engines shard. A routed build hash-partitions the corpus by a routing column into
``n_buckets`` bucket directories (ONE Ray Data pass, hive-partitioned
Parquet write) and builds one standard index per non-empty bucket. A
routed search computes the target buckets driver-side from the given
routing values and fans out ONLY to those bucket indexes — fan-out and
I/O are bounded by the routed bucket set, not the corpus, exactly like an
ES query with ``routing=`` hitting one shard instead of all of them.

Pinned semantics (SQL-mirrorable): ``routed_search(queries, routing=vs)``
= BM25 top-k over EXACTLY the docs whose routing value hashes into the
probed bucket set, under the probed scope's own union statistics (df /
avgdl over the probed buckets — the federated ``search_multi`` stats
union). Note the ES subtlety is preserved: routing selects *buckets*, it
does not filter docs, so a routed query CAN see same-bucket docs with a
different routing value.

The bucket hash is the repo-wide SQL-mirrorable form (first 8 bytes of
sha256, big-endian — ``ops.textstats.hash_token``):
``('0x' || substr(sha256(v), 1, 16))::UBIGINT % n`` in DuckDB.

Scale shape: the partition pass is one streaming map + hive write (docs
move once); per-bucket builds are independent (parallel, resumable —
each is a standard segment-checkpointed ``build_index``). At 10^12 files
the bucket count bounds routed-query fan-out while segments-per-bucket
bound build-task grain; a skewed routing key only skews bucket SIZE,
never a shuffle (there is no groupby — the write partitions by value).

Routed builds REQUIRE an explicit id column: hive partitioning reorders
rows, so positional doc-id assignment would not be stable.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from splade_ray.bm25 import BM25Params

ROUTING_MANIFEST = "routing.json"


def routing_bucket(values, n_buckets: int) -> np.ndarray:
    """Bucket ids for an array of routing values: first 8 bytes of
    sha256(value) big-endian, mod n_buckets. Hashes each DISTINCT value
    once (routing keys are low-cardinality by design)."""
    arr = np.asarray([str(v) for v in values], object)
    uniq, inv = np.unique(arr, return_inverse=True)
    hs = np.array(
        [int.from_bytes(hashlib.sha256(u.encode()).digest()[:8], "big") % n_buckets
         for u in uniq],
        np.int64,
    )
    return hs[inv]


def bucket_sql_expr(col_expr: str, n_buckets: int) -> str:
    """DuckDB mirror of :func:`routing_bucket` for one value expression."""
    return (f"(('0x' || substr(sha256({col_expr}), 1, 16))::UBIGINT "
            f"% {n_buckets})")


def _bucket_dir(index_root: str, bucket: int) -> str:
    return os.path.join(index_root, f"bucket={bucket:05d}")


def load_routing(index_root: str) -> dict:
    with open(os.path.join(index_root, ROUTING_MANIFEST)) as fh:
        return json.load(fh)


def build_routed_index(
    corpus_paths: str | list[str],
    index_root: str,
    *,
    routing_col: str,
    n_buckets: int,
    text_col: str = "content",
    id_col: str = "doc_id",
    rows_per_segment: int = 50_000,
    extra_doc_cols: tuple[str, ...] = (),
    concurrency: int | None = None,
) -> dict:
    """Partition the corpus by hash(routing_col) and build one index per
    non-empty bucket under ``index_root/bucket=NNNNN/index``. Returns the
    routing manifest. Re-running skips the partition pass when the
    partitioned corpus already exists and resumes per-bucket builds
    segment-by-segment (the standard build_index checkpoint contract)."""
    from splade_ray.build import build_index
    from splade_ray.io import read_parquet_clean

    if id_col is None:
        raise ValueError("routed builds need an explicit id column "
                         "(hive partitioning reorders rows)")
    os.makedirs(index_root, exist_ok=True)
    part_dir = os.path.join(index_root, "corpus")
    if not os.path.isdir(part_dir) or not os.listdir(part_dir):
        def add_bucket(batch: pa.Table) -> pa.Table:
            b = routing_bucket(
                batch[routing_col].to_pylist(), n_buckets
            )
            return batch.append_column("_rbucket", pa.array(b, pa.int64()))

        tmp = part_dir + ".tmp"
        (
            read_parquet_clean(corpus_paths)
            .map_batches(add_bucket, batch_format="pyarrow")
            .write_parquet(tmp, partition_cols=["_rbucket"])
        )
        os.rename(tmp, part_dir)

    buckets = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(part_dir)
        if d.startswith("_rbucket=")
    )
    manifests = {}
    for b in buckets:
        src = os.path.join(part_dir, f"_rbucket={b}")
        manifests[b] = build_index(
            src, os.path.join(_bucket_dir(index_root, b), "index"),
            text_col=text_col, id_col=id_col,
            rows_per_segment=rows_per_segment,
            extra_doc_cols=extra_doc_cols, concurrency=concurrency,
        )
    routing = {
        "routing_col": routing_col,
        "n_buckets": n_buckets,
        "buckets": buckets,
        "n_docs": int(sum(m["n_docs"] for m in manifests.values())),
    }
    tmp = os.path.join(index_root, "." + ROUTING_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(routing, fh, indent=1)
    os.replace(tmp, os.path.join(index_root, ROUTING_MANIFEST))
    return routing


def routed_search(
    index_root: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    routing: list[str] | None = None,
    method: str = "exact",
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """BM25 top-k over the buckets selected by the routing values (all
    buckets when ``routing`` is None — the ES un-routed broadcast),
    federated under the probed scope's union statistics. Returns
    (query_id, rank, bucket, doc_id, score) sorted by (query_id, rank).
    Only the probed buckets' directories are ever opened."""
    from splade_ray.multi import search_multi

    params = params or BM25Params()
    manifest = load_routing(index_root)
    have = manifest["buckets"]
    if routing is None:
        probe = list(have)
    else:
        wanted = sorted(
            set(routing_bucket(routing, manifest["n_buckets"]).tolist())
        )
        probe = [b for b in wanted if b in have]
    if not probe:
        return pd.DataFrame(
            columns=["query_id", "rank", "bucket", "doc_id", "score"]
        ).astype({"query_id": np.int64, "rank": np.int32,
                  "bucket": np.int64, "doc_id": np.int64,
                  "score": np.float64})
    dirs = [os.path.join(_bucket_dir(index_root, b), "index") for b in probe]
    run = search_multi(
        dirs, queries, params, method=method, query_lang=query_lang,
        concurrency=concurrency,
    )
    run = run.copy()
    run["bucket"] = np.array(probe, np.int64)[run["index"].to_numpy(np.int64)]
    return run[["query_id", "rank", "bucket", "doc_id", "score"]]


def maintain_routed(
    index_root: str,
    *,
    max_segments: int = 64,
    purge: bool = False,
) -> dict:
    """Maintenance across a routed index: tier-compact every bucket down
    to at most ``max_segments`` segments (``purge=True`` fuses tombstone
    removal into the rewrite — each bucket is a standard index, so this
    is the plain maintain loop applied per bucket; buckets are
    independent, so a crash resumes bucket-by-bucket). Returns
    {bucket: {n_segments_before, n_segments}}."""
    import math

    from splade_ray.build import load_manifest
    from splade_ray.compact import compact_segments
    from splade_ray.delete import purge_deletes

    reports: dict[int, dict] = {}
    for b in load_routing(index_root)["buckets"]:
        idx = os.path.join(_bucket_dir(index_root, b), "index")
        m = load_manifest(idx)
        n = m["n_segments"]
        if n > max_segments:
            group = math.ceil(n / max_segments)
            m = compact_segments(idx, group_size=group, purge=purge)
        elif purge:
            m = purge_deletes(idx)
        reports[b] = {"n_segments_before": n, "n_segments": m["n_segments"]}
    return reports
