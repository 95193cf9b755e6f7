"""Micro-bench for the round-4 second-session operators (BASELINE audit
lines): containment sketch face, sharded ExactSubstr rewrite, router
request cache. Run alone (no concurrent Ray jobs); prints one JSON line.

Usage: python scripts/bench_round4b.py [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    docs_path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.read_metadata(docs_path).num_rows
    out: dict = {"sf_dir": sf_dir, "num_cpus": cpus, "n_docs": n_docs}

    from splade_ray.io import read_parquet_clean

    # --- containment sketch face (complete-sketch exact regime) ---------
    from splade_ray.ops.dedup import containment_sketch_pairs

    t0 = time.perf_counter()
    n_pairs = containment_sketch_pairs(
        read_parquet_clean(docs_path, columns=["doc_id", "text"]),
        k=5, min_containment=0.75, emit_counts=True).count()
    dt = time.perf_counter() - t0
    out["containment_sketch_s"] = round(dt, 3)
    out["containment_sketch_docs_per_s"] = round(n_docs / dt)
    out["containment_sketch_pairs"] = int(n_pairs)

    # --- sketched regime (the 100-TB shape: bottom-32 probes) -----------
    t0 = time.perf_counter()
    n_pairs_sk = containment_sketch_pairs(
        read_parquet_clean(docs_path, columns=["doc_id", "text"]),
        k=5, sketch_k=32, min_containment=0.75, emit_counts=True).count()
    dt = time.perf_counter() - t0
    out["containment_sketch32_s"] = round(dt, 3)
    out["containment_sketch32_docs_per_s"] = round(n_docs / dt)
    out["containment_sketch32_pairs"] = int(n_pairs_sk)

    # --- sharded ExactSubstr rewrite vs broadcast rewrite ---------------
    from splade_ray.ops.curation import (
        drop_duplicated_spans,
        drop_duplicated_spans_sharded,
    )

    t0 = time.perf_counter()
    rows_b = drop_duplicated_spans(
        read_parquet_clean(docs_path, columns=["doc_id", "text"]),
        k=10).count()
    dt_b = time.perf_counter() - t0
    out["dupspans_rewrite_broadcast_s"] = round(dt_b, 3)
    out["dupspans_rewrite_broadcast_docs_per_s"] = round(n_docs / dt_b)

    import tempfile

    with tempfile.TemporaryDirectory(prefix="dsr-") as wd:
        t0 = time.perf_counter()
        rows_s = drop_duplicated_spans_sharded(
            read_parquet_clean(docs_path, columns=["doc_id", "text"]),
            wd, k=10, n_shards=8).count()
        dt_s = time.perf_counter() - t0
    out["dupspans_rewrite_sharded8_s"] = round(dt_s, 3)
    out["dupspans_rewrite_sharded8_docs_per_s"] = round(n_docs / dt_s)
    assert rows_b == rows_s == n_docs, (rows_b, rows_s, n_docs)

    # --- router request cache: hot-hit vs fan-out p50 -------------------
    from splade_ray.bm25 import BM25Params
    from splade_ray.build import build_index
    from splade_ray.query import QueryRouter

    with tempfile.TemporaryDirectory(prefix="rc-") as td:
        idx = os.path.join(td, "index")
        build_index(docs_path, idx, text_col="text", id_col="doc_id",
                    rows_per_segment=max(1000, n_docs // 32))
        qs = [(i, t) for i, t in enumerate(
            ["data process stream", "model train corpus", "index query fast",
             "shuffle partition block", "cache memory actor"])]
        p = BM25Params(top_k=10)

        def p50(router, reps=30):
            lats = []
            for _ in range(reps):
                t0 = time.perf_counter()
                ray.get(router.search.remote(qs, p))
                lats.append(time.perf_counter() - t0)
            return float(np.median(lats))

        r_cold = QueryRouter.remote(idx, num_shards=8)
        ray.get(r_cold.search.remote(qs, p))  # warm actors
        out["router_uncached_p50_s"] = round(p50(r_cold), 5)
        ray.get(r_cold.shutdown.remote()); ray.kill(r_cold)

        r_hot = QueryRouter.remote(idx, num_shards=8, cache_size=64)
        ray.get(r_hot.search.remote(qs, p))  # populate
        out["router_cache_hit_p50_s"] = round(p50(r_hot), 5)
        st = ray.get(r_hot.stats.remote())
        out["router_cache_hits"] = st["cache_hits"]
        assert st["cache_misses"] == len(qs)
        ray.get(r_hot.shutdown.remote()); ray.kill(r_hot)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
