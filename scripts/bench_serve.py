"""Serving-tier load bench: sustained QPS through RouterPool replicas
with a sliding in-flight window, hot-skewed query mix, request cache
on/off. Run alone (no concurrent Ray jobs); prints one JSON line.

Usage: python scripts/bench_serve.py [sf_dir]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow.parquet as pq
import ray


def drive(submit, batches, *, window: int = 32, duration_s: float = 8.0):
    """Fire requests round-robin keeping `window` in flight; returns
    (completed, shed, elapsed, p50_latency). ``submit`` maps one batch
    to an ObjectRef (endpoint-agnostic)."""
    from splade_ray.query import RouterOverloaded

    t0 = time.perf_counter()
    inflight: dict = {}
    done = shed = 0
    lats = []
    i = 0
    while True:
        now = time.perf_counter() - t0
        if now >= duration_s and not inflight:
            break
        while len(inflight) < window and now < duration_s:
            ref = submit(batches[i % len(batches)])
            inflight[ref] = time.perf_counter()
            i += 1
        ready, _ = ray.wait(list(inflight), num_returns=1,
                            timeout=0.05)
        for r in ready:
            t_sub = inflight.pop(r)
            try:
                ray.get(r)
                done += 1
                lats.append(time.perf_counter() - t_sub)
            except ray.exceptions.RayTaskError as e:
                if isinstance(e.cause, RouterOverloaded):
                    shed += 1
                else:
                    raise
    elapsed = time.perf_counter() - t0
    return done, shed, elapsed, (float(np.median(lats)) if lats else None)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    import tempfile

    from splade_ray.bm25 import BM25Params
    from splade_ray.build import build_index
    from splade_ray.query import RouterPool

    docs_path = os.path.join(sf_dir, "documents.parquet")
    n_docs = pq.read_metadata(docs_path).num_rows
    out = {"sf_dir": sf_dir, "num_cpus": cpus, "n_docs": n_docs}

    # hot-skewed mix: 4 hot query batches repeated + a long cold tail —
    # the realistic serving distribution where a request cache earns its
    # keep (ES request cache exists for exactly this)
    hot = [[(i, t)] for i, t in enumerate(
        ["data process stream", "model train corpus",
         "index query fast", "cache memory actor"])]
    cold = [[(100 + j, f"term{j} filter scan value")] for j in range(400)]
    rng = np.random.RandomState(7)
    mix = []
    for j in range(2000):
        mix.append(hot[j % 4] if rng.rand() < 0.8 else
                   cold[rng.randint(len(cold))])

    with tempfile.TemporaryDirectory(prefix="serve-") as td:
        idx = os.path.join(td, "index")
        build_index(docs_path, idx, text_col="text", id_col="doc_id",
                    rows_per_segment=max(1000, n_docs // 32),
                    extra_doc_cols=("lang",))
        from splade_ray.positions import build_positions

        build_positions(idx)  # phrase endpoint in the mixed leg
        p = BM25Params(top_k=10)

        for label, cache in (("uncached", 0), ("cached", 512)):
            pool = RouterPool(idx, n_routers=2, num_shards=8,
                              max_inflight=8, queue_cap=64, cache_size=cache)
            # warm actors (and, for the cached run, the hot entries)
            for b in hot:
                pool.search(b, p)
            done, shed, elapsed, p50 = drive(pool.submit, mix)
            st = pool.stats()
            out[f"qps_{label}"] = round(done / elapsed, 1)
            out[f"shed_{label}"] = shed
            out[f"p50_{label}_s"] = round(p50, 5) if p50 else None
            if cache:
                out["cache_hits"] = sum(
                    r["cache_hits"] for r in st["replicas"])
                out["cache_misses"] = sum(
                    r["cache_misses"] for r in st["replicas"])
            pool.shutdown()

        # heterogeneous-endpoint leg (round-5 serving tier): one cached
        # pool serving scoring + completion + fuzzy suggest + prefix +
        # facet counts + collapse concurrently under the same admission
        # window — the mixed traffic a real search box produces
        pool = RouterPool(idx, n_routers=2, num_shards=8,
                          max_inflight=8, queue_cap=64, cache_size=512)
        state = {"rr": 0}

        def submit_any(req):
            kind, payload = req
            r = pool.routers[state["rr"] % len(pool.routers)]
            state["rr"] += 1
            if kind == "search":
                return r.search.remote(payload, p)
            if kind == "complete":
                return r.suggest.remote(payload, kind="complete", m=5)
            if kind == "fuzzy":
                return r.suggest.remote(payload, kind="fuzzy",
                                        max_dist=1, m=4)
            if kind == "prefix":
                return r.prefix_search.remote(payload, p)
            if kind == "facet":
                return r.facet_search.remote(payload, kind="counts",
                                             facet_col="lang")
            if kind == "bool":
                return r.bool_search.remote(
                    [(qid, {"must": text.split()[0],
                            "should": " ".join(text.split()[1:])})
                     for qid, text in payload], p)
            if kind == "phrase":
                return r.phrase_topk.remote(payload, p)
            return r.collapse_search.remote(payload, collapse_col="lang",
                                            params=p)

        prefixes = [[(500 + j, pre)] for j, pre in enumerate(
            ["da", "mo", "in", "ca", "st", "fi"])]
        fuzz = [[(600 + j, w)] for j, w in enumerate(
            ["dataa", "modle", "indx", "cachee"])]
        kinds = ["search", "complete", "fuzzy", "prefix", "facet",
                 "collapse", "bool", "phrase"]
        mixed = []
        for j in range(2000):
            k = kinds[rng.randint(len(kinds))] if rng.rand() < 0.6 else "search"
            payload = (hot[j % 4]
                       if k in ("search", "facet", "collapse", "bool",
                                "phrase")
                       else prefixes[j % len(prefixes)] if k in ("complete", "prefix")
                       else fuzz[j % len(fuzz)])
            mixed.append((k, payload))
        for b in hot:
            pool.search(b, p)
        done, shed, elapsed, p50 = drive(submit_any, mixed)
        out["qps_mixed_cached"] = round(done / elapsed, 1)
        out["shed_mixed"] = shed
        out["p50_mixed_s"] = round(p50, 5) if p50 else None
        pool.shutdown()

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
