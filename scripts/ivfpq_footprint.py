"""Measure the IVF vs IVF-PQ on-disk footprint and probe latency on the
sf embeddings table — the evidence row for BASELINE.md's ANN section.

Usage: python scripts/ivfpq_footprint.py [sf_dir]
Prints one JSON line: bytes on disk for the raw-vector IVF layout vs the
uint8-codes IVF-PQ layout, and warm p50 probe latency for each at the
same nprobe.
"""

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_bytes(path: str) -> int:
    total = 0
    for dp, _, fs in os.walk(path):
        for f in fs:
            total += os.path.getsize(os.path.join(dp, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.ann import ivf_build, ivf_search, ivfpq_build, ivfpq_search

    import pyarrow as pa
    import pyarrow.parquet as pq

    emb = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(emb, columns=["vec_id", "embedding"])
    qmat = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[:8])
    q_ids = np.arange(8, dtype=np.int64)

    work = "/tmp/splade-ray-ivfpq-footprint"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    # tile the sf embeddings x MULT with fresh ids + small deterministic
    # jitter so the footprint comparison runs at a meaningful vector count
    MULT = 100
    base = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
    n0, d = base.shape
    rng = np.random.RandomState(7)
    big_dir = os.path.join(work, "emb")
    os.makedirs(big_dir)
    for j in range(MULT):
        jit = base + rng.normal(size=(n0, d)) * 0.01
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(
                        np.arange(j * n0, (j + 1) * n0, dtype=np.int64)
                    ),
                    "embedding": pa.array(jit.tolist()),
                }
            ),
            os.path.join(big_dir, f"part-{j:03d}.parquet"),
        )
    ds = read_parquet_clean(big_dir, columns=["vec_id", "embedding"])
    ivf_dir = os.path.join(work, "ivf")
    pq_dir = os.path.join(work, "ivfpq")
    ivf_build(ds, ivf_dir, n_clusters=16)
    ivfpq_build(ds, pq_dir, n_clusters=16, m=8, ks=256, residual=True)

    def p50(fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn().to_pandas()
            ts.append(time.monotonic() - t0)
        return float(np.median(ts))

    lat_ivf = p50(lambda: ivf_search(ivf_dir, q_ids, qmat, nprobe=4, top_k=10))
    lat_pq = p50(lambda: ivfpq_search(pq_dir, q_ids, qmat, nprobe=4, top_k=10))
    out = {
        "sf": sf_dir,
        "n_vectors": int(n0 * MULT),
        "ivf_bytes": dir_bytes(ivf_dir),
        "ivfpq_bytes": dir_bytes(pq_dir),
        "bytes_ratio": round(dir_bytes(ivf_dir) / dir_bytes(pq_dir), 2),
        "ivf_probe_p50_s": round(lat_ivf, 4),
        "ivfpq_probe_p50_s": round(lat_pq, 4),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
