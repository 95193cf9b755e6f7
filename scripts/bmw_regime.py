"""BMW-vs-exact crossover measurement (ROADMAP #1 / round-1 VERDICT #9).

Synthesizes single segments of controlled size and term-frequency profile
(vectorized — no per-doc Python, so 1M+ doc segments build in seconds),
then times ``score_exact`` vs ``score_bmw`` per query class directly on a
loaded ``SegmentIndex`` — no Ray overhead, warm decoded caches, p50 over
repetitions. The output table is recorded in BASELINE.md and sets the
``score_auto`` regime constants in ``splade_ray/query.py``.

Query classes:
- selective: single rare term (df ≤ 3) — BMW's best case
- medium:    two mid-df terms (df ≈ 1% of docs)
- mixed:     one rare + one ubiquitous term — the skip-test stress case
- dense:     two ubiquitous terms (df ≈ 60% of docs) — exact's best case

Usage: python scripts/bmw_regime.py [size ...]   (default 50k 200k 1M)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splade_ray.bm25 import BM25Params, idf
from splade_ray.query import SegmentIndex
from splade_ray.segments import POSTINGS_SCHEMA, encode_posting
from splade_ray.wand import score_segment_bmw

WORK = "/tmp/splade_ray_work/bmw_regime"


def synth_segment(n_docs: int, seed: int = 7) -> str:
    """Build one segment dir (postings.parquet + doclens.parquet) with a
    controlled df profile; cached on disk per size."""
    seg_dir = os.path.join(WORK, f"seg-{n_docs}")
    if os.path.exists(os.path.join(seg_dir, "postings.parquet")):
        return seg_dir
    os.makedirs(seg_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    terms: list[tuple[str, np.ndarray, np.ndarray]] = []
    for i in range(30):  # ubiquitous terms, df = 60%
        df = int(n_docs * 0.6)
        docs = np.sort(rng.choice(n_docs, df, replace=False)).astype(np.int64)
        terms.append((f"common{i:02d}", docs, rng.randint(1, 6, df).astype(np.int64)))
    for i in range(500):  # medium terms, df = 1%
        df = max(2, int(n_docs * 0.01))
        docs = np.sort(rng.choice(n_docs, df, replace=False)).astype(np.int64)
        terms.append((f"medium{i:03d}", docs, rng.randint(1, 4, df).astype(np.int64)))
    for i in range(200):  # rare terms, df <= 3
        df = int(rng.randint(1, 4))
        docs = np.sort(rng.choice(n_docs, df, replace=False)).astype(np.int64)
        terms.append((f"rare{i:03d}", docs, rng.randint(1, 3, df).astype(np.int64)))
    doc_lens = np.zeros(n_docs, np.int64)
    for _, docs, tfs in terms:
        np.add.at(doc_lens, docs, tfs)
    doc_lens = np.maximum(doc_lens, 1)
    rows = {name: [] for name in POSTINGS_SCHEMA.names}
    for term, docs, tfs in sorted(terms):
        enc = encode_posting(docs, tfs, doc_lens[docs])
        rows["term"].append(term)
        for k, v in enc.items():
            rows[k].append(v)
    pq.write_table(pa.table(rows, schema=POSTINGS_SCHEMA),
                   os.path.join(seg_dir, "postings.parquet"))
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(n_docs), pa.int64()),
                  "doc_len": pa.array(doc_lens, pa.int64())}),
        os.path.join(seg_dir, "doclens.parquet"),
    )
    with open(os.path.join(seg_dir, "stats.json"), "w") as fh:
        json.dump({"n_docs": n_docs, "avgdl": float(doc_lens.mean())}, fh)
    return seg_dir


def make_prepared(seg_dir: str, queries: dict[int, list[str]], p: BM25Params) -> dict:
    with open(os.path.join(seg_dir, "stats.json")) as fh:
        st = json.load(fh)
    post = pq.read_table(os.path.join(seg_dir, "postings.parquet"), columns=["term", "df"])
    dfm = dict(zip(post["term"].to_pylist(), post["df"].to_pylist()))
    prepared_queries = {}
    for qid, terms in queries.items():
        prepared_queries[qid] = [
            (t, 1, idf(dfm[t], st["n_docs"])) for t in sorted(terms) if t in dfm
        ]
    all_terms = sorted({t for ts in prepared_queries.values() for t, _, _ in ts})
    return {"n_docs": st["n_docs"], "avgdl": st["avgdl"], "params": p,
            "queries": prepared_queries, "terms": all_terms}


def time_method(seg: SegmentIndex, prepared: dict, method: str, reps: int = 5) -> float:
    fn = (lambda: score_segment_bmw(seg, prepared)) if method == "bmw" else (
        lambda: seg.score_exact(prepared))
    fn()  # warm decode caches
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    n_q = max(len(prepared["queries"]), 1)
    return float(np.median(times)) / n_q * 1000.0  # ms / query


def main():
    sizes = [int(float(a)) for a in sys.argv[1:]] or [50_000, 200_000, 1_000_000]
    p = BM25Params(top_k=10)
    classes = {
        "selective": {i: [f"rare{i:03d}"] for i in range(8)},
        "medium": {i: [f"medium{2*i:03d}", f"medium{2*i+1:03d}"] for i in range(8)},
        "mixed": {i: [f"rare{i:03d}", f"common{i:02d}"] for i in range(8)},
        "dense": {i: [f"common{2*i:02d}", f"common{2*i+1:02d}"] for i in range(8)},
    }
    results = []
    for n in sizes:
        seg_dir = synth_segment(n)
        for cls, qs in classes.items():
            prepared = make_prepared(seg_dir, qs, p)
            seg = SegmentIndex(seg_dir, prepared["terms"])
            ex = time_method(seg, prepared, "exact")
            bw = time_method(seg, prepared, "bmw")
            results.append((n, cls, ex, bw))
            print(f"{n:>9} docs  {cls:<9}  exact {ex:8.2f} ms/q   bmw {bw:8.2f} ms/q   "
                  f"winner {'bmw' if bw < ex else 'exact'} ({max(ex,bw)/max(min(ex,bw),1e-9):.1f}x)",
                  flush=True)
    print(json.dumps([{"n_docs": n, "class": c, "exact_ms": e, "bmw_ms": b}
                      for n, c, e, b in results]))


if __name__ == "__main__":
    main()
