"""Bench harness: index-build throughput + query latency at $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "docs_per_sec": ..., "query_p50_s": ...}

--scaling: runs the same job in two fresh processes (RAY_GRAFT_CPUS=8 and
=32) on the same input and reports both throughputs plus scaling efficiency
(= (docs_per_sec_hi / docs_per_sec_lo) / (hi/lo); 1.0 = linear).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_QUERIES = [
    (0, "hash join table"),
    (1, "sort merge batch"),
    (2, "spark stream window"),
    (3, "vector filter scan"),
    (4, "customer query value"),
    (5, "group row key part"),
    (6, "the a fast slow big small data"),
    (7, "stream order column agg"),
]

CORPUS_MULT = int(os.environ.get("BENCH_CORPUS_MULT", "100"))

# --vocab zipf (env BENCH_VOCAB=zipf): realistic-vocabulary leg — the
# default bench corpus replicates the sf documents, which collapses to a
# ~31-term global vocabulary, leaving the lexicon shuffle, per-term
# varbyte encode and BMW block routing performance-untested on the axis
# that dominates real corpora. This leg synthesizes a Zipf-distributed
# corpus (deterministic, no external data): ZIPF_VOCAB candidate terms,
# per-token rank probability ∝ 1/rank^ZIPF_S, variable doc lengths.
ZIPF_DOCS = int(os.environ.get("BENCH_ZIPF_DOCS", "500000"))
ZIPF_VOCAB = int(os.environ.get("BENCH_ZIPF_VOCAB", "200000"))
ZIPF_S = float(os.environ.get("BENCH_ZIPF_S", "1.07"))

# query mix over vocabulary ranks: head terms (dense posting lists, the
# exact kernel's regime), mid ranks, and deep-tail terms (selective — the
# BMW/WAND regime), plus mixed head+tail queries where block-max skipping
# actually pays
ZIPF_QUERIES = [
    (0, "v000000 v000003"),                    # two head terms
    (1, "v000050 v000200"),                    # upper-mid
    (2, "v002000 v008000 v020000"),            # mid tail
    (3, "v080000 v150000"),                    # deep tail (selective)
    (4, "v000001 v090000"),                    # head + deep tail (BMW win)
    (5, "v000010 v001000 v050000 v199999"),    # full spectrum
    (6, "v000000 v000001 v000002 v000004"),    # all-head (dense)
    (7, "v012345 v054321 v111111"),            # scattered tail
]


def prepare_corpus_zipf(n_docs: int, vocab: int, s: float) -> str:
    """Deterministic Zipf-vocabulary bench corpus in the input_hint shape:
    ``n_docs`` docs of 20-100 tokens drawn from ``vocab`` candidate terms
    with rank probability ∝ 1/rank^s (inverse-CDF sampling from a PCG64
    stream — reproducible across runs). Written once to /tmp as multi-file
    parquet; untimed (corpus prep doubles as page-cache warmup)."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    key = hashlib.sha1(f"zipf:{n_docs}:{vocab}:{s}:v1".encode()).hexdigest()[:10]
    out_dir = f"/tmp/splade_ray_bench/corpus-{key}"
    done = os.path.join(out_dir, ".done")
    if os.path.exists(done):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.Generator(np.random.PCG64(1234))
    probs = 1.0 / np.arange(1, vocab + 1, dtype=np.float64) ** s
    cdf = np.cumsum(probs / probs.sum())
    terms = np.array([f"v{i:06d}" for i in range(vocab)], dtype=object)
    doc_lens = rng.integers(20, 101, size=n_docs)
    bounds = np.concatenate([[0], np.cumsum(doc_lens)])
    n_files = 10
    docs_per_file = (n_docs + n_files - 1) // n_files
    for f_idx in range(n_files):
        lo = f_idx * docs_per_file
        hi = min(n_docs, lo + docs_per_file)
        if lo >= hi:
            break
        tok_lo, tok_hi = bounds[lo], bounds[hi]
        ranks = np.minimum(
            np.searchsorted(cdf, rng.random(tok_hi - tok_lo)),
            vocab - 1)
        toks = terms[ranks]
        content = [
            " ".join(toks[bounds[i] - tok_lo:bounds[i + 1] - tok_lo])
            for i in range(lo, hi)
        ]
        n = hi - lo
        tbl = pa.table({
            "repo": pa.array([f"zipf/r{i % 97}" for i in range(lo, hi)],
                             pa.string()),
            "path": pa.array([f"src/{i}.txt" for i in range(lo, hi)],
                             pa.string()),
            "commit": pa.array(
                [hashlib.sha1(f"z:{i}".encode()).hexdigest()
                 for i in range(lo, hi)], pa.string()),
            "lang": pa.array(["text"] * n, pa.string()),
            "content": pa.array(content, pa.string()),
        })
        pq.write_table(tbl, os.path.join(out_dir, f"corpus-{f_idx:03d}.parquet"))
    open(done, "w").close()
    return out_dir


def prepare_corpus(sf_dir: str, mult: int) -> str:
    """Deterministic bench corpus: the sf documents replicated `mult` times
    (distinct doc ids, per-replica marker token), written once to /tmp as a
    multi-file parquet corpus in the input_hint shape. Untimed (and doubles
    as the page-cache warmup)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    key = hashlib.sha1(f"{sf_dir}:{mult}:v1".encode()).hexdigest()[:10]
    out_dir = f"/tmp/splade_ray_bench/corpus-{key}"
    done = os.path.join(out_dir, ".done")
    if os.path.exists(done):
        return out_dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    n = t.num_rows
    texts = t["text"].to_pylist()
    langs = t["lang"].to_pylist()
    sources = t["source"].to_pylist()
    for rep in range(mult):
        content = [f"{x} rep{rep}" for x in texts]
        tbl = pa.table(
            {
                "repo": pa.array(sources, pa.string()),
                "path": pa.array([f"docs/r{rep}/{i}.txt" for i in range(n)], pa.string()),
                "commit": pa.array(
                    [hashlib.sha1(f"{rep}:{i}".encode()).hexdigest() for i in range(n)],
                    pa.string(),
                ),
                "lang": pa.array(langs, pa.string()),
                "content": pa.array(content, pa.string()),
            }
        )
        pq.write_table(tbl, os.path.join(out_dir, f"corpus-{rep:03d}.parquet"))
    open(done, "w").close()
    return out_dir


def run_bench() -> dict:
    import numpy as np
    import ray

    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import logging

    class _EmptySchemaBundleNoise(logging.Filter):
        """Ray Data warns when an EMPTY hash-shuffle partition emits a
        schema-less RefBundle ("new schema: ."): inevitable on
        small-cardinality groupbys (fewer groups than partitions) and
        benign — downstream kernels conform empties to their declared
        schemas. Filter exactly that message; any real schema divergence
        (two non-empty schemas) still surfaces."""

        def filter(self, record: logging.LogRecord) -> bool:
            m = record.getMessage()
            return not ("different schema" in m and "new schema: ." in m)

    # filters do NOT propagate to child loggers — attach to the emitter
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptySchemaBundleNoise())

    from splade_ray.bm25 import BM25Params
    from splade_ray.build import build_index
    from splade_ray.query import Searcher

    vocab_mode = os.environ.get("BENCH_VOCAB", "")
    corpus_dir = (prepare_corpus_zipf(ZIPF_DOCS, ZIPF_VOCAB, ZIPF_S)
                  if vocab_mode == "zipf"
                  else prepare_corpus(sf_dir, CORPUS_MULT))
    bench_queries = ZIPF_QUERIES if vocab_mode == "zipf" else BENCH_QUERIES
    index_dir = f"/tmp/splade_ray_bench/index-{ncpu}-{os.getpid()}"
    shutil.rmtree(index_dir, ignore_errors=True)

    # Warm the Ray Data worker pool (process spawn + imports) — cluster
    # startup is not steady-state throughput.
    import ray.data as _rd

    _rd.range(ncpu * 2).map_batches(
        lambda b: (__import__("splade_ray.build"), b)[1], batch_size=1
    ).count()

    t0 = time.monotonic()
    manifest = build_index(
        corpus_dir,
        index_dir,
        text_col="content",
        rows_per_segment=5000,
        block_size=128,
    )
    build_s = time.monotonic() - t0
    n_docs = manifest["n_docs"]

    # query latency: persistent shard actors (load amortized), p50/p95 over
    # repeated batched calls of the 8-query set
    params = BM25Params(top_k=10)

    def measure(method: str):
        s = Searcher(index_dir, num_shards=min(8, max(2, ncpu // 4)), method=method)
        s.search(bench_queries, params)  # warm (actor start + load)
        lat = []
        for _ in range(15):
            q0 = time.monotonic()
            s.search(bench_queries, params)
            lat.append(time.monotonic() - q0)
        s.shutdown()
        return float(np.percentile(lat, 50)), float(np.percentile(lat, 95))

    p50, p95 = measure("exact")
    # adaptive kernel: BMW block skipping for selective queries, vectorized
    # exact for dense ones (this corpus's 31-term vocab is the dense regime)
    p50_auto, _ = measure("auto")

    # quantized integer scorer over the derived postings_q layer (the layer
    # build is untimed — an index maintenance step, not query latency);
    # served through the same persistent shard actors as the float kernels
    from splade_ray.quantized import build_quantized_postings

    build_quantized_postings(index_dir, params)
    p50_quant, _ = measure("quantized")

    # trigram layer: build throughput, df-capped size ratio, and pruned
    # substring/regex latency vs the full-scan baseline (all untimed work
    # — layer builds — excluded from the headline `value` to stay
    # comparable with earlier rounds). Skipped in the scaling legs, whose
    # criterion is INDEX-BUILD throughput — the layer build would only
    # stretch each leg's wall-clock.
    tri_metrics = {}
    if os.environ.get("BENCH_SKIP_TRIGRAM") != "1" and vocab_mode != "zipf":
        tri_metrics = _trigram_leg(index_dir, corpus_dir)

    # duplicated-substring scan over the multiplied corpus (the heaviest
    # LLM-curation op: gram-count groupby + broadcast-membership scan).
    # Untimed in the headline value; skipped in scaling legs like trigrams.
    dup_metrics = {}
    if os.environ.get("BENCH_SKIP_TRIGRAM") != "1" and vocab_mode != "zipf":
        from splade_ray.io import read_parquet_clean as _rpc
        from splade_ray.ops.curation import duplicated_spans

        t2 = time.monotonic()
        # bench corpus has no id column; a per-batch ordinal only labels
        # output rows (the scan's work is id-independent)
        dup_src = _rpc(corpus_dir, columns=["content"]).map_batches(
            lambda b: b.append_column(
                "doc_id", __import__("pyarrow").array(range(b.num_rows))
            ),
            batch_format="pyarrow",
        )
        n_rows = duplicated_spans(
            dup_src, k=8, text_col="content", id_col="doc_id"
        ).count()
        dup_s = time.monotonic() - t2
        dup_metrics = {
            "dup_spans_scan": round(dup_s, 3),
            "dup_spans_docs_per_sec": round(n_rows / dup_s, 1),
        }

    # DSIR importance weighting over the multiplied corpus: two hashed-
    # n-gram distribution fits (5% hash-sample target + full raw corpus;
    # bucket-sized shuffles) + the broadcast-lut scoring scan. Untimed in
    # the headline value; skipped in scaling legs like trigrams.
    dsir_metrics = {}
    if os.environ.get("BENCH_SKIP_TRIGRAM") != "1" and vocab_mode != "zipf":
        from splade_ray.io import read_parquet_clean as _rpc2
        from splade_ray.ops.curation import (
            dsir_bucket_counts,
            dsir_log_lut,
            dsir_log_weights,
        )
        from splade_ray.ops.sample import hash_sample

        def _with_ids(b):
            return b.append_column(
                "doc_id", __import__("pyarrow").array(range(b.num_rows))
            )

        t3 = time.monotonic()
        raw = _rpc2(corpus_dir, columns=["content"]).map_batches(
            _with_ids, batch_format="pyarrow"
        )
        target = hash_sample(
            _rpc2(corpus_dir, columns=["content"]).map_batches(
                _with_ids, batch_format="pyarrow"
            ),
            0.05, id_col="doc_id", seed=1,
        )
        tc = dsir_bucket_counts(target, n_buckets=65536, text_col="content")
        rc = dsir_bucket_counts(raw, n_buckets=65536, text_col="content")
        n_scored = dsir_log_weights(
            raw, dsir_log_lut(tc, rc), text_col="content"
        ).count()
        dsir_s = time.monotonic() - t3
        dsir_metrics = {
            "dsir_fit_and_score": round(dsir_s, 3),
            "dsir_docs_per_sec": round(n_scored / dsir_s, 1),
        }

    # incremental indexing: append a +10% corpus drop as new segments
    # (config from the manifest, incremental lexicon merge). Untimed in
    # the headline value; skipped in scaling legs like trigrams.
    append_metrics = {}
    if os.environ.get("BENCH_SKIP_TRIGRAM") != "1" and vocab_mode != "zipf":
        import pyarrow.parquet as _pq

        from splade_ray.build import append_index

        first = sorted(
            f for f in os.listdir(corpus_dir) if f.endswith(".parquet")
        )[0]
        extra = os.path.join(index_dir, "..", f"append-{ncpu}-{os.getpid()}.parquet")
        t4 = _pq.read_table(os.path.join(corpus_dir, first))
        _pq.write_table(t4.slice(0, max(1, len(t4) // 2)), extra)
        t5 = time.monotonic()
        aman = append_index(index_dir, extra, rows_per_segment=5000)
        append_s = time.monotonic() - t5
        n_appended = aman["n_docs"] - n_docs
        append_metrics = {
            "append_build": round(append_s, 3),
            "append_docs_per_sec": round(n_appended / append_s, 1),
        }
        os.remove(extra)

    # realistic-vocabulary sub-leg (recorded in the default run so every
    # BENCH_r{N}.json carries the vocabulary axis): a compact Zipf corpus
    # (100k docs over the same 200k-term candidate vocabulary), one
    # build + query p50. Corpus prep is cached in /tmp like the others.
    zipf_metrics = {}
    if vocab_mode != "zipf" and os.environ.get("BENCH_SKIP_TRIGRAM") != "1":
        import pyarrow.dataset as _pads

        zc = prepare_corpus_zipf(100_000, ZIPF_VOCAB, ZIPF_S)
        zi = f"/tmp/splade_ray_bench/zipf-index-{ncpu}-{os.getpid()}"
        shutil.rmtree(zi, ignore_errors=True)
        tz = time.monotonic()
        zman = build_index(zc, zi, text_col="content", rows_per_segment=5000,
                           block_size=128)
        z_build = time.monotonic() - tz
        zs = Searcher(zi, num_shards=min(8, max(2, ncpu // 4)))
        zs.search(ZIPF_QUERIES, params)  # warm
        zlat = []
        for _ in range(15):
            q0 = time.monotonic()
            zs.search(ZIPF_QUERIES, params)
            zlat.append(time.monotonic() - q0)
        zs.shutdown()
        zipf_metrics = {
            "zipf_docs_per_sec": round(zman["n_docs"] / z_build, 1),
            "zipf_build": round(z_build, 3),
            "zipf_query_p50": round(float(np.percentile(zlat, 50)), 4),
            "zipf_n_terms": int(_pads.dataset(
                os.path.join(zi, "lexicon")).count_rows()),
            "zipf_n_docs": zman["n_docs"],
        }
        shutil.rmtree(zi, ignore_errors=True)

    # wide-op stage: salted groupby(term) posting store over flat postings
    from splade_ray.analysis import postings_batch
    from splade_ray.io import read_parquet_clean
    from splade_ray.term_index import build_term_index

    t1 = time.monotonic()
    if vocab_mode == "zipf":
        # globally unique doc ids recovered from the path column
        # ("src/<i>.txt") — posting lists need strictly increasing ids
        def _zipf_ids(b):
            import pyarrow as _pa

            ids = [int(p[4:-4]) for p in b["path"].to_pylist()]
            return _pa.table({"text": b["content"],
                              "doc_id": _pa.array(ids, _pa.int64())})

        src_ds = read_parquet_clean(
            corpus_dir, columns=["path", "content"]
        ).map_batches(_zipf_ids, batch_format="pyarrow")
    else:
        src_ds = read_parquet_clean(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
    flat = src_ds.map_batches(postings_batch, batch_format="pyarrow", batch_size=512)
    n_terms = build_term_index(flat, salt_range=500).count()
    term_index_s = time.monotonic() - t1

    shutil.rmtree(index_dir, ignore_errors=True)
    total = build_s + p50 + term_index_s
    out = {
        "metric": "index-build + BM25 top-k query + salted term-index (sec)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {
            "index_build": round(build_s, 3),
            "query_batch_p50": round(p50, 4),
            "query_batch_p95": round(p95, 4),
            "query_batch_p50_auto": round(p50_auto, 4),
            "query_batch_p50_quantized": round(p50_quant, 4),
            "term_index_salted_groupby": round(term_index_s, 3),
            **tri_metrics.get("queries", {}),
            **{k: v for k, v in dup_metrics.items() if k == "dup_spans_scan"},
            **{k: v for k, v in dsir_metrics.items() if k == "dsir_fit_and_score"},
            **{k: v for k, v in append_metrics.items() if k == "append_build"},
        },
        **{k: v for k, v in append_metrics.items() if k != "append_build"},
        **{k: v for k, v in dup_metrics.items() if k != "dup_spans_scan"},
        **{k: v for k, v in dsir_metrics.items() if k != "dsir_fit_and_score"},
        **{k: v for k, v in tri_metrics.items() if k != "queries"},
        **zipf_metrics,
        "sf": sf_dir,
        "vocab": vocab_mode or "replicated-sf",
        "num_cpus": ncpu,
        "n_docs": n_docs,
        "n_postings": manifest["n_postings"],
        "n_terms_global": int(n_terms),
        "docs_per_sec": round(n_docs / build_s, 1),
    }
    ray.shutdown()
    return out


def _trigram_leg(index_dir: str, corpus_dir: str) -> dict:
    import glob

    import numpy as np

    from splade_ray.io import read_parquet_clean
    from splade_ray.trigram import (
        build_trigrams,
        grep_scan,
        regex_search,
        substring_search,
    )

    t2 = time.monotonic()
    build_trigrams(index_dir)
    tri_build_s = time.monotonic() - t2
    tri_glob = os.path.join(index_dir, "segments", "seg=*", "trigrams.parquet")
    tri_bytes = sum(os.path.getsize(p) for p in glob.glob(tri_glob))
    build_trigrams(index_dir, max_df_frac=0.1)
    tri_bytes_capped = sum(os.path.getsize(p) for p in glob.glob(tri_glob))

    NEEDLES = [(0, "rep42 "), (1, "spark window")]
    PATTERNS = [(0, r"rep42\s+rep\d+"), (1, r"spark\s+window\w*")]

    def lat_of(fn, reps=5):
        fn()  # warm
        lat = []
        for _ in range(reps):
            q0 = time.monotonic()
            fn()
            lat.append(time.monotonic() - q0)
        return float(np.percentile(lat, 50))

    grep_p50 = lat_of(lambda: substring_search(index_dir, NEEDLES))
    regex_p50 = lat_of(lambda: regex_search(index_dir, PATTERNS))
    scan_ds = read_parquet_clean(corpus_dir, columns=["content"]).map_batches(
        lambda b: b.append_column(
            "doc_id", __import__("pyarrow").array(range(b.num_rows))
        ),
        batch_format="pyarrow",
    )
    scan_p50 = lat_of(
        lambda: grep_scan(
            scan_ds, PATTERNS, id_col="doc_id", text_col="content", regex=True
        ).count(),
        reps=3,
    )
    return {
        "queries": {
            "trigram_build": round(tri_build_s, 3),
            "grep_substr_p50": round(grep_p50, 4),
            "grep_regex_pruned_p50": round(regex_p50, 4),
            "grep_regex_fullscan_p50": round(scan_p50, 4),
        },
        "trigram_bytes": tri_bytes,
        "trigram_bytes_capped_0.1": tri_bytes_capped,
    }


def run_scaling() -> dict:
    """Same job in fresh processes at 2, 8 and 32 CPUs on the same input.

    Two N->4N pairs are reported; `scaling_efficiency` is the OFFICIAL
    criterion pair 8->32 (BASELINE.json: throughput_32/throughput_8/4
    >= 0.8). The 2->8 figure is recorded alongside: it runs with
    memory-bandwidth headroom on both legs, but its 2-cpu leg is also the
    least parallel (fixed per-build costs amortize differently), so as
    the build gets faster the 2-cpu leg gains disproportionately and the
    ratio under-reports — the 8->32 pair is both the official criterion
    and the steadier regime on this box.

    Sampling (round-2 VERDICT item 4): MEDIAN-of-N per level over
    interleaved rounds (interleaving decorrelates box-noise windows from
    CPU levels), and when a level's own samples spread more than
    BENCH_SCALE_TOL (default 20% of the median) extra interleaved rounds
    run automatically — a noisy window widens the sample set instead of
    silently skewing a best-of figure. All samples are reported."""
    levels = [int(x) for x in os.environ.get("BENCH_SCALE_LEVELS", "2,8,32").split(",")]
    samples: dict[int, list[dict]] = {n: [] for n in levels}
    # larger corpus for the scaling legs so per-leg fixed costs (session
    # startup, lexicon merge) amortize into the measured throughput
    mult = os.environ.get("BENCH_SCALE_MULT", "300")
    reps = int(os.environ.get("BENCH_SCALE_REPS", "3"))
    max_reps = int(os.environ.get("BENCH_SCALE_MAX_REPS", str(reps + 2)))
    tol = float(os.environ.get("BENCH_SCALE_TOL", "0.2"))

    def one_round():
        for n in levels:
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(n),
                BENCH_CORPUS_MULT=mult,
                BENCH_SKIP_TRIGRAM="1",  # scaling criterion is build throughput
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            ).stdout
            samples[n].append(json.loads(out.strip().splitlines()[-1]))

    def spread(vals: list[float]) -> float:
        med = sorted(vals)[len(vals) // 2]
        return (max(vals) - min(vals)) / med if med else 0.0

    rounds = 0
    while rounds < reps:
        one_round()
        rounds += 1
    while rounds < max_reps and any(
        spread([s["docs_per_sec"] for s in samples[n]]) > tol for n in levels
    ):
        one_round()  # noisy window: widen the sample set
        rounds += 1

    def med(vals: list[float]) -> float:
        sv = sorted(vals)
        m = len(sv) // 2
        return sv[m] if len(sv) % 2 else (sv[m - 1] + sv[m]) / 2.0

    med_dps = {n: med([s["docs_per_sec"] for s in samples[n]]) for n in levels}

    def eff(lo, hi):
        return round((med_dps[hi] / med_dps[lo]) / (hi / lo), 3)

    out = {
        "metric": "index-build scaling efficiency (N -> 4N cpus, fresh processes, median-of-N)",
        "levels": levels,
        "rounds": rounds,
        "docs_per_sec": {str(n): round(med_dps[n], 1) for n in levels},
        "docs_per_sec_samples": {
            str(n): [s["docs_per_sec"] for s in samples[n]] for n in levels
        },
        "sample_spread": {
            str(n): round(spread([s["docs_per_sec"] for s in samples[n]]), 3)
            for n in levels
        },
        "build_sec": {
            str(n): med([s["queries"]["index_build"] for s in samples[n]]) for n in levels
        },
        "query_p50": {
            str(n): med([s["queries"]["query_batch_p50"] for s in samples[n]])
            for n in levels
        },
    }
    pairs = [(lo, hi) for lo in levels for hi in levels if hi == 4 * lo]
    for lo, hi in pairs:
        out[f"scaling_efficiency_{lo}_{hi}"] = eff(lo, hi)
    if pairs:
        # headline = the OFFICIAL criterion pair (BASELINE.json:
        # throughput_32 / throughput_8 / 4 >= 0.8), i.e. the LARGEST
        # N->4N pair measured; smaller pairs stay recorded alongside
        lo, hi = pairs[-1]
        out["scaling_efficiency"] = out[f"scaling_efficiency_{lo}_{hi}"]
    return out


if __name__ == "__main__":
    if "--vocab" in sys.argv:
        os.environ["BENCH_VOCAB"] = sys.argv[sys.argv.index("--vocab") + 1]
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
