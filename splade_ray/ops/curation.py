"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, sequence-pack assignment, and PII/regex redaction.

These extend the beyond-reference LLM-data-pipeline family (ops/dedup.py,
ops/textstats.py). The reference engine has no data-curation surface at
all (its corpus enters pre-cleaned, splade/beir_eval.py:22); at 100-TB
pretraining scale these are the stages that run BEFORE anything in
SURVEY.md §2, so they follow the same Ray-Data contract as the rest of the
repo: single-pass ``map_batches`` scans with Arrow kernels, broadcast
small sides via ``ray.put``, and exactly one bounded shuffle where a
global ordering is semantically required (pack assignment).

Scale notes per operator:

- **Decontamination** (Brown et al. 2020 §C, the 13-gram eval-overlap
  filter): the eval side is benchmark-sized (MBs even for a large suite),
  so its distinct k-gram set is collected to the driver once, ``ray.put``
  once, and every scan task reads it zero-copy from the object store. The
  corpus side is a pure streaming scan — no shuffle, no materialization.
- **Pack assignment**: a distributed exclusive prefix-scan. Pass 1 reduces
  the corpus to (id, n_tokens) rows (16 B/doc — three orders of magnitude
  smaller than the text) and materializes that; pass 2 computes per-range
  token totals (one small groupby), the driver prefix-sums the range
  totals (num_buckets rows), and pass 3 assigns packs inside each range
  with the broadcast base offsets. Only the 16 B/doc table ever shuffles.
- **Redaction**: stateless vectorized scan (RE2 kernels via
  ``pyarrow.compute``); patterns are compiled per call, not per batch.
"""

from __future__ import annotations

import logging
import os

import numpy as np
import pyarrow as pa
import ray

from splade_ray.analysis import tokenize_column

_LOG = logging.getLogger(__name__)

# --------------------------------------------------------------------------
# k-gram construction (shared by decontamination)
# --------------------------------------------------------------------------


def kgram_strings(
    texts: pa.Array | pa.ChunkedArray, k: int
) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Space-joined token k-grams of a string column, fully vectorized.

    Returns ``(grams, gram_parents, doc_lens)``: the flat gram array, the
    row index of each gram, and per-row token counts. A row with fewer
    than ``k`` tokens contributes no grams. Gram construction is ``k``
    shifted slices of the flat token array joined element-wise — no
    per-row Python; doc boundaries are enforced by requiring the first and
    last token of a window to share a parent row.
    """
    import pyarrow.compute as pc

    terms, par, doc_lens = tokenize_column(texts)
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = len(terms)
    if n < k:
        return pa.array([], pa.string()), np.array([], np.int64), doc_lens
    m = n - k + 1
    parts = [terms.slice(j, m) for j in range(k)]
    grams_all = pc.binary_join_element_wise(*parts, " ")
    valid = par[:m] == par[k - 1 :]
    return grams_all.filter(pa.array(valid)), par[:m][valid], doc_lens


def collect_eval_grams(eval_docs, k: int, *, text_col: str = "text") -> pa.Array:
    """Distinct k-grams of an eval/benchmark Dataset, collected to the
    driver. Benchmarks are small by nature (the contamination check only
    makes sense against a held-out set you could score on), so the distinct
    gram set is driver-safe; per-batch dedup happens worker-side first so
    only unique grams cross the object store."""
    import pyarrow.compute as pc

    def batch_grams(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or text_col not in batch.column_names:
            return pa.table({"gram": pa.array([], pa.string())})
        grams, _, _ = kgram_strings(batch[text_col], k)
        return pa.table({"gram": pc.unique(grams)})

    parts = eval_docs.map_batches(batch_grams, batch_format="pyarrow").to_pandas()
    return pa.array(np.unique(parts["gram"].to_numpy(dtype=object)), pa.string())


class DecontaminateStage:
    """Actor-pool scan flagging training docs that share any k-gram with a
    broadcast eval-gram set (GPT-3-style decontamination, Brown et al. 2020
    appendix C; 13-gram overlap there, ``k`` a parameter here).

    ``eval_grams_ref`` is a ``ray.put`` handle to the distinct eval gram
    array — fetched once per actor in ``__init__``, shared zero-copy by
    every task on the node."""

    def __init__(self, eval_grams_ref, *, k: int, text_col: str = "text"):
        self.eval_grams = ray.get(eval_grams_ref)
        self.k = k
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0 or self.text_col not in batch.column_names:
            return pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("n_grams", pa.int64()),
                    ("n_contaminated", pa.int64()),
                    ("contaminated", pa.bool_()),
                ]
            ).empty_table()
        grams, gpar, doc_lens = kgram_strings(batch[self.text_col], self.k)
        n = batch.num_rows
        n_grams = np.maximum(doc_lens - self.k + 1, 0)
        hit = np.asarray(pc.is_in(grams, value_set=self.eval_grams))
        n_contam = np.bincount(gpar[hit], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_grams": pa.array(n_grams, pa.int64()),
                "n_contaminated": pa.array(n_contam, pa.int64()),
                "contaminated": pa.array(n_contam > 0),
            }
        )


def decontaminate(
    train_docs,
    eval_docs,
    *,
    k: int = 5,
    text_col: str = "text",
    concurrency: tuple[int, int] | None = None,
    batch_size: int = 512,
):
    """(doc_id, n_grams, n_contaminated, contaminated) for every training
    doc, against the distinct k-gram set of ``eval_docs``. The eval set is
    collected and broadcast once; the training side is a pure streaming
    scan (no shuffle)."""
    grams_ref = ray.put(collect_eval_grams(eval_docs, k, text_col=text_col))
    if concurrency is None:
        cpus = ray.cluster_resources().get("CPU", 4.0) if ray.is_initialized() else 4.0
        concurrency = (1, max(2, int(cpus)))
    return train_docs.map_batches(
        DecontaminateStage,
        fn_constructor_kwargs={"eval_grams_ref": grams_ref, "k": k, "text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# --------------------------------------------------------------------------
# sequence-pack assignment (distributed exclusive prefix-scan)
# --------------------------------------------------------------------------


def pack_assign(
    docs,
    *,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
):
    """Assign each doc to a training pack: in global ``id_col`` order,
    ``pack_id = floor(exclusive_cumsum(n_tokens) / budget)`` — contiguous
    token-budget chunking, the deterministic cousin of greedy sequence
    packing (docs never reorder, so the assignment is reproducible and
    SQL-mirrorable as a window cumsum).

    Distributed as the classic three-step prefix-scan: (1) reduce the
    corpus to (id, n_tokens) rows and materialize that pair table (16 B/doc,
    ~1000x smaller than the text); (2) one small groupby computes per
    id-range token totals, which the driver prefix-sums into base offsets
    (``num_buckets`` rows); (3) each range independently cumsums its own
    rows on top of its broadcast base. Only the pair table shuffles; the
    text column never leaves step 1's streaming scan.
    """
    import pandas as pd

    if num_buckets is None:
        cpus = ray.cluster_resources().get("CPU", 4.0) if ray.is_initialized() else 4.0
        num_buckets = max(4, 2 * int(cpus))

    def counts_batch(batch: pa.Table) -> pa.Table:
        _, _, doc_lens = tokenize_column(batch[text_col])
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "n_tokens": pa.array(doc_lens, pa.int64()),
            }
        )

    counts = docs.map_batches(counts_batch, batch_format="pyarrow").materialize()
    if counts.count() == 0:
        return ray.data.from_arrow(
            pa.schema(
                [(id_col, pa.int64()), ("n_tokens", pa.int64()), ("pack_id", pa.int64())]
            ).empty_table()
        )
    max_id = int(counts.max(id_col))
    min_id = int(counts.min(id_col))
    span = max(1, (max_id - min_id) // num_buckets + 1)

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.append_column("bucket", pa.array((ids - min_id) // span, pa.int64()))

    bucketed = counts.map_batches(add_bucket, batch_format="pyarrow").materialize()

    totals = bucketed.groupby("bucket").sum("n_tokens").to_pandas()
    totals = totals.sort_values("bucket").reset_index(drop=True)
    tok_col = [c for c in totals.columns if c != "bucket"][0]
    base = np.zeros(num_buckets + 1, np.int64)
    np.add.at(
        base,
        totals["bucket"].to_numpy(np.int64) + 1,
        totals[tok_col].to_numpy(np.int64),
    )
    base = np.cumsum(base)  # base[b] = tokens in all ranges before b
    base_ref = ray.put(base)

    def assign_group(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(base_ref)
        g = g.sort_values(id_col).reset_index(drop=True)
        toks = g["n_tokens"].to_numpy(np.int64)
        excl = offsets[int(g["bucket"].iloc[0])] + np.cumsum(toks) - toks
        g["pack_id"] = excl // budget
        return g[[id_col, "n_tokens", "pack_id"]]

    return bucketed.groupby("bucket").map_groups(assign_group, batch_format="pandas")


# --------------------------------------------------------------------------
# exact duplicated-substring spans (Lee et al. 2022, ExactSubstr family)
# --------------------------------------------------------------------------


def _gram_hash_positions(
    hs: np.ndarray, par: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flat k-gram rolling-fold hashes with their start offsets: returns
    ``(gram_hash uint64, doc_index int64, flat_start int64)`` where
    ``flat_start`` indexes the batch's flat token array (the textstats
    ``_gram_hashes`` fold, FNV prime, uint64 wraparound — HUGEINT-mirrorable
    in SQL). Grams crossing a doc boundary are masked out."""
    P = np.uint64(1099511628211)
    m = hs.size - k + 1
    if m <= 0:
        e = np.empty(0, np.int64)
        return np.empty(0, np.uint64), e, e
    with np.errstate(over="ignore"):
        roll = np.zeros(m, np.uint64)
        for i in range(k):
            roll = roll * P + hs[i : i + m]
    valid = par[:m] == par[k - 1 : k - 1 + m]
    fi = np.flatnonzero(valid).astype(np.int64)
    return roll[valid], par[:m][valid], fi


def collect_dup_grams(
    docs, *, k: int, min_count: int = 2, text_col: str = "text"
) -> np.ndarray:
    """Sorted uint64 hashes of every k-gram occurring >= ``min_count`` times
    across the corpus (within-doc repeats count). Pass 1 of the duplicated-
    span scan: each batch pre-aggregates its gram counts locally (np.unique
    combiner), the partials shuffle on a salted COARSE key (bounded group
    count — grouping on the raw gram hash pays a full-width sort and a
    Python call per near-singleton group, the round-3 stats-audit lesson),
    each coarse group sums with one vectorized np.unique pass, and only
    grams with total >= min_count leave the shuffle — the duplicated
    DISTINCT gram set, which for non-pathological corpora is orders of
    magnitude smaller than the token stream. At extreme scale run this per
    corpus shard or raise ``min_count``; the broadcast contract is the
    decontamination one (``ray.put`` once, zero-copy per task)."""
    from splade_ray.ops.dedup import _coarse_key, _shuffle_groups

    n_groups = _shuffle_groups(None)

    def count_batch(batch: pa.Table) -> pa.Table:
        from splade_ray.ops.dedup import _flat_token_hashes

        hs, par, _ = _flat_token_hashes(batch[text_col])
        g, _, _ = _gram_hash_positions(hs, par, k)
        u, c = np.unique(g, return_counts=True)
        # int64 reinterpretation: uint64 survives neither the pandas block
        # conversion inside the groupby nor parquet round-trips cleanly;
        # equality (all the shuffle needs) is bit-pattern-preserving
        ui = u.view(np.int64)
        return pa.table(
            {
                "gram": pa.array(ui, pa.int64()),
                "cnt": pa.array(c.astype(np.int64)),
                "gk": pa.array(_coarse_key([ui], n_groups)),
            }
        )

    def dup_in_group(g: pa.Table) -> pa.Table:
        grams = g["gram"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(grams, return_inverse=True)
        tot = np.bincount(inv, weights=cnt, minlength=u.size)
        return pa.table({"gram": pa.array(u[tot >= min_count], pa.int64())})

    parts = (
        docs.map_batches(count_batch, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(dup_in_group, batch_format="pyarrow")
        .to_pandas()
    )
    return np.sort(parts["gram"].to_numpy(np.int64))


class DupSpanStage:
    """Pass-2 scan of the duplicated-span operator: against the broadcast
    duplicated-gram set, mark every token position covered by a duplicated
    k-gram window and reduce to per-doc stats (plus optionally the text with
    covered spans removed). Coverage is one bincount-difference cumsum over
    the batch's flat token array — no per-row Python."""

    def __init__(
        self,
        grams_ref,
        *,
        k: int,
        text_col: str,
        id_col: str,
        rewrite: bool,
        replace: bool = False,
    ):
        self.grams = ray.get(grams_ref)
        self.k = k
        self.text_col = text_col
        self.id_col = id_col
        self.rewrite = rewrite or replace
        self.replace = replace  # return the ORIGINAL batch, text swapped

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from splade_ray.ops.textstats import hash_token

        terms, par, doc_lens = tokenize_column(batch[self.text_col])
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        enc = terms.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        if uniq:
            uh = np.array([hash_token(t) for t in uniq], np.uint64)
            hs = uh[enc.indices.to_numpy(zero_copy_only=False)]
        else:
            hs = np.array([], np.uint64)

        n = batch.num_rows
        g, gpar, fi = _gram_hash_positions(hs, par, self.k)
        if self.grams.size and g.size:
            gi = g.view(np.int64)  # the broadcast set is int64-reinterpreted
            idx = np.minimum(np.searchsorted(self.grams, gi), self.grams.size - 1)
            member = self.grams[idx] == gi
        else:
            member = np.zeros(g.size, bool)
        starts = fi[member]
        T = hs.size
        diff = np.bincount(starts, minlength=T + 1).astype(np.int64) - np.bincount(
            starts + self.k, minlength=T + 1
        ).astype(np.int64)
        covered = np.cumsum(diff[:T]) > 0
        n_dup_tokens = np.bincount(par[covered], minlength=n).astype(np.int64)
        prev = np.concatenate(([False], covered[:-1]))
        same_doc = np.concatenate(([False], par[1:] == par[:-1])) if T else np.zeros(0, bool)
        island = covered & ~(prev & same_doc)
        n_spans = np.bincount(par[island], minlength=n).astype(np.int64)
        n_dup_grams = np.bincount(gpar[member], minlength=n).astype(np.int64)
        cols = {
            "doc_id": batch[self.id_col].cast(pa.int64()),
            "n_tokens": pa.array(doc_lens, pa.int64()),
            "n_dup_grams": pa.array(n_dup_grams, pa.int64()),
            "n_dup_tokens": pa.array(n_dup_tokens, pa.int64()),
            "n_spans": pa.array(n_spans, pa.int64()),
        }
        if self.rewrite:
            kept = ~covered
            counts_kept = np.bincount(par[kept], minlength=n)
            offsets = np.zeros(n + 1, np.int32)
            np.cumsum(counts_kept, out=offsets[1:])
            la = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), terms.filter(pa.array(kept))
            )
            cols["text_dedup"] = pc.binary_join(la, " ")
        if self.replace:
            idx = batch.schema.get_field_index(self.text_col)
            return batch.set_column(
                idx, self.text_col, cols["text_dedup"].cast(pa.string())
            )
        return pa.table(cols)


def duplicated_spans(
    docs,
    *,
    k: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    rewrite: bool = False,
    concurrency=None,
    batch_size: int = 2048,
):
    """Exact duplicated-substring scan (the k-gram formulation of Lee et al.
    2022's ExactSubstr dedup: any substring of >= k tokens shared between two
    positions in the corpus is exactly the union of duplicated k-gram
    windows). Returns per doc: token count, number of duplicated k-grams,
    number of token positions covered by a duplicated window, and the count
    of maximal covered spans — plus, with ``rewrite=True``, ``text_dedup``:
    the analyzed token stream with covered spans removed (the Lee et al.
    cut; lowercased-token join, the documented normalization of every
    token-level rewrite in this repo).

    Two passes, mirroring the reference-scale design: (1) batch-local gram
    counting + one (gram, count) groupby — the only shuffle, carrying 16-byte
    rows; (2) a pure streaming scan against the ``ray.put``-broadcast
    duplicated-gram set. The corpus text never shuffles.

    The scan runs on the TASK pool, not an actor pool (round-3 bench,
    median-of-3: tasks 4.0 s vs autoscaling actors 9.5 s on a 1.5M-doc
    corpus): per-task setup is one zero-copy ``ray.get`` of the broadcast
    gram array, so there is no per-actor state worth amortizing and the
    pool's ramp-up dominates short jobs.
    """
    grams_ref = ray.put(collect_dup_grams(docs, k=k, min_count=min_count, text_col=text_col))

    def scan(batch: pa.Table) -> pa.Table:
        return DupSpanStage(
            grams_ref, k=k, text_col=text_col, id_col=id_col, rewrite=rewrite
        )(batch)

    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return docs.map_batches(
        scan, batch_format="pyarrow", batch_size=batch_size, **kwargs
    )


def drop_duplicated_spans(
    docs,
    *,
    k: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency=None,
    batch_size: int = 2048,
):
    """The Lee et al. cut as an in-place curation stage: every column flows
    through unchanged except ``text_col``, which is replaced by the analyzed
    token stream with duplicated spans removed. Same two-pass, task-pool
    shape as :func:`duplicated_spans`."""
    grams_ref = ray.put(collect_dup_grams(docs, k=k, min_count=min_count, text_col=text_col))

    def scan(batch: pa.Table) -> pa.Table:
        return DupSpanStage(
            grams_ref, k=k, text_col=text_col, id_col=id_col,
            rewrite=True, replace=True,
        )(batch)

    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return docs.map_batches(
        scan, batch_format="pyarrow", batch_size=batch_size, **kwargs
    )


def corpus_fingerprint(path: str) -> str:
    """Cheap, deterministic fingerprint of an on-disk corpus directory:
    sha1 over the sorted (relative path, size, mtime_ns) of every data
    file under ``path``. Used to validate SHARDED work-dir resume — the
    params manifests of :func:`collect_dup_grams_sharded` /
    :func:`collect_dup_units_sharded` only pin the algorithm knobs, so
    without this a re-run of ``curate`` into the same --out against a
    MODIFIED corpus would silently reuse stale duplicated-key shards."""
    import hashlib

    h = hashlib.sha1(os.path.abspath(path).encode())
    if os.path.isdir(path):
        entries = []
        for root, _, files in os.walk(path):
            for f in files:
                fp = os.path.join(root, f)
                st = os.stat(fp)
                entries.append((os.path.relpath(fp, path),
                                st.st_size, st.st_mtime_ns))
        for rel, size, mt in sorted(entries):
            h.update(f"{rel}\x00{size}\x00{mt}\x00".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f"{st.st_size}\x00{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def _validate_shard_manifest(out_dir: str, manifest_path: str, params: dict,
                             what: str) -> dict | None:
    """Shared resume gate for the sharded collect passes: algorithm-param
    mismatch raises (user error); fingerprint mismatch means the corpus
    CHANGED under a persistent work dir — wipe and rebuild (returns None);
    full match returns the cached result."""
    import json
    import shutil

    if not os.path.exists(manifest_path):
        return None
    with open(manifest_path) as f:
        state = json.load(f)
    prev = state.get("params") or {}
    algo = {k_: v for k_, v in params.items() if k_ != "fingerprint"}
    prev_algo = {k_: v for k_, v in prev.items() if k_ != "fingerprint"}
    if prev_algo != algo:
        raise ValueError(
            f"{out_dir} holds {what} written with {prev_algo}, "
            f"refusing to reuse with {algo}")
    fp = params.get("fingerprint")
    if fp is not None and prev.get("fingerprint") != fp:
        _LOG.warning(
            "%s: corpus fingerprint changed (%s -> %s) — discarding stale "
            "%s shards and rebuilding", out_dir, prev.get("fingerprint"),
            fp, what)
        shutil.rmtree(out_dir, ignore_errors=True)
        return None
    return state["result"]


def collect_dup_grams_sharded(
    docs,
    out_dir: str,
    *,
    k: int,
    min_count: int = 2,
    text_col: str = "text",
    n_shards: int = 8,
    fingerprint: str | None = None,
) -> dict:
    """Pass 1 of the SHARDED duplicated-span scan (round-3 VERDICT item 2):
    the duplicated-gram set is written hash-partitioned into
    ``out_dir/shard=N/`` parquet instead of materializing on the driver —
    the per-round broadcast of :func:`duplicated_spans_sharded` is then
    bounded by ~1/n_shards of the set, so corpus size no longer bounds
    worker memory. Same salted coarse-key shuffle as
    :func:`collect_dup_grams`; the shard key is ``gram mod n_shards`` on
    the uint64 bit pattern. Returns {"n_grams", "shard_rows"} and writes a
    params manifest for resume validation."""
    import json

    from splade_ray.ops.dedup import _coarse_key, _shuffle_groups

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    params = {"k": int(k), "min_count": int(min_count),
              "n_shards": int(n_shards), "text_col": str(text_col)}
    if fingerprint is not None:
        params["fingerprint"] = str(fingerprint)
    manifest_path = os.path.join(out_dir, "_params.json")
    cached = _validate_shard_manifest(out_dir, manifest_path, params, "grams")
    if cached is not None:
        return cached

    n_groups = _shuffle_groups(None)

    def count_batch(batch: pa.Table) -> pa.Table:
        from splade_ray.ops.dedup import _flat_token_hashes

        hs, par, _ = _flat_token_hashes(batch[text_col])
        g, _, _ = _gram_hash_positions(hs, par, k)
        u, c = np.unique(g, return_counts=True)
        ui = u.view(np.int64)
        return pa.table(
            {
                "gram": pa.array(ui, pa.int64()),
                "cnt": pa.array(c.astype(np.int64)),
                "gk": pa.array(_coarse_key([ui], n_groups)),
            }
        )

    def dup_in_group(g: pa.Table) -> pa.Table:
        grams = g["gram"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(grams, return_inverse=True)
        tot = np.bincount(inv, weights=cnt, minlength=u.size)
        dup = u[tot >= min_count]
        shard = (dup.view(np.uint64) % np.uint64(n_shards)).astype(np.int64)
        return pa.table({"gram": pa.array(dup, pa.int64()),
                         "shard": pa.array(shard, pa.int64())})

    tmp = out_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)  # zero-dup corpora still need the dir
    (
        docs.map_batches(count_batch, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(dup_in_group, batch_format="pyarrow")
        .write_parquet(tmp, partition_cols=["shard"])
    )
    import pyarrow.dataset as pads

    counts = [0] * n_shards
    # a dup-free corpus writes no files; hive discovery then has no
    # partition column to project, so only read when files exist
    if any(f.endswith(".parquet")
           for _, _, fs in os.walk(tmp) for f in fs):
        tbl = pads.dataset(tmp, partitioning="hive").to_table(
            columns=["shard"])
        if tbl.num_rows:
            sh = tbl["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
            counts = np.bincount(sh, minlength=n_shards).astype(int).tolist()
    result = {"n_grams": int(sum(counts)), "shard_rows": counts}
    os.rename(tmp, out_dir)
    with open(manifest_path + ".tmp", "w") as f:
        json.dump({"params": params, "result": result}, f)
    os.rename(manifest_path + ".tmp", manifest_path)
    return result


class _DupHitStage:
    """Per-round scan of the sharded duplicated-span operator: against ONE
    broadcast gram shard, emit a slim hit row (doc_id, n_tokens, start —
    doc-local) per member gram position; with ``emit_base`` also one
    (doc_id, n_tokens, -1) row per doc so zero-hit docs reach the final
    reduce. Same vectorized kernel as DupSpanStage, no per-row Python."""

    def __init__(self, grams_ref, *, k: int, text_col: str, id_col: str,
                 emit_base: bool):
        self.grams = ray.get(grams_ref)
        self.k = k
        self.text_col = text_col
        self.id_col = id_col
        self.emit_base = emit_base

    def __call__(self, batch: pa.Table) -> pa.Table:
        from splade_ray.ops.textstats import hash_token

        terms, par, doc_lens = tokenize_column(batch[self.text_col])
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        enc = terms.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        if uniq:
            uh = np.array([hash_token(t) for t in uniq], np.uint64)
            hs = uh[enc.indices.to_numpy(zero_copy_only=False)]
        else:
            hs = np.array([], np.uint64)

        n = batch.num_rows
        ids = batch[self.id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        lens = np.asarray(doc_lens, np.int64)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        g, gpar, fi = _gram_hash_positions(hs, par, self.k)
        if self.grams.size and g.size:
            gi = g.view(np.int64)
            idx = np.minimum(np.searchsorted(self.grams, gi),
                             self.grams.size - 1)
            member = self.grams[idx] == gi
        else:
            member = np.zeros(g.size, bool)
        rows = gpar[member]
        starts = fi[member] - offsets[rows]
        out_ids = ids[rows]
        out_len = lens[rows]
        out_start = starts
        if self.emit_base:
            out_ids = np.concatenate([out_ids, ids])
            out_len = np.concatenate([out_len, lens])
            out_start = np.concatenate(
                [out_start, np.full(n, -1, np.int64)])
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "n_tokens": pa.array(out_len, pa.int64()),
                "start": pa.array(out_start, pa.int64()),
            }
        )


def duplicated_spans_sharded(
    docs,
    work_dir: str,
    *,
    k: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    concurrency=None,
    batch_size: int = 2048,
    fingerprint: str | None = None,
):
    """Memory-bounded duplicated-substring scan — the at-scale variant of
    :func:`duplicated_spans` (round-3 VERDICT item 2, the one flagged
    scale-killer): the duplicated-gram set never materializes whole on
    the driver OR in a worker. Pass 1 writes it hash-partitioned into
    ``n_shards`` parquet shards; pass 2 runs one corpus scan per shard,
    broadcasting only that shard (≈1/n_shards of the set) and emitting
    slim (doc_id, n_tokens, start) hit rows; the final reduce is one
    coarse-key groupby over hit rows — proportional to DUPLICATED
    positions, not the token stream. Same output schema and values as
    ``duplicated_spans`` (parity-tested). Trade-off, documented: R shard
    rounds cost R corpus reads — the alternative (shuffling the full gram
    stream) is one corpus-sized all-to-all; pick n_shards so a shard fits
    worker memory and no smaller. ``rewrite`` is not offered here: the
    span cut needs a doc→starts side table; compose the hit rows with a
    join for at-scale rewriting."""
    from splade_ray.ops.dedup import _coarse_key, _shuffle_groups

    grams_dir = os.path.join(work_dir, "dup_grams")
    collect_dup_grams_sharded(
        docs, grams_dir, k=k, min_count=min_count, text_col=text_col,
        n_shards=n_shards, fingerprint=fingerprint,
    )
    import pyarrow.dataset as pads

    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    parts = []
    for r in range(n_shards):
        shard_dir = os.path.join(grams_dir, f"shard={r}")
        if os.path.isdir(shard_dir):
            tbl = pads.dataset(shard_dir).to_table(columns=["gram"])
            shard = np.sort(tbl["gram"].to_numpy(zero_copy_only=False))
        else:
            shard = np.empty(0, np.int64)
        grams_ref = ray.put(shard)
        k_, tc, ic, base = k, text_col, id_col, (r == 0)

        def scan(batch: pa.Table, _ref=grams_ref, _base=base) -> pa.Table:
            return _DupHitStage(_ref, k=k_, text_col=tc, id_col=ic,
                                emit_base=_base)(batch)

        parts.append(docs.map_batches(
            scan, batch_format="pyarrow", batch_size=batch_size, **kwargs))
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.union(p)

    n_groups = _shuffle_groups(None)

    def add_gk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "gk", pa.array(_coarse_key([ids], n_groups)))

    def reduce_group(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        ntok = g["n_tokens"].to_numpy(zero_copy_only=False)
        st = g["start"].to_numpy(zero_copy_only=False)
        order = np.lexsort((st, ids))
        ids, ntok, st = ids[order], ntok[order], st[order]
        hit = st >= 0
        u, first = np.unique(ids, return_index=True)
        base_len = ntok[first]
        # vectorized interval-union over sorted (doc, start) hit rows
        h_ids, h_st = ids[hit], st[hit]
        new_doc = np.r_[True, h_ids[1:] != h_ids[:-1]]
        gap = np.empty(h_st.size, np.int64)
        if h_st.size:
            gap[0] = k
            gap[1:] = np.where(new_doc[1:], k,
                               np.minimum(h_st[1:] - h_st[:-1], k))
        inv = np.searchsorted(u, h_ids)
        n_dup_grams = np.bincount(inv, minlength=u.size)
        n_dup_tokens = np.bincount(inv, weights=gap, minlength=u.size
                                   ).astype(np.int64)
        span_start = new_doc | (gap >= k)
        n_spans = np.bincount(inv[span_start], minlength=u.size)
        return pa.table(
            {
                "doc_id": pa.array(u, pa.int64()),
                "n_tokens": pa.array(base_len, pa.int64()),
                "n_dup_grams": pa.array(n_dup_grams.astype(np.int64)),
                "n_dup_tokens": pa.array(n_dup_tokens),
                "n_spans": pa.array(n_spans.astype(np.int64)),
            }
        )

    return (
        hits.map_batches(add_gk, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(reduce_group, batch_format="pyarrow")
    )


def _cut_spans_batch(
    batch: pa.Table, *, k: int, text_col: str,
    local_starts: np.ndarray, rows: np.ndarray,
) -> pa.Table:
    """Replace ``text_col`` with the token stream minus every window
    ``[start, start+k)`` given as doc-local duplicated-gram starts per
    batch row — the DupSpanStage rewrite kernel with membership supplied
    externally (one bincount-difference cumsum, no per-row Python).
    Duplicate starts are harmless (coverage counts stack)."""
    import pyarrow.compute as pc

    terms, par, doc_lens = tokenize_column(batch[text_col])
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    n = batch.num_rows
    lens = np.asarray(doc_lens, np.int64)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    T = int(offsets[-1])
    starts = np.asarray(local_starts, np.int64) + offsets[
        np.asarray(rows, np.int64)]
    diff = np.bincount(starts, minlength=T + 1).astype(np.int64) - np.bincount(
        starts + k, minlength=T + 1
    ).astype(np.int64)
    covered = np.cumsum(diff[:T]) > 0
    kept = ~covered
    counts_kept = np.bincount(par[kept], minlength=n) if T else np.zeros(
        n, np.int64)
    off2 = np.zeros(n + 1, np.int32)
    np.cumsum(counts_kept, out=off2[1:])
    la = pa.ListArray.from_arrays(
        pa.array(off2, pa.int32()), terms.filter(pa.array(kept))
    )
    new_text = pc.binary_join(la, " ").cast(pa.string())
    idx = batch.schema.get_field_index(text_col)
    return batch.set_column(idx, text_col, new_text)


def drop_duplicated_spans_sharded(
    docs,
    work_dir: str,
    *,
    k: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    broadcast_limit: int = 5_000_000,
    num_partitions: int | None = None,
    concurrency=None,
    batch_size: int = 2048,
    fingerprint: str | None = None,
):
    """The memory-bounded ExactSubstr REWRITE — closes the gap
    :func:`duplicated_spans_sharded` documents ("rewrite is not offered
    here"): same sharded pass 1 (the duplicated-gram set lives
    hash-partitioned on disk, never whole in any worker), per-shard hit
    scans emitting slim doc-local ``(doc_id, start)`` rows, then the span
    cut applied from the UNION of hit rows. Output = the input Dataset
    with ``text_col`` rewritten (all other columns flow through), equal to
    :func:`drop_duplicated_spans` row-for-row (parity-tested).

    The hit table is proportional to DUPLICATED gram positions, not the
    token stream: below ``broadcast_limit`` rows it broadcasts once
    (``ray.put`` of two sorted int64 arrays) and the cut is a zero-shuffle
    second scan; above it, hits aggregate to per-doc start lists on a
    coarse-key groupby and hash-join onto the corpus (the
    drop_near_duplicates join shape — corpus shuffles once). ``work_dir``
    holds the gram shards; pass 1 resumes via its params manifest."""
    from splade_ray.ops.dedup import _coarse_key, _shuffle_groups

    grams_dir = os.path.join(work_dir, "dup_grams")
    collect_dup_grams_sharded(
        docs, grams_dir, k=k, min_count=min_count, text_col=text_col,
        n_shards=n_shards, fingerprint=fingerprint,
    )
    import pyarrow.dataset as pads

    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    parts = []
    for r in range(n_shards):
        shard_dir = os.path.join(grams_dir, f"shard={r}")
        if os.path.isdir(shard_dir):
            tbl = pads.dataset(shard_dir).to_table(columns=["gram"])
            shard = np.sort(tbl["gram"].to_numpy(zero_copy_only=False))
        else:
            shard = np.empty(0, np.int64)
        grams_ref = ray.put(shard)
        k_, tc, ic = k, text_col, id_col

        def scan(batch: pa.Table, _ref=grams_ref) -> pa.Table:
            out = _DupHitStage(_ref, k=k_, text_col=tc, id_col=ic,
                               emit_base=False)(batch)
            return out.select(["doc_id", "start"])

        parts.append(docs.map_batches(
            scan, batch_format="pyarrow", batch_size=batch_size, **kwargs))
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.union(p)

    def cut(batch: pa.Table, local: np.ndarray, rows: np.ndarray) -> pa.Table:
        return _cut_spans_batch(batch, k=k, text_col=text_col,
                                local_starts=local, rows=rows)

    return _apply_doc_hits(
        docs, hits, id_col=id_col, val_col="start", cut_fn=cut,
        broadcast_limit=broadcast_limit, num_partitions=num_partitions,
        batch_size=batch_size, kwargs=kwargs)


def _apply_doc_hits(
    docs,
    hits,
    *,
    id_col: str,
    val_col: str,
    cut_fn,
    broadcast_limit: int,
    num_partitions: int | None,
    batch_size: int,
    kwargs: dict,
):
    """Attach per-doc hit values (a slim ``(doc_id, <val_col>)`` Dataset,
    proportional to DUPLICATED positions/units) back onto the corpus and
    apply ``cut_fn(batch, local_vals, rows)``. Two regimes: at or below
    ``broadcast_limit`` hit rows, broadcast two sorted int64 arrays and
    cut in a zero-shuffle second scan; above it, aggregate per-doc value
    runs (packed as BINARY — Acero joins reject list payloads) on a
    coarse-key groupby and hash-join onto the corpus (the
    drop_near_duplicates join shape; corpus shuffles once)."""
    from splade_ray.ops.dedup import _coarse_key, _shuffle_groups

    hits = hits.materialize()
    n_hits = hits.count()

    if n_hits <= broadcast_limit:
        if n_hits:
            pdf = hits.to_pandas()
            h_ids = pdf["doc_id"].to_numpy(np.int64)
            h_st = pdf[val_col].to_numpy(np.int64)
            order = np.lexsort((h_st, h_ids))
            h_ids, h_st = h_ids[order], h_st[order]
        else:
            h_ids = h_st = np.empty(0, np.int64)
        hits_ref = ray.put((h_ids, h_st))

        def cut_broadcast(batch: pa.Table) -> pa.Table:
            ids_sorted, st_sorted = ray.get(hits_ref)
            bids = batch[id_col].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            lo = np.searchsorted(ids_sorted, bids, "left")
            hi = np.searchsorted(ids_sorted, bids, "right")
            counts = hi - lo
            total = int(counts.sum())
            rows = np.repeat(np.arange(bids.size), counts)
            if total:
                # vectorized multi-range gather: position within each run
                run0 = np.repeat(np.cumsum(counts) - counts, counts)
                idx = np.repeat(lo, counts) + (np.arange(total) - run0)
                local = st_sorted[idx]
            else:
                local = np.empty(0, np.int64)
            return cut_fn(batch, local, rows)

        return docs.map_batches(
            cut_broadcast, batch_format="pyarrow", batch_size=batch_size,
            **kwargs)

    # join regime: per-doc value runs on a coarse-key groupby (bounded
    # group count, vectorized kernel), then one corpus hash-join
    n_groups = _shuffle_groups(None)

    def add_gk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "gk", pa.array(_coarse_key([ids], n_groups)))

    def to_lists(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        st = g[val_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((st, ids))
        ids, st = ids[order], st[order]
        u, counts = np.unique(ids, return_counts=True)
        off = np.zeros(u.size + 1, np.int64)
        np.cumsum(counts, out=off[1:])
        data = pa.py_buffer(np.ascontiguousarray(st, np.int64).tobytes())
        boff = pa.py_buffer((off * 8).astype(np.int32).tobytes())
        ba = pa.Array.from_buffers(pa.binary(), u.size, [None, boff, data])
        return pa.table({"__dup_doc": pa.array(u, pa.int64()),
                         "__dup_starts": ba})

    starts_tbl = (
        hits.map_batches(add_gk, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(to_lists, batch_format="pyarrow")
    )
    from splade_ray.prune import join_partitions

    n_parts = join_partitions(num_partitions)
    # both sides repartition: the Ray 2.49 empty-partition join workaround
    # (see ops/cluster.drop_near_duplicates)
    joined = docs.repartition(n_parts).join(
        starts_tbl.repartition(n_parts),
        join_type="left_outer",
        num_partitions=n_parts,
        on=(id_col,),
        right_on=("__dup_doc",),
    )

    def cut_joined(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch["__dup_starts"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, b"")
        lens = (pc.binary_length(col).to_numpy(zero_copy_only=False)
                .astype(np.int64) // 8)
        rows = np.repeat(np.arange(batch.num_rows), lens)
        local = np.frombuffer(b"".join(col.to_pylist()), np.int64)
        gone = [c for c in ("__dup_doc", "__dup_starts")
                if c in batch.column_names]
        return cut_fn(batch.drop_columns(gone), local, rows)

    return joined.map_batches(
        cut_joined, batch_format="pyarrow", batch_size=batch_size, **kwargs)


def _doc_units(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized sentence-unit extraction: split the LOWERED text on the
    sentence pattern (snippets.SENT_SPLIT_RE — chars outside every
    analyzer's token class), normalize each chunk to its analyzed-token
    join, drop empty units. Returns (unit strings, parent row indices,
    per-row unit counts) — all Arrow kernels except the final to_numpy."""
    import pyarrow.compute as pc

    from splade_ray.snippets import SENT_SPLIT_PATTERN

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    from splade_ray.analysis import SPLIT_PATTERN

    chunks = pc.split_pattern_regex(pc.utf8_lower(texts), SENT_SPLIT_PATTERN)
    flat = pc.list_flatten(chunks)
    parents = pc.list_parent_indices(chunks).to_numpy(zero_copy_only=False)
    # normalize each chunk: analyzed tokens re-joined with single spaces
    # (split on the complement class ≡ findall; empty split tokens leave
    # stray joiners, removed by the trim + collapse pass)
    toks = pc.split_pattern_regex(flat, SPLIT_PATTERN)
    unit = pc.binary_join(toks, " ")
    unit = pc.utf8_trim(unit, " ")
    unit = pc.replace_substring_regex(unit, pattern="  +", replacement=" ")
    u = unit.to_numpy(zero_copy_only=False)
    keep = np.array([bool(x) for x in u])
    counts = np.bincount(parents[keep], minlength=n).astype(np.int64)
    return u[keep], parents[keep].astype(np.int64), counts


def unit_dedup(
    docs,
    *,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "shuffle",
    rewrite: bool = False,
    replace: bool = False,
    batch_size: int = 2048,
    concurrency=None,
):
    """Sub-document (sentence-unit) deduplication — the Dolma
    paragraph-dedup / C4 sentence-dedup shape: a unit is a sentence chunk
    (split on the shared snippets sentence pattern) normalized to its
    analyzed-token join; units occurring >= ``min_count`` times across
    the corpus (within-doc repeats count) are duplicated. Returns per doc
    (doc_id, n_units, n_dup_units); with ``rewrite=True`` adds
    ``text_dedup`` — the kept (non-duplicated) units' normalized strings
    re-joined (the C4 sentence-cut, under this repo's documented
    lowercased-token-join rewrite normalization); ``replace=True``
    returns the ORIGINAL batch with ``text_col`` swapped for the
    deduplicated text (the in-place curate-stage face, the
    drop_duplicated_spans contract).

    Scale shape = the exact_dedup/collect_dup_grams recipe: pass 1 ships
    only (sha-prefix coarse key, unit sha256, count) combiner rows through
    ONE groupby; pass 2 broadcasts the duplicated-unit keys (sorted uint64
    sha prefixes + exact hex set — the incremental_dedup membership
    recipe) and streams the corpus with zero shuffle. Unit keys are full
    sha256 strings, so engine counts equal the SQL mirror's
    group-by-string counts."""
    import pyarrow.compute as pc

    from splade_ray.codec import sha256_hex
    from splade_ray.ops.dedup import sha_prefix_u64

    if method != "shuffle":
        raise ValueError(f"unknown method {method!r}")
    rewrite = rewrite or replace

    def unit_rows(batch: pa.Table) -> pa.Table:
        units, _, _ = _doc_units(batch[text_col])
        shas = np.array(sha256_hex(units.tolist()), object)
        u, c = np.unique(shas, return_counts=True)
        return pa.table(
            {
                "gk": pa.array([s[:4] for s in u], pa.string()),
                "sha": pa.array(u, pa.string()),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    def dup_in_group(g: pa.Table) -> pa.Table:
        # hash-shuffle partitions that received no rows emit schema-less
        # empty blocks (the ops/dedup.py _conform_pairs lesson)
        if g.num_rows == 0 or "sha" not in g.column_names:
            return pa.table({"sha": pa.array([], pa.string())})
        sha = np.asarray(g["sha"].to_numpy(zero_copy_only=False))
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(sha, return_inverse=True)
        tot = np.bincount(inv, weights=cnt, minlength=u.size)
        return pa.table({"sha": pa.array(u[tot >= min_count], pa.string())})

    dup = (
        docs.map_batches(unit_rows, batch_format="pyarrow",
                         batch_size=batch_size)
        .groupby("gk")
        .map_groups(dup_in_group, batch_format="pyarrow")
        .to_pandas()
    )
    # an all-unique corpus leaves a schema-less empty frame behind
    dup_set = set(dup["sha"].tolist()) if "sha" in dup.columns else set()
    dup_prefix = np.sort(sha_prefix_u64(sorted(dup_set)))
    ref = ray.put((dup_prefix, dup_set))

    def scan(batch: pa.Table) -> pa.Table:
        prefixes, refs = ray.get(ref)
        units, parents, counts = _doc_units(batch[text_col])
        n = batch.num_rows
        shas = sha256_hex(units.tolist())
        is_dup = np.zeros(len(shas), bool)
        if prefixes.size and shas:
            pref = sha_prefix_u64(shas)
            cand = np.flatnonzero(np.isin(pref, prefixes))
            if cand.size:
                hits = np.fromiter(
                    (shas[i] in refs for i in cand), bool, cand.size)
                is_dup[cand[hits]] = True
        n_dup = np.bincount(parents[is_dup], minlength=n).astype(np.int64)
        cols = {
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_units": pa.array(counts, pa.int64()),
            "n_dup_units": pa.array(n_dup, pa.int64()),
        }
        if rewrite:
            kept = ~is_dup
            kept_counts = np.bincount(parents[kept], minlength=n)
            offsets = np.zeros(n + 1, np.int32)
            np.cumsum(kept_counts, out=offsets[1:])
            la = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                pa.array(units[kept], pa.string()),
            )
            cols["text_dedup"] = pc.binary_join(la, " ")
        if replace:
            idx = batch.schema.get_field_index(text_col)
            return batch.set_column(
                idx, text_col, cols["text_dedup"].cast(pa.string()))
        return pa.table(cols)

    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    return docs.map_batches(scan, batch_format="pyarrow",
                            batch_size=batch_size, **kwargs)


def collect_dup_units_sharded(
    docs,
    out_dir: str,
    *,
    min_count: int = 2,
    text_col: str = "text",
    n_shards: int = 8,
    fingerprint: str | None = None,
) -> dict:
    """Pass 1 of the SHARDED sentence-unit dedup: duplicated-unit keys
    (full sha256 hex, exactly :func:`unit_dedup`'s identity) written
    hash-partitioned into ``out_dir/shard=N/`` — the per-round broadcast
    of :func:`unit_dedup_sharded` is then ~1/n_shards of the set, so
    duplicated-unit mass no longer bounds worker memory (the
    collect_dup_grams_sharded treatment applied to units). Shard key =
    sha-prefix uint64 mod n_shards. Params manifest validates resume."""
    import json

    from splade_ray.codec import sha256_hex
    from splade_ray.ops.dedup import sha_prefix_u64

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    params = {"min_count": int(min_count), "n_shards": int(n_shards),
              "text_col": str(text_col)}
    if fingerprint is not None:
        params["fingerprint"] = str(fingerprint)
    manifest_path = os.path.join(out_dir, "_params.json")
    cached = _validate_shard_manifest(out_dir, manifest_path, params, "units")
    if cached is not None:
        return cached

    def unit_rows(batch: pa.Table) -> pa.Table:
        units, _, _ = _doc_units(batch[text_col])
        shas = np.array(sha256_hex(units.tolist()), object)
        u, c = np.unique(shas, return_counts=True)
        return pa.table({
            "gk": pa.array([s[:4] for s in u], pa.string()),
            "sha": pa.array(u, pa.string()),
            "cnt": pa.array(c.astype(np.int64)),
        })

    def dup_in_group(g: pa.Table) -> pa.Table:
        empty = pa.table({"sha": pa.array([], pa.string()),
                          "shard": pa.array([], pa.int64())})
        if g.num_rows == 0 or "sha" not in g.column_names:
            return empty
        sha = np.asarray(g["sha"].to_numpy(zero_copy_only=False))
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(sha, return_inverse=True)
        tot = np.bincount(inv, weights=cnt, minlength=u.size)
        dup = u[tot >= min_count]
        if not dup.size:
            return empty
        shard = (sha_prefix_u64(dup.tolist()) % np.uint64(n_shards)
                 ).astype(np.int64)
        return pa.table({"sha": pa.array(dup, pa.string()),
                         "shard": pa.array(shard, pa.int64())})

    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    (
        docs.map_batches(unit_rows, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(dup_in_group, batch_format="pyarrow")
        .write_parquet(tmp, partition_cols=["shard"])
    )
    import pyarrow.dataset as pads

    counts = [0] * n_shards
    # dup-free corpus: no files -> no hive partition column to project
    if any(f.endswith(".parquet")
           for _, _, fs in os.walk(tmp) for f in fs):
        tbl = pads.dataset(tmp, partitioning="hive").to_table(
            columns=["shard"])
        if tbl.num_rows:
            sh = tbl["shard"].to_numpy(zero_copy_only=False).astype(np.int64)
            counts = np.bincount(sh, minlength=n_shards).astype(int).tolist()
    result = {"n_units": int(sum(counts)), "shard_rows": counts}
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    with open(manifest_path + ".tmp", "w") as f:
        json.dump({"params": params, "result": result}, f)
    os.rename(manifest_path + ".tmp", manifest_path)
    return result


def unit_dedup_sharded(
    docs,
    work_dir: str,
    *,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 8,
    broadcast_limit: int = 5_000_000,
    num_partitions: int | None = None,
    replace: bool = True,
    batch_size: int = 2048,
    concurrency=None,
    fingerprint: str | None = None,
):
    """Memory-bounded sentence-unit dedup REWRITE — the at-scale variant
    of :func:`unit_dedup(replace=True)` (fresh round-5 candidate (a)):
    the duplicated-unit key set never materializes whole on the driver OR
    in a worker. Pass 1 (:func:`collect_dup_units_sharded`) writes it
    hash-partitioned; one corpus scan per shard broadcasts ~1/n_shards of
    the keys and emits slim ``(doc_id, uidx)`` hit rows (unit ordinal
    within doc); the cut applies from the union of hits via the shared
    :func:`_apply_doc_hits` machinery (broadcast below
    ``broadcast_limit`` hit rows, per-doc run hash-join above). Output =
    the input Dataset with ``text_col`` rewritten to the kept units'
    normalized join (parity-tested vs unit_dedup). ``replace=False``
    emits (doc_id, n_units, n_dup_units) stats instead."""
    from splade_ray.codec import sha256_hex
    from splade_ray.ops.dedup import sha_prefix_u64

    units_dir = os.path.join(work_dir, "dup_units")
    collect_dup_units_sharded(
        docs, units_dir, min_count=min_count, text_col=text_col,
        n_shards=n_shards, fingerprint=fingerprint,
    )
    import pyarrow.dataset as pads

    kwargs = {} if concurrency is None else {"concurrency": concurrency}
    parts = []
    for r in range(n_shards):
        shard_dir = os.path.join(units_dir, f"shard={r}")
        if os.path.isdir(shard_dir):
            tbl = pads.dataset(shard_dir).to_table(columns=["sha"])
            shas = sorted(tbl["sha"].to_pylist())
        else:
            shas = []
        ref = ray.put((np.sort(sha_prefix_u64(shas)), set(shas)))

        def scan(batch: pa.Table, _ref=ref) -> pa.Table:
            prefixes, refs = ray.get(_ref)
            units, parents, _ = _doc_units(batch[text_col])
            bids = batch[id_col].cast(pa.int64()).to_numpy(
                zero_copy_only=False)
            shas_b = sha256_hex(units.tolist())
            is_dup = np.zeros(len(shas_b), bool)
            if prefixes.size and shas_b:
                pref = sha_prefix_u64(shas_b)
                cand = np.flatnonzero(np.isin(pref, prefixes))
                if cand.size:
                    hits_m = np.fromiter(
                        (shas_b[i] in refs for i in cand), bool, cand.size)
                    is_dup[cand[hits_m]] = True
            # unit ordinal within its doc (parents is doc-grouped order)
            cnts = np.bincount(parents, minlength=batch.num_rows)
            run0 = np.repeat(np.cumsum(cnts) - cnts, cnts)
            uidx = np.arange(parents.size) - run0
            return pa.table({
                "doc_id": pa.array(bids[parents[is_dup]], pa.int64()),
                "uidx": pa.array(uidx[is_dup], pa.int64()),
            })

        parts.append(docs.map_batches(
            scan, batch_format="pyarrow", batch_size=batch_size, **kwargs))
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.union(p)

    def cut(batch: pa.Table, local: np.ndarray, rows: np.ndarray) -> pa.Table:
        import pyarrow.compute as pc

        units, parents, counts = _doc_units(batch[text_col])
        n = batch.num_rows
        lens = np.asarray(counts, np.int64)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens, out=offsets[1:])
        is_dup = np.zeros(parents.size, bool)
        flat = np.asarray(local, np.int64) + offsets[np.asarray(rows, np.int64)]
        is_dup[flat] = True
        if not replace:
            n_dup = np.bincount(parents[is_dup], minlength=n).astype(np.int64)
            return pa.table({
                "doc_id": batch[id_col].cast(pa.int64()),
                "n_units": pa.array(lens, pa.int64()),
                "n_dup_units": pa.array(n_dup, pa.int64()),
            })
        kept = ~is_dup
        kept_counts = np.bincount(parents[kept], minlength=n)
        off2 = np.zeros(n + 1, np.int32)
        np.cumsum(kept_counts, out=off2[1:])
        la = pa.ListArray.from_arrays(
            pa.array(off2, pa.int32()), pa.array(units[kept], pa.string()))
        new_text = pc.binary_join(la, " ").cast(pa.string())
        idx = batch.schema.get_field_index(text_col)
        return batch.set_column(idx, text_col, new_text)

    return _apply_doc_hits(
        docs, hits, id_col=id_col, val_col="uidx", cut_fn=cut,
        broadcast_limit=broadcast_limit, num_partitions=num_partitions,
        batch_size=batch_size, kwargs=kwargs)


# --------------------------------------------------------------------------
# PII / regex redaction
# --------------------------------------------------------------------------

# Conservative RE2-safe PII patterns (both pyarrow.compute and DuckDB use
# RE2, so the exact same pattern strings drive kernel and oracle).
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\+?\d[\d\-() ]{7,}\d\b",
}


def redact_batch(
    batch: pa.Table,
    *,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
) -> pa.Table:
    """Per-doc redaction scan: for each (label, regex) in sorted label
    order, count non-overlapping matches on the current text and replace
    them with ``<LABEL>``. Emits the match count per label plus the
    redacted text. Vectorized RE2 kernels; sequential label order is part
    of the contract (a later pattern sees earlier replacements), matching
    a nested ``regexp_replace`` SQL mirror."""
    import pyarrow.compute as pc

    pats = PII_PATTERNS if patterns is None else patterns
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    cols: dict[str, pa.Array] = {"doc_id": batch["doc_id"].cast(pa.int64())}
    for label in sorted(pats):
        pat = pats[label]
        cnt = pc.count_substring_regex(texts, pat).fill_null(0)
        cols[f"n_{label}"] = cnt.cast(pa.int64())
        texts = pc.replace_substring_regex(texts, pat, f"<{label.upper()}>")
    cols["text_redacted"] = texts
    return pa.table(cols)


# --------------------------------------------------------------------------
# DSIR importance resampling (Xie et al., NeurIPS 2023: "Data Selection for
# Language Models via Importance Resampling")
# --------------------------------------------------------------------------
#
# Select raw-corpus documents that look like a target corpus: fit hashed
# n-gram (unigram+bigram) bag distributions p (target) and q (raw), weight
# each raw doc by log w = sum_grams [ln p_b - ln q_b], and resample with
# Gumbel top-k. Scale shape:
#   - the FIT is batch-local bincount partials -> one bucket-keyed groupby
#     (<= n_buckets rows cross the shuffle, not grams);
#   - the SCORE is a pure streaming scan against a ray.put-broadcast
#     log-ratio table (n_buckets float64s, read once per actor);
#   - the SELECT keeps the Gumbel key a pure function of the doc id (the
#     ops/sample.py multiplicative hash), so membership is partitioning-
#     and rerun-invariant, and only per-batch top-k candidates (k rows per
#     block) leave the scan.
# Gram hashing = sha256-prefix (ops/textstats.hash_token) mod n_buckets, so
# counts, weights and selection all have exact DuckDB mirrors.


def hashed_ngram_buckets(
    texts: pa.Array | pa.ChunkedArray, *, n_buckets: int, max_gram: int = 2
) -> tuple[np.ndarray, np.ndarray]:
    """Flat hashed-feature bucket codes for every 1..max_gram token gram of
    a string column, plus each gram's row index. Only UNIQUE TOKENS pay a
    sha256 call (dictionary encode); k-grams are the vectorized FNV rolling
    fold over the flat token-hash array (``_gram_hash_positions``, the
    dup_spans kernel) — no per-gram Python, and the fold has an exact
    HUGEINT SQL mirror. A k=1 "gram" folds to the raw token hash."""
    from splade_ray.ops.dedup import _flat_token_hashes

    hs, par, _ = _flat_token_hashes(texts)
    nb = np.uint64(n_buckets)
    codes_parts: list[np.ndarray] = []
    par_parts: list[np.ndarray] = []
    for k in range(1, max_gram + 1):
        g, gp, _ = _gram_hash_positions(hs, par, k)
        if g.size == 0:
            continue
        codes_parts.append((g % nb).astype(np.int64))
        par_parts.append(gp)
    if not codes_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(codes_parts), np.concatenate(par_parts)


def dsir_bucket_counts(
    docs,
    *,
    n_buckets: int = 65536,
    max_gram: int = 2,
    text_col: str = "text",
) -> np.ndarray:
    """Global hashed-feature counts (the DSIR distribution fit) as an
    n_buckets int64 vector. Batch-local bincount partials shrink each block
    to its nonzero (bucket, cnt) rows; one bucket groupby sums them — the
    shuffle carries <= n_buckets · n_blocks 16-byte rows, never grams."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        codes, _ = hashed_ngram_buckets(
            batch[text_col], n_buckets=n_buckets, max_gram=max_gram
        )
        cnt = np.bincount(codes, minlength=n_buckets)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"bucket": pa.array(nz, pa.int64()), "cnt": pa.array(cnt[nz], pa.int64())}
        )

    pdf = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .sum("cnt")
        .to_pandas()
    )
    vec = np.zeros(n_buckets, np.int64)
    if len(pdf):
        vec[pdf["bucket"].to_numpy()] = pdf["sum(cnt)"].to_numpy()
    return vec


def dsir_log_lut(
    target_counts: np.ndarray, raw_counts: np.ndarray, *, smoothing: float = 1.0
) -> np.ndarray:
    """Per-bucket log importance ratio ln p_b - ln q_b with Laplace
    smoothing: p_b = (tc_b + s) / (T + s·m), q_b likewise over the raw fit."""
    if target_counts.shape != raw_counts.shape:
        raise ValueError("count vectors must share n_buckets")
    m = target_counts.size
    t_tot = float(target_counts.sum()) + smoothing * m
    r_tot = float(raw_counts.sum()) + smoothing * m
    return np.log((target_counts + smoothing) / t_tot) - np.log(
        (raw_counts + smoothing) / r_tot
    )


class DsirScoreStage:
    """Actor-pool scan scoring each doc's log importance weight against the
    broadcast log-ratio table (fetched once per actor in __init__)."""

    def __init__(self, lut_ref, *, n_buckets: int, max_gram: int,
                 text_col: str, id_col: str):
        self.lut = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) else lut_ref
        self.n_buckets = n_buckets
        self.max_gram = max_gram
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_feats": pa.array([], pa.int64()),
                    "log_weight": pa.array([], pa.float64()),
                }
            )
        codes, par = hashed_ngram_buckets(
            batch[self.text_col], n_buckets=self.n_buckets, max_gram=self.max_gram
        )
        n_feats = np.bincount(par, minlength=n).astype(np.int64)
        logw = np.bincount(par, weights=self.lut[codes], minlength=n)
        return pa.table(
            {
                "doc_id": batch[self.id_col].cast(pa.int64()),
                "n_feats": pa.array(n_feats, pa.int64()),
                "log_weight": pa.array(logw, pa.float64()),
            }
        )


def dsir_log_weights(
    raw_docs,
    lut: np.ndarray,
    *,
    max_gram: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
):
    """(doc_id, n_feats, log_weight) for every raw doc — a pure streaming
    scan; the lut broadcasts once via ray.put."""
    lut_ref = ray.put(np.asarray(lut, np.float64))
    return raw_docs.map_batches(
        DsirScoreStage,
        batch_format="pyarrow",
        fn_constructor_kwargs={
            "lut_ref": lut_ref,
            "n_buckets": int(lut.size),
            "max_gram": max_gram,
            "text_col": text_col,
            "id_col": id_col,
        },
        concurrency=concurrency or (1, 8),
    )


def dsir_importance(
    raw_docs,
    target_docs,
    *,
    n_buckets: int = 65536,
    max_gram: int = 2,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = None,
):
    """End-to-end DSIR weighting: fit target + raw hashed-n-gram
    distributions, then score every raw doc. Returns the weights Dataset."""
    tc = dsir_bucket_counts(
        target_docs, n_buckets=n_buckets, max_gram=max_gram, text_col=text_col
    )
    rc = dsir_bucket_counts(
        raw_docs, n_buckets=n_buckets, max_gram=max_gram, text_col=text_col
    )
    lut = dsir_log_lut(tc, rc, smoothing=smoothing)
    return dsir_log_weights(
        raw_docs, lut, max_gram=max_gram, text_col=text_col, id_col=id_col,
        concurrency=concurrency,
    )


def ngram_lm_fit(
    ref_docs,
    *,
    n: int = 2,
    n_buckets: int = 65536,
    text_col: str = "text",
) -> dict:
    """Fit a hashed add-alpha n-gram language model over a reference corpus
    — the CCNet quality-LM recipe (Wenzek et al. 2020: score documents by
    the perplexity of an LM trained on a trusted reference; their KenLM is
    replaced here by a hashed add-alpha model so the whole fit is two
    integer count vectors with an exact SQL mirror).

    Counts use the DSIR feature machinery: token hash = sha256 prefix paid
    once per UNIQUE token, k-gram hash = vectorized FNV rolling fold
    (HUGEINT-mirrorable). ``gram`` counts every n-gram occurrence, ``ctx``
    every (n-1)-gram occurrence (for n=1 the context is the scalar token
    total). ONE streaming pass: batch-local bincount partials, one
    (order, bucket) groupby — the shuffle carries <= 2 x n_buckets x blocks
    24-byte rows, never grams.

    Returns ``{"n", "n_buckets", "gram": int64[nb], "ctx": int64[nb] | int}``.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    from splade_ray.ops.dedup import _flat_token_hashes

    nb = np.uint64(n_buckets)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "order": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        hs, par, _ = _flat_token_hashes(batch[text_col])
        orders, buckets, cnts = [], [], []

        def add(order: int, codes: np.ndarray) -> None:
            c = np.bincount(codes, minlength=n_buckets)
            z = np.flatnonzero(c)
            orders.append(np.full(z.size, order, np.int64))
            buckets.append(z.astype(np.int64))
            cnts.append(c[z].astype(np.int64))

        g, _, _ = _gram_hash_positions(hs, par, n)
        if g.size:
            add(n, (g % nb).astype(np.int64))
        if n > 1:
            c, _, _ = _gram_hash_positions(hs, par, n - 1)
            if c.size:
                add(n - 1, (c % nb).astype(np.int64))
        elif hs.size:
            # n=1: the "context" is the corpus token total
            orders.append(np.zeros(1, np.int64))
            buckets.append(np.zeros(1, np.int64))
            cnts.append(np.array([hs.size], np.int64))
        if not orders:
            return empty
        return pa.table(
            {
                "order": pa.array(np.concatenate(orders)),
                "bucket": pa.array(np.concatenate(buckets)),
                "cnt": pa.array(np.concatenate(cnts)),
            }
        )

    pdf = (
        ref_docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["order", "bucket"])
        .sum("cnt")
        .to_pandas()
    )
    gram = np.zeros(n_buckets, np.int64)
    ctx: np.ndarray | int
    if n > 1:
        ctx = np.zeros(n_buckets, np.int64)
    else:
        ctx = 0
    for order, bucket, cnt in zip(pdf["order"], pdf["bucket"], pdf["sum(cnt)"]):
        if order == n:
            gram[bucket] = cnt
        elif n > 1:
            ctx[bucket] = cnt
        else:
            ctx = int(cnt)
    return {"n": n, "n_buckets": n_buckets, "gram": gram, "ctx": ctx}


class _NgramLMScoreStage:
    """Actor-pool scoring stage: the fit vectors are ray.put once and read
    per actor, docs stream through — zero shuffle."""

    def __init__(self, fit_ref, *, alpha: float, text_col: str, id_col: str):
        import ray

        self.fit = ray.get(fit_ref)
        self.alpha = alpha
        self.text_col = text_col
        self.id_col = id_col

    def _score_arrays(self, batch: pa.Table):
        """(n_scored, logprob, ppl) arrays aligned to the batch rows."""
        from splade_ray.ops.dedup import _flat_token_hashes

        fit = self.fit
        n, nbi = fit["n"], fit["n_buckets"]
        nb = np.uint64(nbi)
        alpha = self.alpha
        hs, par, _ = _flat_token_hashes(batch[self.text_col])
        ndocs = batch.num_rows
        g, gp, fi = _gram_hash_positions(hs, par, n)
        lp_doc = np.zeros(ndocs, np.float64)
        nsc = np.zeros(ndocs, np.int64)
        if g.size:
            num = fit["gram"][(g % nb).astype(np.int64)].astype(np.float64)
            if n > 1:
                # context of the gram starting at flat position i is the
                # (n-1)-gram at the SAME start — recompute the full
                # (unmasked) fold and index it by the grams' start offsets
                P = np.uint64(1099511628211)
                m = hs.size - (n - 1) + 1
                with np.errstate(over="ignore"):
                    roll = np.zeros(m, np.uint64)
                    for i in range(n - 1):
                        roll = roll * P + hs[i : i + m]
                den = fit["ctx"][(roll[fi] % nb).astype(np.int64)].astype(np.float64)
            else:
                den = np.full(g.size, float(fit["ctx"]))
            logp = np.log(num + alpha) - np.log(den + alpha * nbi)
            lp_doc = np.bincount(gp, weights=logp, minlength=ndocs)
            nsc = np.bincount(gp, minlength=ndocs)
        ppl = np.zeros(ndocs, np.float64)
        scored = nsc > 0
        ppl[scored] = np.exp(-lp_doc[scored] / nsc[scored])
        return nsc, lp_doc, ppl

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_scored": pa.array([], pa.int64()),
                    "logprob": pa.array([], pa.float64()),
                    "ppl": pa.array([], pa.float64()),
                }
            )
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nsc, lp_doc, ppl = self._score_arrays(batch)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_scored": pa.array(nsc, pa.int64()),
                "logprob": pa.array(lp_doc, pa.float64()),
                "ppl": pa.array(ppl, pa.float64()),
            }
        )


class _PplFilterStage(_NgramLMScoreStage):
    """Score-and-filter in one streaming pass: keeps rows whose perplexity
    is <= max_ppl (unscored rows — shorter than the gram order — are kept;
    they carry no LM signal). All source columns flow through."""

    def __init__(self, fit_ref, *, alpha, text_col, id_col, max_ppl):
        super().__init__(fit_ref, alpha=alpha, text_col=text_col, id_col=id_col)
        self.max_ppl = max_ppl

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        nsc, _, ppl = self._score_arrays(batch)
        keep = (nsc == 0) | (ppl <= self.max_ppl)
        return batch.filter(pa.array(keep))


def ppl_filter(
    docs,
    fit: dict,
    *,
    max_ppl: float,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """CCNet-style LM quality filter (Wenzek et al. 2020): keep docs whose
    perplexity under the :func:`ngram_lm_fit` reference model is
    <= ``max_ppl``. One stateless streaming scan — the fit is broadcast
    once, per-doc scores are never collected anywhere."""
    import ray

    fit_ref = ray.put(fit)
    return docs.map_batches(
        _PplFilterStage,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs=dict(
            fit_ref=fit_ref, alpha=alpha, text_col=text_col, id_col=id_col,
            max_ppl=max_ppl,
        ),
    )


def ngram_lm_scores(
    docs,
    fit: dict,
    *,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-doc log-likelihood and perplexity under a :func:`ngram_lm_fit`
    model: for each position with a full n-token context,
    ``ln((c(gram)+alpha) / (c(ctx)+alpha*n_buckets))``; ``ppl =
    exp(-logprob/n_scored)``. Docs shorter than n tokens score
    (n_scored=0, logprob=0, ppl=0) — sentinels, kept by filters.
    Returns a Dataset of (doc_id, n_scored, logprob, ppl); streaming scan,
    fit vectors broadcast once via ray.put."""
    import ray

    fit_ref = ray.put(fit)
    return docs.map_batches(
        _NgramLMScoreStage,
        batch_format="pyarrow",
        concurrency=(1, 8),
        fn_constructor_kwargs=dict(
            fit_ref=fit_ref, alpha=alpha, text_col=text_col, id_col=id_col
        ),
    )


def dsir_select(
    weights,
    k: int,
    *,
    seed: int = 0,
    id_col: str = "doc_id",
    merge: str = "driver",
    fan_in: int = 32,
) -> "pd.DataFrame":
    """Gumbel top-k resampling over the weights table: key =
    log_weight + Gumbel(h(id)) with the Gumbel variate a PURE FUNCTION of
    the id (u = (bucket(id) + 0.5) / 2^20 over the ops/sample.py
    multiplicative hash; g = -ln(-ln u)) — deterministic, partitioning- and
    rerun-invariant, and exactly SQL-mirrorable. Per-batch local top-k
    bounds the driver merge to k rows per block (the bottomk_sample shape).
    Ties break (key desc, doc_id asc).

    ``merge="driver"`` (default) concatenates the k-per-block candidates on
    the driver — fine up to k x blocks rows. ``merge="tree"`` is the
    billion-doc path: candidates repartition into ``fan_in`` blocks, each
    re-pruned to its top-k, then one final task merges fan_in x k rows — the
    driver only ever receives the final k rows. Top-k selection is
    idempotent under re-pruning, so both modes return identical frames."""
    import pandas as pd

    from splade_ray.ops.sample import BUCKETS, _buckets

    def local_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "log_weight": pa.array([], pa.float64()),
                    "key": pa.array([], pa.float64()),
                }
            )
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        logw = batch["log_weight"].to_numpy(zero_copy_only=False).astype(np.float64)
        u = (_buckets(ids, seed) + 0.5) / BUCKETS
        key = logw - np.log(-np.log(u))
        order = np.lexsort((ids, -key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order], pa.int64()),
                "log_weight": pa.array(logw[order], pa.float64()),
                "key": pa.array(key[order], pa.float64()),
            }
        )

    cand = weights.map_batches(local_topk, batch_format="pyarrow")
    if merge == "tree":
        # the re-prune keys off the already-computed `key` column so the
        # Gumbel variates are never recomputed from a differently-typed id
        def reprune(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return batch
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            key = batch["key"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, -key))[:k]
            return batch.take(pa.array(np.sort(order)))

        # batch_size=None = whole block per batch, so each level emits
        # EXACTLY top-k per block and the final task sees fan_in x k rows
        cand = (
            cand.repartition(fan_in)
            .map_batches(reprune, batch_format="pyarrow", batch_size=None)
            .repartition(1)
            .map_batches(reprune, batch_format="pyarrow", batch_size=None)
        )
    elif merge != "driver":
        raise ValueError(f"merge must be 'driver' or 'tree', got {merge!r}")
    pdf = cand.to_pandas()
    if pdf.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype=np.int64),
                "log_weight": pd.Series([], dtype=np.float64),
                "key": pd.Series([], dtype=np.float64),
            }
        )
    pdf = pdf.sort_values(["key", "doc_id"], ascending=[False, True],
                          kind="mergesort").head(k)
    return pdf.reset_index(drop=True)
