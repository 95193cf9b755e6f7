"""Quantized in-index scoring — the reference's PISA quantized-scorer recipe
(``efficient_splade_pisa/README.md:48-60``): doc-side BM25 impacts are
quantized to small ints at index time and query-time accumulation runs in
integer arithmetic over varbyte-compressed impact streams.

Parity definition (documented, oracle-checked): the quantized run score is
``score_q(q, d) = Σ_t qtf(t) · impact_q(t, d)`` with
``impact_q = floor(idf · tf_component · factor + 0.5) > 0`` — exactly the
values of the ``quantized_export`` table — so the DuckDB oracle reproduces
run scores bit-for-bit as BIGINTs (no float comparison anywhere). Relative
to the float scorer the *ranking* may differ within quantization error;
that trade is the whole point of the PISA quantized runs, and the factor
controls it.

Build shape: one Ray task per segment (resumable — skips segments whose
``postings_q.parquet`` already exists); global df comes from the index
lexicon via a partition-pruned ``isin`` read of the segment's own terms, so
no vocab-sized state is broadcast.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray.data as rd

from splade_ray.bm25 import BM25Params, idf_bulk, tf_component, topk_from_scores
from splade_ray.codec import varbyte_decode, varbyte_encode
from splade_ray.segments import BLOCK_SIZE, decode_posting

QUANT_FACTOR = 100

QUANT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("docs_enc", pa.binary()),
        ("imps_enc", pa.binary()),
        ("bm_first_doc", pa.list_(pa.int64())),
        ("bm_last_doc", pa.list_(pa.int64())),
        ("bm_imp_max", pa.list_(pa.int64())),
        ("bm_doc_off", pa.list_(pa.int64())),
        ("bm_imp_off", pa.list_(pa.int64())),
    ]
)


def encode_quantized_posting(
    doc_ids: np.ndarray, imps: np.ndarray, block_size: int = BLOCK_SIZE
) -> dict:
    """Delta+varbyte doc ids and varbyte impacts, per-block impact maxima
    (the quantized analog of the tf/dl block bounds — here the bound IS the
    impact, no query-time evaluation needed)."""
    n = doc_ids.size
    docs_parts, imp_parts = [], []
    first, last, imp_max = [], [], []
    doc_off, imp_off = [0], [0]
    prev_last = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        blk = doc_ids[s:e]
        deltas = np.empty(e - s, np.int64)
        deltas[0] = blk[0] - prev_last
        np.subtract(blk[1:], blk[:-1], out=deltas[1:])
        docs_parts.append(varbyte_encode(deltas))
        imp_parts.append(varbyte_encode(imps[s:e]))
        first.append(int(blk[0]))
        last.append(int(blk[-1]))
        imp_max.append(int(imps[s:e].max()))
        doc_off.append(doc_off[-1] + len(docs_parts[-1]))
        imp_off.append(imp_off[-1] + len(imp_parts[-1]))
        prev_last = int(blk[-1])
    return {
        "df": n,
        "docs_enc": b"".join(docs_parts),
        "imps_enc": b"".join(imp_parts),
        "bm_first_doc": first,
        "bm_last_doc": last,
        "bm_imp_max": imp_max,
        "bm_doc_off": doc_off,
        "bm_imp_off": imp_off,
    }


def _quantize_segment(
    seg_dir: str,
    lexicon_dir: str,
    n_docs: int,
    avgdl: float,
    params: BM25Params,
    factor: int,
    block_size: int,
) -> int:
    """Quantize one segment's postings; returns the number of terms kept."""
    postings = pq.read_table(os.path.join(seg_dir, "postings.parquet"))
    dl_tbl = pq.read_table(
        os.path.join(seg_dir, "doclens.parquet"), columns=["doc_id", "doc_len"]
    )
    seg_doc_ids = dl_tbl["doc_id"].to_numpy().astype(np.int64)
    seg_doc_lens = dl_tbl["doc_len"].to_numpy().astype(np.int64)
    terms = postings["term"].to_pylist()
    if not terms:
        # a purge can empty a segment entirely; isin([]) binds as a
        # null-typed value set and crashes the scanner
        tmp = os.path.join(seg_dir, ".tmp-postings_q.parquet")
        pq.write_table(QUANT_SCHEMA.empty_table(), tmp)
        os.replace(tmp, os.path.join(seg_dir, "postings_q.parquet"))
        return 0
    lex = pads.dataset(lexicon_dir).to_table(
        columns=["term", "df"], filter=pads.field("term").isin(terms)
    )
    df_g = dict(zip(lex["term"].to_pylist(), lex["df"].to_numpy()))
    # vectorized over ALL terms at once (the per-term decode/encode loop
    # dominated this derivation at realistic vocabulary — 49 s/segment-set
    # on the round-5 Zipf leg): bulk varbyte decode of the concatenated
    # posting streams, one impact kernel, one bulk re-encode. Scores are
    # bit-identical — the per-posting float expression is unchanged.
    from splade_ray.codec import concat_binary_column
    from splade_ray.segments import encode_runs_bulk

    df_seg = postings["df"].to_numpy().astype(np.int64)
    n_post = int(df_seg.sum())
    starts = np.cumsum(df_seg) - df_seg
    run_of = np.repeat(np.arange(df_seg.size, dtype=np.int64), df_seg)
    deltas = varbyte_decode(concat_binary_column(postings["docs_enc"]),
                            n_post).astype(np.int64)
    csum = np.cumsum(deltas)
    base = np.concatenate(([0], csum))[starts]  # cumsum before each run
    docs = csum - base[run_of]
    tfs = varbyte_decode(concat_binary_column(postings["tfs_enc"]),
                         n_post).astype(np.int64)
    pos = np.searchsorted(seg_doc_ids, docs)
    dls = seg_doc_lens[pos].astype(np.float64)
    w_arr = idf_bulk(np.array([df_g[t] for t in terms], np.float64), n_docs)
    imp = np.floor(
        w_arr[run_of] * tf_component(tfs.astype(np.float64), dls, avgdl, params)
        * factor + 0.5
    ).astype(np.int64)
    keep = imp > 0
    kdocs, kimp, krun = docs[keep], imp[keep], run_of[keep]
    if kdocs.size == 0:
        out = QUANT_SCHEMA.empty_table()
    else:
        nstarts = np.flatnonzero(
            np.concatenate(([True], krun[1:] != krun[:-1])))
        enc = encode_runs_bulk(kdocs, kimp, nstarts, block_size)
        out = pa.table(
            {
                "term": postings["term"].combine_chunks().take(
                    pa.array(krun[nstarts], pa.int64())),
                "df": pa.array(enc["df"], pa.int64()),
                "docs_enc": enc["docs_enc"],
                "imps_enc": enc["vals_enc"],
                "bm_first_doc": enc["bm_first_doc"],
                "bm_last_doc": enc["bm_last_doc"],
                "bm_imp_max": enc["bm_val_max"],
                "bm_doc_off": enc["bm_doc_off"],
                "bm_imp_off": enc["bm_val_off"],
            },
            schema=QUANT_SCHEMA,
        )
    tmp = os.path.join(seg_dir, ".tmp-postings_q.parquet")
    pq.write_table(out, tmp)
    os.replace(tmp, os.path.join(seg_dir, "postings_q.parquet"))
    return out.num_rows


def load_quantized_manifest(index_dir: str, params: BM25Params | None = None) -> dict:
    """Read + validate ``quantized.json``. Raises if the layer is missing,
    still pending (a build crashed mid-way — its per-segment files may mix
    parameter sets), or was built with different (k1, b) than ``params``
    (quantized impacts bake the BM25 parameters in at build time)."""
    qpath = os.path.join(index_dir, "quantized.json")
    if not os.path.exists(qpath):
        raise FileNotFoundError(
            "quantized postings not built — run "
            "splade_ray.quantized.build_quantized_postings(index_dir) first"
        )
    with open(qpath) as fh:
        qman = json.load(fh)
    if qman.get("pending"):
        raise ValueError(
            "quantized layer build is pending/crashed — re-run "
            "build_quantized_postings(index_dir) to complete it"
        )
    if params is not None and (qman["k1"], qman["b"]) != (params.k1, params.b):
        raise ValueError(
            f"quantized layer built with k1={qman['k1']} b={qman['b']}, "
            f"query uses k1={params.k1} b={params.b}"
        )
    return qman


def build_quantized_postings(
    index_dir: str,
    params: BM25Params | None = None,
    factor: int = QUANT_FACTOR,
    *,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Derive the quantized posting layer for every segment of a built index
    (one Ray task per segment; already-quantized segments are skipped, so a
    failed run resumes). Writes ``postings_q.parquet`` beside each segment's
    float postings plus a ``quantized.json`` manifest recording (factor, k1,
    b) — the scorer refuses to run against mismatched parameters.

    Crash safety: the manifest is written with ``pending=true`` BEFORE any
    segment task runs, and per-segment files are only treated as done when a
    prior manifest (pending or complete) records the SAME parameters — so a
    run that crashed before writing any manifest, or a param-changed run
    that crashed mid-rebuild, can never leave a silently mixed-parameter
    layer behind (round-2 ADVICE item 1)."""
    from splade_ray.build import load_manifest, segment_dirs

    params = params or BM25Params()
    manifest = load_manifest(index_dir)
    n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]
    lexicon_dir = os.path.join(index_dir, "lexicon")
    all_segs = segment_dirs(index_dir)
    # existing per-segment files only count as done if a manifest (complete
    # OR pending from a crashed run) proves they were built with THESE
    # parameters; no manifest at all means unknown provenance -> rebuild
    qpath = os.path.join(index_dir, "quantized.json")
    prev = None
    if os.path.exists(qpath):
        with open(qpath) as fh:
            prev = json.load(fh)
    # quantized impacts bake in the GLOBAL statistics (n_docs, avgdl, df),
    # so per-segment files are only reusable if the corpus stats they were
    # built under still hold — a purge/compact-with-purge changes them and
    # must rebuild EVERY segment, not just the rewritten ones (else the
    # layer silently mixes old-N and new-N impacts)
    corpus_stats = {
        "n_docs": manifest.get("n_docs"),
        "n_postings": manifest.get("n_postings"),
        "sum_doc_len": manifest.get("sum_doc_len"),
    }
    reusable = (
        prev is not None
        and (prev.get("factor"), prev.get("k1"), prev.get("b"))
        == (factor, params.k1, params.b)
        and prev.get("corpus_stats") == corpus_stats
    )
    if not reusable:
        for s in all_segs:
            qp = os.path.join(s, "postings_q.parquet")
            if os.path.exists(qp):
                os.remove(qp)
    # pending marker FIRST: records the params the upcoming per-segment
    # files are built with, and blocks the scorer until the build completes
    with open(qpath, "w") as fh:
        json.dump(
            {
                "factor": factor,
                "k1": params.k1,
                "b": params.b,
                "corpus_stats": corpus_stats,
                "pending": True,
            },
            fh,
        )
    segs = [
        s
        for s in all_segs
        if not os.path.exists(os.path.join(s, "postings_q.parquet"))
    ]

    def task(batch: pa.Table) -> pa.Table:
        counts = [
            _quantize_segment(s, lexicon_dir, n_docs, avgdl, params, factor, block_size)
            for s in batch["seg"].to_pylist()
        ]
        return pa.table({"n_terms": pa.array(counts, pa.int64())})

    n_terms = 0
    if segs:
        out = (
            rd.from_items([{"seg": s} for s in segs], override_num_blocks=len(segs))
            .map_batches(task, batch_format="pyarrow")
            .sum("n_terms")
        )
        n_terms = int(out or 0)
    qman = {"factor": factor, "k1": params.k1, "b": params.b, "corpus_stats": corpus_stats}
    with open(os.path.join(index_dir, "quantized.json"), "w") as fh:
        json.dump(qman, fh)
    return {
        "segments_quantized": len(segs),
        "n_segments_skipped": len(all_segs) - len(segs),
        "terms": n_terms,
        **qman,
    }


class QuantizedSegment:
    """One segment's quantized postings, term-filtered at read like the
    float ``SegmentIndex`` (query.py:77-91)."""

    def __init__(
        self,
        seg_dir: str,
        terms: list[str] | None = None,
        tombstones=None,
    ):
        dl = pq.read_table(
            os.path.join(seg_dir, "doclens.parquet"), columns=["doc_id"]
        )
        self.doc_ids = dl["doc_id"].to_numpy().astype(np.int64)
        from splade_ray.delete import deleted_mask_for

        # logical deletes filtered pre-cut, as in SegmentIndex.pos_tfs
        self.deleted = deleted_mask_for(self.doc_ids, tombstones)
        src = pads.dataset(os.path.join(seg_dir, "postings_q.parquet"))
        flt = pads.field("term").isin(terms) if terms is not None else None
        self.postings = src.to_table(filter=flt)
        self._by_term = {t: i for i, t in enumerate(self.postings["term"].to_pylist())}
        self._decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._block_cache: dict[tuple[str, int], tuple[np.ndarray, np.ndarray]] = {}

    def _posting(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        got = self._decoded.get(term)
        if got is None:
            i = self._by_term.get(term)
            if i is None:
                got = (np.empty(0, np.int64), np.empty(0, np.int64))
            else:
                df = self.postings["df"][i].as_py()
                docs = np.cumsum(
                    varbyte_decode(self.postings["docs_enc"][i].as_py(), df)
                ).astype(np.int64)
                imps = varbyte_decode(self.postings["imps_enc"][i].as_py(), df).astype(
                    np.int64
                )
                pos = np.searchsorted(self.doc_ids, docs)
                if self.deleted is not None:
                    keep = ~self.deleted[pos]
                    pos, imps = pos[keep], imps[keep]
                got = (pos, imps)
            self._decoded[term] = got
        return got

    def score_bmw(self, prepared: dict) -> list[tuple[int, int, float]]:
        """Block-max skipping over the quantized layer: per-block upper
        bound = qtf · bm_imp_max — an exact INT, no query-time bound
        evaluation — and integer window sums (addition-order-free, so
        bit-identity is trivial, unlike the float BMW kernel). Regime per
        BASELINE.md's crossover study: large segments × selective queries;
        returns exactly ``score``'s results everywhere (tested)."""
        if self.deleted is not None:
            # integer block maxima don't account for deletions; the dense
            # quantized kernel returns the identical result set (tested),
            # so tombstoned segments route there until purge
            return self.score(prepared)
        import heapq

        p: BM25Params = prepared["params"]
        factor = prepared.get("quant_factor", QUANT_FACTOR)
        thr_q = int(np.floor(p.threshold * factor))
        out: list[tuple[int, int, float]] = []
        post = self.postings
        for qid, terms in prepared["queries"].items():
            metas = []
            for term, qtf, _w in terms:
                i = self._by_term.get(term)
                if i is None:
                    continue
                row = {n: post[n][i].as_py() for n in post.column_names}
                bl = np.asarray(row["bm_last_doc"], np.int64)
                bf = np.asarray(row["bm_first_doc"], np.int64)
                ubs = qtf * np.asarray(row["bm_imp_max"], np.int64)
                metas.append((qtf, row, bl, bf, ubs, term))
            if not metas:
                continue
            bounds = np.unique(np.concatenate([m[2] for m in metas]))
            W = bounds.size
            cover_bis = []
            ub_win = np.zeros(W, np.int64)
            for qtf, row, bl, bf, ubs, term in metas:
                bi = np.searchsorted(bl, bounds)
                valid = bi < bl.size
                bic = np.minimum(bi, bl.size - 1)
                valid &= bf[bic] <= bounds
                cover_bis.append(np.where(valid, bic, -1))
                ub_win += np.where(valid, ubs[bic], 0)
            heap: list[tuple[int, int]] = []  # (score_q, -doc_id) min-heap
            k = p.top_k
            i = 0
            while i < W:
                theta = heap[0][0] if len(heap) >= k else thr_q
                beat = ub_win[i:] > theta
                j_rel = int(np.argmax(beat))
                if not beat[j_rel]:
                    break
                j = i + j_rel
                i = j + 1
                lo = int(bounds[j - 1]) if j > 0 else -1
                hi = int(bounds[j])
                parts_docs, parts_contrib = [], []
                for m, cb in zip(metas, cover_bis):
                    if cb[j] < 0:
                        continue
                    qtf, row, bl, bf, ubs, term = m
                    bi = int(cb[j])
                    key = (term, bi)
                    got = self._block_cache.get(key)
                    if got is None:
                        from splade_ray.segments import decode_block

                        d, imps = decode_block(
                            row["docs_enc"], row["imps_enc"], row["bm_doc_off"],
                            row["bm_imp_off"], row["bm_last_doc"], bi,
                        )
                        got = self._block_cache[key] = (d, imps)
                    d, imps = got
                    s = int(np.searchsorted(d, lo, side="right"))
                    e = int(np.searchsorted(d, hi, side="right"))
                    if e > s:
                        parts_docs.append(d[s:e])
                        parts_contrib.append(qtf * imps[s:e])
                if not parts_docs:
                    continue
                udocs = np.unique(np.concatenate(parts_docs))
                scores = np.zeros(udocs.size, np.int64)
                for d_part, c_part in zip(parts_docs, parts_contrib):
                    scores[np.searchsorted(udocs, d_part)] += c_part
                keep = scores > max(theta, thr_q)
                for d, s in zip(udocs[keep], scores[keep]):
                    entry = (int(s), -int(d))
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry > heap[0]:
                        heapq.heapreplace(heap, entry)
            ranked = sorted(((s, -nd) for s, nd in heap), key=lambda x: (-x[0], x[1]))
            out.extend((qid, int(doc), float(s)) for s, doc in ranked)
        return out

    def score(self, prepared: dict) -> list[tuple[int, int, float]]:
        """Integer term-at-a-time accumulation; threshold is the quantized
        analog of ``score > threshold``: ``score_q > floor(threshold ·
        factor)`` (0 by default, like the reference's run config)."""
        p: BM25Params = prepared["params"]
        factor = prepared.get("quant_factor", QUANT_FACTOR)
        thr_q = float(np.floor(p.threshold * factor))
        out: list[tuple[int, int, float]] = []
        for qid, terms in prepared["queries"].items():
            scores = np.zeros(self.doc_ids.size, np.int64)
            hit = False
            for term, qtf, _w in terms:  # sorted term order (determinism)
                pos, imps = self._posting(term)
                if pos.size == 0:
                    continue
                hit = True
                scores[pos] += qtf * imps
            if not hit:
                continue
            docs, scs = topk_from_scores(
                self.doc_ids, scores.astype(np.float64), p.top_k, thr_q
            )
            out.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
        return out
