"""Positional index layer + phrase matching.

The reference has no positional index (its retrieval is bag-of-words over
learned impacts, ``splade/tasks/transformer_evaluator.py:142-193``); phrase
queries are a beyond-reference fulltext capability this engine adds. The
layer is DERIVED from a built index the same way the quantized layer is
(``splade_ray.quantized``): one resumable Ray task per segment re-reads that
segment's corpus slice (the per-segment lineage manifest records exactly
which rows: path, row_start, num_rows), re-tokenizes with the index's own
analyzer config, and writes ``positions.parquet`` beside the segment's
postings — crash-safe via the same pending-marker protocol.

Storage per term row (term-sorted):
``term``, ``df``, ``n_pos`` (total occurrences), ``docs_enc`` (delta+varbyte
doc ids, ascending), ``tf_enc`` (varbyte per-doc occurrence counts),
``len_enc`` (varbyte per-doc byte lengths of the position runs) and
``pos_enc`` — the concatenation of per-doc position streams, each stream
delta+varbyte with the first position absolute. ``len_enc`` makes any doc's
stream sliceable without decoding its neighbours, so phrase evaluation
decodes positions ONLY for docs that survive the doc-id intersection.

Phrase evaluation per segment (segments partition the doc space, so results
concatenate with no merge shuffle): intersect the phrase terms' doc-id
lists, batch-decode the survivors' position streams, then intersect the
shifted position sets ``{p - i : p ∈ pos(term_i)}`` as packed
``(doc, position)`` int64 keys — occurrences are start positions, so
overlapping matches count (same semantics as the SQL oracle's sliding
window). Everything is numpy; the only Python loops are per phrase term
(k ≈ 2-5) and per posting row at encode time (same granularity as the main
segment builder).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from splade_ray.analysis import tokenize, tokenize_column, tokenize_column_by_lang
from splade_ray.codec import varbyte_decode, varbyte_encode_bulk

POSITIONS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),
        ("n_pos", pa.int64()),
        ("docs_enc", pa.binary()),
        ("tf_enc", pa.binary()),
        ("len_enc", pa.binary()),
        ("pos_enc", pa.binary()),
    ]
)

# packed (doc_rank, shifted_position) key layout. Positions are bounded by
# doc length; 2^32 tokens in one doc would be a >4-billion-token document.
_POS_BITS = np.uint64(32)
_POS_MASK = (1 << 32) - 1


def build_positions_table(
    texts: pa.Array | pa.ChunkedArray,
    doc_ids: np.ndarray,
    langs: pa.Array | pa.ChunkedArray | None = None,
    analyzer: str | None = None,
) -> pa.Table:
    """Positional postings for one segment's documents (doc_ids ascending).

    Fully vectorized, no per-term Python: tokenization is the shared Arrow
    kernel; within-doc token positions / run boundaries / deltas are numpy;
    every varbyte stream (positions, doc deltas, tfs, run lengths) is ONE
    bulk encode pass sliced at term boundaries into the Arrow binary
    columns."""
    if langs is None:
        from splade_ray.analysis import get_analyzer

        spec = get_analyzer(analyzer) if analyzer is not None else None
        terms, par, _ = tokenize_column(texts, spec)
    else:
        terms, par, _ = tokenize_column_by_lang(texts, langs)
    n_tok = len(par)
    if n_tok == 0:
        return pa.table({k: [] for k in POSITIONS_SCHEMA.names}, schema=POSITIONS_SCHEMA)

    # within-doc position of each token: tokens arrive in within-doc order
    # (possibly grouped by lang), so a stable sort by doc recovers sequence
    ord0 = np.argsort(par, kind="stable")
    par_s = par[ord0]
    doc_start = np.concatenate(([0], np.flatnonzero(par_s[1:] != par_s[:-1]) + 1))
    seq = np.arange(n_tok, dtype=np.int64) - np.repeat(
        doc_start, np.diff(np.concatenate((doc_start, [n_tok])))
    )
    pos_in_doc = np.empty(n_tok, np.int64)
    pos_in_doc[ord0] = seq

    te = (terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms).dictionary_encode()
    tid = te.indices.to_numpy(zero_copy_only=False).astype(np.int64)

    # one global ordering: (term, doc, position)
    order = np.lexsort((pos_in_doc, par, tid))
    t_s, d_s, p_s = tid[order], par[order], pos_in_doc[order]

    # posting runs = (term, doc) groups
    new_run = np.concatenate(([True], (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])))
    run_start = np.flatnonzero(new_run)
    run_counts = np.diff(np.concatenate((run_start, [n_tok])))

    # position deltas (first position of each run absolute)
    dp = np.empty(n_tok, np.int64)
    dp[0] = p_s[0]
    np.subtract(p_s[1:], p_s[:-1], out=dp[1:])
    dp[run_start] = p_s[run_start]

    pos_buf, byte_len = varbyte_encode_bulk(dp)
    byte_end = np.cumsum(byte_len)
    run_byte_start = byte_end[run_start] - byte_len[run_start]
    run_byte_len = np.add.reduceat(byte_len, run_start)

    # per-term slices over the runs
    run_tid = t_s[run_start]
    term_first_run = np.concatenate(
        ([0], np.flatnonzero(run_tid[1:] != run_tid[:-1]) + 1)
    )
    term_run_counts = np.diff(np.concatenate((term_first_run, [run_start.size])))
    run_doc = doc_ids[d_s[run_start]]

    # per-term doc deltas with a reset at every term's first run, then ONE
    # bulk varbyte pass per stream sliced at term boundaries (the per-term
    # Python loop with three tiny encode calls dominated the layer build —
    # same fix as the trigram layer)
    deltas = np.empty(run_doc.size, np.int64)
    deltas[0] = run_doc[0]
    np.subtract(run_doc[1:], run_doc[:-1], out=deltas[1:])
    deltas[term_first_run] = run_doc[term_first_run]

    n_terms = term_first_run.size
    bounds = np.append(term_first_run, run_start.size)

    def _sliced_binary(buf: np.ndarray, nbytes: np.ndarray) -> pa.Array:
        cum = np.concatenate(([0], np.cumsum(nbytes)))
        offs = cum[bounds].astype(np.int32)
        return pa.Array.from_buffers(
            pa.binary(),
            n_terms,
            [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(buf.tobytes())],
        )

    d_buf, d_nb = varbyte_encode_bulk(deltas)
    t_buf, t_nb = varbyte_encode_bulk(run_counts)
    l_buf, l_nb = varbyte_encode_bulk(run_byte_len)
    pos_offs = np.append(run_byte_start[term_first_run], int(byte_end[-1])).astype(np.int32)
    t = pa.table(
        {
            "term": te.dictionary.take(pa.array(run_tid[term_first_run])),
            "df": pa.array(term_run_counts, pa.int64()),
            "n_pos": pa.array(np.add.reduceat(run_counts, term_first_run), pa.int64()),
            "docs_enc": _sliced_binary(d_buf, d_nb),
            "tf_enc": _sliced_binary(t_buf, t_nb),
            "len_enc": _sliced_binary(l_buf, l_nb),
            "pos_enc": pa.Array.from_buffers(
                pa.binary(),
                n_terms,
                [None, pa.py_buffer(pos_offs.tobytes()), pa.py_buffer(pos_buf.tobytes())],
            ),
        },
        schema=POSITIONS_SCHEMA,
    )
    return t.take(pa.compute.sort_indices(t["term"]))


def _positions_for_segment(
    seg_dir: str, text_col: str, id_col: str | None, lang_col: str | None,
    analyzer: str | None = None,
) -> int:
    """Build one segment's positions.parquet by re-reading its lineage slice
    (manifest path/row_start/num_rows) — the corpus itself is the source of
    truth, not a second copy of the text."""
    from splade_ray.build import read_lineage_slices

    with open(os.path.join(seg_dir, "manifest.json")) as fh:
        m = json.load(fh)
    cols = [text_col]
    if lang_col:
        cols.append(lang_col)
    if id_col:
        cols.append(id_col)
    tbl = read_lineage_slices(m, cols)
    if id_col:
        doc_id_arr = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        doc_id_arr = m["doc_id_start"] + np.arange(len(tbl), dtype=np.int64)
    order = np.argsort(doc_id_arr, kind="stable")  # same invariant as the builder
    if not np.array_equal(order, np.arange(len(tbl))):
        tbl = tbl.take(pa.array(order))
        doc_id_arr = doc_id_arr[order]
    # membership source of truth is the segment's doclens (the corpus slice
    # still contains docs a purge physically removed)
    live = pq.read_table(
        os.path.join(seg_dir, "doclens.parquet"), columns=["doc_id"]
    )["doc_id"].to_numpy().astype(np.int64)
    if live.size != doc_id_arr.size:
        keep = np.flatnonzero(np.isin(doc_id_arr, live))
        tbl = tbl.take(pa.array(keep))
        doc_id_arr = doc_id_arr[keep]
    out = build_positions_table(
        tbl[text_col], doc_id_arr, tbl[lang_col] if lang_col else None,
        analyzer=analyzer,
    )
    tmp = os.path.join(seg_dir, ".tmp-positions.parquet")
    pq.write_table(out, tmp)
    os.replace(tmp, os.path.join(seg_dir, "positions.parquet"))
    return out.num_rows


def build_positions(index_dir: str, *, concurrency: int | None = None) -> dict:
    """Derive the positional layer for every segment (one Ray task per
    segment; segments with an existing positions.parquet are skipped, so a
    failed run resumes). Pending-marker protocol as in the quantized layer:
    ``positions.json`` is written pending=true BEFORE segment tasks, and
    existing per-segment files are only reused when a prior manifest proves
    the same analyzer config (text_col/lang_col)."""
    from splade_ray.build import load_manifest, segment_dirs

    man = load_manifest(index_dir)
    text_col, id_col, lang_col = man["text_col"], man.get("id_col"), man.get("lang_col")
    analyzer = man.get("analyzer")
    ppath = os.path.join(index_dir, "positions.json")
    prev = None
    if os.path.exists(ppath):
        with open(ppath) as fh:
            prev = json.load(fh)
    all_segs = segment_dirs(index_dir)
    reusable = prev is not None and (
        prev.get("text_col"),
        prev.get("lang_col"),
        prev.get("analyzer"),
    ) == (text_col, lang_col, analyzer)
    if not reusable:
        for s in all_segs:
            p = os.path.join(s, "positions.parquet")
            if os.path.exists(p):
                os.remove(p)
    with open(ppath, "w") as fh:
        json.dump(
            {"text_col": text_col, "lang_col": lang_col, "analyzer": analyzer,
             "pending": True},
            fh,
        )
    segs = [s for s in all_segs if not os.path.exists(os.path.join(s, "positions.parquet"))]

    def task(batch: pa.Table) -> pa.Table:
        if pa.cpu_count() != 1:
            pa.set_cpu_count(1)  # one core per task (see build.py)
        counts = [
            _positions_for_segment(s, text_col, id_col, lang_col, analyzer)
            for s in batch["seg"].to_pylist()
        ]
        return pa.table({"n_terms": pa.array(counts, pa.int64())})

    n_terms = 0
    if segs:
        n_terms = int(
            rd.from_items([{"seg": s} for s in segs], override_num_blocks=len(segs))
            .map_batches(task, batch_format="pyarrow", concurrency=concurrency)
            .sum("n_terms")
        )
    manifest = {
        "text_col": text_col,
        "lang_col": lang_col,
        "analyzer": analyzer,
        "n_segments": len(all_segs),
        "n_segments_skipped": len(all_segs) - len(segs),
        "n_terms_built": n_terms,
    }
    with open(ppath, "w") as fh:
        json.dump(manifest, fh)
    return manifest


def load_positions_manifest(index_dir: str) -> dict:
    ppath = os.path.join(index_dir, "positions.json")
    if not os.path.exists(ppath):
        raise FileNotFoundError(
            "positional layer not built — run "
            "splade_ray.positions.build_positions(index_dir) first"
        )
    with open(ppath) as fh:
        man = json.load(fh)
    if man.get("pending"):
        raise ValueError(
            "positional layer build is pending/crashed — re-run "
            "build_positions(index_dir) to complete it"
        )
    return man


# ------------------------------------------------------------------ querying


def _decode_runs(
    pos_enc: bytes, tf: np.ndarray, blen: np.ndarray, sel: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode the position streams of the selected posting rows only.

    ``tf``/``blen`` are the full per-doc occurrence counts and byte lengths;
    ``sel`` indexes the surviving docs. Returns ``(positions, run_index)``
    flat arrays — one varbyte_decode over the concatenated selected slices,
    with the per-run cumsum reset done vectorized."""
    if sel.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    byte_start = np.concatenate(([0], np.cumsum(blen)))
    buf = np.frombuffer(pos_enc, np.uint8)
    parts = [buf[byte_start[i] : byte_start[i + 1]] for i in sel.tolist()]
    vals = varbyte_decode(np.concatenate(parts)).astype(np.int64)
    counts = tf[sel]
    cs = np.cumsum(vals)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    base = np.where(starts > 0, cs[starts - 1], 0)
    pos = cs - np.repeat(base, counts)
    run_idx = np.repeat(np.arange(sel.size, dtype=np.int64), counts)
    return pos, run_idx


class SegmentPositions:
    """One segment's positional postings, pruned to the query's terms.
    :meth:`ensure_terms` extends the pruned set incrementally (one
    pushdown read per batch of NEW terms, absent terms remembered), so a
    resident instance in a serving actor grows to cover its query
    traffic instead of reloading per request."""

    def __init__(self, seg_dir: str, terms: list[str], with_doc_len: bool = False):
        self.seg_dir = seg_dir
        src = pads.dataset(os.path.join(seg_dir, "positions.parquet"))
        if terms:
            self.tbl = src.to_table(filter=pads.field("term").isin(terms))
        else:
            self.tbl = src.schema.empty_table()
        self._by_term = {t: i for i, t in enumerate(self.tbl["term"].to_pylist())}
        self._absent = {t for t in terms if t not in self._by_term}
        self._cache: dict[str, tuple] = {}
        self._dl: tuple[np.ndarray, np.ndarray] | None = None
        if with_doc_len:
            dl = pq.read_table(
                os.path.join(seg_dir, "doclens.parquet"), columns=["doc_id", "doc_len"]
            )
            self._dl = (
                dl["doc_id"].to_numpy().astype(np.int64),
                dl["doc_len"].to_numpy().astype(np.int64),
            )

    def ensure_terms(self, terms: list[str]) -> None:
        """Load any terms not yet resident (one pushdown isin read);
        terms absent from the layer are remembered so repeated misses
        never re-read."""
        missing = [t for t in terms
                   if t not in self._by_term and t not in self._absent]
        if not missing:
            return
        extra = pads.dataset(
            os.path.join(self.seg_dir, "positions.parquet")
        ).to_table(filter=pads.field("term").isin(missing))
        if extra.num_rows:
            base = self.tbl.num_rows
            self.tbl = pa.concat_tables([self.tbl, extra])
            for j, t in enumerate(extra["term"].to_pylist()):
                self._by_term[t] = base + j
        found = set(extra["term"].to_pylist())
        self._absent.update(t for t in missing if t not in found)

    def doc_lens(self, doc_ids: np.ndarray) -> np.ndarray:
        ids, lens = self._dl
        return lens[np.searchsorted(ids, doc_ids)]

    def term_entry(self, term: str):
        """(doc_ids asc, tfs, byte_lens, pos_enc) for one term, decoded once."""
        got = self._cache.get(term)
        if got is not None:
            return got
        i = self._by_term.get(term)
        if i is None:
            return None
        df = self.tbl["df"][i].as_py()
        docs = np.cumsum(
            varbyte_decode(self.tbl["docs_enc"][i].as_py(), df).astype(np.int64)
        )
        tf = varbyte_decode(self.tbl["tf_enc"][i].as_py(), df).astype(np.int64)
        blen = varbyte_decode(self.tbl["len_enc"][i].as_py(), df).astype(np.int64)
        got = (docs, tf, blen, self.tbl["pos_enc"][i].as_py())
        self._cache[term] = got
        return got

    def phrase_counts(self, phrase: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, counts>0) of phrase occurrences (overlapping starts)."""
        entries = []
        for t in phrase:
            e = self.term_entry(t)
            if e is None:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            entries.append(e)
        if len(phrase) == 1:
            docs, tf, _, _ = entries[0]
            return docs, tf
        common = entries[0][0]
        for docs, _, _, _ in entries[1:]:
            common = common[np.isin(common, docs, assume_unique=True)]
            if common.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
        k = len(phrase)
        inter: np.ndarray | None = None
        for i, (docs, tf, blen, pos_enc) in enumerate(entries):
            sel = np.searchsorted(docs, common)
            pos, run_idx = _decode_runs(pos_enc, tf, blen, sel)
            # shift so a phrase start aligns across terms; +k keeps keys
            # non-negative for every i < k
            keys = (run_idx.astype(np.uint64) << _POS_BITS) | (
                (pos + k - i).astype(np.uint64)
            )
            inter = keys if inter is None else np.intersect1d(inter, keys, assume_unique=True)
            if inter.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
        counts = np.bincount(
            (inter >> _POS_BITS).astype(np.int64), minlength=common.size
        )
        keep = counts > 0
        return common[keep], counts[keep].astype(np.int64)

    def multi_phrase_counts(
        self, slots: list[list[str]]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Lucene MultiPhraseQuery: each slot is a set of alternative terms;
        a match at start ``p`` requires slot ``i`` to match SOME alternative
        at position ``p + i``. Returns (doc_ids, start counts > 0),
        overlapping starts counted — single-alternative slots reduce exactly
        to ``phrase_counts``. Alternatives within a slot occupy disjoint
        positions (one token per position), so per-slot keys union without
        duplicates and counts add."""
        k = len(slots)
        # per-slot surviving entries; a slot with no indexed alternative
        # kills the phrase
        slot_entries: list[list[tuple]] = []
        for alts in slots:
            es = [e for t in alts if (e := self.term_entry(t)) is not None]
            if not es:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            slot_entries.append(es)
        if k == 1:
            # union of single terms: per-doc counts are tf sums
            docs_all = np.concatenate([e[0] for e in slot_entries[0]])
            tf_all = np.concatenate([e[1] for e in slot_entries[0]])
            docs, inv = np.unique(docs_all, return_inverse=True)
            counts = np.bincount(inv, weights=tf_all).astype(np.int64)
            return docs, counts
        # common docs: intersection over slots of the union of alt doc lists
        slot_docs = []
        for es in slot_entries:
            d = es[0][0]
            for e in es[1:]:
                d = np.union1d(d, e[0])
            slot_docs.append(d)
        common = slot_docs[0]
        for d in slot_docs[1:]:
            common = common[np.isin(common, d, assume_unique=True)]
            if common.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
        inter: np.ndarray | None = None
        for i, es in enumerate(slot_entries):
            slot_keys = []
            for docs, tf, blen, pos_enc in es:
                sel = np.flatnonzero(
                    np.isin(docs, common, assume_unique=True)
                ).astype(np.int64)
                if sel.size == 0:
                    continue
                pos, run_idx = _decode_runs(pos_enc, tf, blen, sel)
                # run_idx indexes this alt's selected docs; remap onto the
                # shared `common` index space so keys align across alts
                doc_idx = np.searchsorted(common, docs[sel][run_idx])
                slot_keys.append(
                    (doc_idx.astype(np.uint64) << _POS_BITS)
                    | (pos + k - i).astype(np.uint64)
                )
            if not slot_keys:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            keys = (
                slot_keys[0]
                if len(slot_keys) == 1
                else np.sort(np.concatenate(slot_keys))
            )
            inter = (
                keys
                if inter is None
                else np.intersect1d(inter, keys, assume_unique=True)
            )
            if inter.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
        counts = np.bincount(
            (inter >> _POS_BITS).astype(np.int64), minlength=common.size
        )
        keep = counts > 0
        return common[keep], counts[keep].astype(np.int64)


    def near_spans(
        self, terms: list[str], slop: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Greedy ordered-chain spans (the SpanNearQuery match intervals):
        returns ``(common_docs, start_keys, end_keys)`` where keys pack
        ``(doc_rank << 32) | position`` and every (start, end) pair is a
        chain of the terms in order spanning ``end - start <=
        len(terms)-1+slop``. Single-term queries yield zero-length spans at
        each occurrence. Keys are ascending by construction."""
        empty = (np.empty(0, np.int64), np.empty(0, np.uint64), np.empty(0, np.uint64))
        entries = []
        for t in terms:
            e = self.term_entry(t)
            if e is None:
                return empty
            entries.append(e)
        k = len(terms)
        if k == 1:
            docs, tf, blen, pos_enc = entries[0]
            sel = np.arange(docs.size, dtype=np.int64)
            pos, run_idx = _decode_runs(pos_enc, tf, blen, sel)
            keys = (run_idx.astype(np.uint64) << _POS_BITS) | pos.astype(np.uint64)
            return docs, keys, keys.copy()
        common = entries[0][0]
        for docs, _, _, _ in entries[1:]:
            common = common[np.isin(common, docs, assume_unique=True)]
            if common.size == 0:
                return empty
        keys_per_term = []
        for docs, tf, blen, pos_enc in entries:
            sel = np.searchsorted(docs, common)
            pos, run_idx = _decode_runs(pos_enc, tf, blen, sel)
            # doc-major packed keys, ascending by construction
            keys_per_term.append(
                (run_idx.astype(np.uint64) << _POS_BITS) | pos.astype(np.uint64)
            )
        start = keys_per_term[0]
        cur = start
        for keys_i in keys_per_term[1:]:
            idx = np.searchsorted(keys_i, cur, side="right")
            ok = idx < keys_i.size
            nxt = keys_i[np.minimum(idx, keys_i.size - 1)]
            # chain must stay in the same doc run
            ok &= (nxt >> _POS_BITS) == (start >> _POS_BITS)
            start, cur = start[ok], nxt[ok]
            if start.size == 0:
                return empty
        span = (cur & np.uint64(_POS_MASK)).astype(np.int64) - (
            start & np.uint64(_POS_MASK)
        ).astype(np.int64)
        hit = span <= (k - 1 + slop)
        return common, start[hit], cur[hit]

    def near_counts(
        self, terms: list[str], slop: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Ordered proximity match (the Lucene sloppy-PhraseQuery / ordered
        SpanNearQuery shape, pinned): a start = an occurrence ``p0`` of
        ``terms[0]`` from which the GREEDY chain (each next term's first
        occurrence strictly after the previous position) exists and spans
        ``p_last - p0 <= len(terms) - 1 + slop``. Greedy minimizes the
        chain end per start, so a start counts iff ANY ordered chain within
        the span bound exists from it — slop=0 reduces to exact phrase
        counts. Returns (doc_ids, per-doc start counts > 0)."""
        if len(terms) == 1:
            e = self.term_entry(terms[0])
            if e is None:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            docs, tf, _, _ = e
            return docs, tf
        common, start, _cur = self.near_spans(terms, slop)
        if start.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        runs = (start >> _POS_BITS).astype(np.int64)
        counts = np.bincount(runs, minlength=common.size)
        keep = counts > 0
        return common[keep], counts[keep].astype(np.int64)


    def near_counts_unordered(
        self, terms: list[str], slop: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Unordered proximity (Lucene SpanNearQuery inOrder=false, pinned):
        a start = an occurrence ``p`` of ANY query term such that EVERY
        query term occurs in ``[p, p + k-1+slop]`` (a minimal covering
        window always starts at a query-term occurrence, so candidate
        starts lose no matches). Returns (doc_ids, start counts > 0).
        Vectorized: one searchsorted per term over the union of starts."""
        entries = []
        for t in terms:
            e = self.term_entry(t)
            if e is None:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            entries.append(e)
        k = len(terms)
        if k == 1:
            docs, tf, _, _ = entries[0]
            return docs, tf
        common = entries[0][0]
        for docs, _, _, _ in entries[1:]:
            common = common[np.isin(common, docs, assume_unique=True)]
            if common.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
        keys_per_term = []
        for docs, tf, blen, pos_enc in entries:
            sel = np.searchsorted(docs, common)
            pos, run_idx = _decode_runs(pos_enc, tf, blen, sel)
            keys_per_term.append(
                (run_idx.astype(np.uint64) << _POS_BITS) | pos.astype(np.uint64)
            )
        starts = np.unique(np.concatenate(keys_per_term))
        bound = np.uint64(k - 1 + slop)
        ok = np.ones(starts.size, bool)
        for keys_t in keys_per_term:
            idx = np.searchsorted(keys_t, starts, side="left")
            valid = idx < keys_t.size
            nxt = keys_t[np.minimum(idx, keys_t.size - 1)]
            same_run = (nxt >> _POS_BITS) == (starts >> _POS_BITS)
            within = nxt - starts <= bound  # same run => plain key distance
            ok &= valid & same_run & within
        if not ok.any():
            return np.empty(0, np.int64), np.empty(0, np.int64)
        runs = (starts[ok] >> _POS_BITS).astype(np.int64)
        counts = np.bincount(runs, minlength=common.size)
        keep = counts > 0
        return common[keep], counts[keep].astype(np.int64)


def phrase_match_batch(
    batch: pa.Table,
    *,
    phrases: dict[int, list[str]],
    terms: list[str],
    with_doc_len: bool = False,
    slop: int | None = None,
    ordered: bool = True,
    multi: bool = False,
) -> pa.Table:
    """map_batches task: evaluate every phrase against each segment in the
    batch. Segments partition the doc space, so outputs concatenate.
    ``with_doc_len`` adds each matching doc's token count (from the
    segment's doclens sidecar) for BM25-style phrase ranking. With
    ``multi=True`` each phrase value is a slot list (``list[list[str]]``,
    Lucene MultiPhraseQuery) routed to ``multi_phrase_counts``."""
    pids, docs_out, counts_out, dls_out = [], [], [], []
    for seg_dir in batch["seg_dir"].to_pylist():
        seg = SegmentPositions(seg_dir, terms, with_doc_len=with_doc_len)
        for pid, phrase in phrases.items():
            if multi:
                docs, counts = seg.multi_phrase_counts(phrase)
            elif slop is None:
                docs, counts = seg.phrase_counts(phrase)
            elif ordered:
                docs, counts = seg.near_counts(phrase, slop)
            else:
                docs, counts = seg.near_counts_unordered(phrase, slop)
            pids.extend([pid] * docs.size)
            docs_out.append(docs)
            counts_out.append(counts)
            if with_doc_len:
                dls_out.append(seg.doc_lens(docs))
    cols = {
        "phrase_id": pa.array(np.asarray(pids, np.int64)),
        "doc_id": pa.array(
            np.concatenate(docs_out) if docs_out else np.empty(0, np.int64)
        ),
        "phrase_count": pa.array(
            np.concatenate(counts_out) if counts_out else np.empty(0, np.int64)
        ),
    }
    if with_doc_len:
        cols["doc_len"] = pa.array(
            np.concatenate(dls_out) if dls_out else np.empty(0, np.int64)
        )
    return pa.table(cols)


def _phrase_candidates(
    index_dir: str,
    phrases: list[tuple[int, str]],
    *,
    query_lang: str | None = None,
    concurrency: int | None = None,
    with_doc_len: bool = False,
    slop: int | None = None,
    ordered: bool = True,
):
    """Shared fan-out: tokenized phrases -> per-segment match Dataset (or
    None when no phrase tokenizes to anything). ``slop`` routes to the
    proximity kernels (ordered chain / unordered window) instead of exact
    phrase matching."""
    from splade_ray.build import segment_dirs

    pman = load_positions_manifest(index_dir)
    if query_lang is None:
        query_lang = pman.get("analyzer")  # match the layer's build analyzer
    tokenized = {
        int(pid): tokenize(text, query_lang) if query_lang else tokenize(text)
        for pid, text in phrases
    }
    tokenized = {pid: ts for pid, ts in tokenized.items() if ts}
    if not tokenized:
        return None
    all_terms = sorted({t for ts in tokenized.values() for t in ts})
    segs = segment_dirs(index_dir)
    ds = rd.from_items(
        [{"seg_dir": s} for s in segs], override_num_blocks=len(segs)
    ).map_batches(
        phrase_match_batch,
        batch_format="pyarrow",
        batch_size=1,
        fn_kwargs={
            "phrases": tokenized,
            "terms": all_terms,
            "with_doc_len": with_doc_len,
            "slop": slop,
            "ordered": ordered,
        },
        concurrency=concurrency,
    )
    # logical deletes: the match table is complete (no per-segment cut), so
    # filtering it is exact for both phrase_search and the phrase_topk
    # scoring built on top (phrase df then counts live matches only — the
    # phrase "term" has no build-time statistics)
    return _drop_tombstones(ds, index_dir)


def _drop_tombstones(ds, index_dir: str):
    """Filter logically-deleted doc_ids out of a match Dataset (broadcast
    the tombstone set once via ray.put; no-op when nothing is deleted)."""
    from splade_ray.delete import load_tombstones

    tomb = load_tombstones(index_dir)
    if not tomb.size:
        return ds
    tomb_ref = ray.put(tomb)

    def drop_deleted(batch: pa.Table) -> pa.Table:
        t = ray.get(tomb_ref)
        keep = ~np.isin(batch["doc_id"].to_numpy(zero_copy_only=False), t)
        return batch.filter(pa.array(keep))

    return ds.map_batches(drop_deleted, batch_format="pyarrow")


def phrase_search(
    index_dir: str,
    phrases: list[tuple[int, str]],
    *,
    query_lang: str | None = None,
    concurrency: int | None = None,
):
    """Distributed phrase matching: (phrase_id, doc_id, phrase_count) for
    every document containing each phrase as a contiguous token sequence
    (overlapping occurrences counted). Phrase text goes through the same
    analyzer as the index; phrases with no tokens match nothing.

    One Ray task per segment, results concatenated (no shuffle — segments
    partition docs). The parquet read inside each task prunes to the
    phrases' terms."""
    import pandas as pd

    ds = _phrase_candidates(
        index_dir, phrases, query_lang=query_lang, concurrency=concurrency
    )
    out_schema = {"phrase_id": np.int64, "doc_id": np.int64, "phrase_count": np.int64}
    if ds is None:
        return pd.DataFrame(columns=list(out_schema)).astype(out_schema)
    pdf = ds.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=list(out_schema)).astype(out_schema)
    return pdf.sort_values(["phrase_id", "doc_id"]).reset_index(drop=True)


PHRASE_RUN_COLS = ["phrase_id", "rank", "doc_id", "score"]
PHRASE_RUN_TYPES = {
    "phrase_id": np.int64, "rank": np.int32,
    "doc_id": np.int64, "score": np.float64,
}


def phrase_dfs(cand) -> dict[int, int]:
    """Per-phrase document frequency of a candidate Dataset (one row per
    (phrase, doc) match) — phrase-sized groupby."""
    from ray.data.aggregate import Count

    return {
        int(r["phrase_id"]): int(r["df"])
        for r in cand.groupby("phrase_id").aggregate(Count(alias_name="df")).take_all()
    }


def _phrase_rank(cand, w: dict[int, float], avgdl: float, params):
    """Score + per-phrase top-k merge over a candidate Dataset, under the
    given per-phrase idf weights and avgdl (callers supply local or
    federated statistics)."""
    import pandas as pd

    from splade_ray.bm25 import tf_component

    def score(batch: pa.Table) -> pa.Table:
        pids = batch["phrase_id"].to_numpy(zero_copy_only=False)
        tf = batch["phrase_count"].to_numpy(zero_copy_only=False)
        dl = batch["doc_len"].to_numpy(zero_copy_only=False)
        ws = np.zeros(pids.size, np.float64)
        for pid, wv in w.items():  # loop over phrases, not rows
            ws[pids == pid] = wv
        s = ws * tf_component(tf, dl, avgdl, params)
        return pa.table(
            {
                "phrase_id": batch["phrase_id"],
                "doc_id": batch["doc_id"],
                "score": pa.array(s),
            }
        )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group["score"] > params.threshold].sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        g = g.head(params.top_k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
        return g[PHRASE_RUN_COLS]

    run = (
        cand.map_batches(score, batch_format="pyarrow")
        .groupby("phrase_id")
        .map_groups(merge, batch_format="pandas")
    )
    pdf = run.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=PHRASE_RUN_COLS).astype(PHRASE_RUN_TYPES)
    return pdf.sort_values(["phrase_id", "rank"]).reset_index(drop=True)


def phrase_topk(
    index_dir: str,
    phrases: list[tuple[int, str]],
    params=None,
    *,
    query_lang: str | None = None,
    concurrency: int | None = None,
    stats_override: dict | None = None,
):
    """BM25-ranked phrase retrieval: each phrase acts as ONE virtual term
    whose per-doc tf is the phrase occurrence count and whose df is the
    number of docs containing the phrase. score = idf(df_phrase) ·
    tf_component(count, doc_len); ties (score desc, doc_id asc).

    Three small stages over the candidate Dataset (matches only, never the
    corpus): a phrase-count groupby for global dfs (phrase-sized), a
    vectorized scoring map, and the per-phrase top-k merge.

    ``stats_override`` = ``{"n_docs", "avgdl", "phrase_dfs": {pid: df}}``
    scores the candidates under federated statistics
    (``multi.phrase_topk_multi``) instead of this index's own."""
    import pandas as pd

    from splade_ray.bm25 import BM25Params, idf
    from splade_ray.build import load_manifest

    params = params or BM25Params()
    if stats_override is not None:
        n_docs, avgdl = stats_override["n_docs"], stats_override["avgdl"]
    else:
        man = load_manifest(index_dir)
        n_docs, avgdl = man["n_docs"], man["avgdl"]
    cand = _phrase_candidates(
        index_dir, phrases, query_lang=query_lang,
        concurrency=concurrency, with_doc_len=True,
    )
    if cand is None:
        return pd.DataFrame(columns=PHRASE_RUN_COLS).astype(PHRASE_RUN_TYPES)
    if stats_override is not None and "phrase_dfs" in stats_override:
        dfs = stats_override["phrase_dfs"]
    else:
        cand = cand.materialize()  # consumed twice: df groupby + scoring
        dfs = phrase_dfs(cand)
    if not dfs:
        return pd.DataFrame(columns=PHRASE_RUN_COLS).astype(PHRASE_RUN_TYPES)
    w = {pid: idf(df, n_docs) for pid, df in dfs.items()}
    return _phrase_rank(cand, w, avgdl, params)


def near_search(
    index_dir: str,
    phrases: list[tuple[int, str]],
    *,
    slop: int = 2,
    ordered: bool = True,
    query_lang: str | None = None,
    concurrency: int | None = None,
):
    """Proximity search (Lucene SpanNearQuery): (phrase_id, doc_id,
    phrase_count). ``ordered=True`` counts occurrences of the FIRST term
    from which an ordered chain of the remaining terms exists within a
    span of ``len(terms)-1+slop`` positions (sloppy PhraseQuery shape;
    slop=0 ≡ exact phrase). ``ordered=False`` counts query-term
    occurrences ``p`` with EVERY term present in ``[p, p+k-1+slop]``
    (inOrder=false). Same per-segment fan-out and tombstone handling as
    phrase_search."""
    import pandas as pd

    ds = _phrase_candidates(
        index_dir, phrases, query_lang=query_lang, concurrency=concurrency,
        slop=slop, ordered=ordered,
    )
    out_schema = {"phrase_id": np.int64, "doc_id": np.int64, "phrase_count": np.int64}
    if ds is None:
        return pd.DataFrame(columns=list(out_schema)).astype(out_schema)
    pdf = ds.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=list(out_schema)).astype(out_schema)
    return pdf.sort_values(["phrase_id", "doc_id"]).reset_index(drop=True)


def span_first_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    *,
    limit: int,
    query_lang: str | None = None,
    concurrency: int | None = None,
):
    """SpanFirstQuery (Lucene): docs where the query term occurs within the
    first ``limit`` token positions (0-based position < limit) — the
    "match in title/lead" primitive for one-field indexes. One single-term
    query per id; (query_id, doc_id, n_occurrences-within-limit) rows.
    Same per-segment fan-out as phrase_search; tombstone-aware."""
    import pandas as pd

    from splade_ray.build import segment_dirs
    from splade_ray.delete import load_tombstones

    load_positions_manifest(index_dir)
    tokenized: dict[int, list[str]] = {}
    for qid, text in queries:
        toks = tokenize(text, query_lang) if query_lang else tokenize(text)
        if len(toks) != 1:
            raise ValueError(
                f"span_first takes single-term queries; {text!r} -> {toks}"
            )
        tokenized[int(qid)] = toks
    all_terms = sorted({t for ts in tokenized.values() for t in ts})
    segs = segment_dirs(index_dir)

    def task(batch: pa.Table) -> pa.Table:
        qids_out, docs_out, counts_out = [], [], []
        for seg_dir in batch["seg_dir"].to_pylist():
            seg = SegmentPositions(seg_dir, all_terms)
            for qid, (term,) in tokenized.items():
                e = seg.term_entry(term)
                if e is None:
                    continue
                docs, tf, blen, pos_enc = e
                sel = np.arange(docs.size, dtype=np.int64)
                pos, run_idx = _decode_runs(pos_enc, tf, blen, sel)
                hit = pos < limit
                if not hit.any():
                    continue
                counts = np.bincount(run_idx[hit], minlength=docs.size)
                keep = counts > 0
                qids_out.extend([qid] * int(keep.sum()))
                docs_out.append(docs[keep])
                counts_out.append(counts[keep].astype(np.int64))
        return pa.table(
            {
                "query_id": pa.array(np.asarray(qids_out, np.int64)),
                "doc_id": pa.array(
                    np.concatenate(docs_out) if docs_out else np.empty(0, np.int64)
                ),
                "n_occ": pa.array(
                    np.concatenate(counts_out) if counts_out else np.empty(0, np.int64)
                ),
            }
        )

    ds = rd.from_items(
        [{"seg_dir": s} for s in segs], override_num_blocks=len(segs)
    ).map_batches(task, batch_format="pyarrow", batch_size=1, concurrency=concurrency)
    tomb = load_tombstones(index_dir)
    if tomb.size:
        tomb_ref = ray.put(tomb)

        def drop_deleted(batch: pa.Table) -> pa.Table:
            t = ray.get(tomb_ref)
            keep = ~np.isin(batch["doc_id"].to_numpy(zero_copy_only=False), t)
            return batch.filter(pa.array(keep))

        ds = ds.map_batches(drop_deleted, batch_format="pyarrow")
    pdf = ds.to_pandas()
    schema = {"query_id": np.int64, "doc_id": np.int64, "n_occ": np.int64}
    if pdf.empty:
        return pd.DataFrame(columns=list(schema)).astype(schema)
    return pdf.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def span_not_search(
    index_dir: str,
    queries: list[tuple[int, dict]],
    *,
    pre: int = 0,
    post: int = 0,
    query_lang: str | None = None,
    concurrency: int | None = None,
):
    """SpanNotQuery (Lucene): occurrences of the ``include`` term with NO
    ``exclude``-term occurrence within ``pre`` positions before through
    ``post`` positions after (pre=post=0 = same-position overlap only,
    which for distinct single-term spans never fires — use windows).
    Each query is ``(qid, {"include": term, "exclude": term})``; returns
    (query_id, doc_id, n_occ) rows for docs keeping >= 1 include
    occurrence. Vectorized per segment: both terms' positions decode once,
    packed (doc, pos) keys make the window test two searchsorteds per
    include array; tombstone-aware like the other span faces."""
    import pandas as pd

    from splade_ray.build import segment_dirs
    from splade_ray.delete import load_tombstones

    load_positions_manifest(index_dir)
    if pre < 0 or post < 0:
        raise ValueError("pre/post must be >= 0")
    spec: dict[int, tuple[str, str]] = {}
    for qid, q in queries:
        inc = tokenize(q["include"], query_lang) if query_lang else tokenize(q["include"])
        exc = tokenize(q["exclude"], query_lang) if query_lang else tokenize(q["exclude"])
        if len(inc) != 1 or len(exc) != 1:
            raise ValueError(
                f"span_not takes single-term include/exclude; got {q!r}"
            )
        spec[int(qid)] = (inc[0], exc[0])
    all_terms = sorted({t for pair in spec.values() for t in pair})
    segs = segment_dirs(index_dir)
    pre_u, post_u = np.uint64(pre), np.uint64(post)

    def task(batch: pa.Table) -> pa.Table:
        qids_out, docs_out, counts_out = [], [], []
        for seg_dir in batch["seg_dir"].to_pylist():
            seg = SegmentPositions(seg_dir, all_terms)
            for qid, (inc, exc) in spec.items():
                e = seg.term_entry(inc)
                if e is None:
                    continue
                docs, tf, blen, pos_enc = e
                sel = np.arange(docs.size, dtype=np.int64)
                ipos, irun = _decode_runs(pos_enc, tf, blen, sel)
                ikeys = (irun.astype(np.uint64) << _POS_BITS) | ipos.astype(np.uint64)
                ex = seg.term_entry(exc)
                if ex is None:
                    keep = np.ones(ikeys.size, bool)
                else:
                    xdocs, xtf, xblen, xpos_enc = ex
                    # map exclude runs onto the include doc index space;
                    # exclude docs absent from include can't affect anything
                    xin = np.isin(xdocs, docs, assume_unique=True)
                    xsel = np.flatnonzero(xin).astype(np.int64)
                    if xsel.size:
                        xpos, xrun = _decode_runs(xpos_enc, xtf, xblen, xsel)
                        xdoc_idx = np.searchsorted(docs, xdocs[xsel][xrun])
                        xkeys = (xdoc_idx.astype(np.uint64) << _POS_BITS) | (
                            xpos.astype(np.uint64)
                        )
                        xkeys.sort()
                        # window [pos-pre, pos+post] clamped to the doc:
                        # pos packs into the low 32 bits, so clamping lo at
                        # the doc's position 0 keeps keys inside the doc
                        lo = ikeys - np.minimum(pre_u, ikeys & np.uint64(0xFFFFFFFF))
                        hi = ikeys + post_u  # pos+post < 2^32 (doc-len bound)
                        keep = np.searchsorted(xkeys, lo, side="left") >= \
                            np.searchsorted(xkeys, hi, side="right")
                    else:
                        keep = np.ones(ikeys.size, bool)
                if not keep.any():
                    continue
                counts = np.bincount(irun[keep], minlength=docs.size)
                kd = counts > 0
                qids_out.extend([qid] * int(kd.sum()))
                docs_out.append(docs[kd])
                counts_out.append(counts[kd].astype(np.int64))
        return pa.table(
            {
                "query_id": pa.array(np.asarray(qids_out, np.int64)),
                "doc_id": pa.array(
                    np.concatenate(docs_out) if docs_out else np.empty(0, np.int64)
                ),
                "n_occ": pa.array(
                    np.concatenate(counts_out) if counts_out else np.empty(0, np.int64)
                ),
            }
        )

    ds = rd.from_items(
        [{"seg_dir": s} for s in segs], override_num_blocks=len(segs)
    ).map_batches(task, batch_format="pyarrow", batch_size=1, concurrency=concurrency)
    tomb = load_tombstones(index_dir)
    if tomb.size:
        tomb_ref = ray.put(tomb)

        def drop_deleted(batch: pa.Table) -> pa.Table:
            t = ray.get(tomb_ref)
            keep = ~np.isin(batch["doc_id"].to_numpy(zero_copy_only=False), t)
            return batch.filter(pa.array(keep))

        ds = ds.map_batches(drop_deleted, batch_format="pyarrow")
    pdf = ds.to_pandas()
    schema = {"query_id": np.int64, "doc_id": np.int64, "n_occ": np.int64}
    if pdf.empty:
        return pd.DataFrame(columns=list(schema)).astype(schema)
    return pdf.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def _slot_candidates(
    index_dir: str,
    slot_map: dict[int, list[list[str]]],
    *,
    concurrency: int | None = None,
):
    """Fan-out for slot-form (MultiPhrase) queries: one Ray task per
    segment evaluating every query's slot list, tombstone-filtered. Slots
    hold ANALYZED terms. Queries whose slot list is empty (or has an empty
    slot) are dropped — they can't match. Returns None when nothing
    survives."""
    from splade_ray.build import segment_dirs

    load_positions_manifest(index_dir)
    slot_map = {
        int(pid): slots
        for pid, slots in slot_map.items()
        if slots and all(slots)
    }
    if not slot_map:
        return None
    all_terms = sorted(
        {t for slots in slot_map.values() for slot in slots for t in slot}
    )
    segs = segment_dirs(index_dir)
    ds = rd.from_items(
        [{"seg_dir": s} for s in segs], override_num_blocks=len(segs)
    ).map_batches(
        phrase_match_batch,
        batch_format="pyarrow",
        batch_size=1,
        fn_kwargs={"phrases": slot_map, "terms": all_terms, "multi": True},
        concurrency=concurrency,
    )
    return _drop_tombstones(ds, index_dir)


def _collect_matches(ds):
    """(phrase_id, doc_id, phrase_count) DataFrame from a match Dataset
    (or None), deterministically ordered."""
    import pandas as pd

    out_schema = {"phrase_id": np.int64, "doc_id": np.int64, "phrase_count": np.int64}
    if ds is None:
        return pd.DataFrame(columns=list(out_schema)).astype(out_schema)
    pdf = ds.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=list(out_schema)).astype(out_schema)
    return pdf.sort_values(["phrase_id", "doc_id"]).reset_index(drop=True)


def multi_phrase_search(
    index_dir: str,
    queries: list[tuple[int, list[list[str]]]],
    *,
    query_lang: str | None = None,
    concurrency: int | None = None,
):
    """MultiPhraseQuery (Lucene): each query is ``(id, slots)`` where every
    slot lists alternative WORDS for that phrase position; a doc matches at
    start ``p`` when slot ``i`` matches some alternative at ``p + i``
    ("sort merge|part" matches "sort merge" and "sort part"). Returns
    (phrase_id, doc_id, phrase_count) with overlapping starts counted, like
    phrase_search. Alternatives go through the index analyzer and must stay
    single tokens (a multi-token alternative has no single-slot meaning).
    Same per-segment fan-out / tombstone handling as phrase_search.

    Beyond-reference fulltext face (the reference is bag-of-words only,
    splade/tasks/transformer_evaluator.py:142-193)."""
    pman = load_positions_manifest(index_dir)
    if query_lang is None:
        query_lang = pman.get("analyzer")
    slot_map: dict[int, list[list[str]]] = {}
    for pid, slots in queries:
        out_slots: list[list[str]] = []
        for alts in slots:
            toks: list[str] = []
            for alt in alts:
                t = tokenize(alt, query_lang) if query_lang else tokenize(alt)
                if len(t) > 1:
                    raise ValueError(
                        f"multi_phrase alternative {alt!r} analyzes to "
                        f"{len(t)} tokens; slots take single-token alternatives"
                    )
                toks.extend(t)  # 0-token alts (stopwords/punct) just drop
            out_slots.append(sorted(set(toks)))
        slot_map[int(pid)] = out_slots
    ds = _slot_candidates(index_dir, slot_map, concurrency=concurrency)
    return _collect_matches(ds)


def match_phrase_prefix_search(
    index_dir: str,
    phrases: list[tuple[int, str]],
    *,
    max_expansions: int = 50,
    query_lang: str | None = None,
    concurrency: int | None = None,
):
    """match_phrase_prefix (Elasticsearch) / Lucene MultiPhraseQuery with a
    prefix-expanded last slot: the phrase's final token is treated as a
    PREFIX and rewritten to the first ``max_expansions`` matching lexicon
    terms (ascending, mirroring Lucene's rewrite cap); earlier tokens match
    exactly. Returns (phrase_id, doc_id, phrase_count); a prefix with no
    lexicon expansion matches nothing. Built on the multi-phrase kernel —
    one per-segment task, expansion read is a lexicon range pushdown
    (suggest.expand_prefix)."""
    from splade_ray.suggest import expand_prefix

    pman = load_positions_manifest(index_dir)
    if query_lang is None:
        query_lang = pman.get("analyzer")
    slot_map: dict[int, list[list[str]]] = {}
    for pid, text in phrases:
        toks = tokenize(text, query_lang) if query_lang else tokenize(text)
        if not toks:
            slot_map[int(pid)] = []  # dropped by _slot_candidates
            continue
        expansion = expand_prefix(index_dir, toks[-1], max_terms=max_expansions)
        slot_map[int(pid)] = [[t] for t in toks[:-1]] + [expansion]
    ds = _slot_candidates(index_dir, slot_map, concurrency=concurrency)
    return _collect_matches(ds)


def _span_rel_batch(
    batch: pa.Table,
    *,
    spec: dict[int, tuple[list[str], str]],
    terms: list[str],
    slop: int,
    mode: str,
) -> pa.Table:
    """Per-segment SpanContaining / SpanWithin evaluation. ``big`` spans are
    the greedy ordered chains of ``near_spans``; ``little`` is a term.

    - ``containing``: count BIG spans holding >= 1 little occurrence in
      their closed interval [start, end] (Lucene SpanContainingQuery —
      matches are the big spans);
    - ``within``: count LITTLE occurrences covered by >= 1 big span
      (SpanWithinQuery — matches are the little spans).

    Both tests are two searchsorteds over packed (doc_rank, position) keys;
    packing confines every comparison to its own doc run (an earlier run's
    keys are strictly smaller), so no per-doc loop is needed."""
    qids_out, docs_out, counts_out = [], [], []
    for seg_dir in batch["seg_dir"].to_pylist():
        seg = SegmentPositions(seg_dir, terms)
        for qid, (big, little) in spec.items():
            common, start, end = seg.near_spans(big, slop)
            if start.size == 0:
                continue
            le = seg.term_entry(little)
            if le is None:
                continue
            ldocs, ltf, lblen, lpos_enc = le
            lsel = np.flatnonzero(
                np.isin(ldocs, common, assume_unique=True)
            ).astype(np.int64)
            if lsel.size == 0:
                continue
            lpos, lrun = _decode_runs(lpos_enc, ltf, lblen, lsel)
            ldoc_idx = np.searchsorted(common, ldocs[lsel][lrun])
            lkeys = (ldoc_idx.astype(np.uint64) << _POS_BITS) | lpos.astype(
                np.uint64
            )
            if mode == "containing":
                lo = np.searchsorted(lkeys, start, side="left")
                hi = np.searchsorted(lkeys, end, side="right")
                hits = (start[hi > lo] >> _POS_BITS).astype(np.int64)
            else:  # within
                # spans ascend by start; greedy ends are nondecreasing per
                # run and runs ascend, so a running max of end keys gives
                # the farthest coverage among spans starting at or before
                # each little occurrence
                cm = np.maximum.accumulate(end)
                idx = np.searchsorted(start, lkeys, side="right") - 1
                covered = (idx >= 0) & (cm[np.maximum(idx, 0)] >= lkeys)
                hits = (lkeys[covered] >> _POS_BITS).astype(np.int64)
            if hits.size == 0:
                continue
            counts = np.bincount(hits, minlength=common.size)
            kd = counts > 0
            qids_out.extend([qid] * int(kd.sum()))
            docs_out.append(common[kd])
            counts_out.append(counts[kd].astype(np.int64))
    return pa.table(
        {
            "query_id": pa.array(np.asarray(qids_out, np.int64)),
            "doc_id": pa.array(
                np.concatenate(docs_out) if docs_out else np.empty(0, np.int64)
            ),
            "n_spans": pa.array(
                np.concatenate(counts_out) if counts_out else np.empty(0, np.int64)
            ),
        }
    )


def _span_rel_search(
    index_dir: str,
    queries: list[tuple[int, dict]],
    *,
    mode: str,
    slop: int,
    query_lang: str | None,
    concurrency: int | None,
):
    import pandas as pd

    from splade_ray.build import segment_dirs

    pman = load_positions_manifest(index_dir)
    if query_lang is None:
        query_lang = pman.get("analyzer")
    spec: dict[int, tuple[list[str], str]] = {}
    for qid, q in queries:
        big = tokenize(q["big"], query_lang) if query_lang else tokenize(q["big"])
        little = (
            tokenize(q["little"], query_lang) if query_lang else tokenize(q["little"])
        )
        if len(big) < 1 or len(little) != 1:
            raise ValueError(
                f"span_{mode} takes a big span text (>=1 token) and a "
                f"single-term little; got {q!r}"
            )
        spec[int(qid)] = (big, little[0])
    all_terms = sorted(
        {t for big, little in spec.values() for t in [*big, little]}
    )
    segs = segment_dirs(index_dir)
    ds = rd.from_items(
        [{"seg_dir": s} for s in segs], override_num_blocks=len(segs)
    ).map_batches(
        _span_rel_batch,
        batch_format="pyarrow",
        batch_size=1,
        fn_kwargs={"spec": spec, "terms": all_terms, "slop": slop, "mode": mode},
        concurrency=concurrency,
    )
    ds = _drop_tombstones(ds, index_dir)
    pdf = ds.to_pandas()
    schema = {"query_id": np.int64, "doc_id": np.int64, "n_spans": np.int64}
    if pdf.empty:
        return pd.DataFrame(columns=list(schema)).astype(schema)
    return pdf.sort_values(["query_id", "doc_id"]).reset_index(drop=True)


def span_containing_search(
    index_dir: str,
    queries: list[tuple[int, dict]],
    *,
    slop: int = 2,
    query_lang: str | None = None,
    concurrency: int | None = None,
):
    """SpanContainingQuery (Lucene): big spans (greedy ordered chains of the
    ``big`` text's terms within ``slop``) that CONTAIN an occurrence of the
    single-term ``little`` in their closed interval. Each query is
    ``(qid, {"big": text, "little": term})``; returns (query_id, doc_id,
    n_spans) rows. Per-segment fan-out, tombstone-aware."""
    return _span_rel_search(
        index_dir, queries, mode="containing", slop=slop,
        query_lang=query_lang, concurrency=concurrency,
    )


def span_within_search(
    index_dir: str,
    queries: list[tuple[int, dict]],
    *,
    slop: int = 2,
    query_lang: str | None = None,
    concurrency: int | None = None,
):
    """SpanWithinQuery (Lucene): occurrences of the single-term ``little``
    that lie WITHIN some big span (greedy ordered chain of the ``big``
    text's terms, span <= len(big)-1+slop). Returns (query_id, doc_id,
    n_spans) counting covered little occurrences."""
    return _span_rel_search(
        index_dir, queries, mode="within", slop=slop,
        query_lang=query_lang, concurrency=concurrency,
    )
