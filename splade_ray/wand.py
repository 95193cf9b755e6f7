"""Block-max WAND early-termination scoring.

The reference's latency numbers come from PISA's ``block_max_wand`` over a
``block_simdbp`` index with fixed block-max windows
(``efficient_splade_pisa/README.md:28-38``); this module is our native
equivalent over the Parquet posting segments. Upper bounds are evaluated at
query time from each block's stored ``(tf_max, dl_min)`` (see
``splade_ray.bm25.term_upper_bound``), so they are valid for any global
``avgdl``. Exactness (identical docIDs and scores to the exact term-at-a-time
kernel) is property-tested in tests/test_wand.py: pruning only ever discards
docs whose score upper bound is <= the current k-th best score, and because
WAND visits docs in ascending id order, an equal-score later doc would lose
the (score desc, doc_id asc) tie-break anyway.
"""

from __future__ import annotations

import heapq

import numpy as np

from splade_ray.bm25 import BM25Params, term_upper_bound, tf_component
from splade_ray.codec import varbyte_decode


class PostingIterator:
    """Cursor over one term's blocked posting list with O(1) block skipping."""

    __slots__ = (
        "term", "w", "docs_enc", "tfs_enc", "bm_first", "bm_last", "bm_doc_off",
        "bm_tf_off", "block_ubs", "nblocks", "bi", "idx", "cur_doc",
        "blk_docs", "blk_contrib", "exhausted", "term_ub", "_seg", "_avgdl", "_p",
    )

    def __init__(self, seg, row: dict, term: str, w: float, avgdl: float, p: BM25Params):
        self.term = term
        self.w = w
        self.docs_enc = row["docs_enc"]
        self.tfs_enc = row["tfs_enc"]
        self.bm_first = row["bm_first_doc"]
        self.bm_last = row["bm_last_doc"]
        self.bm_doc_off = row["bm_doc_off"]
        self.bm_tf_off = row["bm_tf_off"]
        self.nblocks = len(self.bm_first)
        self._seg = seg
        self._avgdl = avgdl
        self._p = p
        self.block_ubs = [
            w * term_upper_bound(tf_max, dl_min, avgdl, p)
            for tf_max, dl_min in zip(row["bm_tf_max"], row["bm_dl_min"])
        ]
        self.term_ub = max(self.block_ubs)
        self.exhausted = False
        self.bi = -1
        self._load_block(0)

    def _load_block(self, bi: int):
        if bi >= self.nblocks:
            self.exhausted = True
            self.cur_doc = np.iinfo(np.int64).max
            return
        self.bi = bi
        prev_last = self.bm_last[bi - 1] if bi > 0 else 0
        d = varbyte_decode(self.docs_enc[self.bm_doc_off[bi] : self.bm_doc_off[bi + 1]])
        docs = prev_last + np.cumsum(d.astype(np.int64))
        tfs = varbyte_decode(self.tfs_enc[self.bm_tf_off[bi] : self.bm_tf_off[bi + 1]]).astype(
            np.int64
        )
        pos = np.searchsorted(self._seg.doc_ids, docs)
        dls = self._seg.doc_lens[pos]
        self.blk_docs = docs
        self.blk_contrib = self.w * tf_component(tfs, dls, self._avgdl, self._p)
        self.idx = 0
        self.cur_doc = int(docs[0])

    def seek(self, target: int):
        """Advance to the first doc >= target, skipping whole blocks."""
        if self.exhausted or self.cur_doc >= target:
            return
        if target > self.bm_last[self.bi]:
            bi = int(np.searchsorted(np.asarray(self.bm_last[self.bi + 1 :]), target)) + self.bi + 1
            self._load_block(bi)
            if self.exhausted:
                return
        self.idx = int(np.searchsorted(self.blk_docs[self.idx :], target)) + self.idx
        self.cur_doc = int(self.blk_docs[self.idx])

    def advance(self):
        self.idx += 1
        if self.idx >= self.blk_docs.size:
            self._load_block(self.bi + 1)
        else:
            self.cur_doc = int(self.blk_docs[self.idx])

    def contribution(self) -> float:
        return float(self.blk_contrib[self.idx])

    def current_block_ub(self, doc: int) -> float:
        """Upper bound of the block that covers (or is next to cover) doc."""
        if self.exhausted:
            return 0.0
        bi = self.bi
        if doc > self.bm_last[bi]:
            bi = int(np.searchsorted(np.asarray(self.bm_last[bi + 1 :]), doc)) + bi + 1
            if bi >= self.nblocks:
                return 0.0
        return self.block_ubs[bi]

    def block_last(self, doc: int) -> int:
        if self.exhausted:
            return np.iinfo(np.int64).max
        bi = self.bi
        if doc > self.bm_last[bi]:
            bi = int(np.searchsorted(np.asarray(self.bm_last[bi + 1 :]), doc)) + bi + 1
            if bi >= self.nblocks:
                return np.iinfo(np.int64).max
        return self.bm_last[bi]


def _wand_one_query(seg, terms: list[tuple[str, int, float]], p: BM25Params, avgdl: float):
    iters: list[PostingIterator] = []
    for term, qtf, w in terms:
        i = seg.posting_row(term)
        if i is not None:
            iters.append(PostingIterator(seg, i, term, w * qtf, avgdl, p))
    if not iters:
        return []
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of current top-k
    k = p.top_k

    def theta() -> float:
        return heap[0][0] if len(heap) >= k else p.threshold

    while True:
        live = [it for it in iters if not it.exhausted]
        if not live:
            break
        live.sort(key=lambda it: it.cur_doc)
        # pivot: first prefix whose term-ub sum can beat theta
        acc = 0.0
        pivot = -1
        th = theta()
        for j, it in enumerate(live):
            acc += it.term_ub
            if acc > th:
                pivot = j
                break
        if pivot == -1:
            break
        pivot_doc = live[pivot].cur_doc
        # The candidate bound must cover EVERY list that can contain
        # pivot_doc: the pivot prefix plus any later iterator currently
        # parked on the same doc.
        n_pre = pivot + 1
        while n_pre < len(live) and live[n_pre].cur_doc == pivot_doc:
            n_pre += 1
        if live[0].cur_doc == pivot_doc:
            # block-max refinement: tighter bound from the actual blocks
            block_sum = sum(it.current_block_ub(pivot_doc) for it in live[:n_pre])
            if block_sum <= th:
                # Skip to the next block boundary among the covering lists,
                # capped at the next iterator's current doc — beyond that doc
                # another term contributes and the bound above no longer
                # covers the skipped range (Ding & Suel BMW semantics).
                nxt = min(it.block_last(pivot_doc) for it in live[:n_pre]) + 1
                if n_pre < len(live):
                    nxt = min(nxt, live[n_pre].cur_doc)
                nxt = max(nxt, pivot_doc + 1)
                for it in live[:n_pre]:
                    it.seek(nxt)
                continue
            # Sum contributions in sorted-term order — the exact kernel
            # accumulates terms ascending, and float addition order must
            # match bit-for-bit for the rank-identity guarantee.
            at_pivot = [it for it in live if it.cur_doc == pivot_doc]
            at_pivot.sort(key=lambda it: it.term)
            score = 0.0
            for it in at_pivot:
                score += it.contribution()
            for it in at_pivot:
                it.advance()
            entry = (score, -pivot_doc)
            if score > p.threshold:
                if len(heap) < k:
                    heapq.heappush(heap, entry)
                elif entry > heap[0]:
                    heapq.heapreplace(heap, entry)
        else:
            for it in live[:pivot]:
                it.seek(pivot_doc)
    out = sorted(((s, -nd) for s, nd in heap), key=lambda x: (-x[0], x[1]))
    return [(doc, score) for score, doc in out]


def score_segment_bmw_docwise(seg, prepared: dict) -> list[tuple[int, int, float]]:
    """Doc-at-a-time block-max WAND (the textbook pivot formulation). Kept
    as the reference implementation; superseded for speed by the block-at-
    a-time kernel below (same results, property-tested)."""
    p: BM25Params = prepared["params"]
    avgdl = prepared["avgdl"]
    rows: list[tuple[int, int, float]] = []
    for qid, terms in prepared["queries"].items():
        for doc, score in _wand_one_query(seg, terms, p, avgdl):
            rows.append((qid, int(doc), float(score)))
    return rows


def _bmw_block_one(seg, terms, p: BM25Params, avgdl: float):
    """Block-at-a-time BMW: iterate doc-id windows delimited by the union of
    the query terms' block boundaries (so no window straddles any term's
    block). A window is skipped when the sum of covering block upper bounds
    cannot beat the current heap floor; surviving windows are scored with
    vectorized slices — per-doc sums accumulated term-layer by term-layer
    (one scatter-add per query term, ascending term order) so the float
    additions happen in exactly the exact kernel's term order
    (bit-identical scores; reduceat/pairwise reductions were rejected
    because they reorder additions). Skipping is tie-safe for the same reason as the
    doc-wise kernel: windows advance in ascending doc id, and an equal-score
    later doc loses the (score desc, doc_id asc) tie-break anyway."""
    from splade_ray.segments import decode_block

    # decoded-block cache lives on the SEGMENT, keyed (term, block): in a
    # persistent shard actor the expensive decode+searchsorted survives
    # across queries and calls (the exact kernel's _decoded analog); the
    # query-dependent wq factor is applied per use, outside the cache
    block_cache = getattr(seg, "_block_cache", None)
    if block_cache is None:
        block_cache = seg._block_cache = {}
    metas = []
    for term, qtf, w in terms:  # terms pre-sorted ascending
        row = seg.posting_row(term)
        if row is None:
            continue
        wq = w * qtf
        bl = np.asarray(row["bm_last_doc"], np.int64)
        bf = np.asarray(row["bm_first_doc"], np.int64)
        ubs = np.array(
            [
                wq * term_upper_bound(tm, dm, avgdl, p)
                for tm, dm in zip(row["bm_tf_max"], row["bm_dl_min"])
            ],
            np.float64,
        )
        metas.append([wq, row, bl, bf, ubs, term])
    if not metas:
        return []
    bounds = np.unique(np.concatenate([m[2] for m in metas]))
    W = bounds.size
    # Vectorized window metadata, computed once per (query, segment): for
    # every term and window, the covering block index and its upper-bound
    # contribution. The skip test then becomes an array compare + argmax
    # scan instead of a per-window Python loop — the win on mixed queries
    # (one rare + one ubiquitous term), where thousands of windows are
    # skipped once the heap floor exceeds the common term's solo bound.
    cover_bis = []
    ub_win = np.zeros(W, np.float64)
    for wq, row, bl, bf, ubs, _term in metas:
        bi = np.searchsorted(bl, bounds)  # unique block with last >= hi
        valid = bi < bl.size
        bic = np.minimum(bi, bl.size - 1)
        valid &= bf[bic] <= bounds
        cover_bis.append(np.where(valid, bic, -1))
        ub_win += np.where(valid, ubs[bic], 0.0)
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    k = p.top_k
    i = 0
    while i < W:
        theta = heap[0][0] if len(heap) >= k else p.threshold
        beat = ub_win[i:] > theta
        j_rel = int(np.argmax(beat))  # first True, or 0 when none
        if not beat[j_rel]:
            break  # no remaining window can beat theta
        j = i + j_rel
        i = j + 1
        lo = int(bounds[j - 1]) if j > 0 else -1
        hi = int(bounds[j])
        cover = [
            (m, int(cb[j])) for m, cb in zip(metas, cover_bis) if cb[j] >= 0
        ]
        parts_docs, parts_contrib = [], []
        for m, bi in cover:
            wq, row, bl, bf, ubs, term = m
            key = (term, bi)
            got = block_cache.get(key)
            if got is None:
                d, t = decode_block(
                    row["docs_enc"], row["tfs_enc"], row["bm_doc_off"],
                    row["bm_tf_off"], row["bm_last_doc"], bi,
                )
                pos = np.searchsorted(seg.doc_ids, d)
                got = block_cache[key] = (d, t, seg.doc_lens[pos])
            d, t_blk, dl_blk = got
            contrib = wq * tf_component(t_blk, dl_blk, avgdl, p)
            s = int(np.searchsorted(d, lo, side="right"))
            e = int(np.searchsorted(d, hi, side="right"))
            if e > s:
                parts_docs.append(d[s:e])
                parts_contrib.append(contrib[s:e])
        if not parts_docs:
            continue
        # Per-doc sums accumulated term-layer by term-layer — the same
        # accumulator structure (and therefore float addition order) as the
        # exact kernel, restricted to the window. NOT reduceat/pairwise:
        # those reorder additions and break bit-identity.
        udocs = np.unique(np.concatenate(parts_docs))
        scores = np.zeros(udocs.size, np.float64)
        for d_part, c_part in zip(parts_docs, parts_contrib):
            scores[np.searchsorted(udocs, d_part)] += c_part
        keep = scores > max(theta, p.threshold)
        for d, s in zip(udocs[keep], scores[keep]):
            entry = (float(s), -int(d))
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
    out = sorted(((s, -nd) for s, nd in heap), key=lambda x: (-x[0], x[1]))
    return [(doc, score) for score, doc in out]


def score_segment_bmw(seg, prepared: dict) -> list[tuple[int, int, float]]:
    """Score all prepared queries against one segment with block-at-a-time
    block-max WAND (exact results; see _bmw_block_one)."""
    p: BM25Params = prepared["params"]
    avgdl = prepared["avgdl"]
    rows: list[tuple[int, int, float]] = []
    for qid, terms in prepared["queries"].items():
        for doc, score in _bmw_block_one(seg, terms, p, avgdl):
            rows.append((qid, int(doc), float(score)))
    return rows
