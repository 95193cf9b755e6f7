"""BM25 top-k retrieval: scatter-gather over index segments.

Replaces the reference's single-process retriever (``SparseRetrieval``,
``splade/tasks/transformer_evaluator.py:113-193``: whole index in RAM, one
query at a time) with the inverse parallelism: a batch of queries is
broadcast once (``ray.put``) to an actor pool over doc-partitioned segments;
each segment scores all queries term-at-a-time against its local postings
(score accumulators sized to the *segment's* doc count, not the global N —
contrast ``transformer_evaluator.py:100``), keeps a per-(query, segment)
top-k, and a small ``groupby(query_id)`` merges per-segment heaps into the
global top-k with the deterministic (score desc, doc_id asc) tie-break.

Two scoring kernels share the same decoded postings:
- ``exact``  — term-at-a-time numpy accumulation (the oracle semantics);
- ``bmw``    — block-max WAND early termination (splade_ray.wand), verified
               equal to ``exact`` by property tests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import ray
import ray.data as rd

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores
from splade_ray.build import load_manifest, segment_dirs
from splade_ray.segments import decode_posting

RUN_COLUMNS = ["query_id", "rank", "doc_id", "score"]


def prepare_queries(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
    scoring: str = "bm25",
    mu: float = 2000.0,
    lam: float = 0.1,
    dfr_c: float = 1.0,
    stats_override: dict | None = None,
) -> dict:
    """Driver-side query prep: tokenize, look up global df (and, for QL, cf)
    for the (few) query terms from the lexicon with predicate pushdown,
    precompute the per-term global weight. The result is a small
    broadcastable dict — the global-stats side of the scatter-gather
    (small-side broadcast, not a shuffle join).

    ``query_lang`` selects the registered analyzer for the query text (use
    it against indexes built with ``lang_col`` so query terms match the
    target language's token class); None defaults to the analyzer the index
    was built with (``build_index(analyzer=...)``, recorded in its
    manifest), else the collection-wide class.

    ``scoring`` picks the similarity (the Lucene similarity-registry analog):

    - ``"bm25"`` (default) — per-term weight = idf;
    - ``"ql"`` — Dirichlet-smoothed query likelihood (Zhai & Lafferty 2001;
      Lucene LMDirichletSimilarity shape), per-term weight ``mu * cf/C``
      (the smoothing denominator), kernel
      ``qtf * max(0, ln(1 + tf/(mu*cf/C)) + ln(mu/(dl+mu)))`` over matching
      terms (per-term clamp as in Lucene, so scores stay positive and the
      ``score > threshold`` run contract holds);
    - ``"lmjm"`` — Jelinek-Mercer-smoothed query likelihood (Lucene
      LMJelinekMercerSimilarity), per-term weight ``lam * cf/C``, kernel
      ``qtf * ln(1 + ((1-lam) * tf/dl) / (lam*cf/C))`` — always positive on
      a match, no clamp needed; ``lam`` in (0,1), typically 0.1 for short
      queries / 0.7 for long;
    - ``"tfidf"`` — Lucene ClassicSimilarity (pre-6 TFIDFSimilarity,
      queryNorm/coord dropped as in Lucene 7+): per-term weight
      ``idf_c²`` with ``idf_c = 1 + ln(n_docs/(df+1))``, kernel
      ``qtf * idf_c² * sqrt(tf) / sqrt(dl)`` (``1/sqrt(dl)`` is the
      unencoded fieldNorm);
    - ``"dfr"`` — divergence-from-randomness InL2 (Lucene DFRSimilarity
      with BasicModelIn + AfterEffectL + NormalizationH2, parameter
      ``dfr_c``): per-term weight ``log2((N+1)/(df+0.5))``, kernel
      ``qtf * w * tfn/(tfn+1)`` with ``tfn = tf·log2(1 + c·avgdl/dl)`` —
      positive on every match.

    ``stats_override`` replaces the index's own corpus statistics with the
    caller's — ``{"n_docs", "avgdl", "dfs", "cfs", "c_total"}`` — the
    Lucene MultiReader hook: federated search combines the member
    indices' stats once and scores every member under the union (see
    :func:`splade_ray.multi.search_multi`)."""
    params = params or BM25Params()
    manifest = load_manifest(index_dir)
    if query_lang is None:
        query_lang = manifest.get("analyzer")
    tokenized = {int(qid): term_counts(text, query_lang) for qid, text in queries}
    all_terms = sorted({t for c in tokenized.values() for t in c})
    dfs: dict[str, int] = {}
    cfs: dict[str, int] = {}
    if stats_override is not None:
        n_docs, avgdl = stats_override["n_docs"], stats_override["avgdl"]
        dfs = {t: stats_override["dfs"][t] for t in all_terms
               if t in stats_override["dfs"]}
        cfs = {t: stats_override["cfs"][t] for t in all_terms
               if t in stats_override["cfs"]}
    else:
        n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]
        if all_terms:
            lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
                columns=["term", "df", "cf"], filter=pads.field("term").isin(all_terms)
            )
            dfs = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))
            cfs = dict(zip(lex["term"].to_pylist(), lex["cf"].to_pylist()))
    if scoring in ("ql", "lmjm"):
        if stats_override is not None:
            c_total = float(stats_override["c_total"])
        else:
            c_total = float(manifest.get("sum_doc_len") or (avgdl * n_docs))
        if scoring == "ql":

            def weight(t: str) -> float:
                return mu * cfs[t] / c_total

        else:

            def weight(t: str) -> float:
                return lam * cfs[t] / c_total

    elif scoring == "bm25":

        def weight(t: str) -> float:
            return idf(dfs[t], n_docs)

    elif scoring == "tfidf":

        def weight(t: str) -> float:
            idf_c = 1.0 + np.log(n_docs / (dfs[t] + 1.0))
            return float(idf_c * idf_c)

    elif scoring == "dfr":

        def weight(t: str) -> float:
            return float(np.log2((n_docs + 1.0) / (dfs[t] + 0.5)))

    else:
        raise ValueError(
            f"unknown scoring {scoring!r} (expected 'bm25', 'ql', 'lmjm', "
            f"'tfidf' or 'dfr')"
        )
    prepared_queries = {}
    for qid, c in tokenized.items():
        terms = [
            (t, int(c[t]), weight(t))
            for t in sorted(c)
            if t in dfs
        ]
        prepared_queries[qid] = terms
    return {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "params": params,
        "scoring": scoring,
        "mu": mu,
        "lam": lam,
        "dfr_c": dfr_c,
        "queries": prepared_queries,
        "terms": sorted({t for ts in prepared_queries.values() for t, _, _ in ts}),
        "dfs": dfs,  # global docFreq per term (explain's df column)
    }


class SegmentIndex:
    """One loaded segment: doc ids / lengths + (lazily filtered) postings."""

    def __init__(
        self,
        seg_dir: str,
        terms: list[str] | None = None,
        tombstones: np.ndarray | None = None,
    ):
        self.seg_dir = seg_dir
        dl = pq.read_table(
            os.path.join(seg_dir, "doclens.parquet"), columns=["doc_id", "doc_len"]
        )
        self.doc_ids = dl["doc_id"].to_numpy().astype(np.int64)
        self.doc_lens = dl["doc_len"].to_numpy().astype(np.int64)
        from splade_ray.delete import deleted_mask_for

        # Lucene-style logical deletes: tombstoned docs are filtered out of
        # every decoded posting (pos_tfs), i.e. BEFORE the per-segment top-k
        # cut, while df/avgdl/N keep their build-time values until purge.
        self.deleted = deleted_mask_for(self.doc_ids, tombstones)
        src = pads.dataset(os.path.join(seg_dir, "postings.parquet"))
        if terms is not None and len(terms) == 0:
            # isin([]) binds a null-typed value set and Arrow raises; an
            # empty term list means "load no postings" (e.g. a fielded query
            # whose terms all miss this field's lexicon)
            self.postings = src.schema.empty_table()
        else:
            flt = pads.field("term").isin(terms) if terms is not None else None
            self.postings = src.to_table(filter=flt)
        self._by_term = {t: i for i, t in enumerate(self.postings["term"].to_pylist())}
        # decoded-posting cache: populated lazily, shared across queries in a
        # batch and across calls when the segment lives in a persistent actor
        self._decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # numeric doc-values cache (range_filter), same lifetime as _decoded
        self._numcols: dict[str, np.ndarray] = {}
        # function_score multiplier cache: the per-doc multiplier vector is
        # query-INDEPENDENT (a pure function of sidecar doc values), so one
        # spec computes once per segment and serves every query/chunk
        self._fscore: dict[tuple, np.ndarray] = {}
        # facet-column dictionary cache (facet_codes): query-independent,
        # shared across calls when the segment lives in a persistent actor
        self._facetcols: dict[tuple, tuple] = {}

    def numeric_values(self, col: str) -> np.ndarray:
        """Sidecar numeric doc column aligned to doc_ids (cached — loaded
        once per segment per actor, like decoded postings)."""
        got = self.doc_values(col)
        if not np.issubdtype(got.dtype, np.number):
            raise TypeError(f"doc column {col!r} is not numeric ({got.dtype})")
        return got

    def doc_values(self, col: str) -> np.ndarray:
        """Sidecar doc column of any dtype aligned to doc_ids (cached).
        String columns come back as numpy ``<U`` arrays so comparisons and
        sorts are vectorized with codepoint (binary-collation) ordering —
        the same total order as Python ``str`` and DuckDB's default."""
        got = self._numcols.get(col)
        if got is None:
            got = pq.read_table(
                os.path.join(self.seg_dir, "doclens.parquet"), columns=[col]
            )[col].to_numpy(zero_copy_only=False)
            if got.dtype == object:
                got = got.astype(str)
            self._numcols[col] = got
        return got

    def facet_codes(self, col: str, multivalued: bool = False):
        """Dictionary-encoded categorical sidecar column, cached (the
        facet-aggregation analog of :meth:`doc_values`): returns
        ``(parents, codes, values)``. Single-valued: ``parents is None``
        and ``codes`` aligns to ``doc_ids``. Multivalued (list<string>):
        ``(parents, codes)`` are the exploded pairs, deduped so a doc
        counts once per DISTINCT value (ES terms-agg array contract)."""
        key = (col, bool(multivalued))
        got = self._facetcols.get(key)
        if got is not None:
            return got
        raw = pq.read_table(
            os.path.join(self.seg_dir, "doclens.parquet"), columns=[col]
        )[col].combine_chunks()
        if multivalued:
            flat = raw.flatten().dictionary_encode()
            fcodes = flat.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            values = flat.dictionary.to_pylist()
            offs = raw.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            parents = np.repeat(np.arange(len(raw)), np.diff(offs))
            pair = parents * max(len(values), 1) + fcodes
            keep = np.zeros(pair.size, bool)
            if pair.size:
                order = np.argsort(pair, kind="stable")
                ps = pair[order]
                first = np.concatenate(([True], ps[1:] != ps[:-1]))
                keep[order[first]] = True
            got = (parents[keep], fcodes[keep], values)
        else:
            fac = raw.dictionary_encode()
            got = (None,
                   fac.indices.to_numpy(zero_copy_only=False).astype(np.int64),
                   fac.dictionary.to_pylist())
        self._facetcols[key] = got
        return got

    def range_keep_mask(self, prepared: dict) -> np.ndarray | None:
        """Boolean keep-mask for the prepared dict's ``range_filter``
        ``(col, lo, hi)`` (inclusive; None = unbounded), or None. Numeric
        bounds filter a numeric sidecar column (Lucene PointRangeQuery);
        string bounds filter a string column lexicographically (Lucene
        TermRangeQuery, binary collation)."""
        rf = prepared.get("range_filter")
        if rf is None:
            return None
        col, lo, hi = rf
        if lo is None and hi is None:
            return None  # unbounded range = no filter, any column dtype
        if isinstance(lo, str) or isinstance(hi, str):
            vals = self.doc_values(col)
            if vals.dtype.kind != "U":
                raise TypeError(
                    f"string range bounds need a string doc column; "
                    f"{col!r} is {vals.dtype}"
                )
        else:
            vals = self.numeric_values(col)
        keep = np.ones(vals.size, bool)
        if lo is not None:
            keep &= vals >= lo
        if hi is not None:
            keep &= vals <= hi
        return keep

    def posting(self, term: str):
        i = self._by_term.get(term)
        if i is None:
            return None
        row = self.postings.slice(i, 1)
        docs, tfs = decode_posting(
            row["docs_enc"][0].as_py(), row["tfs_enc"][0].as_py(), row["df"][0].as_py()
        )
        return docs, tfs, row

    def posting_row(self, term: str) -> dict | None:
        """Raw (still-encoded) posting row incl. block-max metadata — the
        input shape for the block-skipping WAND iterator."""
        i = self._by_term.get(term)
        if i is None:
            return None
        return {name: self.postings[name][i].as_py() for name in self.postings.column_names}

    def pos_tfs(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Decoded posting for ``term`` as (positions into ``doc_ids``, tfs),
        cached across queries in a batch and across calls in a persistent
        actor. Empty arrays when the term has no posting in this segment."""
        cache = self._decoded
        got = cache.get(term)
        if got is None:
            post = self.posting(term)
            if post is None:
                got = (np.empty(0, np.int64), np.empty(0, np.int64))
            else:
                docs, tfs, _ = post
                pos = np.searchsorted(self.doc_ids, docs)
                if self.deleted is not None:
                    keep = ~self.deleted[pos]
                    pos, tfs = pos[keep], tfs[keep]
                got = (pos, tfs)
            cache[term] = got
        return got

    def dense_query_scores(self, qid: int, prepared: dict) -> np.ndarray | None:
        """Dense per-doc score array (aligned to ``self.doc_ids``) for one
        prepared query — the exact kernel without the top-k cut. Returns
        ``None`` when no query term has a posting in this segment. This is
        the building block fielded scoring sums across per-field indexes
        (:func:`search_fielded`)."""
        p: BM25Params = prepared["params"]
        avgdl = prepared["avgdl"]
        mode = prepared.get("scoring", "bm25")
        dl_f = self.doc_lens.astype(np.float64)
        if mode == "ql":
            mu = float(prepared["mu"])
            dl_norm = np.log(mu / (dl_f + mu))
        elif mode == "lmjm":
            lam = float(prepared.get("lam", 0.1))
        elif mode == "tfidf":
            # fieldNorm = 1/sqrt(dl); dl >= tf >= 1 wherever a posting
            # exists, and we only index at posting positions, so no /0
            with np.errstate(divide="ignore"):
                inv_sqrt_dl = 1.0 / np.sqrt(dl_f)
        elif mode == "dfr":
            # H2 length normalization factor; dl >= 1 at posting positions
            c_f = float(prepared.get("dfr_c", 1.0))
            with np.errstate(divide="ignore"):
                h2 = np.log2(1.0 + c_f * avgdl / dl_f)
        scores = np.zeros(self.doc_ids.size, np.float64)
        hit = False
        for term, qtf, w in prepared["queries"][qid]:  # pre-sorted -> fixed sum order
            pos, tfs = self.pos_tfs(term)
            if pos.size == 0:
                continue
            hit = True
            if mode == "ql":
                # w = mu*cf/C; Lucene-shape per-term clamp keeps scores >= 0
                contrib = np.log1p(tfs.astype(np.float64) / w) + dl_norm[pos]
                scores[pos] += qtf * np.maximum(contrib, 0.0)
            elif mode == "lmjm":
                # w = lam*cf/C; ln(1+x) with x >= 0 — positive on any match
                contrib = np.log1p(
                    ((1.0 - lam) * tfs.astype(np.float64) / dl_f[pos]) / w
                )
                scores[pos] += qtf * contrib
            elif mode == "tfidf":
                # w = idf_c²; ClassicSimilarity sqrt(tf) · idf² · 1/sqrt(dl)
                scores[pos] += (w * qtf) * np.sqrt(tfs.astype(np.float64)) * inv_sqrt_dl[pos]
            elif mode == "dfr":
                # w = log2((N+1)/(df+0.5)); InL2 after-effect tfn/(tfn+1)
                tfn = tfs.astype(np.float64) * h2[pos]
                scores[pos] += (w * qtf) * tfn / (tfn + 1.0)
            else:
                scores[pos] += (w * qtf) * tf_component(tfs, self.doc_lens[pos], avgdl, p)
        return scores if hit else None

    def fscore_multiplier(self, prepared: dict) -> np.ndarray | None:
        """Per-doc score multiplier for the prepared dict's ``fscore`` spec
        (Elasticsearch function_score, boost_mode/score_mode = multiply):
        the product over canonicalized function tuples

        - ``("fvf", field, factor, modifier)`` — field_value_factor:
          ``m(factor · v)`` with modifier none / log1p / sqrt (field values
          must be >= 0 for log1p/sqrt, the ES contract);
        - ``("gauss"|"exp"|"linear", field, origin, scale, offset, decay)``
          — numeric decay over ``d = max(0, |v - origin| - offset)`` with
          the ES closed forms (decay reached exactly at distance scale).

        Cached per segment per spec — multipliers are query-independent."""
        fs = prepared.get("fscore")
        if not fs:
            return None
        key = tuple(fs)
        got = self._fscore.get(key)
        if got is None:
            mult = np.ones(self.doc_ids.size, np.float64)
            for f in fs:
                kind, field = f[0], f[1]
                v = self.numeric_values(field).astype(np.float64)
                if kind == "fvf":
                    _, _, factor, modifier = f
                    x = factor * v
                    if modifier == "log1p":
                        x = np.log1p(x)
                    elif modifier == "sqrt":
                        x = np.sqrt(x)
                    elif modifier != "none":
                        raise ValueError(f"unknown fvf modifier {modifier!r}")
                    mult *= x
                else:
                    _, _, origin, scale, offset, decay = f
                    d = np.maximum(0.0, np.abs(v - origin) - offset)
                    if kind == "gauss":
                        sigma2 = -(scale * scale) / (2.0 * np.log(decay))
                        mult *= np.exp(-(d * d) / (2.0 * sigma2))
                    elif kind == "exp":
                        mult *= np.exp(np.log(decay) / scale * d)
                    elif kind == "linear":
                        s = scale / (1.0 - decay)
                        mult *= np.maximum(0.0, (s - d) / s)
                    else:
                        raise ValueError(f"unknown decay function {kind!r}")
            got = self._fscore[key] = mult
        return got

    def rank_feature_bonus(self, prepared: dict) -> np.ndarray | None:
        """Per-doc additive score bonus for the prepared dict's
        ``rank_features`` spec (ES rank_feature queries as bool-should
        clauses): sum over clauses of ``boost × f(v)`` with the ES closed
        forms — saturation ``v/(v+pivot)``, log ``ln(scaling_factor + v)``,
        sigmoid ``v^e/(v^e + pivot^e)``, linear ``v``. Query-independent,
        cached per segment; applied by the kernel ONLY to docs whose base
        score is positive (rank_feature never makes a non-matching doc
        match)."""
        rfs = prepared.get("rank_features")
        if not rfs:
            return None
        key = ("__rf__",) + tuple(rfs)
        got = self._fscore.get(key)
        if got is None:
            add = np.zeros(self.doc_ids.size, np.float64)
            for f in rfs:
                kind, field, boost = f[0], f[1], f[2]
                v = self.numeric_values(field).astype(np.float64)
                if kind == "sat":
                    add += boost * (v / (v + f[3]))
                elif kind == "log":
                    add += boost * np.log(f[3] + v)
                elif kind == "sig":
                    ve = v ** f[4]
                    add += boost * (ve / (ve + f[3] ** f[4]))
                elif kind == "dist":
                    # ES distance_feature: pivot / (pivot + |v - origin|)
                    add += boost * (f[4] / (f[4] + np.abs(v - f[3])))
                else:  # lin
                    add += boost * v
            got = self._fscore[key] = add
        return got

    def score_exact(self, prepared: dict) -> list[tuple[int, int, float]]:
        p: BM25Params = prepared["params"]
        after: dict = prepared.get("after") or {}
        keep = self.range_keep_mask(prepared)
        mult = self.fscore_multiplier(prepared)
        bonus = self.rank_feature_bonus(prepared)
        rows: list[tuple[int, int, float]] = []
        for qid in prepared["queries"]:
            scores = self.dense_query_scores(qid, prepared)
            if scores is None:
                continue
            if mult is not None:
                # function_score multiplier BEFORE the per-segment cut: the
                # top-k is taken under the MODIFIED score, so re-ranked
                # results are exact (not a rescore of a base-score cut)
                scores = scores * mult
            if bonus is not None:
                # rank_feature bonus only lifts docs that already match
                # (base/multiplied score > 0) — ES bool-should semantics
                scores = np.where(scores > 0, scores + bonus, scores)
            if keep is not None:
                # numeric doc-values filter BEFORE the per-segment cut
                # (Lucene FILTER clause) — deep results stay exact
                scores = np.where(keep, scores, -np.inf)
            cur = after.get(qid)
            if cur is not None:
                # Lucene search_after: keep docs sorting strictly AFTER the
                # cursor in (score desc, doc_id asc) order — applied BEFORE
                # the per-segment cut so deep pages stay exact
                s0, d0 = float(cur[0]), int(cur[1])
                keep = (scores < s0) | ((scores == s0) & (self.doc_ids > d0))
                scores = np.where(keep, scores, -np.inf)
            docs, scs = topk_from_scores(self.doc_ids, scores, p.top_k, p.threshold)
            rows.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
        return rows

    def score_bmw(self, prepared: dict) -> list[tuple[int, int, float]]:
        if (
            prepared.get("scoring", "bm25") != "bm25"
            or prepared.get("after")
            or prepared.get("range_filter")
            or prepared.get("fscore")
            or prepared.get("rank_features")
        ):
            # block-max bounds are BM25-specific (tf_max/dl_min monotonicity)
            # and model neither the search_after cursor, a doc-values
            # filter, nor a function_score multiplier; all route to the
            # exact kernel — identical results
            return self.score_exact(prepared)
        if self.deleted is not None:
            # block-max skip bounds don't account for deletions; the exact
            # kernel (whose pos_tfs filters tombstones pre-cut) returns the
            # identical result set, so tombstoned segments route there
            # until purge restores the skip lists' validity
            return self.score_exact(prepared)
        from splade_ray.wand import score_segment_bmw

        return score_segment_bmw(self, prepared)

    # Regime constants measured by scripts/bmw_regime.py (table in
    # BASELINE.md, warm-cache p50): the vectorized exact kernel's cost is
    # ~a·n_docs + b·df_sum (accumulator + scatter-add) while block-skipping
    # BMW is ~c·df_sum with c >> b — so BMW only wins when the query's
    # posting mass is a tiny fraction of a LARGE segment. Measured
    # crossovers: BMW loses everywhere at 50k docs; wins at 200k for
    # df_sum/n <= ~0.001 and at 1M for <= ~0.006 (7.8x on single-rare-term
    # queries). Both kernels are exact, so the switch never changes results.
    AUTO_MIN_DOCS_FOR_BMW = 100_000
    AUTO_DENSITY_CUTOFF = 0.002

    def score_auto(self, prepared: dict) -> list[tuple[int, int, float]]:
        """Per-query kernel choice by segment size + posting density (the
        PISA-style adaptive fallback: impact-sorted skipping for selective
        queries on large segments, streaming exact scoring otherwise)."""
        n = max(self.doc_ids.size, 1)
        if n < self.AUTO_MIN_DOCS_FOR_BMW:
            return self.score_exact(prepared)
        dense_q, sparse_q = {}, {}
        for qid, terms in prepared["queries"].items():
            df_sum = 0
            for term, _, _ in terms:
                i = self._by_term.get(term)
                if i is not None:
                    df_sum += self.postings["df"][i].as_py()
            (dense_q if df_sum / n > self.AUTO_DENSITY_CUTOFF else sparse_q)[qid] = terms
        rows: list[tuple[int, int, float]] = []
        if dense_q:
            rows.extend(self.score_exact({**prepared, "queries": dense_q}))
        if sparse_q:
            rows.extend(self.score_bmw({**prepared, "queries": sparse_q}))
        return rows


class ScoreSegments:
    """Actor-pool ``map_batches`` stage over (segment, query-chunk) work
    items. Prepared query chunks are fetched from the object store on first
    use per actor and cached (not re-shipped per batch); large query sets
    parallelize across the segments × chunks grid."""

    def __init__(self, prepared_refs, method: str = "exact", tombstones_ref=None):
        self.refs = prepared_refs if isinstance(prepared_refs, list) else [prepared_refs]
        self.method = method
        self._cache: dict[int, dict] = {}
        # broadcast sorted tombstone ids: ray.put once at the driver, read
        # once per actor (never re-shipped per batch)
        self.tombstones = (
            ray.get(tombstones_ref) if tombstones_ref is not None else None
        )

    def _prepared(self, chunk: int) -> dict:
        got = self._cache.get(chunk)
        if got is None:
            if len(self._cache) >= 4:  # bound actor memory for huge query sets
                self._cache.clear()
            r = self.refs[chunk]
            got = self._cache[chunk] = ray.get(r) if isinstance(r, ray.ObjectRef) else r
        return got

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[tuple[int, int, float]] = []
        chunks = (
            batch["chunk"].to_pylist()
            if "chunk" in batch.column_names
            else [0] * len(batch)
        )
        for seg_dir, chunk in zip(batch["seg_dir"].to_pylist(), chunks):
            prepared = self._prepared(int(chunk))
            if self.method in ("quantized", "quantized_bmw"):
                from splade_ray.quantized import QuantizedSegment

                qseg = QuantizedSegment(
                    seg_dir, prepared["terms"], tombstones=self.tombstones
                )
                fn = qseg.score_bmw if self.method == "quantized_bmw" else qseg.score
                rows.extend(fn(prepared))
                continue
            seg = SegmentIndex(seg_dir, prepared["terms"], tombstones=self.tombstones)
            fn = {"bmw": seg.score_bmw, "auto": seg.score_auto}.get(
                self.method, seg.score_exact
            )
            rows.extend(fn(prepared))
        qids = np.array([r[0] for r in rows], np.int64)
        docs = np.array([r[1] for r in rows], np.int64)
        scs = np.array([r[2] for r in rows], np.float64)
        return pa.table(
            {"query_id": pa.array(qids), "doc_id": pa.array(docs), "score": pa.array(scs)}
        )


def merge_topk(group: pd.DataFrame, *, top_k: int) -> pd.DataFrame:
    """Merge per-segment candidate heaps into the global top-k for one query
    (the scatter-gather reduce; analog of ``select_topk`` with deterministic
    ties, transformer_evaluator.py:83-90)."""
    g = group.sort_values(["score", "doc_id"], ascending=[False, True], kind="mergesort")
    g = g.head(top_k).copy()
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int32)
    return g[["query_id", "rank", "doc_id", "score"]]


def canonical_rank_features(rank_features: list[dict]) -> list[tuple]:
    """Validate + canonicalize ES ``rank_feature`` clauses into hashable
    tuples. Each entry: ``{"field": col, "boost": 1.0, "function":
    {"saturation": {"pivot": p}} | {"log": {"scaling_factor": s}} |
    {"sigmoid": {"pivot": p, "exponent": e}} | {"linear": {}}}``. The
    clause contributes ``boost × f(v)`` ADDED to matching docs' scores
    (the ES bool-should composition); field values must be >= 0 (the ES
    rank_feature field contract)."""
    out: list[tuple] = []
    for rf in rank_features:
        field, boost = rf["field"], float(rf.get("boost", 1.0))
        fn = rf.get("function", {"saturation": {}})
        if len(fn) != 1:
            raise ValueError(f"function must have exactly one key, got {sorted(fn)}")
        (kind, spec), = fn.items()
        if kind == "saturation":
            # ES default pivot = approximate geometric mean of field values;
            # we require it explicitly (a distributed default would need a
            # corpus pass — callers can compute one via numeric_stats)
            out.append(("sat", field, boost, float(spec["pivot"])))
        elif kind == "log":
            out.append(("log", field, boost, float(spec["scaling_factor"])))
        elif kind == "sigmoid":
            out.append(("sig", field, boost, float(spec["pivot"]),
                        float(spec["exponent"])))
        elif kind == "distance":
            # ES distance_feature query (numeric/date form): the clause
            # adds boost × pivot / (pivot + |v − origin|) to matching docs
            # — composed here as a rank_feature clause because both are
            # additive bool-should bonuses over a doc-values field
            out.append(("dist", field, boost, float(spec["origin"]),
                        float(spec["pivot"])))
        elif kind == "linear":
            out.append(("lin", field, boost))
        else:
            raise ValueError(f"unknown rank_feature function {kind!r}")
    return out


def canonical_functions(functions: list[dict]) -> list[tuple]:
    """Validate + canonicalize an ES-shaped function_score spec list into
    hashable tuples (the broadcast/caching form). Each entry is a one-key
    dict: ``{"field_value_factor": {"field", "factor"=1.0,
    "modifier"="none"}}`` or ``{"gauss"|"exp"|"linear": {"field", "origin",
    "scale", "offset"=0, "decay"=0.5}}`` — the ES defaults. Decay needs
    scale > 0 and 0 < decay < 1."""
    out: list[tuple] = []
    for f in functions:
        if len(f) != 1:
            raise ValueError(f"each function is a one-key dict, got {sorted(f)}")
        (kind, spec), = f.items()
        if kind == "field_value_factor":
            out.append(("fvf", spec["field"], float(spec.get("factor", 1.0)),
                        spec.get("modifier", "none")))
            if out[-1][3] not in ("none", "log1p", "sqrt"):
                raise ValueError(f"unknown fvf modifier {out[-1][3]!r}")
        elif kind in ("gauss", "exp", "linear"):
            scale, decay = float(spec["scale"]), float(spec.get("decay", 0.5))
            if scale <= 0 or not 0.0 < decay < 1.0:
                raise ValueError(f"{kind}: need scale > 0 and 0 < decay < 1")
            out.append((kind, spec["field"], float(spec["origin"]), scale,
                        float(spec.get("offset", 0.0)), decay))
        else:
            raise ValueError(f"unknown score function {kind!r}")
    return out


def search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    method: str = "exact",
    concurrency: int | None = None,
    query_chunk_size: int = 1024,
    query_lang: str | None = None,
    scoring: str = "bm25",
    mu: float = 2000.0,
    lam: float = 0.1,
    dfr_c: float = 1.0,
    after: dict[int, tuple[float, int]] | None = None,
    range_filter: tuple[str, float | None, float | None] | None = None,
    stats_override: dict | None = None,
    functions: list[dict] | None = None,
    rank_features: list[dict] | None = None,
) -> pd.DataFrame:
    """One-shot batch retrieval as a Ray Data pipeline. Returns the run table
    (query_id, rank, doc_id, score) sorted by (query_id, rank).

    ``functions`` applies an Elasticsearch function_score rescoring
    (boost_mode/score_mode = multiply) computed from sidecar doc-values
    columns, e.g. ``[{"field_value_factor": {"field": "n_chars",
    "factor": 0.01, "modifier": "log1p"}}, {"gauss": {"field": "n_chars",
    "origin": 500, "scale": 300, "offset": 0, "decay": 0.5}}]`` — see
    :func:`canonical_functions`. The multiplier applies inside each segment
    BEFORE its top-k cut (exact under the modified score, not a rescore of
    a base-score cut), is query-independent (computed once per segment per
    spec, cached in persistent actors) and never shuffles.

    Large query sets are split into ``query_chunk_size`` chunks; the work
    grid is segments × chunks, so both axes of parallelism scale and no
    single broadcast grows with the full query count.

    ``scoring`` selects the similarity: ``"bm25"`` (default), ``"ql"``
    (Dirichlet, parameter ``mu``), ``"lmjm"`` (Jelinek-Mercer, parameter
    ``lam``), ``"tfidf"`` (Lucene ClassicSimilarity) or ``"dfr"``
    (DFR InL2, parameter ``dfr_c``) — see
    :func:`prepare_queries`. BMW/auto kernels route every non-BM25
    similarity to the exact kernel (block-max bounds are BM25-specific),
    and the quantized layer is BM25-only.

    ``after`` paginates (Lucene IndexSearcher.searchAfter): per query an
    exclusive ``(score, doc_id)`` cursor — usually the last row of the
    previous page — and the returned page holds the next ``top_k`` results
    strictly after it in (score desc, doc_id asc) order. The filter applies
    inside each segment BEFORE its top-k cut, so deep pages are exact
    without over-fetching; ranks restart at 1 per page."""
    params = params or BM25Params()
    if after and method in ("quantized", "quantized_bmw"):
        raise ValueError("search_after pagination is float-score only — "
                         "use method='exact'/'bmw'/'auto'")
    if scoring != "bm25" and method in ("quantized", "quantized_bmw"):
        raise ValueError("quantized impacts bake in BM25 — use scoring='bm25'")
    if range_filter and method in ("quantized", "quantized_bmw"):
        raise ValueError("range_filter runs on the float kernels — "
                         "use method='exact'/'bmw'/'auto'")
    if (functions or rank_features) and method in ("quantized", "quantized_bmw"):
        raise ValueError("function_score / rank_feature run on the float "
                         "kernels — use method='exact'/'bmw'/'auto'")
    fscore = canonical_functions(functions) if functions else None
    rfeats = canonical_rank_features(rank_features) if rank_features else None
    quant_extra: dict = {}
    if method in ("quantized", "quantized_bmw"):
        # quantized layer must exist, be complete (not pending) and have
        # been built with these scoring parameters — scores are only
        # meaningful against them
        from splade_ray.quantized import load_quantized_manifest

        quant_extra = {"quant_factor": load_quantized_manifest(index_dir, params)["factor"]}
    chunks = [
        queries[i : i + query_chunk_size]
        for i in range(0, len(queries), query_chunk_size)
    ] or [[]]
    prepared_refs = [
        ray.put(
            {**prepare_queries(index_dir, c, params, query_lang=query_lang,
                               scoring=scoring, mu=mu, lam=lam, dfr_c=dfr_c,
                               stats_override=stats_override),
             **({"after": {int(q): after[int(q)] for q, _ in c if int(q) in after}}
                if after else {}),
             **({"range_filter": range_filter} if range_filter else {}),
             **({"fscore": fscore} if fscore else {}),
             **({"rank_features": rfeats} if rfeats else {}),
             **quant_extra}
        )
        for c in chunks
    ]
    from splade_ray.delete import load_tombstones

    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    segs = segment_dirs(index_dir)
    items = [
        {"seg_dir": s, "chunk": ci} for ci in range(len(chunks)) for s in segs
    ]
    cand = rd.from_items(items, override_num_blocks=len(items)).map_batches(
        ScoreSegments,
        batch_format="pyarrow",
        batch_size=1,
        fn_constructor_kwargs={
            "prepared_refs": prepared_refs,
            "method": method,
            "tombstones_ref": tomb_ref,
        },
        # autoscaling pool: starts small, grows to the CPU budget — a fixed
        # pool larger than the cluster deadlocks behind the downstream stages
        concurrency=concurrency or (1, min(len(items), 16)),
    )
    run = cand.groupby("query_id").map_groups(
        merge_topk, batch_format="pandas", fn_kwargs={"top_k": params.top_k}
    )
    pdf = run.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64, "score": np.float64}
        )
    return pdf.sort_values(["query_id", "rank"]).reset_index(drop=True)


EXPLAIN_COLUMNS = ["query_id", "doc_id", "term", "tf", "df", "weight", "contrib"]


def explain(
    index_dir: str,
    queries: list[tuple[int, str]],
    doc_ids: list[int],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
    scoring: str = "bm25",
    mu: float = 2000.0,
    lam: float = 0.1,
    dfr_c: float = 1.0,
    concurrency=None,
) -> pd.DataFrame:
    """Per-term score breakdown for every (query, target doc) pair — the
    Lucene ``IndexSearcher.explain`` analog (the reference exposes only
    final scores, ``transformer_evaluator.py:172-188``). For each query
    term present in the doc: the doc's tf, the term's global df, the
    per-term weight (idf for BM25, mu·cf/C for QL, lam·cf/C for LMJM,
    idf_c² for classic TF-IDF) and the term's score
    contribution; summing ``contrib`` over a (query, doc) group reproduces
    the run score bit-exactly (same per-term float ops as the kernels).

    Scale shape: doc_ids is API-sized; each segment task decodes only the
    query terms' postings (the standard pruned read) and emits rows only
    for target docs it holds — tombstoned docs explain to nothing."""
    from splade_ray.delete import load_tombstones

    params = params or BM25Params()
    prepared = prepare_queries(
        index_dir, queries, params, query_lang=query_lang, scoring=scoring,
        mu=mu, lam=lam, dfr_c=dfr_c,
    )
    targets = np.unique(np.asarray(sorted({int(d) for d in doc_ids}), np.int64))
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    prepared_ref = ray.put(prepared)
    targets_ref = ray.put(targets)
    segs = segment_dirs(index_dir)

    def task(batch: pa.Table) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        tgt = ray.get(targets_ref)
        p: BM25Params = prep["params"]
        avgdl = prep["avgdl"]
        mode = prep.get("scoring", "bm25")
        rows: list[tuple] = []
        for seg_dir in batch["seg_dir"].to_pylist():
            seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
            present = np.intersect1d(seg.doc_ids, tgt)
            if present.size == 0:
                continue
            dl_f = seg.doc_lens.astype(np.float64)
            if mode == "ql":
                mu_f = float(prep["mu"])
                dl_norm = np.log(mu_f / (dl_f + mu_f))
            elif mode == "lmjm":
                lam_f = float(prep.get("lam", 0.1))
            elif mode == "tfidf":
                with np.errstate(divide="ignore"):
                    inv_sqrt_dl = 1.0 / np.sqrt(dl_f)
            elif mode == "dfr":
                c_f = float(prep.get("dfr_c", 1.0))
                with np.errstate(divide="ignore"):
                    h2 = np.log2(1.0 + c_f * avgdl / dl_f)
            for qid, terms in prep["queries"].items():
                for term, qtf, w in terms:
                    pos, tfs = seg.pos_tfs(term)
                    if pos.size == 0:
                        continue
                    # restrict the decoded posting to the target docs
                    sel = np.flatnonzero(np.isin(seg.doc_ids[pos], present))
                    if sel.size == 0:
                        continue
                    dpos, dtfs = pos[sel], tfs[sel]
                    df = int(prep["dfs"][term])  # GLOBAL docFreq (matches w)
                    if mode == "ql":
                        contrib = qtf * np.maximum(
                            np.log1p(dtfs.astype(np.float64) / w) + dl_norm[dpos],
                            0.0,
                        )
                    elif mode == "lmjm":
                        contrib = qtf * np.log1p(
                            ((1.0 - lam_f) * dtfs.astype(np.float64) / dl_f[dpos]) / w
                        )
                    elif mode == "tfidf":
                        contrib = (
                            (w * qtf)
                            * np.sqrt(dtfs.astype(np.float64))
                            * inv_sqrt_dl[dpos]
                        )
                    elif mode == "dfr":
                        tfn = dtfs.astype(np.float64) * h2[dpos]
                        contrib = (w * qtf) * tfn / (tfn + 1.0)
                    else:
                        contrib = (w * qtf) * tf_component(
                            dtfs, seg.doc_lens[dpos], avgdl, p
                        )
                    for j in range(dpos.size):
                        rows.append(
                            (qid, int(seg.doc_ids[dpos[j]]), term, int(dtfs[j]),
                             df, float(w), float(contrib[j]))
                        )
        if not rows:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "weight": pa.array([], pa.float64()),
                    "contrib": pa.array([], pa.float64()),
                }
            )
        cols = list(zip(*rows))
        return pa.table(
            {
                "query_id": pa.array(np.array(cols[0], np.int64)),
                "doc_id": pa.array(np.array(cols[1], np.int64)),
                "term": pa.array(list(cols[2]), pa.string()),
                "tf": pa.array(np.array(cols[3], np.int64)),
                "df": pa.array(np.array(cols[4], np.int64)),
                "weight": pa.array(np.array(cols[5], np.float64)),
                "contrib": pa.array(np.array(cols[6], np.float64)),
            }
        )

    pdf = (
        rd.from_items([{"seg_dir": s} for s in segs], override_num_blocks=len(segs))
        .map_batches(task, batch_format="pyarrow", batch_size=1,
                     concurrency=concurrency)
        .to_pandas()
    )
    if pdf.empty:
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype=np.int64),
                "doc_id": pd.Series([], dtype=np.int64),
                "term": pd.Series([], dtype=object),
                "tf": pd.Series([], dtype=np.int64),
                "df": pd.Series([], dtype=np.int64),
                "weight": pd.Series([], dtype=np.float64),
                "contrib": pd.Series([], dtype=np.float64),
            }
        )
    return pdf.sort_values(["query_id", "doc_id", "term"]).reset_index(drop=True)[
        EXPLAIN_COLUMNS
    ]


def _union_tombstones(field_indexes: dict[str, str]) -> np.ndarray | None:
    """Union of the field indexes' tombstone sets (None when all empty)."""
    from splade_ray.delete import load_tombstones

    arrs = [load_tombstones(d) for d in field_indexes.values()]
    out = np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)
    return out if out.size else None


def _load_aligned_segments(
    seg_lists: dict[str, list[str]],
    fields: list[str],
    ord_: int,
    terms: dict[str, list[str]],
    tombstones: np.ndarray | None = None,
) -> dict[str, SegmentIndex]:
    """Load one aligned segment per field and verify the doc-id alignment
    contract (every field index built from the same corpus rows).
    ``tombstones`` = union across field indexes (a doc deleted in any
    field is gone from the fielded result); df statistics (FieldedUnionDf)
    intentionally ignore tombstones until purge, like single-field search.
    """
    segs = {
        f: SegmentIndex(seg_lists[f][ord_], terms[f], tombstones=tombstones)
        for f in fields
    }
    base = segs[fields[0]].doc_ids
    for f in fields[1:]:
        if not np.array_equal(segs[f].doc_ids, base):
            raise ValueError(
                f"fielded indexes misaligned at segment {ord_}: field "
                f"{f!r} has different doc ids (build every field index "
                "from the same corpus with the same rows_per_segment "
                "and id_col)"
            )
    return segs


class ScoreFieldedSegments:
    """Actor-pool stage for fielded weighted-sum scoring: one work item per
    aligned segment ordinal, scoring EVERY field's segment in the same task
    and summing weighted dense arrays before the top-k cut — exact by
    construction (no per-field top-k approximation, no threshold algorithm
    needed). The per-field prepared dicts + segment lists ship once via
    ``ray.put`` and are fetched on first use per actor."""

    def __init__(self, plan_ref):
        plan = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
        self.prepared: dict[str, dict] = plan["prepared"]
        self.weights: dict[str, float] = plan["weights"]
        self.seg_lists: dict[str, list[str]] = plan["seg_lists"]
        self.tombstones = plan.get("tombstones")
        self.combine: str = plan.get("combine", "sum")
        self.tie: float = float(plan.get("tie", 0.0))
        self.fields = sorted(self.prepared)  # fixed field order -> fixed fp sum order

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[tuple[int, int, float]] = []
        p: BM25Params = self.prepared[self.fields[0]]["params"]
        for ord_ in batch["seg_ord"].to_pylist():
            segs = _load_aligned_segments(
                self.seg_lists,
                self.fields,
                ord_,
                {f: self.prepared[f]["terms"] for f in self.fields},
                self.tombstones,
            )
            base = segs[self.fields[0]].doc_ids
            qids = self.prepared[self.fields[0]]["queries"].keys()
            for qid in qids:
                denses = []
                for f in self.fields:
                    dense = segs[f].dense_query_scores(qid, self.prepared[f])
                    if dense is not None:
                        denses.append(self.weights[f] * dense)
                if not denses:
                    continue
                if self.combine == "dismax":
                    # Lucene DisjunctionMaxQuery: best field + tie_breaker ×
                    # the rest (BM25 scores are ≥ 0, so absent fields = 0
                    # contribution and never win the max)
                    best = np.maximum.reduce(denses)
                    total = (
                        best
                        if self.tie == 0.0
                        else best + self.tie * (np.add.reduce(denses) - best)
                    )
                else:
                    total = denses[0]
                    for d in denses[1:]:
                        total = total + d
                docs, scs = topk_from_scores(base, total, p.top_k, p.threshold)
                rows.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
        return pa.table(
            {
                "query_id": pa.array([r[0] for r in rows], pa.int64()),
                "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                "score": pa.array([r[2] for r in rows], pa.float64()),
            }
        )


class ScoreCrossFieldsSegments:
    """Actor-pool stage for cross_fields scoring (ES multi_match
    type=cross_fields / Lucene BlendedTermQuery): TERM-centric — each query
    term takes the best per-field contribution ``max_f(w_f · tf_component_f)``
    under ONE blended idf (df = max over fields, so a term common in any
    field never gets a spuriously high idf from a field it is rare in),
    then terms sum. Combined dense arrays cut per segment — exact."""

    def __init__(self, plan_ref):
        plan = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
        self.qterms: dict[int, list[tuple[str, int]]] = plan["qterms"]
        self.idf: dict[str, float] = plan["idf"]
        self.weights: dict[str, float] = plan["weights"]
        self.avgdl: dict[str, float] = plan["avgdl"]
        self.params: BM25Params = plan["params"]
        self.seg_lists: dict[str, list[str]] = plan["seg_lists"]
        self.tombstones = plan.get("tombstones")
        self.fields = sorted(self.seg_lists)
        self.terms = sorted({t for ts in self.qterms.values() for t, _ in ts})

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[tuple[int, int, float]] = []
        p = self.params
        for ord_ in batch["seg_ord"].to_pylist():
            segs = _load_aligned_segments(
                self.seg_lists,
                self.fields,
                ord_,
                {f: self.terms for f in self.fields},
                self.tombstones,
            )
            base = segs[self.fields[0]].doc_ids
            n = base.size
            for qid, terms in self.qterms.items():
                total = np.zeros(n, np.float64)
                hit = False
                for term, qtf in terms:  # pre-sorted -> fixed sum order
                    w = self.idf.get(term)
                    if w is None:
                        continue
                    best: np.ndarray | None = None
                    for f in self.fields:
                        pos, tfs = segs[f].pos_tfs(term)
                        if pos.size == 0:
                            continue
                        contrib = np.zeros(n, np.float64)
                        contrib[pos] = self.weights[f] * tf_component(
                            tfs, segs[f].doc_lens[pos], self.avgdl[f], p
                        )
                        best = contrib if best is None else np.maximum(best, contrib)
                    if best is None:
                        continue
                    hit = True
                    total += (w * qtf) * best
                if not hit:
                    continue
                docs, scs = topk_from_scores(base, total, p.top_k, p.threshold)
                rows.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
        return pa.table(
            {
                "query_id": pa.array([r[0] for r in rows], pa.int64()),
                "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                "score": pa.array([r[2] for r in rows], pa.float64()),
            }
        )


class FieldedUnionDf:
    """Pass-1 stage of true BM25F: per-segment document frequency of each
    query term counting a doc once if the term appears in ANY field (the
    document-level df BM25F's idf is defined over — Robertson & Zaragoza
    2004, §BM25F). Reads ONLY the query terms' postings per field (same
    parquet pushdown as scoring) and decodes doc ids, not tfs, into a union
    count; emits (term, df) partials summed driver-side (k-terms-sized)."""

    def __init__(self, plan_ref):
        plan = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
        self.terms: list[str] = plan["terms"]
        self.seg_lists: dict[str, list[str]] = plan["seg_lists"]
        self.fields = sorted(self.seg_lists)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_t: list[str] = []
        out_df: list[int] = []
        for ord_ in batch["seg_ord"].to_pylist():
            segs = _load_aligned_segments(
                self.seg_lists, self.fields, ord_, {f: self.terms for f in self.fields}
            )
            for term in self.terms:
                seen: np.ndarray | None = None
                for f in self.fields:
                    pos, _ = segs[f].pos_tfs(term)
                    if pos.size == 0:
                        continue
                    seen = pos if seen is None else np.union1d(seen, pos)
                if seen is not None:
                    out_t.append(term)
                    out_df.append(int(seen.size))
        return pa.table(
            {"term": pa.array(out_t, pa.string()), "df": pa.array(out_df, pa.int64())}
        )


class ScoreBM25FSegments:
    """Actor-pool stage for TRUE BM25F (Robertson & Zaragoza 2004): per-field
    tf is length-normalized and weight-folded into a single pseudo-frequency
    BEFORE the k1 saturation —

        B_f(d)   = (1 - b_f) + b_f · len_f(d) / avgdl_f
        tf~(t,d) = Σ_f w_f · tf_f(t,d) / B_f(d)
        score    = Σ_t qtf · idf_union(t) · tf~ · (k1+1) / (k1 + tf~)

    with idf over the document-level union df from :class:`FieldedUnionDf`.
    Contrast the weighted-sum mode (``ScoreFieldedSegments``), which
    saturates each field separately then sums — BM25F rewards a term spread
    across fields less than weighted-sum does, the behavior the original
    paper argues for. The (k1+1) numerator matches this engine's simple-BM25
    convention (a per-term constant scale; rank-neutral)."""

    def __init__(self, plan_ref):
        plan = ray.get(plan_ref) if isinstance(plan_ref, ray.ObjectRef) else plan_ref
        self.qterms: dict[int, list[tuple[str, int]]] = plan["qterms"]
        self.idf: dict[str, float] = plan["idf"]
        self.weights: dict[str, float] = plan["weights"]
        self.field_b: dict[str, float] = plan["field_b"]
        self.avgdl: dict[str, float] = plan["avgdl"]
        self.params: BM25Params = plan["params"]
        self.seg_lists: dict[str, list[str]] = plan["seg_lists"]
        self.tombstones = plan.get("tombstones")
        self.fields = sorted(self.seg_lists)
        self.terms = sorted(self.idf)

    def __call__(self, batch: pa.Table) -> pa.Table:
        p = self.params
        rows: list[tuple[int, int, float]] = []
        for ord_ in batch["seg_ord"].to_pylist():
            segs = _load_aligned_segments(
                self.seg_lists, self.fields, ord_,
                {f: self.terms for f in self.fields}, self.tombstones,
            )
            base = segs[self.fields[0]].doc_ids
            n = base.size
            # per-field length normalizer, computed once per segment
            B = {
                f: (1.0 - self.field_b[f])
                + self.field_b[f] * segs[f].doc_lens.astype(np.float64) / self.avgdl[f]
                for f in self.fields
            }
            # fold each term's pseudo-frequency once per segment (shared by
            # every query containing the term), cached locally
            tfa_cache: dict[str, np.ndarray | None] = {}

            def folded(term: str) -> np.ndarray | None:
                got = tfa_cache.get(term, False)
                if got is not False:
                    return got
                tfa: np.ndarray | None = None
                for f in self.fields:  # fixed field order -> fixed fp sum order
                    pos, tfs = segs[f].pos_tfs(term)
                    if pos.size == 0:
                        continue
                    if tfa is None:
                        tfa = np.zeros(n, np.float64)
                    tfa[pos] += (self.weights[f] * tfs.astype(np.float64)) / B[f][pos]
                tfa_cache[term] = tfa
                return tfa

            for qid, terms in self.qterms.items():
                scores = np.zeros(n, np.float64)
                hit = False
                for term, qtf in terms:  # pre-sorted -> fixed sum order
                    w = self.idf.get(term)
                    if w is None:
                        continue
                    tfa = folded(term)
                    if tfa is None:
                        continue
                    hit = True
                    scores += (qtf * w * (p.k1 + 1.0)) * (tfa / (p.k1 + tfa))
                if not hit:
                    continue
                docs, scs = topk_from_scores(base, scores, p.top_k, p.threshold)
                rows.extend((qid, int(d), float(s)) for d, s in zip(docs, scs))
        return pa.table(
            {
                "query_id": pa.array([r[0] for r in rows], pa.int64()),
                "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                "score": pa.array([r[2] for r in rows], pa.float64()),
            }
        )


def _fielded_run(items, stage_cls, plan_ref, top_k, concurrency) -> pd.DataFrame:
    """Shared scatter (segment-ordinal grid) → k-sized merge for both
    fielded modes."""
    cand = rd.from_items(items, override_num_blocks=len(items)).map_batches(
        stage_cls,
        batch_format="pyarrow",
        batch_size=1,
        fn_constructor_kwargs={"plan_ref": plan_ref},
        concurrency=concurrency or (1, min(len(items), 16)),
    )
    run = cand.groupby("query_id").map_groups(
        merge_topk, batch_format="pandas", fn_kwargs={"top_k": top_k}
    )
    pdf = run.to_pandas()
    if pdf.empty:
        return pd.DataFrame(columns=RUN_COLUMNS).astype(
            {"query_id": np.int64, "rank": np.int32, "doc_id": np.int64, "score": np.float64}
        )
    return pdf.sort_values(["query_id", "rank"]).reset_index(drop=True)


def search_fielded(
    field_indexes: dict[str, str],
    queries: list[tuple[int, str]],
    weights: dict[str, float],
    params: BM25Params | None = None,
    *,
    mode: str = "sum",
    tie_breaker: float = 0.0,
    field_b: dict[str, float] | None = None,
    analyzers: dict[str, str] | None = None,
    query_analyzer: str | None = None,
    concurrency: int | None = None,
    stats_override: dict[str, dict] | None = None,
) -> pd.DataFrame:
    """Fielded retrieval over one index per field — the multi-field query a
    Lucene/Anserini user runs against e.g. (title, body) or, for the code
    corpus of the input hint, (path, content). The reference scores a single
    learned-impact field (transformer_evaluator.py:92-111); fields
    generalize that to structured documents without changing the per-field
    index format. Two scoring modes:

    - ``mode="sum"`` (default): ``score = Σ_f w_f · BM25_f(q, d_f)`` — each
      field scored with its own df/doclen/avgdl, weighted and summed. The
      per-field ``analyzers`` mapping (registered analyzer name per field,
      e.g. a path tokenizer for a ``path`` field) selects how the QUERY text
      is tokenized against each field's index.
    - ``mode="dismax"``: Lucene DisjunctionMaxQuery / the ES ``best_fields``
      multi_match — ``score = max_f(w_f·BM25_f) + tie_breaker · Σ_other``.
      The best-matching field dominates (a term hitting both a short title
      and its body shouldn't double-count); ``tie_breaker`` (0..1, Lucene
      default 0) re-admits the other fields' evidence. Same per-field
      ``analyzers`` routing and exactness argument as ``sum`` (dense arrays
      combined before the per-segment cut).
    - ``mode="bm25f"``: true BM25F — per-field tf is length-normalized
      (per-field ``field_b``, default ``params.b``) and weight-folded into
      one pseudo-frequency BEFORE k1 saturation, with idf over the
      document-level union df (term in ANY field). Costs one extra cheap
      pass over the query terms' postings to count union df. The query is
      tokenized ONCE (``query_analyzer``) since BM25F is defined over a
      single query term set.

    All field indexes must be built from the SAME corpus (same id_col, same
    ``rows_per_segment``) so segments align doc-for-doc; the kernels verify
    alignment per segment. Exactness: dense per-field arrays are combined
    BEFORE the per-segment top-k, so the global merge sees true fielded
    scores — no per-field-top-k union approximation. Scale shape: identical
    to :func:`search` (segment-grid scatter, k-sized gather), with per-item
    I/O multiplied by the (small) field count."""
    params = params or BM25Params()
    fields = sorted(field_indexes)
    missing = sorted(set(weights) ^ set(fields))
    if missing:
        raise ValueError(f"weights/field_indexes key mismatch: {missing}")
    seg_lists = {f: segment_dirs(field_indexes[f]) for f in fields}
    counts = {f: len(s) for f, s in seg_lists.items()}
    if len(set(counts.values())) != 1:
        raise ValueError(f"fielded indexes have different segment counts: {counts}")
    n_segs = counts[fields[0]]
    items = [{"seg_ord": i} for i in range(n_segs)]

    if stats_override is not None and mode not in ("sum", "dismax"):
        raise ValueError(
            "stats_override (federated fielded search) supports the 'sum' "
            "and 'dismax' modes; bm25f's union-df pass is per-index"
        )
    if mode in ("sum", "dismax"):
        if not 0.0 <= tie_breaker <= 1.0:
            raise ValueError(f"tie_breaker must be in [0, 1], got {tie_breaker}")
        prepared = {
            f: prepare_queries(
                field_indexes[f],
                queries,
                params,
                query_lang=(analyzers or {}).get(f),
                stats_override=(stats_override or {}).get(f),
            )
            for f in fields
        }
        plan_ref = ray.put(
            {"prepared": prepared, "weights": dict(weights),
             "seg_lists": seg_lists, "tombstones": _union_tombstones(field_indexes),
             "combine": mode, "tie": float(tie_breaker)}
        )
        return _fielded_run(
            items, ScoreFieldedSegments, plan_ref, params.top_k, concurrency
        )
    if mode == "cross_fields":
        # ES multi_match type=cross_fields / Lucene BlendedTermQuery:
        # term-centric best-field contributions under a blended idf
        # (df = max over fields). One query tokenization (cross_fields
        # presumes a shared analyzer group, as in ES).
        manifests = {f: load_manifest(field_indexes[f]) for f in fields}
        nd = {f: m["n_docs"] for f, m in manifests.items()}
        if len(set(nd.values())) != 1:
            raise ValueError(f"fielded indexes have different doc counts: {nd}")
        tokenized = {
            int(qid): sorted(term_counts(text, query_analyzer).items())
            for qid, text in queries
        }
        all_terms = sorted({t for ts in tokenized.values() for t, _ in ts})
        dfs_by_field = []
        for f in fields:
            lex = pads.dataset(os.path.join(field_indexes[f], "lexicon")).to_table(
                columns=["term", "df"], filter=pads.field("term").isin(all_terms)
            ) if all_terms else None
            dfs_by_field.append(
                dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))
                if lex is not None else {}
            )
        n_docs_f = float(nd[fields[0]])
        idf_map = {}
        for t in all_terms:
            df_blend = max((d.get(t, 0) for d in dfs_by_field), default=0)
            if df_blend > 0:
                idf_map[t] = idf(df_blend, n_docs_f)
        plan_ref = ray.put(
            {
                "qterms": tokenized,
                "idf": idf_map,
                "weights": dict(weights),
                "avgdl": {f: float(m["avgdl"]) for f, m in manifests.items()},
                "params": params,
                "seg_lists": seg_lists,
                "tombstones": _union_tombstones(field_indexes),
            }
        )
        return _fielded_run(
            items, ScoreCrossFieldsSegments, plan_ref, params.top_k, concurrency
        )
    if mode != "bm25f":
        raise ValueError(
            f"unknown fielded mode {mode!r} (expected 'sum', 'dismax', "
            f"'cross_fields' or 'bm25f')"
        )

    manifests = {f: load_manifest(field_indexes[f]) for f in fields}
    n_docs = {f: m["n_docs"] for f, m in manifests.items()}
    if len(set(n_docs.values())) != 1:
        raise ValueError(f"fielded indexes have different doc counts: {n_docs}")
    tokenized = {
        int(qid): sorted(term_counts(text, query_analyzer).items())
        for qid, text in queries
    }
    all_terms = sorted({t for ts in tokenized.values() for t, _ in ts})
    b_map = {f: (field_b or {}).get(f, params.b) for f in fields}
    # pass 1: document-level union df for idf (term present in ANY field)
    idf_map: dict[str, float] = {}
    if all_terms and n_segs:
        df_ref = ray.put({"terms": all_terms, "seg_lists": seg_lists})
        partials = (
            rd.from_items(items, override_num_blocks=len(items))
            .map_batches(
                FieldedUnionDf,
                batch_format="pyarrow",
                batch_size=1,
                fn_constructor_kwargs={"plan_ref": df_ref},
                concurrency=concurrency or (1, min(len(items), 16)),
            )
            .to_pandas()  # ≤ terms × segments rows — query-sized, not corpus-sized
        )
        if not partials.empty:
            N = float(n_docs[fields[0]])
            for term, df in partials.groupby("term")["df"].sum().items():
                idf_map[str(term)] = idf(float(df), N)
    plan_ref = ray.put(
        {
            "qterms": tokenized,
            "idf": idf_map,
            "weights": dict(weights),
            "field_b": b_map,
            "avgdl": {f: float(m["avgdl"]) for f, m in manifests.items()},
            "params": params,
            "seg_lists": seg_lists,
            "tombstones": _union_tombstones(field_indexes),
        }
    )
    return _fielded_run(items, ScoreBM25FSegments, plan_ref, params.top_k, concurrency)


@ray.remote
class IndexShardActor:
    """Persistent shard for repeated query workloads (the analog of the
    reference's long-lived ``SparseRetrieval`` state, loaded once —
    transformer_evaluator.py:119-141 — but per doc-partitioned shard).
    Unlike the one-shot ``search()`` path (which prunes the parquet read to
    the query's terms), the persistent actor loads its segments' full
    postings once in ``__init__`` and serves every query from RAM."""

    def __init__(
        self,
        seg_dirs: list[str],
        method: str = "exact",
        tombstones: np.ndarray | None = None,
    ):
        if method in ("quantized", "quantized_bmw"):
            from splade_ray.quantized import QuantizedSegment

            self.segments = [
                QuantizedSegment(d, terms=None, tombstones=tombstones)
                for d in seg_dirs
            ]
        else:
            self.segments = [
                SegmentIndex(d, terms=None, tombstones=tombstones) for d in seg_dirs
            ]
        self.method = method
        self._tomb = tombstones  # for layers loaded lazily (phrase)
        self._positions: dict[str, object] = {}  # seg_dir -> SegmentPositions

    def search(self, prepared: dict) -> list[tuple[int, int, float]]:
        rows: list[tuple[int, int, float]] = []
        for seg in self.segments:
            if self.method == "quantized":
                fn = seg.score
            elif self.method == "quantized_bmw":
                fn = seg.score_bmw
            else:
                fn = {"bmw": seg.score_bmw, "auto": seg.score_auto}.get(
                    self.method, seg.score_exact
                )
            rows.extend(fn(prepared))
        return rows

    def sort(self, prepared: dict, keys: list[tuple[str, bool]],
             single: bool, top_k: int, after=None):
        """Serve a sort query (Lucene Sort over doc-values) from the
        resident segments — the docvalues.segment_sort_rows kernel, with
        doc-values and any built sort-order layers cached on the
        SegmentIndex across calls. Float-index shards only."""
        from splade_ray.docvalues import segment_sort_rows, sort_empty_table

        if self.method in ("quantized", "quantized_bmw"):
            raise ValueError("sort queries need a float-index shard")
        empty = sort_empty_table(keys, single)
        parts = [
            segment_sort_rows(seg, prepared, keys, single=single,
                              top_k=top_k, after=after, empty=empty)
            for seg in self.segments
        ]
        import pyarrow as _pa

        # per-segment tables carry the true value-column types (see
        # segment_sort_rows); only a shard with zero segments falls back
        # to the generic empty
        return _pa.concat_tables(parts) if parts else empty

    def agg(self, prepared: dict, spec: dict):
        """Serve a metric aggregation (count / stats / histogram — see
        docvalues.segment_agg_rows) from the resident segments; partial
        rows only, the router combines. Float-index shards only."""
        from splade_ray.docvalues import segment_agg_rows

        if self.method in ("quantized", "quantized_bmw"):
            raise ValueError("agg queries need a float-index shard")
        import pyarrow as _pa

        parts = [segment_agg_rows(seg, prepared, spec)
                 for seg in self.segments]
        return _pa.concat_tables(parts) if parts else None

    def phrase(self, spec: dict):
        """Evaluate phrases against the resident segments' POSITIONS
        layer — the serving half of :func:`positions.phrase_topk`: each
        segment's :class:`positions.SegmentPositions` stays resident and
        grows its pruned term set across requests (``ensure_terms``).
        Returns the complete per-segment match partials (phrase_id,
        doc_id, phrase_count, doc_len), tombstone-filtered; the router
        computes phrase dfs + BM25 ranking over the union. Float-index
        shards only."""
        from splade_ray.positions import SegmentPositions

        if self.method in ("quantized", "quantized_bmw"):
            raise ValueError("phrase queries need a float-index shard")
        terms = spec["terms"]
        pids, docs_out, counts_out, dls_out = [], [], [], []
        for seg in self.segments:
            sp = self._positions.get(seg.seg_dir)
            if sp is None:
                sp = SegmentPositions(seg.seg_dir, terms, with_doc_len=True)
                self._positions[seg.seg_dir] = sp
            else:
                sp.ensure_terms(terms)
            for pid, phrase in spec["phrases"].items():
                docs, counts = sp.phrase_counts(phrase)
                if docs.size and self._tomb is not None and self._tomb.size:
                    keep = ~np.isin(docs, self._tomb)
                    docs, counts = docs[keep], counts[keep]
                if not docs.size:
                    continue
                pids.extend([int(pid)] * docs.size)
                docs_out.append(docs)
                counts_out.append(counts)
                dls_out.append(sp.doc_lens(docs))
        import pyarrow as _pa

        return _pa.table({
            "phrase_id": _pa.array(np.asarray(pids, np.int64)),
            "doc_id": _pa.array(
                np.concatenate(docs_out) if docs_out else np.empty(0, np.int64)),
            "phrase_count": _pa.array(
                np.concatenate(counts_out) if counts_out
                else np.empty(0, np.int64)),
            "doc_len": _pa.array(
                np.concatenate(dls_out) if dls_out else np.empty(0, np.int64)),
        })

    def bool_score(self, prepared: dict) -> list[tuple[int, int, float]]:
        """Serve boolean-filtered BM25 (must / should / must_not /
        minimum_should_match / numeric FILTER clause) from the resident
        segments — the same kernel the Dataset pipeline runs
        (boolq.score_segment_bool; tombstones already applied at segment
        load). Float-index shards only."""
        from splade_ray.boolq import score_segment_bool

        if self.method in ("quantized", "quantized_bmw"):
            raise ValueError("bool queries need a float-index shard")
        rows: list[tuple[int, int, float]] = []
        for seg in self.segments:
            rows.extend(score_segment_bool(seg, prepared))
        return rows

    def facet(self, prepared: dict, spec: dict):
        """Serve a terms-bucket aggregation (facet counts / facet stats /
        top_hits) from the resident segments — the same kernels the
        Dataset pipelines run (facets.segment_facet_rows /
        docvalues.segment_top_hits_rows), with the facet dictionary and
        decoded postings cached per resident segment. Mergeable partial
        rows only; the router combines. Float-index shards only."""
        if self.method in ("quantized", "quantized_bmw"):
            raise ValueError("facet queries need a float-index shard")
        import pyarrow as _pa

        if spec["kind"] == "top_hits":
            from splade_ray.docvalues import segment_top_hits_rows

            parts = [
                segment_top_hits_rows(seg, prepared, spec["group_col"],
                                      spec["k"], spec["threshold"])
                for seg in self.segments
            ]
        elif spec["kind"] == "collapse":
            from splade_ray.collapse import segment_collapse_rows

            parts = [
                segment_collapse_rows(seg, prepared, spec["collapse_col"],
                                      spec["max_docs_per_key"])
                for seg in self.segments
            ]
        else:
            from splade_ray.facets import segment_facet_rows

            parts = [segment_facet_rows(seg, prepared, spec)
                     for seg in self.segments]
        return _pa.concat_tables(parts) if parts else None


def request_cache_key(qid: int, text: str, params, query_lang, scoring,
                      mu, lam, after, range_filter) -> tuple:
    """Cache key for one query of a request: every knob that can change
    that query's result rows (text, analyzer language, scoring family and
    its parameters, pagination cursor, sidecar range filter). Shared by
    :class:`Searcher` and :class:`QueryRouter` so both tiers of the
    ES-request-cache analog stay key-compatible."""
    return (text, query_lang, scoring, mu, lam, params.k1, params.b,
            params.top_k, params.threshold,
            after.get(int(qid)) if after else None, range_filter)


class RouterOverloaded(Exception):
    """Raised (inside a RayTaskError) when a QueryRouter sheds a request:
    the admission window is full and the waiting queue is at ``queue_cap``
    ("queue_full"), or the request's deadline expired before a slot freed
    ("deadline"). Clients should back off and retry, or route to another
    router replica. ``reason`` carries which policy shed the request."""

    def __init__(self, msg: str, reason: str = "queue_full"):
        super().__init__(msg)
        self.reason = reason

    def __reduce__(self):
        # exceptions cross the actor boundary pickled via args; keep reason
        return (RouterOverloaded, (str(self), self.reason))


@ray.remote
class QueryRouter:
    """Serving router: owns the shard actors and performs the whole
    prepare → fan-out → heap-merge cycle INSIDE one actor, so a client
    round-trip is a single ``router.search.remote(...)`` call instead of a
    driver-side scatter-gather. Multiple routers can be created over the
    same index for QPS scaling; each router's shards SPREAD across nodes.
    The reference has no serving tier at all (its retriever is an in-process
    loop, ``transformer_evaluator.py:142-193``) — this is the deployment
    shape a long-lived index needs.

    Backpressure: the actor is ASYNC — while one batch awaits its shards,
    further requests are admitted up to ``max_inflight``. Beyond that, up
    to ``queue_cap`` requests WAIT for a slot (bounded queue); each waiter
    holds at most ``deadline_s`` (per call, default ``default_deadline_s``)
    and is shed with reason="deadline" if no slot frees in time — the
    standard serving policy (don't start work the client has stopped
    waiting for). Arrivals past the queue cap shed immediately with
    reason="queue_full", so a slow shard surfaces as client-visible
    backpressure rather than silent memory growth inside the router. The
    default ``queue_cap=0`` is pure admission control (immediate shed when
    the window is full). Since every admitted request puts exactly one task
    on each shard actor, ``max_inflight`` also bounds each shard's queue
    depth; per-shard latency EMAs are exported via :meth:`stats` for load
    balancers.

    ``cache_size > 0`` adds a router-level request cache (the ES request
    cache at the coordinating tier): an LRU over per-query result frames
    keyed by :func:`request_cache_key`. Hits are answered from actor
    memory WITHOUT consuming an admission slot or touching the shards, so
    a hot query keeps serving even when the window is saturated; only the
    missing queries of a batch fan out. Same coherence rule as
    :class:`Searcher`: tombstones snapshot at startup and segments are
    immutable, so entries cannot go stale within one router lifetime."""

    def __init__(
        self,
        index_dir: str,
        num_shards: int = 8,
        method: str = "exact",
        max_inflight: int = 8,
        queue_cap: int = 0,
        default_deadline_s: float | None = None,
        simulate_shard_latency_s: float = 0.0,
        cache_size: int = 0,
    ):
        import asyncio
        from collections import OrderedDict

        # router-level request cache (the Searcher LRU lifted into the
        # serving tier): per-QUERY results keyed by request_cache_key;
        # hits are served WITHOUT taking an admission slot — repeated
        # queries cost neither the window nor a shard round-trip, exactly
        # ES's request cache serving from memory before the query phase.
        # Coherent for the actor's lifetime by construction: tombstones are
        # snapshotted in __init__ and segments are immutable, so an entry
        # can never go stale; open a new router after deletes/appends.
        self._cache_size = int(cache_size)
        self._cache: "OrderedDict[tuple, pd.DataFrame]" = OrderedDict()
        # resident lexicon for the suggest fast path: False = not yet
        # probed, None = too big (falls back to the Dataset pipeline)
        self._lexicon = False
        self._lexicon_cache_max = 2_000_000
        self._cache_hits = 0
        self._cache_misses = 0
        self._max_inflight = max_inflight
        self._slots = asyncio.Semaphore(max_inflight)
        self._queue_cap = queue_cap
        self._default_deadline = default_deadline_s
        self._inflight = 0
        self._waiting = 0
        self._admitted = 0
        self._shed = 0
        self._shed_queue_full = 0
        self._shed_deadline = 0
        self._shard_lat_ema: list[float] = []
        # fault injection for admission-control tests: hold the in-flight
        # slot this long before fanning out, as if the shards were slow
        self._sim_latency = simulate_shard_latency_s
        segs = segment_dirs(index_dir)
        num_shards = max(1, min(num_shards, len(segs)))
        assignment: list[list[str]] = [[] for _ in range(num_shards)]
        for i, s in enumerate(segs):
            assignment[i % num_shards].append(s)
        self.index_dir = index_dir
        from splade_ray.delete import load_tombstones

        tomb = load_tombstones(index_dir)
        self.actors = [
            IndexShardActor.options(scheduling_strategy="SPREAD").remote(
                a, method, tombstones=tomb if tomb.size else None
            )
            for a in assignment
        ]
        self.quant_extra: dict = {}
        self._quant_kb: tuple[float, float] | None = None
        if method in ("quantized", "quantized_bmw"):
            from splade_ray.quantized import load_quantized_manifest

            qman = load_quantized_manifest(index_dir)
            self.quant_extra = {"quant_factor": qman["factor"]}
            self._quant_kb = (qman["k1"], qman["b"])

    async def _admit(self, deadline_s: float | None) -> None:
        """Take an in-flight slot or raise RouterOverloaded. Full window +
        full waiting queue sheds immediately; otherwise the request waits
        (bounded) until a slot frees or its deadline expires."""
        import asyncio

        if self._inflight >= self._max_inflight and self._waiting >= self._queue_cap:
            self._shed += 1
            self._shed_queue_full += 1
            raise RouterOverloaded(
                f"router at max_inflight={self._max_inflight} with "
                f"queue_cap={self._queue_cap} waiters; {self._shed} total "
                "requests shed",
                reason="queue_full",
            )
        self._waiting += 1
        try:
            if deadline_s is None:
                await self._slots.acquire()
            else:
                try:
                    await asyncio.wait_for(self._slots.acquire(), timeout=deadline_s)
                except (asyncio.TimeoutError, TimeoutError):
                    self._shed += 1
                    self._shed_deadline += 1
                    raise RouterOverloaded(
                        f"no slot freed within deadline_s={deadline_s}; "
                        f"{self._shed} total requests shed",
                        reason="deadline",
                    ) from None
        finally:
            self._waiting -= 1
        self._inflight += 1
        self._admitted += 1

    async def search(
        self,
        queries: list[tuple[int, str]],
        params: BM25Params | None = None,
        query_lang: str | None = None,
        deadline_s: float | None = None,
        *,
        scoring: str = "bm25",
        mu: float = 2000.0,
        lam: float = 0.1,
        after: dict[int, tuple[float, int]] | None = None,
        range_filter: tuple[str, float | None, float | None] | None = None,
    ) -> pd.DataFrame:
        params = params or BM25Params()
        if self._quant_kb is not None and self._quant_kb != (params.k1, params.b):
            raise ValueError(
                f"quantized layer built with k1={self._quant_kb[0]} "
                f"b={self._quant_kb[1]}, query uses k1={params.k1} b={params.b}"
            )
        if self.quant_extra and (scoring != "bm25" or after or range_filter):
            raise ValueError(
                "quantized shards score baked BM25 impacts — scoring='ql' / "
                "search_after / range_filter need a float-index router"
            )
        async def fetch(missing):
            return await self._fanout_search(
                missing, params, query_lang, deadline_s, scoring=scoring,
                mu=mu, lam=lam, after=after, range_filter=range_filter)

        def key_of(qid, text):
            return request_cache_key(qid, text, params, query_lang,
                                     scoring, mu, lam, after, range_filter)

        return await self._serve_cached(
            queries, key_of, fetch,
            sort_cols=["query_id", "rank"], empty_cols=RUN_COLUMNS)

    async def _serve_cached(self, queries, key_of, fetch, *, sort_cols,
                            empty_cols) -> pd.DataFrame:
        """Generic per-query request-cache wrapper used by every router
        endpoint (score / sort / agg): split hits from misses, run
        ``fetch`` (an async coroutine — admission happens inside it, so
        full-hit requests never take a slot), store per-query sub-frames,
        assemble in request order. With the cache off, just fetch.

        Bookkeeping is by request POSITION, not query_id: a batch may
        legitimately repeat a qid (even with two different texts → two
        distinct cache keys). Hit frames are snapshotted at check time so
        an eviction during ``await fetch`` (this request's own inserts, or
        a concurrent request in this async actor) can never KeyError the
        assembly step."""
        if self._cache_size <= 0:
            return await fetch(list(queries))
        keys = [key_of(qid, text) for qid, text in queries]
        hit_frames: dict[int, pd.DataFrame] = {}   # position -> cached frame
        miss_pos: list[int] = []
        first_for_key: dict = {}                   # key -> first miss position
        dup_of: dict[int, int] = {}                # position -> fetched twin
        for i, k in enumerate(keys):
            frame = self._cache.get(k)
            if frame is not None:
                # snapshot the frame NOW — eviction while fetch is awaited
                # (concurrent requests interleave here) must not lose it
                self._cache.move_to_end(k)
                hit_frames[i] = frame
            elif k in first_for_key:
                dup_of[i] = first_for_key[k]
            else:
                first_for_key[k] = i
                miss_pos.append(i)
        self._cache_hits += len(hit_frames)
        self._cache_misses += len(queries) - len(hit_frames)
        fresh_parts: dict[int, pd.DataFrame] = {}  # position -> frame w/ qid
        if miss_pos:
            # fetch in waves of unique query_ids: the fetched frame is
            # selected by query_id, so one qid under two different texts in
            # a single fetch batch would conflate into one mixed frame
            waves: list[list[int]] = []
            cur: list[int] = []
            cur_qids: set[int] = set()
            for i in miss_pos:
                qid = int(queries[i][0])
                if qid in cur_qids:
                    waves.append(cur)
                    cur, cur_qids = [], set()
                cur.append(i)
                cur_qids.add(qid)
            if cur:
                waves.append(cur)
            for wave in waves:
                out = await fetch([queries[i] for i in wave])
                for i in wave:
                    qid = int(queries[i][0])
                    part = out[out["query_id"] == qid].reset_index(drop=True)
                    fresh_parts[i] = part
                    self._cache[keys[i]] = part.drop(columns=["query_id"])
            while len(self._cache) > self._cache_size:
                self._cache.popitem(last=False)
        parts = []
        for i, (qid, _) in enumerate(queries):
            if i in fresh_parts:
                # this request's results win even if immediately evicted
                parts.append(fresh_parts[i])
            elif i in dup_of:
                # same cache key fetched once — qid is NOT part of the key,
                # so re-stamp this position's own qid
                p = fresh_parts[dup_of[i]].copy()
                p["query_id"] = int(qid)
                parts.append(p)
            else:
                p = hit_frames[i].copy()
                p.insert(0, "query_id", int(qid))
                parts.append(p)
        parts = [p for p in parts if not p.empty]
        if not parts:
            return pd.DataFrame(columns=empty_cols)
        out = pd.concat(parts, ignore_index=True)
        return out.sort_values(sort_cols).reset_index(drop=True)

    async def _fanout_search(
        self,
        queries: list[tuple[int, str]],
        params: BM25Params,
        query_lang: str | None,
        deadline_s: float | None,
        *,
        scoring: str,
        mu: float,
        lam: float,
        after: dict[int, tuple[float, int]] | None,
        range_filter: tuple[str, float | None, float | None] | None,
    ) -> pd.DataFrame:
        """The admitted prepare → shard fan-out → heap-merge cycle (cache
        misses only when the request cache is on)."""
        import asyncio
        import time as _time

        await self._admit(
            deadline_s if deadline_s is not None else self._default_deadline
        )
        try:
            if self._sim_latency:
                await asyncio.sleep(self._sim_latency)
            # prepare_queries is small disk I/O (lexicon row-group reads);
            # it runs inline — the await below is where other requests
            # interleave
            prepared = {
                **prepare_queries(self.index_dir, queries, params, query_lang=query_lang,
                                  scoring=scoring, mu=mu, lam=lam),
                **({"after": {int(q): after[int(q)] for q, _ in queries
                              if int(q) in after}} if after else {}),
                **({"range_filter": range_filter} if range_filter else {}),
                **self.quant_extra,
            }
            t0 = _time.monotonic()

            async def timed(i: int, ref):
                part = await ref
                lat = _time.monotonic() - t0
                if not self._shard_lat_ema:
                    self._shard_lat_ema = [0.0] * len(self.actors)
                prev = self._shard_lat_ema[i]
                self._shard_lat_ema[i] = lat if prev == 0.0 else 0.8 * prev + 0.2 * lat
                return part

            results = await asyncio.gather(
                *[timed(i, a.search.remote(prepared)) for i, a in enumerate(self.actors)]
            )
        finally:
            self._inflight -= 1
            self._slots.release()
        rows = [r for part in results for r in part]
        if not rows:
            return pd.DataFrame(columns=RUN_COLUMNS)
        df = pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])
        out = (
            df.groupby("query_id", group_keys=False)
            .apply(lambda g: merge_topk(g, top_k=params.top_k))
            .reset_index(drop=True)
        )
        return out.sort_values(["query_id", "rank"]).reset_index(drop=True)

    async def sort_search(
        self,
        queries: list[tuple[int, str]],
        *,
        sort_col: str | None = None,
        descending: bool = True,
        sort_keys: list[tuple[str, bool]] | None = None,
        top_k: int = 10,
        query_lang: str | None = None,
        after: dict[int, tuple] | None = None,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve a sort-by-doc-values query (Lucene ``Sort``; single
        ``sort_col`` or multi-field ``sort_keys``) through the router's
        resident shards — same admission control as :meth:`search`, same
        results as :func:`splade_ray.docvalues.sort_search` (parity-
        tested), but doc-values and sort-order layers stay cached in the
        shard actors across calls. Sort results share the router request
        cache (spec-keyed, disjoint from scoring keys); hits bypass
        admission like every cached endpoint."""
        import asyncio

        if self.quant_extra:
            raise ValueError("sort queries need a float-index router")
        if (sort_col is None) == (sort_keys is None):
            raise ValueError("pass exactly one of sort_col / sort_keys")
        single = sort_keys is None
        keys = [(sort_col, bool(descending))] if single else [
            (c, bool(d)) for c, d in sort_keys]
        value_names = ["sort_value"] if single else [c for c, _ in keys]

        async def fetch(missing):
            await self._admit(
                deadline_s if deadline_s is not None
                else self._default_deadline
            )
            try:
                prepared = prepare_queries(self.index_dir, missing,
                                           query_lang=query_lang)
                results = await asyncio.gather(
                    *[a.sort.remote(prepared, keys, single, top_k, after)
                      for a in self.actors]
                )
            finally:
                self._inflight -= 1
                self._slots.release()
            import pyarrow as _pa

            from splade_ray.docvalues import merge_sort_rows

            pdf = _pa.concat_tables(results).to_pandas()
            return merge_sort_rows(pdf, keys, single=single, top_k=top_k)

        def key_of(qid, text):
            return ("sort", text, query_lang, tuple(keys), top_k,
                    (after or {}).get(int(qid)))

        return await self._serve_cached(
            queries, key_of, fetch, sort_cols=["query_id", "rank"],
            empty_cols=["query_id", "rank", "doc_id", *value_names])

    async def agg_search(
        self,
        queries: list[tuple[int, str]],
        *,
        kind: str,
        col: str | None = None,
        interval: int | None = None,
        extended: bool = False,
        query_lang: str | None = None,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve a metric aggregation over live matches through the
        router's resident shards — ``kind`` ∈ count | stats | histogram,
        matching :func:`docvalues.match_counts` /
        :func:`docvalues.numeric_stats` / :func:`docvalues.numeric_histogram`
        result-for-result (parity-tested). Same admission control as
        :meth:`search`; shard partials are integer rows, query-count- (or
        bucket-count-) sized."""
        import asyncio

        if self.quant_extra:
            raise ValueError("agg queries need a float-index router")
        spec = {"kind": kind}
        if kind in ("stats", "histogram"):
            if not col:
                raise ValueError(f"agg kind {kind!r} needs col=")
            spec["col"] = col
        if kind == "stats":
            spec["extended"] = bool(extended)
        if kind == "histogram":
            if not interval or interval <= 0:
                raise ValueError("histogram needs a positive interval")
            spec["interval"] = int(interval)
        agg_cols = {
            "count": ["query_id", "n_docs"],
            "stats": ["query_id", "n_docs", "sum_value", "min_value",
                      "max_value"] + (["sum_sq"] if extended else []),
            "histogram": ["query_id", "bucket", "n_docs"],
        }[kind]

        async def fetch(missing):
            await self._admit(
                deadline_s if deadline_s is not None
                else self._default_deadline
            )
            try:
                prepared = prepare_queries(self.index_dir, missing,
                                           query_lang=query_lang)
                results = await asyncio.gather(
                    *[a.agg.remote(prepared, spec) for a in self.actors]
                )
            finally:
                self._inflight -= 1
                self._slots.release()
            import pyarrow as _pa

            from splade_ray.docvalues import merge_agg_rows

            parts = [t for t in results if t is not None]
            pdf = (_pa.concat_tables(parts).to_pandas()
                   if parts else pd.DataFrame())
            return merge_agg_rows(pdf, spec, missing)

        def key_of(qid, text):
            return ("agg", text, query_lang, kind, col, interval,
                    bool(extended))

        sort_cols = (["query_id", "bucket"] if kind == "histogram"
                     else ["query_id"])
        return await self._serve_cached(
            queries, key_of, fetch, sort_cols=sort_cols,
            empty_cols=agg_cols)

    async def facet_search(
        self,
        queries: list[tuple[int, str]],
        *,
        kind: str,
        facet_col: str | None = None,
        metric_col: str | None = None,
        group_col: str | None = None,
        hits_per_bucket: int = 3,
        top: int | None = None,
        shard_size: int | None = None,
        multivalued: bool = False,
        params: BM25Params | None = None,
        query_lang: str | None = None,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve a terms-bucket aggregation through the router's resident
        shards — ``kind`` ∈ counts | stats | top_hits, matching
        :func:`facets.facet_counts` / :func:`facets.facet_stats_agg` /
        :func:`docvalues.top_hits_agg` result-for-result (parity-tested;
        the kernels and reducers are literally shared). Same admission
        control and request cache as :meth:`search`; shard partials are
        queries × bucket-cardinality (× k for top_hits) sized."""
        import asyncio

        if self.quant_extra:
            raise ValueError("facet queries need a float-index router")
        if kind == "counts":
            if not facet_col:
                raise ValueError("facet kind 'counts' needs facet_col=")
            spec = {"kind": "counts", "facet_col": facet_col,
                    "shard_size": shard_size,
                    "multivalued": bool(multivalued)}
            empty_cols = ["query_id", "facet", "n_docs"]
            sort_cols = ["query_id", "facet"]
        elif kind == "stats":
            if not facet_col or not metric_col:
                raise ValueError(
                    "facet kind 'stats' needs facet_col= and metric_col=")
            spec = {"kind": "stats", "facet_col": facet_col,
                    "metric_col": metric_col}
            empty_cols = ["query_id", "facet", "n_docs", "sum_v", "min_v",
                          "max_v", "avg_v"]
            sort_cols = ["query_id", "facet"]
        elif kind == "top_hits":
            if not group_col:
                raise ValueError("facet kind 'top_hits' needs group_col=")
            p = params or BM25Params()
            if int(hits_per_bucket) < 1:
                raise ValueError("hits_per_bucket must be >= 1")
            spec = {"kind": "top_hits", "group_col": group_col,
                    "k": int(hits_per_bucket), "threshold": p.threshold}
            empty_cols = ["query_id", "bucket", "hit_rank", "doc_id",
                          "score"]
            sort_cols = ["query_id", "bucket", "hit_rank"]
        else:
            raise ValueError(f"unknown facet kind {kind!r}")

        async def fetch(missing):
            await self._admit(
                deadline_s if deadline_s is not None
                else self._default_deadline
            )
            try:
                prepared = prepare_queries(
                    self.index_dir, missing,
                    params if kind == "top_hits" else None,
                    query_lang=query_lang)
                results = await asyncio.gather(
                    *[a.facet.remote(prepared, spec) for a in self.actors]
                )
            finally:
                self._inflight -= 1
                self._slots.release()
            import pyarrow as _pa

            parts = [t for t in results if t is not None]
            pdf = (_pa.concat_tables(parts).to_pandas()
                   if parts else pd.DataFrame())
            if kind == "top_hits":
                from splade_ray.docvalues import merge_top_hits_rows

                return merge_top_hits_rows(pdf, spec["k"])
            from splade_ray.facets import merge_facet_rows

            return merge_facet_rows(pdf, spec, top)

        p_key = params or BM25Params()

        def key_of(qid, text):
            return ("facet", kind, text, query_lang, facet_col, metric_col,
                    group_col, int(hits_per_bucket), top, shard_size,
                    bool(multivalued), p_key.k1, p_key.b, p_key.threshold)

        return await self._serve_cached(
            queries, key_of, fetch, sort_cols=sort_cols,
            empty_cols=empty_cols)

    def _resident_lexicon(self):
        """Lazily cache the lexicon's (terms, lens, dfs) arrays for the
        fuzzy/complete serving fast path — vocab-sized, so only below
        ``_lexicon_cache_max`` rows (default 2M ≈ tens of MB); above it
        the endpoints fall back to the streaming Dataset pipeline
        (suggest.suggest_terms), which never materializes the vocabulary
        in one process. Returns (terms, lens, dfs) or None."""
        if self._lexicon is not False:
            return self._lexicon
        import pyarrow.dataset as pads

        lex_dir = os.path.join(self.index_dir, "lexicon")
        ds = pads.dataset(lex_dir)
        n = ds.count_rows()
        if n > self._lexicon_cache_max:
            self._lexicon = None
            return None
        tbl = ds.to_table(columns=["term", "df"])
        terms = np.asarray(tbl["term"].to_pylist(), object)
        lens = np.array([len(t) for t in terms], np.int64)
        dfs = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        self._lexicon = (terms, lens, dfs)
        return self._lexicon

    async def suggest(
        self,
        queries: list[tuple[int, str]],
        *,
        kind: str = "fuzzy",
        m: int = 5,
        max_dist: int = 2,
        transpositions: bool = False,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve term suggestion through the router — ``kind`` ∈
        fuzzy (did-you-mean: :func:`suggest.suggest_terms` semantics) |
        complete (popularity-weighted completion:
        :func:`suggest.complete_prefix` semantics) — result-for-result
        with the batch functions (parity-tested). Fuzzy runs the
        vectorized Levenshtein DP against the RESIDENT lexicon when the
        vocabulary fits (``_resident_lexicon``) and falls back to the
        streaming Dataset pipeline above the cap; completion is a
        pushdown range read either way. Same admission control and
        request cache as :meth:`search`."""
        from splade_ray.suggest import (
            SUGGEST_COLUMNS,
            complete_prefix,
            damerau_levenshtein_bulk,
            levenshtein_bulk,
            suggest_terms,
        )

        if kind not in ("fuzzy", "complete"):
            raise ValueError(f"unknown suggest kind {kind!r}")

        async def fetch(missing):
            await self._admit(
                deadline_s if deadline_s is not None
                else self._default_deadline
            )
            try:
                if kind == "complete":
                    return complete_prefix(self.index_dir, missing, m=m)
                resident = self._resident_lexicon()
                if resident is None:
                    return suggest_terms(self.index_dir, missing,
                                         max_dist=max_dist, m=m,
                                         transpositions=transpositions)
                terms, lens, dfs = resident
                out = {"query_id": [], "term": [], "dist": [], "df": []}
                for qid, q in missing:
                    band = np.abs(lens - len(q)) <= max_dist
                    if not band.any():
                        continue
                    cand, cdf = terms[band], dfs[band]
                    d = (damerau_levenshtein_bulk if transpositions
                         else levenshtein_bulk)(q, cand)
                    hit = d <= max_dist
                    if not hit.any():
                        continue
                    order = np.lexsort((cand[hit], -cdf[hit], d[hit]))[:m]
                    out["query_id"].extend([int(qid)] * order.size)
                    out["term"].extend(cand[hit][order].tolist())
                    out["dist"].extend(d[hit][order].tolist())
                    out["df"].extend(cdf[hit][order].tolist())
                return pd.DataFrame(out).astype(
                    {"query_id": np.int64, "dist": np.int64,
                     "df": np.int64}) if out["query_id"] else \
                    pd.DataFrame(columns=SUGGEST_COLUMNS).astype(
                        {"query_id": np.int64, "term": object,
                         "dist": np.int64, "df": np.int64})
            finally:
                self._inflight -= 1
                self._slots.release()

        def key_of(qid, text):
            return ("suggest", kind, text, m, max_dist, bool(transpositions))

        if kind == "complete":
            sort_cols = ["query_id", "sugg_rank"]
            empty_cols = ["query_id", "sugg_rank", "term", "df"]
        else:
            sort_cols = ["query_id", "dist"]
            empty_cols = SUGGEST_COLUMNS
        return await self._serve_cached(
            queries, key_of, fetch, sort_cols=sort_cols,
            empty_cols=empty_cols)

    async def prefix_search(
        self,
        queries: list[tuple[int, str]],
        params: BM25Params | None = None,
        *,
        mode: str = "prefix",
        max_terms: int = 128,
        query_lang: str | None = None,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve multi-term expansion retrieval through the router —
        ``mode`` ∈ prefix (Lucene PrefixQuery: :func:`suggest.prefix_search`
        semantics) | bool_prefix (ES match_bool_prefix:
        :func:`suggest.match_bool_prefix_search`) | wildcard (Lucene
        WildcardQuery: :func:`suggest.wildcard_search`) | regexp (ES
        RegexpQuery: :func:`suggest.regexp_search`). The pattern expands
        against the lexicon in-actor (pushdown range read pruned by the
        pattern's literal prefix), then the expanded OR-term query flows
        through :meth:`search` — inheriting its admission control AND
        its request cache keyed on the EXPANDED text, so repeated
        patterns skip the shard fan-out entirely."""
        from splade_ray.suggest import (
            expand_prefix,
            expand_regexp,
            expand_wildcard,
        )

        if mode not in ("prefix", "bool_prefix", "wildcard", "regexp"):
            raise ValueError(f"unknown prefix mode {mode!r}")
        expanded = []
        for qid, text in queries:
            if mode == "prefix":
                terms = expand_prefix(self.index_dir, text,
                                      max_terms=max_terms)
            elif mode == "wildcard":
                terms = expand_wildcard(self.index_dir, text,
                                        max_terms=max_terms)
            elif mode == "regexp":
                terms = expand_regexp(self.index_dir, text,
                                      max_terms=max_terms)
            else:
                from splade_ray.analysis import tokenize

                toks = tokenize(text or "", query_lang)
                if not toks:
                    continue
                *fixed, pre = toks
                terms = list(fixed) + expand_prefix(self.index_dir, pre,
                                                    max_terms=max_terms)
            if terms:
                expanded.append((int(qid), " ".join(terms)))
        if not expanded:
            return pd.DataFrame(columns=RUN_COLUMNS).astype(
                {"query_id": np.int64, "rank": np.int32,
                 "doc_id": np.int64, "score": np.float64})
        return await self.search(expanded, params, query_lang=query_lang,
                                 deadline_s=deadline_s)

    async def phrase_topk(
        self,
        phrases: list[tuple[int, str]],
        params: BM25Params | None = None,
        *,
        query_lang: str | None = None,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve BM25-ranked phrase retrieval through the resident shards
        — exact :func:`positions.phrase_topk` semantics (each phrase is
        ONE virtual term: tf = occurrence count, df = docs containing the
        phrase; parity-tested). Shard partials are the complete match
        tables (phrase matches are selective by nature); the router
        derives global phrase dfs from their union, then scores and cuts.
        Requires the positions layer; same admission control and request
        cache as :meth:`search`."""
        import asyncio

        from splade_ray.analysis import tokenize
        from splade_ray.bm25 import idf, tf_component
        from splade_ray.positions import (
            PHRASE_RUN_COLS,
            PHRASE_RUN_TYPES,
            load_positions_manifest,
        )

        if self.quant_extra:
            raise ValueError("phrase queries need a float-index router")
        p = params or BM25Params()
        pman = load_positions_manifest(self.index_dir)
        lang = query_lang if query_lang is not None else pman.get("analyzer")
        man = load_manifest(self.index_dir)
        n_docs, avgdl = man["n_docs"], man["avgdl"]

        async def fetch(missing):
            tokenized = {
                int(pid): (tokenize(text, lang) if lang else tokenize(text))
                for pid, text in missing
            }
            tokenized = {pid: ts for pid, ts in tokenized.items() if ts}
            empty = pd.DataFrame(
                columns=PHRASE_RUN_COLS).astype(PHRASE_RUN_TYPES).rename(
                columns={"phrase_id": "query_id"})
            if not tokenized:
                return empty
            spec = {
                "phrases": tokenized,
                "terms": sorted({t for ts in tokenized.values() for t in ts}),
            }
            await self._admit(
                deadline_s if deadline_s is not None
                else self._default_deadline
            )
            try:
                results = await asyncio.gather(
                    *[a.phrase.remote(spec) for a in self.actors]
                )
            finally:
                self._inflight -= 1
                self._slots.release()
            import pyarrow as _pa

            pdf = _pa.concat_tables(results).to_pandas()
            if pdf.empty:
                return empty
            # global phrase dfs over the union (segments partition docs,
            # so the match table has one row per (phrase, doc))
            dfs = pdf.groupby("phrase_id").size()
            w = {int(pid): idf(int(df), n_docs) for pid, df in dfs.items()}
            ws = pdf["phrase_id"].map(w).to_numpy(np.float64)
            pdf["score"] = ws * tf_component(
                pdf["phrase_count"].to_numpy(np.float64),
                pdf["doc_len"].to_numpy(np.float64), avgdl, p)
            pdf = pdf[pdf["score"] > p.threshold].sort_values(
                ["phrase_id", "score", "doc_id"],
                ascending=[True, False, True], kind="mergesort")
            pdf["rank"] = (pdf.groupby("phrase_id").cumcount() + 1
                           ).astype(np.int32)
            pdf = pdf[pdf["rank"] <= p.top_k]
            out = pdf[PHRASE_RUN_COLS].rename(
                columns={"phrase_id": "query_id"})
            return out.reset_index(drop=True)

        def key_of(qid, text):
            return ("phrase", text, lang, p.k1, p.b, p.top_k, p.threshold)

        out = await self._serve_cached(
            phrases, key_of, fetch, sort_cols=["query_id", "rank"],
            empty_cols=["query_id", "rank", "doc_id", "score"])
        return out.rename(columns={"query_id": "phrase_id"})[
            PHRASE_RUN_COLS] if len(out) else pd.DataFrame(
            columns=PHRASE_RUN_COLS).astype(PHRASE_RUN_TYPES)

    async def more_like_this(
        self,
        corpus_path: str,
        seed_ids: list[int],
        *,
        m_terms: int = 10,
        params: BM25Params | None = None,
        text_col: str = "text",
        id_col: str = "doc_id",
        query_lang: str | None = None,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve more-like-this through the router — exact
        :func:`mlt.more_like_this` semantics (parity-tested): seed docs'
        texts fetch by pushdown, the MLT term selection runs in-actor,
        and the expanded query flows through :meth:`search` (top_k+1 +
        self-hit filter), inheriting its admission control and request
        cache keyed on the expanded text."""
        import pyarrow.dataset as pads

        from splade_ray.mlt import select_terms

        p = params or BM25Params()
        flt = pads.field(id_col).isin([int(s) for s in seed_ids])
        tbl = pads.dataset(corpus_path).to_table(
            columns=[id_col, text_col], filter=flt)
        seed_texts = dict(zip(
            tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64).tolist(),
            tbl[text_col].to_pylist()))
        missing = set(map(int, seed_ids)) - set(seed_texts)
        if missing:
            raise KeyError(f"seed doc ids not found in corpus: "
                           f"{sorted(missing)}")
        terms = select_terms(self.index_dir, seed_texts, m_terms, query_lang)
        queries = [(sid, " ".join(ts)) for sid, ts in terms.items() if ts]
        if not queries:
            return pd.DataFrame(columns=RUN_COLUMNS).astype(
                {"query_id": np.int64, "rank": np.int32,
                 "doc_id": np.int64, "score": np.float64})
        over = BM25Params(k1=p.k1, b=p.b, top_k=p.top_k + 1,
                          threshold=p.threshold)
        run = await self.search(queries, over, query_lang=query_lang,
                                deadline_s=deadline_s)
        run = run[run["doc_id"] != run["query_id"]].copy()  # self-hit
        run["rank"] = run.groupby("query_id").cumcount().add(1).astype(np.int32)
        run = run[run["rank"] <= p.top_k]
        return run.reset_index(drop=True)[RUN_COLUMNS]

    async def rm3_search(
        self,
        corpus_path: str,
        queries: list[tuple[int, str]],
        params: BM25Params | None = None,
        *,
        fb_docs: int = 5,
        fb_terms: int = 8,
        exp_qtf: int = 1,
        text_col: str = "text",
        id_col: str = "doc_id",
        query_lang: str | None = None,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve two-pass RM3 pseudo-relevance feedback through the router
        — exact :func:`rm3.rm3_search` semantics (parity-tested): the
        feedback pass and the expanded pass both ride :meth:`search`
        (admission + request cache on each), and the integer term mining
        runs in-actor over a pushdown read of the feedback docs only."""
        from splade_ray.rm3 import mine_expansion_terms

        p = params or BM25Params()
        fb_params = BM25Params(k1=p.k1, b=p.b, top_k=fb_docs,
                               threshold=p.threshold)
        fb_run = await self.search(queries, fb_params,
                                   query_lang=query_lang,
                                   deadline_s=deadline_s)
        exp = mine_expansion_terms(
            self.index_dir, corpus_path, queries, fb_run,
            fb_terms=fb_terms, text_col=text_col, id_col=id_col,
            query_lang=query_lang)
        by_q = (exp.groupby("query_id")["term"].apply(list).to_dict()
                if not exp.empty else {})
        expanded = [
            (qid, text + (" " + " ".join(by_q[qid] * exp_qtf)
                          if by_q.get(qid) else ""))
            for qid, text in queries
        ]
        run = await self.search(expanded, p, query_lang=query_lang,
                                deadline_s=deadline_s)
        return run[RUN_COLUMNS]

    async def bool_search(
        self,
        queries: list[tuple[int, dict]],
        params: BM25Params | None = None,
        *,
        query_lang: str | None = None,
        range_filter: tuple[str, float | None, float | None] | None = None,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve boolean retrieval through the resident shards — each
        query is ``(qid, {"must": text, "should": text, "must_not":
        text, "minimum_should_match": n})`` with the exact
        :func:`boolq.boolean_search` semantics (shared kernel). Same
        admission control and request cache as :meth:`search`; the cache
        key canonicalizes the clause dict, so repeated boolean requests
        answer from router memory."""
        import asyncio
        import json as _json

        from splade_ray.boolq import prepare_bool_queries

        if self.quant_extra:
            raise ValueError("bool queries need a float-index router")
        p = params or BM25Params()

        async def fetch(missing):
            await self._admit(
                deadline_s if deadline_s is not None
                else self._default_deadline
            )
            try:
                prepared = prepare_bool_queries(
                    self.index_dir, missing, p, query_lang=query_lang)
                if range_filter:
                    prepared = {**prepared, "range_filter": range_filter}
                results = await asyncio.gather(
                    *[a.bool_score.remote(prepared) for a in self.actors]
                )
            finally:
                self._inflight -= 1
                self._slots.release()
            rows = [r for part in results for r in part]
            if not rows:
                return pd.DataFrame(columns=RUN_COLUMNS)
            df = pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])
            out = (
                df.groupby("query_id", group_keys=False)
                .apply(lambda g: merge_topk(g, top_k=p.top_k))
                .reset_index(drop=True)
            )
            return out.sort_values(["query_id", "rank"]).reset_index(drop=True)

        def key_of(qid, spec):
            return ("bool", _json.dumps(spec, sort_keys=True), query_lang,
                    p.k1, p.b, p.top_k, p.threshold, range_filter)

        return await self._serve_cached(
            queries, key_of, fetch, sort_cols=["query_id", "rank"],
            empty_cols=RUN_COLUMNS)

    async def collapse_search(
        self,
        queries: list[tuple[int, str]],
        *,
        collapse_col: str,
        max_docs_per_key: int = 1,
        params: BM25Params | None = None,
        query_lang: str | None = None,
        scoring: str = "bm25",
        mu: float = 2000.0,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Serve field-collapsed retrieval (ES ``collapse`` /
        diversified-sampler cap) through the resident shards — matches
        :func:`collapse.collapse_search` result-for-result (shared
        kernel + reducer). Same admission control and request cache as
        :meth:`search`; shard partials are queries × keys-in-shard ×
        max_docs_per_key sized."""
        import asyncio

        if self.quant_extra:
            raise ValueError("collapse queries need a float-index router")
        if max_docs_per_key < 1:
            raise ValueError("max_docs_per_key must be >= 1")
        p = params or BM25Params()
        spec = {"kind": "collapse", "collapse_col": collapse_col,
                "max_docs_per_key": int(max_docs_per_key)}

        async def fetch(missing):
            await self._admit(
                deadline_s if deadline_s is not None
                else self._default_deadline
            )
            try:
                prepared = prepare_queries(
                    self.index_dir, missing, p, query_lang=query_lang,
                    scoring=scoring, mu=mu)
                results = await asyncio.gather(
                    *[a.facet.remote(prepared, spec) for a in self.actors]
                )
            finally:
                self._inflight -= 1
                self._slots.release()
            import pyarrow as _pa

            from splade_ray.collapse import merge_collapse_rows

            parts = [t for t in results if t is not None]
            pdf = (_pa.concat_tables(parts).to_pandas()
                   if parts else pd.DataFrame())
            return merge_collapse_rows(
                pdf, top_k=p.top_k, max_docs_per_key=int(max_docs_per_key))

        def key_of(qid, text):
            return ("collapse", text, query_lang, scoring, mu, collapse_col,
                    int(max_docs_per_key), p.k1, p.b, p.top_k, p.threshold)

        from splade_ray.collapse import COLLAPSE_COLUMNS

        return await self._serve_cached(
            queries, key_of, fetch, sort_cols=["query_id", "rank"],
            empty_cols=COLLAPSE_COLUMNS)

    def stats(self) -> dict:
        """Admission-control counters + per-shard latency EMAs (for load
        balancers / autoscalers)."""
        return {
            "inflight": self._inflight,
            "waiting": self._waiting,
            "max_inflight": self._max_inflight,
            "queue_cap": self._queue_cap,
            "admitted": self._admitted,
            "shed": self._shed,
            "shed_queue_full": self._shed_queue_full,
            "shed_deadline": self._shed_deadline,
            "shard_latency_ema_s": list(self._shard_lat_ema),
            "cache_size": self._cache_size,
            "cache_hits": self._cache_hits,
            "cache_misses": self._cache_misses,
        }

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


class RouterPool:
    """Client-side replica pool over :class:`QueryRouter` actors: requests
    round-robin across replicas; a shed (``RouterOverloaded``) fails over
    to the next replica, and after a full sweep the client backs off and
    retries — so the router's bounded admission window composes into
    end-to-end load balancing instead of surfacing raw errors. Each replica
    owns its own shard actors (QPS scales with ``n_routers``); spreading
    across nodes is inherited from the routers' shard placement."""

    def __init__(
        self,
        index_dir: str,
        n_routers: int = 2,
        *,
        num_shards: int = 8,
        method: str = "exact",
        max_inflight: int = 8,
        **router_kwargs,
    ):
        if n_routers < 1:
            raise ValueError("n_routers must be >= 1")
        self.routers = [
            QueryRouter.remote(
                index_dir, num_shards=num_shards, method=method,
                max_inflight=max_inflight, **router_kwargs,
            )
            for _ in range(n_routers)
        ]
        self._rr = 0
        self._retries = 0
        self._failovers = 0
        self._dead: set = set()

    def submit(self, queries, params: BM25Params | None = None,
               deadline_s: float | None = None):
        """Fire one request at the next replica (round-robin); returns the
        ObjectRef. The caller handles shedding (see :meth:`search`)."""
        r = self.routers[self._rr % len(self.routers)]
        self._rr += 1
        return r.search.remote(queries, params, deadline_s=deadline_s)

    def _failover_call(self, method: str, args: tuple, kwargs: dict,
                       max_sweeps: int, backoff_s: float):
        """Shed/death failover shared by EVERY router endpoint (round-4
        VERDICT item 5 — previously only scoring requests failed over):
        try each live replica once per sweep; a ``RouterOverloaded`` shed
        moves to the next replica, a dead replica (``RayActorError``) is
        marked dead and skipped for the pool's lifetime; between sweeps
        sleep ``backoff_s`` (doubling). Raises the last shed only after
        ``max_sweeps`` full sweeps, or ``RayActorError`` when every
        replica is dead."""
        import time as _time

        delay = backoff_s
        last: Exception | None = None
        for sweep in range(max_sweeps):
            for _ in range(len(self.routers)):
                r = self.routers[self._rr % len(self.routers)]
                self._rr += 1
                if r in self._dead:
                    continue
                try:
                    return ray.get(getattr(r, method).remote(*args, **kwargs))
                except ray.exceptions.RayActorError as e:
                    self._dead.add(r)
                    self._failovers += 1
                    last = e
                except ray.exceptions.RayTaskError as e:
                    if not isinstance(e.cause, RouterOverloaded):
                        raise
                    last = e.cause
                    self._retries += 1
            if len(self._dead) == len(self.routers):
                raise last  # every replica dead
            if sweep < max_sweeps - 1:
                _time.sleep(delay)
                delay *= 2
        raise last  # every live replica shed on every sweep

    def search(
        self,
        queries: list[tuple[int, str]],
        params: BM25Params | None = None,
        *,
        max_sweeps: int = 4,
        backoff_s: float = 0.05,
        deadline_s: float | None = None,
    ) -> pd.DataFrame:
        """Blocking search with shed/death failover (see
        :meth:`_failover_call`)."""
        return self._failover_call(
            "search", (queries, params), {"deadline_s": deadline_s},
            max_sweeps, backoff_s)

    def sort_search(self, queries, *, max_sweeps: int = 4,
                    backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.sort_search`."""
        return self._failover_call("sort_search", (queries,), kwargs,
                                   max_sweeps, backoff_s)

    def agg_search(self, queries, *, max_sweeps: int = 4,
                   backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.agg_search`."""
        return self._failover_call("agg_search", (queries,), kwargs,
                                   max_sweeps, backoff_s)

    def facet_search(self, queries, *, max_sweeps: int = 4,
                     backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.facet_search`."""
        return self._failover_call("facet_search", (queries,), kwargs,
                                   max_sweeps, backoff_s)

    def collapse_search(self, queries, *, max_sweeps: int = 4,
                        backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.collapse_search`."""
        return self._failover_call("collapse_search", (queries,), kwargs,
                                   max_sweeps, backoff_s)

    def rm3_search(self, corpus_path, queries, *, max_sweeps: int = 4,
                   backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.rm3_search`."""
        return self._failover_call("rm3_search", (corpus_path, queries),
                                   kwargs, max_sweeps, backoff_s)

    def more_like_this(self, corpus_path, seed_ids, *, max_sweeps: int = 4,
                       backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.more_like_this`."""
        return self._failover_call("more_like_this",
                                   (corpus_path, seed_ids), kwargs,
                                   max_sweeps, backoff_s)

    def phrase_topk(self, phrases, *, max_sweeps: int = 4,
                    backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.phrase_topk`."""
        return self._failover_call("phrase_topk", (phrases,), kwargs,
                                   max_sweeps, backoff_s)

    def bool_search(self, queries, *, max_sweeps: int = 4,
                    backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.bool_search`."""
        return self._failover_call("bool_search", (queries,), kwargs,
                                   max_sweeps, backoff_s)

    def suggest(self, queries, *, max_sweeps: int = 4,
                backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.suggest`."""
        return self._failover_call("suggest", (queries,), kwargs,
                                   max_sweeps, backoff_s)

    def prefix_search(self, queries, *, max_sweeps: int = 4,
                      backoff_s: float = 0.05, **kwargs) -> pd.DataFrame:
        """Failover wrapper over :meth:`QueryRouter.prefix_search`."""
        return self._failover_call("prefix_search", (queries,), kwargs,
                                   max_sweeps, backoff_s)

    def stats(self) -> dict:
        per = ray.get([r.stats.remote() for r in self.routers
                       if r not in self._dead])
        return {
            "replicas": per,
            "admitted": sum(p["admitted"] for p in per),
            "shed": sum(p["shed"] for p in per),
            "client_retries": self._retries,
            "client_failovers": self._failovers,
            "dead_replicas": len(self._dead),
        }

    def shutdown(self) -> None:
        for r in self.routers:
            try:
                ray.get(r.shutdown.remote())
            except ray.exceptions.RayActorError:
                pass  # replica already dead — its shards die with it
            ray.kill(r)
        self.routers = []


class Searcher:
    """Driver-side handle over a pool of shard actors for low-latency
    repeated queries (used by bench.py for p50 latency).

    ``cache_size > 0`` enables an ES-request-cache-style LRU over
    PER-QUERY results keyed on (query text, analysis/scoring knobs,
    cursor, filter): repeated queries skip the shard round-trip entirely.
    Coherence is by construction — a Searcher snapshots its tombstones at
    startup and segments are immutable, so cached entries can never go
    stale within one Searcher lifetime; open a new Searcher after
    deletes/appends (the same rule the shard actors themselves follow)."""

    def __init__(self, index_dir: str, num_shards: int = 8,
                 method: str = "exact", cache_size: int = 0):
        from collections import OrderedDict

        self.index_dir = index_dir
        self.params_default = BM25Params()
        self.cache_size = int(cache_size)
        self._cache: "OrderedDict[tuple, pd.DataFrame]" = OrderedDict()
        self.cache_hits = 0
        self.cache_misses = 0
        self.quant_extra: dict = {}
        self._quant_kb: tuple[float, float] | None = None
        if method in ("quantized", "quantized_bmw"):
            from splade_ray.quantized import load_quantized_manifest

            qman = load_quantized_manifest(index_dir)
            self.quant_extra = {"quant_factor": qman["factor"]}
            self._quant_kb = (qman["k1"], qman["b"])
        segs = segment_dirs(index_dir)
        num_shards = max(1, min(num_shards, len(segs)))
        assignment: list[list[str]] = [[] for _ in range(num_shards)]
        for i, s in enumerate(segs):
            assignment[i % num_shards].append(s)
        # SPREAD the shard actors across nodes (ROADMAP #3): each shard's
        # postings then sit behind a different node's memory bandwidth and a
        # node loss takes out 1/num_shards of the index, not all of it.
        # No-op placement-wise in single-node mode.
        from splade_ray.delete import load_tombstones

        tomb = load_tombstones(index_dir)
        self.actors = [
            IndexShardActor.options(scheduling_strategy="SPREAD").remote(
                a, method, tombstones=tomb if tomb.size else None
            )
            for a in assignment
        ]

    def search(
        self,
        queries: list[tuple[int, str]],
        params: BM25Params | None = None,
        query_lang: str | None = None,
        *,
        scoring: str = "bm25",
        mu: float = 2000.0,
        lam: float = 0.1,
        after: dict[int, tuple[float, int]] | None = None,
        range_filter: tuple[str, float | None, float | None] | None = None,
    ) -> pd.DataFrame:
        params = params or self.params_default
        if self.cache_size > 0:
            return self._search_cached(
                queries, params, query_lang, scoring=scoring, mu=mu,
                lam=lam, after=after, range_filter=range_filter)
        return self._search_uncached(
            queries, params, query_lang, scoring=scoring, mu=mu, lam=lam,
            after=after, range_filter=range_filter)

    def _cache_key(self, qid: int, text: str, params, query_lang, scoring,
                   mu, lam, after, range_filter) -> tuple:
        return request_cache_key(qid, text, params, query_lang, scoring,
                                 mu, lam, after, range_filter)

    def _search_cached(self, queries, params, query_lang, *, scoring, mu,
                       lam, after, range_filter) -> pd.DataFrame:
        keys = {
            int(qid): self._cache_key(int(qid), text, params, query_lang,
                                      scoring, mu, lam, after, range_filter)
            for qid, text in queries
        }
        missing = [(qid, text) for qid, text in queries
                   if keys[int(qid)] not in self._cache]
        self.cache_hits += len(queries) - len(missing)
        self.cache_misses += len(missing)
        fresh_parts: dict[int, pd.DataFrame] = {}
        if missing:
            fresh = self._search_uncached(
                missing, params, query_lang, scoring=scoring, mu=mu,
                lam=lam, after=after, range_filter=range_filter)
            for qid, _ in missing:
                part = fresh[fresh["query_id"] == int(qid)].reset_index(
                    drop=True)
                fresh_parts[int(qid)] = part
                self._cache[keys[int(qid)]] = part.drop(columns=["query_id"])
            while len(self._cache) > self.cache_size:
                self._cache.popitem(last=False)
        parts = []
        for qid, _ in queries:
            qid = int(qid)
            if qid in fresh_parts:
                # this call's results are authoritative even if the entry
                # was immediately evicted (cache_size < batch size)
                parts.append(fresh_parts[qid])
                continue
            k = keys[qid]
            self._cache.move_to_end(k)
            p = self._cache[k].copy()
            p.insert(0, "query_id", qid)
            parts.append(p)
        parts = [p for p in parts if not p.empty]
        if not parts:
            return pd.DataFrame(columns=RUN_COLUMNS)
        out = pd.concat(parts, ignore_index=True)
        return out.sort_values(["query_id", "rank"]).reset_index(drop=True)

    def _search_uncached(self, queries, params, query_lang, *, scoring, mu,
                         lam, after, range_filter) -> pd.DataFrame:
        if self._quant_kb is not None and self._quant_kb != (params.k1, params.b):
            raise ValueError(
                f"quantized layer built with k1={self._quant_kb[0]} "
                f"b={self._quant_kb[1]}, query uses k1={params.k1} b={params.b}"
            )
        if self.quant_extra and (scoring != "bm25" or after or range_filter):
            raise ValueError(
                "quantized shards score baked BM25 impacts — scoring='ql' / "
                "search_after / range_filter need a float-index Searcher"
            )
        prepared = {
            **prepare_queries(self.index_dir, queries, params, query_lang=query_lang,
                              scoring=scoring, mu=mu, lam=lam),
            **({"after": {int(q): after[int(q)] for q, _ in queries if int(q) in after}}
               if after else {}),
            **({"range_filter": range_filter} if range_filter else {}),
            **self.quant_extra,
        }
        results = ray.get([a.search.remote(prepared) for a in self.actors])
        rows = [r for part in results for r in part]
        if not rows:
            return pd.DataFrame(columns=RUN_COLUMNS)
        df = pd.DataFrame(rows, columns=["query_id", "doc_id", "score"])
        out = (
            df.groupby("query_id", group_keys=False)
            .apply(lambda g: merge_topk(g, top_k=params.top_k))
            .reset_index(drop=True)
        )
        return out.sort_values(["query_id", "rank"]).reset_index(drop=True)

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
