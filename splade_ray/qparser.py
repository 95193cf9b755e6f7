"""Lucene classic query-string parser + one-pass federated execution.

The reference's query side takes pre-analyzed term lists
(``splade/tasks/transformer_evaluator.py:162-168``); the user-facing entry
point of every Lucene/Elasticsearch deployment is the classic query-string
syntax (``query_string`` query). This module pins a deterministic subset
and executes it as ONE ranking over the existing index layers:

Syntax (a subset of Lucene's classic QueryParser):

- ``word``            optional (SHOULD) term
- ``+word``           required (MUST) term
- ``-word``           prohibited (MUST_NOT) term
- ``"a b c"``         phrase clause (``+``/``-`` prefixes apply:
                      ``+"a b"`` required, ``-"a b"`` prohibited, bare =
                      optional scoring clause)
- ``word~`` / ``word~1`` / ``word~2``  fuzzy term: expanded driver-side
                      over the lexicon within the edit distance (Lucene
                      FuzzyQuery; default ~ = 2), each expansion a SHOULD
                      term with qtf=1
- ``word*``           prefix wildcard: expanded driver-side (Lucene
                      PrefixQuery), each expansion a SHOULD term with
                      qtf=1
- ``/pattern/``       regexp term (Lucene RegexpQuery syntax in the
                      classic parser): anchored RE2 full-match expansion
                      over the lexicon, each expansion a SHOULD term
                      with qtf=1. Patterns match ANALYZED terms, so
                      write them lowercase; no whitespace inside the
                      pattern (the classic-parser tokenizer splits on
                      spaces, as in Lucene without escaping)

Clause words run through the index analyzer (a clause whose analysis
yields several tokens contributes each; a phrase's words analyze 1:1 —
words analyzing to nothing are dropped from the phrase). No field prefixes
(single-field indexes here — use search_fielded for multi-field), no
grouping parens, no AND/OR/NOT operators, no boosts, no escaping.

Scoring (pinned for the SQL oracle): one BM25 sum over

- every MUST + SHOULD term (qtf = its count across clauses), plus
- every MUST + SHOULD phrase as a VIRTUAL TERM (tf = overlapping
  occurrence count, df = docs containing the phrase — the
  ``positions.phrase_topk`` contract) with qtf = 1.

A doc qualifies iff every MUST term and MUST phrase is present, no
MUST_NOT term/phrase is present, and score > 0. Ties (score desc, doc_id
asc).

Scale shape: parsing + multi-term expansion are driver-side (lexicon
pushdown reads); phrase global dfs come from one positions pass whose
per-segment output is phrase-count-sized (pass A); ranking is the standard
segment fan-out (pass B) — each segment loads only the clause terms'
postings + the phrase terms' positional entries, applies masks and the
combined kernel, and emits top-k rows per query. Nothing doc-sized leaves
a segment; the driver merge is k-sized.
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from splade_ray.analysis import term_counts, tokenize
from splade_ray.bm25 import BM25Params, idf, tf_component, topk_from_scores

_CLAUSE = re.compile(
    r'(?P<prefix>[+-]?)'
    r'(?:"(?P<phrase>[^"]*)"|(?P<word>[^\s"]+))'
)


@dataclass
class QuerySpec:
    """Parsed query string: analyzed term clauses + phrase clauses."""

    must: Counter = field(default_factory=Counter)        # term -> qtf
    should: Counter = field(default_factory=Counter)      # term -> qtf
    must_not: set = field(default_factory=set)
    must_phrases: list = field(default_factory=list)      # list[tuple[str,...]]
    should_phrases: list = field(default_factory=list)
    not_phrases: list = field(default_factory=list)
    expand: list = field(default_factory=list)  # ("fuzzy",word,dist) | ("prefix",word) | ("regexp",pat)


def parse_query_string(qs: str, query_lang: str | None = None) -> QuerySpec:
    """Parse one query string into a :class:`QuerySpec` (expansions are
    recorded, not resolved — :func:`resolve_expansions` needs the lexicon)."""
    spec = QuerySpec()
    for m in _CLAUSE.finditer(qs):
        prefix, phrase, word = m.group("prefix"), m.group("phrase"), m.group("word")
        if phrase is not None:
            toks = tuple(tokenize(phrase, query_lang))
            if not toks:
                continue
            {"+": spec.must_phrases, "-": spec.not_phrases,
             "": spec.should_phrases}[prefix].append(toks)
            continue
        rx = re.fullmatch(r"/(.+)/", word)
        if rx and prefix != "-":
            spec.expand.append(("regexp", rx.group(1)))
            continue
        fz = re.fullmatch(r"(.+?)~([0-2])?", word)
        if fz and prefix != "-":
            base = next(iter(tokenize(fz.group(1), query_lang)), None)
            if base:
                spec.expand.append(("fuzzy", base, int(fz.group(2) or 2)))
            continue
        if word.endswith("*") and len(word) > 1 and prefix != "-":
            base = next(iter(tokenize(word[:-1], query_lang)), None)
            if base:
                spec.expand.append(("prefix", base))
            continue
        counts = term_counts(word, query_lang)
        if not counts:
            continue
        if prefix == "+":
            spec.must.update(counts)
        elif prefix == "-":
            spec.must_not.update(counts)
        else:
            spec.should.update(counts)
    return spec


def resolve_expansions(
    spec: QuerySpec,
    index_dir: str,
    *,
    max_expansions: int = 64,
) -> None:
    """Resolve fuzzy / prefix clauses against the lexicon IN PLACE: each
    expanded term joins SHOULD with qtf=1 (Lucene multi-term rewrite,
    pinned to plain-BM25 scoring like wildcard_search). Fuzzy candidates
    rank (distance asc, df desc, term asc); prefix expansion is ascending
    term order — both capped at ``max_expansions``."""
    from splade_ray.suggest import expand_prefix, expand_regexp, suggest_terms

    for e in spec.expand:
        if e[0] == "prefix":
            terms = expand_prefix(index_dir, e[1], max_terms=max_expansions)
        elif e[0] == "regexp":
            terms = expand_regexp(index_dir, e[1], max_terms=max_expansions)
        else:
            got = suggest_terms(index_dir, [(0, e[1])], max_dist=e[2],
                                m=max_expansions)
            terms = got["term"].tolist()
        for t in terms:
            if t not in spec.should and t not in spec.must:
                spec.should[t] = 1
    spec.expand = []


def _all_phrases(specs: dict[int, QuerySpec]) -> list[tuple[str, ...]]:
    seen: dict[tuple[str, ...], None] = {}
    for s in specs.values():
        for ph in (*s.must_phrases, *s.should_phrases, *s.not_phrases):
            seen.setdefault(ph, None)
    return list(seen)


def query_string_search(
    index_dir: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    query_lang: str | None = None,
    max_expansions: int = 64,
    concurrency=None,
) -> pd.DataFrame:
    """Execute query strings (syntax above) as one ranking. Returns the run
    table (query_id, rank, doc_id, score) sorted by (query_id, rank).

    Pass A (only when phrases are present) collects per-segment phrase
    document frequencies (phrase-count-sized rows) to fix the virtual
    terms' global idf; pass B runs the combined mask+score kernel per
    segment with every global weight known, cutting top-k in-segment."""
    import os

    import pyarrow.dataset as pads

    from splade_ray.build import load_manifest, segment_dirs
    from splade_ray.delete import load_tombstones
    from splade_ray.positions import SegmentPositions, load_positions_manifest
    from splade_ray.query import SegmentIndex

    params = params or BM25Params()
    manifest = load_manifest(index_dir)
    if query_lang is None:
        query_lang = manifest.get("analyzer")
    n_docs, avgdl = manifest["n_docs"], manifest["avgdl"]

    specs = {int(qid): parse_query_string(qs, query_lang) for qid, qs in queries}
    for s in specs.values():
        if s.expand:
            resolve_expansions(s, index_dir, max_expansions=max_expansions)
    phrases = _all_phrases(specs)
    phrase_ord = {ph: i for i, ph in enumerate(phrases)}
    if phrases:
        load_positions_manifest(index_dir)  # raises if layer missing

    # global term stats (lexicon pushdown, the prepare_queries pattern)
    score_terms = sorted(
        {t for s in specs.values() for t in (*s.must, *s.should)}
    )
    mask_terms = sorted({t for s in specs.values() for t in s.must_not})
    dfs: dict[str, int] = {}
    if score_terms:
        lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
            columns=["term", "df"], filter=pads.field("term").isin(score_terms)
        )
        dfs = dict(zip(lex["term"].to_pylist(), lex["df"].to_pylist()))

    segs = segment_dirs(index_dir)
    tomb = load_tombstones(index_dir)
    tomb_ref = ray.put(tomb) if tomb.size else None
    phrase_terms = sorted({t for ph in phrases for t in ph})

    # ---- pass A: global phrase dfs (phrase-count-sized per segment)
    phrase_idf: dict[int, float] = {}
    if phrases:
        phrases_ref = ray.put(phrases)

        def phrase_df_task(batch: pa.Table) -> pa.Table:
            from splade_ray.delete import deleted_mask_for

            phs = ray.get(phrases_ref)
            t = ray.get(tomb_ref) if tomb_ref is not None else None
            out_ord, out_df = [], []
            for seg_dir in batch["seg_dir"].to_pylist():
                sp = SegmentPositions(seg_dir, phrase_terms)
                for i, ph in enumerate(phs):
                    docs, _ = sp.phrase_counts(list(ph))
                    if t is not None and docs.size:
                        docs = docs[~deleted_mask_for(docs, t)]
                    if docs.size:
                        out_ord.append(i)
                        out_df.append(int(docs.size))
            return pa.table({"ord": pa.array(out_ord, pa.int64()),
                             "df": pa.array(out_df, pa.int64())})

        parts = (
            rd.from_items([{"seg_dir": s} for s in segs],
                          override_num_blocks=len(segs))
            .map_batches(phrase_df_task, batch_format="pyarrow", batch_size=1,
                         concurrency=concurrency)
            .to_pandas()
        )
        pdf_sum = parts.groupby("ord")["df"].sum() if not parts.empty else {}
        for i in range(len(phrases)):
            df_i = int(pdf_sum.get(i, 0)) if len(parts) else 0
            if df_i:
                phrase_idf[i] = idf(df_i, n_docs)

    # broadcast the fully-weighted prepared dict
    prepared = {
        "avgdl": avgdl,
        "params": params,
        "queries": {
            qid: {
                "score": [
                    (t, int(qtf), idf(dfs[t], n_docs))
                    for t, qtf in sorted((s.must + s.should).items())
                    if t in dfs
                ],
                "must": sorted(s.must),
                "must_not": sorted(s.must_not),
                "must_ph": sorted(phrase_ord[p] for p in s.must_phrases),
                "not_ph": sorted(phrase_ord[p] for p in s.not_phrases),
                "score_ph": sorted(
                    {phrase_ord[p] for p in (*s.must_phrases, *s.should_phrases)
                     if phrase_ord[p] in phrase_idf}
                ),
            }
            for qid, s in specs.items()
        },
        "terms": sorted(set(score_terms) | set(mask_terms)),
        "phrases": phrases,
        "phrase_idf": phrase_idf,
        "phrase_terms": phrase_terms,
    }
    prepared_ref = ray.put(prepared)

    def rank_task(batch: pa.Table) -> pa.Table:
        prep = ray.get(prepared_ref)
        t = ray.get(tomb_ref) if tomb_ref is not None else None
        p: BM25Params = prep["params"]
        out_q, out_d, out_s = [], [], []
        for seg_dir in batch["seg_dir"].to_pylist():
            seg = SegmentIndex(seg_dir, prep["terms"], tombstones=t)
            n = seg.doc_ids.size
            ph_pos: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            if prep["phrases"]:
                sp = SegmentPositions(seg_dir, prep["phrase_terms"])
                for i, ph in enumerate(prep["phrases"]):
                    docs, cnts = sp.phrase_counts(list(ph))
                    pos = np.searchsorted(seg.doc_ids, docs)
                    if seg.deleted is not None and pos.size:
                        keep = ~seg.deleted[pos]
                        pos, cnts = pos[keep], cnts[keep]
                    ph_pos[i] = (pos, cnts)
            for qid, q in prep["queries"].items():
                allowed = np.ones(n, bool)
                for term in q["must"]:
                    pos, _ = seg.pos_tfs(term)
                    m = np.zeros(n, bool)
                    m[pos] = True
                    allowed &= m
                for i in q["must_ph"]:
                    m = np.zeros(n, bool)
                    m[ph_pos[i][0]] = True
                    allowed &= m
                if not allowed.any():
                    continue
                for term in q["must_not"]:
                    pos, _ = seg.pos_tfs(term)
                    allowed[pos] = False
                for i in q["not_ph"]:
                    allowed[ph_pos[i][0]] = False
                if not allowed.any():
                    continue
                scores = np.zeros(n, np.float64)
                for term, qtf, w in q["score"]:
                    pos, tfs = seg.pos_tfs(term)
                    if pos.size:
                        scores[pos] += (w * qtf) * tf_component(
                            tfs, seg.doc_lens[pos], prep["avgdl"], p
                        )
                for i in q["score_ph"]:
                    pos, cnts = ph_pos[i]
                    if pos.size:
                        scores[pos] += prep["phrase_idf"][i] * tf_component(
                            cnts, seg.doc_lens[pos], prep["avgdl"], p
                        )
                scores[~allowed] = 0.0
                docs, scs = topk_from_scores(
                    seg.doc_ids, scores, p.top_k, p.threshold
                )
                out_q.extend([qid] * len(docs))
                out_d.extend(int(d) for d in docs)
                out_s.extend(float(s) for s in scs)
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "doc_id": pa.array(out_d, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    from splade_ray.query import merge_topk

    cand = (
        rd.from_items([{"seg_dir": s} for s in segs],
                      override_num_blocks=len(segs))
        .map_batches(rank_task, batch_format="pyarrow", batch_size=1,
                     concurrency=concurrency)
    )
    run = cand.groupby("query_id").map_groups(
        merge_topk, batch_format="pandas", fn_kwargs={"top_k": params.top_k}
    )
    pdf = run.to_pandas()
    cols = ["query_id", "rank", "doc_id", "score"]
    if pdf.empty:
        return pd.DataFrame(columns=cols).astype(
            {"query_id": np.int64, "rank": np.int32,
             "doc_id": np.int64, "score": np.float64}
        )
    return pdf.sort_values(["query_id", "rank"]).reset_index(drop=True)[cols]
