"""CLI entry points — the ``ray job submit`` surface.

Mirrors the reference's module entry points (``python -m splade.index``,
``splade.retrieve``, ``splade.evaluate``, ``splade.flops``, ``splade.all`` —
SURVEY.md §2.11) as subcommands of ``python -m splade_ray``:

    python -m splade_ray build   --corpus DIR --index DIR [--rows-per-segment N]
    python -m splade_ray query   --index DIR --queries TSV --out run.json [--method bmw]
    python -m splade_ray evaluate --run run.json --qrel qrel.json [--k 10]
    python -m splade_ray stats   --index DIR
    python -m splade_ray all     --corpus DIR --index DIR --queries TSV --qrel qrel.json --out DIR

Like the reference's hydra pipeline, stages share the filesystem as their
contract (checkpoint_dir → index_dir → out_dir, ``splade/all.py:14-21``);
the index dir's manifests make every stage resumable. The CLI owns its Ray
session (guarded init — the driver/test harness may already own one).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")


def cmd_build(args) -> int:
    _ensure_ray()
    from splade_ray.build import build_index

    manifest = build_index(
        args.corpus,
        args.index,
        text_col=args.text_col,
        id_col=args.id_col,
        rows_per_segment=args.rows_per_segment,
        block_size=args.block_size,
        lang_col=getattr(args, "lang_col", None),
        analyzer=getattr(args, "analyzer", None),
        extra_doc_cols=tuple(
            c for c in (getattr(args, "extra_doc_cols", None) or "").split(",") if c
        ),
    )
    print(json.dumps({k: manifest[k] for k in (
        "n_docs", "n_postings", "n_segments", "n_segments_skipped", "build_secs", "docs_per_sec"
    )}))
    return 0


def cmd_append(args) -> int:
    _ensure_ray()
    from splade_ray.build import append_index

    manifest = append_index(
        args.index,
        args.corpus,
        rows_per_segment=args.rows_per_segment,
    )
    print(json.dumps({k: manifest[k] for k in (
        "n_docs", "n_postings", "n_segments", "n_segments_skipped", "build_secs"
    )}))
    return 0


def _load_queries(path: str) -> list[tuple[int, str]]:
    out = []
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            qid, *rest = line.rstrip("\n").split("\t")
            out.append((int(qid), " ".join(rest)))
    return out


def cmd_query(args) -> int:
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.io import write_run_json
    from splade_ray.query import search

    queries = _load_queries(args.queries)
    run = search(
        args.index,
        queries,
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k, threshold=args.threshold),
        method=args.method,
        scoring=args.scoring,
        mu=args.mu,
        lam=getattr(args, "lam", 0.1),
        dfr_c=getattr(args, "dfr_c", 1.0),
    )
    if args.out.endswith(".json"):
        write_run_json(run, args.out)
    else:
        run.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(run), "out": args.out}))
    return 0


def cmd_qsearch(args) -> int:
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.io import write_run_json
    from splade_ray.qparser import query_string_search

    queries = _load_queries(args.queries)
    run = query_string_search(
        args.index,
        queries,
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k, threshold=args.threshold),
        max_expansions=args.max_expansions,
    )
    if args.out.endswith(".json"):
        write_run_json(run, args.out)
    else:
        run.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(run), "out": args.out}))
    return 0


def cmd_rescore(args) -> int:
    """Two-pass retrieval: BM25 window + match_phrase rescore."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.io import write_run_json
    from splade_ray.rescore import rescore_phrase

    queries = _load_queries(args.queries)
    phrases = dict(_load_queries(args.phrases)) if args.phrases else None
    run = rescore_phrase(
        args.index, queries,
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
        phrases=phrases, window_size=args.window_size,
        score_mode=args.score_mode, query_weight=args.query_weight,
        rescore_query_weight=args.rescore_query_weight,
    )
    if args.out.endswith(".json"):
        write_run_json(run, args.out)
    else:
        run.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(run), "out": args.out}))
    return 0


def cmd_ctsearch(args) -> int:
    """CommonTermsQuery retrieval (df-cutoff low/high term split)."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.boolq import common_terms_search
    from splade_ray.io import write_run_json

    queries = _load_queries(args.queries)
    run = common_terms_search(
        args.index, queries,
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
        cutoff_frequency=args.cutoff,
    )
    if args.out.endswith(".json"):
        write_run_json(run, args.out)
    else:
        run.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(run), "out": args.out}))
    return 0


def cmd_fsearch(args) -> int:
    """Fielded BM25: --index-field NAME=DIR --weight NAME=W (repeatable)."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.io import write_run_json
    from splade_ray.query import search_fielded

    def kv(pairs, cast):
        out = {}
        for p in pairs:
            k, _, v = p.partition("=")
            if not _ or not k:
                raise SystemExit(f"expected NAME=VALUE, got {p!r}")
            out[k] = cast(v)
        return out

    queries = _load_queries(args.queries)
    run = search_fielded(
        kv(args.index_field, str),
        queries,
        kv(args.weight, float),
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k, threshold=args.threshold),
        mode=args.mode,
        tie_breaker=getattr(args, "tie_breaker", 0.0),
        field_b=kv(args.field_b, float) if args.field_b else None,
        analyzers=kv(args.analyzer, str) if args.analyzer else None,
        query_analyzer=args.query_analyzer,
    )
    if args.out.endswith(".json"):
        write_run_json(run, args.out)
    else:
        run.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(run), "out": args.out}))
    return 0


def cmd_snippets(args) -> int:
    """Keyword-in-context snippets for a run file against its corpus."""
    from splade_ray.io import read_run_json
    from splade_ray.snippets import snippets_for_run

    run = (
        read_run_json(args.run)
        if args.run.endswith(".json")
        else __import__("pandas").read_parquet(args.run)
    )
    queries = _load_queries(args.queries)
    out = snippets_for_run(
        args.corpus, run, queries,
        window=args.window, id_col=args.id_col, text_col=args.text_col,
        mode=args.mode,
    )
    out.to_parquet(args.out, index=False)
    print(json.dumps({"rows": len(out), "out": args.out}))
    return 0


def cmd_evaluate(args) -> int:
    from splade_ray.evaluate import evaluate_run
    from splade_ray.io import qrel_to_table, read_run_json

    run = read_run_json(args.run)
    with open(args.qrel) as fh:
        qrel = qrel_to_table(json.load(fh))
    spec = getattr(args, "measures", None)  # cmd_all reuses this without the flag
    measures = (
        [m.strip() for m in spec.split(",") if m.strip()]
        if spec
        else [f"mrr@{args.k}", f"recall@{args.k}", f"ndcg@{args.k}"]
    )
    res = evaluate_run(run, qrel, measures)
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res, fh)
    return 0


def cmd_stats(args) -> int:
    """Index statistics — the index_dist.json / index_stats.json analog
    (inverted_index.py:90-94, transformer_evaluator.py:63-65)."""
    import pyarrow.dataset as pads

    from splade_ray.build import load_manifest

    m = load_manifest(args.index)
    lex = pads.dataset(f"{args.index}/lexicon").to_table()
    stats = {
        "n_docs": m["n_docs"],
        "n_postings": m["n_postings"],
        "avgdl": m["avgdl"],
        "n_terms": lex.num_rows,
        "mean_doc_l0": m["n_postings"] / max(m["n_docs"], 1),
        "n_segments": m["n_segments"],
    }
    print(json.dumps(stats))
    return 0


def cmd_figure(args) -> int:
    """Index-distribution figure (reference: utils/index_figure.py:13-31)."""
    from splade_ray.figure import index_figure

    print(json.dumps(index_figure(args.index, args.out)))
    return 0


def cmd_verify(args) -> int:
    """Re-check the per-row content sha256 invariant (north rule)."""
    _ensure_ray()
    from splade_ray.ingest import verify_sha_invariant

    report = verify_sha_invariant(args.index, args.corpus)
    print(json.dumps(report))
    return 0


def cmd_compact(args) -> int:
    """Tiered segment merge (see splade_ray.compact)."""
    _ensure_ray()
    from splade_ray.compact import compact_segments

    m = compact_segments(args.index, group_size=args.group_size)
    print(json.dumps({"n_segments": m["n_segments"], "compactions": m.get("compactions", 0)}))
    return 0


def cmd_quantize(args) -> int:
    """Derive the quantized posting layer for integer in-index scoring."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.quantized import build_quantized_postings

    rep = build_quantized_postings(
        args.index, BM25Params(k1=args.k1, b=args.b), factor=args.factor
    )
    print(json.dumps(rep))
    return 0


def cmd_positions(args) -> int:
    """Derive the positional layer (phrase-query support)."""
    _ensure_ray()
    from splade_ray.positions import build_positions

    rep = build_positions(args.index)
    print(json.dumps(rep))
    return 0


def cmd_phrase(args) -> int:
    """Phrase matching over the positional layer."""
    _ensure_ray()
    from splade_ray.positions import phrase_search

    phrases = _load_queries(args.phrases)
    if getattr(args, "slop", None) is not None:
        from splade_ray.positions import near_search

        res = near_search(args.index, phrases, slop=args.slop)
    else:
        res = phrase_search(args.index, phrases)
    res.to_parquet(args.out, index=False)
    print(json.dumps({"phrases": len(phrases), "rows": len(res), "out": args.out}))
    return 0


def cmd_spannot(args) -> int:
    """SpanNotQuery over the positional layer."""
    _ensure_ray()
    from splade_ray.positions import span_not_search

    queries = []
    with open(args.queries) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            qid, inc, exc = line.split("\t")
            queries.append((int(qid), {"include": inc, "exclude": exc}))
    res = span_not_search(args.index, queries, pre=args.pre, post=args.post)
    res.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(res), "out": args.out}))
    return 0


def cmd_mlt(args) -> int:
    """More-like-this: seed doc ids -> top-k similar docs."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.io import write_run_json
    from splade_ray.mlt import more_like_this

    seeds = [int(x) for x in args.seeds.split(",") if x.strip()]
    run = more_like_this(
        args.index, args.corpus, seeds, m_terms=args.m_terms,
        params=BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
        text_col=args.text_col, id_col=args.id_col,
    )
    if args.out.endswith(".json"):
        write_run_json(run, args.out)
    else:
        run.to_parquet(args.out, index=False)
    print(json.dumps({"seeds": len(seeds), "rows": len(run), "out": args.out}))
    return 0


def cmd_collapse(args) -> int:
    """Field-collapsed retrieval: top-k with at most one doc per key."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.collapse import collapse_search

    queries = _load_queries(args.queries)
    out = collapse_search(
        args.index, queries,
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
        collapse_col=args.collapse_col,
    )
    out.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(out), "out": args.out}))
    return 0


def cmd_suggest(args) -> int:
    """Did-you-mean term suggestions / prefix / fuzzy retrieval."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.suggest import fuzzy_search, prefix_search, suggest_terms

    queries = _load_queries(args.queries)
    if args.mode == "terms":
        out = suggest_terms(args.index, queries, max_dist=args.max_dist, m=args.m,
                            transpositions=args.transpositions)
    elif args.mode == "prefix":
        out = prefix_search(
            args.index, queries, BM25Params(top_k=args.top_k), max_terms=args.max_terms
        )
    elif args.mode == "wildcard":
        from splade_ray.suggest import wildcard_search

        out = wildcard_search(
            args.index, queries, BM25Params(top_k=args.top_k), max_terms=args.max_terms
        )
    else:  # fuzzy
        out = fuzzy_search(
            args.index, queries, BM25Params(top_k=args.top_k),
            max_dist=args.max_dist, max_terms=args.max_terms,
            transpositions=args.transpositions,
        )
    out.to_parquet(args.out, index=False)
    print(json.dumps({"mode": args.mode, "queries": len(queries),
                      "rows": len(out), "out": args.out}))
    return 0


def cmd_rm3(args) -> int:
    """RM3 pseudo-relevance feedback: two-pass expanded retrieval."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.io import write_run_json
    from splade_ray.rm3 import rm3_search

    queries = _load_queries(args.queries)
    run = rm3_search(
        args.index, args.corpus, queries,
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
        fb_docs=args.fb_docs, fb_terms=args.fb_terms, exp_qtf=args.exp_qtf,
        text_col=args.text_col, id_col=args.id_col,
    )
    if args.out.endswith(".json"):
        write_run_json(run, args.out)
    else:
        run.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(run), "out": args.out}))
    return 0


def cmd_bpe(args) -> int:
    """Learn a BPE subword vocabulary from the corpus (fit) or compute
    per-doc subword budgets under a learned one (apply)."""
    _ensure_ray()
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.bpe import bpe_apply, bpe_train, bpe_word_counts

    docs = read_parquet_clean(args.corpus)
    if args.mode == "fit":
        wc = bpe_word_counts(docs, text_col=args.text_col,
                             min_count=args.min_count)
        merges = bpe_train(wc, args.merges)
        with open(args.out, "w") as fh:
            json.dump({"merges": [list(p) for p in merges],
                       "n_words": len(wc)}, fh)
        print(json.dumps({"mode": "fit", "n_words": len(wc),
                          "n_merges": len(merges), "out": args.out}))
    else:
        with open(args.model) as fh:
            merges = [tuple(p) for p in json.load(fh)["merges"]]
        out = bpe_apply(docs, merges, text_col=args.text_col,
                        id_col=args.id_col)
        out.write_parquet(args.out)
        print(json.dumps({"mode": "apply", "n_merges": len(merges),
                          "out": args.out}))
    return 0


def cmd_msearch(args) -> int:
    """Federated search over several indices under combined (MultiReader)
    statistics."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.multi import search_multi

    queries = _load_queries(args.queries)
    run = search_multi(
        args.index, queries,
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
        method=args.method, scoring=args.scoring,
    )
    run.to_parquet(args.out, index=False)
    print(json.dumps({"indices": len(args.index), "queries": len(queries),
                      "rows": len(run), "out": args.out}))
    return 0


def cmd_sigterms(args) -> int:
    """Significant-terms aggregation: JLH-scored foreground-vs-background
    term contrast over the top-k hits (ES significant_text shape)."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.sigterms import significant_terms

    queries = _load_queries(args.queries)
    out = significant_terms(
        args.index, args.corpus, queries,
        BM25Params(k1=args.k1, b=args.b),
        fg_k=args.fg_k, top_m=args.top_m,
        text_col=args.text_col, id_col=args.id_col,
    )
    out.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(out),
                      "out": args.out}))
    return 0


def cmd_facets(args) -> int:
    """Per-query facet counts over a doclens-carried doc column."""
    _ensure_ray()
    from splade_ray.facets import facet_counts

    queries = _load_queries(args.queries)
    out = facet_counts(args.index, queries, facet_col=args.facet_col)
    out.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(out), "out": args.out}))
    return 0


def cmd_facet_stats(args) -> int:
    """ES sub-aggregation: terms bucket over a facet column with a nested
    stats metric over a numeric doc-values column, one pass."""
    _ensure_ray()
    from splade_ray.facets import facet_stats_agg

    queries = _load_queries(args.queries)
    out = facet_stats_agg(args.index, queries, facet_col=args.facet_col,
                          metric_col=args.metric_col, top=args.top)
    out.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(out),
                      "out": args.out}))
    return 0


def cmd_fragments(args) -> int:
    """Multi-fragment highlighting: top-N fixed tiles per hit of a run
    (ES highlight number_of_fragments)."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.query import search
    from splade_ray.snippets import fragments_for_run

    queries = _load_queries(args.queries)
    run = search(args.index, queries,
                 BM25Params(k1=args.k1, b=args.b, top_k=args.top_k))
    out = fragments_for_run(args.corpus, run, queries, window=args.window,
                            n_fragments=args.n_fragments,
                            text_col=args.text_col, id_col=args.id_col)
    out.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(out),
                      "out": args.out}))
    return 0


def cmd_unit_dedup(args) -> int:
    """Sub-document sentence-unit dedup over a parquet corpus (the Dolma
    paragraph-dedup / C4 sentence-dedup shape)."""
    _ensure_ray()
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.curation import unit_dedup

    ds = read_parquet_clean(args.corpus, columns=[args.id_col, args.text_col])
    out = unit_dedup(ds, min_count=args.min_count, text_col=args.text_col,
                     id_col=args.id_col)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_url_dedup(args) -> int:
    """URL-keyed dedup: canonical dedup key per URL, lowest id survives."""
    _ensure_ray()
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.urlnorm import url_dedup

    ds = read_parquet_clean(args.corpus, columns=[args.id_col, args.url_col])
    out = url_dedup(ds, url_col=args.url_col, id_col=args.id_col)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_sort_index(args) -> int:
    """Build the derived per-segment sort-order layer (Lucene index-time
    sort analog); matching sort queries early-terminate. ``--col`` builds
    a single-key numeric layer; repeated ``--key col[:asc|:desc]`` builds
    one multi-key layer (string columns allowed; default desc)."""
    _ensure_ray()
    from splade_ray.docvalues import build_sort_index

    if bool(args.col) == bool(args.key):
        print("pass exactly one of --col / --key", file=sys.stderr)
        return 2
    if args.col:
        r = build_sort_index(args.index, args.col,
                             descending=not args.ascending)
        print(json.dumps({"index": args.index, "col": args.col, **r}))
        return 0
    keys = []
    for spec in args.key:
        col, _, direction = spec.partition(":")
        if direction not in ("", "asc", "desc"):
            print(f"bad --key direction {spec!r}", file=sys.stderr)
            return 2
        keys.append((col, direction != "asc"))
    r = build_sort_index(args.index, keys=keys)
    print(json.dumps({"index": args.index,
                      "keys": [[c, d] for c, d in keys], **r}))
    return 0


def _corpus_tag(path: str) -> str:
    """Deterministic 12-hex tag for a corpus path — shared by lsh-build and
    the curate lshdedup stage so an index pre-built from a corpus is
    recognizable when that same corpus later arrives as an increment
    (probing it against itself would drop ~every doc)."""
    import hashlib
    import os

    return hashlib.sha1(os.path.abspath(path).encode()).hexdigest()[:12]


def cmd_lsh_build(args) -> int:
    """Persist a MinHash-LSH index (signatures + banded bucket rows) for
    incremental near-dup probing."""
    _ensure_ray()
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.dedup import minhash_index_build

    ds = read_parquet_clean(args.corpus, columns=[args.id_col, args.text_col])
    params = minhash_index_build(
        ds, args.index, num_perm=args.num_perm, bands=args.bands,
        shingle_k=args.shingle_k, text_col=args.text_col, id_col=args.id_col,
        source_tag=_corpus_tag(args.corpus))
    print(json.dumps({"index": args.index, **params}))
    return 0


def cmd_lsh_probe(args) -> int:
    """Probe a persisted LSH index with an increment; writes candidate
    (new_doc, old_doc, n_match) pairs."""
    _ensure_ray()
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.dedup import minhash_index_probe

    ds = read_parquet_clean(args.corpus, columns=[args.id_col, args.text_col])
    out = minhash_index_probe(
        ds, args.index, min_est_jaccard=args.min_jaccard,
        text_col=args.text_col, id_col=args.id_col)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_lsh_append(args) -> int:
    """Append an increment to a persisted LSH index under a crash-
    idempotent tag (clean-own-tag-first)."""
    _ensure_ray()
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.dedup import minhash_index_append

    ds = read_parquet_clean(args.corpus, columns=[args.id_col, args.text_col])
    r = minhash_index_append(ds, args.index, tag=args.tag,
                             text_col=args.text_col, id_col=args.id_col)
    print(json.dumps({"index": args.index, "tag": args.tag, **r}))
    return 0


def cmd_lsh_compact(args) -> int:
    """Compact a persisted LSH index's increment files (one file per
    partition; generation-dir swap, crash-safe)."""
    from splade_ray.ops.dedup import minhash_index_compact

    r = minhash_index_compact(args.index)
    print(json.dumps({"index": args.index, **r}))
    return 0


def cmd_semdedup(args) -> int:
    """SemDeDup: embedding-space semantic dedup (cluster + within-cluster
    cosine duplicate groups, keeper least similar to the centroid)."""
    _ensure_ray()
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.semdedup import semdedup

    ds = read_parquet_clean(args.embeddings,
                            columns=[args.id_col, args.emb_col])
    out = semdedup(ds, n_clusters=args.n_clusters, threshold=args.threshold,
                   id_col=args.id_col, emb_col=args.emb_col)
    out.write_parquet(args.out)
    print(json.dumps({"out": args.out}))
    return 0


def cmd_dv(args) -> int:
    """Doc-values queries: range-filtered BM25, sort-by-field, total-hit
    counts, numeric histogram aggregation."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.docvalues import (
        match_counts,
        numeric_histogram,
        range_search,
        sort_search,
    )

    def bound(x):
        # numeric-looking bounds filter a numeric column, anything else is a
        # lexicographic string bound (TermRangeQuery)
        if x is None:
            return None
        try:
            return float(x)
        except ValueError:
            return x

    queries = _load_queries(args.queries)
    if args.mode == "range":
        out = range_search(
            args.index, queries, BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
            numeric_col=args.col, lo=bound(args.lo), hi=bound(args.hi),
        )
    elif args.mode == "sort":
        if args.sort_keys:
            keys = []
            for part in args.sort_keys.split(","):
                col, _, direction = part.partition(":")
                keys.append((col, direction.lower() != "asc"))
            out = sort_search(
                args.index, queries, sort_keys=keys, top_k=args.top_k,
            )
        else:
            out = sort_search(
                args.index, queries, sort_col=args.col,
                descending=not args.ascending, top_k=args.top_k,
            )
    elif args.mode == "count":
        out = match_counts(args.index, queries)
    elif args.mode == "stats":
        from splade_ray.docvalues import numeric_stats

        out = numeric_stats(args.index, queries, numeric_col=args.col)
    else:  # hist
        out = numeric_histogram(
            args.index, queries, numeric_col=args.col, interval=args.interval
        )
    out.to_parquet(args.out, index=False)
    print(json.dumps({"mode": args.mode, "queries": len(queries),
                      "rows": len(out), "out": args.out}))
    return 0


def cmd_synsearch(args) -> int:
    """BM25 retrieval with query-time synonym groups (SynonymQuery)."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.synonyms import synonym_search

    with open(args.synonyms) as f:
        syn = json.load(f)
    queries = _load_queries(args.queries)
    out = synonym_search(
        args.index, queries, syn,
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
    )
    out.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "groups": len(syn),
                      "rows": len(out), "out": args.out}))
    return 0


def cmd_explain(args) -> int:
    """Per-term score breakdown for (query, doc) pairs."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.query import explain

    queries = _load_queries(args.queries)
    ids = [int(x) for x in args.doc_ids.split(",") if x.strip()]
    out = explain(
        args.index, queries, ids,
        BM25Params(k1=args.k1, b=args.b),
        scoring=args.scoring, mu=args.mu, lam=getattr(args, "lam", 0.1),
        dfr_c=getattr(args, "dfr_c", 1.0),
    )
    out.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "docs": len(ids),
                      "rows": len(out), "out": args.out}))
    return 0


def cmd_percolate(args) -> int:
    """Reverse search: match a doc stream against stored queries."""
    _ensure_ray()
    from splade_ray.io import read_parquet_clean
    from splade_ray.percolate import percolate_df

    queries = _load_queries(args.queries)
    docs = read_parquet_clean(args.corpus, columns=[args.id_col, args.text_col])
    out = percolate_df(
        docs, queries, mode=args.match, text_col=args.text_col, id_col=args.id_col
    )
    out.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "matches": len(out),
                      "out": args.out}))
    return 0


def cmd_delete(args) -> int:
    """Tombstone docs by id list OR by query (logical delete; all query
    paths filter instantly)."""
    from splade_ray.delete import delete_by_query, delete_docs

    if bool(args.doc_ids) == bool(args.query):
        raise SystemExit("pass exactly one of --doc-ids / --query")
    if args.query:
        _ensure_ray()
        rep = delete_by_query(args.index, args.query, mode=args.match_mode)
    else:
        ids = [int(x) for x in args.doc_ids.split(",") if x.strip()]
        rep = delete_docs(args.index, ids)
    print(json.dumps(rep))
    return 0


def cmd_purge(args) -> int:
    """Physically remove tombstoned docs (segment rewrite + restat)."""
    _ensure_ray()
    from splade_ray.delete import purge_deletes

    rep = purge_deletes(args.index)
    print(json.dumps({k: rep[k] for k in
                      ("n_docs", "n_postings", "avgdl", "n_purged_docs")}))
    return 0


def cmd_trigrams(args) -> int:
    """Derive the trigram layer (exact substring search support)."""
    _ensure_ray()
    from splade_ray.trigram import build_trigrams

    rep = build_trigrams(args.index, max_df_frac=args.max_df_frac)
    print(json.dumps(rep))
    return 0


def cmd_grep(args) -> int:
    """Exact substring search: trigram-pruned (--index) or full scan
    (--corpus, also the regex path)."""
    _ensure_ray()
    from splade_ray.trigram import grep_scan, regex_search, substring_search

    needles = _load_queries(args.needles)
    ci = not args.case_sensitive
    if args.index:
        kw = {"snippets": args.snippets, "width": args.width,
              "case_insensitive": ci}
        if args.regex:
            # required-literal trigram pruning + RE2 verification
            res = regex_search(args.index, needles, **kw)
        else:
            res = substring_search(args.index, needles, **kw)
    else:
        from splade_ray.io import read_parquet_clean

        ds = read_parquet_clean(args.corpus, columns=[args.id_col, args.text_col])
        res = (
            grep_scan(ds, needles, id_col=args.id_col, text_col=args.text_col,
                      regex=args.regex, case_insensitive=ci)
            .to_pandas()
            .sort_values(["query_id", args.id_col])
            .reset_index(drop=True)
        )
    res.to_parquet(args.out, index=False)
    print(json.dumps({"needles": len(needles), "rows": len(res), "out": args.out}))
    return 0


def cmd_boolsearch(args) -> int:
    """Boolean-filtered BM25: queries file is JSON
    [[qid, {"must": ..., "should": ..., "must_not": ...}], ...]."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.boolq import boolean_search
    from splade_ray.io import write_run_json

    with open(args.queries) as fh:
        queries = [(int(q), spec) for q, spec in json.load(fh)]
    run = boolean_search(
        args.index, queries, BM25Params(k1=args.k1, b=args.b, top_k=args.top_k)
    )
    if args.out.endswith(".json"):
        write_run_json(run, args.out)
    else:
        run.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(run), "out": args.out}))
    return 0


def cmd_sample(args) -> int:
    """Deterministic sampling / split assignment over a parquet corpus."""
    _ensure_ray()
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.sample import bottomk_sample, hash_sample, split_assign

    ds = read_parquet_clean(args.corpus)
    if args.mode == "hash":
        out = hash_sample(ds, args.rate, id_col=args.id_col, seed=args.seed)
        out.write_parquet(args.out)
        n = out.count()
    elif args.mode == "mix":
        from splade_ray.ops.sample import temperature_sample

        out, targets = temperature_sample(
            ds, group_col=args.group_col, id_col=args.id_col,
            alpha=args.alpha, target=args.k, seed=args.seed,
        )
        out.write_parquet(args.out)
        n = sum(targets.values())
    elif args.mode == "split":
        fractions = {}
        for part in args.fractions.split(","):
            name, frac = part.split("=")
            fractions[name] = float(frac)
        out = split_assign(ds, fractions, id_col=args.id_col, seed=args.seed)
        out.write_parquet(args.out)
        n = out.count()
    elif args.mode == "shards":
        from splade_ray.ops.sample import write_train_shards

        manifest = write_train_shards(
            ds, args.out, args.n_shards, id_col=args.id_col, seed=args.seed
        )
        n = int(manifest["n_rows"].sum())
    else:  # bottomk
        pdf = bottomk_sample(ds, args.k, id_col=args.id_col, seed=args.seed)
        pdf.to_parquet(args.out, index=False)
        n = len(pdf)
    print(json.dumps({"mode": args.mode, "rows": int(n), "out": args.out}))
    return 0


def cmd_classify(args) -> int:
    """Train / apply the hashed logistic-regression quality classifier."""
    _ensure_ray()
    import numpy as np

    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.classifier import fit_quality_classifier, score_quality

    if args.action == "train":
        model = fit_quality_classifier(
            read_parquet_clean(args.corpus),
            label_col=args.label_col, text_col=args.text_col,
            id_col=args.id_col, dim=args.dim, iters=args.iters,
            lr=args.lr, grad_method=args.grad_method,
        )
        np.savez(args.model, w=model["w"], b=model["b"], dim=model["dim"],
                 losses=np.asarray(model["losses"]))
        print(json.dumps({"action": "train", "model": args.model,
                          "final_loss": model["losses"][-1]}))
        return 0
    if not args.out:
        raise SystemExit("classify score needs --out")
    z = np.load(args.model)
    model = {"w": z["w"], "b": float(z["b"]), "dim": int(z["dim"])}
    out = score_quality(
        read_parquet_clean(args.corpus), model, text_col=args.text_col
    )
    if args.min_score is not None:
        thr = float(args.min_score)
        out = out.filter(expr=f"quality_score >= {thr}")
    out.write_parquet(args.out)
    print(json.dumps({"action": "score", "rows": int(out.count()),
                      "out": args.out}))
    return 0


def cmd_route_build(args) -> int:
    """Hash-partition the corpus by a routing column and build one index
    per bucket (ES _routing; see splade_ray.routing)."""
    _ensure_ray()
    from splade_ray.routing import build_routed_index

    manifest = build_routed_index(
        args.corpus, args.index,
        routing_col=args.routing_col, n_buckets=args.n_buckets,
        text_col=args.text_col, id_col=args.id_col,
        rows_per_segment=args.rows_per_segment,
    )
    print(json.dumps(manifest))
    return 0


def cmd_route_search(args) -> int:
    """Routed BM25 top-k: fan out only to the routing values' buckets."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.routing import routed_search

    queries = _load_queries(args.queries)
    routing = (
        [v for v in args.routing.split(",") if v] if args.routing else None
    )
    run = routed_search(
        args.index, queries,
        BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
        routing=routing,
    )
    run.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(run),
                      "buckets": sorted(run["bucket"].unique().tolist()),
                      "out": args.out}))
    return 0


def cmd_profile(args) -> int:
    """Per-(segment, query) profile of the exact kernel (_profile analog)."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.profile import profile_search

    queries = _load_queries(args.queries)
    prof = profile_search(args.index, queries,
                          BM25Params(top_k=args.top_k))
    prof.to_parquet(args.out, index=False)
    tot = prof.groupby("query_id")[["df_sum", "decode_ms", "score_ms"]].sum()
    print(json.dumps({"rows": len(prof), "out": args.out,
                      "per_query": tot.round(2).to_dict("index")}))
    return 0


def cmd_postings(args) -> int:
    """Dump a term's posting list (doc_id, tf) across all segments —
    the Lucene `TermsEnum` debugging view."""
    _ensure_ray()
    import pandas as pd

    from splade_ray.build import segment_dirs
    from splade_ray.query import SegmentIndex, prepare_queries

    prepared = prepare_queries(args.index, [(0, args.term)])
    rows = []
    for seg_dir in segment_dirs(args.index):
        seg = SegmentIndex(seg_dir, prepared["terms"])
        pos, tfs = seg.pos_tfs(args.term)
        for d, tf in zip(seg.doc_ids[pos], tfs):
            rows.append((int(d), int(tf)))
    out = pd.DataFrame(sorted(rows), columns=["doc_id", "tf"])
    out.to_parquet(args.out, index=False)
    print(json.dumps({"term": args.term, "df": len(out),
                      "cf": int(out["tf"].sum()) if len(out) else 0,
                      "out": args.out}))
    return 0


def cmd_rag_build(args) -> int:
    """Chunk the corpus and build the chunk-level index (pipelines.rag)."""
    _ensure_ray()
    from splade_ray.pipelines.rag import build_chunk_index

    m = build_chunk_index(
        args.corpus, args.index, size=args.size, overlap=args.overlap,
        text_col=args.text_col, id_col=args.id_col,
        rows_per_segment=args.rows_per_segment,
    )
    print(json.dumps({k: m[k] for k in (
        "n_docs", "n_segments", "n_segments_skipped", "docs_per_sec")}))
    return 0


def cmd_rag_search(args) -> int:
    """Parent-ranked (docs) or chunk-payload retrieval over a rag index."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.pipelines.rag import rag_search, rag_search_chunks

    queries = _load_queries(args.queries)
    p = BM25Params(k1=args.k1, b=args.b, top_k=args.top_k)
    if args.chunks:
        run = rag_search_chunks(args.index, queries, p)
    else:
        run = rag_search(args.index, queries, p,
                         score_mode=args.score_mode, top_k=args.top_k)
    run.to_parquet(args.out, index=False)
    print(json.dumps({"queries": len(queries), "rows": len(run),
                      "out": args.out}))
    return 0


def cmd_ann(args) -> int:
    """ANN over an embeddings parquet: brute cosine, or build/search an
    IVF / IVF-PQ index (see splade_ray.ops.ann). Queries parquet needs
    (query_id, embedding)."""
    import numpy as np

    _ensure_ray()
    from splade_ray.io import read_parquet_clean

    def load_queries():
        import pyarrow.parquet as pq

        t = pq.read_table(args.queries)
        ids = t["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = np.stack(t["embedding"].to_numpy(zero_copy_only=False))
        return ids, mat

    if args.mode == "build":
        ds = read_parquet_clean(args.embeddings)
        if args.kind == "ivf":
            from splade_ray.ops.ann import ivf_build

            ivf_build(ds, args.index, n_clusters=args.n_clusters,
                      sample_size=args.sample_size)
        else:  # ivfpq
            from splade_ray.ops.ann import ivfpq_build

            ivfpq_build(ds, args.index, n_clusters=args.n_clusters,
                        m=args.m, ks=args.ks, sample_size=args.sample_size,
                        residual=args.residual)
        print(json.dumps({"kind": args.kind, "index": args.index}))
        return 0
    q_ids, q_mat = load_queries()
    if args.mode == "brute":
        from splade_ray.ops.ann import cosine_topk

        run = cosine_topk(read_parquet_clean(args.embeddings), q_ids, q_mat,
                          top_k=args.top_k).to_pandas()
    elif args.kind == "ivf":
        from splade_ray.ops.ann import ivf_search

        run = ivf_search(args.index, q_ids, q_mat, nprobe=args.nprobe,
                         top_k=args.top_k).to_pandas()
    else:
        from splade_ray.ops.ann import ivfpq_search

        run = ivfpq_search(args.index, q_ids, q_mat, nprobe=args.nprobe,
                           top_k=args.top_k).to_pandas()
    run = run.sort_values(["query_id", "rank"]).reset_index(drop=True)
    run.to_parquet(args.out, index=False)
    print(json.dumps({"mode": args.mode, "rows": len(run), "out": args.out}))
    return 0


def cmd_alias(args) -> int:
    """Alias registry CRUD + search-through-alias (see splade_ray.alias)."""
    from splade_ray.alias import (
        alias_delete, alias_resolve, alias_set, alias_swap, load_aliases,
    )

    if args.mode == "set":
        alias_set(args.registry, args.name, args.dirs.split(","))
        print(json.dumps({"alias": args.name, "dirs": args.dirs.split(",")}))
    elif args.mode == "swap":
        old = alias_swap(args.registry, args.name, args.dirs.split(","))
        print(json.dumps({"alias": args.name, "old": old,
                          "new": args.dirs.split(",")}))
    elif args.mode == "delete":
        alias_delete(args.registry, args.name)
        print(json.dumps({"deleted": args.name}))
    elif args.mode == "resolve":
        print(json.dumps({args.name: alias_resolve(args.registry, args.name)}))
    else:  # list
        print(json.dumps(load_aliases(args.registry)))
    return 0


def cmd_snapshot(args) -> int:
    """Snapshot / verify / restore an index directory (see
    splade_ray.snapshot)."""
    _ensure_ray()
    from splade_ray.snapshot import restore, snapshot, verify_snapshot

    if args.mode == "create":
        m = snapshot(args.index, args.snap,
                     base_snap=args.base or None)
        print(json.dumps({"n_files": m["n_files"],
                          "total_bytes": m["total_bytes"]}))
    elif args.mode == "verify":
        print(json.dumps(verify_snapshot(args.snap)))
    else:  # restore
        print(json.dumps(restore(args.snap, args.index, force=args.force)))
    return 0


def cmd_maintain(args) -> int:
    """Index maintenance for long-lived indexes: tiered-compact down to at
    most --max-segments (--purge fuses tombstone removal into the same
    rewrite pass), then (optionally) refresh the quantized layer that
    compaction invalidates."""
    _ensure_ray()
    import math

    from splade_ray.build import load_manifest
    from splade_ray.compact import compact_segments

    m = load_manifest(args.index)
    n = m["n_segments"]
    report = {"n_segments_before": n, "compacted": False, "quantized": False,
              "purged": False}
    if n > args.max_segments:
        group = math.ceil(n / args.max_segments)
        m = compact_segments(args.index, group_size=group, purge=args.purge)
        report["compacted"] = True
        report["purged"] = args.purge
    elif args.purge:
        from splade_ray.delete import purge_deletes

        m = purge_deletes(args.index)
        report["purged"] = True
    report["n_segments"] = m["n_segments"]
    if args.rederive:
        from splade_ray.delete import rederive_layers

        rep = rederive_layers(args.index)
        report["rederived"] = sorted(rep)
        report["quantized"] = "quantized" in rep
    if args.quantize and not report.get("quantized"):
        from splade_ray.bm25 import BM25Params
        from splade_ray.quantized import build_quantized_postings

        build_quantized_postings(args.index, BM25Params(k1=args.k1, b=args.b))
        report["quantized"] = True
    print(json.dumps(report))
    return 0


def cmd_rerank(args) -> int:
    """Second-pass rerank of a first-stage run (``splade/rerank.py:18-100``
    analog): run file ⋈ queries ⋈ docs -> actor-pool scorer -> re-ranked run.
    ``--pairwise`` switches to the duoT5-style win-count aggregation."""
    _ensure_ray()
    from splade_ray.io import read_run_json, read_trec_run, write_run_json
    from splade_ray.rerank import (
        LexicalReranker,
        pairwise_rerank,
        rerank,
        rerank_input,
    )

    run = (
        read_run_json(args.run)
        if args.run.endswith(".json")
        else read_trec_run(args.run, top_k=args.top_k)
    )
    queries = _load_queries(args.queries)
    pairs = rerank_input(None, run, queries, docs_path=args.docs,
                         id_col=args.id_col, text_col=args.text_col)
    if args.pairwise:
        scored = pairs.map_batches(
            LexicalReranker, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
        ).to_pandas()
        out = pairwise_rerank(scored)
        score_col = "wins2"
    else:
        out = rerank(pairs, top_k=args.top_k)
        score_col = "overlap"
    res = out.drop(columns=["rank"]).rename(  # drop the FIRST-stage rank
        columns={"new_rank": "rank", score_col: "score"}
    )[["query_id", "rank", "doc_id", "score"]]
    if args.out.endswith(".json"):
        write_run_json(res, args.out)
    else:
        res.to_parquet(args.out, index=False)
    print(json.dumps({"pairs": len(out), "out": args.out}))
    return 0


def cmd_beir_eval(args) -> int:
    """One-entry BEIR flow (reference: ``splade/beir_eval.py:22-97``)."""
    _ensure_ray()
    from splade_ray.bm25 import BM25Params
    from splade_ray.pipelines.beir import beir_eval

    measures = (
        [m.strip() for m in args.measures.split(",") if m.strip()]
        if args.measures
        else None
    )
    res = beir_eval(
        args.data,
        args.work,
        split=args.split,
        params=BM25Params(k1=args.k1, b=args.b, top_k=args.top_k),
        method=args.method,
        measures=measures,
    )
    print(json.dumps(res["metrics"]))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(res["metrics"], fh)
    return 0


def cmd_dedup(args) -> int:
    """Duplicate clustering + survivor filter over a parquet corpus:
    pair generation (exact / minhash / jaccard / containment) →
    connected components →
    cluster-canonical survivors. Writes ``out/clusters`` (doc_id,
    cluster_id) and ``out/survivors`` (all source columns) as partitioned
    parquet; prints a summary JSON line.

    Resumable per method: each method's pair table is checkpointed to
    ``out/pairs/<method>`` (with a ``_DONE`` marker written after the
    parquet lands — same pattern as build_index's per-segment manifests),
    so a rerun after a failure skips every finished method and only
    recomputes the missing pair tables. Pair generation dominates the
    pipeline cost (it scans the documents; clustering touches only the
    pair-sized edge list), so this is where a 100-TB run wants restarts
    to be cheap."""
    _ensure_ray()
    import os

    import pyarrow as pa

    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.cluster import connected_components, drop_near_duplicates
    from splade_ray.ops.dedup import (
        containment_sketch_pairs,
        exact_dup_pairs,
        jaccard_block_pairs,
        minhash_lsh_pairs,
    )

    methods = [m.strip() for m in args.methods.split(",") if m.strip()]
    unknown = set(methods) - {"exact", "minhash", "jaccard", "containment"}
    if unknown:
        print(f"unknown dedup method(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    cols = [args.id_col, args.text_col] + (
        [args.lang_col] if "jaccard" in methods else []
    )

    def norm(batch: pa.Table) -> pa.Table:
        out = {
            "doc_id": batch[args.id_col].cast(pa.int64()),
            "text": batch[args.text_col].cast(pa.string()),
        }
        if "jaccard" in methods:
            out["lang"] = batch[args.lang_col].cast(pa.string())
        return pa.table(out)

    def make_source():
        # one source per method: each read_parquet captures its OWN
        # DataContext copy, so per-method resource shares (below) apply to
        # exactly one pipeline
        return read_parquet_clean(args.corpus, columns=cols).map_batches(
            norm, batch_format="pyarrow"
        )

    def pick(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
            return pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]).empty_table()
        return pa.table(
            {"doc_a": batch["doc_a"].cast(pa.int64()), "doc_b": batch["doc_b"].cast(pa.int64())}
        )

    import ray.data as rd

    def empty_pairs():
        return rd.from_arrow(
            pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]).empty_table()
        )

    def gen_pairs(m: str):
        nds = make_source()
        if m == "exact":
            return exact_dup_pairs(nds)
        if m == "minhash":
            return minhash_lsh_pairs(nds, min_est_jaccard=args.min_est_jaccard)
        if m == "containment":
            # cross-band SUBSET duplicates: the survivor filter keeps the
            # cluster-min doc, so an embedded copy joins its host's cluster
            return containment_sketch_pairs(
                nds, k=args.cont_k,
                sketch_k=args.cont_sketch_k or None,
                min_containment=args.min_containment, emit_counts=True)
        return jaccard_block_pairs(nds, min_jaccard=args.min_jaccard, emit_counts=True)

    def build_pipeline(m: str, cpu_share: float | None = None):
        # pipeline construction happens on the MAIN thread (read_parquet's
        # lazy fsspec import is not thread-safe); worker threads only drive
        # execution
        out_ds = gen_pairs(m).map_batches(pick, batch_format="pyarrow")
        if cpu_share is not None:
            # explicit per-pipeline scheduler share (ROADMAP round-3 #6):
            # each overlapped method's streaming executor gets a soft CPU
            # limit instead of all three contending for the full budget
            from ray.data import ExecutionResources

            out_ds.context.execution_options.resource_limits = ExecutionResources(
                cpu=cpu_share
            )
        return out_ds

    def write_pairs(m: str, out_ds=None) -> None:
        pair_dir = os.path.join(args.out, "pairs", m)
        os.makedirs(pair_dir, exist_ok=True)
        (out_ds if out_ds is not None else build_pipeline(m)).write_parquet(pair_dir)
        with open(os.path.join(pair_dir, "_DONE"), "w") as f:
            f.write("done\n")

    skipped = [
        m
        for m in methods
        if os.path.exists(os.path.join(args.out, "pairs", m, "_DONE"))
    ]
    todo = [m for m in methods if m not in skipped]
    # OVERLAPPED pair generation (ROADMAP round-3 item 6): each unfinished
    # method's streaming write runs on its own driver thread, so Ray
    # schedules the scans/shuffles of all methods together — one method's
    # serial tail (e.g. jaccard's in-group compare) no longer idles the
    # cluster while the next method's corpus scan could be running. The
    # per-method _DONE checkpoints are unchanged, so crash-resume semantics
    # are identical to the sequential version.
    if len(todo) > 1:
        from concurrent.futures import ThreadPoolExecutor

        import ray

        from splade_ray.io import stub_fsspec_http

        stub_fsspec_http()  # concurrent writes race this probe otherwise
        total = ray.cluster_resources().get("CPU", 4.0) if ray.is_initialized() else 4.0
        share = max(2.0, total / len(todo))
        pipelines = [(m, build_pipeline(m, share)) for m in todo]
        with ThreadPoolExecutor(max_workers=len(todo)) as pool:
            for fut in [pool.submit(write_pairs, m, ds) for m, ds in pipelines]:
                fut.result()  # re-raise the first failure
    elif todo:
        write_pairs(todo[0])

    edges = None
    for m in methods:
        pair_dir = os.path.join(args.out, "pairs", m)
        # an empty pair set writes no parquet files; substitute a typed
        # empty dataset so the union keeps its (doc_a, doc_b) schema
        has_files = any(n.endswith(".parquet") for n in os.listdir(pair_dir))
        es = read_parquet_clean(pair_dir) if has_files else empty_pairs()
        edges = es if edges is None else edges.union(es)

    labels = connected_components(edges).materialize()
    survivors = drop_near_duplicates(
        read_parquet_clean(args.corpus), labels, id_col=args.id_col
    ).materialize()

    import shutil

    os.makedirs(args.out, exist_ok=True)
    # clusters/survivors are derived wholly from the checkpointed pair
    # tables — clear any partial previous write (write_parquet appends
    # into an existing dir) and regenerate
    for sub_dir in ("clusters", "survivors"):
        shutil.rmtree(os.path.join(args.out, sub_dir), ignore_errors=True)
    labels.write_parquet(os.path.join(args.out, "clusters"))
    survivors.write_parquet(os.path.join(args.out, "survivors"))
    n_nodes = labels.count()
    n_survivors = survivors.count()
    n_input = read_parquet_clean(args.corpus, columns=[args.id_col]).count()
    print(
        json.dumps(
            {
                "methods": methods,
                "methods_skipped": skipped,
                "n_dup_nodes": n_nodes,
                "n_survivors": n_survivors,
                "n_dropped": n_input - n_survivors,
                "out": args.out,
            }
        )
    )
    return 0


def cmd_curate(args) -> int:
    """End-to-end corpus curation: quality filter → dedup → eval-overlap
    decontamination → PII redaction → sequence-pack assignment, the
    pretraining-data pipeline the reference assumes already ran
    (splade/beir_eval.py:22 takes a clean corpus as given).

    Every stage checkpoints its full output to ``out/<stage>`` parquet with
    a ``_DONE`` marker (build_index's per-segment protocol), so a rerun
    resumes at the first unfinished stage — each stage is itself a
    streaming Ray Data pipeline, so the checkpoint spacing equals the
    restart granularity a 100-TB run wants. Stage list and order come from
    ``--stages``; all original columns flow through every stage."""
    _ensure_ray()
    import os

    import numpy as np
    import pyarrow as pa
    import ray

    from splade_ray.io import read_parquet_clean

    known = ["quality", "dedup", "dupspans", "unitdedup", "lshdedup", "decontam", "dsir", "ppl", "redact", "pack"]
    stages = [s.strip() for s in args.stages.split(",") if s.strip()]
    unknown = set(stages) - set(known)
    if unknown:
        print(f"unknown curate stage(s): {sorted(unknown)}", file=sys.stderr)
        return 2
    id_col, text_col = args.id_col, args.text_col
    langs = [s.strip() for s in args.langs.split(",") if s.strip()] if args.langs else None

    def stage_quality(ds):
        from splade_ray.ops.textstats import gopher_rules_batch

        def f(batch: pa.Table) -> pa.Table:
            flags = gopher_rules_batch(
                batch, text_col=text_col, min_words=args.min_words
            )
            keep = flags["pass_gopher"].to_numpy(zero_copy_only=False)
            if langs and args.lang_col in batch.column_names:
                lang = batch[args.lang_col].to_numpy(zero_copy_only=False)
                keep = keep & np.isin(lang, langs)
            return batch.filter(pa.array(keep))

        return ds.map_batches(f, batch_format="pyarrow")

    def stage_dedup(ds):
        from splade_ray.ops.cluster import connected_components, drop_near_duplicates
        from splade_ray.ops.dedup import exact_dup_pairs, minhash_lsh_pairs

        def norm(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": batch[id_col].cast(pa.int64()),
                    "text": batch[text_col].cast(pa.string()),
                }
            )

        nds = ds.map_batches(norm, batch_format="pyarrow")
        methods = [m.strip() for m in args.dedup_methods.split(",") if m.strip()]
        edges = None
        for m in methods:
            es = (
                exact_dup_pairs(nds)
                if m == "exact"
                else minhash_lsh_pairs(nds, min_est_jaccard=args.min_est_jaccard)
            )
            edges = es if edges is None else edges.union(es)
        labels = connected_components(edges).materialize()
        return drop_near_duplicates(ds, labels, id_col=id_col)

    def stage_dupspans(ds):
        from splade_ray.ops.curation import (
            drop_duplicated_spans,
            drop_duplicated_spans_sharded,
        )

        if args.dup_sharded:
            # memory-bounded variant: the duplicated-gram set lives
            # hash-partitioned under out/dupspans_work (pass 1 resumes via
            # its own manifest; the corpus fingerprint invalidates stale
            # shards when the corpus changed under the same --out)
            from splade_ray.ops.curation import corpus_fingerprint

            return drop_duplicated_spans_sharded(
                ds, os.path.join(args.out, "dupspans_work"),
                k=args.dup_k, min_count=args.dup_min_count,
                text_col=text_col, id_col=id_col, n_shards=args.dup_shards,
                fingerprint=corpus_fingerprint(args.corpus),
            )
        return drop_duplicated_spans(
            ds, k=args.dup_k, min_count=args.dup_min_count,
            text_col=text_col, id_col=id_col,
        )

    def stage_lshdedup(ds):
        """Cross-run near-dup stage over a persisted MinHash-LSH index:
        drop docs near-duplicating PREVIOUSLY indexed corpora, then append
        the survivors so the next run's increment dedups against
        everything seen so far (the daily-crawl loop; in-run dups are the
        'dedup' stage's job). First run (no index yet) builds the index
        from this corpus and passes everything through. The increment tag
        defaults to a hash of the corpus path, so a crashed run repeats
        idempotently — distinct increments need distinct --lsh-tag (or
        distinct corpus paths). The source tag of the first build is
        recorded ATOMICALLY inside the index manifest itself (plus the
        legacy _built_tag marker), so a crash between "manifest written"
        and "marker written" can no longer flip a resumed run onto the
        probe path against an index built from its own corpus — which
        would silently drop ~every doc as a near-dup of itself."""
        import json as _json

        from splade_ray.ops.dedup import (
            minhash_index_append,
            minhash_index_build,
            minhash_index_clean_tag,
            minhash_index_probe,
        )

        idx = args.lsh_index or os.path.join(args.out, "lsh_index")
        tag = args.lsh_tag or _corpus_tag(args.corpus)
        built_marker = os.path.join(idx, "_built_tag")
        if getattr(args, "dry_run", False):
            # dry-run: NEVER mutate a shared index — probe-only against an
            # existing one, passthrough when there is none yet
            if not os.path.exists(os.path.join(idx, "_params.json")):
                return ds
            pairs = minhash_index_probe(
                ds, idx, min_est_jaccard=args.lsh_min_est,
                text_col=text_col, id_col=id_col,
            ).to_pandas()
            bad = (np.sort(np.unique(pairs["new_doc"].to_numpy(np.int64)))
                   if len(pairs) else np.empty(0, np.int64))
            bad_r = ray.put(bad)

            def filt_dry(batch: pa.Table) -> pa.Table:
                ids = batch[id_col].to_numpy(
                    zero_copy_only=False).astype(np.int64)
                return batch.filter(pa.array(~np.isin(ids, ray.get(bad_r))))

            return ds.map_batches(filt_dry, batch_format="pyarrow")
        manifest_path = os.path.join(idx, "_params.json")
        if not os.path.exists(manifest_path):
            # source_tag lands in _params.json atomically with the build —
            # the legacy _built_tag file is kept for older indexes only
            minhash_index_build(ds, idx, text_col=text_col, id_col=id_col,
                                source_tag=tag)
            with open(built_marker, "w") as f:
                f.write(tag + "\n")
            return ds
        with open(manifest_path) as f:
            manifest_source = _json.load(f).get("source_tag")
        if manifest_source == tag:
            # resume of the run that built the index from this very
            # corpus: probing it against itself would drop all docs
            return ds
        if os.path.exists(built_marker):
            with open(built_marker) as f:
                if f.read().strip() == tag:
                    # legacy marker (index built before source_tag existed)
                    return ds
        minhash_index_clean_tag(idx, tag)
        pairs = minhash_index_probe(
            ds, idx, min_est_jaccard=args.lsh_min_est,
            text_col=text_col, id_col=id_col,
        ).to_pandas()
        bad_ids = (np.sort(np.unique(pairs["new_doc"].to_numpy(np.int64)))
                   if len(pairs) else np.empty(0, np.int64))
        if len(bad_ids):
            # mass-drop sanity guard: an increment that near-duplicates
            # essentially ALL of itself against the index almost always
            # means the index was built from this same corpus under a
            # different tag/path — refuse instead of silently emptying the
            # output (re-run with a fresh --lsh-index or correct --lsh-tag)
            n_total = ds.count()
            if n_total >= 100 and len(bad_ids) >= 0.98 * n_total:
                raise RuntimeError(
                    f"lshdedup: probe would drop {len(bad_ids)}/{n_total} "
                    f"docs (>=98%) — the index at {idx} looks like it was "
                    "built from this very corpus; point --lsh-index at a "
                    "fresh dir or fix --lsh-tag")
        bad_ref = ray.put(bad_ids)  # pair-bounded broadcast

        def filt(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(~np.isin(ids, ray.get(bad_ref))))

        survivors = ds.map_batches(filt, batch_format="pyarrow")
        minhash_index_append(survivors, idx, tag=tag,
                             text_col=text_col, id_col=id_col)
        return survivors

    def stage_unitdedup(ds):
        from splade_ray.ops.curation import unit_dedup, unit_dedup_sharded

        if args.dup_sharded:
            # memory-bounded variant (shares the --dup-sharded knobs):
            # duplicated-unit keys stream in hash shards under
            # out/unitdedup_work instead of one broadcast; the corpus
            # fingerprint invalidates stale shards on corpus change
            from splade_ray.ops.curation import corpus_fingerprint

            return unit_dedup_sharded(
                ds, os.path.join(args.out, "unitdedup_work"),
                min_count=args.dup_min_count, text_col=text_col,
                id_col=id_col, n_shards=args.dup_shards, replace=True,
                fingerprint=corpus_fingerprint(args.corpus),
            )
        return unit_dedup(
            ds, min_count=args.dup_min_count, text_col=text_col,
            id_col=id_col, replace=True,
        )

    def stage_decontam(ds):
        from splade_ray.ops.curation import decontaminate

        if args.eval_corpus:
            eval_ds, train = read_parquet_clean(args.eval_corpus), ds
        else:
            # mod-based holdout: the eval slice leaves the training output
            def part(keep_eval):
                def f(batch: pa.Table) -> pa.Table:
                    rem = batch[id_col].to_numpy(zero_copy_only=False) % args.eval_mod == 0
                    return batch.filter(pa.array(rem if keep_eval else ~rem))

                return ds.map_batches(f, batch_format="pyarrow")

            eval_ds, train = part(True), part(False)
        flags = decontaminate(train, eval_ds, k=args.k, text_col=text_col)
        bad = flags.map_batches(
            lambda b: b.filter(b["contaminated"]), batch_format="pyarrow"
        ).to_pandas()
        # contaminated set is overlap-bounded (usually tiny); broadcast it
        bad_ids = np.sort(bad["doc_id"].to_numpy(np.int64)) if len(bad) else np.empty(0, np.int64)
        bad_ref = ray.put(bad_ids)

        def filt(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(~np.isin(ids, ray.get(bad_ref))))

        return train.map_batches(filt, batch_format="pyarrow")

    def stage_dsir(ds):
        """DSIR importance resampling (Xie et al. 2023): keep the
        --dsir-keep docs whose hashed-n-gram distribution best matches the
        --dsir-target corpus, via deterministic Gumbel top-k."""
        from splade_ray.ops.curation import dsir_importance, dsir_select

        if not args.dsir_target:
            raise SystemExit("--dsir-target is required for the dsir stage")
        target = read_parquet_clean(args.dsir_target)
        w = dsir_importance(
            ds, target, n_buckets=args.dsir_buckets,
            text_col=text_col, id_col=id_col,
        )
        sel = dsir_select(w, args.dsir_keep, seed=args.seed)
        keep_ids = np.sort(sel["doc_id"].to_numpy(np.int64))
        keep_ref = ray.put(keep_ids)  # k-sized broadcast

        def filt(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return batch.filter(pa.array(np.isin(ids, ray.get(keep_ref))))

        return ds.map_batches(filt, batch_format="pyarrow")

    def stage_ppl(ds):
        """CCNet-style LM quality filter (Wenzek et al. 2020): fit a hashed
        add-alpha bigram LM on the --ppl-target reference corpus, keep docs
        whose perplexity under it is <= --ppl-max (unscored docs — shorter
        than the gram order — are kept; they carry no signal)."""
        from splade_ray.ops.curation import ngram_lm_fit, ppl_filter

        if not args.ppl_target:
            raise SystemExit("--ppl-target is required for the ppl stage")
        ref = read_parquet_clean(args.ppl_target)
        fit = ngram_lm_fit(ref, n=2, n_buckets=args.ppl_buckets,
                           text_col=text_col)
        return ppl_filter(ds, fit, max_ppl=args.ppl_max,
                          text_col=text_col, id_col=id_col)

    def stage_redact(ds):
        from splade_ray.ops.curation import redact_batch

        def f(batch: pa.Table) -> pa.Table:
            red = redact_batch(batch, text_col=text_col)
            idx = batch.schema.get_field_index(text_col)
            return batch.set_column(idx, text_col, red["text_redacted"])

        return ds.map_batches(f, batch_format="pyarrow")

    def stage_pack(ds):
        from splade_ray.ops.curation import pack_assign

        packs = pack_assign(
            ds, budget=args.budget, id_col=id_col, text_col=text_col
        ).to_pandas()
        # (id, pack_id) map is 16 B/doc; broadcast + searchsorted attach.
        # (A corpus too large for that would reuse drop_near_duplicates'
        # hash-join fallback; at that point packing feeds a trainer that
        # shards the map anyway.) An empty upstream loses its columns
        # through to_pandas — broadcast an empty map (attach never fires).
        if packs.empty:
            map_ref = ray.put((np.empty(0, np.int64), np.empty(0, np.int64)))
        else:
            packs = packs.sort_values(id_col)
            map_ref = ray.put(
                (packs[id_col].to_numpy(np.int64),
                 packs["pack_id"].to_numpy(np.int64))
            )

        def attach(batch: pa.Table) -> pa.Table:
            ids_sorted, pack_ids = ray.get(map_ref)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(ids_sorted, ids)
            return batch.append_column("pack_id", pa.array(pack_ids[pos], pa.int64()))

        return ds.map_batches(attach, batch_format="pyarrow")

    fns = {
        "quality": stage_quality,
        "dedup": stage_dedup,
        "dupspans": stage_dupspans,
        "unitdedup": stage_unitdedup,
        "lshdedup": stage_lshdedup,
        "decontam": stage_decontam,
        "dsir": stage_dsir,
        "ppl": stage_ppl,
        "redact": stage_redact,
        "pack": stage_pack,
    }

    if args.dry_run:
        # sample-only row-flow estimate: run the stage chain in memory on
        # the first --dry-sample docs, write NOTHING durable (stage work
        # dirs land in a tempdir; lshdedup probes read-only). Duplicate-
        # family stages (dedup/dupspans/unitdedup/lshdedup) UNDERESTIMATE
        # their drop rates on a sample — duplicates are corpus-global.
        import shutil
        import tempfile

        real_out = args.out
        dry_dir = tempfile.mkdtemp(prefix="curate-dry-")
        try:
            args.out = dry_dir
            sample = read_parquet_clean(args.corpus).limit(
                args.dry_sample).materialize()
            n_in = sample.count()
            rates: dict[str, int] = {}
            cur = sample
            for name in stages:
                cur = fns[name](cur).materialize()
                rates[name] = cur.count()
        finally:
            args.out = real_out
            shutil.rmtree(dry_dir, ignore_errors=True)
        print(json.dumps({
            "dry_run": True,
            "stages": stages,
            "sample_rows": n_in,
            "rows_after_sample": rates,
            "note": "sample-only estimate; duplicate-family stages "
                    "underestimate drop rates (duplicates are "
                    "corpus-global)",
        }))
        return 0

    os.makedirs(args.out, exist_ok=True)
    src = args.corpus
    counts: dict[str, int] = {}
    skipped: list[str] = []
    for name in stages:
        stage_dir = os.path.join(args.out, name)
        marker = os.path.join(stage_dir, "_DONE")
        if os.path.exists(marker):
            skipped.append(name)
        else:
            import shutil

            shutil.rmtree(stage_dir, ignore_errors=True)
            os.makedirs(stage_dir, exist_ok=True)
            res = fns[name](read_parquet_clean(src))
            res.write_parquet(stage_dir)
            if not any(n.endswith(".parquet") for n in os.listdir(stage_dir)):
                # an all-filtered stage writes no files; keep the dir
                # readable (and typed) for the next stage. A fully empty
                # result can lose its schema entirely (e.g. a dedup join
                # over zero rows) — fall back to the stage INPUT's schema,
                # which every stage preserves or extends
                import pyarrow.dataset as pads
                import pyarrow.parquet as pq

                sch = res.schema(fetch_if_missing=True)
                base = (sch.base_schema if sch is not None
                        else pads.dataset(src).schema.remove_metadata())
                pq.write_table(
                    base.empty_table(),
                    os.path.join(stage_dir, "empty.parquet"),
                )
            with open(marker, "w") as f:
                f.write("done\n")
        src = stage_dir
        counts[name] = read_parquet_clean(stage_dir).count()
    print(
        json.dumps(
            {
                "stages": stages,
                "stages_skipped": skipped,
                "n_input": read_parquet_clean(args.corpus).count(),
                "rows_after": counts,
                "out": src,
            }
        )
    )
    return 0


def cmd_all(args) -> int:
    """build → query → evaluate, sharing the filesystem contract
    (splade/all.py:14-21 minus training)."""
    import os

    rc = cmd_build(args)
    if rc:
        return rc
    args.out_run = os.path.join(args.out, "run.json")
    ns = argparse.Namespace(
        **{"scoring": "bm25", "mu": 2000.0, **vars(args), "out": args.out_run}
    )
    rc = cmd_query(ns)
    if rc:
        return rc
    if args.qrel:
        ns2 = argparse.Namespace(run=args.out_run, qrel=args.qrel, k=args.top_k,
                                 out=os.path.join(args.out, "perf.json"))
        return cmd_evaluate(ns2)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="splade_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) the inverted index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--text-col", default="content")
    b.add_argument("--id-col", default=None)
    b.add_argument("--rows-per-segment", type=int, default=50_000)
    b.add_argument("--lang-col", default=None,
                   help="per-language analyzer column (analysis.ANALYZERS)")
    b.add_argument("--analyzer", default=None,
                   help="ONE registered analyzer for every doc (e.g. en_light "
                        "= stopwords + s-stem); queries follow automatically")
    b.add_argument("--block-size", type=int, default=128)
    b.add_argument("--extra-doc-cols", default=None,
                   help="comma-separated doc columns carried in the doclens "
                        "sidecar (facets/collapse/doc-values)")
    b.set_defaults(fn=cmd_build)

    ap = sub.add_parser(
        "append",
        help="append new docs to an existing index as new segments "
             "(incremental indexing; config from the index manifest)",
    )
    ap.add_argument("--index", required=True)
    ap.add_argument("--corpus", required=True, help="parquet file/dir of NEW docs")
    ap.add_argument("--rows-per-segment", type=int, default=50_000)
    ap.set_defaults(fn=cmd_append)

    q = sub.add_parser("query", help="BM25 top-k retrieval")
    q.add_argument("--index", required=True)
    q.add_argument("--queries", required=True, help="TSV: id\\ttext")
    q.add_argument("--out", required=True, help="run.json or .parquet")
    q.add_argument("--method", choices=["exact", "bmw", "auto"], default="auto")
    q.add_argument("--top-k", type=int, default=10)
    q.add_argument("--threshold", type=float, default=0.0)
    q.add_argument("--k1", type=float, default=1.2)
    q.add_argument("--b", type=float, default=0.75)
    q.add_argument("--scoring", choices=["bm25", "ql", "lmjm", "tfidf", "dfr"],
                   default="bm25",
                   help="similarity: Okapi BM25, Dirichlet QL, "
                        "Jelinek-Mercer QL, classic TF-IDF or DFR InL2")
    q.add_argument("--mu", type=float, default=2000.0,
                   help="Dirichlet smoothing parameter (scoring=ql)")
    q.add_argument("--lam", type=float, default=0.1,
                   help="Jelinek-Mercer lambda (scoring=lmjm)")
    q.add_argument("--dfr-c", type=float, default=1.0,
                   help="DFR H2 length-normalization c (scoring=dfr)")
    q.set_defaults(fn=cmd_query)

    qs = sub.add_parser(
        "qsearch",
        help="Lucene classic query-string retrieval (+must -not \"phrase\" "
             "fuzzy~ prefix*); phrases need the positional layer "
             "(`positions` subcommand)",
    )
    qs.add_argument("--index", required=True)
    qs.add_argument("--queries", required=True, help="TSV: id\\tquery string")
    qs.add_argument("--out", required=True, help="run.json or .parquet")
    qs.add_argument("--top-k", type=int, default=10)
    qs.add_argument("--threshold", type=float, default=0.0)
    qs.add_argument("--k1", type=float, default=1.2)
    qs.add_argument("--b", type=float, default=0.75)
    qs.add_argument("--max-expansions", type=int, default=64,
                    help="cap per fuzzy~/prefix* clause (Lucene maxClauseCount)")
    qs.set_defaults(fn=cmd_qsearch)

    fs = sub.add_parser("fsearch", help="fielded BM25 (weighted per-field indexes)")
    fs.add_argument("--index-field", action="append", required=True,
                    metavar="NAME=DIR", help="per-field index dir (repeat)")
    fs.add_argument("--weight", action="append", required=True,
                    metavar="NAME=W", help="per-field weight (repeat)")
    fs.add_argument("--queries", required=True, help="TSV: id\\ttext")
    fs.add_argument("--out", required=True, help="run.json or .parquet")
    fs.add_argument("--top-k", type=int, default=10)
    fs.add_argument("--threshold", type=float, default=0.0)
    fs.add_argument("--k1", type=float, default=1.2)
    fs.add_argument("--b", type=float, default=0.75)
    fs.add_argument("--mode", choices=["sum", "dismax", "bm25f"], default="sum",
                    help="sum = Σ w_f·BM25_f; dismax = best field + "
                         "tie_breaker×rest (Lucene DisjunctionMaxQuery); "
                         "bm25f = fold tf across fields before saturation "
                         "(union-df idf)")
    fs.add_argument("--tie-breaker", type=float, default=0.0,
                    help="dismax tie breaker in [0,1]")
    fs.add_argument("--field-b", action="append", default=None,
                    metavar="NAME=B", help="bm25f per-field b (repeat)")
    fs.add_argument("--analyzer", action="append", default=None,
                    metavar="NAME=LANG", help="sum-mode per-field registered "
                                              "query analyzer (repeat)")
    fs.add_argument("--query-analyzer", default=None,
                    help="bm25f-mode registered analyzer for query text")
    fs.set_defaults(fn=cmd_fsearch)

    sn = sub.add_parser("snippets", help="keyword-in-context snippets for a run")
    sn.add_argument("--corpus", required=True, help="corpus parquet file/dir")
    sn.add_argument("--run", required=True, help="run.json or .parquet")
    sn.add_argument("--queries", required=True, help="TSV: id\\ttext")
    sn.add_argument("--out", required=True, help="snippets parquet")
    sn.add_argument("--window", type=int, default=10)
    sn.add_argument("--mode", choices=["occurrences", "distinct", "sentence"],
                    default="occurrences")
    sn.add_argument("--id-col", default="doc_id")
    sn.add_argument("--text-col", default="text")
    sn.set_defaults(fn=cmd_snippets)

    e = sub.add_parser("evaluate", help="MRR/MAP/recall/nDCG against qrels")
    e.add_argument("--run", required=True)
    e.add_argument("--qrel", required=True)
    e.add_argument("--k", type=int, default=10)
    e.add_argument("--measures", default=None,
                   help="comma list of measure@k strings (mrr, map, ndcg, recall)")
    e.add_argument("--out", default=None)
    e.set_defaults(fn=cmd_evaluate)

    s = sub.add_parser("stats", help="index statistics")
    s.add_argument("--index", required=True)
    s.set_defaults(fn=cmd_stats)

    fg = sub.add_parser("figure", help="index_dist.json + log-log SVG (index_figure analog)")
    fg.add_argument("--index", required=True)
    fg.add_argument("--out", default=None, help="output dir (default: index dir)")
    fg.set_defaults(fn=cmd_figure)

    v = sub.add_parser("verify", help="check content sha256 invariant vs source")
    v.add_argument("--index", required=True)
    v.add_argument("--corpus", default=None)
    v.set_defaults(fn=cmd_verify)

    c = sub.add_parser("compact", help="merge consecutive segments (tiered)")
    c.add_argument("--index", required=True)
    c.add_argument("--group-size", type=int, default=8)
    c.set_defaults(fn=cmd_compact)

    z = sub.add_parser("quantize", help="build quantized posting layer")
    z.add_argument("--index", required=True)
    z.add_argument("--factor", type=int, default=100)
    z.add_argument("--k1", type=float, default=1.2)
    z.add_argument("--b", type=float, default=0.75)
    z.set_defaults(fn=cmd_quantize)

    ps = sub.add_parser("positions", help="build positional layer (phrase queries)")
    ps.add_argument("--index", required=True)
    ps.set_defaults(fn=cmd_positions)

    ph = sub.add_parser("phrase", help="phrase matching over the positional layer")
    ph.add_argument("--index", required=True)
    ph.add_argument("--phrases", required=True, help="TSV: id\\tphrase text")
    ph.add_argument("--out", required=True, help=".parquet")
    ph.add_argument("--slop", type=int, default=None,
                    help="ordered proximity: allow up to SLOP extra positions")
    ph.set_defaults(fn=cmd_phrase)

    sn = sub.add_parser(
        "spannot",
        help="SpanNotQuery: include-term occurrences with no exclude term "
             "within [-pre, +post] positions (positional layer)",
    )
    sn.add_argument("--index", required=True)
    sn.add_argument("--queries", required=True,
                    help="TSV: id\\tinclude_term\\texclude_term")
    sn.add_argument("--out", required=True, help=".parquet")
    sn.add_argument("--pre", type=int, default=0)
    sn.add_argument("--post", type=int, default=0)
    sn.set_defaults(fn=cmd_spannot)

    ml = sub.add_parser("mlt", help="more-like-this (seed-doc similarity)")
    ml.add_argument("--index", required=True)
    ml.add_argument("--corpus", required=True)
    ml.add_argument("--seeds", required=True, help="comma-separated doc ids")
    ml.add_argument("--out", required=True, help="run.json or .parquet")
    ml.add_argument("--m-terms", type=int, default=10)
    ml.add_argument("--top-k", type=int, default=10)
    ml.add_argument("--k1", type=float, default=1.2)
    ml.add_argument("--b", type=float, default=0.75)
    ml.add_argument("--text-col", default="text")
    ml.add_argument("--id-col", default="doc_id")
    ml.set_defaults(fn=cmd_mlt)

    cl = sub.add_parser("collapse", help="field-collapsed retrieval (1 doc/key)")
    cl.add_argument("--index", required=True)
    cl.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    cl.add_argument("--out", required=True, help=".parquet")
    cl.add_argument("--collapse-col", required=True,
                    help="doclens-carried key column (build with extra_doc_cols)")
    cl.add_argument("--top-k", type=int, default=10)
    cl.add_argument("--k1", type=float, default=1.2)
    cl.add_argument("--b", type=float, default=0.75)
    cl.set_defaults(fn=cmd_collapse)

    rs = sub.add_parser(
        "rescore",
        help="two-pass retrieval: BM25 window + match_phrase rescore "
             "(needs the positional layer)",
    )
    rs.add_argument("--index", required=True)
    rs.add_argument("--queries", required=True, help="TSV: id\ttext")
    rs.add_argument("--phrases", default=None,
                    help="TSV: id\tphrase (default: the query's own text)")
    rs.add_argument("--out", required=True, help="run.json or .parquet")
    rs.add_argument("--window-size", type=int, default=50)
    rs.add_argument("--score-mode",
                    choices=["total", "multiply", "avg", "max", "min"],
                    default="total")
    rs.add_argument("--query-weight", type=float, default=1.0)
    rs.add_argument("--rescore-query-weight", type=float, default=1.0)
    rs.add_argument("--top-k", type=int, default=10)
    rs.add_argument("--k1", type=float, default=1.2)
    rs.add_argument("--b", type=float, default=0.75)
    rs.set_defaults(fn=cmd_rescore)

    ct = sub.add_parser("ctsearch", help="CommonTermsQuery retrieval "
                        "(low-df terms gate, high-df terms score-only)")
    ct.add_argument("--index", required=True)
    ct.add_argument("--queries", required=True, help="TSV: id\ttext")
    ct.add_argument("--out", required=True, help="run.json or .parquet")
    ct.add_argument("--cutoff", type=float, default=0.01,
                    help="df/N cutoff separating low from common terms")
    ct.add_argument("--top-k", type=int, default=10)
    ct.add_argument("--k1", type=float, default=1.2)
    ct.add_argument("--b", type=float, default=0.75)
    ct.set_defaults(fn=cmd_ctsearch)

    sg = sub.add_parser("suggest", help="did-you-mean / prefix / fuzzy queries")
    sg.add_argument("--index", required=True)
    sg.add_argument("--queries", required=True,
                    help="TSV: id\\tterm-or-prefix")
    sg.add_argument("--out", required=True, help=".parquet")
    sg.add_argument("--mode", choices=["terms", "prefix", "fuzzy", "wildcard"],
                    default="terms")
    sg.add_argument("--max-dist", type=int, default=2)
    sg.add_argument("--transpositions", action="store_true",
                    help="Damerau-Levenshtein metric (adjacent swap = 1 edit)")
    sg.add_argument("-m", type=int, default=5, help="suggestions per query")
    sg.add_argument("--max-terms", type=int, default=128,
                    help="expansion cap (prefix/fuzzy retrieval)")
    sg.add_argument("--top-k", type=int, default=10)
    sg.set_defaults(fn=cmd_suggest)

    r3 = sub.add_parser("rm3", help="RM3 pseudo-relevance-feedback search")
    r3.add_argument("--index", required=True)
    r3.add_argument("--corpus", required=True)
    r3.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    r3.add_argument("--out", required=True, help="run.json or .parquet")
    r3.add_argument("--fb-docs", type=int, default=5)
    r3.add_argument("--fb-terms", type=int, default=8)
    r3.add_argument("--exp-qtf", type=int, default=1)
    r3.add_argument("--top-k", type=int, default=10)
    r3.add_argument("--k1", type=float, default=1.2)
    r3.add_argument("--b", type=float, default=0.75)
    r3.add_argument("--text-col", default="text")
    r3.add_argument("--id-col", default="doc_id")
    r3.set_defaults(fn=cmd_rm3)

    bp = sub.add_parser("bpe", help="learn/apply a BPE subword vocabulary")
    bp.add_argument("--corpus", required=True)
    bp.add_argument("--out", required=True,
                    help="fit: merges JSON; apply: stats parquet dir")
    bp.add_argument("--mode", choices=["fit", "apply"], default="fit")
    bp.add_argument("--merges", type=int, default=1000, help="fit: merge ops")
    bp.add_argument("--min-count", type=int, default=1,
                    help="fit: word-frequency floor")
    bp.add_argument("--model", default=None, help="apply: merges JSON from fit")
    bp.add_argument("--text-col", default="text")
    bp.add_argument("--id-col", default="doc_id")
    bp.set_defaults(fn=cmd_bpe)

    ms = sub.add_parser(
        "msearch",
        help="federated BM25 over several indices (MultiReader stats union)",
    )
    ms.add_argument("--index", action="append", required=True,
                    help="member index dir (repeat per member)")
    ms.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    ms.add_argument("--out", required=True, help=".parquet")
    ms.add_argument("--method", choices=["exact", "bmw", "auto"], default="exact")
    ms.add_argument("--scoring", choices=["bm25", "ql", "lmjm", "tfidf"],
                    default="bm25")
    ms.add_argument("--top-k", type=int, default=10)
    ms.add_argument("--k1", type=float, default=1.2)
    ms.add_argument("--b", type=float, default=0.75)
    ms.set_defaults(fn=cmd_msearch)

    sg = sub.add_parser(
        "sigterms",
        help="significant terms of the top hits (JLH fg-vs-bg contrast)",
    )
    sg.add_argument("--index", required=True)
    sg.add_argument("--corpus", required=True, help="doc table parquet")
    sg.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    sg.add_argument("--out", required=True, help=".parquet")
    sg.add_argument("--fg-k", type=int, default=10, help="foreground size")
    sg.add_argument("--top-m", type=int, default=10, help="terms per query")
    sg.add_argument("--text-col", default="text")
    sg.add_argument("--id-col", default="doc_id")
    sg.add_argument("--k1", type=float, default=1.2)
    sg.add_argument("--b", type=float, default=0.75)
    sg.set_defaults(fn=cmd_sigterms)

    fc = sub.add_parser("facets", help="per-query facet counts")
    fc.add_argument("--index", required=True)
    fc.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    fc.add_argument("--facet-col", default="lang")
    fc.add_argument("--out", required=True, help=".parquet")
    fc.set_defaults(fn=cmd_facets)

    fs = sub.add_parser("facet-stats", help="terms bucket + nested stats metric")
    fs.add_argument("--index", required=True)
    fs.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    fs.add_argument("--facet-col", required=True)
    fs.add_argument("--metric-col", required=True)
    fs.add_argument("--top", type=int, default=None)
    fs.add_argument("--out", required=True, help=".parquet")
    fs.set_defaults(fn=cmd_facet_stats)

    fr = sub.add_parser("fragments", help="multi-fragment highlighting")
    fr.add_argument("--index", required=True)
    fr.add_argument("--corpus", required=True)
    fr.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    fr.add_argument("--out", required=True, help=".parquet")
    fr.add_argument("--window", type=int, default=10)
    fr.add_argument("--n-fragments", type=int, default=3)
    fr.add_argument("--top-k", type=int, default=10)
    fr.add_argument("--k1", type=float, default=1.2)
    fr.add_argument("--b", type=float, default=0.75)
    fr.add_argument("--text-col", default="text")
    fr.add_argument("--id-col", default="doc_id")
    fr.set_defaults(fn=cmd_fragments)

    ud = sub.add_parser("unit-dedup", help="sentence-unit dedup stats")
    ud.add_argument("--corpus", required=True)
    ud.add_argument("--out", required=True, help="parquet dir")
    ud.add_argument("--min-count", type=int, default=2)
    ud.add_argument("--text-col", default="text")
    ud.add_argument("--id-col", default="doc_id")
    ud.set_defaults(fn=cmd_unit_dedup)

    up = sub.add_parser("url-dedup", help="canonical-URL dedup")
    up.add_argument("--corpus", required=True)
    up.add_argument("--out", required=True, help="parquet dir")
    up.add_argument("--url-col", default="url")
    up.add_argument("--id-col", default="doc_id")
    up.set_defaults(fn=cmd_url_dedup)

    si = sub.add_parser("sort-index", help="derived sort-order layer")
    si.add_argument("--index", required=True)
    si.add_argument("--col")
    si.add_argument("--ascending", action="store_true")
    si.add_argument("--key", action="append", default=[],
                    help="multi-key layer: col[:asc|:desc], repeatable")
    si.set_defaults(fn=cmd_sort_index)

    lb = sub.add_parser("lsh-build", help="persist a MinHash-LSH index")
    lb.add_argument("--corpus", required=True)
    lb.add_argument("--index", required=True)
    lb.add_argument("--num-perm", type=int, default=64)
    lb.add_argument("--bands", type=int, default=16)
    lb.add_argument("--shingle-k", type=int, default=3)
    lb.add_argument("--text-col", default="text")
    lb.add_argument("--id-col", default="doc_id")
    lb.set_defaults(fn=cmd_lsh_build)

    lp = sub.add_parser("lsh-probe", help="probe a persisted LSH index")
    lp.add_argument("--corpus", required=True, help="the increment")
    lp.add_argument("--index", required=True)
    lp.add_argument("--out", required=True, help="parquet dir")
    lp.add_argument("--min-jaccard", type=float, default=0.5)
    lp.add_argument("--text-col", default="text")
    lp.add_argument("--id-col", default="doc_id")
    lp.set_defaults(fn=cmd_lsh_probe)

    la = sub.add_parser("lsh-append", help="append an increment to an LSH index")
    la.add_argument("--corpus", required=True, help="the increment")
    la.add_argument("--index", required=True)
    la.add_argument("--tag", required=True,
                    help="increment tag (crash-idempotent; unique per increment)")
    la.add_argument("--text-col", default="text")
    la.add_argument("--id-col", default="doc_id")
    la.set_defaults(fn=cmd_lsh_append)

    lc = sub.add_parser("lsh-compact", help="compact an LSH index's files")
    lc.add_argument("--index", required=True)
    lc.set_defaults(fn=cmd_lsh_compact)

    sd = sub.add_parser("semdedup", help="embedding semantic dedup")
    sd.add_argument("--embeddings", required=True)
    sd.add_argument("--out", required=True, help="parquet dir")
    sd.add_argument("--n-clusters", type=int, default=16)
    sd.add_argument("--threshold", type=float, default=0.95)
    sd.add_argument("--id-col", default="vec_id")
    sd.add_argument("--emb-col", default="embedding")
    sd.set_defaults(fn=cmd_semdedup)

    dv = sub.add_parser("dv", help="doc-values: range filter / sort / count / histogram")
    dv.add_argument("--index", required=True)
    dv.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    dv.add_argument("--out", required=True, help=".parquet")
    dv.add_argument("--mode", choices=["range", "sort", "count", "hist", "stats"],
                    default="range")
    dv.add_argument("--col", default="n_chars",
                    help="sidecar numeric column (build with extra_doc_cols)")
    dv.add_argument("--lo", default=None,
                    help="range lower bound (numeric, or string for a "
                         "lexicographic TermRangeQuery)")
    dv.add_argument("--hi", default=None, help="range upper bound")
    dv.add_argument("--sort-keys", default=None,
                    help="sort mode: multi-key spec col:asc|desc,col2:...")
    dv.add_argument("--interval", type=int, default=100)
    dv.add_argument("--ascending", action="store_true")
    dv.add_argument("--top-k", type=int, default=10)
    dv.add_argument("--k1", type=float, default=1.2)
    dv.add_argument("--b", type=float, default=0.75)
    dv.set_defaults(fn=cmd_dv)

    sy = sub.add_parser("synsearch", help="BM25 with synonym groups (SynonymQuery)")
    sy.add_argument("--index", required=True)
    sy.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    sy.add_argument("--synonyms", required=True,
                    help="JSON: {term: [synonym, ...]} in analyzed-term space")
    sy.add_argument("--out", required=True, help=".parquet")
    sy.add_argument("--top-k", type=int, default=10)
    sy.add_argument("--k1", type=float, default=1.2)
    sy.add_argument("--b", type=float, default=0.75)
    sy.set_defaults(fn=cmd_synsearch)

    ex = sub.add_parser("explain", help="per-term score breakdown (Lucene explain)")
    ex.add_argument("--index", required=True)
    ex.add_argument("--queries", required=True, help="TSV: id\\tquery text")
    ex.add_argument("--doc-ids", required=True, help="comma-separated doc ids")
    ex.add_argument("--out", required=True, help=".parquet")
    ex.add_argument("--scoring", choices=["bm25", "ql", "lmjm", "tfidf", "dfr"],
                    default="bm25")
    ex.add_argument("--mu", type=float, default=2000.0)
    ex.add_argument("--lam", type=float, default=0.1)
    ex.add_argument("--dfr-c", type=float, default=1.0)
    ex.add_argument("--k1", type=float, default=1.2)
    ex.add_argument("--b", type=float, default=0.75)
    ex.set_defaults(fn=cmd_explain)

    pc = sub.add_parser("percolate", help="reverse search: doc stream vs stored queries")
    pc.add_argument("--corpus", required=True)
    pc.add_argument("--queries", required=True, help="TSV: id\\tquery text (stored)")
    pc.add_argument("--out", required=True, help=".parquet of (doc_id, query_id)")
    pc.add_argument("--match", choices=["all", "any"], default="all")
    pc.add_argument("--text-col", default="text")
    pc.add_argument("--id-col", default="doc_id")
    pc.set_defaults(fn=cmd_percolate)

    dl = sub.add_parser("delete", help="tombstone docs (logical delete)")
    dl.add_argument("--index", required=True)
    dl.add_argument("--doc-ids", default="", help="comma-separated doc ids")
    dl.add_argument("--query", default="",
                    help="delete-by-query: tombstone every matching doc")
    dl.add_argument("--match-mode", choices=["any", "all"], default="any",
                    help="query match semantics (OR / AND)")
    dl.set_defaults(fn=cmd_delete)

    pg = sub.add_parser("purge", help="physically remove tombstoned docs")
    pg.add_argument("--index", required=True)
    pg.set_defaults(fn=cmd_purge)

    tg = sub.add_parser("trigrams", help="build trigram layer (substring search)")
    tg.add_argument("--index", required=True)
    tg.add_argument("--max-df-frac", type=float, default=None,
                    help="drop posting bytes of trigrams in > this fraction "
                         "of a segment's docs (smaller layer, zero recall loss)")
    tg.set_defaults(fn=cmd_trigrams)

    gr = sub.add_parser("grep", help="substring/regex search (trigram-pruned or scan)")
    gr.add_argument("--index", help="trigram-pruned literal search over this index")
    gr.add_argument("--corpus", help="full-scan path (required for --regex)")
    gr.add_argument("--needles", required=True, help="TSV: id\\tneedle")
    gr.add_argument("--out", required=True, help=".parquet")
    gr.add_argument("--regex", action="store_true")
    gr.add_argument("--case-sensitive", action="store_true",
                    help="match exact case (default: case-insensitive)")
    gr.add_argument("--snippets", action="store_true",
                    help="add first-match position + char-window snippet "
                         "columns (index path only)")
    gr.add_argument("--width", type=int, default=30, help="snippet context chars")
    gr.add_argument("--id-col", default="doc_id")
    gr.add_argument("--text-col", default="text")
    gr.set_defaults(fn=cmd_grep)

    bq = sub.add_parser("boolsearch", help="boolean-filtered BM25 (must/should/must_not)")
    bq.add_argument("--index", required=True)
    bq.add_argument("--queries", required=True, help="JSON [[qid, {clauses}], ...]")
    bq.add_argument("--out", required=True, help="run.json or .parquet")
    bq.add_argument("--top-k", type=int, default=10)
    bq.add_argument("--k1", type=float, default=1.2)
    bq.add_argument("--b", type=float, default=0.75)
    bq.set_defaults(fn=cmd_boolsearch)

    sm = sub.add_parser("sample", help="deterministic hash sampling / split assignment")
    sm.add_argument("--corpus", required=True)
    sm.add_argument("--out", required=True)
    sm.add_argument("--mode",
                    choices=["hash", "split", "bottomk", "mix", "shards"],
                    default="hash")
    sm.add_argument("--n-shards", type=int, default=64,
                    help="shards mode: number of deterministic "
                         "training shards to write under --out")
    sm.add_argument("--group-col", default="lang",
                    help="mix mode: source-mixing group column")
    sm.add_argument("--alpha", type=float, default=0.5,
                    help="mix mode: temperature (p_g ~ n_g^alpha)")
    sm.add_argument("--rate", type=float, default=0.1, help="hash mode: keep fraction")
    sm.add_argument("--fractions", default="train=0.8,val=0.1,test=0.1",
                    help="split mode: name=frac,...")
    sm.add_argument("--k", type=int, default=1000,
                    help="bottomk/mix mode: sample size / mix target")
    sm.add_argument("--id-col", default="doc_id")
    sm.add_argument("--seed", type=int, default=0)
    sm.set_defaults(fn=cmd_sample)

    cf = sub.add_parser(
        "classify",
        help="hashed logistic-regression quality classifier (train/score)")
    cf.add_argument("action", choices=["train", "score"])
    cf.add_argument("--corpus", required=True)
    cf.add_argument("--model", required=True,
                    help="model .npz path (written by train, read by score)")
    cf.add_argument("--out", help="score: output parquet dir")
    cf.add_argument("--label-col", default="label")
    cf.add_argument("--text-col", default="text")
    cf.add_argument("--id-col", default="doc_id")
    cf.add_argument("--dim", type=int, default=1 << 16)
    cf.add_argument("--iters", type=int, default=30)
    cf.add_argument("--lr", type=float, default=2.0)
    cf.add_argument("--grad-method", choices=["dense", "sparse"],
                    default="dense")
    cf.add_argument("--min-score", type=float, default=None,
                    help="score: drop rows below this quality_score")
    cf.set_defaults(fn=cmd_classify)

    pr = sub.add_parser("profile", help="per-(segment, query) kernel profile")
    pr.add_argument("--index", required=True)
    pr.add_argument("--queries", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--top-k", type=int, default=10)
    pr.set_defaults(fn=cmd_profile)

    po = sub.add_parser("postings", help="dump a term's posting list")
    po.add_argument("--index", required=True)
    po.add_argument("--term", required=True)
    po.add_argument("--out", required=True)
    po.set_defaults(fn=cmd_postings)

    rgb = sub.add_parser("rag-build",
                         help="chunk the corpus + build the chunk index")
    rgb.add_argument("--corpus", required=True)
    rgb.add_argument("--index", required=True)
    rgb.add_argument("--size", type=int, default=256)
    rgb.add_argument("--overlap", type=int, default=32)
    rgb.add_argument("--text-col", default="content")
    rgb.add_argument("--id-col", default="doc_id")
    rgb.add_argument("--rows-per-segment", type=int, default=50_000)
    rgb.set_defaults(fn=cmd_rag_build)

    rgs = sub.add_parser("rag-search",
                         help="parent-ranked docs or chunk payloads")
    rgs.add_argument("--index", required=True)
    rgs.add_argument("--queries", required=True)
    rgs.add_argument("--out", required=True)
    rgs.add_argument("--chunks", action="store_true",
                     help="return top-k chunks with text instead of parents")
    rgs.add_argument("--score-mode", default="max",
                     choices=["max", "sum", "min", "avg", "count"])
    rgs.add_argument("--k1", type=float, default=1.2)
    rgs.add_argument("--b", type=float, default=0.75)
    rgs.add_argument("--top-k", type=int, default=10)
    rgs.set_defaults(fn=cmd_rag_search)

    an = sub.add_parser("ann", help="ANN: brute cosine / IVF / IVF-PQ")
    an.add_argument("--mode", choices=["build", "search", "brute"],
                    required=True)
    an.add_argument("--kind", choices=["ivf", "ivfpq"], default="ivfpq")
    an.add_argument("--embeddings", help="embeddings parquet (build/brute)")
    an.add_argument("--index", help="index dir (build/search)")
    an.add_argument("--queries", help="(query_id, embedding) parquet")
    an.add_argument("--out", help="run parquet (search/brute)")
    an.add_argument("--n-clusters", type=int, default=16)
    an.add_argument("--m", type=int, default=4)
    an.add_argument("--ks", type=int, default=16)
    an.add_argument("--sample-size", type=int, default=4096)
    an.add_argument("--residual", action="store_true",
                    help="IVFADC residual encoding (ivfpq build)")
    an.add_argument("--nprobe", type=int, default=4)
    an.add_argument("--top-k", type=int, default=10)
    an.set_defaults(fn=cmd_ann)

    al = sub.add_parser("alias", help="index alias registry (atomic swap)")
    al.add_argument("--registry", required=True)
    al.add_argument("--mode", choices=["set", "swap", "delete", "resolve",
                                       "list"], default="list")
    al.add_argument("--name", help="alias name")
    al.add_argument("--dirs", default="", help="comma-separated index dirs")
    al.set_defaults(fn=cmd_alias)

    sp = sub.add_parser("snapshot",
                        help="verified parallel index snapshot / restore")
    sp.add_argument("--mode", choices=["create", "verify", "restore"],
                    default="create")
    sp.add_argument("--index", help="index dir (create/restore)")
    sp.add_argument("--snap", required=True, help="snapshot dir")
    sp.add_argument("--base", default="",
                    help="previous snapshot dir: hard-link unchanged files")
    sp.add_argument("--force", action="store_true",
                    help="restore over a non-empty index dir")
    sp.set_defaults(fn=cmd_snapshot)

    rb = sub.add_parser("route-build",
                        help="hash-partitioned routed build (ES _routing)")
    rb.add_argument("--corpus", required=True)
    rb.add_argument("--index", required=True)
    rb.add_argument("--routing-col", required=True)
    rb.add_argument("--n-buckets", type=int, default=16)
    rb.add_argument("--text-col", default="content")
    rb.add_argument("--id-col", default="doc_id")
    rb.add_argument("--rows-per-segment", type=int, default=50_000)
    rb.set_defaults(fn=cmd_route_build)

    rs = sub.add_parser("route-search",
                        help="BM25 top-k over the routing values' buckets only")
    rs.add_argument("--index", required=True)
    rs.add_argument("--queries", required=True)
    rs.add_argument("--out", required=True)
    rs.add_argument("--routing", default="",
                    help="comma-separated routing values (empty = all buckets)")
    rs.add_argument("--k1", type=float, default=1.2)
    rs.add_argument("--b", type=float, default=0.75)
    rs.add_argument("--top-k", type=int, default=10)
    rs.set_defaults(fn=cmd_route_search)

    mt = sub.add_parser("maintain", help="compact to a segment budget (+ optional re-quantize)")
    mt.add_argument("--index", required=True)
    mt.add_argument("--max-segments", type=int, default=64)
    mt.add_argument("--purge", action="store_true",
                    help="fuse tombstone purging into the compaction rewrite")
    mt.add_argument("--quantize", action="store_true")
    mt.add_argument("--rederive", action="store_true",
                    help="re-derive ALL present layers (quantized/positions/"
                         "trigrams) under their recorded configs")
    mt.add_argument("--k1", type=float, default=1.2)
    mt.add_argument("--b", type=float, default=0.75)
    mt.set_defaults(fn=cmd_maintain)

    rr = sub.add_parser("rerank", help="second-pass rerank of a run file")
    rr.add_argument("--run", required=True, help="run.json or TREC 6-col run file")
    rr.add_argument("--queries", required=True, help="TSV: id\\ttext")
    rr.add_argument("--docs", required=True, help="doc table parquet (id, text)")
    rr.add_argument("--out", required=True, help="run.json or .parquet")
    rr.add_argument("--id-col", default="doc_id")
    rr.add_argument("--text-col", default="text")
    rr.add_argument("--top-k", type=int, default=None)
    rr.add_argument("--pairwise", action="store_true",
                    help="duoT5-style pairwise win-count aggregation")
    rr.set_defaults(fn=cmd_rerank)

    be = sub.add_parser(
        "beir-eval",
        help="BEIR dataset dir -> index -> retrieve -> self-hit filter -> metrics",
    )
    be.add_argument("--data", required=True, help="dir with corpus.jsonl/queries.jsonl/qrels/")
    be.add_argument("--work", required=True, help="work dir (corpus parquet + index)")
    be.add_argument("--split", default="test")
    be.add_argument("--method", choices=["exact", "bmw", "auto"], default="auto")
    be.add_argument("--top-k", type=int, default=10)
    be.add_argument("--k1", type=float, default=1.2)
    be.add_argument("--b", type=float, default=0.75)
    be.add_argument("--measures", default=None,
                    help="comma list of measure@k strings (default ndcg@10,recall@10)")
    be.add_argument("--out", default=None, help="write metrics JSON here")
    be.set_defaults(fn=cmd_beir_eval)

    dd = sub.add_parser(
        "dedup", help="duplicate clustering + survivor filter over a parquet corpus"
    )
    dd.add_argument("--corpus", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--lang-col", default="lang")
    dd.add_argument("--methods", default="exact,minhash",
                    help="comma list of exact|minhash|jaccard|containment")
    dd.add_argument("--min-est-jaccard", type=float, default=0.5)
    dd.add_argument("--min-jaccard", type=float, default=0.8)
    dd.add_argument("--min-containment", type=float, default=0.8,
                    help="containment method: max-containment threshold")
    dd.add_argument("--cont-k", type=int, default=5,
                    help="containment method: word-k-gram width")
    dd.add_argument("--cont-sketch-k", type=int, default=0,
                    help="containment method: bottom-k sketch size "
                         "(0 = complete profiles, exact)")
    dd.set_defaults(fn=cmd_dedup)

    cu = sub.add_parser(
        "curate",
        help="corpus curation: quality -> dedup -> dupspans -> decontam -> redact -> pack",
    )
    cu.add_argument("--corpus", required=True)
    cu.add_argument("--out", required=True)
    cu.add_argument("--stages", default="quality,dedup,decontam,redact,pack")
    cu.add_argument("--id-col", default="doc_id")
    cu.add_argument("--text-col", default="text")
    cu.add_argument("--lang-col", default="lang")
    cu.add_argument("--langs", default=None, help="comma allowlist, e.g. en,de")
    cu.add_argument("--min-words", type=int, default=50)
    cu.add_argument("--dedup-methods", default="exact")
    cu.add_argument("--min-est-jaccard", type=float, default=0.5)
    cu.add_argument("--eval-corpus", default=None,
                    help="parquet dir of held-out eval docs (decontam)")
    cu.add_argument("--eval-mod", type=int, default=10,
                    help="without --eval-corpus: doc_id %% MOD == 0 is the eval slice")
    cu.add_argument("-k", type=int, default=4, help="decontam gram width")
    cu.add_argument("--dup-k", type=int, default=20,
                    help="dupspans: min duplicated-substring length (tokens)")
    cu.add_argument("--dup-min-count", type=int, default=2,
                    help="dupspans: occurrences for a gram to count as duplicated")
    cu.add_argument("--dup-sharded", action="store_true",
                    help="dupspans: memory-bounded sharded gram set "
                         "(out/dupspans_work)")
    cu.add_argument("--dup-shards", type=int, default=8,
                    help="dupspans --dup-sharded: gram-set shard count")
    cu.add_argument("--lsh-index", default=None,
                    help="lshdedup: persisted MinHash-LSH index dir "
                         "(default out/lsh_index)")
    cu.add_argument("--lsh-min-est", type=float, default=0.5,
                    help="lshdedup: min estimated jaccard vs the index")
    cu.add_argument("--lsh-tag", default=None,
                    help="lshdedup: increment tag (default: corpus-path hash)")
    cu.add_argument("--budget", type=int, default=512, help="tokens per pack")
    cu.add_argument("--dsir-target", default=None,
                    help="parquet dir of target-domain docs (dsir stage)")
    cu.add_argument("--dsir-keep", type=int, default=1000,
                    help="dsir: docs kept by Gumbel top-k")
    cu.add_argument("--dsir-buckets", type=int, default=65536)
    cu.add_argument("--ppl-target", default=None,
                    help="parquet dir of reference docs (ppl stage LM fit)")
    cu.add_argument("--ppl-max", type=float, default=1e6,
                    help="ppl stage: keep docs with perplexity <= this")
    cu.add_argument("--ppl-buckets", type=int, default=65536)
    cu.add_argument("--seed", type=int, default=0,
                    help="dsir: Gumbel hash seed (deterministic)")
    cu.add_argument("--dry-run", action="store_true",
                    help="sample-only row-flow estimate; writes nothing "
                         "durable, mutates no shared index")
    cu.add_argument("--dry-sample", type=int, default=2000,
                    help="--dry-run: docs sampled from the corpus head")
    cu.set_defaults(fn=cmd_curate)

    a = sub.add_parser("all", help="build -> query -> evaluate")
    a.add_argument("--corpus", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--queries", required=True)
    a.add_argument("--qrel", default=None)
    a.add_argument("--out", required=True)
    a.add_argument("--text-col", default="content")
    a.add_argument("--id-col", default=None)
    a.add_argument("--rows-per-segment", type=int, default=50_000)
    a.add_argument("--block-size", type=int, default=128)
    a.add_argument("--method", choices=["exact", "bmw", "auto"], default="auto")
    a.add_argument("--top-k", type=int, default=10)
    a.add_argument("--threshold", type=float, default=0.0)
    a.add_argument("--k1", type=float, default=1.2)
    a.add_argument("--b", type=float, default=0.75)
    a.set_defaults(fn=cmd_all)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
