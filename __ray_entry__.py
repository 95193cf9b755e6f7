"""Driver contract: entry() smoke, queries() Ray pipelines, oracle_sql() DuckDB mirrors.

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ray.init()/ray.shutdown().

Column names in each queries() entry match its oracle_sql() entry exactly;
floats are rounded on BOTH sides with floor(x*1e4+0.5)/1e4 (round-half-up,
identical in numpy and SQL) so value hashes compare.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from splade_ray.analysis import TOKEN_SQL, doc_stats_batch, postings_batch, term_counts
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.pipelines.flagship import FLAGSHIP_QUERIES, run_flagship
from splade_ray.query import search

K1, B = 1.2, 0.75
TOP_K = 10
# Segment size for every oracle index build — env-overridable so the
# full-suite oracle check can run at a SECOND segmentation (results must
# be segmentation-invariant; round-3 VERDICT item 1's sweep protocol):
#   GRAFT_SEGMENT_ROWS=350 python scripts/check_oracle.py ...
SEGMENT_ROWS = int(os.environ.get("GRAFT_SEGMENT_ROWS", "1000"))

# Fixed query set shared by the Ray pipelines and the SQL oracles.
BM25_QUERIES = FLAGSHIP_QUERIES


def _rpq(*a, **kw):
    from splade_ray.io import read_parquet_clean

    return read_parquet_clean(*a, **kw)


def _docs(sf_dir: str, columns=None):
    from splade_ray.io import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _round4_sql(expr: str) -> str:
    return f"floor(({expr}) * 10000 + 0.5) / 10000"


def _round4(a):
    return np.floor(np.asarray(a, np.float64) * 1e4 + 0.5) / 1e4


def _stable_rank(out: pd.DataFrame, tie_cols: list[str], *,
                 score_col: str = "score_r",
                 part_cols: tuple[str, ...] = ("query_id",),
                 k: int | None = None) -> pd.DataFrame:
    """Repo-wide oracle tie-stability convention (round-3 VERDICT item 1):
    rank is recomputed from the ROUNDED score desc + deterministic tie
    keys asc, and the top-k cut applies only after that re-rank — so both
    the engine and the DuckDB mirror rank identically even when raw float
    order within a rounded-tie cohort is ulp-unstable (numpy vs duckdb
    ln()/pow() differ by 1 ulp). Callers fetch the FULL match set first;
    every SQL twin orders by the same rounded expression."""
    asc = [True] * len(part_cols) + [False] + [True] * len(tie_cols)
    out = out.sort_values([*part_cols, score_col, *tie_cols],
                          ascending=asc, kind="mergesort")
    out["rank"] = (out.groupby(list(part_cols)).cumcount() + 1).astype(np.int64)
    if k is not None:
        out = out[out["rank"] <= k]
    return out.reset_index(drop=True)


def _work_dir(sf_dir: str, tag: str) -> str:
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    # segmentation participates in the cache key: an index built at one
    # rows_per_segment must never be silently reused at another (build
    # resume would skip all segments and hide the override)
    seg = "" if SEGMENT_ROWS == 1000 else f"-s{SEGMENT_ROWS}"
    d = f"/tmp/splade_ray_work/{tag}-{key}{seg}"
    os.makedirs(d, exist_ok=True)
    return d


def _index_for(sf_dir: str) -> str:
    """Build (or reuse, via segment manifests) the index over `documents`."""
    index_dir = os.path.join(_work_dir(sf_dir, "docsidx"), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        text_col="text",
        id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS,
        block_size=64,
    )
    return index_dir


# --------------------------------------------------------------------------
# queries
# --------------------------------------------------------------------------


def q_postings_flat(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        postings_batch, batch_format="pyarrow", batch_size=512
    )


def q_lexicon(sf_dir: str):
    """Global (term, df, cf) built through the salted groupby(term) posting
    store (splade_ray.term_index) — exercises the north rule's skew-handled
    wide step inside the correctness gate."""
    from splade_ray.term_index import build_term_index

    flat = q_postings_flat(sf_dir)
    tindex = build_term_index(flat, salt_range=200)
    return tindex.select_columns(["term", "df", "cf"])


def q_postings_flat_by_lang(sf_dir: str):
    """Flat postings through the per-language analyzer registry: zh keeps
    han-run tokens, fr/es/de keep accented letters inside tokens, code langs
    split identifiers on underscores (splade_ray.analysis.ANALYZERS; the
    reference's per-collection tokenizer config analog,
    conf/train/config/splade.yaml + dataloaders.py:89-101)."""
    from splade_ray.analysis import postings_by_lang_batch

    return _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        postings_by_lang_batch, batch_format="pyarrow", batch_size=512
    )


def _by_lang_toks_sql() -> str:
    """CTE mirroring the analyzer registry: one UNION ALL branch per distinct
    rendered analyzer (token class + filter chain, via analyzer_sql) + the
    default fallback — generated FROM the registry so SQL and Ray can't
    drift."""
    from splade_ray.analysis import ANALYZERS, analyzer_sql

    groups: dict[str, list[str]] = {}
    for lang in sorted(ANALYZERS):
        groups.setdefault(analyzer_sql(lang), []).append(lang)
    branches = []
    for expr in sorted(groups):
        langs_in = ", ".join(f"'{lang}'" for lang in sorted(groups[expr]))
        branches.append(
            f"SELECT doc_id, unnest({expr}) AS term\n"
            f"  FROM documents WHERE lang IN ({langs_in})"
        )
    all_in = ", ".join(f"'{lang}'" for lang in sorted(ANALYZERS))
    branches.append(
        f"SELECT doc_id, unnest({analyzer_sql(None)}) AS term\n"
        f"  FROM documents WHERE lang NOT IN ({all_in})"
    )
    body = "\n  UNION ALL\n".join(branches)
    return f"toksl AS (\n{body}\n)"


SNIPPET_WINDOW = 10


FRAG_WINDOW, FRAG_N = 8, 3


def q_highlight_fragments(sf_dir: str):
    """Multi-fragment highlighting (snippets.fragments_for_run; ES
    highlight number_of_fragments>1 / Lucene SimpleFragmenter): per
    (query, top-k doc) the best FRAG_N fixed FRAG_WINDOW-token tiles by
    (n_match desc, start asc) — all-integer selection over the unified
    sliding kernel's hit mask, zero-match tiles dropped."""
    from splade_ray.snippets import fragments_for_run

    run = _bm25_run(sf_dir, "exact")
    out = fragments_for_run(
        os.path.join(sf_dir, "documents.parquet"), run, BM25_QUERIES,
        window=FRAG_WINDOW, n_fragments=FRAG_N,
    )
    for c in ("frag_rank", "start", "n_match"):
        out[c] = out[c].astype(np.int64)
    return out


def q_snippets_topk(sf_dir: str):
    """Keyword-in-context snippets (splade_ray.snippets) over the exact BM25
    run: per (query, doc) hit, the {W}-token window with the most query-term
    occurrences (tie -> smallest 1-based start), text fetched with the
    pushdown isin scan. All output columns integer/string — compared
    bit-exactly against the SQL sliding-window mirror."""
    from splade_ray.snippets import snippets_for_run

    # hit membership from the tie-stable run (matches the SQL mirror's
    # rounded ranked CTE)
    run = _bm25_run(sf_dir, "exact")
    out = snippets_for_run(
        os.path.join(sf_dir, "documents.parquet"),
        run,
        BM25_QUERIES,
        window=SNIPPET_WINDOW,
    )
    out["start"] = out["start"].astype(np.int64)
    out["n_match"] = out["n_match"].astype(np.int64)
    return out


def q_snippets_topk_distinct(sf_dir: str):
    """Distinct-coverage snippets (snippets.best_window_distinct): windows
    covering more DISTINCT query terms win, occurrences break ties, then
    smallest start — the production-highlighter ordering."""
    from splade_ray.snippets import snippets_for_run

    # hit membership from the tie-stable run (matches the SQL mirror's
    # rounded ranked CTE)
    run = _bm25_run(sf_dir, "exact")
    out = snippets_for_run(
        os.path.join(sf_dir, "documents.parquet"),
        run,
        BM25_QUERIES,
        window=SNIPPET_WINDOW,
        mode="distinct",
    )
    for c in ("start", "n_distinct", "n_match"):
        out[c] = out[c].astype(np.int64)
    return out


def q_snippets_topk_sentence(sf_dir: str):
    """Sentence-aligned snippets (snippets.best_window_sentence): the
    distinct-coverage ordering plus a preference for windows starting at a
    sentence boundary (split on [.!?\\n]+) — the readability tie-break
    production highlighters apply."""
    from splade_ray.snippets import snippets_for_run

    # hit membership from the tie-stable run (matches the SQL mirror's
    # rounded ranked CTE)
    run = _bm25_run(sf_dir, "exact")
    out = snippets_for_run(
        os.path.join(sf_dir, "documents.parquet"),
        run,
        BM25_QUERIES,
        window=SNIPPET_WINDOW,
        mode="sentence",
    )
    for c in ("start", "n_distinct", "n_match", "aligned"):
        out[c] = out[c].astype(np.int64)
    return out


FIELD_TITLE_NTOK = 8  # title field = first N body tokens (deterministic derivation)
FIELD_WEIGHTS = {"text": 1.0, "title": 2.5}


def _fielded_index_dirs(sf_dir: str) -> dict[str, str]:
    """Two aligned per-field indexes over documents: text = full body,
    title = first {FIELD_TITLE_NTOK} tokens (deterministic derivation so the
    SQL oracle can mirror the field exactly)."""
    from splade_ray.analysis import TOKEN_RE

    work = _work_dir(sf_dir, "fieldedidx")
    corpus_dir = os.path.join(work, "corpus")
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        def add_title(batch: pa.Table) -> pa.Table:
            titles = [
                " ".join(TOKEN_RE.findall((t or "").lower())[:FIELD_TITLE_NTOK])
                for t in batch["text"].to_pylist()
            ]
            return batch.append_column("title", pa.array(titles, pa.string()))

        tmp = corpus_dir + ".tmp"
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            add_title, batch_format="pyarrow", batch_size=512
        ).write_parquet(tmp)
        os.rename(tmp, corpus_dir)
    dirs = {}
    for field in ("text", "title"):
        d = os.path.join(work, f"idx-{field}")
        build_index(
            corpus_dir, d, text_col=field, id_col="doc_id",
            rows_per_segment=SEGMENT_ROWS, block_size=64,
        )
        dirs[field] = d
    return dirs


def q_bm25f_topk(sf_dir: str):
    """Fielded BM25 (query.search_fielded): score = w_text·BM25_text +
    w_title·BM25_title over two aligned per-field indexes, each with its own
    df/doclen/avgdl — the weighted multi-field query a code-corpus user runs
    over (path, content)."""
    from splade_ray.query import search_fielded

    run = search_fielded(
        _fielded_index_dirs(sf_dir), BM25_QUERIES, FIELD_WEIGHTS,
        BM25Params(k1=K1, b=B, top_k=10**9),
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


DISMAX_TIE = 0.3


def q_dismax_topk(sf_dir: str):
    """DisjunctionMaxQuery (Lucene / ES best_fields multi_match) over the
    same aligned per-field indexes: score = max_f(w_f·BM25_f) +
    tie_breaker·Σ_other — the best-matching field dominates instead of
    double-counting a term that hits both title and body."""
    from splade_ray.query import search_fielded

    run = search_fielded(
        _fielded_index_dirs(sf_dir), BM25_QUERIES, FIELD_WEIGHTS,
        BM25Params(k1=K1, b=B, top_k=10**9), mode="dismax",
        tie_breaker=DISMAX_TIE,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_bm25f_true_topk(sf_dir: str):
    """TRUE BM25F (Robertson & Zaragoza 2004; query.ScoreBM25FSegments):
    per-field tf length-normalized and weight-folded into one
    pseudo-frequency BEFORE k1 saturation, idf over the document-level union
    df (term in ANY field) computed by a pushdown pass over the query
    terms' postings."""
    from splade_ray.query import search_fielded

    run = search_fielded(
        _fielded_index_dirs(sf_dir), BM25_QUERIES, FIELD_WEIGHTS,
        BM25Params(k1=K1, b=B, top_k=10**9), mode="bm25f",
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_cross_fields_topk(sf_dir: str):
    """cross_fields multi_match (query.ScoreCrossFieldsSegments; Lucene
    BlendedTermQuery): term-centric — per term the BEST weighted per-field
    tf component under one blended idf (df = max over fields), summed over
    terms. Oracle-checked WITHOUT a rank cut: the near-constant title field
    (dl = 8 for most docs) makes large exact-tie cohorts straddle any
    top-k boundary, and duckdb-vs-numpy ln() differs by 1 ulp — so this
    entry verifies the full scored match set (query_id, doc_id, score_r);
    the top-k contract itself is covered by the other *_topk oracles and
    the fielded unit tests."""
    from splade_ray.query import search_fielded

    run = search_fielded(
        _fielded_index_dirs(sf_dir), BM25_QUERIES, FIELD_WEIGHTS,
        BM25Params(k1=K1, b=B, top_k=10_000_000), mode="cross_fields",
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = out.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
    return out[["query_id", "doc_id", "score_r"]]


def q_doc_token_stats(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        doc_stats_batch, batch_format="pyarrow", batch_size=512
    )


def _bm25_run(sf_dir: str, method: str) -> pd.DataFrame:
    index_dir = _index_for(sf_dir)
    run = search(index_dir, BM25_QUERIES,
                 BM25Params(k1=K1, b=B, top_k=10**9), method=method)
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_bm25_topk(sf_dir: str):
    return _bm25_run(sf_dir, "exact")


def q_search_after_page2(sf_dir: str):
    """Deep pagination (Lucene IndexSearcher.searchAfter / ES search_after):
    page 1's last (sort_value, doc_id) row per query becomes the exclusive
    cursor; page 2 holds the next TOP_K rows strictly after it in the
    (n_chars desc, doc_id asc) sort order, ranks restarting at 1. The
    cursor filter applies inside each segment BEFORE its top-k cut, so
    deep pages stay exact without over-fetching. (The integer sort key
    makes the page boundary ulp-stable; BM25 float-score pagination is
    covered by engine-internal parity tests in tests/test_ql.py.)"""
    from splade_ray.docvalues import sort_search

    idx = _dv_index(sf_dir)
    page1 = sort_search(
        idx, BM25_QUERIES, sort_col="n_chars", descending=True, top_k=TOP_K,
    )
    cursors = {
        int(qid): (int(g["sort_value"].iloc[-1]), int(g["doc_id"].iloc[-1]))
        for qid, g in page1.groupby("query_id")
    }
    out = sort_search(
        idx, BM25_QUERIES, sort_col="n_chars", descending=True, top_k=TOP_K,
        after=cursors,
    )
    out = out.copy()
    out["rank"] = out["rank"].astype(np.int64)
    out["sort_value"] = out["sort_value"].astype(np.int64)
    return out


QL_MU = 2000.0

# prefix / fuzzy expansion probes (misspellings + prefixes of corpus terms)
SUGGEST_QUERIES = [(1, "qery"), (2, "jion"), (3, "streem")]
PREFIX_QUERIES = [(1, "s"), (2, "qu"), (3, "win")]
SUGG_MAXD = 2
SUGG_M = 5
FUZZY_MAX_TERMS = 16
PREFIX_MAX_TERMS = 128


def q_suggest_terms(sf_dir: str):
    """Did-you-mean suggestions (splade_ray.suggest.suggest_terms): per probe
    the top-SUGG_M lexicon terms by (levenshtein asc, df desc, term asc)
    within SUGG_MAXD — streamed over the lexicon with the vectorized DP."""
    from splade_ray.suggest import suggest_terms

    return suggest_terms(
        _index_for(sf_dir), SUGGEST_QUERIES, max_dist=SUGG_MAXD, m=SUGG_M
    )


def q_prefix_topk(sf_dir: str):
    """PrefixQuery retrieval (suggest.prefix_search): pushdown lexicon range
    expansion (ascending, capped) -> BM25 OR-query with qtf=1 per term."""
    from splade_ray.suggest import prefix_search

    run = prefix_search(
        _index_for(sf_dir), PREFIX_QUERIES,
        BM25Params(k1=K1, b=B, top_k=10**9), max_terms=PREFIX_MAX_TERMS,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_fuzzy_topk(sf_dir: str):
    """FuzzyQuery retrieval (suggest.fuzzy_search): edit-distance expansion
    under the pinned suggestion ordering -> BM25 OR-query, qtf=1."""
    from splade_ray.suggest import fuzzy_search

    run = fuzzy_search(
        _index_for(sf_dir), SUGGEST_QUERIES,
        BM25Params(k1=K1, b=B, top_k=10**9),
        max_dist=SUGG_MAXD, max_terms=FUZZY_MAX_TERMS,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


LMJM_LAM = 0.3


def q_lmjm_topk(sf_dir: str):
    """Jelinek-Mercer query-likelihood retrieval (query.search
    scoring='lmjm'; Lucene LMJelinekMercerSimilarity):
    qtf * ln(1 + ((1-lam)*tf/dl) / (lam*cf/C)) over matching terms —
    third member of the similarity registry, same scatter-gather skeleton
    and (score desc, doc_id asc) run contract."""
    run = search(
        _index_for(sf_dir), BM25_QUERIES, BM25Params(top_k=10**9),
        scoring="lmjm", lam=LMJM_LAM,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# Damerau queries: transpositions that plain Levenshtein counts as 2
SUGGEST_DL_QUERIES = [(1, "sprak"), (2, "qeury"), (3, "valeu"), (4, "wnidow")]


def q_suggest_dl(sf_dir: str):
    """Damerau-Levenshtein suggestion (suggest_terms transpositions=True;
    the Lucene FuzzyQuery default metric): adjacent swaps count one edit,
    computed by the vectorized unrestricted-DL tensor DP (duckdb
    damerau_levenshtein mirrors it exactly)."""
    from splade_ray.suggest import suggest_terms

    return suggest_terms(
        _index_for(sf_dir), SUGGEST_DL_QUERIES, max_dist=SUGG_MAXD, m=SUGG_M,
        transpositions=True,
    )


def q_tfidf_topk(sf_dir: str):
    """Classic TF-IDF retrieval (query.search scoring='tfidf'; Lucene
    ClassicSimilarity with queryNorm/coord dropped as in Lucene 7+):
    qtf * (1 + ln(n/(df+1)))^2 * sqrt(tf) / sqrt(dl) — fourth member of
    the similarity registry."""
    run = search(
        _index_for(sf_dir), BM25_QUERIES, BM25Params(top_k=10**9),
        scoring="tfidf",
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


DFR_C = 1.0


def q_dfr_topk(sf_dir: str):
    """Divergence-from-randomness retrieval (query.search scoring='dfr';
    Lucene DFRSimilarity InL2 = BasicModelIn + AfterEffectL +
    NormalizationH2): qtf * log2((N+1)/(df+0.5)) * tfn/(tfn+1) with
    tfn = tf*log2(1 + c*avgdl/dl) — fifth member of the similarity
    registry, same scatter-gather skeleton and run contract."""
    run = search(
        _index_for(sf_dir), BM25_QUERIES, BM25Params(top_k=10**9),
        scoring="dfr", dfr_c=DFR_C,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_ql_topk(sf_dir: str):
    """Dirichlet query-likelihood retrieval (query.search scoring='ql'):
    qtf * max(0, ln(1 + tf/(mu*cf/C)) + ln(mu/(dl+mu))) over matching terms
    (Zhai & Lafferty 2001; Lucene LMDirichletSimilarity shape) — the second
    member of the similarity registry, same scatter-gather skeleton."""
    index_dir = _index_for(sf_dir)
    run = search(
        index_dir, BM25_QUERIES, BM25Params(top_k=10**9), scoring="ql", mu=QL_MU
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# deterministic deletion set for the tombstone/purge faces
def _delete_ids(index_dir: str) -> list[int]:
    from splade_ray.build import load_manifest

    n = load_manifest(index_dir)["n_docs"]
    return list(range(3, n, 7))  # doc_id % 7 == 3


def _run_with_deletes(sf_dir: str, tag: str, purge: bool) -> pd.DataFrame:
    """Own index copy under a distinct work dir (never mutates the shared
    docsidx index the other query faces reuse)."""
    from splade_ray.delete import delete_docs, purge_deletes

    index_dir = os.path.join(_work_dir(sf_dir, tag), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        text_col="text",
        id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS,
        block_size=64,
    )
    delete_docs(index_dir, _delete_ids(index_dir))
    if purge:
        purge_deletes(index_dir)
    run = search(index_dir, BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9))
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_bm25_topk_deleted(sf_dir: str):
    """Tombstoned retrieval (splade_ray.delete): deleted docs are filtered
    out of every decoded posting BEFORE the per-segment top-k cut while
    df/avgdl/N keep build-time values — Lucene's visible-deletes-before-
    merge semantics, mirrored in SQL by excluding deleted docs from the
    full-statistics score table before ranking."""
    return _run_with_deletes(sf_dir, "delidx", purge=False)


def q_bm25_topk_purged(sf_dir: str):
    """Physically purged retrieval: segments rewritten without the deleted
    docs, lexicon + avgdl/N restated — scores must equal BM25 over the
    reduced corpus (the SQL mirror computes every statistic over the live
    doc set)."""
    return _run_with_deletes(sf_dir, "purgeidx", purge=True)


def q_bm25_topk_bmw(sf_dir: str):
    """Same result, block-max WAND early-termination kernel."""
    return _bm25_run(sf_dir, "bmw")


def q_bm25_topk_quantized(sf_dir: str):
    """Quantized in-index scoring (the reference's PISA quantized recipe,
    efficient_splade_pisa/README.md:48-60): integer impact accumulation over
    the derived postings_q layer; score_q = Σ qtf·impact_q is an exact
    BIGINT, oracle-compared without any float rounding."""
    from splade_ray.quantized import build_quantized_postings

    index_dir = _index_for(sf_dir)
    build_quantized_postings(index_dir, BM25Params(k1=K1, b=B), factor=100)
    run = search(
        index_dir, BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=TOP_K),
        method="quantized",
    )
    out = run.copy()
    out["score_q"] = out["score"].to_numpy(np.float64).astype(np.int64)
    out["rank"] = out["rank"].astype(np.int64)
    return out[["query_id", "rank", "doc_id", "score_q"]]


def q_bm25_topk_by_lang(sf_dir: str):
    """End-to-end BM25 over an index built with the per-language analyzer
    registry (build_index(lang_col="lang")): doc tokens follow each doc's
    registered token class, query text uses the collection-wide class."""
    index_dir = os.path.join(_work_dir(sf_dir, "docsidx-lang"), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        text_col="text",
        id_col="doc_id",
        lang_col="lang",
        rows_per_segment=SEGMENT_ROWS,
        block_size=64,
    )
    run = search(index_dir, BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9))
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def _bm25_by_lang_sql() -> str:
    """The bm25 oracle with the by-lang doc tokenization CTE substituted."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_by_lang_toks_sql()},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toksl GROUP BY doc_id, term),
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toksl GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


STEM_ANALYZER = "en_light"  # stopword removal + Harman s-stem (analysis.Analyzer)


def q_postings_flat_stemmed(sf_dir: str):
    """Flat postings through a token-FILTER chain (the Lucene TokenFilter
    analog): the registered en_light analyzer = 33-word English stop set +
    the Harman (1991) s-stemmer, both vectorized Arrow kernels whose DuckDB
    mirror is rendered from the SAME registry entry (analysis.analyzer_sql)."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        postings_batch,
        batch_format="pyarrow",
        batch_size=512,
        fn_kwargs={"analyzer": STEM_ANALYZER},
    )


CODE_ANALYZER = "code"  # camelCase pre-split + underscore separator


def q_postings_flat_code(sf_dir: str):
    """Flat postings through the source-code analyzer (analysis.ANALYZERS
    'code'): camelCase pre-split BEFORE lowercasing (two RE2 boundary
    substitutions, the WordDelimiterGraphFilter splitOnCaseChange analog)
    + underscore as a separator. The DuckDB mirror is rendered from the
    SAME registry entry (analyzer_sql), including the regexp_replace
    chain, so the pre-split can't drift between engine and oracle."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        postings_batch,
        batch_format="pyarrow",
        batch_size=512,
        fn_kwargs={"analyzer": CODE_ANALYZER},
    )


def _postings_flat_code_sql() -> str:
    from splade_ray.analysis import analyzer_sql

    return f"""
WITH toks AS (SELECT doc_id, unnest({analyzer_sql(CODE_ANALYZER)}) AS term
  FROM documents)
SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term"""


def q_bm25_topk_stemmed(sf_dir: str):
    """End-to-end BM25 over an index built with one filtered analyzer for
    every doc (build_index(analyzer="en_light")): doc lengths count
    post-filter tokens, query text is analyzed through the SAME chain by
    default (the manifest records the analyzer)."""
    index_dir = os.path.join(_work_dir(sf_dir, "docsidx-stem"), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        text_col="text",
        id_col="doc_id",
        analyzer=STEM_ANALYZER,
        rows_per_segment=SEGMENT_ROWS,
        block_size=64,
    )
    run = search(index_dir, BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9))
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def _stemmed_toks_sql() -> str:
    from splade_ray.analysis import analyzer_sql

    return (
        f"toks AS (SELECT doc_id, unnest({analyzer_sql(STEM_ANALYZER)}) AS term\n"
        f"  FROM documents)"
    )


def _postings_flat_stemmed_sql() -> str:
    return f"""
WITH {_stemmed_toks_sql()}
SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term"""


def _bm25_stemmed_sql() -> str:
    """The bm25 oracle with the en_light tokenization CTE substituted on BOTH
    sides (doc tf/dl AND the query-term VALUES)."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text, STEM_ANALYZER).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_stemmed_toks_sql()},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def q_collection_stats(sf_dir: str):
    """Collection-level stats — the index_stats.json analog (mean L0 of doc
    reps + avgdl; transformer_evaluator.py:43-44,55-56,63-65)."""
    from ray.data.aggregate import Count, Mean

    agg = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(doc_stats_batch, batch_format="pyarrow", batch_size=512)
        .aggregate(
            Count(alias_name="n_docs"),
            Mean("n_tokens", alias_name="avgdl"),
            Mean("n_distinct", alias_name="mean_l0"),
        )
    )
    return pd.DataFrame(
        {
            "n_docs": np.array([agg["n_docs"]], np.int64),
            "avgdl_r": _round4([agg["avgdl"]]),
            "mean_l0_r": _round4([agg["mean_l0"]]),
        }
    )


def q_docs_per_lang(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    return (
        _docs(sf_dir, ["lang", "n_chars"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="total_chars"))
    )


def q_dedup_exact(sf_dir: str):
    from splade_ray.ops.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def q_dedup_incremental(sf_dir: str):
    """Cross-corpus incremental dedup (ops/dedup.incremental_dedup,
    shuffle method): new docs (the whole table) anti-joined by content
    hash against a reference slice (doc_id % 10 == 0) — only
    (sha-prefix, sha, id, side) rows shuffle, grouped by the coarse
    4-hex prefix; texts never move."""
    from splade_ray.ops.dedup import incremental_dedup

    def ref_slice(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % 10 == 0))

    new = _docs(sf_dir, ["doc_id", "text"])
    ref = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ref_slice, batch_format="pyarrow"
    )
    out = incremental_dedup(new, ref, method="shuffle").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_prune_topk(sf_dir: str):
    """Per-doc top-8 terms by tf (tie: term asc) — the reference's per-doc
    top-k vector pruning (pruning/prune_doc_index.py:17-19), doc-local."""

    def prune(batch: pa.Table) -> pa.Table:
        flat = postings_batch(batch)
        df = flat.to_pandas()
        df = df.sort_values(["doc_id", "tf", "term"], ascending=[True, False, True])
        df = df.groupby("doc_id", sort=False).head(8)
        return pa.Table.from_pandas(df[["doc_id", "term", "tf"]], preserve_index=False)

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        prune, batch_format="pyarrow", batch_size=512
    )


def _impacts(sf_dir: str):
    from splade_ray.prune import quantized_impacts

    return quantized_impacts(
        _docs(sf_dir, ["doc_id", "text"]), BM25Params(k1=K1, b=B), factor=100
    )


def q_quantized_export(sf_dir: str):
    """Anserini-style quantized impact export (transformer_evaluator.py:228-235,
    factor 100): impact_q = floor(idf * bm25_tf_component * 100 + 0.5), >0 kept."""
    return _impacts(sf_dir)


def q_quantized_export_join(sf_dir: str):
    """Same quantization through the unbounded-vocabulary data flow: df via
    term-keyed hash join, no vocab-sized broadcast (round-1 VERDICT item 2)."""
    from splade_ray.prune import quantized_impacts

    return quantized_impacts(
        _docs(sf_dir, ["doc_id", "text"]), BM25Params(k1=K1, b=B), factor=100,
        df_mode="join",
    )


def q_prune_value(sf_dir: str):
    """Min-value index pruning: keep impact_q > 0.5*100
    (pruning/prune_doc_index.py:12-14)."""
    from splade_ray.prune import prune_by_value

    return prune_by_value(_impacts(sf_dir), threshold=0.5)


def q_prune_quantile(sf_dir: str):
    """Per-term quantile pruning: keep impact_q > np.quantile(term impacts, .75)
    (pruning/prune_quantile.py:40-43,14-16) — groupby(term) pass + broadcast
    threshold filter."""
    from splade_ray.prune import prune_by_term_quantile

    return prune_by_term_quantile(_impacts(sf_dir), quantile=0.75)


def q_flops_metric(sf_dir: str):
    """FLOPS = Σ_t p_d(t)·p_q(t) over the fixed query set (splade/flops.py:55-60).

    Oracle-compared in EXACT integer form: the metric is the rational
    ``flops_num / (n_docs · n_queries)`` and its 4dp rounding can land
    exactly on a .5 floor boundary, where last-bit float-sum-order jitter
    (e.g. DuckDB parallel sums) flips the rounded value — so the numerator
    Σ_t df_d(t)·df_q(t) is emitted as a BIGINT instead."""
    from splade_ray.flops import flops_numerator

    num, n_docs = flops_numerator(_docs(sf_dir, ["doc_id", "text"]), BM25_QUERIES)
    return pd.DataFrame(
        {
            "flops_num": np.array([num], np.int64),
            "n_docs": np.array([n_docs], np.int64),
            "n_queries": np.array([len(BM25_QUERIES)], np.int64),
        }
    )


def _rerank_pairs(sf_dir: str):
    from splade_ray.rerank import rerank_input

    run = _bm25_run(sf_dir, "exact")
    # top-k-sized run -> predicate-pushdown read of the candidate doc rows
    return rerank_input(
        None, run, BM25_QUERIES,
        docs_path=os.path.join(sf_dir, "documents.parquet"),
    )


def q_rerank_input(sf_dir: str):
    """First-stage run ⋈ queries ⋈ documents candidate pairs with the
    self-hit filter (J1 + M13; splade/datasets/rerank.py:17-89,
    beir_eval.py:82-88)."""
    return _rerank_pairs(sf_dir)


def q_rerank_lexical(sf_dir: str):
    """Second-pass rerank by distinct-query-term overlap (actor-pool stage;
    T4 plumbing with a deterministic scorer, transformer_evaluator.py:270-374)."""
    from splade_ray.rerank import rerank

    out = rerank(_rerank_pairs(sf_dir))
    out["query_id"] = out["query_id"].astype(np.int64)
    out["new_rank"] = out["new_rank"].astype(np.int64)
    return out


def q_rerank_pairwise(sf_dir: str):
    """duoT5-style pairwise win-count aggregation over the scored candidates
    (transformer_evaluator.py:328-340), deterministic comparator = overlap."""
    from splade_ray.rerank import LexicalReranker, pairwise_rerank

    scored = (
        _rerank_pairs(sf_dir)
        .map_batches(LexicalReranker, batch_format="pyarrow", batch_size=512, concurrency=(1, 2))
        .to_pandas()
    )
    out = pairwise_rerank(scored)
    for c in ("query_id", "new_rank", "wins2", "rank"):
        out[c] = out[c].astype(np.int64)
    return out


def q_text_quality(sf_dir: str):
    from splade_ray.ops.textstats import quality_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_batch, batch_format="pyarrow", batch_size=512
    )


def q_gopher_rules(sf_dir: str):
    """Gopher-style quality-rule flags (ops/textstats.gopher_rules_batch):
    integer fact counts + the pass_gopher conjunction, all integer-exact
    and mirrored by RE2-identical DuckDB regex counts."""
    from splade_ray.ops.textstats import gopher_rules_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        gopher_rules_batch, batch_format="pyarrow", batch_size=512
    )


def q_c4_rules(sf_dir: str):
    """C4-style quality-rule flags (ops/textstats.c4_rules_batch): terminal-
    punctuation line counts, short-line counts, lorem/brace/javascript
    markers and the pass_c4 conjunction — integer-exact, RE2-shared."""
    from splade_ray.ops.textstats import c4_rules_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        c4_rules_batch, batch_format="pyarrow", batch_size=512
    )


def q_repetition(sf_dir: str):
    """Within-doc repetition stats (ops/textstats.repetition_batch): most
    frequent 2/3-gram (count + hash), duplicated-5-gram mass, and the
    Gopher-style repetition flags — every column an integer, a uint64 gram
    hash or an integer-exact flag, mirrored bit-for-bit by the HUGEINT
    rolling-fold SQL."""
    from splade_ray.ops.textstats import repetition_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        repetition_batch, batch_format="pyarrow", batch_size=512
    )


def q_token_counts(sf_dir: str):
    from splade_ray.ops.textstats import token_count_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_count_batch, batch_format="pyarrow", batch_size=512
    )


def q_top_terms(sf_dir: str):
    """Top 20 terms by collection frequency (cf desc, term asc) — the
    index_dist statistics view (inverted_index.py:90-94 analog)."""
    from ray.data.aggregate import Count, Sum

    flat = q_postings_flat(sf_dir)
    agg = flat.groupby("term").aggregate(
        Count(alias_name="df"), Sum("tf", alias_name="cf")
    )
    pdf = agg.to_pandas().sort_values(["cf", "term"], ascending=[False, True]).head(20)
    pdf = pdf.reset_index(drop=True)
    pdf["rank"] = np.arange(1, len(pdf) + 1, dtype=np.int64)
    return pdf[["rank", "term", "df", "cf"]]


# Fixed phrase set for the positional-index queries: drawn from the
# synthetic corpus's vocabulary so multi-token phrases actually occur;
# includes a single-term phrase (tf face) and a no-hit phrase.
PHRASE_QUERIES = [
    (1, "batch batch"),
    (2, "data line join"),
    (3, "merge part window"),
    (4, "spark"),
    (5, "the fast key order sort"),
    (6, "warehouse nonexistent"),
]

# Lucene classic query strings over the same vocabulary (parsed by
# splade_ray.qparser; expansions excluded — fuzzy_topk / wildcard_topk /
# prefix_topk oracle-check the multi-term rewrites separately).
QS_QUERIES = [
    (1, "spark window merge"),
    (2, '+data -dup "hash join"'),
    (3, '+"merge part" sort -"slow query"'),
    (4, "-spark customer key"),
    (5, '"batch batch" stream'),
    (6, '+filter +value "data line join"'),
]


def q_query_string(sf_dir: str):
    """Lucene classic query-string retrieval (splade_ray.qparser): one BM25
    ranking over term clauses (+must / -not / should) and phrase clauses as
    virtual terms, masks applied per segment before the cut; phrase global
    dfs from one positions pass (pass A)."""
    from splade_ray.positions import build_positions
    from splade_ray.qparser import query_string_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    run = query_string_search(
        index_dir, QS_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9)
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# CommonTermsQuery: at CT_CUTOFF=0.5 only 'dup' (df/N ~= 0.05) is
# low-frequency in the documents vocabulary; every other term is common
# (df/N ~= 0.75-0.8), so queries 1/3 gate on 'dup' and 2/4 exercise the
# all-common OR fallback.
CT_QUERIES = [
    (1, "dup window scan"),
    (2, "the slow query"),
    (3, "spark data dup dup"),
    (4, "fast key"),
]
CT_CUTOFF = 0.5


def q_common_terms(sf_dir: str):
    """CommonTermsQuery (boolq.common_terms_search; Lucene/ES common
    terms): df/N <= cutoff terms gate matching, high-df terms only add
    score; queries with no low-frequency term fall back to plain OR."""
    from splade_ray.boolq import common_terms_search

    run = common_terms_search(
        _index_for(sf_dir), CT_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        cutoff_frequency=CT_CUTOFF,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# Rescore window (Elasticsearch rescore): second-pass match_phrase per
# query over the BM25 top-RESCORE_WINDOW; qid 6 has no phrase and keeps its
# primary ranking (the passthrough face).
RESCORE_PHRASES = {
    0: "hash join", 1: "sort merge", 2: "stream window", 3: "filter scan",
    4: "customer query", 5: "row key", 7: "big small",
}
RESCORE_WINDOW = 30
RESCORE_QW, RESCORE_RQW = 1.0, 2.0


def q_rescore_topk(sf_dir: str):
    """Rescore window (splade_ray.rescore.rescore_phrase; Lucene
    QueryRescorer): BM25 first pass, phrase-as-virtual-term BM25 second
    pass over the window only (match Dataset filtered to the broadcast
    window before collection; phrase df global), combined score = qw*prim +
    rqw*sec for phrase-matching docs, qw*prim otherwise."""
    from splade_ray.positions import build_positions
    from splade_ray.rescore import rescore_phrase

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    # top_k = the full window: the stable re-rank below needs every
    # window row; residual ulp risk only at the raw window boundary (30)
    run = rescore_phrase(
        index_dir, BM25_QUERIES,
        BM25Params(k1=K1, b=B, top_k=RESCORE_WINDOW),
        phrases=RESCORE_PHRASES, window_size=RESCORE_WINDOW,
        score_mode="total", query_weight=RESCORE_QW,
        rescore_query_weight=RESCORE_RQW,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# Fixed boolean query set: must / should / must_not clauses over the same
# vocabulary (semantics pinned in splade_ray.boolq).
BOOL_QUERIES = [
    (1, {"must": "spark window", "should": "merge sort"}),
    (2, {"must": "customer", "must_not": "spark"}),
    (3, {"should": "slow query filter"}),
    (4, {"must": "data", "must_not": "dup vector"}),
    (5, {"must": "stream", "should": "agg", "must_not": "customer"}),
]


def q_phrase_search(sf_dir: str):
    """Positional-index phrase matching (splade_ray.positions): derive the
    per-segment positional layer from the built index (resumable, one task
    per segment), then intersect doc lists + shifted position sets per
    phrase. Counts are overlapping start positions — identical to the SQL
    oracle's sliding window over the token array."""
    from splade_ray.positions import build_positions, phrase_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    return phrase_search(index_dir, PHRASE_QUERIES)


NEAR_QUERIES = [(1, "hash join"), (2, "sort merge"), (3, "group row key")]
NEAR_SLOP = 2


def q_near_search(sf_dir: str):
    """Ordered proximity search (positions.near_search, the Lucene sloppy /
    ordered-SpanNear shape): per (phrase, doc) the number of first-term
    occurrences starting an ordered chain within span k-1+slop."""
    from splade_ray.positions import build_positions, near_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    return near_search(index_dir, NEAR_QUERIES, slop=NEAR_SLOP)


def q_near_unordered(sf_dir: str):
    """Unordered proximity (positions.near_search ordered=False, the
    SpanNearQuery inOrder=false shape): starts = query-term occurrences p
    with every query term present in [p, p+k-1+slop]."""
    from splade_ray.positions import build_positions, near_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    return near_search(index_dir, NEAR_QUERIES, slop=NEAR_SLOP, ordered=False)


SPAN_FIRST_QUERIES = [(1, "hash"), (2, "window"), (3, "zzzoov")]
SPAN_FIRST_LIMIT = 20


def q_span_first(sf_dir: str):
    """SpanFirstQuery (positions.span_first_search): docs with the term in
    the first SPAN_FIRST_LIMIT token positions, with within-limit counts."""
    from splade_ray.positions import build_positions, span_first_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    return span_first_search(index_dir, SPAN_FIRST_QUERIES, limit=SPAN_FIRST_LIMIT)


SPAN_NOT_QUERIES = [
    (1, {"include": "spark", "exclude": "window"}),
    (2, {"include": "data", "exclude": "stream"}),
    (3, {"include": "customer", "exclude": "zzqx"}),
]
SPAN_NOT_PRE, SPAN_NOT_POST = 1, 2


def q_span_not(sf_dir: str):
    """SpanNotQuery (positions.span_not_search): include-term occurrences
    with no exclude-term occurrence in [p-pre, p+post]; per-(query, doc)
    surviving-occurrence counts over the derived positional layer."""
    from splade_ray.positions import build_positions, span_not_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    return span_not_search(
        index_dir, SPAN_NOT_QUERIES, pre=SPAN_NOT_PRE, post=SPAN_NOT_POST
    )


# MultiPhraseQuery slot lists over the documents vocabulary: per-slot OR
# alternatives, a single-slot union (tf-sum face), and a dead-alternative
# slot ('warehouse' never occurs -> zero matches for that query).
MULTI_PHRASE_QUERIES = [
    (1, [["hash", "merge"], ["join"]]),
    (2, [["sort"], ["merge", "part", "column"]]),
    (3, [["data", "big"], ["line", "stream"], ["join"]]),
    (4, [["spark", "window"]]),
    (5, [["warehouse"], ["join"]]),
]

# match_phrase_prefix texts: last token is a prefix. MPP_MAX_EXPANSIONS is
# set far above the vocabulary size so the Lucene-style rewrite cap never
# binds and the LIKE-based SQL mirror is exact.
MPP_QUERIES = [
    (1, "hash jo"),
    (2, "group b"),
    (3, "qu"),
    (4, "merge pa"),
    (5, "slow qu"),
    (6, "data zz"),
]
MPP_MAX_EXPANSIONS = 1000


def q_multi_phrase(sf_dir: str):
    """MultiPhraseQuery (positions.multi_phrase_search): per-slot OR
    alternatives intersected as packed (doc, shifted-position) keys; counts
    are overlapping start positions, mirroring the SQL sliding window with
    per-slot IN lists."""
    from splade_ray.positions import build_positions, multi_phrase_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    return multi_phrase_search(index_dir, MULTI_PHRASE_QUERIES)


def q_match_phrase_prefix(sf_dir: str):
    """match_phrase_prefix (positions.match_phrase_prefix_search): the last
    token rewrites to its lexicon prefix expansions (range-pushdown read),
    then the multi-phrase kernel; the cap is sized to never bind so the
    LIKE mirror is exact."""
    from splade_ray.positions import build_positions, match_phrase_prefix_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    return match_phrase_prefix_search(
        index_dir, MPP_QUERIES, max_expansions=MPP_MAX_EXPANSIONS
    )


# SpanContaining / SpanWithin: 2-term greedy big spans (SQL mirror
# computes the greedy end as min(next position)), little single terms;
# query 3's little never occurs.
SPAN_REL_QUERIES = [
    (1, {"big": "hash join", "little": "table"}),
    (2, {"big": "sort merge", "little": "sort"}),
    (3, {"big": "data line", "little": "zzqx"}),
    (4, {"big": "group key", "little": "row"}),
]
SPAN_REL_SLOP = 3


def q_span_containing(sf_dir: str):
    """SpanContainingQuery (positions.span_containing_search): greedy
    ordered-chain big spans holding a little-term occurrence in their
    closed interval; per-(query, doc) surviving-span counts."""
    from splade_ray.positions import build_positions, span_containing_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    return span_containing_search(index_dir, SPAN_REL_QUERIES, slop=SPAN_REL_SLOP)


def q_span_within(sf_dir: str):
    """SpanWithinQuery (positions.span_within_search): little-term
    occurrences covered by some greedy big span; per-(query, doc) covered
    occurrence counts."""
    from splade_ray.positions import build_positions, span_within_search

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    return span_within_search(index_dir, SPAN_REL_QUERIES, slop=SPAN_REL_SLOP)


def q_boolean_topk(sf_dir: str):
    """Boolean-filtered BM25 (splade_ray.boolq): docs must contain every
    `must` term and no `must_not` term; score = BM25 over must+should."""
    from splade_ray.boolq import boolean_search

    index_dir = _index_for(sf_dir)
    run = boolean_search(index_dir, BOOL_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9))
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# boosting query (ES boosting / Lucene BoostingQuery): positive BM25 score,
# multiplied by NEG_BOOST when the doc contains ANY negative term
BOOSTING_QUERIES = [
    (1, {"positive": "spark window merge", "negative": "slow"}),
    (2, {"positive": "customer data", "negative": "spark window"}),
    (3, {"positive": "stream agg", "negative": ""}),
    (4, {"positive": "data", "negative": "data"}),  # every match demoted
]
NEG_BOOST = 0.4

CONST_QUERIES = [(1, "spark window"), (2, "customer"), (3, "zzzoov")]
CONST_BOOST = 1.5


def q_boosting_topk(sf_dir: str):
    """ES boosting query (boolq.boosting_search): BM25 over positive terms;
    docs containing any negative term stay matched but score × NEG_BOOST —
    the soft must_not. Demotion applies before every per-segment cut."""
    from splade_ray.boolq import boosting_search

    run = boosting_search(
        _index_for(sf_dir), BOOSTING_QUERIES,
        BM25Params(k1=K1, b=B, top_k=10**9), negative_boost=NEG_BOOST,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_const_score_topk(sf_dir: str):
    """ConstantScoreQuery (boolq.constant_score_search): OR-of-terms filter,
    every match scores exactly CONST_BOOST; the (score desc, doc_id asc)
    tie-break makes the run the first top_k matching doc ids per query."""
    from splade_ray.boolq import constant_score_search

    run = constant_score_search(
        _index_for(sf_dir), CONST_QUERIES,
        BM25Params(top_k=TOP_K), boost=CONST_BOOST,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out["rank"] = out["rank"].astype(np.int64)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# minimum_should_match variants (Lucene BooleanQuery msm): distinct-should
# thresholds of 1/2/3 plus an msm > |should| query that must match nothing.
BOOL_MSM_QUERIES = [
    (1, {"should": "spark window merge", "minimum_should_match": 2}),
    (2, {"must": "data", "should": "stream batch agg",
         "minimum_should_match": 1}),
    (3, {"should": "slow query filter sort", "minimum_should_match": 3}),
    (4, {"should": "spark window", "minimum_should_match": 3}),  # m > |should|
    (5, {"should": "customer key", "must_not": "spark",
         "minimum_should_match": 2}),
]


def q_boolean_msm(sf_dir: str):
    """Boolean retrieval with minimum_should_match (boolq msm semantics: a
    doc needs >= m DISTINCT should terms; m beyond the distinct-term count
    matches nothing)."""
    from splade_ray.boolq import boolean_search

    index_dir = _index_for(sf_dir)
    run = boolean_search(
        index_dir, BOOL_MSM_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9)
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# Fixed substring / regex query sets over the documents vocabulary: a
# multi-token substring, a selective one, a guaranteed miss, a case-mixed
# needle, and a sub-3-byte needle that exercises the documented
# full-verification fallback (trigram pruning impossible below 3 bytes).
SUBSTR_QUERIES = [
    (1, "batch batch"),
    (2, "merge part win"),
    (3, "no_such_substring_zzz"),
    (4, "SPARK WIN"),
    (5, "agg"),
]

GREP_QUERIES = [
    (1, r"batch\s+batch"),
    (2, r"mer(ge|ged)"),
    (3, r"zzz+"),
    (4, r"spark win[a-z]*"),
]


QUANTILE_QS = [0.1, 0.5, 0.9, 0.99]
KMV_K = 256


def q_doclen_quantiles(sf_dir: str):
    """Exact per-lang quantiles of n_chars (ops/sketch.value_quantiles):
    value-count partials + a distinct-value-sized groupby — no global sort.
    Selection rank pinned to DuckDB quantile_disc (max(ceil(q*n), 1))."""
    from splade_ray.ops.sketch import value_quantiles

    return value_quantiles(
        _docs(sf_dir, ["lang", "n_chars"]), "n_chars", QUANTILE_QS, by="lang"
    )


def q_event_value_quantiles(sf_dir: str):
    """Exact fixed-point quantiles of the FLOAT event value per type
    (ops/sketch.value_quantiles_float): values quantize to cent codes, the
    distinct-value-sized exact path runs on the codes — unbounded float
    columns keep the no-global-sort contract."""
    from splade_ray.ops.sketch import value_quantiles_float

    ev = _rpq(os.path.join(sf_dir, "events.parquet"),
              columns=["event_type", "value"])
    return value_quantiles_float(
        ev, "value", QUANTILE_QS, by="event_type", scale=100
    )


def _event_value_quantiles_sql() -> str:
    mille = ", ".join(str(int(q * 1000)) for q in QUANTILE_QS)
    qlist = ", ".join(str(q) for q in QUANTILE_QS)
    return f"""
WITH e AS (SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS c FROM events)
SELECT event_type,
       unnest([{mille}])::BIGINT AS q_mille,
       unnest(quantile_disc(c, [{qlist}]))::BIGINT AS value_fp
FROM e GROUP BY event_type"""


def q_distinct_terms_kmv(sf_dir: str):
    """KMV distinct-term sketch per lang (ops/sketch.kmv_distinct): k
    smallest sha256-prefix hashes per group, integer estimate
    (k-1)*2^63 // kth_min — deterministic and HUGEINT-mirrorable."""
    from splade_ray.analysis import tokenize_column
    from splade_ray.ops.sketch import kmv_distinct

    def flat_lang_terms(batch):
        import pyarrow as _pa

        terms, par, _ = tokenize_column(batch["text"])
        langs = batch["lang"].to_pylist()
        return _pa.table(
            {
                "lang": _pa.array([langs[i] for i in par.tolist()], _pa.string()),
                "term": terms,
            }
        )

    ds = _docs(sf_dir, ["lang", "text"]).map_batches(
        flat_lang_terms, batch_format="pyarrow", batch_size=512
    )
    return kmv_distinct(ds, "term", k=KMV_K, by="lang")


MLT_SEEDS = [0, 25, 123]
MLT_TERMS = 5

# RM3 pseudo-relevance feedback over the shared query set
RM3_FB_DOCS = 5
RM3_FB_TERMS = 6
RM3_EXP_QTF = 1


def q_more_like_this(sf_dir: str):
    """Seed-doc similarity search (splade_ray.mlt): top-5 terms per seed by
    the pinned integer ordering (tf desc, df asc, term asc), standard BM25
    scatter-gather with qtf=1, seed excluded, ranks reassigned."""
    from splade_ray.mlt import more_like_this

    index_dir = _index_for(sf_dir)
    run = more_like_this(
        index_dir,
        os.path.join(sf_dir, "documents.parquet"),
        MLT_SEEDS,
        m_terms=MLT_TERMS,
        params=BM25Params(k1=K1, b=B, top_k=10**9),
        text_col="text",
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def _multi_members(sf_dir: str) -> list[str]:
    """Build (or reuse) the two member indices: the documents table split
    in half by doc_id — the federation fixture every multi_index_* entry
    scores over."""
    import pyarrow.parquet as _pq

    wd = _work_dir(sf_dir, "multiidx")
    full = _rpq(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    full = full.sort_values("doc_id").reset_index(drop=True)
    half = len(full) // 2
    members = []
    for i, part in enumerate((full.iloc[:half], full.iloc[half:])):
        src = os.path.join(wd, f"part{i}.parquet")
        if not os.path.exists(src):
            _pq.write_table(
                pa.Table.from_pandas(part[["doc_id", "text"]],
                                     preserve_index=False), src
            )
        d = os.path.join(wd, f"index{i}")
        build_index(src, d, text_col="text", id_col="doc_id",
                    rows_per_segment=SEGMENT_ROWS, block_size=64)
        members.append(d)
    return members


def q_multi_index_topk(sf_dir: str):
    """Federated multi-index search (splade_ray.multi.search_multi): the
    documents table split into two member indices, scored under combined
    MultiReader statistics — bit-identical to one index over the union, so
    the oracle is the plain bm25 mirror."""
    from splade_ray.multi import search_multi

    run = search_multi(
        _multi_members(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9)
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_multi_index_bool(sf_dir: str):
    """Federated boolean retrieval (multi.boolean_search_multi): clause
    masks run per member, scoring under union stats — bit-identical to the
    single-index boolean run, so the oracle is the boolean SQL mirror."""
    from splade_ray.multi import boolean_search_multi

    run = boolean_search_multi(
        _multi_members(sf_dir), BOOL_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9)
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_multi_index_phrase(sf_dir: str):
    """Federated phrase retrieval (multi.phrase_topk_multi): per-member
    positional candidate extraction, phrase df summed across members,
    ranking under the union (n_docs, avgdl) — bit-identical to the
    single-index phrase run, so the oracle is the phrase SQL mirror."""
    from splade_ray.multi import phrase_topk_multi
    from splade_ray.positions import build_positions

    members = _multi_members(sf_dir)
    for d in members:
        build_positions(d)
    run = phrase_topk_multi(
        members, PHRASE_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9)
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], part_cols=("phrase_id",), k=TOP_K)
    return out[["phrase_id", "rank", "doc_id", "score_r"]]


HH_TOP_N = 10


def q_top_sources_hh(sf_dir: str):
    """Heavy-hitters top sources (ops/sketch.heavy_hitters): Misra-Gries
    sketch pass (<= k counters per block move, never a distinct-value
    shuffle) + exact candidate recount; the certificate must prove the
    frame equals the exact global top-n before it is returned here."""
    from splade_ray.ops.sketch import heavy_hitters

    frame, err, proven = heavy_hitters(
        _docs(sf_dir, ["source"]), "source", k=64, top_n=HH_TOP_N
    )
    assert proven, f"MG certificate failed (err_bound={err})"
    return frame


def _top_sources_hh_sql() -> str:
    return f"""
SELECT row_number() OVER (ORDER BY count(*) DESC, source ASC)::BIGINT AS rank,
       source AS value, count(*)::BIGINT AS count
FROM documents GROUP BY source
ORDER BY count DESC, value ASC LIMIT {HH_TOP_N}"""


HH_BY_TOP_N = 5


def q_top_sources_hh_by_lang(sf_dir: str):
    """Per-group heavy hitters (ops/sketch.heavy_hitters_by): the grouped
    Misra-Gries sketch — <= k counters PER LANG per block move, one exact
    recount of the (lang, source) candidate pairs; every group's certificate
    must prove its frame is the exact per-lang top-n before returning."""
    from splade_ray.ops.sketch import heavy_hitters_by

    frame, cert = heavy_hitters_by(
        _docs(sf_dir, ["lang", "source"]), "source", "lang",
        k=64, top_n=HH_BY_TOP_N,
    )
    assert cert["proven"].all(), f"MG certificate failed:\n{cert}"
    return frame


def _top_sources_hh_by_lang_sql() -> str:
    return f"""
SELECT lang, rank, value, count FROM (
  SELECT lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY count(*) DESC, source ASC)::BIGINT AS rank,
         source AS value, count(*)::BIGINT AS count
  FROM documents GROUP BY lang, source
) WHERE rank <= {HH_BY_TOP_N}
ORDER BY lang ASC, rank ASC"""


DAY_US = 86_400_000_000


def q_rollup_events(sf_dir: str):
    """GROUP BY ROLLUP over events (ops/rollup.rollup_agg): every prefix
    level of (event_type, day) aggregates in ONE combiner pass + ONE
    groupby; integer-cent values keep every emitted number exact."""
    from splade_ray.ops.rollup import rollup_agg

    ev = _rpq(os.path.join(sf_dir, "events.parquet"),
              columns=["ts", "event_type", "value"])

    def add_day(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks() if isinstance(batch["ts"], pa.ChunkedArray) else batch["ts"]
        day = ts.cast(pa.int64()).to_numpy(zero_copy_only=False) // DAY_US
        return pa.table(
            {
                "event_type": batch["event_type"],
                "day": pa.array(day, pa.int64()),
                "value": batch["value"],
            }
        )

    out = (
        rollup_agg(ev.map_batches(add_day, batch_format="pyarrow"),
                   ["event_type", "day"])
        .to_pandas()
        .sort_values(["level", "event_type", "day"])
        .reset_index(drop=True)
    )
    return out


def _rollup_events_sql() -> str:
    return f"""
WITH e AS (SELECT event_type,
                  (epoch_us(ts) // {DAY_US})::BIGINT AS day,
                  floor(value * 100 + 0.5)::BIGINT AS c
           FROM events)
SELECT (2 - grouping(event_type) - grouping(day))::BIGINT AS level,
       coalesce(event_type, '(all)') AS event_type,
       coalesce(day, -1)::BIGINT AS day,
       count(*)::BIGINT AS n, sum(c)::BIGINT AS sum_cents,
       min(c)::BIGINT AS min_cents, max(c)::BIGINT AS max_cents
FROM e GROUP BY ROLLUP(event_type, day)"""


BPE_MERGES = 24


def q_bpe_word_counts(sf_dir: str):
    """BPE fit input (ops/bpe.bpe_word_counts): the distributed word-count
    dictionary classic BPE trains on — batch-local combiners, one
    word-keyed groupby, sorted (count desc, word asc)."""
    from splade_ray.ops.bpe import bpe_word_counts

    return bpe_word_counts(_docs(sf_dir, ["doc_id", "text"]), text_col="text")


def q_bpe_subword_stats(sf_dir: str):
    """Per-doc subword budget under a corpus-learned BPE (ops/bpe:
    bpe_train on the word dictionary — inherently sequential, hence no SQL
    oracle — then the distributed bpe_apply streaming scan)."""
    from splade_ray.ops.bpe import bpe_apply, bpe_train, bpe_word_counts

    docs = _docs(sf_dir, ["doc_id", "text"])
    wc = bpe_word_counts(docs, text_col="text")
    merges = bpe_train(wc, BPE_MERGES)
    out = bpe_apply(docs, merges).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _bpe_word_counts_sql() -> str:
    return f"""
WITH t AS (SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_SQL}')) AS word
           FROM documents)
SELECT word, count(*)::BIGINT AS count FROM t
GROUP BY word ORDER BY count DESC, word ASC"""


SIG_TOP_M = 8


def q_sig_terms(sf_dir: str):
    """Significant-terms aggregation (splade_ray.sigterms): JLH-scored
    foreground-vs-background term contrast over each query's top-TOP_K
    BM25 hits (the ES significant_text sampled shape) — foreground texts
    via the pushdown isin scan, background df from one lexicon read."""
    from splade_ray.sigterms import significant_terms

    out = significant_terms(
        _index_for(sf_dir),
        os.path.join(sf_dir, "documents.parquet"),
        BM25_QUERIES,
        BM25Params(k1=K1, b=B),
        fg_k=TOP_K,
        top_m=SIG_TOP_M,
        fg_run=_bm25_run(sf_dir, "exact"),  # tie-stable fg membership
    )
    out = out.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    return out[["query_id", "rank", "term", "fg_count", "fg_total", "df",
                "score_r"]]


def _stable_fb_run(sf_dir: str) -> pd.DataFrame:
    """Tie-stable RM3 feedback run: rounded re-rank cut at RM3_FB_DOCS so
    feedback-doc membership matches the SQL mirror's rounded ranked CTE."""
    index_dir = _index_for(sf_dir)
    r = search(index_dir, BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9))
    r = r.copy()
    r["score_r"] = _round4(r["score"].to_numpy())
    return _stable_rank(r, ["doc_id"], k=RM3_FB_DOCS)


def q_rm3_terms(sf_dir: str):
    """RM3 expansion-term mining (splade_ray.rm3.mine_expansion_terms):
    feedback pass at top-RM3_FB_DOCS, then per query the top-RM3_FB_TERMS
    candidate terms by the pinned integer ordering (sum-of-fb-tf desc,
    corpus df asc, term asc), own analyzed terms excluded. All-integer
    face of the two-pass loop (Abdul-Jaleel et al. 2004)."""
    from splade_ray.query import search as _search
    from splade_ray.rm3 import mine_expansion_terms

    index_dir = _index_for(sf_dir)
    fb_run = _stable_fb_run(sf_dir)
    return mine_expansion_terms(
        index_dir,
        os.path.join(sf_dir, "documents.parquet"),
        BM25_QUERIES,
        fb_run,
        fb_terms=RM3_FB_TERMS,
    )


def q_rm3_topk(sf_dir: str):
    """Full RM3 retrieval (splade_ray.rm3.rm3_search): feedback search,
    integer term mining, expanded BM25 search — original terms keep their
    query-tfs, expansion terms join at qtf=RM3_EXP_QTF."""

    from splade_ray.rm3 import mine_expansion_terms

    index_dir = _index_for(sf_dir)
    # same composition as rm3_search, with a tie-stable feedback pass
    # (rm3_search's internal feedback run ranks raw floats)
    exp = mine_expansion_terms(
        index_dir, os.path.join(sf_dir, "documents.parquet"), BM25_QUERIES,
        _stable_fb_run(sf_dir), fb_terms=RM3_FB_TERMS,
    )
    by_q = (exp.groupby("query_id")["term"].apply(list).to_dict()
            if not exp.empty else {})
    expanded = [
        (qid, text + (" " + " ".join(by_q[qid] * RM3_EXP_QTF)
                      if by_q.get(qid) else ""))
        for qid, text in BM25_QUERIES
    ]
    run = search(index_dir, expanded, BM25Params(k1=K1, b=B, top_k=10**9))
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_facet_stats(sf_dir: str):
    """ES sub-aggregation (facets.facet_stats_agg): a terms bucket over the
    lang doc-values column with a nested stats metric over n_chars — per
    query, per lang, (n_docs, sum, min, max, avg) across live matching
    docs, computed from mergeable per-segment partials in ONE pass (the
    terms + nested-metric composition; round-3 VERDICT item 7)."""
    from splade_ray.facets import facet_stats_agg

    out = facet_stats_agg(
        _dv2_index(sf_dir), BM25_QUERIES, facet_col="lang",
        metric_col="n_chars",
    )
    out = out.copy()
    out["sum_chars"] = out["sum_v"].to_numpy(np.float64).astype(np.int64)
    out["min_chars"] = out["min_v"].to_numpy(np.float64).astype(np.int64)
    out["max_chars"] = out["max_v"].to_numpy(np.float64).astype(np.int64)
    out["avg_chars_r"] = _round4(out["avg_v"].to_numpy())
    return out[["query_id", "facet", "n_docs", "sum_chars", "min_chars",
                "max_chars", "avg_chars_r"]]


def q_facet_counts(sf_dir: str):
    """Per-query facet counts over the lang column (splade_ray.facets):
    exact count of live docs containing >=1 query term, counted segment-
    locally (bincount over the doclens-carried facet column), merged as a
    queries x langs table."""
    from splade_ray.facets import facet_counts

    index_dir = os.path.join(_work_dir(sf_dir, "facetidx"), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        text_col="text",
        id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS,
        block_size=64,
        extra_doc_cols=("lang",),
    )
    return facet_counts(index_dir, BM25_QUERIES, facet_col="lang")


def q_explain(sf_dir: str):
    """Per-term score breakdown (query.explain, the Lucene explain analog)
    for every (query, top-k doc) pair: tf, GLOBAL df, idf weight and the
    term's contribution — contribs sum bit-exactly to the run scores."""
    from splade_ray.query import explain

    index_dir = _index_for(sf_dir)
    p = BM25Params(k1=K1, b=B, top_k=TOP_K)
    # membership from the tie-stable run (rounded re-rank) so the doc set
    # matches the SQL mirror's rounded ranked CTE
    run = _bm25_run(sf_dir, "exact")
    exp = explain(index_dir, BM25_QUERIES, run["doc_id"].tolist(), p)
    out = exp.copy()
    out["weight_r"] = _round4(out["weight"].to_numpy())
    out["contrib_r"] = _round4(out["contrib"].to_numpy())
    return out[["query_id", "doc_id", "term", "tf", "df", "weight_r", "contrib_r"]]


RRF_K = 60


def q_hybrid_rrf(sf_dir: str):
    """Reciprocal Rank Fusion (splade_ray.fusion, Cormack et al. 2009) of
    the exact-BM25 and Dirichlet-QL runs — the hybrid-search primitive;
    rank-based, so no score calibration between retrievers."""
    from splade_ray.fusion import rrf_fuse

    index_dir = _index_for(sf_dir)
    p = BM25Params(k1=K1, b=B, top_k=10**9)
    runs = []
    for kw in ({}, {"scoring": "ql", "mu": QL_MU}):
        r = search(index_dir, BM25_QUERIES, p, **kw)
        r["score_r"] = _round4(r["score"].to_numpy())
        runs.append(_stable_rank(r, ["doc_id"], k=TOP_K))
    fused = rrf_fuse(runs, k=RRF_K, top_k=10**9)
    out = fused.copy()
    out["rrf_r"] = _round4(out["rrf"].to_numpy())
    out = _stable_rank(out, ["doc_id"], score_col="rrf_r", k=TOP_K)
    return out[["query_id", "rank", "doc_id", "rrf_r"]]


HYBRID_W = (0.7, 0.3)


def q_hybrid_linear(sf_dir: str):
    """Normalized linear score fusion (fusion.linear_fuse; the ES
    retriever.linear minmax normalizer) of the exact-BM25 and Dirichlet-QL
    runs — per run/query minmax rescale, weighted sum, missing docs
    contribute nothing."""
    from splade_ray.fusion import linear_fuse

    index_dir = _index_for(sf_dir)
    p = BM25Params(k1=K1, b=B, top_k=10**9)
    runs = []
    for kw in ({}, {"scoring": "ql", "mu": QL_MU}):
        r = search(index_dir, BM25_QUERIES, p, **kw)
        r["score_r"] = _round4(r["score"].to_numpy())
        runs.append(_stable_rank(r, ["doc_id"], k=TOP_K))
    fused = linear_fuse(runs, weights=list(HYBRID_W), top_k=10**9)
    out = fused.copy()
    out["fused_r"] = _round4(out["fused"].to_numpy())
    out = _stable_rank(out, ["doc_id"], score_col="fused_r", k=TOP_K)
    return out[["query_id", "rank", "doc_id", "fused_r"]]


def q_percolate_all(sf_dir: str):
    """Percolator (splade_ray.percolate): (doc_id, query_id) pairs where the
    doc contains EVERY stored query's analyzed terms (mode='all') —
    broadcast query table, streaming scan, zero shuffle."""
    from splade_ray.percolate import percolate_df

    return percolate_df(_docs(sf_dir, ["doc_id", "text"]), BM25_QUERIES, mode="all")


def q_percolate_any(sf_dir: str):
    """Percolator, disjunctive mode: >=1 stored term present."""
    from splade_ray.percolate import percolate_df

    return percolate_df(_docs(sf_dir, ["doc_id", "text"]), BM25_QUERIES, mode="any")


TV_DOC_IDS = [3, 57, 200, 411]


def q_term_vectors(sf_dir: str):
    """Per-doc term vectors (io.term_vectors): (doc_id, term, tf, positions)
    for an API-sized doc set via the pushdown isin fetch — the Lucene
    TermVectors analog; positions = comma-joined 1-based ordinals."""
    from splade_ray.io import term_vectors

    return term_vectors(os.path.join(sf_dir, "documents.parquet"), TV_DOC_IDS,
                        text_col="text")


FACET_TOP = 3


def q_facet_top(sf_dir: str):
    """ES terms aggregation: top-N facets per query by (n_docs desc, facet
    asc), exact counts (no shard_size cap), re-sorted by (query_id, facet)."""
    from splade_ray.facets import facet_counts

    index_dir = os.path.join(_work_dir(sf_dir, "facetidx"), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        text_col="text",
        id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS,
        block_size=64,
        extra_doc_cols=("lang",),
    )
    return facet_counts(index_dir, BM25_QUERIES, facet_col="lang", top=FACET_TOP)


def q_collapse_topk(sf_dir: str):
    """Field-collapsed retrieval (splade_ray.collapse): top-k per query with
    at most one doc per lang — per-key best computed segment-locally over
    the dense-score kernel, queries x keys rows merged at the driver."""
    from splade_ray.collapse import collapse_search

    index_dir = os.path.join(_work_dir(sf_dir, "facetidx"), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        text_col="text",
        id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS,
        block_size=64,
        extra_doc_cols=("lang",),
    )
    run = collapse_search(
        index_dir, BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        collapse_col="lang",
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "collapse_key", "score_r"]]


def q_diversified_topk(sf_dir: str):
    """ES diversified_sampler (collapse_search max_docs_per_key=2): top-k
    per query keeping at most 2 docs per lang, greedy in score order —
    per-key best-2 computed segment-locally, capped again at the driver."""
    from splade_ray.collapse import collapse_search

    index_dir = os.path.join(_work_dir(sf_dir, "facetidx"), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"), index_dir,
        text_col="text", id_col="doc_id", rows_per_segment=SEGMENT_ROWS,
        block_size=64, extra_doc_cols=("lang",),
    )
    run = collapse_search(
        index_dir, BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        collapse_col="lang", max_docs_per_key=2,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "collapse_key", "score_r"]]


# doc-values probes over the n_chars sidecar column (splade_ray.docvalues)
DV_LO, DV_HI = 150, 400
HIST_INTERVAL = 100
# SynonymQuery groups (analyzed-term space; Lucene semantics: summed tf,
# max df per group)
SYN_MAP = {"join": ["merge"], "scan": ["filter"]}
WILDCARD_QUERIES = [(1, "s*"), (2, "*ow"), (3, "?ig"), (4, "col*n")]
# anchored RE2 patterns (ES RegexpQuery: whole-term match, no backrefs)
REGEXP_QUERIES = [(1, "s.*"), (2, ".*ow"), (3, ".ig"), (4, "col.+n|sun")]


def _dv_index(sf_dir: str) -> str:
    index_dir = os.path.join(_work_dir(sf_dir, "dvidx"), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        text_col="text",
        id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS,
        block_size=64,
        extra_doc_cols=("n_chars",),
    )
    return index_dir


TERMS_SET_QUERIES = [
    (1, "spark window merge"),
    (2, "hash join table scan"),
    (3, "dup data"),
    (4, "customer"),
]


def _dv3_index(sf_dir: str) -> str:
    """Index with a derived per-doc minimum_should_match column
    (req = doc_id % 4, deterministic so the SQL oracle mirrors it; 0 rows
    exercise the never-match guard)."""
    work = _work_dir(sf_dir, "dvidx3")
    corpus_dir = os.path.join(work, "corpus")
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        def add_req(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.append_column("req", pa.array(ids % 4))

        tmp = corpus_dir + ".tmp"
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            add_req, batch_format="pyarrow", batch_size=512
        ).write_parquet(tmp)
        os.rename(tmp, corpus_dir)
    index_dir = os.path.join(work, "index")
    build_index(
        corpus_dir, index_dir, text_col="text", id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS, block_size=64, extra_doc_cols=("req",),
    )
    return index_dir


def q_terms_set(sf_dir: str):
    """terms_set query (docvalues.terms_set_search; ES
    minimum_should_match_field): per-doc required distinct-term count from
    the req doc-values column; matching docs score plain BM25."""
    from splade_ray.docvalues import terms_set_search

    run = terms_set_search(
        _dv3_index(sf_dir), TERMS_SET_QUERIES,
        BM25Params(k1=K1, b=B, top_k=10**9), msm_col="req",
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_range_topk(sf_dir: str):
    """Range-filtered BM25 (splade_ray.docvalues.range_search): top-k over
    docs with n_chars in [DV_LO, DV_HI]; the filter applies inside each
    segment BEFORE its top-k cut (Lucene PointRangeQuery FILTER clause)."""
    from splade_ray.docvalues import range_search

    run = range_search(
        _dv_index(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        numeric_col="n_chars", lo=DV_LO, hi=DV_HI,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# function_score fixture: all four function shapes over the n_chars
# doc-value, score_mode/boost_mode = multiply (ES defaults for this subset).
FSCORE_FUNCTIONS = [
    {"field_value_factor": {"field": "n_chars", "factor": 0.01,
                            "modifier": "log1p"}},
    {"gauss": {"field": "n_chars", "origin": 500.0, "scale": 300.0,
               "offset": 50.0, "decay": 0.5}},
    {"exp": {"field": "n_chars", "origin": 0.0, "scale": 1000.0,
             "decay": 0.6}},
    {"linear": {"field": "n_chars", "origin": 200.0, "scale": 400.0,
                "decay": 0.3}},
]


def q_function_score(sf_dir: str):
    """Elasticsearch function_score retrieval
    (docvalues.function_score_search): BM25 × field_value_factor(log1p) ×
    gauss × exp × linear decay over the n_chars doc-value, multiplier
    applied inside each segment before its top-k cut."""
    from splade_ray.docvalues import function_score_search

    run = function_score_search(
        _dv_index(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        functions=FSCORE_FUNCTIONS,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def _block_join(sf_dir: str, score_mode: str):
    from splade_ray.docvalues import block_join_search

    run = block_join_search(
        _dv2_index(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B),
        parent_col="source", score_mode=score_mode, top_k=10**9,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["parent"], k=TOP_K)
    return out[["query_id", "rank", "parent", "score_r", "n_children"]]


def q_block_join_max(sf_dir: str):
    """Parent block join, score_mode=max (docvalues.block_join_search —
    Lucene ToParentBlockJoinQuery): parents = distinct `source` values,
    ranked by their best-matching child's BM25 score; per-segment partial
    (sum,max,min,count) aggregates, child scores never leave segments."""
    return _block_join(sf_dir, "max")


def q_block_join_avg(sf_dir: str):
    """Parent block join, score_mode=avg: parents ranked by mean matching-
    child BM25 score (sum/count over score>0 children)."""
    return _block_join(sf_dir, "avg")


# rank_feature fixture: all four ES function shapes over n_chars, summed.
RANK_FEATURES = [
    {"field": "n_chars", "boost": 2.0, "function": {"saturation": {"pivot": 300.0}}},
    {"field": "n_chars", "boost": 0.3, "function": {"log": {"scaling_factor": 1.0}}},
    {"field": "n_chars", "boost": 1.5,
     "function": {"sigmoid": {"pivot": 400.0, "exponent": 2.0}}},
    {"field": "n_chars", "boost": 0.001, "function": {"linear": {}}},
]


def q_rank_feature(sf_dir: str):
    """ES rank_feature retrieval (docvalues.rank_feature_search): BM25 +
    Σ boost·f(n_chars) over saturation/log/sigmoid/linear clauses, bonus
    added to matching docs only, inside each segment before its cut."""
    from splade_ray.docvalues import rank_feature_search

    run = rank_feature_search(
        _dv_index(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        rank_features=RANK_FEATURES,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# distance_feature probe (ES distance_feature query over a numeric field,
# composed as an additive rank_feature clause)
DIST_FEATURES = [
    {"field": "n_chars", "boost": 2.5,
     "function": {"distance": {"origin": 300.0, "pivot": 150.0}}},
]


def q_distance_feature(sf_dir: str):
    """ES distance_feature query (query.canonical_rank_features kind
    'dist'): matching docs gain boost × pivot/(pivot + |n_chars − origin|)
    — the ES closed form — added inside each segment before its cut."""
    from splade_ray.docvalues import rank_feature_search

    run = rank_feature_search(
        _dv_index(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        rank_features=DIST_FEATURES,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# ids / pinned query probes (100000 is deliberately absent at every sf)
IDS_SETS = {1: [3, 17, 100000, 42], 2: [250, 5], 3: [100000]}
PINNED_SETS = {0: [50, 100000, 7], 2: [9, 2], 6: [11]}


def q_ids_query(sf_dir: str):
    """ES ids query (structured.ids_search): requested ids that exist and
    are live, constant score 1.0, doc_id-ascending ranks; missing ids drop
    silently. I/O = pushdown isin reads of the doclens doc_id column only."""
    from splade_ray.structured import ids_search

    out = ids_search(_index_for(sf_dir), IDS_SETS)
    out["rank"] = out["rank"].astype(np.int64)
    return out


def q_pinned_topk(sf_dir: str):
    """ES pinned query (structured.pinned_search): per query the existing
    pinned ids first in their given order (is_pinned=1, score 0.0), then
    organic BM25 minus the pinned set, ranks continuous, top_k total."""
    from splade_ray.structured import pinned_search

    run = pinned_search(
        _index_for(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        pinned=PINNED_SETS,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    # stable re-rank with the pinned-section ordering: pinned rows first in
    # their GIVEN order, organic rows by (score_r desc, doc_id asc)
    ords = {(q, d): i for q, ids in PINNED_SETS.items()
            for i, d in enumerate(ids, start=1)}
    out["ord"] = [ords.get((q, d), 10**9)
                  for q, d in zip(out["query_id"], out["doc_id"])]
    out = out.sort_values(
        ["query_id", "is_pinned", "ord", "score_r", "doc_id"],
        ascending=[True, False, True, False, True], kind="mergesort")
    out["rank"] = (out.groupby("query_id").cumcount() + 1).astype(np.int64)
    out = out[out["rank"] <= TOP_K].reset_index(drop=True)
    return out[["query_id", "rank", "doc_id", "is_pinned", "score_r"]]


def _dv5_index(sf_dir: str) -> str:
    """Index with a NULLABLE sidecar column (url = null on every third doc,
    deterministic so the SQL oracle mirrors it) — the exists-query probe."""
    work = _work_dir(sf_dir, "dvidx5")
    corpus_dir = os.path.join(work, "corpus")
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        def add_url(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            urls = pa.array(
                [None if i % 3 == 0 else f"u{i}" for i in ids], pa.string()
            )
            return batch.append_column("url", urls)

        tmp = corpus_dir + ".tmp"
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            add_url, batch_format="pyarrow", batch_size=512
        ).write_parquet(tmp)
        os.rename(tmp, corpus_dir)
    index_dir = os.path.join(work, "index")
    build_index(
        corpus_dir, index_dir, text_col="text", id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS, block_size=64, extra_doc_cols=("url",),
    )
    return index_dir


def q_exists_topk(sf_dir: str):
    """ES bool = match MUST + exists FILTER (structured.exists_search):
    BM25 top-k over docs whose nullable url doc-values column is non-null;
    the validity mask applies inside each segment before its cut."""
    from splade_ray.structured import exists_search

    run = exists_search(
        _dv5_index(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        col="url",
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


# terms-lookup probes: each query's value set comes from ONE row of a
# lookup table (lookup id 3 has an empty set, 99 is deliberately missing)
TL_LOOKUPS = {201: 1, 202: 2, 203: 3, 204: 99}
TL_ROWS = [(1, ["src1", "src3"]), (2, ["src5"]), (3, [])]
TL_TOP_K = 25


def _tl_index(sf_dir: str) -> tuple[str, str]:
    """Index over `documents` carrying `source` doc-values, plus the tiny
    lookup-table parquet (the ES terms-lookup `index`)."""
    work = _work_dir(sf_dir, "tlidx1")
    lookup = os.path.join(work, "lookup.parquet")
    if not os.path.exists(lookup):
        tmp = lookup + ".tmp"
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in TL_ROWS], pa.int64()),
                "srcs": pa.array([r[1] for r in TL_ROWS],
                                 pa.list_(pa.string())),
            }),
            tmp,
        )
        os.rename(tmp, lookup)
    index_dir = os.path.join(work, "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"), index_dir,
        text_col="text", id_col="doc_id", rows_per_segment=SEGMENT_ROWS,
        block_size=64, extra_doc_cols=("source",),
    )
    return index_dir, lookup


def q_terms_lookup(sf_dir: str):
    """ES terms-lookup query (structured.terms_lookup_search): per query
    the value set is fetched from ONE lookup-table row (pushdown isin
    read), then docs whose `source` doc-value is in the set match with
    constant score 1.0, doc_id-ascending ranks, per-query top_k cap.
    Empty and missing lookup rows match nothing (the ES contract)."""
    from splade_ray.structured import terms_lookup_search

    index_dir, lookup = _tl_index(sf_dir)
    out = terms_lookup_search(
        index_dir, TL_LOOKUPS, field="source", lookup_path=lookup,
        lookup_field="srcs", top_k=TL_TOP_K,
    )
    out["rank"] = out["rank"].astype(np.int64)
    return out


# geo probes: deterministic lat/lon derived from doc_id (SQL-mirrorable
# integer arithmetic), indexed as two extra doc-values columns
GEO_ORIGIN = (12.0, 34.0)
GEO_RADIUS_M = 4_000_000.0
GEO_LAT_RANGE = (-30.0, 40.0)
GEO_LON_RANGE = (-60.0, 120.0)
GEO_ZOOM = 3
GEO_GRID_SIZE = 12
GEO_BBOX_K = 25


def _geo_latlon(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lat = -60.0 + 120.0 * ((ids * 2654435761) % 100000) / 100000.0
    lon = -180.0 + 360.0 * ((ids * 40503 + 12345) % 100000) / 100000.0
    return lat, lon


_GEO_COORDS_SQL = """
coords AS (SELECT doc_id,
    -60.0 + 120.0 * ((doc_id * 2654435761) % 100000) / 100000.0 AS lat,
    -180.0 + 360.0 * ((doc_id * 40503 + 12345) % 100000) / 100000.0 AS lon
  FROM documents)"""


def _geo_index(sf_dir: str) -> str:
    """Index over documents + the deterministic (lat, lon) doc-values."""
    work = _work_dir(sf_dir, "geoidx1")
    corpus_dir = os.path.join(work, "corpus")
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        def add_coords(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            lat, lon = _geo_latlon(ids)
            return batch.append_column("lat", pa.array(lat)).append_column(
                "lon", pa.array(lon))

        tmp = corpus_dir + ".tmp"
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            add_coords, batch_format="pyarrow", batch_size=512
        ).write_parquet(tmp)
        os.rename(tmp, corpus_dir)
    index_dir = os.path.join(work, "index")
    build_index(
        corpus_dir, index_dir, text_col="text", id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS, block_size=64,
        extra_doc_cols=("lat", "lon"),
    )
    return index_dir


def q_geo_distance_topk(sf_dir: str):
    """ES geo_distance filter + _geo_distance sort (geo.geo_distance_search):
    matching docs within GEO_RADIUS_M of GEO_ORIGIN, nearest-first at the
    round4-metre determinism contract, per-query TOP_K."""
    from splade_ray.geo import geo_distance_search

    out = geo_distance_search(
        _geo_index(sf_dir), BM25_QUERIES, origin=GEO_ORIGIN,
        radius_m=GEO_RADIUS_M, top_k=TOP_K,
    )
    out = out.copy()
    out["rank"] = out["rank"].astype(np.int64)
    return out


def q_geo_bbox(sf_dir: str):
    """ES geo_bounding_box constant-score filter (geo.geo_bbox_search):
    matching docs inside the closed lat/lon box, score 1.0, doc_id-asc
    ranks, per-query GEO_BBOX_K cap."""
    from splade_ray.geo import geo_bbox_search

    out = geo_bbox_search(
        _geo_index(sf_dir), BM25_QUERIES, lat_range=GEO_LAT_RANGE,
        lon_range=GEO_LON_RANGE, top_k=GEO_BBOX_K,
    )
    out = out.copy()
    out["rank"] = out["rank"].astype(np.int64)
    return out


def q_geotile_grid(sf_dir: str):
    """ES geotile_grid aggregation (geo.geotile_grid_agg): exact per-tile
    doc counts over matching docs at GEO_ZOOM, top GEO_GRID_SIZE tiles by
    (n_docs desc, x asc, y asc) — per-segment partial counts, k-sized
    merge."""
    from splade_ray.geo import geotile_grid_agg

    return geotile_grid_agg(
        _geo_index(sf_dir), BM25_QUERIES, zoom=GEO_ZOOM, size=GEO_GRID_SIZE,
    )


COMPLETE_QUERIES = [(1, "s"), (2, "b"), (3, "wi")]
COMPLETE_M = 5


def q_suggest_complete(sf_dir: str):
    """Completion suggester (suggest.complete_prefix): per prefix the top-m
    lexicon terms by (df desc, term asc) — one pushdown range read of the
    lexicon per prefix, cost bounded by the prefix subtrie."""
    from splade_ray.suggest import complete_prefix

    return complete_prefix(_index_for(sf_dir), COMPLETE_QUERIES, m=COMPLETE_M)


# routing probes (ES _routing): hash-partitioned build, bucket-pruned search
ROUTING_NB = 8
ROUTING_VALUES = ["src1", "src5"]


def q_routed_topk(sf_dir: str):
    """Routed search (routing.routed_search — the ES _routing contract):
    the corpus is hash-partitioned by `source` into ROUTING_NB bucket
    indexes at build; the query fans out ONLY to the buckets of the given
    routing values and scores BM25 under the probed scope's union stats.
    Bucket hash = sha256-prefix mod n (SQL-mirrorable)."""
    from splade_ray.routing import build_routed_index, routed_search

    root = os.path.join(_work_dir(sf_dir, "routed"), "idx")
    if not os.path.exists(os.path.join(root, "routing.json")):
        build_routed_index(
            os.path.join(sf_dir, "documents.parquet"), root,
            routing_col="source", n_buckets=ROUTING_NB,
            text_col="text", id_col="doc_id", rows_per_segment=SEGMENT_ROWS,
        )
    run = routed_search(
        root, BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        routing=ROUTING_VALUES,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


MATCH_PERCENTS = (25.0, 50.0, 75.0, 95.0)


def q_match_percentiles(sf_dir: str):
    """ES percentiles aggregation, exact discrete form
    (docvalues.match_percentiles): per query the smallest n_chars value
    whose cumulative match count reaches ⌈p/100·n⌉ — segments emit
    value-cardinality-bounded (value, count) tables, the driver resolves
    from merged cumulative counts (ES approximates with t-digest)."""
    from splade_ray.docvalues import match_percentiles

    return match_percentiles(
        _dv_index(sf_dir), BM25_QUERIES, numeric_col="n_chars",
        percents=MATCH_PERCENTS,
    )


def _match_percentiles_sql() -> str:
    pv = ", ".join(f"({p})" for p in MATCH_PERCENTS)
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},
j AS (SELECT m.query_id, d.n_chars AS v
      FROM m JOIN documents d USING (doc_id)),
cnt AS (SELECT query_id, count(*)::BIGINT AS n FROM j GROUP BY 1),
cum AS (SELECT query_id, v, count(*)::BIGINT AS c FROM j GROUP BY 1, 2),
cc AS (SELECT query_id, v,
              sum(c) OVER (PARTITION BY query_id ORDER BY v) AS cumc
       FROM cum),
perc(p) AS (VALUES {pv})
SELECT cc.query_id, perc.p::DOUBLE AS percent, min(cc.v)::BIGINT AS value
FROM cc JOIN cnt USING (query_id) CROSS JOIN perc
WHERE cc.cumc >= greatest(ceil(perc.p / 100.0 * cnt.n), 1)
GROUP BY 1, 2"""


def q_field_stats(sf_dir: str):
    """ES value_count + missing + cardinality in one per-segment pass
    (docvalues.field_stats_agg) over the nullable url doc-values column:
    per query (n_value, n_missing, n_distinct) over live matches — exact
    cardinality under the facet contract (ES uses HLL++)."""
    from splade_ray.docvalues import field_stats_agg

    return field_stats_agg(_dv5_index(sf_dir), BM25_QUERIES, col="url")


# match_bool_prefix probes: last token is a prefix over the corpus lexicon
MBP_QUERIES = [(1, "merge join s"), (2, "window b"), (3, "data qu")]
MBP_MAX_TERMS = 10


def q_match_bool_prefix(sf_dir: str):
    """ES match_bool_prefix (suggest.match_bool_prefix_search): fixed terms
    keep their query tf, the last token expands as a capped ascending
    prefix (qtf=1 per expansion), all clauses bool-should summed."""
    from splade_ray.suggest import match_bool_prefix_search

    run = match_bool_prefix_search(
        _index_for(sf_dir), MBP_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        max_terms=MBP_MAX_TERMS,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


COMPOSITE_SOURCES = ["lang", "source"]
COMPOSITE_SIZE = 12


def q_composite_agg(sf_dir: str):
    """ES composite aggregation (docvalues.composite_agg): per query the
    first COMPOSITE_SIZE (lang, source) buckets of matching docs in
    ascending bucket-key order, with exact doc counts — each segment emits
    only its first `size` buckets after the cursor (pushdown paging)."""
    from splade_ray.docvalues import composite_agg

    page, _ = composite_agg(
        _dv2_index(sf_dir), BM25_QUERIES, sources=COMPOSITE_SOURCES,
        size=COMPOSITE_SIZE,
    )
    return page


def q_composite_agg_page2(sf_dir: str):
    """Composite aggregation page 2: re-enter with page 1's after_keys —
    buckets 13..24 per query, counts still exact under the per-segment
    emission cap."""
    from splade_ray.docvalues import composite_agg

    idx = _dv2_index(sf_dir)
    _, after = composite_agg(
        idx, BM25_QUERIES, sources=COMPOSITE_SOURCES, size=COMPOSITE_SIZE,
    )
    page, _ = composite_agg(
        idx, BM25_QUERIES, sources=COMPOSITE_SOURCES, size=COMPOSITE_SIZE,
        after=after,
    )
    return page


def q_sort_by_field(sf_dir: str):
    """Sort-by-field retrieval (docvalues.sort_search): matching docs ranked
    by the n_chars doc-value desc (tie doc_id asc) — Lucene Sort.LONG."""
    from splade_ray.docvalues import sort_search

    out = sort_search(
        _dv_index(sf_dir), BM25_QUERIES, sort_col="n_chars", descending=True,
        top_k=TOP_K,
    )
    out = out.copy()
    out["rank"] = out["rank"].astype(np.int64)
    out["sort_value"] = out["sort_value"].astype(np.int64)
    return out


def q_sort_by_field_indexed(sf_dir: str):
    """Sort-by-field THROUGH the derived sort-order layer
    (docvalues.build_sort_index — the Lucene index-time-sort analog):
    identical results to sort_by_field, served by the early-terminating
    permutation gather instead of a per-query lexsort; same SQL mirror."""
    from splade_ray.docvalues import build_sort_index, sort_search

    idx = _dv_index(sf_dir)
    build_sort_index(idx, "n_chars", descending=True)
    out = sort_search(
        idx, BM25_QUERIES, sort_col="n_chars", descending=True, top_k=TOP_K,
    )
    out = out.copy()
    out["rank"] = out["rank"].astype(np.int64)
    out["sort_value"] = out["sort_value"].astype(np.int64)
    return out


def q_match_counts(sf_dir: str):
    """Total-hit counts (docvalues.match_counts): exact live matching-doc
    count per query, zero rows included (TotalHitCountCollector)."""
    from splade_ray.docvalues import match_counts

    return match_counts(_dv_index(sf_dir), BM25_QUERIES)


def q_match_histogram(sf_dir: str):
    """Histogram aggregation over matches (docvalues.numeric_histogram):
    per-query match counts per n_chars bucket of width HIST_INTERVAL —
    the Elasticsearch histogram agg; integer-exact."""
    from splade_ray.docvalues import numeric_histogram

    return numeric_histogram(
        _dv_index(sf_dir), BM25_QUERIES, numeric_col="n_chars",
        interval=HIST_INTERVAL,
    )


def q_match_stats(sf_dir: str):
    """Metric aggregation over matches (docvalues.numeric_stats): per-query
    n/sum/min/max of the n_chars doc-value over live matching docs — the ES
    `stats` aggregation; all-integer columns."""
    from splade_ray.docvalues import numeric_stats

    return numeric_stats(_dv_index(sf_dir), BM25_QUERIES, numeric_col="n_chars")


def q_match_extended_stats(sf_dir: str):
    """ES extended_stats sketch (docvalues.numeric_stats extended=True):
    the stats partials plus per-(segment, query) sum-of-squares — variance
    and std derive driver-side (extended_stats_derive) from the integer
    partials, so the emitted frame stays integer-exact."""
    from splade_ray.docvalues import numeric_stats

    return numeric_stats(
        _dv_index(sf_dir), BM25_QUERIES, numeric_col="n_chars", extended=True
    )


# ES filters / range aggregation fixtures (docvalues.filters_agg/range_agg)
FILTERS_AGG_SPEC = {
    "short": ("range", "n_chars", None, 250),
    "long": ("range", "n_chars", 251, None),
    "latin": ("terms", "lang", ["en", "fr", "es"]),
}
RANGE_AGG_RANGES = [(None, 200), (200, 400), (400, None)]
RARE_MAX_DOC_COUNT = 2


def q_filters_agg(sf_dir: str):
    """ES filters aggregation (docvalues.filters_agg): named buckets of each
    query's live matches — two n_chars ranges + a lang terms filter — every
    (query, filter) pair present with exact counts (empty buckets = 0).
    Filter masks are query-independent, computed once per segment."""
    from splade_ray.docvalues import filters_agg

    return filters_agg(_dv2_index(sf_dir), BM25_QUERIES, filters=FILTERS_AGG_SPEC)


def q_range_agg(sf_dir: str):
    """ES range aggregation (docvalues.range_agg): per-query match counts in
    explicit n_chars ranges — `from` inclusive, `to` EXCLUSIVE (the ES
    contract, unlike the inclusive range *filter*), open bounds as '*'."""
    from splade_ray.docvalues import range_agg

    return range_agg(
        _dv2_index(sf_dir), BM25_QUERIES, numeric_col="n_chars",
        ranges=RANGE_AGG_RANGES,
    )


def q_multi_terms(sf_dir: str):
    """ES multi_terms aggregation (docvalues.multi_terms_agg): per query the
    top-10 (lang, source) value tuples of live matches by exact doc count,
    ties pinned (n_docs desc, tuple asc) — the terms-agg ordering over
    composite keys."""
    from splade_ray.docvalues import multi_terms_agg

    return multi_terms_agg(
        _dv2_index(sf_dir), BM25_QUERIES, cols=["lang", "source"], top=TOP_K
    )


def q_rare_terms(sf_dir: str):
    """ES rare_terms aggregation, exact form (docvalues.rare_terms_agg):
    n_chars values whose GLOBAL live-match count is <= RARE_MAX_DOC_COUNT per
    query — segments emit full facet counts so global rarity is exact (ES
    approximates with a CuckooFilter)."""
    from splade_ray.docvalues import rare_terms_agg

    return rare_terms_agg(
        _dv2_index(sf_dir), BM25_QUERIES, col="n_chars",
        max_doc_count=RARE_MAX_DOC_COUNT,
    )


def _dv4_index(sf_dir: str) -> str:
    """Index with a derived integer weight column (w = doc_id % 7 + 1,
    deterministic so the SQL oracle mirrors it) beside n_chars — the
    weighted_avg probe."""
    work = _work_dir(sf_dir, "dvidx4")
    corpus_dir = os.path.join(work, "corpus")
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        def add_w(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.append_column("w", pa.array(ids % 7 + 1))

        tmp = corpus_dir + ".tmp"
        _docs(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
            add_w, batch_format="pyarrow", batch_size=512
        ).write_parquet(tmp)
        os.rename(tmp, corpus_dir)
    index_dir = os.path.join(work, "index")
    build_index(
        corpus_dir, index_dir, text_col="text", id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS, block_size=64, extra_doc_cols=("n_chars", "w"),
    )
    return index_dir


def q_weighted_avg(sf_dir: str):
    """ES weighted_avg aggregation (docvalues.weighted_avg_agg): integer
    partials (n_docs, Σ n_chars·w, Σ w) per query over live matches, w a
    derived doc-values weight — the weighted mean derives from the exact
    partials driver-side."""
    from splade_ray.docvalues import weighted_avg_agg

    return weighted_avg_agg(
        _dv4_index(sf_dir), BM25_QUERIES, value_col="n_chars", weight_col="w"
    )


def _dv2_index(sf_dir: str) -> str:
    """Index with string sidecar doc columns (lang, source) alongside
    n_chars — the string doc-values probes."""
    index_dir = os.path.join(_work_dir(sf_dir, "dvidx2"), "index")
    build_index(
        os.path.join(sf_dir, "documents.parquet"),
        index_dir,
        text_col="text",
        id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS,
        block_size=64,
        extra_doc_cols=("n_chars", "lang", "source"),
    )
    return index_dir


STR_RANGE_LO, STR_RANGE_HI = "src1", "src5"


def q_range_topk_str(sf_dir: str):
    """String-range-filtered BM25 (docvalues.range_search with string
    bounds): Lucene TermRangeQuery FILTER over the `source` sidecar column,
    lexicographic binary collation — the filter applies inside each segment
    BEFORE its top-k cut, never changing corpus stats."""
    from splade_ray.docvalues import range_search

    run = range_search(
        _dv2_index(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        numeric_col="source", lo=STR_RANGE_LO, hi=STR_RANGE_HI,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_sort_multi(sf_dir: str):
    """Multi-field sort (docvalues.sort_search with sort_keys): matching
    docs ordered by (lang asc, n_chars desc, doc_id asc) — Lucene
    multi-field Sort with SortField.STRING + LONG."""
    from splade_ray.docvalues import sort_search

    out = sort_search(
        _dv2_index(sf_dir), BM25_QUERIES,
        sort_keys=[("lang", False), ("n_chars", True)], top_k=TOP_K,
    )
    out = out.copy()
    out["rank"] = out["rank"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out


def q_sort_multi_indexed(sf_dir: str):
    """Multi-field sort THROUGH the derived multi-key sort-order layer
    (docvalues.build_sort_index(keys=...) — the Lucene multi-field
    index-time-sort analog, string key included): identical results to
    sort_multi, served by the early-terminating permutation gather instead
    of a per-query lexsort; same SQL mirror."""
    from splade_ray.docvalues import build_sort_index, sort_search

    idx = _dv2_index(sf_dir)
    keys = [("lang", False), ("n_chars", True)]
    build_sort_index(idx, keys=keys)
    out = sort_search(idx, BM25_QUERIES, sort_keys=keys, top_k=TOP_K)
    out = out.copy()
    out["rank"] = out["rank"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out


def q_synonym_topk(sf_dir: str):
    """SynonymQuery retrieval (splade_ray.synonyms): each query term's
    synonym group scored as ONE term — summed tf saturated once, idf from
    the group's max df (the Lucene SynonymQuery contract)."""
    from splade_ray.synonyms import synonym_search

    run = synonym_search(
        _index_for(sf_dir), BM25_QUERIES, SYN_MAP,
        BM25Params(k1=K1, b=B, top_k=10**9),
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_wildcard_topk(sf_dir: str):
    """WildcardQuery retrieval (suggest.wildcard_search): pattern expanded
    over the lexicon (prefix-pushdown read + anchored RE2), ascending capped,
    BM25 OR-query with qtf=1 per expanded term."""
    from splade_ray.suggest import wildcard_search

    run = wildcard_search(
        _index_for(sf_dir), WILDCARD_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        max_terms=PREFIX_MAX_TERMS,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_regexp_topk(sf_dir: str):
    """RegexpQuery retrieval (suggest.regexp_search): anchored RE2 pattern
    expanded over the lexicon (literal-prefix pushdown read + ONE vectorized
    RE2 kernel), ascending capped, BM25 OR-query with qtf=1 per term."""
    from splade_ray.suggest import regexp_search

    run = regexp_search(
        _index_for(sf_dir), REGEXP_QUERIES, BM25Params(k1=K1, b=B, top_k=10**9),
        max_terms=PREFIX_MAX_TERMS,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r"]]


def q_substr_search(sf_dir: str):
    """Exact substring search via the per-segment trigram layer
    (splade_ray.trigram): candidate docs from rarest-first posting-list
    intersection of the needle's trigrams, then verification against the
    actual text — exact by construction, trigrams only prune I/O."""
    from splade_ray.trigram import build_trigrams, substring_search

    index_dir = _index_for(sf_dir)
    build_trigrams(index_dir)
    return substring_search(index_dir, SUBSTR_QUERIES)


def q_grep_scan(sf_dir: str):
    """Full-scan RE2 regex search (splade_ray.trigram.grep_scan) — the
    no-index baseline; both sides (Arrow and DuckDB) run RE2 with
    case-insensitive, leftmost non-overlapping extraction."""
    from splade_ray.trigram import grep_scan

    return grep_scan(_docs(sf_dir, ["doc_id", "text"]), GREP_QUERIES, regex=True)


def q_grep_snippets(sf_dir: str):
    """Substring search with snippet columns: pos (1-based char position of
    the first occurrence in the lowered text) + snippet (char window of the
    original text around it) — computed from the verification texts already
    in memory, zero extra I/O (splade_ray.trigram._match_snippets)."""
    from splade_ray.trigram import build_trigrams, substring_search

    index_dir = _index_for(sf_dir)
    build_trigrams(index_dir)
    return substring_search(index_dir, SUBSTR_QUERIES, snippets=True,
                            width=SNIPPET_WIDTH)


def q_substr_search_cs(sf_dir: str):
    """Case-SENSITIVE substring search: the lowered trigram layer still
    prunes (lowered candidates are a sound superset of exact-case matches);
    verification counts against the original text."""
    from splade_ray.trigram import build_trigrams, substring_search

    index_dir = _index_for(sf_dir)
    build_trigrams(index_dir)
    return substring_search(index_dir, SUBSTR_QUERIES, case_insensitive=False)


def q_regex_grep_pruned(sf_dir: str):
    """Trigram-PRUNED regex search (splade_ray.trigram.regex_search):
    required-literal analysis of each pattern (Cox code-search trick)
    yields an AND-of-OR trigram condition; candidates come from the
    per-segment trigram layer, verification is the same RE2 kernel as
    grep_scan — so the oracle mirror is identical and checks the pruning
    is lossless."""
    from splade_ray.trigram import build_trigrams, regex_search

    index_dir = _index_for(sf_dir)
    build_trigrams(index_dir)
    return regex_search(index_dir, GREP_QUERIES)


WINDOW_1H_US = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min


def _events(sf_dir: str, columns=None):
    from splade_ray.io import read_parquet_clean

    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"), columns=columns)


SAMPLE_SEED = 7
SAMPLE_RATE = 0.1
SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
BOTTOMK = 100


def q_sample_hash(sf_dir: str):
    """Deterministic Bernoulli sample (ops/sample.hash_sample): membership
    is a pure function of doc_id — identical across partitionings and
    re-runs."""
    from splade_ray.ops.sample import hash_sample

    return hash_sample(
        _docs(sf_dir, ["doc_id", "lang"]), SAMPLE_RATE, seed=SAMPLE_SEED
    )


def q_split_assign(sf_dir: str):
    """Deterministic train/val/test assignment by hash-bucket thresholds."""
    from splade_ray.ops.sample import split_assign

    return split_assign(_docs(sf_dir, ["doc_id"]), SPLIT_FRACTIONS, seed=SAMPLE_SEED)


def q_sample_bottomk(sf_dir: str):
    """Fixed-size uniform sample (bottom-k sketch over the id hash)."""
    from splade_ray.ops.sample import bottomk_sample

    return bottomk_sample(_docs(sf_dir, ["doc_id"]), BOTTOMK, seed=SAMPLE_SEED)


STRATA_RATES = {"en": 0.05, "de": 0.5, "zh": 1.0}
STRATA_DEFAULT = 0.2


def q_sample_stratified(sf_dir: str):
    """Per-stratum Bernoulli rates (ops/sample.stratified_sample): training
    mix re-weighting — keep all of a rare language, a sliver of the
    dominant one; same id hash as sample_hash so per-stratum samples nest."""
    from splade_ray.ops.sample import stratified_sample

    return stratified_sample(
        _docs(sf_dir, ["doc_id", "lang"]), STRATA_RATES,
        strata_col="lang", seed=SAMPLE_SEED, default_rate=STRATA_DEFAULT,
    )


TRAIN_SHARDS_N = 8


def q_train_shards(sf_dir: str):
    """Deterministic global shuffle into training shards
    (ops/sample.train_shards): (shard, pos) is a pure function of doc_id
    — byte-reproducible sharded exports at any partitioning/cluster
    shape. shard = top-bits bucket % N, pos = within-shard (hash, id)
    rank."""
    from splade_ray.ops.sample import train_shards

    return train_shards(
        _docs(sf_dir, ["doc_id"]), TRAIN_SHARDS_N, seed=SAMPLE_SEED
    )


# temperature source-mixing probe (ops/sample.temperature_sample)
MIX_ALPHA = 0.5
MIX_TARGET = 200
MIX_SEED = 13


def q_mix_sample(sf_dir: str):
    """Temperature source mixing (ops/sample.temperature_sample — the
    XLM-R alpha-scaling rule p_g ∝ n_g^alpha): per-source quotas by
    largest-remainder apportionment, selection = each source's quota rows
    with the smallest (hash(id), id) — deterministic and partitioning-
    invariant; rows outside every quota never shuffle."""
    from splade_ray.ops.sample import temperature_sample

    out, _ = temperature_sample(
        _docs(sf_dir, ["doc_id", "source"]), group_col="source",
        id_col="doc_id", alpha=MIX_ALPHA, target=MIX_TARGET, seed=MIX_SEED,
    )
    return (
        out.to_pandas()[["doc_id", "source"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


DECONTAM_K = 4  # eval-overlap gram width (Brown et al. 2020 use 13; the
DECONTAM_MOD = 10  # synthetic 31-word vocab needs a narrower gram to mix)
PACK_BUDGET = 512  # tokens per training pack
REDACT_PATTERNS = {
    # two real PII patterns (absent from the synthetic corpus — zero-count
    # columns still oracle-verified) plus two corpus-word patterns that
    # actually fire, exercising the replace path and the sequential-order
    # contract (b_pair runs on text a_dup already rewrote).
    "a_dup": r"\bdup\b",
    "b_pair": r"\b(join|sort)\b",
    "email": r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def _mod_filter(ds, mod: int, keep_equal: bool):
    """doc_id % mod == 0 (eval slice) or != 0 (train slice), vectorized."""

    def f(batch):
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        rem = ids % mod == 0
        return batch.filter(pa.array(rem if keep_equal else ~rem))

    return ds.map_batches(f, batch_format="pyarrow")


def q_decontam(sf_dir: str):
    """Benchmark decontamination (ops/curation.decontaminate): docs with
    doc_id % 10 == 0 act as the held-out eval set; every other doc is
    flagged with its eval k-gram overlap. Eval gram set broadcast once via
    ray.put; train side is a pure streaming scan (no shuffle)."""
    from splade_ray.ops.curation import decontaminate

    docs = _docs(sf_dir, ["doc_id", "text"])
    return decontaminate(
        _mod_filter(docs, DECONTAM_MOD, False),
        _mod_filter(docs, DECONTAM_MOD, True),
        k=DECONTAM_K,
    )


DUP_K = 5
DUP_MIN = 2


UNIT_MIN = 2


LSH_IDX_PERM, LSH_IDX_BANDS = 64, 16


def q_lsh_probe_counts(sf_dir: str):
    """Persisted MinHash-LSH index probe (ops/dedup.minhash_index_build/
    probe — the daily-crawl incremental near-dup shape): the increment is
    every even doc re-numbered +100000, probed against the persisted
    index at n_match >= 0.5·64. FULLY mirrored in SQL on the
    already-oracle-checked signature machinery (minhash_sigs): band
    folds, bucket pairing new×old, per-pair matched-perm counts — the
    dedup_minhash_counts recipe applied to the incremental face. (An
    earlier 'exact construction' twin assumed full 64-perm agreement
    certifies identical text; near-dups at J≈0.97 pass all 64 minima
    with P≈0.18 — probabilistic, so the twin now computes the real
    thing.)"""
    from splade_ray.ops.dedup import minhash_index_build, minhash_index_probe

    idx = os.path.join(_work_dir(sf_dir, "lshidx"), "lsh")
    minhash_index_build(
        _docs(sf_dir, ["doc_id", "text"]), idx,
        num_perm=LSH_IDX_PERM, bands=LSH_IDX_BANDS,
    )

    def renumber(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % 2 == 0
        t = batch.filter(pa.array(keep))
        return t.set_column(
            t.schema.get_field_index("doc_id"), "doc_id",
            pa.array(t["doc_id"].to_numpy(zero_copy_only=False) + 100_000,
                     pa.int64()),
        )

    inc = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        renumber, batch_format="pyarrow")
    return minhash_index_probe(inc, idx, min_est_jaccard=0.5)


def q_unit_dedup(sf_dir: str):
    """Sub-document sentence-unit dedup (ops/curation.unit_dedup — the
    Dolma paragraph-dedup / C4 sentence-dedup shape): units = sentence
    chunks normalized to their analyzed-token join; per doc the unit count
    and how many of its units occur >= UNIT_MIN times corpus-wide
    (within-doc repeats count). Pass 1 ships only (sha-prefix, unit sha,
    count) combiner rows; pass 2 is a broadcast-membership scan."""
    from splade_ray.ops.curation import unit_dedup

    return unit_dedup(_docs(sf_dir, ["doc_id", "text"]), min_count=UNIT_MIN)


def q_unit_dedup_sharded(sf_dir: str):
    """Memory-bounded sharded sentence-unit dedup
    (ops/curation.unit_dedup_sharded, replace=False stats face): the
    duplicated-unit key set streams in hash shards instead of one
    broadcast; same per-doc (n_units, n_dup_units) contract and the same
    SQL mirror as unit_dedup. Fresh work dir per call (pass-1 manifest
    scoped to the run)."""
    import tempfile

    from splade_ray.ops.curation import unit_dedup_sharded

    wd = tempfile.mkdtemp(prefix="uds-oracle-")
    return unit_dedup_sharded(
        _docs(sf_dir, ["doc_id", "text"]), wd, min_count=UNIT_MIN,
        n_shards=4, replace=False,
    )


def _synth_url_batch(batch: pa.Table) -> pa.Table:
    """Deterministic messy-URL column from (doc_id, source) — four spelling
    variants (case/www/default-port/tracking/fragment/trailing-slash) that
    canonicalize into colliding keys; the SQL mirror builds the identical
    strings with a CASE."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    srcs = batch["source"].to_pylist()
    urls = []
    for i, s in zip(ids, srcs):
        k, m = int(i) % 7, int(i) % 5
        v = int(i) % 4
        if v == 0:
            u = f"HTTP://WWW.{s}.Example.com:80/Docs/{k}/"
        elif v == 1:
            u = f"http://{s}.example.com/Docs/{k}?utm_source=feed"
        elif v == 2:
            u = f"http://{s}.example.com/Docs/{k}?id={m}&utm_campaign=x#frag"
        else:
            u = f"https://www.{s}.example.com:443/Docs/{k}?id={m}"
        urls.append(u)
    return batch.append_column("url", pa.array(urls, pa.string()))


_SYNTH_URL_SQL = """CASE doc_id % 4
  WHEN 0 THEN 'HTTP://WWW.' || source || '.Example.com:80/Docs/' || (doc_id % 7) || '/'
  WHEN 1 THEN 'http://' || source || '.example.com/Docs/' || (doc_id % 7) || '?utm_source=feed'
  WHEN 2 THEN 'http://' || source || '.example.com/Docs/' || (doc_id % 7) || '?id=' || (doc_id % 5) || '&utm_campaign=x#frag'
  ELSE 'https://www.' || source || '.example.com:443/Docs/' || (doc_id % 7) || '?id=' || (doc_id % 5)
END"""


def q_url_normalize(sf_dir: str):
    """URL canonicalization (ops/urlnorm.normalize_url_column — the
    FineWeb/CommonCrawl crawl-dedup key): lowercase + the shared RE2
    chain (fragment, tracking params, empty query, default ports, www,
    trailing slash), patterns shared VERBATIM with the SQL mirror."""
    from splade_ray.ops.urlnorm import add_url_norm

    return (
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(_synth_url_batch, batch_format="pyarrow")
        .map_batches(lambda b: add_url_norm(b).select(["doc_id", "url_norm"]),
                     batch_format="pyarrow")
    )


def q_url_dedup(sf_dir: str):
    """URL-keyed dedup (ops/urlnorm.url_dedup): lowest doc per canonical
    URL with its copy count — the exact_dedup recipe keyed on the
    normalized URL (one coarse sha-prefix groupby of slim key rows)."""
    from splade_ray.ops.urlnorm import url_dedup

    ds = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        _synth_url_batch, batch_format="pyarrow")
    return url_dedup(ds)


def q_dup_spans(sf_dir: str):
    """Exact duplicated-substring scan (ops/curation.duplicated_spans, the
    k-gram formulation of Lee et al. 2022 ExactSubstr): per doc the count of
    duplicated k-grams, token positions covered by a duplicated window, and
    maximal covered spans. Pass 1 = batch-local gram-count combiners + one
    (gram,count) groupby; pass 2 = streaming scan vs the broadcast
    duplicated-gram set."""
    from splade_ray.ops.curation import duplicated_spans

    return duplicated_spans(
        _docs(sf_dir, ["doc_id", "text"]), k=DUP_K, min_count=DUP_MIN
    )


def q_dup_spans_rewrite(sf_dir: str):
    """The ExactSubstr CUT itself (ops/curation.drop_duplicated_spans):
    each doc's text replaced by its analyzed token stream minus every
    position covered by a duplicated k-gram window, space-joined (the
    repo's rewrite normalization). Oracle = the dup_spans coverage CTE
    inverted: tokens at non-covered positions, string_agg'd in order."""
    from splade_ray.ops.curation import drop_duplicated_spans

    out = drop_duplicated_spans(
        _docs(sf_dir, ["doc_id", "text"]), k=DUP_K, min_count=DUP_MIN
    ).to_pandas()
    return out[["doc_id", "text"]]


def q_dup_spans_rewrite_sharded(sf_dir: str):
    """The memory-bounded sharded rewrite
    (ops/curation.drop_duplicated_spans_sharded): same contract as
    dup_spans_rewrite — per-shard hit rows + broadcast (or joined) cut —
    so the same SQL mirror checks it; a fresh work dir per call keeps the
    gram-shard manifest from leaking across runs."""
    import tempfile

    from splade_ray.ops.curation import drop_duplicated_spans_sharded

    wd = tempfile.mkdtemp(prefix="dsr-oracle-")
    out = drop_duplicated_spans_sharded(
        _docs(sf_dir, ["doc_id", "text"]), wd, k=DUP_K, min_count=DUP_MIN,
        n_shards=4,
    ).to_pandas()
    return out[["doc_id", "text"]]


def _dup_spans_rewrite_sql() -> str:
    """Mirror of the span cut: the _dup_spans_sql coverage CTE, inverted to
    kept token positions, space-joined (empty docs and fully-cut docs both
    yield '')."""
    p = 1099511628211
    k = DUP_K
    fold = _fold_sql([f"h[i+{j}]" for j in range(k)], p)
    th = _HASH64_SQL.format(t="t")
    return f"""
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS tl
  FROM documents
),
hs AS (SELECT doc_id, list_transform(tl, t -> {th}) AS h FROM tk),
gi AS (SELECT doc_id, h, unnest(generate_series(1, greatest(len(h) - {k - 1}, 0))) AS i
       FROM hs),
g AS (SELECT doc_id, i, {fold} AS g FROM gi),
gc AS (SELECT g, count(*)::BIGINT AS c FROM g GROUP BY g),
dg AS (SELECT g.doc_id, g.i FROM g JOIN gc USING (g) WHERE gc.c >= {DUP_MIN}),
cov AS (SELECT DISTINCT dg.doc_id, dg.i + r.range AS p FROM dg CROSS JOIN range({k}) r),
pos AS (SELECT doc_id, unnest(generate_series(1, len(tl))) AS p FROM tk),
keep AS (SELECT pos.doc_id, pos.p FROM pos LEFT JOIN cov
           ON cov.doc_id = pos.doc_id AND cov.p = pos.p
         WHERE cov.p IS NULL),
joined AS (SELECT tk.doc_id,
                  string_agg(tk.tl[keep.p], ' ' ORDER BY keep.p) AS t
           FROM keep JOIN tk USING (doc_id) GROUP BY tk.doc_id)
SELECT tk.doc_id, coalesce(j.t, '') AS text
FROM tk LEFT JOIN joined j USING (doc_id)"""


def q_pack_assign(sf_dir: str):
    """Sequence-pack assignment (ops/curation.pack_assign): global-order
    exclusive token cumsum // budget, computed as a distributed prefix-scan
    (per-id-range totals -> driver prefix offsets -> per-range local
    cumsum). Only the (doc_id, n_tokens) pair table shuffles."""
    from splade_ray.ops.curation import pack_assign

    return pack_assign(_docs(sf_dir, ["doc_id", "text"]), budget=PACK_BUDGET)


def q_redact(sf_dir: str):
    """PII/regex redaction scan (ops/curation.redact_batch): per-label
    match counts + redacted text, labels applied in sorted order."""
    from splade_ray.ops.curation import redact_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        redact_batch,
        batch_format="pyarrow",
        batch_size=512,
        fn_kwargs={"patterns": REDACT_PATTERNS},
    )


# DSIR importance resampling (Xie et al. 2023): target = the English slice,
# raw = the whole corpus; hashed unigram+bigram features
DSIR_NB = 512
DSIR_MG = 2
DSIR_TARGET_LANG = "en"
DSIR_K = 50
DSIR_SEED = 7


def _docs_lang(sf_dir: str, lang: str):
    import pyarrow.compute as pc

    def f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["lang"], lang))

    return _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        f, batch_format="pyarrow"
    )


def q_dsir_counts(sf_dir: str):
    """Hashed n-gram feature fit (ops/curation.dsir_bucket_counts): global
    bucket counts of unigram+bigram sha256-prefix hashes mod DSIR_NB —
    batch-local bincount partials, one bucket-sized groupby."""
    from splade_ray.ops.curation import dsir_bucket_counts

    vec = dsir_bucket_counts(
        _docs(sf_dir, ["doc_id", "text"]), n_buckets=DSIR_NB, max_gram=DSIR_MG
    )
    nz = np.flatnonzero(vec)
    return pd.DataFrame({"bucket": nz.astype(np.int64), "cnt": vec[nz]})


def q_dsir_weights(sf_dir: str):
    """Per-doc DSIR log importance weight ln p(doc)/q(doc) under Laplace-
    smoothed hashed-n-gram bag distributions (target = lang='en' docs, raw =
    all docs); n_feats is integer-exact, the weight mirrors via round4."""
    from splade_ray.ops.curation import dsir_importance

    w = dsir_importance(
        _docs(sf_dir, ["doc_id", "text"]),
        _docs_lang(sf_dir, DSIR_TARGET_LANG),
        n_buckets=DSIR_NB,
        max_gram=DSIR_MG,
    ).to_pandas()
    w = w.sort_values("doc_id").reset_index(drop=True)
    w["log_weight_r"] = _round4(w["log_weight"].to_numpy())
    return w[["doc_id", "n_feats", "log_weight_r"]]


def q_dsir_select(sf_dir: str):
    """Gumbel top-k resampling (ops/curation.dsir_select): key =
    log_weight + Gumbel(h(doc_id)) with the variate a pure function of the
    id (ops/sample.py hash) — deterministic and partitioning-invariant."""
    from splade_ray.ops.curation import dsir_importance, dsir_select

    w = dsir_importance(
        _docs(sf_dir, ["doc_id", "text"]),
        _docs_lang(sf_dir, DSIR_TARGET_LANG),
        n_buckets=DSIR_NB,
        max_gram=DSIR_MG,
    )
    sel = dsir_select(w, DSIR_K, seed=DSIR_SEED)
    sel = sel.reset_index(drop=True)
    sel["rank"] = np.arange(1, len(sel) + 1, dtype=np.int64)
    return sel[["rank", "doc_id"]]


LM_NB = 512  # hashed bigram-LM bucket count (mirror hardcodes n=2)


def _lm_fit(sf_dir: str) -> dict:
    from splade_ray.ops.curation import ngram_lm_fit

    return ngram_lm_fit(
        _docs(sf_dir, ["doc_id", "text"]), n=2, n_buckets=LM_NB
    )


def q_lm_counts(sf_dir: str):
    """Hashed add-alpha bigram LM fit (ops/curation.ngram_lm_fit, the CCNet
    quality-LM recipe with KenLM replaced by hashed counts): nonzero
    (k, bucket, cnt) rows of the gram (k=2) and context (k=1) count
    vectors — all-integer, one streaming pass, bucket-sized shuffle."""
    fit = _lm_fit(sf_dir)
    rows = []
    for k, vec in ((2, fit["gram"]), (1, fit["ctx"])):
        nz = np.flatnonzero(vec)
        rows.append(pd.DataFrame({
            "k": np.full(nz.size, k, np.int64),
            "bucket": nz.astype(np.int64),
            "cnt": vec[nz].astype(np.int64),
        }))
    return pd.concat(rows, ignore_index=True)


def q_lm_ppl(sf_dir: str):
    """Per-doc perplexity under the self-fit hashed bigram LM
    (ops/curation.ngram_lm_scores): logprob = sum of
    ln((c(bigram)+1)/(c(unigram ctx)+NB)) over full-context positions,
    ppl = exp(-logprob/n_scored); docs shorter than 2 tokens emit the
    (0, 0, 0) sentinel. Fit vectors broadcast once; scoring is a pure
    streaming scan."""
    from splade_ray.ops.curation import ngram_lm_scores

    fit = _lm_fit(sf_dir)
    got = (
        ngram_lm_scores(_docs(sf_dir, ["doc_id", "text"]), fit, alpha=1.0)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    got["logprob_r"] = _round4(got["logprob"].to_numpy())
    got["ppl_r"] = _round4(got["ppl"].to_numpy())
    return got[["doc_id", "n_scored", "logprob_r", "ppl_r"]]


def q_phrase_topk(sf_dir: str):
    """BM25-ranked phrase retrieval (positions.phrase_topk): phrase df from
    a phrase-sized groupby, vectorized scoring over matches, per-phrase
    top-k merge."""
    from splade_ray.positions import build_positions, phrase_topk

    index_dir = _index_for(sf_dir)
    build_positions(index_dir)
    run = phrase_topk(index_dir, PHRASE_QUERIES,
                      BM25Params(k1=K1, b=B, top_k=10**9))
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], part_cols=("phrase_id",), k=TOP_K)
    return out[["phrase_id", "rank", "doc_id", "score_r"]]


HOP_15M_US = 900_000_000


def q_window_hop(sf_dir: str):
    """Hopping windows: 1h length, 15-min hop — each event replicated into
    its 4 windows batch-locally; the shuffle still carries only (window,
    type) combiner rows."""
    from splade_ray.ops.windows import tumbling_window_agg

    return tumbling_window_agg(
        _events(sf_dir, ["ts", "event_type", "value"]), WINDOW_1H_US,
        hop_us=HOP_15M_US,
    )


TOPN_PER_TYPE = 5


def q_top_events_per_type(sf_dir: str):
    """Grouped top-N (ops/topn.grouped_topn): the 5 highest-value events
    per event_type — batch-local top-N pruning before the shuffle, so at
    most N × keys × blocks candidate rows move."""
    from splade_ray.ops.topn import grouped_topn

    def prep(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "event_id": batch["event_id"].cast(pa.int64()),
                "value_c": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
            }
        )

    ds = _events(sf_dir, ["event_id", "event_type", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    return grouped_topn(
        ds, "event_type", "value_c", n=TOPN_PER_TYPE, tie_col="event_id"
    )


def q_window_agg(sf_dir: str):
    """Tumbling 1h windows per event_type over `events` (ops/windows):
    count + sum/min/max value in integer cents; batch-local combiners, the
    shuffle carries only (window, type) partials."""
    from splade_ray.ops.windows import tumbling_window_agg

    return tumbling_window_agg(
        _events(sf_dir, ["ts", "event_type", "value"]), WINDOW_1H_US
    )


AUTO_HIST_TARGET = 40


def q_auto_date_histogram(sf_dir: str):
    """ES auto_date_histogram (ops/windows.auto_date_histogram): interval
    picked from the rounding ladder so <= AUTO_HIST_TARGET buckets cover
    the events span (two aggregate-shaped passes: min/max reduce + the
    tumbling combiner); rows carry the chosen interval_us."""
    from splade_ray.ops.windows import auto_date_histogram

    out, step = auto_date_histogram(
        _events(sf_dir, ["ts", "event_type", "value"]),
        target_buckets=AUTO_HIST_TARGET,
    )
    pdf = out.to_pandas().sort_values(["window_start_us", "event_type"])
    pdf["interval_us"] = np.int64(step)
    return pdf.reset_index(drop=True)


PIPELINE_MOV_WINDOW = 3
PIPELINE_SERIAL_LAG = 2


def q_bucket_pipeline(sf_dir: str):
    """Pipeline aggregations (ops.windows.bucket_pipeline; ES derivative /
    cumulative_sum / moving_fn / bucket_script) over the 1h date-histogram
    buckets: the parent agg is distributed (combiner + partial-sized
    shuffle), the pipeline math walks the windows x keys bucket table like
    the ES coordinating node. deriv is split into (deriv0, has_prev) so
    every column stays integer/bool/round4-exact."""
    from splade_ray.ops.windows import bucket_pipeline, tumbling_window_agg

    buckets = tumbling_window_agg(
        _events(sf_dir, ["ts", "event_type", "value"]), WINDOW_1H_US
    )
    out = bucket_pipeline(
        buckets, window=PIPELINE_MOV_WINDOW, serial_lag=PIPELINE_SERIAL_LAG
    )
    out["has_prev"] = out["deriv"].notna()
    out["deriv0"] = out["deriv"].fillna(0).astype(np.int64)
    out["has_lag"] = out["serial_diff"].notna()
    out["serial_diff0"] = out["serial_diff"].fillna(0).astype(np.int64)
    out["mov_avg_r"] = _round4(out["mov_avg"].to_numpy(np.float64))
    out["per_event_r"] = _round4(out["per_event"].to_numpy(np.float64))
    return out[
        ["window_start_us", "event_type", "n_events", "sum_value_c",
         "cum_sum", "deriv0", "has_prev", "serial_diff0", "has_lag",
         "mov_avg_r", "per_event_r"]
    ]


MATRIX_COLS = ["value_c", "user_id"]


def _events_numeric(sf_dir: str):
    """events with the derived integer-cents column, for the moment
    sketches (same floor(x*100+0.5) as the window aggregates)."""
    def add_cents(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "value_c": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
                "user_id": batch["user_id"],
            }
        )

    return _events(sf_dir, ["user_id", "value"]).map_batches(
        add_cents, batch_format="pyarrow"
    )


PCT_RANK_VALUES = [100, 500, 1000, 2000]


def q_percentile_ranks(sf_dir: str):
    """percentile_ranks aggregation (ops.sketch.percentile_ranks; ES
    inverted percentiles): exact per-(event_type, threshold) rank counts
    from one combiner pass, integer permille output."""
    from splade_ray.ops.sketch import percentile_ranks

    return percentile_ranks(
        _events_numeric_typed(sf_dir), "value_c", PCT_RANK_VALUES,
        by="event_type",
    )


def _events_numeric_typed(sf_dir: str):
    """events with (event_type, value_c) for the rank aggregation."""
    def add_cents(batch: pa.Table) -> pa.Table:
        v = batch["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "value_c": pa.array(np.floor(v * 100 + 0.5).astype(np.int64)),
            }
        )

    return _events(sf_dir, ["event_type", "value"]).map_batches(
        add_cents, batch_format="pyarrow"
    )


def q_matrix_stats(sf_dir: str):
    """matrix_stats aggregation (ops.moments.matrix_stats; ES matrix_stats):
    pairwise sample covariance / Pearson correlation over (value_c,
    user_id) from one constant-size-partial streaming pass."""
    from splade_ray.ops.moments import matrix_stats

    out = matrix_stats(_events_numeric(sf_dir), MATRIX_COLS)
    out["mean_a_r"] = _round4(out["mean_a"].to_numpy(np.float64))
    out["mean_b_r"] = _round4(out["mean_b"].to_numpy(np.float64))
    out["cov_r"] = _round4(out["cov"].to_numpy(np.float64))
    out["corr_r"] = _round4(out["corr"].to_numpy(np.float64))
    return out[["field_a", "field_b", "n", "mean_a_r", "mean_b_r", "cov_r", "corr_r"]]


CHUNK_SIZE, CHUNK_OVERLAP = 24, 8


def q_chunk_docs(sf_dir: str):
    """Token-window chunking (ops/chunk.chunk_texts — the RAG context
    split): overlapping analyzed-token windows per doc, stride = size −
    overlap, stopping after the first end-reaching chunk. Fully
    vectorized (repeat/arange index build + one binary_join)."""
    from splade_ray.ops.chunk import chunk_texts

    out = (
        chunk_texts(_docs(sf_dir, ["doc_id", "text"]),
                    size=CHUNK_SIZE, overlap=CHUNK_OVERLAP)
        .to_pandas().sort_values(["doc_id", "chunk_id"])
    )
    return out.reset_index(drop=True)


def _dv6_index(sf_dir: str) -> str:
    """Index with a LIST doc-values column (tags = [lang, source], plus a
    duplicated lang on every third doc so the distinct-per-doc contract is
    exercised) — the ES array-field facet probe."""
    work = _work_dir(sf_dir, "dvidx6")
    corpus_dir = os.path.join(work, "corpus")
    if not os.path.isdir(corpus_dir) or not os.listdir(corpus_dir):
        def add_tags(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            langs = batch["lang"].to_pylist()
            srcs = batch["source"].to_pylist()
            tags = [
                [l, s] + ([l] if i % 3 == 0 else [])
                for i, l, s in zip(ids, langs, srcs)
            ]
            return batch.append_column(
                "tags", pa.array(tags, pa.list_(pa.string()))
            )

        tmp = corpus_dir + ".tmp"
        _docs(sf_dir, ["doc_id", "text", "lang", "source"]).map_batches(
            add_tags, batch_format="pyarrow", batch_size=512
        ).write_parquet(tmp)
        os.rename(tmp, corpus_dir)
    index_dir = os.path.join(work, "index")
    build_index(
        corpus_dir, index_dir, text_col="text", id_col="doc_id",
        rows_per_segment=SEGMENT_ROWS, block_size=64, extra_doc_cols=("tags",),
    )
    return index_dir


def q_facet_tags(sf_dir: str):
    """Multivalued facet counts (facets.facet_counts multivalued=True —
    ES terms agg over an array field): per query, matching docs counted
    once per DISTINCT tag they carry; the explode + dedupe runs once per
    segment, query-independent."""
    from splade_ray.facets import facet_counts

    return facet_counts(_dv6_index(sf_dir), BM25_QUERIES, facet_col="tags",
                        multivalued=True)


def q_rag_topk(sf_dir: str):
    """RAG pipeline (pipelines/rag): documents chunked into overlapping
    token windows, chunks indexed with parent doc-values, parents ranked
    by their best matching chunk's BM25 (block-join max over ALL matching
    chunks, not a top-k window) — the full chunk→index→retrieve→parent
    composition as ONE oracle-checked entry.

    Tie-stability: rank is recomputed AFTER 1e-4 rounding from
    (score_r desc, parent asc) on BOTH sides — the raw float order within
    a sub-rounding tie cohort differs between numpy and DuckDB (ln() by
    1 ulp), so the entry fetches ALL matching parents and cuts at TOP_K
    only after the rounded re-rank (round-3 VERDICT item 1)."""
    from splade_ray.pipelines.rag import build_chunk_index, rag_search

    root = os.path.join(_work_dir(sf_dir, "ragidx"), "rag")
    build_chunk_index(
        os.path.join(sf_dir, "documents.parquet"), root,
        size=CHUNK_SIZE, overlap=CHUNK_OVERLAP,
        text_col="text", id_col="doc_id", rows_per_segment=SEGMENT_ROWS,
    )
    run = rag_search(root, BM25_QUERIES, BM25Params(k1=K1, b=B),
                     score_mode="max", top_k=10**9)
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = out.sort_values(["query_id", "score_r", "parent"],
                          ascending=[True, False, True], kind="mergesort")
    out["rank"] = out.groupby("query_id").cumcount().add(1).astype(np.int64)
    out = out[out["rank"] <= TOP_K]
    return out.reset_index(drop=True)[
        ["query_id", "rank", "parent", "score_r", "n_children"]]


def q_rag_chunks(sf_dir: str):
    """Chunk-level RAG retrieval with payloads (pipelines/rag
    .rag_search_chunks): top-k chunks per query with parent doc id and
    chunk text, texts fetched via a k-sized pushdown isin read of the
    persisted chunk parquet."""
    from splade_ray.pipelines.rag import build_chunk_index, rag_search_chunks

    root = os.path.join(_work_dir(sf_dir, "ragidx"), "rag")
    build_chunk_index(
        os.path.join(sf_dir, "documents.parquet"), root,
        size=CHUNK_SIZE, overlap=CHUNK_OVERLAP,
        text_col="text", id_col="doc_id", rows_per_segment=SEGMENT_ROWS,
    )
    run = rag_search_chunks(root, BM25_QUERIES,
                            BM25Params(k1=K1, b=B, top_k=10**9))
    out = run.copy()
    # Tie-stability (round-3 VERDICT item 1): rank recomputed AFTER
    # rounding from (score_r desc, chunk_uid asc) on both sides, cut at
    # TOP_K only then — raw float order below 1e-4 is ulp-unstable
    # between numpy and DuckDB.
    out["score_r"] = _round4(out["score"].to_numpy())
    out["cid"] = (out["doc_id"].to_numpy(np.int64) * 100_000
                  + out["chunk_id"].to_numpy(np.int64))
    out = out.sort_values(["query_id", "score_r", "cid"],
                          ascending=[True, False, True], kind="mergesort")
    out["rank"] = out.groupby("query_id").cumcount().add(1).astype(np.int64)
    out = out[out["rank"] <= TOP_K]
    return out.reset_index(drop=True)[
        ["query_id", "rank", "doc_id", "chunk_id", "score_r", "chunk"]]


def q_has_parent_chunks(sf_dir: str):
    """ES has_parent over the chunk layer (pipelines/rag
    .has_parent_search): every CHILD chunk of each TOP_K matching parent,
    carrying the parent's block-join score and rank. The parent ranking is
    injected tie-stably (parents_run — the sig_terms fg_run pattern):
    fetched in full, rounded, re-ranked by (score_r desc, parent asc),
    cut at TOP_K — so sub-rounding ln() ulp order can't flip a cohort."""
    from splade_ray.pipelines.rag import (
        build_chunk_index,
        has_parent_search,
        rag_search,
    )

    root = os.path.join(_work_dir(sf_dir, "ragidx"), "rag")
    build_chunk_index(
        os.path.join(sf_dir, "documents.parquet"), root,
        size=CHUNK_SIZE, overlap=CHUNK_OVERLAP,
        text_col="text", id_col="doc_id", rows_per_segment=SEGMENT_ROWS,
    )
    parents = rag_search(root, BM25_QUERIES, BM25Params(k1=K1, b=B),
                         score_mode="max", top_k=10**9)
    parents["score"] = _round4(parents["score"].to_numpy())
    parents = parents.sort_values(["query_id", "score", "parent"],
                                  ascending=[True, False, True],
                                  kind="mergesort")
    parents["rank"] = parents.groupby("query_id").cumcount().add(1)
    parents = parents[parents["rank"] <= TOP_K]
    out = has_parent_search(root, BM25_QUERIES, parents_run=parents)
    out = out.rename(columns={"parent_score": "parent_score_r"})
    out["parent_rank"] = out["parent_rank"].astype(np.int64)
    out["chunk_id"] = out["chunk_id"].astype(np.int64)
    return out[["query_id", "parent_rank", "parent", "parent_score_r",
                "chunk_id", "chunk"]]


def _has_parent_sql() -> str:
    """has_parent mirror: the rag parent ranking (rounded, rank after
    rounding) joined back onto the chunks CTE — one row per (query,
    top-parent, chunk)."""
    return _rag_sql_base() + f"""
, par AS (SELECT query_id, doc_id::VARCHAR AS parent,
                 {_round4_sql('max(score)')} AS score_r,
                 count(*)::BIGINT AS n_children
          FROM scores WHERE score > 0 GROUP BY 1, 2),
ranked AS (
  SELECT query_id, parent, score_r,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_r DESC, parent ASC) AS rank
  FROM par
)
SELECT r.query_id, r.rank::BIGINT AS parent_rank, r.parent,
       r.score_r AS parent_score_r, c.chunk_id, c.chunk
FROM ranked r JOIN chunks c ON c.doc_id::VARCHAR = r.parent
WHERE r.rank <= {TOP_K}"""


def _rag_chunks_sql() -> str:
    """rag_chunks mirror: the rag chunk/BM25 chain ranked at chunk level
    by the ROUNDED score (score_r desc, chunk_uid asc) — rank after
    rounding on both sides (tie-stability, round-3 VERDICT item 1) —
    with the chunk text joined back."""
    return _rag_sql_base() + f"""
, ranked AS (
  SELECT query_id, cid, doc_id, {_round4_sql('score')} AS score_r,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_round4_sql('score')} DESC, cid ASC)
             AS rank
  FROM scores WHERE score > 0
)
SELECT r.query_id, r.rank::BIGINT AS rank, r.doc_id,
       (r.cid % {100_000})::BIGINT AS chunk_id, r.score_r, c.chunk
FROM ranked r
JOIN chunks c ON c.doc_id = r.doc_id AND c.chunk_id = r.cid % {100_000}
WHERE r.rank <= {TOP_K}"""


def _rag_sql_base() -> str:
    """Shared WITH-chain for the rag mirrors, ending at `scores`
    (query_id, cid, doc_id, score) with the `chunks` CTE still in scope."""
    stride = CHUNK_SIZE - CHUNK_OVERLAP
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH toks0 AS (SELECT doc_id,
                      regexp_extract_all(lower(text), '{TOKEN_SQL}') AS ts
               FROM documents),
st AS (SELECT doc_id, ts, len(ts)::BIGINT AS n FROM toks0 WHERE len(ts) > 0),
ch AS (SELECT doc_id, ts, n,
              unnest(generate_series(
                  0,
                  ((greatest(n - {CHUNK_SIZE}, 0) + {stride} - 1)
                   // {stride}) * {stride},
                  {stride})) AS start
       FROM st),
chunks AS (SELECT doc_id, (start // {stride})::BIGINT AS chunk_id,
                  array_to_string(
                      ts[start + 1 : least(start + {CHUNK_SIZE}, n)], ' '
                  ) AS chunk
           FROM ch),
ctoks AS (SELECT doc_id * {100_000} + chunk_id AS cid, doc_id,
                 unnest(regexp_extract_all(lower(chunk), '{TOKEN_SQL}')) AS term
          FROM chunks),
tf AS (SELECT cid, doc_id, term, count(*)::BIGINT AS tf
       FROM ctoks GROUP BY 1, 2, 3),
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT cid, count(*)::DOUBLE AS dl FROM ctoks GROUP BY cid),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(DISTINCT cid)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.cid, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.cid = tf.cid
  CROSS JOIN stats s
  GROUP BY 1, 2, 3
)"""


def _rag_sql() -> str:
    """rag_topk mirror: the shared chunk/BM25 chain, then parent = max
    matching chunk + block-join ranking by the ROUNDED score (score_r
    desc, parent asc) — rank computed after rounding on both sides so
    sub-rounding ln() ulp differences can't flip a tie cohort."""
    return _rag_sql_base() + f"""
, par AS (SELECT query_id, doc_id::VARCHAR AS parent,
                 {_round4_sql('max(score)')} AS score_r,
                 count(*)::BIGINT AS n_children
          FROM scores WHERE score > 0 GROUP BY 1, 2),
ranked AS (
  SELECT query_id, parent, score_r, n_children,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score_r DESC, parent ASC) AS rank
  FROM par
)
SELECT query_id, rank::BIGINT AS rank, parent, score_r, n_children
FROM ranked WHERE rank <= {TOP_K}"""


def _emb_with_dups(sf_dir: str):
    """Embeddings plus EXACT copies (vec_id+100000 for vec_id%3==0) — the
    SemDeDup oracle fixture: identical vectors form sim=1.0 groups whose
    keeper is construction-derivable (centroid sims tie -> lowest id =
    the original), so the integer twin is SQL-expressible."""
    from splade_ray.io import read_parquet_clean

    ds = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])

    def with_dups(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        keep = ids % 3 == 0
        dup = batch.filter(pa.array(keep))
        dup = dup.set_column(
            dup.schema.get_field_index("vec_id"), "vec_id",
            pa.array(dup["vec_id"].to_numpy(zero_copy_only=False) + 100_000,
                     pa.int64()),
        )
        return pa.concat_tables([batch, dup])

    return ds.map_batches(with_dups, batch_format="pyarrow")


def q_semdedup_exact(sf_dir: str):
    """SemDeDup at the exact-duplicate point (ops/semdedup, Abbas et al.
    2023): planted exact copies, threshold just below 1.0 — only
    identical vectors group (synthetic inter-vector cosines are far
    below), centroid sims tie inside each group, so the keeper is the
    lowest id = the original. Integer-exact construction twin; the
    realistic-threshold face is rows-only below."""
    from splade_ray.ops.semdedup import semdedup

    out = semdedup(_emb_with_dups(sf_dir), n_clusters=8,
                   threshold=0.999999, sample_size=100_000).to_pandas()
    out["kept"] = out["kept"].astype(bool)
    return out[["vec_id", "kept", "rep_id"]]


def q_semdedup_sel(sf_dir: str):
    """SemDeDup at a realistic threshold (0.9) over the raw embeddings —
    rows-only (float cosine grouping is not SQL-mirrorable; the exact
    twin above IS oracle-checked, and tests/test_semdedup.py proves
    brute-force parity of the kernel)."""
    from splade_ray.ops.semdedup import semdedup

    out = semdedup(
        _rpq(os.path.join(sf_dir, "embeddings.parquet"),
             columns=["vec_id", "embedding"]),
        n_clusters=8, threshold=0.9, sample_size=100_000,
    ).to_pandas()
    out["kept"] = out["kept"].astype(bool)
    return out[["vec_id", "cluster", "kept", "rep_id"]]


def q_emb_covariance(sf_dir: str):
    """Exact population covariance of the embeddings column
    (ops/pca.embedding_covariance): one streaming pass of (Σx, Σxxᵀ, n)
    partials — d + d² floats per batch, row-count-independent — summed in
    pinned key order. All d×d entries, round4."""
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.pca import embedding_covariance

    cov = embedding_covariance(
        read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                           columns=["vec_id", "embedding"])
    )
    d = cov.shape[0]
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    out = pd.DataFrame(
        {
            "i": (ii.ravel() + 1).astype(np.int64),  # 1-based like SQL
            "j": (jj.ravel() + 1).astype(np.int64),
            "cov_r": _round4(cov.ravel()),
        }
    )
    return out.sort_values(["i", "j"]).reset_index(drop=True)


PCA_COMPONENTS = 8


def q_pca_embed(sf_dir: str):
    """Distributed exact PCA (ops/pca.pca_fit/pca_project): sufficient
    statistics reduce + local d×d eigh (sign-pinned components), then a
    broadcast-model projection stage. Rows-only (eigendecomposition isn't
    SQL-expressible; the covariance input IS oracle-checked above)."""
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.pca import pca_fit, pca_project

    ds = read_parquet_clean(os.path.join(sf_dir, "embeddings.parquet"),
                            columns=["vec_id", "embedding"])
    model = pca_fit(ds, n_components=PCA_COMPONENTS)
    out = pca_project(ds, model).to_pandas().sort_values("vec_id")
    z = np.stack(out["pca"].to_numpy())
    frame = {"vec_id": out["vec_id"].to_numpy(np.int64)}
    for k in range(PCA_COMPONENTS):
        frame[f"c{k}_r"] = _round4(z[:, k])
    return pd.DataFrame(frame).reset_index(drop=True)


def q_field_moments(sf_dir: str):
    """Per-field higher moments (ops.moments.field_moments): mean, sample
    variance, population skewness g1 and (non-excess) kurtosis derived from
    the same raw power sums as the SQL mirror."""
    from splade_ray.ops.moments import field_moments

    out = field_moments(_events_numeric(sf_dir), MATRIX_COLS)
    out["mean_r"] = _round4(out["mean"].to_numpy(np.float64))
    out["variance_r"] = _round4(out["variance"].to_numpy(np.float64))
    out["skewness_r"] = _round4(out["skewness"].to_numpy(np.float64))
    out["kurtosis_r"] = _round4(out["kurtosis"].to_numpy(np.float64))
    return out[["field", "n", "mean_r", "variance_r", "skewness_r", "kurtosis_r"]]


TOP_HITS_K = 3

# adjacency_matrix named filters over the documents vocabulary ('d_none'
# never matches -> omitted buckets, like ES)
ADJ_FILTERS = [
    ("a_spark", "spark"),
    ("b_window", "window stream"),
    ("c_dup", "dup"),
    ("d_none", "zzqx"),
]


def q_top_hits(sf_dir: str):
    """top_hits aggregation (docvalues.top_hits_agg; ES top_hits inside a
    terms bucket): per query the best TOP_HITS_K docs per lang bucket,
    local per-bucket top-k per segment via one lexsort, aggregate-sized
    partials merged driver-side."""
    from splade_ray.docvalues import top_hits_agg

    run = top_hits_agg(
        _dv2_index(sf_dir), BM25_QUERIES, BM25Params(k1=K1, b=B, top_k=TOP_K),
        group_col="lang", hits_per_bucket=10**9,
    )
    out = run.copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    # stable within-bucket re-rank on the rounded score (tie doc_id asc)
    out = out.sort_values(["query_id", "bucket", "score_r", "doc_id"],
                          ascending=[True, True, False, True],
                          kind="mergesort")
    out["hit_rank"] = (out.groupby(["query_id", "bucket"]).cumcount() + 1
                       ).astype(np.int64)
    out = out[out["hit_rank"] <= TOP_HITS_K].reset_index(drop=True)
    return out[["query_id", "bucket", "hit_rank", "doc_id", "score_r"]]


def q_adjacency_matrix(sf_dir: str):
    """adjacency_matrix aggregation (facets.adjacency_matrix; ES): doc
    counts for every named filter and filter-pair intersection, boolean
    posting masks per segment, integer-exact."""
    from splade_ray.facets import adjacency_matrix

    return adjacency_matrix(_index_for(sf_dir), ADJ_FILTERS)


def q_sessions(sf_dir: str):
    """Gap-based session windows (30 min) per user over `events`: salted
    coarse-key shuffle + one vectorized multi-user kernel per group."""
    from splade_ray.ops.windows import sessionize

    return sessionize(
        _events(sf_dir, ["event_id", "ts", "user_id", "value"]), SESSION_GAP_US
    )


FUNNEL_STEPS = ["signup", "click", "purchase"]
FUNNEL_WITHIN_US = 48 * 3_600_000_000  # 48h


def q_funnel(sf_dir: str):
    """Greedy first-touch funnel (ops/windows.funnel): per user the depth
    reached through signup -> click -> purchase within 48h of the first
    signup; one coarse-key shuffle, chain evaluated vectorized per group."""
    from splade_ray.ops.windows import funnel

    return funnel(
        _events(sf_dir, ["event_id", "ts", "user_id", "event_type"]),
        FUNNEL_STEPS,
        FUNNEL_WITHIN_US,
    )


def q_asof_purchase_signup(sf_dir: str):
    """As-of join: each purchase matched to the user's most recent signup at
    or before it (ties: later signup ts, then larger event id); unmatched
    keep -1 sentinels."""
    import pyarrow.dataset as pads

    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.windows import asof_join

    path = os.path.join(sf_dir, "events.parquet")
    cols = ["event_id", "ts", "user_id"]
    # row filter pushed into the parquet read (prune at the read)
    left = read_parquet_clean(
        path, columns=cols, filter=pads.field("event_type") == "purchase"
    )
    right = read_parquet_clean(
        path, columns=cols, filter=pads.field("event_type") == "signup"
    )
    return asof_join(left, right)


def q_ann_cosine_topk(sf_dir: str):
    from splade_ray.ops.ann import cosine_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path)
    mask = np.array(qt["vec_id"].to_pylist()) < 5
    q_ids = np.array(qt["vec_id"].to_pylist())[mask]
    q_mat = np.stack([np.array(v, np.float64) for v, m in zip(qt["embedding"].to_pylist(), mask) if m])
    ds = _rpq(emb_path, columns=["vec_id", "embedding"])
    out = cosine_topk(ds, q_ids, q_mat, top_k=10**9).to_pandas()
    out["sim_r"] = _round4(out["sim"].to_numpy())
    out = _stable_rank(out, ["vec_id"], score_col="sim_r", k=TOP_K)
    return out[["query_id", "rank", "vec_id", "sim_r"]]


def _ann_queries(sf_dir: str):
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path)
    mask = np.array(qt["vec_id"].to_pylist()) < 5
    q_ids = np.array(qt["vec_id"].to_pylist())[mask]
    q_mat = np.stack(
        [np.array(v, np.float64) for v, m in zip(qt["embedding"].to_pylist(), mask) if m]
    )
    return emb_path, q_ids, q_mat


ANN_FILTER_LABEL = 2


def q_ann_filtered(sf_dir: str):
    """Filtered kNN (ES knn query with `filter`): brute cosine top-k over
    ONLY the vectors passing an attribute predicate — expressed the
    Ray-idiomatic way, a parquet predicate-pushdown read feeding the same
    exact scorer (pre-filter semantics: the filter shrinks the candidate
    set before scoring, so top-k is exact over the filtered set and rows
    outside the predicate never leave storage)."""
    import pyarrow.dataset as pads

    from splade_ray.ops.ann import cosine_topk

    emb_path, q_ids, q_mat = _ann_queries(sf_dir)
    ds = _rpq(
        emb_path, columns=["vec_id", "embedding"],
        filter=pads.field("label") == ANN_FILTER_LABEL,
    )
    out = cosine_topk(ds, q_ids, q_mat, top_k=10**9).to_pandas()
    out["sim_r"] = _round4(out["sim"].to_numpy())
    out = _stable_rank(out, ["vec_id"], score_col="sim_r", k=TOP_K)
    return out[["query_id", "rank", "vec_id", "sim_r"]]


def q_ann_pq_exact(sf_dir: str):
    """Product quantization at the lossless point (ops/ann.pq_cosine_topk
    with ks >= n and a full-coverage sample): sampled-row k-means centroids
    ARE the data points, reconstruction is exact, so PQ == brute cosine and
    the existing ann_cosine_topk oracle applies (the ann_ivf_exact
    precedent)."""
    from splade_ray.ops.ann import pq_cosine_topk

    emb_path, q_ids, q_mat = _ann_queries(sf_dir)
    ds = _rpq(emb_path, columns=["vec_id", "embedding"])
    out = pq_cosine_topk(
        ds, q_ids, q_mat, m=4, ks=10_000_000, iters=3,
        sample_size=10_000_000, top_k=10**9,
    )
    out["sim_r"] = _round4(out["sim"].to_numpy())
    out = _stable_rank(out, ["vec_id"], score_col="sim_r", k=TOP_K)
    return out[["query_id", "rank", "vec_id", "sim_r"]]


def q_ann_pq_topk(sf_dir: str):
    """Product-quantized ANN at a realistic code rate (m=4, ks=16 — 4 bytes
    per vector): ADC table scoring, rows-only (approximate float sims are
    not SQL-mirrorable; the lossless twin above IS oracle-checked)."""
    from splade_ray.ops.ann import pq_cosine_topk

    emb_path, q_ids, q_mat = _ann_queries(sf_dir)
    ds = _rpq(emb_path, columns=["vec_id", "embedding"])
    out = pq_cosine_topk(ds, q_ids, q_mat, m=4, ks=16, top_k=TOP_K)
    out["sim_r"] = _round4(out["sim"].to_numpy())
    out["rank"] = out["rank"].astype(np.int64)
    return out[["query_id", "rank", "vec_id", "sim_r"]]


def q_ann_ivfpq_topk(sf_dir: str):
    """Persisted IVF-PQ (ops/ann.ivfpq_build/search — the IVFADC
    billion-scale layout): codes partitioned by coarse cluster on disk, a
    probe reads only its nprobe partitions' (vec_id, m-byte codes) columns
    and scores by ADC; rows-only (lossy sims; the partition-pruning and
    flat-PQ-parity contracts are test-proven)."""
    from splade_ray.ops.ann import ivfpq_build, ivfpq_search

    emb_path, q_ids, q_mat = _ann_queries(sf_dir)
    idx = os.path.join(_work_dir(sf_dir, "ivfpq"), "index")
    if not os.path.exists(os.path.join(idx, "ivfpq.json")):
        ivfpq_build(
            _rpq(emb_path, columns=["vec_id", "embedding"]), idx,
            n_clusters=8, m=4, ks=16,
        )
    out = (
        ivfpq_search(idx, q_ids, q_mat, nprobe=3, top_k=TOP_K)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    out["sim_r"] = _round4(out["sim"].to_numpy())
    out["rank"] = out["rank"].astype(np.int64)
    return out[["query_id", "rank", "vec_id", "sim_r"]]


def q_quality_clf(sf_dir: str):
    """Distributed hashed logistic-regression quality filter
    (ops/classifier): full-batch GD with keyed-order partial-gradient
    sums (deterministic), trained to recognise docs containing the token
    'spark' (a synthetic but learnable target), then the corpus scored by
    the broadcast model. Rows-only: iterative training isn't
    SQL-expressible; convergence + separation are test-proven."""
    import pyarrow.compute as pc

    from splade_ray.ops.classifier import fit_quality_classifier, score_quality

    def add_label(b: pa.Table) -> pa.Table:
        has = pc.match_substring(b["text"], "spark")
        return b.append_column("label", pc.cast(has, pa.int64()))

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_label, batch_format="pyarrow"
    )
    model = fit_quality_classifier(
        ds, label_col="label", text_col="text", dim=1 << 14, iters=30, lr=30.0
    )
    out = score_quality(ds, model).to_pandas()
    out["score_r"] = _round4(out["quality_score"].to_numpy())
    return (
        out[["doc_id", "label", "score_r"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# ---- rows-only entries (not SQL-expressible; driver records row counts) ----


def q_ann_cosine_topk_sq8(sf_dir: str):
    """Int8 scalar-quantized brute cosine (ops/ann.sq8_cosine_topk, the
    FAISS-SQ8 shape): per-vector symmetric quantization, scales cancel in
    cosine, every dot an exact integer — deterministic ranks, 1/4 operand
    width."""
    from splade_ray.ops.ann import sq8_cosine_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path)
    mask = np.array(qt["vec_id"].to_pylist()) < 5
    q_ids = np.array(qt["vec_id"].to_pylist())[mask]
    q_mat = np.stack([np.array(v, np.float64) for v, m in zip(qt["embedding"].to_pylist(), mask) if m])
    ds = _rpq(emb_path, columns=["vec_id", "embedding"])
    out = sq8_cosine_topk(ds, q_ids, q_mat, top_k=10**9).to_pandas()
    out["sim_r"] = _round4(out["sim"].to_numpy())
    out = _stable_rank(out, ["vec_id"], score_col="sim_r", k=TOP_K)
    return out[["query_id", "rank", "vec_id", "sim_r"]]


def q_dedup_minhash(sf_dir: str):
    from splade_ray.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir, ["doc_id", "text"]), min_est_jaccard=0.5)


def q_dedup_simhash(sf_dir: str):
    from splade_ray.ops.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3)


def q_near_dup_jaccard(sf_dir: str):
    from splade_ray.ops.dedup import jaccard_block_pairs

    return jaccard_block_pairs(
        _docs(sf_dir, ["doc_id", "text", "lang"]), min_jaccard=0.5
    )


CONT_T = 0.8


def q_near_dup_containment_counts(sf_dir: str):
    """Exact n-gram CONTAINMENT pairs (jaccard_block_pairs
    similarity='containment', emit_counts=True): threshold on
    inter >= t·least(|A|,|B|) — the asymmetric near-dup face that
    catches subset duplicates Jaccard dilutes; same (lang, length-band)
    blocking contract (cross-band subset pairs are the minhash/LSH
    face's job — a true subset is usually in another length band)."""
    from splade_ray.ops.dedup import jaccard_block_pairs

    return jaccard_block_pairs(
        _docs(sf_dir, ["doc_id", "text", "lang"]),
        min_jaccard=CONT_T, emit_counts=True, similarity="containment",
    )


CONT_SK_K = 5       # word-k-gram width of the sketch-face profiles
CONT_SK_T = 0.75    # exactly representable in binary: the engine's float
                    # threshold and DuckDB's decimal agree on boundaries


def q_containment_sketch_counts(sf_dir: str):
    """CROSS-BAND subset pairs (ops.dedup.containment_sketch_pairs,
    complete-sketch regime): every doc pair with non-empty k-gram
    profiles, >=1 shared gram, and max-containment
    inter/min(|A|,|B|) >= 0.75 — corpus-wide, NO length-band blocking
    (the subset pairs jaccard_block_pairs excludes by construction).
    Gram identity = the dup-span family's FNV fold over sha256-prefix
    token hashes, mirrored in HUGEINT; integer-exact (inter, n_a, n_b)
    face."""
    from splade_ray.ops.dedup import containment_sketch_pairs

    return containment_sketch_pairs(
        _docs(sf_dir, ["doc_id", "text"]), k=CONT_SK_K,
        min_containment=CONT_SK_T, emit_counts=True,
    )


def _containment_sketch_sql() -> str:
    """SQL mirror of the complete-sketch containment face: distinct FNV
    k-gram hashes per doc, all-pairs shared-gram counts, integer-exact
    threshold (0.75 = 3/4, exact in both engines' arithmetic)."""
    p = 1099511628211
    fold = _fold_sql([f"h[i+{j}]" for j in range(CONT_SK_K)], p)
    return f"""
WITH {_token_hashes_cte()},
gi AS (SELECT doc_id, h,
              unnest(generate_series(1, greatest(len(h) - {CONT_SK_K - 1}, 0))) AS i
       FROM hs),
g AS (SELECT doc_id, {fold} AS g FROM gi),
gd AS (SELECT DISTINCT doc_id, g FROM g),
sizes AS (SELECT doc_id, count(*) AS sz FROM gd GROUP BY doc_id),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*)::BIGINT AS i
          FROM gd x JOIN gd y ON x.g = y.g AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b, i.i AS inter,
       sa.sz::BIGINT AS n_a, sb.sz::BIGINT AS n_b
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
             JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE i.i >= {CONT_SK_T} * least(sa.sz, sb.sz)"""


def q_near_dup_jaccard_counts(sf_dir: str):
    """n-gram Jaccard near-dup pairs in integer-exact form (inter, uni
    counts; threshold inter >= 0.5·uni) — the oracle-checked face of the
    blocked Jaccard operator."""
    from splade_ray.ops.dedup import jaccard_block_pairs

    return jaccard_block_pairs(
        _docs(sf_dir, ["doc_id", "text", "lang"]), min_jaccard=0.5, emit_counts=True
    )


def _dup_edges(sf_dir: str):
    """Oracle-expressible duplicate edge set: exact-dup star edges (min doc
    per identical text -> every other copy) unioned with the blocked n-gram
    Jaccard pairs (same config as the green `near_dup_jaccard_counts`)."""
    from splade_ray.ops.dedup import exact_dup_pairs, jaccard_block_pairs

    docs = _docs(sf_dir, ["doc_id", "text", "lang"])
    ex = exact_dup_pairs(docs)
    jc = jaccard_block_pairs(docs, min_jaccard=0.5, emit_counts=True)

    def pick(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
            return pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())]).empty_table()
        return pa.table(
            {"doc_a": batch["doc_a"].cast(pa.int64()), "doc_b": batch["doc_b"].cast(pa.int64())}
        )

    return ex.map_batches(pick, batch_format="pyarrow").union(
        jc.map_batches(pick, batch_format="pyarrow")
    )


def q_dedup_clusters(sf_dir: str):
    """Connected-components labels over the duplicate edge set: every paired
    doc -> its component-min doc id (alternating large/small-star rounds,
    ops/cluster.py). Oracle = DuckDB recursive-CTE transitive closure."""
    from splade_ray.ops.cluster import connected_components

    return connected_components(_dup_edges(sf_dir))


def q_dedup_survivors(sf_dir: str):
    """End-to-end dedup filter: docs surviving cluster-canonical selection
    (one doc per duplicate cluster + all unpaired docs)."""
    from splade_ray.ops.cluster import connected_components, drop_near_duplicates

    labels = connected_components(_dup_edges(sf_dir))
    return drop_near_duplicates(_docs(sf_dir, ["doc_id"]), labels)


def _dup_cluster_cte() -> str:
    """Shared WITH-body: duplicate edges (exact + jaccard) -> recursive
    closure -> per-node component-min labels `lab(doc_id, cluster_id)`."""
    jac = _jaccard_counts_sql()
    return f"""
ex AS (
  SELECT m.a AS doc_a, g.doc_id AS doc_b
  FROM (SELECT sha256(text) AS s, doc_id FROM documents) g
  JOIN (SELECT sha256(text) AS s, min(doc_id) AS a FROM documents GROUP BY 1) m
    USING (s)
  WHERE g.doc_id > m.a
),
jc AS (SELECT doc_a, doc_b FROM ({jac}) q),
und AS (
  SELECT doc_a AS u, doc_b AS v FROM ex
  UNION SELECT doc_b, doc_a FROM ex
  UNION SELECT doc_a, doc_b FROM jc
  UNION SELECT doc_b, doc_a FROM jc
),
r(n, m) AS (
  SELECT u, u FROM und
  UNION
  SELECT r.n, und.v FROM r JOIN und ON r.m = und.u
),
lab AS (SELECT n AS doc_id, min(m) AS cluster_id FROM r GROUP BY n)"""


def _containment_counts_sql() -> str:
    """SQL mirror of the containment face: same gram/blocking CTEs,
    integer threshold inter >= t·least(sa, sb), (inter, n_a, n_b) out."""
    return f"""
WITH d0 AS (
  SELECT doc_id, lang, length(text) // 100 AS band,
         regexp_extract_all(lower(text), '{TOKEN_SQL}') AS tl
  FROM documents
),
grams AS (
  SELECT doc_id, lang, band, unnest(
    CASE WHEN len(tl) = 0 THEN []::VARCHAR[]
         WHEN len(tl) < 3 THEN [array_to_string(tl, ' ')]
         ELSE list_transform(range(1, len(tl) - 1),
                             i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])
    END) AS g
  FROM d0
),
gd AS (SELECT DISTINCT doc_id, lang, band, g FROM grams),
sizes AS (SELECT doc_id, count(*) AS sz FROM gd GROUP BY doc_id),
docs_all AS (SELECT d.doc_id, d.lang, d.band, coalesce(s.sz, 0) AS sz
             FROM d0 d LEFT JOIN sizes s USING (doc_id)),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS sa, b.sz AS sb
          FROM docs_all a JOIN docs_all b
            ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
          FROM gd x JOIN gd y
            ON x.lang = y.lang AND x.band = y.band AND x.g = y.g
           AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
       coalesce(i.i, 0)::BIGINT AS inter,
       p.sa::BIGINT AS n_a, p.sb::BIGINT AS n_b
FROM pairs p LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
WHERE least(p.sa, p.sb) = 0
   OR coalesce(i.i, 0) >= {CONT_T} * least(p.sa, p.sb)"""


def _jaccard_counts_sql() -> str:
    """SQL mirror of jaccard_block_pairs(emit_counts=True): 3-gram sets per
    doc (short docs fold to one whole-token gram, empty docs to the empty
    set), (lang, length//100) blocking, integer-exact threshold."""
    return f"""
WITH d0 AS (
  SELECT doc_id, lang, length(text) // 100 AS band,
         regexp_extract_all(lower(text), '{TOKEN_SQL}') AS tl
  FROM documents
),
grams AS (
  SELECT doc_id, lang, band, unnest(
    CASE WHEN len(tl) = 0 THEN []::VARCHAR[]
         WHEN len(tl) < 3 THEN [array_to_string(tl, ' ')]
         ELSE list_transform(range(1, len(tl) - 1),
                             i -> tl[i] || ' ' || tl[i+1] || ' ' || tl[i+2])
    END) AS g
  FROM d0
),
gd AS (SELECT DISTINCT doc_id, lang, band, g FROM grams),
sizes AS (SELECT doc_id, count(*) AS sz FROM gd GROUP BY doc_id),
docs_all AS (SELECT d.doc_id, d.lang, d.band, coalesce(s.sz, 0) AS sz
             FROM d0 d LEFT JOIN sizes s USING (doc_id)),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sz AS sa, b.sz AS sb
          FROM docs_all a JOIN docs_all b
            ON a.lang = b.lang AND a.band = b.band AND a.doc_id < b.doc_id),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
          FROM gd x JOIN gd y
            ON x.lang = y.lang AND x.band = y.band AND x.g = y.g
           AND x.doc_id < y.doc_id
          GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
       coalesce(i.i, 0)::BIGINT AS inter,
       (p.sa + p.sb - coalesce(i.i, 0))::BIGINT AS uni
FROM pairs p LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
WHERE (p.sa + p.sb - coalesce(i.i, 0)) = 0
   OR coalesce(i.i, 0) >= 0.5 * (p.sa + p.sb - coalesce(i.i, 0))"""


_M64 = "18446744073709551616"  # 2^64 — the uint64 wraparound modulus
_HASH64_SQL = "('0x' || substr(sha256({t}), 1, 16))::UBIGINT::HUGEINT"


def _fold_sql(terms: list[str], p: int) -> str:
    """Nested-expression rolling polynomial fold ``v = (v*p + h) mod 2^64``
    (HUGEINT-safe: v < 2^64, p < 2^41, so v*p < 2^105 < 2^127)."""
    expr = terms[0]
    for t in terms[1:]:
        expr = f"(({expr}) * {p} + {t}) % {_M64}"
    return expr


def _token_hashes_cte() -> str:
    """CTE ``hs(doc_id, h)``: per-doc list of 64-bit token hashes, exactly
    ``ops.textstats.hash_token`` (sha256 prefix, big-endian)."""
    th = _HASH64_SQL.format(t="t")
    return f"""
hs AS (
  SELECT doc_id, list_transform(
           regexp_extract_all(lower(text), '{TOKEN_SQL}'), t -> {th}) AS h
  FROM documents
)"""


def _fingerprint_sql() -> str:
    """SQL mirror of ops.textstats.fingerprint_batch: min of all 8-token
    rolling polynomial hashes (mod 2^64); short docs fold all tokens; empty
    docs -> 0. The FNV-prime fold constant matches fingerprint_batch's."""
    p = 1099511628211
    fold8 = _fold_sql([f"h[i+{j}]" for j in range(8)], p)
    return f"""
WITH {_token_hashes_cte()},
fp AS (
  SELECT doc_id,
    CASE WHEN len(h) = 0 THEN 0::HUGEINT
         WHEN len(h) < 8 THEN list_reduce(h, (a, x) -> (a * {p} + x) % {_M64})
         ELSE list_min(list_transform(range(1, len(h) - 6), i -> {fold8}))
    END AS f
  FROM hs
)
SELECT doc_id, f::UBIGINT AS fingerprint FROM fp"""


def _repetition_sql() -> str:
    """SQL mirror of ops.textstats.repetition_batch: n-gram hashes are the
    same FNV rolling fold over sha256-prefix token hashes (HUGEINT mod 2^64
    ≡ the numpy uint64 wraparound); top-gram pick = max count then min hash
    (QUALIFY row_number); dup5 = occurrences − distinct; flags are the same
    integer cross-multiplied comparisons."""
    p = 1099511628211

    def grams(n: int) -> str:
        fold = _fold_sql([f"h[i+{j}]" for j in range(n)], p)
        return f"""(
  SELECT doc_id, unnest(list_transform(range(1, len(h) - {n - 2}), i -> {fold})) AS g
  FROM hs WHERE len(h) >= {n}
)"""

    def top(n: int) -> str:
        return f"""(
  SELECT doc_id, c, g FROM c{n}
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) = 1
)"""

    return f"""
WITH {_token_hashes_cte()},
g2 AS {grams(2)},
c2 AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM g2 GROUP BY doc_id, g),
t2 AS {top(2)},
g3 AS {grams(3)},
c3 AS (SELECT doc_id, g, count(*)::BIGINT AS c FROM g3 GROUP BY doc_id, g),
t3 AS {top(3)},
g5 AS {grams(5)},
d5 AS (SELECT doc_id, count(*)::BIGINT AS n5,
              (count(*) - count(DISTINCT g))::BIGINT AS dup5
       FROM g5 GROUP BY doc_id),
nt AS (SELECT doc_id, len(h)::BIGINT AS n_tokens FROM hs)
SELECT nt.doc_id, nt.n_tokens,
       coalesce(t2.c, 0)::BIGINT AS top2_count,
       coalesce(t2.g, 0)::UBIGINT AS top2_gram,
       coalesce(t3.c, 0)::BIGINT AS top3_count,
       coalesce(t3.g, 0)::UBIGINT AS top3_gram,
       coalesce(d5.n5, 0)::BIGINT AS n_grams5,
       coalesce(d5.dup5, 0)::BIGINT AS dup5_count,
       (10 * coalesce(t2.c, 0) > nt.n_tokens) AS rep_top2,
       (50 * coalesce(t3.c, 0) > 3 * nt.n_tokens) AS rep_top3,
       (20 * coalesce(d5.dup5, 0) > 3 * coalesce(d5.n5, 0)) AS rep_dup5,
       NOT ((10 * coalesce(t2.c, 0) > nt.n_tokens)
            OR (50 * coalesce(t3.c, 0) > 3 * nt.n_tokens)
            OR (20 * coalesce(d5.dup5, 0) > 3 * coalesce(d5.n5, 0))) AS pass_repetition
FROM nt
LEFT JOIN t2 USING (doc_id)
LEFT JOIN t3 USING (doc_id)
LEFT JOIN d5 USING (doc_id)"""


def _phrase_cte() -> str:
    """WITH-clause body ending in ``p(phrase_id, doc_id, phrase_count)``:
    a sliding window over each doc's token ARRAY counts every start index
    where the phrase matches (overlapping occurrences, exactly the engine's
    packed (doc, position) intersection). Generated FROM the same phrase
    list + tokenizer, so the two sides can't drift."""
    from splade_ray.analysis import tokenize

    branches = []
    for pid, text in PHRASE_QUERIES:
        toks = tokenize(text)
        if not toks:
            continue
        k = len(toks)
        if k == 1:
            expr = f"len(list_filter(t, x -> x = '{toks[0]}'))"
            guard = "len(t) >= 1"
        else:
            conds = " AND ".join(
                f"t[i+{j}] = '{w}'" if j else f"t[i] = '{w}'"
                for j, w in enumerate(toks)
            )
            expr = f"len(list_filter(range(1, len(t) - {k - 2}), i -> {conds}))"
            guard = f"len(t) >= {k}"
        branches.append(
            f"SELECT {pid} AS phrase_id, doc_id, ({expr})::BIGINT AS phrase_count\n"
            f"  FROM ta WHERE {guard}"
        )
    body = "\n  UNION ALL\n".join(branches)
    return f"""ta AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t
            FROM documents),
p AS (
{body}
)"""


def _phrase_sql() -> str:
    return f"""
WITH {_phrase_cte()}
SELECT phrase_id, doc_id, phrase_count FROM p WHERE phrase_count > 0"""


def _phrase_topk_sql() -> str:
    """SQL mirror of positions.phrase_topk: the phrase as one virtual BM25
    term (tf = occurrence count, df = docs containing the phrase)."""
    return f"""
WITH {_phrase_cte()},
m AS (SELECT phrase_id, doc_id, phrase_count FROM p WHERE phrase_count > 0),
dl AS (SELECT doc_id, len(regexp_extract_all(lower(text), '{TOKEN_SQL}'))::DOUBLE AS dl
       FROM documents),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
pdf AS (SELECT phrase_id, count(*)::DOUBLE AS df FROM m GROUP BY phrase_id),
sc AS (SELECT m.phrase_id, m.doc_id,
              ln(1 + (s.n - pdf.df + 0.5) / (pdf.df + 0.5))
              * m.phrase_count * ({K1} + 1)
              / (m.phrase_count + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) AS score
       FROM m JOIN pdf USING (phrase_id) JOIN dl USING (doc_id) CROSS JOIN stats s),
ranked AS (SELECT phrase_id, doc_id, score,
                  row_number() OVER (PARTITION BY phrase_id
                                     ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
           FROM sc WHERE score > 0)
SELECT phrase_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _terms_set_sql() -> str:
    """Mirror of q_terms_set: distinct present query terms per doc vs
    req = doc_id % 4, BM25 from the shared scores CTE."""
    values = []
    for qid, text in TERMS_SET_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    # reuse the bm25 CTE but with the terms_set query VALUES
    cte = _bm25_cte()
    old_vals = ",\n    ".join(
        f"({qid}, '{term}', {qtf})"
        for qid, text in BM25_QUERIES
        for term, qtf in sorted(term_counts(text).items())
    )
    cte = cte.replace(old_vals, vals)
    return f"""{cte},
present AS (SELECT q.query_id, tf.doc_id, count(DISTINCT q.term) AS n_present
            FROM q JOIN tf USING (term) GROUP BY q.query_id, tf.doc_id),
ok AS (SELECT p.query_id, p.doc_id
       FROM present p
       WHERE (p.doc_id % 4) >= 1 AND p.n_present >= (p.doc_id % 4)),
rr AS (SELECT s.query_id, s.doc_id, s.score,
              row_number() OVER (PARTITION BY s.query_id
                                 ORDER BY s.score DESC, s.doc_id ASC) AS rank
       FROM scores s JOIN ok USING (query_id, doc_id) WHERE s.score > 0)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


def _top_hits_sql() -> str:
    """Mirror of q_top_hits: the shared BM25 scores CTE, per-(query, lang)
    row_number cut at TOP_HITS_K."""
    return f"""{_bm25_cte()},
th AS (SELECT s.query_id, d.lang AS bucket, s.doc_id, s.score,
              row_number() OVER (PARTITION BY s.query_id, d.lang
                                 ORDER BY {_round4_sql('s.score')} DESC,
                                          s.doc_id ASC) AS hit_rank
       FROM scores s JOIN documents d USING (doc_id) WHERE s.score > 0)
SELECT query_id, bucket, hit_rank::BIGINT AS hit_rank, doc_id,
       {_round4_sql('score')} AS score_r
FROM th WHERE hit_rank <= {TOP_HITS_K}"""


def _adjacency_matrix_sql() -> str:
    """Mirror of q_adjacency_matrix: filter-name×term VALUES joined to the
    tf table, DISTINCT doc sets self-joined on name <= name."""
    rows = []
    for name, text in ADJ_FILTERS:
        for term in sorted(term_counts(text)):
            rows.append(f"('{name}', '{term}')")
    vals = ",\n    ".join(rows)
    return f"""
WITH {_TF},
f(name, term) AS (VALUES
    {vals}
),
m AS (SELECT DISTINCT f.name, tf.doc_id FROM f JOIN tf USING (term))
SELECT a.name AS filter_a, b.name AS filter_b, count(*)::BIGINT AS doc_count
FROM m a JOIN m b ON a.doc_id = b.doc_id AND a.name <= b.name
GROUP BY 1, 2
ORDER BY 1, 2"""


def _common_terms_sql() -> str:
    """Mirror of q_common_terms: the df/N <= cutoff split computed in SQL
    from the same token stream; candidates = docs holding >= 1 low term
    (or any term when the query has none); score = full BM25 sum."""
    values = []
    for qid, text in CT_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TF},
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
ql AS (SELECT q.query_id, q.term, q.qtf, df.df,
              (df.df / s.n <= {CT_CUTOFF}) AS is_low
       FROM q JOIN df USING (term) CROSS JOIN stats s),
haslow AS (SELECT query_id, bool_or(is_low) AS has_low FROM ql GROUP BY query_id),
cand AS (SELECT DISTINCT ql.query_id, tf.doc_id
         FROM ql JOIN tf USING (term) JOIN haslow USING (query_id)
         WHERE ql.is_low OR NOT haslow.has_low),
scores AS (
  SELECT ql.query_id, tf.doc_id,
         sum( ln(1 + (s.n - ql.df + 0.5) / (ql.df + 0.5)) * ql.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM ql
  JOIN tf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY ql.query_id, tf.doc_id
),
ranked AS (
  SELECT s.query_id, s.doc_id, s.score,
         row_number() OVER (PARTITION BY s.query_id
                            ORDER BY s.score DESC, s.doc_id ASC) AS rank
  FROM scores s JOIN cand USING (query_id, doc_id) WHERE s.score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _rescore_sql() -> str:
    """Mirror of q_rescore_topk: BM25 window + phrase sliding-window counts
    (generated from RESCORE_PHRASES) scored as one virtual term, LEFT JOIN
    combine, re-rank inside the window."""
    from splade_ray.analysis import tokenize

    branches = []
    for pid, text in RESCORE_PHRASES.items():
        toks = tokenize(text)
        if not toks:
            continue
        k = len(toks)
        if k == 1:
            expr = f"len(list_filter(t, x -> x = '{toks[0]}'))"
            guard = "len(t) >= 1"
        else:
            conds = " AND ".join(
                f"t[i+{j}] = '{w}'" if j else f"t[i] = '{w}'"
                for j, w in enumerate(toks)
            )
            expr = f"len(list_filter(range(1, len(t) - {k - 2}), i -> {conds}))"
            guard = f"len(t) >= {k}"
        branches.append(
            f"SELECT {pid} AS phrase_id, doc_id, ({expr})::BIGINT AS phrase_count\n"
            f"  FROM ta WHERE {guard}"
        )
    body = "\n  UNION ALL\n".join(branches)
    return f"""{_bm25_cte()},
ta AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t
       FROM documents),
p AS (
{body}
),
pm AS (SELECT phrase_id AS query_id, doc_id, phrase_count FROM p WHERE phrase_count > 0),
pdf AS (SELECT query_id, count(*)::DOUBLE AS pdf FROM pm GROUP BY query_id),
win AS (SELECT query_id, doc_id, score FROM ranked WHERE rank <= {RESCORE_WINDOW}),
sec AS (SELECT pm.query_id, pm.doc_id,
               ln(1 + (s.n - pdf.pdf + 0.5) / (pdf.pdf + 0.5))
               * pm.phrase_count * ({K1} + 1)
               / (pm.phrase_count + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) AS s2
        FROM pm JOIN pdf USING (query_id) JOIN dl USING (doc_id) CROSS JOIN stats s),
comb AS (SELECT w.query_id, w.doc_id,
                CASE WHEN sec.s2 IS NOT NULL
                     THEN {RESCORE_QW} * w.score + {RESCORE_RQW} * sec.s2
                     ELSE {RESCORE_QW} * w.score END AS score
         FROM win w LEFT JOIN sec ON sec.query_id = w.query_id AND sec.doc_id = w.doc_id),
rr AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
       FROM comb)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


def _window_count_sql(branches: list[str]) -> str:
    """Wrap per-phrase sliding-window count branches in the shared token-
    array CTE and keep positive counts (the engine's match-rows shape)."""
    body = "\n  UNION ALL\n".join(branches)
    return f"""
WITH ta AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t
            FROM documents),
p AS (
{body}
)
SELECT phrase_id, doc_id, phrase_count FROM p WHERE phrase_count > 0"""


def _multi_phrase_sql() -> str:
    """SQL mirror of multi_phrase_search, generated FROM the same query
    list + tokenizer: per slot an IN-list over the analyzed alternatives,
    sliding-window start counts (overlapping)."""
    from splade_ray.analysis import tokenize

    branches = []
    for pid, slots in MULTI_PHRASE_QUERIES:
        tok_slots = [
            sorted({t for alt in alts for t in tokenize(alt)}) for alts in slots
        ]
        if not tok_slots or any(not s for s in tok_slots):
            continue  # engine drops queries with a no-token slot
        k = len(tok_slots)

        def inlist(ts):
            return ", ".join(f"'{t}'" for t in ts)

        if k == 1:
            expr = f"len(list_filter(t, x -> x IN ({inlist(tok_slots[0])})))"
            guard = "len(t) >= 1"
        else:
            conds = " AND ".join(
                (f"t[i+{j}]" if j else "t[i]") + f" IN ({inlist(ts)})"
                for j, ts in enumerate(tok_slots)
            )
            expr = f"len(list_filter(range(1, len(t) - {k - 2}), i -> {conds}))"
            guard = f"len(t) >= {k}"
        branches.append(
            f"SELECT {pid} AS phrase_id, doc_id, ({expr})::BIGINT AS phrase_count\n"
            f"  FROM ta WHERE {guard}"
        )
    return _window_count_sql(branches)


def _match_phrase_prefix_sql() -> str:
    """SQL mirror of match_phrase_prefix_search: exact-match head tokens,
    LIKE 'prefix%' on the final slot — identical to the engine's lexicon
    expansion because MPP_MAX_EXPANSIONS never binds (every corpus term
    matching the prefix is in the lexicon)."""
    from splade_ray.analysis import tokenize

    branches = []
    for pid, text in MPP_QUERIES:
        toks = tokenize(text)
        if not toks:
            continue
        k = len(toks)
        pre = toks[-1]
        if k == 1:
            expr = f"len(list_filter(t, x -> x LIKE '{pre}%'))"
            guard = "len(t) >= 1"
        else:
            conds = [
                (f"t[i+{j}]" if j else "t[i]") + f" = '{w}'"
                for j, w in enumerate(toks[:-1])
            ]
            conds.append(f"t[i+{k - 1}] LIKE '{pre}%'")
            expr = (
                f"len(list_filter(range(1, len(t) - {k - 2}), "
                f"i -> {' AND '.join(conds)}))"
            )
            guard = f"len(t) >= {k}"
        branches.append(
            f"SELECT {pid} AS phrase_id, doc_id, ({expr})::BIGINT AS phrase_count\n"
            f"  FROM ta WHERE {guard}"
        )
    return _window_count_sql(branches)


_DELETE_PRED = "doc_id % 7 <> 3"  # mirror of _delete_ids


def _bm25_deleted_sql() -> str:
    """Tombstone semantics: statistics over the FULL corpus, deleted docs
    excluded from the candidate set before ranking."""
    return f"""{_bm25_cte()},
live AS (SELECT query_id, doc_id, score FROM scores
         WHERE score > 0 AND {_DELETE_PRED}),
rr AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
       FROM live)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


def _bm25_purged_sql() -> str:
    """Purge semantics: every statistic (tf table, dl, avgdl, N, df)
    computed over the live doc set only — textually the bm25 CTE with its
    two `documents` scans redirected at a filtered CTE."""
    cte = _bm25_cte()
    assert cte.count("FROM documents\n") == 1 and cte.count("FROM documents d ") == 1
    cte = cte.replace(
        "WITH ",
        f"WITH documents_live AS (SELECT * FROM documents WHERE {_DELETE_PRED}),\n",
        1,
    )
    cte = cte.replace("FROM documents\n", "FROM documents_live\n")
    cte = cte.replace("FROM documents d ", "FROM documents_live d ")
    return f"""{cte}
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _doclen_quantiles_sql() -> str:
    mille = ", ".join(str(int(q * 1000)) for q in QUANTILE_QS)
    qlist = ", ".join(str(q) for q in QUANTILE_QS)
    return f"""
SELECT lang,
       unnest([{mille}])::BIGINT AS q_mille,
       unnest(quantile_disc(n_chars, [{qlist}]))::BIGINT AS value
FROM documents GROUP BY lang"""


def _kmv_sql() -> str:
    k, scale = KMV_K, 1 << 63
    return f"""
WITH {_TOKS},
lt AS (SELECT d.lang, t.term FROM toks t JOIN documents d USING (doc_id)),
h AS (SELECT DISTINCT lang,
             (('0x' || substr(sha256(term), 1, 16))::UBIGINT >> 1)::BIGINT AS hv
      FROM lt),
r AS (SELECT lang, hv, row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn FROM h),
agg AS (SELECT lang, count(*)::BIGINT AS k_used, max(hv)::BIGINT AS kth_min
        FROM r WHERE rn <= {k} GROUP BY lang)
SELECT lang, k_used, kth_min,
       (CASE WHEN k_used < {k} THEN k_used::HUGEINT
             ELSE (({k} - 1)::HUGEINT * {scale}::HUGEINT) // kth_min END)::BIGINT
         AS est_distinct
FROM agg"""


def _mlt_sql() -> str:
    """SQL mirror of mlt.more_like_this over MLT_SEEDS: integer-exact term
    selection (tf desc, df asc, term asc), bm25 with qtf=1, seed excluded
    before ranking."""
    seeds = ", ".join(f"({s})" for s in MLT_SEEDS)
    return f"""
WITH {_TF},
lex AS (SELECT term, count(*)::BIGINT AS dfi FROM tf GROUP BY term),
seeds(seed_id) AS (VALUES {seeds}),
sel AS (SELECT s.seed_id, tf.term,
               row_number() OVER (PARTITION BY s.seed_id
                                  ORDER BY tf.tf DESC, l.dfi ASC, tf.term ASC) AS rn
        FROM seeds s JOIN tf ON tf.doc_id = s.seed_id JOIN lex l USING (term)),
q AS (SELECT seed_id AS query_id, term FROM sel WHERE rn <= {MLT_TERMS}),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0 AND doc_id <> query_id
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _rm3_exp_cte() -> str:
    """Appends the RM3 feedback + term-mining CTEs to the shared bm25
    `ranked` CTE: feedback docs at rank <= RM3_FB_DOCS, per-query candidate
    sums over their tfs, own-query-term exclusion, the pinned integer
    ordering (fb_tf desc, df asc, term asc) as `exp.rn`."""
    return f""",
fb AS (SELECT query_id, doc_id FROM ranked WHERE rank <= {RM3_FB_DOCS}),
sums AS (SELECT fb.query_id, tf.term, sum(tf.tf)::BIGINT AS fb_tf
         FROM fb JOIN tf USING (doc_id) GROUP BY fb.query_id, tf.term),
cand AS (SELECT s.query_id, s.term, s.fb_tf, df.df::BIGINT AS dfi
         FROM sums s JOIN df USING (term)
         WHERE NOT EXISTS (SELECT 1 FROM q
                           WHERE q.query_id = s.query_id AND q.term = s.term)),
exp AS (SELECT query_id, term, fb_tf, dfi,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY fb_tf DESC, dfi ASC, term ASC) AS rn
        FROM cand)"""


def _rm3_terms_sql() -> str:
    """Integer-exact face of RM3 term mining (rm3.mine_expansion_terms)."""
    return f"""{_bm25_cte()}{_rm3_exp_cte()}
SELECT query_id::BIGINT AS query_id, term, fb_tf, dfi AS df
FROM exp WHERE rn <= {RM3_FB_TERMS}"""


def _rm3_sql() -> str:
    """Full RM3 mirror (rm3.rm3_search): expanded query = original terms at
    their qtfs UNION the top expansion terms at qtf=RM3_EXP_QTF, rescored
    with the same BM25 formula."""
    return f"""{_bm25_cte()}{_rm3_exp_cte()},
q2 AS (SELECT query_id, term, qtf FROM q
       UNION ALL
       SELECT query_id, term, {RM3_EXP_QTF} AS qtf
       FROM exp WHERE rn <= {RM3_FB_TERMS}),
scores2 AS (
  SELECT q2.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q2.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q2
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q2.query_id, tf.doc_id
),
ranked2 AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores2 WHERE score > 0
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id,
       {_round4_sql('score')} AS score_r
FROM ranked2 WHERE rank <= {TOP_K}"""


def _collapse_sql() -> str:
    """Field-collapse mirror: per (query, lang) best by (score desc, doc_id
    asc) from the shared bm25 scores, survivors re-ranked, top-k."""
    return f"""{_bm25_cte()},
coll AS (
  SELECT s.query_id, s.doc_id, s.score, d.lang,
         row_number() OVER (PARTITION BY s.query_id, d.lang
                            ORDER BY s.score DESC, s.doc_id ASC) AS kr
  FROM scores s JOIN documents d USING (doc_id) WHERE s.score > 0
),
ranked2 AS (
  SELECT query_id, doc_id, score, lang,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM coll WHERE kr = 1
)
SELECT query_id, rank::BIGINT AS rank, doc_id, lang AS collapse_key,
       {_round4_sql('score')} AS score_r
FROM ranked2 WHERE rank <= {TOP_K}"""


DIVERSIFIED_CAP = 2


def _diversified_sql() -> str:
    """diversified_sampler mirror: the collapse mirror with key-rank <=
    cap instead of = 1 (the greedy score-order scan is equivalent)."""
    return f"""{_bm25_cte()},
coll AS (
  SELECT s.query_id, s.doc_id, s.score, d.lang,
         row_number() OVER (PARTITION BY s.query_id, d.lang
                            ORDER BY s.score DESC, s.doc_id ASC) AS kr
  FROM scores s JOIN documents d USING (doc_id) WHERE s.score > 0
),
ranked2 AS (
  SELECT query_id, doc_id, score, lang,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM coll WHERE kr <= {DIVERSIFIED_CAP}
)
SELECT query_id, rank::BIGINT AS rank, doc_id, lang AS collapse_key,
       {_round4_sql('score')} AS score_r
FROM ranked2 WHERE rank <= {TOP_K}"""


def _facet_sql() -> str:
    """SQL mirror of facets.facet_counts over BM25_QUERIES: distinct
    (query, doc) matches via the token CTE, counted per lang."""
    values = []
    for qid, text in BM25_QUERIES:
        for term in sorted(term_counts(text)):
            values.append(f"({qid}, '{term}')")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TOKS},
q(query_id, term) AS (VALUES
    {vals}
),
m AS (SELECT DISTINCT q.query_id, t.doc_id FROM q JOIN toks t USING (term))
SELECT m.query_id::BIGINT AS query_id, d.lang AS facet, count(*)::BIGINT AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY m.query_id, d.lang"""


def _facet_stats_sql() -> str:
    """Mirror of q_facet_stats: distinct (query, doc) matches joined to
    documents, GROUP BY (query, lang) with count/sum/min/max/avg over
    n_chars (avg round4; the integer stats exact)."""
    values = []
    for qid, text in BM25_QUERIES:
        for term in sorted(term_counts(text)):
            values.append(f"({qid}, '{term}')")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TOKS},
q(query_id, term) AS (VALUES
    {vals}
),
m AS (SELECT DISTINCT q.query_id, t.doc_id FROM q JOIN toks t USING (term))
SELECT m.query_id::BIGINT AS query_id, d.lang AS facet,
       count(*)::BIGINT AS n_docs,
       sum(d.n_chars)::BIGINT AS sum_chars,
       min(d.n_chars)::BIGINT AS min_chars,
       max(d.n_chars)::BIGINT AS max_chars,
       {_round4_sql('sum(d.n_chars)::DOUBLE / count(*)')} AS avg_chars_r
FROM m JOIN documents d USING (doc_id)
GROUP BY m.query_id, d.lang"""


def _near_sql() -> str:
    """Ordered-proximity mirror: a start counts iff an ordered chain of the
    remaining terms EXISTS within span k-1+slop (greedy minimizes the chain
    end, so greedy-match ≡ exists-match). One EXISTS join per query."""
    from splade_ray.analysis import tokenize as _tok

    blocks = []
    for pid, text in NEAR_QUERIES:
        qt = _tok(text)
        k = len(qt)
        bound = k - 1 + NEAR_SLOP
        # chain tables b1..b_{k-1}; a = the start term's positions
        joins, conds = [], []
        prev = "a"
        for i, t in enumerate(qt[1:], start=1):
            al = f"b{i}"
            joins.append(
                f"JOIN tk {al} ON {al}.doc_id = a.doc_id AND {al}.term = '{t}'"
            )
            conds.append(f"{al}.p > {prev}.p")
            prev = al
        conds.append(f"{prev}.p <= a.p + {bound}")
        blocks.append(f"""
SELECT {pid} AS phrase_id, doc_id, count(*)::BIGINT AS phrase_count
FROM (SELECT DISTINCT a.doc_id, a.p
      FROM tk a {' '.join(joins)}
      WHERE a.term = '{qt[0]}' AND {' AND '.join(conds)})
GROUP BY doc_id""")
    union = "\nUNION ALL".join(blocks)
    return f"""
WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t FROM documents),
tk AS (SELECT doc_id, unnest(t) AS term,
              unnest(generate_series(1, len(t))) AS p FROM tl)
{union}"""


def _span_first_sql() -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in SPAN_FIRST_QUERIES)
    return f"""
WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t FROM documents),
tk AS (SELECT doc_id, unnest(t) AS term,
              unnest(generate_series(1, len(t))) AS p FROM tl),
sq(query_id, term) AS (VALUES {vals})
SELECT sq.query_id::BIGINT AS query_id, tk.doc_id, count(*)::BIGINT AS n_occ
FROM sq JOIN tk USING (term)
WHERE tk.p <= {SPAN_FIRST_LIMIT}
GROUP BY sq.query_id, tk.doc_id"""


def _span_not_sql() -> str:
    """SpanNot mirror: token-array lambda — include positions i with an
    empty exclude-position list in the clamped window [i-pre, i+post]."""
    branches = []
    for qid, q in SPAN_NOT_QUERIES:
        (inc,) = sorted(term_counts(q["include"]))
        (exc,) = sorted(term_counts(q["exclude"]))
        branches.append(
            f"SELECT {qid} AS query_id, doc_id,\n"
            f"       len(list_filter(range(1, len(t)+1),\n"
            f"           i -> t[i] = '{inc}'\n"
            f"                AND len(list_filter(range(greatest(1, i-{SPAN_NOT_PRE}),"
            f" least(len(t), i+{SPAN_NOT_POST})+1),\n"
            f"                                    j -> t[j] = '{exc}')) = 0))::BIGINT AS n_occ\n"
            f"  FROM ta"
        )
    body = "\n  UNION ALL\n".join(branches)
    return f"""
WITH ta AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t
            FROM documents),
m AS (
  {body}
)
SELECT query_id::BIGINT AS query_id, doc_id, n_occ FROM m WHERE n_occ > 0"""


def _span_rel_sql(mode: str) -> str:
    """SpanContaining / SpanWithin mirror for 2-term bigs: the greedy chain
    end is min(second term's position after the start), bounded by
    k-1+slop; containment tests are EXISTS over the little term's
    positions."""
    from splade_ray.analysis import tokenize as _tok

    bound = 1 + SPAN_REL_SLOP  # k=2
    branches = []
    for qid, q in SPAN_REL_QUERIES:
        t1, t2 = _tok(q["big"])
        (lt,) = _tok(q["little"])
        spans = (
            f"SELECT a.doc_id, a.p AS s, min(b.p) AS e\n"
            f"       FROM tk a JOIN tk b ON b.doc_id = a.doc_id"
            f" AND b.term = '{t2}' AND b.p > a.p\n"
            f"       WHERE a.term = '{t1}'\n"
            f"       GROUP BY a.doc_id, a.p\n"
            f"       HAVING min(b.p) - a.p <= {bound}"
        )
        if mode == "containing":
            branches.append(
                f"""SELECT {qid} AS query_id, sp.doc_id, count(*)::BIGINT AS n_spans
FROM ({spans}) sp
WHERE EXISTS (SELECT 1 FROM tk l WHERE l.doc_id = sp.doc_id
              AND l.term = '{lt}' AND l.p BETWEEN sp.s AND sp.e)
GROUP BY sp.doc_id"""
            )
        else:
            branches.append(
                f"""SELECT {qid} AS query_id, l.doc_id, count(*)::BIGINT AS n_spans
FROM tk l
WHERE l.term = '{lt}' AND EXISTS (SELECT 1 FROM ({spans}) sp
      WHERE sp.doc_id = l.doc_id AND l.p BETWEEN sp.s AND sp.e)
GROUP BY l.doc_id"""
            )
    body = "\nUNION ALL\n".join(branches)
    return f"""
WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t FROM documents),
tk AS (SELECT doc_id, unnest(t) AS term,
              unnest(generate_series(1, len(t))) AS p FROM tl)
{body}"""


def _near_unordered_sql() -> str:
    """Unordered-proximity mirror: starts = query-term occurrences; one
    EXISTS-in-window clause per distinct query term."""
    from splade_ray.analysis import tokenize as _tok

    blocks = []
    for pid, text in NEAR_QUERIES:
        qt = _tok(text)
        k = len(qt)
        bound = k - 1 + NEAR_SLOP
        distinct = sorted(set(qt))
        in_list = ", ".join(f"'{t}'" for t in distinct)
        exists = " AND ".join(
            f"EXISTS (SELECT 1 FROM tk x WHERE x.doc_id = s.doc_id "
            f"AND x.term = '{t}' AND x.p >= s.p AND x.p <= s.p + {bound})"
            for t in distinct
        )
        blocks.append(f"""
SELECT {pid} AS phrase_id, doc_id, count(*)::BIGINT AS phrase_count
FROM (SELECT DISTINCT doc_id, p FROM tk s
      WHERE s.term IN ({in_list}) AND {exists}) s2
GROUP BY doc_id""")
    union = "\nUNION ALL".join(blocks)
    return f"""
WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t FROM documents),
tk AS (SELECT doc_id, unnest(t) AS term,
              unnest(generate_series(1, len(t))) AS p FROM tl)
{union}"""


def _explain_sql() -> str:
    """Explain mirror: target docs = distinct top-k doc ids from the shared
    bm25 `ranked` CTE; one row per (query term, target doc) with tf in
    the doc — the engine explains every query x target-doc pair."""
    return f"""{_bm25_cte()},
tgt AS (SELECT DISTINCT doc_id FROM ranked WHERE rank <= {TOP_K}),
e AS (
  SELECT q.query_id, tf.doc_id, tf.term, tf.tf,
         df.df::BIGINT AS dfi,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) AS weight,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
           * tf.tf * ({K1} + 1)
           / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) AS contrib
  FROM q
  JOIN tf USING (term)
  JOIN tgt ON tgt.doc_id = tf.doc_id
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
)
SELECT query_id, doc_id, term, tf, dfi AS df,
       {_round4_sql('weight')} AS weight_r, {_round4_sql('contrib')} AS contrib_r
FROM e"""


def _hybrid_rrf_sql() -> str:
    """RRF mirror: the shared bm25 `ranked` CTE + a QL ranking over the
    same toks/tf/dl CTEs, both truncated at TOP_K, fused by
    sum(1/(RRF_K + rank)) and re-ranked (rrf desc, doc_id asc)."""
    return f"""{_bm25_cte()},
cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
stats2 AS (SELECT sum(dl) AS c FROM dl),
qls AS (
  SELECT q.query_id, tf.doc_id,
         sum( q.qtf * greatest(0.0,
              ln(1 + tf.tf / ({QL_MU} * cf.cf / s2.c))
              + ln({QL_MU} / (dl.dl + {QL_MU})) ) ) AS score
  FROM q JOIN tf USING (term) JOIN cf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats2 s2
  GROUP BY q.query_id, tf.doc_id
),
qlranked AS (SELECT query_id, doc_id,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
             FROM qls WHERE score > 0),
allr AS (
  SELECT query_id, doc_id, 1.0 / ({RRF_K} + rank) AS rrf
  FROM ranked WHERE rank <= {TOP_K}
  UNION ALL
  SELECT query_id, doc_id, 1.0 / ({RRF_K} + rank)
  FROM qlranked WHERE rank <= {TOP_K}
),
f AS (SELECT query_id, doc_id, sum(rrf) AS rrf FROM allr GROUP BY query_id, doc_id),
fr AS (SELECT query_id, doc_id, rrf,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('rrf')} DESC, doc_id ASC) AS rank
       FROM f)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('rrf')} AS rrf_r
FROM fr WHERE rank <= {TOP_K}"""


def _hybrid_linear_sql() -> str:
    """Linear-fusion mirror: bm25 + QL rankings truncated at TOP_K, per
    run/query minmax normalization (degenerate span -> 1.0), weighted sum,
    re-ranked (fused desc, doc_id asc)."""
    w1, w2 = HYBRID_W
    return f"""{_bm25_cte()},
cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
stats2 AS (SELECT sum(dl) AS c FROM dl),
qls AS (
  SELECT q.query_id, tf.doc_id,
         sum( q.qtf * greatest(0.0,
              ln(1 + tf.tf / ({QL_MU} * cf.cf / s2.c))
              + ln({QL_MU} / (dl.dl + {QL_MU})) ) ) AS score
  FROM q JOIN tf USING (term) JOIN cf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats2 s2
  GROUP BY q.query_id, tf.doc_id
),
qlranked AS (SELECT query_id, doc_id, score,
                    row_number() OVER (PARTITION BY query_id
                                       ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
             FROM qls WHERE score > 0),
pages AS (
  SELECT 1 AS src, query_id, doc_id, score FROM ranked WHERE rank <= {TOP_K}
  UNION ALL
  SELECT 2 AS src, query_id, doc_id, score FROM qlranked WHERE rank <= {TOP_K}
),
norm AS (
  SELECT src, query_id, doc_id,
         CASE WHEN max(score) OVER w = min(score) OVER w THEN 1.0
              ELSE (score - min(score) OVER w)
                   / (max(score) OVER w - min(score) OVER w) END AS n
  FROM pages WINDOW w AS (PARTITION BY src, query_id)
),
f AS (SELECT query_id, doc_id,
             sum(CASE WHEN src = 1 THEN {w1} ELSE {w2} END * n) AS fused
      FROM norm GROUP BY query_id, doc_id),
fr AS (SELECT query_id, doc_id, fused,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('fused')} DESC, doc_id ASC) AS rank
       FROM f)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('fused')} AS fused_r
FROM fr WHERE rank <= {TOP_K}"""


def _percolate_sql(mode: str) -> str:
    """Percolator mirror: distinct doc terms joined to the stored query
    terms, matched-count per (doc, query) compared to the query's arity
    (mode='all') or >= 1 (mode='any')."""
    cond = "m.hits = qa.arity" if mode == "all" else "m.hits >= 1"
    return f"""
WITH dt AS (SELECT DISTINCT doc_id,
                   unnest(regexp_extract_all(lower(text), '{TOKEN_SQL}')) AS term
            FROM documents),
{_qterm_values_sql()},
qa AS (SELECT query_id, count(*)::BIGINT AS arity FROM qterm GROUP BY query_id),
m AS (SELECT d.doc_id, q.query_id, count(*)::BIGINT AS hits
      FROM dt d JOIN qterm q USING (term) GROUP BY d.doc_id, q.query_id)
SELECT m.doc_id, m.query_id::BIGINT AS query_id
FROM m JOIN qa USING (query_id) WHERE {cond}"""


def _term_vectors_sql() -> str:
    ids = ", ".join(str(i) for i in TV_DOC_IDS)
    return f"""
WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t
            FROM documents WHERE doc_id IN ({ids})),
tok AS (SELECT doc_id, unnest(t) AS term,
               unnest(generate_series(1, len(t))) AS p FROM tl)
SELECT doc_id, term, count(*)::BIGINT AS tf,
       string_agg(p::VARCHAR, ',' ORDER BY p) AS positions
FROM tok GROUP BY doc_id, term"""


def _facet_top_sql() -> str:
    """Terms-aggregation mirror: the facet counts ranked per query by
    (n_docs desc, facet asc), top FACET_TOP kept."""
    return f"""
WITH fc AS ({_facet_sql()})
SELECT query_id, facet, n_docs
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY n_docs DESC, facet ASC) AS rn
      FROM fc)
WHERE rn <= {FACET_TOP}"""


def _substr_sql() -> str:
    """SQL mirror of trigram.substring_search over SUBSTR_QUERIES: the
    engine lowers both sides, counts non-overlapping occurrences (Arrow
    count_substring ≡ the replace-trick below — both scan left-to-right)."""
    values = ", ".join(
        f"({qid}, '{ndl.lower()}')" for qid, ndl in SUBSTR_QUERIES
    )
    return f"""
WITH needles(query_id, needle) AS (VALUES {values})
SELECT n.query_id::BIGINT AS query_id, d.doc_id,
       ((length(lower(d.text)) - length(replace(lower(d.text), n.needle, '')))
        // length(n.needle))::BIGINT AS n_occurrences
FROM documents d CROSS JOIN needles n
WHERE contains(lower(d.text), n.needle)"""


def _substr_cs_sql() -> str:
    """SQL mirror of substring_search(case_insensitive=False): exact-case
    contains + replace-trick count, no lower() on either side."""
    values = ", ".join(f"({qid}, '{ndl}')" for qid, ndl in SUBSTR_QUERIES)
    return f"""
WITH needles(query_id, needle) AS (VALUES {values})
SELECT n.query_id::BIGINT AS query_id, d.doc_id,
       ((length(d.text) - length(replace(d.text, n.needle, '')))
        // length(n.needle))::BIGINT AS n_occurrences
FROM documents d CROSS JOIN needles n
WHERE contains(d.text, n.needle)"""


SNIPPET_WIDTH = 12


def _grep_snippets_sql() -> str:
    """SQL mirror of substring_search(snippets=True): pos = 1-based char
    position of the first needle occurrence in the lowered text (DuckDB
    position() counts characters; the engine bridges Arrow's byte offsets
    via a codepoint-prefix pass), snippet = chars
    [pos-W, pos+len(needle)+W) of the ORIGINAL text."""
    w = SNIPPET_WIDTH
    values = ", ".join(
        f"({qid}, '{ndl.lower()}', {len(ndl)})" for qid, ndl in SUBSTR_QUERIES
    )
    return f"""
WITH needles(query_id, needle, nlen) AS (VALUES {values}),
m AS (
  SELECT n.query_id::BIGINT AS query_id, d.doc_id,
         ((length(lower(d.text)) - length(replace(lower(d.text), n.needle, '')))
          // length(n.needle))::BIGINT AS n_occurrences,
         position(n.needle IN lower(d.text))::BIGINT AS pos,
         substr(d.text,
                greatest(1, position(n.needle IN lower(d.text)) - {w}),
                position(n.needle IN lower(d.text)) + n.nlen + {w}
                  - greatest(1, position(n.needle IN lower(d.text)) - {w})) AS snippet
  FROM documents d CROSS JOIN needles n
  WHERE contains(lower(d.text), n.needle))
SELECT query_id, doc_id, n_occurrences, pos, snippet FROM m"""


def _grep_sql() -> str:
    """SQL mirror of trigram.grep_scan over GREP_QUERIES: both engines run
    RE2 with the 'i' flag; occurrence count = leftmost non-overlapping
    extraction count."""
    values = ", ".join(f"({qid}, '{pat}')" for qid, pat in GREP_QUERIES)
    return f"""
WITH pats(query_id, pat) AS (VALUES {values}),
m AS (SELECT p.query_id, d.doc_id,
             len(regexp_extract_all(d.text, p.pat, 0, 'i'))::BIGINT AS n_occurrences
      FROM documents d CROSS JOIN pats p)
SELECT query_id::BIGINT AS query_id, doc_id, n_occurrences FROM m
WHERE n_occurrences > 0"""


def _boosting_sql() -> str:
    """Mirror of q_boosting_topk: the bm25 score CTE over positive terms,
    then CASE-demotion by NEG_BOOST for docs holding any negative term
    (sum-then-multiply, the engine's float-op order), score>0 ranked."""
    score_vals, neg_vals = [], []
    for qid, spec in BOOSTING_QUERIES:
        for t, qtf in sorted(term_counts(spec.get("positive", "") or "").items()):
            score_vals.append(f"({qid}, '{t}', {qtf})")
        for t in sorted(term_counts(spec.get("negative", "") or "")):
            neg_vals.append(f"({qid}, '{t}')")
    sep = ",\n    "
    ng_cte = (
        f"ng(query_id, term) AS (VALUES\n    {sep.join(neg_vals)}\n),"
        if neg_vals
        else "ng(query_id, term) AS (SELECT NULL::BIGINT, NULL::VARCHAR WHERE false),"
    )
    return f"""
WITH {_TF},
q(query_id, term, qtf) AS (VALUES
    {sep.join(score_vals)}
),
{ng_cte}
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
demoted AS (
  SELECT s.query_id, s.doc_id,
         CASE WHEN EXISTS (SELECT 1 FROM ng JOIN tf t2
                             ON t2.term = ng.term AND t2.doc_id = s.doc_id
                           WHERE ng.query_id = s.query_id)
              THEN s.score * {NEG_BOOST} ELSE s.score END AS score
  FROM scores s
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM demoted WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _const_score_sql() -> str:
    """Mirror of q_const_score_topk: distinct (query, doc) matches of the
    OR-of-terms filter, constant score, doc_id-asc pagination."""
    vals = []
    for qid, text in CONST_QUERIES:
        for t in sorted(term_counts(text)):
            vals.append(f"({qid}, '{t}')")
    sep = ",\n    "
    return f"""
WITH {_TF},
q(query_id, term) AS (VALUES
    {sep.join(vals)}
),
m AS (SELECT DISTINCT q.query_id, tf.doc_id FROM q JOIN tf USING (term)),
ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY doc_id ASC) AS rank
  FROM m
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id,
       {_round4_sql(str(CONST_BOOST))} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _boolean_sql(queries=None) -> str:
    """SQL mirror of boolq.boolean_search over BOOL_QUERIES: the bm25 score
    CTE restricted by must (NOT EXISTS a must term absent from the doc) and
    must_not (NOT EXISTS a banned term present) — clause term lists and qtfs
    generated from the same fixture + tokenizer as the Ray side. Queries
    with minimum_should_match > 0 additionally require the per-doc distinct
    should-term match count to reach m (Lucene msm; the engine's boolq
    counts DISTINCT should terms, and tf has one row per (doc, term) so
    count(*) over the sm join mirrors it exactly)."""
    score_vals, mt_vals, mn_vals, sm_vals, mm_vals = [], [], [], [], []
    for qid, spec in (queries or BOOL_QUERIES):
        must = term_counts(spec.get("must", "") or "")
        should = term_counts(spec.get("should", "") or "")
        mustnot = term_counts(spec.get("must_not", "") or "")
        for t, qtf in sorted((must + should).items()):
            score_vals.append(f"({qid}, '{t}', {qtf})")
        for t in sorted(must):
            mt_vals.append(f"({qid}, '{t}')")
        for t in sorted(mustnot):
            mn_vals.append(f"({qid}, '{t}')")
        m = int(spec.get("minimum_should_match", 0))
        if m > 0 and should:
            mm_vals.append(f"({qid}, {m})")
            for t in sorted(should):
                sm_vals.append(f"({qid}, '{t}')")
    sep = ",\n    "
    sv, mv, nv = sep.join(score_vals), sep.join(mt_vals), sep.join(mn_vals)
    mt_cte = f"mt(query_id, term) AS (VALUES\n    {mv}\n)," if mt_vals else \
        "mt(query_id, term) AS (SELECT NULL::BIGINT, NULL::VARCHAR WHERE false),"
    mn_cte = f"mn(query_id, term) AS (VALUES\n    {nv}\n)," if mn_vals else \
        "mn(query_id, term) AS (SELECT NULL::BIGINT, NULL::VARCHAR WHERE false),"
    msm_pred = ""
    msm_ctes = ""
    if mm_vals:
        msm_ctes = (
            f"sm(query_id, term) AS (VALUES\n    {sep.join(sm_vals)}\n),\n"
            f"mm(query_id, m) AS (VALUES\n    {sep.join(mm_vals)}\n),"
        )
        msm_pred = """
    AND NOT EXISTS (
      SELECT 1 FROM mm
      WHERE mm.query_id = s.query_id
        AND (SELECT count(*) FROM sm JOIN tf ON tf.term = sm.term
                                            AND tf.doc_id = s.doc_id
             WHERE sm.query_id = s.query_id) < mm.m)"""
    return f"""
WITH {_TF},
q(query_id, term, qtf) AS (VALUES
    {sv}
),
{mt_cte}
{mn_cte}
{msm_ctes}
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
qual AS (
  SELECT s.query_id, s.doc_id, s.score FROM scores s
  WHERE s.score > 0
    AND NOT EXISTS (
      SELECT 1 FROM mt
      WHERE mt.query_id = s.query_id
        AND NOT EXISTS (SELECT 1 FROM tf
                        WHERE tf.doc_id = s.doc_id AND tf.term = mt.term))
    AND NOT EXISTS (
      SELECT 1 FROM mn JOIN tf ON tf.term = mn.term AND tf.doc_id = s.doc_id
      WHERE mn.query_id = s.query_id){msm_pred}
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM qual
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _sample_sqls() -> dict[str, str]:
    """SQL mirrors of the ops/sample family, generated from the SAME hash
    constants + thresholds (splade_ray.ops.sample.bucket_sql/hash_sql)."""
    from splade_ray.ops.sample import BUCKETS, bucket_sql, hash_sql, threshold

    b = bucket_sql("doc_id", SAMPLE_SEED)
    names = sorted(SPLIT_FRACTIONS)
    cuts = np.cumsum([SPLIT_FRACTIONS[n] for n in names])
    bounds = [threshold(c) for c in cuts]
    bounds[-1] = BUCKETS
    case = " ".join(
        f"WHEN {b} < {t} THEN '{n}'" for n, t in zip(names[:-1], bounds[:-1])
    )
    strata_case = " ".join(
        f"WHEN '{k}' THEN {threshold(v)}" for k, v in sorted(STRATA_RATES.items())
    )
    return {
        "sample_hash": f"""
SELECT doc_id, lang FROM documents
WHERE {b} < {threshold(SAMPLE_RATE)}""",
        "split_assign": f"""
SELECT doc_id, CASE {case} ELSE '{names[-1]}' END AS split FROM documents""",
        "sample_bottomk": f"""
SELECT doc_id,
       row_number() OVER (ORDER BY {hash_sql('doc_id', SAMPLE_SEED)}, doc_id) AS sample_rank
FROM documents
ORDER BY sample_rank LIMIT {BOTTOMK}""",
        "sample_stratified": f"""
SELECT doc_id, lang FROM documents
WHERE {b} < CASE lang {strata_case} ELSE {threshold(STRATA_DEFAULT)} END""",
        "train_shards": f"""
WITH h AS (SELECT doc_id, {hash_sql('doc_id', SAMPLE_SEED)} AS hv FROM documents)
SELECT doc_id,
       ((hv // {1 << 44})::BIGINT % {TRAIN_SHARDS_N}) AS shard,
       (row_number() OVER (
          PARTITION BY ((hv // {1 << 44})::BIGINT % {TRAIN_SHARDS_N})
          ORDER BY hv, doc_id) - 1)::BIGINT AS pos
FROM h""",
        "mix_sample": f"""
WITH c AS (SELECT source AS g, count(*)::BIGINT AS n FROM documents GROUP BY 1),
w AS (SELECT g, n, pow(n, {MIX_ALPHA}) AS wt FROM c),
tot AS (SELECT sum(wt) AS s FROM w),
raw AS (SELECT g, n, round({MIX_TARGET} * wt / s, 9) AS r FROM w CROSS JOIN tot),
base AS (SELECT g, n, floor(r)::BIGINT AS b,
                round(r - floor(r), 9) AS frac FROM raw),
rem AS (SELECT {MIX_TARGET} - sum(b) AS k FROM base),
ordered AS (SELECT g, row_number() OVER (ORDER BY frac DESC, g ASC) AS rn
            FROM base),
tgt AS (SELECT base.g,
               least(base.b + CASE WHEN o.rn <= r.k THEN 1 ELSE 0 END,
                     base.n) AS t
        FROM base JOIN ordered o USING (g) CROSS JOIN rem r),
sel AS (SELECT d.doc_id, d.source,
               row_number() OVER (PARTITION BY d.source
                                  ORDER BY {hash_sql('d.doc_id', MIX_SEED)},
                                           d.doc_id) AS rn
        FROM documents d)
SELECT s.doc_id, s.source FROM sel s JOIN tgt ON tgt.g = s.source
WHERE s.rn <= tgt.t""",
    }


def _auto_date_histogram_sql() -> str:
    """auto_date_histogram mirror: the SAME integer ladder selection
    (smallest step whose floor-aligned bucket count fits the target, else
    the largest step) computed in SQL from the events bounds, then the
    tumbling-window aggregate at that step."""
    from splade_ray.ops.windows import AUTO_HIST_LADDER_US

    cases = " ".join(
        f"WHEN mx // {s} - mn // {s} + 1 <= {AUTO_HIST_TARGET} THEN {s}"
        for s in AUTO_HIST_LADDER_US
    )
    return f"""
WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events),
st AS (SELECT (CASE {cases} ELSE {AUTO_HIST_LADDER_US[-1]} END)::BIGINT AS step
       FROM b),
e AS (SELECT (epoch_us(ts) // st.step) * st.step AS window_start_us,
             event_type, floor(value * 100 + 0.5)::BIGINT AS c, st.step
      FROM events CROSS JOIN st)
SELECT window_start_us::BIGINT AS window_start_us, event_type,
       count(*)::BIGINT AS n_events, sum(c)::BIGINT AS sum_value_c,
       min(c)::BIGINT AS min_value_c, max(c)::BIGINT AS max_value_c,
       any_value(step)::BIGINT AS interval_us
FROM e GROUP BY 1, 2"""


def _window_hop_sql() -> str:
    """SQL mirror of hopping windows: each event cross-joined to its
    window_us/hop_us window starts — same floor-division arithmetic."""
    w, h = WINDOW_1H_US, HOP_15M_US
    n_win = w // h
    return f"""
WITH e AS (
  SELECT ((epoch_us(ts) // {h}) - j.j) * {h} AS window_start_us, event_type,
         floor(value * 100 + 0.5)::BIGINT AS c
  FROM events CROSS JOIN range(0, {n_win}) AS j(j))
SELECT window_start_us::BIGINT AS window_start_us, event_type,
       count(*)::BIGINT AS n_events, sum(c)::BIGINT AS sum_value_c,
       min(c)::BIGINT AS min_value_c, max(c)::BIGINT AS max_value_c
FROM e GROUP BY 1, 2"""


def _topn_per_type_sql() -> str:
    return f"""
WITH e AS (SELECT event_type, event_id,
                  floor(value * 100 + 0.5)::BIGINT AS value_c FROM events),
r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY value_c DESC, event_id ASC) AS rank
      FROM e)
SELECT event_type, rank::BIGINT AS rank, event_id, value_c
FROM r WHERE rank <= {TOPN_PER_TYPE}"""


def _window_agg_sql() -> str:
    """SQL mirror of ops.windows.tumbling_window_agg: integer-cent value
    aggregates per (1h window, event_type) — epoch-µs floor division is the
    same arithmetic on both sides."""
    w = WINDOW_1H_US
    return f"""
WITH e AS (
  SELECT (epoch_us(ts) // {w}) * {w} AS window_start_us, event_type,
         floor(value * 100 + 0.5)::BIGINT AS c
  FROM events)
SELECT window_start_us::BIGINT AS window_start_us, event_type,
       count(*)::BIGINT AS n_events, sum(c)::BIGINT AS sum_value_c,
       min(c)::BIGINT AS min_value_c, max(c)::BIGINT AS max_value_c
FROM e GROUP BY 1, 2"""


def _bucket_pipeline_sql() -> str:
    """Mirror of q_bucket_pipeline: the parent window aggregate plus SQL
    window functions for the four pipeline aggs."""
    w = WINDOW_1H_US
    k = PIPELINE_MOV_WINDOW - 1
    return f"""
WITH e AS (
  SELECT (epoch_us(ts) // {w}) * {w} AS window_start_us, event_type,
         floor(value * 100 + 0.5)::BIGINT AS c
  FROM events),
b AS (SELECT window_start_us::BIGINT AS window_start_us, event_type,
             count(*)::BIGINT AS n_events, sum(c)::BIGINT AS sum_value_c
      FROM e GROUP BY 1, 2)
SELECT window_start_us, event_type, n_events, sum_value_c,
       (sum(sum_value_c) OVER cumw)::BIGINT AS cum_sum,
       coalesce(sum_value_c - lag(sum_value_c) OVER lw, 0)::BIGINT AS deriv0,
       (lag(sum_value_c) OVER lw IS NOT NULL) AS has_prev,
       coalesce(sum_value_c - lag(sum_value_c, {PIPELINE_SERIAL_LAG}) OVER lw, 0)::BIGINT AS serial_diff0,
       (lag(sum_value_c, {PIPELINE_SERIAL_LAG}) OVER lw IS NOT NULL) AS has_lag,
       {_round4_sql("avg(sum_value_c::DOUBLE) OVER movw")} AS mov_avg_r,
       {_round4_sql("sum_value_c::DOUBLE / n_events")} AS per_event_r
FROM b
WINDOW lw AS (PARTITION BY event_type ORDER BY window_start_us),
       cumw AS (PARTITION BY event_type ORDER BY window_start_us
                ROWS UNBOUNDED PRECEDING),
       movw AS (PARTITION BY event_type ORDER BY window_start_us
                ROWS BETWEEN {k} PRECEDING AND CURRENT ROW)"""


_MOMENT_EXPRS = {
    "value_c": "floor(value * 100 + 0.5)::DOUBLE",
    "user_id": "user_id::DOUBLE",
}


def _percentile_ranks_sql() -> str:
    vals = ", ".join(f"({v})" for v in PCT_RANK_VALUES)
    return f"""
WITH e AS (SELECT event_type, floor(value * 100 + 0.5)::BIGINT AS c FROM events),
v(value) AS (VALUES {vals})
SELECT e.event_type, v.value,
       sum(CASE WHEN e.c <= v.value THEN 1 ELSE 0 END)::BIGINT AS n_le,
       count(*)::BIGINT AS n_total,
       floor(1000.0 * sum(CASE WHEN e.c <= v.value THEN 1 ELSE 0 END)
             / count(*) + 0.5)::BIGINT AS pct_mille
FROM e CROSS JOIN v
GROUP BY e.event_type, v.value"""


def _moment_sums_cte() -> str:
    """Raw power sums over the events numeric fields (shared by the
    matrix_stats / field_moments mirrors): same sums, same derivations as
    ops.moments."""
    sel = ", ".join(f"{e} AS {c}" for c, e in _MOMENT_EXPRS.items())
    sums = ["count(*)::DOUBLE AS n"]
    for c in _MOMENT_EXPRS:
        sums += [
            f"sum({c}) AS s1_{c}", f"sum({c}*{c}) AS s2_{c}",
            f"sum({c}*{c}*{c}) AS s3_{c}", f"sum({c}*{c}*{c}*{c}) AS s4_{c}",
        ]
    cols = list(_MOMENT_EXPRS)
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            sums.append(f"sum({a}*{b}) AS sxy_{a}__{b}")
    return f"""e AS (SELECT {sel} FROM events),
s AS (SELECT {', '.join(sums)} FROM e)"""


def _matrix_stats_sql() -> str:
    cols = list(_MOMENT_EXPRS)
    branches = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            sxy = f"s2_{a}" if a == b else f"sxy_{a}__{b}"
            va = f"((s2_{a} - n * (s1_{a}/n) * (s1_{a}/n)) / (n - 1))"
            vb = f"((s2_{b} - n * (s1_{b}/n) * (s1_{b}/n)) / (n - 1))"
            cov = f"(({sxy} - n * (s1_{a}/n) * (s1_{b}/n)) / (n - 1))"
            branches.append(
                f"""SELECT '{a}' AS field_a, '{b}' AS field_b, n::BIGINT AS n,
       {_round4_sql(f's1_{a}/n')} AS mean_a_r,
       {_round4_sql(f's1_{b}/n')} AS mean_b_r,
       {_round4_sql(cov)} AS cov_r,
       {_round4_sql(f'{cov} / sqrt({va} * {vb})')} AS corr_r
FROM s"""
            )
    body = "\nUNION ALL\n".join(branches)
    return f"""
WITH {_moment_sums_cte()}
{body}"""


def _field_moments_sql() -> str:
    branches = []
    for c in _MOMENT_EXPRS:
        m = f"(s1_{c}/n)"
        m2 = f"(s2_{c}/n - {m}*{m})"
        m3 = f"(s3_{c}/n - 3*{m}*s2_{c}/n + 2*{m}*{m}*{m})"
        m4 = (
            f"(s4_{c}/n - 4*{m}*s3_{c}/n + 6*{m}*{m}*s2_{c}/n "
            f"- 3*{m}*{m}*{m}*{m})"
        )
        branches.append(
            f"""SELECT '{c}' AS field, n::BIGINT AS n,
       {_round4_sql(m)} AS mean_r,
       {_round4_sql(f'{m2} * n / (n - 1)')} AS variance_r,
       {_round4_sql(f'{m3} / pow({m2}, 1.5)')} AS skewness_r,
       {_round4_sql(f'{m4} / ({m2} * {m2})')} AS kurtosis_r
FROM s"""
        )
    body = "\nUNION ALL\n".join(branches)
    return f"""
WITH {_moment_sums_cte()}
{body}"""


def _sessions_sql() -> str:
    """SQL mirror of ops.windows.sessionize: lag-gap flags + running sum =
    session ids, per (user, ts, event_id) ordering — exactly the engine's
    lexsort + gap-scan."""
    g = SESSION_GAP_US
    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                  floor(value * 100 + 0.5)::BIGINT AS c FROM events),
o AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
      FROM e),
f AS (SELECT *, (prev IS NULL OR ts_us - prev > {g})::INT AS new_s FROM o),
s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM f)
SELECT user_id, min(ts_us)::BIGINT AS session_start_us,
       max(ts_us)::BIGINT AS session_end_us,
       count(*)::BIGINT AS n_events, sum(c)::BIGINT AS sum_value_c
FROM s GROUP BY user_id, sid"""


def _funnel_sql() -> str:
    """SQL mirror of ops.windows.funnel: per step a QUALIFY row_number()=1
    pick of the first event strictly after the previous match (ts, id
    order) within the anchor window — generated from FUNNEL_STEPS."""
    w = FUNNEL_WITHIN_US
    ctes = [
        "e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts FROM events)"
    ]
    ctes.append(f"""s1 AS (
  SELECT user_id, ts, event_id, ts AS t1 FROM e WHERE event_type = '{FUNNEL_STEPS[0]}'
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1)""")
    for j in range(1, len(FUNNEL_STEPS)):
        p = f"s{j}"
        ctes.append(f"""s{j + 1} AS (
  SELECT e.user_id, e.ts, e.event_id, {p}.t1 AS t1
  FROM e JOIN {p} USING (user_id)
  WHERE e.event_type = '{FUNNEL_STEPS[j]}'
    AND (e.ts > {p}.ts OR (e.ts = {p}.ts AND e.event_id > {p}.event_id))
    AND e.ts <= {p}.t1 + {w}
  QUALIFY row_number() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) = 1)""")
    k = len(FUNNEL_STEPS)
    depth_case = " ".join(
        f"WHEN s{j}.user_id IS NOT NULL THEN {j}" for j in range(k, 0, -1)
    )
    last_coalesce = ", ".join(f"s{j}.ts" for j in range(k, 0, -1))
    joins = "\n".join(f"LEFT JOIN s{j} USING (user_id)" for j in range(1, k + 1))
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT u.user_id,
       (CASE {depth_case} ELSE 0 END)::BIGINT AS depth,
       coalesce(s1.ts, -1)::BIGINT AS t_first_us,
       coalesce({last_coalesce}, -1)::BIGINT AS t_last_us
FROM (SELECT DISTINCT user_id FROM events) u
{joins}"""


def _asof_sql() -> str:
    """SQL mirror of ops.windows.asof_join on (purchase <- signup): the
    most recent signup with ts <= purchase ts, ties to (later ts, larger
    event id), unmatched -1 — the engine's merged-rank pick as a
    row_number() window."""
    return """
WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
      WHERE event_type = 'signup'),
m AS (
  SELECT l.event_id AS left_id, r.event_id AS r_id, r.ts_us AS r_ts,
         row_number() OVER (PARTITION BY l.event_id
                            ORDER BY r.ts_us DESC, r.event_id DESC) AS rn
  FROM l JOIN r ON r.user_id = l.user_id AND r.ts_us <= l.ts_us
)
SELECT l.event_id AS left_id, l.user_id, l.ts_us::BIGINT AS left_ts_us,
       coalesce(m.r_id, -1)::BIGINT AS right_id,
       coalesce(m.r_ts, -1)::BIGINT AS right_ts_us,
       coalesce(l.ts_us - m.r_ts, -1)::BIGINT AS gap_us
FROM l LEFT JOIN (SELECT * FROM m WHERE rn = 1) m ON m.left_id = l.event_id"""


def _shingles_cte(k: int = 3) -> str:
    """CTE chain ending in ``flat(doc_id, x)``: distinct word-k-shingle
    hashes per doc, exactly ``ops.dedup._shingles`` (rolling fold mod 2^64,
    reduced mod the Mersenne prime 2^61-1; short docs fold all tokens,
    empty docs -> {{0}})."""
    from splade_ray.ops.dedup import MERSENNE, SHINGLE_P

    p = int(SHINGLE_P)
    foldk = _fold_sql([f"h[i+{j}]" for j in range(k)], p)
    return f"""{_token_hashes_cte()},
sh AS (
  SELECT doc_id,
    CASE WHEN len(h) = 0 THEN [0::HUGEINT]
         WHEN len(h) < {k} THEN [list_reduce(h, (a, x) -> (a * {p} + x) % {_M64}) % {MERSENNE}]
         ELSE list_distinct(list_transform(range(1, len(h) - {k - 2}), i -> ({foldk}) % {MERSENNE}))
    END AS s
  FROM hs
),
flat AS (SELECT doc_id, unnest(s) AS x FROM sh)"""


def _minhash_sigs_sql(num_perm: int = 64, seed: int = 42) -> str:
    """SQL mirror of MinHashStage signatures: per (doc, permutation) the min
    of ``((a·x + b) mod 2^64) mod p`` over the doc's shingle set — the
    numpy kernel runs the affine step in wrapping uint64 arithmetic, so the
    SQL mirrors that wrap explicitly (a·x < 2^122 < HUGEINT max).
    Permutation constants are baked in from the same seeded RNG."""
    from splade_ray.ops.dedup import MERSENNE, _minhash_params

    a, b = _minhash_params(num_perm, seed)
    vals = ",\n    ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_perm)
    )
    return f"""
WITH {_shingles_cte(3)},
perms(perm, a, b) AS (VALUES
    {vals}
)
SELECT f.doc_id, p.perm::BIGINT AS perm,
       min(((p.a::HUGEINT * f.x + p.b) % {_M64}) % {MERSENNE})::BIGINT AS minhash
FROM flat f CROSS JOIN perms p
GROUP BY f.doc_id, p.perm"""


def _simhash_sigs_sql() -> str:
    """SQL mirror of ops.dedup.simhash_batch: per doc and bit position b,
    the tf-weighted ±1 sum over unique-token hash bits; fingerprint = sum of
    2^b where the sum is positive. Bit extraction and the bit-63 power run
    in HUGEINT."""
    th = _HASH64_SQL.format(t="term")
    bitvals = ",\n    ".join(f"({b}, {1 << b})" for b in range(64))
    return f"""
WITH {_TF},
th AS (SELECT doc_id, term, tf, {th} AS h FROM tf),
bits(b, p2) AS (VALUES
    {bitvals}
),
acc AS (
  SELECT th.doc_id, bits.p2,
         sum(CASE WHEN (th.h // bits.p2) % 2 = 1 THEN th.tf ELSE -th.tf END) AS s
  FROM th CROSS JOIN bits
  GROUP BY th.doc_id, bits.p2
),
fp AS (SELECT doc_id, sum(CASE WHEN s > 0 THEN p2 ELSE 0 END)::HUGEINT AS f
       FROM acc GROUP BY doc_id)
SELECT d.doc_id, coalesce(fp.f, 0)::UBIGINT AS simhash
FROM documents d LEFT JOIN fp USING (doc_id)"""


def q_lang_id(sf_dir: str):
    from splade_ray.ops.textstats import langid_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        langid_batch, batch_format="pyarrow", batch_size=512
    )


def q_lang_id_pred(sf_dir: str):
    """Language-ID predictions only (doc_id, pred_lang) — the oracle-checked
    face of the heuristic: stopword hit-rate argmax (tie → alphabetical
    first) with CJK override, SQL-mirrored from the same stopword registry.
    Confidences stay in the rows-only `lang_id` entry (they are rationals
    whose 4dp rounding is float-order-fragile; see q_flops_metric)."""
    return q_lang_id(sf_dir).select_columns(["doc_id", "pred_lang"])


def _lang_id_pred_sql() -> str:
    """SQL mirror of ops.textstats.langid_batch's prediction, generated from
    the STOPWORDS registry so the two can't drift."""
    from splade_ray.ops.textstats import CJK_RE, STOPWORDS

    langs = sorted(lang for lang, sw in STOPWORDS.items() if sw)
    hit_cols = ",\n    ".join(
        "sum(CASE WHEN term IN ({}) THEN 1 ELSE 0 END) AS h_{}".format(
            ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang])), lang
        )
        for lang in langs
    )
    per_lang_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, '{lang}' AS lang, coalesce(h_{lang}, 0)::DOUBLE / n AS score FROM scores"
        for lang in langs
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_SQL}')) AS term
  FROM documents
),
hits AS (
  SELECT doc_id, count(*) AS n_tok,
    {hit_cols}
  FROM tok GROUP BY doc_id
),
scores AS (
  SELECT d.doc_id,
         greatest(coalesce(h.n_tok, 0), 1)::DOUBLE AS n,
         {", ".join(f"h.h_{lang}" for lang in langs)},
         len(regexp_extract_all(d.text, '{CJK_RE.pattern}')) AS cjk
  FROM documents d LEFT JOIN hits h USING (doc_id)
),
ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM (
{per_lang_rows}
  )
)
SELECT s.doc_id,
       CASE WHEN s.cjk > 0 THEN 'zh'
            WHEN r.score = 0 THEN 'unknown'
            ELSE r.lang END AS pred_lang
FROM scores s JOIN ranked r ON r.doc_id = s.doc_id AND r.rn = 1"""


def q_doc_fingerprint(sf_dir: str):
    from splade_ray.ops.textstats import fingerprint_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint_batch, batch_format="pyarrow", batch_size=512
    )


def q_minhash_sigs(sf_dir: str):
    """MinHash signatures unnested to (doc_id, perm, minhash) BIGINT rows —
    the oracle-checked face of the MinHash operator: token hashes are
    sha256-prefixes, shingles are rolling polynomial folds mod 2^64 reduced
    mod the Mersenne prime, and each permutation is (a·x+b) mod p — all of
    which DuckDB reproduces bit-for-bit in HUGEINT arithmetic (the banded
    LSH pairing built ON these signatures stays rows-only)."""
    from splade_ray.ops.dedup import MinHashStage

    sigs = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MinHashStage, batch_format="pyarrow", batch_size=512, concurrency=(1, 2)
    )

    def unnest(batch: pa.Table) -> pa.Table:
        docs = batch["doc_id"].to_numpy(zero_copy_only=False)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "perm": pa.array([], pa.int64()),
                    "minhash": pa.array([], pa.int64()),
                }
            )
        mat = np.stack([np.frombuffer(s, np.uint64) for s in batch["sig"].to_pylist()])
        n, p = mat.shape
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(docs, p), pa.int64()),
                "perm": pa.array(np.tile(np.arange(p, dtype=np.int64), n), pa.int64()),
                "minhash": pa.array(mat.reshape(-1).astype(np.int64), pa.int64()),
            }
        )

    return sigs.map_batches(unnest, batch_format="pyarrow")


def q_simhash_sigs(sf_dir: str):
    """Per-doc 64-bit simhash fingerprints (doc_id, simhash) — the
    oracle-checked face of the SimHash operator (the hamming-ball pairing
    stays rows-only)."""
    from splade_ray.ops.dedup import simhash_batch

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow", batch_size=512
    )


def q_dedup_minhash_counts(sf_dir: str):
    """Banded-LSH minhash pairs in integer-exact form (n_match of 64 perms;
    threshold n_match >= 0.5·64) — the oracle-checked face of the full LSH
    pairing: band folds, bucket pairing and signature verification are all
    mirrored in SQL on the already-oracle-checked signature table."""
    from splade_ray.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs(sf_dir, ["doc_id", "text"]), min_est_jaccard=0.5, emit_counts=True
    )


def _minhash_pairs_sql(num_perm: int = 64, bands: int = 16) -> str:
    """SQL mirror of minhash_lsh_pairs(emit_counts=True): per-band polynomial
    fold of the signature (wrapping mod 2^64, masked to 63 bits), bucket
    pairing on (band, band_hash), and per-pair matched-perm counts."""
    from splade_ray.ops.dedup import SHINGLE_P

    rows = num_perm // bands
    return f"""
WITH sigs AS ({_minhash_sigs_sql(num_perm)}),
bh AS (
  SELECT doc_id, perm // {rows} AS band,
         (list_reduce(list(minhash::HUGEINT ORDER BY perm),
                      (a, x) -> (a * {int(SHINGLE_P)} + x) % {_M64})
          % 9223372036854775808)::BIGINT AS band_hash
  FROM sigs GROUP BY doc_id, perm // {rows}
),
p AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bh x JOIN bh y
        ON x.band = y.band AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id),
m AS (
  SELECT p.doc_a, p.doc_b,
         sum(CASE WHEN s1.minhash = s2.minhash THEN 1 ELSE 0 END)::BIGINT AS n_match
  FROM p JOIN sigs s1 ON s1.doc_id = p.doc_a
         JOIN sigs s2 ON s2.doc_id = p.doc_b AND s2.perm = s1.perm
  GROUP BY p.doc_a, p.doc_b)
SELECT doc_a, doc_b, n_match FROM m WHERE n_match >= 0.5 * {num_perm}"""


def _lsh_probe_sql() -> str:
    """Mirror of q_lsh_probe_counts: signatures + band folds from the
    shared minhash SQL machinery, the increment's band rows joined
    against the full corpus's, per-pair matched-perm counts."""
    from splade_ray.ops.dedup import SHINGLE_P

    num_perm, bands = LSH_IDX_PERM, LSH_IDX_BANDS
    rows = num_perm // bands
    return f"""
WITH sigs AS ({_minhash_sigs_sql(num_perm)}),
bh AS (
  SELECT doc_id, perm // {rows} AS band,
         (list_reduce(list(minhash::HUGEINT ORDER BY perm),
                      (a, x) -> (a * {int(SHINGLE_P)} + x) % {_M64})
          % 9223372036854775808)::BIGINT AS band_hash
  FROM sigs GROUP BY doc_id, perm // {rows}
),
newbh AS (SELECT doc_id + 100000 AS doc_id, band, band_hash
          FROM bh WHERE doc_id % 2 = 0),
p AS (SELECT DISTINCT n.doc_id AS new_doc, o.doc_id AS old_doc
      FROM newbh n JOIN bh o
        ON n.band = o.band AND n.band_hash = o.band_hash),
m AS (
  SELECT p.new_doc, p.old_doc,
         sum(CASE WHEN s1.minhash = s2.minhash THEN 1 ELSE 0 END)::BIGINT
             AS n_match
  FROM p JOIN sigs s1 ON s1.doc_id = p.new_doc - 100000
         JOIN sigs s2 ON s2.doc_id = p.old_doc AND s2.perm = s1.perm
  GROUP BY p.new_doc, p.old_doc)
SELECT new_doc, old_doc, n_match FROM m
WHERE n_match >= 0.5 * {num_perm}"""


def _simhash_pairs_sql() -> str:
    """SQL mirror of simhash_pairs: 16-bit chunk blocking over the
    oracle-checked fingerprints, pairwise hamming = bit_count(xor)."""
    return f"""
WITH sims AS ({_simhash_sigs_sql()}),
ch AS (
  SELECT doc_id, simhash, t.c,
         ((simhash // t.d::UBIGINT) % 65536)::BIGINT AS key
  FROM sims,
       (VALUES (0, 1), (1, 65536), (2, 4294967296), (3, 281474976710656)) AS t(c, d)
),
p AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
             x.simhash AS ha, y.simhash AS hb
      FROM ch x JOIN ch y ON x.c = y.c AND x.key = y.key AND x.doc_id < y.doc_id)
SELECT doc_a, doc_b, bit_count(xor(ha, hb))::BIGINT AS hamming
FROM p WHERE bit_count(xor(ha, hb)) <= 3"""


def q_dedup_embedding(sf_dir: str):
    from splade_ray.ops.dedup import embedding_near_dup_pairs

    ds = _rpq(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    # the synthetic embeddings are near-orthogonal (max pairwise cosine
    # ~0.5), so the demo threshold is set where candidate pairs exist;
    # production near-dup would use ~0.9
    return embedding_near_dup_pairs(ds, dim=64, min_cosine=0.35, n_planes=4)


def q_ann_ivf_topk(sf_dir: str):
    """IVF approximate ANN (seeded spherical k-means coarse quantizer,
    nprobe-of-n_clusters scan) — the scale path beside brute force."""
    from splade_ray.ops.ann import ivf_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path)
    ids = np.array(qt["vec_id"].to_pylist())
    mask = ids < 5
    q_mat = np.stack(
        [np.array(v, np.float64) for v, m in zip(qt["embedding"].to_pylist(), mask) if m]
    )
    ds = _rpq(emb_path, columns=["vec_id", "embedding"])
    out = ivf_topk(
        ds, ids[mask], q_mat, n_clusters=16, nprobe=4, top_k=TOP_K,
        index_dir=os.path.join(_work_dir(sf_dir, "ivf"), "index"),
    ).to_pandas()
    out["sim_r"] = _round4(out["sim"].to_numpy())
    out["rank"] = out["rank"].astype(np.int64)
    return out[["query_id", "rank", "vec_id", "sim_r"]]


def q_ann_ivf_exact(sf_dir: str):
    """IVF at ``nprobe == n_clusters`` degrades to exact brute force (every
    partition probed) — the oracle-checked face of the IVF operator: its SQL
    mirror is the same full cosine ranking as ``ann_cosine_topk``. The
    partition-pruned configuration stays rows-only (``ann_ivf_topk``)."""
    from splade_ray.ops.ann import ivf_topk

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    qt = pq.read_table(emb_path)
    ids = np.array(qt["vec_id"].to_pylist())
    mask = ids < 5
    q_mat = np.stack(
        [np.array(v, np.float64) for v, m in zip(qt["embedding"].to_pylist(), mask) if m]
    )
    ds = _rpq(emb_path, columns=["vec_id", "embedding"])
    out = ivf_topk(
        ds, ids[mask], q_mat, n_clusters=16, nprobe=16, top_k=10**9,
        index_dir=os.path.join(_work_dir(sf_dir, "ivf"), "index"),
    ).to_pandas()
    out["sim_r"] = _round4(out["sim"].to_numpy())
    out = _stable_rank(out, ["vec_id"], score_col="sim_r", k=TOP_K)
    return out[["query_id", "rank", "vec_id", "sim_r"]]


def q_ann_lsh_buckets(sf_dir: str):
    from splade_ray.ops.ann import lsh_buckets

    ds = _rpq(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    return lsh_buckets(ds, dim=64, n_planes=12, seed=42)


LSH_INT_PLANES = 12
LSH_INT_SEED = 42
LSH_INT_SCALE_BITS = 20


def q_ann_lsh_buckets_int(sf_dir: str):
    """Integer-exact LSH buckets (ops/ann.RademacherLSH): ±1 seeded planes
    over fixed-point embeddings — every dot an exact int64, so bucket ids
    hash-compare against the SQL mirror with no float-sign ambiguity (the
    Gaussian-plane face stays rows-only for exactly that reason)."""
    from splade_ray.ops.ann import lsh_buckets_int

    ds = _rpq(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    return lsh_buckets_int(
        ds, dim=64, n_planes=LSH_INT_PLANES, seed=LSH_INT_SEED,
        scale_bits=LSH_INT_SCALE_BITS,
    )


def _lsh_int_sql() -> str:
    """Mirror of RademacherLSH: the seeded ±1 sign matrix is embedded as
    literals (generated from the SAME class, so Ray and SQL cannot drift);
    fixed-point = floor(x·2^k + 0.5); bucket = Σ 2^p over planes with
    strictly positive integer dots."""
    from splade_ray.ops.ann import RademacherLSH

    lsh = RademacherLSH(64, LSH_INT_PLANES, LSH_INT_SEED, LSH_INT_SCALE_BITS)
    vals = ",\n    ".join(
        f"({p}, {j}, {int(lsh.signs[p, j])})"
        for p in range(lsh.signs.shape[0])
        for j in range(lsh.signs.shape[1])
    )
    scale = lsh.scale
    return f"""
WITH ej AS (SELECT vec_id, unnest(embedding)::DOUBLE AS x,
                   unnest(generate_series(0, len(embedding) - 1)) AS j
            FROM embeddings),
xi AS (SELECT vec_id, j, floor(x * {scale} + 0.5)::BIGINT AS v FROM ej),
sgn(p, j, s) AS (VALUES
    {vals}
),
dots AS (SELECT xi.vec_id, sgn.p, sum(sgn.s * xi.v)::BIGINT AS dot
         FROM xi JOIN sgn USING (j) GROUP BY xi.vec_id, sgn.p)
SELECT vec_id,
       sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bucket
FROM dots GROUP BY vec_id"""


def q_media_decode(sf_dir: str):
    from splade_ray.ops.media import attach_fake_payload, decode_media

    media = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        attach_fake_payload, batch_format="pyarrow", batch_size=256
    )
    return decode_media(media, batch_size=64, concurrency=(1, 2))


def q_anserini_docs(sf_dir: str):
    """Anserini JSONL-vector doc export rows (id, vector_json) — the
    portable-index artifact (EncodeAnserini, transformer_evaluator.py:214-247)."""
    from splade_ray.io import anserini_doc_rows

    return anserini_doc_rows(
        _docs(sf_dir, ["doc_id", "text"]), params=BM25Params(k1=K1, b=B)
    )


def q_media_frames(sf_dir: str):
    """Media decode -> frame-sampling flat-map (video frame extraction
    shape; deterministic fake decode, real Ray plumbing)."""
    from splade_ray.ops.media import attach_fake_payload, decode_media, frame_sample

    media = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        attach_fake_payload, batch_format="pyarrow", batch_size=256
    )
    return frame_sample(decode_media(media, batch_size=64, concurrency=(1, 2)), every_n=4000)


def q_flagship_run(sf_dir: str):
    """End-to-end flagship: corpus-shape ingest -> resumable index build ->
    scatter-gather BM25 top-k -> pushdown external-id join. Oracle-checked:
    ``documents_as_corpus`` maps doc_id -> (repo=source, path='docs/<id>.txt')
    deterministically, and dense row-position ids equal documents.doc_id, so
    the SQL mirror is the bm25 oracle joined back to documents."""
    out = run_flagship(sf_dir, _work_dir(sf_dir, "flagship"),
                       params=BM25Params(top_k=10**9)).copy()
    out["score_r"] = _round4(out["score"].to_numpy())
    out = _stable_rank(out, ["doc_id"], k=TOP_K)
    return out[["query_id", "rank", "doc_id", "score_r", "repo", "path"]]


# --------------------------------------------------------------------------
# driver contract
# --------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on sf0.001 (corpus-shape ingest -> resumable index
    build -> scatter-gather BM25 top-k -> external-id join)."""
    return run_flagship("/root/testdata/sf0.001", _work_dir("/root/testdata/sf0.001", "flagship"))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "postings_flat": q_postings_flat,
        "postings_flat_by_lang": q_postings_flat_by_lang,
        "lexicon": q_lexicon,
        "doc_token_stats": q_doc_token_stats,
        "bm25_topk": q_bm25_topk,
        "search_after_page2": q_search_after_page2,
        "bm25_topk_deleted": q_bm25_topk_deleted,
        "bm25_topk_purged": q_bm25_topk_purged,
        "bm25_topk_bmw": q_bm25_topk_bmw,
        "bm25_topk_quantized": q_bm25_topk_quantized,
        "ql_topk": q_ql_topk,
        "lmjm_topk": q_lmjm_topk,
        "tfidf_topk": q_tfidf_topk,
        "dfr_topk": q_dfr_topk,
        "suggest_terms": q_suggest_terms,
        "suggest_terms_dl": q_suggest_dl,
        "prefix_topk": q_prefix_topk,
        "fuzzy_topk": q_fuzzy_topk,
        "bm25_topk_by_lang": q_bm25_topk_by_lang,
        "postings_flat_stemmed": q_postings_flat_stemmed,
        "postings_flat_code": q_postings_flat_code,
        "bm25_topk_stemmed": q_bm25_topk_stemmed,
        "bm25f_topk": q_bm25f_topk,
        "dismax_topk": q_dismax_topk,
        "bm25f_true_topk": q_bm25f_true_topk,
        "cross_fields_scores": q_cross_fields_topk,
        "snippets_topk": q_snippets_topk,
        "highlight_fragments": q_highlight_fragments,
        "snippets_topk_distinct": q_snippets_topk_distinct,
        "snippets_topk_sentence": q_snippets_topk_sentence,
        "collection_stats": q_collection_stats,
        "docs_per_lang": q_docs_per_lang,
        "dedup_exact": q_dedup_exact,
        "dedup_incremental": q_dedup_incremental,
        "prune_topk": q_prune_topk,
        "quantized_export": q_quantized_export,
        "quantized_export_join": q_quantized_export_join,
        "prune_value": q_prune_value,
        "prune_quantile": q_prune_quantile,
        "flops_metric": q_flops_metric,
        "rerank_input": q_rerank_input,
        "rerank_lexical": q_rerank_lexical,
        "rerank_pairwise": q_rerank_pairwise,
        "text_quality": q_text_quality,
        "gopher_rules": q_gopher_rules,
        "c4_rules": q_c4_rules,
        "repetition_stats": q_repetition,
        "phrase_search": q_phrase_search,
        "multi_phrase": q_multi_phrase,
        "match_phrase_prefix": q_match_phrase_prefix,
        "near_search": q_near_search,
        "near_unordered": q_near_unordered,
        "span_first": q_span_first,
        "span_not": q_span_not,
        "span_containing": q_span_containing,
        "span_within": q_span_within,
        "doclen_quantiles": q_doclen_quantiles,
        "event_value_quantiles": q_event_value_quantiles,
        "distinct_terms_kmv": q_distinct_terms_kmv,
        "more_like_this": q_more_like_this,
        "rm3_terms": q_rm3_terms,
        "rm3_topk": q_rm3_topk,
        "facet_counts": q_facet_counts,
        "facet_stats_agg": q_facet_stats,
        "facet_top": q_facet_top,
        "term_vectors": q_term_vectors,
        "percolate_all": q_percolate_all,
        "percolate_any": q_percolate_any,
        "hybrid_rrf": q_hybrid_rrf,
        "hybrid_linear": q_hybrid_linear,
        "explain_topk": q_explain,
        "collapse_topk": q_collapse_topk,
        "range_topk": q_range_topk,
        "function_score": q_function_score,
        "block_join_max": q_block_join_max,
        "block_join_avg": q_block_join_avg,
        "rank_feature": q_rank_feature,
        "composite_agg": q_composite_agg,
        "composite_agg_page2": q_composite_agg_page2,
        "range_topk_str": q_range_topk_str,
        "sort_by_field": q_sort_by_field,
        "sort_by_field_indexed": q_sort_by_field_indexed,
        "sort_multi": q_sort_multi,
        "sort_multi_indexed": q_sort_multi_indexed,
        "match_counts": q_match_counts,
        "match_histogram": q_match_histogram,
        "filters_agg": q_filters_agg,
        "ids_query": q_ids_query,
        "routed_topk": q_routed_topk,
        "suggest_complete": q_suggest_complete,
        "pinned_topk": q_pinned_topk,
        "exists_topk": q_exists_topk,
        "terms_lookup": q_terms_lookup,
        "geo_distance_topk": q_geo_distance_topk,
        "geo_bbox": q_geo_bbox,
        "geotile_grid": q_geotile_grid,
        "distance_feature": q_distance_feature,
        "match_bool_prefix": q_match_bool_prefix,
        "range_agg": q_range_agg,
        "multi_terms": q_multi_terms,
        "rare_terms": q_rare_terms,
        "weighted_avg": q_weighted_avg,
        "field_stats": q_field_stats,
        "diversified_topk": q_diversified_topk,
        "match_stats": q_match_stats,
        "match_extended_stats": q_match_extended_stats,
        "synonym_topk": q_synonym_topk,
        "wildcard_topk": q_wildcard_topk,
        "regexp_topk": q_regexp_topk,
        "substr_search": q_substr_search,
        "grep_scan": q_grep_scan,
        "grep_snippets": q_grep_snippets,
        "substr_search_cs": q_substr_search_cs,
        "regex_grep_pruned": q_regex_grep_pruned,
        "boolean_topk": q_boolean_topk,
        "boolean_msm": q_boolean_msm,
        "rescore_topk": q_rescore_topk,
        "common_terms_topk": q_common_terms,
        "terms_set_topk": q_terms_set,
        "boosting_topk": q_boosting_topk,
        "const_score_topk": q_const_score_topk,
        "query_string": q_query_string,
        "phrase_topk": q_phrase_topk,
        "sample_hash": q_sample_hash,
        "split_assign": q_split_assign,
        "sample_bottomk": q_sample_bottomk,
        "sample_stratified": q_sample_stratified,
        "train_shards": q_train_shards,
        "mix_sample": q_mix_sample,
        "top_events_per_type": q_top_events_per_type,
        "window_agg_1h": q_window_agg,
        "auto_date_histogram": q_auto_date_histogram,
        "window_hop_1h_15m": q_window_hop,
        "bucket_pipeline_1h": q_bucket_pipeline,
        "top_hits_by_lang": q_top_hits,
        "adjacency_matrix": q_adjacency_matrix,
        "matrix_stats": q_matrix_stats,
        "percentile_ranks": q_percentile_ranks,
        "field_moments": q_field_moments,
        "emb_covariance": q_emb_covariance,
        "chunk_docs": q_chunk_docs,
        "rag_topk": q_rag_topk,
        "rag_chunks": q_rag_chunks,
        "has_parent_chunks": q_has_parent_chunks,
        "facet_tags": q_facet_tags,
        "match_percentiles": q_match_percentiles,
        "pca_embed": q_pca_embed,
        "sessions_30m": q_sessions,
        "asof_purchase_signup": q_asof_purchase_signup,
        "funnel_48h": q_funnel,
        "token_counts": q_token_counts,
        "decontam_grams": q_decontam,
        "dsir_counts": q_dsir_counts,
        "dsir_weights": q_dsir_weights,
        "dsir_select": q_dsir_select,
        "lm_counts": q_lm_counts,
        "lm_ppl": q_lm_ppl,
        "sig_terms": q_sig_terms,
        "multi_index_topk": q_multi_index_topk,
        "multi_index_bool": q_multi_index_bool,
        "multi_index_phrase": q_multi_index_phrase,
        "top_sources_hh": q_top_sources_hh,
        "top_sources_hh_by_lang": q_top_sources_hh_by_lang,
        "bpe_word_counts": q_bpe_word_counts,
        "rollup_events": q_rollup_events,
        "bpe_subword_stats": q_bpe_subword_stats,
        "pack_assign": q_pack_assign,
        "dup_spans": q_dup_spans,
        "dup_spans_rewrite": q_dup_spans_rewrite,
        "dup_spans_rewrite_sharded": q_dup_spans_rewrite_sharded,
        "unit_dedup": q_unit_dedup,
        "unit_dedup_sharded": q_unit_dedup_sharded,
        "lsh_probe_counts": q_lsh_probe_counts,
        "url_normalize": q_url_normalize,
        "url_dedup": q_url_dedup,
        "redact_docs": q_redact,
        "top_terms": q_top_terms,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_cosine_topk_sq8": q_ann_cosine_topk_sq8,
        "ann_filtered_topk": q_ann_filtered,
        "ann_pq_exact": q_ann_pq_exact,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "quality_clf": q_quality_clf,
        "minhash_sigs": q_minhash_sigs,
        "simhash_sigs": q_simhash_sigs,
        "doc_fingerprint": q_doc_fingerprint,
        "dedup_clusters": q_dedup_clusters,
        "dedup_survivors": q_dedup_survivors,
        "dedup_minhash_counts": q_dedup_minhash_counts,
        "dedup_simhash": q_dedup_simhash,
        # rows-only (float-ratio faces / float-sign ops; each has an
        # integer-exact or signature-level oracle-checked twin above)
        "dedup_minhash": q_dedup_minhash,
        "near_dup_jaccard": q_near_dup_jaccard,
        "near_dup_jaccard_counts": q_near_dup_jaccard_counts,
        "near_dup_containment_counts": q_near_dup_containment_counts,
        "containment_sketch_counts": q_containment_sketch_counts,
        "dedup_embedding": q_dedup_embedding,
        "lang_id": q_lang_id,
        "lang_id_pred": q_lang_id_pred,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_exact": q_ann_ivf_exact,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "ann_lsh_buckets_int": q_ann_lsh_buckets_int,
        "semdedup_exact": q_semdedup_exact,
        "semdedup_sel": q_semdedup_sel,
        "anserini_docs": q_anserini_docs,
        "media_decode": q_media_decode,
        "media_frames": q_media_frames,
        "flagship_run": q_flagship_run,
    }


# --------------------------------------------------------------------------
# oracle SQL
# --------------------------------------------------------------------------

_TOKS = f"""
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_SQL}')) AS term
  FROM documents
)"""

_TF = _TOKS + """,
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term)"""


def _bm25_cte() -> str:
    """WITH-clause prefix ending in `ranked` (query_id, doc_id, score, rank) —
    shared by the bm25, rerank and pruning oracles."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TF},
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score, {_round4_sql('score')} AS score_r,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)"""


def _ql_sql() -> str:
    """Dirichlet query-likelihood mirror of q_ql_topk: same formula, same
    per-term clamp, same (score desc, doc_id asc) ranking and score>0 run
    contract as the engine kernel."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TF},
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT sum(dl) AS c FROM dl),
cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( q.qtf * greatest(0.0,
              ln(1 + tf.tf / ({QL_MU} * cf.cf / s.c))
              + ln({QL_MU} / (dl.dl + {QL_MU})) ) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN cf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _lmjm_sql() -> str:
    """Jelinek-Mercer mirror of q_lmjm_topk: same formula (no clamp —
    ln(1+x), x>=0 on a match), same ranking and score>0 contract."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TF},
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT sum(dl) AS c FROM dl),
cf AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( q.qtf * ln(1 + ((1 - {LMJM_LAM}) * tf.tf / dl.dl)
                             / ({LMJM_LAM} * cf.cf / s.c)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN cf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _tfidf_sql() -> str:
    """Classic TF-IDF mirror of q_tfidf_topk: idf_c = 1+ln(n/(df+1)),
    score = sum(qtf * idf_c^2 * sqrt(tf)/sqrt(dl)), same ranking/contract."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TF},
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( q.qtf * pow(1 + ln(s.n / (df.df + 1)), 2)
              * sqrt(tf.tf) / sqrt(dl.dl) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _dfr_sql() -> str:
    """DFR InL2 mirror of q_dfr_topk: tfn = tf*log2(1 + c*avgdl/dl),
    score = sum(qtf * log2((n+1)/(df+0.5)) * tfn/(tfn+1))."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TF},
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( q.qtf * log2((s.n + 1) / (df.df + 0.5))
              * (tf.tf * log2(1 + {DFR_C} * s.avgdl / dl.dl))
              / (tf.tf * log2(1 + {DFR_C} * s.avgdl / dl.dl) + 1) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _suggest_cte() -> str:
    """Shared suggestion CTEs ending in `r` (query_id, term, dist, df, rn):
    lexicon df from the token CTE, DuckDB levenshtein (mirrors
    suggest.levenshtein_bulk exactly), the pinned (dist asc, df desc,
    term asc) ordering."""
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in SUGGEST_QUERIES)
    return f"""
WITH {_TF},
lex AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
sq(query_id, qt) AS (VALUES {vals}),
d AS (SELECT sq.query_id, l.term, levenshtein(sq.qt, l.term)::BIGINT AS dist, l.df
      FROM sq CROSS JOIN lex l
      WHERE levenshtein(sq.qt, l.term) <= {SUGG_MAXD}),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist ASC, df DESC, term ASC) AS rn
      FROM d)"""


def _suggest_dl_sql() -> str:
    """Mirror of q_suggest_dl: duckdb damerau_levenshtein (unrestricted,
    same metric as the engine's tensor DP)."""
    vals = ", ".join(f"({qid}, '{t}')" for qid, t in SUGGEST_DL_QUERIES)
    return f"""
WITH {_TF},
lex AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
sq(query_id, qt) AS (VALUES {vals}),
d AS (SELECT sq.query_id, l.term,
             damerau_levenshtein(sq.qt, l.term)::BIGINT AS dist, l.df
      FROM sq CROSS JOIN lex l
      WHERE damerau_levenshtein(sq.qt, l.term) <= {SUGG_MAXD}),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY dist ASC, df DESC, term ASC) AS rn
      FROM d)
SELECT query_id::BIGINT AS query_id, term, dist, df FROM r WHERE rn <= {SUGG_M}"""


def _suggest_sql() -> str:
    return f"""{_suggest_cte()}
SELECT query_id::BIGINT AS query_id, term, dist, df FROM r WHERE rn <= {SUGG_M}"""


_EXPANDED_BM25 = f"""
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q2.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q2
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q2.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id,
       {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _prefix_sql() -> str:
    """PrefixQuery mirror: ascending-term capped expansion per prefix, then
    BM25 with qtf=1 per expanded term (suggest.prefix_search contract)."""
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in PREFIX_QUERIES)
    return f"""
WITH {_TF},
pq(query_id, p) AS (VALUES {vals}),
exp AS (SELECT pq.query_id, l.term
        FROM pq JOIN (SELECT DISTINCT term FROM tf) l
          ON l.term LIKE pq.p || '%'
        QUALIFY row_number() OVER (PARTITION BY pq.query_id ORDER BY l.term)
                <= {PREFIX_MAX_TERMS}),
q2 AS (SELECT query_id, term FROM exp),{_EXPANDED_BM25}"""


def _fuzzy_sql() -> str:
    """FuzzyQuery mirror: the suggestion CTE capped at FUZZY_MAX_TERMS is
    the expansion set, then BM25 with qtf=1 (suggest.fuzzy_search)."""
    return f"""{_suggest_cte()},
q2 AS (SELECT query_id, term FROM r WHERE rn <= {FUZZY_MAX_TERMS}),{_EXPANDED_BM25}"""


def _bm25_quantized_sql() -> str:
    """Integer-exact quantized-run oracle: score_q from the quantized_export
    impact table, summed per (query, doc) with integer query tfs."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TF}{_IMP},
q(query_id, term, qtf) AS (VALUES
    {vals}
),
sc AS (
  SELECT q.query_id, imp.doc_id, sum(q.qtf * imp.impact_q)::BIGINT AS score_q
  FROM q JOIN imp USING (term)
  GROUP BY q.query_id, imp.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score_q,
         row_number() OVER (PARTITION BY query_id ORDER BY score_q DESC, doc_id ASC) AS rank
  FROM sc WHERE score_q > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, score_q
FROM ranked WHERE rank <= {TOP_K}"""


def _bm25_sql() -> str:
    return f"""{_bm25_cte()}
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}
"""


def _search_after_sql() -> str:
    """search_after page-2 mirror: rows TOP_K+1 .. 2*TOP_K of the
    deterministic (n_chars desc, doc_id asc) sort order over matching
    docs (page 1's last row is exactly rank TOP_K, so 'strictly after
    the cursor' is exactly this rank window), ranks restarted at 1."""
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED}
SELECT query_id, (rank - {TOP_K})::BIGINT AS rank, doc_id,
       n_chars::BIGINT AS sort_value
FROM (SELECT m.query_id, m.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY m.query_id
                                ORDER BY d.n_chars DESC, m.doc_id ASC) AS rank
      FROM m JOIN documents d USING (doc_id))
WHERE rank > {TOP_K} AND rank <= {2 * TOP_K}"""


def _fragments_sql() -> str:
    """Multi-fragment mirror: hits from the shared rounded `ranked` CTE,
    fixed generate_series tiles, per-tile match counts via the position
    range join, top FRAG_N tiles by the all-integer (n_match desc, i asc)
    window."""
    w, f = FRAG_WINDOW, FRAG_N
    return f"""{_bm25_cte()},
hits AS (SELECT query_id, doc_id FROM ranked WHERE rank <= {TOP_K}),
{_qterm_values_sql()},
dt AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS toks
       FROM documents WHERE doc_id IN (SELECT DISTINCT doc_id FROM hits)),
tok AS (SELECT doc_id, unnest(toks) AS term,
               unnest(generate_series(1, len(toks))) AS j FROM dt),
m AS (SELECT h.query_id, t.doc_id, t.j
      FROM hits h JOIN tok t USING (doc_id)
      JOIN qterm q ON q.query_id = h.query_id AND q.term = t.term),
starts AS (SELECT h.query_id, h.doc_id,
                  unnest(generate_series(1, len(d.toks), {w})) AS i
           FROM hits h JOIN dt d USING (doc_id) WHERE len(d.toks) > 0),
cnt AS (SELECT s.query_id, s.doc_id, s.i, count(m.j)::BIGINT AS n_match
        FROM starts s LEFT JOIN m ON m.query_id = s.query_id
                                 AND m.doc_id = s.doc_id
                                 AND m.j BETWEEN s.i AND s.i + {w} - 1
        GROUP BY s.query_id, s.doc_id, s.i),
best AS (SELECT query_id, doc_id, i, n_match,
                row_number() OVER (PARTITION BY query_id, doc_id
                                   ORDER BY n_match DESC, i ASC) AS frag_rank
         FROM cnt WHERE n_match > 0)
SELECT b.query_id, b.doc_id, b.frag_rank::BIGINT AS frag_rank,
       b.i::BIGINT AS start, b.n_match,
       array_to_string(d.toks[b.i : least(b.i + {w} - 1, len(d.toks))], ' ')
           AS fragment
FROM best b JOIN dt d USING (doc_id) WHERE b.frag_rank <= {f}"""


def _snippets_sql() -> str:
    """Sliding-window snippet mirror: hits from the shared bm25 `ranked`
    CTE, candidate docs' token arrays, per-start match counts via a range
    join on zipped token ordinals, best window by (count desc, start asc)."""
    w = SNIPPET_WINDOW
    return f"""{_bm25_cte()},
hits AS (SELECT query_id, doc_id FROM ranked WHERE rank <= {TOP_K}),
{_qterm_values_sql()},
dt AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS toks
       FROM documents WHERE doc_id IN (SELECT DISTINCT doc_id FROM hits)),
tok AS (SELECT doc_id, unnest(toks) AS term,
               unnest(generate_series(1, len(toks))) AS j FROM dt),
m AS (SELECT h.query_id, t.doc_id, t.j
      FROM hits h JOIN tok t USING (doc_id)
      JOIN qterm q ON q.query_id = h.query_id AND q.term = t.term),
starts AS (SELECT h.query_id, h.doc_id,
                  unnest(generate_series(1, greatest(len(d.toks) - {w} + 1, 1))) AS i
           FROM hits h JOIN dt d USING (doc_id)),
cnt AS (SELECT s.query_id, s.doc_id, s.i,
               count(m.j)::BIGINT AS n_match
        FROM starts s LEFT JOIN m ON m.query_id = s.query_id AND m.doc_id = s.doc_id
                                 AND m.j BETWEEN s.i AND s.i + {w} - 1
        GROUP BY s.query_id, s.doc_id, s.i),
best AS (SELECT query_id, doc_id, i, n_match,
                row_number() OVER (PARTITION BY query_id, doc_id
                                   ORDER BY n_match DESC, i ASC) AS rn
         FROM cnt)
SELECT b.query_id, b.doc_id, b.i::BIGINT AS start, b.n_match,
       array_to_string(d.toks[b.i : b.i + {w} - 1], ' ') AS snippet
FROM best b JOIN dt d USING (doc_id) WHERE b.rn = 1"""


def _snippets_distinct_sql() -> str:
    """Distinct-coverage snippet mirror: same CTEs as _snippets_sql plus the
    matched term carried into the range join; best window by
    (distinct terms desc, occurrences desc, start asc)."""
    w = SNIPPET_WINDOW
    return f"""{_bm25_cte()},
hits AS (SELECT query_id, doc_id FROM ranked WHERE rank <= {TOP_K}),
{_qterm_values_sql()},
dt AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS toks
       FROM documents WHERE doc_id IN (SELECT DISTINCT doc_id FROM hits)),
tok AS (SELECT doc_id, unnest(toks) AS term,
               unnest(generate_series(1, len(toks))) AS j FROM dt),
m AS (SELECT h.query_id, t.doc_id, t.term, t.j
      FROM hits h JOIN tok t USING (doc_id)
      JOIN qterm q ON q.query_id = h.query_id AND q.term = t.term),
starts AS (SELECT h.query_id, h.doc_id,
                  unnest(generate_series(1, greatest(len(d.toks) - {w} + 1, 1))) AS i
           FROM hits h JOIN dt d USING (doc_id)),
cnt AS (SELECT s.query_id, s.doc_id, s.i,
               count(DISTINCT m.term)::BIGINT AS n_distinct,
               count(m.j)::BIGINT AS n_match
        FROM starts s LEFT JOIN m ON m.query_id = s.query_id AND m.doc_id = s.doc_id
                                 AND m.j BETWEEN s.i AND s.i + {w} - 1
        GROUP BY s.query_id, s.doc_id, s.i),
best AS (SELECT query_id, doc_id, i, n_distinct, n_match,
                row_number() OVER (PARTITION BY query_id, doc_id
                                   ORDER BY n_distinct DESC, n_match DESC, i ASC) AS rn
         FROM cnt)
SELECT b.query_id, b.doc_id, b.i::BIGINT AS start, b.n_distinct, b.n_match,
       array_to_string(d.toks[b.i : b.i + {w} - 1], ' ') AS snippet
FROM best b JOIN dt d USING (doc_id) WHERE b.rn = 1"""


def _snippets_sentence_sql() -> str:
    """Sentence-aligned snippet mirror: distinct-coverage CTEs plus per-token
    sentence-start flags rebuilt by splitting the lowered text on
    [.!?\\n]+ (chars outside the token class, so the flat token sequence is
    unchanged) and tokenizing each sentence; a window is aligned when its
    first token starts a sentence. Ordering: distinct desc, occurrences
    desc, aligned desc, start asc."""
    from splade_ray.snippets import SENT_SPLIT_SQL

    w = SNIPPET_WINDOW
    return f"""{_bm25_cte()},
hits AS (SELECT query_id, doc_id FROM ranked WHERE rank <= {TOP_K}),
{_qterm_values_sql()},
dt AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS toks
       FROM documents WHERE doc_id IN (SELECT DISTINCT doc_id FROM hits)),
tok AS (SELECT doc_id, unnest(toks) AS term,
               unnest(generate_series(1, len(toks))) AS j FROM dt),
sents AS (SELECT doc_id,
                 unnest(regexp_split_to_array(lower(text), '{SENT_SPLIT_SQL}')) AS sent,
                 generate_subscripts(regexp_split_to_array(lower(text), '{SENT_SPLIT_SQL}'), 1) AS si
          FROM documents WHERE doc_id IN (SELECT DISTINCT doc_id FROM hits)),
stok AS (SELECT doc_id, si, regexp_extract_all(sent, '{TOKEN_SQL}') AS stoks FROM sents),
flag AS (SELECT doc_id,
                row_number() OVER (PARTITION BY doc_id ORDER BY si, tj) AS j,
                CASE WHEN tj = 1 THEN 1 ELSE 0 END AS sstart
         FROM (SELECT doc_id, si, unnest(generate_series(1, len(stoks))) AS tj
               FROM stok)),
m AS (SELECT h.query_id, t.doc_id, t.term, t.j
      FROM hits h JOIN tok t USING (doc_id)
      JOIN qterm q ON q.query_id = h.query_id AND q.term = t.term),
starts AS (SELECT h.query_id, h.doc_id,
                  unnest(generate_series(1, greatest(len(d.toks) - {w} + 1, 1))) AS i
           FROM hits h JOIN dt d USING (doc_id)),
cnt AS (SELECT s.query_id, s.doc_id, s.i,
               count(DISTINCT m.term)::BIGINT AS n_distinct,
               count(m.j)::BIGINT AS n_match
        FROM starts s LEFT JOIN m ON m.query_id = s.query_id AND m.doc_id = s.doc_id
                                 AND m.j BETWEEN s.i AND s.i + {w} - 1
        GROUP BY s.query_id, s.doc_id, s.i),
cnta AS (SELECT c.*, coalesce(f.sstart, 1)::BIGINT AS aligned
         FROM cnt c LEFT JOIN flag f ON f.doc_id = c.doc_id AND f.j = c.i),
best AS (SELECT query_id, doc_id, i, n_distinct, n_match, aligned,
                row_number() OVER (PARTITION BY query_id, doc_id
                                   ORDER BY n_distinct DESC, n_match DESC,
                                            aligned DESC, i ASC) AS rn
         FROM cnta)
SELECT b.query_id, b.doc_id, b.i::BIGINT AS start, b.n_distinct, b.n_match,
       b.aligned,
       array_to_string(d.toks[b.i : b.i + {w} - 1], ' ') AS snippet
FROM best b JOIN dt d USING (doc_id) WHERE b.rn = 1"""


def _bm25f_sql(combine: str = "sum(score)") -> str:
    """Fielded-BM25 oracle: per-field (body=all tokens, title=first N tokens)
    tf/df/doclen/avgdl, per-field Okapi score weighted and combined per
    (query, doc) by ``combine`` (sum for q_bm25f_topk, max+tie for
    q_dismax_topk), ranked with the engine's (score desc, doc_id asc)
    tie-break. Mirrors the Ray side exactly (round4 both sides)."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    n = FIELD_TITLE_NTOK
    w_text, w_title = FIELD_WEIGHTS["text"], FIELD_WEIGHTS["title"]

    def field_score(tag: str, w: float) -> str:
        return f"""s_{tag} AS (
  SELECT q.query_id, tf.doc_id,
         {w} * sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf_{tag} tf USING (term)
  JOIN (SELECT term, count(*)::DOUBLE AS df FROM tf_{tag} GROUP BY term) df USING (term)
  JOIN dl_{tag} dl ON dl.doc_id = tf.doc_id
  CROSS JOIN (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl_{tag}) s
  GROUP BY q.query_id, tf.doc_id
)"""

    return f"""
WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS toks
            FROM documents),
q(query_id, term, qtf) AS (VALUES
    {vals}
),
tf_body AS (SELECT doc_id, term, count(*)::BIGINT AS tf
            FROM (SELECT doc_id, unnest(toks) AS term FROM tl) GROUP BY doc_id, term),
tf_title AS (SELECT doc_id, term, count(*)::BIGINT AS tf
             FROM (SELECT doc_id, unnest(toks[1:{n}]) AS term FROM tl) GROUP BY doc_id, term),
dl_body AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM tl),
dl_title AS (SELECT doc_id, least(len(toks), {n})::DOUBLE AS dl FROM tl),
{field_score('body', w_text)},
{field_score('title', w_title)},
scores AS (
  SELECT query_id, doc_id, {combine} AS score
  FROM (SELECT * FROM s_body UNION ALL SELECT * FROM s_title)
  GROUP BY query_id, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}
"""


def _cross_fields_sql() -> str:
    """cross_fields oracle: per-field tf components from the same derived
    title/body CTEs, max per (query, term, doc), blended idf from
    greatest(df_body, df_title)."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    n = FIELD_TITLE_NTOK
    w_text, w_title = FIELD_WEIGHTS["text"], FIELD_WEIGHTS["title"]

    def field_contrib(tag: str, w: float) -> str:
        # parenthesized to the ENGINE's float op order (weights[f] *
        # tf_component): ties among equal-scoring docs must agree bit-wise
        # or ranks flip under the shared (score desc, doc_id asc) contract
        return f"""c_{tag} AS (
  SELECT q.query_id, q.term, tf.doc_id,
         {w} * (tf.tf * ({K1} + 1)
         / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))) AS c
  FROM q
  JOIN tf_{tag} tf USING (term)
  JOIN dl_{tag} dl ON dl.doc_id = tf.doc_id
  CROSS JOIN (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl_{tag}) s
)"""

    return f"""
WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS toks
            FROM documents),
q(query_id, term, qtf) AS (VALUES
    {vals}
),
tf_body AS (SELECT doc_id, term, count(*)::BIGINT AS tf
            FROM (SELECT doc_id, unnest(toks) AS term FROM tl) GROUP BY doc_id, term),
tf_title AS (SELECT doc_id, term, count(*)::BIGINT AS tf
             FROM (SELECT doc_id, unnest(toks[1:{n}]) AS term FROM tl) GROUP BY doc_id, term),
dl_body AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM tl),
dl_title AS (SELECT doc_id, least(len(toks), {n})::DOUBLE AS dl FROM tl),
{field_contrib('body', w_text)},
{field_contrib('title', w_title)},
best AS (SELECT query_id, term, doc_id, max(c) AS c
         FROM (SELECT * FROM c_body UNION ALL SELECT * FROM c_title)
         GROUP BY query_id, term, doc_id),
dfb AS (SELECT term, greatest(
           coalesce((SELECT count(*) FROM tf_body b WHERE b.term = d.term), 0),
           coalesce((SELECT count(*) FROM tf_title t WHERE t.term = d.term), 0)
        )::DOUBLE AS df
        FROM (SELECT DISTINCT term FROM q) d),
stats AS (SELECT count(*)::DOUBLE AS n FROM dl_body),
scores AS (
  SELECT b.query_id, b.doc_id,
         sum( (ln(1 + (s.n - dfb.df + 0.5) / (dfb.df + 0.5)) * q.qtf) * b.c ) AS score
  FROM best b
  JOIN q ON q.query_id = b.query_id AND q.term = b.term
  JOIN dfb ON dfb.term = b.term
  CROSS JOIN stats s
  WHERE dfb.df > 0
  GROUP BY b.query_id, b.doc_id
)
SELECT query_id, doc_id, {_round4_sql('score')} AS score_r
FROM scores WHERE score > 0
"""


def _dismax_sql() -> str:
    """DisjunctionMax oracle: per-field scores from the same CTEs, combined
    as max + tie·(sum − max) per (query, doc)."""
    return _bm25f_sql(
        f"max(score) + {DISMAX_TIE} * (sum(score) - max(score))"
    )


def _bm25f_true_sql() -> str:
    """True-BM25F oracle: fold w_f·tf/B_f across fields into tfa per
    (doc, term) BEFORE saturation, idf over the document-level union df
    (term appears in ANY field). Mirrors q_bm25f_true_topk (round4 both
    sides; sum order differs, absorbed by the rounding like every other
    float oracle here)."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    n = FIELD_TITLE_NTOK
    w_text, w_title = FIELD_WEIGHTS["text"], FIELD_WEIGHTS["title"]
    return f"""
WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS toks
            FROM documents),
q(query_id, term, qtf) AS (VALUES
    {vals}
),
tf_body AS (SELECT doc_id, term, count(*)::BIGINT AS tf
            FROM (SELECT doc_id, unnest(toks) AS term FROM tl) GROUP BY doc_id, term),
tf_title AS (SELECT doc_id, term, count(*)::BIGINT AS tf
             FROM (SELECT doc_id, unnest(toks[1:{n}]) AS term FROM tl) GROUP BY doc_id, term),
dl_body AS (SELECT doc_id, len(toks)::DOUBLE AS dl FROM tl),
dl_title AS (SELECT doc_id, least(len(toks), {n})::DOUBLE AS dl FROM tl),
df_u AS (
  SELECT term, count(*)::DOUBLE AS df
  FROM (SELECT term, doc_id FROM tf_body UNION SELECT term, doc_id FROM tf_title)
  GROUP BY term
),
tfa AS (
  SELECT doc_id, term, sum(contrib) AS tfa
  FROM (
    SELECT tf.doc_id, tf.term,
           {w_text} * tf.tf / (1 - {B} + {B} * dl.dl / s.avgdl) AS contrib
    FROM tf_body tf JOIN dl_body dl USING (doc_id)
    CROSS JOIN (SELECT avg(dl) AS avgdl FROM dl_body) s
    UNION ALL
    SELECT tf.doc_id, tf.term,
           {w_title} * tf.tf / (1 - {B} + {B} * dl.dl / s.avgdl) AS contrib
    FROM tf_title tf JOIN dl_title dl USING (doc_id)
    CROSS JOIN (SELECT avg(dl) AS avgdl FROM dl_title) s
  )
  GROUP BY doc_id, term
),
scores AS (
  SELECT q.query_id, t.doc_id,
         sum( q.qtf * ln(1 + (s.n - du.df + 0.5) / (du.df + 0.5))
              * ({K1} + 1) * t.tfa / ({K1} + t.tfa) ) AS score
  FROM q
  JOIN tfa t USING (term)
  JOIN df_u du USING (term)
  CROSS JOIN (SELECT count(*)::DOUBLE AS n FROM dl_body) s
  GROUP BY q.query_id, t.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}
"""


def _qvalues_sql() -> str:
    """VALUES list (query_id, q_text) for the fixed query set."""
    vals = ",\n    ".join(f"({qid}, '{text}')" for qid, text in BM25_QUERIES)
    return f"qv(query_id, q_text) AS (VALUES\n    {vals}\n)"


def _qterm_values_sql() -> str:
    """VALUES list of DISTINCT (query_id, term)."""
    vals = ",\n    ".join(
        f"({qid}, '{t}')"
        for qid, text in BM25_QUERIES
        for t in sorted(term_counts(text))
    )
    return f"qterm(query_id, term) AS (VALUES\n    {vals}\n)"


# Quantized-impact CTE body (shared by quantized_export and the pruning
# oracles). Appends to _TF; exposes `imp(doc_id, term, impact_q)`.
_IMP = f""",
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
imp AS (
  SELECT tf.doc_id, tf.term,
         floor( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                * tf.tf * ({K1} + 1)
                / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))
                * 100 + 0.5 )::BIGINT AS impact_q
  FROM tf
  JOIN (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term) df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
)"""


def _decontam_sql() -> str:
    """Eval-overlap decontamination mirror: k-grams via list slicing over
    the tokenized text (DuckDB list slices are 1-based inclusive, so
    ``t[i:i+k-1]`` is a k-token window), distinct eval grams, left join."""
    k1 = DECONTAM_K - 1
    m = DECONTAM_MOD
    return f"""
WITH tl AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t FROM documents),
gi AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t)-{k1},0))) AS i FROM tl),
g AS (SELECT doc_id, array_to_string(t[i:i+{k1}], ' ') AS gram FROM gi),
eg AS (SELECT DISTINCT gram FROM g WHERE doc_id % {m} = 0),
cnt AS (SELECT g.doc_id, count(*)::BIGINT AS n_grams,
               sum(CASE WHEN eg.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_contaminated
        FROM g LEFT JOIN eg ON g.gram = eg.gram
        WHERE g.doc_id % {m} != 0 GROUP BY g.doc_id)
SELECT tl.doc_id,
       coalesce(cnt.n_grams, 0)::BIGINT AS n_grams,
       coalesce(cnt.n_contaminated, 0)::BIGINT AS n_contaminated,
       coalesce(cnt.n_contaminated, 0) > 0 AS contaminated
FROM tl LEFT JOIN cnt USING (doc_id)
WHERE tl.doc_id % {m} != 0"""


def _unit_dedup_sql() -> str:
    """unit_dedup mirror: sentence split + token-join normalization (the
    sentence-snippet oracle's proven idiom), corpus-wide unit counts by
    STRING (engine keys are injective sha256 of the same strings),
    per-doc totals with zero rows for unit-less docs."""
    from splade_ray.snippets import SENT_SPLIT_SQL

    return f"""
WITH s AS (SELECT doc_id,
                  unnest(regexp_split_to_array(lower(text),
                                               '{SENT_SPLIT_SQL}')) AS chunk
           FROM documents),
u0 AS (SELECT doc_id,
              array_to_string(regexp_extract_all(chunk, '{TOKEN_SQL}'), ' ')
                  AS unit
       FROM s),
uu AS (SELECT doc_id, unit FROM u0 WHERE unit <> ''),
c AS (SELECT unit, count(*)::BIGINT AS n FROM uu GROUP BY unit),
j AS (SELECT uu.doc_id,
             CASE WHEN c.n >= {UNIT_MIN} THEN 1 ELSE 0 END AS isdup
      FROM uu JOIN c USING (unit)),
per AS (SELECT doc_id, count(*)::BIGINT AS n_units,
               sum(isdup)::BIGINT AS n_dup
        FROM j GROUP BY doc_id)
SELECT d.doc_id, coalesce(per.n_units, 0)::BIGINT AS n_units,
       coalesce(per.n_dup, 0)::BIGINT AS n_dup_units
FROM documents d LEFT JOIN per USING (doc_id)"""


def _url_normalize_sql() -> str:
    from splade_ray.ops.urlnorm import url_norm_sql

    return f"""
SELECT doc_id, {url_norm_sql(_SYNTH_URL_SQL)} AS url_norm FROM documents"""


def _url_dedup_sql() -> str:
    from splade_ray.ops.urlnorm import url_norm_sql

    return f"""
WITH n AS (SELECT doc_id, {url_norm_sql(_SYNTH_URL_SQL)} AS url_norm
           FROM documents)
SELECT min(doc_id)::BIGINT AS doc_id, url_norm, count(*)::BIGINT AS n_copies
FROM n GROUP BY url_norm"""


def _dup_spans_sql() -> str:
    """Mirror of ops.curation.duplicated_spans: gram hashes are the same FNV
    fold over sha256-prefix token hashes as the repetition/fingerprint
    oracles; duplicated grams by total occurrence count (within-doc repeats
    included); coverage = distinct positions under any duplicated window;
    spans via gaps-and-islands (p - row_number)."""
    p = 1099511628211
    k = DUP_K
    fold = _fold_sql([f"h[i+{j}]" for j in range(k)], p)
    return f"""
WITH {_token_hashes_cte()},
gi AS (SELECT doc_id, h, unnest(generate_series(1, greatest(len(h) - {k - 1}, 0))) AS i
       FROM hs),
g AS (SELECT doc_id, i, {fold} AS g FROM gi),
gc AS (SELECT g, count(*)::BIGINT AS c FROM g GROUP BY g),
dg AS (SELECT g.doc_id, g.i FROM g JOIN gc USING (g) WHERE gc.c >= {DUP_MIN}),
cov AS (SELECT DISTINCT dg.doc_id, dg.i + r.range AS p FROM dg CROSS JOIN range({k}) r),
isl AS (SELECT doc_id, p,
               p - row_number() OVER (PARTITION BY doc_id ORDER BY p) AS grp
        FROM cov),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_dup_tokens,
               count(DISTINCT grp)::BIGINT AS n_spans
        FROM isl GROUP BY doc_id),
dgc AS (SELECT doc_id, count(*)::BIGINT AS n_dup_grams FROM dg GROUP BY doc_id),
nt AS (SELECT doc_id, len(h)::BIGINT AS n_tokens FROM hs)
SELECT nt.doc_id, nt.n_tokens,
       coalesce(dgc.n_dup_grams, 0)::BIGINT AS n_dup_grams,
       coalesce(agg.n_dup_tokens, 0)::BIGINT AS n_dup_tokens,
       coalesce(agg.n_spans, 0)::BIGINT AS n_spans
FROM nt LEFT JOIN agg USING (doc_id) LEFT JOIN dgc USING (doc_id)"""


def _pack_assign_sql() -> str:
    return f"""
WITH tc AS (SELECT doc_id,
                   len(regexp_extract_all(lower(text), '{TOKEN_SQL}'))::BIGINT AS n_tokens
            FROM documents)
SELECT doc_id, n_tokens,
       ((sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - n_tokens) // {PACK_BUDGET})::BIGINT AS pack_id
FROM tc"""


def _redact_sql() -> str:
    """Chained regexp_replace mirror of redact_batch: one CTE per label in
    sorted order, each counting on — and rewriting — the previous stage's
    text."""
    labels = sorted(REDACT_PATTERNS)
    ctes, carried = ["s0 AS (SELECT doc_id, text AS t FROM documents)"], []
    for i, label in enumerate(labels):
        pat = REDACT_PATTERNS[label]
        prev = ", ".join(carried)
        prev = prev + ", " if prev else ""
        ctes.append(
            f"s{i+1} AS (SELECT doc_id, {prev}"
            f"len(regexp_extract_all(t, '{pat}'))::BIGINT AS n_{label}, "
            f"regexp_replace(t, '{pat}', '<{label.upper()}>', 'g') AS t FROM s{i})"
        )
        carried.append(f"n_{label}")
    cols = ", ".join(f"n_{l}" for l in labels)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT doc_id, {cols}, t AS text_redacted FROM s{len(labels)}"
    )


def _range_topk_sql() -> str:
    """Range-filtered BM25 mirror: the shared bm25 `ranked` CTE (scores over
    the FULL corpus stats — the filter never changes df/avgdl/N, matching
    Lucene FILTER-clause semantics), restricted to docs in the n_chars range,
    then re-ranked."""
    return f"""{_bm25_cte()},
f AS (SELECT r.query_id, r.doc_id, r.score
      FROM ranked r JOIN documents d USING (doc_id)
      WHERE d.n_chars BETWEEN {DV_LO} AND {DV_HI}),
rr AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
       FROM f)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


def _phrase_branch_sql(pid: int, toks: tuple) -> str:
    """One UNION ALL branch of a phrase-count CTE over token arrays (the
    _phrase_cte sliding window, parameterized by phrase)."""
    k = len(toks)
    if k == 1:
        expr = f"len(list_filter(t, x -> x = '{toks[0]}'))"
        guard = "len(t) >= 1"
    else:
        conds = " AND ".join(
            f"t[i+{j}] = '{w}'" if j else f"t[i] = '{w}'"
            for j, w in enumerate(toks)
        )
        expr = f"len(list_filter(range(1, len(t) - {k - 2}), i -> {conds}))"
        guard = f"len(t) >= {k}"
    return (f"SELECT {pid} AS phrase_id, doc_id, ({expr})::BIGINT AS phrase_count\n"
            f"  FROM ta WHERE {guard}")


def _query_string_sql() -> str:
    """query_string mirror, generated from the SAME parse
    (qparser.parse_query_string over QS_QUERIES): term-part bm25 + phrase
    virtual-term bm25 full-outer-joined, must/must_not masks over both
    clause kinds via NOT EXISTS."""
    from splade_ray.qparser import _all_phrases, parse_query_string

    specs = {qid: parse_query_string(qs) for qid, qs in QS_QUERIES}
    phrases = _all_phrases(specs)
    phrase_ord = {ph: i for i, ph in enumerate(phrases)}

    qv, qpv, mtv, mnv, mpv, npv = [], [], [], [], [], []
    for qid, s in specs.items():
        for t, qtf in sorted((s.must + s.should).items()):
            qv.append(f"({qid}, '{t}', {qtf})")
        for ph in sorted({phrase_ord[p] for p in (*s.must_phrases,
                                                  *s.should_phrases)}):
            qpv.append(f"({qid}, {ph})")
        for t in sorted(s.must):
            mtv.append(f"({qid}, '{t}')")
        for t in sorted(s.must_not):
            mnv.append(f"({qid}, '{t}')")
        for p in s.must_phrases:
            mpv.append(f"({qid}, {phrase_ord[p]})")
        for p in s.not_phrases:
            npv.append(f"({qid}, {phrase_ord[p]})")

    sep = ",\n    "

    def cte(name: str, cols: str, vals: list[str], empty_types: str) -> str:
        if vals:
            return f"{name}({cols}) AS (VALUES\n    {sep.join(vals)}\n)"
        return f"{name}({cols}) AS (SELECT {empty_types} WHERE false)"

    branches = "\n  UNION ALL\n".join(
        _phrase_branch_sql(phrase_ord[ph], ph) for ph in phrases
    )
    return f"""
WITH {_TF},
ta AS (SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_SQL}') AS t
       FROM documents),
p AS (
{branches}
),
{cte('q', 'query_id, term, qtf', qv, "NULL::BIGINT, NULL::VARCHAR, NULL::BIGINT")},
{cte('qp', 'query_id, phrase_id', qpv, "NULL::BIGINT, NULL::BIGINT")},
{cte('mt', 'query_id, term', mtv, "NULL::BIGINT, NULL::VARCHAR")},
{cte('mn', 'query_id, term', mnv, "NULL::BIGINT, NULL::VARCHAR")},
{cte('mp', 'query_id, phrase_id', mpv, "NULL::BIGINT, NULL::BIGINT")},
{cte('npx', 'query_id, phrase_id', npv, "NULL::BIGINT, NULL::BIGINT")},
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
ts AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q JOIN tf USING (term) JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
pm AS (SELECT phrase_id, doc_id, phrase_count FROM p WHERE phrase_count > 0),
pdf AS (SELECT phrase_id, count(*)::DOUBLE AS df FROM pm GROUP BY phrase_id),
ps AS (
  SELECT qp.query_id, pm.doc_id,
         sum( ln(1 + (s.n - pdf.df + 0.5) / (pdf.df + 0.5))
              * pm.phrase_count * ({K1} + 1)
              / (pm.phrase_count + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM qp JOIN pm USING (phrase_id) JOIN pdf USING (phrase_id)
  JOIN dl ON dl.doc_id = pm.doc_id CROSS JOIN stats s
  GROUP BY qp.query_id, pm.doc_id
),
comb AS (
  SELECT coalesce(ts.query_id, ps.query_id) AS query_id,
         coalesce(ts.doc_id, ps.doc_id) AS doc_id,
         coalesce(ts.score, 0) + coalesce(ps.score, 0) AS score
  FROM ts FULL OUTER JOIN ps
    ON ts.query_id = ps.query_id AND ts.doc_id = ps.doc_id
),
qual AS (
  SELECT c.query_id, c.doc_id, c.score FROM comb c
  WHERE c.score > 0
    AND NOT EXISTS (
      SELECT 1 FROM mt
      WHERE mt.query_id = c.query_id
        AND NOT EXISTS (SELECT 1 FROM tf
                        WHERE tf.doc_id = c.doc_id AND tf.term = mt.term))
    AND NOT EXISTS (
      SELECT 1 FROM mp
      WHERE mp.query_id = c.query_id
        AND NOT EXISTS (SELECT 1 FROM pm
                        WHERE pm.doc_id = c.doc_id
                          AND pm.phrase_id = mp.phrase_id))
    AND NOT EXISTS (
      SELECT 1 FROM mn JOIN tf ON tf.term = mn.term AND tf.doc_id = c.doc_id
      WHERE mn.query_id = c.query_id)
    AND NOT EXISTS (
      SELECT 1 FROM npx JOIN pm ON pm.phrase_id = npx.phrase_id
                               AND pm.doc_id = c.doc_id
      WHERE npx.query_id = c.query_id)
),
rr AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
       FROM qual)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


def _block_join_sql(score_mode: str) -> str:
    """Block-join mirror: matching children (score > 0) from the shared
    bm25 `scores` CTE, grouped to their `source` parent with the mode's
    aggregate, ranked (score desc, parent asc)."""
    agg = {"max": "max(score)", "sum": "sum(score)", "min": "min(score)",
           "avg": "sum(score) / count(*)",
           "count": "count(*)::DOUBLE"}[score_mode]
    return f"""{_bm25_cte()},
ch AS (SELECT s.query_id, d.source AS parent, s.score
       FROM scores s JOIN documents d USING (doc_id) WHERE s.score > 0),
agg AS (SELECT query_id, parent, {agg} AS score, count(*) AS n_children
        FROM ch GROUP BY query_id, parent),
rr AS (SELECT query_id, parent, score, n_children,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('score')} DESC,
                                          parent ASC) AS rank
       FROM agg)
SELECT query_id, rank::BIGINT AS rank, parent, {_round4_sql('score')} AS score_r,
       n_children
FROM rr WHERE rank <= {TOP_K}"""


def _composite_agg_sql(page: int) -> str:
    """Composite-agg mirror: matched docs × documents grouped by
    (lang, source), ascending bucket order, page-sized row_number window."""
    lo = (page - 1) * COMPOSITE_SIZE + 1
    hi = page * COMPOSITE_SIZE
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},
b AS (SELECT m.query_id, d.lang, d.source, count(*) AS n_docs
      FROM m JOIN documents d USING (doc_id)
      GROUP BY m.query_id, d.lang, d.source),
rr AS (SELECT query_id, lang, source, n_docs,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY lang ASC, source ASC) AS rn
       FROM b)
SELECT query_id, lang, source, n_docs
FROM rr WHERE rn BETWEEN {lo} AND {hi}
ORDER BY query_id, lang, source"""


def _rank_feature_sql(feats=None) -> str:
    """rank_feature mirror, generated from the spec list (default
    RANK_FEATURES): matching docs (base score > 0) get the summed
    closed-form bonuses added; term order matches the engine's clause-order
    accumulation."""
    col = "d.n_chars"
    terms = []
    for rf in (RANK_FEATURES if feats is None else feats):
        boost = float(rf.get("boost", 1.0))
        (kind, spec), = rf["function"].items()
        if kind == "saturation":
            e = f"({col} / ({col} + {spec['pivot']!r}))"
        elif kind == "log":
            e = f"ln({spec['scaling_factor']!r} + {col})"
        elif kind == "sigmoid":
            p, ex = float(spec["pivot"]), float(spec["exponent"])
            e = f"(pow({col}, {ex!r}) / (pow({col}, {ex!r}) + pow({p!r}, {ex!r})))"
        elif kind == "distance":
            o, p = float(spec["origin"]), float(spec["pivot"])
            e = f"({p!r} / ({p!r} + abs({col} - {o!r})))"
        else:  # linear
            e = f"{col}"
        terms.append(f"{boost!r} * {e}")
    bonus = " + ".join(terms)
    return f"""{_bm25_cte()},
fs AS (SELECT s.query_id, s.doc_id, s.score + ({bonus}) AS score
       FROM scores s JOIN documents d USING (doc_id) WHERE s.score > 0),
rr AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
       FROM fs)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


def _function_score_sql() -> str:
    """function_score mirror, generated from FSCORE_FUNCTIONS so spec and
    SQL cannot drift: fscore = base bm25 score × (m1 × m2 × ...) with each
    multiplier's closed form inlined (constants computed with the same
    IEEE-double Python/numpy ops as the kernel; multiplication order matches
    the engine's left-to-right accumulation)."""
    import math

    col = "d.n_chars"
    exprs = []
    for f in FSCORE_FUNCTIONS:
        (kind, spec), = f.items()
        if kind == "field_value_factor":
            x = f"({spec['factor']!r} * {col})"
            mod = spec.get("modifier", "none")
            exprs.append({"none": x, "log1p": f"ln(1 + {x})",
                          "sqrt": f"sqrt({x})"}[mod])
            continue
        origin, scale = spec["origin"], spec["scale"]
        offset, decay = spec.get("offset", 0.0), spec.get("decay", 0.5)
        d = f"greatest(0, abs({col} - {origin!r}) - {offset!r})"
        if kind == "gauss":
            sigma2 = -(scale * scale) / (2.0 * math.log(decay))
            exprs.append(f"exp(-({d} * {d}) / (2 * {sigma2!r}))")
        elif kind == "exp":
            lam = math.log(decay) / scale
            exprs.append(f"exp({lam!r} * {d})")
        else:  # linear
            s = scale / (1.0 - decay)
            exprs.append(f"greatest(0, ({s!r} - {d}) / {s!r})")
    mult = " * ".join(exprs)
    return f"""{_bm25_cte()},
fs AS (SELECT s.query_id, s.doc_id, s.score * ({mult}) AS score
       FROM scores s JOIN documents d USING (doc_id)),
rr AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
       FROM fs WHERE score > 0)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


_MATCHED = """
m AS (SELECT DISTINCT q.query_id, tf.doc_id FROM qterm q JOIN tf USING (term))"""


def _geo_distance_sql() -> str:
    """geo_distance mirror: matched docs joined to the derived coords,
    haversine (same formula/constant as geo.haversine_m) rounded at the
    engine's round4 contract, radius filter, (distance asc, doc_id asc)
    ranks capped at TOP_K."""
    from splade_ray.geo import haversine_sql

    dr = _round4_sql(haversine_sql("c.lat", "c.lon", GEO_ORIGIN))
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},{_GEO_COORDS_SQL},
f AS (SELECT m.query_id, m.doc_id, {dr} AS distance_r
      FROM m JOIN coords c USING (doc_id))
SELECT query_id::BIGINT AS query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY distance_r ASC, doc_id ASC)::BIGINT AS rank,
       doc_id, distance_r
FROM f WHERE distance_r <= {GEO_RADIUS_M}
QUALIFY rank <= {TOP_K}"""


def _geo_bbox_sql() -> str:
    """geo_bounding_box mirror: matched docs inside the closed box,
    constant score, doc_id-asc ranks capped at GEO_BBOX_K."""
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},{_GEO_COORDS_SQL},
f AS (SELECT m.query_id, m.doc_id
      FROM m JOIN coords c USING (doc_id)
      WHERE c.lat BETWEEN {GEO_LAT_RANGE[0]} AND {GEO_LAT_RANGE[1]}
        AND c.lon BETWEEN {GEO_LON_RANGE[0]} AND {GEO_LON_RANGE[1]})
SELECT query_id::BIGINT AS query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY doc_id ASC)::BIGINT AS rank,
       doc_id, 1.0::DOUBLE AS score
FROM f QUALIFY rank <= {GEO_BBOX_K}"""


def _geotile_grid_sql() -> str:
    """geotile_grid mirror: web-mercator tile of each matched doc's coords
    (geo.geotile_sql — asinh spelled via ln), exact per-tile counts, top
    GEO_GRID_SIZE tiles by (n_docs desc, x asc, y asc)."""
    from splade_ray.geo import geotile_sql

    x, y = geotile_sql("c.lat", "c.lon", GEO_ZOOM)
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},{_GEO_COORDS_SQL},
f AS (SELECT m.query_id, {x} AS x, {y} AS y
      FROM m JOIN coords c USING (doc_id)),
g AS (SELECT query_id, x, y, count(*)::BIGINT AS n_docs
      FROM f GROUP BY 1, 2, 3)
SELECT query_id::BIGINT AS query_id, {GEO_ZOOM}::BIGINT AS zoom, x, y, n_docs
FROM g
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY n_docs DESC, x ASC, y ASC)
        <= {GEO_GRID_SIZE}"""


def _sort_by_field_sql() -> str:
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED}
SELECT query_id, rank::BIGINT AS rank, doc_id, n_chars::BIGINT AS sort_value
FROM (SELECT m.query_id, m.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY m.query_id
                                ORDER BY d.n_chars DESC, m.doc_id ASC) AS rank
      FROM m JOIN documents d USING (doc_id))
WHERE rank <= {TOP_K}"""


def _range_topk_str_sql() -> str:
    """String TermRangeQuery mirror: the shared bm25 `ranked` CTE restricted
    to docs whose `source` lies in the lexicographic range (DuckDB default
    binary collation = the engine's codepoint order), then re-ranked."""
    return f"""{_bm25_cte()},
f AS (SELECT r.query_id, r.doc_id, r.score
      FROM ranked r JOIN documents d USING (doc_id)
      WHERE d.source >= '{STR_RANGE_LO}' AND d.source <= '{STR_RANGE_HI}'),
rr AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
       FROM f)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


def _sort_multi_sql() -> str:
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED}
SELECT query_id, rank::BIGINT AS rank, doc_id, lang, n_chars::BIGINT AS n_chars
FROM (SELECT m.query_id, m.doc_id, d.lang, d.n_chars,
             row_number() OVER (PARTITION BY m.query_id
                                ORDER BY d.lang ASC, d.n_chars DESC,
                                         m.doc_id ASC) AS rank
      FROM m JOIN documents d USING (doc_id))
WHERE rank <= {TOP_K}"""


def _match_counts_sql() -> str:
    qids = ", ".join(f"({qid})" for qid, _ in BM25_QUERIES)
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},
ql(query_id) AS (VALUES {qids})
SELECT ql.query_id::BIGINT AS query_id, coalesce(c.n, 0)::BIGINT AS n_docs
FROM ql LEFT JOIN (SELECT query_id, count(*)::BIGINT AS n FROM m GROUP BY query_id) c
USING (query_id)"""


def _match_stats_sql() -> str:
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED}
SELECT m.query_id, count(*)::BIGINT AS n_docs,
       sum(d.n_chars)::BIGINT AS sum_value,
       min(d.n_chars)::BIGINT AS min_value,
       max(d.n_chars)::BIGINT AS max_value
FROM m JOIN documents d USING (doc_id)
GROUP BY m.query_id"""


def _match_extended_stats_sql() -> str:
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED}
SELECT m.query_id, count(*)::BIGINT AS n_docs,
       sum(d.n_chars)::BIGINT AS sum_value,
       min(d.n_chars)::BIGINT AS min_value,
       max(d.n_chars)::BIGINT AS max_value,
       sum(d.n_chars * d.n_chars)::BIGINT AS sum_sq
FROM m JOIN documents d USING (doc_id)
GROUP BY m.query_id"""


def _match_histogram_sql() -> str:
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED}
SELECT m.query_id, (d.n_chars // {HIST_INTERVAL}) * {HIST_INTERVAL} AS bucket,
       count(*)::BIGINT AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY 1, 2"""


def _ids_sql() -> str:
    """ids-query mirror: the requested (query, id) pairs semi-joined against
    the corpus (missing ids drop), constant score, doc_id-ascending ranks."""
    vals = ", ".join(
        f"({qid}, {d})" for qid in sorted(IDS_SETS) for d in IDS_SETS[qid]
    )
    return f"""
WITH iv(query_id, doc_id) AS (VALUES {vals}),
f AS (SELECT DISTINCT iv.query_id, iv.doc_id
      FROM iv JOIN documents d USING (doc_id))
SELECT query_id::BIGINT AS query_id,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY doc_id ASC)::BIGINT AS rank,
       doc_id, 1.0::DOUBLE AS score
FROM f"""


def _terms_lookup_sql() -> str:
    """terms-lookup mirror: the per-query value sets expanded from the
    literal lookup rows (empty/missing rows contribute nothing), joined
    against documents on source, constant score, doc_id-ascending ranks
    capped at TL_TOP_K."""
    by_lid = {r[0]: r[1] for r in TL_ROWS}
    vals = ", ".join(
        f"({qid}, '{s}')"
        for qid, lid in sorted(TL_LOOKUPS.items())
        for s in by_lid.get(lid, ())
    )
    return f"""
WITH v(query_id, source) AS (VALUES {vals}),
f AS (SELECT v.query_id, d.doc_id FROM v JOIN documents d USING (source)),
r AS (SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY doc_id ASC) AS rank
      FROM f)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id,
       1.0::DOUBLE AS score
FROM r WHERE rank <= {TL_TOP_K}"""


def _pinned_sql() -> str:
    """pinned-query mirror: existing pinned ids first (given order, score
    0.0), then the shared bm25 ranking minus the pinned set, one continuous
    row_number per query capped at TOP_K."""
    vals = ", ".join(
        f"({qid}, {d}, {i})"
        for qid in sorted(PINNED_SETS)
        for i, d in enumerate(PINNED_SETS[qid], start=1)
    )
    return f"""{_bm25_cte()},
pv(query_id, doc_id, ord) AS (VALUES {vals}),
pins AS (SELECT pv.query_id, pv.doc_id, pv.ord
         FROM pv JOIN documents d USING (doc_id)),
org AS (SELECT r.query_id, r.doc_id, r.score FROM ranked r
        WHERE NOT EXISTS (SELECT 1 FROM pins p
                          WHERE p.query_id = r.query_id
                            AND p.doc_id = r.doc_id)),
u AS (SELECT query_id, doc_id, 1 AS is_pinned, 0.0 AS score, ord FROM pins
      UNION ALL
      SELECT query_id, doc_id, 0, score, 1000000000 FROM org),
rr AS (SELECT query_id, doc_id, is_pinned, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY is_pinned DESC, ord ASC,
                                          {_round4_sql('score')} DESC, doc_id ASC) AS rank
       FROM u)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank, doc_id,
       is_pinned::BIGINT AS is_pinned, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


def _exists_sql() -> str:
    """exists-filter mirror: the shared bm25 ranking restricted to docs
    whose url sidecar is non-null (null iff doc_id % 3 == 0 by the _dv5
    fixture construction), then re-ranked."""
    return f"""{_bm25_cte()},
f AS (SELECT r.query_id, r.doc_id, r.score FROM ranked r
      WHERE r.doc_id % 3 != 0),
rr AS (SELECT query_id, doc_id, score,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
       FROM f)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM rr WHERE rank <= {TOP_K}"""


def _match_bool_prefix_sql() -> str:
    """match_bool_prefix mirror: fixed terms with their query tf UNION the
    capped ascending LIKE-expansion of the last token (qtf=1 each), qtf
    merged by sum, then the standard BM25 body."""
    fixed_vals, pq_vals = [], []
    for qid, text in MBP_QUERIES:
        toks = text.split()
        pq_vals.append(f"({qid}, '{toks[-1]}')")
        for term, qtf in sorted(term_counts(" ".join(toks[:-1])).items()):
            fixed_vals.append(f"({qid}, '{term}', {qtf})")
    fv = ",\n    ".join(fixed_vals)
    pv = ", ".join(pq_vals)
    return f"""
WITH {_TF},
fixed(query_id, term, qtf) AS (VALUES
    {fv}
),
pq(query_id, p) AS (VALUES {pv}),
exp AS (SELECT pq.query_id, l.term, 1 AS qtf
        FROM pq JOIN (SELECT DISTINCT term FROM tf) l
          ON l.term LIKE pq.p || '%'
        QUALIFY row_number() OVER (PARTITION BY pq.query_id ORDER BY l.term)
                <= {MBP_MAX_TERMS}),
q AS (SELECT query_id, term, sum(qtf)::DOUBLE AS qtf
      FROM (SELECT * FROM fixed UNION ALL SELECT * FROM exp)
      GROUP BY 1, 2),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _suggest_complete_sql() -> str:
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in COMPLETE_QUERIES)
    return f"""
WITH {_TF},
pq(query_id, p) AS (VALUES {vals}),
dfv AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY term),
e AS (SELECT pq.query_id, dfv.term, dfv.df,
             row_number() OVER (PARTITION BY pq.query_id
                                ORDER BY dfv.df DESC, dfv.term ASC) AS sugg_rank
      FROM pq JOIN dfv ON dfv.term LIKE pq.p || '%')
SELECT query_id::BIGINT AS query_id, sugg_rank::BIGINT AS sugg_rank, term, df
FROM e WHERE sugg_rank <= {COMPLETE_M}"""


def _routed_sql() -> str:
    """Routed-search mirror: the probed bucket set is computed from
    ROUTING_VALUES with the same sha256-prefix hash the engine uses, the
    corpus restricted to docs whose `source` hashes into it, then the full
    BM25 body over that subcorpus (probed-scope stats — the search_multi
    union contract)."""
    from splade_ray.routing import bucket_sql_expr, routing_bucket

    probed = sorted(set(routing_bucket(ROUTING_VALUES, ROUTING_NB).tolist()))
    bl = ", ".join(str(b) for b in probed)
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            values.append(f"({qid}, '{term}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH docs AS (SELECT * FROM documents
              WHERE {bucket_sql_expr('source', ROUTING_NB)} IN ({bl})),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '{TOKEN_SQL}')) AS term
  FROM docs
),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),
q(query_id, term, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM docs d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5)) * q.qtf
              * tf.tf * ({K1} + 1)
              / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM q
  JOIN tf USING (term)
  JOIN df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _filters_agg_sql() -> str:
    """filters-agg mirror: conditional counts per query unpivoted to
    (query_id, filter, n_docs), all (query, filter) pairs present."""
    qids = ", ".join(f"({qid})" for qid, _ in BM25_QUERIES)
    names = ", ".join(f"('{n}')" for n in sorted(FILTERS_AGG_SPEC))
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},
cnt AS (SELECT m.query_id,
               count(*) FILTER (WHERE d.n_chars <= 250) AS f_short,
               count(*) FILTER (WHERE d.n_chars >= 251) AS f_long,
               count(*) FILTER (WHERE d.lang IN ('en','fr','es')) AS f_latin
        FROM m JOIN documents d USING (doc_id) GROUP BY m.query_id),
u AS (SELECT query_id, 'short' AS filter, f_short AS n FROM cnt
      UNION ALL SELECT query_id, 'long', f_long FROM cnt
      UNION ALL SELECT query_id, 'latin', f_latin FROM cnt),
ql(query_id) AS (VALUES {qids}),
fl(filter) AS (VALUES {names})
SELECT ql.query_id::BIGINT AS query_id, fl.filter,
       coalesce(u.n, 0)::BIGINT AS n_docs
FROM ql CROSS JOIN fl LEFT JOIN u USING (query_id, filter)"""


def _range_agg_sql() -> str:
    """range-agg mirror: `from` inclusive / `to` exclusive counts per query,
    ES '*'-keyed open bounds, empty buckets as zero rows."""
    from splade_ray.docvalues import range_key

    qids = ", ".join(f"({qid})" for qid, _ in BM25_QUERIES)
    keys, conds = [], []
    for lo, hi in RANGE_AGG_RANGES:
        keys.append(range_key(lo, hi))
        c = []
        if lo is not None:
            c.append(f"d.n_chars >= {lo}")
        if hi is not None:
            c.append(f"d.n_chars < {hi}")
        conds.append(" AND ".join(c) or "TRUE")
    sels = "\n      UNION ALL ".join(
        f"SELECT query_id, '{k}' AS range_key, c{i} AS n FROM cnt"
        for i, k in enumerate(keys)
    )
    cols = ",\n               ".join(
        f"count(*) FILTER (WHERE {c}) AS c{i}" for i, c in enumerate(conds)
    )
    rkeys = ", ".join(f"('{k}')" for k in keys)
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},
cnt AS (SELECT m.query_id,
               {cols}
        FROM m JOIN documents d USING (doc_id) GROUP BY m.query_id),
u AS ({sels}),
ql(query_id) AS (VALUES {qids}),
rk(range_key) AS (VALUES {rkeys})
SELECT ql.query_id::BIGINT AS query_id, rk.range_key,
       coalesce(u.n, 0)::BIGINT AS n_docs
FROM ql CROSS JOIN rk LEFT JOIN u USING (query_id, range_key)"""


def _multi_terms_sql() -> str:
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},
g AS (SELECT m.query_id, d.lang, d.source, count(*)::BIGINT AS n_docs,
             row_number() OVER (PARTITION BY m.query_id
                                ORDER BY count(*) DESC, d.lang ASC,
                                         d.source ASC) AS rank
      FROM m JOIN documents d USING (doc_id)
      GROUP BY m.query_id, d.lang, d.source)
SELECT query_id, rank::BIGINT AS rank, lang, source, n_docs
FROM g WHERE rank <= {TOP_K}"""


def _rare_terms_sql() -> str:
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED}
SELECT m.query_id, d.n_chars::VARCHAR AS value, count(*)::BIGINT AS n_docs
FROM m JOIN documents d USING (doc_id)
GROUP BY 1, 2 HAVING count(*) <= {RARE_MAX_DOC_COUNT}"""


def _weighted_avg_sql() -> str:
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED}
SELECT m.query_id, count(*)::BIGINT AS n_docs,
       sum(d.n_chars * (d.doc_id % 7 + 1))::BIGINT AS sum_vw,
       sum(d.doc_id % 7 + 1)::BIGINT AS sum_w
FROM m JOIN documents d USING (doc_id)
GROUP BY m.query_id"""


def _field_stats_sql() -> str:
    """field_stats mirror over the _dv5 fixture (url null iff doc_id % 3
    == 0, else unique per doc): conditional counts + exact distinct."""
    return f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED}
SELECT m.query_id,
       count(*) FILTER (WHERE d.doc_id % 3 != 0)::BIGINT AS n_value,
       count(*) FILTER (WHERE d.doc_id % 3 = 0)::BIGINT AS n_missing,
       count(DISTINCT CASE WHEN d.doc_id % 3 != 0 THEN d.doc_id END
             )::BIGINT AS n_distinct
FROM m JOIN documents d USING (doc_id)
GROUP BY 1"""


def _synonym_sql() -> str:
    """SynonymQuery mirror: per (query, group) the member list, group tf =
    sum of member tfs per doc, group df = max member df (only members
    present in the corpus survive the tf join, matching the engine's
    lexicon-presence filter), BM25 saturation applied to the summed tf."""
    values = []
    for qid, text in BM25_QUERIES:
        for term, qtf in sorted(term_counts(text).items()):
            for member in sorted({term, *SYN_MAP.get(term, [])}):
                values.append(f"({qid}, '{term}', '{member}', {qtf})")
    vals = ",\n    ".join(values)
    return f"""
WITH {_TF},
qg(query_id, gid, member, qtf) AS (VALUES
    {vals}
),
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
gtf AS (SELECT qg.query_id, qg.gid, tf.doc_id, qg.qtf, sum(tf.tf)::BIGINT AS tfg
        FROM qg JOIN tf ON tf.term = qg.member
        GROUP BY qg.query_id, qg.gid, tf.doc_id, qg.qtf),
gdf AS (SELECT qg.query_id, qg.gid, max(df.df) AS dfg
        FROM qg JOIN df ON df.term = qg.member
        GROUP BY qg.query_id, qg.gid),
scores AS (
  SELECT g.query_id, g.doc_id,
         sum( ln(1 + (s.n - gd.dfg + 0.5) / (gd.dfg + 0.5)) * g.qtf
              * g.tfg * ({K1} + 1)
              / (g.tfg + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl)) ) AS score
  FROM gtf g
  JOIN gdf gd ON gd.query_id = g.query_id AND gd.gid = g.gid
  JOIN dl ON dl.doc_id = g.doc_id
  CROSS JOIN stats s
  GROUP BY g.query_id, g.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY {_round4_sql('score')} DESC, doc_id ASC) AS rank
  FROM scores WHERE score > 0
)
SELECT query_id, rank::BIGINT AS rank, doc_id, {_round4_sql('score')} AS score_r
FROM ranked WHERE rank <= {TOP_K}"""


def _wildcard_sql() -> str:
    """WildcardQuery mirror: `*`->`%`, `?`->`_` LIKE expansion over the
    distinct corpus terms, ascending capped, then the shared expanded-BM25
    (qtf=1 per term) tail — the suggest.wildcard_search contract."""
    vals = ", ".join(
        f"({qid}, '{p.replace('*', '%').replace('?', '_')}')"
        for qid, p in WILDCARD_QUERIES
    )
    return f"""
WITH {_TF},
wq(query_id, p) AS (VALUES {vals}),
exp AS (SELECT wq.query_id, l.term
        FROM wq JOIN (SELECT DISTINCT term FROM tf) l
          ON l.term LIKE wq.p
        QUALIFY row_number() OVER (PARTITION BY wq.query_id ORDER BY l.term)
                <= {PREFIX_MAX_TERMS}),
q2 AS (SELECT query_id, term FROM exp),{_EXPANDED_BM25}"""


def _regexp_sql() -> str:
    """RegexpQuery mirror: anchored RE2 full-match expansion over the
    distinct corpus terms (DuckDB's regexp_full_match is RE2 too, so the
    operator set matches the engine exactly), ascending capped, then the
    shared expanded-BM25 (qtf=1 per term) tail."""
    vals = ", ".join(f"({qid}, '{p}')" for qid, p in REGEXP_QUERIES)
    return f"""
WITH {_TF},
rq(query_id, p) AS (VALUES {vals}),
exp AS (SELECT rq.query_id, l.term
        FROM rq JOIN (SELECT DISTINCT term FROM tf) l
          ON regexp_full_match(l.term, rq.p)
        QUALIFY row_number() OVER (PARTITION BY rq.query_id ORDER BY l.term)
                <= {PREFIX_MAX_TERMS}),
q2 AS (SELECT query_id, term FROM exp),{_EXPANDED_BM25}"""


def _dsir_buckets_cte() -> str:
    """CTE ``b(doc_id, bucket)``: one row per unigram+bigram feature.
    Token hash = sha256 prefix; a k-gram's hash is the FNV rolling fold of
    its token hashes (HUGEINT mod-2^64, the dup_spans idiom) — exactly
    ops/curation.hashed_ngram_buckets (a 1-gram folds to the raw hash)."""
    assert DSIR_MG == 2, "SQL mirror hardcodes unigrams+bigrams"
    th = _HASH64_SQL.format(t="t")
    p, m64 = 1099511628211, 1 << 64
    return f"""
hs0 AS (SELECT doc_id, list_transform(
          regexp_extract_all(lower(text), '{TOKEN_SQL}'), t -> {th}) AS h
        FROM documents),
g1 AS (SELECT doc_id, unnest(h) AS gh FROM hs0),
gi AS (SELECT doc_id, h, unnest(generate_series(1, greatest(len(h)-1, 0))) AS i FROM hs0),
g2 AS (SELECT doc_id, (h[i] * {p} + h[i+1]) % {m64} AS gh FROM gi),
g AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2),
b AS (SELECT doc_id, (gh % {DSIR_NB})::BIGINT AS bucket FROM g)"""


def _dsir_weights_cte() -> str:
    """CTEs ending in ``w(doc_id, n_feats, logw)``: Laplace-smoothed
    log-ratio per bucket (target = lang = DSIR_TARGET_LANG), summed per
    gram instance."""
    return f"""{_dsir_buckets_cte()},
rawc AS (SELECT bucket, count(*)::DOUBLE AS c FROM b GROUP BY bucket),
tgtc AS (SELECT bucket, count(*)::DOUBLE AS c
         FROM b JOIN documents d USING (doc_id)
         WHERE d.lang = '{DSIR_TARGET_LANG}' GROUP BY bucket),
tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM tgtc) AS tt,
               (SELECT coalesce(sum(c), 0) FROM rawc) AS rt),
lut AS (SELECT br.bucket,
               ln((coalesce(t.c, 0) + 1.0) / (tot.tt + {DSIR_NB}.0))
             - ln((coalesce(r.c, 0) + 1.0) / (tot.rt + {DSIR_NB}.0)) AS lr
        FROM (SELECT DISTINCT bucket FROM b) br
        LEFT JOIN tgtc t USING (bucket)
        LEFT JOIN rawc r USING (bucket)
        CROSS JOIN tot),
w AS (SELECT b.doc_id, count(*)::BIGINT AS n_feats, sum(l.lr) AS logw
      FROM b JOIN lut l USING (bucket) GROUP BY b.doc_id)"""


def _dsir_counts_sql() -> str:
    return f"""
WITH {_dsir_buckets_cte()}
SELECT bucket, count(*)::BIGINT AS cnt FROM b GROUP BY bucket"""


def _dsir_weights_sql() -> str:
    return f"""
WITH {_dsir_weights_cte()}
SELECT d.doc_id, coalesce(w.n_feats, 0)::BIGINT AS n_feats,
       {_round4_sql('coalesce(w.logw, 0.0)')} AS log_weight_r
FROM documents d LEFT JOIN w USING (doc_id)"""


def _dsir_select_sql() -> str:
    """Gumbel top-k mirror: u from the ops/sample.py multiplicative-hash
    bucket (bit-exact HUGEINT arithmetic), key = logw - ln(-ln u)."""
    from splade_ray.ops.sample import BUCKETS, bucket_sql

    return f"""
WITH {_dsir_weights_cte()},
full_w AS (SELECT d.doc_id, coalesce(w.logw, 0.0) AS logw
           FROM documents d LEFT JOIN w USING (doc_id)),
keyed AS (SELECT doc_id,
                 logw - ln(-ln(({bucket_sql('doc_id', DSIR_SEED)} + 0.5) / {BUCKETS})) AS key
          FROM full_w),
r AS (SELECT doc_id, row_number() OVER (ORDER BY key DESC, doc_id ASC) AS rank
      FROM keyed)
SELECT rank::BIGINT AS rank, doc_id FROM r WHERE rank <= {DSIR_K}"""


def _sig_terms_sql() -> str:
    """JLH mirror: foreground = ranked top-TOP_K docs, presence via the tf
    CTE (a doc contains a term iff it has a tf row), fg% / bg% ratios in
    the same float expression order as the engine."""
    return f"""{_bm25_cte()},
fg AS (SELECT query_id, doc_id FROM ranked WHERE rank <= {TOP_K}),
fgt AS (SELECT query_id, count(*)::BIGINT AS fg_total FROM fg GROUP BY query_id),
pres AS (SELECT DISTINCT f.query_id, tf.doc_id, tf.term
         FROM fg f JOIN tf ON f.doc_id = tf.doc_id),
fc AS (SELECT query_id, term, count(*)::BIGINT AS fg_count
       FROM pres GROUP BY query_id, term),
bgn AS (SELECT count(*)::BIGINT AS bg FROM documents),
s AS (SELECT fc.query_id, fc.term, fc.fg_count, ft.fg_total,
             df.df::BIGINT AS df,
             ((fc.fg_count::DOUBLE / ft.fg_total) - (df.df::DOUBLE / n.bg))
             * ((fc.fg_count::DOUBLE / ft.fg_total) / (df.df::DOUBLE / n.bg))
               AS score
      FROM fc
      JOIN fgt ft USING (query_id)
      JOIN df USING (term)
      CROSS JOIN bgn n
      WHERE (fc.fg_count::DOUBLE / ft.fg_total) > (df.df::DOUBLE / n.bg)),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, fg_count DESC,
                                            term ASC) AS rank
      FROM s)
SELECT query_id, rank::BIGINT AS rank, term, fg_count, fg_total, df,
       {_round4_sql('score')} AS score_r
FROM r WHERE rank <= {SIG_TOP_M}"""


def _lm_cte() -> str:
    """CTEs for the hashed bigram LM mirror: per-doc token-hash lists,
    bigram instances with their context (first-token) bucket, and the
    gram/context bucket count tables — the dsir fold idiom (sha256-prefix
    token hash, FNV HUGEINT fold)."""
    th = _HASH64_SQL.format(t="t")
    p, m64 = 1099511628211, 1 << 64
    return f"""
hs0 AS (SELECT doc_id, list_transform(
          regexp_extract_all(lower(text), '{TOKEN_SQL}'), t -> {th}) AS h
        FROM documents),
uni AS (SELECT doc_id, unnest(h) AS gh FROM hs0),
bi_i AS (SELECT doc_id, h, unnest(generate_series(1, greatest(len(h)-1, 0))) AS i FROM hs0),
bi AS (SELECT doc_id,
              (((h[i] * {p}) % {m64}) + h[i+1]) % {m64} AS gh,
              h[i] % {LM_NB} AS cb
       FROM bi_i),
gramc AS (SELECT (gh % {LM_NB})::BIGINT AS bucket, count(*)::BIGINT AS cnt
          FROM bi GROUP BY 1),
ctxc AS (SELECT (gh % {LM_NB})::BIGINT AS bucket, count(*)::BIGINT AS cnt
         FROM uni GROUP BY 1)"""


def _lm_counts_sql() -> str:
    return f"""
WITH {_lm_cte()}
SELECT 2::BIGINT AS k, bucket, cnt FROM gramc
UNION ALL
SELECT 1::BIGINT AS k, bucket, cnt FROM ctxc"""


def _lm_ppl_sql() -> str:
    return f"""
WITH {_lm_cte()},
s AS (SELECT b.doc_id,
             ln(g.cnt + 1.0) - ln(c.cnt + {LM_NB}.0) AS lp
      FROM bi b
      JOIN gramc g ON (b.gh % {LM_NB})::BIGINT = g.bucket
      JOIN ctxc c ON b.cb::BIGINT = c.bucket),
w AS (SELECT doc_id, count(*)::BIGINT AS n_scored, sum(lp) AS logprob
      FROM s GROUP BY doc_id)
SELECT d.doc_id, coalesce(w.n_scored, 0)::BIGINT AS n_scored,
       {_round4_sql('coalesce(w.logprob, 0.0)')} AS logprob_r,
       {_round4_sql('CASE WHEN w.n_scored > 0 THEN exp(-w.logprob / w.n_scored) ELSE 0.0 END')} AS ppl_r
FROM documents d LEFT JOIN w USING (doc_id)"""


def _oracle_sql_base() -> dict[str, str]:
    bm25 = _bm25_sql()
    return {
        "postings_flat": f"WITH {_TF} SELECT doc_id, term, tf FROM tf",
        "postings_flat_by_lang": f"""
WITH {_by_lang_toks_sql()},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toksl GROUP BY doc_id, term)
SELECT doc_id, term, tf FROM tf""",
        "lexicon": f"""
WITH {_TF}
SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term""",
        "doc_token_stats": f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{TOKEN_SQL}'))::BIGINT AS n_tokens,
       len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_SQL}')))::BIGINT AS n_distinct
FROM documents""",
        "decontam_grams": _decontam_sql(),
        "dsir_counts": _dsir_counts_sql(),
        "dsir_weights": _dsir_weights_sql(),
        "dsir_select": _dsir_select_sql(),
        "lm_counts": _lm_counts_sql(),
        "lm_ppl": _lm_ppl_sql(),
        "sig_terms": _sig_terms_sql(),
        "multi_index_topk": bm25,
        "multi_index_bool": _boolean_sql(),
        "multi_index_phrase": _phrase_topk_sql(),
        "top_sources_hh": _top_sources_hh_sql(),
        "top_sources_hh_by_lang": _top_sources_hh_by_lang_sql(),
        "bpe_word_counts": _bpe_word_counts_sql(),
        "rollup_events": _rollup_events_sql(),
        "pack_assign": _pack_assign_sql(),
        "dup_spans": _dup_spans_sql(),
        "dup_spans_rewrite": _dup_spans_rewrite_sql(),
        "dup_spans_rewrite_sharded": _dup_spans_rewrite_sql(),
        "unit_dedup": _unit_dedup_sql(),
        "unit_dedup_sharded": _unit_dedup_sql(),
        "lsh_probe_counts": _lsh_probe_sql(),
        "url_normalize": _url_normalize_sql(),
        "url_dedup": _url_dedup_sql(),
        "redact_docs": _redact_sql(),
        "bm25_topk": bm25,
        "search_after_page2": _search_after_sql(),
        "bm25_topk_deleted": _bm25_deleted_sql(),
        "bm25_topk_purged": _bm25_purged_sql(),
        "bm25_topk_bmw": bm25,
        "bm25_topk_quantized": _bm25_quantized_sql(),
        "ql_topk": _ql_sql(),
        "lmjm_topk": _lmjm_sql(),
        "tfidf_topk": _tfidf_sql(),
        "dfr_topk": _dfr_sql(),
        "suggest_terms": _suggest_sql(),
        "suggest_terms_dl": _suggest_dl_sql(),
        "prefix_topk": _prefix_sql(),
        "fuzzy_topk": _fuzzy_sql(),
        "range_topk": _range_topk_sql(),
        "function_score": _function_score_sql(),
        "block_join_max": _block_join_sql("max"),
        "block_join_avg": _block_join_sql("avg"),
        "rank_feature": _rank_feature_sql(),
        "composite_agg": _composite_agg_sql(1),
        "composite_agg_page2": _composite_agg_sql(2),
        "range_topk_str": _range_topk_str_sql(),
        "sort_by_field": _sort_by_field_sql(),
        "sort_by_field_indexed": _sort_by_field_sql(),
        "sort_multi": _sort_multi_sql(),
        "sort_multi_indexed": _sort_multi_sql(),
        "match_counts": _match_counts_sql(),
        "match_histogram": _match_histogram_sql(),
        "filters_agg": _filters_agg_sql(),
        "ids_query": _ids_sql(),
        "routed_topk": _routed_sql(),
        "suggest_complete": _suggest_complete_sql(),
        "pinned_topk": _pinned_sql(),
        "exists_topk": _exists_sql(),
        "terms_lookup": _terms_lookup_sql(),
        "geo_distance_topk": _geo_distance_sql(),
        "geo_bbox": _geo_bbox_sql(),
        "geotile_grid": _geotile_grid_sql(),
        "distance_feature": _rank_feature_sql(DIST_FEATURES),
        "match_bool_prefix": _match_bool_prefix_sql(),
        "range_agg": _range_agg_sql(),
        "multi_terms": _multi_terms_sql(),
        "rare_terms": _rare_terms_sql(),
        "weighted_avg": _weighted_avg_sql(),
        "field_stats": _field_stats_sql(),
        "match_percentiles": _match_percentiles_sql(),
        "diversified_topk": _diversified_sql(),
        "match_stats": _match_stats_sql(),
        "match_extended_stats": _match_extended_stats_sql(),
        "synonym_topk": _synonym_sql(),
        "wildcard_topk": _wildcard_sql(),
        "regexp_topk": _regexp_sql(),
        "lang_id_pred": _lang_id_pred_sql(),
        "bm25_topk_by_lang": _bm25_by_lang_sql(),
        "postings_flat_stemmed": _postings_flat_stemmed_sql(),
        "postings_flat_code": _postings_flat_code_sql(),
        "bm25_topk_stemmed": _bm25_stemmed_sql(),
        "bm25f_topk": _bm25f_sql(),
        "dismax_topk": _dismax_sql(),
        "bm25f_true_topk": _bm25f_true_sql(),
        "cross_fields_scores": _cross_fields_sql(),
        "snippets_topk": _snippets_sql(),
        "highlight_fragments": _fragments_sql(),
        "snippets_topk_distinct": _snippets_distinct_sql(),
        "snippets_topk_sentence": _snippets_sentence_sql(),
        "ann_lsh_buckets_int": _lsh_int_sql(),
        "semdedup_exact": """
WITH all_vecs AS (
  SELECT vec_id FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 FROM embeddings WHERE vec_id % 3 = 0
)
SELECT vec_id,
       (vec_id < 100000) AS kept,
       CASE WHEN vec_id < 100000 THEN vec_id ELSE vec_id - 100000 END AS rep_id
FROM all_vecs""",
        "near_dup_jaccard_counts": _jaccard_counts_sql(),
        "near_dup_containment_counts": _containment_counts_sql(),
        "containment_sketch_counts": _containment_sketch_sql(),
        "doc_fingerprint": _fingerprint_sql(),
        "minhash_sigs": _minhash_sigs_sql(),
        "simhash_sigs": _simhash_sigs_sql(),
        "dedup_minhash_counts": _minhash_pairs_sql(),
        "dedup_simhash": _simhash_pairs_sql(),
        "dedup_clusters": f"""
WITH RECURSIVE {_dup_cluster_cte()}
SELECT doc_id, cluster_id FROM lab""",
        "dedup_survivors": f"""
WITH RECURSIVE {_dup_cluster_cte()}
SELECT d.doc_id FROM documents d LEFT JOIN lab USING (doc_id)
WHERE lab.cluster_id IS NULL OR lab.cluster_id = d.doc_id""",
        "collection_stats": f"""
WITH ds AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{TOKEN_SQL}')) AS n_tokens,
         len(list_distinct(regexp_extract_all(lower(text), '{TOKEN_SQL}'))) AS n_distinct
  FROM documents)
SELECT count(*)::BIGINT AS n_docs,
       {_round4_sql('avg(n_tokens)')} AS avgdl_r,
       {_round4_sql('avg(n_distinct)')} AS mean_l0_r
FROM ds""",
        "docs_per_lang": """
SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents GROUP BY lang""",
        "dedup_exact": """
SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies
FROM documents GROUP BY text""",
        "dedup_incremental": """
SELECT d.doc_id, sha256(d.text) AS text_sha256
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM documents r
                  WHERE r.doc_id % 10 = 0 AND r.text = d.text)""",
        "prune_topk": f"""
WITH {_TF},
r AS (SELECT doc_id, term, tf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tf DESC, term ASC) AS rn
      FROM tf)
SELECT doc_id, term, tf FROM r WHERE rn <= 8""",
        "quantized_export": f"""
WITH {_TF},
dl AS (SELECT d.doc_id, coalesce(x.dl, 0)::DOUBLE AS dl
       FROM documents d LEFT JOIN (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id) x
       USING (doc_id)),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
imp AS (
  SELECT tf.doc_id, tf.term,
         floor( ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
                * tf.tf * ({K1} + 1)
                / (tf.tf + {K1} * (1 - {B} + {B} * dl.dl / s.avgdl))
                * 100 + 0.5 )::BIGINT AS impact_q
  FROM tf
  JOIN (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term) df USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
)
SELECT doc_id, term, impact_q FROM imp WHERE impact_q > 0""",
        "anserini_docs": f"""
WITH {_TF}{_IMP},
vec AS (SELECT doc_id,
               '{{' || string_agg('"' || term || '": ' || impact_q, ', ' ORDER BY term) || '}}' AS vector_json
        FROM imp WHERE impact_q > 0 GROUP BY doc_id)
SELECT d.doc_id AS id, coalesce(v.vector_json, '{{"a": 1}}') AS vector_json
FROM documents d LEFT JOIN vec v USING (doc_id)""",
        "prune_value": f"""
WITH {_TF}{_IMP}
SELECT doc_id, term, impact_q FROM imp WHERE impact_q > 50""",
        "prune_quantile": f"""
WITH {_TF}{_IMP},
kept AS (SELECT doc_id, term, impact_q FROM imp WHERE impact_q > 0),
thr AS (SELECT term, quantile_cont(impact_q, 0.75) AS t FROM kept GROUP BY term)
SELECT k.doc_id, k.term, k.impact_q
FROM kept k JOIN thr USING (term) WHERE k.impact_q > thr.t""",
        "flops_metric": f"""
WITH {_TF},
{_qterm_values_sql()},
df_d AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
qdf AS (SELECT term, count(*)::BIGINT AS qdf FROM qterm GROUP BY term)
SELECT coalesce(sum(df_d.df * qdf.qdf), 0)::BIGINT AS flops_num,
       (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       {len(BM25_QUERIES)}::BIGINT AS n_queries
FROM qdf JOIN df_d USING (term)""",
        "rerank_input": f"""{_bm25_cte()},
{_qvalues_sql()},
pairs AS (SELECT query_id, rank, doc_id FROM ranked
          WHERE rank <= {TOP_K} AND doc_id != query_id)
SELECT p.query_id, p.rank::BIGINT AS rank, p.doc_id, qv.q_text, d.text AS d_text
FROM pairs p JOIN qv USING (query_id) JOIN documents d ON d.doc_id = p.doc_id""",
        "rerank_lexical": f"""{_bm25_cte()},
{_qterm_values_sql()},
pairs AS (SELECT query_id, rank, doc_id FROM ranked
          WHERE rank <= {TOP_K} AND doc_id != query_id),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
ov AS (SELECT p.query_id, p.rank, p.doc_id, count(qt.term)::BIGINT AS overlap
       FROM pairs p
       LEFT JOIN dt ON dt.doc_id = p.doc_id
       LEFT JOIN qterm qt ON qt.query_id = p.query_id AND qt.term = dt.term
       GROUP BY 1, 2, 3),
rr AS (SELECT query_id, doc_id, overlap, rank,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY overlap DESC, rank ASC, doc_id ASC) AS new_rank
       FROM ov)
SELECT query_id, new_rank::BIGINT AS new_rank, doc_id, overlap, rank::BIGINT AS rank FROM rr""",
        "rerank_pairwise": f"""{_bm25_cte()},
{_qterm_values_sql()},
pairs AS (SELECT query_id, rank, doc_id FROM ranked
          WHERE rank <= {TOP_K} AND doc_id != query_id),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
ov AS (SELECT p.query_id, p.rank, p.doc_id, count(qt.term)::BIGINT AS overlap
       FROM pairs p
       LEFT JOIN dt ON dt.doc_id = p.doc_id
       LEFT JOIN qterm qt ON qt.query_id = p.query_id AND qt.term = dt.term
       GROUP BY 1, 2, 3),
wins AS (SELECT a.query_id, a.rank, a.doc_id,
                (sum(CASE WHEN a.overlap > b.overlap THEN 2
                          WHEN a.overlap = b.overlap THEN 1 ELSE 0 END) - 1)::BIGINT AS wins2
         FROM ov a JOIN ov b ON a.query_id = b.query_id
         GROUP BY 1, 2, 3),
rr AS (SELECT query_id, doc_id, wins2, rank,
              row_number() OVER (PARTITION BY query_id
                                 ORDER BY wins2 DESC, rank ASC, doc_id ASC) AS new_rank
       FROM wins)
SELECT query_id, new_rank::BIGINT AS new_rank, doc_id, wins2, rank::BIGINT AS rank FROM rr""",
        "text_quality": f"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '{TOKEN_SQL}'))::BIGINT AS n_tokens,
       {_round4_sql("len(regexp_extract_all(text, '[a-zA-Z]'))::DOUBLE / greatest(length(text), 1)")} AS alpha_ratio_r,
       {_round4_sql("len(regexp_extract_all(text, '[0-9]'))::DOUBLE / greatest(length(text), 1)")} AS digit_ratio_r
FROM documents""",
        "token_counts": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))::BIGINT AS bpe_tokens
FROM documents""",
        # RE2 patterns shared VERBATIM with gopher_rules_batch (Arrow and
        # DuckDB both embed RE2); every rule is an integer-exact comparison
        "gopher_rules": r"""
WITH f AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+'))::BIGINT AS n_words,
         (length(text) - len(regexp_extract_all(text, '\s')))::BIGINT AS n_nonws_chars,
         len(regexp_extract_all(text, '#|\.\.\.'))::BIGINT AS n_symbols,
         len(regexp_extract_all(text, '\S*[a-zA-Z]\S*'))::BIGINT AS n_alpha_words,
         (len(regexp_extract_all(text, '\n')) + 1)::BIGINT AS n_lines,
         len(regexp_extract_all(text, '(?m)^[ \t]*[-*•]'))::BIGINT AS n_bullet_lines,
         len(regexp_extract_all(text, '(?m)(\.\.\.|…)[ \t]*$'))::BIGINT AS n_ellipsis_lines,
         (CASE WHEN regexp_matches(text, '(?i)\bthe\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '(?i)\band\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '(?i)\bof\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '(?i)\bto\b') THEN 1 ELSE 0 END
          + CASE WHEN regexp_matches(text, '(?i)\bin\b') THEN 1 ELSE 0 END)::BIGINT AS n_stop_present
  FROM documents)
SELECT *,
       (n_words >= 50 AND n_words <= 100000
        AND 3 * n_words <= n_nonws_chars AND n_nonws_chars <= 10 * n_words
        AND 10 * n_symbols <= n_words
        AND 5 * n_alpha_words >= 4 * n_words
        AND 10 * n_bullet_lines <= 9 * n_lines
        AND 10 * n_ellipsis_lines <= 3 * n_lines
        AND n_stop_present >= 2) AS pass_gopher
FROM f""",
        # RE2 patterns shared VERBATIM with c4_rules_batch; the short-line
        # count subtracts >=5-word lines from non-empty lines, exactly as
        # the kernel does
        "c4_rules": r"""
WITH f AS (
  SELECT doc_id,
         (len(regexp_extract_all(text, '\n')) + 1)::BIGINT AS n_lines,
         len(regexp_extract_all(text, '(?m)[.!?]["'')\]]?[ \t]*$'))::BIGINT AS n_terminal_lines,
         (len(regexp_extract_all(text, '(?m)^[ \t]*\S.*$'))
          - len(regexp_extract_all(text, '(?m)^[ \t]*(?:\S+[ \t]+){4,}\S+.*$')))::BIGINT AS n_short_lines,
         regexp_matches(text, '(?i)lorem ipsum') AS has_lorem,
         contains(text, '{') AS has_brace,
         regexp_matches(text, '(?i)\bjavascript\b') AS has_javascript
  FROM documents)
SELECT *,
       (NOT has_lorem AND NOT has_brace AND NOT has_javascript
        AND n_terminal_lines >= 3) AS pass_c4
FROM f""",
        "repetition_stats": _repetition_sql(),
        "phrase_search": _phrase_sql(),
        "multi_phrase": _multi_phrase_sql(),
        "match_phrase_prefix": _match_phrase_prefix_sql(),
        "near_search": _near_sql(),
        "near_unordered": _near_unordered_sql(),
        "span_first": _span_first_sql(),
        "span_not": _span_not_sql(),
        "span_containing": _span_rel_sql("containing"),
        "span_within": _span_rel_sql("within"),
        "doclen_quantiles": _doclen_quantiles_sql(),
        "event_value_quantiles": _event_value_quantiles_sql(),
        "distinct_terms_kmv": _kmv_sql(),
        "more_like_this": _mlt_sql(),
        "rm3_terms": _rm3_terms_sql(),
        "rm3_topk": _rm3_sql(),
        "facet_counts": _facet_sql(),
        "facet_stats_agg": _facet_stats_sql(),
        "facet_top": _facet_top_sql(),
        "term_vectors": _term_vectors_sql(),
        "percolate_all": _percolate_sql("all"),
        "percolate_any": _percolate_sql("any"),
        "hybrid_rrf": _hybrid_rrf_sql(),
        "hybrid_linear": _hybrid_linear_sql(),
        "explain_topk": _explain_sql(),
        "collapse_topk": _collapse_sql(),
        "substr_search": _substr_sql(),
        "grep_scan": _grep_sql(),
        "grep_snippets": _grep_snippets_sql(),
        "substr_search_cs": _substr_cs_sql(),
        "regex_grep_pruned": _grep_sql(),
        "boolean_topk": _boolean_sql(),
        "boolean_msm": _boolean_sql(BOOL_MSM_QUERIES),
        "rescore_topk": _rescore_sql(),
        "common_terms_topk": _common_terms_sql(),
        "terms_set_topk": _terms_set_sql(),
        "boosting_topk": _boosting_sql(),
        "const_score_topk": _const_score_sql(),
        "query_string": _query_string_sql(),
        "phrase_topk": _phrase_topk_sql(),
        **_sample_sqls(),
        "top_events_per_type": _topn_per_type_sql(),
        "window_agg_1h": _window_agg_sql(),
        "auto_date_histogram": _auto_date_histogram_sql(),
        "window_hop_1h_15m": _window_hop_sql(),
        "bucket_pipeline_1h": _bucket_pipeline_sql(),
        "top_hits_by_lang": _top_hits_sql(),
        "adjacency_matrix": _adjacency_matrix_sql(),
        "matrix_stats": _matrix_stats_sql(),
        "percentile_ranks": _percentile_ranks_sql(),
        "field_moments": _field_moments_sql(),
        "chunk_docs": f"""
WITH toks AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '{TOKEN_SQL}') AS ts
              FROM documents),
st AS (SELECT doc_id, ts, len(ts)::BIGINT AS n FROM toks WHERE len(ts) > 0),
ch AS (SELECT doc_id, ts, n,
              unnest(generate_series(
                  0,
                  ((greatest(n - {CHUNK_SIZE}, 0)
                    + {CHUNK_SIZE - CHUNK_OVERLAP} - 1)
                   // {CHUNK_SIZE - CHUNK_OVERLAP})
                  * {CHUNK_SIZE - CHUNK_OVERLAP},
                  {CHUNK_SIZE - CHUNK_OVERLAP})) AS start
       FROM st)
SELECT doc_id, (start // {CHUNK_SIZE - CHUNK_OVERLAP})::BIGINT AS chunk_id,
       least({CHUNK_SIZE}, n - start)::BIGINT AS n_tokens,
       array_to_string(ts[start + 1 : least(start + {CHUNK_SIZE}, n)], ' ')
           AS chunk
FROM ch""",
        "rag_topk": _rag_sql(),
        "rag_chunks": _rag_chunks_sql(),
        "has_parent_chunks": _has_parent_sql(),
        "facet_tags": f"""
WITH {_TF},
{_qterm_values_sql()},{_MATCHED},
u AS (SELECT m.query_id, m.doc_id, d.lang AS facet
      FROM m JOIN documents d USING (doc_id)
      UNION
      SELECT m.query_id, m.doc_id, d.source
      FROM m JOIN documents d USING (doc_id))
SELECT query_id, facet, count(*)::BIGINT AS n_docs
FROM u GROUP BY 1, 2""",
        "emb_covariance": """
WITH e AS (SELECT vec_id, unnest(embedding) AS val,
                  generate_subscripts(embedding, 1) AS i
           FROM embeddings),
nn AS (SELECT count(*)::DOUBLE AS n FROM embeddings),
m AS (SELECT i, sum(val) / (SELECT n FROM nn) AS mu FROM e GROUP BY i),
c AS (SELECT a.i AS i, b.i AS j,
             sum(a.val * b.val) / (SELECT n FROM nn) AS exx
      FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2)
SELECT c.i::BIGINT AS i, c.j::BIGINT AS j,
       round(c.exx - ma.mu * mb.mu, 4) AS cov_r
FROM c JOIN m ma ON ma.i = c.i JOIN m mb ON mb.i = c.j""",
        "sessions_30m": _sessions_sql(),
        "asof_purchase_signup": _asof_sql(),
        "funnel_48h": _funnel_sql(),
        "top_terms": f"""
WITH {_TF},
agg AS (SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf FROM tf GROUP BY term),
r AS (SELECT term, df, cf, row_number() OVER (ORDER BY cf DESC, term ASC) AS rank FROM agg)
SELECT rank::BIGINT AS rank, term, df, cf FROM r WHERE rank <= 20""",
        "flagship_run": f"""{_bm25_cte()}
SELECT r.query_id, r.rank::BIGINT AS rank, r.doc_id, {_round4_sql('r.score')} AS score_r,
       d.source AS repo, 'docs/' || d.doc_id || '.txt' AS path
FROM ranked r JOIN documents d USING (doc_id) WHERE r.rank <= {TOP_K}""",
        "ann_cosine_topk": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
sims AS (SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qv, e.v) AS sim FROM q CROSS JOIN e),
ranked AS (SELECT query_id, vec_id, sim,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY {_round4_sql('sim')} DESC,
                                              vec_id ASC) AS rank
           FROM sims)
SELECT query_id, rank::BIGINT AS rank, vec_id, {_round4_sql('sim')} AS sim_r
FROM ranked WHERE rank <= {TOP_K}
""",
        "ann_filtered_topk": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
c AS (SELECT vec_id, v FROM e WHERE label = {ANN_FILTER_LABEL}),
sims AS (SELECT q.query_id, c.vec_id, list_cosine_similarity(q.qv, c.v) AS sim
         FROM q CROSS JOIN c),
ranked AS (SELECT query_id, vec_id, sim,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY {_round4_sql('sim')} DESC,
                                              vec_id ASC) AS rank
           FROM sims)
SELECT query_id, rank::BIGINT AS rank, vec_id, {_round4_sql('sim')} AS sim_r
FROM ranked WHERE rank <= {TOP_K}
""",
        "ann_cosine_topk_sq8": f"""
WITH e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sc AS (SELECT vec_id, v,
              CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 1.0
                   ELSE list_max(list_transform(v, x -> abs(x))) END AS s
       FROM e0),
e AS (SELECT vec_id,
             list_transform(v, x -> floor(x * 127.0 / s + 0.5)) AS qv
      FROM sc),
n AS (SELECT vec_id, qv,
             CASE WHEN sqrt(list_dot_product(qv, qv)) = 0 THEN 1.0
                  ELSE sqrt(list_dot_product(qv, qv)) END AS nrm
      FROM e),
q AS (SELECT vec_id AS query_id, qv AS qq, nrm AS qn FROM n WHERE vec_id < 5),
sims AS (SELECT q.query_id, n.vec_id,
                list_dot_product(q.qq, n.qv) / (q.qn * n.nrm) AS sim
         FROM q CROSS JOIN n),
ranked AS (SELECT query_id, vec_id, sim,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY {_round4_sql('sim')} DESC,
                                              vec_id ASC) AS rank
           FROM sims)
SELECT query_id, rank::BIGINT AS rank, vec_id, {_round4_sql('sim')} AS sim_r
FROM ranked WHERE rank <= {TOP_K}
""",
    }


def oracle_sql() -> dict[str, str]:
    sql = _oracle_sql_base()
    # join-path quantizer computes the same numbers through a term-keyed
    # hash join instead of a vocab broadcast — same oracle by construction
    sql["quantized_export_join"] = sql["quantized_export"]
    # IVF probed at every cluster IS exact brute-force cosine — same oracle
    sql["ann_ivf_exact"] = sql["ann_cosine_topk"]
    # PQ with full-coverage sampled-row codebooks is lossless — same oracle
    sql["ann_pq_exact"] = sql["ann_cosine_topk"]
    return sql
