"""Search-result snippets (keyword-in-context): for every (query, doc) hit
of a run, the contiguous ``window``-token span of the document with the most
query-term occurrences — what a search UI shows under each result.

The reference surfaces ranked ids only (``transformer_evaluator.py:173``
remaps ids, no text); snippets are the standard retrieval-engine output
boundary on top (Lucene's highlighter). Engine shape:

- The run is top-k-sized, so document text is fetched with the same
  predicate-pushdown ``isin`` scan as the doc-metadata join
  (``pipelines/flagship.fetch_doc_info``): O(k) rows leave storage, never
  O(corpus).
- Window selection is vectorized per doc (token membership mask + cumsum
  sliding sum + argmax); the loop is over the k-sized hit list, mirroring
  ``merge_topk``'s candidate-sized pandas work.

Semantics (pinned for the SQL oracle): tokens = collection analyzer over
``lower(text)``; window score = number of token POSITIONS in the window
whose token is a query term (occurrences, not distinct terms); best window
= max score, tie -> smallest start; ``start`` is 1-based; a doc shorter
than ``window`` is one whole-doc window; the snippet is the lowered tokens
joined by single spaces.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.dataset as pads

from splade_ray.analysis import tokenize, term_counts

SNIPPET_COLUMNS = ["query_id", "doc_id", "start", "n_match", "snippet"]


def _sliding_sums(mask: np.ndarray, window: int) -> np.ndarray:
    c = np.concatenate([[0], np.cumsum(mask)])
    return c[window:] - c[:-window]


def best_window(tokens: list[str], terms: set[str], window: int) -> tuple[int, int, str]:
    """(1-based start, match count, snippet text) of the best window."""
    n = len(tokens)
    if n == 0:
        return 1, 0, ""
    hit = np.fromiter((t in terms for t in tokens), dtype=np.int64, count=n)
    if n <= window:
        return 1, int(hit.sum()), " ".join(tokens)
    # sliding occurrence count via cumsum; argmax takes the FIRST max -> the
    # smallest-start tie-break the oracle pins
    sums = _sliding_sums(hit, window)
    i = int(np.argmax(sums))
    return i + 1, int(sums[i]), " ".join(tokens[i : i + window])


def best_window_distinct(
    tokens: list[str], terms: set[str], window: int
) -> tuple[int, int, int, str]:
    """(1-based start, distinct-term count, occurrence count, snippet) of the
    best window under the production-highlighter ordering: windows covering
    MORE DISTINCT query terms win (a window with both terms of a two-term
    query beats one repeating a single term), occurrences break ties, then
    smallest start. One vectorized sliding pass PER QUERY TERM (queries are
    a handful of terms) + one for occurrences."""
    n = len(tokens)
    if n == 0:
        return 1, 0, 0, ""
    arr_terms = sorted(terms)
    masks = [
        np.fromiter((t == q for t in tokens), dtype=np.int64, count=n)
        for q in arr_terms
    ]
    occ = np.fromiter((t in terms for t in tokens), dtype=np.int64, count=n)
    if n <= window:
        nd = sum(int(m.sum() > 0) for m in masks)
        return 1, nd, int(occ.sum()), " ".join(tokens)
    distinct = np.zeros(n - window + 1, np.int64)
    for m in masks:
        distinct += _sliding_sums(m, window) > 0
    occs = _sliding_sums(occ, window)
    # lexicographic argmax (distinct desc, occurrences desc, start asc):
    # occs < window+1 always, so the fold is collision-free
    combined = distinct * np.int64(window + 1) + occs
    i = int(np.argmax(combined))
    return i + 1, int(distinct[i]), int(occs[i]), " ".join(tokens[i : i + window])


def fetch_texts(
    corpus_paths: str | list[str],
    doc_ids: list[int],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Candidate-set text fetch with predicate pushdown (one scan, isin
    filter) — only row groups overlapping the k-sized candidate id set are
    read."""
    cand = sorted({int(d) for d in doc_ids})
    t = pads.dataset(corpus_paths).to_table(
        columns=[id_col, text_col], filter=pads.field(id_col).isin(cand)
    )
    return t.to_pandas()


def snippets_for_run(
    corpus_paths: str | list[str],
    run: pd.DataFrame,
    queries: list[tuple[int, str]],
    *,
    window: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_lang: str | None = None,
    mode: str = "occurrences",
) -> pd.DataFrame:
    """Snippets for every (query_id, doc_id) row of a run table, sorted by
    (query_id, doc_id). ``mode="occurrences"`` (default) returns
    (query_id, doc_id, start, n_match, snippet): most query-term
    occurrences wins. ``mode="distinct"`` returns (query_id, doc_id, start,
    n_distinct, n_match, snippet): most DISTINCT query terms covered wins,
    occurrences break ties — the production-highlighter ordering. ``run``
    must be candidate-sized (a top-k run); the corpus is only touched
    through the pushdown text fetch."""
    if mode not in ("occurrences", "distinct"):
        raise ValueError(f"unknown snippet mode: {mode!r}")
    cols = (
        SNIPPET_COLUMNS
        if mode == "occurrences"
        else ["query_id", "doc_id", "start", "n_distinct", "n_match", "snippet"]
    )
    if run.empty:
        types = {c: np.int64 for c in cols if c != "snippet"}
        types["snippet"] = str
        return pd.DataFrame(columns=cols).astype(types)
    texts = fetch_texts(corpus_paths, run["doc_id"].tolist(),
                        id_col=id_col, text_col=text_col)
    tok_cache = {
        int(d): tokenize(t or "", query_lang)
        for d, t in zip(texts[id_col], texts[text_col])
    }
    qterms = {int(qid): set(term_counts(text, query_lang)) for qid, text in queries}
    rows = []
    for qid, doc in zip(run["query_id"], run["doc_id"]):
        qid, doc = int(qid), int(doc)
        toks, terms = tok_cache.get(doc, []), qterms.get(qid, set())
        if mode == "occurrences":
            rows.append((qid, doc, *best_window(toks, terms, window)))
        else:
            rows.append((qid, doc, *best_window_distinct(toks, terms, window)))
    out = pd.DataFrame(rows, columns=cols)
    return out.sort_values(["query_id", "doc_id"]).reset_index(drop=True)
