"""Significant-terms aggregation: brute-force parity over the top-k
foreground + JLH scoring contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.query import search
from splade_ray.sigterms import significant_terms

N = 140
QUERIES = [(1, "def parse merge"), (2, "return x1 += 1"), (3, "zzz_nosuchterm")]


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=9)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(N, dtype=np.int64)),
                "text": t["content"],
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="text", id_col="doc_id",
                rows_per_segment=35)
    return index_dir, corpus, t["content"].to_pylist()


def test_significant_terms_matches_bruteforce(built):
    index_dir, corpus, texts = built
    p = BM25Params(top_k=8)
    fg_k, top_m = 8, 6
    got = significant_terms(
        index_dir, corpus, QUERIES, p, fg_k=fg_k, top_m=top_m
    )

    run = search(index_dir, QUERIES, BM25Params(top_k=fg_k))
    doc_terms = [set(term_counts(tx)) for tx in texts]
    df = {}
    for s in doc_terms:
        for t in s:
            df[t] = df.get(t, 0) + 1

    want_rows = []
    for qid, _ in QUERIES:
        fg = [int(d) for d in run[run["query_id"] == qid]["doc_id"]]
        if not fg:
            continue
        fg_total = len(fg)
        counts = {}
        for d in fg:
            for t in doc_terms[d]:
                counts[t] = counts.get(t, 0) + 1
        scored = []
        for t, fc in counts.items():
            fgp, bgp = fc / fg_total, df[t] / N
            if fgp <= bgp:
                continue
            scored.append((t, fc, df[t], (fgp - bgp) * (fgp / bgp)))
        scored.sort(key=lambda x: (-x[3], -x[1], x[0]))
        for r, (t, fc, d_, s) in enumerate(scored[:top_m], start=1):
            want_rows.append((qid, r, t, fc, fg_total, d_, s))
    want = pd.DataFrame(
        want_rows,
        columns=["query_id", "rank", "term", "fg_count", "fg_total", "df", "score"],
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the no-match query contributes nothing
    assert 3 not in got["query_id"].values
    # every kept term is genuinely overrepresented
    assert (
        got["fg_count"] / got["fg_total"] > got["df"] / N
    ).all()


def test_significant_terms_cli(built, tmp_path, capsys):
    from splade_ray.cli import main

    index_dir, corpus, _ = built
    q = tmp_path / "q.tsv"
    q.write_text("1\tdef parse merge\n")
    out = str(tmp_path / "sig.parquet")
    assert main(["sigterms", "--index", index_dir, "--corpus", corpus,
                 "--queries", str(q), "--out", out, "--fg-k", "8",
                 "--top-m", "5"]) == 0
    got = pd.read_parquet(out)
    want = significant_terms(index_dir, corpus, [(1, "def parse merge")],
                             fg_k=8, top_m=5)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
