"""Query profiling: deterministic columns (df_sum, candidates) verified
against the oracle index; timings present and sane."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.oracle import OracleIndex
from splade_ray.profile import PROFILE_COLUMNS, profile_search

N = 100


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=19)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(N, dtype=np.int64)),
                  "content": t["content"]}),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=25)
    return index_dir, t["content"].to_pylist()


def test_profile_deterministic_columns(built):
    index_dir, texts = built
    queries = [(1, "def parse merge"), (2, "zzz_nope")]
    prof = profile_search(index_dir, queries, BM25Params(top_k=5))
    assert list(prof.columns) == PROFILE_COLUMNS
    # 4 segments x 2 queries
    assert len(prof) == 8 and prof["segment"].nunique() == 4
    oi = OracleIndex(list(range(N)), texts)
    # df_sum summed over segments equals the corpus posting mass of the
    # query's present terms; candidates sum to the match count
    for qid, text in queries:
        g = prof[prof["query_id"] == qid]
        want_df = sum(
            len(oi.postings[t][0]) for t in term_counts(text)
            if t in oi.postings
        )
        assert g["df_sum"].sum() == want_df
        m = np.zeros(N, bool)
        for t in term_counts(text):
            if t in oi.postings:
                m[oi.postings[t][0]] = True
        assert g["n_candidates"].sum() == int(m.sum())
    assert (prof["decode_ms"] >= 0).all() and (prof["score_ms"] >= 0).all()


def test_cli_profile_and_postings(built, tmp_path, capsys):
    import json

    from splade_ray.cli import main

    index_dir, texts = built
    queries = tmp_path / "q.tsv"
    queries.write_text("1\tdef parse\n")
    out = str(tmp_path / "prof.parquet")
    assert main(["profile", "--index", index_dir, "--queries", str(queries),
                 "--out", out]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 4  # 4 segments x 1 query

    pout = str(tmp_path / "post.parquet")
    assert main(["postings", "--index", index_dir, "--term", "def",
                 "--out", pout]) == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    from splade_ray.analysis import term_counts

    want_df = sum(1 for t in texts if "def" in term_counts(t))
    assert info["df"] == want_df
