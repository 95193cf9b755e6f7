"""Percolator tests: brute-force parity for both modes, randomized set."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.analysis import term_counts
from splade_ray.corpus import synth_corpus
from splade_ray.percolate import percolate_df


@pytest.fixture()
def docs(ray_session):
    t = synth_corpus(120, seed=11)
    texts = t["content"].to_pylist()
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
    ).repartition(4)
    return ds, texts


QUERIES = [
    (1, "def parse"),
    (2, "return"),
    (3, "merge sort fetch"),
    (4, "zzz_nosuchterm"),
    (5, ""),  # analyzes to nothing -> never matches
]


def _brute(texts, queries, mode):
    out = []
    for i, tx in enumerate(texts):
        doc_terms = set(term_counts(tx))
        for qid, q in queries:
            qt = set(term_counts(q))
            if not qt:
                continue
            hits = len(qt & doc_terms)
            if (mode == "all" and hits == len(qt)) or (mode == "any" and hits >= 1):
                out.append((i, qid))
    return sorted(out)


@pytest.mark.parametrize("mode", ["all", "any"])
def test_percolate_matches_bruteforce(docs, mode):
    ds, texts = docs
    got = percolate_df(ds, QUERIES, mode=mode)
    assert list(map(tuple, got.values)) == _brute(texts, QUERIES, mode)
    assert 5 not in got["query_id"].values


def test_percolate_randomized(docs):
    import random

    ds, texts = docs
    rng = random.Random(7)
    vocab = sorted({t for tx in texts[:40] for t in term_counts(tx)})
    queries = [
        (qid, " ".join(rng.sample(vocab, rng.randint(1, 4)))) for qid in range(30)
    ]
    for mode in ("all", "any"):
        got = percolate_df(ds, queries, mode=mode)
        assert list(map(tuple, got.values)) == _brute(texts, queries, mode)


def test_cli_percolate(ray_session, tmp_path, capsys):
    import json

    import pandas as pd
    import pyarrow.parquet as pq

    from splade_ray.cli import main

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["alert on merge failure", "all quiet"]),
            }
        ),
        str(d / "p.parquet"),
    )
    q = tmp_path / "q.tsv"
    q.write_text("7\tmerge failure\n8\tquiet\n")
    out = str(tmp_path / "hits.parquet")
    assert main(["percolate", "--corpus", str(d), "--queries", str(q),
                 "--out", out]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["matches"] == 2
    hits = pd.read_parquet(out)
    assert list(map(tuple, hits.values)) == [(0, 7), (1, 8)]
