"""CLI entry-point tests: build → query → evaluate → stats, filesystem as
the inter-stage contract (the reference's ``splade.all`` flow,
``splade/all.py:14-21`` minus training)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.cli import main

DOCS = [
    "def hash_join(left, right): return merge(left, right)",
    "class SortMerge: pass",
    "select * from table where value > 0",
    "fn vector_scan(v: Vec<f32>) -> f32 { v.iter().sum() }",
    "stream window aggregate over rows",
]


@pytest.fixture()
def corpus_dir(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    t = pa.table(
        {
            "repo": pa.array(["r"] * len(DOCS)),
            "path": pa.array([f"f{i}.py" for i in range(len(DOCS))]),
            "commit": pa.array(["c"] * len(DOCS)),
            "lang": pa.array(["py"] * len(DOCS)),
            "content": pa.array(DOCS),
        }
    )
    pq.write_table(t, str(d / "corpus-000.parquet"))
    return str(d)


def test_cli_all_flow(ray_session, corpus_dir, tmp_path, capsys):
    index = str(tmp_path / "index")
    out = tmp_path / "out"
    out.mkdir()
    queries = tmp_path / "queries.tsv"
    queries.write_text("0\thash_join merge\n1\tstream window\n")
    qrel = tmp_path / "qrel.json"
    qrel.write_text(json.dumps({"0": {"0": 1}, "1": {"4": 1}}))

    rc = main(
        [
            "all", "--corpus", corpus_dir, "--index", index,
            "--queries", str(queries), "--qrel", str(qrel),
            "--out", str(out), "--rows-per-segment", "2", "--top-k", "3",
        ]
    )
    assert rc == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    build_out, query_out, eval_out = lines
    assert build_out["n_docs"] == 5 and build_out["n_segments"] == 3
    assert query_out["queries"] == 2
    run = json.load(open(out / "run.json"))
    assert list(run["0"])[0] == "0"  # hash join -> doc 0 ranked first
    assert list(run["1"])[0] == "4"
    assert eval_out["mrr@3"] == 1.0 and eval_out["recall@3"] == 1.0

    # stats subcommand reads the built index
    rc = main(["stats", "--index", index])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip())
    assert stats["n_docs"] == 5 and stats["n_terms"] > 0


def test_cli_build_resume(ray_session, corpus_dir, tmp_path, capsys):
    index = str(tmp_path / "idx2")
    for expected_skipped in (0, 3):
        rc = main(["build", "--corpus", corpus_dir, "--index", index,
                   "--rows-per-segment", "2"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["n_segments_skipped"] == expected_skipped


def test_cli_maintain(ray_session, tmp_path, capsys):
    """maintain: compacts to the segment budget and refreshes the quantized
    layer; the served results are unchanged."""
    import json

    import pandas as pd

    from splade_ray.bm25 import BM25Params
    from splade_ray.build import build_index
    from splade_ray.cli import main
    from splade_ray.corpus import write_synth_corpus
    from splade_ray.query import search

    corpus = str(tmp_path / "c")
    write_synth_corpus(corpus, 200, seed=4, n_files=2)
    idx = str(tmp_path / "i")
    build_index(corpus, idx, text_col="content", rows_per_segment=25)
    before = search(idx, [(0, "def parse"), (1, "rare_token_20")], BM25Params(top_k=5))

    assert main(["maintain", "--index", idx, "--max-segments", "2", "--quantize"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["compacted"] and rep["quantized"] and rep["n_segments"] <= 2

    after = search(idx, [(0, "def parse"), (1, "rare_token_20")], BM25Params(top_k=5))
    pd.testing.assert_frame_equal(before, after)
    quant = search(idx, [(0, "def parse"), (1, "rare_token_20")],
                   BM25Params(top_k=5), method="quantized")
    assert len(quant) == len(before)
