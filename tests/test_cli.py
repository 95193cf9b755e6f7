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
