"""End-to-end BEIR composition (round-2 VERDICT item 5): corpus.jsonl ->
canonical parquet -> index -> retrieve -> self-hit filter -> metrics, with
MRR/nDCG asserted against a hand-checked tiny qrel."""

import json
import os

import pytest

from splade_ray.bm25 import BM25Params


def _write_beir_fixture(root):
    os.makedirs(os.path.join(root, "qrels"), exist_ok=True)
    docs = [
        {"_id": "d1", "title": "apple pie", "text": "apple pie recipe with cinnamon"},
        {"_id": "d2", "title": "banana bread", "text": "banana bread baking guide"},
        {"_id": "d3", "title": "apple tart", "text": "french apple tart with butter"},
        {"_id": "d4", "title": "", "text": "unrelated database indexing article"},
        # quora-style self-hit: a "document" that IS query q1
        {"_id": "q1", "title": "", "text": "apple dessert"},
    ]
    with open(os.path.join(root, "corpus.jsonl"), "w") as fh:
        for d in docs:
            fh.write(json.dumps(d) + "\n")
    queries = [
        {"_id": "q1", "text": "apple dessert"},
        {"_id": "q2", "text": "banana baking"},
    ]
    with open(os.path.join(root, "queries.jsonl"), "w") as fh:
        for q in queries:
            fh.write(json.dumps(q) + "\n")
    with open(os.path.join(root, "qrels", "test.tsv"), "w") as fh:
        fh.write("query-id\tcorpus-id\tscore\n")
        fh.write("q1\td1\t1\nq1\td3\t1\nq2\td2\t1\n")


def test_beir_eval_end_to_end(ray_session, tmp_path):
    from splade_ray.pipelines.beir import beir_eval

    data = str(tmp_path / "beir")
    _write_beir_fixture(data)
    res = beir_eval(
        data,
        str(tmp_path / "work"),
        params=BM25Params(top_k=5),
        measures=["mrr@5", "recall@5", "ndcg@5", "map@5"],
        rows_per_segment=2,  # multiple segments on 5 docs
    )
    run, metrics = res["run"], res["metrics"]
    # self-hit dropped: q1's corpus twin never appears in q1's run
    q1 = run[run["query_id"] == "q1"]
    assert "q1" not in set(q1["doc_id"])
    assert q1["rank"].tolist() == list(range(1, len(q1) + 1))
    # hand-checked: "apple" hits d1/d3 for q1 (self-hit excluded), and only
    # d2 contains both banana+baking-adjacent terms for q2
    assert set(q1.head(2)["doc_id"]) == {"d1", "d3"}
    q2 = run[run["query_id"] == "q2"]
    assert q2.iloc[0]["doc_id"] == "d2"
    # both queries rank a relevant doc first -> MRR 1.0; q1 recalls both
    # relevant docs within k -> recall 1.0; AP(q1)=1.0, AP(q2)=1.0 -> MAP 1.0
    assert metrics["mrr@5"] == pytest.approx(1.0)
    assert metrics["recall@5"] == pytest.approx(1.0)
    assert metrics["map@5"] == pytest.approx(1.0)
    assert 0.9 < metrics["ndcg@5"] <= 1.0


def test_beir_eval_cli(ray_session, tmp_path, capsys):
    from splade_ray.cli import main

    data = str(tmp_path / "beir")
    _write_beir_fixture(data)
    out_json = str(tmp_path / "metrics.json")
    rc = main(
        [
            "beir-eval", "--data", data, "--work", str(tmp_path / "w"),
            "--measures", "ndcg@5,recall@5", "--out", out_json,
        ]
    )
    assert rc == 0
    with open(out_json) as fh:
        metrics = json.load(fh)
    assert set(metrics) == {"ndcg@5", "recall@5"}
    assert metrics["recall@5"] == pytest.approx(1.0)
