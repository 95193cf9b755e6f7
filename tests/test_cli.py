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


def test_cli_figure(ray_session, tmp_path, capsys):
    """index_figure analog: index_dist.json + a valid SVG next to the index."""
    import json as _json
    import os
    import xml.etree.ElementTree as ET

    from splade_ray.cli import main
    from splade_ray.corpus import write_synth_corpus

    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    write_synth_corpus(corpus, 120, seed=5, n_files=1)
    assert main(["build", "--corpus", corpus, "--index", idx,
                 "--rows-per-segment", "60"]) == 0
    capsys.readouterr()
    assert main(["figure", "--index", idx]) == 0
    stats = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_terms"] > 10 and stats["max_df"] >= stats["median_df"]
    with open(os.path.join(idx, "index_dist.json")) as fh:
        dist = _json.load(fh)
    assert len(dist) == stats["n_terms"]
    assert "def" in dist  # ubiquitous token present
    ET.parse(os.path.join(idx, "index_dist.svg"))  # well-formed SVG


def test_cli_rerank(ray_session, tmp_path, capsys):
    """rerank CLI: first-stage run -> pairs join -> lexical scorer -> run."""
    import json as _json

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_ray.cli import main
    from splade_ray.io import read_run_json, write_run_json

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                ["apple pie recipe", "banana bread", "apple tart butter"], pa.string()
            ),
        }
    )
    docs_path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, docs_path)
    run = pd.DataFrame(
        {"query_id": [0, 0, 0], "rank": [1, 2, 3], "doc_id": [2, 1, 3],
         "score": [3.0, 2.0, 1.0]}
    )
    run_path = str(tmp_path / "run.json")
    write_run_json(run, run_path)
    queries = tmp_path / "q.tsv"
    queries.write_text("0\tapple butter\n")
    out_path = str(tmp_path / "rerank.json")
    rc = main(["rerank", "--run", run_path, "--queries", str(queries),
               "--docs", docs_path, "--out", out_path])
    assert rc == 0
    out = read_run_json(out_path)
    # doc 3 matches both "apple" and "butter" -> overlap 2, must rank first
    assert out[out["rank"] == 1]["doc_id"].iloc[0] == 3


def test_cli_dedup(ray_session, tmp_path, capsys):
    d = tmp_path / "docs"
    d.mkdir()
    texts = ["a b c d e f g h", "a b c d e f g h", "x y z w v u t s",
             "unique document one", "unique document two"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
            }
        ),
        str(d / "part-0.parquet"),
    )
    out = str(tmp_path / "dedup_out")
    rc = main(["dedup", "--corpus", str(d), "--out", out,
               "--methods", "exact,minhash"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # docs 0,1 are identical -> one survivor; everything else unpaired
    assert summary["n_dropped"] == 1
    assert summary["n_survivors"] == 4
    import ray.data as rd

    clusters = rd.read_parquet(out + "/clusters").to_pandas()
    assert dict(zip(clusters["doc_id"], clusters["cluster_id"])) == {0: 0, 1: 0}
    surv = rd.read_parquet(out + "/survivors").to_pandas()
    assert sorted(surv["doc_id"].tolist()) == [0, 2, 3, 4]
    assert set(surv.columns) == {"doc_id", "text", "lang"}

    # resumability: pair tables are checkpointed per method; a rerun skips
    # both finished methods and reproduces identical outputs
    import os

    assert os.path.exists(out + "/pairs/exact/_DONE")
    assert os.path.exists(out + "/pairs/minhash/_DONE")
    rc = main(["dedup", "--corpus", str(d), "--out", out,
               "--methods", "exact,minhash"])
    assert rc == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["methods_skipped"] == ["exact", "minhash"]
    assert summary2["n_survivors"] == 4 and summary2["n_dropped"] == 1
    surv2 = rd.read_parquet(out + "/survivors").to_pandas()
    assert sorted(surv2["doc_id"].tolist()) == [0, 2, 3, 4]

    # partial resume: one method unfinished -> only it regenerates, and a
    # jaccard method added later generates OVERLAPPED with it
    import shutil
    os.remove(out + "/pairs/minhash/_DONE")
    shutil.rmtree(out + "/pairs/minhash")
    rc = main(["dedup", "--corpus", str(d), "--out", out,
               "--methods", "exact,minhash,jaccard"])
    assert rc == 0
    summary3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary3["methods_skipped"] == ["exact"]
    assert summary3["n_survivors"] == 4 and summary3["n_dropped"] == 1


def test_cli_positions_phrase_boolsearch(ray_session, tmp_path, capsys):
    """positions -> phrase -> boolsearch CLI flow over a synth corpus."""
    import json
    import pandas as pd

    from splade_ray.cli import main
    from splade_ray.corpus import write_synth_corpus

    corpus = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    write_synth_corpus(corpus, 100, seed=9, n_files=1)
    assert main(["build", "--corpus", corpus, "--index", idx,
                 "--rows-per-segment", "40"]) == 0
    capsys.readouterr()
    assert main(["positions", "--index", idx]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["n_segments"] == 3 and rep["n_segments_skipped"] == 0

    phrases = str(tmp_path / "p.tsv")
    with open(phrases, "w") as fh:
        fh.write("1\tdef\n2\tzzz not_here\n")
    pout = str(tmp_path / "phrase.parquet")
    assert main(["phrase", "--index", idx, "--phrases", phrases, "--out", pout]) == 0
    res = pd.read_parquet(pout)
    assert (res["phrase_id"] == 1).sum() > 0  # 'def' is ubiquitous
    assert (res["phrase_id"] == 2).sum() == 0

    bq = str(tmp_path / "bq.json")
    with open(bq, "w") as fh:
        json.dump([[1, {"must": "def", "should": "parse"}],
                   [2, {"must": "zzz"}]], fh)
    bout = str(tmp_path / "bool.parquet")
    capsys.readouterr()
    assert main(["boolsearch", "--index", idx, "--queries", bq,
                 "--out", bout, "--top-k", "5"]) == 0
    run = pd.read_parquet(bout)
    assert set(run["query_id"]) == {1} and len(run) == 5


def test_cli_sample(ray_session, tmp_path, capsys):
    import json
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_ray.cli import main

    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(500, dtype=np.int64),
                  "text": ["x"] * 500}),
        corpus,
    )
    out1 = str(tmp_path / "s1")
    assert main(["sample", "--corpus", corpus, "--out", out1,
                 "--mode", "hash", "--rate", "0.2", "--seed", "3"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.1 < rep["rows"] / 500 < 0.3

    out2 = str(tmp_path / "s2.parquet")
    assert main(["sample", "--corpus", corpus, "--out", out2,
                 "--mode", "bottomk", "--k", "25"]) == 0
    assert len(pd.read_parquet(out2)) == 25

    out3 = str(tmp_path / "s3")
    assert main(["sample", "--corpus", corpus, "--out", out3,
                 "--mode", "split", "--fractions", "a=0.5,b=0.5"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 500


def test_cli_curate(ray_session, tmp_path, capsys):
    d = tmp_path / "raw"
    d.mkdir()
    texts = [
        "alpha beta gamma delta the and",            # 0: eval slice (id%10==0)
        "start alpha beta gamma delta the of end",   # 1: contaminated 4-gram
        "the and data table merge quick brown fox",  # 2: dup of 3 (kept, min id)
        "the and data table merge quick brown fox",  # 3: dropped by dedup
        "1 2 3 4 5",                                 # 4: fails gopher rules
        "contact the and office via bob@corp.io today",  # 5: email redacted
        "the and some other normal words here okay", # 6: clean
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
            }
        ),
        str(d / "part-0.parquet"),
    )
    out = str(tmp_path / "curated")
    argv = ["curate", "--corpus", str(d), "--out", out,
            "--min-words", "5", "--budget", "10"]
    rc = main(argv)
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["stages_skipped"] == []
    assert summary["n_input"] == 7
    # quality drops doc 4; dedup drops doc 3; decontam removes the eval
    # slice (doc 0) and the contaminated doc 1; redact/pack keep rows
    assert summary["rows_after"] == {
        "quality": 6, "dedup": 5, "decontam": 3, "redact": 3, "pack": 3
    }

    import ray.data as rd

    final = rd.read_parquet(out + "/pack").to_pandas().sort_values("doc_id")
    assert final["doc_id"].tolist() == [2, 5, 6]
    assert final.loc[final["doc_id"] == 5, "text"].iloc[0] == (
        "contact the and office via <EMAIL> today"
    )
    # redacted text has 8+7+8 tokens in id order; budget 10 ->
    # exclusive cumsums 0, 8, 15 -> packs 0, 0, 1
    assert final["pack_id"].tolist() == [0, 0, 1]
    assert set(final.columns) == {"doc_id", "text", "lang", "pack_id"}

    # resume: every stage skips, counts identical
    rc = main(argv)
    assert rc == 0
    summary2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary2["stages_skipped"] == summary["stages"]
    assert summary2["rows_after"] == summary["rows_after"]


def test_cli_fsearch_snippets(ray_session, corpus_dir, tmp_path, capsys):
    """fsearch over (path, content) field indexes; snippets over the run."""
    import pandas as pd

    idx_c = str(tmp_path / "idx-content")
    idx_p = str(tmp_path / "idx-path")
    for col, idx in (("content", idx_c), ("path", idx_p)):
        assert main(["build", "--corpus", corpus_dir, "--index", idx,
                     "--text-col", col, "--rows-per-segment", "3"]) == 0
    queries = tmp_path / "q.tsv"
    queries.write_text("0\thash join merge\n1\twindow rows\n")
    run_path = str(tmp_path / "run.parquet")
    rc = main([
        "fsearch",
        "--index-field", f"content={idx_c}", "--index-field", f"path={idx_p}",
        "--weight", "content=1.0", "--weight", "path=3.0",
        "--queries", str(queries), "--out", run_path, "--top-k", "3",
    ])
    assert rc == 0
    run = pd.read_parquet(run_path)
    assert len(run) > 0 and set(run.columns) == {"query_id", "rank", "doc_id", "score"}

    # the built index assigned dense ids; the raw corpus lacks an id column,
    # so snippet against a doc_id-bearing copy (ids = global row position,
    # matching the build's dense assignment)
    snip_path = str(tmp_path / "snips.parquet")
    import pyarrow.parquet as _pq
    import pyarrow as _pa

    src = _pq.read_table(corpus_dir + "/corpus-000.parquet")
    with_ids = src.append_column("doc_id", _pa.array(range(src.num_rows), _pa.int64()))
    idc = str(tmp_path / "with_ids.parquet")
    _pq.write_table(with_ids, idc)
    rc = main([
        "snippets", "--corpus", idc, "--run", run_path,
        "--queries", str(queries), "--out", snip_path,
        "--window", "4", "--text-col", "content",
    ])
    assert rc == 0
    snips = pd.read_parquet(snip_path)
    assert set(snips.columns) == {"query_id", "doc_id", "start", "n_match", "snippet"}
    assert len(snips) == len(run)
    assert (snips["n_match"] >= 1).all()  # every BM25 hit contains a query term


def test_cli_trigrams_grep(ray_session, corpus_dir, tmp_path, capsys):
    """trigram layer build + pruned literal grep + full-scan regex grep."""
    import json as _json

    import pandas as pd

    idx = str(tmp_path / "idx")
    assert main(["build", "--corpus", corpus_dir, "--index", idx,
                 "--rows-per-segment", "3"]) == 0
    assert main(["trigrams", "--index", idx]) == 0
    capsys.readouterr()

    needles = tmp_path / "n.tsv"
    needles.write_text("0\tmerge\n1\tzzz_absent\n2\tSELECT *\n")
    out = str(tmp_path / "hits.parquet")
    assert main(["grep", "--index", idx, "--needles", str(needles),
                 "--out", out]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["needles"] == 3
    hits = pd.read_parquet(out)
    got = {(r.query_id, r.doc_id): r.n_occurrences for r in hits.itertuples()}
    assert got == {(0, 0): 1, (0, 1): 1, (2, 2): 1}  # sortmerge contains 'merge'

    # regex requires the full-scan path
    pats = tmp_path / "p.tsv"
    pats.write_text("0\tmerge\\(\\w+\n")
    out2 = str(tmp_path / "re.parquet")
    assert main(["grep", "--corpus", corpus_dir, "--needles", str(pats),
                 "--regex", "--text-col", "content", "--id-col", "path",
                 "--out", out2]) == 0
    re_hits = pd.read_parquet(out2)
    assert list(re_hits["path"]) == ["f0.py"]


def test_cli_curate_dupspans_stage(ray_session, tmp_path, capsys):
    d = tmp_path / "raw"
    d.mkdir()
    boiler = "copyright acme corp all rights reserved"
    texts = [
        f"alpha beta {boiler} gamma delta",
        f"one two three {boiler} four five",
        "totally unique content here with nothing shared",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
            }
        ),
        str(d / "part-0.parquet"),
    )
    out = str(tmp_path / "curated")
    rc = main([
        "curate", "--corpus", str(d), "--out", out,
        "--stages", "dupspans", "--dup-k", "4",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_after"] == {"dupspans": 3}

    import ray.data as rd

    got = rd.read_parquet(out + "/dupspans").to_pandas().sort_values("doc_id")
    assert got.loc[got["doc_id"] == 0, "text"].iloc[0] == "alpha beta gamma delta"
    assert got.loc[got["doc_id"] == 1, "text"].iloc[0] == "one two three four five"
    assert got.loc[got["doc_id"] == 2, "text"].iloc[0] == texts[2]
    assert set(got.columns) == {"doc_id", "text", "lang"}


def test_cli_dv_synsearch_wildcard(ray_session, tmp_path, capsys):
    """dv (range/sort/count/hist) + synsearch + suggest --mode wildcard over
    an index with a numeric doc-values column."""
    import json as _json

    import pandas as pd

    d = tmp_path / "corpus"
    d.mkdir()
    docs = [
        "def hash_join(left, right): return merge(left, right)",
        "fn hash_probe(build, probe) { return probe }",
        "class SortMerge: pass",
        "stream window aggregate over rows",
        "def merge_sort(xs): return xs",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "content": pa.array(docs),
            "n_bytes": pa.array([len(x) for x in docs], pa.int64()),
        }
    )
    pq.write_table(t, str(d / "c-000.parquet"))
    index = str(tmp_path / "index")
    assert main(["build", "--corpus", str(d), "--index", index,
                 "--id-col", "doc_id", "--rows-per-segment", "2",
                 "--extra-doc-cols", "n_bytes"]) == 0
    queries = tmp_path / "q.tsv"
    queries.write_text("0\thash merge\n1\twindow rows\n")

    for mode, extra in (
        ("range", ["--col", "n_bytes", "--lo", "30", "--hi", "60"]),
        ("sort", ["--col", "n_bytes"]),
        ("count", []),
        ("hist", ["--col", "n_bytes", "--interval", "20"]),
    ):
        out = str(tmp_path / f"dv-{mode}.parquet")
        rc = main(["dv", "--index", index, "--queries", str(queries),
                   "--out", out, "--mode", mode, *extra])
        assert rc == 0, mode
        assert len(pd.read_parquet(out)) > 0, mode
    counts = pd.read_parquet(str(tmp_path / "dv-count.parquet"))
    # default analyzer keeps hash_join/hash_probe as single tokens, so
    # "hash merge" matches only doc0 (standalone "merge")
    assert counts["n_docs"].tolist() == [1, 1]

    syn = tmp_path / "syn.json"
    syn.write_text(_json.dumps({"hash": ["merge"]}))
    out = str(tmp_path / "syn.parquet")
    assert main(["synsearch", "--index", index, "--queries", str(queries),
                 "--synonyms", str(syn), "--out", out, "--top-k", "3"]) == 0
    assert len(pd.read_parquet(out)) > 0

    wq = tmp_path / "wq.tsv"
    wq.write_text("0\thash*\n")
    out = str(tmp_path / "wild.parquet")
    assert main(["suggest", "--index", index, "--queries", str(wq),
                 "--out", out, "--mode", "wildcard", "--top-k", "5"]) == 0
    wild = pd.read_parquet(out)
    assert set(wild["doc_id"]) == {0, 1}  # hash_join + hash_probe docs


def test_cli_curate_dsir_stage(ray_session, tmp_path, capsys):
    """curate --stages dsir: keeps the --dsir-keep docs closest to the
    target distribution under deterministic Gumbel top-k."""
    import numpy as np

    d = tmp_path / "raw"
    d.mkdir()
    codey = [f"def fn{i} of x return x plus add {i}" for i in range(6)]
    prose = [f"the quick brown fox jumps over the lazy dog {i}" for i in range(6)]
    texts = codey + prose
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
            }
        ),
        str(d / "part-0.parquet"),
    )
    tgt = tmp_path / "target"
    tgt.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([100, 101], pa.int64()),
                "text": pa.array(
                    ["the quick brown fox jumps over the lazy dog again",
                     "the slow brown fox walks past the lazy dog today"]
                ),
            }
        ),
        str(tgt / "part-0.parquet"),
    )
    out = str(tmp_path / "curated")
    rc = main(["curate", "--corpus", str(d), "--out", out,
               "--stages", "dsir", "--dsir-target", str(tgt),
               "--dsir-keep", "6", "--dsir-buckets", "512"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_after"] == {"dsir": 6}

    import ray.data as rd

    kept = sorted(rd.read_parquet(out + "/dsir").to_pandas()["doc_id"])
    # the prose docs match the target n-gram distribution; code docs don't
    assert kept == list(range(6, 12)), kept


def test_cli_curate_ppl_stage(ray_session, tmp_path, capsys):
    """curate --stages ppl: the CCNet LM filter keeps reference-like docs
    and drops high-perplexity ones under the fitted bigram LM."""
    import pandas as pd

    d = tmp_path / "raw"
    d.mkdir()
    proselike = [
        f"the quick brown fox jumps over the lazy dog {i}" for i in range(4)
    ]
    garbage = ["zxq9 vbnm qq wert hjkl zz pp mm nn gg", "qqq www eee rrr ttt"]
    texts = proselike + garbage
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}),
        str(d / "part-0.parquet"),
    )
    tgt = tmp_path / "ref"
    tgt.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array([100, 101], pa.int64()),
                  "text": pa.array(
                      ["the quick brown fox jumps over the lazy dog",
                       "a quick brown dog runs past the lazy fox"])}),
        str(tgt / "part-0.parquet"),
    )
    from splade_ray.io import read_parquet_clean
    from splade_ray.ops.curation import ngram_lm_fit, ngram_lm_scores

    fit = ngram_lm_fit(read_parquet_clean(str(tgt)), n=2, n_buckets=4096)
    scores = ngram_lm_scores(
        read_parquet_clean(str(d)), fit
    ).to_pandas().set_index("doc_id")
    # threshold between the two populations
    cut = (scores.loc[:3, "ppl"].max() + scores.loc[4:, "ppl"].min()) / 2
    out = str(tmp_path / "curated")
    rc = main(["curate", "--corpus", str(d), "--out", out,
               "--stages", "ppl", "--ppl-target", str(tgt),
               "--ppl-max", str(cut), "--ppl-buckets", "4096"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_after"] == {"ppl": 4}
    kept = pd.read_parquet(out + "/ppl")
    assert sorted(kept["doc_id"]) == [0, 1, 2, 3]


def test_cli_rescore_and_ctsearch(ray_session, corpus_dir, tmp_path, capsys):
    index = str(tmp_path / "index")
    assert main(["build", "--corpus", corpus_dir, "--index", index,
                 "--rows-per-segment", "3"]) == 0
    assert main(["positions", "--index", index]) == 0
    queries = tmp_path / "q.tsv"
    queries.write_text("0\thash_join merge\n1\tstream window\n")
    out1 = str(tmp_path / "rescore.parquet")
    assert main(["rescore", "--index", index, "--queries", str(queries),
                 "--out", out1, "--window-size", "5", "--top-k", "3"]) == 0
    r = pq.read_table(out1).to_pandas()
    assert set(r.columns) == {"query_id", "rank", "doc_id", "score"}
    assert len(r) > 0
    out2 = str(tmp_path / "ct.parquet")
    assert main(["ctsearch", "--index", index, "--queries", str(queries),
                 "--out", out2, "--cutoff", "0.5", "--top-k", "3"]) == 0
    c = pq.read_table(out2).to_pandas()
    assert len(c) > 0


def test_cli_route_build_and_search(ray_session, tmp_path, capsys):
    import numpy as np

    d = tmp_path / "rcorpus"
    d.mkdir()
    n = 40
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "content": pa.array([DOCS[i % len(DOCS)] for i in range(n)]),
            "tenant": pa.array([f"t{i % 7}" for i in range(n)]),
        }
    )
    pq.write_table(t, str(d / "c.parquet"))
    index = str(tmp_path / "ridx")
    rc = main(
        ["route-build", "--corpus", str(d), "--index", index,
         "--routing-col", "tenant", "--n-buckets", "4",
         "--rows-per-segment", "10"]
    )
    assert rc == 0
    manifest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert manifest["n_docs"] == n and manifest["n_buckets"] == 4

    queries = tmp_path / "rq.tsv"
    queries.write_text("0\thash_join merge\n")
    out = str(tmp_path / "rrun.parquet")
    rc = main(
        ["route-search", "--index", index, "--queries", str(queries),
         "--out", out, "--routing", "t1,t3", "--top-k", "5"]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] > 0
    run = pq.read_table(out).to_pandas()
    from splade_ray.routing import routing_bucket

    probed = set(routing_bucket(["t1", "t3"], 4).tolist())
    assert set(run["bucket"]) <= probed


def test_cli_sample_mix(ray_session, tmp_path, capsys):
    import numpy as np

    d = tmp_path / "mcorpus"
    d.mkdir()
    n = 300
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "content": pa.array(["text"] * n),
            "lang": pa.array([f"l{i % 3}" for i in range(n)]),
        }
    )
    pq.write_table(t, str(d / "c.parquet"))
    out = str(tmp_path / "mix_out")
    rc = main(
        ["sample", "--corpus", str(d), "--out", out, "--mode", "mix",
         "--group-col", "lang", "--alpha", "0.5", "--k", "60"]
    )
    assert rc == 0
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert info["rows"] == 60
    import pyarrow.dataset as pads

    got = pads.dataset(out).to_table().to_pandas()
    assert len(got) == 60
    assert got.groupby("lang").size().max() <= 21  # l-groups are equal-sized


def test_cli_ann_build_search_brute(ray_session, tmp_path, capsys):
    import numpy as np

    rng = np.random.RandomState(3)
    n, d = 200, 16
    vecs = rng.normal(size=(n, d))
    emb = tmp_path / "emb"
    emb.mkdir()
    pq.write_table(
        pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(vecs.tolist())}),
        str(emb / "e.parquet"),
    )
    qp = str(tmp_path / "q.parquet")
    pq.write_table(
        pa.table({"query_id": pa.array(np.arange(3, dtype=np.int64)),
                  "embedding": pa.array(vecs[:3].tolist())}),
        qp,
    )
    idx = str(tmp_path / "annidx")
    assert main(["ann", "--mode", "build", "--kind", "ivfpq",
                 "--embeddings", str(emb), "--index", idx,
                 "--n-clusters", "4", "--m", "4", "--ks", "16"]) == 0
    out = str(tmp_path / "run.parquet")
    assert main(["ann", "--mode", "search", "--kind", "ivfpq",
                 "--index", idx, "--queries", qp, "--nprobe", "4",
                 "--top-k", "5", "--out", out]) == 0
    run = pq.read_table(out).to_pandas()
    assert len(run) == 15
    # each query's own vector ranks #1 at full probe
    top1 = run[run["rank"] == 1].set_index("query_id")["vec_id"]
    assert (top1.loc[i] == i for i in range(3))
    bout = str(tmp_path / "brute.parquet")
    assert main(["ann", "--mode", "brute", "--embeddings", str(emb),
                 "--queries", qp, "--top-k", "5", "--out", bout]) == 0
    brute = pq.read_table(bout).to_pandas()
    assert (brute[brute["rank"] == 1].set_index("query_id")["vec_id"]
            == [0, 1, 2]).all()


def test_cli_sample_shards(ray_session, tmp_path, capsys):
    import json
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_ray.cli import main

    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({"doc_id": np.arange(200, dtype=np.int64),
                  "text": ["x"] * 200}),
        corpus,
    )
    out = tmp_path / "shards"
    assert main(["sample", "--corpus", corpus, "--out", str(out),
                 "--mode", "shards", "--n-shards", "4", "--seed", "7"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["rows"] == 200
    files = sorted(out.glob("shard=*.parquet"))
    assert files
    got = pd.concat([pd.read_parquet(f) for f in files])
    assert sorted(got["doc_id"]) == list(range(200))


def test_cli_classify(ray_session, tmp_path, capsys):
    import json
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from splade_ray.cli import main

    rng = np.random.RandomState(3)
    good = ["theorem proof lemma rigorous", "careful analysis converges"]
    bad = ["click here buy now", "free prize claim today"]
    rows = []
    for i in range(160):
        lab = i % 2
        words = (good if lab else bad)[rng.randint(2)].split()
        rng.shuffle(words)
        rows.append((i, " ".join(words), lab))
    corpus = str(tmp_path / "labeled.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                  "text": [r[1] for r in rows],
                  "label": pa.array([r[2] for r in rows], pa.int64())}),
        corpus,
    )
    model = str(tmp_path / "clf.npz")
    assert main(["classify", "train", "--corpus", corpus, "--model", model,
                 "--dim", "4096", "--iters", "25", "--lr", "30",
                 "--grad-method", "sparse"]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["final_loss"] < 0.2

    out = str(tmp_path / "scored")
    assert main(["classify", "score", "--corpus", corpus, "--model", model,
                 "--out", out, "--min-score", "0.5"]) == 0
    scored = pd.read_parquet(out)
    assert set(scored["label"]) == {1}  # separable corpus: only good kept
    assert (scored["quality_score"] >= 0.5).all()


def test_cli_round4_subcommands(ray_session, tmp_path, capsys):
    """facet-stats / fragments / unit-dedup / url-dedup / semdedup smoke:
    each runs end-to-end and writes its parquet output."""
    import numpy as np
    import ray.data as rd

    from splade_ray.build import build_index

    d = tmp_path / "docs"
    d.mkdir()
    texts = ["hash join merge. hash join merge.", "stream window agg",
             "hash join merge. other text", "unique sentence here"]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en", "fr", "en", "fr"]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "url": pa.array([
                "HTTP://WWW.a.com:80/x/", "http://a.com/x?utm_source=f",
                "http://b.com/y", "http://b.com/y#frag"]),
        }),
        str(d / "part-0.parquet"),
    )
    index = str(tmp_path / "index")
    build_index(str(d), index, text_col="text", id_col="doc_id",
                rows_per_segment=2, extra_doc_cols=("lang", "n_chars"))
    queries = tmp_path / "q.tsv"
    queries.write_text("0\thash join\n1\tstream window\n")

    out1 = str(tmp_path / "fs.parquet")
    assert main(["facet-stats", "--index", index, "--queries", str(queries),
                 "--facet-col", "lang", "--metric-col", "n_chars",
                 "--out", out1]) == 0
    fs = pq.read_table(out1).to_pandas()
    assert {"facet", "n_docs", "sum_v", "avg_v"} <= set(fs.columns)
    assert len(fs) > 0

    out2 = str(tmp_path / "frag.parquet")
    assert main(["fragments", "--index", index, "--corpus", str(d),
                 "--queries", str(queries), "--out", out2,
                 "--window", "3", "--n-fragments", "2"]) == 0
    frag = pq.read_table(out2).to_pandas()
    assert (frag["n_match"] > 0).all() and len(frag) > 0

    out3 = str(tmp_path / "ud")
    assert main(["unit-dedup", "--corpus", str(d), "--out", out3]) == 0
    ud = rd.read_parquet(out3).to_pandas().set_index("doc_id")
    assert ud.loc[0, "n_dup_units"] == 2  # within-doc repeated sentence
    assert ud.loc[3, "n_dup_units"] == 0

    out4 = str(tmp_path / "url")
    assert main(["url-dedup", "--corpus", str(d), "--out", out4]) == 0
    urls = rd.read_parquet(out4).to_pandas()
    assert sorted(urls["doc_id"]) == [0, 2]  # 0==1 and 2==3 canonical

    emb = tmp_path / "emb"
    emb.mkdir()
    rng = np.random.RandomState(5)
    vecs = rng.randn(20, 8)
    vecs[10] = vecs[0]  # exact dup
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(20), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float64())),
        }),
        str(emb / "part-0.parquet"),
    )
    out5 = str(tmp_path / "sd")
    assert main(["semdedup", "--embeddings", str(emb), "--out", out5,
                 "--n-clusters", "2", "--threshold", "0.999999"]) == 0
    sd = rd.read_parquet(out5).to_pandas().set_index("vec_id")
    assert bool(sd.loc[0, "kept"]) and not bool(sd.loc[10, "kept"])
    assert int(sd.loc[10, "rep_id"]) == 0


def test_cli_curate_unitdedup_stage(ray_session, tmp_path, capsys):
    import ray.data as rd

    d = tmp_path / "docs"
    d.mkdir()
    texts = ["alpha beta. shared sentence here.",
             "shared sentence here. gamma delta",
             "totally unique text"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts)}),
        str(d / "p.parquet"),
    )
    out = str(tmp_path / "cur")
    rc = main(["curate", "--corpus", str(d), "--out", out,
               "--stages", "unitdedup"])
    assert rc == 0
    got = rd.read_parquet(out).to_pandas().set_index("doc_id")["text"]
    assert got.loc[0] == "alpha beta"
    assert got.loc[1] == "gamma delta"
    assert got.loc[2] == "totally unique text"


def test_cli_curate_dupspans_sharded_stage(ray_session, tmp_path, capsys):
    """curate --stages dupspans --dup-sharded: same output as the broadcast
    stage, gram shards live under out/dupspans_work."""
    import os

    d = tmp_path / "raw"
    d.mkdir()
    boiler = "copyright acme corp all rights reserved"
    texts = [
        f"alpha beta {boiler} gamma delta",
        f"one two three {boiler} four five",
        "totally unique content here with nothing shared",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
            }
        ),
        str(d / "part-0.parquet"),
    )
    out = str(tmp_path / "curated")
    rc = main([
        "curate", "--corpus", str(d), "--out", out,
        "--stages", "dupspans", "--dup-k", "4",
        "--dup-sharded", "--dup-shards", "3",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_after"] == {"dupspans": 3}
    assert os.path.isdir(os.path.join(out, "dupspans_work", "dup_grams"))

    import ray.data as rd

    got = rd.read_parquet(out + "/dupspans").to_pandas().sort_values("doc_id")
    assert got.loc[got["doc_id"] == 0, "text"].iloc[0] == "alpha beta gamma delta"
    assert got.loc[got["doc_id"] == 1, "text"].iloc[0] == "one two three four five"
    assert got.loc[got["doc_id"] == 2, "text"].iloc[0] == texts[2]
    assert set(got.columns) == {"doc_id", "text", "lang"}


def test_cli_curate_lshdedup_incremental(ray_session, tmp_path, capsys):
    """curate --stages lshdedup across two runs sharing one persisted LSH
    index: run 1 (day 1) builds the index and keeps everything; run 2
    (day 2) drops the docs near-duplicating day 1 and appends its
    survivors, so a third increment would see them too."""
    import os

    import ray.data as rd

    def write_corpus(dirname, rows):
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(
            pa.table({
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array(["en"] * len(rows)),
            }),
            str(d / "part-0.parquet"),
        )
        return str(d)

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the cat watches from the warm windowsill nearby")
    uniq = ("completely different text about distributed query engines "
            "processing large corpora with streaming execution backends")
    day1 = write_corpus("day1", [(1, base), (2, uniq)])
    # day 2: one near-copy of day-1 doc 1, one fresh doc
    day2 = write_corpus("day2", [
        (10, base.replace("warm", "cold")),
        (11, "entirely novel third document text mentioning nothing seen "
             "before in any earlier crawl increment batch at all today"),
    ])
    idx = str(tmp_path / "lsh_index")

    out1 = str(tmp_path / "c1")
    rc = main(["curate", "--corpus", day1, "--out", out1,
               "--stages", "lshdedup", "--lsh-index", idx])
    assert rc == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["rows_after"] == {"lshdedup": 2}
    assert os.path.exists(os.path.join(idx, "_params.json"))

    out2 = str(tmp_path / "c2")
    rc = main(["curate", "--corpus", day2, "--out", out2,
               "--stages", "lshdedup", "--lsh-index", idx])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["rows_after"] == {"lshdedup": 1}
    got = rd.read_parquet(out2 + "/lshdedup").to_pandas()
    assert got["doc_id"].tolist() == [11]
    # survivor was appended: a rerun into a fresh out dir still drops 10
    # AND a re-probe of doc 11's own text against the index now hits it
    from splade_ray.ops.dedup import minhash_index_probe

    probe = minhash_index_probe(
        rd.read_parquet(out2 + "/lshdedup"), idx, min_est_jaccard=0.9,
    ).to_pandas()
    assert set(probe["old_doc"]) == {11}

    # run-2 resume (same corpus path -> same tag): identical result, no
    # self-match wipeout
    import shutil

    shutil.rmtree(out2)
    rc = main(["curate", "--corpus", day2, "--out", out2,
               "--stages", "lshdedup", "--lsh-index", idx])
    assert rc == 0
    s2b = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2b["rows_after"] == {"lshdedup": 1}


def test_cli_dedup_containment_method(ray_session, tmp_path, capsys):
    """dedup --methods containment: an embedded-subset doc joins its
    host's cluster (cross length bands) and the survivor filter keeps one
    of the pair."""
    d = tmp_path / "raw"
    d.mkdir()
    little = ("the quick brown fox jumps over the lazy dog near the river "
              "bank every single morning")
    big = ("a very long document about many topics begins here with much "
           "padding text and then quotes verbatim " + little +
           " before continuing onward with entirely different material "
           "about distributed systems and streaming execution engines "
           "filling several more clauses of text")
    texts = [little, big,
             "completely unrelated filler content mentioning none of "
             "those exact word sequences in any order at all"]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
        }),
        str(d / "part-0.parquet"),
    )
    out = str(tmp_path / "dd")
    rc = main(["dedup", "--corpus", str(d), "--out", out,
               "--methods", "containment", "--min-containment", "0.8"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_survivors"] == 2 and summary["n_dropped"] == 1

    import pandas as pd

    surv = pd.read_parquet(out + "/survivors")
    assert set(surv["doc_id"]) == {0, 2}  # cluster-min keeps the little doc


def test_cli_curate_all_filtered_stage_chain(ray_session, tmp_path, capsys):
    """A stage that drops EVERY doc (here: quality over stopword-free
    text) must leave a typed empty checkpoint and let downstream stages —
    including ones whose empty result loses its schema, like dedup's
    join — run to completion with zero rows."""
    d = tmp_path / "raw"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["spark batch column row value key",
                              "table scan merge sort hash group"]),
            "lang": pa.array(["en", "en"]),
        }),
        str(d / "part-0.parquet"),
    )
    out = str(tmp_path / "curated")
    rc = main(["curate", "--corpus", str(d), "--out", out,
               "--stages", "quality,dedup,redact,pack", "--min-words", "3"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["rows_after"] == {
        "quality": 0, "dedup": 0, "redact": 0, "pack": 0}


def test_cli_curate_dry_run(ray_session, tmp_path, capsys):
    """--dry-run: sample row-flow estimate, nothing durable written, a
    shared LSH index is probed but never mutated."""
    import os

    d = tmp_path / "raw"
    d.mkdir()
    texts = [
        "the and data table merge quick brown fox jumps over things",
        "the and data table merge quick brown fox jumps over things",
        "the and some other normal words here okay for quality today",
        "the of yet another clean document with plenty of normal words",
    ]
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
        }),
        str(d / "part-0.parquet"),
    )
    out = str(tmp_path / "curated")
    rc = main(["curate", "--corpus", str(d), "--out", out,
               "--stages", "quality,dedup,lshdedup,redact,pack",
               "--min-words", "5", "--dry-run"])
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["dry_run"] is True and s["sample_rows"] == 4
    assert s["rows_after_sample"]["dedup"] == 3  # exact dup dropped
    assert s["rows_after_sample"]["lshdedup"] == 3  # no index -> passthrough
    # nothing durable: the out dir was never created
    assert not os.path.exists(out)
    # with a real index present, dry-run probes but does not mutate it
    from splade_ray.ops.dedup import minhash_index_build
    import ray.data as rd

    idx = str(tmp_path / "lsh")
    minhash_index_build(rd.read_parquet(str(d)), idx)
    mtimes = {f: os.path.getmtime(os.path.join(idx, "sigs", f))
              for f in os.listdir(os.path.join(idx, "sigs"))}
    rc = main(["curate", "--corpus", str(d), "--out", out,
               "--stages", "lshdedup", "--lsh-index", idx, "--dry-run"])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # every sampled doc collides with the index built from itself
    assert s2["rows_after_sample"]["lshdedup"] == 0
    assert {f: os.path.getmtime(os.path.join(idx, "sigs", f))
            for f in os.listdir(os.path.join(idx, "sigs"))} == mtimes
    assert not os.path.exists(out)


def test_cli_curate_lshdedup_crash_before_marker(ray_session, tmp_path, capsys):
    """Regression (round-5 ADVICE): the first-build source tag now lands
    ATOMICALLY in the index manifest — a crash after the build wrote
    _params.json but before the legacy _built_tag marker must NOT flip
    the resumed run onto the probe path (which would drop ~every doc as a
    near-dup of itself)."""
    import os

    d = tmp_path / "day1"
    d.mkdir()
    texts = [f"document number {i} about topic {i} with plenty of words "
             f"to shingle into k grams properly here {i}" for i in range(8)]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(8), pa.int64()),
                  "text": pa.array(texts)}),
        str(d / "part-0.parquet"))
    idx = str(tmp_path / "lsh_index")
    out1 = str(tmp_path / "c1")
    rc = main(["curate", "--corpus", str(d), "--out", out1,
               "--stages", "lshdedup", "--lsh-index", idx])
    assert rc == 0
    capsys.readouterr()
    # simulate the crash window: marker missing, manifest present
    os.remove(os.path.join(idx, "_built_tag"))
    mani = json.load(open(os.path.join(idx, "_params.json")))
    assert "source_tag" in mani
    import shutil

    shutil.rmtree(out1)
    rc = main(["curate", "--corpus", str(d), "--out", out1,
               "--stages", "lshdedup", "--lsh-index", idx])
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["rows_after"] == {"lshdedup": 8}  # passthrough, no self-wipe


def test_cli_curate_lshdedup_mass_drop_guard(ray_session, tmp_path, capsys):
    """Regression (round-5 ADVICE): an index pre-built from this same
    corpus under a DIFFERENT path/tag makes the probe drop ~100% of the
    increment — the stage must refuse instead of silently emptying the
    output."""
    import shutil

    texts = [f"document number {i} about topic {i} with plenty of words "
             f"to shingle into k grams properly here {i}" for i in range(120)]
    tbl = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                    "text": pa.array(texts)})
    a = tmp_path / "corpus_a"
    a.mkdir()
    pq.write_table(tbl, str(a / "part-0.parquet"))
    b = tmp_path / "corpus_b"
    shutil.copytree(a, b)
    idx = str(tmp_path / "lsh_index")
    rc = main(["lsh-build", "--corpus", str(a), "--index", idx])
    assert rc == 0
    capsys.readouterr()
    out = str(tmp_path / "c")
    with pytest.raises(RuntimeError, match="lshdedup: probe would drop"):
        main(["curate", "--corpus", str(b), "--out", out,
              "--stages", "lshdedup", "--lsh-index", idx])
    # same corpus PATH as the build -> tag matches the manifest source_tag
    # and the stage passes through instead of probing itself
    out2 = str(tmp_path / "c2")
    rc = main(["curate", "--corpus", str(a), "--out", out2,
               "--stages", "lshdedup", "--lsh-index", idx])
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["rows_after"] == {"lshdedup": 120}


def test_cli_curate_dupspans_sharded_corpus_change_invalidates(
        ray_session, tmp_path, capsys):
    """Regression (round-5 ADVICE): re-running curate --dup-sharded into
    the same --out against a MODIFIED corpus must rebuild the persisted
    gram shards (corpus fingerprint in the params manifest), not reuse
    the stale dup set."""
    import shutil

    import ray.data as rd

    dup = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lamda mu nu xi omicron pi rho sigma tau upsilon")
    d = tmp_path / "raw"
    d.mkdir()

    def write(rows):
        pq.write_table(
            pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                      "text": pa.array([r[1] for r in rows])}),
            str(d / "part-0.parquet"))

    # v1: docs 1 and 2 share a duplicated 20-gram span
    write([(1, dup + " first unique tail one two three four five"),
           (2, dup + " second unique tail six seven eight nine ten"),
           (3, "totally unrelated text with no duplicated span at all "
               "just some filler words to pad it out to length")])
    out = str(tmp_path / "c")
    rc = main(["curate", "--corpus", str(d), "--out", out,
               "--stages", "dupspans", "--dup-sharded", "--dup-k", "20"])
    assert rc == 0
    capsys.readouterr()
    v1 = rd.read_parquet(out + "/dupspans").to_pandas()
    assert (v1.loc[v1.doc_id == 1, "text"].iloc[0]
            != dup + " first unique tail one two three four five")  # cut
    # v2: rewrite the corpus so NOTHING is duplicated; rerun into same out
    write([(1, "fresh document one with entirely new content and no "
               "shared spans across any documents at all anymore"),
           (2, "fresh document two also completely distinct from every "
               "other document in this tiny second corpus version"),
           (3, "fresh document three still unique in its words")])
    shutil.rmtree(out + "/dupspans")
    for f in ("_DONE_dupspans", "_DONE"):
        p = tmp_path / "c" / f
        if p.exists():
            p.unlink()
    rc = main(["curate", "--corpus", str(d), "--out", out,
               "--stages", "dupspans", "--dup-sharded", "--dup-k", "20"])
    assert rc == 0
    capsys.readouterr()
    v2 = rd.read_parquet(out + "/dupspans").to_pandas().sort_values("doc_id")
    # with stale shards the old grams would have cut nothing anyway — the
    # real check is the inverse: v2 texts are untouched AND the work dir
    # manifest now carries the new fingerprint
    mani = json.load(
        open(tmp_path / "c" / "dupspans_work" / "dup_grams" / "_params.json"))
    assert "fingerprint" in mani["params"]
    assert v2["text"].str.startswith("fresh document").all()
    assert mani["result"]["n_grams"] == 0


def test_cli_curate_resume_fault_injection(ray_session, tmp_path, capsys):
    """End-to-end resume fault injection (ROADMAP viii): a curate run
    interrupted between stages, and one whose in-flight stage died
    without its _DONE marker, must both resume to output byte-identical
    to an uninterrupted run."""
    import shutil

    import pandas as pd
    import ray.data as rd

    d = tmp_path / "raw"
    d.mkdir()
    boiler = "copyright acme corp all rights reserved"
    texts = (
        [f"alpha beta {boiler} gamma delta doc{i} tail words here"
         for i in range(6)]
        + [f"alpha beta {boiler} gamma delta doc{i} tail words here"
           for i in range(3)]          # exact dups of the first three
        + ["totally unique content with nothing shared at all"]
    )
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en"] * len(texts))}),
        str(d / "part-0.parquet"))
    stages = "dedup,dupspans,pack"
    args_tail = ["--stages", stages, "--dup-k", "4", "--budget", "16"]

    def read_final(out):
        return (rd.read_parquet(out + "/pack").to_pandas()
                .sort_values(list(rd.read_parquet(out + "/pack")
                                  .to_pandas().columns))
                .reset_index(drop=True))

    # reference: uninterrupted run
    ref_out = str(tmp_path / "ref")
    assert main(["curate", "--corpus", str(d), "--out", ref_out,
                 *args_tail]) == 0
    capsys.readouterr()
    want = read_final(ref_out)

    # fault 1: "crash" after stage 1 (run only the first stage, then
    # resume with the full list into the same out dir)
    out1 = str(tmp_path / "c1")
    assert main(["curate", "--corpus", str(d), "--out", out1,
                 "--stages", "dedup"]) == 0
    capsys.readouterr()
    assert main(["curate", "--corpus", str(d), "--out", out1,
                 *args_tail]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "dedup" in s["stages_skipped"]
    pd.testing.assert_frame_equal(read_final(out1), want)

    # fault 2: a stage died MID-flight — partial files present, no _DONE
    out2 = str(tmp_path / "c2")
    assert main(["curate", "--corpus", str(d), "--out", out2,
                 *args_tail]) == 0
    capsys.readouterr()
    import os as _os

    _os.remove(_os.path.join(out2, "dupspans", "_DONE"))
    # leave the stale parquet files in place: resume must wipe + rebuild
    shutil.rmtree(_os.path.join(out2, "pack"))
    assert main(["curate", "--corpus", str(d), "--out", out2,
                 *args_tail]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["stages_skipped"] == ["dedup"]
    pd.testing.assert_frame_equal(read_final(out2), want)
