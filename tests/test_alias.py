"""Alias registry: atomic set/swap/delete, search-through-alias parity,
blue/green reindex flip."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.alias import (
    alias_delete,
    alias_resolve,
    alias_set,
    alias_swap,
    load_aliases,
    search_alias,
)
from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus

N = 80


def _build(tmp_path, tag: str, seed: int, n=N, id_base=0) -> str:
    t = synth_corpus(n, seed=seed)
    corpus = str(tmp_path / f"c-{tag}.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(id_base, id_base + n, dtype=np.int64)),
                "content": t["content"],
            }
        ),
        corpus,
    )
    index_dir = str(tmp_path / f"index-{tag}")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=25)
    return index_dir


QUERIES = [(1, "def parse merge"), (2, "return x1")]


def test_alias_crud_and_search_parity(ray_session, tmp_path):
    from splade_ray.query import search

    idx = _build(tmp_path, "a", seed=3)
    reg = str(tmp_path / "registry")
    alias_set(reg, "docs", idx)
    assert alias_resolve(reg, "docs") == [idx]
    p = BM25Params(top_k=5)
    via_alias = search_alias(reg, "docs", QUERIES, p)
    direct = search(idx, QUERIES, p)
    pd.testing.assert_frame_equal(via_alias, direct)
    alias_delete(reg, "docs")
    with pytest.raises(KeyError):
        alias_resolve(reg, "docs")
    # unknown index dir refused
    with pytest.raises(FileNotFoundError):
        alias_set(reg, "bad", str(tmp_path / "nope"))


def test_alias_blue_green_swap(ray_session, tmp_path):
    blue = _build(tmp_path, "blue", seed=3)
    green = _build(tmp_path, "green", seed=9)
    reg = str(tmp_path / "registry")
    alias_set(reg, "live", blue)
    p = BM25Params(top_k=5)
    before = search_alias(reg, "live", QUERIES, p)
    old = alias_swap(reg, "live", green)
    assert old == [blue]
    after = search_alias(reg, "live", QUERIES, p)
    # different corpora -> different results, same contract
    assert not before["doc_id"].tolist() == after["doc_id"].tolist()
    from splade_ray.query import search

    pd.testing.assert_frame_equal(after, search(green, QUERIES, p))


def test_alias_multi_index_federates(ray_session, tmp_path):
    from splade_ray.multi import search_multi

    a = _build(tmp_path, "m1", seed=3)
    b = _build(tmp_path, "m2", seed=9, id_base=1000)
    reg = str(tmp_path / "registry")
    alias_set(reg, "both", [a, b])
    p = BM25Params(top_k=6)
    via_alias = search_alias(reg, "both", QUERIES, p)
    direct = search_multi([a, b], QUERIES, p)
    pd.testing.assert_frame_equal(via_alias, direct)
    # registry file survives a reload
    assert load_aliases(reg)["both"] == [a, b]


def test_cli_alias(ray_session, tmp_path, capsys):
    import json

    from splade_ray.cli import main

    idx = _build(tmp_path, "cli", seed=3)
    reg = str(tmp_path / "registry")
    assert main(["alias", "--registry", reg, "--mode", "set",
                 "--name", "live", "--dirs", idx]) == 0
    assert main(["alias", "--registry", reg, "--mode", "resolve",
                 "--name", "live"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == {"live": [idx]}
