"""BPE train/apply: incremental trainer vs from-scratch reference, the
Sennrich worked example, distributed word counts, and apply parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.bpe import (
    EOW,
    _symbols,
    bpe_apply,
    bpe_train,
    bpe_word_counts,
    segment_word,
)


def _train_reference(word_counts: pd.DataFrame, n_merges: int):
    """Naive trainer: recompute every pair count from scratch each round."""
    words = [list(_symbols(w)) for w in word_counts["word"]]
    counts = word_counts["count"].tolist()
    merges = []
    for _ in range(n_merges):
        pc = {}
        for syms, c in zip(words, counts):
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = best[0] + best[1]
        for wi, syms in enumerate(words):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(new)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = out
    return merges


def test_bpe_train_matches_reference_random():
    rng = np.random.default_rng(4)
    alphabet = list("abcde")
    words = sorted({
        "".join(rng.choice(alphabet, size=rng.integers(1, 8)))
        for _ in range(120)
    })
    wc = pd.DataFrame({
        "word": words,
        "count": rng.integers(1, 50, size=len(words)),
    }).sort_values(["count", "word"], ascending=[False, True]).reset_index(drop=True)
    got = bpe_train(wc, 40)
    want = _train_reference(wc, 40)
    assert got == want


def test_bpe_train_sennrich_example():
    wc = pd.DataFrame({
        "word": ["low", "lower", "newest", "widest"],
        "count": [5, 2, 6, 3],
    })
    merges = bpe_train(wc, 4)
    # (e,s) and (s,t</w>) both have count 9; lexicographic tie-break picks
    # ('e','s') first, then the chained ('es','t</w>')
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + EOW)
    assert merges == _train_reference(wc, 4)
    ranks = {p: i for i, p in enumerate(merges)}
    assert segment_word("newest", ranks)[-1] == "est" + EOW


def test_bpe_word_counts_distributed(ray_session):
    texts = ["the cat sat", "the cat", "a dog", ""]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(3)
    got = bpe_word_counts(docs, text_col="text")
    want = pd.DataFrame(
        {"word": ["cat", "the", "a", "dog", "sat"],
         "count": [2, 2, 1, 1, 1]}
    )
    pd.testing.assert_frame_equal(got, want)
    floored = bpe_word_counts(docs, text_col="text", min_count=2)
    assert floored["word"].tolist() == ["cat", "the"]


def test_bpe_apply_matches_scalar(ray_session):
    texts = ["the lowest newest cat", "lower and lower", ""]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts)})
    ).repartition(2)
    wc = bpe_word_counts(docs, text_col="text")
    merges = bpe_train(wc, 12)
    got = (
        bpe_apply(docs, merges)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    ranks = {p: i for i, p in enumerate(merges)}
    import re

    for d, tx in enumerate(texts):
        toks = re.findall(r"[a-z0-9_]+", tx.lower())
        want_sub = sum(len(segment_word(w, ranks)) for w in toks)
        assert got.loc[d, "n_words"] == len(toks)
        assert got.loc[d, "n_subwords"] == want_sub
    # enough merges: frequent whole words compress to one piece
    assert segment_word("lower", ranks) == ["lower" + EOW]


def test_bpe_cli_fit_apply(ray_session, tmp_path, capsys):
    import json

    import pyarrow.parquet as pq

    from splade_ray.cli import main

    d = tmp_path / "raw"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(["low lower lowest", "new newest", "wide"])}),
        str(d / "p.parquet"),
    )
    model = str(tmp_path / "bpe.json")
    assert main(["bpe", "--corpus", str(d), "--out", model,
                 "--merges", "10"]) == 0
    m = json.loads(open(model).read())
    assert len(m["merges"]) == 10
    out = str(tmp_path / "stats")
    assert main(["bpe", "--corpus", str(d), "--mode", "apply",
                 "--model", model, "--out", out]) == 0
    got = pd.read_parquet(out).sort_values("doc_id")
    assert got["n_words"].tolist() == [3, 2, 1]
    assert (got["n_subwords"] >= got["n_words"]).all()

def test_bpe_train_top_k_slice_equals_head():
    """top_k_words trains on the top-K dictionary slice — identical to
    passing the pre-sliced dictionary (the count-threshold schedule)."""
    from splade_ray.ops.bpe import bpe_train

    wc = pd.DataFrame({
        "word": ["lower", "low", "newest", "wider", "new", "widest"],
        "count": [60, 50, 40, 30, 20, 10],
    })
    assert bpe_train(wc, 8, top_k_words=4) == bpe_train(wc.head(4), 8)
    assert bpe_train(wc, 8, top_k_words=4) != bpe_train(wc, 8)


def test_bpe_train_checkpoint_resume(tmp_path):
    """A crashed trainer resumes from the checkpointed merge prefix and
    converges to the same merge list as an uninterrupted run; a stale
    checkpoint (different dictionary) is ignored."""
    import json

    from splade_ray.ops.bpe import bpe_train

    wc = pd.DataFrame({
        "word": ["lower", "low", "newest", "wider", "new", "widest",
                 "lowest", "newer"],
        "count": [60, 50, 40, 30, 20, 10, 9, 8],
    })
    full = bpe_train(wc, 12)
    ck = str(tmp_path / "bpe.ck.json")
    # simulate a crash at merge 5: write a genuine prefix checkpoint
    bpe_train(wc, 12, checkpoint_path=ck, checkpoint_every=10**9)
    state = json.load(open(ck))
    state["merges"] = state["merges"][:5]
    json.dump(state, open(ck, "w"))
    resumed = bpe_train(wc, 12, checkpoint_path=ck, checkpoint_every=3)
    assert resumed == full
    # the final checkpoint holds the full list
    assert [tuple(p) for p in json.load(open(ck))["merges"]] == full
    # a checkpoint against a different dictionary is ignored
    wc2 = wc.assign(count=wc["count"] * 2)
    assert bpe_train(wc2, 12, checkpoint_path=ck) == bpe_train(wc2, 12)
