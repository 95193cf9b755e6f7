"""Curation operators: decontamination, pack assignment, redaction."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.curation import (
    DecontaminateStage,
    collect_eval_grams,
    decontaminate,
    kgram_strings,
    pack_assign,
    redact_batch,
)


def _py_grams(text: str, k: int) -> list[str]:
    import re

    toks = re.findall(r"[a-z0-9_]+", text.lower())
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def test_kgram_strings_matches_python_reference():
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(20)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.randint(0, 12))) for _ in range(50)
    ] + ["", "one two"]
    for k in (2, 3, 5):
        grams, gpar, doc_lens = kgram_strings(pa.array(texts), k)
        got = {}
        for g, p in zip(grams.to_pylist(), gpar):
            got.setdefault(int(p), []).append(g)
        for i, t in enumerate(texts):
            assert got.get(i, []) == _py_grams(t, k), (i, k)
            assert doc_lens[i] == len(t.split())


def test_decontaminate_end_to_end(ray_session):
    eval_docs = rd.from_items(
        [
            {"doc_id": 100, "text": "alpha beta gamma delta"},
            {"doc_id": 101, "text": "zeta eta theta"},
        ]
    )
    train = rd.from_items(
        [
            # contains eval 3-gram "beta gamma delta"
            {"doc_id": 1, "text": "x alpha beta gamma delta y"},
            # shares tokens but no full 3-gram
            {"doc_id": 2, "text": "alpha beta zeta eta iota"},
            {"doc_id": 3, "text": "clean text with nothing shared"},
            {"doc_id": 4, "text": "zeta eta theta zeta eta theta"},
            {"doc_id": 5, "text": "xy"},  # fewer than k tokens
        ]
    )
    out = (
        decontaminate(train, eval_docs, k=3, concurrency=(1, 2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["n_grams"].tolist() == [4, 3, 3, 4, 0]
    # doc 1: grams at positions 1,2 hit ("alpha beta gamma","beta gamma delta")
    # doc 4: "zeta eta theta" occurs at positions 0 and 3; "eta theta zeta",
    # "theta zeta eta" are not eval grams.
    assert out["n_contaminated"].tolist() == [2, 0, 0, 2, 0]
    assert out["contaminated"].tolist() == [True, False, False, True, False]


def test_collect_eval_grams_dedups(ray_session):
    docs = rd.from_items([{"text": "a b a b"}, {"text": "a b c"}])
    grams = collect_eval_grams(docs, 2)
    assert sorted(grams.to_pylist()) == ["a b", "b a", "b c"]


def test_pack_assign_matches_sequential_cumsum(ray_session):
    rng = np.random.RandomState(11)
    rows = [
        {"doc_id": int(i), "text": " ".join(["tok"] * int(rng.randint(0, 30)))}
        for i in rng.permutation(200)
    ]
    docs = rd.from_items(rows).repartition(7)
    got = (
        pack_assign(docs, budget=100, num_buckets=6)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = (
        pd.DataFrame(rows)
        .assign(n_tokens=lambda d: d["text"].str.split().str.len())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    excl = ref["n_tokens"].cumsum() - ref["n_tokens"]
    ref["pack_id"] = excl // 100
    assert got["n_tokens"].tolist() == ref["n_tokens"].tolist()
    assert got["pack_id"].tolist() == ref["pack_id"].tolist()
    # packs are contiguous in doc_id order and non-decreasing
    assert (np.diff(got["pack_id"].to_numpy()) >= 0).all()


def test_pack_assign_empty(ray_session):
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = pack_assign(empty, budget=10)
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "n_tokens", "pack_id"}


def test_redact_batch_pii_defaults():
    b = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "write to jane.doe+x@corp.example.org today",
                    "server 192.168.0.12 called 555-123-4567 twice",
                    "nothing here",
                ]
            ),
        }
    )
    out = redact_batch(b).to_pandas()
    assert out["n_email"].tolist() == [1, 0, 0]
    assert out["n_ipv4"].tolist() == [0, 1, 0]
    assert out["n_phone"].tolist() == [0, 1, 0]
    assert out["text_redacted"].tolist() == [
        "write to <EMAIL> today",
        "server <IPV4> called <PHONE> twice",
        "nothing here",
    ]


def test_redact_batch_sequential_order():
    # the 'b_digits' pattern must see text already redacted by 'a_word'
    b = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["secret 42 secret"])}
    )
    out = redact_batch(
        b, patterns={"a_word": r"secret", "b_digits": r"\d+"}
    ).to_pandas()
    assert out["n_a_word"].tolist() == [2]
    assert out["n_b_digits"].tolist() == [1]
    assert out["text_redacted"].tolist() == ["<A_WORD> <B_DIGITS> <A_WORD>"]


# --------------------------------------------------------------------------
# duplicated-substring spans (Lee et al. 2022 ExactSubstr family)
# --------------------------------------------------------------------------


def _scalar_dup_spans(texts, k, min_count=2):
    """Brute-force reference: global gram counts on token tuples, covered
    positions, maximal spans, kept-token rewrite."""
    from splade_ray.analysis import tokenize

    toks = [tokenize(t or "") for t in texts]
    counts = {}
    for tt in toks:
        for i in range(len(tt) - k + 1):
            g = tuple(tt[i : i + k])
            counts[g] = counts.get(g, 0) + 1
    rows = []
    for did, tt in enumerate(toks):
        covered = [False] * len(tt)
        n_dup_grams = 0
        for i in range(len(tt) - k + 1):
            if counts[tuple(tt[i : i + k])] >= min_count:
                n_dup_grams += 1
                for j in range(i, i + k):
                    covered[j] = True
        n_spans = sum(
            1 for i, c in enumerate(covered) if c and (i == 0 or not covered[i - 1])
        )
        kept = " ".join(t for t, c in zip(tt, covered) if not c)
        rows.append((did, len(tt), n_dup_grams, sum(covered), n_spans, kept))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "n_tokens", "n_dup_grams", "n_dup_tokens", "n_spans", "text_dedup"],
    )


def _dup_texts():
    boiler = "copyright acme corp all rights reserved do not redistribute"
    texts = [
        f"alpha beta {boiler} gamma delta epsilon",
        f"one two three {boiler} four five",
        "totally unique content with no shared windows at all here",
        f"{boiler} leading position and also trailing {boiler}",  # two spans + within-doc dup
        "",
        "short doc",
        "repeat me repeat me repeat me repeat me repeat me",  # within-doc repetition only
    ]
    return texts


@pytest.mark.parametrize("k", [3, 5])
def test_duplicated_spans_matches_scalar(ray_session, k):
    from splade_ray.ops.curation import duplicated_spans

    texts = _dup_texts()
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
        )
    ).repartition(3)
    got = (
        duplicated_spans(ds, k=k, rewrite=True, batch_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _scalar_dup_spans(texts, k)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("n_shards", [1, 4])
def test_duplicated_spans_sharded_parity(ray_session, tmp_path, n_shards):
    """The memory-bounded sharded variant returns the exact per-doc stats
    of the broadcast path (round-3 VERDICT item 2), and each round's
    broadcast is one shard — bounded by the shard partitioning."""
    from splade_ray.ops.curation import (
        collect_dup_grams,
        duplicated_spans,
        duplicated_spans_sharded,
    )

    texts = _dup_texts()
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    for k in (3, 5):
        ds = rd.from_arrow(tbl).repartition(3)
        want = (duplicated_spans(ds, k=k).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        got = (duplicated_spans_sharded(
                   ds, str(tmp_path / f"w{k}-{n_shards}"), k=k,
                   n_shards=n_shards, batch_size=2)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # shard rows partition the full dup-gram set (per-round broadcast
        # = one shard, so its size is bounded by the largest shard)
        import json

        with open(tmp_path / f"w{k}-{n_shards}" / "dup_grams"
                  / "_params.json") as f:
            state = json.load(f)
        full = collect_dup_grams(rd.from_arrow(tbl), k=k)
        assert sum(state["result"]["shard_rows"]) == full.size
        if n_shards > 1 and full.size >= 4:
            assert max(state["result"]["shard_rows"]) < full.size


def test_dup_grams_sharded_param_mismatch_refuses(ray_session, tmp_path):
    from splade_ray.ops.curation import collect_dup_grams_sharded

    texts = _dup_texts()
    ds = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}))
    out = str(tmp_path / "grams")
    r1 = collect_dup_grams_sharded(ds, out, k=3, n_shards=2)
    # same params resume: returns the cached manifest without rebuilding
    r2 = collect_dup_grams_sharded(ds, out, k=3, n_shards=2)
    assert r1 == r2
    with pytest.raises(ValueError, match="refusing"):
        collect_dup_grams_sharded(ds, out, k=4, n_shards=2)


def test_duplicated_spans_within_doc_and_boundaries(ray_session):
    from splade_ray.ops.curation import duplicated_spans

    texts = _dup_texts()
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
        )
    )
    got = duplicated_spans(ds, k=3, rewrite=False).to_pandas().set_index("doc_id")
    # the unique doc is untouched
    assert got.loc[2, "n_dup_tokens"] == 0 and got.loc[2, "n_spans"] == 0
    # doc 3 carries the boilerplate twice -> two separate spans
    assert got.loc[3, "n_spans"] == 2
    # within-doc repetition alone (doc 6) is a duplicate under total-count semantics
    assert got.loc[6, "n_dup_tokens"] > 0
    # empty doc contributes nothing
    assert got.loc[4, "n_tokens"] == 0 and got.loc[4, "n_dup_tokens"] == 0


def test_collect_dup_grams_min_count(ray_session):
    from splade_ray.ops.curation import collect_dup_grams

    texts = ["a b c d", "a b c e", "a b c f"]  # "a b c" x3, others < 3
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": pa.array(texts)}))
    g2 = collect_dup_grams(ds, k=3, min_count=2, text_col="text")
    g3 = collect_dup_grams(ds, k=3, min_count=3, text_col="text")
    assert g3.size == 1 and set(g3).issubset(set(g2))


# --------------------------------------------------------------------------
# DSIR importance resampling
# --------------------------------------------------------------------------


def _dsir_brute(texts, n_buckets, max_gram):
    """Per-doc hashed-gram bucket lists via plain Python: sha256-prefix
    token hashes, FNV rolling fold per k-gram (mirrors the engine kernel)."""
    import hashlib
    import re

    P, M = 1099511628211, 1 << 64
    out = []
    for t in texts:
        toks = re.findall(r"[a-z0-9_]+", (t or "").lower())
        hs = [
            int.from_bytes(hashlib.sha256(tok.encode()).digest()[:8], "big")
            for tok in toks
        ]
        grams = []
        for k in range(1, max_gram + 1):
            for i in range(len(hs) - k + 1):
                v = 0
                for j in range(k):
                    v = (v * P + hs[i + j]) % M
                grams.append(v % n_buckets)
        out.append(grams)
    return out


def test_dsir_counts_weights_select_match_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.curation import (
        dsir_bucket_counts,
        dsir_importance,
        dsir_log_lut,
        dsir_select,
    )
    from splade_ray.ops.sample import BUCKETS, _buckets

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "def quick_sort(xs): return xs",
        "the fox and the dog and the fox",
        "select value from table where key = 1",
        "",
        "the the the quick quick fox",
    ]
    ids = np.arange(len(texts), dtype=np.int64)
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ).repartition(3)
    target = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids[:2]), "text": pa.array(texts[:2])})
    )
    NB, MG = 512, 2

    brute = _dsir_brute(texts, NB, MG)
    want_raw = np.zeros(NB, np.int64)
    for bs in brute:
        for b in bs:
            want_raw[b] += 1
    got_raw = dsir_bucket_counts(docs, n_buckets=NB, max_gram=MG)
    assert (got_raw == want_raw).all()

    want_tgt = np.zeros(NB, np.int64)
    for bs in brute[:2]:
        for b in bs:
            want_tgt[b] += 1
    lut = dsir_log_lut(want_tgt, want_raw, smoothing=1.0)
    w = dsir_importance(docs, target, n_buckets=NB, max_gram=MG).to_pandas()
    w = w.sort_values("doc_id").reset_index(drop=True)
    assert w["n_feats"].tolist() == [len(b) for b in brute]
    want_logw = np.array([sum(lut[b] for b in bs) for bs in brute])
    assert np.allclose(w["log_weight"].to_numpy(), want_logw)

    # Gumbel top-k: deterministic, partitioning-invariant, brute-mirrored
    weights = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids), "log_weight": pa.array(want_logw, pa.float64())}
        )
    )
    sel = dsir_select(weights, 3, seed=7)
    u = (_buckets(ids, 7) + 0.5) / BUCKETS
    key = want_logw - np.log(-np.log(u))
    want_ids = ids[np.lexsort((ids, -key))[:3]]
    assert sel["doc_id"].tolist() == want_ids.tolist()
    sel2 = dsir_select(weights.repartition(5), 3, seed=7)
    assert sel2["doc_id"].tolist() == sel["doc_id"].tolist()


def _lm_brute(texts, n, nb):
    """Scalar-reference hashed n-gram LM counts: list of per-doc token-hash
    lists + gram/ctx bucket count dicts."""
    from splade_ray.ops.textstats import hash_token

    P, M = 1099511628211, 1 << 64
    doc_hashes = [
        [int(hash_token(t)) for t in __import__("re").findall(r"[a-z0-9_]+", tx.lower())]
        for tx in texts
    ]

    def grams(hs, k):
        out = []
        for i in range(len(hs) - k + 1):
            v = 0
            for j in range(k):
                v = (v * P + hs[i + j]) % M
            out.append(v % nb)
        return out

    gram_c, ctx_c = {}, {}
    for hs in doc_hashes:
        for b in grams(hs, n):
            gram_c[b] = gram_c.get(b, 0) + 1
        if n > 1:
            for b in grams(hs, n - 1):
                ctx_c[b] = ctx_c.get(b, 0) + 1
    tot = sum(len(h) for h in doc_hashes)
    return doc_hashes, grams, gram_c, ctx_c, tot


def test_ngram_lm_fit_and_scores_match_bruteforce(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.curation import ngram_lm_fit, ngram_lm_scores

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown cat",
        "def quick_sort(xs): return xs",
        "a",  # shorter than a bigram: sentinel row
        "",
        "the the the quick quick fox",
    ]
    ids = list(range(len(texts)))
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    ).repartition(3)
    NB = 256
    for n in (1, 2, 3):
        fit = ngram_lm_fit(docs, n=n, n_buckets=NB)
        doc_hashes, grams, gram_c, ctx_c, tot = _lm_brute(texts, n, NB)
        want_gram = [gram_c.get(b, 0) for b in range(NB)]
        assert fit["gram"].tolist() == want_gram, n
        if n > 1:
            assert fit["ctx"].tolist() == [ctx_c.get(b, 0) for b in range(NB)]
        else:
            assert fit["ctx"] == tot

        got = (
            ngram_lm_scores(docs, fit, alpha=1.0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        for d, hs in enumerate(doc_hashes):
            gs = grams(hs, n)
            lp = 0.0
            for i, b in enumerate(gs):
                if n > 1:
                    cb = grams(hs, n - 1)[i]
                    den = ctx_c.get(cb, 0)
                else:
                    den = tot
                lp += math.log(gram_c[b] + 1.0) - math.log(den + 1.0 * NB)
            row = got.iloc[d]
            assert row["n_scored"] == len(gs)
            assert abs(row["logprob"] - lp) < 1e-9
            want_ppl = math.exp(-lp / len(gs)) if gs else 0.0
            assert abs(row["ppl"] - want_ppl) < 1e-9


def test_ngram_lm_reference_fit_scores_held_out(ray_session):
    """Fit on a clean reference, score a held-out mix: reference-like text
    must get lower perplexity than garbage — the CCNet filter signal."""
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.curation import ngram_lm_fit, ngram_lm_scores

    ref_texts = ["the quick brown fox jumps over the lazy dog"] * 20 + [
        "a quick brown dog sleeps under the lazy fox"
    ] * 20
    ref = rd.from_arrow(pa.table({"doc_id": pa.array(range(40), pa.int64()),
                                  "text": pa.array(ref_texts)}))
    fit = ngram_lm_fit(ref, n=2, n_buckets=4096)
    probe = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            "the quick brown fox sleeps under the lazy dog",
            "zxq9 vbnm qqqq wert hjkl zzzz pppp mmmm nnnn gggg",
        ]),
    }))
    got = ngram_lm_scores(probe, fit).to_pandas().set_index("doc_id")
    assert got.loc[0, "ppl"] < got.loc[1, "ppl"]


def test_dsir_select_tree_merge_matches_driver(ray_session):
    """merge='tree' (the billion-doc scale path: fan-in re-prune, driver
    receives only the final k rows) returns the identical frame as the
    driver merge, across partitionings and fan-ins."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.curation import dsir_select

    rng = np.random.default_rng(5)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    logw = rng.normal(size=n)
    weights = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids),
                  "log_weight": pa.array(logw, pa.float64())})
    ).repartition(17)
    base = dsir_select(weights, 40, seed=3)
    for fan_in in (2, 8):
        tree = dsir_select(weights, 40, seed=3, merge="tree", fan_in=fan_in)
        pd.testing.assert_frame_equal(tree, base)
    with pytest.raises(ValueError):
        dsir_select(weights, 40, merge="bogus")


def test_sha_prefix_u64_matches_int_parse():
    import hashlib

    from splade_ray.ops.dedup import sha_prefix_u64

    shas = [hashlib.sha256(str(i).encode()).hexdigest() for i in range(64)]
    shas += ["0" * 64, "f" * 64, "0123456789abcdef" + "0" * 48]
    got = sha_prefix_u64(shas)
    want = np.array([int(s[:16], 16) for s in shas], np.uint64)
    np.testing.assert_array_equal(got, want)
    assert sha_prefix_u64([]).size == 0


def test_incremental_dedup_both_methods(ray_session):
    import ray.data as rd

    from splade_ray.ops.dedup import incremental_dedup

    ref_texts = ["alpha beta", "gamma delta", "epsilon zeta"]
    new_texts = ["alpha beta",      # in ref -> drop
                 "new one",         # survive
                 "gamma delta",     # in ref -> drop
                 "new one",         # intra-new dup: BOTH survive (documented)
                 "brand new two"]   # survive
    ref = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(ref_texts)]
    ).repartition(2)
    new = rd.from_items(
        [{"doc_id": 100 + i, "text": t} for i, t in enumerate(new_texts)]
    ).repartition(3)
    want = [101, 103, 104]
    for method in ("shuffle", "broadcast", "auto"):
        got = incremental_dedup(new, ref, method=method).to_pandas()
        assert sorted(got["doc_id"]) == want, method
    # auto routes by MEASURED ref size: tiny ref -> broadcast; above the
    # cutover -> shuffle (forced low for the test)
    import splade_ray.ops.dedup as dd
    old_max = dd._BROADCAST_REF_MAX
    try:
        dd._BROADCAST_REF_MAX = 1  # 3-row ref now counts as "large"
        got = incremental_dedup(new, ref, method="auto").to_pandas()
        assert sorted(got["doc_id"]) == want
    finally:
        dd._BROADCAST_REF_MAX = old_max


def test_unit_dedup_sentence_units(ray_session):
    from splade_ray.ops.curation import _doc_units, unit_dedup

    texts = ["Hello world. Foo bar! Hello world.",  # within-doc repeat
             "foo bar? something else",             # cross-doc dup unit
             "",                                     # empty doc
             "hello world",                          # cross-doc dup unit
             "totally unique sentence"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    u, p, c = _doc_units(t["text"])
    assert list(c) == [3, 2, 0, 1, 1]
    assert list(u[:3]) == ["hello world", "foo bar", "hello world"]
    out = (unit_dedup(rd.from_arrow(t).repartition(2), batch_size=2)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_units"].tolist() == [3, 2, 0, 1, 1]
    # 'hello world' occurs 3x (2 in doc0, 1 in doc3); 'foo bar' 2x
    assert out["n_dup_units"].tolist() == [3, 1, 0, 1, 0]
    with pytest.raises(ValueError, match="unknown method"):
        unit_dedup(rd.from_arrow(t), method="bogus")


def test_unit_dedup_rewrite_removes_dup_units(ray_session):
    from splade_ray.ops.curation import unit_dedup

    texts = ["Hello world. Foo bar! Hello world.", "foo bar? keep this one",
             "hello world"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    out = (unit_dedup(rd.from_arrow(t), rewrite=True)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # 'hello world' ×3 and 'foo bar' ×2 are duplicated units
    assert out["text_dedup"].tolist() == ["", "keep this one", ""]


def test_containment_catches_subset_pairs(ray_session):
    """similarity='containment' flags a subset doc inside a superset in
    the same length band where Jaccard stays below threshold."""
    from splade_ray.ops.dedup import jaccard_block_pairs

    sub = "alpha beta gamma delta epsilon zeta eta theta"
    sup = sub + " iota kappa lam mu nu xi omicron pi rho sigma"
    rows = [
        {"doc_id": 0, "text": sub + " " * (len(sup) - len(sub) - 1) + "x",
         "lang": "en"},
        {"doc_id": 1, "text": sup, "lang": "en"},
        {"doc_id": 2, "text": "totally different words entirely here now "
                              "with matching rough length padding pad pad",
         "lang": "en"},
    ]
    ds = rd.from_items(rows)
    cont = jaccard_block_pairs(ds, min_jaccard=0.7, emit_counts=True,
                               similarity="containment").to_pandas()
    jac = jaccard_block_pairs(ds, min_jaccard=0.7,
                              emit_counts=True).to_pandas()
    assert (0, 1) in set(zip(cont["doc_a"], cont["doc_b"]))
    # the Jaccard face keeps nothing here (empty result loses its schema
    # through Ray's empty-block to_pandas, hence the emptiness check)
    assert jac.empty
    # counts face carries both set sizes
    r = cont[(cont["doc_a"] == 0) & (cont["doc_b"] == 1)].iloc[0]
    assert r["inter"] <= min(r["n_a"], r["n_b"])
    with pytest.raises(ValueError, match="unknown similarity"):
        jaccard_block_pairs(ds, similarity="dice")


@pytest.mark.parametrize("broadcast_limit", [5_000_000, 0])
def test_drop_duplicated_spans_sharded_parity(ray_session, tmp_path,
                                              broadcast_limit):
    """The memory-bounded ExactSubstr REWRITE equals the broadcast rewrite
    row-for-row, in both hit regimes (broadcast, and the per-doc
    start-list hash join forced by broadcast_limit=0); non-text columns
    flow through."""
    from splade_ray.ops.curation import (
        drop_duplicated_spans,
        drop_duplicated_spans_sharded,
    )

    texts = _dup_texts()
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "extra": pa.array([i * 10 for i in range(len(texts))], pa.int64()),
    })
    for k in (3, 5):
        ds = rd.from_arrow(tbl).repartition(3)
        want = (drop_duplicated_spans(ds, k=k, batch_size=2).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))
        got = (drop_duplicated_spans_sharded(
                   ds, str(tmp_path / f"rw{k}-{broadcast_limit}"), k=k,
                   n_shards=3, batch_size=2,
                   broadcast_limit=broadcast_limit)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got[want.columns], want, check_dtype=False)
        assert (got["extra"] == got["doc_id"] * 10).all()


def _brute_containment_pairs(texts, k, t):
    """All-pairs exact max-containment over distinct FNV k-gram hashes."""
    from splade_ray.ops.curation import _gram_hash_positions
    from splade_ray.ops.dedup import _flat_token_hashes

    tbl = pa.table({"t": pa.array(texts)})
    hs, par, _ = _flat_token_hashes(tbl["t"])
    g, gpar, _ = _gram_hash_positions(hs, par, k)
    sets = [set(g[gpar == i].tolist()) for i in range(len(texts))]
    out = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            inter = len(sets[i] & sets[j])
            m = min(len(sets[i]), len(sets[j]))
            if inter >= 1 and inter >= t * m:
                out.append((i, j, inter, len(sets[i]), len(sets[j])))
    return pd.DataFrame(out, columns=["doc_a", "doc_b", "inter", "n_a", "n_b"])


def _containment_corpus():
    little = ("the quick brown fox jumps over the lazy dog near the river "
              "bank every single morning")
    big = ("a very long document about many topics begins here with much "
           "padding text and then quotes verbatim " + little +
           " before continuing onward with entirely different material "
           "about distributed systems and streaming execution engines "
           "filling several more clauses of text to push it far into a "
           "different length band than the little one")
    return [
        little,
        big,
        "completely unrelated text mentioning none of those words at all "
        "just filler content for the corpus here",
        "",  # empty profile: pairs with nothing
        "tiny",  # shorter than k tokens -> empty profile
    ]


@pytest.mark.parametrize("pushdown_max_pairs", [100_000, 0])
def test_containment_sketch_pairs_exact_regime(ray_session,
                                               pushdown_max_pairs):
    """Complete sketches: the operator equals brute-force max-containment
    across ALL pairs — including the cross-length-band subset pair the
    blocked face excludes by construction. pushdown_max_pairs=0 forces
    the hash-join verification regime."""
    from splade_ray.ops.dedup import (
        containment_sketch_pairs,
        jaccard_block_pairs,
    )

    texts = _containment_corpus()
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    k, t = 4, 0.8
    want = _brute_containment_pairs(texts, k, t)
    got = (containment_sketch_pairs(
               rd.from_arrow(tbl).repartition(2), k=k, min_containment=t,
               emit_counts=True, pushdown_max_pairs=pushdown_max_pairs)
           .to_pandas().sort_values(["doc_a", "doc_b"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the subset pair (0 inside 1) IS found...
    assert (0, 1) in set(zip(got["doc_a"], got["doc_b"]))
    # ...and the blocked containment face misses it (different length band)
    blocked = jaccard_block_pairs(
        rd.from_arrow(tbl), min_jaccard=t, emit_counts=True,
        similarity="containment").to_pandas()
    assert blocked.empty or (0, 1) not in set(
        zip(blocked["doc_a"], blocked["doc_b"]))
    # empty-profile docs never pair
    assert not (got[["doc_a", "doc_b"]].isin([3, 4])).any().any()


def test_containment_sketch_pairs_sketched_regime(ray_session):
    """Small sketch_k: every returned pair is a TRUE pair (verification is
    exact) and the embedded-subset pair survives the sketch gate."""
    from splade_ray.ops.dedup import containment_sketch_pairs

    texts = _containment_corpus()
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    k, t = 4, 0.8
    want = _brute_containment_pairs(texts, k, t)
    want_pairs = set(zip(want["doc_a"], want["doc_b"]))
    got = containment_sketch_pairs(
        rd.from_arrow(tbl).repartition(2), k=k, sketch_k=8,
        min_containment=t, emit_counts=True).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert got_pairs <= want_pairs
    assert (0, 1) in got_pairs
    # float face: rounded ratio in (0, 1]
    got_f = containment_sketch_pairs(
        rd.from_arrow(tbl).repartition(2), k=k, sketch_k=8,
        min_containment=t).to_pandas()
    assert ((got_f["containment_r"] > 0) & (got_f["containment_r"] <= 1)).all()


def test_cut_spans_batch_property(ray_session):
    """Property: _cut_spans_batch equals a scalar reference cut for random
    docs and random duplicated-window start sets (duplicate starts and
    overlapping windows included)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from splade_ray.ops.curation import _cut_spans_batch

    words = ["aa", "bb", "cc", "dd", "ee"]

    @settings(max_examples=60, deadline=None)
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(words), min_size=0, max_size=12),
            min_size=1, max_size=6),
        k=st.integers(1, 4),
        data=st.data(),
    )
    def check(docs, k, data):
        starts, rows = [], []
        for i, toks in enumerate(docs):
            m = max(len(toks) - k + 1, 0)
            if m:
                picks = data.draw(st.lists(
                    st.integers(0, m - 1), max_size=2 * m))
                starts.extend(picks)
                rows.extend([i] * len(picks))
        batch = pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([" ".join(t) for t in docs]),
        })
        got = _cut_spans_batch(
            batch, k=k, text_col="text",
            local_starts=np.array(starts, np.int64),
            rows=np.array(rows, np.int64),
        )["text"].to_pylist()
        for i, toks in enumerate(docs):
            covered = set()
            for s, r in zip(starts, rows):
                if r == i:
                    covered.update(range(s, s + k))
            want = " ".join(t for j, t in enumerate(toks) if j not in covered)
            assert got[i] == want, (i, toks, got[i], want)

    check()


@pytest.mark.parametrize("broadcast_limit", [5_000_000, 0])
def test_unit_dedup_sharded_parity(ray_session, tmp_path, broadcast_limit):
    """Memory-bounded sharded unit dedup equals unit_dedup(replace=True)
    row-for-row in both hit regimes; the stats face matches too."""
    from splade_ray.ops.curation import unit_dedup, unit_dedup_sharded

    texts = [
        "shared boiler sentence one. unique alpha beta. shared boiler "
        "sentence one.",
        "another doc here. shared boiler sentence one! gamma delta "
        "epsilon words.",
        "totally unique content. nothing repeated anywhere at all.",
        "",
        "another doc here? zeta eta theta.",
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "extra": pa.array([i * 7 for i in range(len(texts))], pa.int64()),
    })
    ds = rd.from_arrow(tbl).repartition(2)
    want = (unit_dedup(ds, min_count=2, replace=True).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    got = (unit_dedup_sharded(
               ds, str(tmp_path / f"w{broadcast_limit}"), min_count=2,
               n_shards=3, batch_size=2,
               broadcast_limit=broadcast_limit)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    assert (got["extra"] == got["doc_id"] * 7).all()
    # stats face parity
    want_s = (unit_dedup(ds, min_count=2).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    got_s = (unit_dedup_sharded(
                 ds, str(tmp_path / f"s{broadcast_limit}"), min_count=2,
                 n_shards=3, batch_size=2, replace=False,
                 broadcast_limit=broadcast_limit)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)
    # pass-1 manifest resume: param mismatch refuses
    from splade_ray.ops.curation import collect_dup_units_sharded

    with pytest.raises(ValueError, match="refusing"):
        collect_dup_units_sharded(
            ds, str(tmp_path / f"w{broadcast_limit}" / "dup_units"),
            min_count=3, n_shards=3)


def test_containment_exact_regime_df_cap_hit_raises(ray_session):
    """Regression (round-5 ADVICE): the exact regime (sketch_k=None) used
    to apply df_cap silently, breaking the documented every-pair contract
    when a gram was posted in > df_cap docs. It must refuse loudly now;
    the sketch regime keeps the (logged) cap."""
    import pytest as _pytest

    from splade_ray.ops.dedup import containment_sketch_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [f"{shared} unique tail token{i} filler{i}" for i in range(6)]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    with _pytest.raises(Exception, match="exact regime"):
        containment_sketch_pairs(
            rd.from_arrow(tbl), k=4, min_containment=0.9,
            df_cap=3, emit_counts=True).to_pandas()
    # sketched regime: same cap merely caps (logged), never raises
    got = containment_sketch_pairs(
        rd.from_arrow(tbl), k=4, sketch_k=4, min_containment=0.9,
        df_cap=3, emit_counts=True).to_pandas()
    assert isinstance(got, pd.DataFrame)
