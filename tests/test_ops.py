"""Tests for the training-data operators (dedup / ANN / textstats / media)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.ann import HyperplaneLSH, cosine_topk
from splade_ray.ops.dedup import (
    exact_dedup,
    jaccard_block_pairs,
    minhash_lsh_pairs,
    minhash_signature,
    _minhash_params,
    _shingles,
    simhash64,
    simhash_pairs,
)
from splade_ray.ops.media import DecodeStage, attach_fake_payload, decode_media
from splade_ray.ops.textstats import fingerprint_batch, langid_batch, quality_batch


def _docs_ds(rows):
    return rd.from_items(rows)


def test_exact_dedup(ray_session):
    ds = _docs_ds(
        [
            {"doc_id": 3, "text": "a b c"},
            {"doc_id": 1, "text": "a b c"},
            {"doc_id": 2, "text": "x y"},
        ]
    )
    out = exact_dedup(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_copies"].tolist() == [2, 1]


def test_minhash_identical_docs_high_jaccard(ray_session):
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    near = base.replace("lazy", "sleepy")
    far = "completely different content about inverted indexes and arrow batches"
    ds = _docs_ds(
        [
            {"doc_id": 0, "text": base},
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": far},
        ]
    )
    out = minhash_lsh_pairs(ds, min_est_jaccard=0.4).to_pandas()
    pairs = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in pairs  # identical -> est_jaccard 1.0
    est = out[(out.doc_a == 0) & (out.doc_b == 1)]["est_jaccard"].iloc[0]
    assert est == 1.0
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_minhash_estimate_tracks_true_jaccard():
    a, b = _minhash_params(256)
    s1 = _shingles("one two three four five six seven eight nine ten".split())
    s2 = _shingles("one two three four five six seven eight different tokens".split())
    true_j = len(s1 & s2) / len(s1 | s2)
    sig1 = minhash_signature(s1, a, b)
    sig2 = minhash_signature(s2, a, b)
    est = (sig1 == sig2).mean()
    assert abs(est - true_j) < 0.2


def test_simhash_identical_and_distinct(ray_session):
    t1 = "alpha beta gamma delta epsilon zeta eta theta " * 4
    ds = _docs_ds(
        [
            {"doc_id": 0, "text": t1},
            {"doc_id": 1, "text": t1},  # identical -> hamming 0
            {"doc_id": 2, "text": "unrelated words entirely here about parquet segments"},
        ]
    )
    out = simhash_pairs(ds, max_hamming=3).to_pandas()
    if len(out):
        pairs = set(zip(out["doc_a"], out["doc_b"]))
    else:
        pairs = set()
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_deterministic():
    assert simhash64(["a", "b", "c"]) == simhash64(["a", "b", "c"])
    assert simhash64([]) == 0


def test_jaccard_block_pairs(ray_session):
    t = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    ds = _docs_ds(
        [
            {"doc_id": 0, "text": t, "lang": "en"},
            {"doc_id": 1, "text": t, "lang": "en"},
            {"doc_id": 2, "text": t, "lang": "fr"},  # other lang block
        ]
    )
    out = jaccard_block_pairs(ds, min_jaccard=0.9).to_pandas()
    assert set(zip(out["doc_a"], out["doc_b"])) == {(0, 1)}
    assert out["jaccard_r"].iloc[0] == 1.0


def test_cosine_topk_exact(ray_session):
    rng = np.random.RandomState(0)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(50)]
    ds = rd.from_items(rows)
    q = vecs[:2].astype(np.float64)
    out = cosine_topk(ds, np.array([0, 1]), q, top_k=5).to_pandas()
    # brute force oracle
    vn = vecs.astype(np.float64)
    vn = vn / np.linalg.norm(vn, axis=1, keepdims=True)
    for qid in (0, 1):
        sims = vn @ vn[qid]
        order = np.lexsort((np.arange(50), -sims))[:5]
        got = out[out.query_id == qid].sort_values("rank")["vec_id"].tolist()
        assert got == order.tolist()
        assert out[out.query_id == qid]["rank"].tolist() == [1, 2, 3, 4, 5]


def test_sq8_cosine_topk_matches_scalar_quantized(ray_session):
    """SQ8 cosine: op parity vs a scalar-quantized brute reference, plus
    high agreement with float cosine (quantization recall sanity)."""
    from splade_ray.ops.ann import sq8_cosine_topk, sq8_quantize_matrix

    rng = np.random.RandomState(3)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(60)]
    ds = rd.from_items(rows)
    q = vecs[:3].astype(np.float64)
    out = sq8_cosine_topk(ds, np.array([0, 1, 2]), q, top_k=5).to_pandas()

    qz = sq8_quantize_matrix(vecs)
    # scalar reference: int dots, norms from the SAME codes
    norms = np.sqrt((qz * qz).sum(axis=1).astype(np.float64))
    for qid in (0, 1, 2):
        sims = (qz @ qz[qid]).astype(np.float64) / (norms * norms[qid])
        order = np.lexsort((np.arange(60), -sims))[:5]
        sub = out[out.query_id == qid].sort_values("rank")
        assert sub["vec_id"].tolist() == order.tolist()
        assert np.allclose(sub["sim"].to_numpy(), sims[order], atol=1e-12)
    # int8 quantization at dim 16 keeps the self-hit on top
    assert (out[out["rank"] == 1]["vec_id"].to_numpy()
            == np.array([0, 1, 2])).all()

    # quantization invariants
    assert qz.max() <= 127 and qz.min() >= -127
    assert (np.abs(qz).max(axis=1) == 127).all()  # maxabs element saturates
    assert (sq8_quantize_matrix(np.zeros((2, 4), np.float32)) == 0).all()


def test_lsh_signature_deterministic():
    l1 = HyperplaneLSH(8, 12, seed=42)
    l2 = HyperplaneLSH(8, 12, seed=42)
    m = np.random.RandomState(1).normal(size=(5, 8))
    assert np.array_equal(l1.signature(m), l2.signature(m))


def test_quality_batch_ratios():
    t = pa.table({"doc_id": [0, 1], "text": ["abc 123", ""]})
    out = quality_batch(t)
    assert out["n_tokens"].to_pylist() == [2, 0]
    assert out["alpha_ratio_r"].to_pylist()[0] == pytest.approx(3 / 7, abs=1e-4)
    assert out["digit_ratio_r"].to_pylist()[1] == 0.0


def test_gopher_rules_flags():
    from splade_ray.ops.textstats import gopher_rules_batch

    good = "the cat and the dog ran to the house in the rain " * 6  # 72 words
    short = "the and of to in"  # stopwords present but only 5 words
    bullets = "\n".join(f"- item {i} the and" for i in range(10)) + "\nthe and plain"
    symbols = ("the and " + "# " * 40) * 2  # symbol-to-word ratio >> 0.1
    t = pa.table(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [good, short, bullets, symbols],
        }
    )
    out = gopher_rules_batch(t, min_words=10)
    rows = {d: i for i, d in enumerate(out["doc_id"].to_pylist())}
    assert out["pass_gopher"].to_pylist()[rows[0]] is True
    # doc 1 fails the word-count floor only
    assert out["n_words"].to_pylist()[rows[1]] == 5
    assert out["pass_gopher"].to_pylist()[rows[1]] is False
    # doc 2: 10 of 11 lines are bullets -> 10*10 > 9*11 fails the bullet rule
    assert out["n_bullet_lines"].to_pylist()[rows[2]] == 10
    assert out["n_lines"].to_pylist()[rows[2]] == 11
    assert out["pass_gopher"].to_pylist()[rows[2]] is False
    # doc 3: 80 '#' among 164 words fails the symbol rule
    assert out["n_symbols"].to_pylist()[rows[3]] == 80
    assert out["pass_gopher"].to_pylist()[rows[3]] is False
    assert out["n_stop_present"].to_pylist()[rows[0]] == 4  # the/and/to/in


def test_langid_heuristic():
    t = pa.table(
        {
            "doc_id": [0, 1],
            "text": ["the cat sat on the mat and the dog", "这是中文文本的一个例子"],
        }
    )
    out = langid_batch(t)
    assert out["pred_lang"].to_pylist()[0] == "en"
    assert out["pred_lang"].to_pylist()[1] == "zh"


def test_langid_fingerprint_vectorized_parity():
    """The vectorized langid/fingerprint kernels must reproduce the scalar
    per-row definition exactly (round-1 VERDICT item 5)."""
    import re

    from splade_ray.analysis import tokenize
    from splade_ray.ops.textstats import CJK_RE, STOPWORDS, hash_token

    texts = [
        "the cat sat on the mat and the dog",
        "这是中文文本的一个例子",
        "el perro y la casa de un gato es",
        "x" * 3,
        "",
        "one two three four five six seven eight nine ten",
        "a b",
        "der die das und ist in den von zu mit extra tokens here",
        "zz yy xx ww vv uu tt ss rr qq pp oo nn mm",
        "mixed 中文 and english the of to in",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})

    # scalar langid reference (the pre-vectorization definition)
    def ref_langid(text):
        tl = (text or "").lower()
        toks = tokenize(tl)
        n = max(len(toks), 1)
        if CJK_RE.search(tl):
            return "zh", min(1.0, len(CJK_RE.findall(tl)) / max(len(tl), 1) * 4)
        scores = {
            lang: sum(tok in sw for tok in toks) / n
            for lang, sw in STOPWORDS.items() if sw
        }
        best = max(sorted(scores), key=lambda k: scores[k])
        conf = scores[best]
        return ("unknown" if conf == 0.0 else best), conf

    from splade_ray.ops.textstats import fingerprint_batch, langid_batch

    out = langid_batch(t)
    for i, text in enumerate(texts):
        lang, conf = ref_langid(text)
        assert out["pred_lang"][i].as_py() == lang, (i, text)
        assert abs(out["confidence"][i].as_py() - round(conf, 4)) < 1e-9, (i, text)

    # scalar fingerprint reference
    def ref_fp(text, window=8):
        P = np.uint64(1099511628211)
        toks = tokenize(text or "")
        hs = np.array([hash_token(x) for x in toks] or [0], np.uint64)
        with np.errstate(over="ignore"):
            if hs.size >= window:
                roll = np.zeros(hs.size - window + 1, np.uint64)
                for i in range(window):
                    roll = roll * P + hs[i : i + roll.size]
                return int(roll.min())
            acc = np.uint64(0)
            for h in hs:
                acc = acc * P + h
            return int(acc)

    fout = fingerprint_batch(t)
    for i, text in enumerate(texts):
        assert fout["fingerprint"][i].as_py() == ref_fp(text), (i, text)


def test_fingerprint_deterministic_and_sensitive():
    t1 = pa.table({"doc_id": [0], "text": ["one two three four five six seven eight nine"]})
    t2 = pa.table({"doc_id": [0], "text": ["one two three four five six seven eight ten"]})
    f1 = fingerprint_batch(t1)["fingerprint"].to_pylist()[0]
    f1b = fingerprint_batch(t1)["fingerprint"].to_pylist()[0]
    f2 = fingerprint_batch(t2)["fingerprint"].to_pylist()[0]
    assert f1 == f1b
    assert f1 != f2


def test_media_decode_fake_and_real_stub(ray_session):
    docs = rd.from_items([{"doc_id": i, "text": f"payload {i}"} for i in range(10)])
    media = docs.map_batches(attach_fake_payload, batch_format="pyarrow")
    out = decode_media(media, batch_size=4, concurrency=2).to_pandas()
    assert len(out) == 10
    assert (out["n_bytes"] > 0).all()
    assert set(out["media_type"]) == {"image", "audio"}
    # the real decode path is an explicit stub
    stage = DecodeStage(real=True)
    with pytest.raises(NotImplementedError):
        stage(attach_fake_payload(pa.table({"doc_id": [0], "text": ["x"]})))


def test_ivf_topk_exact_when_probing_all(ray_session):
    """nprobe == n_clusters scans everything -> must equal brute force."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.ann import cosine_topk, ivf_topk

    rng = np.random.RandomState(9)
    mat = rng.normal(size=(200, 16))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(200), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in mat]),
            }
        )
    )
    q_ids = np.array([0, 1, 2])
    q = mat[:3]
    exact = cosine_topk(ds, q_ids, q, top_k=5).to_pandas().reset_index(drop=True)
    ivf_all = (
        ivf_topk(ds, q_ids, q, n_clusters=8, nprobe=8, top_k=5)
        .to_pandas()
        .reset_index(drop=True)
    )
    pd = __import__("pandas")
    pd.testing.assert_frame_equal(
        exact.sort_values(["query_id", "rank"]).reset_index(drop=True),
        ivf_all.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_ivf_topk_probe_subset_recall(ray_session):
    """nprobe=2 of 8: the true top-1 (a planted duplicate vector, cosine 1.0
    -> same cluster as the query) must still be found."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.ann import ivf_topk

    rng = np.random.RandomState(10)
    mat = rng.normal(size=(300, 16))
    mat[123] = mat[0] * 2.0  # exact-direction duplicate of query 0
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(300), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in mat]),
            }
        )
    )
    out = ivf_topk(ds, np.array([0]), mat[:1], n_clusters=8, nprobe=2, top_k=3).to_pandas()
    top = out[out["rank"] == 1].iloc[0]
    assert top["vec_id"] in (0, 123) and top["sim"] > 0.9999


def test_ivf_search_reads_only_probed_partitions(ray_session, tmp_path):
    """The on-disk IVF index is cluster-partitioned; a search with nprobe=2
    must list ONLY the probed cluster directories among its input files —
    unprobed partitions never leave storage."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.ann import _normalize, ivf_build, ivf_search

    rng = np.random.RandomState(11)
    mat = rng.normal(size=(400, 16))
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(400), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in mat]),
            }
        )
    )
    idx = str(tmp_path / "ivf")
    cents = ivf_build(ds, idx, n_clusters=8, seed=42)
    qmat = _normalize(mat[:2])
    probes = np.argsort(-(qmat @ _normalize(cents).T), axis=1)[:, :2]
    probed = {int(c) for row in probes for c in row}
    import re
    from unittest import mock

    opened: list[str] = []
    real_read = rd.read_parquet

    def recording_read(paths, **kw):
        for p in [paths] if isinstance(paths, str) else list(paths):
            opened.append(p)
        return real_read(paths, **kw)

    with mock.patch.object(rd, "read_parquet", recording_read):
        out_ds = ivf_search(idx, np.array([0, 1]), mat[:2], nprobe=2, top_k=3)
        out = out_ds.to_pandas()
    assert opened, "expected partition-directory reads"
    seen = {int(m.group(1)) for f in opened for m in [re.search(r"cluster=(\d+)", f)] if m}
    assert seen and seen.issubset(probed), (seen, probed)
    # and the result itself is sane
    assert (out[out["rank"] == 1].set_index("query_id")["vec_id"] == [0, 1]).all()


def test_media_resize_and_frame_sample(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.media import (
        attach_fake_payload, decode_media, frame_sample, resize_media,
    )

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array([f"doc {i} body" for i in range(6)]),
            }
        )
    )
    media = docs.map_batches(attach_fake_payload, batch_format="pyarrow")
    resized = resize_media(media, width=32, height=32, concurrency=1).to_pandas()
    assert set(resized["width"]) == {32} and all(len(p) == 32 for p in resized["payload"])
    # deterministic: same payload -> same resized bytes
    r2 = resize_media(media, width=32, height=32, concurrency=1).to_pandas()
    assert list(resized["payload"]) == list(r2["payload"])

    decoded = decode_media(media, batch_size=4, concurrency=1)
    frames = frame_sample(decoded, every_n=1000).to_pandas()
    dec = decoded.to_pandas()
    import math

    want = sum(math.ceil(f / 1000) for f in dec["frames"])
    assert len(frames) == want
    assert (frames["frame_idx"] % 1000 == 0).all()


def test_media_real_decode_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from splade_ray.ops.media import attach_fake_payload, decode_media

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["x"])})
    )
    media = docs.map_batches(attach_fake_payload, batch_format="pyarrow")
    with pytest.raises(Exception, match="NotImplementedError|real image"):
        decode_media(media, concurrency=1, real=True).to_pandas()


def test_ivf_search_no_probed_partitions_returns_empty(ray_session, tmp_path):
    """An IVF index whose probed clusters hold no vectors must return an
    empty run frame, not IndexError (round-2 ADVICE item 5b)."""
    import numpy as np

    from splade_ray.ops.ann import ivf_search

    idx = str(tmp_path / "ivf-empty")
    import os

    os.makedirs(idx)
    cents = np.eye(4, 8)  # 4 clusters, no cluster=K partition dirs on disk
    np.save(os.path.join(idx, "centroids.npy"), cents)
    out = ivf_search(
        idx, np.array([0]), np.ones((1, 8)), nprobe=2, top_k=5, centroids=cents
    )
    # run-frame schema preserved even when empty (Ray's to_pandas drops
    # columns for 0-row datasets, so assert on the Dataset schema)
    assert set(out.schema().names) == {"query_id", "rank", "vec_id", "sim"}
    assert len(out.to_pandas()) == 0


def test_minhash_vectorized_matches_scalar():
    """Vectorized MinHashStage == scalar _shingles + minhash_signature per
    doc (round-2 VERDICT item 2 parity gate)."""
    import numpy as np
    import pyarrow as pa

    from splade_ray.analysis import tokenize
    from splade_ray.ops.dedup import (
        MinHashStage,
        _minhash_params,
        _shingles,
        minhash_signature,
    )

    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon zeta",  # identical twin
        "one two",  # shorter than k
        "",  # empty
        "单 字 流 one two three four",  # unicode
        "x " * 50,  # repeated token
    ]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    stage = MinHashStage(num_perm=32, shingle_k=3, seed=42)
    out = stage(batch)
    a, b = _minhash_params(32, 42)
    for i, text in enumerate(texts):
        want = minhash_signature(_shingles(tokenize(text), 3), a, b)
        got = np.frombuffer(out["sig"][i].as_py(), np.uint64)
        assert np.array_equal(got, want), f"doc {i}"


def test_simhash_vectorized_matches_scalar():
    import numpy as np
    import pyarrow as pa

    from splade_ray.analysis import tokenize
    from splade_ray.ops.dedup import simhash64, simhash_batch

    texts = ["alpha beta beta gamma", "", "单字流 test", "x " * 40, "one"]
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = simhash_batch(batch)["simhash"].to_pylist()
    want = [simhash64(tokenize(t)) for t in texts]
    assert got == want


def test_bucket_pairs_capped_on_degenerate_bucket():
    """A degenerate LSH bucket (everything identical) must be truncated to
    MAX_BUCKET_DOCS, not run an unbounded quadratic."""
    import numpy as np
    import pandas as pd

    from splade_ray.ops.dedup import _bucket_pairs

    g = pd.DataFrame(
        {"doc_id": np.arange(5000, dtype=np.int64), "band": 0, "band_hash": 1}
    )
    out = _bucket_pairs(g, max_bucket=100)
    assert len(out) == 100 * 99 // 2
    assert out["doc_a"].max() < 100  # kept the first (sorted) cap docs


def test_jaccard_triangle_salting_exact(ray_session):
    """Sub-salted oversized blocks emit EXACTLY the same pairs as the
    unsalted operator (every pair lands in exactly one bounded sub-group)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from splade_ray.ops.dedup import jaccard_block_pairs

    rng = np.random.RandomState(3)
    vocab = ["red", "blue", "green", "tok", "alpha", "beta"]
    # 90 docs, all same lang and same length band -> one hot block
    texts = [
        " ".join(vocab[j] for j in rng.randint(0, len(vocab), 12)) for _ in range(90)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(90), pa.int64()),
            "lang": pa.array(["en"] * 90, pa.string()),
            "text": pa.array(texts, pa.string()),
        }
    )

    def run(cap):
        out = (
            jaccard_block_pairs(
                rd.from_arrow(t), min_jaccard=0.2, emit_counts=True,
                max_block_docs=cap,
            )
            .to_pandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        return out

    unsalted = run(10**9)
    salted = run(16)  # 90 docs -> S=6 sub-salts, groups of <= ~32 docs
    assert len(unsalted) > 0
    pd.testing.assert_frame_equal(salted, unsalted)


def test_jaccard_salted_group_sizes_bounded(ray_session):
    """The skew guard actually bounds per-task group sizes: with a hot
    (lang, band) block of 400 docs and cap 50, no (gi, gj) sub-group may
    exceed ~2 salt-partitions of rows."""
    import numpy as np
    import pyarrow as pa

    cap = 50
    n_docs = 400
    s = -(-n_docs // cap)  # ceil -> 8 sub-salts
    # mirror the keyed() expansion arithmetic directly
    doc_ids = np.arange(n_docs, dtype=np.int64)
    salts = doc_ids % s
    group_rows: dict[tuple[int, int], int] = {}
    for did, salt in zip(doc_ids, salts):
        for j in range(s):
            k = (min(salt, j), max(salt, j))
            group_rows[k] = group_rows.get(k, 0) + 1
    per_salt = -(-n_docs // s) + 1
    assert max(group_rows.values()) <= 2 * per_salt
    # and every unordered pair is covered exactly once
    cover = 0
    for (gi, gj), _ in group_rows.items():
        a = int((salts == gi).sum())
        b = int((salts == gj).sum())
        cover += a * (a - 1) // 2 if gi == gj else a * b
    assert cover == n_docs * (n_docs - 1) // 2


def test_repetition_scalar_parity():
    """repetition_batch (vectorized sort/reduceat kernels) matches a direct
    Counter-based scalar reference on edge cases: empty doc, 1 token,
    exactly-n tokens, heavy phrase repetition, count ties."""
    from collections import Counter

    from splade_ray.analysis import tokenize_column
    from splade_ray.ops.textstats import hash_token, repetition_batch

    P, M = 1099511628211, 1 << 64

    def scalar(text):
        terms, _, _ = tokenize_column(pa.array([text], pa.string()))
        hs = [int(hash_token(t)) for t in terms.to_pylist()]

        def gram(i, n):
            v = 0
            for h in hs[i : i + n]:
                v = (v * P + h) % M
            return v

        def top(n):
            if len(hs) < n:
                return 0, 0
            c = Counter(gram(i, n) for i in range(len(hs) - n + 1))
            mx = max(c.values())
            return mx, min(g for g, v in c.items() if v == mx)

        n5 = max(len(hs) - 4, 0)
        d5 = Counter(gram(i, 5) for i in range(n5))
        return {
            "n_tokens": len(hs),
            "top2": top(2),
            "top3": top(3),
            "n_grams5": n5,
            "dup5_count": n5 - len(d5),
        }

    texts = [
        "",
        "one",
        "two tokens",
        "spark spark spark spark spark spark",          # one gram repeated
        "a b a b a b a b c d e f g h",                  # heavy 2-gram repetition
        "x y z x y z x y z x y z",                      # repeated 3-phrase
        "all distinct tokens here never repeat at once",  # tie: every gram count 1
        "exactly five tokens right here",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = repetition_batch(t)
    rows = {d: i for i, d in enumerate(out["doc_id"].to_pylist())}
    for did, text in enumerate(texts):
        ref = scalar(text)
        i = rows[did]
        assert out["n_tokens"][i].as_py() == ref["n_tokens"], did
        assert out["top2_count"][i].as_py() == ref["top2"][0], did
        assert out["top2_gram"][i].as_py() == ref["top2"][1], did
        assert out["top3_count"][i].as_py() == ref["top3"][0], did
        assert out["top3_gram"][i].as_py() == ref["top3"][1], did
        assert out["n_grams5"][i].as_py() == ref["n_grams5"], did
        assert out["dup5_count"][i].as_py() == ref["dup5_count"], did


def test_repetition_flags():
    from splade_ray.ops.textstats import repetition_batch

    clean = " ".join(f"tok{i}" for i in range(40))       # all grams unique
    loop2 = "a b " * 20                                   # top 2-gram dominates
    loop5 = " ".join(["v w x y z"] * 8)                   # duplicated 5-grams
    t = pa.table({"doc_id": [0, 1, 2], "text": [clean, loop2, loop5]})
    out = repetition_batch(t)
    rows = {d: i for i, d in enumerate(out["doc_id"].to_pylist())}
    assert out["pass_repetition"][rows[0]].as_py() is True
    assert out["rep_top2"][rows[1]].as_py() is True
    assert out["pass_repetition"][rows[1]].as_py() is False
    assert out["rep_dup5"][rows[2]].as_py() is True
    assert out["pass_repetition"][rows[2]].as_py() is False


def test_repetition_oracle_parity_duckdb():
    """The HUGEINT rolling-fold SQL mirror reproduces repetition_batch
    bit-for-bit on a fixture corpus (the local twin of the driver's
    correctness gate for `repetition_stats`)."""
    import duckdb

    from splade_ray.ops.textstats import repetition_batch

    sys_path_root = __import__("os").path.dirname(__import__("os").path.dirname(__file__))
    import sys

    sys.path.insert(0, sys_path_root)
    import __ray_entry__ as e

    texts = [
        "",
        "one",
        "spark spark spark spark spark spark",
        "a b a b a b a b c d e f g h",
        "x y z x y z x y z x y z",
        "the quick brown fox jumps over the lazy dog the quick brown fox",
    ]
    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    con = duckdb.connect()
    con.register("documents", docs)
    got = con.execute(e._repetition_sql()).df()
    want = repetition_batch(
        pa.table({"doc_id": docs.doc_id.tolist(), "text": texts})
    ).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)[sorted(got.columns)]
    want = want.sort_values("doc_id").reset_index(drop=True)[sorted(want.columns)]
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        assert (
            got[c].astype("uint64" if c.endswith("_gram") else got[c].dtype).tolist()
            == want[c].tolist()
        ), c


def test_rademacher_lsh_scalar_parity_and_determinism():
    """Integer-exact LSH: vectorized signature == plain-Python-int reference
    (no float ambiguity anywhere), stable across instances (seeded sha256
    signs), sign matrix is ±1 only."""
    import hashlib

    from splade_ray.ops.ann import RademacherLSH

    dim, n_planes, seed, bits = 16, 6, 42, 20
    lsh = RademacherLSH(dim, n_planes, seed, bits)
    assert set(np.unique(lsh.signs)) == {-1, 1}
    # signs derive from sha256(seed:p:j) low bit
    for p, j in [(0, 0), (3, 7), (5, 15)]:
        h = hashlib.sha256(f"{seed}:{p}:{j}".encode()).digest()
        assert lsh.signs[p, j] == (1 if h[0] & 1 else -1)

    rng = np.random.default_rng(5)
    m = rng.normal(size=(40, dim)).astype(np.float32)
    got = lsh.signature(m)

    scale = 1 << bits
    for r in range(m.shape[0]):
        xi = [int(np.floor(float(np.float64(x)) * scale + 0.5)) for x in m[r]]
        bucket = 0
        for p in range(n_planes):
            dot = sum(int(lsh.signs[p, j]) * xi[j] for j in range(dim))
            if dot > 0:
                bucket |= 1 << p
        assert got[r] == bucket, r

    # a second instance with the same seed is identical; a different seed isn't
    assert np.array_equal(RademacherLSH(dim, n_planes, seed, bits).signature(m), got)
    assert not np.array_equal(
        RademacherLSH(dim, n_planes, seed + 1, bits).signature(m), got
    )


def test_c4_rules_flags(ray_session):
    import pyarrow as pa

    from splade_ray.ops.textstats import c4_rules_batch

    texts = [
        "This is a fine sentence here.\nAnother good long sentence ends too!\nAnd a third one follows, truly?",
        "contains lorem ipsum filler.\nSecond sentence is here.\nThird sentence is here.",
        "code { block }\nSentence one is here.\nSentence two is here.\nSentence three is here.",
        "Please enable JavaScript to view.\nOne more sentence right here.\nAnd another sentence right here.",
        "short line\nno terminal punctuation at all",
        "",
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    out = c4_rules_batch(batch)
    assert out["pass_c4"].to_pylist() == [True, False, False, False, False, False]
    assert out["has_lorem"].to_pylist()[1] is True
    assert out["has_brace"].to_pylist()[2] is True
    assert out["has_javascript"].to_pylist()[3] is True
    assert out["n_terminal_lines"].to_pylist()[0] == 3
    # 'short line' (2 words) and 'no terminal punctuation at all' (5 words):
    # one short line; doc 0's lines all have >= 5 words
    assert out["n_short_lines"].to_pylist()[4] == 1
    assert out["n_short_lines"].to_pylist()[0] == 0
    assert out["n_lines"].to_pylist()[5] == 1  # empty doc: 1 line, nothing passes


def test_pq_lossless_when_codebook_covers_data(ray_session):
    """ks = n distinct vectors with sampled-row init => centroids are the
    data points themselves, quantization is lossless and PQ == brute."""
    from splade_ray.ops.ann import pq_cosine_topk

    rng = np.random.RandomState(4)
    n, d = 40, 8
    vecs = rng.normal(size=(n, d))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    ds = rd.from_items(rows)
    q = vecs[:3]
    got = pq_cosine_topk(
        ds, np.arange(3), q, m=2, ks=n, iters=5, sample_size=n, top_k=6
    )
    brute = cosine_topk(ds, np.arange(3), q, top_k=6).to_pandas()
    assert got["vec_id"].tolist() == brute["vec_id"].tolist()
    np.testing.assert_allclose(
        got["sim"].to_numpy(), brute["sim"].to_numpy(), rtol=1e-9
    )


def test_pq_deterministic_and_reasonable_recall(ray_session):
    from splade_ray.ops.ann import pq_cosine_topk

    rng = np.random.RandomState(9)
    n, d = 400, 16
    vecs = rng.normal(size=(n, d))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    ds = rd.from_items(rows)
    q = vecs[:5]
    # fine codes (dsub=2, ks=64) — the high-recall end of the PQ tradeoff
    a = pq_cosine_topk(ds, np.arange(5), q, m=8, ks=64, top_k=10, sample_size=400)
    b = pq_cosine_topk(ds, np.arange(5), q, m=8, ks=64, top_k=10, sample_size=400)
    pd.testing.assert_frame_equal(a, b)  # seeded determinism
    brute = cosine_topk(ds, np.arange(5), q, top_k=10).to_pandas()
    recalls = []
    for qid in range(5):
        g = set(a[a.query_id == qid]["vec_id"])
        t = set(brute[brute.query_id == qid]["vec_id"])
        recalls.append(len(g & t) / len(t))
    assert np.mean(recalls) >= 0.6, recalls
    # and the ADC approximation error itself is small at this code rate:
    # each query's own vector must rank #1 with sim ~ 1
    for qid in range(5):
        top = a[a.query_id == qid].iloc[0]
        assert top["vec_id"] == qid and top["sim"] > 0.9


def test_pq_rejects_indivisible_dim():
    from splade_ray.ops.ann import pq_train

    with pytest.raises(ValueError, match="not divisible"):
        pq_train(np.zeros((10, 7)), m=2, ks=4)


def test_ivfpq_full_probe_equals_flat_pq(ray_session, tmp_path):
    """nprobe = n_clusters scans every code partition, so IVF-PQ must
    reproduce the flat PQ scan exactly (same sample -> same codebooks ->
    identical codes and ADC tables)."""
    from splade_ray.ops.ann import ivfpq_build, ivfpq_search, pq_cosine_topk

    rng = np.random.RandomState(11)
    n, d = 300, 16
    vecs = rng.normal(size=(n, d))
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    ds = rd.from_items(rows)
    q = vecs[:4]
    idx = str(tmp_path / "ivfpq")
    ivfpq_build(ds, idx, n_clusters=6, m=8, ks=32, sample_size=n, seed=7)
    got = (
        ivfpq_search(idx, np.arange(4), q, nprobe=6, top_k=8)
        .to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    flat = pq_cosine_topk(ds, np.arange(4), q, m=8, ks=32, sample_size=n,
                          seed=7, top_k=8)
    assert got["vec_id"].tolist() == flat["vec_id"].tolist()
    np.testing.assert_allclose(
        got["sim"].to_numpy(), flat["sim"].to_numpy(), rtol=1e-9
    )


def test_ivfpq_reads_only_probed_partitions(ray_session, tmp_path):
    """I/O isolation: after deleting every unprobed cluster partition the
    probed search still answers identically — codes in unprobed clusters
    never load."""
    import shutil

    from splade_ray.ops.ann import ivfpq_build, ivfpq_search

    rng = np.random.RandomState(12)
    n, d = 300, 16
    vecs = rng.normal(size=(n, d))
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    )
    q = vecs[:3]
    idx = str(tmp_path / "ivfpq")
    ivfpq_build(ds, idx, n_clusters=8, m=4, ks=16, sample_size=n, seed=7)
    before = ivfpq_search(idx, np.arange(3), q, nprobe=2, top_k=5).to_pandas()
    cents = np.load(f"{idx}/centroids.npy")
    from splade_ray.ops.ann import _normalize

    qn = _normalize(q)
    cn = _normalize(cents)
    probes = np.argsort(-(qn @ cn.T), axis=1)[:, :2]
    probed = {int(c) for row in probes for c in row}
    import os

    for name in os.listdir(idx):
        if name.startswith("cluster=") and int(name.split("=")[1]) not in probed:
            shutil.rmtree(os.path.join(idx, name))
    after = ivfpq_search(idx, np.arange(3), q, nprobe=2, top_k=5).to_pandas()
    pd.testing.assert_frame_equal(
        before.sort_values(["query_id", "rank"]).reset_index(drop=True),
        after.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_ivfpq_codes_layout_is_bytes(ray_session, tmp_path):
    """The persisted layout stores m uint8 codes per vector — no raw
    floats on disk (the billion-scale memory path)."""
    import os

    import pyarrow.dataset as pads

    from splade_ray.ops.ann import ivfpq_build

    rng = np.random.RandomState(13)
    n, d = 120, 16
    ds = rd.from_items(
        [{"vec_id": i, "embedding": rng.normal(size=d).tolist()}
         for i in range(n)]
    )
    idx = str(tmp_path / "ivfpq")
    ivfpq_build(ds, idx, n_clusters=4, m=4, ks=16, sample_size=n)
    import glob

    one = glob.glob(os.path.join(idx, "cluster=*", "*.parquet"))[0]
    schema = pads.dataset(one).schema
    assert "embedding" not in schema.names
    codes_type = schema.field("codes").type
    assert pa.types.is_fixed_size_list(codes_type) or pa.types.is_list(codes_type)
    assert codes_type.value_type == pa.uint8()


def test_ivfpq_residual_reduces_quantization_error(ray_session, tmp_path):
    """Classic IVFADC: at the same (m, ks) byte budget, residual encoding
    approximates true cosine much better on clustered vectors — the
    codebook spends its bits on the small residual cell instead of the
    whole sphere. Measured as mean |ADC sim − true sim| over every
    (query, vector) pair (full probe, k = n)."""
    from splade_ray.ops.ann import _normalize, cosine_topk, ivfpq_build, ivfpq_search

    rng = np.random.RandomState(21)
    n_centers, per, d = 8, 60, 16
    centers = rng.normal(size=(n_centers, d)) * 3.0
    vecs = np.concatenate(
        [c + rng.normal(size=(per, d)) * 0.3 for c in centers]
    )
    n = vecs.shape[0]
    ds = rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    )
    q = vecs[:6] + rng.normal(size=(6, d)) * 0.05
    true_sims = _normalize(q) @ _normalize(vecs).T  # (6, n)

    def mean_abs_err(idx_dir, residual):
        ivfpq_build(ds, idx_dir, n_clusters=8, m=4, ks=8, sample_size=n,
                    seed=3, residual=residual)
        run = ivfpq_search(idx_dir, np.arange(6), q, nprobe=8,
                           top_k=n).to_pandas()
        errs = np.abs(
            run["sim"].to_numpy()
            - true_sims[run["query_id"].to_numpy(np.int64),
                        run["vec_id"].to_numpy(np.int64)]
        )
        assert len(run) == 6 * n  # full probe, k = n covers every pair
        return float(errs.mean())

    e_direct = mean_abs_err(str(tmp_path / "direct"), False)
    e_residual = mean_abs_err(str(tmp_path / "residual"), True)
    # residual coding cuts the approximation error by a wide margin
    assert e_residual < 0.5 * e_direct, (e_residual, e_direct)
    assert e_residual < 0.05
