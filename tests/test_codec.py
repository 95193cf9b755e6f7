import numpy as np
import pytest

from splade_ray.codec import (
    delta_decode,
    delta_encode,
    decode_doc_ids,
    encode_doc_ids,
    quantize_impacts,
    rewrite_first_delta,
    varbyte_decode,
    varbyte_encode,
)
from splade_ray.segments import decode_block, decode_posting, encode_posting


def test_varbyte_roundtrip_small():
    a = np.array([0, 1, 127, 128, 300, 2**20, 2**40], np.int64)
    assert np.array_equal(varbyte_decode(varbyte_encode(a)).astype(np.int64), a)


def test_varbyte_empty():
    assert varbyte_encode(np.empty(0, np.int64)) == b""
    assert varbyte_decode(b"").size == 0


def test_varbyte_roundtrip_random():
    rng = np.random.RandomState(42)
    for _ in range(20):
        a = rng.randint(0, 2**50, size=rng.randint(1, 5000)).astype(np.int64)
        assert np.array_equal(varbyte_decode(varbyte_encode(a)).astype(np.int64), a)


def test_delta_roundtrip():
    rng = np.random.RandomState(7)
    ids = np.unique(rng.randint(0, 10**9, size=10000))
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)
    assert np.array_equal(decode_doc_ids(encode_doc_ids(ids), len(ids)), ids)


def test_delta_rejects_unsorted():
    with pytest.raises(ValueError):
        delta_encode(np.array([3, 2, 5]))


def test_quantize_half_up():
    # floor(x*100+0.5): 0.005 -> 1 (not banker's rounding)
    v = np.array([0.005, 0.014, 0.015, 1.0, 0.0])
    assert quantize_impacts(v, 100).tolist() == [1, 1, 2, 100, 0]


def test_rewrite_first_delta_concat():
    a = np.array([5, 9, 20], np.int64)
    b = np.array([31, 40], np.int64)
    enc_a, enc_b = encode_doc_ids(a), encode_doc_ids(b)
    merged = enc_a + rewrite_first_delta(enc_b, first_abs=31, prev_last=20)
    assert decode_doc_ids(merged, 5).tolist() == [5, 9, 20, 31, 40]


def test_posting_block_roundtrip():
    rng = np.random.RandomState(3)
    docs = np.unique(rng.randint(0, 10**7, size=1000)).astype(np.int64)
    tfs = rng.randint(1, 50, size=docs.size).astype(np.int64)
    dls = rng.randint(1, 500, size=docs.size).astype(np.int64)
    enc = encode_posting(docs, tfs, dls, block_size=128)
    d2, t2 = decode_posting(enc["docs_enc"], enc["tfs_enc"], enc["df"])
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tfs)
    # block-wise decode agrees and metadata is consistent
    nblocks = len(enc["bm_first_doc"])
    got_docs, got_tfs = [], []
    for i in range(nblocks):
        bd, bt = decode_block(
            enc["docs_enc"], enc["tfs_enc"], enc["bm_doc_off"], enc["bm_tf_off"],
            enc["bm_last_doc"], i,
        )
        assert bd[0] == enc["bm_first_doc"][i]
        assert bd[-1] == enc["bm_last_doc"][i]
        assert bt.max() == enc["bm_tf_max"][i]
        got_docs.append(bd)
        got_tfs.append(bt)
    assert np.array_equal(np.concatenate(got_docs), docs)
    assert np.array_equal(np.concatenate(got_tfs), tfs)


def test_merge_posting_rows_property():
    """Compaction merge equivalence, property-tested: for random ascending
    doc-id lists split into random run boundaries (each run independently
    encoded as its own segment posting), the merged row must decode to the
    full list, its block metadata must be internally consistent (offsets
    address real block boundaries), and block-wise decode through the merged
    ragged offsets must reproduce every block."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from splade_ray.compact import merge_posting_rows
    from splade_ray.segments import decode_block, decode_posting, encode_posting

    @settings(max_examples=60, deadline=None)
    @given(
        ids=st.lists(st.integers(0, 10**6), min_size=1, max_size=300, unique=True),
        cuts=st.lists(st.integers(1, 299), max_size=4, unique=True),
        block_size=st.sampled_from([3, 16, 128]),
        data=st.data(),
    )
    def check(ids, cuts, block_size, data):
        doc_ids = np.array(sorted(ids), np.int64)
        n = doc_ids.size
        tfs = np.array(
            data.draw(st.lists(st.integers(1, 9), min_size=n, max_size=n)), np.int64
        )
        dls = tfs + 3
        bounds = [0] + sorted(c for c in cuts if c < n) + [n]
        rows = []
        for s, e in zip(bounds, bounds[1:]):
            if e > s:
                r = encode_posting(doc_ids[s:e], tfs[s:e], dls[s:e], block_size)
                r["docs_enc"] = r["docs_enc"]
                rows.append(r)
        merged = merge_posting_rows(rows)
        got_docs, got_tfs = decode_posting(
            merged["docs_enc"], merged["tfs_enc"], merged["df"]
        )
        assert got_docs.tolist() == doc_ids.tolist()
        assert got_tfs.tolist() == tfs.tolist()
        assert merged["df"] == n and merged["cf"] == int(tfs.sum())
        # block-wise decode through the merged (ragged) offsets
        nblocks = len(merged["bm_first_doc"])
        assert len(merged["bm_doc_off"]) == nblocks + 1
        pos = 0
        for bi in range(nblocks):
            d, t = decode_block(
                merged["docs_enc"], merged["tfs_enc"], merged["bm_doc_off"],
                merged["bm_tf_off"], merged["bm_last_doc"], bi,
            )
            assert d[0] == merged["bm_first_doc"][bi]
            assert d[-1] == merged["bm_last_doc"][bi]
            assert int(t.max()) == merged["bm_tf_max"][bi]
            assert d.tolist() == doc_ids[pos:pos + d.size].tolist()
            assert t.tolist() == tfs[pos:pos + d.size].tolist()
            pos += d.size
        assert pos == n

    check()


def test_build_segment_tables_parity_with_encode_posting():
    """Property: the vectorized build_segment_tables (one bulk varbyte pass
    over all terms) is ROW-FOR-ROW identical — bytes, block metadata and
    offsets — to per-term encode_posting, across run shapes that cross and
    exactly hit block boundaries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import pyarrow as pa

    from splade_ray.segments import build_segment_tables, encode_posting

    @settings(max_examples=40, deadline=None)
    @given(
        n_docs=st.integers(5, 60),
        n_terms=st.integers(1, 12),
        block_size=st.sampled_from([3, 7, 128]),
        data=st.data(),
    )
    def check(n_docs, n_terms, block_size, data):
        doc_ids = np.sort(
            np.array(
                data.draw(
                    st.lists(st.integers(0, 10**6), min_size=n_docs,
                             max_size=n_docs, unique=True)), np.int64))
        doc_lens = np.array(
            data.draw(st.lists(st.integers(1, 50), min_size=n_docs,
                               max_size=n_docs)), np.int64)
        terms = [f"t{i:03d}" for i in range(n_terms)]
        flat_rows = []
        for ti, t in enumerate(terms):
            member = data.draw(
                st.lists(st.booleans(), min_size=n_docs, max_size=n_docs))
            for p in np.flatnonzero(member):
                flat_rows.append((t, int(p), 1 + (ti + p) % 7))
        if not flat_rows:
            flat_rows = [(terms[0], 0, 1)]
        flat_rows.sort()
        flat = pa.table({
            "term": pa.array([r[0] for r in flat_rows]),
            "pos": pa.array([r[1] for r in flat_rows], pa.int64()),
            "tf": pa.array([r[2] for r in flat_rows], pa.int64()),
        })
        got = build_segment_tables(flat, doc_ids, doc_lens, block_size)
        gd = got.to_pylist()
        # reference: per-term encode_posting over the same runs
        by_term: dict = {}
        for t, p, tf in flat_rows:
            by_term.setdefault(t, []).append((p, tf))
        assert [r["term"] for r in gd] == sorted(by_term)
        for row in gd:
            ps = by_term[row["term"]]
            d = doc_ids[[p for p, _ in ps]]
            f = np.array([tf for _, tf in ps], np.int64)
            dl = doc_lens[[p for p, _ in ps]]
            want = encode_posting(d, f, dl, block_size)
            for k, v in want.items():
                assert row[k] == v, (row["term"], k)

    check()
