"""Salted groupby(term) posting store: round-trip + skew handling."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from splade_ray.codec import varbyte_decode
from splade_ray.segments import decode_posting
from splade_ray.term_index import build_term_index


def _flat(rows):
    return rd.from_items(rows)


def test_term_index_roundtrip(ray_session):
    rows = []
    rng = np.random.RandomState(5)
    want = {}
    for term, n in [("def", 300), ("rare", 2), ("mid", 40)]:  # 'def' = skewed term
        docs = np.sort(rng.choice(10_000, size=n, replace=False))
        tfs = rng.randint(1, 9, size=n)
        want[term] = (docs.tolist(), tfs.tolist())
        rows.extend(
            {"term": term, "doc_id": int(d), "tf": int(f)} for d, f in zip(docs, tfs)
        )
    # small salt_range -> the skewed term splits into many sub-groups
    out = build_term_index(_flat(rows), salt_range=500).to_pandas()
    assert sorted(out["term"]) == ["def", "mid", "rare"]
    for _, r in out.iterrows():
        docs, tfs = decode_posting(r["docs_enc"], r["tfs_enc"], r["df"])
        wd, wf = want[r["term"]]
        assert docs.tolist() == wd
        assert tfs.tolist() == wf
        assert r["df"] == len(wd)
        assert r["cf"] == sum(wf)


def test_term_index_single_salt_bucket(ray_session):
    rows = [{"term": "t", "doc_id": i * 3, "tf": 1} for i in range(10)]
    out = build_term_index(_flat(rows), salt_range=1_000_000).to_pandas()
    docs, _ = decode_posting(out["docs_enc"][0], out["tfs_enc"][0], out["df"][0])
    assert docs.tolist() == [i * 3 for i in range(10)]


def test_term_index_pathological_skew(ray_session):
    """North-rule skew case (SURVEY.md §7 M3): a 'def'-like token in 50% of
    20k docs, through the real analyzer -> salted groupby -> concatenated
    global posting list, verified against a brute-force count."""
    import pandas as pd

    from splade_ray.analysis import postings_batch, term_counts

    n = 20_000
    texts = []
    for i in range(n):
        parts = [f"ident_{i % 97}"]
        if i % 2 == 0:
            parts.append("def def")  # ubiquitous, tf=2
        if i % 400 == 7:
            parts.append(f"rare_{i}")
        texts.append(" ".join(parts))
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64()), "text": pa.array(texts)})
    )
    flat = docs.map_batches(postings_batch, batch_format="pyarrow", batch_size=2048)
    # salt_range 1000 -> the skewed term splits into 10 doc-id-disjoint
    # sub-groups encoded independently and concatenated in salt order
    out = build_term_index(flat, salt_range=1000).to_pandas().set_index("term")

    d = out.loc["def"]
    docs_dec, tfs_dec = decode_posting(d["docs_enc"], d["tfs_enc"], d["df"])
    assert d["df"] == n // 2 and d["cf"] == n  # tf=2 each
    assert docs_dec.tolist() == list(range(0, n, 2))
    assert set(tfs_dec.tolist()) == {2}

    # lexicon-level equality vs brute force for every term
    brute: dict[str, tuple[int, int]] = {}
    for t in texts:
        for term, tf in term_counts(t).items():
            df0, cf0 = brute.get(term, (0, 0))
            brute[term] = (df0 + 1, cf0 + tf)
    assert len(out) == len(brute)
    for term, (df0, cf0) in brute.items():
        assert out.loc[term, "df"] == df0 and out.loc[term, "cf"] == cf0
