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
