"""Token-window chunking: scalar parity, boundary contracts, analyzer
round-trip."""

import numpy as np
import pytest
import ray.data as rd

from splade_ray.analysis import tokenize
from splade_ray.ops.chunk import chunk_texts


def _scalar_chunks(text, size, overlap):
    toks = tokenize(text)
    n = len(toks)
    if n == 0:
        return []
    stride = size - overlap
    out, s = [], 0
    while True:
        out.append(" ".join(toks[s:s + size]))
        if s + size >= n:
            break
        s += stride
    return out


@pytest.mark.parametrize("size,overlap", [(8, 2), (5, 0), (16, 8)])
def test_chunking_matches_scalar(ray_session, size, overlap):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again until done",
        "short",
        "",
        "a b c d e f g h i j k l m n o p q r s t u v w x y z",
        "exactly eight tokens in this very sentence here",
    ]
    ds = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(3)
    got = (
        chunk_texts(ds, size=size, overlap=overlap)
        .to_pandas().sort_values(["doc_id", "chunk_id"])
    )
    for i, t in enumerate(texts):
        want = _scalar_chunks(t, size, overlap)
        g = got[got["doc_id"] == i]
        assert g["chunk"].tolist() == want, (i, size, overlap)
        assert g["chunk_id"].tolist() == list(range(len(want)))
        # chunk text re-tokenizes to its own tokens (analyzer round-trip)
        for c, nt in zip(g["chunk"], g["n_tokens"]):
            assert len(tokenize(c)) == nt
    # overlap contract: consecutive chunks share `overlap` tokens
    g = got[got["doc_id"] == 3]
    if len(g) > 1 and overlap:
        a = tokenize(g["chunk"].iloc[0])
        b = tokenize(g["chunk"].iloc[1])
        assert a[-overlap:] == b[:overlap]


def test_chunking_rejects_bad_overlap(ray_session):
    ds = rd.from_items([{"doc_id": 0, "text": "x"}])
    with pytest.raises(ValueError):
        chunk_texts(ds, size=4, overlap=4)
