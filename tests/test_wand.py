"""Property test: block-max WAND == exact term-at-a-time, bit-for-bit.

SURVEY.md §7 'What's hard' #4: always keep the exact path as the oracle and
property-test WAND == exact on random corpora."""

import numpy as np
import pytest

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.corpus import write_synth_corpus
from splade_ray.query import search


def _random_queries(rng, n):
    from splade_ray.corpus import COMMON, IDENT_POOL

    vocab = COMMON + IDENT_POOL + ["rare_token_3", "zzz_oov", "pad", "x1"]
    out = []
    for qid in range(n):
        k = rng.randint(1, 6)
        out.append((qid, " ".join(vocab[rng.randint(len(vocab))] for _ in range(k))))
    return out


@pytest.fixture(scope="module")
def wand_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("wand")
    corpus_dir = str(root / "corpus")
    index_dir = str(root / "index")
    write_synth_corpus(corpus_dir, n_docs=300, seed=11, n_files=2)
    # tiny blocks force many block boundaries -> exercises skipping paths
    build_index(corpus_dir, index_dir, text_col="content", rows_per_segment=80, block_size=8)
    return index_dir


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("top_k,threshold", [(5, 0.0), (10, 0.0), (3, 1.0), (50, 0.0)])
def test_bmw_equals_exact(wand_index, seed, top_k, threshold):
    rng = np.random.RandomState(seed)
    queries = _random_queries(rng, 12)
    p = BM25Params(top_k=top_k, threshold=threshold)
    exact = search(wand_index, queries, p, method="exact")
    bmw = search(wand_index, queries, p, method="bmw")
    assert exact["query_id"].tolist() == bmw["query_id"].tolist()
    assert exact["doc_id"].tolist() == bmw["doc_id"].tolist()
    assert np.array_equal(exact["score"].to_numpy(), bmw["score"].to_numpy())
