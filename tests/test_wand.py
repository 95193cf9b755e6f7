"""Property test: block-max WAND == exact term-at-a-time, bit-for-bit.

SURVEY.md §7 'What's hard' #4: always keep the exact path as the oracle and
property-test WAND == exact on random corpora. Kernels are compared directly
on loaded segments (no pipeline overhead); one full distributed comparison
runs at the end."""

import numpy as np
import pytest

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index, segment_dirs
from splade_ray.corpus import write_synth_corpus
from splade_ray.query import SegmentIndex, prepare_queries, search


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
    build_index(corpus_dir, index_dir, text_col="content", rows_per_segment=150, block_size=8)
    return index_dir


def _topk(rows, k):
    """(qid -> sorted top-k [(doc, score)]) from kernel candidate rows."""
    by_q = {}
    for qid, d, s in rows:
        by_q.setdefault(qid, []).append((d, s))
    return {
        q: sorted(v, key=lambda x: (-x[1], x[0]))[:k] for q, v in by_q.items()
    }


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("top_k,threshold", [(5, 0.0), (10, 0.0), (3, 1.0), (50, 0.0), (1, 0.0)])
def test_bmw_kernel_equals_exact(wand_index, seed, top_k, threshold):
    rng = np.random.RandomState(seed)
    queries = _random_queries(rng, 15)
    p = BM25Params(top_k=top_k, threshold=threshold)
    prepared = prepare_queries(wand_index, queries, p)
    for seg_dir in segment_dirs(wand_index):
        seg = SegmentIndex(seg_dir, prepared["terms"])
        exact = _topk(seg.score_exact(prepared), top_k)
        bmw = _topk(seg.score_bmw(prepared), top_k)
        assert set(exact) == set(bmw)
        for q in exact:
            assert exact[q] == bmw[q]  # docs AND float-exact scores


def test_bmw_full_pipeline(wand_index):
    queries = _random_queries(np.random.RandomState(7), 10)
    p = BM25Params(top_k=10)
    exact = search(wand_index, queries, p, method="exact")
    bmw = search(wand_index, queries, p, method="bmw")
    assert exact["query_id"].tolist() == bmw["query_id"].tolist()
    assert exact["doc_id"].tolist() == bmw["doc_id"].tolist()
    assert np.array_equal(exact["score"].to_numpy(), bmw["score"].to_numpy())


@pytest.mark.parametrize("seed", [0, 3])
def test_block_bmw_equals_docwise(wand_index, seed):
    """The block-at-a-time kernel and the doc-at-a-time reference kernel
    agree with each other (both already equal exact; this pins the pair)."""
    from splade_ray.wand import score_segment_bmw, score_segment_bmw_docwise

    rng = np.random.RandomState(seed)
    queries = _random_queries(rng, 10)
    p = BM25Params(top_k=7)
    prepared = prepare_queries(wand_index, queries, p)
    for seg_dir in segment_dirs(wand_index):
        seg = SegmentIndex(seg_dir, prepared["terms"])
        assert _topk(score_segment_bmw(seg, prepared), 7) == _topk(
            score_segment_bmw_docwise(seg, prepared), 7
        )
