"""Measure registry: MAP@k, the binary-qrel guard, measure strings, and
string-id (BEIR external-id) evaluation — mirrors pytrec_eval semantics on a
hand-checked toy qrel (reference: splade/utils/metrics.py:16-43 and the
binary guard at splade/evaluation/eval.py:14-15)."""

import numpy as np
import pandas as pd
import pytest

from splade_ray.evaluate import (
    binary_qrel_guard,
    evaluate_run,
    map_at_k,
    mrr_at_k,
    ndcg_at_k,
    recall_at_k,
)


def _run(rows):
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])


def _qrel(rows):
    return pd.DataFrame(rows, columns=["query_id", "doc_id", "rel"])


# q0: relevant {10, 20, 30}; retrieved ranks 1(10, rel), 2(99), 3(20, rel)
# -> AP@3 = (1/1 + 2/3) / 3 (R = 3, trec_eval map_cut divides by R)
# q1: relevant {5}; retrieved rank 2 -> AP@3 = (1/2) / 1
RUN = _run(
    [
        (0, 1, 10, 5.0), (0, 2, 99, 4.0), (0, 3, 20, 3.0),
        (1, 1, 77, 9.0), (1, 2, 5, 8.0),
    ]
)
QREL = _qrel([(0, 10, 1), (0, 20, 1), (0, 30, 1), (1, 5, 1)])


def test_map_at_k_hand_checked():
    want = ((1.0 + 2.0 / 3.0) / 3.0 + 0.5) / 2.0
    assert map_at_k(RUN, QREL, k=3) == pytest.approx(want)


def test_map_unretrieved_query_counts_zero():
    qrel = _qrel([(0, 10, 1), (7, 1, 1)])  # q7 never retrieved
    assert map_at_k(RUN, qrel, k=3) == pytest.approx((1.0 / 1.0) / 2.0)


def test_binary_qrel_guard_raises_on_grades():
    graded = _qrel([(0, 10, 2), (0, 20, 1)])
    with pytest.raises(ValueError, match="binary"):
        binary_qrel_guard(graded)
    with pytest.raises(ValueError, match="binary"):
        mrr_at_k(RUN, graded, 3)
    with pytest.raises(ValueError, match="binary"):
        map_at_k(RUN, graded, 3)
    # graded measures still work
    assert ndcg_at_k(RUN, graded, 3) > 0
    assert recall_at_k(RUN, graded, 3) > 0


def test_evaluate_run_measure_strings():
    res = evaluate_run(RUN, QREL, ["mrr@3", "map@3", "ndcg@3", "recall@3"])
    assert res["mrr@3"] == pytest.approx((1.0 + 0.5) / 2.0)
    assert res["map@3"] == pytest.approx(map_at_k(RUN, QREL, 3))
    assert res["recall@3"] == pytest.approx((2.0 / 3.0 + 1.0) / 2.0)
    with pytest.raises(ValueError, match="registry"):
        evaluate_run(RUN, QREL, ["bleu@4"])


def test_string_external_ids_evaluate():
    """BEIR-style string ids on both sides; digit-strings and ints match
    (both normalize through the same key function)."""
    run = _run([("q1", 1, "docA", 2.0), ("q1", 2, "7", 1.0), ("q2", 1, "docB", 3.0)])
    qrel = _qrel([("q1", "docA", 1), ("q1", 7, 1), ("q2", "nope", 1)])
    assert recall_at_k(run, qrel, 10) == pytest.approx((2.0 / 2.0 + 0.0) / 2.0)
    assert mrr_at_k(run, qrel, 10) == pytest.approx((1.0 + 0.0) / 2.0)
    assert map_at_k(run, qrel, 10) == pytest.approx(((1.0 + 2.0 / 2.0) / 2.0) / 2.0)


def test_rrf_fuse_pinned_and_bruteforce():
    import numpy as np
    import pandas as pd

    from splade_ray.fusion import rrf_fuse

    a = pd.DataFrame(
        {"query_id": [1, 1, 1, 2], "rank": [1, 2, 3, 1],
         "doc_id": [10, 11, 12, 20], "score": [9.0, 8.0, 7.0, 5.0]}
    )
    b = pd.DataFrame(
        {"query_id": [1, 1, 2], "rank": [1, 2, 1],
         "doc_id": [12, 10, 21], "score": [0.9, 0.8, 0.7]}
    )
    got = rrf_fuse([a, b], k=60, top_k=3)
    want = {}
    for run, w in ((a, 1.0), (b, 1.0)):
        for r in run.itertuples():
            want[(r.query_id, r.doc_id)] = (
                want.get((r.query_id, r.doc_id), 0.0) + w / (60 + r.rank)
            )
    for row in got.itertuples():
        assert np.isclose(row.rrf, want[(row.query_id, row.doc_id)])
    # doc 12 (ranks 3+1) and doc 10 (ranks 1+2) beat doc 11 (rank 2 once)
    q1 = got[got["query_id"] == 1]
    assert set(q1.head(2)["doc_id"]) == {10, 12}
    assert q1["rank"].tolist() == [1, 2, 3]
    # weights: doubling run b must promote its top doc
    wgot = rrf_fuse([a, b], k=60, weights=[1.0, 10.0], top_k=1)
    assert wgot[wgot["query_id"] == 1]["doc_id"].iloc[0] == 12


def test_linear_fuse_pinned_and_bruteforce():
    import numpy as np
    import pandas as pd

    from splade_ray.fusion import linear_fuse

    a = pd.DataFrame(
        {"query_id": [1, 1, 1, 2], "rank": [1, 2, 3, 1],
         "doc_id": [10, 11, 12, 20], "score": [9.0, 8.0, 7.0, 5.0]}
    )
    b = pd.DataFrame(
        {"query_id": [1, 1, 2], "rank": [1, 2, 1],
         "doc_id": [12, 10, 21], "score": [0.9, 0.8, 0.7]}
    )
    got = linear_fuse([a, b], weights=[0.7, 0.3], top_k=4)
    # minmax per run per query: a/q1 -> 10:1.0 11:0.5 12:0.0; b/q1 ->
    # 12:1.0 10:0.0; degenerate single-score pages (a/q2, b/q2) -> 1.0
    want = {
        (1, 10): 0.7 * 1.0 + 0.3 * 0.0,
        (1, 11): 0.7 * 0.5,
        (1, 12): 0.7 * 0.0 + 0.3 * 1.0,
        (2, 20): 0.7 * 1.0,
        (2, 21): 0.3 * 1.0,
    }
    assert len(got) == len(want)
    for row in got.itertuples():
        assert np.isclose(row.fused, want[(row.query_id, row.doc_id)])
    q1 = got[got["query_id"] == 1]
    assert q1["doc_id"].tolist() == [10, 11, 12]  # 0.7 > 0.35 > 0.3
    assert q1["rank"].tolist() == [1, 2, 3]
    # missing-from-run docs only get the runs they appear in
    q2 = got[got["query_id"] == 2]
    assert q2["doc_id"].tolist() == [20, 21]
