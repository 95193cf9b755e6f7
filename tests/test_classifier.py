"""Hashed logistic-regression quality classifier: learns a separable
vocabulary split, deterministic at any parallelism, scoring stage."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.classifier import (
    fit_quality_classifier,
    score_quality,
)

GOOD = ["theorem proof lemma derivation rigorous",
        "careful analysis of the algorithm complexity",
        "the method converges under mild assumptions"]
BAD = ["click here buy now cheap deal",
       "winner winner free prize claim today",
       "hot singles deal discount subscribe"]


def _corpus(n=240, seed=5):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        lab = i % 2
        base = (GOOD if lab else BAD)[rng.randint(3)]
        words = base.split()
        rng.shuffle(words)
        rows.append({"doc_id": i, "text": " ".join(words), "label": lab})
    return rows


def test_classifier_learns_and_scores(ray_session):
    rows = _corpus()
    ds = rd.from_items(rows).repartition(6)
    model = fit_quality_classifier(
        ds, label_col="label", text_col="text", dim=1 << 12, iters=40, lr=30.0
    )
    # loss decreases and ends low on a separable problem
    assert model["losses"][-1] < 0.1 < model["losses"][0]
    scored = score_quality(ds, model).to_pandas()
    good = scored[scored["label"] == 1]["quality_score"]
    bad = scored[scored["label"] == 0]["quality_score"]
    assert good.min() > 0.5 > bad.max()  # perfectly separated


def test_classifier_deterministic(ray_session):
    rows = _corpus()
    # fixed partitioning -> bit-exact rerun (keyed-order partial sums)
    m1 = fit_quality_classifier(
        rd.from_items(rows).repartition(6), label_col="label",
        dim=1 << 12, iters=5,
    )
    m1b = fit_quality_classifier(
        rd.from_items(rows).repartition(6), label_col="label",
        dim=1 << 12, iters=5,
    )
    np.testing.assert_array_equal(m1["w"], m1b["w"])
    assert m1["b"] == m1b["b"] and m1["losses"] == m1b["losses"]
    # different partitioning -> equal to float-summation epsilon
    m2 = fit_quality_classifier(
        rd.from_items(rows).repartition(11), label_col="label",
        dim=1 << 12, iters=5,
    )
    np.testing.assert_allclose(m1["w"], m2["w"], atol=1e-12)
    np.testing.assert_allclose(m1["losses"], m2["losses"], rtol=1e-12)


def test_classifier_sparse_grad_parity(ray_session):
    # the sparse (sharded-groupby) gradient transport is bitwise equal
    # to the dense driver-side reduce on the same partitioning
    rows = _corpus()
    dense = fit_quality_classifier(
        rd.from_items(rows).repartition(6), label_col="label",
        dim=1 << 12, iters=4,
    )
    sparse = fit_quality_classifier(
        rd.from_items(rows).repartition(6), label_col="label",
        dim=1 << 12, iters=4, grad_method="sparse", n_shards=16,
    )
    np.testing.assert_array_equal(dense["w"], sparse["w"])
    assert dense["b"] == sparse["b"]
    assert dense["losses"] == sparse["losses"]


def test_classifier_sparse_learns(ray_session):
    rows = _corpus()
    ds = rd.from_items(rows).repartition(6)
    model = fit_quality_classifier(
        ds, label_col="label", dim=1 << 12, iters=25, lr=30.0,
        grad_method="sparse",
    )
    assert model["losses"][-1] < 0.15 < model["losses"][0]


def test_classifier_unknown_method_raises(ray_session):
    with pytest.raises(ValueError, match="grad_method"):
        fit_quality_classifier(
            rd.from_items(_corpus(8)), label_col="label",
            dim=256, iters=1, grad_method="sgd",
        )


def test_classifier_empty_raises(ray_session):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string()),
                  "label": pa.array([], pa.int64())})
    )
    with pytest.raises(ValueError, match="empty"):
        fit_quality_classifier(ds, label_col="label", dim=256, iters=1)
