"""Distributed exact PCA: covariance parity with numpy, projection
variance ordering, determinism, ANN-recall preservation after truncation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.pca import (
    embedding_covariance,
    pca_fit,
    pca_project,
)


def _ds(vecs, blocks=5):
    n = vecs.shape[0]
    return rd.from_items(
        [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(n)]
    ).repartition(blocks)


def test_covariance_matches_numpy(ray_session):
    rng = np.random.RandomState(8)
    vecs = rng.normal(size=(300, 12)) @ rng.normal(size=(12, 12))
    cov = embedding_covariance(_ds(vecs))
    want = np.cov(vecs, rowvar=False, bias=True)  # population covariance
    np.testing.assert_allclose(cov, want, rtol=1e-10, atol=1e-12)


def test_pca_fit_and_project(ray_session):
    rng = np.random.RandomState(9)
    # anisotropic data: two dominant directions
    base = rng.normal(size=(400, 2)) * np.array([5.0, 2.0])
    rot = np.linalg.qr(rng.normal(size=(10, 10)))[0][:, :2]
    vecs = base @ rot.T + rng.normal(size=(400, 10)) * 0.1
    ds = _ds(vecs)
    model = pca_fit(ds, n_components=3)
    # eigenvalues descend and the top two dominate
    ev = model["explained_variance"]
    assert ev[0] > ev[1] > ev[2] > 0
    assert ev[0] + ev[1] > 10 * ev[2]
    out = pca_project(ds, model).to_pandas().sort_values("vec_id")
    z = np.stack(out["pca"].to_numpy())
    # projected coordinates reproduce (x - mean) @ W^T exactly
    want = (vecs - model["mean"]) @ model["components"].T
    np.testing.assert_allclose(z, want, rtol=1e-12)
    # per-component variance equals the eigenvalues
    np.testing.assert_allclose(z.var(axis=0), ev, rtol=1e-8)
    # determinism across partitionings (sign pinned, epsilon sums)
    m2 = pca_fit(_ds(vecs, blocks=11), n_components=3)
    np.testing.assert_allclose(model["components"], m2["components"],
                               atol=1e-9)


def test_pca_truncation_preserves_neighbors(ray_session):
    """The ANN-preprocessing claim: projecting to the dominant subspace
    keeps cosine top-k mostly intact when variance concentrates there."""
    from splade_ray.ops.ann import cosine_topk

    rng = np.random.RandomState(10)
    base = rng.normal(size=(250, 4)) * np.array([8.0, 6.0, 5.0, 4.0])
    rot = np.linalg.qr(rng.normal(size=(16, 16)))[0][:, :4]
    vecs = base @ rot.T + rng.normal(size=(250, 16)) * 0.05
    ds = _ds(vecs)
    model = pca_fit(ds, n_components=4)
    proj = pca_project(ds, model).to_pandas().sort_values("vec_id")
    z = np.stack(proj["pca"].to_numpy())
    q_full = vecs[:5]
    q_z = (q_full - model["mean"]) @ model["components"].T
    full = cosine_topk(_ds(vecs), np.arange(5), q_full, top_k=10).to_pandas()
    zds = rd.from_items(
        [{"vec_id": i, "embedding": z[i].tolist()} for i in range(250)]
    )
    trunc = cosine_topk(zds, np.arange(5), q_z, top_k=10).to_pandas()
    recalls = []
    for qid in range(5):
        a = set(full[full.query_id == qid]["vec_id"])
        b = set(trunc[trunc.query_id == qid]["vec_id"])
        recalls.append(len(a & b) / 10)
    assert np.mean(recalls) >= 0.8, recalls


def test_pca_empty_raises(ray_session):
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "embedding": pa.array([], pa.list_(pa.float64()))})
    )
    with pytest.raises(ValueError, match="empty"):
        pca_fit(ds, n_components=2)


def test_pca_whitening_unit_variance(ray_session):
    rng = np.random.RandomState(11)
    vecs = rng.normal(size=(300, 8)) * np.array([6, 5, 4, 3, 2, 1, 0.5, 0.2])
    ds = _ds(vecs)
    model = pca_fit(ds, n_components=4, whiten=True)
    z = np.stack(
        pca_project(ds, model).to_pandas().sort_values("vec_id")["pca"]
        .to_numpy()
    )
    np.testing.assert_allclose(z.var(axis=0), np.ones(4), rtol=1e-8)
