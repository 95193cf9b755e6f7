"""Distributed exact PCA over an embedding column (list<float>).

The reference's vectors go straight from the encoder into the index
(``splade/tasks/transformer_evaluator.py:31-76``); production embedding
pipelines first center/rotate/truncate them (PCA is the classic ANN
preprocessing step — FAISS's PCAMatrix / OPQ's initialization). At 100 TB
the full PCA is still EXACT and cheap because the sufficient statistics
are tiny: one streaming pass emits per-batch (Σx, Σxxᵀ, n) partials —
d + d² floats each, independent of row count — the driver sums them in a
pinned key order (the classifier's determinism contract) and runs the
d×d eigendecomposition locally. Projection is a stateless map_batches
against the broadcast components.

Eigenvector sign is pinned (the largest-|loading| coordinate is made
positive), so fits are reproducible across runs and partitionings up to
float-summation epsilon.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def _emb_matrix(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return np.empty((0, 0), np.float64)
    if pa.types.is_fixed_size_list(arr.type):
        flat = arr.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), -1).astype(np.float64)
    return np.stack(arr.to_numpy(zero_copy_only=False)).astype(np.float64)


def embedding_sums(
    ds: Dataset, *, emb_col: str = "embedding", id_col: str = "vec_id"
) -> tuple[np.ndarray, np.ndarray, int]:
    """One streaming pass of PCA sufficient statistics: returns
    ``(sum_x (d,), sum_xxT (d, d), n)``. Each batch emits one
    (key, d + d² floats) row; partials sum in min-id key order (pinned
    float order — bit-deterministic for a fixed partitioning)."""

    def partial(batch: pa.Table) -> pa.Table:
        x = _emb_matrix(batch[emb_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        key = int(ids.min()) if len(ids) else 0
        sx = x.sum(axis=0)
        sxx = x.T @ x
        return pa.table(
            {
                "key": pa.array([key], pa.int64()),
                "d": pa.array([x.shape[1]], pa.int64()),
                "n": pa.array([x.shape[0]], pa.int64()),
                "sx": pa.array([sx.tobytes()], pa.binary()),
                "sxx": pa.array([sxx.tobytes()], pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        raise ValueError("empty embedding dataset")
    parts = parts.sort_values("key")
    d = int(parts["d"].iloc[0])
    sum_x = np.zeros(d, np.float64)
    sum_xx = np.zeros((d, d), np.float64)
    n = 0
    for _, row in parts.iterrows():
        sum_x += np.frombuffer(row["sx"], np.float64)
        sum_xx += np.frombuffer(row["sxx"], np.float64).reshape(d, d)
        n += int(row["n"])
    return sum_x, sum_xx, n


def embedding_covariance(
    ds: Dataset, *, emb_col: str = "embedding", id_col: str = "vec_id"
) -> np.ndarray:
    """Exact population covariance of the embedding column:
    ``Σxxᵀ/n − mean·meanᵀ`` from the one-pass sufficient statistics."""
    sum_x, sum_xx, n = embedding_sums(ds, emb_col=emb_col, id_col=id_col)
    mean = sum_x / n
    return sum_xx / n - np.outer(mean, mean)


def pca_fit(
    ds: Dataset,
    *,
    n_components: int,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    whiten: bool = False,
) -> dict:
    """Fit exact PCA: distributed sufficient statistics + a local d×d
    ``eigh``. Returns {"mean": (d,), "components": (k, d) rows = top
    eigenvectors by descending eigenvalue, sign-pinned,
    "explained_variance": (k,), "whiten": bool}. ``whiten=True`` makes
    :func:`pca_project` scale each coordinate by 1/√eigenvalue (unit
    output variance — the FAISS PCAMatrix eigen_power=-0.5 shape)."""
    sum_x, sum_xx, n = embedding_sums(ds, emb_col=emb_col, id_col=id_col)
    mean = sum_x / n
    cov = sum_xx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-vals)[: int(n_components)]
    comps = vecs[:, order].T  # (k, d)
    # sign pin: the largest-|loading| coordinate of each component > 0
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": vals[order],
        "whiten": bool(whiten),
    }


def pca_project(
    ds: Dataset,
    model: dict,
    *,
    emb_col: str = "embedding",
    out_col: str = "pca",
    concurrency=None,
) -> Dataset:
    """Project embeddings onto the fitted components (adds ``out_col`` =
    (x − mean) @ componentsᵀ as list<double>); the model broadcasts once."""
    model_ref = ray.put(model)

    def project(batch: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        x = _emb_matrix(batch[emb_col])
        z = (x - m["mean"]) @ m["components"].T
        if m.get("whiten"):
            z = z / np.sqrt(np.maximum(m["explained_variance"], 1e-30))
        return batch.append_column(
            out_col, pa.array(z.tolist(), pa.list_(pa.float64()))
        )

    return ds.map_batches(project, batch_format="pyarrow",
                          concurrency=concurrency)
