"""Distributed hashed-feature quality classifier (the fastText-shaped
linear filter real LLM data pipelines train to score documents, e.g. the
LLaMA "quality classifier" / CCNet target-domain filter).

The reference has no data-curation stage at all (its datasets load
pre-filtered collections, ``splade/datasets/datasets.py:20-60``), yet
every corpus it indexes was filtered by exactly this kind of model
upstream. Model: logistic regression over hashed bag-of-tokens features — each
token maps to ``hash_token(t) % dim`` (the sha256-prefix hash every other
operator here uses), a document's feature vector is its mean-pooled
one-hot bag (value ``1/n_tokens`` per occurrence), and the score is
``sigmoid(x · w + b)``.

Training is FULL-BATCH gradient descent as a Ray Data loop: per
iteration the weight vector broadcasts once (``ray.put``, ~dim·8 bytes)
and partial gradients reduce under a PINNED float-addition order (each
contribution is keyed by its batch's min doc id and summed key-ascending
per dimension), so training is bit-deterministic for a fixed
partitioning (and equal to float-summation epsilon across partitionings,
since batch extents move terms between partial sums). Two gradient
transports share that contract:

- ``grad_method="dense"`` — every batch emits ONE dense ``dim``-float
  row; the driver sums rows in key order. Driver traffic is
  n_batches × dim floats per iteration: right for small/medium ``dim``.
- ``grad_method="sparse"`` — every batch emits only its TOUCHED
  dimensions as ``(key, dim_id, val)`` rows; a sharded Ray
  ``groupby(dim_id % n_shards).map_groups`` sums each dimension
  key-ascending IN the cluster, and the driver receives at most
  ``dim + 3`` already-summed rows. Shuffle volume is the number of
  touched (batch, dim) pairs — independent of ``dim`` — which is the
  scale path for vocabulary-sized feature spaces (dim ≫ 2^20) where
  dense rows would ship mostly zeros to one process.

Both paths produce bitwise-identical models on the same partitioning
(per dimension the addition sequence is identical; the dense path's
extra ``+ 0.0`` terms are exact no-ops), enforced by a parity test.

No torch, no SGD-order nondeterminism, no driver-side corpus pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from splade_ray.analysis import tokenize_column
from splade_ray.ops.textstats import hash_token


def _doc_features(texts, dim: int):
    """(cols, vals, par, n_docs): flat hashed-feature triples for a text
    column — cols = token-hash % dim, vals = 1/doc_len (mean pooling)."""
    terms, par, doc_lens = tokenize_column(texts)
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    enc = terms.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    if uniq:
        uh = np.array([int(hash_token(t)) % dim for t in uniq], np.int64)
        cols = uh[enc.indices.to_numpy(zero_copy_only=False)]
    else:
        cols = np.empty(0, np.int64)
    lens = np.asarray(doc_lens, np.int64)
    inv_len = np.zeros(lens.size, np.float64)
    nz = lens > 0
    inv_len[nz] = 1.0 / lens[nz]
    vals = inv_len[par]
    return cols, vals, par, lens.size


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    e = np.exp(z[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def _batch_grad(batch: pa.Table, wv, bv, dim, text_col, label_col, id_col):
    """Forward+backward for one batch: (key, touched cols, per-col grad
    sums, gb, n, loss). Per-col sums add contributions in input order
    (stable sort preserves it), matching ``np.add.at`` bitwise."""
    cols, vals, par, n = _doc_features(batch[text_col], dim)
    y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
    z = np.bincount(par, weights=wv[cols] * vals, minlength=n) + bv
    p = _sigmoid(z)
    r = p - y
    contrib = vals * r[par]
    order = np.argsort(cols, kind="stable")
    cs, vs = cols[order], contrib[order]
    bounds = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]]) if cs.size else \
        np.empty(0, np.int64)
    gcols = cs[bounds]
    gsums = np.add.reduceat(vs, bounds) if cs.size else np.empty(0, np.float64)
    eps = 1e-12
    loss = float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    key = int(ids.min()) if n else 0
    return key, gcols, gsums, float(r.sum()), n, loss


# sentinel dim ids for the sparse transport's scalar partials
_GB, _LOSS, _N = -1, -2, -3


def _reduce_dim_group(tbl: pa.Table) -> pa.Table:
    """Sum one dim shard's contributions per dimension, key-ascending
    (sequential ``np.add.at`` — the pinned-order reduce)."""
    dim_id = tbl["dim_id"].to_numpy(zero_copy_only=False)
    key = tbl["key"].to_numpy(zero_copy_only=False)
    val = tbl["val"].to_numpy(zero_copy_only=False)
    order = np.lexsort((key, dim_id))
    d, v = dim_id[order], val[order]
    uniq, inv = np.unique(d, return_inverse=True)
    tot = np.zeros(uniq.size, np.float64)
    np.add.at(tot, inv, v)  # sequential, sorted -> key-ascending per dim
    return pa.table({"dim_id": pa.array(uniq, pa.int64()),
                     "total": pa.array(tot, pa.float64())})


def fit_quality_classifier(
    ds: Dataset,
    *,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 1 << 16,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-6,
    grad_method: str = "dense",
    n_shards: int = 64,
) -> dict:
    """Train the hashed logistic-regression filter. ``label_col`` holds
    0/1 integers. Returns {"w": (dim,) float64, "b": float, "dim": dim,
    "losses": per-iteration mean log-loss} — broadcast the dict to
    :class:`QualityScoreStage` to score corpora. ``grad_method`` picks
    the gradient transport (module docstring): "dense" ships one
    dim-float row per batch to the driver, "sparse" reduces touched
    dims in a sharded Ray groupby and ships only the summed vector."""
    if grad_method not in ("dense", "sparse"):
        raise ValueError(f"unknown grad_method {grad_method!r}")
    w = np.zeros(dim, np.float64)
    b = 0.0
    losses: list[float] = []
    for _ in range(int(iters)):
        plan_ref = ray.put({"w": w, "b": b})

        def grad_dense(batch: pa.Table) -> pa.Table:
            plan = ray.get(plan_ref)
            key, gcols, gsums, gb, n, loss = _batch_grad(
                batch, plan["w"], plan["b"], dim, text_col, label_col, id_col
            )
            g = np.zeros(dim, np.float64)
            g[gcols] = gsums
            return pa.table(
                {
                    "key": pa.array([key], pa.int64()),
                    "grad": pa.array([g.tobytes()], pa.binary()),
                    "gb": pa.array([gb], pa.float64()),
                    "n": pa.array([n], pa.int64()),
                    "loss": pa.array([loss], pa.float64()),
                }
            )

        def grad_sparse(batch: pa.Table) -> pa.Table:
            plan = ray.get(plan_ref)
            key, gcols, gsums, gb, n, loss = _batch_grad(
                batch, plan["w"], plan["b"], dim, text_col, label_col, id_col
            )
            dim_id = np.r_[gcols, [_GB, _LOSS, _N]]
            val = np.r_[gsums, [gb, loss, float(n)]]
            shard = np.where(dim_id < 0, dim_id, dim_id % n_shards)
            return pa.table(
                {
                    "shard": pa.array(shard, pa.int64()),
                    "dim_id": pa.array(dim_id, pa.int64()),
                    "key": pa.array(np.full(dim_id.size, key), pa.int64()),
                    "val": pa.array(val, pa.float64()),
                }
            )

        if grad_method == "sparse":
            reduced = (
                ds.map_batches(grad_sparse, batch_format="pyarrow")
                .groupby("shard")
                .map_groups(_reduce_dim_group, batch_format="pyarrow")
                .to_pandas()
            )
            if reduced.empty:
                raise ValueError("empty training set")
            dim_id = reduced["dim_id"].to_numpy(np.int64)
            total = reduced["total"].to_numpy(np.float64)
            scal = {int(d): t for d, t in zip(dim_id, total) if d < 0}
            g = np.zeros(dim, np.float64)
            pos = dim_id >= 0
            g[dim_id[pos]] = total[pos]
            gb = scal.get(_GB, 0.0)
            loss = scal.get(_LOSS, 0.0)
            n_total = int(scal.get(_N, 0.0))
        else:
            parts = ds.map_batches(grad_dense, batch_format="pyarrow").to_pandas()
            if parts.empty:
                raise ValueError("empty training set")
            parts = parts.sort_values("key")  # pinned float-sum order
            g = np.zeros(dim, np.float64)
            gb, n_total, loss = 0.0, 0, 0.0
            for _, row in parts.iterrows():
                g += np.frombuffer(row["grad"], np.float64)
                gb += row["gb"]
                n_total += int(row["n"])
                loss += row["loss"]
        if n_total == 0:
            raise ValueError("empty training set")
        w = w - lr * (g / n_total + l2 * w)
        b = b - lr * (gb / n_total)
        losses.append(loss / n_total)
    return {"w": w, "b": float(b), "dim": dim, "losses": losses}


class QualityScoreStage:
    """map_batches stage: add ``quality_score`` = sigmoid(x·w + b) from a
    broadcast trained model. Model loads once per actor."""

    def __init__(self, model_ref, *, text_col: str = "text"):
        model = (ray.get(model_ref)
                 if isinstance(model_ref, ray.ObjectRef) else model_ref)
        self.w: np.ndarray = model["w"]
        self.b: float = model["b"]
        self.dim: int = model["dim"]
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols, vals, par, n = _doc_features(batch[self.text_col], self.dim)
        z = np.bincount(par, weights=self.w[cols] * vals, minlength=n) + self.b
        return batch.append_column(
            "quality_score", pa.array(_sigmoid(z), pa.float64())
        )


def score_quality(
    ds: Dataset, model: dict, *, text_col: str = "text",
    concurrency=None,
) -> Dataset:
    """Score a corpus with a trained filter (adds ``quality_score``)."""
    model_ref = ray.put(model)
    return ds.map_batches(
        QualityScoreStage,
        batch_format="pyarrow",
        fn_constructor_kwargs={"model_ref": model_ref, "text_col": text_col},
        concurrency=concurrency or (1, 8),
    )
