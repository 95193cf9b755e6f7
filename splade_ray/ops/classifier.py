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
iteration the weight vector broadcasts once (``ray.put``, ~dim·8 bytes),
every batch emits ONE partial-gradient row (dense ``dim`` vector + count
+ loss partial, keyed by its min doc id), and the driver sums partials
IN KEY ORDER — float addition order is pinned, so training is
bit-deterministic for a fixed partitioning (and equal to float-summation
epsilon across partitionings, since batch extents move terms between
partial sums). What shuffles per iteration is
n_batches × dim floats, independent of corpus row count; at extreme
scale lower ``dim`` or lift the partial sum into a Ray groupby tree.

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
) -> dict:
    """Train the hashed logistic-regression filter. ``label_col`` holds
    0/1 integers. Returns {"w": (dim,) float64, "b": float, "dim": dim,
    "losses": per-iteration mean log-loss} — broadcast the dict to
    :class:`QualityScoreStage` to score corpora."""
    w = np.zeros(dim, np.float64)
    b = 0.0
    losses: list[float] = []
    for _ in range(int(iters)):
        plan_ref = ray.put({"w": w, "b": b})

        def grad_batch(batch: pa.Table) -> pa.Table:
            plan = ray.get(plan_ref)
            wv, bv = plan["w"], plan["b"]
            cols, vals, par, n = _doc_features(batch[text_col], dim)
            y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            z = np.bincount(par, weights=wv[cols] * vals, minlength=n) + bv
            p = _sigmoid(z)
            r = p - y
            g = np.zeros(dim, np.float64)
            np.add.at(g, cols, vals * r[par])
            eps = 1e-12
            loss = float(-(y * np.log(p + eps)
                           + (1 - y) * np.log(1 - p + eps)).sum())
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            key = int(ids.min()) if n else 0
            return pa.table(
                {
                    "key": pa.array([key], pa.int64()),
                    "grad": pa.array([g.tobytes()], pa.binary()),
                    "gb": pa.array([float(r.sum())], pa.float64()),
                    "n": pa.array([n], pa.int64()),
                    "loss": pa.array([loss], pa.float64()),
                }
            )

        parts = ds.map_batches(grad_batch, batch_format="pyarrow").to_pandas()
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
