"""Distributed moment sketches: matrix_stats (Elasticsearch matrix_stats
aggregation) over numeric columns.

One streaming pass accumulates per-batch raw power sums (n, Σx, Σx², Σx³,
Σx⁴ per field and Σxy per field pair) — a constant-size partial per batch,
merged by a single tree aggregation; no shuffle ever carries rows. The
driver derives the statistics from the merged sums. Pinned definitions
(documented because estimator conventions vary):

- ``mean``      — Σx/n
- ``variance``  — SAMPLE variance  Σ(x-m)²/(n-1)
- ``skewness``  — population g1 =  (M3/n) / (M2/n)^{3/2}
- ``kurtosis``  — population      (M4/n) / (M2/n)²   (NOT excess)
- ``covariance``— SAMPLE          Σ(x-mx)(y-my)/(n-1)
- ``correlation``— Pearson        cov / sqrt(varx·vary)

(the ES matrix_stats shapes; central moments are expanded from raw sums,
so the SQL oracle mirrors the same arithmetic from the same sums).
"""

from __future__ import annotations

from itertools import combinations_with_replacement

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum


def _partial(batch: pa.Table, *, cols: list[str]) -> pa.Table:
    out: dict[str, list] = {"n": [float(len(batch))]}
    arrs = {
        c: batch[c].to_numpy(zero_copy_only=False).astype(np.float64) for c in cols
    }
    for c in cols:
        x = arrs[c]
        out[f"s1_{c}"] = [float(x.sum())]
        out[f"s2_{c}"] = [float((x * x).sum())]
        out[f"s3_{c}"] = [float((x * x * x).sum())]
        out[f"s4_{c}"] = [float((x * x * x * x).sum())]
    for a, b in combinations_with_replacement(cols, 2):
        if a != b:
            out[f"sxy_{a}__{b}"] = [float((arrs[a] * arrs[b]).sum())]
    return pa.table(out)


def _merged_sums(ds: Dataset, cols: list[str]) -> dict[str, float]:
    part = ds.map_batches(_partial, batch_format="pyarrow", fn_kwargs={"cols": cols})
    names = [f for f in part.schema().names]
    row = part.aggregate(*[Sum(f, alias_name=f) for f in names])
    return {k: float(v) for k, v in row.items()}


def matrix_stats(ds: Dataset, cols: list[str]) -> pd.DataFrame:
    """Pairwise covariance/correlation matrix (upper triangle incl.
    diagonals, where cov(a,a) = sample variance). One row per ordered pair:
    (field_a, field_b, n, mean_a, mean_b, cov, corr)."""
    s = _merged_sums(ds, cols)
    n = s["n"]
    rows = []
    for a, b in combinations_with_replacement(cols, 2):
        ma, mb = s[f"s1_{a}"] / n, s[f"s1_{b}"] / n
        va = (s[f"s2_{a}"] - n * ma * ma) / (n - 1)
        vb = (s[f"s2_{b}"] - n * mb * mb) / (n - 1)
        sxy = s[f"s2_{a}"] if a == b else s[f"sxy_{a}__{b}"]
        cov = (sxy - n * ma * mb) / (n - 1)
        corr = cov / np.sqrt(va * vb) if va > 0 and vb > 0 else np.nan
        rows.append((a, b, int(n), ma, mb, cov, corr))
    return pd.DataFrame(
        rows, columns=["field_a", "field_b", "n", "mean_a", "mean_b", "cov", "corr"]
    )


def field_moments(ds: Dataset, cols: list[str]) -> pd.DataFrame:
    """Per-field higher moments: (field, n, mean, variance, skewness,
    kurtosis) under the pinned definitions above."""
    s = _merged_sums(ds, cols)
    n = s["n"]
    rows = []
    for c in cols:
        m = s[f"s1_{c}"] / n
        # central moments expanded from raw power sums
        m2 = s[f"s2_{c}"] / n - m * m
        m3 = s[f"s3_{c}"] / n - 3 * m * s[f"s2_{c}"] / n + 2 * m**3
        m4 = (
            s[f"s4_{c}"] / n
            - 4 * m * s[f"s3_{c}"] / n
            + 6 * m * m * s[f"s2_{c}"] / n
            - 3 * m**4
        )
        var = m2 * n / (n - 1)
        skew = m3 / m2**1.5 if m2 > 0 else np.nan
        kurt = m4 / (m2 * m2) if m2 > 0 else np.nan
        rows.append((c, int(n), m, var, skew, kurt))
    return pd.DataFrame(
        rows, columns=["field", "n", "mean", "variance", "skewness", "kurtosis"]
    )
