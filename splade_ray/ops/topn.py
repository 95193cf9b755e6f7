"""Grouped top-N: the N best rows per key, combiner-pruned.

Classic "top spenders per window" shape. A naive ``groupby(key).map_groups
(sort + head)`` shuffles EVERY row to its key's partition; here each batch
first prunes to its local top-N per key (a candidate superset of the global
answer — any row outside its batch's top-N cannot be in the global top-N),
so the shuffle carries at most N × keys × blocks rows. The final per-key
merge re-sorts the small candidate set.

Ordering is pinned for oracle parity: ``order_col`` descending (or
ascending), ties broken by ``tie_col`` ascending — the same
(value, tie) lexsort on both the combiner and the merge, mirrored by SQL
``row_number() OVER (PARTITION BY key ORDER BY ...)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _local_topn(
    batch: pa.Table, *, keys: list[str], order_col: str, tie_col: str,
    n: int, descending: bool,
) -> pa.Table:
    if len(batch) == 0:
        return batch
    # composite group id: dictionary-encode each key column (vectorized)
    # and mix the indices radix-style
    gid = np.zeros(len(batch), np.int64)
    for k in keys:
        col = batch[k].combine_chunks() if isinstance(batch[k], pa.ChunkedArray) else batch[k]
        enc = col.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        gid = gid * len(enc.dictionary) + idx
    val = batch[order_col].to_numpy(zero_copy_only=False).astype(np.float64)
    tie = batch[tie_col].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((tie, -val if descending else val, gid))
    g_sorted = gid[order]
    # rank within group = position - group start
    starts = np.concatenate(([0], np.flatnonzero(g_sorted[1:] != g_sorted[:-1]) + 1))
    counts = np.diff(np.concatenate((starts, [g_sorted.size])))
    rank = np.arange(g_sorted.size) - np.repeat(starts, counts)
    keep_idx = order[rank < n]
    return batch.take(pa.array(np.sort(keep_idx)))


def _merge_topn(
    group: pd.DataFrame, *, order_col: str, tie_col: str, n: int,
    descending: bool, key_cols: list[str],
) -> pd.DataFrame:
    g = group.sort_values(
        [order_col, tie_col], ascending=[not descending, True], kind="mergesort"
    )
    g = g.head(n).copy()
    g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
    return g[key_cols + ["rank", tie_col, order_col]]


def grouped_topn(
    ds: Dataset,
    keys: list[str] | str,
    order_col: str,
    *,
    n: int = 10,
    tie_col: str,
    descending: bool = True,
) -> Dataset:
    """Top-``n`` rows per ``keys`` group ordered by ``order_col`` (ties:
    ``tie_col`` ascending). Output columns: keys + (rank, tie_col,
    order_col)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    pruned = ds.map_batches(
        _local_topn,
        batch_format="pyarrow",
        fn_kwargs={
            "keys": keys, "order_col": order_col, "tie_col": tie_col,
            "n": n, "descending": descending,
        },
    )
    return pruned.groupby(keys).map_groups(
        _merge_topn,
        batch_format="pandas",
        fn_kwargs={
            "order_col": order_col, "tie_col": tie_col, "n": n,
            "descending": descending, "key_cols": keys,
        },
    )
