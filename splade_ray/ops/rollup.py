"""GROUP BY ROLLUP: multi-level aggregation in one pass.

The OLAP companion to the windowed aggregates (``ops/windows.py``): every
prefix level of the key list aggregates simultaneously — (k1, k2), (k1),
and the grand total — the ANSI ``GROUP BY ROLLUP`` contract. A naive
implementation runs one shuffle per level; here each batch emits its
per-level partial rows in the SAME combiner pass (levels x groups-sized,
never row-sized) and ONE groupby merges them, so the shuffle width is
``sum over levels of |groups at that level|`` regardless of row count.

Rolled-up key positions carry a typed sentinel (``"(all)"`` for strings,
``-1`` for integers) rather than NULL so grouping, sorting and the DuckDB
mirror (``coalesce``) stay total-order clean. Values aggregate in integer
cents (count / sum / min / max) — every emitted number is integer-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

STR_ALL = "(all)"
INT_ALL = -1


def rollup_agg(
    ds: Dataset,
    keys: list[str],
    *,
    value_col: str = "value",
) -> Dataset:
    """Rollup aggregate over ``keys`` (present columns of ``ds``): one row
    per group per prefix level, columns ``(level, *keys, n, sum_cents,
    min_cents, max_cents)``. ``level`` = number of key columns that are
    real (len(keys) = finest, 0 = grand total)."""
    if not keys:
        raise ValueError("at least one key column required")
    from splade_ray.ops.windows import _cents

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "level": pa.array([], pa.int64()),
                    **{k: pa.array([], batch.schema.field(k).type) for k in keys},
                    "n": pa.array([], pa.int64()),
                    "sum_cents": pa.array([], pa.int64()),
                    "min_cents": pa.array([], pa.int64()),
                    "max_cents": pa.array([], pa.int64()),
                }
            )
        cols = {k: batch[k].to_pandas() for k in keys}
        pdf = pd.DataFrame(cols)
        pdf["_c"] = _cents(batch[value_col])
        levels = []
        for lvl in range(len(keys), -1, -1):
            g = pdf.copy()
            for k in keys[lvl:]:
                g[k] = STR_ALL if pdf[k].dtype == object else INT_ALL
            agg = (
                g.groupby(keys, sort=False)["_c"]
                .agg(n="count", sum_cents="sum", min_cents="min",
                     max_cents="max")
                .reset_index()
            )
            agg.insert(0, "level", np.int64(lvl))
            levels.append(agg)
        out = pd.concat(levels, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        for c in ("sum_cents", "min_cents", "max_cents"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["level", *keys])
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_cents", alias_name="sum_cents"),
            Min("min_cents", alias_name="min_cents"),
            Max("max_cents", alias_name="max_cents"),
        )
    )
    return merged
