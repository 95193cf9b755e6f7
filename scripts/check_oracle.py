"""Local mirror of the driver's correctness gate: run every queries() entry
and its oracle_sql() twin on the same sf dir, compare row count, schema
(column names) and order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[ERR ] {name}: ray side failed: {ex!r}")
            failures += 1
            continue
        if name not in sqls:
            print(f"[rows] {name}: {len(got)} rows (no SQL oracle)")
            continue
        try:
            want = canon(con.sql(sqls[name]).df())
        except Exception as ex:
            print(f"[ERR ] {name}: sql side failed: {ex!r}")
            failures += 1
            continue
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                ok_vals = True
                for c in got.columns:
                    a, b = got[c].to_numpy(), want[c].to_numpy()
                    if np.issubdtype(a.dtype, np.floating) or np.issubdtype(b.dtype, np.floating):
                        if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0):
                            ok_vals = False
                    elif not (a == b).all():
                        ok_vals = False
            except Exception:
                ok_vals = False
        status = "PASS" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"[{status}] {name}: rows {len(got)}/{len(want)} cols_ok={ok_cols} vals_ok={ok_vals}")
        if status == "FAIL" and ok_cols and len(got) and len(want):
            merged = got.merge(want, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
