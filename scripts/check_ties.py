"""Tie-stability screen for ranked oracle entries (round-3 VERDICT item 1).

A ranked entry is tie-UNSAFE when, inside one rank partition, two adjacent
ranks carry the SAME rounded score but the rank order does NOT follow the
entry's deterministic tie key. That happens exactly when the raw float
scores differed below the rounding quantum — an order that numpy and
DuckDB may disagree on (their ln() differs by 1 ulp), so the driver's
hash compare can red-flag the entry even though the engine is correct.

For every queries() entry whose output has a rank-like column and a
rounded score column, this script checks each rounded-tie cohort for
monotonically increasing residual key tuples. Cohorts that violate it are
printed as RISK rows; entries without rank columns are immune (skipped).

Usage: python scripts/check_ties.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PARTITION_CANDIDATES = (
    "query_id", "lang", "phrase_id", "seed_id", "event_type", "user_id",
)
RANK_NAMES = ("rank", "rn", "new_rank", "sample_rank")

# Screen exemptions — cohorts whose order is deterministic on both sides
# through a key the output doesn't carry, or entries with no SQL twin:
KNOWN_ORDERED = {
    # pinned rows rank by the GIVEN pinned-id order (the `ord` key lives
    # in PINNED_SETS, not the output); both sides replay the same list
    "pinned_topk": "pinned section ordered by the given pin list",
    # rows-only entry (pruned IVF probe — no SQL twin to disagree with);
    # its exact twin ann_ivf_exact IS screened and stable-ranked
    "ann_ivf_topk": "rows-only, no oracle",
}


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def screen(name: str, df: pd.DataFrame) -> list[str]:
    cols = list(df.columns)
    rank_col = next((c for c in RANK_NAMES if c in cols), None)
    if rank_col is None:
        return []
    score_cols = [
        c for c in cols
        if (c.endswith("_r") or c.endswith("_q")) and df[c].dtype.kind == "f"
    ]
    if not score_cols:
        return []
    part = [c for c in PARTITION_CANDIDATES if c in cols and c != rank_col]
    score_col = score_cols[0]
    resid = [c for c in cols
             if c not in part and c != rank_col and c not in score_cols]
    # long free-text payloads are not tie keys
    resid = [c for c in resid
             if not (df[c].dtype == object
                     and df[c].astype(str).str.len().max() > 64)]
    if not resid:
        return []
    msgs = []
    df = df.sort_values(part + [rank_col]) if part else df.sort_values(rank_col)
    grouped = df.groupby(part, sort=False) if part else [((), df)]
    for key, g in grouped:
        scores = g[score_col].to_numpy()
        tie = np.flatnonzero(scores[:-1] == scores[1:])
        for i in tie:
            a = tuple(g.iloc[i][resid])
            b = tuple(g.iloc[i + 1][resid])
            if a > b:  # rank order not explained by the residual key order
                msgs.append(
                    f"{name}: partition {key} ranks "
                    f"{g.iloc[i][rank_col]}->{g.iloc[i + 1][rank_col]} tie at "
                    f"{score_col}={scores[i]} but keys {a} > {b}"
                )
    return msgs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import __ray_entry__ as e

    qs = e.queries()
    risks, errs, ranked = [], 0, 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"[ERR ] {name}: {ex!r}")
            errs += 1
            continue
        if name in KNOWN_ORDERED:
            print(f"[skip] {name}: {KNOWN_ORDERED[name]}")
            continue
        msgs = screen(name, df)
        if msgs:
            risks.extend(msgs)
            for m in msgs:
                print(f"[RISK] {m}")
        else:
            has_rank = any(c in df.columns for c in RANK_NAMES)
            ranked += int(has_rank)
            print(f"[ok  ] {name}" + (" (ranked)" if has_rank else ""))
    print(f"\n{len(risks)} risk cohorts, {errs} errors, "
          f"{ranked} clean ranked entries")
    for m in risks:
        print(f"[RISK] {m}")
    ray.shutdown()
    sys.exit(1 if (risks or errs) else 0)


if __name__ == "__main__":
    main()
