"""Micro-bench: incremental_dedup's broadcast keep-filter, old vs new
(round-3 VERDICT item 3).

Old: per-row Python set membership on 64-char hex strings.
New: one np.isin of uint64 sha prefixes against a sorted broadcast array;
only prefix hits (≈0 absent true dups) pay the exact full-hex check.

Pure-kernel timing (no Ray) on synthetic shas; results go to BASELINE.md.
Usage: python scripts/microbench_dedup_filter.py [n_corpus] [n_ref]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from splade_ray.ops.dedup import sha_prefix_u64  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_ref = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    shas = [hashlib.sha256(str(i).encode()).hexdigest() for i in range(n)]
    # 1% true dups: the last 1% of corpus shas are in the reference
    ref = {hashlib.sha256(str(i).encode()).hexdigest()
           for i in range(n - n // 100, n - n // 100 + n_ref)}

    import pyarrow as pa

    sha_arr = pa.array(shas, pa.string())  # the batch shape the kernel sees

    # OLD kernel as it actually ran: Arrow -> Python list + per-row set
    # lookup (the to_pylist conversion is part of the cost)
    t0 = time.perf_counter()
    old_mask = [s not in ref for s in sha_arr.to_pylist()]
    t_old = time.perf_counter() - t0

    ref_prefix = np.sort(sha_prefix_u64(sorted(ref)))
    t0 = time.perf_counter()
    pref = sha_prefix_u64(sha_arr)
    mask = np.ones(n, bool)
    cand = np.flatnonzero(np.isin(pref, ref_prefix))
    if cand.size:
        hits = np.fromiter((shas[i] in ref for i in cand), bool, cand.size)
        mask[cand[hits]] = False
    t_new = time.perf_counter() - t0

    assert mask.tolist() == old_mask, "kernel parity"
    import sys as _s

    set_mb = (sum(_s.getsizeof(x) for x in list(ref)[:1000]) / 1000
              * len(ref) + _s.getsizeof(ref)) / 1e6
    print(f"n={n} n_ref={n_ref} old={t_old:.3f}s new={t_new:.3f}s "
          f"speedup={t_old / t_new:.2f}x candidates={cand.size} "
          f"broadcast={set_mb:.0f}MB(set) vs "
          f"{ref_prefix.nbytes / 1e6:.1f}MB(prefixes)+exact set")


if __name__ == "__main__":
    main()
