"""SemDeDup — semantic deduplication over an embedding column (Abbas et
al. 2023, arXiv:2303.09540): cluster the embedding space with spherical
k-means, then inside every cluster group examples whose pairwise cosine
similarity exceeds a threshold and keep ONE representative per group —
the member LEAST similar to its cluster centroid (the paper's choice:
keeps the outlier, prunes the redundant core; ties break by lowest id).

Scale shape: the clustering reuses the IVF coarse quantizer
(ops/ann.kmeans_fit on a sampled matrix + a broadcast-centroid assign
map), so the only shuffle is the per-cluster groupby, and each group's
kernel is one m×m cosine matrix — the paper's regime (n_clusters sized
so clusters stay small; a cluster above ``max_cluster`` raises with
instructions rather than silently truncating, because SemDeDup's
within-cluster pair semantics cannot be salted without changing results).

Determinism: seeded k-means, argmax/argmin tie-breaks by index order,
representative selection by (centroid_sim asc, id asc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from splade_ray.ops.ann import _normalize, kmeans_fit


def _group_labels(adj_i: np.ndarray, adj_j: np.ndarray, m: int) -> np.ndarray:
    """Connected-component labels for one cluster's duplicate graph:
    vectorized min-label propagation over the (i, j) edge list (i < j),
    O(E) per round, rounds bounded by the longest chain — clusters are
    small by construction so this is a few passes over tiny arrays."""
    labels = np.arange(m, dtype=np.int64)
    while True:
        a = labels[adj_i]
        b = labels[adj_j]
        lo = np.minimum(a, b)
        changed = False
        if (a != lo).any():
            np.minimum.at(labels, adj_i, lo)
            changed = True
        if (b != lo).any():
            np.minimum.at(labels, adj_j, lo)
            changed = True
        # path-compress: point every label at its current root
        while True:
            nxt = labels[labels]
            if (nxt == labels).all():
                break
            labels = nxt
        if not changed:
            return labels


def semdedup(
    ds,
    *,
    n_clusters: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_size: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    max_cluster: int = 20_000,
):
    """Returns (vec_id, cluster, kept, rep_id): ``kept`` marks the one
    representative per within-cluster duplicate group (singleton groups
    keep themselves), ``rep_id`` is the group's keeper id for every
    member. See module docstring for semantics and scale shape."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    sample_tbl = ds.limit(sample_size).to_pandas()
    if sample_tbl.empty:
        return ray.data.from_arrow(pa.schema(
            [("vec_id", pa.int64()), ("cluster", pa.int64()),
             ("kept", pa.bool_()), ("rep_id", pa.int64())]).empty_table())
    sample = np.stack(sample_tbl[emb_col].to_numpy())
    cents = kmeans_fit(sample, n_clusters, iters=iters, seed=seed)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _normalize(np.stack(batch[emb_col].to_numpy(zero_copy_only=False)))
        # per-centroid elementwise-multiply + row-sum instead of one gemm:
        # BLAS gemm results depend on ROW POSITION (blocking), so identical
        # vectors in different rows/batches could get ulp-different sims —
        # and even different argmax clusters, which would silently split an
        # exact-duplicate group. Row-local pairwise sums are
        # position-independent; k is small (the coarse-quantizer regime).
        sims = np.empty((mat.shape[0], c.shape[0]))
        for ci in range(c.shape[0]):
            sims[:, ci] = (mat * c[ci]).sum(axis=1)
        cl = np.argmax(sims, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch[id_col].cast(pa.int64()),
                "cluster": pa.array(cl),
                "cent_sim": pa.array(sims[np.arange(len(cl)), cl]),
                emb_col: batch[emb_col],
            }
        )

    def dedup_cluster(g: pa.Table) -> pa.Table:
        empty = pa.table({"vec_id": pa.array([], pa.int64()),
                          "cluster": pa.array([], pa.int64()),
                          "kept": pa.array([], pa.bool_()),
                          "rep_id": pa.array([], pa.int64())})
        if g.num_rows == 0 or "vec_id" not in g.column_names:
            return empty
        m = g.num_rows
        if m > max_cluster:
            raise ValueError(
                f"cluster of {m} vectors exceeds max_cluster={max_cluster}; "
                f"raise n_clusters (SemDeDup's within-cluster pair "
                f"semantics cannot be salted without changing results)")
        ids = g["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        cl = int(g["cluster"][0].as_py())
        cent_sim = g["cent_sim"].to_numpy(zero_copy_only=False)[order]
        x = _normalize(np.stack(
            g[emb_col].to_numpy(zero_copy_only=False))[order])
        sims = x @ x.T
        ii, jj = np.triu_indices(m, k=1)
        hit = sims[ii, jj] >= threshold
        labels = _group_labels(ii[hit], jj[hit], m)
        # representative per group: (cent_sim asc, id asc) — ids sorted,
        # stable lexsort keeps the lowest id among equal sims
        grp_order = np.lexsort((np.arange(m), cent_sim, labels))
        sorted_labels = labels[grp_order]
        first = np.r_[True, sorted_labels[1:] != sorted_labels[:-1]]
        rep_of_group = grp_order[first]          # position of each keeper
        root_to_rep = np.full(m, -1, np.int64)   # group root -> keeper pos
        root_to_rep[sorted_labels[first]] = rep_of_group
        rep_pos = root_to_rep[labels]
        kept = np.zeros(m, bool)
        kept[rep_of_group] = True
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cluster": pa.array(np.full(m, cl, np.int64)),
                "kept": pa.array(kept),
                "rep_id": pa.array(ids[rep_pos], pa.int64()),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", batch_size=2048)
        .groupby("cluster")
        .map_groups(dedup_cluster, batch_format="pyarrow")
    )
