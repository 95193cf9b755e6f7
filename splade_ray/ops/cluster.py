"""Connected-components clustering over duplicate-pair edge sets.

The dedup operators (ops/dedup.py) emit candidate PAIRS ``(doc_a, doc_b)``;
turning pairs into canonical clusters — every doc labeled with the minimum
doc id of its connected component — is the missing last stage of a dedup
pipeline: keep one survivor per cluster, drop the rest. The reference has
no document dedup at all (SURVEY.md §2.7); this completes the
beyond-reference LLM-data-pipeline operator family.

Two distributed algorithms (``method=``), both built from the same shape —
ONE hash shuffle per round, grouped on a BOUNDED bucket key
(``node % num_buckets``) with a fully vectorized per-bucket kernel
(argsort + ``np.minimum.reduceat``), no joins, no per-node Python calls,
no driver-side graph state; every round's shuffle moves only edge-sized
rows (16 B/row), never documents:

- ``"star"``: alternating large-star / small-star contraction (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC 2014). Keeps
  the working set edge-sized every round; round count grows with
  component depth.
- ``"hashmin"``: hash-to-min (Rastogi et al., "Finding Connected
  Components in Map-Reduce in Logarithmic Rounds", ICDE 2013) — O(log d)
  rounds even on chain-shaped graphs (path-doubling through the component
  min), at the cost of the min node holding its component's membership
  rows.

The per-round ``.materialize()`` is required and deliberate: the loop is
iterative (each round's output feeds both the convergence checksum and the
next round), and the edge set is pair-sized — orders of magnitude smaller
than the corpus that produced it. Convergence is detected by an edge-set
checksum: one star round is a deterministic function of the edge multiset,
so checksum-equal consecutive rounds certify a fixpoint, and the only
fixpoints of the alternation are per-component stars rooted at the
component minimum.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

_LOG = logging.getLogger("splade_ray.ops.cluster")

_P = np.uint64(1099511628211)  # FNV prime — checksum mix only

_PAIR_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
_LABEL_SCHEMA = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])


def _uniq_pairs(a: np.ndarray, b: np.ndarray) -> pa.Table:
    if a.size == 0:
        return _PAIR_SCHEMA.empty_table()
    arr = np.unique(np.stack([a, b], axis=1), axis=0)
    return pa.table({"doc_a": pa.array(arr[:, 0], pa.int64()),
                     "doc_b": pa.array(arr[:, 1], pa.int64())})


def _uv_dedup(g: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Distinct (u, v) rows of one bucket, sorted by u — the shared input
    shape of the star/hashmin kernels (Arrow-native; the former pandas
    drop_duplicates paid a conversion per group)."""
    u = g["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = g["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    if u.size == 0:
        return u, v
    uv = np.unique(np.stack([u, v], axis=1), axis=0)
    return uv[:, 0], uv[:, 1]


def _canonize(batch: pa.Table, *, src: str, dst: str) -> pa.Table:
    """Normalize raw pairs to canonical undirected edges (doc_a < doc_b);
    self-loops dropped. Tolerates the schema-less empty blocks hash shuffles
    leave behind (see ops/dedup.py)."""
    if batch.num_rows == 0 or {src, dst} - set(batch.column_names):
        return _PAIR_SCHEMA.empty_table()
    u = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
    a, b = np.minimum(u, v), np.maximum(u, v)
    keep = a != b
    return pa.table({"doc_a": pa.array(a[keep]), "doc_b": pa.array(b[keep])})


def _expand_directed(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    """Canonical edges -> both directed copies (u, v), bucketed on u for the
    large-star groupby."""
    if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
        return pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("bucket", pa.int64())]
        ).empty_table()
    a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = np.concatenate([a, b])
    v = np.concatenate([b, a])
    return pa.table({"u": pa.array(u), "v": pa.array(v), "bucket": pa.array(u % num_buckets)})


def _orient_max(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    """Canonical edges oriented larger->smaller (u=doc_b, v=doc_a), bucketed
    on u for the small-star groupby."""
    if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
        return pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("bucket", pa.int64())]
        ).empty_table()
    a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({"u": pa.array(b), "v": pa.array(a), "bucket": pa.array(b % num_buckets)})


def _group_mins(u: np.ndarray, v: np.ndarray):
    """Sorted-group machinery shared by both star kernels: returns
    (u, v sorted by u, group starts, per-group min of v)."""
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    minv = np.minimum.reduceat(v, starts)
    return u, v, starts, minv


def _large_kernel(g: pa.Table) -> pa.Table:
    """Large-star on one bucket of directed edges: per node u with neighbors
    N(u), let m = min(N(u) ∪ {u}); emit (m, v) for every v in N(u) with
    v > u. m ≤ u < v keeps every emission canonical and self-loop-free."""
    u, v = _uv_dedup(g)
    if u.size == 0:
        return _PAIR_SCHEMA.empty_table()
    u, v, starts, minv = _group_mins(u, v)
    uu = u[starts]
    m = np.minimum(minv, uu)
    counts = np.diff(np.append(starts, u.size))
    m_edge = np.repeat(m, counts)
    mask = v > u
    return _uniq_pairs(m_edge[mask], v[mask])


def _small_kernel(g: pa.Table) -> pa.Table:
    """Small-star on one bucket of larger->smaller directed edges: per node
    u with (all-smaller) neighbors N(u), let m = min(N(u)); emit (m, v) for
    v in N(u) with v != m, plus (m, u)."""
    u, v = _uv_dedup(g)
    if u.size == 0:
        return _PAIR_SCHEMA.empty_table()
    u, v, starts, minv = _group_mins(u, v)
    uu = u[starts]
    counts = np.diff(np.append(starts, u.size))
    m_edge = np.repeat(minv, counts)
    mask = v != m_edge
    a = np.concatenate([m_edge[mask], minv])
    b = np.concatenate([v[mask], uu])
    return _uniq_pairs(a, b)


def _hashmin_init(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    """Canonical edges -> initial hash-to-min membership rows
    C(v) = {v} ∪ N(v), as (u=node, v=member) rows bucketed on u."""
    if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
        return pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("bucket", pa.int64())]
        ).empty_table()
    a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = np.concatenate([a, b, a, b])
    v = np.concatenate([b, a, a, b])
    return pa.table({"u": pa.array(u), "v": pa.array(v), "bucket": pa.array(u % num_buckets)})


def _bucket_members(batch: pa.Table, *, num_buckets: int) -> pa.Table:
    """Re-bucket membership pair rows on the node key for the next round."""
    if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
        return pa.schema(
            [("u", pa.int64()), ("v", pa.int64()), ("bucket", pa.int64())]
        ).empty_table()
    u = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({"u": pa.array(u), "v": pa.array(v), "bucket": pa.array(u % num_buckets)})


def _hashmin_kernel(g: pa.Table) -> pa.Table:
    """One hash-to-min round on one bucket of membership rows (Rastogi et
    al., ICDE 2013): per node u with cluster set C(u), m = min(C(u));
    send m to every member (rows (v, m)) and the whole C(u) to m (rows
    (m, v)). Non-min nodes collapse to C = {component min} and the min node
    accumulates its component in O(log d) rounds — the path-doubling bound
    the star alternation lacks on chain-shaped duplicate graphs."""
    u, v = _uv_dedup(g)
    if u.size == 0:
        return _PAIR_SCHEMA.empty_table()
    u, v, starts, minv = _group_mins(u, v)
    counts = np.diff(np.append(starts, u.size))
    m_edge = np.repeat(minv, counts)
    a = np.concatenate([v, m_edge])
    b = np.concatenate([m_edge, v])
    return _uniq_pairs(a, b)


def _conform_pairs(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
        return _PAIR_SCHEMA.empty_table()
    return pa.table(
        {"doc_a": batch["doc_a"].cast(pa.int64()), "doc_b": batch["doc_b"].cast(pa.int64())}
    )


def _checksum(edges) -> tuple[int, int]:
    """(edge count, order-independent uint64 hash-sum) of the edge multiset.
    The partials table is block-count-sized — driver-safe."""

    def part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
            return pa.table({"cnt": pa.array([0], pa.int64()), "chk": pa.array([0], pa.uint64())})
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = a * _P ^ b
            s = np.sum(h, dtype=np.uint64)
        return pa.table(
            {"cnt": pa.array([batch.num_rows], pa.int64()), "chk": pa.array([int(s)], pa.uint64())}
        )

    parts = edges.map_batches(part, batch_format="pyarrow").to_pandas()
    with np.errstate(over="ignore"):
        chk = int(np.sum(parts["chk"].to_numpy(np.uint64), dtype=np.uint64))
    return int(parts["cnt"].sum()), chk


def _local_cc(batch: pa.Table) -> pa.Table:
    """Single-task vectorized connected components for a pair-bounded edge
    set: factorize nodes (sorted unique, so index order == id order),
    min-label propagation over the edge arrays (``np.minimum.at``) with
    pointer jumping between passes — O(log n) vectorized rounds, no Python
    per-edge loop. Parity with the star rounds is test-pinned."""
    if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
        return _LABEL_SCHEMA.empty_table()
    a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: a.size], inv[a.size :]
    lab = np.arange(nodes.size, dtype=np.int64)
    while True:
        prev = lab.copy()
        np.minimum.at(lab, ia, lab[ib])
        np.minimum.at(lab, ib, lab[ia])
        while True:  # pointer jumping
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, prev):
            break
    return pa.table({"doc_id": pa.array(nodes), "cluster_id": pa.array(nodes[lab])})


def _rename_min_column(labels):
    name = [c for c in labels.schema().names if c != "doc_id"][0]
    if name != "cluster_id":
        # Dataset.rename_columns chokes on the pandas blocks groupby().min()
        # emits (it calls pa.Table.rename_columns on them) — rename in pandas
        labels = labels.map_batches(
            lambda df: df.rename(columns={name: "cluster_id"}), batch_format="pandas"
        )
    return labels


def connected_components(
    pairs,
    *,
    src: str = "doc_a",
    dst: str = "doc_b",
    num_buckets: int | None = None,
    max_rounds: int = 30,
    local_threshold: int = 2_000_000,
    method: str = "star",
    stats: dict | None = None,
):
    """Label every node of a pair Dataset with its connected-component
    minimum: returns a Dataset ``(doc_id, cluster_id)`` covering exactly the
    nodes that appear in ``pairs`` (unpaired docs are by definition their
    own cluster — callers union them in at the filter step, see
    :func:`drop_near_duplicates`). Duplicate and reversed pairs are fine.

    Edge sets at or below ``local_threshold`` edges skip the distributed
    rounds: one worker task runs the vectorized label-propagation kernel
    over the whole (pair-bounded, ~32 MB at the default cap) edge list —
    the standard hybrid for iterative graph algorithms, since dup-pair
    edge sets are orders of magnitude smaller than the corpus. Above the
    threshold the distributed rounds run per ``method``:

    - ``"star"``: alternating large-star/small-star contraction (Kiveris
      et al. 2014). Round count grows with component depth — shallow dup
      graphs (the common case) finish in a few rounds; edge rows stay
      edge-set-sized every round.
    - ``"hashmin"``: hash-to-min (Rastogi et al. 2013) — O(log d) rounds
      even on chain-shaped graphs, at the cost of the component-min node
      accumulating its whole component's membership rows (fine for
      dup-pair graphs whose components are candidate-capped upstream).

    ``stats`` (optional dict) receives {"method", "rounds", "n_edges",
    "converged"} for observability/tests."""
    if method not in ("star", "hashmin"):
        raise ValueError(f"unknown connected-components method: {method!r}")
    if num_buckets is None:
        cpus = ray.cluster_resources().get("CPU", 4.0) if ray.is_initialized() else 4.0
        num_buckets = max(4, int(cpus))

    # no select_columns here: _canonize projects src/dst itself AND tolerates
    # the schema-less empty blocks upstream hash shuffles can leave behind
    # (select_columns would raise on those)
    edges = pairs.map_batches(
        _canonize, batch_format="pyarrow", fn_kwargs={"src": src, "dst": dst}
    ).materialize()
    n_edges = edges.count()
    if stats is not None:
        stats.update({"method": method, "rounds": 0, "n_edges": n_edges, "converged": True})
    if n_edges == 0:
        return ray.data.from_arrow(_LABEL_SCHEMA.empty_table())
    if n_edges <= local_threshold:
        if stats is not None:
            stats["method"] = "local"
        return edges.repartition(1).map_batches(
            _local_cc, batch_format="pyarrow", batch_size=None
        )

    prev: tuple[int, int] | None = None
    converged = False
    if method == "hashmin":
        members = edges.map_batches(
            _hashmin_init, batch_format="pyarrow", fn_kwargs={"num_buckets": num_buckets}
        )
        for rnd in range(max_rounds):
            edges = (
                members.groupby("bucket")
                .map_groups(_hashmin_kernel, batch_format="pyarrow")
                .map_batches(_conform_pairs, batch_format="pyarrow")
                .materialize()
            )
            chk = _checksum(edges)
            if stats is not None:
                stats["rounds"] = rnd + 1
            if chk == prev:
                converged = True
                _LOG.info("connected_components[hashmin]: fixpoint after %d rounds", rnd)
                break
            prev = chk
            members = edges.map_batches(
                _bucket_members, batch_format="pyarrow", fn_kwargs={"num_buckets": num_buckets}
            )
        if not converged:
            _LOG.warning(
                "connected_components[hashmin]: no fixpoint certificate after "
                "%d rounds; labels are the current membership minima", max_rounds,
            )
        if stats is not None:
            stats["converged"] = converged
        # membership rows ARE (doc_id, best-known-min ∈ members): label =
        # per-node min member
        labels = (
            edges.map_batches(
                lambda b: _conform_pairs(b).rename_columns(["doc_id", "cluster_id"]),
                batch_format="pyarrow",
            )
            .groupby("doc_id")
            .min("cluster_id")
        )
        return _rename_min_column(labels)

    for rnd in range(max_rounds):
        edges = (
            edges.map_batches(
                _expand_directed, batch_format="pyarrow", fn_kwargs={"num_buckets": num_buckets}
            )
            .groupby("bucket")
            .map_groups(_large_kernel, batch_format="pyarrow")
            .map_batches(
                _orient_max, batch_format="pyarrow", fn_kwargs={"num_buckets": num_buckets}
            )
            .groupby("bucket")
            .map_groups(_small_kernel, batch_format="pyarrow")
            .map_batches(_conform_pairs, batch_format="pyarrow")
            .materialize()
        )
        chk = _checksum(edges)
        if stats is not None:
            stats["rounds"] = rnd + 1
        if chk == prev:
            converged = True
            _LOG.info("connected_components: fixpoint after %d rounds", rnd)
            break
        prev = chk
    if not converged:
        _LOG.warning(
            "connected_components: no fixpoint certificate after %d rounds; "
            "labels are the current star assignment", max_rounds,
        )
    if stats is not None:
        stats["converged"] = converged

    def to_labels(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or {"doc_a", "doc_b"} - set(batch.column_names):
            return _LABEL_SCHEMA.empty_table()
        a = batch["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([b, a])),
                "cluster_id": pa.array(np.concatenate([a, a])),
            }
        )

    labels = (
        edges.map_batches(to_labels, batch_format="pyarrow")
        .groupby("doc_id")
        .min("cluster_id")
    )
    return _rename_min_column(labels)


def drop_near_duplicates(
    ds,
    labels,
    *,
    id_col: str = "doc_id",
    broadcast_limit: int = 5_000_000,
    num_partitions: int | None = None,
):
    """Filter a document Dataset down to dedup survivors: one doc per
    cluster (the cluster-min) plus every unpaired doc.

    The dropped-id set is pair-bounded, usually far smaller than the corpus:
    below ``broadcast_limit`` ids it is broadcast once via ``ray.put`` and
    applied as a vectorized per-batch ``isin`` filter — the corpus never
    shuffles. Above the limit, a hash left-outer join (corpus shuffles
    once) with the pair-sized label table."""

    def non_canon(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or {"doc_id", "cluster_id"} - set(batch.column_names):
            return _LABEL_SCHEMA.empty_table()
        d = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = batch["cluster_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = d != c
        return pa.table(
            {"doc_id": pa.array(d[keep]), "cluster_id": pa.array(c[keep])}
        )

    dropped = labels.map_batches(non_canon, batch_format="pyarrow").materialize()
    n_dropped = dropped.count()

    if n_dropped <= broadcast_limit:
        ids = (
            np.sort(dropped.to_pandas()["doc_id"].to_numpy(np.int64))
            if n_dropped
            else np.empty(0, np.int64)
        )
        ids_ref = ray.put(ids)

        def filt(batch: pa.Table) -> pa.Table:
            drop_ids = ray.get(ids_ref)
            col = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = ~np.isin(col, drop_ids)
            return batch.filter(pa.array(keep))

        return ds.map_batches(filt, batch_format="pyarrow")

    from splade_ray.prune import join_partitions

    n_parts = join_partitions(num_partitions)
    # both sides .repartition(): Ray 2.49's hash join mishandles the
    # empty-partition block layout a prior shuffle leaves behind ("no match
    # or multiple matches for key field") — see ops/dedup.minhash_lsh_pairs
    dropped_key = dropped.rename_columns({"doc_id": "__drop_id"}).repartition(n_parts)
    joined = ds.repartition(n_parts).join(
        dropped_key,
        join_type="left_outer",
        num_partitions=n_parts,
        on=(id_col,),
        right_on=("__drop_id",),
    )

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.is_null(batch["cluster_id"])
        gone = [c for c in ("cluster_id", "__drop_id") if c in batch.column_names]
        return batch.filter(keep).drop_columns(gone)

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")
