"""Connected-components clustering + dedup-survivor filter tests."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from splade_ray.ops.cluster import connected_components, drop_near_duplicates


def _uf_reference(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Scalar union-find oracle: node -> component-min."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _pairs_ds(pairs, cols=("doc_a", "doc_b")):
    return rd.from_items([{cols[0]: a, cols[1]: b} for a, b in pairs])


def _labels_dict(ds) -> dict[int, int]:
    df = ds.to_pandas()
    return dict(zip(df["doc_id"].astype(int), df["cluster_id"].astype(int)))


import pytest


@pytest.mark.parametrize("local_threshold", [0, 2_000_000])
def test_cc_path_graph(ray_session, local_threshold):
    # worst-case diameter: a 64-node path must still collapse to min=0
    # (local_threshold=0 forces the distributed star rounds; the default
    # takes the single-task vectorized path — parity pinned here)
    pairs = [(i, i + 1) for i in range(63)]
    got = _labels_dict(
        connected_components(
            _pairs_ds(pairs), num_buckets=4, local_threshold=local_threshold
        )
    )
    assert got == {i: 0 for i in range(64)}


def test_cc_components_and_noise(ray_session):
    # two components, plus duplicate / reversed / self pairs in the input
    pairs = [(5, 9), (9, 7), (7, 5), (5, 5), (9, 5), (20, 30), (30, 20)]
    got = _labels_dict(connected_components(_pairs_ds(pairs)))
    assert got == {5: 5, 7: 5, 9: 5, 20: 20, 30: 20}


@pytest.mark.parametrize("local_threshold", [0, 2_000_000])
def test_cc_random_graph_matches_union_find(ray_session, local_threshold):
    rng = np.random.RandomState(7)
    nodes = rng.choice(10_000, size=400, replace=False)
    pairs = [
        (int(nodes[rng.randint(nodes.size)]), int(nodes[rng.randint(nodes.size)]))
        for _ in range(300)
    ]
    want = _uf_reference([(a, b) for a, b in pairs if a != b])
    got = _labels_dict(
        connected_components(
            _pairs_ds(pairs), num_buckets=8, local_threshold=local_threshold
        )
    )
    assert got == want


def test_cc_empty_and_custom_columns(ray_session):
    empty = connected_components(
        rd.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        )
    )
    assert empty.count() == 0
    assert set(empty.schema().names) == {"doc_id", "cluster_id"}

    got = _labels_dict(
        connected_components(_pairs_ds([(4, 2)], cols=("id_a", "id_b")), src="id_a", dst="id_b")
    )
    assert got == {2: 2, 4: 2}


def test_drop_near_duplicates_broadcast_and_join_paths(ray_session):
    docs = rd.from_items([{"doc_id": i, "text": f"t{i}"} for i in range(10)])
    labels = connected_components(_pairs_ds([(1, 3), (3, 5), (7, 8)]))
    want_survivors = [0, 1, 2, 4, 6, 7, 9]  # drop 3,5 (cluster 1) and 8 (cluster 7)

    broadcast = drop_near_duplicates(docs, labels).to_pandas()
    assert sorted(broadcast["doc_id"].tolist()) == want_survivors
    assert list(broadcast.columns) == ["doc_id", "text"]

    joined = drop_near_duplicates(docs, labels, broadcast_limit=0).to_pandas()
    assert sorted(joined["doc_id"].tolist()) == want_survivors
    assert sorted(joined.columns) == sorted(broadcast.columns)


def test_drop_near_duplicates_no_pairs(ray_session):
    docs = rd.from_items([{"doc_id": i} for i in range(5)])
    labels = connected_components(
        rd.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
        )
    )
    out = drop_near_duplicates(docs, labels).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [0, 1, 2, 3, 4]


@pytest.mark.parametrize("local_threshold", [0, 2_000_000])
def test_cc_hashmin_path_graph(ray_session, local_threshold):
    pairs = [(i, i + 1) for i in range(63)]
    stats = {}
    got = _labels_dict(
        connected_components(
            _pairs_ds(pairs), num_buckets=4, local_threshold=local_threshold,
            method="hashmin", stats=stats,
        )
    )
    assert got == {i: 0 for i in range(64)}
    if local_threshold == 0:
        assert stats["method"] == "hashmin" and stats["converged"]
        # O(log d) bound: a 63-edge path must converge well under d rounds
        # (+1 round to certify the fixpoint via checksum equality)
        assert stats["rounds"] <= 10
    else:
        assert stats["method"] == "local"


def test_cc_hashmin_random_graph_matches_union_find(ray_session):
    rng = np.random.RandomState(11)
    nodes = rng.choice(10_000, size=400, replace=False)
    pairs = [
        (int(nodes[rng.randint(nodes.size)]), int(nodes[rng.randint(nodes.size)]))
        for _ in range(300)
    ]
    want = _uf_reference([(a, b) for a, b in pairs if a != b])
    got = _labels_dict(
        connected_components(
            _pairs_ds(pairs), num_buckets=8, local_threshold=0, method="hashmin"
        )
    )
    assert got == want


def test_cc_both_methods_logarithmic_on_chain(ray_session):
    """Chain-graph round counts: both methods must stay within a small
    multiple of log2(d) on a depth-127 path (measured: star 8, hashmin 10 —
    star alternation is also logarithmic in practice; hashmin's value is
    the PROVEN O(log d) bound vs star's O(log² n)). Parity of labels
    pinned too."""
    pairs = [(i, i + 1) for i in range(127)]
    s_star, s_hm = {}, {}
    a = _labels_dict(connected_components(
        _pairs_ds(pairs), num_buckets=4, local_threshold=0, stats=s_star))
    b = _labels_dict(connected_components(
        _pairs_ds(pairs), num_buckets=4, local_threshold=0,
        method="hashmin", stats=s_hm))
    assert a == b == {i: 0 for i in range(128)}
    bound = 2 * 7 + 2  # 2·log2(128) + fixpoint-certificate rounds
    assert s_hm["rounds"] <= bound and s_star["rounds"] <= bound
    assert s_hm["converged"] and s_star["converged"]


def test_cc_unknown_method_raises(ray_session):
    with pytest.raises(ValueError, match="unknown connected-components"):
        connected_components(_pairs_ds([(1, 2)]), method="bfs")
