"""Geo queries (geo_distance / geo_bounding_box / geotile_grid) —
brute-force parity over a synthetic lat/lon corpus."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from splade_ray.analysis import term_counts
from splade_ray.build import build_index
from splade_ray.corpus import synth_corpus
from splade_ray.geo import (
    geo_bbox_search,
    geo_distance_search,
    geotile_grid_agg,
    geotile_xy,
    haversine_m,
    round4,
)
from splade_ray.oracle import OracleIndex

N = 150
ORIGIN = (12.0, 34.0)


def _coords(n: int) -> tuple[np.ndarray, np.ndarray]:
    ids = np.arange(n, dtype=np.int64)
    lat = -60.0 + 120.0 * ((ids * 2654435761) % 100000) / 100000.0
    lon = -180.0 + 360.0 * ((ids * 40503 + 12345) % 100000) / 100000.0
    return lat, lon


@pytest.fixture()
def built(ray_session, tmp_path):
    t = synth_corpus(N, seed=11)
    lat, lon = _coords(N)
    corpus = str(tmp_path / "c.parquet")
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(N, dtype=np.int64)),
            "content": t["content"],
            "lat": pa.array(lat),
            "lon": pa.array(lon),
        }),
        corpus,
    )
    index_dir = str(tmp_path / "index")
    build_index(corpus, index_dir, text_col="content", id_col="doc_id",
                rows_per_segment=40, extra_doc_cols=("lat", "lon"))
    return index_dir, t["content"].to_pylist(), lat, lon


QUERIES = [(1, "def parse merge"), (2, "return x1")]


def _matched(texts, text) -> np.ndarray:
    oi = OracleIndex(list(range(len(texts))), texts)
    m = np.zeros(len(texts), bool)
    for term in term_counts(text):
        if term in oi.postings:
            m[oi.postings[term][0]] = True
    return m


def test_haversine_known_values():
    # same point -> 0; one degree of longitude at the equator ~ 111.19 km
    assert haversine_m([0.0], [0.0], (0.0, 0.0))[0] == 0.0
    d = haversine_m([0.0], [1.0], (0.0, 0.0))[0]
    assert abs(d - 111194.9) < 50.0
    # symmetric
    d2 = haversine_m([ORIGIN[0]], [ORIGIN[1]], (13.0, 35.0))[0]
    d3 = haversine_m([13.0], [35.0], ORIGIN)[0]
    assert abs(d2 - d3) < 1e-6


def test_geotile_known_tiles():
    # (0,0) at zoom 1 is the south-east quadrant of the north half: x=1,y=0
    # is (0..90 lat, 0..180 lon); lat=0 sits exactly on the y boundary ->
    # floor puts it in y=1
    x, y = geotile_xy([0.0], [0.0], 1)
    assert (x[0], y[0]) == (1, 1)
    x, y = geotile_xy([45.0], [-90.0], 1)
    assert (x[0], y[0]) == (0, 0)
    # clamping at the grid edge
    x, y = geotile_xy([89.9], [179.9999], 2)
    assert x[0] == 3 and y[0] == 0


def test_geo_distance_matches_bruteforce(built):
    index_dir, texts, lat, lon = built
    radius = 6_000_000.0
    got = geo_distance_search(
        index_dir, QUERIES, origin=ORIGIN, radius_m=radius, top_k=8)
    dist = round4(haversine_m(lat, lon, ORIGIN))
    for qid, text in QUERIES:
        m = _matched(texts, text) & (dist <= radius)
        cand = np.flatnonzero(m)
        order = np.lexsort((cand, dist[cand]))
        want = cand[order][:8]
        g = got[got["query_id"] == qid]
        assert g["doc_id"].tolist() == want.tolist()
        np.testing.assert_allclose(
            g["distance_r"].to_numpy(), dist[want], rtol=0, atol=0)
        assert g["rank"].tolist() == list(range(1, len(g) + 1))
        assert len(g) > 0  # the probe actually exercises matches


def test_geo_distance_radius_filters(built):
    index_dir, texts, lat, lon = built
    tight = geo_distance_search(
        index_dir, QUERIES, origin=ORIGIN, radius_m=1_500_000.0, top_k=50)
    dist = haversine_m(lat, lon, ORIGIN)
    assert (dist[tight["doc_id"].to_numpy()] <= 1_500_000.0).all()


def test_geo_bbox_matches_bruteforce(built):
    index_dir, texts, lat, lon = built
    lat_r, lon_r = (-30.0, 40.0), (-60.0, 120.0)
    got = geo_bbox_search(
        index_dir, QUERIES, lat_range=lat_r, lon_range=lon_r)
    inside = ((lat >= lat_r[0]) & (lat <= lat_r[1])
              & (lon >= lon_r[0]) & (lon <= lon_r[1]))
    for qid, text in QUERIES:
        want = np.flatnonzero(_matched(texts, text) & inside)
        g = got[got["query_id"] == qid]
        assert g["doc_id"].tolist() == sorted(want.tolist())
        assert (g["score"] == 1.0).all()
    capped = geo_bbox_search(
        index_dir, QUERIES, lat_range=lat_r, lon_range=lon_r, top_k=3)
    assert (capped.groupby("query_id").size() <= 3).all()
    assert capped[capped["query_id"] == 1]["doc_id"].tolist() == (
        got[got["query_id"] == 1]["doc_id"].tolist()[:3])


def test_geo_bbox_antimeridian_crossing(built):
    """left > right lon range = ES antimeridian-crossing box:
    lon >= left OR lon <= right (round-3 ADVICE item)."""
    index_dir, texts, lat, lon = built
    lat_r, lon_r = (-60.0, 60.0), (150.0, -150.0)
    got = geo_bbox_search(
        index_dir, QUERIES, lat_range=lat_r, lon_range=lon_r)
    inside = ((lat >= lat_r[0]) & (lat <= lat_r[1])
              & ((lon >= lon_r[0]) | (lon <= lon_r[1])))
    hit_any = False
    for qid, text in QUERIES:
        want = np.flatnonzero(_matched(texts, text) & inside)
        g = got[got["query_id"] == qid]
        assert g["doc_id"].tolist() == sorted(want.tolist())
        hit_any = hit_any or len(g) > 0
    assert hit_any  # the wrap box actually matches docs in the fixture


def test_geotile_grid_matches_bruteforce(built):
    index_dir, texts, lat, lon = built
    zoom = 2
    got = geotile_grid_agg(index_dir, QUERIES, zoom=zoom, size=100)
    tx, ty = geotile_xy(lat, lon, zoom)
    for qid, text in QUERIES:
        m = _matched(texts, text)
        want: dict[tuple[int, int], int] = {}
        for i in np.flatnonzero(m):
            want[(int(tx[i]), int(ty[i]))] = want.get(
                (int(tx[i]), int(ty[i])), 0) + 1
        g = got[got["query_id"] == qid]
        have = {(int(r.x), int(r.y)): int(r.n_docs)
                for r in g.itertuples()}
        assert have == want
        # ordering: n_docs desc, then x asc, y asc
        key = [(-int(r.n_docs), int(r.x), int(r.y)) for r in g.itertuples()]
        assert key == sorted(key)
    # size cap keeps the TOP tiles
    small = geotile_grid_agg(index_dir, QUERIES, zoom=zoom, size=2)
    assert (small.groupby("query_id").size() <= 2).all()
    g_all = got[got["query_id"] == 1].head(2).reset_index(drop=True)
    g_cap = small[small["query_id"] == 1].reset_index(drop=True)
    assert g_cap[["x", "y", "n_docs"]].equals(g_all[["x", "y", "n_docs"]])


def test_geotile_zoom_guard(built):
    index_dir, _, _, _ = built
    with pytest.raises(ValueError):
        geotile_grid_agg(index_dir, QUERIES, zoom=9)
