"""URL canonicalization + URL-keyed dedup (ops/urlnorm)."""

import pyarrow as pa
import pytest
import ray.data as rd

from splade_ray.ops.urlnorm import (
    normalize_url_column,
    url_dedup,
    url_norm_sql,
)


CASES = [
    # (raw, canonical dedup key)
    ("HTTP://WWW.Example.COM:80/Docs/A/", "http://example.com/docs/a"),
    ("https://www.example.com:443/x?id=1", "https://example.com/x?id=1"),
    ("http://example.com/p?utm_source=f&id=2&utm_campaign=c#frag",
     "http://example.com/p?id=2"),
    ("http://example.com/p?utm_source=only", "http://example.com/p"),
    ("http://example.com/p?id=3&gclid=abc", "http://example.com/p?id=3"),
    ("http://example.com:8080/p", "http://example.com:8080/p"),  # non-default
    ("http://example.com/", "http://example.com"),
    ("http://example.com/p?ref=x&fbclid=y&id=4", "http://example.com/p?id=4"),
]


def test_normalize_url_column_rules():
    got = normalize_url_column(pa.array([r for r, _ in CASES])).to_pylist()
    assert got == [c for _, c in CASES]


def test_url_norm_sql_matches_kernel():
    import duckdb

    con = duckdb.connect()
    for raw, want in CASES:
        sql = url_norm_sql(f"'{raw}'")
        assert con.sql(f"SELECT {sql}").fetchone()[0] == want, raw


def test_url_dedup_keeps_lowest_id(ray_session):
    rows = [
        {"doc_id": 3, "url": "HTTP://WWW.a.com:80/x/"},
        {"doc_id": 1, "url": "http://a.com/x"},
        {"doc_id": 2, "url": "http://a.com/x?utm_source=f"},
        {"doc_id": 4, "url": "http://b.com/y"},
    ]
    out = (url_dedup(rd.from_items(rows).repartition(2))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 4]
    assert out["n_copies"].tolist() == [3, 1]
    assert out["url_norm"].tolist() == ["http://a.com/x", "http://b.com/y"]


def test_normalize_idempotent_hypothesis():
    """Canonicalization must be idempotent: normalize(normalize(u)) ==
    normalize(u) — property-tested over adversarial URL-ish strings."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.text(
        alphabet="abcXYZ019_./?&#=:-", min_size=0, max_size=20)

    @settings(max_examples=200, deadline=None)
    @given(scheme=st.sampled_from(["http://", "https://", "HTTP://WWW.", ""]),
           host=st.sampled_from(["a.com", "A.com:80", "b.org:443", "c.io:8080"]),
           rest=frag)
    def prop(scheme, host, rest):
        u = scheme + host + "/" + rest
        once = normalize_url_column(pa.array([u])).to_pylist()[0]
        twice = normalize_url_column(pa.array([once])).to_pylist()[0]
        assert twice == once, (u, once, twice)

    prop()
