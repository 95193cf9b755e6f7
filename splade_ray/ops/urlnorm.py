"""URL canonicalization + URL-keyed dedup — the FineWeb / CommonCrawl
pipeline stage that runs before any content dedup: crawls carry the same
page under many URL spellings (case, www, default ports, tracking params,
fragments, trailing slashes), and dedup by canonical URL removes the bulk
of refetch duplicates for the cost of a string kernel.

The normalization is a DEDUP-KEY contract, not a fetchable-URL rewrite
(documented: the whole URL is lowercased — paths on case-sensitive
servers collapse deliberately, exactly what a crawl-dedup key wants).
Every step is one RE2 ``replace_substring_regex`` (DuckDB's
``regexp_replace(..., 'g')`` runs the identical pattern — the PII-redaction
"patterns shared verbatim with SQL" recipe, ops/curation.py:487 analog),
so the SQL oracle mirrors the chain exactly.

Scale shape: normalization is a zero-shuffle batch kernel; dedup reuses
the exact_dedup recipe — one coarse sha-prefix groupby over
(prefix, url-sha, id) rows, nothing URL-sized shuffles beyond the slim
key rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# Ordered RE2 (pattern, replacement) chain applied to the LOWERCASED url.
# DuckDB runs the same patterns via regexp_replace(..., 'g'); both engines
# use RE2 semantics (no lookarounds — default ports handled with a
# captured terminator instead of a lookahead).
URL_NORM_PATTERNS: list[tuple[str, str]] = [
    (r"#.*$", ""),                                          # fragment
    (r"(utm_[a-z0-9_]+|gclid|fbclid|ref)=[^&]*&", ""),      # tracking, mid
    (r"[?&](utm_[a-z0-9_]+|gclid|fbclid|ref)=[^&]*$", ""),  # tracking, last
    (r"^(http://[^/:?#]+):80([/?#]|$)", r"\1\2"),           # default port
    (r"^(https://[^/:?#]+):443([/?#]|$)", r"\1\2"),
    (r"^(https?://)www\.", r"\1"),                          # www.
    # ONE tail rule for empty query / trailing slashes / dangling &:
    # separate \?$ and /$ rules were non-idempotent on runs like '//',
    # '??' or '?/' (hypothesis-found — each pass peeled one layer)
    (r"[/?&]+$", ""),
]


def normalize_url_column(urls) -> pa.Array:
    """Vectorized canonical dedup-key for a URL string column: lowercase,
    then the :data:`URL_NORM_PATTERNS` chain — all Arrow RE2 kernels, no
    per-row Python."""
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    out = pc.utf8_lower(urls)
    for pat, repl in URL_NORM_PATTERNS:
        out = pc.replace_substring_regex(out, pattern=pat, replacement=repl)
    return out


def add_url_norm(batch: pa.Table, *, url_col: str = "url",
                 out_col: str = "url_norm") -> pa.Table:
    return batch.append_column(out_col,
                               normalize_url_column(batch[url_col]))


def url_dedup(ds, *, url_col: str = "url", id_col: str = "doc_id"):
    """Keep the lowest id per canonical URL. Returns
    (doc_id, url_norm, n_copies) — one survivor row per distinct
    canonical URL, the exact_dedup shape keyed on the normalized URL.
    One shuffle of (sha-prefix coarse key, url sha, url_norm, id) rows."""
    import pyarrow.compute as pc

    from splade_ray.codec import sha256_hex

    def key_rows(batch: pa.Table) -> pa.Table:
        norm = normalize_url_column(batch[url_col])
        sha = pa.array(sha256_hex(norm), pa.string())
        return pa.table(
            {
                "gk": pc.utf8_slice_codeunits(sha, 0, 4),
                "sha": sha,
                "url_norm": norm,
                id_col: batch[id_col].cast(pa.int64()),
            }
        )

    def keep_first(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "sha" not in g.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "url_norm": pa.array([], pa.string()),
                             "n_copies": pa.array([], pa.int64())})
        sha = np.asarray(g["sha"].to_numpy(zero_copy_only=False))
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        urls = np.asarray(g["url_norm"].to_numpy(zero_copy_only=False))
        order = np.lexsort((ids, sha))
        sha, ids, urls = sha[order], ids[order], urls[order]
        starts = np.flatnonzero(np.r_[True, sha[1:] != sha[:-1]])
        counts = np.diff(np.append(starts, ids.size))
        return pa.table(
            {
                "doc_id": pa.array(ids[starts], pa.int64()),
                "url_norm": pa.array(urls[starts], pa.string()),
                "n_copies": pa.array(counts.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(key_rows, batch_format="pyarrow")
        .groupby("gk")
        .map_groups(keep_first, batch_format="pyarrow")
    )


def url_norm_sql(expr: str) -> str:
    """The identical normalization chain as DuckDB SQL over ``expr`` —
    generated from :data:`URL_NORM_PATTERNS` so engine and oracle can
    never drift."""
    out = f"lower({expr})"
    for pat, repl in URL_NORM_PATTERNS:
        # DuckDB single-quoted literals pass backslashes through verbatim
        p = pat.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{repl}', 'g')"
    return out
