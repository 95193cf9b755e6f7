"""Term-partitioned global posting store via salted ``groupby(term)``.

The north rule's wide step: group flat postings by term into global
delta+varbyte posting lists, handling Zipf skew (ubiquitous code tokens like
``def`` / ``{`` appear in most docs) with *salted repartitioning*: the
shuffle key is ``(term, salt)`` where ``salt = doc_id // salt_range``, so a
giant term splits into bounded, doc-id-range-disjoint sub-groups. Sub-lists
are encoded independently and then concatenated in salt order in a second,
much smaller ``groupby(term)`` — concatenation preserves doc-id order by
construction, and only each sub-list's first varbyte value is re-encoded
(``splade_ray.codec.rewrite_first_delta``), never the bulk bytes.

This is the engine's analog of the reference's term-keyed index layout
(``IndexDictOfArray``, ``splade/indexing/inverted_index.py:16-67``) — used
for posting-list export, pruning transforms and term statistics — while
query serving uses the doc-partitioned segments (SURVEY.md §4 'Shard keys').
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from splade_ray.codec import encode_doc_ids, rewrite_first_delta, varbyte_encode

DEFAULT_SALT_RANGE = 1 << 20  # docs per salt bucket; bounds any group's size


def add_salt(batch: pa.Table, *, salt_range: int = DEFAULT_SALT_RANGE) -> pa.Table:
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return batch.append_column("salt", pa.array(doc_ids // salt_range, pa.int64()))


def encode_subgroup(group: pd.DataFrame) -> pd.DataFrame:
    """Encode one (term, salt) sub-group into a compressed sub-list."""
    g = group.sort_values("doc_id")
    docs = g["doc_id"].to_numpy(np.int64)
    tfs = g["tf"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "term": [g["term"].iloc[0]],
            "salt": [int(g["salt"].iloc[0])],
            "df": [len(docs)],
            "cf": [int(tfs.sum())],
            "first_doc": [int(docs[0])],
            "last_doc": [int(docs[-1])],
            "docs_enc": [encode_doc_ids(docs)],
            "tfs_enc": [varbyte_encode(tfs)],
        }
    )


def concat_subgroups(group: pd.DataFrame) -> pd.DataFrame:
    """Merge one term's sub-lists (salt order) into the global posting list.
    Sub-lists are doc-id-range disjoint, so this is pure concatenation."""
    g = group.sort_values("salt")
    docs_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    prev_last = 0
    for _, row in g.iterrows():
        enc = row["docs_enc"]
        if docs_parts:
            enc = rewrite_first_delta(enc, int(row["first_doc"]), prev_last)
        docs_parts.append(bytes(enc))
        tf_parts.append(bytes(row["tfs_enc"]))
        prev_last = int(row["last_doc"])
    return pd.DataFrame(
        {
            "term": [g["term"].iloc[0]],
            "df": [int(g["df"].sum())],
            "cf": [int(g["cf"].sum())],
            "docs_enc": [b"".join(docs_parts)],
            "tfs_enc": [b"".join(tf_parts)],
        }
    )


def build_term_index(postings_flat, *, salt_range: int = DEFAULT_SALT_RANGE):
    """postings_flat: Dataset of (term, doc_id, tf) -> Dataset of global
    compressed posting lists (term, df, cf, docs_enc, tfs_enc)."""
    sub = (
        postings_flat.map_batches(
            add_salt, batch_format="pyarrow", fn_kwargs={"salt_range": salt_range}
        )
        .groupby(["term", "salt"])
        .map_groups(encode_subgroup, batch_format="pandas")
    )
    return sub.groupby("term").map_groups(concat_subgroups, batch_format="pandas")
