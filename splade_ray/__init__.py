"""splade_ray — a Ray-Data-native sparse retrieval engine.

A brand-new engine (NOT a port) with the data-processing capabilities of
naver/splade's indexing + retrieval pipeline (see SURVEY.md): tokenize code
content with ``map_batches`` over zero-copy Arrow batches, build per-partition
inverted indexes (delta-encoded, varbyte-compressed posting lists with
block-max metadata), merge per-partition term statistics into a global
lexicon, and answer BM25 top-k queries via scatter-gather over index-shard
workers with optional block-max early termination.

Reference semantics derive from naver/splade (cited per-module as
``path:line`` into /root/reference); the architecture is Ray Data first.
"""

from splade_ray.bm25 import BM25Params
from splade_ray.build import build_index
from splade_ray.query import search, prepare_queries

__all__ = ["BM25Params", "build_index", "search", "prepare_queries"]
