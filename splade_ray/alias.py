"""Index aliases — the ES alias API for a filesystem-contract engine.

The reference addresses an index by literal path in its config
(``conf/index/msmarco.yaml``); swapping corpora means editing
configs. An alias registry is one JSON file (``aliases.json``) in a registry
directory mapping alias names to index-directory lists. Readers resolve
an alias at query time; writers update the registry with an ATOMIC
rename, so a reader never observes a half-applied change — which makes
the blue/green reindex pattern safe: build the new index under a new
path, then ``alias_swap`` flips the alias in one atomic step while
queries keep running (ES ``POST _aliases`` with a remove+add in one
action body).

A single-dir alias resolves to a plain index; a multi-dir alias
federates through ``multi.search_multi`` (union statistics), exactly
like an ES alias spanning several indices. Registry size is alias-count
bytes — driver-trivial at any corpus scale; the pointed-to indexes carry
all the data.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from splade_ray.bm25 import BM25Params

ALIAS_FILE = "aliases.json"


def _path(registry_dir: str) -> str:
    return os.path.join(registry_dir, ALIAS_FILE)


def load_aliases(registry_dir: str) -> dict[str, list[str]]:
    p = _path(registry_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as fh:
        return {k: list(v) for k, v in json.load(fh).items()}


def _write(registry_dir: str, aliases: dict[str, list[str]]) -> None:
    os.makedirs(registry_dir, exist_ok=True)
    tmp = _path(registry_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(aliases, fh, indent=1, sort_keys=True)
    os.replace(tmp, _path(registry_dir))  # atomic: readers see old or new


def alias_set(registry_dir: str, name: str, index_dirs: list[str] | str) -> None:
    """Create or replace an alias (atomic registry rewrite)."""
    dirs = [index_dirs] if isinstance(index_dirs, str) else list(index_dirs)
    if not dirs:
        raise ValueError("an alias needs at least one index dir")
    for d in dirs:
        if not os.path.exists(os.path.join(d, "manifest.json")):
            raise FileNotFoundError(f"{d} is not a built index (no manifest)")
    aliases = load_aliases(registry_dir)
    aliases[name] = dirs
    _write(registry_dir, aliases)


def alias_delete(registry_dir: str, name: str) -> None:
    aliases = load_aliases(registry_dir)
    aliases.pop(name, None)
    _write(registry_dir, aliases)


def alias_resolve(registry_dir: str, name: str) -> list[str]:
    aliases = load_aliases(registry_dir)
    if name not in aliases:
        raise KeyError(f"unknown alias {name!r}")
    return aliases[name]


def alias_swap(registry_dir: str, name: str, new_dirs: list[str] | str) -> list[str]:
    """Atomically repoint an alias (the blue/green flip). Returns the
    PREVIOUS target list so the caller can retire the old index."""
    old = alias_resolve(registry_dir, name)
    alias_set(registry_dir, name, new_dirs)
    return old


def search_alias(
    registry_dir: str,
    name: str,
    queries: list[tuple[int, str]],
    params: BM25Params | None = None,
    *,
    method: str = "exact",
    query_lang: str | None = None,
    concurrency: int | None = None,
) -> pd.DataFrame:
    """BM25 top-k through an alias: a single-dir alias is a plain search,
    a multi-dir alias federates under union statistics (search_multi).
    Single-dir results keep the plain run columns; multi-dir results carry
    the member ``index`` column (the ES ``_index`` field analog)."""
    dirs = alias_resolve(registry_dir, name)
    if len(dirs) == 1:
        from splade_ray.query import search

        return search(dirs[0], queries, params, method=method,
                      query_lang=query_lang, concurrency=concurrency)
    from splade_ray.multi import search_multi

    return search_multi(dirs, queries, params, method=method,
                        query_lang=query_lang, concurrency=concurrency)
