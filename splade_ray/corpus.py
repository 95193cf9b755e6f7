"""Corpus utilities: deterministic synthetic source-code corpus (the
``input_hint`` shape: repo, path, commit, lang, content) and an adapter from
the driver's ``documents`` table to that shape.

The synthetic generator mirrors the reference's toy collection role
(``data/toy_data/full_collection/raw.tsv``, 89 docs) at configurable scale:
seed-deterministic, with (a) ubiquitous tokens in >50% of docs (skew test per
the north rule), (b) rare tokens unique to one doc, (c) empty/whitespace-only
files (empty-doc guard analog, ``transformer_evaluator.py:235-239``),
(d) unicode and long lines.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "js", "java", "go", "c"]
# ubiquitous code tokens (>50% of docs -> pathological posting-list skew)
COMMON = ["def", "return", "import", "class", "if", "else", "for", "while", "int"]
IDENT_POOL = [
    "parse", "buffer", "stream", "index", "shard", "merge", "query", "token",
    "block", "score", "heap", "batch", "actor", "arrow", "delta", "varbyte",
    "posting", "lexicon", "segment", "manifest", "corpus", "vector", "hash",
]


def synth_corpus(n_docs: int, seed: int = 42) -> pa.Table:
    """Generate a deterministic synthetic code corpus of the input_hint shape."""
    rng = np.random.RandomState(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_docs):
        repo = f"org{i % 7}/proj{i % 13}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/mod{i % 11}/file{i}.{lang}"
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        if i % 37 == 5:
            content = ""  # empty-doc guard
        elif i % 37 == 6:
            content = "   \n\t  \n"  # whitespace-only
        else:
            n_lines = int(rng.randint(3, 25))
            lines = []
            for _ in range(n_lines):
                kw = COMMON[rng.randint(len(COMMON))]
                idents = [IDENT_POOL[rng.randint(len(IDENT_POOL))] for _ in range(rng.randint(1, 5))]
                lines.append(f"{kw} {'_'.join(idents)}({', '.join(idents[:2])}) {{ x{i % 10} += 1; }}")
            if i % 17 == 3:
                lines.append(f"rare_token_{i} = 'unique'  # 注释 ünïcode λ")
            if i % 23 == 11:
                lines.append("long_line_" + " ".join(["pad"] * 200))
            content = "\n".join(lines)
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append(content)
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def write_synth_corpus(out_dir: str, n_docs: int, seed: int = 42, n_files: int = 4) -> list[str]:
    """Write the synthetic corpus as multiple parquet files (multi-fragment
    input, as a real corpus would be)."""
    os.makedirs(out_dir, exist_ok=True)
    t = synth_corpus(n_docs, seed)
    paths = []
    per = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        part = t.slice(f * per, per)
        if part.num_rows == 0:
            break
        p = os.path.join(out_dir, f"corpus-{f:03d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def documents_as_corpus(sf_dir: str, out_dir: str) -> list[str]:
    """Adapt the driver's ``documents`` table (doc_id, text, lang, source,
    n_chars) to the input_hint corpus shape, deterministically."""
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    doc_ids = t["doc_id"].to_pylist()
    commits = [hashlib.sha1(f"doc:{d}".encode()).hexdigest() for d in doc_ids]
    out = pa.table(
        {
            "repo": t["source"],
            "path": pa.array([f"docs/{d}.txt" for d in doc_ids], pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": t["lang"],
            "content": t["text"],
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    p = os.path.join(out_dir, "corpus-000.parquet")
    pq.write_table(out, p)
    return [p]


def sha256_column(batch: pa.Table, *, text_col: str = "content") -> pa.Table:
    """Append the per-row content sha256 (hex) — the north-rule invariant."""
    from splade_ray.codec import sha256_hex

    return batch.append_column(
        "content_sha256", pa.array(sha256_hex(batch[text_col]), pa.string())
    )
