"""Index-distribution figure — the analog of the reference's
``splade/utils/index_figure.py:13-31`` (posting-list lengths sorted
descending on a log-log plot, saved beside the index).

Driver-side over the lexicon table (vocabulary-sized, like the reference's
``index_dist.json``). No plotting library is vendored in this environment,
so the figure is emitted as a self-contained SVG (plus the raw
``index_dist.json`` sidecar the reference also writes,
``inverted_index.py:90-94``).
"""

from __future__ import annotations

import json
import math
import os

import pyarrow.dataset as pads


def index_dist(index_dir: str) -> dict[str, int]:
    """term -> df (posting-list length), from the lexicon."""
    lex = pads.dataset(os.path.join(index_dir, "lexicon")).to_table(
        columns=["term", "df"]
    )
    return dict(zip(lex["term"].to_pylist(), (int(x) for x in lex["df"].to_pylist())))


def _svg_loglog(lengths: list[int], width: int = 640, height: int = 400) -> str:
    """Log-log scatter of descending posting-list lengths (rank vs df) as a
    minimal standalone SVG."""
    pad = 46
    n = len(lengths)
    if n == 0:
        return f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}"/>'
    max_rank = max(n, 2)
    max_df = max(max(lengths), 2)

    def x(rank):
        return pad + (math.log10(rank) / math.log10(max_rank)) * (width - 2 * pad)

    def y(df):
        return (height - pad) - (math.log10(max(df, 1)) / math.log10(max_df)) * (
            height - 2 * pad
        )

    # subsample for huge vocabularies: log-spaced ranks keep the curve shape
    if n > 2000:
        idx = sorted({int(10 ** (i / 300.0)) for i in range(0, int(300 * math.log10(n)) + 1)})
        idx = [i for i in idx if i <= n]
    else:
        idx = list(range(1, n + 1))
    pts = " ".join(f"{x(r):.1f},{y(lengths[r - 1]):.1f}" for r in idx)
    ticks = []
    for e in range(0, int(math.log10(max_rank)) + 1):
        ticks.append(
            f'<text x="{x(10 ** e):.0f}" y="{height - pad + 16}" font-size="10" '
            f'text-anchor="middle">1e{e}</text>'
        )
    for e in range(0, int(math.log10(max_df)) + 1):
        ticks.append(
            f'<text x="{pad - 6}" y="{y(10 ** e):.0f}" font-size="10" '
            f'text-anchor="end">1e{e}</text>'
        )
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{height}">'
        f'<rect width="{width}" height="{height}" fill="white"/>'
        f'<line x1="{pad}" y1="{height - pad}" x2="{width - pad}" y2="{height - pad}" stroke="black"/>'
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{height - pad}" stroke="black"/>'
        f'<polyline points="{pts}" fill="none" stroke="#1f77b4" stroke-width="1.5"/>'
        f'<text x="{width // 2}" y="{height - 8}" font-size="11" text-anchor="middle">term rank (log)</text>'
        f'<text x="12" y="{height // 2}" font-size="11" text-anchor="middle" '
        f'transform="rotate(-90 12 {height // 2})">posting-list length (log)</text>'
        + "".join(ticks)
        + "</svg>"
    )


def index_figure(index_dir: str, out_dir: str | None = None) -> dict:
    """Write ``index_dist.json`` + ``index_dist.svg`` next to the index (or
    to ``out_dir``) and return summary stats — mirrors the reference's
    ``index_figure`` entry point (sorted-descending log-log distribution)."""
    out_dir = out_dir or index_dir
    dist = index_dist(index_dir)
    lengths = sorted(dist.values(), reverse=True)
    with open(os.path.join(out_dir, "index_dist.json"), "w") as fh:
        json.dump(dist, fh)
    with open(os.path.join(out_dir, "index_dist.svg"), "w") as fh:
        fh.write(_svg_loglog(lengths))
    return {
        "n_terms": len(lengths),
        "max_df": lengths[0] if lengths else 0,
        "median_df": lengths[len(lengths) // 2] if lengths else 0,
        "svg": os.path.join(out_dir, "index_dist.svg"),
    }
