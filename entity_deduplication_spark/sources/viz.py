"""S6 viz sink: dedup run report as a standalone SVG (no matplotlib).

The reference renders cluster-size histograms and run-metric panels as
matplotlib PNGs (comparison.py:233-324). This engine re-expresses the
same artifact as a dependency-free SVG written next to the output
tables: a single-series bar chart of the cluster-size distribution over
a metrics caption line. Only BOUNDED aggregates are collected (one row
per histogram bin + the 1-row metrics table) — the sink never pulls
cluster rows to the driver.

Chart conventions (single series, light surface): one sanctioned blue
for the bars with flat-bottom/rounded-top data ends, recessive gray
gridlines, values and labels in ink colors (never the series color),
no legend (the title names the single series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SURFACE = "#fcfcfb"
_INK = "#0b0b0b"
_INK_2 = "#52514e"
_GRID = "#e7e6e2"
_BAR = "#2a78d6"


def _esc(s: object) -> str:
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def _bar_path(x: float, y: float, w: float, h: float, r: float = 4.0) -> str:
    """Bar with rounded TOP corners only — the data end is rounded, the
    baseline end stays flat (anchored)."""
    r = min(r, w / 2, h)
    return (
        f"M {x:.1f} {y + h:.1f} "
        f"L {x:.1f} {y + r:.1f} Q {x:.1f} {y:.1f} {x + r:.1f} {y:.1f} "
        f"L {x + w - r:.1f} {y:.1f} "
        f"Q {x + w:.1f} {y:.1f} {x + w:.1f} {y + r:.1f} "
        f"L {x + w:.1f} {y + h:.1f} Z"
    )


_BUCKET_ORDER = ["1", "2", "3-5", "6-10", "11-20", "21-50", "50+"]


def render_cluster_report_svg(
    bins: list[tuple[str, int]], metrics: dict[str, object]
) -> str:
    """SVG text for a cluster-size histogram + metrics caption.

    ``bins``: (size_bucket, n_clusters) rows, any order; buckets sort in
    their ordinal order (the histogram's 7 bins), unknown labels last.
    ``metrics``: the 1-row metrics table as a dict.
    """
    rank = {b: i for i, b in enumerate(_BUCKET_ORDER)}
    bins = sorted(bins, key=lambda kv: (rank.get(kv[0], 99), kv[0]))
    width, height = 640, 360
    left, right, top, bottom = 56, 16, 64, 72
    plot_w = width - left - right
    plot_h = height - top - bottom
    n = max(len(bins), 1)
    vmax = max((c for _, c in bins), default=1)
    # y ticks: ~4 steps snapped to 1/2/5 x 10^k
    raw = max(1, -(-vmax // 4))
    mag = 10 ** (len(str(raw)) - 1)
    step = next(s * mag for s in (1, 2, 5, 10) if s * mag >= raw)
    ticks = list(range(0, vmax + step, step))
    ymax = max(ticks[-1], 1)

    parts: list[str] = []
    parts.append(
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}" '
        f'font-family="system-ui, sans-serif">'
    )
    parts.append(f'<rect width="{width}" height="{height}" fill="{_SURFACE}"/>')
    parts.append(
        f'<text x="{left}" y="28" font-size="16" font-weight="600" '
        f'fill="{_INK}">Cluster size distribution</text>'
    )
    cap = (
        f"{metrics.get('total_records', '?')} records, "
        f"{metrics.get('unique_entities', '?')} entities, "
        f"dedup rate {metrics.get('dedup_rate', '?')}, "
        f"max cluster {metrics.get('max_cluster_size', '?')}"
    )
    parts.append(
        f'<text x="{left}" y="46" font-size="12" fill="{_INK_2}">'
        f"{_esc(cap)}</text>"
    )
    # recessive gridlines + y labels
    for t in ticks:
        y = top + plot_h * (1 - t / ymax)
        parts.append(
            f'<line x1="{left}" y1="{y:.1f}" x2="{left + plot_w}" '
            f'y2="{y:.1f}" stroke="{_GRID}" stroke-width="1"/>'
        )
        parts.append(
            f'<text x="{left - 6}" y="{y + 4:.1f}" font-size="11" '
            f'text-anchor="end" fill="{_INK_2}">{t}</text>'
        )
    # bars: single series, 2px surface gap between adjacent fills
    slot = plot_w / n
    gap = max(2.0, slot * 0.2)
    bar_w = max(2.0, slot - gap)
    for i, (size, count) in enumerate(bins):
        h = plot_h * count / ymax
        x = left + i * slot + gap / 2
        y = top + plot_h - h
        parts.append(
            f'<path d="{_bar_path(x, y, bar_w, h)}" fill="{_BAR}" '
            f'class="bar" data-size="{size}" data-count="{count}"/>'
        )
        parts.append(
            f'<text x="{x + bar_w / 2:.1f}" y="{y - 4:.1f}" font-size="11" '
            f'text-anchor="middle" fill="{_INK_2}">{count}</text>'
        )
        parts.append(
            f'<text x="{x + bar_w / 2:.1f}" y="{top + plot_h + 16}" '
            f'font-size="11" text-anchor="middle" fill="{_INK_2}">'
            f"{size}</text>"
        )
    # axis line + titles (ink, recessive axis)
    parts.append(
        f'<line x1="{left}" y1="{top + plot_h}" x2="{left + plot_w}" '
        f'y2="{top + plot_h}" stroke="{_INK_2}" stroke-width="1"/>'
    )
    parts.append(
        f'<text x="{left + plot_w / 2:.1f}" y="{height - 28}" font-size="12" '
        f'text-anchor="middle" fill="{_INK_2}">cluster size (members)</text>'
    )
    parts.append(
        f'<text x="16" y="{top + plot_h / 2:.1f}" font-size="12" '
        f'fill="{_INK_2}" text-anchor="middle" '
        f'transform="rotate(-90 16 {top + plot_h / 2:.1f})">clusters</text>'
    )
    parts.append("</svg>")
    return "".join(parts)


def write_cluster_report(
    clusters: DataFrame, metrics: DataFrame, path: str
) -> str:
    """Collect the BOUNDED aggregates (size histogram + 1-row metrics)
    and write the SVG report to ``path``. Returns the path."""
    from entity_deduplication_spark.operators.stats import (
        cluster_size_histogram,
    )

    hist = cluster_size_histogram(clusters).collect()
    bins = [(str(r["bucket"]), int(r["n_clusters"])) for r in hist]
    m = metrics.first()
    mdict = dict(zip(metrics.columns, m)) if m is not None else {}
    svg = render_cluster_report_svg(bins, mdict)
    with open(path, "w") as f:
        f.write(svg)
    return path
