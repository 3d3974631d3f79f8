"""Training loss line chart as standalone SVG (the visdom plot replacement,
reference util/visualizer.py:185-209).

Design follows the dataviz method: change-over-time -> line chart; one y
axis; categorical hues assigned to loss names in FIXED slot order from the
validated default palette (adjacent-pair CVD-safe in light mode per the
palette reference); 2px lines; recessive grid; legend + direct end labels;
text in ink tokens, never series color; per-point <title> tooltips.
"""

from __future__ import annotations

import html as _html
import json
import math
import os
from typing import Dict, List

# validated default categorical palette, light mode, fixed slot order
_PALETTE = [
    "#2a78d6", "#eb6834", "#1baf7a", "#eda100",
    "#e87ba4", "#008300", "#4a3aa7", "#e34948",
]
# fixed slot per loss name so a series keeps its hue across runs/filters
_SLOTS = [
    "loss_G", "loss_D", "loss_G_gan", "loss_G_ce",
    "loss_G_l1", "loss_D_real", "loss_D_fake", "loss_G_content",
]

_INK = "#1a1a19"
_INK_2 = "#6b6a60"
_GRID = "#e8e7e0"


def read_metrics(metrics_path: str) -> List[dict]:
    rows = []
    if not os.path.exists(metrics_path):
        return rows
    with open(metrics_path) as f:
        for line in f:
            line = line.strip()
            if line:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    continue
    return rows


def _nice_ticks(lo: float, hi: float, n: int = 5) -> List[float]:
    if hi <= lo:
        hi = lo + 1.0
    raw = (hi - lo) / n
    mag = 10 ** math.floor(math.log10(raw))
    step = min(s * mag for s in (1, 2, 5, 10) if s * mag >= raw)
    start = math.floor(lo / step) * step
    ticks = []
    t = start
    while t <= hi + step * 0.5:
        ticks.append(round(t, 10))
        t += step
    return ticks


def loss_plot_svg(rows: List[dict], width: int = 720, height: int = 320) -> str:
    """Render the loss series in metrics rows to an SVG string."""
    skip = {"epoch", "iters", "t_comp", "t_data"}
    names = []
    for r in rows:
        for k in r:
            if k not in skip and k not in names:
                names.append(k)
    # fixed slot order first, then any extras, capped at 8 series
    names = sorted(names, key=lambda n: _SLOTS.index(n) if n in _SLOTS else 99)[:8]
    if not rows or not names:
        return "<svg xmlns='http://www.w3.org/2000/svg' width='10' height='10'/>"

    xs = list(range(len(rows)))
    pad_l, pad_r, pad_t, pad_b = 56, 120, 16, 36
    pw, ph = width - pad_l - pad_r, height - pad_t - pad_b

    all_vals = [r[n] for r in rows for n in names if n in r]
    lo, hi = min(all_vals), max(all_vals)
    if lo == hi:
        lo, hi = lo - 1, hi + 1
    ticks = _nice_ticks(lo, hi)
    lo, hi = min(ticks[0], lo), max(ticks[-1], hi)

    def X(i):
        return pad_l + (i / max(len(xs) - 1, 1)) * pw

    def Y(v):
        return pad_t + (1 - (v - lo) / (hi - lo)) * ph

    parts = [
        f"<svg xmlns='http://www.w3.org/2000/svg' width='{width}' height='{height}' "
        f"font-family='system-ui,sans-serif' font-size='11'>",
        f"<rect width='{width}' height='{height}' fill='#ffffff'/>",
    ]
    # recessive grid + y labels (ink tokens, not series color)
    for t in ticks:
        y = Y(t)
        parts.append(
            f"<line x1='{pad_l}' y1='{y:.1f}' x2='{pad_l + pw}' y2='{y:.1f}' "
            f"stroke='{_GRID}' stroke-width='1'/>"
        )
        parts.append(
            f"<text x='{pad_l - 6}' y='{y + 3:.1f}' text-anchor='end' "
            f"fill='{_INK_2}'>{t:g}</text>"
        )
    parts.append(
        f"<text x='{pad_l + pw / 2:.0f}' y='{height - 8}' text-anchor='middle' "
        f"fill='{_INK_2}'>log point (every print_freq iters)</text>"
    )

    for si, name in enumerate(names):
        color = _PALETTE[si]
        pts = [(X(i), Y(r[name])) for i, r in enumerate(rows) if name in r]
        if not pts:
            continue
        poly = " ".join(f"{x:.1f},{y:.1f}" for x, y in pts)
        parts.append(
            f"<polyline points='{poly}' fill='none' stroke='{color}' "
            "stroke-width='2' stroke-linejoin='round'/>"
        )
        # sparse hover targets with tooltips (every ~10th point)
        stride = max(1, len(pts) // 40)
        for (x, y), r in list(zip(pts, [r for r in rows if name in r]))[::stride]:
            parts.append(
                f"<circle cx='{x:.1f}' cy='{y:.1f}' r='8' fill='transparent'>"
                f"<title>{_html.escape(name)} = {r[name]:.4g} "
                f"(epoch {r.get('epoch', '?')}, iters {r.get('iters', '?')})</title>"
                "</circle>"
            )
        # direct end label + legend mark (text stays ink-colored)
        ex, ey = pts[-1]
        parts.append(
            f"<circle cx='{pad_l + pw + 10}' cy='{pad_t + 14 * si + 8}' r='4' "
            f"fill='{color}'/>"
            f"<text x='{pad_l + pw + 18}' y='{pad_t + 14 * si + 12}' "
            f"fill='{_INK}'>{_html.escape(name)}</text>"
        )
    parts.append("</svg>")
    return "".join(parts)


def write_loss_plot(log_dir: str) -> str:
    """Generate {log_dir}/loss_plot.svg from {log_dir}/metrics.jsonl."""
    rows = read_metrics(os.path.join(log_dir, "metrics.jsonl"))
    svg = loss_plot_svg(rows)
    out = os.path.join(log_dir, "loss_plot.svg")
    with open(out, "w") as f:
        f.write(svg)
    return out
