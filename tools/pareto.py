"""Generate docs/pareto.html — decode speed vs compression ratio, ours vs
the reference (the analog of the reference's docs/index.html benchmark
page, /root/reference/docs/index.html).

Reads the checked-in measurement artifacts only (BENCH_DETAIL.json for
device rows, BENCH_REF.json for same-core host rows) so every plotted
point traces to a committed JSON row; reference 7950X points are quoted
from /root/reference/README.md and labeled as such.

Usage: python tools/pareto.py   (writes docs/pareto.html)
"""

from __future__ import annotations

import html
import json
import math
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# reference 7950X 32T mt decode on x-ray (README.md:182-192): (B, ratio%, MiB/s)
REF_MT_XRAY = [
    (10, 80.23, 18035.77), (11, 80.08, 16210.44), (12, 80.05, 13207.00),
    (13, 80.04, 11938.77), (14, 80.05, 10318.01), (15, 80.09, 7308.43),
]
# reference 7950X 1T decode rows, enwik8 (README.md:29-76 selected)
REF_1T = [
    ("raw x64 B12", 63.83, 3009.18), ("raw x64 B11", 64.48, 3018.02),
    ("block x64 B12", 63.73, 2856.76), ("raw x64 B15", 61.33, 2221.76),
]

S1, S2, S3 = "#2a78d6", "#eb6834", "#1baf7a"  # validated slots 1-3 (dataviz palette)


def _rows() -> dict[str, dict]:
    try:
        rows = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    except (OSError, json.JSONDecodeError):
        rows = []
    return {r["metric"]: r for r in rows if isinstance(r, dict) and "metric" in r}


def _device_points(rows: dict) -> tuple[list, list]:
    """(xray_points, corpus_points) as (label, ratio%, mib_s, carried)."""
    xray, corpus = [], []
    for b in (10, 11, 12, 13, 14, 15):
        for fam, pretty in (("mt_dp_xray", "mt dp"), ("mt_xray", "mt")):
            s, r = rows.get(f"{fam}_decode_B{b}"), rows.get(f"ratio_{fam}_B{b}")
            if s and r and s["value"] > 0 and not s.get("suspect"):
                xray.append((f"{pretty} B{b}", r["value"] * 100, s["value"], s.get("carried", False)))
    pairs = [
        ("tpx_decode_B12", "ratio_tpx_text", "tpx B12 (text)"),
        ("tpx_adaptive_decode", "ratio_tpx_adaptive", "tpx adaptive"),
        ("mt_planner_decode_B12", "ratio_mt_corpus", "mt planner B12"),
        ("mt_dp_decode_B12", "ratio_mt_dp_corpus", "mt dp B12"),
        ("tpx_corpus_decode_ratio_goal", "ratio_tpx_corpus", "tpx ratio-goal"),
    ]
    for sm, rm, label in pairs:
        s, r = rows.get(sm), rows.get(rm)
        if s and r and s["value"] > 0 and not s.get("suspect"):
            corpus.append((label, r["value"] * 100, s["value"], s.get("carried", False)))
    return xray, corpus


def _host_points() -> list:
    """Same-core host rows (ours vs compiled reference) from BENCH_REF.json."""
    try:
        data = json.load(open(os.path.join(REPO, "BENCH_REF.json")))
    except (OSError, json.JSONDecodeError):
        return []
    ours = []
    ratios = {}
    for r in data.get("rows", []):
        if r["op"] == "encode" and r.get("ours_ratio_pct"):
            ratios[(r["family"], r["bits"])] = r["ours_ratio_pct"]
    for r in data.get("rows", []):
        if r["op"] == "decode" and r["bits"] == 12:
            ratio = ratios.get((r["family"], r["bits"]))
            if ratio:
                ours.append((f"{r['family']} (host)", ratio, r["ours_mib_s"], False))
    return ours


def _panel(title: str, series: list[tuple[str, str, list]], w=560, h=420) -> str:
    """One scatter panel. series = [(name, color, points)], points =
    (label, ratio_pct, mib_s, dimmed)."""
    pad_l, pad_r, pad_t, pad_b = 64, 16, 34, 44
    pw, ph = w - pad_l - pad_r, h - pad_t - pad_b
    all_pts = [p for _, _, pts in series for p in pts]
    if not all_pts:
        return f'<svg width="{w}" height="{h}"><text x="20" y="40">no data for {html.escape(title)}</text></svg>'
    xs = [p[1] for p in all_pts]
    ys = [p[2] for p in all_pts]
    x0, x1 = min(xs) - 2, max(xs) + 2
    y0 = 10 ** math.floor(math.log10(min(ys)))
    y1 = 10 ** math.ceil(math.log10(max(ys)))

    def X(v):
        return pad_l + (v - x0) / (x1 - x0) * pw

    def Y(v):
        return pad_t + (1 - (math.log10(v) - math.log10(y0)) / (math.log10(y1) - math.log10(y0))) * ph

    out = [f'<svg viewBox="0 0 {w} {h}" width="{w}" height="{h}" role="img" aria-label="{html.escape(title)}">']
    out.append(f'<text x="{pad_l}" y="20" class="title">{html.escape(title)}</text>')
    # y grid: decades + 2x/5x minors
    d = y0
    while d <= y1:
        for m in (1, 2, 5):
            v = d * m
            if v > y1:
                break
            y = Y(v)
            out.append(f'<line x1="{pad_l}" y1="{y:.1f}" x2="{w - pad_r}" y2="{y:.1f}" class="grid"/>')
            out.append(f'<text x="{pad_l - 6}" y="{y + 3.5:.1f}" class="tick" text-anchor="end">{v:,.0f}</text>')
        d *= 10
    # x ticks
    step = max(1, round((x1 - x0) / 6))
    t = math.ceil(x0)
    while t <= x1:
        x = X(t)
        out.append(f'<line x1="{x:.1f}" y1="{pad_t}" x2="{x:.1f}" y2="{h - pad_b}" class="grid"/>')
        out.append(f'<text x="{x:.1f}" y="{h - pad_b + 16}" class="tick" text-anchor="middle">{t}%</text>')
        t += step
    out.append(f'<text x="{pad_l + pw / 2:.0f}" y="{h - 8}" class="axis" text-anchor="middle">compressed size (% of raw — lower is better)</text>')
    out.append(f'<text transform="translate(14,{pad_t + ph / 2:.0f}) rotate(-90)" class="axis" text-anchor="middle">decode MiB/s (log)</text>')
    for name, color, pts in series:
        for label, ratio, mib, dim in pts:
            x, y = X(ratio), Y(mib)
            cls = ' opacity="0.45"' if dim else ""
            tip = f"{label}: {mib:,.0f} MiB/s @ {ratio:.2f}%" + (" (carried)" if dim else "")
            out.append(
                f'<circle cx="{x:.1f}" cy="{y:.1f}" r="5" fill="{color}" stroke="var(--surface-1)" stroke-width="2"{cls}>'
                f"<title>{html.escape(tip)}</title></circle>"
            )
    # selective direct labels: fastest point per series only
    for name, color, pts in series:
        if not pts:
            continue
        best = max(pts, key=lambda p: p[2])
        out.append(
            f'<text x="{X(best[1]) + 8:.1f}" y="{Y(best[2]) + 4:.1f}" class="ptlabel">{html.escape(best[0])}</text>'
        )
    out.append("</svg>")
    return "\n".join(out)


def main() -> None:
    rows = _rows()
    xray_dev, corpus_dev = _device_points(rows)
    host = _host_points()
    ref_xray = [(f"ref mt B{b} (32T)", r, s, False) for b, r, s in REF_MT_XRAY]
    ref_1t = [(f"ref {n} (1T)", r, s, False) for n, r, s in REF_1T]
    legend = (
        f'<span class="key"><i style="background:{S1}"></i>hsrans_tpu — TPU v5e device</span>'
        f'<span class="key"><i style="background:{S3}"></i>hsrans_tpu — host native (same-core)</span>'
        f'<span class="key"><i style="background:{S2}"></i>reference hypersonic-rANS (7950X, README)</span>'
    )
    p1 = _panel("x-ray: mt independent-blocks decode", [
        ("ours", S1, xray_dev), ("ref", S2, ref_xray),
    ])
    p2 = _panel("mixed corpus / text: decode", [
        ("ours", S1, corpus_dev), ("ours-host", S3, host), ("ref", S2, ref_1t),
    ])
    table = ["<table><tr><th>point</th><th>ratio %</th><th>decode MiB/s</th></tr>"]
    for label, ratio, mib, dim in xray_dev + corpus_dev + host + ref_xray + ref_1t:
        note = " (carried)" if dim else ""
        table.append(f"<tr><td>{html.escape(label)}{note}</td><td>{ratio:.2f}</td><td>{mib:,.0f}</td></tr>")
    table.append("</table>")
    page = f"""<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>hsrans_tpu — speed vs ratio</title>
<style>
  .viz-root {{
    color-scheme: light;
    --surface-1: #fcfcfb; --text-primary: #0b0b0b; --text-secondary: #52514e;
    background: var(--surface-1); color: var(--text-primary);
    font: 14px/1.45 system-ui, sans-serif; padding: 24px; max-width: 1220px; margin: auto;
  }}
  @media (prefers-color-scheme: dark) {{
    :root:where(:not([data-theme="light"])) .viz-root {{
      color-scheme: dark;
      --surface-1: #1a1a19; --text-primary: #ffffff; --text-secondary: #c3c2b7;
    }}
  }}
  .grid {{ stroke: color-mix(in oklab, var(--text-secondary) 18%, transparent); stroke-width: 1; }}
  .tick, .axis, .ptlabel {{ fill: var(--text-secondary); font: 11px system-ui, sans-serif; }}
  .title {{ fill: var(--text-primary); font: 600 13px system-ui, sans-serif; }}
  .panels {{ display: flex; flex-wrap: wrap; gap: 16px; }}
  .key {{ margin-right: 18px; color: var(--text-secondary); }}
  .key i {{ display: inline-block; width: 10px; height: 10px; border-radius: 5px; margin-right: 6px; }}
  table {{ border-collapse: collapse; margin-top: 20px; }}
  td, th {{ border: 1px solid color-mix(in oklab, var(--text-secondary) 30%, transparent);
            padding: 3px 10px; text-align: right; }}
  td:first-child, th:first-child {{ text-align: left; }}
</style></head>
<body class="viz-root">
<h1>hsrans_tpu — decode speed vs compression ratio</h1>
<p>Every blue/aqua point traces to a committed row in BENCH_DETAIL.json /
BENCH_REF.json; orange points quote the reference README (AMD 7950X).
Dimmed points are carried forward from a prior run, not measured in the
latest one. Hover a point for its exact values.</p>
<p>{legend}</p>
<div class="panels">{p1}{p2}</div>
<details><summary>Table view (all plotted points)</summary>{"".join(table)}</details>
</body></html>
"""
    out = os.path.join(REPO, "docs", "pareto.html")
    with open(out, "w") as f:
        f.write(page)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
