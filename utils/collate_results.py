"""Collate calc_fid result JSONs into one comparison table
(reference: ``utils/collate_results.py`` renders an HTML report; this
version emits both a markdown table and a color-coded HTML file).

    python utils/collate_results.py results/*.json [-o report.html]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

# metric -> lower is better?
LOWER_IS_BETTER = {"fid": True, "bpm_mse": True}


def get_color_for_value(value, min_val, max_val, lower_is_better=False) -> str:
    if min_val == max_val:
        return "hsl(120, 70%, 60%)"
    normalized = max(0.0, min(1.0, (value - min_val) / (max_val - min_val)))
    hue = (1 - normalized) * 120 if lower_is_better else normalized * 120
    return f"hsl({hue:.0f}, 70%, 60%)"


def collate(paths: list[Path]) -> tuple[list[str], dict[str, dict]]:
    rows = {}
    metrics: list[str] = []
    for p in paths:
        with open(p, encoding="utf-8") as f:
            data = json.load(f)
        rows[p.stem] = data
        for k in data:
            if k not in metrics:
                metrics.append(k)
    return metrics, rows


def markdown_table(metrics, rows) -> str:
    lines = ["| run | " + " | ".join(metrics) + " |", "|---" * (len(metrics) + 1) + "|"]
    for name, data in rows.items():
        cells = [f"{data[m]:.4f}" if isinstance(data.get(m), float) else str(data.get(m, "")) for m in metrics]
        lines.append(f"| {name} | " + " | ".join(cells) + " |")
    return "\n".join(lines)


def html_report(metrics, rows) -> str:
    bounds = {}
    for m in metrics:
        values = [r[m] for r in rows.values() if isinstance(r.get(m), (int, float))]
        if values:
            bounds[m] = (min(values), max(values))
    body = ["<table border=1 cellpadding=4><tr><th>run</th>"]
    body += [f"<th>{m}</th>" for m in metrics]
    body.append("</tr>")
    for name, data in rows.items():
        body.append(f"<tr><td>{name}</td>")
        for m in metrics:
            v = data.get(m)
            if isinstance(v, (int, float)) and m in bounds:
                color = get_color_for_value(v, *bounds[m], LOWER_IS_BETTER.get(m, False))
                body.append(f'<td style="background:{color}">{v:.4f}</td>')
            else:
                body.append(f"<td>{v if v is not None else ''}</td>")
        body.append("</tr>")
    body.append("</table>")
    return "<html><body>" + "".join(body) + "</body></html>"


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    out = None
    if "-o" in argv:
        i = argv.index("-o")
        out = Path(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    paths = [Path(a) for a in argv]
    metrics, rows = collate(paths)
    print(markdown_table(metrics, rows))
    if out:
        out.write_text(html_report(metrics, rows))
        print(f"wrote {out}")
    return metrics, rows


if __name__ == "__main__":
    main()
