"""Loss-curve plots from training metrics.

Equivalent of the reference's loss-plot harness
(``osu_diffusion/testing/plot_loss.py:1-47``), which parses accelerate
``log.txt`` files; here the train loop's ``metrics.jsonl`` (written by
``MetricsLogger``) is the source. Multiple runs overlay on one figure for
A/B comparison, each optionally offset on the step axis (the reference's
per-file start-step feature for resumed runs).

    python utils/plot_loss.py logs/metrics.jsonl [other/metrics.jsonl ...] \
        [--keys train/loss test/loss] [--smooth 25] [--offsets 0 1600] \
        [--out loss.png] [--logy]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def read_series(path, keys=None, offset: int = 0) -> dict:
    """{key: (steps, values)} from one metrics.jsonl. With ``keys=None``
    every metric whose name ends in "loss" is collected."""
    series: dict = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            record = json.loads(line)
            step = record.get("step", 0) + offset
            for key, value in record.items():
                if key == "step":
                    continue
                if keys is not None:
                    if key not in keys:
                        continue
                elif not key.endswith("loss"):
                    continue
                steps, values = series.setdefault(key, ([], []))
                steps.append(step)
                values.append(float(value))
    return series


def smooth(values, window: int):
    """Trailing moving average over up to ``window`` points."""
    if window <= 1:
        return list(values)
    out = []
    acc = 0.0
    for i, v in enumerate(values):
        acc += v
        if i >= window:
            acc -= values[i - window]
        out.append(acc / min(i + 1, window))
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("metrics", nargs="+", help="metrics.jsonl file(s) (MetricsLogger output)")
    parser.add_argument("--keys", nargs="*", default=None,
                        help="metric names to plot (default: every *loss key)")
    parser.add_argument("--smooth", type=int, default=1, help="moving-average window")
    parser.add_argument("--offsets", nargs="*", type=int, default=None,
                        help="per-file step offsets (for resumed-run overlays)")
    parser.add_argument("--out", default="loss.png", help="output image path")
    parser.add_argument("--logy", action="store_true", help="log-scale loss axis")
    args = parser.parse_args(argv)

    offsets = args.offsets or [0] * len(args.metrics)
    if len(offsets) != len(args.metrics):
        parser.error("--offsets must match the number of metrics files")

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    plotted = 0
    for path, offset in zip(args.metrics, offsets):
        label_prefix = f"{Path(path).parent.name or path}: " if len(args.metrics) > 1 else ""
        for key, (steps, values) in sorted(read_series(path, args.keys, offset).items()):
            ax.plot(steps, smooth(values, args.smooth), label=f"{label_prefix}{key}")
            plotted += 1
    if not plotted:
        print("no matching metrics found", file=sys.stderr)
        return 1
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    if args.logy:
        ax.set_yscale("log")
    ax.legend()
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({plotted} series)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
