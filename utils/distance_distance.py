"""Distance-delta comparison between a reference beatmap and generated
variants (reference: ``osu_diffusion/testing/distance_distance.py`` — per-map
MSE/MAE of consecutive-object distances plus a delta histogram). Accepts a
single ``.osu`` or a directory of them; saves the histogram instead of
``plt.show`` (headless image).

Usage::

    python utils/distance_distance.py --ref-beatmap original.osu \
        --beatmap generated_dir_or_file [--out-dir plots/]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def compare(ref_path: str, gen_path: str) -> dict | None:
    import numpy as np

    from mapperatorinator_tpu.diffusion.data import beatmap_to_sequence, calc_distances
    from mapperatorinator_tpu.osu.beatmap import Beatmap

    ref_d = calc_distances(beatmap_to_sequence(Beatmap.from_path(ref_path)))
    beatmap = Beatmap.from_path(gen_path)
    gen_d = calc_distances(beatmap_to_sequence(beatmap))
    if len(gen_d) != len(ref_d):
        return None  # reference semantics: silently skip length mismatches
    delta = ref_d - gen_d
    return {
        "name": beatmap.version or Path(gen_path).stem,
        "mse": float(np.mean(np.square(delta))),
        "mae": float(np.mean(np.abs(delta))),
        "delta": delta,
    }


def run(args) -> list:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    target = Path(args.beatmap)
    paths = sorted(target.glob("*.osu")) if target.is_dir() else [target]
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    results = []
    for path in paths:
        r = compare(args.ref_beatmap, str(path))
        if r is None:
            print(f"{path.name}: length mismatch, skipped")
            continue
        print(f"{r['name']}: MSE = {r['mse']:.3f}, MAE = {r['mae']:.3f}")
        fig, ax = plt.subplots()
        ax.hist(r["delta"], bins=np.linspace(-20, 20, 42), alpha=0.75,
                color="b", edgecolor="k")
        ax.set_xlabel("Distance")
        ax.set_ylabel("Frequency")
        ax.set_title(f"Distance similarity gen. beatmap [{r['name']}]")
        ax.grid(True)
        out = out_dir / f"distance_{path.stem}.png"
        fig.savefig(out, dpi=120, bbox_inches="tight")
        plt.close(fig)
        r["plot"] = str(out)
        results.append(r)
    return results


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ref-beatmap", type=str, required=True)
    p.add_argument("--beatmap", type=str, required=True, help=".osu file or directory of them")
    p.add_argument("--out-dir", type=str, default=".")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_args())
