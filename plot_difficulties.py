"""Star-rating histogram over a dataset (reference: ``osuT5/
plot_difficulties.py``), computed with the native difficulty calculator.

    python plot_difficulties.py dataset_path [start] [end] [-o difficulties.png]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))


def main(argv=None):
    import numpy as np

    from mapperatorinator_tpu.native import calculate_difficulty

    argv = sys.argv[1:] if argv is None else argv
    out = None
    if "-o" in argv:
        i = argv.index("-o")
        out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    root = Path(argv[0])
    start = int(argv[1]) if len(argv) > 1 else 0
    end = int(argv[2]) if len(argv) > 2 else start + 100

    stars = []
    for i in range(start, end):
        beatmaps = root / f"Track{i:05d}" / "beatmaps"
        if not beatmaps.is_dir():
            continue
        for p in sorted(beatmaps.glob("*.osu")):
            s = calculate_difficulty(path=p)
            if s is not None:
                stars.append(s)
    if not stars:
        print("no beatmaps found")
        return []
    stars_arr = np.array(stars)
    print(f"{len(stars)} beatmaps: min {stars_arr.min():.2f} median {np.median(stars_arr):.2f} "
          f"mean {stars_arr.mean():.2f} max {stars_arr.max():.2f}")
    hist, edges = np.histogram(stars_arr, bins=20)
    for h, e in zip(hist, edges):
        print(f"{e:5.2f}* {'#' * int(50 * h / max(hist.max(), 1))}")
    if out:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        plt.hist(stars_arr, bins=40)
        plt.xlabel("star rating")
        plt.ylabel("beatmaps")
        plt.savefig(out)
        print(f"wrote {out}")
    return stars


if __name__ == "__main__":
    main()
