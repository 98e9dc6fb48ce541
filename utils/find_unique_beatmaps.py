"""Rank beatmaps by style distance from a mapper's body of work (reference:
``osu_diffusion/testing/find_unique_beatmaps.py`` — mean cdist from the
mapper's embedding rows, largest first). The mapper's maps come from the
``create_beatmap_dataframe`` table's Creator column.

Usage::

    python utils/find_unique_beatmaps.py --ckpt diffusion_checkpoints/final \
        --metadata beatmap_df.parquet --creator Sotarks [-k 10]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "utils"))


def rank_by_mean_distance(embeddings, query_rows, k: int = 10, farthest: bool = True):
    import numpy as np

    query = embeddings[query_rows]                      # (Q, H)
    dist = np.linalg.norm(embeddings[:, None] - query[None], axis=-1).mean(1)
    order = np.argsort(dist)
    if farthest:
        order = order[::-1]
    return [(int(i), float(dist[i])) for i in order[:k]]


def run(args) -> list:
    import pandas as pd

    from plot_embeddings import load_style_embeddings

    emb = load_style_embeddings(args.ckpt, args.num_classes, args.vocab)
    table = Path(args.metadata)
    df = pd.read_parquet(table) if table.suffix == ".parquet" else pd.read_csv(table)
    maps = df[df["Creator"] == args.creator]
    rows = [i for i in maps.index if 0 <= i < len(emb)]
    if not rows:
        raise ValueError(f"no beatmaps by {args.creator!r} within the embedding table")
    print(f"Found {len(rows)} beatmaps by {args.creator}.")

    results = rank_by_mean_distance(emb, rows, args.k, farthest=not args.nearest)
    for i, d in results:
        row = df.iloc[i] if i < len(df) else {}
        print(f"{d:.4f}  {row.get('Title', '?')} [{row.get('BeatmapName', '?')}] "
              f"{row.get('BeatmapID', '?')}")
    return results


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--metadata", type=str, required=True)
    p.add_argument("--creator", type=str, required=True)
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("-k", type=int, default=10)
    p.add_argument("--nearest", action="store_true",
                   help="rank nearest instead of farthest (most typical maps)")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_args())
