"""Nearest style-embedding neighbors of a beatmap (reference:
``osu_diffusion/testing/find_similar_beatmaps.py`` — cdist over the
checkpoint's ``y_embedder`` table from a query beatmap id). Annotates
results from a ``create_beatmap_dataframe`` table when given.

Usage::

    python utils/find_similar_beatmaps.py --ckpt diffusion_checkpoints/final \
        (--idx N | --beatmap-id ID --vocab tokenizer.json) \
        [--metadata beatmap_df.parquet] [-k 10] [--num-classes N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "utils"))


def nearest(embeddings, idx: int, k: int = 10):
    import numpy as np

    query = embeddings[idx]
    dist = np.linalg.norm(embeddings - query[None], axis=1)
    order = np.argsort(dist)
    return [(int(i), float(dist[i])) for i in order[: k + 1] if i != idx][:k]


def run(args) -> list:
    from plot_embeddings import load_style_embeddings

    emb = load_style_embeddings(args.ckpt, args.num_classes, args.vocab)
    idx = args.idx
    if idx is None:
        if args.beatmap_id is None or not args.vocab:
            raise ValueError("pass --idx, or --beatmap-id together with --vocab")
        from mapperatorinator_tpu.diffusion.vocab import DiffusionVocab

        idx = DiffusionVocab.from_pretrained(args.vocab).beatmap_idx[args.beatmap_id]

    titles = {}
    if args.metadata:
        import pandas as pd

        table = Path(args.metadata)
        df = pd.read_parquet(table) if table.suffix == ".parquet" else pd.read_csv(table)
        titles = {i: f"{r.get('Title', '?')} [{r.get('BeatmapName', r.get('Version', '?'))}]"
                  for i, r in df.iterrows()}

    results = nearest(emb, idx, args.k)
    for i, d in results:
        print(f"{i:6d}  dist={d:.4f}  {titles.get(i, '')}")
    return results


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--idx", type=int, default=None, help="style-class index to query")
    p.add_argument("--beatmap-id", type=int, default=None)
    p.add_argument("--vocab", type=str, default=None)
    p.add_argument("--metadata", type=str, default=None)
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("-k", type=int, default=10)
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_args())
