"""2-D visualization of a DiT checkpoint's learned per-beatmap style
embeddings (reference: ``osu_diffusion/testing/plot_embeddings.py`` — t-SNE
of ``y_embedder.embedding_table.weight`` annotated from a beatmap
dataframe). The current model embeds a one-hot CLASS VECTOR through an MLP
(models/dit.py LabelEmbedder), so the per-beatmap table is the beatmap-style
block — input rows ``[0, num_classes)`` — of the first Dense kernel.

Usage::

    python utils/plot_embeddings.py --ckpt diffusion_checkpoints/final \
        [--vocab tokenizer.json | --num-classes N] \
        [--metadata beatmaps.parquet --title-col Title] \
        [--method tsne|pca] [--out embeddings.png] [--annotate 20]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def load_style_embeddings(ckpt: str, num_classes: int | None = None, vocab_path: str | None = None):
    """(num_classes, hidden) float32 rows of the y_embedder fc1 kernel."""
    import flax
    import numpy as np

    path = Path(ckpt)
    with open(path / "params.msgpack", "rb") as f:
        tree = flax.serialization.msgpack_restore(f.read())
    params = tree.get("params", tree)
    kernel = np.asarray(params["y_embedder"]["fc1"]["kernel"])  # (class_size, hidden)

    if vocab_path:
        from mapperatorinator_tpu.diffusion.vocab import DiffusionVocab

        num_classes = DiffusionVocab.from_pretrained(vocab_path).num_classes
    if not num_classes:
        num_classes = kernel.shape[0]  # whole class vector when unspecified
    return kernel[:num_classes]


def reduce_2d(embeddings, method: str = "tsne", seed: int = 1):
    import numpy as np

    if method == "tsne":
        try:
            from sklearn.manifold import TSNE

            perplexity = min(30.0, max(2.0, embeddings.shape[0] / 4))
            return TSNE(n_components=2, random_state=seed, init="pca",
                        perplexity=perplexity).fit_transform(embeddings)
        except ImportError:
            print("sklearn unavailable; falling back to PCA")
    centered = embeddings - embeddings.mean(0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    return centered @ vt[:2].T


def run(args) -> Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    emb = load_style_embeddings(args.ckpt, args.num_classes, args.vocab)
    pts = reduce_2d(emb, args.method, args.seed)

    fig, ax = plt.subplots(figsize=(13, 9))
    ax.scatter(pts[:, 0], pts[:, 1], alpha=max(0.02, min(1.0, 2000 / len(pts))), s=6)
    ax.set_title(f"DiT style embeddings ({len(pts)} classes, {args.method})")

    if args.metadata:
        import pandas as pd

        table = Path(args.metadata)
        df = pd.read_parquet(table) if table.suffix == ".parquet" else pd.read_csv(table)
        n = min(args.annotate, len(df), len(pts))
        sample = df.sample(n, random_state=args.seed) if len(df) > n else df
        for idx, row in sample.iterrows():
            if 0 <= idx < len(pts):
                ax.annotate(str(row.get(args.title_col, idx))[:30], pts[idx],
                            fontsize=7, alpha=0.8)

    out = Path(args.out)
    fig.savefig(out, dpi=150, bbox_inches="tight")
    plt.close(fig)
    print(f"saved {out} ({len(pts)} embeddings)")
    return out


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--vocab", type=str, default=None, help="DiffusionVocab json (sets num_classes)")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--metadata", type=str, default=None, help="parquet/csv with per-idx labels")
    p.add_argument("--title-col", type=str, default="Title")
    p.add_argument("--annotate", type=int, default=20)
    p.add_argument("--method", choices=["tsne", "pca"], default="tsne")
    p.add_argument("--out", type=str, default="embeddings.png")
    p.add_argument("--seed", type=int, default=1)
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_args())
