"""Standalone DiT sampling entry (reference: ``osu_diffusion/sample.py``).

Sample fresh hit-object coordinates for an existing beatmap from pure noise
with a trained DiT bundle, write the result as new ``.osu`` difficulties:

    python diffusion_sample.py --beatmap map.osu --ckpt diffusion_checkpoints/final \\
        [--style-id 2592760] [--cfg-scale 1.5] [--num-sampling-steps 250] \\
        [--num-variants 3] [--refine-ckpt ...] [--plot-time 20000]

Mirrors the reference harness: banded attention over the (optionally
time-trimmed) sequence, CFG dual batch against the null class, an optional
refine-model loop of ``p_sample`` at t=0, and a scatter plot of a time
window. One deliberate deviation: the reference requests style variants as
consecutive class ids (sample.py:88-91, an artifact of its id-embedding DiT);
our DiT conditions on one-hot class vectors, so variants differ by noise
seed instead.
"""

from __future__ import annotations

import argparse
import re
import sys
import warnings
from pathlib import Path

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

CLEAN_FILENAME_RX = re.compile(r"[/\\?%*:|\"<>\x7F\x00-\x1F]")


def load_bundle(ckpt_path):
    """(model, params) from a diffusion_train.py bundle directory."""
    from inference import load_diffusion_model

    bundle = load_diffusion_model(ckpt_path)
    if bundle is None:
        raise FileNotFoundError(f"no DiT bundle at {ckpt_path!r} (need dit_config.json + params.msgpack)")
    return bundle


def main(args) -> list:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.diffusion import create_diffusion
    from mapperatorinator_tpu.diffusion.data import (
        PLAYFIELD,
        beatmap_to_sequence,
        get_class_vector,
        split_and_process_sequence,
    )
    from mapperatorinator_tpu.diffusion.export import sequence_to_beatmap
    from mapperatorinator_tpu.diffusion.vocab import DiffusionVocab
    from mapperatorinator_tpu.models.dit import DiT, banded_attention_mask
    from mapperatorinator_tpu.osu.beatmap import Beatmap

    beatmap = Beatmap.from_path(args.beatmap)
    filename = CLEAN_FILENAME_RX.sub("-", f"{beatmap.beatmap_id} {beatmap.artist} - {beatmap.title}")
    result_dir = Path(args.output_dir) / filename
    result_dir.mkdir(parents=True, exist_ok=True)

    seq = beatmap_to_sequence(beatmap)  # (19, T) absolute times
    if seq.shape[1] == 0:
        raise ValueError(f"{args.beatmap} has no supported hit objects")
    if args.plot_time is not None:
        start = int(np.argmax(seq[2] >= args.plot_time))
        seq = seq[:, start : start + args.seq_len]
        print(f"Sequence trimmed to length {seq.shape[1]}")

    # context from window-relative times (reference: sample.py:61), export
    # keeps the absolute times
    seq_rel = seq.copy()
    seq_rel[2] = seq_rel[2] - seq_rel[2][0]
    (seq_x, seq_c), seq_len = split_and_process_sequence(seq_rel, augment=False)
    print(f"seq len {seq_len}")

    model, params = load_bundle(args.ckpt)
    dcfg = compose(REPO_ROOT / "configs" / "diffusion", args.config_name,
                   schema_cls=schema.DiffusionTrainConfig)
    if args.vocab and Path(args.vocab).exists():
        vocab = DiffusionVocab.from_pretrained(args.vocab)
    else:
        vocab = DiffusionVocab.from_args(dcfg)
    class_size = model.config.class_size
    assert vocab.num_tokens == class_size, (
        f"vocab {vocab.num_tokens} classes != checkpoint class_size {class_size} "
        f"(compose the config the model was trained with via --config-name)")

    diffusion = create_diffusion(
        timestep_respacing=[args.num_sampling_steps],
        noise_schedule="squaredcos_cap_v2",
    )

    n = args.num_variants
    cond_vec = get_class_vector(
        vocab, args.style_id, args.difficulty, None, None, beatmap.circle_size)
    null_vec = get_class_vector(vocab, None, None, None, None, None)

    rng = jax.random.PRNGKey(args.seed)
    rng, sub = jax.random.split(rng)
    z = jax.random.normal(sub, (n, seq_len, 2), jnp.float32)

    # CFG dual batch: [cond; null] rows sharing the same noise half
    z2 = jnp.concatenate([z, z], axis=0)
    c = jnp.asarray(np.repeat(seq_c.T[None], 2 * n, axis=0))
    y = jnp.asarray(np.stack([cond_vec] * n + [null_vec] * n, axis=0))
    attn_mask = banded_attention_mask(seq_len, args.seq_len)

    def model_fn(x, t):
        return model.apply(params, x, t, c, y, args.cfg_scale, attn_mask,
                           method=DiT.forward_with_cfg)

    def to_sequences(x) -> list:
        """Sampled (2n, T, 2) -> n full (19, T) sequences with absolute times."""
        positions = np.asarray(x)[:n]  # cond half
        out = []
        for i in range(n):
            s = seq.copy()
            s[0:2] = ((positions[i].T + 1) / 2) * PLAYFIELD[:, None]
            out.append(s)
        return out

    def save_sequences(seqs, suffix="") -> list:
        paths = []
        for idx, s in enumerate(seqs):
            version = f"Diffusion {args.style_id} {idx}{suffix}"
            new_beatmap = sequence_to_beatmap(s, beatmap, version)
            out_path = result_dir / f"{beatmap.beatmap_id} result {args.style_id} {idx}{suffix}.osu"
            out_path.write_text(new_beatmap.to_string(), encoding="utf-8")
            paths.append(out_path)
            print(f"wrote {out_path}")
            if args.plot_time is not None:
                _plot(new_beatmap, result_dir / f"plot {idx}{suffix}.png",
                      args.plot_time, args.plot_width)
        return paths

    print(f"Sampling {n} variant(s), {args.num_sampling_steps} steps, cfg={args.cfg_scale}")
    rng, sub = jax.random.split(rng)
    samples = diffusion.p_sample_loop(model_fn, rng=sub, noise=z2, clip_denoised=True)
    paths = save_sequences(to_sequences(samples))

    if args.refine_ckpt:
        refine_model, refine_params = load_bundle(args.refine_ckpt)

        def refine_fn(x, t):
            return refine_model.apply(refine_params, x, t, c, y, args.cfg_scale,
                                      attn_mask, method=DiT.forward_with_cfg)

        img = samples
        for _ in range(args.refine_iters):
            rng, sub = jax.random.split(rng)
            t = jnp.zeros((img.shape[0],), jnp.int32)
            img = diffusion.p_sample(refine_fn, img, t, sub, clip_denoised=True)["sample"]
        paths += save_sequences(to_sequences(img), suffix=f" refined{args.refine_iters}")

    return paths


def _plot(beatmap, out_path, plot_time: float, plot_width: float) -> None:
    """Scatter the objects within [plot_time, plot_time + plot_width] ms."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plot")
        return
    fig, ax = plt.subplots()
    for ho in beatmap.hit_objects():
        if plot_time <= ho.time <= plot_time + plot_width:
            ax.plot(ho.x, ho.y, "o")
    ax.axis("equal")
    ax.set_xlim([0, 512])
    ax.set_ylim([384, 0])
    fig.savefig(out_path)
    plt.close(fig)
    print(f"wrote {out_path}")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--beatmap", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True,
                        help="diffusion_train.py bundle dir (dit_config.json + params.msgpack)")
    parser.add_argument("--config-name", type=str, default="v1",
                        help="configs/diffusion/<name>.yaml the model was trained with")
    parser.add_argument("--vocab", type=str, default="",
                        help="optional serialized DiffusionVocab (style/mapper lookup tables)")
    parser.add_argument("--cfg-scale", type=float, default=1.0)
    parser.add_argument("--num-sampling-steps", type=int, default=250)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--seq-len", type=int, default=128, help="banded attention width")
    parser.add_argument("--style-id", type=int, default=None)
    parser.add_argument("--difficulty", type=float, default=None)
    parser.add_argument("--plot-time", type=float, default=None)
    parser.add_argument("--plot-width", type=float, default=2000)
    parser.add_argument("--num-variants", type=int, default=1)
    parser.add_argument("--refine-ckpt", type=str, default=None)
    parser.add_argument("--refine-iters", type=int, default=10)
    parser.add_argument("--output-dir", type=str, default="results")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
