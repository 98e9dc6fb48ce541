"""DiT toy-pattern probe: in-paint the LAST hit-object position and compare
against the ground truth (reference: ``osu_diffusion/testing/test_toy.py`` —
its ``generate_predictions`` noises only the final sequence step, runs
``p_sample_loop`` with an in-paint ``denoised_fn``, and scores the predicted
position). TPU-native differences: time-major (N, T, 2) layout, the in-paint
closure rides inside the jitted ``lax.scan`` sampling loop, and the toy
fixture is this repo's own committed pattern map
(``utils/toy_datasets/square_jumps.osu``).

Usage::

    python utils/dit_test_toy.py --ckpt diffusion_checkpoints/final \
        [--toy PATH.osu | --toy-dir utils/toy_datasets] \
        [--num-predictions 16] [--num-sampling-steps 100] [--seed 0]

Without ``--ckpt`` a randomly initialized DiT-B is used (smoke mode: proves
the harness end to end; the error statistic is meaningless there).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def predict_last_position(model, params, beatmap, *, num_predictions=16,
                          num_sampling_steps=100, cfg_scale=1.0, seed=0):
    """Returns (predictions (N, 2) in playfield px, actual (2,) px)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mapperatorinator_tpu.diffusion import create_diffusion
    from mapperatorinator_tpu.diffusion.data import (
        PLAYFIELD,
        beatmap_to_sequence,
        split_and_process_sequence,
    )
    from mapperatorinator_tpu.models.dit import banded_attention_mask

    seq = beatmap_to_sequence(beatmap)
    if seq.shape[1] < 2:
        raise ValueError("toy beatmap needs at least 2 objects")
    actual = seq[0:2, -1].copy()

    seq_rel = seq.copy()
    seq_rel[2] = seq_rel[2] - seq_rel[2][0]
    (seq_x, seq_c), seq_len = split_and_process_sequence(seq_rel, augment=False)

    diffusion = create_diffusion(
        timestep_respacing=[num_sampling_steps], noise_schedule="squaredcos_cap_v2"
    )

    n = num_predictions
    x_true = jnp.asarray(np.repeat(seq_x.T[None], n, axis=0))   # (N, T, 2)
    c = jnp.asarray(np.repeat(seq_c.T[None], n, axis=0))
    y = jnp.zeros((n, model.config.class_size), jnp.float32)    # null class
    attn_mask = banded_attention_mask(seq_len, 128) if seq_len > 128 else None

    # in-paint mask: every position is ground truth except the final step
    mask = jnp.zeros((n, seq_len, 2), bool).at[:, -1, :].set(True)

    def in_paint(x, rng=None):
        return jnp.where(mask, x, x_true)

    def model_fn(x, t):
        return model.apply(params, x, t, c, y, attn_mask)

    rng = jax.random.PRNGKey(seed)
    rng, sub = jax.random.split(rng)
    z = in_paint(jax.random.normal(sub, (n, seq_len, 2), jnp.float32))
    samples = diffusion.p_sample_loop(
        model_fn, noise=z, rng=rng, clip_denoised=True, denoised_fn=in_paint
    )
    preds = (np.asarray(samples[:, -1, :]) + 1) / 2 * np.asarray(PLAYFIELD)
    return preds, actual


def run(args) -> list:
    import numpy as np

    from mapperatorinator_tpu.osu.beatmap import Beatmap

    if args.ckpt:
        from inference import load_diffusion_model

        bundle = load_diffusion_model(args.ckpt)
        if bundle is None:
            raise FileNotFoundError(f"no DiT bundle at {args.ckpt!r}")
        model, params = bundle
    else:
        import jax
        import jax.numpy as jnp

        from mapperatorinator_tpu.models.dit import DiT, DiTConfig

        print("no --ckpt: random DiT (smoke mode, errors are meaningless)")
        cfg = DiTConfig(hidden_size=args.smoke_hidden, depth=2, num_heads=2, class_size=8)
        model = DiT(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 4, cfg.context_size)), jnp.zeros((1, cfg.class_size)),
        )

    paths = [Path(args.toy)] if args.toy else sorted(Path(args.toy_dir).glob("*.osu"))
    if not paths:
        raise FileNotFoundError(f"no .osu toys under {args.toy_dir}")

    results = []
    for path in paths:
        beatmap = Beatmap.from_path(path)
        preds, actual = predict_last_position(
            model, params, beatmap,
            num_predictions=args.num_predictions,
            num_sampling_steps=args.num_sampling_steps,
            seed=args.seed,
        )
        err = np.linalg.norm(preds - actual[None], axis=-1)
        results.append({
            "toy": path.name,
            "actual": [round(float(v), 1) for v in actual],
            "mean_pred": [round(float(v), 1) for v in preds.mean(0)],
            "mean_err_px": round(float(err.mean()), 1),
            "median_err_px": round(float(np.median(err)), 1),
        })
        print(results[-1])
    return results


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", type=str, default=None, help="DiT bundle dir (dit_config.json + params.msgpack)")
    p.add_argument("--toy", type=str, default=None, help="one toy .osu (overrides --toy-dir)")
    p.add_argument("--toy-dir", type=str, default=str(REPO_ROOT / "utils" / "toy_datasets"))
    p.add_argument("--num-predictions", type=int, default=16)
    p.add_argument("--num-sampling-steps", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke-hidden", type=int, default=64, help="hidden size of the random smoke-mode DiT")
    return p.parse_args(argv)


if __name__ == "__main__":
    run(parse_args())
