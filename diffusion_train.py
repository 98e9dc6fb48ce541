"""osu-diffusion DiT training entry (reference: ``osu_diffusion/train.py:90-255``).

    python diffusion_train.py -cn v1 [overrides...]

Trains the DiT coordinate model with uniform timestep sampling capped at
``max_diffusion_step`` (refine models) and an EMA copy updated each step.
"""

from __future__ import annotations

import sys
import warnings
from pathlib import Path

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))


def make_diffusion_train_step(model, diffusion, tx, ema_decay: float = 0.9999, max_t: int = 1000,
                              sampler=None):
    """Build the jitted DiT train step.

    ``sampler=None`` (or a "uniform" sampler) reproduces the reference's
    plain capped-uniform timestep draw (osu_diffusion/train.py:192). A
    "loss-second-moment" sampler importance-resamples timesteps and
    reweights the per-sample losses, with its ring-buffer history updated
    inside the same compiled step (see diffusion/schedule_sampler.py).
    The step carries ``sampler_state`` through in both modes ({} when
    uniform) so callers are mode-agnostic.
    """
    import jax
    import jax.numpy as jnp
    import optax

    loss_aware = sampler is not None and sampler.name != "uniform"

    def loss_fn(params, batch, rng, sampler_state):
        rng_t, rng_noise = jax.random.split(rng)
        n = batch["x"].shape[0]
        if loss_aware:
            t, iw = sampler.sample(sampler_state, rng_t, n)
        else:
            t = jax.random.randint(rng_t, (n,), 0, max_t)
            iw = jnp.ones((n,), jnp.float32)

        def model_fn(x, tt):
            return model.apply(params, x, tt, batch["c"], batch["y"])

        terms = diffusion.training_losses(model_fn, batch["x"], t, rng_noise)
        per_sample = terms["loss"]
        return (per_sample * iw).mean(), (t, per_sample)

    @jax.jit
    def step(params, ema_params, opt_state, batch, rng, sampler_state):
        (loss, (t, per_sample)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng, sampler_state)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = jax.tree.map(lambda e, p: e * ema_decay + p * (1 - ema_decay), ema_params, params)
        if loss_aware:
            sampler_state = sampler.update(sampler_state, t, jax.lax.stop_gradient(per_sample))
        return params, ema_params, opt_state, loss, sampler_state

    return step


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.diffusion import create_diffusion
    from mapperatorinator_tpu.models.dit import DiT, DiTConfig
    from mapperatorinator_tpu.train.loop import CheckpointManager, MetricsLogger
    from mapperatorinator_tpu.train.optim import build_schedule

    import optax

    argv = sys.argv[1:] if argv is None else argv
    config_name = "v1"
    overrides = []
    i = 0
    while i < len(argv):
        if argv[i] in ("-cn", "--config-name"):
            config_name = argv[i + 1]
            i += 2
        else:
            overrides.append(argv[i])
            i += 1

    args = compose(REPO_ROOT / "configs" / "diffusion", config_name, overrides=overrides,
                   schema_cls=schema.DiffusionTrainConfig)

    diffusion = create_diffusion(
        timestep_respacing="",
        noise_schedule=args.model.noise_schedule,
        diffusion_steps=args.model.diffusion_steps,
        use_l1=args.model.l1_loss,
    )

    from mapperatorinator_tpu.diffusion.data import DiffusionDataset
    from mapperatorinator_tpu.diffusion.vocab import DiffusionVocab
    from mapperatorinator_tpu.train.data.batching import batch_iterator

    vocab = DiffusionVocab.from_args(args)
    cfg = DiTConfig.from_name(args.model.model, context_size=args.model.context_size, class_size=vocab.num_tokens)
    model = DiT(cfg)

    seq_len = args.data.seq_len
    rng = jax.random.PRNGKey(args.seed)
    params = jax.jit(model.init)(
        rng,
        jnp.zeros((1, seq_len, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, seq_len, cfg.context_size)),
        jnp.zeros((1, vocab.num_tokens)),
    )
    ema_params = jax.tree.map(lambda x: x, params)

    schedule = build_schedule(args.optim)
    tx = optax.chain(optax.clip_by_global_norm(args.optim.grad_clip),
                     optax.adamw(schedule, weight_decay=args.optim.weight_decay))
    opt_state = jax.jit(tx.init)(params)

    from mapperatorinator_tpu.diffusion.schedule_sampler import make_schedule_sampler

    sampler = make_schedule_sampler(
        getattr(args.model, "schedule_sampler", "uniform") or "uniform",
        num_timesteps=args.model.diffusion_steps,
        max_timestep=args.model.max_diffusion_step,
    )
    sampler_state = sampler.init()
    step_fn = make_diffusion_train_step(model, diffusion, tx,
                                        max_t=args.model.max_diffusion_step, sampler=sampler)
    checkpoints = CheckpointManager(Path(args.checkpoint_path or "diffusion_checkpoints"))
    logger = MetricsLogger("logs/diffusion", log_with=args.logging.log_with)

    def make_batches():
        dataset = DiffusionDataset(args.data, vocab)
        return batch_iterator(dataset, args.optim.batch_size, drop_last=True)

    step = 0
    rng = jax.random.PRNGKey(args.seed + 1)
    while step < args.optim.total_steps:
        progressed = False
        for batch in make_batches():
            if step >= args.optim.total_steps:
                break
            progressed = True
            rng, sub = jax.random.split(rng)
            batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
            params, ema_params, opt_state, loss, sampler_state = step_fn(
                params, ema_params, opt_state, batch_j, sub, sampler_state)
            step += 1
            if step % args.logging.every_steps == 0:
                logger.log({"train/loss": float(loss)}, step)
            if step % args.checkpoint.every_steps == 0:
                checkpoints.save(step, {"params": params, "ema": ema_params})
        if not progressed:
            break
    checkpoints.save(step, {"params": params, "ema": ema_params})
    # portable bundle consumed by inference.py's generate_positions path
    import dataclasses
    import json

    import flax

    final_dir = Path(args.checkpoint_path or "diffusion_checkpoints") / "final"
    final_dir.mkdir(parents=True, exist_ok=True)
    with open(final_dir / "params.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(ema_params))  # EMA weights for sampling
    with open(final_dir / "dit_config.json", "w", encoding="utf-8") as f:
        json.dump({k: (v if not isinstance(v, type) else str(v)) for k, v in dataclasses.asdict(cfg).items()
                   if k != "dtype"}, f)
    print(f"Saved final diffusion model to {final_dir}")
    logger.close()
    return params, ema_params


if __name__ == "__main__":
    main()
