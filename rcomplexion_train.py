"""Rhythm-complexion model training (reference: ``rcomplexion/train.py:20-91``).

    python rcomplexion_train.py -cn train_v1 [overrides...]

Trains the OsuR next-note-timing MLP whose cross-entropy per drain-second is
the rhythm-complexity measure.
"""

from __future__ import annotations

import sys
import warnings
from pathlib import Path

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.models.classifier import OsuR, OsuRConfig
    from mapperatorinator_tpu.rcomplexion import RcomplexionDataset, RTokenizer
    from mapperatorinator_tpu.train.data.batching import batch_iterator
    from mapperatorinator_tpu.train.loop import CheckpointManager, MetricsLogger
    from mapperatorinator_tpu.train.optim import build_schedule

    argv = sys.argv[1:] if argv is None else argv
    config_name = "train_v1"
    overrides = []
    i = 0
    while i < len(argv):
        if argv[i] in ("-cn", "--config-name"):
            config_name = argv[i + 1]
            i += 2
        else:
            overrides.append(argv[i])
            i += 1

    args = compose(REPO_ROOT / "configs" / "rcomplexion", config_name, overrides=overrides,
                   schema_cls=schema.RcomplexionConfig)

    tokenizer = RTokenizer(args)
    cfg = OsuRConfig(
        vocab_size_in=tokenizer.vocab_size_in,
        vocab_size_out=tokenizer.vocab_size_out,
        src_seq_len=args.data.src_seq_len,
        hidden_size=args.model.hidden_size,
    )
    model = OsuR(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), jnp.zeros((1, args.data.src_seq_len), jnp.int32))

    schedule = build_schedule(args.optim)
    tx = optax.chain(optax.clip_by_global_norm(args.optim.grad_clip),
                     optax.adamw(schedule, weight_decay=args.optim.weight_decay))
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            return model.apply(p, batch["input_ids"], labels=batch["labels"])["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch["input_ids"], labels=batch["labels"])
        acc = (out["logits"].argmax(-1) == batch["labels"]).mean()
        return out["loss"], acc

    checkpoints = CheckpointManager(Path(args.checkpoint_path or "rcomplexion_checkpoints"))
    logger = MetricsLogger("logs/rcomplexion", log_with=args.logging.log_with)

    step = 0
    while step < args.optim.total_steps:
        progressed = False
        dataset = RcomplexionDataset(args, tokenizer)
        for batch in batch_iterator(dataset, args.optim.batch_size, drop_last=True):
            if step >= args.optim.total_steps:
                break
            progressed = True
            batch_j = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss = train_step(params, opt_state, batch_j)
            step += 1
            if step % args.logging.every_steps == 0:
                logger.log({"train/loss": float(loss)}, step)
            if args.eval.every_steps > 0 and step % args.eval.every_steps == 0:
                losses, accs = [], []
                test_ds = RcomplexionDataset(args, tokenizer, test=True)
                for j, test_batch in enumerate(batch_iterator(test_ds, args.optim.batch_size, drop_last=True)):
                    if j >= args.eval.steps:
                        break
                    tb = {k: jnp.asarray(v) for k, v in test_batch.items()}
                    l, a = eval_step(params, tb)
                    losses.append(float(l))
                    accs.append(float(a))
                if losses:
                    logger.log({"val/loss": float(np.mean(losses)), "val/accuracy": float(np.mean(accs))}, step)
            if step % args.checkpoint.every_steps == 0:
                checkpoints.save(step, {"params": params})
        if not progressed:
            break
    checkpoints.save(step, {"params": params})
    # portable export consumed by rcomplexion_inference.py
    import flax

    final_dir = Path(args.checkpoint_path or "rcomplexion_checkpoints") / "final"
    final_dir.mkdir(parents=True, exist_ok=True)
    with open(final_dir / "params.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    print(f"Saved final model to {final_dir}")
    logger.close()
    return params


if __name__ == "__main__":
    main()
