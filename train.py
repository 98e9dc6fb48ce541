"""osuT5 training entry point (reference: ``osuT5/train.py:49-145``).

    python train.py -cn v32 [overrides...]

Composes the training config, builds the vocabulary/parser/dataset, the
Mapperatorinator model, optimizer and mesh, auto-resumes from the latest
checkpoint, and runs the training loop with eval/logging/checkpoint hooks.

Multi-host (the reference's torchrun multi-node story, SURVEY §2.7 item 1):
launch the same command on every host with
``parallel.coordinator_address=host:port parallel.num_processes=N
parallel.process_id=i``. One global mesh spans all processes (DCN outermost
on the data axis), each process feeds only its shard of every batch, and
``checkpoint_path`` must point at the SAME (shared-filesystem) directory on
all hosts — orbax coordinates the distributed save across processes.
"""

from __future__ import annotations

import sys
import warnings
from pathlib import Path

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))


def build_model_and_data(args, mesh=None):
    import jax
    import jax.numpy as jnp

    from mapperatorinator_tpu.models import Mapperatorinator
    from mapperatorinator_tpu.models.mapperatorinator import build_config
    from mapperatorinator_tpu.osu import BeatmapParser, build_vocabulary
    from mapperatorinator_tpu.parallel import process_local_batch_size, shard_iterator_by_process
    from mapperatorinator_tpu.train.data import build_dataset
    from mapperatorinator_tpu.train.data.batching import batch_iterator

    vocab = build_vocabulary(args)
    parser = BeatmapParser(args, vocab)
    config = build_config(args, vocab)
    model = Mapperatorinator(config)

    # multi-host: each process loads only its 1/process_count of every batch
    # (round-robin example sharding, the DistributedSampler equivalent)
    local_batch_size = process_local_batch_size(args.optim.batch_size)

    def make_batches(test: bool):
        from mapperatorinator_tpu.train.data.batching import prefetch_iterator

        dataset = build_dataset(args.data, parser, vocab, test=test)
        batches = batch_iterator(
            shard_iterator_by_process(iter(dataset)),
            local_batch_size,
            balancer_buffer_size=args.dataloader.balancer_buffer_size if not test else 0,
            drop_last=args.dataloader.drop_last,
        )
        if not test and args.dataloader.num_workers > 0:
            batches = prefetch_iterator(batches, buffer_size=2 * args.dataloader.num_workers)
        return batches

    hop = args.model.spectrogram.hop_length
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        frames=jnp.zeros((1, hop * (args.data.src_seq_len - 1)), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
    )
    return model, params, vocab, make_batches


def main(argv=None):
    import jax

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.parallel import make_mesh, replicate, shard_batch
    from mapperatorinator_tpu.train import make_train_step
    from mapperatorinator_tpu.train.loop import CheckpointManager, MetricsLogger, train
    from mapperatorinator_tpu.train.optim import build_optimizer
    from mapperatorinator_tpu.train.step import init_train_state, make_eval_step

    argv = sys.argv[1:] if argv is None else argv
    config_name = "v32"
    overrides = []
    i = 0
    while i < len(argv):
        if argv[i] in ("-cn", "--config-name"):
            config_name = argv[i + 1]
            i += 2
        else:
            overrides.append(argv[i])
            i += 1

    args = compose(REPO_ROOT / "configs" / "train", config_name, overrides=overrides, schema_cls=schema.TrainConfig)

    # multi-host: one flag set (parallel.coordinator_address/num_processes/
    # process_id) joins this process to a global mesh over DCN+ICI
    # (reference equivalent: torchrun multi-node DDP, SURVEY §2.7 item 1)
    from mapperatorinator_tpu.parallel import make_global_mesh, maybe_initialize

    maybe_initialize(args.parallel)
    mesh = make_global_mesh(args.parallel)
    n_devices = mesh.devices.size
    is_main = jax.process_index() == 0
    if is_main:
        print(f"Training on {n_devices} device(s) across {jax.process_count()} "
              f"process(es): {jax.devices()[0].platform}")

    model, params, vocab, make_batches = build_model_and_data(args)

    if args.pretrained_path:
        from mapperatorinator_tpu.models.io import load_checkpoint
        from mapperatorinator_tpu.models.lora import resolve_model_checkpoint_path

        pretrained = resolve_model_checkpoint_path(args.pretrained_path, gamemode=args.pretrained_gamemode)
        print(f"Loading pretrained weights from {pretrained}")
        model, params, loaded_vocab = load_checkpoint(pretrained)
        if loaded_vocab is not None:
            vocab = loaded_vocab

    if args.enable_lora:
        from mapperatorinator_tpu.models.lora import init_lora_params
        from mapperatorinator_tpu.train.step import make_lora_train_step

        if not args.pretrained_path:
            raise ValueError("enable_lora requires pretrained_path (LoRA fine-tunes a base model).")
        lora_cfg = dict(args.lora or {})
        rank = int(lora_cfg.get("r", 64))
        lora_alpha = float(lora_cfg.get("lora_alpha", 128))
        base_params = params
        params = init_lora_params(
            jax.random.PRNGKey(args.seed), base_params, rank=rank,
            target_modules=lora_cfg.get("target_modules"),
        )
        print(f"LoRA fine-tuning: rank={rank} alpha={lora_alpha} "
              f"({sum(x.size for x in jax.tree.leaves(params))} trainable params)")

    tx = build_optimizer(args, num_processes=n_devices)
    # wrap for gradient accumulation BEFORE init_train_state so the opt
    # state tree matches what the train step updates with
    from mapperatorinator_tpu.train.step import wrap_grad_acc

    tx = wrap_grad_acc(tx, args.optim.grad_acc)

    if args.parallel.tensor_axis or args.parallel.fsdp_axis:
        # Megatron-style tensor parallelism and/or FSDP via GSPMD param
        # placement; moments created from placed params inherit the
        # shardings, and the train step reads them off the state
        from mapperatorinator_tpu.parallel import shard_params
        from mapperatorinator_tpu.parallel.mesh import ensure_on_mesh

        params = shard_params(
            mesh, params,
            tensor_axis=args.parallel.tensor_axis,
            fsdp_axis=args.parallel.fsdp_axis,
        )
        place = lambda tree: ensure_on_mesh(mesh, tree)  # noqa: E731
    else:
        place = lambda tree: replicate(mesh, tree)  # noqa: E731

    state = init_train_state(params, tx)

    ckpt_dir = Path(args.checkpoint_path or "checkpoints").resolve()
    checkpoints = CheckpointManager(ckpt_dir, total_limit=args.checkpoint.local_total_limit)
    # run metadata into the manifest (reference: the wandb Artifact metadata,
    # train_utils.py:115-144)
    checkpoints.set_metadata({
        "format": "orbax",
        "src_seq_len": args.data.src_seq_len,
        "tgt_seq_len": args.data.tgt_seq_len,
        "num_classes": args.data.num_classes,
        "num_diff_classes": args.data.num_diff_classes,
        "max_difficulty": args.data.max_diff,
        "class_dropout_prob": args.data.class_dropout_prob,
        "diff_dropout_prob": args.data.diff_dropout_prob,
        "backbone": args.model.name,
    })
    latest = checkpoints.latest_step()
    if latest is not None:
        print(f"Resuming from checkpoint step {latest}")
        state = checkpoints.restore(state)

    state = place(state)
    if args.enable_lora:
        base_step = make_lora_train_step(
            model, tx, replicate(mesh, base_params), alpha=lora_alpha, mesh=mesh,
        )
    else:
        base_step = make_train_step(model, tx, mesh=mesh)

    if jax.process_count() > 1:
        from mapperatorinator_tpu.parallel import make_global_batch

        def sharded_step(state, batch, rng):
            # batch holds only this process's rows; assemble the global array
            return base_step(state, make_global_batch(mesh, batch), rng)
    else:
        def sharded_step(state, batch, rng):
            return base_step(state, shard_batch(mesh, batch), rng)

    eval_step = make_eval_step(model)
    if args.enable_lora:
        from mapperatorinator_tpu.models.lora import merge_lora

        _eval_base = eval_step
        eval_step = lambda p, batch: _eval_base(merge_lora(base_params, p, alpha=lora_alpha), batch)  # noqa: E731
    eval_fn = None
    if jax.process_count() > 1:
        # multi-host: per-process eval rows, device-reduced global metrics —
        # the host-logits eval_model path cannot materialize a multi-process
        # logits array (step.py:make_global_eval_step)
        from mapperatorinator_tpu.train.step import eval_model_global, make_global_eval_step

        _global_eval = make_global_eval_step(model, mesh)

        def eval_fn(params, batches, max_steps):
            return eval_model_global(_global_eval, params, batches, mesh, max_steps=max_steps)
    # only process 0 logs; secondary hosts keep a per-process dir so nothing
    # contends on the shared filesystem
    logger = (MetricsLogger("logs", log_with=args.logging.log_with,
                            run_name=args.logging.run_name, mode=args.logging.mode)
              if is_main
              else MetricsLogger(f"logs/proc{jax.process_index()}", log_with=None))
    # checkpoint saves also upload to the tracker when one is live
    # (reference: every accelerate save_state becomes a wandb model Artifact,
    # train_utils.py:113-141)
    if logger.wandb_run is not None:
        checkpoints.artifact_sink = logger.log_checkpoint_artifact

    # save the tokenizer alongside checkpoints (reference registers it for
    # checkpointing; ours serializes once - it is deterministic given config)
    if is_main:
        vocab.save_pretrained(ckpt_dir)

    state = train(
        train_step=sharded_step,
        eval_step=eval_step,
        state=state,
        train_batch_factory=lambda: make_batches(test=False),
        eval_batch_factory=(lambda: make_batches(test=True)) if args.eval.every_steps > 0 else None,
        vocab=vocab,
        args=args,
        logger=logger,
        checkpoints=checkpoints,
        profile_dir="logs/profile" if args.profile.do_profile else None,
        model=model,
        eval_fn=eval_fn,
    )
    if args.enable_lora:
        from mapperatorinator_tpu.models.lora import save_lora

        save_lora(
            ckpt_dir / "lora", jax.device_get(state.params),
            rank=rank, alpha=lora_alpha,
            target_modules=lora_cfg.get("target_modules"),
            ckpt_subfolders=args.lora_metadata.ckpt_subfolders,
        )
        print(f"Saved LoRA adapter to {ckpt_dir / 'lora'}")
    logger.close()
    return state


if __name__ == "__main__":
    main()
