"""Mapper-style classifier training (reference: ``classifier/train.py:43-82``).

    python classifier_train.py -cn train_v1 [overrides...]

Trains OsuClassifier (whisper-style encoder-decoder over audio + map tokens,
mean-pooled projector head) to predict the beatmap's mapper. The pooled
projection layer doubles as the FID feature extractor used by calc_fid.
"""

from __future__ import annotations

import sys
import warnings
from pathlib import Path

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))


def build_classifier(args, vocab):
    from mapperatorinator_tpu.models.classifier import ClassifierConfig, OsuClassifier
    from mapperatorinator_tpu.models.transformer import TransformerConfig

    m = args.model
    backbone = TransformerConfig(
        vocab_size=vocab.vocab_size_out,
        d_model=m.d_model,
        encoder_layers=m.encoder_layers,
        decoder_layers=m.decoder_layers,
        encoder_heads=m.encoder_heads,
        decoder_heads=m.decoder_heads,
        encoder_ffn=m.encoder_ffn,
        decoder_ffn=m.decoder_ffn,
        # reference parity (classifier/libs/model/model.py:118-127): with
        # input_features=False (default) the embedded mel bypasses the conv
        # stem entirely (inputs_embeds path), so positions span full frames
        max_source_positions=(args.data.src_seq_len // 2 if m.input_features
                              else args.data.src_seq_len),
        max_target_positions=args.data.tgt_seq_len,
        num_mel_bins=m.spectrogram.n_mels,
        position_scheme=getattr(m, "position_scheme", "whisper_abs"),
        norm=getattr(m, "norm", "layer"),
        conv_stem=bool(m.input_features),
    )
    cfg = ClassifierConfig(
        backbone=backbone,
        vocab_size=vocab.vocab_size_in,
        num_classes=vocab.num_mapper_classes,
        classifier_proj_size=m.classifier_proj_size,
        sample_rate=m.spectrogram.sample_rate,
        n_fft=m.spectrogram.n_fft,
        n_mels=m.spectrogram.n_mels,
        hop_length=m.spectrogram.hop_length,
    )
    return OsuClassifier(cfg)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.osu import BeatmapParser, build_vocabulary
    from mapperatorinator_tpu.train.data.batching import batch_iterator
    from mapperatorinator_tpu.train.data.classifier import ClassifierDataset
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

    args = compose(REPO_ROOT / "configs" / "classifier", config_name, overrides=overrides,
                   schema_cls=schema.ClassifierConfig)

    vocab = build_vocabulary(args)
    parser = BeatmapParser(args, vocab)
    model = build_classifier(args, vocab)

    hop = args.model.spectrogram.hop_length
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed),
        frames=jnp.zeros((1, hop * (args.data.src_seq_len - 1)), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
    )

    if args.pretrained_path:
        # transfer-learn the towers from a pretrained osuT5 checkpoint
        # (reference: classifier/train.py:19-41,58-59)
        from mapperatorinator_tpu.models.classifier import transfer_from_pretrained
        from mapperatorinator_tpu.models.io import load_checkpoint

        _, pre_params, _ = load_checkpoint(args.pretrained_path)
        params = transfer_from_pretrained(params, pre_params)
        print(f"Initialized towers from pretrained checkpoint {args.pretrained_path}")

    schedule = build_schedule(args.optim)
    tx = optax.chain(optax.clip_by_global_norm(args.optim.grad_clip),
                     optax.adamw(schedule, weight_decay=args.optim.weight_decay))
    if args.optim.grad_acc > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=args.optim.grad_acc)
    opt_state = jax.jit(tx.init)(params)

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply(p, batch["frames"], batch["decoder_input_ids"],
                              decoder_attention_mask=batch["decoder_attention_mask"],
                              labels=batch["labels"])
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def eval_step(params, batch):
        out = model.apply(params, batch["frames"], batch["decoder_input_ids"],
                          decoder_attention_mask=batch["decoder_attention_mask"],
                          labels=batch["labels"])
        logits, labels = out["logits"], batch["labels"]
        top1 = (logits.argmax(-1) == labels).mean()
        k10 = min(10, logits.shape[-1])
        k100 = min(100, logits.shape[-1])
        in_topk = lambda k: (jax.lax.top_k(logits, k)[1] == labels[:, None]).any(-1).mean()  # noqa: E731
        return out["loss"], top1, in_topk(k10), in_topk(k100)

    checkpoints = CheckpointManager(Path(args.checkpoint_path or "classifier_checkpoints"))
    logger = MetricsLogger("logs/classifier", log_with=args.logging.log_with)

    step = 0
    while step < args.optim.total_steps:
        progressed = False
        dataset = ClassifierDataset(args, parser, vocab)
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
                stats = []
                test_ds = ClassifierDataset(args, parser, vocab, test=True)
                for j, tb in enumerate(batch_iterator(test_ds, args.optim.batch_size, drop_last=True)):
                    if j >= args.eval.steps:
                        break
                    stats.append([float(x) for x in eval_step(params, {k: jnp.asarray(v) for k, v in tb.items()})])
                if stats:
                    m = np.mean(stats, axis=0)
                    logger.log({"val/loss": m[0], "val/accuracy": m[1],
                                "val/top_10_accuracy": m[2], "val/top_100_accuracy": m[3]}, step)
            if step % args.checkpoint.every_steps == 0:
                checkpoints.save(step, {"params": params})
        if not progressed:
            break
    checkpoints.save(step, {"params": params})

    import dataclasses
    import json

    import flax

    final_dir = Path(args.checkpoint_path or "classifier_checkpoints") / "final"
    final_dir.mkdir(parents=True, exist_ok=True)
    with open(final_dir / "params.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    # self-contained bundle: config + tokenizer so calc_fid can rebuild
    with open(final_dir / "classifier_config.json", "w", encoding="utf-8") as f:
        json.dump(
            {
                "model": dataclasses.asdict(args.model),
                "data": dataclasses.asdict(args.data),
            },
            f,
            default=lambda o: getattr(o, "value", str(o)),
        )
    vocab.save_pretrained(final_dir)
    print(f"Saved final model to {final_dir}")
    logger.close()
    return params


if __name__ == "__main__":
    main()
