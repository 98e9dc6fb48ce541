"""Evaluate a trained classifier on the test split
(reference: ``classifier/test.py``).

    python classifier_test.py -cn train_v1 model_path=... data...
"""

from __future__ import annotations

import sys
import warnings
from pathlib import Path

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))


def main(argv=None):
    import flax
    import jax
    import jax.numpy as jnp
    import numpy as np

    from classifier_train import build_classifier
    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.osu import BeatmapParser, build_vocabulary
    from mapperatorinator_tpu.train.data.batching import batch_iterator
    from mapperatorinator_tpu.train.data.classifier import ClassifierDataset

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
    template = model.init(
        jax.random.PRNGKey(0),
        frames=jnp.zeros((1, hop * (args.data.src_seq_len - 1)), jnp.float32),
        decoder_input_ids=jnp.ones((1, 8), jnp.int32),
    )
    with open(Path(args.model_path) / "params.msgpack", "rb") as f:
        params = flax.serialization.from_bytes(template, f.read())

    @jax.jit
    def eval_step(batch):
        out = model.apply(params, batch["frames"], batch["decoder_input_ids"],
                          decoder_attention_mask=batch["decoder_attention_mask"],
                          labels=batch["labels"])
        logits, labels = out["logits"], batch["labels"]
        top1 = (logits.argmax(-1) == labels).mean()
        in_topk = lambda k: (jax.lax.top_k(logits, min(k, logits.shape[-1]))[1] == labels[:, None]).any(-1).mean()  # noqa: E731
        return out["loss"], top1, in_topk(10), in_topk(100)

    stats = []
    dataset = ClassifierDataset(args, parser, vocab, test=True)
    for batch in batch_iterator(dataset, args.optim.batch_size, drop_last=True):
        stats.append([float(x) for x in eval_step({k: jnp.asarray(v) for k, v in batch.items()})])
    if not stats:
        print("no test batches produced")
        return {}
    m = np.mean(stats, axis=0)
    results = {"test_loss": m[0], "test_accuracy": m[1],
               "test_top_10_accuracy": m[2], "test_top_100_accuracy": m[3]}
    for k, v in results.items():
        print(f"{k}: {v:.4f}")
    return results


if __name__ == "__main__":
    main()
