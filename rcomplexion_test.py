"""Visualize the rcomplexion model's timing predictions
(reference: ``rcomplexion/test.py``): for each input gap, the entropy
contribution of each predicted next-gap; writes a heatmap.

    python rcomplexion_test.py -cn inference_v1 model_path=... [-o out.png]
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

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.models.classifier import OsuR, OsuRConfig
    from mapperatorinator_tpu.osu.events import Event, EventType
    from mapperatorinator_tpu.rcomplexion import RTokenizer

    argv = sys.argv[1:] if argv is None else argv
    config_name, out = "inference_v1", "rcomplexion_predictions.png"
    overrides = []
    i = 0
    while i < len(argv):
        if argv[i] in ("-cn", "--config-name"):
            config_name = argv[i + 1]
            i += 2
        elif argv[i] == "-o":
            out = argv[i + 1]
            i += 2
        else:
            overrides.append(argv[i])
            i += 1

    args = compose(REPO_ROOT / "configs" / "rcomplexion", config_name, overrides=overrides,
                   schema_cls=schema.RcomplexionConfig)
    tokenizer = RTokenizer(args)
    cfg = OsuRConfig(
        vocab_size_in=tokenizer.vocab_size_in, vocab_size_out=tokenizer.vocab_size_out,
        src_seq_len=args.data.src_seq_len, hidden_size=args.model.hidden_size,
    )
    model = OsuR(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, args.data.src_seq_len), jnp.int32))
    with open(Path(args.model_path) / "params.msgpack", "rb") as f:
        params = flax.serialization.from_bytes(template, f.read())

    max_shift = int((args.data.max_time - args.data.min_time) * args.data.time_resolution)
    circle = tokenizer.encode(Event(EventType.CIRCLE))
    inputs = np.empty((max_shift + 1, args.data.src_seq_len), np.int32)
    for i in range(max_shift + 1):
        pair = [tokenizer.encode(Event(EventType.TIME_SHIFT, i)), circle]
        inputs[i] = (pair * (args.data.src_seq_len // 2 + 1))[: args.data.src_seq_len]

    logits = model.apply(params, jnp.asarray(inputs))["logits"]
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    entropy_terms = -probs * np.log2(np.clip(probs, 1e-12, 1))
    print(f"prediction grid: {entropy_terms.shape}, total entropy "
          f"{entropy_terms.sum(axis=1).mean():.3f} bits/input")

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    plt.imshow(entropy_terms, aspect="auto")
    plt.xlabel("Predicted time")
    plt.ylabel("Input time")
    plt.title("Model predictions")
    plt.colorbar()
    plt.savefig(out, dpi=120)
    print(f"wrote {out}")
    return entropy_terms


if __name__ == "__main__":
    main()
