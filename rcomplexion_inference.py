"""Rhythm-complexity scoring over a dataset
(reference: ``rcomplexion/inference.py:21-115``).

    python rcomplexion_inference.py -cn inference_v1 model_path=... [overrides]

For each beatmap: entropy of the model's next-note-timing prediction with an
OD-scaled leniency window, normalized by drain time (seconds of active play).
Writes ``rhythm_complexities.csv``.
"""

from __future__ import annotations

import sys
import warnings
from pathlib import Path

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))


def od_to_ms_300(od: float) -> float:
    """Hit window for a 300 in ms (public osu! formula)."""
    return 79.5 - 6.0 * od


def calc_rhythm_complexity(beatmap, apply_fn, tokenizer, parser, args) -> float:
    import numpy as np

    from mapperatorinator_tpu.osu.beatmap import Slider
    from mapperatorinator_tpu.rcomplexion import create_sequences, tokenize_events

    leniency = int(od_to_ms_300(beatmap.overall_difficulty) * args.data.time_resolution)
    tokens = tokenize_events(parser.parse(beatmap), tokenizer)
    sequences, labels = create_sequences(tokens, args.data.src_seq_len, tokenizer)
    if len(sequences) == 0:
        return 0.0

    # pad the batch dim to the next power of two so XLA reuses compiles
    # across beatmaps with different window counts
    input_ids = np.stack(sequences, 0)
    n = len(input_ids)
    bucket = 1 << (n - 1).bit_length()
    if bucket > n:
        input_ids = np.concatenate([input_ids, np.zeros((bucket - n,) + input_ids.shape[1:], input_ids.dtype)])
    logits = apply_fn(input_ids)[:n]
    probs = np.asarray(
        __import__("jax").nn.softmax(logits.astype("float32"), axis=-1)
    )

    total_loss = 0.0
    for i, label in enumerate(labels):
        aggregate = probs[i, max(0, label - leniency) : label + leniency].sum()
        total_loss += -float(np.log(np.clip(aggregate, 1e-4, 1)))

    # normalize by drain time (gaps > 5 s are breaks)
    break_threshold = 5000.0
    drain_ms = 0.0
    last_time = None
    for ho in beatmap.hit_objects(stacking=False):
        if last_time is not None and ho.time - last_time < break_threshold:
            drain_ms += ho.time - last_time
        last_time = ho.end_time if isinstance(ho, Slider) else ho.time
    if drain_ms == 0:
        return total_loss
    return total_loss / (drain_ms / 1000.0)


def main(argv=None):
    import flax
    import jax
    import jax.numpy as jnp
    from tqdm import tqdm

    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.models.classifier import OsuR, OsuRConfig
    from mapperatorinator_tpu.osu.beatmap import Beatmap
    from mapperatorinator_tpu.rcomplexion import RParser, RTokenizer

    argv = sys.argv[1:] if argv is None else argv
    config_name = "inference_v1"
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
    parser = RParser(args.data)
    cfg = OsuRConfig(
        vocab_size_in=tokenizer.vocab_size_in,
        vocab_size_out=tokenizer.vocab_size_out,
        src_seq_len=args.data.src_seq_len,
        hidden_size=args.model.hidden_size,
    )
    model = OsuR(cfg)
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, args.data.src_seq_len), jnp.int32))
    with open(Path(args.model_path) / "params.msgpack", "rb") as f:
        params = flax.serialization.from_bytes(template, f.read())

    def apply_fn(input_ids):
        return model.apply(params, jnp.asarray(input_ids))["logits"]

    beatmap_files = []
    root = Path(args.data.train_dataset_path)
    for i in range(args.data.train_dataset_start, args.data.train_dataset_end):
        beatmaps_dir = root / f"Track{i:05d}" / "beatmaps"
        if beatmaps_dir.is_dir():
            beatmap_files.extend(sorted(beatmaps_dir.glob("*.osu")))

    complexities = {}
    for beatmap_file in tqdm(beatmap_files, smoothing=0.01):
        beatmap = Beatmap.from_path(beatmap_file)
        complexities[beatmap.beatmap_id] = calc_rhythm_complexity(beatmap, apply_fn, tokenizer, parser, args)

    out_path = Path("rhythm_complexities.csv")
    with open(out_path, "w") as f:
        for beatmap_id, value in complexities.items():
            f.write(f"{beatmap_id},{value}\n")
    print(f"Wrote {len(complexities)} rhythm complexities to {out_path}")
    return complexities


if __name__ == "__main__":
    main()
