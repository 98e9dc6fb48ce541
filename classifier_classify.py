"""Classify a beatmap's mapper style (reference: ``classifier/classify.py:
19-175``).

    python classifier_classify.py -cn train_v1 model_path=... beatmap_path=... \
        [audio_path=...] [time=S]

Builds one window at ``time`` seconds (default 0), runs the classifier, and
prints the top mappers with confidences.
"""

from __future__ import annotations

import json
import sys
import warnings
from pathlib import Path

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

STEPS_PER_MILLISECOND = 0.1


def create_example(events, event_times, audio, time_s: float, args, vocab):
    """One (frames, tokens) window at ``time_s`` seconds
    (reference: classify.py:57-100)."""
    import numpy as np

    from mapperatorinator_tpu.osu.events import Event, EventType

    frame_seq_len = args.data.src_seq_len - 1
    frame_size = args.model.spectrogram.hop_length
    sample_rate = args.model.spectrogram.sample_rate
    samples_per_sequence = frame_seq_len * frame_size
    sequence_duration = samples_per_sequence / sample_rate

    frame_start = int(time_s * sample_rate)
    frames = np.zeros(samples_per_sequence, np.float32)
    chunk = audio[frame_start : frame_start + samples_per_sequence]
    frames[: len(chunk)] = chunk

    window = [
        e for e, t in zip(events, event_times) if time_s <= t / 1000 < time_s + sequence_duration
    ]
    ts_range = vocab.event_range[EventType.TIME_SHIFT]
    tokens = np.full((args.data.tgt_seq_len,), vocab.pad_id, np.int64)
    for i, event in enumerate(window[: args.data.tgt_seq_len]):
        if event.type == EventType.TIME_SHIFT:
            value = int((event.value - time_s * 1000) * STEPS_PER_MILLISECOND)
            event = Event(EventType.TIME_SHIFT, int(np.clip(value, ts_range.min_value, ts_range.max_value)))
        tokens[i] = vocab.encode(event)

    return {
        "frames": frames[None],
        "decoder_input_ids": tokens[None],
        "decoder_attention_mask": (tokens != vocab.pad_id)[None],
    }


def get_mapper_names(path) -> dict[int, str]:
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    names = {}
    for item in data:
        names[item["user_id"]] = item["username"][0] if item.get("username") else "Unknown"
    return names


def main(argv=None):
    import flax
    import jax
    import jax.numpy as jnp
    import numpy as np

    from classifier_train import build_classifier
    from mapperatorinator_tpu.audio.io import load_audio_file
    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.osu import BeatmapParser, build_vocabulary
    from mapperatorinator_tpu.osu.beatmap import Beatmap

    argv = sys.argv[1:] if argv is None else argv
    config_name = "train_v1"
    overrides, time_s = [], 0.0
    i = 0
    while i < len(argv):
        if argv[i] in ("-cn", "--config-name"):
            config_name = argv[i + 1]
            i += 2
        elif argv[i].startswith("time="):
            time_s = float(argv[i].split("=", 1)[1])
            i += 1
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

    beatmap_path = Path(args.beatmap_path)
    beatmap = Beatmap.from_path(beatmap_path)
    audio_path = args.audio_path or beatmap_path.parent / beatmap.audio_filename
    audio = load_audio_file(audio_path, args.model.spectrogram.sample_rate)
    events, event_times = parser.parse(beatmap, 1.0, None, (False, False))

    example = create_example(events, event_times, audio, time_s, args, vocab)
    out = model.apply(params, jnp.asarray(example["frames"]), jnp.asarray(example["decoder_input_ids"]),
                      decoder_attention_mask=jnp.asarray(example["decoder_attention_mask"]))
    logits = np.asarray(out["logits"][0])

    top_k = min(100, logits.shape[-1])
    order = np.argsort(logits)[::-1][:top_k]
    mapper_idx_id = {idx: uid for uid, idx in vocab.mapper_idx.items()}
    names = {}
    mappers_path = Path(args.mappers_path) if args.mappers_path else None
    if mappers_path is not None and mappers_path.exists():
        names = get_mapper_names(mappers_path)
    results = []
    for idx in order:
        mapper_id = mapper_idx_id.get(int(idx), -1)
        name = names.get(mapper_id, "Unknown")
        results.append((name, mapper_id, float(logits[idx])))
        print(f"Mapper: {name} ({mapper_id}) with confidence: {logits[idx]}")
    return results


if __name__ == "__main__":
    main()
