"""SuperTimingGenerator analysis tests: feed fake per-iteration timing
generations (a jittered 120 BPM metronome) and check the ensemble recovers
the beat grid, BPM, and measure signature."""

import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.infer.super_timing import SuperTimingGenerator
from mapperatorinator_tpu.osu.events import Event, EventType

REPO_ROOT = "/root/repo"

BPM = 120.0
PERIOD = 60_000 / BPM  # 500 ms
SIGNATURE = 4
SONG_MS = 60_000


def _true_beats():
    """(time, EventType) for a 120 BPM metronome, measures every 4 beats,
    a timing point at t=1000."""
    beats = []
    t = 1000.0
    i = 0
    while t < SONG_MS - 1000:
        if i == 0:
            typ = EventType.TIMING_POINT
        elif i % SIGNATURE == 0:
            typ = EventType.MEASURE
        else:
            typ = EventType.BEAT
        beats.append((int(t), typ))
        t += PERIOD
        i += 1
    return beats


def _fake_streams(offsets):
    """Per-iteration event lists the way a model seeing offset audio would
    emit them: true beat grid shifted by the offset plus per-beat jitter."""
    streams = []
    for offset in offsets:
        rng = np.random.default_rng(abs(int(offset)) + 1)
        events = []
        for t, typ in _true_beats():
            shifted = t + int(offset) + int(rng.normal(0, 4))
            events.append(Event(EventType.TIME_SHIFT, shifted))
            events.append(Event(typ))
        streams.append(events)
    return streams


@pytest.fixture
def generator(monkeypatch):
    args = compose(
        f"{REPO_ROOT}/configs/inference",
        "v32",
        overrides=[
            "model_path=unused",
            "seed=5",
            "timer_iterations=6",
            "train.data.types_first=false",
        ],
        schema_cls=schema.InferenceConfig,
    )
    from mapperatorinator_tpu.osu.vocab import build_vocabulary

    vocab = build_vocabulary(args.train)

    monkeypatch.setattr(
        SuperTimingGenerator,
        "_decode_iterations",
        lambda self, audio, offsets, generation_config, verbose=False: _fake_streams(offsets),
    )
    return SuperTimingGenerator(args, engine=None, vocab=vocab)


def test_recovers_beat_grid(generator):
    audio = np.zeros(SONG_MS * generator.sample_rate // 1000, np.float32)
    events, event_times = generator.generate(audio, generation_config=None)
    assert events, "no timing events recovered"

    beat_times = [e.value for e in events if e.type == EventType.TIME_SHIFT]
    assert len(beat_times) > 80  # ~116 true beats

    # recovered inter-beat period ~500 ms
    periods = np.diff(sorted(beat_times))
    periods = periods[(periods > 100) & (periods < 2000)]
    assert abs(np.median(periods) - PERIOD) < 20

    # beats land near the true grid
    true_times = np.array([t for t, _ in _true_beats()])
    hits = sum(np.abs(true_times - bt).min() < 60 for bt in beat_times)
    assert hits / len(beat_times) > 0.8

    # measure signature repair produced ~every-4th measures
    types = [e.type for e in events if e.type != EventType.TIME_SHIFT]
    n_measures = sum(1 for t in types if t == EventType.MEASURE)
    n_beats = sum(1 for t in types if t == EventType.BEAT)
    assert n_measures > 10
    assert 2.0 < n_beats / n_measures < 5.0


@pytest.mark.slow
def test_batched_ensemble_decode_matches_per_iteration(tmp_path):
    """The pooled cross-iteration batched decode must emit token-identical
    events to decoding each ensemble member's windows separately (the
    reference execution shape, super_timing_generator.py:63-79)."""
    from tests.fixtures.tiny_checkpoint import (
        SRC_SEQ_LEN,
        TGT_SEQ_LEN,
        make_tiny_checkpoint,
        make_wav,
    )

    import inference
    from mapperatorinator_tpu.infer.processor import GenerationConfig
    from mapperatorinator_tpu.osu.events import ContextType

    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    wav = make_wav(tmp_path / "song.wav", seconds=6.0)

    args = compose(
        f"{REPO_ROOT}/configs/inference",
        "v32",
        overrides=[
            f"model_path={ckpt}",
            "seed=11",
            "timer_iterations=2",
            f"train.data.src_seq_len={SRC_SEQ_LEN}",
            f"train.data.tgt_seq_len={TGT_SEQ_LEN}",
        ],
        schema_cls=schema.InferenceConfig,
    )
    engine, vocab = inference.load_model(args)
    gen = SuperTimingGenerator(args, engine, vocab)
    audio = gen.preprocessor.load(str(wav))
    config = GenerationConfig(gamemode=0, difficulty=4.0)
    offsets = gen._draw_offsets()

    batched = gen._decode_iterations(audio, offsets, config)

    out_context = [ContextType.MAP] if args.train.data.add_timing else [ContextType.TIMING]
    sequential = []
    for offset in offsets:
        head_pad = max(0, offset * gen.sample_rate // 1000)
        head_cut = max(0, -offset * gen.sample_rate // 1000)
        sequences = gen.preprocessor.segment(audio[head_cut:], head_pad, 0)
        result = gen.processor.generate(
            sequences=sequences,
            generation_config=config,
            in_context=[ContextType.NONE],
            out_context=out_context,
            verbose=False,
        )
        sequential.append(result[0][0])

    assert [[(e.type, e.value) for e in ev] for ev in batched] == [
        [(e.type, e.value) for e in ev] for ev in sequential
    ]


def test_empty_when_no_beats(generator, monkeypatch):
    monkeypatch.setattr(
        SuperTimingGenerator,
        "_decode_iterations",
        lambda self, audio, offsets, generation_config, verbose=False: [[] for _ in offsets],
    )
    audio = np.zeros(SONG_MS * generator.sample_rate // 1000, np.float32)
    events, event_times = generator.generate(audio, generation_config=None)
    assert events == [] and event_times == []
