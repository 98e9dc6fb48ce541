"""SuperTimingGenerator analysis tests: feed fake per-iteration timing
generations (a jittered 120 BPM metronome) and check the ensemble recovers
the beat grid, BPM, and measure signature."""

import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.infer.processor import Processor
from mapperatorinator_tpu.infer.super_timing import SuperTimingGenerator
from mapperatorinator_tpu.osu.events import Event, EventType
from mapperatorinator_tpu.osu.vocab import build_vocabulary

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
    vocab = build_vocabulary(args.train)

    gen_holder = {}
    offsets = iter([])

    def fake_generate(self, sequences=None, generation_config=None, in_context=None,
                      out_context=None, verbose=False):
        offset = next(offsets)
        rng = np.random.default_rng(abs(offset) + 1)
        events = []
        for t, typ in _true_beats():
            shifted = t + offset + int(rng.normal(0, 4))  # per-iteration jitter
            events.append(Event(EventType.TIME_SHIFT, shifted))
            events.append(Event(typ))
        return [(events, None)]

    monkeypatch.setattr(Processor, "generate", fake_generate)
    gen = SuperTimingGenerator(args, engine=None, vocab=vocab)

    # replicate the generator's internal offset RNG so the fake can shift
    # events the way a real model (seeing offset audio) would
    rng = np.random.default_rng(gen.processor.seed)
    half = gen.miliseconds_per_sequence // 2
    offsets = iter([int(rng.integers(-half, half)) for _ in range(gen.iterations)])
    gen_holder["gen"] = gen
    return gen


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


def test_empty_when_no_beats(generator, monkeypatch):
    monkeypatch.setattr(
        Processor, "generate",
        lambda self, **kw: [([], None)],
    )
    audio = np.zeros(SONG_MS * generator.sample_rate // 1000, np.float32)
    events, event_times = generator.generate(audio, generation_config=None)
    assert events == [] and event_times == []
