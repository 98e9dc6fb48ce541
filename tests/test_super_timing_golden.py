"""Golden lock on the super-timing ensemble analysis: fixed fake
per-iteration timing streams must produce byte-identical (events,
event_times) across rewrites of ``infer/super_timing.py``. The fixture was
captured from the implementation whose numerics match the reference ensemble
(reference: osuT5/osuT5/inference/super_timing_generator.py:42-358)."""

import json
from pathlib import Path

import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.infer.super_timing import SuperTimingGenerator
from mapperatorinator_tpu.osu.vocab import build_vocabulary
from tests.fixtures.super_timing_streams import SCENARIOS, SONG_MS, build_streams

REPO_ROOT = Path(__file__).resolve().parents[1]
GOLDEN = json.loads((REPO_ROOT / "tests/fixtures/super_timing_golden.json").read_text())


def _make_generator():
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
    return SuperTimingGenerator(args, engine=None, vocab=vocab)


@pytest.mark.parametrize("scenario", sorted(SCENARIOS))
def test_analysis_matches_golden(scenario, monkeypatch):
    gen = _make_generator()
    expected = GOLDEN[scenario]

    streams = build_streams(scenario, expected["offsets"])

    monkeypatch.setattr(
        SuperTimingGenerator,
        "_decode_iterations",
        lambda self, audio, offsets, generation_config, verbose=False: streams,
    )
    audio = np.zeros(SONG_MS * gen.sample_rate // 1000, np.float32)
    events, event_times = gen.generate(audio, generation_config=None)

    got = [[e.type.name, None if e.value is None else int(e.value)] for e in events]
    assert got == expected["events"]
    assert [int(t) for t in event_times] == expected["event_times"]


def test_offsets_match_golden():
    """The offset RNG stream is part of the locked behavior (it decides what
    audio each ensemble member sees)."""
    gen = _make_generator()
    assert gen._draw_offsets() == GOLDEN["steady"]["offsets"]
