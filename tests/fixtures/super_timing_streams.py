"""Deterministic fake per-iteration timing streams for super-timing golden
tests. Each scenario builds, for every ensemble iteration, the event list a
timing model would emit when fed audio shifted by ``offset`` ms (so beat
times appear at ``true_time + offset`` in the model's frame). The golden
fixture `super_timing_golden.json` stores the exact analysis output these
streams produced, locking the ensemble-analysis numerics across rewrites."""

import zlib

import numpy as np

from mapperatorinator_tpu.osu.events import Event, EventType

SONG_MS = 60_000


def _grid(segments, signature=4):
    """segments: list of (start_ms, end_ms, bpm). Returns [(time, EventType)]
    with a TIMING_POINT opening each segment and a MEASURE every
    ``signature`` beats."""
    beats = []
    for start, end, bpm in segments:
        period = 60_000 / bpm
        t = float(start)
        i = 0
        while t < end:
            if i == 0:
                typ = EventType.TIMING_POINT
            elif i % signature == 0:
                typ = EventType.MEASURE
            else:
                typ = EventType.BEAT
            beats.append((int(t), typ))
            t += period
            i += 1
    return beats


SCENARIOS = {
    # steady 120 BPM metronome, one timing point
    "steady": dict(segments=[(1000, SONG_MS - 1000, 120.0)], signature=4, drop=0.0),
    # tempo change mid-song: 120 -> 180 with a new timing point
    "bpm_change": dict(
        segments=[(1000, 30_000, 120.0), (30_000, SONG_MS - 1000, 180.0)],
        signature=4,
        drop=0.0,
    ),
    # two separated sections with silence between (NaN-BPM fill-in territory)
    "gapped": dict(
        segments=[(1000, 18_000, 96.0), (40_000, SONG_MS - 1000, 96.0)],
        signature=3,
        drop=0.0,
    ),
    # noisy: 25% of beats dropped per iteration, waltz signature
    "sparse": dict(segments=[(2000, SONG_MS - 2000, 150.0)], signature=3, drop=0.25),
}


def build_streams(scenario: str, offsets, jitter_std: float = 4.0):
    """Per-iteration event lists in the model's (offset) time frame."""
    spec = SCENARIOS[scenario]
    beats = _grid(spec["segments"], spec["signature"])
    streams = []
    for it, offset in enumerate(offsets):
        rng = np.random.default_rng(zlib.crc32(f"{scenario}:{it}".encode()))
        events = []
        for t, typ in beats:
            if spec["drop"] and rng.random() < spec["drop"]:
                continue
            shifted = t + int(offset) + int(rng.normal(0, jitter_std))
            events.append(Event(EventType.TIME_SHIFT, shifted))
            events.append(Event(typ))
        streams.append(events)
    return streams
