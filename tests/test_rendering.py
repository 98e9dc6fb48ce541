"""Renderer (postprocessor) tests: events -> .osu -> reparse round trips."""

import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.osu.beatmap import Beatmap, Circle, HoldNote, Slider, Spinner, TimingPoint
from mapperatorinator_tpu.osu.events import Event, EventType
from mapperatorinator_tpu.osu.rendering import BeatmapConfig, Renderer, _make_tp


@pytest.fixture(scope="module")
def renderer():
    cfg = compose("/root/reference/configs/inference", "v32", schema_cls=schema.InferenceConfig)
    cfg.bpm = 120
    cfg.offset = 1000
    return Renderer(cfg)


def E(t, v=0):
    return Event(t, v)


def test_render_circle(renderer):
    events = [
        E(EventType.TIME_SHIFT, 1000),
        E(EventType.SNAPPING, 1),
        E(EventType.POS_X, 100),
        E(EventType.POS_Y, 200),
        E(EventType.NEW_COMBO),
        E(EventType.HITSOUND, 1),  # whistle, normal sets
        E(EventType.VOLUME, 70),
        E(EventType.CIRCLE),
    ]
    cfg = BeatmapConfig(title="T", artist="A", creator="C", version="V")
    result = renderer.generate(events, cfg)
    bm = Beatmap.from_string(result)
    objs = bm.hit_objects()
    assert len(objs) == 1
    c = objs[0]
    assert isinstance(c, Circle)
    assert (c.x, c.y) == (100, 200)
    assert c.time == 1000
    assert c.new_combo
    assert c.hitsound == 2  # (value%8)*2
    # volume change written into the timing (fuzzy-merges onto the coincident redline)
    assert any(tp.volume == 70 for tp in bm.timing_points)


def test_render_slider(renderer):
    # slider head at 1000, last anchor at 1500, end at 2000 -> 2 slides
    events = [
        E(EventType.TIME_SHIFT, 1000),
        E(EventType.POS_X, 100),
        E(EventType.POS_Y, 100),
        E(EventType.HITSOUND, 0),
        E(EventType.VOLUME, 60),
        E(EventType.SLIDER_HEAD),
        E(EventType.POS_X, 200),
        E(EventType.POS_Y, 100),
        E(EventType.BEZIER_ANCHOR),
        E(EventType.TIME_SHIFT, 1500),
        E(EventType.POS_X, 300),
        E(EventType.POS_Y, 100),
        E(EventType.HITSOUND, 0),
        E(EventType.VOLUME, 60),
        E(EventType.LAST_ANCHOR),
        E(EventType.TIME_SHIFT, 2000),
        # the parser emits the span-end position for SLIDER_END (curve at
        # progress 1), not the repeat-adjusted end
        E(EventType.POS_X, 300),
        E(EventType.POS_Y, 100),
        E(EventType.HITSOUND, 0),
        E(EventType.VOLUME, 60),
        E(EventType.SLIDER_END),
    ]
    cfg = BeatmapConfig()
    result = renderer.generate(events, cfg)
    bm = Beatmap.from_string(result)
    sliders = [o for o in bm.hit_objects() if isinstance(o, Slider)]
    assert len(sliders) == 1
    s = sliders[0]
    assert s.time == 1000
    assert s.repeat == 2
    assert (s.x, s.y) == (100, 100)
    assert s.length > 0
    # slider end time should be close to 2000
    assert abs(s.end_time - 2000) < 50


def test_render_spinner_and_mania(renderer):
    events = [
        E(EventType.TIME_SHIFT, 500),
        E(EventType.SPINNER),
        E(EventType.TIME_SHIFT, 1500),
        E(EventType.HITSOUND, 0),
        E(EventType.VOLUME, 50),
        E(EventType.SPINNER_END),
    ]
    result = renderer.generate(events, BeatmapConfig(mode=0))
    bm = Beatmap.from_string(result)
    spinners = [o for o in bm.hit_objects() if isinstance(o, Spinner)]
    assert len(spinners) == 1 and spinners[0].end_time == 1500

    events = [
        E(EventType.TIME_SHIFT, 500),
        E(EventType.POS_X, 64),
        E(EventType.POS_Y, 192),
        E(EventType.HITSOUND, 0),
        E(EventType.VOLUME, 50),
        E(EventType.HOLD_NOTE),
        E(EventType.TIME_SHIFT, 1500),
        E(EventType.POS_X, 64),
        E(EventType.POS_Y, 192),
        E(EventType.HOLD_NOTE_END),
    ]
    result = renderer.generate(events, BeatmapConfig(mode=3))
    bm = Beatmap.from_string(result)
    holds = [o for o in bm.hit_objects() if isinstance(o, HoldNote)]
    assert len(holds) == 1 and holds[0].end_time == 1500


def test_render_kiai(renderer):
    events = [
        E(EventType.TIME_SHIFT, 1000),
        E(EventType.KIAI, 1),
        E(EventType.TIME_SHIFT, 3000),
        E(EventType.KIAI, 0),
    ]
    result = renderer.generate(events, BeatmapConfig())
    bm = Beatmap.from_string(result)
    kiai_on = [tp for tp in bm.timing_points if tp.kiai]
    assert len(kiai_on) >= 1
    assert any(abs(tp.offset - 1000) <= 2 for tp in kiai_on)


def test_generate_timing_from_markers(renderer):
    # 120 BPM beats: timing point at 1000, beats every 500ms, measure at 3000
    events = []
    for i, t in enumerate(range(1000, 5001, 500)):
        if i == 0:
            kind = EventType.TIMING_POINT
        elif i % 4 == 0:
            kind = EventType.MEASURE
        else:
            kind = EventType.BEAT
        events.append(E(kind))
        events.append(E(EventType.TIME_SHIFT, t))

    # types_first=False: timeshift BEFORE type event
    events2 = []
    for i in range(0, len(events), 2):
        events2.append(events[i + 1])
        events2.append(events[i])
    timing = renderer.generate_timing(events2)
    reds = [tp for tp in timing if tp.parent is None]
    assert len(reds) >= 1
    assert abs(reds[0].offset - 1000) <= 2
    assert reds[0].ms_per_beat == pytest.approx(500, abs=renderer.timing_leniency)


def test_resnap(renderer):
    timing = [_make_tp(1000, 500, uninherited=True)]
    events = [
        E(EventType.TIME_SHIFT, 1503),  # should snap to 1500 at divisor 1
        E(EventType.SNAPPING, 1),
        E(EventType.CIRCLE),
    ]
    out = renderer.resnap_events(events, timing)
    assert out[0].value == 1500


def test_snap_near_perfect_overlaps(renderer):
    from mapperatorinator_tpu.osu.streams import Group

    g1 = Group(event_type=EventType.CIRCLE, time=100, x=100.0, y=100.0)
    g2 = Group(event_type=EventType.CIRCLE, time=200, x=101.0, y=102.0)
    renderer.snap_near_perfect_overlaps([g1, g2])
    assert (g2.x, g2.y) == (100.0, 100.0)


def test_distance_only_mode(renderer):
    # distance token without position: a position is sampled on a circle
    np.random.seed(0)
    events = [
        E(EventType.TIME_SHIFT, 1000),
        E(EventType.DISTANCE, 80),
        E(EventType.CIRCLE),
    ]
    result = renderer.generate(events, BeatmapConfig())
    bm = Beatmap.from_string(result)
    c = bm.hit_objects()[0]
    dist = np.hypot(c.x - 256, c.y - 192)
    assert dist == pytest.approx(80, abs=1.0)
