"""Native C++ difficulty calculator tests."""

import numpy as np
import pytest

from mapperatorinator_tpu.native import calculate_difficulty
from mapperatorinator_tpu.native.difficulty import beatmap_stars
from mapperatorinator_tpu.osu import Beatmap

FIXTURE = "/root/reference/osu_diffusion/testing/toy_datasets/kimi_no_bouken.osu"


def _synthetic_map(n=200, dt=150, spacing=120, mode=0, cs=4.0):
    lines = [
        "osu file format v14",
        "",
        "[General]",
        f"Mode: {mode}",
        "",
        "[Difficulty]",
        f"CircleSize:{cs}",
        "OverallDifficulty:8",
        "ApproachRate:9",
        "HPDrainRate:5",
        "SliderMultiplier:1.4",
        "SliderTickRate:1",
        "",
        "[TimingPoints]",
        "0,300,4,2,0,50,1,0",
        "",
        "[HitObjects]",
    ]
    x, y = 100.0, 100.0
    for i in range(n):
        lines.append(f"{int(x)},{int(y)},{i * dt},1,0,0:0:0:0:")
        x = 100 + (i % 2) * spacing
        y = 100 + ((i // 2) % 2) * spacing
    return "\n".join(lines)


def test_fixture_in_plausible_range():
    stars = calculate_difficulty(path=FIXTURE)
    assert stars is not None
    assert 3.0 < stars < 9.0


def test_clock_rate_monotonic():
    nm = calculate_difficulty(path=FIXTURE, speed=1.0)
    dt = calculate_difficulty(path=FIXTURE, speed=1.5)
    ht = calculate_difficulty(path=FIXTURE, speed=0.75)
    assert ht < nm < dt


def test_spacing_and_density_monotonic():
    base = calculate_difficulty(content=_synthetic_map(spacing=80))
    spaced = calculate_difficulty(content=_synthetic_map(spacing=240))
    dense = calculate_difficulty(content=_synthetic_map(dt=75, spacing=80))
    assert base < spaced
    assert base < dense


def test_small_circles_harder():
    cs4 = calculate_difficulty(content=_synthetic_map(cs=4))
    cs7 = calculate_difficulty(content=_synthetic_map(cs=7))
    assert cs4 < cs7


def test_all_modes_return_positive():
    for mode in (0, 1, 2, 3):
        cs = 7 if mode == 3 else 4  # mania: cs = key count
        stars = calculate_difficulty(content=_synthetic_map(mode=mode, cs=cs))
        assert stars is not None and stars > 0, f"mode {mode}"


def test_failure_returns_none():
    assert calculate_difficulty(content="not a beatmap") is None or isinstance(
        calculate_difficulty(content="not a beatmap"), float
    )
    assert calculate_difficulty(path="/nope/missing.osu") is None


def test_empty_args_returns_none():
    assert calculate_difficulty() is None


def test_beatmap_stars_direct():
    bm = Beatmap.from_path(FIXTURE)
    assert beatmap_stars(bm) == pytest.approx(calculate_difficulty(path=FIXTURE), abs=0.01)
