"""Star-rating via the native C++ calculator.

Drop-in replacement for the reference's rosu-pp dependency (reference:
``osuT5/osuT5/dataset/data_utils.py:195-226``): classic strain-based
difficulty for all four gamemodes, implemented in ``native/difficulty.cpp``
and loaded over ctypes. The shared library is built on first use with g++
(``make -C native``).

Matches the reference's call signature: ``calculate_difficulty(content=...,
path=..., speed=...) -> Optional[float]`` (rounded to 2 decimals, None on
failure).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
LIB_PATH = NATIVE_DIR / "build" / "libosudiff.so"

_lib = None
_lib_lock = threading.Lock()

_F64P = ctypes.POINTER(ctypes.c_double)
_I32P = ctypes.POINTER(ctypes.c_int32)


def _load_library():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not LIB_PATH.exists():
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
        lib = ctypes.CDLL(str(LIB_PATH))
        lib.osu_std_stars.restype = ctypes.c_double
        lib.osu_std_stars.argtypes = [_F64P, _F64P, _F64P, _I32P, ctypes.c_int32,
                                      ctypes.c_double, ctypes.c_double]
        lib.taiko_stars.restype = ctypes.c_double
        lib.taiko_stars.argtypes = [_F64P, _I32P, ctypes.c_int32, ctypes.c_double]
        lib.mania_stars.restype = ctypes.c_double
        lib.mania_stars.argtypes = [_F64P, _F64P, _I32P, ctypes.c_int32,
                                    ctypes.c_int32, ctypes.c_double]
        lib.catch_stars.restype = ctypes.c_double
        lib.catch_stars.argtypes = [_F64P, _F64P, ctypes.c_int32,
                                    ctypes.c_double, ctypes.c_double]
        _lib = lib
        return _lib


def _arr_f64(values) -> tuple[np.ndarray, "_F64P"]:
    a = np.ascontiguousarray(values, dtype=np.float64)
    return a, a.ctypes.data_as(_F64P)


def _arr_i32(values) -> tuple[np.ndarray, "_I32P"]:
    a = np.ascontiguousarray(values, dtype=np.int32)
    return a, a.ctypes.data_as(_I32P)


def beatmap_stars(beatmap, speed: float = 1.0) -> float:
    """Star rating of a parsed :class:`~mapperatorinator_tpu.osu.Beatmap`."""
    from ..osu.beatmap import HoldNote, Slider, Spinner

    lib = _load_library()
    objs = beatmap.hit_objects(stacking=False)
    if len(objs) < 2:
        return 0.0

    mode = int(beatmap.mode)
    times = [float(h.time) for h in objs]

    if mode == 1:  # taiko: kat = whistle(2) or clap(8); drumrolls/dendens neutral
        colors = []
        for h in objs:
            if isinstance(h, (Slider, Spinner)):
                colors.append(2)
            else:
                colors.append(1 if h.hitsound & 10 else 0)
        t, tp = _arr_f64(times)
        c, cp = _arr_i32(colors)
        return float(lib.taiko_stars(tp, cp, len(objs), float(speed)))

    if mode == 3:  # mania: column from x position
        keys = max(int(round(beatmap.circle_size)), 1)
        columns = [min(int(h.x * keys / 512.0), keys - 1) for h in objs]
        end_times = [float(h.end_time) if isinstance(h, HoldNote) else float(h.time) for h in objs]
        t, tp = _arr_f64(times)
        e, ep = _arr_f64(end_times)
        c, cp = _arr_i32(columns)
        return float(lib.mania_stars(tp, ep, cp, len(objs), keys, float(speed)))

    if mode == 2:  # catch: horizontal positions only
        xs = [float(h.x) for h in objs]
        t, tp = _arr_f64(times)
        x, xp = _arr_f64(xs)
        return float(lib.catch_stars(tp, xp, len(objs), float(beatmap.circle_size), float(speed)))

    # osu!standard
    xs, ys, types = [], [], []
    for h in objs:
        if isinstance(h, Spinner):
            xs.append(256.0)
            ys.append(192.0)
            types.append(2)
        else:
            xs.append(float(h.x))
            ys.append(float(h.y))
            types.append(1 if isinstance(h, Slider) else 0)
    t, tp = _arr_f64(times)
    x, xp = _arr_f64(xs)
    y, yp = _arr_f64(ys)
    ty, typ = _arr_i32(types)
    return float(lib.osu_std_stars(tp, xp, yp, typ, len(objs),
                                   float(beatmap.circle_size), float(speed)))


def calculate_difficulty(content: Optional[str] = None, path=None, speed: float = 1.0) -> Optional[float]:
    """Star rating from .osu text or path; None on failure
    (reference: data_utils.py:190-226)."""
    from ..osu.beatmap import Beatmap

    try:
        if content is not None:
            beatmap = Beatmap.from_string(content)
        elif path is not None:
            beatmap = Beatmap.from_path(path)
        else:
            raise ValueError("Either 'content' or 'path' must be provided")
        return round(beatmap_stars(beatmap, speed=speed), 2)
    except Exception as e:  # mirror the reference: log + None, never raise
        source = path if path is not None else "<content>"
        print(f"Failed to calculate difficulty for beatmap {source}: {e}")
        return None
