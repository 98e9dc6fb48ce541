"""Standalone DiT sampling entry + sequence export (VERDICT r3 item 10;
reference: ``osu_diffusion/sample.py``, ``utils/export/create_beatmap.py``)."""

import dataclasses
import json

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

import diffusion_sample
from mapperatorinator_tpu.diffusion.data import beatmap_to_sequence
from mapperatorinator_tpu.diffusion.export import sequence_to_beatmap
from mapperatorinator_tpu.models.dit import DiT, DiTConfig
from mapperatorinator_tpu.osu.beatmap import Beatmap, Circle, Slider, Spinner
from tests.test_beatmap import SIMPLE_OSU


def test_sequence_to_beatmap_roundtrip():
    """beatmap -> datapoint sequence -> beatmap preserves the object stream
    (the export is the inverse of data.get_data)."""
    bm = Beatmap.from_string(SIMPLE_OSU)
    seq = beatmap_to_sequence(bm)
    out = sequence_to_beatmap(seq, bm, version="roundtrip")

    objs = out.hit_objects()
    orig = bm.hit_objects()
    assert [type(h) for h in objs] == [type(h) for h in orig]
    for a, b in zip(objs, orig):
        assert a.time == pytest.approx(b.time, abs=1)
        assert a.x == pytest.approx(b.x, abs=1) and a.y == pytest.approx(b.y, abs=1)
        assert a.new_combo == b.new_combo
    slider_out = [h for h in objs if isinstance(h, Slider)][0]
    slider_in = [h for h in orig if isinstance(h, Slider)][0]
    assert slider_out.repeat == slider_in.repeat
    assert slider_out.length == pytest.approx(slider_in.length, rel=0.05)
    spin_out = [h for h in objs if isinstance(h, Spinner)][0]
    assert spin_out.end_time == pytest.approx(6000, abs=1)

    # the rendered text parses back to the same stream
    reparsed = Beatmap.from_string(out.to_string())
    assert [type(h) for h in reparsed.hit_objects()] == [type(h) for h in orig]
    # the slider's SV greenline plays the sampled length over the original span
    resl = [h for h in reparsed.hit_objects() if isinstance(h, Slider)][0]
    assert reparsed._slider_duration(resl) / resl.repeat == pytest.approx(
        slider_in.span_duration, rel=0.05)


def _write_bundle(path, class_size):
    cfg = DiTConfig(in_channels=2, context_size=272, hidden_size=32, depth=1,
                    num_heads=2, class_size=class_size)
    model = DiT(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 8, cfg.in_channels)),
        jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 8, cfg.context_size)),
        jnp.zeros((2, cfg.class_size)),
    )
    path.mkdir(parents=True, exist_ok=True)
    with open(path / "params.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    with open(path / "dit_config.json", "w", encoding="utf-8") as f:
        json.dump({k: v for k, v in dataclasses.asdict(cfg).items() if k != "dtype"}, f)


def test_diffusion_sample_entry_smoke(tmp_path):
    """The CLI end-to-end: toy beatmap + random DiT bundle -> sampled .osu
    variants (+ refine pass) that parse with the original object stream."""
    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.diffusion.vocab import DiffusionVocab

    dcfg = compose("/root/repo/configs/diffusion", "v1", schema_cls=schema.DiffusionTrainConfig)
    class_size = DiffusionVocab.from_args(dcfg).num_tokens

    bundle = tmp_path / "bundle"
    _write_bundle(bundle, class_size)
    osu = tmp_path / "toy.osu"
    osu.write_text(SIMPLE_OSU, encoding="utf-8")

    args = diffusion_sample.parse_args([
        "--beatmap", str(osu),
        "--ckpt", str(bundle),
        "--num-sampling-steps", "4",
        "--num-variants", "2",
        "--refine-ckpt", str(bundle),
        "--refine-iters", "2",
        "--cfg-scale", "1.5",
        "--output-dir", str(tmp_path / "results"),
    ])
    paths = diffusion_sample.main(args)
    assert len(paths) == 4  # 2 variants + 2 refined
    orig_types = [type(h) for h in Beatmap.from_string(SIMPLE_OSU).hit_objects()]
    for p in paths:
        assert p.exists()
        bm = Beatmap.from_path(p)
        assert [type(h) for h in bm.hit_objects()] == orig_types
        assert "Diffusion" in bm.version
