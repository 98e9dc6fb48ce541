"""Subprocess-level end-to-end test of the inference CLI (VERDICT r1 item 7):
tiny deterministic checkpoint + synthesized WAV -> ``python inference.py`` ->
a parseable .osu file (reference surface: inference.py:411-551,647-702)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from tests.fixtures.tiny_checkpoint import (
    REPO_ROOT,
    SRC_SEQ_LEN,
    TGT_SEQ_LEN,
    make_tiny_checkpoint,
    make_wav,
)


@pytest.mark.slow
@pytest.mark.parametrize("gamemode,extra", [
    (0, []),
    (1, []),              # taiko: drumroll/denden rendering
    (2, []),              # catch: std-style objects on the catch playfield
    (3, ["keycount=4"]),  # mania: column tokens + hold-note rendering
])
def test_inference_cli_end_to_end(tmp_path, gamemode, extra):
    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    wav = make_wav(tmp_path / "song.wav", seconds=10.0)
    out_dir = tmp_path / "out"
    out_dir.mkdir()

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "inference.py", "-cn", "v32",
        f"model_path={ckpt}",
        f"audio_path={wav}",
        f"output_path={out_dir}",
        f"train.data.src_seq_len={SRC_SEQ_LEN}",
        f"train.data.tgt_seq_len={TGT_SEQ_LEN}",
        "use_server=false",
        "super_timing=false",
        "generate_positions=false",
        "seed=7",
        f"gamemode={gamemode}",
        "difficulty=4.5",
        "export_osz=false",
        "title=TinyFixture", "artist=pytest", "creator=ci",
        "version=e2e",
        "bpm=120", "offset=0",
    ] + extra
    proc = subprocess.run(
        cmd, cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"

    osu_files = list(out_dir.glob("*.osu"))
    assert osu_files, f"no .osu produced; stdout:\n{proc.stdout[-3000:]}"

    # the output must parse with the domain layer and carry sane metadata
    from mapperatorinator_tpu.osu.beatmap import Beatmap

    bm = Beatmap.from_path(osu_files[0])
    assert bm.title == "TinyFixture"
    assert len(bm.timing_points) >= 1
    # random-weight models still emit a valid (possibly sparse) object list
    assert bm.hit_objects is not None


def test_should_load_separate_timing_model(tmp_path):
    """Gamemode fine-tune subfolders force timing onto the base checkpoint
    (reference: inference.py:388-408)."""
    from mapperatorinator_tpu.config import compose, schema

    import inference

    ckpt = tmp_path / "ckpt"
    (ckpt / "gamemode=1").mkdir(parents=True)

    args = compose(REPO_ROOT / "configs" / "inference", "v32",
                   schema_cls=schema.InferenceConfig)
    args.model_path = str(ckpt)

    args.gamemode = 1
    assert inference.should_load_separate_timing_model(args)

    # no matching subfolder -> same checkpoint either way
    args.gamemode = 0
    assert not inference.should_load_separate_timing_model(args)

    # auto-select disabled -> base model already used
    args.gamemode = 1
    args.auto_select_gamemode_model = False
    assert not inference.should_load_separate_timing_model(args)

    # timing not generated (provided via in_context) -> no second model
    from mapperatorinator_tpu.osu import ContextType

    args.auto_select_gamemode_model = True
    args.super_timing = False
    args.in_context = [ContextType.TIMING]
    args.output_type = [ContextType.MAP]
    assert not inference.should_load_separate_timing_model(args)
