"""Diffusion data + training entry smoke tests."""

import json
import sys

import numpy as np
import pytest

from mapperatorinator_tpu.diffusion.data import (
    beatmap_to_sequence,
    calc_distances,
    get_data,
    split_and_process_sequence,
)
from mapperatorinator_tpu.osu import Beatmap

FIXTURE = "/root/reference/osu_diffusion/testing/toy_datasets/kimi_no_bouken.osu"


def test_beatmap_to_sequence():
    bm = Beatmap.from_path(FIXTURE)
    seq = beatmap_to_sequence(bm)
    assert seq.shape[0] == 19
    assert seq.shape[1] > 300
    # times monotone nondecreasing
    assert (np.diff(seq[2]) >= -1e9).all()
    # exactly one type flag per datapoint
    assert (seq[3:].sum(axis=0) == 1).all()


def test_split_and_process_sequence():
    bm = Beatmap.from_path(FIXTURE)
    seq = beatmap_to_sequence(bm)
    (seq_x, seq_c), seq_len = split_and_process_sequence(seq, augment=False)
    assert seq_x.shape == (2, seq_len)
    assert seq_c.shape == (272, seq_len)
    assert np.abs(seq_x).max() <= 1.5  # positions roughly in [-1, 1]


def test_diffusion_train_entry(tmp_path, monkeypatch):
    """Run a few real diffusion training steps on a fabricated dataset."""
    # build dataset: one track with the fixture beatmap
    track = tmp_path / "Track00000"
    (track / "beatmaps").mkdir(parents=True)
    import shutil

    shutil.copy(FIXTURE, track / "beatmaps" / "map0.osu")
    (track / "metadata.json").write_text(
        json.dumps(
            {
                "Beatmaps": {
                    "map0": {"BeatmapId": 1, "Index": 0, "StandardStarRating": {"0": 5.0, "64": 6.5}}
                }
            }
        )
    )

    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, "/root/repo")
    import diffusion_train

    params, ema = diffusion_train.main(
        [
            "-cn",
            "v1",
            f"data.train_dataset_path={tmp_path}",
            "data.start=0",
            "data.end=1",
            "data.seq_len=8",
            "data.stride=64",
            "model.model=DiT-T",
            "model.diffusion_steps=16",
            "model.max_diffusion_step=16",
            "optim.batch_size=2",
            "optim.total_steps=3",
            "optim.warmup_steps=1",
            "optim.base_lr=1e-4",
            "checkpoint.every_steps=100",
            "logging.every_steps=1",
            "logging.log_with=none",
            f"checkpoint_path={tmp_path}/ckpt",
        ]
    )
    # ema params differ slightly from params after updates
    import jax

    diffs = [
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ema))
    ]
    assert any(d > 0 for d in diffs)
    # loss logged
    lines = (tmp_path / "logs" / "diffusion" / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 3
    assert all(np.isfinite(json.loads(l)["train/loss"]) for l in lines)
