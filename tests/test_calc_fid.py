"""calc_fid harness tests (VERDICT r1 item 9): gamemode-grouped dataset
scan, training-set overlap check, and the multi-process generation fan-out
driving a real regeneration over an ORS-layout fixture dataset."""

import json
from pathlib import Path

import pytest

from tests.test_beatmap import SIMPLE_OSU


def _make_ors_dataset(root: Path, n_tracks: int = 2):
    from tests.fixtures.tiny_checkpoint import make_wav

    for i in range(n_tracks):
        track = root / f"Track{i:05d}"
        (track / "beatmaps").mkdir(parents=True)
        osu = SIMPLE_OSU.replace("BeatmapID:42", f"BeatmapID:{100 + i}")
        (track / "beatmaps" / f"map{i}.osu").write_text(osu)
        make_wav(track / "audio.wav", seconds=6.0)
    return root


def _fid_args(dataset: Path, **over):
    from mapperatorinator_tpu.config import compose, schema

    args = compose(Path(__file__).resolve().parents[1] / "configs", "calc_fid",
                   schema_cls=schema.FidConfig)
    args.dataset_path = str(dataset)
    args.dataset_type = "ors"
    args.dataset_start = 0
    args.dataset_end = 2
    args.gamemodes = [0]
    for k, v in over.items():
        setattr(args, k, v)
    return args


def test_paths_grouped_by_gamemode(tmp_path):
    from calc_fid import get_beatmap_paths, get_beatmap_paths_by_gamemode

    dataset = _make_ors_dataset(tmp_path / "ors")
    args = _fid_args(dataset)
    by_gm = get_beatmap_paths_by_gamemode(args)
    assert list(by_gm) == [0]
    assert len(by_gm[0]) == 2
    assert get_beatmap_paths(args) == by_gm[0]


def test_training_set_overlap_report(tmp_path):
    from calc_fid import get_beatmap_paths, test_training_set_overlap as overlap

    dataset = _make_ors_dataset(tmp_path / "ors")
    ids_file = tmp_path / "train_ids.txt"
    ids_file.write_text("100\n999\n")  # map0 is in the training set
    paths = get_beatmap_paths(_fid_args(dataset))
    out = overlap(paths, str(ids_file))
    assert out["training_set_overlap"] == {"in": 1, "out": 1, "ratio": 0.5}
    assert overlap(paths, None) == {}


@pytest.mark.slow
def test_fan_out_generation_end_to_end(tmp_path):
    """Two worker processes each regenerate one map; metrics pair up the
    outputs under generated/<stem>/."""
    from tests.fixtures.tiny_checkpoint import SRC_SEQ_LEN, TGT_SEQ_LEN, make_tiny_checkpoint

    import calc_fid

    dataset = _make_ors_dataset(tmp_path / "ors")
    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")

    args = _fid_args(dataset, num_processes=2, fid=False, fid_cm3p=False,
                     extra_stats=False, rhythm_stats=True)
    args.inference.model_path = str(ckpt)
    args.inference.train.data.src_seq_len = SRC_SEQ_LEN
    args.inference.train.data.tgt_seq_len = TGT_SEQ_LEN
    args.inference.seed = 5

    by_gm = calc_fid.get_beatmap_paths_by_gamemode(args)
    calc_fid._fan_out_generation(by_gm, args)

    paths = [p for ps in by_gm.values() for p in ps]
    generated = [calc_fid._generated_for(p, args) for p in paths]
    assert all(g is not None for g in generated), generated
    # restart safety: everything already generated -> nothing pending
    assert all(calc_fid._already_generated(p, args) for p in paths)

    pairs = list(zip(paths, generated))
    report = calc_fid.rhythm_report(pairs)
    assert "rhythm_f1" in json.dumps(report) or report
