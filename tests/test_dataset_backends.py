"""MMRS and Web dataset backend tests on fabricated parquet fixtures."""

import io
import json
import wave
from datetime import datetime

import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.osu import BeatmapParser, build_vocabulary
from mapperatorinator_tpu.train.data import MmrsDataset, WebDataset, build_dataset
from mapperatorinator_tpu.train.data.mmrs import filter_mmrs_metadata, load_mmrs_metadata
from mapperatorinator_tpu.train.data.web import (
    filter_web_beatmaps,
    get_web_submitted_date,
    parse_web_datetime,
)

from tests.test_data import OSU_TEMPLATE


def _wav_bytes(seconds=6, sr=16000):
    t = np.arange(sr * seconds) / sr
    x = (0.4 * np.sin(2 * np.pi * 220 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def _osu_text(i, rng):
    objects = "\n".join(
        f"{int(rng.integers(50, 450))},{int(rng.integers(50, 330))},{500 + k * 300},1,0,0:0:0:0:"
        for k in range(12)
    )
    return OSU_TEMPLATE.format(i=i, bid=i, objects=objects)


def _args():
    args = compose("/root/repo/configs/train", "v32", schema_cls=schema.TrainConfig)
    args.data.src_seq_len = 128
    args.data.tgt_seq_len = 256
    args.data.gamemodes = [0]
    args.data.dt_augment_prob = 0.0
    args.data.add_gd_context = False
    return args


@pytest.fixture(scope="module")
def vocab_parser():
    import warnings

    args = _args()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vocab = build_vocabulary(args)
    return args, vocab, BeatmapParser(args, vocab)


@pytest.fixture(scope="module")
def mmrs_root(tmp_path_factory):
    import pandas as pd

    root = tmp_path_factory.mktemp("mmrs")
    rng = np.random.default_rng(0)
    rows = []
    for set_i in range(2):
        folder = f"set{set_i}"
        d = root / "data" / folder
        d.mkdir(parents=True)
        (d / "audio.wav").write_bytes(_wav_bytes())
        for bm_i in range(2):
            bid = set_i * 10 + bm_i
            (d / f"map{bm_i}.osu").write_text(_osu_text(bid, rng))
            rows.append(
                {
                    "BeatmapSetId": 100 + set_i,
                    "Id": bid,
                    "ModeInt": 0,
                    "Ranked": 1,
                    "RankedDate": datetime(2019, 5, 1),
                    "SubmittedDate": datetime(2018, 5, 1),
                    "DifficultyRating": 4.0 + bm_i,
                    "StarRating": [2.0, 3.0, 4.0 + bm_i, 5.0, 6.0, 7.0, 8.0],
                    "BeatmapSetFolder": folder,
                    "BeatmapFile": f"map{bm_i}.osu",
                    "AudioFile": "audio.wav",
                    "UserId": 42,
                }
            )
    pd.DataFrame(rows).to_parquet(root / "metadata.parquet")
    return root


@pytest.fixture(scope="module")
def web_root(tmp_path_factory):
    import pandas as pd

    root = tmp_path_factory.mktemp("web")
    rng = np.random.default_rng(1)
    rows = []
    for set_i in range(2):
        beatmaps = [
            {
                "beatmap_id": 1000 + set_i * 10 + bm_i,
                "beatmapset_id": 500 + set_i,
                "mode": 0,
                "approved": 1,
                "approved_date": "2019-05-01 10:00:00",
                "submit_date": "2018-05-01 10:00:00",
                "difficultyrating": 4.5,
                "user_id": 42,
                "content": _osu_text(set_i * 10 + bm_i, rng),
            }
            for bm_i in range(2)
        ]
        rows.append({"json": json.dumps({"beatmaps": beatmaps}), "opus": {"bytes": _wav_bytes()}})
    pd.DataFrame(rows).to_parquet(root / "shard0.parquet")
    return root


def test_mmrs_metadata_filtering(mmrs_root):
    df = load_mmrs_metadata(mmrs_root)
    assert len(df) == 4
    assert len(filter_mmrs_metadata(df, gamemodes=[0])) == 4
    assert len(filter_mmrs_metadata(df, gamemodes=[3])) == 0
    assert len(filter_mmrs_metadata(df, min_year=2020)) == 0
    assert len(filter_mmrs_metadata(df, min_difficulty=4.5)) == 2
    assert len(filter_mmrs_metadata(df, start=0, end=1)) == 2  # first set only


def test_mmrs_dataset_yields_sequences(vocab_parser, mmrs_root):
    args, vocab, parser = vocab_parser
    args.data.train_dataset_path = str(mmrs_root)
    args.data.train_dataset_start = 0
    args.data.train_dataset_end = 2
    ds = MmrsDataset(args.data, parser, vocab)
    samples = []
    for s in ds:
        samples.append(s)
        if len(samples) >= 4:
            break
    assert len(samples) == 4
    for s in samples:
        assert "frames" in s and "decoder_input_ids" in s and "labels" in s
        assert s["mapper_idx"] == vocab.get_mapper_idx(42)


def test_mmrs_difficulty_interpolation(mmrs_root):
    df = load_mmrs_metadata(mmrs_root)
    row = df.iloc[0]
    assert MmrsDataset._get_difficulty(row, 1.0) == pytest.approx(4.0)
    assert MmrsDataset._get_difficulty(row, 1.5) == pytest.approx(6.0)
    assert MmrsDataset._get_difficulty(row, 1.1) == pytest.approx(4.4)


def test_web_datetime_helpers():
    assert parse_web_datetime("2019-05-01 10:00:00") == datetime(2019, 5, 1, 10)
    assert parse_web_datetime("2019-05-01") == datetime(2019, 5, 1)
    assert parse_web_datetime(None) is None
    assert parse_web_datetime("") is None
    assert get_web_submitted_date({"submit_date": "2018-01-02"}) == datetime(2018, 1, 2)
    assert get_web_submitted_date({"approved_date": "2018-01-02"}) == datetime(2018, 1, 2)


def test_filter_web_beatmaps():
    bms = [
        {"beatmap_id": 1, "mode": 0, "approved": 1, "approved_date": "2019-01-01", "difficultyrating": 3.0},
        {"beatmap_id": 2, "mode": 3, "approved": 1, "approved_date": "2019-01-01", "difficultyrating": 3.0},
        {"beatmap_id": 3, "mode": 0, "approved": -2, "approved_date": "2019-01-01", "difficultyrating": 3.0},
        {"beatmap_id": 4, "mode": 0, "approved": 1, "approved_date": "2010-01-01", "difficultyrating": 9.0},
    ]
    out = filter_web_beatmaps(bms, gamemodes=[0], ranked_statuses=[1, 2], min_year=2015, max_difficulty=5.0)
    assert [b["beatmap_id"] for b in out] == [1]


def test_web_dataset_yields_sequences(vocab_parser, web_root):
    args, vocab, parser = vocab_parser
    args.data.train_dataset_path = str(web_root)
    args.data.train_dataset_start = 0
    args.data.train_dataset_end = 1
    args.data.dataset_subset = None
    ds = WebDataset(args.data, parser, vocab)
    samples = []
    for s in ds:
        samples.append(s)
        if len(samples) >= 4:
            break
    assert len(samples) == 4
    for s in samples:
        assert "frames" in s and "decoder_input_ids" in s and "labels" in s


def test_build_dataset_dispatch(vocab_parser, mmrs_root, web_root):
    args, vocab, parser = vocab_parser
    args.data.train_dataset_path = str(mmrs_root)
    args.data.dataset_type = "mmrs"
    assert isinstance(build_dataset(args.data, parser, vocab), MmrsDataset)
    args.data.train_dataset_path = str(web_root)
    args.data.dataset_type = "web"
    assert isinstance(build_dataset(args.data, parser, vocab), WebDataset)
    with pytest.raises(NotImplementedError):
        args.data.dataset_type = "nope"
        build_dataset(args.data, parser, vocab)
