"""MaiMod execution tests (VERDICT r2 item 2): drive the teacher-forced
surprisal analysis (``Processor.ai_mod``) and the suggestion pipeline on the
committed tiny checkpoint + a fixture beatmap (reference behavior:
mai_mod.py:122-331, processor.py:421-579)."""

import math
import re

import numpy as np
import pytest

from tests.fixtures.tiny_checkpoint import SRC_SEQ_LEN, TGT_SEQ_LEN, make_tiny_checkpoint, make_wav
from tests.test_beatmap import SIMPLE_OSU

REPO_ROOT = "/root/repo"

KNOWN_CATEGORIES = {
    "Timing", "Rhythm", "Sliders", "Compose", "Hit Sounds",
    "New Combos", "Kiai", "Scroll Speeds", "Misc",
}


def _inference_args(ckpt, wav, osu):
    from mapperatorinator_tpu.config import compose, schema

    return compose(
        f"{REPO_ROOT}/configs/inference",
        "v32",
        overrides=[
            f"model_path={ckpt}",
            f"audio_path={wav}",
            f"beatmap_path={osu}",
            "seed=3",
            f"train.data.src_seq_len={SRC_SEQ_LEN}",
            f"train.data.tgt_seq_len={TGT_SEQ_LEN}",
        ],
        schema_cls=schema.InferenceConfig,
    )


@pytest.fixture(scope="module")
def analysis(tmp_path_factory):
    """One shared teacher-forced analysis over the fixture beatmap."""
    tmp_path = tmp_path_factory.mktemp("mai_mod")
    ckpt = make_tiny_checkpoint(tmp_path / "ckpt")
    wav = make_wav(tmp_path / "song.wav", seconds=8.0)
    osu = tmp_path / "fixture.osu"
    osu.write_text(SIMPLE_OSU)

    import inference
    from mapperatorinator_tpu.infer import Preprocessor, Processor
    from mapperatorinator_tpu.infer.processor import GenerationConfig

    args = _inference_args(ckpt, wav, osu)
    engine, vocab = inference.load_model(args)
    preprocessor = Preprocessor(args, parallel=False)
    processor = Processor(args, engine, vocab)
    audio = preprocessor.load(str(wav))
    sequences = preprocessor.segment(audio)
    contexts = processor.ai_mod(
        sequences=sequences,
        generation_config=GenerationConfig(gamemode=0, difficulty=4.0),
        beatmap_path=str(osu),
        verbose=False,
    )
    return dict(args=args, engine=engine, vocab=vocab, contexts=contexts, osu=osu, wav=wav, ckpt=ckpt)


@pytest.mark.slow
def test_ai_mod_surprisal_per_token(analysis):
    """Every out-context event gets a finite relative surprisal and an argmax
    suggestion (reference: processor.py:519-529)."""
    contexts = analysis["contexts"]
    assert contexts, "ai_mod returned no contexts"
    total_events = 0
    for context in contexts:
        n = len(context["events"])
        total_events += n
        assert context["surprisals"].shape == (n,)
        assert np.isfinite(context["surprisals"]).all()
        assert (context["surprisals"] >= 0).all()
        assert len(context["expected_events"]) == n
        # events covered by a window got a rendered string + suggestion
        rendered = [s for s in context["events_str"] if s is not None]
        assert rendered, "no events were analyzed"
    assert total_events > 0


@pytest.mark.slow
def test_ai_mod_suggestions_structured(analysis):
    """The suggestion pipeline maps analysis output through the category
    table with combo-indexed osu://edit links (reference: mai_mod.py:122-331)."""
    import mai_mod
    from mapperatorinator_tpu.infer.processor import GenerationConfig

    records = mai_mod.ai_mod(
        analysis["args"],
        generation_config=GenerationConfig(gamemode=0, difficulty=4.0),
        engine=analysis["engine"],
        vocab=analysis["vocab"],
        beatmap_path=str(analysis["osu"]),
        verbose=False,
        raw_output=True,
        surprisal_threshold=0.0,
        structured=True,
    )
    assert records, "no suggestions produced at threshold 0"
    for record in records:
        assert record["category"] in KNOWN_CATEGORIES, record
        assert isinstance(record["message"], str) and record["message"]
        assert math.isfinite(record["surprisal"])
        assert re.fullmatch(r"\d{2}:\d{2}:\d{3}", record["timestamp"]), record
        assert record["edit_link"].startswith("osu://edit/"), record
    # hit-object suggestions carry a combo-indexed edit link "(N)"
    assert any("%20(" in record["edit_link"] for record in records)


def test_gamemode_fallback_selects_v31(tmp_path):
    """A beatmap whose mode the config doesn't cover falls back to the v31
    preset (reference: mai_mod.py:337-360)."""
    import mai_mod

    osu = tmp_path / "taiko.osu"
    osu.write_text(SIMPLE_OSU.replace("Mode: 0", "Mode: 1"))
    args = _inference_args("unused", "unused", osu)
    args.train.data.gamemodes = [0]

    fallback = mai_mod.select_config_for_gamemode(args, verbose=False)
    assert fallback is not args
    assert 1 in fallback.train.data.gamemodes
    assert fallback.gamemode == 1
    assert fallback.beatmap_path == args.beatmap_path

    # supported mode: unchanged config object
    osu_std = tmp_path / "std.osu"
    osu_std.write_text(SIMPLE_OSU)
    args_std = _inference_args("unused", "unused", osu_std)
    assert mai_mod.select_config_for_gamemode(args_std, verbose=False) is args_std
