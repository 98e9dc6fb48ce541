"""Whole-pipeline .osu parity against the reference stack (round-4 VERDICT
item 2): run the reference's torch ``inference.generate``
(/root/reference/inference.py:411-551) and this repo's pipeline on the SAME
tiny converted checkpoint, audio, flags, and *generated tokens*, then diff
the final .osu files.

Every stage is parity-tested in isolation elsewhere (tokenizer layout,
conversion, greedy/sampled/beam/CFG decode, postprocessor semantics); this
test pins the COMPOSITION — preprocessing windows, prompt construction
(context SOS/special tokens, timing in-context re-encode, lookback events),
the decode-side dequantization de-bias, lookahead trimming, event-time
threading, timing inference, resnap, and template fill — where residual
drift between 15 individually-correct stages would hide.

The model forward itself is the one stage NOT exercised here: a
random-weight checkpoint emits structurally-degenerate event streams that
crash the reference's own ``get_groups`` (data_utils.py:977), so the
generated tokens are SCRIPTED — one shared per-(context, window) token
table, built from this repo's parity-tested beatmap parser and vocabulary,
is returned verbatim by both sides' ``model_generate`` seams
(/root/reference/osuT5/osuT5/inference/processor.py:155 and
mapperatorinator_tpu/infer/processor.py:190). Greedy/sampled token parity
with real weights is pinned separately in test_generate_parity.py. The
prompts each side would have fed its model are captured per call and
asserted identical, so prompt-construction drift is still detected.

Comparison contract:
* [HitObjects] — byte-for-byte (both sides serialize hit objects with their
  own code; the reference's lines come from its real postprocessor).
* [TimingPoints] — numeric equality (the reference serializes timing points
  through slider's ``TimingPoint.pack``, which is shimmed offline — see
  tests/reference_shim.SliderTimingPoint — so bytes are not evidence there).
* [General]/[Difficulty]/[Metadata]/[Events] — key/value equality.
* model prompts — token-for-token per (context, window) on both sides.
"""

import numpy as np
import pytest

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.osu import build_vocabulary
from mapperatorinator_tpu.osu.events import Event, EventType
from tests.fixtures.tiny_checkpoint import make_wav
from tests.reference_shim import import_reference_inference, import_reference_osut5
from tests.test_generate_parity import FAMILY, _configs, _mel_shim, _patch_hub_lookups
from tests.test_vocab import ref_ct

REF_CONFIGS = "/root/reference/configs"
SRC_LEN, TGT_LEN = 256, 192
MS_PER_STEP = 10


@pytest.fixture(scope="module")
def ref():
    return import_reference_osut5()


def _sections(text: str) -> dict:
    """.osu text -> {section: [non-empty lines]} (format v14 layout)."""
    out = {}
    current = None
    for line in text.splitlines():
        line = line.rstrip("\r")
        if line.startswith("[") and line.endswith("]"):
            current = line
            out[current] = []
        elif current is not None and line.strip():
            out[current].append(line)
    return out


def _kv(lines):
    out = {}
    for line in lines:
        if ":" in line:
            k, v = line.split(":", 1)
            out[k.strip()] = v.strip()
    return out


def _timing_tuple(line: str):
    p = line.split(",")
    return (
        round(float(p[0]), 6),   # offset (slider packs float ms)
        round(float(p[1]), 6),   # beatLength
        int(p[2]),               # meter
        int(p[5]),               # volume
        int(p[6]),               # uninherited
        int(p[7]),               # effects (kiai bit)
    )


def _tiny_osu(path):
    """A minimal valid 120 BPM osu!std map: circles on every beat 500..9500,
    new combo every 4th, varied positions (the fixture the scripted 'model'
    replays)."""
    lines = [
        "osu file format v14",
        "",
        "[General]",
        "AudioFilename: audio.mp3",
        "Mode: 0",
        "",
        "[Difficulty]",
        "HPDrainRate:5",
        "CircleSize:4",
        "OverallDifficulty:8",
        "ApproachRate:9",
        "SliderMultiplier:1.4",
        "SliderTickRate:1",
        "",
        "[TimingPoints]",
        "0,500,4,2,0,60,1,0",
        "",
        "[HitObjects]",
    ]
    for i, t in enumerate(range(500, 10_000, 500)):
        x = 64 + (i * 48) % 384
        y = 64 + (i * 72) % 256
        kind = 5 if i % 4 == 0 else 1  # circle, new combo every 4th
        lines.append(f"{x},{y},{t},{kind},0,0:0:0:0:")
    path.write_text("\n".join(lines) + "\n")
    return path


def _tiny_mania_osu(path):
    """A minimal valid 120 BPM 4K mania map: notes cycling columns every
    500 ms plus two hold notes — exercises the mania column tokens, the
    column -> position conversion, and hold rendering in the composed
    pipeline."""
    lines = [
        "osu file format v14",
        "",
        "[General]",
        "AudioFilename: audio.mp3",
        "Mode: 3",
        "",
        "[Difficulty]",
        "HPDrainRate:7",
        "CircleSize:4",
        "OverallDifficulty:8",
        "ApproachRate:5",
        "SliderMultiplier:1.4",
        "SliderTickRate:1",
        "",
        "[TimingPoints]",
        "0,500,4,2,0,60,1,0",
        "",
        "[HitObjects]",
    ]
    # column k of 4 -> x = 512 * (k + 0.5) / 4
    cols = [64, 192, 320, 448]
    for i, t in enumerate(range(500, 9_000, 500)):
        lines.append(f"{cols[i % 4]},192,{t},1,0,0:0:0:0:")
    # two hold notes (type 128, endTime:hitSample)
    lines.append(f"{cols[1]},192,9000,128,0,9400:0:0:0:0:")
    lines.append(f"{cols[3]},192,9200,128,0,9600:0:0:0:0:")
    path.write_text("\n".join(lines) + "\n")
    return path


def _tiny_taiko_osu(path):
    """A minimal 120 BPM taiko map: alternating don/kat circles (kat =
    whistle hitsound) every 500 ms — exercises taiko hitsound events through
    the composed pipeline."""
    lines = [
        "osu file format v14", "",
        "[General]", "AudioFilename: audio.mp3", "Mode: 1", "",
        "[Difficulty]", "HPDrainRate:6", "CircleSize:5", "OverallDifficulty:5",
        "ApproachRate:5", "SliderMultiplier:1.4", "SliderTickRate:1", "",
        "[TimingPoints]", "0,500,4,2,0,60,1,0", "",
        "[HitObjects]",
    ]
    for i, t in enumerate(range(500, 9_500, 500)):
        hitsound = 0 if i % 2 == 0 else 8  # don / kat(clap)
        lines.append(f"256,192,{t},1,{hitsound},0:0:0:0:")
    path.write_text("\n".join(lines) + "\n")
    return path


def _tiny_catch_osu(path):
    """A minimal 120 BPM catch map: fruits sweeping x positions every 500 ms
    (y is gameplay-irrelevant) — exercises catch position handling."""
    lines = [
        "osu file format v14", "",
        "[General]", "AudioFilename: audio.mp3", "Mode: 2", "",
        "[Difficulty]", "HPDrainRate:5", "CircleSize:4", "OverallDifficulty:7",
        "ApproachRate:8", "SliderMultiplier:1.4", "SliderTickRate:1", "",
        "[TimingPoints]", "0,500,4,2,0,60,1,0", "",
        "[HitObjects]",
    ]
    for i, t in enumerate(range(500, 9_500, 500)):
        x = 32 + (i * 56) % 448
        kind = 5 if i % 4 == 0 else 1
        lines.append(f"{x},192,{t},{kind},0,0:0:0:0:")
    path.write_text("\n".join(lines) + "\n")
    return path


FIXTURES = {0: _tiny_osu, 1: _tiny_taiko_osu, 2: _tiny_catch_osu, 3: _tiny_mania_osu}


def _runs(events, event_times):
    """Split a parsed event stream into hit groups: with types_first=False a
    group starts at its TIME_SHIFT token (parsing.py:216,359)."""
    runs, current, t = [], [], None
    for ev, ms in zip(events, event_times):
        if ev.type == EventType.TIME_SHIFT:
            if current:
                runs.append((t, current))
            current, t = [ev], ev.value
        elif current:
            current.append(ev)
    if current:
        runs.append((t, current))
    return runs


def _window_scripts(events, event_times, vocab, frame_times):
    """Per-window generated-token script: each window emits the groups whose
    absolute time falls in its stride slice, TIME_SHIFTs re-encoded
    window-relative exactly as the processors' own prompt encoder does
    (processor.py:1311-1320), terminated with EOS."""
    ts_range = vocab.event_range[EventType.TIME_SHIFT]
    runs = _runs(events, event_times)
    bounds = list(frame_times) + [float("inf")]
    scripts = []
    for i, frame_time in enumerate(frame_times):
        toks = []
        for t, run in runs:
            if not (bounds[i] <= t < bounds[i + 1]):
                continue
            for ev in run:
                if ev.type == EventType.TIME_SHIFT:
                    steps = int((ev.value - frame_time) / MS_PER_STEP)
                    steps = int(np.clip(steps, ts_range.min_value, ts_range.max_value))
                    ev = Event(EventType.TIME_SHIFT, steps)
                toks.append(vocab.encode(ev))
        toks.append(vocab.eos_id)
        scripts.append(np.asarray(toks, np.int64))
    return scripts


@pytest.mark.slow
@pytest.mark.parametrize("gamemode,cfg_scale", [(0, 1.0), (0, 2.0), (1, 1.0), (2, 1.0), (3, 1.0)],
                         ids=["std", "std-cfg", "taiko", "catch", "mania"])
def test_whole_pipeline_osu_parity(ref, tmp_path, monkeypatch, gamemode, cfg_scale):
    import torch

    ref_inf = import_reference_inference()
    from osuT5.osuT5.utils import model_utils as ref_model_utils

    train_cfg, ref_train_cfg = _configs(ref, "v32", SRC_LEN, TGT_LEN, tmp_path, monkeypatch)
    _patch_hub_lookups(monkeypatch)
    ref_tok = ref.tokenizer.Tokenizer(ref_train_cfg)
    _mel_shim(train_cfg, monkeypatch)

    torch.manual_seed(0)
    ref_model = ref_model_utils._get_model(ref_train_cfg, ref_tok, torch.float32, "sdpa").eval()

    vocab = build_vocabulary(train_cfg)
    assert vocab.vocab_size_out == ref_tok.vocab_size_out

    # ---- shared weights: reference state dict converted to our params (the
    # weights are not consulted by the scripted seam, but the engine is the
    # real constructed object either way)
    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.models import Mapperatorinator
    from mapperatorinator_tpu.models.convert import convert_mapperatorinator_state_dict
    from mapperatorinator_tpu.models.mapperatorinator import build_config

    my_cfg = build_config(train_cfg, vocab)
    model = Mapperatorinator(my_cfg)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = {"params": convert_mapperatorinator_state_dict(sd, my_cfg, family=FAMILY["v32"])}
    engine = DecodeEngine(model, params, max_length=TGT_LEN, pad_token_id=vocab.pad_id)

    wav = make_wav(tmp_path / "song.wav", seconds=10.0)

    # ---- identical flags on both sides (greedy, no CFG, sequential mode)
    args = compose(f"{REF_CONFIGS}/inference", "v32", schema_cls=schema.InferenceConfig)
    args.train = train_cfg
    args.audio_path = str(wav)
    args.gamemode = gamemode
    if gamemode == 3:
        args.keycount = 4
        args.hold_note_ratio = 0.2
        args.scroll_speed_ratio = 0.5
    args.difficulty = 4.5
    args.seed = 7
    args.do_sample = False
    args.num_beams = 1
    # cfg_scale > 1 makes both sides ALSO build the unconditional negative
    # prompt each window (processor get_prompts; reference processor.py:
    # get_prompts negative=True) — captured and compared like the cond one
    args.cfg_scale = cfg_scale
    if cfg_scale > 1:
        args.descriptors = ["clean"]
        args.negative_descriptors = ["messy"]
    args.super_timing = False
    args.generate_positions = False
    args.parallel = False
    args.export_osz = False
    args.add_to_beatmap = False
    args.use_server = False
    args.title, args.artist = "ParityFixture", "pytest"
    args.creator, args.version = "parity", "e2e"
    args.tags = "parity"  # skip the OmegaConf defaults-diff tag derivation
    args.bpm, args.offset = 120, 0

    # ---- the shared generated-token script, one table for both stacks
    from mapperatorinator_tpu.infer.preprocessor import Preprocessor
    from mapperatorinator_tpu.osu.beatmap import Beatmap
    from mapperatorinator_tpu.osu.parsing import BeatmapParser

    pre = Preprocessor(args)
    _, frame_times, _ = pre.segment(pre.load(str(wav)))
    frame_times = [int(t) for t in frame_times]

    source = Beatmap.from_path(FIXTURES[gamemode](tmp_path / "fixture.osu"))
    parser = BeatmapParser(train_cfg, vocab)
    map_events, map_times = parser.parse(source)
    timing_events, timing_times = parser.parse_timing(source)
    scripts = {
        "timing": _window_scripts(timing_events, timing_times, vocab, frame_times),
        "map": _window_scripts(map_events, map_times, vocab, frame_times),
        "sv": [np.asarray([vocab.eos_id], np.int64) for _ in frame_times],
    }

    # per-side call logs: (context, prompt tokens) in call order
    ref_calls, my_calls = [], []
    ref_counter, my_counter = {}, {}

    import osuT5.osuT5.inference.processor as ref_processor_mod

    def ref_fake_generate(self, model_kwargs, **generate_kwargs):
        ctx = generate_kwargs["context_type"]
        idx = ref_counter.get(ctx, 0)
        ref_counter[ctx] = idx + 1
        prompt = model_kwargs["decoder_input_ids"]
        neg = model_kwargs.get("negative_prompt")
        ref_calls.append((ctx, prompt[0].tolist(),
                          neg[0].tolist() if neg is not None else None))
        script = torch.tensor(scripts[ctx][idx], dtype=prompt.dtype)[None]
        return torch.cat([prompt, script], dim=-1), None

    monkeypatch.setattr(ref_processor_mod.Processor, "model_generate", ref_fake_generate)

    from mapperatorinator_tpu.infer.processor import Processor as MyProcessor

    def my_fake_generate(self, frames, cond_prompt, uncond_prompt, model_kwargs,
                         lookback_time=0, lookahead_time=0, context_type=None):
        ctx = context_type.value
        idx = my_counter.get(ctx, 0)
        my_counter[ctx] = idx + 1
        cond_prompt = np.asarray(cond_prompt)
        my_calls.append((ctx, cond_prompt[0].tolist(),
                         np.asarray(uncond_prompt)[0].tolist() if uncond_prompt is not None else None))
        return np.concatenate([cond_prompt, scripts[ctx][idx][None]], axis=-1)

    monkeypatch.setattr(MyProcessor, "model_generate", my_fake_generate)

    # ---- reference side
    ref_args = ref_inf.InferenceConfig()
    from tests.test_vocab import _copy_dataclass

    _copy_dataclass(args, ref_args)
    ref_args.train = ref_train_cfg
    ref_args.in_context = [ref_ct(ref, c) for c in args.in_context]
    ref_args.output_type = [ref_ct(ref, c) for c in args.output_type]
    ref_args.device = "cpu"

    ref_out = tmp_path / "ref_out"
    ref_out.mkdir()
    ref_args.output_path = str(ref_out)

    # reference audio decode goes through pydub (absent): feed both sides our
    # WAV loader (decode parity is pinned separately in test_audio.py)
    from mapperatorinator_tpu.audio.io import load_audio_file as our_load

    import osuT5.osuT5.inference.preprocessor as ref_preprocessor

    monkeypatch.setattr(
        ref_preprocessor, "load_audio_file",
        lambda file, sample_rate, speed=1.0, normalize=True: np.asarray(
            our_load(file, sample_rate, speed=speed, normalize=normalize)
        ),
    )

    ref_inf.compile_args(ref_args, verbose=False)
    ref_gen_cfg, ref_bm_cfg = ref_inf.get_config(ref_args)
    _, ref_path = ref_inf.generate(
        ref_args,
        audio_path=str(wav),
        output_path=str(ref_out),
        generation_config=ref_gen_cfg,
        beatmap_config=ref_bm_cfg,
        model=ref_model,
        tokenizer=ref_tok,
        verbose=False,
    )

    # ---- our side
    import inference

    my_out = tmp_path / "my_out"
    my_out.mkdir()
    args.output_path = str(my_out)
    inference.compile_args(args, vocab, verbose=False)
    gen_cfg, bm_cfg = inference.get_config(args)
    _, my_path = inference.generate(
        args,
        audio_path=str(wav),
        output_path=str(my_out),
        generation_config=gen_cfg,
        beatmap_config=bm_cfg,
        engine=engine,
        vocab=vocab,
        verbose=False,
    )

    # both stacks consumed the same windows and fed their models the same
    # prompts, token for token, in the same order
    assert my_counter == ref_counter
    assert len(my_calls) == len(ref_calls)
    for i, ((my_ctx, my_prompt, my_neg), (ref_ctx, ref_prompt, ref_neg)) in enumerate(
            zip(my_calls, ref_calls)):
        assert my_ctx == ref_ctx, f"call {i}: context {my_ctx} != {ref_ctx}"
        assert my_prompt == ref_prompt, f"call {i} ({my_ctx}): prompt drift"
        assert my_neg == ref_neg, f"call {i} ({my_ctx}): negative-prompt drift"
    if cfg_scale > 1:
        assert any(neg is not None for _, _, neg in my_calls), "no uncond prompts captured"

    ref_text = ref_path.read_text() if hasattr(ref_path, "read_text") else open(ref_path).read()
    my_text = my_path.read_text() if hasattr(my_path, "read_text") else open(my_path).read()
    ref_secs, my_secs = _sections(ref_text), _sections(my_text)

    # hit objects byte-for-byte — the composed pipeline's end product
    assert my_secs.get("[HitObjects]", []) == ref_secs.get("[HitObjects]", [])
    assert len(my_secs.get("[HitObjects]", [])) > 0

    # timing points numerically (reference bytes go through the shim pack)
    ref_tps = [_timing_tuple(l) for l in ref_secs.get("[TimingPoints]", [])]
    my_tps = [_timing_tuple(l) for l in my_secs.get("[TimingPoints]", [])]
    assert my_tps == ref_tps
    assert len(my_tps) > 0

    # metadata / settings key-for-key
    for section in ("[General]", "[Metadata]", "[Difficulty]"):
        ref_kv, my_kv = _kv(ref_secs.get(section, [])), _kv(my_secs.get(section, []))
        # BeatmapID defaults may differ in representation; compare the rest
        ref_kv.pop("BeatmapID", None), my_kv.pop("BeatmapID", None)
        assert my_kv == ref_kv, f"{section}: {my_kv} != {ref_kv}"

    assert my_secs.get("[Events]", []) == ref_secs.get("[Events]", [])
