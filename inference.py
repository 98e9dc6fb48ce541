"""Beatmap-generation CLI — the framework's primary public entry point.

Usage mirrors the reference (reference: ``inference.py:77-702``)::

    python inference.py audio_path=song.mp3 output_path=out/ gamemode=0 difficulty=5
    python inference.py -cn v32 beatmap_path=ref.osu add_to_beatmap=true

Hydra-style dotted overrides compose onto ``configs/inference/<name>.yaml``
(default v32). Orchestration: timing generation (super-timing ensemble or a
TIMING-context pass) -> main windowed decode -> optional DiT position
diffusion -> resnap -> render -> write .osu/.osz.
"""

from __future__ import annotations

import logging
import random
import sys
import uuid
import warnings
from functools import reduce
from pathlib import Path
from typing import Optional

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.osu import Beatmap, ContextType
from mapperatorinator_tpu.osu.rendering import (
    BeatmapConfig,
    Renderer,
    background_line,
    beatmap_config_from_beatmap,
)
from mapperatorinator_tpu.osu.streams import TIMING_TYPES, events_of_type, merge_events


def get_default_logger():
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    return logging.getLogger("mapperatorinator")


# ---------------------------------------------------------------------------
# arg compilation (reference: inference.py:77-330)
# ---------------------------------------------------------------------------


def compile_device_and_seed(args, verbose=True) -> None:
    import jax

    if args.device == "cpu":
        # honor an explicit CPU request (reference: inference.py device=
        # moves the model) even on accelerator hosts; only possible before
        # the backend initializes. Accelerator names stay best-effort — the
        # schema default is "tpu" and must not error on CPU-only hosts.
        try:
            if jax.config.jax_platforms != "cpu":
                jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    platform = jax.devices()[0].platform
    if args.device == "auto":
        args.device = platform
        if verbose:
            print(f"Using {platform} for inference (auto-selected).")
    elif args.device == "cpu" and platform != "cpu" and verbose:
        print(f"Requested device=cpu but the {platform} backend is already active.")
    if args.seed is None:
        args.seed = random.randint(0, 2**16)
        if verbose:
            print(f"Random seed: {args.seed}")


def compile_paths(args) -> None:
    beatmap_path = Path(args.beatmap_path) if args.beatmap_path else None
    output_path = Path(args.output_path) if args.output_path else None
    audio_path = Path(args.audio_path) if args.audio_path else None

    if beatmap_path:
        if not beatmap_path.exists():
            raise ValueError(f"Beatmap file not found: {beatmap_path}")
        if beatmap_path.suffix.lower() != ".osu":
            raise ValueError(f"Beatmap file must have .osu extension: {beatmap_path}")
        beatmap = Beatmap.from_path(beatmap_path)
        if not audio_path and beatmap.audio_filename:
            audio_path = beatmap_path.parent / beatmap.audio_filename
        if not output_path:
            output_path = beatmap_path.parent
    elif audio_path and audio_path.exists() and not output_path:
        output_path = audio_path.parent

    valid_ext = {".mp3", ".wav", ".ogg", ".m4a", ".flac"}
    if not audio_path:
        raise ValueError("Audio file path is required.")
    if not audio_path.exists():
        raise ValueError(f"Audio file not found: {audio_path}")
    if audio_path.suffix.lower() not in valid_ext:
        raise ValueError(f"Audio file must have one of: {', '.join(sorted(valid_ext))}: {audio_path}")

    args.audio_path = str(audio_path)
    args.output_path = str(output_path) if output_path else ""
    args.beatmap_path = str(beatmap_path) if beatmap_path else ""


def compile_args_from_beatmap(args, vocab, verbose=True) -> None:
    from mapperatorinator_tpu.infer.processor import generation_config_from_beatmap

    beatmap_path = Path(args.beatmap_path)
    beatmap = Beatmap.from_path(beatmap_path)

    if beatmap.mode not in args.train.data.gamemodes and (
        any(c in (ContextType.MAP, ContextType.GD, ContextType.NO_HS) for c in args.in_context)
        or args.add_to_beatmap
    ):
        raise ValueError(
            f"Reference beatmap mode {beatmap.mode} is not supported by the model. "
            f"Supported modes: {args.train.data.gamemodes}"
        )

    gen_cfg = generation_config_from_beatmap(beatmap, beatmap_path, vocab)
    bm_cfg = beatmap_config_from_beatmap(beatmap)

    autofill = {
        "gamemode": gen_cfg.gamemode,
        "beatmap_id": gen_cfg.beatmap_id,
        "difficulty": gen_cfg.difficulty,
        "mapper_id": gen_cfg.mapper_id,
        "descriptors": gen_cfg.descriptors,
        "hp_drain_rate": gen_cfg.hp_drain_rate,
        "circle_size": gen_cfg.circle_size,
        "overall_difficulty": gen_cfg.overall_difficulty,
        "approach_rate": gen_cfg.approach_rate,
        "slider_multiplier": gen_cfg.slider_multiplier,
        "slider_tick_rate": gen_cfg.slider_tick_rate,
        "hitsounded": gen_cfg.hitsounded,
        "keycount": gen_cfg.keycount,
        "hold_note_ratio": gen_cfg.hold_note_ratio,
        "scroll_speed_ratio": gen_cfg.scroll_speed_ratio,
        "bpm": bm_cfg.bpm,
        "offset": bm_cfg.offset,
        "title": bm_cfg.title,
        "title_unicode": bm_cfg.title_unicode,
        "artist": bm_cfg.artist,
        "artist_unicode": bm_cfg.artist_unicode,
        "creator": bm_cfg.creator,
        "version": bm_cfg.version,
        "source": bm_cfg.source,
        "background": str(beatmap_path.parent / beatmap.background) if beatmap.background else None,
        "preview_time": bm_cfg.preview_time,
    }
    for key, value in autofill.items():
        if getattr(args, key) is None and value is not None:
            setattr(args, key, value)
            if verbose:
                print(f"Using beatmap {key} {value}")


DEFAULT_ARGS = {
    "gamemode": 0,
    "hitsounded": True,
    "keycount": 4,
    "hp_drain_rate": 5,
    "circle_size": 4,
    "overall_difficulty": 8,
    "approach_rate": 9,
    "slider_multiplier": 1.4,
    "slider_tick_rate": 1,
    "bpm": 120,
    "offset": 0,
    "title": "Unknown Title",
    "artist": "Unknown Artist",
    "creator": "Mapperatorinator",
    "version": "Mapperatorinator",
    "source": "",
    "preview_time": -1,
}


def compile_default_args(args, verbose=True) -> None:
    for key, value in DEFAULT_ARGS.items():
        if getattr(args, key) is None:
            setattr(args, key, value)
            if verbose:
                print(f"Using default {key} {value}")


def compile_derived_args(args) -> None:
    if args.title_unicode is None:
        args.title_unicode = args.title
    if args.artist_unicode is None:
        args.artist_unicode = args.artist
    if args.tags is None:
        args.tags = ""


def compile_args(args, vocab=None, verbose=True) -> None:
    compile_device_and_seed(args, verbose=verbose)
    compile_paths(args)
    if args.beatmap_path:
        compile_args_from_beatmap(args, vocab, verbose=verbose)
    else:
        compile_default_args(args, verbose=verbose)
    compile_derived_args(args)


def get_config(args):
    from mapperatorinator_tpu.infer.processor import GenerationConfig

    return GenerationConfig(
        gamemode=args.gamemode,
        beatmap_id=args.beatmap_id,
        difficulty=args.difficulty,
        mapper_id=args.mapper_id,
        year=args.year,
        hitsounded=args.hitsounded,
        hp_drain_rate=args.hp_drain_rate,
        circle_size=args.circle_size,
        overall_difficulty=args.overall_difficulty,
        approach_rate=args.approach_rate,
        slider_multiplier=args.slider_multiplier,
        slider_tick_rate=args.slider_tick_rate,
        keycount=args.keycount,
        hold_note_ratio=args.hold_note_ratio,
        scroll_speed_ratio=args.scroll_speed_ratio,
        descriptors=args.descriptors,
        negative_descriptors=args.negative_descriptors,
    ), BeatmapConfig(
        title=str(args.title),
        title_unicode=str(args.title_unicode),
        artist=str(args.artist),
        artist_unicode=str(args.artist_unicode),
        audio_filename=Path(args.audio_path).name,
        hp_drain_rate=args.hp_drain_rate,
        circle_size=(args.keycount if args.gamemode == 3 else args.circle_size) or 4,
        overall_difficulty=args.overall_difficulty,
        approach_rate=args.approach_rate,
        slider_multiplier=args.slider_multiplier,
        slider_tick_rate=args.slider_tick_rate,
        creator=str(args.creator),
        version=str(args.version),
        source=str(args.source or ""),
        tags=str(args.tags or ""),
        background_line=background_line(args.background),
        preview_time=args.preview_time,
        bpm=args.bpm,
        offset=args.offset,
        mode=args.gamemode,
    )


def supports_explicit_timing_output(args) -> bool:
    return any(ContextType.TIMING in ct["out"] for ct in args.train.data.context_types)


def should_generate_timing_context(args, output_type) -> bool:
    has_empty_or_none = len(args.in_context) == 0 or ContextType.NONE in args.in_context
    return (
        has_empty_or_none
        and supports_explicit_timing_output(args)
        and any(ct in output_type for ct in (ContextType.TIMING, ContextType.MAP))
    )


# ---------------------------------------------------------------------------
# generation orchestration (reference: inference.py:411-551)
# ---------------------------------------------------------------------------


def generate(
    args,
    *,
    generation_config,
    beatmap_config,
    engine,
    vocab,
    audio_path=None,
    beatmap_path=None,
    output_path=None,
    timing_engine=None,
    timing_vocab=None,
    diff_model=None,
    refine_model=None,
    verbose=True,
    logger=None,
    client=None,
):
    from mapperatorinator_tpu.infer import Preprocessor, Processor

    audio_path = args.audio_path if audio_path is None else audio_path
    beatmap_path = args.beatmap_path if beatmap_path is None else beatmap_path
    output_path = args.output_path if output_path is None else output_path
    logger = get_default_logger() if logger is None else logger

    if not Path(audio_path).is_file():
        raise FileNotFoundError(f"Provided audio file path does not exist: {audio_path}")
    if beatmap_path and not Path(beatmap_path).is_file():
        raise FileNotFoundError(f"Provided beatmap file path does not exist: {beatmap_path}")
    if (not output_path) and (not args.add_to_beatmap or not args.overwrite_reference_beatmap or args.export_osz):
        raise ValueError("Output path is required.")

    preprocessor = Preprocessor(args, parallel=args.parallel)
    processor = Processor(args, engine, vocab, client=client)
    renderer = Renderer(args, logger=logger)

    audio = preprocessor.load(audio_path)
    sequences = preprocessor.segment(audio)
    extra_in_context = {}
    output_type = list(args.output_type)
    timing_engine = engine if timing_engine is None else timing_engine
    timing_vocab = vocab if timing_vocab is None else timing_vocab

    timing_events, timing = None, None
    if args.super_timing and (len(args.in_context) == 0 or ContextType.NONE in args.in_context):
        from mapperatorinator_tpu.infer.super_timing import SuperTimingGenerator

        stg = SuperTimingGenerator(args, timing_engine, timing_vocab)
        timing_events, _ = stg.generate(audio, generation_config, verbose=verbose)
        timing = renderer.generate_timing(timing_events) if timing_events else None
        if timing:
            extra_in_context[ContextType.TIMING] = timing
        else:
            timing = None
            if verbose:
                logger.warning(
                    "super-timing ensemble produced no usable timing; falling "
                    "back to the fixed bpm/offset redline"
                )
        if ContextType.TIMING in output_type:
            output_type.remove(ContextType.TIMING)
    elif should_generate_timing_context(args, output_type):
        timing_processor = Processor(args, timing_engine, timing_vocab, client=client if timing_engine is engine else None)
        timing_events, timing_times = timing_processor.generate(
            sequences=sequences,
            generation_config=generation_config,
            in_context=[ContextType.NONE],
            out_context=[ContextType.TIMING],
            beatmap_path=beatmap_path,
            verbose=verbose,
        )[0]
        timing_events, timing_times = events_of_type(timing_events, timing_times, TIMING_TYPES)
        timing = renderer.generate_timing(timing_events) if timing_events else None
        if timing:
            extra_in_context[ContextType.TIMING] = timing
        else:
            timing = None
            if verbose:
                logger.warning(
                    "timing pass produced no usable timing; falling back to "
                    "the fixed bpm/offset redline"
                )
        if ContextType.TIMING in output_type:
            output_type.remove(ContextType.TIMING)
    elif ContextType.TIMING in args.in_context or (
        args.train.data.add_timing and any(t in args.in_context for t in (ContextType.GD, ContextType.NO_HS))
    ):
        timing = [tp for tp in Beatmap.from_path(Path(beatmap_path)).timing_points if tp.parent is None]

    if len(output_type) > 0:
        result = processor.generate(
            sequences=sequences,
            generation_config=generation_config,
            in_context=args.in_context,
            out_context=output_type,
            beatmap_path=beatmap_path,
            extra_in_context=extra_in_context,
            verbose=verbose,
        )
        events, _ = reduce(merge_events, result)

        if timing is None and (ContextType.TIMING in args.output_type or args.train.data.add_timing):
            if any(e.type in TIMING_TYPES for e in events):
                timing = renderer.generate_timing(events)
        if args.resnap_events and timing is not None:
            events = renderer.resnap_events(events, timing)
    else:
        events = timing_events

    if args.generate_positions and args.gamemode in (0, 2) and ContextType.MAP in output_type and diff_model is not None:
        from mapperatorinator_tpu.infer.diffusion_pipeline import DiffusionPipeline

        pipeline = DiffusionPipeline(args, diff_model, refine_model)
        events = pipeline.generate(events=events, generation_config=generation_config, timing=timing, verbose=verbose)

    result_str = renderer.generate(events=events, beatmap_config=beatmap_config, timing=timing)

    if args.add_to_beatmap:
        result_str = renderer.add_to_beatmap(result_str, beatmap_path)
        if verbose:
            logger.info("Merged generated content with reference beatmap")

    if args.add_to_beatmap and args.overwrite_reference_beatmap:
        output_osu_path = Path(beatmap_path)
    else:
        output_osu_path = Path(output_path) / f"beatmap{uuid.uuid4().hex}.osu"

    if args.export_osz:
        result_path = Path(output_path) / f"beatmap{uuid.uuid4().hex}.osz"
        renderer.export_osz(str(result_path), result_str, output_osu_path.name, audio_path, args.background)
        if verbose:
            logger.info(f"Generated .osz saved to {result_path}")
    else:
        result_path = output_osu_path
        renderer.write_result(str(result_path), result_str)
        if verbose:
            logger.info(f"Generated beatmap saved to {result_path}")

    return result_str, result_path


def load_model(args, auto_select_gamemode_model: Optional[bool] = None):
    """Load (engine, vocab) from args.model_path (native or HF-format dir),
    preferring a gamemode=N fine-tune subfolder and merging a compatible LoRA
    adapter (reference: model_utils.py:269-301, 399-406)."""
    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.models.io import load_checkpoint
    from mapperatorinator_tpu.models.lora import (
        get_model_checkpoint_subfolder,
        load_lora,
        merge_lora,
        resolve_model_checkpoint_path,
        resolve_compatible_lora_path,
    )

    if auto_select_gamemode_model is None:
        auto_select_gamemode_model = getattr(args, "auto_select_gamemode_model", True)
    ckpt_path = resolve_model_checkpoint_path(
        args.model_path, gamemode=args.gamemode,
        auto_select_gamemode_model=auto_select_gamemode_model,
    )
    if str(ckpt_path) != str(args.model_path):
        print(f"Using gamemode-specific model checkpoint: {ckpt_path}")
    model, params, vocab = load_checkpoint(ckpt_path)
    if vocab is None:
        from mapperatorinator_tpu.osu import build_vocabulary

        vocab = build_vocabulary(args.train)

    # honor the inference `precision` flag (reference model_utils.py loads at
    # args.precision): replace the COMPUTE dtype only — params stay as stored,
    # so fp32<->bf16 switches cost nothing and respect flax mixed precision
    import jax.numpy as jnp

    prec = str(getattr(args, "precision", "") or "").lower()
    want_dtype = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                  "fp16": jnp.bfloat16, "float16": jnp.bfloat16,
                  "fp32": jnp.float32, "float32": jnp.float32}.get(prec)
    if want_dtype is not None and model.config.backbone.dtype != want_dtype:
        import dataclasses

        from mapperatorinator_tpu.models import Mapperatorinator

        model = Mapperatorinator(dataclasses.replace(
            model.config,
            backbone=dataclasses.replace(model.config.backbone, dtype=want_dtype),
        ))

    lora_path, lora_config = resolve_compatible_lora_path(
        getattr(args, "lora_path", None), get_model_checkpoint_subfolder(ckpt_path)
    )
    if lora_path is not None:
        lora_params, lora_config = load_lora(lora_path, params)
        params = merge_lora(params, lora_params, alpha=lora_config.get("lora_alpha", 128.0))
        print(f"Loaded LoRA weights from {lora_path}")

    if getattr(args, "quantized_weights", False):
        from mapperatorinator_tpu.models.io import quantize_checkpoint

        model, params = quantize_checkpoint(model, params)
        print("Quantized decode weights to int8 (weight-only, fused qmm kernel)")

    if getattr(args, "quantized_kv", False):
        import dataclasses

        from mapperatorinator_tpu.models import Mapperatorinator

        model = Mapperatorinator(dataclasses.replace(
            model.config,
            backbone=dataclasses.replace(model.config.backbone, quantized_kv=True),
        ))
        print("Using int8 KV cache for decode")

    engine = DecodeEngine(model, params, max_length=args.train.data.tgt_seq_len, pad_token_id=vocab.pad_id)
    return engine, vocab



def load_diffusion_model(ckpt_path):
    """Load a DiT bundle exported by diffusion_train.py (dit_config.json +
    params.msgpack with EMA weights). Returns (model, params) or None when the
    path is missing (reference: inference.py:659-682 loads diff_ckpt)."""
    import json

    import flax
    import jax
    import jax.numpy as jnp

    from mapperatorinator_tpu.models.dit import DiT, DiTConfig

    path = Path(ckpt_path)
    if not ckpt_path or not (path / "params.msgpack").exists():
        return None
    with open(path / "dit_config.json", encoding="utf-8") as f:
        cfg = DiTConfig(**json.load(f))
    model = DiT(cfg)
    seq = 8
    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, seq, cfg.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, seq, cfg.context_size)),
        jnp.zeros((1, cfg.class_size)),
    )
    with open(path / "params.msgpack", "rb") as f:
        params = flax.serialization.from_bytes(template, f.read())
    return model, params


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    config_name = "v32"
    overrides = []
    i = 0
    while i < len(argv):
        if argv[i] in ("-cn", "--config-name"):
            config_name = argv[i + 1]
            i += 2
        else:
            overrides.append(argv[i])
            i += 1

    args = compose(REPO_ROOT / "configs" / "inference", config_name, overrides=overrides,
                   schema_cls=schema.InferenceConfig)
    return run(args)


def should_load_separate_timing_model(args, output_type=None) -> bool:
    """True when a gamemode fine-tune was auto-selected but timing must be
    generated: timing then comes from the base (all-gamemode) checkpoint
    (reference: inference.py:388-408)."""
    from mapperatorinator_tpu.models.lora import resolve_model_checkpoint_path

    output_type = args.output_type if output_type is None else output_type
    needs_generated_timing = (
        args.super_timing and (len(args.in_context) == 0 or ContextType.NONE in args.in_context)
    ) or should_generate_timing_context(args, output_type)
    if not needs_generated_timing:
        return False
    current = resolve_model_checkpoint_path(
        args.model_path, gamemode=args.gamemode,
        auto_select_gamemode_model=getattr(args, "auto_select_gamemode_model", True),
    )
    base = resolve_model_checkpoint_path(
        args.model_path, gamemode=args.gamemode, auto_select_gamemode_model=False
    )
    return str(current) != str(base)


def warm_engine(engine, train_args) -> None:
    """Compile the engine's prompt-bucket prefill ladder for the serving
    batch shapes (B=1 timing pass, B=2 CFG dual batch) ahead of the first
    request (``inference.precompile=true``)."""
    import jax.numpy as jnp
    import numpy as np

    n = (train_args.data.src_seq_len - 1) * train_args.data.hop_length
    enc = engine.encode_with_cond(np.zeros((1, n), np.float32))
    engine.precompile(enc)
    engine.precompile(jnp.concatenate([enc, enc], axis=0))


def run(args):
    """Everything after config composition: load models, compile args, and
    generate. Programmatic entry used by web_ui / calc_fid / colab (the
    reference reuses ``generate(...)`` the same way, inference.py:411)."""
    engine, vocab = load_model(args)
    compile_args(args, vocab)

    timing_engine, timing_vocab = None, None
    if should_load_separate_timing_model(args):
        print("Using base model for timing generation.")
        timing_engine, timing_vocab = load_model(args, auto_select_gamemode_model=False)

    if getattr(args, "precompile", False):
        # serving warmup: compile every prompt-bucket prefill program now so
        # no request ever pays a bucket-miss compile (the expensive decode
        # loop is prompt-length independent and compiles on the first
        # request per pipeline; see decode/engine.py compilation strategy)
        warm_engine(engine, args.train)
        if timing_engine is not None:
            warm_engine(timing_engine, args.train)

    client = None
    if args.use_server:
        # cross-process batching daemon keyed on the model identity: the
        # first process spawns it in-process, further processes connect
        # (reference: inference.py:584-617)
        from mapperatorinator_tpu.infer.server import (
            InferenceClient,
            InferenceServer,
            get_server_address,
            make_engine_generate_fn,
        )

        sock = get_server_address(args.model_path, getattr(args, "lora_path", None), args.gamemode)
        client = InferenceClient(
            server_factory=lambda: InferenceServer(
                make_engine_generate_fn(engine, vocab),
                max_batch_size=args.max_batch_size,
                socket_path=sock,
            ),
            socket_path=sock,
        )

    diff_model, refine_model = None, None
    if args.generate_positions:
        diff_model = load_diffusion_model(args.diff_ckpt)
        refine_model = load_diffusion_model(args.diff_refine_ckpt)
        if diff_model is None:
            print(f"diffusion checkpoint {args.diff_ckpt!r} not found; positions stay as generated")

    generation_config, beatmap_config = get_config(args)
    return generate(
        args,
        generation_config=generation_config,
        beatmap_config=beatmap_config,
        engine=engine,
        vocab=vocab,
        client=client,
        timing_engine=timing_engine,
        timing_vocab=timing_vocab,
        diff_model=diff_model,
        refine_model=refine_model,
    )


if __name__ == "__main__":
    main()
