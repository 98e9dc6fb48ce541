"""Benchmarks on 1 chip at the flagship (v32) model shape.

Headline: END-TO-END generation time for a 3-minute song — the BASELINE.json
north-star metric (reference semantics: /root/reference/inference.py:411-551,
timing pass -> sliding-window MAP/SV decode -> postprocess -> .osu). Random
weights can't emit trained EOS patterns, so each window's budget is capped at
a realistic per-window token count via tgt_seq_len=640 (trained models stop
at the lookahead-edge timeshift EOS range well before the cap).

Extras carried in the same JSON line:
* ``decode_tok_s_batch1`` — KV-cached sampled decode, batch 1 (v32 shape,
  bf16, full logit-processor chain). Profile note: measured practical weight
  streaming on this chip is ~273 GB/s for 1-row matmuls (probe in commit
  history); the 12-layer 768-d decoder reads ~240 MB/step, so ~1.3-1.4k
  tok/s IS that roofline — batch-1 steps/s stays ~constant up to batch 16,
  so throughput scales with batch instead.
* ``decode_tok_s_batch8`` — 8 windows batched (the parallel-mode TPU shape).

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time
import warnings

warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp
import numpy as np

HOP = 128


def build_engine(vocab, d_model, layers, heads, ffn, src_len, tgt_len):
    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.models import Mapperatorinator, MapperatorinatorConfig
    from mapperatorinator_tpu.models.transformer import TransformerConfig
    from mapperatorinator_tpu.osu.events import EventType

    backbone = TransformerConfig(
        vocab_size=vocab.vocab_size_out,
        d_model=d_model,
        encoder_layers=layers,
        decoder_layers=layers,
        encoder_heads=heads,
        decoder_heads=heads,
        encoder_ffn=ffn,
        decoder_ffn=ffn,
        max_source_positions=src_len // 2,
        max_target_positions=tgt_len,
        num_mel_bins=128,
        position_scheme="rope",
        norm="rms",
        conv_stem=True,
        tie_word_embeddings=False,
        dtype=jnp.bfloat16,
    )
    cfg = MapperatorinatorConfig(
        backbone=backbone,
        vocab_size_in=vocab.vocab_size_in,
        vocab_size_out=vocab.vocab_size_out,
        n_mels=128,
        spectrogram_log_scale=True,
        f_min=20,
        pad_mode="reflect",
        project_encoder_input=False,
        embed_decoder_input=True,
        rhythm_token_start=vocab.event_start[EventType.TIME_SHIFT],
        rhythm_token_end=vocab.event_end[EventType.TIME_SHIFT],
        max_target_positions=tgt_len,
    )
    model = Mapperatorinator(cfg)
    samples = jnp.zeros((1, HOP * (src_len - 1)), jnp.float32)
    ids = jnp.ones((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames=samples, decoder_input_ids=ids)
    return DecodeEngine(model, params, max_length=tgt_len, pad_token_id=vocab.pad_id)


def decode_tok_s(engine, vocab, batch, src_len, gen_tokens, seed0=0):
    """Steady-state sampled decode throughput at the given batch."""
    from mapperatorinator_tpu.decode.logits import build_logits_pipeline

    pipeline = build_logits_pipeline(
        vocab, temperature=0.9, timing_temperature=0.1, top_p=0.9, do_sample=True
    )
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((batch, HOP * (src_len - 1))).astype(np.float32)
    encoder_states = engine.encode_with_cond(jnp.asarray(audio))
    prompt = np.concatenate(
        [np.full((batch, 1), vocab.sos_id),
         rng.integers(vocab.offset, vocab.vocab_size_out, (batch, 99))], axis=1
    ).astype(np.int32)
    max_len = prompt.shape[1] + gen_tokens
    # plain EOS only: random weights rarely emit EOS -> full budget runs
    eos = [vocab.eos_id]

    tokens, _ = engine.generate(encoder_states, prompt, pipeline, eos, seed=seed0, max_length=max_len)
    jax.block_until_ready(tokens)

    n_runs = 3
    results = []
    t0 = time.perf_counter()
    for i in range(n_runs):
        tokens, _ = engine.generate(
            encoder_states, prompt, pipeline, eos, seed=seed0 + i + 1, max_length=max_len
        )
        jax.block_until_ready(tokens)
        results.append(tokens)
    elapsed = time.perf_counter() - t0
    prompt_tokens = int((prompt != vocab.pad_id).sum())
    total = sum(int(np.asarray(t != vocab.pad_id).sum()) - prompt_tokens for t in results)
    return total / elapsed


def e2e_3min_seconds(on_tpu: bool) -> float:
    """Full pipeline wall time: synthesized 3-min WAV -> timing pass ->
    sequential MAP/SV decode -> postprocess -> .osu (inference.generate)."""
    import sys
    import tempfile
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import inference
    from mapperatorinator_tpu.config import compose, schema
    from tests.fixtures.tiny_checkpoint import make_wav

    tmp = Path(tempfile.mkdtemp(prefix="bench_e2e_"))
    # CPU runs are a smoke test of the pipeline, not the metric
    song_seconds = 180.0 if on_tpu else 20.0
    wav_warm = make_wav(tmp / "warm.wav", seconds=25.0 if on_tpu else 8.0)
    wav = make_wav(tmp / "song.wav", seconds=song_seconds)

    args = compose("configs/inference", "v32", schema_cls=schema.InferenceConfig)
    if on_tpu:
        # full v32 encoder window; decode budget capped per window (see module
        # docstring) — vocab layout depends on the src window, not tgt
        args.train.data.tgt_seq_len = 640
        dims = dict(d_model=768, layers=12, heads=12, ffn=3072)
    else:
        args.train.data.src_seq_len = 256
        args.train.data.tgt_seq_len = 192
        dims = dict(d_model=64, layers=2, heads=4, ffn=128)

    from mapperatorinator_tpu.osu import build_vocabulary

    vocab = build_vocabulary(args.train)
    engine = build_engine(
        vocab, src_len=args.train.data.src_seq_len, tgt_len=args.train.data.tgt_seq_len, **dims
    )

    args.audio_path = str(wav)
    args.output_path = str(tmp)
    args.gamemode = 0
    args.difficulty = 5.0
    args.seed = 7
    args.super_timing = False
    args.generate_positions = False
    args.title, args.artist, args.creator, args.version = "Bench", "bench", "bench", "3min"
    args.bpm, args.offset = 120, 0
    inference.compile_args(args, vocab, verbose=False)
    generation_config, beatmap_config = inference.get_config(args)

    common = dict(
        generation_config=generation_config,
        beatmap_config=beatmap_config,
        engine=engine,
        vocab=vocab,
        verbose=False,
    )
    def run_once(audio):
        try:
            return inference.generate(args, audio_path=str(audio), output_path=str(tmp), **common)
        except Exception:
            # random weights can emit zero TIMING events in the timing pass;
            # fall back to fixed bpm/offset timing so the benchmark still
            # exercises the MAP/SV decode + postprocess path
            from mapperatorinator_tpu.osu.events import ContextType

            args.output_type = [ContextType.MAP, ContextType.SV]
            return inference.generate(args, audio_path=str(audio), output_path=str(tmp), **common)

    # warmup: compile the prompt buckets on a short clip
    run_once(wav_warm)

    t0 = time.perf_counter()
    _, result_path = run_once(wav)
    elapsed = time.perf_counter() - t0
    assert Path(result_path).exists()
    return elapsed


def dit_refine_seconds(on_tpu: bool) -> float:
    """BASELINE measurement config #3: DiT DDIM coordinate refinement over a
    3-minute object stream (chunked banded sampling with CFG dual-half;
    reference: diffusion_pipeline.py:111-284, configs respacing [100,0,...])."""
    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.diffusion.vocab import DiffusionVocab
    from mapperatorinator_tpu.infer.diffusion_pipeline import DiffusionPipeline
    from mapperatorinator_tpu.infer.processor import GenerationConfig
    from mapperatorinator_tpu.models.dit import DiT, DiTConfig
    from mapperatorinator_tpu.osu.events import Event, EventType

    args = compose("configs/inference", "v32", schema_cls=schema.InferenceConfig)
    args.seed = 0
    vocab = DiffusionVocab(num_cs_classes=1)
    if on_tpu:
        dit_cfg = DiTConfig.from_name("DiT-B", context_size=272, class_size=vocab.num_tokens)
        n_objects, steps = 720, 100  # ~4 obj/s over 3 minutes; [100,0,...] respacing
    else:
        dit_cfg = DiTConfig(in_channels=2, context_size=272, hidden_size=32,
                            depth=1, num_heads=2, class_size=vocab.num_tokens)
        n_objects, steps = 64, 8
    args.timesteps = [steps]
    args.diffusion.model.diffusion_steps = 1000 if on_tpu else 8

    model = DiT(dit_cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 8, dit_cfg.in_channels)),
        jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, 8, dit_cfg.context_size)),
        jnp.zeros((2, dit_cfg.class_size)),
    )
    pipeline = DiffusionPipeline(args, (model, params), vocab=vocab)

    events = []
    for i in range(n_objects):
        events += [
            Event(EventType.TIME_SHIFT, 250 * i),
            Event(EventType.DISTANCE, 80),
            Event(EventType.CIRCLE),
        ]
    cfg = GenerationConfig()
    pipeline.generate(events[: 3 * 16], cfg, timing=None, verbose=False)  # compile warmup
    t0 = time.perf_counter()
    out = pipeline.generate(events, cfg, timing=None, verbose=False)
    elapsed = time.perf_counter() - t0
    assert any(e.type == EventType.POS_X for e in out)
    return elapsed


def main() -> None:
    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.osu import build_vocabulary

    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu:
        dims = dict(d_model=768, layers=12, heads=12, ffn=3072)
        src_len, tgt_len, gen_tokens = 2048, 2560, 512
    else:  # CPU smoke shape
        dims = dict(d_model=64, layers=2, heads=4, ffn=128)
        src_len, tgt_len, gen_tokens = 256, 384, 64

    args = compose("configs/train", "v32", schema_cls=schema.TrainConfig)
    args.data.src_seq_len = src_len
    args.data.tgt_seq_len = tgt_len
    vocab = build_vocabulary(args)

    engine = build_engine(vocab, src_len=src_len, tgt_len=tgt_len, **dims)
    tok_s_b1 = decode_tok_s(engine, vocab, batch=1, src_len=src_len, gen_tokens=gen_tokens)
    tok_s_b8 = decode_tok_s(engine, vocab, batch=8, src_len=src_len, gen_tokens=gen_tokens)
    # full decode window (parallel-mode production shape; exercises the
    # bucketed live-prefix cache attention)
    full_gen = tgt_len - 160
    tok_s_b8_full = decode_tok_s(engine, vocab, batch=8, src_len=src_len, gen_tokens=full_gen)
    del engine

    e2e = e2e_3min_seconds(on_tpu)
    dit_secs = dit_refine_seconds(on_tpu)

    print(
        json.dumps(
            {
                "metric": "end-to-end 3-min-song generation (1 chip, v32 shape, timing+map+sv+postprocess)",
                "value": round(e2e, 2),
                "unit": "s",
                "vs_baseline": None,
                "extra": {
                    "e2e_3min_seconds": round(e2e, 2),
                    "decode_tok_s_batch1": round(tok_s_b1, 1),
                    "decode_tok_s_batch8": round(tok_s_b8, 1),
                    "decode_tok_s_batch8_full_window": round(tok_s_b8_full, 1),
                    "dit_ddim_refine_3min_seconds": round(dit_secs, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
