"""Benchmark: osuT5 decoder tokens/sec/chip on the flagship (v32) model shape.

Runs the compiled KV-cached decode loop on one chip with a realistic window:
v32 VarWhisper-small dimensions (d_model 768, 12+12 layers), bf16 compute,
2048-frame encoder window, sampled decoding with the full logit-processor
chain. Prints ONE JSON line. The reference publishes no throughput numbers
(BASELINE.md), so ``vs_baseline`` is null.
"""

from __future__ import annotations

import json
import time
import warnings

warnings.filterwarnings("ignore")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from mapperatorinator_tpu.config import compose, schema
    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import build_logits_pipeline, get_eos_token_ids
    from mapperatorinator_tpu.models import Mapperatorinator, MapperatorinatorConfig
    from mapperatorinator_tpu.models.transformer import TransformerConfig
    from mapperatorinator_tpu.osu import build_vocabulary
    from mapperatorinator_tpu.osu.events import EventType

    on_tpu = jax.devices()[0].platform != "cpu"
    # full v32 shape on TPU; tiny shape for CPU smoke runs
    if on_tpu:
        d_model, layers, heads, ffn = 768, 12, 12, 3072
        src_len, tgt_len = 2048, 2560
        gen_tokens = 512
    else:
        d_model, layers, heads, ffn = 64, 2, 4, 128
        src_len, tgt_len = 256, 384
        gen_tokens = 64

    args = compose("configs/train", "v32", schema_cls=schema.TrainConfig)
    args.data.src_seq_len = src_len
    args.data.tgt_seq_len = tgt_len
    vocab = build_vocabulary(args)

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

    hop = 128
    samples = jnp.zeros((1, hop * (src_len - 1)), jnp.float32)
    ids = jnp.ones((1, 16), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), frames=samples, decoder_input_ids=ids)

    engine = DecodeEngine(model, params, max_length=tgt_len)
    pipeline = build_logits_pipeline(
        vocab, temperature=0.9, timing_temperature=0.1, top_p=0.9, do_sample=True
    )
    # plain EOS only: random weights rarely emit EOS, so decode runs the full
    # budget and we measure steady-state tokens/sec
    eos_ids = [vocab.eos_id]

    rng = np.random.default_rng(0)
    audio = rng.standard_normal((1, hop * (src_len - 1))).astype(np.float32)
    encoder_states = engine.encode_with_cond(audio)
    prompt = np.concatenate(
        [[[vocab.sos_id]], rng.integers(vocab.offset, vocab.vocab_size_out, (1, 99))], axis=1
    ).astype(np.int32)

    max_len = prompt.shape[1] + gen_tokens

    # warmup (compile)
    tokens, _ = engine.generate(encoder_states, prompt, pipeline, eos_ids, seed=0, max_length=max_len)

    # timed runs: sync on the result arrays inside the window, count outside
    # (a host-side count is a device round-trip and would tax the tunnel)
    n_runs = 3
    results = []
    t0 = time.perf_counter()
    for i in range(n_runs):
        tokens, _ = engine.generate(encoder_states, prompt, pipeline, eos_ids, seed=i + 1, max_length=max_len)
        jax.block_until_ready(tokens)
        results.append(tokens)
    elapsed = time.perf_counter() - t0
    total_generated = sum(
        int(np.asarray(t != vocab.pad_id).sum()) - int((prompt != vocab.pad_id).sum()) for t in results
    )

    tok_per_s = total_generated / elapsed
    print(
        json.dumps(
            {
                "metric": "osuT5 decoder tokens/sec/chip (v32 shape, bf16, batch 1)",
                "value": round(tok_per_s, 2),
                "unit": "tokens/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
