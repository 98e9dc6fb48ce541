"""int8 KV cache decode (TransformerConfig.quantized_kv).

The cache stores int8 values + per-token-per-head fp32 scales; reads
dequantize (after the live-prefix slice on the bucketed path). Locks:
quantization roundtrip error bounds, stepwise decode closeness to the fp
cache, bucketed == full-read equality under quantization, and the engine
running end-to-end with the flag.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mapperatorinator_tpu.models.transformer import (
    OsuTransformer,
    TransformerConfig,
    dequantize_kv,
    quantize_kv,
)

BASE = dict(
    vocab_size=64, d_model=32, encoder_layers=2, decoder_layers=2,
    encoder_heads=2, decoder_heads=2, encoder_ffn=64, decoder_ffn=64,
    max_source_positions=16, max_target_positions=64, num_mel_bins=32,
    position_scheme="rope", norm="rms", conv_stem=False,
)


def test_quantize_kv_roundtrip_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 16)), jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (2, 5, 3)
    back = dequantize_kv(q, s, jnp.float32)
    # max-abs symmetric int8: error bounded by scale/2 = max|x|/254 per token/head
    bound = np.asarray(jnp.max(jnp.abs(x), axis=-1) / 254.0 + 1e-6)
    err = np.asarray(jnp.abs(back - x).max(axis=-1))
    assert (err <= bound).all()


def _setup(quantized: bool, max_len: int = 48, batch: int = 2, bucket: int = 256):
    cfg = TransformerConfig(**BASE, quantized_kv=quantized, decode_attend_bucket=bucket)
    model = OsuTransformer(cfg)
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(batch, 8, 32)), jnp.float32)
    params = OsuTransformer(TransformerConfig(**BASE)).init(
        jax.random.PRNGKey(0), features=feats, decoder_input_ids=jnp.ones((batch, 4), jnp.int32)
    )
    enc = model.apply(params, feats, method=OsuTransformer.encode)
    cache = model.apply(params, batch, max_len, enc,
                        method=lambda m, b, l, e: m.init_cache(b, l, e))
    return model, params, enc, cache


def _roll(model, params, cache, ids):
    """Feed ids one step at a time; returns stacked logits."""
    logits_all = []
    b = ids.shape[0]
    for i in range(ids.shape[1]):
        emb = model.apply(params, ids[:, i : i + 1],
                          method=lambda m, t: m.decoder.embed(t))
        logits, cache = model.apply(
            params, emb, cache, i,
            method=lambda m, e, c, j: m.decode_step(
                e, c, j, positions=jnp.full((b, 1), i, jnp.int32)),
        )
        logits_all.append(np.asarray(logits[:, 0], np.float32))
    return np.stack(logits_all, axis=1), cache


def test_quantized_cache_structure_and_closeness():
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(3, 60, (2, 10)), jnp.int32)

    model_fp, params, enc, cache_fp = _setup(False)
    model_q, _, _, cache_q = _setup(True)
    # int8 self cache + scales; quantized cross cache
    self_c = cache_q[0]["self"]
    assert self_c["k"].dtype == jnp.int8 and "k_scale" in self_c
    assert cache_q[0]["cross"]["k"].dtype == jnp.int8

    lg_fp, _ = _roll(model_fp, params, cache_fp, ids)
    lg_q, _ = _roll(model_q, params, cache_q, ids)
    rel = np.abs(lg_fp - lg_q).max() / (np.abs(lg_fp).max() + 1e-9)
    assert rel < 0.08, f"quantized-KV logits drifted too far: rel={rel}"


def test_quantized_bucketed_matches_full_reads():
    """With the bucketed live-prefix path enabled (batch>=2, small bucket),
    quantized decode must equal the quantized full-read decode exactly —
    the slice/dequant order must not change numerics."""
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, 60, (2, 12)), jnp.int32)

    model_b, params, enc, cache_b = _setup(True, bucket=16)
    # same config but bucket disabled -> full cache reads
    cfg_full = dataclasses.replace(model_b.config, decode_attend_bucket=0)
    model_f = OsuTransformer(cfg_full)
    cache_f = jax.tree.map(lambda x: x, cache_b)

    assert cache_b[0]["self"]["k"].shape[1] > model_b.config.decode_attend_bucket
    lg_b, _ = _roll(model_b, params, cache_b, ids)
    lg_f, _ = _roll(model_f, params, cache_f, ids)
    np.testing.assert_array_equal(lg_b, lg_f)


def test_engine_generate_with_quantized_kv():
    from mapperatorinator_tpu.decode import DecodeEngine
    from mapperatorinator_tpu.decode.logits import LogitsPipeline

    model, params, enc, _ = _setup(True)
    engine = DecodeEngine(model, params, max_length=24, pad_token_id=0)
    pipeline = LogitsPipeline(vocab_size=64, time_start=0, time_end=0,
                              sos_ids=(), eos_ids=(2,))
    prompt = np.full((2, 1), 1, np.int32)
    tokens, cur_len = engine.generate(enc, prompt, pipeline, eos_ids=[2], seed=0)
    tokens = np.asarray(tokens)
    assert tokens.shape[0] == 2 and tokens.dtype.kind == "i"
    assert np.isfinite(np.asarray(cur_len)).all()
