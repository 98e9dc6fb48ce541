"""Pallas attention kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.ops.attention_kernel import flash_attention


def ref_attn(q, k, v, kv_mask=None, causal=False, window=0):
    d = q.shape[-1]
    t, s = q.shape[1], k.shape[1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * d**-0.5
    qp = jnp.arange(t)[:, None]
    kp = jnp.arange(s)[None, :]
    m = jnp.ones((t, s), bool)
    if causal:
        m = m & (kp <= qp)
    if window:
        m = m & (jnp.abs(qp - kp) <= window // 2)
    m = m[None, None]
    if kv_mask is not None:
        m = m & kv_mask[:, None, None, :]
    logits = jnp.where(m, logits, jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(logits, -1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))


@pytest.mark.parametrize(
    "t,s,causal,window,masked",
    [
        (64, 64, False, 0, False),
        (64, 64, True, 0, True),
        (64, 64, False, 16, True),
        (50, 70, False, 0, True),  # cross attention, unpadded t
        (64, 64, True, 16, False),
    ],
)
def test_matches_reference(t, s, causal, window, masked):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, t, 2, 32)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, s, 2, 32)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, s, 2, 32)), jnp.float32)
    kvm = jnp.asarray(rng.random((2, s)) > 0.2) if masked else None
    out = flash_attention(q, k, v, kvm, causal=causal, window=window, block_q=32)
    ref = ref_attn(q, k, v, kvm, causal=causal, window=window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 32, 2, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 32, 2, 16)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 32, 2, 16)), jnp.float32)
    kvm = jnp.asarray(rng.random((1, 32)) > 0.2)

    def f_flash(q, k, v):
        return (flash_attention(q, k, v, kvm, causal=True, block_q=16) ** 2).mean()

    def f_ref(q, k, v):
        return (ref_attn(q, k, v, kvm, causal=True) ** 2).mean()

    gf = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_model_level_flash_matches_xla(monkeypatch):
    """Transformer forward with the Pallas path (forced eligible, interpret
    mode) matches the XLA composite exactly on CPU."""
    import mapperatorinator_tpu.models.transformer as tr

    monkeypatch.setattr(
        tr.Attention,
        "_flash_eligible",
        lambda self, cache, pos_bias, attn_mask, q, k: (
            self.config.use_flash_attention
            and cache is None
            and pos_bias is None
            and self.config.attention_scale
            and (
                attn_mask is None
                or (attn_mask.ndim == 4 and attn_mask.shape[1] == 1 and attn_mask.shape[2] == 1)
            )
        ),
    )
    rng = np.random.default_rng(0)
    base = dict(
        vocab_size=128, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=128, decoder_ffn=128,
        max_source_positions=128, max_target_positions=256, num_mel_bins=64,
        position_scheme="rope", norm="rms", conv_stem=True, local_attention=64,
        global_attn_every_n_layers=2,
    )
    feats = jnp.asarray(rng.normal(size=(2, 256, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 120, (2, 96)), jnp.int32)
    dmask = jnp.asarray(rng.random((2, 96)) > 0.2)
    m_f = tr.OsuTransformer(tr.TransformerConfig(**base, use_flash_attention=True))
    m_x = tr.OsuTransformer(tr.TransformerConfig(**base, use_flash_attention=False))
    params = m_x.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=ids)
    out_f = m_f.apply(params, features=feats, decoder_input_ids=ids, decoder_attention_mask=dmask)
    out_x = m_x.apply(params, features=feats, decoder_input_ids=ids, decoder_attention_mask=dmask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=1e-4)
