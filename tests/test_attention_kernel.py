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


# ---------------------------------------------------------------------------
# chunked banded attention (O(T·window) sliding-window path)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("with_padding", [False, True])
def test_banded_chunked_matches_full_mask(causal, with_padding):
    """_attend_banded_chunked attends EXACTLY the |q-k| <= window//2 band
    (with causal/padding folded in), so it must reproduce the full masked
    _attend to fp tolerance."""
    import mapperatorinator_tpu.models.transformer as tr

    rng = np.random.default_rng(0)
    b, t, h, d, window = 2, 256, 2, 16, 64
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    key_mask = jnp.asarray(rng.random((b, t)) > 0.15) if with_padding else None

    pos = jnp.arange(t)
    full = tr.sliding_window_mask(pos, pos, window)[None, None]
    if causal:
        full = full & (pos[:, None] >= pos[None, :])[None, None]
    if key_mask is not None:
        full = full & key_mask[:, None, None, :]
    want = tr._attend(q, k, v, full, jnp.float32)

    got = tr._attend_banded_chunked(
        q, k, v, window=window, causal=causal, key_mask=key_mask, dtype=jnp.float32
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_banded_chunked_gradients_match_full_mask():
    """XLA autodiff through the chunked form equals the full-mask gradient
    (the training path exercises backward through this route)."""
    import mapperatorinator_tpu.models.transformer as tr

    rng = np.random.default_rng(1)
    b, t, h, d, window = 1, 128, 2, 8, 32
    q = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32)
    pos = jnp.arange(t)
    full = tr.sliding_window_mask(pos, pos, window)[None, None] & (
        pos[:, None] >= pos[None, :]
    )[None, None]

    def loss_full(args):
        return jnp.sum(tr._attend(*args, full, jnp.float32) ** 2)

    def loss_banded(args):
        return jnp.sum(tr._attend_banded_chunked(
            *args, window=window, causal=True, key_mask=None, dtype=jnp.float32) ** 2)

    g_full = jax.grad(loss_full)((q, k, v))
    g_band = jax.grad(loss_banded)((q, k, v))
    for a, b_ in zip(g_full, g_band):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=3e-4)


def test_banded_route_matches_dense_model_forward():
    """Full VarWhisper-style forward with banded routing on vs off: logits
    must agree (same attended sets; only fp reassociation differs)."""
    import mapperatorinator_tpu.models.transformer as tr

    rng = np.random.default_rng(2)
    base = dict(
        vocab_size=128, d_model=64, encoder_layers=2, decoder_layers=2,
        encoder_heads=2, decoder_heads=2, encoder_ffn=128, decoder_ffn=128,
        max_source_positions=128, max_target_positions=256, num_mel_bins=64,
        position_scheme="rope", norm="rms", conv_stem=True, local_attention=64,
        global_attn_every_n_layers=2, use_flash_attention=False,
    )
    feats = jnp.asarray(rng.normal(size=(2, 256, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(3, 120, (2, 96)), jnp.int32)
    dmask = jnp.asarray(rng.random((2, 96)) > 0.2)
    m_b = tr.OsuTransformer(tr.TransformerConfig(**base, banded_local_attention=True))
    m_d = tr.OsuTransformer(tr.TransformerConfig(**base, banded_local_attention=False))
    params = m_d.init(jax.random.PRNGKey(0), features=feats, decoder_input_ids=ids)
    out_b = m_b.apply(params, features=feats, decoder_input_ids=ids, decoder_attention_mask=dmask)
    out_d = m_d.apply(params, features=feats, decoder_input_ids=ids, decoder_attention_mask=dmask)
    np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_d), atol=1e-4)
