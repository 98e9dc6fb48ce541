"""Fused int8 weight-only matmul kernel (ops/qmm_kernel.py).

Locks the Pallas path (interpret-mode on the CPU test mesh) against the
plain unfused XLA expression it replaces, including the custom-vjp dx.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mapperatorinator_tpu.ops.qmm_kernel import qmm, qmm_supported


def _quantize(w, qmax=127):
    scale = np.maximum(np.abs(w).max(axis=0), 1e-8) / qmax
    q = np.clip(np.round(w / scale[None, :]), -qmax - 1, qmax).astype(np.int8)
    return q, scale.astype(np.float32)


@pytest.mark.parametrize("b,k,n", [(1, 256, 384), (4, 128, 512), (3, 200, 128)])
def test_qmm_matches_unfused_expression(b, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, k)), jnp.float32)
    wq, scale = _quantize(rng.standard_normal((k, n)).astype(np.float32) * 0.05)
    wq, scale = jnp.asarray(wq), jnp.asarray(scale)

    got = qmm(x, wq, scale, True)
    want = (x @ wq.astype(x.dtype)) * scale[None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_qmm_grad_matches_unfused():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 128)), jnp.float32)
    wq, scale = _quantize(rng.standard_normal((128, 256)).astype(np.float32) * 0.05)
    wq, scale = jnp.asarray(wq), jnp.asarray(scale)

    g_fused = jax.grad(lambda a: qmm(a, wq, scale, True).sum())(x)
    g_ref = jax.grad(lambda a: ((a @ wq.astype(a.dtype)) * scale[None, :]).sum())(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_qmm_supported_gating():
    assert qmm_supported(768, 3072)   # the v32 MLP shape — the hot path
    assert qmm_supported(768, 768)
    assert qmm_supported(768, 3072, rows=16)  # batched decode step
    assert not qmm_supported(32, 64)  # below lane tile -> XLA fallback
    assert not qmm_supported(768, 100)  # non-tileable N
    assert not qmm_supported(32768, 512)  # block would blow VMEM
    # prefill-scale row counts (batch x prompt bucket) must fall back: the
    # x/out blocks scale with rows and would oversubscribe VMEM
    assert not qmm_supported(768, 3072, rows=4096)
    assert not qmm_supported(768, 768, rows=2048)


def test_qdense_uses_fused_path_at_model_shapes():
    """QDense at a lane-tileable shape routes through qmm and matches the
    dequantized reference computation."""
    from mapperatorinator_tpu.models.transformer import QDense

    rng = np.random.default_rng(2)
    mod = QDense(features=256, use_bias=True, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 5, 128)), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    wq, scale = _quantize(rng.standard_normal((128, 256)).astype(np.float32) * 0.05)
    bias = rng.standard_normal(256).astype(np.float32) * 0.1
    params = {"params": {"kernel_q": jnp.asarray(wq), "scale": jnp.asarray(scale),
                         "bias": jnp.asarray(bias)}}

    got = mod.apply(params, x)
    want = (x @ jnp.asarray(wq).astype(x.dtype)) * jnp.asarray(scale)[None, None, :] + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)
