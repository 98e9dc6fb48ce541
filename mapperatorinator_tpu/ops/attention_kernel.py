"""Pallas TPU attention kernel.

Blocked attention for the transformer's forward paths: one grid step per
(batch*head, q-block); keys/values for the whole row live in VMEM (at osuT5
lengths — S <= 8k, D = 64 — that is ~2 MB, far under the ~16 MB VMEM budget),
logits are computed blockwise in fp32 on the MXU and never touch HBM. Causal,
sliding-window, and key-padding masks are generated from iota inside the
kernel, so no (T, S) mask array is materialized either.

This replaces the XLA einsum-softmax-einsum chain whose (B, H, T, S) fp32
logits round-trip HBM at long sequence lengths (reference torch path uses
sdpa/FlashAttention-2 — modeling_varwhisper.py:381-519).

Forward-only: the training path keeps the XLA composite (XLA's fusions are
fine when gradients are needed); inference encoders call this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _attention_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, sm_scale, causal, window, block_q):
    """q: (block_q, D), k/v: (S, D), mask: (1, S) bool, o: (block_q, D)."""
    qi = pl.program_id(1)
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # (block_q, S)

    s = logits.shape[1]
    q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, s), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, s), 1)
    mask = mask_ref[0, :][None, :]
    if causal:
        mask = mask & (k_pos <= q_pos)
    if window:
        mask = mask & (jnp.abs(q_pos - k_pos) <= window // 2)
    logits = jnp.where(mask, logits, NEG_INF)

    probs = jax.nn.softmax(logits, axis=-1)
    o_ref[...] = jnp.dot(
        probs, v_ref[...].astype(jnp.float32), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray,
    causal: bool,
    window: int,
    sm_scale: float,
    block_q: int,
) -> jnp.ndarray:
    b, t, h, d = q.shape
    s = k.shape[1]
    if sm_scale is None:
        sm_scale = d**-0.5
    if kv_mask is None:
        kv_mask = jnp.ones((b, s), bool)

    block_q = min(block_q, t)
    pad_t = (-t) % block_q
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
    tp = t + pad_t

    # (B, T, H, D) -> (B*H, T, D)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tp, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    maskf = jnp.repeat(kv_mask, h, axis=0)  # (B*H, S)

    grid = (b * h, tp // block_q)
    out = pl.pallas_call(
        functools.partial(
            _attention_kernel, sm_scale=sm_scale, causal=causal, window=window, block_q=block_q
        ),
        grid=grid,
        interpret=jax.default_backend() != "tpu",  # CPU tests run interpreted
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, 1, s), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, d), q.dtype),
    )(qf, kf, vf, maskf[:, None, :])

    out = out.reshape(b, h, tp, d).transpose(0, 2, 1, 3)
    return out[:, :t]


def _structural_mask(t: int, s: int, kv_mask, causal: bool, window: int) -> jnp.ndarray:
    q_pos = jnp.arange(t)[:, None]
    k_pos = jnp.arange(s)[None, :]
    m = jnp.ones((t, s), bool)
    if causal:
        m = m & (k_pos <= q_pos)
    if window:
        m = m & (jnp.abs(q_pos - k_pos) <= window // 2)
    return m[None, None] & kv_mask[:, None, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, kv_mask, causal, window, sm_scale, block_q):
    return _flash_forward(q, k, v, kv_mask, causal, window, sm_scale, block_q)


def _fwd(q, k, v, kv_mask, causal, window, sm_scale, block_q):
    out = _flash_forward(q, k, v, kv_mask, causal, window, sm_scale, block_q)
    return out, (q, k, v, kv_mask)


def _bwd(causal, window, sm_scale, block_q, residuals, g):
    """Recompute-based backward with the standard XLA composite — correct
    gradients at the old memory cost; the fast Pallas pass covers the forward
    (inference is forward-only, training forwards dominate eval loops)."""
    q, k, v, kv_mask = residuals
    b, t, h, d = q.shape
    s = k.shape[1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * sm_scale
    mask = _structural_mask(t, s, kv_mask, causal, window)
    logits = jnp.where(mask, logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)

    g32 = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g32)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g32, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32)) * sm_scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32)) * sm_scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_flash_attention.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_mask: jnp.ndarray | None = None,
    *,
    causal: bool = False,
    window: int = 0,
    sm_scale: float | None = None,
    block_q: int = 256,
) -> jnp.ndarray:
    """q: (B, T, H, D); k, v: (B, S, H, D); kv_mask: (B, S) bool (True=keep).

    Returns (B, T, H, D) in q's dtype. ``window`` is the reference's
    ``local_attention`` total width (|q-k| <= window//2), 0 disables it.
    Differentiable: the forward runs the Pallas kernel, the backward
    recomputes with XLA ops.
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    if sm_scale is None:
        sm_scale = d**-0.5
    if kv_mask is None:
        kv_mask = jnp.ones((b, s), bool)
    return _flash_attention(q, k, v, kv_mask, causal, window, float(sm_scale), int(min(block_q, t)))
