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
    # cap the live (block_q, S) fp32 logits/probs buffers to fit VMEM
    while block_q > 16 and block_q * s * 4 > 2**22:
        block_q //= 2
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


def _attention_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                          dq_ref, dk_ref, dv_ref, *,
                          sm_scale, causal, window, block_q):
    """Backward for one (batch*head, q-block) grid step. dk/dv accumulate
    across the sequential q-block grid dimension (same output block each j)."""
    qi = pl.program_id(1)
    q = q_ref[...].astype(jnp.float32)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)

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
    p = jax.nn.softmax(logits, axis=-1)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    dq_ref[...] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * sm_scale).astype(dq_ref.dtype)
    dk_blk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32) * sm_scale  # (S, D)
    dv_blk = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (S, D)

    @pl.when(qi == 0)
    def _init():
        dk_ref[...] = dk_blk.astype(dk_ref.dtype)
        dv_ref[...] = dv_blk.astype(dv_ref.dtype)

    @pl.when(qi > 0)
    def _acc():
        dk_ref[...] = (dk_ref[...].astype(jnp.float32) + dk_blk).astype(dk_ref.dtype)
        dv_ref[...] = (dv_ref[...].astype(jnp.float32) + dv_blk).astype(dv_ref.dtype)


def _flash_backward(q, k, v, kv_mask, do, causal, window, sm_scale, block_q):
    b, t, h, d = q.shape
    s = k.shape[1]
    block_q = min(block_q, t)
    # the backward keeps several (block_q, S) fp32 buffers live; cap the
    # block so they fit VMEM at long S
    while block_q > 8 and block_q * s * 4 > 2**21:
        block_q //= 2
    pad_t = (-t) % block_q
    if pad_t:
        q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
        do = jnp.pad(do, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
    tp = t + pad_t

    qf = q.transpose(0, 2, 1, 3).reshape(b * h, tp, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    dof = do.transpose(0, 2, 1, 3).reshape(b * h, tp, d)
    maskf = jnp.repeat(kv_mask, h, axis=0)[:, None, :]

    # large (rows, S) programs crash the axon remote-compile helper; chunk
    # the batch*head axis (empirically rows<=16 compiles at S=8k)
    if b * h > 16 and s * tp >= 8192 * 8192:
        chunks = [
            _bwd_call(qf[i : i + 16], kf[i : i + 16], vf[i : i + 16], maskf[i : i + 16],
                      dof[i : i + 16], sm_scale, causal, window, block_q)
            for i in range(0, b * h, 16)
        ]
        dq = jnp.concatenate([c[0] for c in chunks])
        dk = jnp.concatenate([c[1] for c in chunks])
        dv = jnp.concatenate([c[2] for c in chunks])
    else:
        dq, dk, dv = _bwd_call(qf, kf, vf, maskf, dof, sm_scale, causal, window, block_q)

    dq = dq.reshape(b, h, tp, d).transpose(0, 2, 1, 3)[:, :t]
    dk = dk.reshape(b, h, s, d).transpose(0, 2, 1, 3).astype(k.dtype)
    dv = dv.reshape(b, h, s, d).transpose(0, 2, 1, 3).astype(v.dtype)
    return dq, dk, dv


def _bwd_call(qf, kf, vf, maskf, dof, sm_scale, causal, window, block_q):
    bh, tp, d = qf.shape
    s = kf.shape[1]
    grid = (bh, tp // block_q)
    return pl.pallas_call(
        functools.partial(
            _attention_bwd_kernel, sm_scale=sm_scale, causal=causal, window=window, block_q=block_q
        ),
        grid=grid,
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, 1, s), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0)),  # accumulated
            pl.BlockSpec((None, s, d), lambda i, j: (i, 0, 0)),  # accumulated
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, tp, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, s, d), jnp.float32),
        ],
    )(qf, kf, vf, maskf, dof)


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
    """Recompute-based flash backward: a second Pallas kernel recomputes each
    q-block's probabilities in VMEM and accumulates dk/dv across the grid —
    no (B, H, T, S) tensor ever exists in HBM."""
    q, k, v, kv_mask = residuals
    dq, dk, dv = _flash_backward(q, k, v, kv_mask, g, causal, window, sm_scale, block_q)
    return dq, dk, dv, None


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
