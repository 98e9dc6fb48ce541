"""Fused int8-weight matmul (weight-only quantized dense) for TPU decode.

The reference serves fp16/bf16 weights and has no quantized path; this
kernel exists for the ``quantized_weights=True`` decode option
(`models/transformer.py:QDense`), where the goal is halving the weight
bytes that stream from HBM every decode step.

Why a Pallas kernel at all: the plain XLA expression
``(x @ wq.astype(bf16)) * scale`` materializes the dequantized bf16 kernel
as a full intermediate inside the decode loop — measured ~10x slower than
bf16 decode on v5e (PERF.md "int8 weight-only decode"). Here the int8
block is upcast in VMEM *after* crossing HBM, so only int8 bytes stream
and the dequantize fuses into the MXU operand read.

Measured reality check (v5e, 12x(768->3072->768) dependent GEMV chain,
batch 1): bf16 1.066 ms/pass, fused int8 1.008 ms/pass — only ~5% faster
despite half the bytes, because a batch-1 layer chain is latency-bound
(106 GB/s << the 270 GB/s streaming ceiling). int8 therefore buys memory
footprint (half the weight HBM), not meaningful decode speed; see PERF.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["qmm", "qmm_supported"]

_LANE = 128  # TPU lane width; N blocks must tile in multiples of this


def _qmm_kernel(x_ref, wq_ref, s_ref, o_ref):
    x = x_ref[...]
    w = wq_ref[...].astype(x.dtype)  # int8 -> compute dtype, in VMEM
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def _pick_block_n(n: int, cap: int = 512) -> int:
    bn = min(cap, n)
    while n % bn:
        bn -= _LANE
    return bn


def qmm_supported(k: int, n: int, rows: int = 1) -> bool:
    """Shapes the fused kernel handles: lane-tileable N, an int8 weight block
    that fits VMEM comfortably, and a small row count (the x/out blocks scale
    with the flattened batch — decode steps have 1..tens of rows; prefill and
    encoder calls with hundreds+ rows fall back to the XLA expression, where
    the one-off dequant is amortized over the large matmul anyway)."""
    if n % _LANE:
        return False
    bn = _pick_block_n(n)
    if k * bn > 2**21:  # <=2 MB int8 weight block
        return False
    # x (rows,K) bf16 + out (rows,bn) fp32 per grid step, <=2 MB each
    return rows * k * 2 <= 2**21 and rows * bn * 4 <= 2**21


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def qmm(x, wq, scale, interpret: bool = False):
    """``(x @ wq) * scale`` with int8 ``wq`` dequantized in VMEM.

    x: (B, K) activation; wq: (K, N) int8; scale: (N,) fp32 per-output-channel.
    Returns (B, N) in x.dtype. Callers gate on :func:`qmm_supported`.
    """
    return _qmm_fwd(x, wq, scale, interpret)[0]


def _qmm_call(x, wq, scale, interpret):
    b, k = x.shape
    n = wq.shape[1]
    bn = _pick_block_n(n)
    return pl.pallas_call(
        _qmm_kernel,
        grid=(n // bn,),
        interpret=interpret or jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((b, k), lambda j: (0, 0)),
            pl.BlockSpec((k, bn), lambda j: (0, j)),
            pl.BlockSpec((1, bn), lambda j: (0, j)),
        ],
        out_specs=pl.BlockSpec((b, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((b, n), x.dtype),
    )(x, wq, scale[None, :])


def _qmm_fwd(x, wq, scale, interpret):
    return _qmm_call(x, wq, scale, interpret), (x, wq, scale)


def _qmm_bwd(interpret, res, dy):
    x, wq, scale = res
    # Weights are int8 (non-differentiable storage); only dx flows, exactly
    # as in the unfused expression: dx = (dy * scale) @ dequant(wq).T
    dys = (dy.astype(jnp.float32) * scale[None, :]).astype(x.dtype)
    dx = jax.lax.dot_general(
        dys, wq.astype(x.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return dx, jnp.zeros_like(wq), jnp.zeros_like(scale)


qmm.defvjp(_qmm_fwd, _qmm_bwd)
