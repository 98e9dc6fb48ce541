"""Fused GEMM-native mel-spectrogram Pallas kernel.

The windowed real DFT is expressed as two constant matmuls so the whole mel
pipeline — window+DFT, power spectrum, mel filterbank projection, log1p —
runs as one fused kernel on the MXU with a single HBM round trip per frame
tile (the north-star kernel; replaces the reference's torchaudio C++ mel,
reference: ``osuT5/osuT5/model/spectrogram.py:38-49``).

Per grid step, a (TILE_F, n_fft) block of frames multiplies the window-folded
DFT matrices (n_fft, n_freqs) resident in VMEM, squares/adds into the power
spectrum, projects through the (n_freqs, n_mels) filterbank, and applies
log1p — all without materializing the spectrum in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mel_kernel(frames_ref, w_re_ref, w_im_ref, fb_ref, out_ref, *, log_scale: bool):
    frames = frames_ref[:]
    hi = jax.lax.Precision.HIGHEST  # fp32 MXU passes: torchaudio parity
    re = jnp.dot(frames, w_re_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(frames, w_im_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32, precision=hi)
    if log_scale:
        mel = jnp.log1p(mel)
    out_ref[:] = mel


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("log_scale", "tile_frames", "interpret"))
def fused_mel(
    frames: jax.Array,
    w_re: jax.Array,
    w_im: jax.Array,
    fbanks: jax.Array,
    log_scale: bool = False,
    tile_frames: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """frames (..., n_frames, n_fft) -> mel (..., n_frames, n_mels)."""
    *lead, n_frames, n_fft = frames.shape
    flat = frames.reshape(-1, n_fft).astype(jnp.float32)
    total = flat.shape[0]
    n_freqs = w_re.shape[1]
    n_mels = fbanks.shape[1]

    # pad every axis to TPU-friendly multiples
    total_p = _round_up(max(total, tile_frames), tile_frames)
    n_freqs_p = _round_up(n_freqs, 128)
    n_mels_p = _round_up(n_mels, 128)
    if total_p != total:
        flat = jnp.pad(flat, ((0, total_p - total), (0, 0)))
    if n_freqs_p != n_freqs:
        w_re = jnp.pad(w_re, ((0, 0), (0, n_freqs_p - n_freqs)))
        w_im = jnp.pad(w_im, ((0, 0), (0, n_freqs_p - n_freqs)))
        fbanks = jnp.pad(fbanks, ((0, n_freqs_p - n_freqs), (0, 0)))
    if n_mels_p != n_mels:
        fbanks = jnp.pad(fbanks, ((0, 0), (0, n_mels_p - n_mels)))

    grid = (total_p // tile_frames,)
    out = pl.pallas_call(
        functools.partial(_mel_kernel, log_scale=log_scale),
        out_shape=jax.ShapeDtypeStruct((total_p, n_mels_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_frames, n_fft), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, n_freqs_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs_p, n_mels_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_frames, n_mels_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * total_p * n_fft * n_freqs_p * 2 + 2 * total_p * n_freqs_p * n_mels_p,
            bytes_accessed=4 * (total_p * n_fft + 2 * n_fft * n_freqs_p + n_freqs_p * n_mels_p + total_p * n_mels_p),
            transcendentals=total_p * n_mels_p if log_scale else 0,
        ),
        interpret=interpret,
    )(flat, w_re.astype(jnp.float32), w_im.astype(jnp.float32), fbanks.astype(jnp.float32))

    return out[:total, :n_mels].reshape(*lead, n_frames, n_mels)
