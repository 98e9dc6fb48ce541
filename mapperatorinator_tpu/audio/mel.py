"""Mel spectrogram front-end, TPU-native.

Numerics match ``torchaudio.transforms.MelSpectrogram`` (the reference's v32
path — reference: ``osuT5/osuT5/model/spectrogram.py:7-92``): periodic Hann
window, center padding of ``n_fft//2`` (constant or reflect), power-2
spectrum, HTK-scale mel filterbank with no norm, optional ``log1p``, output
``(batch, frames, n_mels)`` in float32.

Two compute paths:

* ``xla``    — framing + rfft + mel matmul in plain jnp; XLA fuses it.
* ``pallas`` — GEMM-native: the windowed DFT is folded into two constant
  matrices so the whole pipeline is ``frames @ W_re / W_im -> power -> @ mel``
  executed in one fused Pallas kernel on the MXU
  (:mod:`mapperatorinator_tpu.ops.mel_kernel`). The DFT-as-matmul shape is
  the right one for TPU: n_fft=1024 puts all FLOPs in 128-aligned matmuls
  instead of the VPU-bound FFT butterfly.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + f / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank, HTK scale, no normalization —
    torchaudio ``melscale_fbanks`` defaults."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = hz_to_mel_htk(f_min)
    m_max = hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = mel_to_hz_htk(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down_slopes = -slopes[:, :-2] / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))
    return fb.astype(np.float32)


def hann_window_periodic(n: int) -> np.ndarray:
    return (0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))).astype(np.float32)


def _dft_matrices(n_fft: int, window: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Window-folded real-DFT matrices: frames @ W -> (re, im) of rfft."""
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    angle = -2.0 * np.pi * np.outer(n, k) / n_fft  # (n_fft, n_freqs)
    w_re = (np.cos(angle) * window[:, None]).astype(np.float32)
    w_im = (np.sin(angle) * window[:, None]).astype(np.float32)
    return w_re, w_im


class MelSpectrogram:
    """Callable mel front-end. Stateless; jit-compatible."""

    def __init__(
        self,
        implementation: str = "xla",
        log_scale: bool = False,
        sample_rate: int = 16000,
        n_fft: int = 1024,
        n_mels: int = 388,
        hop_length: int = 128,
        f_min: float = 0,
        f_max: float = 8000,
        pad_mode: str = "constant",
    ):
        # "torchaudio"/"nnAudio" are accepted as aliases of the exact path so
        # reference configs run unchanged.
        if implementation in ("torchaudio", "nnAudio"):
            implementation = "xla"
        assert implementation in ("xla", "pallas"), implementation
        assert pad_mode in ("constant", "reflect"), pad_mode
        self.implementation = implementation
        self.log_scale = log_scale
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.n_mels = n_mels
        self.hop_length = hop_length
        self.f_min = f_min
        self.f_max = f_max if f_max is not None else sample_rate / 2
        self.pad_mode = pad_mode

        self.window = hann_window_periodic(n_fft)
        self.fbanks = mel_filterbank(n_fft // 2 + 1, self.f_min, self.f_max, n_mels, sample_rate)

    def __call__(self, samples: jax.Array) -> jax.Array:
        """(batch, n_samples) float -> (batch, n_frames, n_mels) float32,
        n_frames = n_samples // hop_length + 1."""
        samples = samples.astype(jnp.float32)
        pad = self.n_fft // 2
        if self.pad_mode == "reflect":
            padded = jnp.pad(samples, ((0, 0), (pad, pad)), mode="reflect")
        else:
            padded = jnp.pad(samples, ((0, 0), (pad, pad)))

        n_frames = samples.shape[1] // self.hop_length + 1
        frames = _frame(padded, n_frames, self.n_fft, self.hop_length)

        if self.implementation == "pallas":
            from ..ops.mel_kernel import fused_mel

            w_re, w_im = _dft_matrices(self.n_fft, self.window)
            mel = fused_mel(frames, jnp.asarray(w_re), jnp.asarray(w_im), jnp.asarray(self.fbanks), self.log_scale)
        else:
            spec = jnp.fft.rfft(frames * jnp.asarray(self.window))
            power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
            # fp32 MXU accumulation — torchaudio parity requires full precision
            mel = jnp.matmul(power, jnp.asarray(self.fbanks), precision=jax.lax.Precision.HIGHEST)
            if self.log_scale:
                mel = jnp.log1p(mel)
        return mel


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _frame(padded: jax.Array, n_frames: int, n_fft: int, hop: int) -> jax.Array:
    """(batch, n_padded) -> (batch, n_frames, n_fft) strided frames."""
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return padded[:, idx]
