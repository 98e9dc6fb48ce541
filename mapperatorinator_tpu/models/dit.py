"""DiT coordinate-refinement diffusion model in Flax.

1-D DiT over hit-object coordinate sequences (reference:
``osu_diffusion/utils/models.py:20-405``, ``positional_embedding.py:29-78``):
sin/cos position-frequency embedding of (x,y)*512 concatenated with a
272-dim per-token context, adaLN-Zero blocks, timestep + class-vector
embedders, learned-sigma output, banded attention masks, and the dual-half
CFG forward.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

DIT_SIZES = {
    "DiT-XL": dict(depth=28, hidden_size=1152, num_heads=16),
    "DiT-L": dict(depth=24, hidden_size=1024, num_heads=16),
    "DiT-B": dict(depth=12, hidden_size=768, num_heads=12),
    "DiT-S": dict(depth=12, hidden_size=384, num_heads=6),
    "DiT-T": dict(depth=1, hidden_size=32, num_heads=2),  # test/smoke size
}


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 2
    context_size: int = 272
    hidden_size: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    class_size: int = 256
    learn_sigma: bool = True
    dtype: Any = jnp.float32

    @classmethod
    def from_name(cls, name: str, **kw) -> "DiTConfig":
        return cls(**{**DIT_SIZES[name], **kw})

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """GLIDE-style sinusoidal embedding: [cos | sin] halves
    (reference: positional_embedding.py:29-49)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def position_sequence_embedding(x: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """(N, T, D) positions -> (N, T, D*dim) sinusoid features."""
    n, t, d = x.shape
    flat = x.reshape(-1)
    emb = timestep_embedding(flat, dim, max_period)
    return emb.reshape(n, t, d * dim)


def modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


class TimestepEmbedder(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = timestep_embedding(t, self.frequency_embedding_size)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(h)
        h = nn.silu(h)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(h)


class LabelEmbedder(nn.Module):
    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, labels: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(labels)
        h = nn.silu(h)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2")(h)


class FirstLayer(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        """x: (N, T, C) coords in [-1, 1]; c: (N, T, E) context."""
        x_freq = position_sequence_embedding(x * 512, self.frequency_embedding_size)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="proj")(
            jnp.concatenate([x_freq, c], axis=-1)
        )


class DiTBlock(nn.Module):
    config: DiTConfig

    @nn.compact
    def __call__(self, x, cond, attn_mask=None):
        cfg = self.config
        d = cfg.hidden_size
        mod = nn.Dense(6 * d, dtype=cfg.dtype, name="adaln",
                       kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)(nn.silu(cond))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=cfg.dtype)(x)
        h = modulate(h, shift_msa, scale_msa)
        attn_out = self._attention(h, attn_mask)
        x = x + gate_msa[:, None] * attn_out

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=cfg.dtype)(x)
        h = modulate(h, shift_mlp, scale_mlp)
        h = nn.Dense(int(d * cfg.mlp_ratio), dtype=cfg.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(d, dtype=cfg.dtype, name="mlp_fc2")(h)
        x = x + gate_mlp[:, None] * h
        return x

    def _attention(self, x, attn_mask):
        cfg = self.config
        b, t, d = x.shape
        h = cfg.num_heads
        hd = d // h
        qkv = nn.Dense(3 * d, dtype=cfg.dtype, name="qkv")(x).reshape(b, t, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * hd**-0.5
        if attn_mask is not None:
            logits = jnp.where(attn_mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, d)
        return nn.Dense(d, dtype=cfg.dtype, name="out_proj")(out)


class FinalLayer(nn.Module):
    config: DiTConfig

    @nn.compact
    def __call__(self, x, cond):
        cfg = self.config
        mod = nn.Dense(2 * cfg.hidden_size, dtype=cfg.dtype, name="adaln",
                       kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)(nn.silu(cond))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6, dtype=cfg.dtype)(x)
        x = modulate(x, shift, scale)
        return nn.Dense(cfg.out_channels, dtype=cfg.dtype, name="proj",
                        kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)(x)


def banded_attention_mask(seq_len: int, band: int) -> jnp.ndarray:
    """(1, 1, T, T) boolean mask allowing |i-j| <= band
    (reference: diffusion_pipeline.py:146-148)."""
    idx = jnp.arange(seq_len)
    return (jnp.abs(idx[:, None] - idx[None, :]) <= band)[None, None]


class DiT(nn.Module):
    """Sequence layout is time-major (N, T, C) throughout — the reference's
    channel-major (N, C, T) torch layout is transposed at the boundary by the
    diffusion pipeline."""

    config: DiTConfig

    def setup(self):
        cfg = self.config
        self.context_embedder = FirstLayer(cfg.hidden_size, dtype=cfg.dtype, name="context_embedder")
        self.t_embedder = TimestepEmbedder(cfg.hidden_size, dtype=cfg.dtype, name="t_embedder")
        self.y_embedder = LabelEmbedder(cfg.hidden_size, dtype=cfg.dtype, name="y_embedder")
        self.blocks = [DiTBlock(cfg, name=f"blocks_{i}") for i in range(cfg.depth)]
        self.final_layer = FinalLayer(cfg, name="final_layer")

    def __call__(self, x, t, c, y, attn_mask=None):
        """x: (N, T, C) coords; t: (N,); c: (N, T, E); y: (N, class_size)."""
        h = self.context_embedder(x, c)
        cond = self.t_embedder(t) + self.y_embedder(y)
        for block in self.blocks:
            h = block(h, cond, attn_mask)
        return self.final_layer(h, cond)  # (N, T, out_channels)

    def forward_with_cfg(self, x, t, c, y, cfg_scale, attn_mask=None):
        """Dual-half CFG (reference: models.py:301-317): batch rows are
        [cond; uncond] sharing the same x half."""
        cfg = self.config
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        out = self(combined, t, c, y, attn_mask)
        eps = out[..., : cfg.in_channels]
        rest = out[..., cfg.in_channels :]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)
