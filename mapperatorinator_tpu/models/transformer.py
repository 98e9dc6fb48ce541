"""The TPU seq2seq transformer family.

One parameterized encoder-decoder covers the reference's backbone zoo —
VarWhisper (RoPE + RMSNorm + alternating local/global attention, reference:
``osuT5/.../modeling_varwhisper.py:381-1519``), stock Whisper (sinusoidal/
learned absolute positions + LayerNorm), and the nanoT5-style variants — via
:class:`TransformerConfig` switches rather than separate model classes. The
design is TPU-first:

* static shapes everywhere; the decode path takes an explicit, preallocated
  KV cache pytree (donated by the caller) and a scalar position index,
* attention is einsum-based so XLA lowers it onto the MXU and fuses the
  softmax chain; sliding-window layers use an additive band mask,
* pre-norm blocks, params in fp32 with a configurable compute dtype (bf16).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    vocab_size: int = 4096  # output vocab (decoder embed + lm head)
    d_model: int = 512
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_heads: int = 8
    decoder_heads: int = 8
    encoder_ffn: int = 2048
    decoder_ffn: int = 2048
    activation: str = "gelu"
    dropout: float = 0.0
    max_source_positions: int = 1024
    max_target_positions: int = 2048
    num_mel_bins: int = 512  # encoder conv-stem input feature dim

    # positional scheme
    position_scheme: str = "rope"  # "rope" | "whisper_abs" | "t5_relpos" | "none"
    rope_global_theta: float = 10000.0
    rope_local_theta: float = 10000.0
    # "default" or "dynamic": NTK-aware base rescaling once the (static)
    # sequence length exceeds the trained max positions
    # (reference: modeling_ropewhisper.py:265-315 via HF ROPE_INIT_FUNCTIONS)
    rope_type: str = "default"
    rope_encoder_scaling_factor: float = 1.0
    rope_decoder_scaling_factor: float = 1.0
    # every n-th layer is global; others use a sliding window of local_attention
    global_attn_every_n_layers: int = 1
    local_attention: int = 128
    # t5_relpos bucketing (HF T5 defaults)
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128

    # decoder input embedding table size when it differs from the output
    # vocab (NWhisper embeds in-vocab ids inside the backbone:
    # reference configuration_nwhisper.py:75,105, modeling_nwhisper.py:1448)
    input_vocab_size: Optional[int] = None

    # structure
    norm: str = "rms"  # "rms" | "layer"
    # None -> torch defaults (RMSNorm: fp32 eps 1.19e-7; LayerNorm: 1e-5);
    # T5 uses layer_norm_epsilon=1e-6
    norm_eps: Optional[float] = None
    # "prenorm" (default) or "ngpt": nGPT-style hypersphere blocks with
    # l2-normalized weights, slerp residuals, and no norm layers
    # (reference: modeling_nwhisper.py:86-262, 812-1010)
    norm_scheme: str = "prenorm"
    # nGPT slerp-rate inits (reference configuration_nwhisper.py:54-71
    # defaults: residual alphas 0.05, positional alphas 0.1). The stored
    # param is ``scale``; the forward multiplier init/scale is structural.
    ngpt_alpha_init: float = 0.05
    ngpt_alpha_pos_init: float = 0.1
    # route eligible full-sequence attention through the Pallas kernel on TPU
    # (the XLA composite materializes (B, H, T, S) fp32 logits in HBM; the
    # kernel keeps them in VMEM — 50x faster at T=8k)
    use_flash_attention: bool = True
    # O(T·window) chunked attention for sliding-window layers in the
    # non-cached forward (see _attend_banded_chunked). MEASURED SLOWER at
    # the v32 shape on a v5e (train step 2.68 s/step vs 1.77 with the dense
    # flash path): the 3x neighbor-gathered KV copies cost more HBM traffic
    # than the skipped FLOPs save, and (C, 3C) tiles underfill the MXU that
    # one dense 2560^2 matmul saturates. Default OFF; an option for much
    # longer sequences / narrower windows where O(T^2) eventually loses.
    banded_local_attention: bool = False
    # minimum TOTAL materialized logits elements (B*H*Tq*S — the HBM traffic
    # the XLA composite would round-trip) for the Pallas route; below it
    # XLA's fusions win. Default = the measured batch-1 par point
    # (12 heads x 2560^2). Lowering the gate to cover the v32 train step's
    # encoder (1024^2) and cross (2560x1024) attention at batch 16 measured
    # +10.5% step time (2.516 -> 2.278 s/step, MFU .144 -> .159) — the
    # B*H factor is what the old per-matrix T*S rule missed.
    flash_min_logits: int = 12 * 2560 * 2560
    # jax.checkpoint each layer: recompute activations in the backward pass,
    # trading FLOPs for HBM (enables bigger batches / longer windows)
    remat: bool = False
    # remat policy: "full" recomputes everything (min memory);
    # "dots" = checkpoint_dots_with_no_batch_dims_saveable keeps matmul
    # outputs resident and recomputes only the cheap elementwise ops —
    # fewer recomputed FLOPs for a modest memory bump (the classic
    # selective-checkpointing policy for MXU-bound transformer blocks)
    remat_policy: str = "full"
    # weight-only int8 for the dense projections (inference): halves the HBM
    # weight traffic that bounds batch-1 autoregressive decode; per-output-
    # channel scales, biases/norms/embeddings stay fp
    quantized_weights: bool = False
    # int8 KV cache (inference): halves the cache HBM *footprint* (bigger
    # batches / longer buffers per chip). NOT a throughput option: an
    # isolated attention step fuses well (2.68 -> 2.10 ms at batch8 x 2560)
    # but in the full engine loop the per-step quantize-on-write + dequant
    # materialization outweigh the bytes saved — measured 1 057 tok/s vs
    # 1 974 bf16 at batch 8 full window (PERF.md "int8 decode options at
    # full window"). Per-token-per-head scales; ~1% relative attention
    # error, so tokens may diverge from the bf16 cache — opt-in.
    quantized_kv: bool = False
    # single-step cached decode attends over only the live cache prefix,
    # bucketed to this many slots (lax.switch over static lengths); cache
    # HBM reads bound long decodes (measured: batch8 x 2560 buffer caps at
    # ~1.4k tok/s with full reads). 256 measured best on v5e (1976 tok/s vs
    # 1922 @512, 1963 @128, batch8 full window). 0 disables.
    decode_attend_bucket: int = 256
    attention_bias: bool = True
    attention_scale: bool = True  # T5 omits the 1/sqrt(d) scale
    mlp_bias: bool = True  # T5 feed-forward projections carry no biases
    ffn_gated: bool = False  # T5 v1.1 gated activation: act(wi_0) * wi_1
    # moonshine decoder MLP: one fc1 of width 2*ffn, split into
    # (hidden, gate), out = act(gate) * hidden (HF MoonshineDecoderMLP)
    decoder_ffn_gated_concat: bool = False
    decoder_activation: Optional[str] = None  # None -> activation
    norm_bias: bool = True  # moonshine LayerNorms carry no bias
    conv_stem: bool = True  # whisper conv1(k3s1) + conv2(k3s2) front
    # "whisper": mel conv pair; "moonshine": raw-wave conv1(k127 s64 no-bias,
    # tanh) + groupnorm + conv2(k7 s3) + conv3(k3 s2) gelus (HF
    # MoonshineEncoder)
    stem_type: str = "whisper"
    # moonshine partial interleaved rotary: rotate only the first
    # int(head_dim*factor) dims with repeat-interleaved cos/sin
    # (HF modeling_moonshine.apply_rotary_pos_emb); 1.0 = llama rotate-half
    rope_partial_factor: float = 1.0
    scale_embedding: bool = False
    tie_word_embeddings: bool = False
    pad_token_id: int = 0

    dtype: Dtype = jnp.float32  # compute dtype
    param_dtype: Dtype = jnp.float32

    # T5 decouples per-head width (d_kv) from d_model / num_heads
    head_dim_override: Optional[int] = None

    @property
    def head_dim(self) -> int:
        if self.head_dim_override is not None:
            return self.head_dim_override
        return self.d_model // self.decoder_heads


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


class Norm(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        if cfg.norm_scheme == "ngpt":  # hidden states are already unit-norm
            return x
        if cfg.norm == "rms":
            # default eps matches torch.nn.RMSNorm(eps=None) on fp32 inputs
            eps = cfg.norm_eps if cfg.norm_eps is not None else 1.1920929e-7
            return nn.RMSNorm(epsilon=eps, dtype=cfg.dtype, param_dtype=cfg.param_dtype)(x)
        eps = cfg.norm_eps if cfg.norm_eps is not None else 1e-5
        return nn.LayerNorm(
            epsilon=eps, use_bias=cfg.norm_bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype
        )(x)


def rope_frequencies(head_dim: int, theta: float) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Llama-style rotate-half RoPE. x: (B, T, H, D); positions: (B, T)."""
    head_dim = x.shape[-1]
    inv_freq = rope_frequencies(head_dim, theta)
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, D/2)
    cos = jnp.cos(angles)[:, :, None, :]  # (B, T, 1, D/2)
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def apply_rope_interleaved_partial(
    x: jnp.ndarray, positions: jnp.ndarray, theta: float, rotary_dim: int
) -> jnp.ndarray:
    """Moonshine rotary: only the first ``rotary_dim`` head dims rotate, with
    repeat-interleaved cos/sin over rotate-half pairs
    (HF modeling_moonshine.apply_rotary_pos_emb)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, rotary_dim, 2, dtype=jnp.float32) / rotary_dim))
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # (B, T, rd/2)
    cos = jnp.repeat(jnp.cos(angles), 2, axis=-1)[:, :, None, :]  # (B, T, 1, rd)
    sin = jnp.repeat(jnp.sin(angles), 2, axis=-1)[:, :, None, :]
    xf = x.astype(jnp.float32)
    x_rot, x_pass = xf[..., :rotary_dim], xf[..., rotary_dim:]
    # rotate-every-two (GPT-J style): pairs (x0, x1) -> (-x1, x0)
    x_even, x_odd = x_rot[..., 0::2], x_rot[..., 1::2]
    rot = jnp.stack([-x_odd, x_even], axis=-1).reshape(x_rot.shape)
    out = jnp.concatenate([x_rot * cos + rot * sin, x_pass], axis=-1)
    return out.astype(x.dtype)


def sliding_window_mask(q_pos: jnp.ndarray, k_pos: jnp.ndarray, window: int) -> jnp.ndarray:
    """True where attention is allowed: |q_pos - k_pos| <= window//2."""
    diff = q_pos[:, None] - k_pos[None, :]
    return jnp.abs(diff) <= window // 2


def _attend(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    dtype: Dtype,
    bias: Optional[jnp.ndarray] = None,
    scaled: bool = True,
) -> jnp.ndarray:
    """(B, Tq, H, D) x (B, Tk, H, D) -> (B, Tq, H, D); softmax in fp32."""
    scale = q.shape[-1] ** -0.5 if scaled else 1.0
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def _attend_banded_chunked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    window: int,
    causal: bool,
    key_mask: Optional[jnp.ndarray],
    dtype: Dtype,
    scaled: bool = True,
) -> jnp.ndarray:
    """Sliding-window attention in O(T·window) instead of O(T²).

    Chunk the sequence into blocks of C = window//2; every query chunk
    attends only its previous, own, and next chunks (3C keys), which exactly
    covers the |q-k| <= window//2 band, with the precise band/causal/padding
    mask applied inside the slice — so the attended key set, and therefore
    the fp32 softmax result, matches the full masked form bit-for-fp-reorder.
    At the v32 decoder shape (T=2560, window=128) this cuts the local
    layers' attention matmul FLOPs ~13x (3C=192 keys vs 2560); XLA
    differentiates it like any einsum, so training fwd+bwd both shrink.
    Caller guarantees t % C == 0 and positions are arange (training / full
    prefill layout)."""
    b, t, h, d = q.shape
    c = window // 2
    n = t // c
    scale = d ** -0.5 if scaled else 1.0

    kc = k.reshape(b, n, c, h, d)
    vc = v.reshape(b, n, c, h, d)
    zeros = jnp.zeros((b, 1, c, h, d), k.dtype)

    def with_neighbors(x, z):
        return jnp.concatenate([
            jnp.concatenate([z, x[:, :-1]], axis=1),
            x,
            jnp.concatenate([x[:, 1:], z], axis=1),
        ], axis=2)  # (b, n, 3c, ...)

    k3 = with_neighbors(kc, zeros)
    v3 = with_neighbors(vc, zeros)
    qc = q.reshape(b, n, c, h, d)

    logits = jnp.einsum("bnchd,bnkhd->bnhck", qc, k3).astype(jnp.float32) * scale

    chunk_base = (jnp.arange(n) * c)[:, None, None]            # (n, 1, 1)
    q_pos = chunk_base + jnp.arange(c)[None, :, None]           # (n, c, 1)
    k_pos = chunk_base + jnp.arange(3 * c)[None, None, :] - c   # (n, 1, 3c)
    mask = (k_pos >= 0) & (k_pos < t) & (jnp.abs(q_pos - k_pos) <= c)
    if causal:
        mask = mask & (q_pos >= k_pos)
    mask = mask[None, :, None]                                  # (1, n, 1, c, 3c)
    if key_mask is not None:                                    # (b, t) bool
        km = key_mask.reshape(b, n, c)
        km3 = jnp.concatenate([
            jnp.concatenate([jnp.zeros((b, 1, c), bool), km[:, :-1]], 1),
            km,
            jnp.concatenate([km[:, 1:], jnp.zeros((b, 1, c), bool)], 1),
        ], axis=2)                                              # (b, n, 3c)
        mask = mask & km3[:, :, None, None, :]

    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bnhck,bnkhd->bnchd", probs, v3)
    return out.reshape(b, t, h, d)


def relative_position_bucket(
    relative_position: jnp.ndarray,
    bidirectional: bool,
    num_buckets: int = 32,
    max_distance: int = 128,
) -> jnp.ndarray:
    """T5 relative position bucketing (log-spaced beyond max_exact)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class RelativePositionBias(nn.Module):
    """Per-stack shared T5 position bias: (Tq, Tk) -> (1, H, Tq, Tk)."""

    config: TransformerConfig
    num_heads: int
    bidirectional: bool

    @nn.compact
    def __call__(self, q_pos: jnp.ndarray, k_pos: jnp.ndarray) -> jnp.ndarray:
        """1-D positions -> (1, H, Tq, Tk); 2-D (per-row) -> (B, H, Tq, Tk)."""
        cfg = self.config
        if q_pos.ndim == 2:
            rel = k_pos[:, None, :] - q_pos[:, :, None]  # (B, Tq, Tk)
        else:
            rel = (k_pos[None, :] - q_pos[:, None])[None]  # (1, Tq, Tk)
        buckets = relative_position_bucket(
            rel, self.bidirectional,
            cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance,
        )
        table = nn.Embed(
            cfg.relative_attention_num_buckets, self.num_heads,
            dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="embedding",
        )
        return table(buckets).transpose(0, 3, 1, 2)  # (B|1, H, Tq, Tk)


# ---------------------------------------------------------------------------
# nGPT-style (NWhisper) building blocks: every weight matrix and every hidden
# state lives on the unit hypersphere; residuals are learned-rate slerps
# (reference: modeling_nwhisper.py:86-262).
# ---------------------------------------------------------------------------


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class HyperScale(nn.Module):
    """Learned per-dim scale with decoupled init/lr trick: the param is
    stored at ``scale`` and multiplied by ``init/scale`` on the forward."""

    dim: int
    init: float = 1.0
    scale: float = 1.0
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        p = self.param("scale", lambda key: jnp.full((self.dim,), self.scale, self.param_dtype))
        return p * (self.init / self.scale)


class NormDense(nn.Module):
    """Dense whose kernel is l2-normalized along the input axis every forward
    (``norm_dim_in=False`` normalizes along the output axis)."""

    features: int
    norm_dim_in: bool = True
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features), self.param_dtype
        )
        kernel = l2norm(kernel, axis=0 if self.norm_dim_in else 1)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype).astype(self.dtype)
        return y


class HyperResidual(nn.Module):
    """x <- l2norm(lerp(x, l2norm(branch_out), alpha)) with learned alpha."""

    dim: int
    alpha_init: float = 1.0
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, branch_out: jnp.ndarray) -> jnp.ndarray:
        alpha = HyperScale(self.dim, self.alpha_init, self.dim**-0.5,
                           self.param_dtype, name="branch_scale")()
        out = l2norm(branch_out)
        return l2norm(x + alpha * (out - x))


def dynamic_ntk_theta(theta: float, head_dim: int, seq_len: int, max_positions: int,
                      factor: float) -> float:
    """HF dynamic-NTK base rescaling; identity while seq_len fits the trained
    range. seq_len is static under jit, so this stays a Python computation."""
    if seq_len <= max_positions or factor <= 0:
        return theta
    scale = (factor * seq_len / max_positions) - (factor - 1)
    return theta * scale ** (head_dim / (head_dim - 2))


class QDense(nn.Module):
    """Weight-only int8 dense: y = (x @ int8_kernel) * per-channel scale.

    Routed through the fused Pallas kernel (`ops/qmm_kernel.py`) whenever the
    shape tiles: the int8 block is upcast in VMEM after crossing HBM, so only
    int8 weight bytes stream — halving the weight footprint vs bf16. (The
    plain XLA expression materializes the dequantized kernel inside the
    decode loop, ~10x slower; kept only as the fallback for non-tileable
    shapes.) Populate params with :func:`quantize_params` from a trained fp
    tree. Measured on v5e the fused path decodes at parity with bf16 (~5%
    faster in a layer-chain probe — batch-1 decode is latency-bound, so the
    win is memory, not speed; PERF.md "int8 weight-only decode").
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.qmm_kernel import qmm, qmm_supported

        k = x.shape[-1]
        kernel_q = self.param(
            "kernel_q", nn.initializers.zeros, (k, self.features), jnp.int8
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        lead = x.shape[:-1]
        rows = math.prod(lead) if lead else 1
        if qmm_supported(k, self.features, rows):
            y = qmm(x.astype(self.dtype).reshape(-1, k), kernel_q, scale)
            y = y.reshape(*lead, self.features)
        else:
            y = (x.astype(self.dtype) @ kernel_q.astype(self.dtype)) * scale.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


def quantize_params(params, bits: int = 8, expected=None):
    """fp param tree -> int8 weight-only tree for quantized_weights=True
    models: every 2-D ``kernel`` becomes ``kernel_q`` (int8) + per-output-
    channel ``scale``; everything else passes through.

    ``expected``: optional set of flat ``/``-joined paths from the quantized
    model's own param structure (eval_shape init). When given, only kernels
    whose ``.../kernel_q`` appears there are converted — required for
    wrapper-level checkpoints where some Dense modules stay unquantized
    (conditioning embedders, the moonshine gated MLP).

    PERFORMANCE NOTE: with the fused Pallas qmm kernel (round 3) int8 decode
    runs at parity with bf16 on v5e (batch-1 decode is latency-bound, so
    halving weight bytes buys memory footprint, not speed — PERF.md "int8
    weight-only decode"). bf16 remains the default production path; use this
    when weight HBM is the constraint (many parallel sessions / bigger KV)."""
    import flax
    import numpy as np

    qmax = 2 ** (bits - 1) - 1
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    out = {}
    for path, leaf in flat.items():
        arr = np.asarray(leaf)
        wanted = expected is None or (path[: -len("kernel")] + "kernel_q") in expected
        if path.endswith("/kernel") and arr.ndim == 2 and wanted:
            scale = np.maximum(np.abs(arr).max(axis=0), 1e-8) / qmax
            q = np.clip(np.round(arr / scale[None, :]), -qmax - 1, qmax).astype(np.int8)
            base = path[: -len("kernel")]
            out[base + "kernel_q"] = q
            out[base + "scale"] = scale.astype(np.float32)
        else:
            out[path] = arr
    # Return committed device arrays: leaving numpy leaves here makes every
    # jitted call re-upload the whole tree (catastrophic over a tunneled
    # device link — measured 13x decode slowdown before this line existed).
    out = {k: jnp.asarray(v) for k, v in out.items()}
    return flax.traverse_util.unflatten_dict(out, sep="/")


def quantize_kv(x: jnp.ndarray):
    """(B, T, H, D) fp -> (int8 values, (B, T, H) fp32 per-token-per-head
    scales). Symmetric max-abs quantization; RoPE is already applied to keys
    at write time, so the rotation never sees quantization error."""
    scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1), 1e-8) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    return q, scale


def dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of :func:`quantize_kv`. Under jit XLA fuses the convert and
    scale multiply into the attention matmul's operand read, so only int8
    bytes cross HBM (measured: no materialized bf16 copy, see PERF.md)."""
    return q.astype(dtype) * scale[..., None].astype(dtype)


class Attention(nn.Module):
    """Self or cross attention; optional RoPE, causal and sliding-window
    masking, and single-step cached decode."""

    config: TransformerConfig
    num_heads: int
    is_cross: bool = False
    is_causal: bool = False
    is_decoder: bool = False
    layer_idx: int = 0

    def setup(self):
        cfg = self.config
        inner = self.num_heads * (cfg.head_dim_override or cfg.d_model // self.num_heads)
        if cfg.norm_scheme == "ngpt":
            nd = lambda feats, bias, norm_in, name: NormDense(
                feats, norm_dim_in=norm_in, use_bias=bias,
                dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name,
            )
            # q/v carry biases, k does not (reference: modeling_nwhisper.py:469-473)
            self.wq = nd(inner, True, True, "wq")
            self.wk = nd(inner, False, True, "wk")
            self.wv = nd(inner, True, True, "wv")
            self.wo = nd(cfg.d_model, True, False, "wo")
            self.qk_scale = HyperScale(inner, 1.0, cfg.d_model**-1,
                                       cfg.param_dtype, name="qk_scale")
            return
        bias = cfg.attention_bias
        dense_cls = QDense if cfg.quantized_weights else nn.Dense
        dense = lambda feats, name: dense_cls(
            feats, use_bias=bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name
        )
        if self.is_cross:
            self.wq = dense(inner, "wq")
            self.wkv = dense(2 * inner, "wkv")
        else:
            self.wqkv = dense(3 * inner, "wqkv")
        self.wo = dense(cfg.d_model, "wo")

    @property
    def is_local(self) -> bool:
        return self.layer_idx % self.config.global_attn_every_n_layers != 0

    @property
    def rope_theta(self) -> float:
        return self.config.rope_local_theta if self.is_local else self.config.rope_global_theta

    def _heads(self, x: jnp.ndarray, n: int) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, n, -1)

    def __call__(
        self,
        x: jnp.ndarray,
        kv_source: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        cache: Optional[dict] = None,
        cache_index: Optional[jnp.ndarray] = None,
        pos_bias: Optional[jnp.ndarray] = None,
    ):
        """Returns (out, new_cache). ``cache`` holds preallocated k/v of shape
        (B, max_len, H, D); ``cache_index`` is the write position for
        single-step decode. For cross attention with a cache, k/v are
        computed once by the engine and passed in via ``cache`` directly."""
        cfg = self.config
        b, t, _ = x.shape
        h = self.num_heads
        ngpt = cfg.norm_scheme == "ngpt"

        if self.is_cross:
            q = self._heads(self.wq(x), h)
            if cache is not None:
                if "k_scale" in cache:  # int8 KV (quantized_kv)
                    k = dequantize_kv(cache["k"], cache["k_scale"], cfg.dtype)
                    v = dequantize_kv(cache["v"], cache["v_scale"], cfg.dtype)
                else:
                    k, v = cache["k"], cache["v"]
                new_cache = cache
            elif ngpt:
                k = self._heads(self.wk(kv_source), h)
                v = self._heads(self.wv(kv_source), h)
                new_cache = None
            else:
                kv = self.wkv(kv_source)
                k, v = jnp.split(self._heads(kv, 2 * h), 2, axis=2)
                new_cache = None
            mask = attn_mask
        else:
            if ngpt:
                q = self._heads(self.wq(x), h)
                k = self._heads(self.wk(x), h)
                v = self._heads(self.wv(x), h)
            else:
                qkv = self._heads(self.wqkv(x), 3 * h)
                q, k, v = jnp.split(qkv, 3, axis=2)
            if cfg.position_scheme == "rope":
                theta = self.rope_theta
                if cfg.rope_type == "dynamic":
                    seq_len = cache["k"].shape[1] if cache is not None else t
                    max_pos = cfg.max_target_positions if self.is_decoder else cfg.max_source_positions
                    factor = (cfg.rope_decoder_scaling_factor if self.is_decoder
                              else cfg.rope_encoder_scaling_factor)
                    theta = dynamic_ntk_theta(theta, cfg.head_dim, seq_len, max_pos, factor)
                if cfg.rope_partial_factor < 1.0:
                    rotary_dim = int(cfg.head_dim * cfg.rope_partial_factor)
                    q = apply_rope_interleaved_partial(q, positions, theta, rotary_dim)
                    k = apply_rope_interleaved_partial(k, positions, theta, rotary_dim)
                else:
                    q = apply_rope(q, positions, theta)
                    k = apply_rope(k, positions, theta)

            if cache is not None:
                # single-step (or chunked) decode: write k/v at cache_index
                if "k_scale" in cache:  # int8 KV (quantized_kv)
                    kq_new, ks_new = quantize_kv(k)
                    vq_new, vs_new = quantize_kv(v)
                    new_cache = {
                        "k": jax.lax.dynamic_update_slice(cache["k"], kq_new, (0, cache_index, 0, 0)),
                        "k_scale": jax.lax.dynamic_update_slice(cache["k_scale"], ks_new, (0, cache_index, 0)),
                        "v": jax.lax.dynamic_update_slice(cache["v"], vq_new, (0, cache_index, 0, 0)),
                        "v_scale": jax.lax.dynamic_update_slice(cache["v_scale"], vs_new, (0, cache_index, 0)),
                    }
                else:
                    k_cache = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype), (0, cache_index, 0, 0))
                    v_cache = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype), (0, cache_index, 0, 0))
                    new_cache = {"k": k_cache, "v": v_cache}
                if (
                    t == 1
                    and b >= 2  # batch 1 is weight-bound; the switch only adds overhead (measured)
                    and not ngpt
                    and pos_bias is None
                    and cfg.decode_attend_bucket > 0
                    and new_cache["k"].shape[1] > cfg.decode_attend_bucket
                ):
                    # bucketed live-prefix attention: HBM cache reads are the
                    # bound resource late in a long decode (measured v5e,
                    # batch 8 x 2560 window: full-cache reads cap ~1.4k tok/s
                    # vs ~3.1k at short buffers). A lax.switch over static
                    # prefix lengths reads only ceil(live/bucket) slots;
                    # masked tails contribute exp(-inf)=0 exactly, so logits
                    # are bit-identical to the full read.
                    out = self._bucketed_decode_attend(
                        q, new_cache, cache_index, attn_mask
                    )
                    out = out.reshape(b, t, -1)
                    return self.wo(out), new_cache
                if "k_scale" in new_cache:
                    k = dequantize_kv(new_cache["k"], new_cache["k_scale"], cfg.dtype)
                    v = dequantize_kv(new_cache["v"], new_cache["v_scale"], cfg.dtype)
                else:
                    k, v = new_cache["k"], new_cache["v"]
                # causal mask against absolute cache positions
                k_pos = jnp.arange(k.shape[1])
                q_pos = cache_index + jnp.arange(t)
                mask = (k_pos[None, :] <= q_pos[:, None])[None, None]
                if self.is_local:
                    mask = mask & sliding_window_mask(q_pos, k_pos, cfg.local_attention)[None, None]
                if attn_mask is not None:
                    mask = mask & attn_mask
            else:
                new_cache = None
                mask = attn_mask
                pos = positions if positions is not None else jnp.arange(t)[None].repeat(b, 0)
                if self.is_causal:
                    causal = pos[0][:, None] >= pos[0][None, :]
                    causal = causal[None, None]
                    mask = causal if mask is None else (mask & causal)
                if self.is_local:
                    band = sliding_window_mask(pos[0], pos[0], cfg.local_attention)[None, None]
                    mask = band if mask is None else (mask & band)

        if ngpt:
            # q pre-scaled by sqrt(head_dim); q/k l2-normalized per head and
            # rescaled by the learned sqk (reference: modeling_nwhisper.py:
            # 503-535); applied post-cache so cached keys stay raw
            head_dim = q.shape[-1]
            sqk = self.qk_scale().reshape(1, 1, h, head_dim).astype(jnp.float32)
            q = sqk * l2norm(q.astype(jnp.float32)) * head_dim**0.5
            k = sqk * l2norm(k.astype(jnp.float32))
            q = q.astype(cfg.dtype)
            k = k.astype(cfg.dtype)
            out = _attend(q, k, v, mask, cfg.dtype, bias=pos_bias, scaled=False)
        elif self._banded_eligible(cache, pos_bias, attn_mask, positions, t):
            # sliding-window layers in O(T·window): each query chunk attends
            # only its 3 neighboring chunks — ~13x fewer attention FLOPs at
            # the v32 decoder shape than the full masked matmul (which both
            # XLA and the Pallas kernel otherwise pay)
            out = _attend_banded_chunked(
                q, k, v,
                window=cfg.local_attention,
                causal=self.is_causal,
                key_mask=attn_mask[:, 0, 0, :] if attn_mask is not None else None,
                dtype=cfg.dtype,
                scaled=cfg.attention_scale,
            )
        elif self._flash_eligible(cache, pos_bias, attn_mask, q, k):
            from ..ops.attention_kernel import flash_attention

            kv_mask = attn_mask[:, 0, 0, :] if attn_mask is not None else None
            out = flash_attention(
                q, k, v, kv_mask,
                causal=self.is_causal and not self.is_cross,
                window=cfg.local_attention if (not self.is_cross and self.is_local) else 0,
            ).astype(cfg.dtype)
        else:
            out = _attend(q, k, v, mask, cfg.dtype, bias=pos_bias, scaled=cfg.attention_scale)
        out = out.reshape(b, t, -1)
        return self.wo(out), new_cache

    def _bucketed_decode_attend(self, q, cache, cache_index, attn_mask):
        """Single-step cached attention over only the live cache prefix,
        selected by ``lax.switch`` over static bucket lengths. With an int8
        cache (``k_scale`` present) the slice happens BEFORE the dequant, so
        only live int8 bytes cross HBM."""
        cfg = self.config
        bucket = cfg.decode_attend_bucket
        max_len = cache["k"].shape[1]
        n_buckets = -(-max_len // bucket)  # ceil

        def make_branch(nb: int):
            limit = min(nb * bucket, max_len)

            def branch(q, cache, cache_index, key_mask):
                k = jax.lax.slice_in_dim(cache["k"], 0, limit, axis=1)
                v = jax.lax.slice_in_dim(cache["v"], 0, limit, axis=1)
                if "k_scale" in cache:
                    k = dequantize_kv(k, jax.lax.slice_in_dim(cache["k_scale"], 0, limit, axis=1), cfg.dtype)
                    v = dequantize_kv(v, jax.lax.slice_in_dim(cache["v_scale"], 0, limit, axis=1), cfg.dtype)
                k_pos = jnp.arange(limit)
                q_pos = cache_index + jnp.arange(1)
                mask = (k_pos[None, :] <= q_pos[:, None])[None, None]
                if self.is_local:
                    mask = mask & sliding_window_mask(q_pos, k_pos, cfg.local_attention)[None, None]
                if key_mask is not None:
                    mask = mask & key_mask[..., :limit]
                return _attend(q, k, v, mask, cfg.dtype, scaled=cfg.attention_scale)

            return branch

        idx = jnp.clip(cache_index // bucket, 0, n_buckets - 1)
        branches = [make_branch(nb + 1) for nb in range(n_buckets)]
        return jax.lax.switch(idx, branches, q, cache, cache_index, attn_mask)

    def _banded_eligible(self, cache, pos_bias, attn_mask, positions, t) -> bool:
        """Chunked banded attention covers the non-cached forward of
        sliding-window SELF-attention layers with arange positions (training
        and full prefill) and at most a key-padding mask; anything fancier
        (caches, biases, custom position layouts) falls through to the
        flash/XLA paths, whose in-band masking is exact."""
        cfg = self.config
        if not cfg.banded_local_attention or self.is_cross or not self.is_local:
            return False
        if cache is not None or pos_bias is not None or positions is not None:
            return False
        c = cfg.local_attention // 2
        if c < 1 or t % c != 0 or t // c < 3:
            return False
        if attn_mask is not None and not (
            attn_mask.ndim == 4 and attn_mask.shape[1] == 1 and attn_mask.shape[2] == 1
        ):
            return False
        return True

    def _flash_eligible(self, cache, pos_bias, attn_mask, q, k) -> bool:
        """Pallas path covers the full-sequence (non-cached) forward with
        structural masks only; causal indices assume arange positions, which
        every non-cached caller uses. Gate: total logits elements B*H*Tq*S
        (the fp32 HBM round-trip the XLA composite pays) >= flash_min_logits
        — the measured batch-1 par point (12 x 2560^2) where the kernel
        matches XLA; it wins massively beyond (60x at 8k^2) and at large
        batch (+10.5% on the batch-16 v32 train step via its encoder/cross
        attention); XLA's fusions are faster below."""
        cfg = self.config
        if not cfg.use_flash_attention or cache is not None or pos_bias is not None:
            return False
        if not cfg.attention_scale:
            return False
        if q.shape[0] * q.shape[2] * q.shape[1] * k.shape[1] < cfg.flash_min_logits:
            return False
        if attn_mask is not None and not (
            attn_mask.ndim == 4 and attn_mask.shape[1] == 1 and attn_mask.shape[2] == 1
        ):
            return False
        return jax.default_backend() == "tpu"


class FeedForward(nn.Module):
    config: TransformerConfig
    ffn_dim: int
    is_decoder: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        # torch ACT2FN["gelu"] is the exact erf form; "gelu_tanh" is torch's
        # gelu_new / gelu_pytorch_tanh (T5 v1.1 gated-gelu)
        act_name = cfg.activation
        if self.is_decoder and cfg.decoder_activation is not None:
            act_name = cfg.decoder_activation
        act = {
            "gelu": lambda v: nn.gelu(v, approximate=False),
            "gelu_tanh": nn.gelu,
            "relu": nn.relu,
            "silu": nn.silu,
        }[act_name]
        if self.is_decoder and cfg.decoder_ffn_gated_concat:
            # HF MoonshineDecoderMLP: fc1 -> (hidden, gate), act(gate)*hidden
            h = nn.Dense(2 * self.ffn_dim, use_bias=cfg.mlp_bias, dtype=cfg.dtype,
                         param_dtype=cfg.param_dtype, name="fc1")(x)
            hidden, gate = jnp.split(h, 2, axis=-1)
            h = act(gate) * hidden
            h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
            return nn.Dense(cfg.d_model, use_bias=cfg.mlp_bias, dtype=cfg.dtype,
                            param_dtype=cfg.param_dtype, name="fc2")(h)
        if cfg.norm_scheme == "ngpt":
            h = NormDense(self.ffn_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc1")(x)
            h = act(h)
            h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
            return NormDense(cfg.d_model, norm_dim_in=False, dtype=cfg.dtype,
                             param_dtype=cfg.param_dtype, name="fc2")(h)
        dense_cls = QDense if cfg.quantized_weights else nn.Dense
        bias = cfg.mlp_bias
        h = dense_cls(self.ffn_dim, use_bias=bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc1")(x)
        h = act(h)
        if cfg.ffn_gated:  # T5 v1.1 gated activation
            h = h * dense_cls(self.ffn_dim, use_bias=bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc1_gate")(x)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)
        h = dense_cls(cfg.d_model, use_bias=bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="fc2")(h)
        return h


class EncoderLayer(nn.Module):
    config: TransformerConfig
    layer_idx: int

    def setup(self):
        cfg = self.config
        self.self_attn = Attention(cfg, cfg.encoder_heads, is_causal=False, layer_idx=self.layer_idx, name="self_attn")
        self.ffn = FeedForward(cfg, cfg.encoder_ffn, name="ffn")
        if cfg.norm_scheme == "ngpt":
            self.attn_residual = HyperResidual(cfg.d_model, cfg.ngpt_alpha_init, param_dtype=cfg.param_dtype, name="attn_residual")
            self.ffn_residual = HyperResidual(cfg.d_model, cfg.ngpt_alpha_init, param_dtype=cfg.param_dtype, name="ffn_residual")
        else:
            self.self_attn_norm = Norm(cfg, name="self_attn_norm")
            self.final_norm = Norm(cfg, name="final_norm")

    def __call__(self, x, positions, attn_mask=None, pos_bias=None, deterministic: bool = True):
        if self.config.norm_scheme == "ngpt":
            attn_out, _ = self.self_attn(x, positions=positions, attn_mask=attn_mask, pos_bias=pos_bias)
            x = self.attn_residual(x, attn_out)
            return self.ffn_residual(x, self.ffn(x, deterministic=deterministic))
        attn_out, _ = self.self_attn(
            self.self_attn_norm(x), positions=positions, attn_mask=attn_mask, pos_bias=pos_bias
        )
        x = x + attn_out
        x = x + self.ffn(self.final_norm(x), deterministic=deterministic)
        return x


class DecoderLayer(nn.Module):
    config: TransformerConfig
    layer_idx: int

    def setup(self):
        cfg = self.config
        self.self_attn = Attention(
            cfg, cfg.decoder_heads, is_causal=True, is_decoder=True, layer_idx=self.layer_idx, name="self_attn"
        )
        self.cross_attn = Attention(cfg, cfg.decoder_heads, is_cross=True, name="cross_attn")
        self.ffn = FeedForward(cfg, cfg.decoder_ffn, is_decoder=True, name="ffn")
        if cfg.norm_scheme == "ngpt":
            self.attn_residual = HyperResidual(cfg.d_model, cfg.ngpt_alpha_init, param_dtype=cfg.param_dtype, name="attn_residual")
            self.cross_residual = HyperResidual(cfg.d_model, cfg.ngpt_alpha_init, param_dtype=cfg.param_dtype, name="cross_residual")
            self.ffn_residual = HyperResidual(cfg.d_model, cfg.ngpt_alpha_init, param_dtype=cfg.param_dtype, name="ffn_residual")
        else:
            self.self_attn_norm = Norm(cfg, name="self_attn_norm")
            self.cross_attn_norm = Norm(cfg, name="cross_attn_norm")
            self.final_norm = Norm(cfg, name="final_norm")

    def __call__(
        self,
        x,
        encoder_states,
        positions,
        self_mask=None,
        cross_mask=None,
        cache: Optional[dict] = None,
        cache_index=None,
        pos_bias=None,
        deterministic: bool = True,
    ):
        self_cache = cache["self"] if cache is not None else None
        cross_cache = cache["cross"] if cache is not None else None
        ngpt = self.config.norm_scheme == "ngpt"

        attn_out, new_self = self.self_attn(
            x if ngpt else self.self_attn_norm(x),
            positions=positions,
            attn_mask=self_mask,
            cache=self_cache,
            cache_index=cache_index,
            pos_bias=pos_bias,
        )
        x = self.attn_residual(x, attn_out) if ngpt else x + attn_out

        cross_out, _ = self.cross_attn(
            x if ngpt else self.cross_attn_norm(x),
            kv_source=encoder_states,
            attn_mask=cross_mask,
            cache=cross_cache,
        )
        x = self.cross_residual(x, cross_out) if ngpt else x + cross_out

        if ngpt:
            x = self.ffn_residual(x, self.ffn(x, deterministic=deterministic))
        else:
            x = x + self.ffn(self.final_norm(x), deterministic=deterministic)
        new_cache = {"self": new_self, "cross": cross_cache} if cache is not None else None
        return x, new_cache


def whisper_sinusoids(length: int, channels: int) -> jnp.ndarray:
    """Whisper's fixed sinusoidal positional embedding."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv_timescales = jnp.exp(-log_timescale * jnp.arange(channels // 2, dtype=jnp.float32))
    scaled = jnp.arange(length, dtype=jnp.float32)[:, None] * inv_timescales[None, :]
    return jnp.concatenate([jnp.sin(scaled), jnp.cos(scaled)], axis=1)


def _remat_policy(cfg: TransformerConfig):
    """Map cfg.remat_policy to a jax.checkpoint policy (None = save nothing)."""
    if cfg.remat_policy == "full":
        return None
    if cfg.remat_policy == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy {cfg.remat_policy!r} (expected 'full' or 'dots')")


class Encoder(nn.Module):
    config: TransformerConfig

    @nn.compact
    def __call__(self, features: jnp.ndarray, deterministic: bool = True,
                 attn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """features: (B, T, num_mel_bins) -> (B, T(/2 with conv stem), D).
        ``attn_mask``: optional (B, 1, 1, T) key mask (token towers with
        padded inputs, e.g. the CM3P beatmap encoder)."""
        cfg = self.config
        x = features.astype(cfg.dtype)
        if cfg.conv_stem and cfg.stem_type == "moonshine":
            # raw-wave stem (HF MoonshineEncoder): (B, samples, 1) in
            x = nn.Conv(cfg.d_model, (127,), strides=(64,), padding="VALID", use_bias=False,
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv1")(x)
            x = jnp.tanh(x)
            x = nn.GroupNorm(num_groups=1, epsilon=1e-5, dtype=cfg.dtype,
                             param_dtype=cfg.param_dtype, name="groupnorm")(x)
            x = nn.Conv(2 * cfg.d_model, (7,), strides=(3,), padding="VALID",
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv2")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Conv(cfg.d_model, (3,), strides=(2,), padding="VALID",
                        dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv3")(x)
            x = nn.gelu(x, approximate=False)
        elif cfg.conv_stem:
            x = nn.Conv(cfg.d_model, (3,), padding=1, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv1")(x)
            x = nn.gelu(x, approximate=False)
            x = nn.Conv(
                cfg.d_model, (3,), strides=(2,), padding=1, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="conv2"
            )(x)
            x = nn.gelu(x, approximate=False)

        b, t, _ = x.shape
        positions = jnp.arange(t)[None].repeat(b, 0)
        if cfg.norm_scheme == "ngpt":
            # reference modeling_nwhisper.py:1402-1410: l2norm the conv output,
            # then slerp toward learned (frozen) absolute position rows
            pos_table = self.param(
                "embed_positions",
                lambda key, shape: whisper_sinusoids(*shape).astype(cfg.param_dtype),
                (cfg.max_source_positions, cfg.d_model),
            )
            alpha = HyperScale(cfg.d_model, cfg.ngpt_alpha_pos_init, cfg.d_model**-0.5,
                               cfg.param_dtype, name="alpha_positions")()
            xf = l2norm(x.astype(jnp.float32))
            p = pos_table[None, :t].astype(jnp.float32)
            x = l2norm(xf + alpha * (p - xf)).astype(cfg.dtype)
        elif cfg.position_scheme == "whisper_abs":
            x = x + whisper_sinusoids(cfg.max_source_positions, cfg.d_model)[None, :t].astype(cfg.dtype)

        pos_bias = None
        if cfg.position_scheme == "t5_relpos":
            # bias lives on the first layer and is shared (HF T5 semantics)
            pos_bias = RelativePositionBias(cfg, cfg.encoder_heads, bidirectional=True,
                                            name="rel_bias")(jnp.arange(t), jnp.arange(t))

        # deterministic (arg 5 incl. self) stays static under remat
        layer_cls = (
            nn.remat(EncoderLayer, static_argnums=(5,), policy=_remat_policy(cfg))
            if cfg.remat else EncoderLayer
        )
        for i in range(cfg.encoder_layers):
            x = layer_cls(cfg, layer_idx=i, name=f"layers_{i}")(
                x, positions, attn_mask, pos_bias, deterministic
            )
        return Norm(cfg, name="norm")(x)


class Decoder(nn.Module):
    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.input_vocab_size or cfg.vocab_size,
            cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="embed_tokens"
        )
        if cfg.position_scheme == "whisper_abs":
            self.embed_positions = nn.Embed(
                cfg.max_target_positions, cfg.d_model, dtype=cfg.dtype, param_dtype=cfg.param_dtype
            )
        if cfg.norm_scheme == "ngpt":
            # reference modeling_nwhisper.py:1450-1452,1650: token embeds are
            # slerped toward learned absolute position rows
            self.alpha_positions = HyperScale(
                cfg.d_model, cfg.ngpt_alpha_pos_init, cfg.d_model**-0.5,
                cfg.param_dtype, name="alpha_positions"
            )
        if cfg.position_scheme == "t5_relpos":
            self.rel_bias = RelativePositionBias(cfg, cfg.decoder_heads, bidirectional=False, name="rel_bias")
        layer_cls = (
            nn.remat(DecoderLayer, static_argnums=(9,), policy=_remat_policy(cfg))
            if cfg.remat else DecoderLayer
        )
        self.layers = [
            layer_cls(cfg, layer_idx=i, name=f"layers_{i}") for i in range(cfg.decoder_layers)
        ]
        self.norm = Norm(cfg, name="norm")

    def __call__(
        self,
        inputs_embeds: jnp.ndarray,
        encoder_states: Optional[jnp.ndarray],
        positions: Optional[jnp.ndarray] = None,
        self_mask: Optional[jnp.ndarray] = None,
        cross_mask: Optional[jnp.ndarray] = None,
        cache: Optional[list] = None,
        cache_index=None,
        deterministic: bool = True,
        k_positions: Optional[jnp.ndarray] = None,
    ):
        cfg = self.config
        x = inputs_embeds.astype(cfg.dtype)
        if cfg.scale_embedding:
            x = x * math.sqrt(cfg.d_model)
        b, t, _ = x.shape
        if positions is None:
            positions = jnp.arange(t)[None].repeat(b, 0)
        if cfg.position_scheme == "whisper_abs":
            p = self.embed_positions(positions)
            if cfg.norm_scheme == "ngpt":
                alpha = self.alpha_positions()
                xf = x.astype(jnp.float32)
                x = l2norm(xf + alpha * (p.astype(jnp.float32) - xf)).astype(cfg.dtype)
            else:
                x = x + p

        pos_bias = None
        if cfg.position_scheme == "t5_relpos":
            # keys span the whole cache during decode, else the current block
            k_len = cache[0]["self"]["k"].shape[1] if cache is not None else t
            if k_positions is not None:
                # per-row logical key positions (cached decode with left-padded
                # prompt buckets: cache slots != logical positions)
                pos_bias = self.rel_bias(positions, k_positions)
            else:
                pos_bias = self.rel_bias(positions[0], jnp.arange(k_len))

        new_caches = []
        for i, layer in enumerate(self.layers):
            layer_cache = cache[i] if cache is not None else None
            # positional args so deterministic (9) stays static under remat
            x, new_cache = layer(
                x,
                encoder_states,
                positions,
                self_mask,
                cross_mask,
                layer_cache,
                cache_index,
                pos_bias,
                deterministic,
            )
            new_caches.append(new_cache)
        x = self.norm(x)
        return x, (new_caches if cache is not None else None)

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        e = self.embed_tokens(input_ids)
        if self.config.norm_scheme == "ngpt":  # rows live on the hypersphere
            e = l2norm(e)
        return e


class OsuTransformer(nn.Module):
    """Encoder-decoder with LM head. ``__call__`` is the training/teacher-
    forcing path; ``decode_step`` is the cached autoregressive path."""

    config: TransformerConfig

    def setup(self):
        cfg = self.config
        self.encoder = Encoder(cfg, name="encoder")
        self.decoder = Decoder(cfg, name="decoder")
        if cfg.norm_scheme == "ngpt":
            # normalized head with a learned logit scale
            # (reference: modeling_nwhisper.py:2043-2044, 2132-2133)
            self.proj_out = NormDense(
                cfg.vocab_size, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="proj_out"
            )
            self.logit_scale = HyperScale(
                cfg.vocab_size, 1.0, cfg.d_model**-0.5, cfg.param_dtype, name="logit_scale"
            )
        elif not cfg.tie_word_embeddings:
            head_cls = QDense if cfg.quantized_weights else nn.Dense
            self.proj_out = head_cls(
                cfg.vocab_size, use_bias=False, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="proj_out"
            )

    def _lm_head(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.config.norm_scheme == "ngpt":
            return self.proj_out(x) * self.logit_scale().astype(self.config.dtype)
        if self.config.tie_word_embeddings:
            return self.decoder.embed_tokens.attend(x)
        return self.proj_out(x)

    def encode(self, features: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        return self.encoder(features, deterministic=deterministic)

    def __call__(
        self,
        features: Optional[jnp.ndarray] = None,
        decoder_inputs_embeds: Optional[jnp.ndarray] = None,
        decoder_input_ids: Optional[jnp.ndarray] = None,
        decoder_attention_mask: Optional[jnp.ndarray] = None,
        encoder_states: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced forward -> logits (B, T, vocab)."""
        if encoder_states is None:
            encoder_states = self.encoder(features, deterministic=deterministic)
        if decoder_inputs_embeds is None:
            decoder_inputs_embeds = self.decoder.embed(decoder_input_ids)
        self_mask = None
        if decoder_attention_mask is not None:
            self_mask = decoder_attention_mask[:, None, None, :].astype(bool)
        x, _ = self.decoder(
            decoder_inputs_embeds, encoder_states, self_mask=self_mask, deterministic=deterministic
        )
        return self._lm_head(x)

    def init_cache(self, batch: int, max_len: int, encoder_states: jnp.ndarray) -> list:
        """Preallocated KV cache; cross k/v computed once here."""
        cfg = self.config
        h, d = cfg.decoder_heads, cfg.head_dim
        caches = []
        for layer in self.decoder.layers:
            if cfg.norm_scheme == "ngpt":
                k = layer.cross_attn.wk(encoder_states).reshape(
                    encoder_states.shape[0], encoder_states.shape[1], h, d
                )
                v = layer.cross_attn.wv(encoder_states).reshape(
                    encoder_states.shape[0], encoder_states.shape[1], h, d
                )
            else:
                kv = layer.cross_attn.wkv(encoder_states)
                k, v = jnp.split(kv.reshape(kv.shape[0], kv.shape[1], 2 * h, d), 2, axis=2)
            if cfg.quantized_kv:
                kq, ks = quantize_kv(k)
                vq, vs = quantize_kv(v)
                caches.append(
                    {
                        "self": {
                            "k": jnp.zeros((batch, max_len, h, d), jnp.int8),
                            "k_scale": jnp.zeros((batch, max_len, h), jnp.float32),
                            "v": jnp.zeros((batch, max_len, h, d), jnp.int8),
                            "v_scale": jnp.zeros((batch, max_len, h), jnp.float32),
                        },
                        "cross": {"k": kq, "k_scale": ks, "v": vq, "v_scale": vs},
                    }
                )
            else:
                caches.append(
                    {
                        "self": {
                            "k": jnp.zeros((batch, max_len, h, d), cfg.dtype),
                            "v": jnp.zeros((batch, max_len, h, d), cfg.dtype),
                        },
                        "cross": {"k": k.astype(cfg.dtype), "v": v.astype(cfg.dtype)},
                    }
                )
        return caches

    def decode_step(
        self,
        input_embeds: jnp.ndarray,
        cache: list,
        cache_index,
        self_mask: Optional[jnp.ndarray] = None,
        cross_mask: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        k_positions: Optional[jnp.ndarray] = None,
    ):
        """One (or a chunk of) decode step(s) with cache update.

        input_embeds: (B, t, D) for the new token(s); cache_index: scalar
        write offset into the cache. ``positions`` are the logical (RoPE)
        positions (B, t) — pass mask-aware positions to make left padding
        output-invariant; defaults to the cache slot index. ``k_positions``
        (B, max_len) are the logical positions of each cache slot — required
        for t5_relpos decode so the bias sees true distances.
        Returns (logits, new_cache)."""
        b, t, _ = input_embeds.shape
        if positions is None:
            positions = (cache_index + jnp.arange(t))[None].repeat(b, 0)
        x, new_cache = self.decoder(
            input_embeds,
            encoder_states=None,
            positions=positions,
            self_mask=self_mask,
            cross_mask=cross_mask,
            cache=cache,
            cache_index=cache_index,
            k_positions=k_positions,
        )
        return self._lm_head(x), new_cache

    def embed_decoder_ids(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.decoder.embed(input_ids)

    # common engine-facing name (Mapperatorinator exposes the same)
    def embed_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.decoder.embed(input_ids)
