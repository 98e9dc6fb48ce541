"""The Mapperatorinator model: mel front-end + conditioning embedders +
pluggable seq2seq backbone + rhythm-weighted loss.

Functional equivalent of the reference wrapper (reference:
``osuT5/osuT5/model/modeling_mapperatorinator.py:60-659``,
``configuration_mapperatorinator.py:7-177``), redesigned for JAX: the
spectrogram runs on-device inside the jitted forward, conditioning embeddings
concatenate onto the mel features before the encoder projection, the decoder
embeds ``vocab_size_in`` ids while the LM head emits ``vocab_size_out``
logits, and the loss is label-smoothed rhythm-weighted cross entropy. CFG
dual-batching lives in the decode engine, not here.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..audio.mel import MelSpectrogram
from ..osu.events import EventType
from .transformer import OsuTransformer, TransformerConfig

LABEL_IGNORE_ID = -100

# Public whisper family dimensions (model card constants) — the reference
# resolves these from the HF hub; we pin them locally (no egress).
WHISPER_DIMS = {
    "tiny": dict(d_model=384, layers=4, heads=6, ffn=1536),
    "base": dict(d_model=512, layers=6, heads=8, ffn=2048),
    "small": dict(d_model=768, layers=12, heads=12, ffn=3072),
    "smaller": dict(d_model=512, layers=8, heads=8, ffn=2048),
    "medium": dict(d_model=1024, layers=24, heads=16, ffn=4096),
}

# t5 v1.1 sizes (HF google/t5-v1_1-*): d_kv stays 64 while heads*64 != d_model
T5_DIMS = {
    "small": dict(d_model=512, layers=8, heads=6, ffn=1024, head_dim=64),
    "base": dict(d_model=768, layers=12, heads=12, ffn=2048, head_dim=64),
}

# HF UsefulSensors/moonshine-* (MoonshineConfig defaults)
MOONSHINE_DIMS = {
    "tiny": dict(d_model=288, layers=6, heads=8, ffn=1152),
    "base": dict(d_model=416, layers=8, heads=8, ffn=1664),
}


@dataclasses.dataclass(frozen=True)
class MapperatorinatorConfig:
    backbone: TransformerConfig = TransformerConfig()
    input_raw_wave: bool = False  # moonshine: raw samples into the backbone
    vocab_size_in: int = 9920
    vocab_size_out: int = 3988
    num_classes: int = 0
    num_mappers: int = 3731
    input_features: bool = True
    project_encoder_input: bool = True
    embed_decoder_input: bool = True
    do_style_embed: bool = False
    do_difficulty_embed: bool = False
    do_mapper_embed: bool = False
    do_song_position_embed: bool = False
    cond_dim: int = 128
    cond_size: int = 0
    # spectrogram
    spectrogram_implementation: str = "xla"
    spectrogram_log_scale: bool = False
    sample_rate: int = 16000
    n_fft: int = 1024
    n_mels: int = 388
    hop_length: int = 128
    f_min: float = 0
    f_max: float = 8000
    pad_mode: str = "constant"
    # loss
    rhythm_weight: float = 3.0
    rhythm_token_start: int = 17
    rhythm_token_end: int = 836
    label_smoothing: float = 0.0
    init_std: float = 0.02
    # generation defaults
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2
    max_target_positions: int = 2048


def _whisper_size(name: str) -> dict:
    for key, dims in WHISPER_DIMS.items():
        if name.endswith(key):
            return dims
    raise ValueError(f"unknown whisper size in backbone name: {name}")


def _t5_size(name: str) -> dict:
    for key, dims in T5_DIMS.items():
        if name.endswith(key):
            return dims
    raise ValueError(f"unknown t5 size in backbone name: {name}")


def build_config(train_args, vocab) -> MapperatorinatorConfig:
    """Materialize a MapperatorinatorConfig from a TrainConfig + Vocabulary —
    the reference's config plumbing (configuration_mapperatorinator.py:66-135)
    without hub lookups."""
    m = train_args.model
    name = m.name
    overwrite = dict(m.overwrite or {})
    tie = overwrite.pop("tie_word_embeddings", True)
    dropout = overwrite.pop("dropout", 0.0)

    # Training compute dtype from the accelerate-style mixed_precision flag
    # (reference train.py passes it to Accelerator; v32.yaml:7 trains bf16).
    # Params stay fp32 (flax param_dtype) — this is bf16 *mixed* precision,
    # matmuls/activations in bf16, master weights and the CE loss in fp32.
    # fp16 maps to bf16: the TPU MXU has no fp16 path and bf16 needs no loss
    # scaling. Inference entries override per their own `precision` flag.
    mp = str(getattr(train_args, "mixed_precision", None) or "no").lower()
    compute_dtype = jnp.bfloat16 if mp in ("bf16", "bfloat16", "fp16", "float16") else jnp.float32

    # backbone family dispatch (reference: modeling_mapperatorinator.py:16-58)
    head_dim_override = None
    attention_scale, attention_bias, ffn_gated = True, m.attention_bias, False
    conv_stem = True
    norm_scheme = "prenorm"
    input_vocab_size = None
    norm_eps = None
    activation = "gelu"
    mlp_bias = True
    decoder_activation = None
    decoder_ffn_gated_concat = False
    norm_bias = True
    stem_type = "whisper"
    rope_partial_factor = 1.0
    if name.startswith("OliBomby/nwhisper") or name.startswith("olibomby/nwhisper"):
        dims = _whisper_size(name)
        position_scheme, norm = "whisper_abs", "layer"
        norm_scheme = "ngpt"
        # the backbone embeds in-vocab decoder ids itself
        # (reference configuration_mapperatorinator.py:110-111)
        input_vocab_size = vocab.vocab_size_in
    elif name.startswith("google/t5"):
        dims = _t5_size(name)
        head_dim_override = dims["head_dim"]
        position_scheme, norm = "t5_relpos", "rms"
        attention_scale, attention_bias, ffn_gated = False, False, True
        mlp_bias = False
        conv_stem = False
        norm_eps = 1e-6  # T5 layer_norm_epsilon
        activation = "gelu_tanh"  # HF gated-gelu uses gelu_new (tanh form)
    elif name.startswith("OliBomby/varwhisper"):
        dims = _whisper_size(name)
        position_scheme, norm = "rope", "rms"
    elif name.startswith("Tiger14n/ropewhisper"):
        dims = _whisper_size(name)
        # RoPEWhisper normalizes with nn.RMSNorm throughout
        # (reference modeling_ropewhisper.py:768,774,847-859,1150,1316)
        position_scheme, norm = "rope", "rms"
    elif name.startswith("UsefulSensors/moonshine"):
        # the reference's own moonshine branch is unimportable in its repo
        # (modeling_mapperatorinator.py:40-44 raises ImportError when
        # selected); this implements the HF MoonshineForConditionalGeneration
        # architecture so the config preset actually runs here: raw-wave conv
        # stem, partial interleaved rotary, bias-free LayerNorms, silu
        # gated-concat decoder MLP
        size = name.rsplit("-", 1)[-1]
        dims = MOONSHINE_DIMS.get(size, MOONSHINE_DIMS["tiny"])
        position_scheme, norm = "rope", "layer"
        attention_bias = False
        norm_bias = False
        stem_type = "moonshine"
        rope_partial_factor = 0.9
        decoder_activation = "silu"
        decoder_ffn_gated_concat = True
    elif "whisper" in name:
        dims = _whisper_size(name)
        position_scheme, norm = "whisper_abs", "layer"
    else:
        dims = _whisper_size(name)
        position_scheme, norm = "rope", "rms"

    backbone = TransformerConfig(
        vocab_size=vocab.vocab_size_out,
        d_model=overwrite.pop("d_model", dims["d_model"]),
        encoder_layers=overwrite.pop("encoder_layers", dims["layers"]),
        decoder_layers=overwrite.pop("decoder_layers", dims["layers"]),
        encoder_heads=overwrite.pop("encoder_attention_heads", dims["heads"]),
        decoder_heads=overwrite.pop("decoder_attention_heads", dims["heads"]),
        encoder_ffn=overwrite.pop("encoder_ffn_dim", dims["ffn"]),
        decoder_ffn=overwrite.pop("decoder_ffn_dim", dims["ffn"]),
        activation=activation,
        dropout=dropout,
        max_source_positions=train_args.data.src_seq_len // 2,
        max_target_positions=train_args.data.tgt_seq_len,
        num_mel_bins=dims["d_model"] if m.project_encoder_input else m.spectrogram.n_mels + m.cond_size,
        position_scheme=position_scheme,
        rope_global_theta=m.global_rope_theta,
        rope_local_theta=m.local_rope_theta,
        rope_type=getattr(m, "rope_type", "default"),
        rope_encoder_scaling_factor=getattr(m, "rope_encoder_scaling_factor", 1.0),
        rope_decoder_scaling_factor=getattr(m, "rope_decoder_scaling_factor", 1.0),
        global_attn_every_n_layers=m.global_attn_every_n_layers,
        local_attention=m.local_attention,
        norm=norm,
        norm_eps=norm_eps,
        norm_scheme=norm_scheme,
        remat=bool(getattr(getattr(train_args, "parallel", None), "remat", False)),
        remat_policy=getattr(getattr(train_args, "parallel", None), "remat_policy", "full"),
        attention_bias=attention_bias,
        attention_scale=attention_scale,
        mlp_bias=mlp_bias,
        ffn_gated=ffn_gated,
        decoder_activation=decoder_activation,
        decoder_ffn_gated_concat=decoder_ffn_gated_concat,
        norm_bias=norm_bias,
        stem_type=stem_type,
        rope_partial_factor=rope_partial_factor,
        input_vocab_size=input_vocab_size,
        head_dim_override=head_dim_override,
        conv_stem=conv_stem,
        tie_word_embeddings=tie,
        pad_token_id=0,
        dtype=compute_dtype,
    )

    rhythm_start, rhythm_end = vocab.event_type_range(EventType.TIME_SHIFT)

    return MapperatorinatorConfig(
        backbone=backbone,
        vocab_size_in=vocab.vocab_size_in,
        vocab_size_out=vocab.vocab_size_out,
        num_classes=vocab.num_classes,
        num_mappers=vocab.num_mapper_classes,
        input_features=m.input_features,
        input_raw_wave=getattr(m, "input_raw_wave", False),
        project_encoder_input=m.project_encoder_input,
        embed_decoder_input=m.embed_decoder_input,
        do_style_embed=m.do_style_embed,
        do_difficulty_embed=m.do_difficulty_embed,
        do_mapper_embed=m.do_mapper_embed,
        do_song_position_embed=m.do_song_position_embed,
        cond_dim=m.cond_dim,
        cond_size=m.cond_size,
        spectrogram_implementation=m.spectrogram.implementation,
        spectrogram_log_scale=m.spectrogram.log_scale,
        sample_rate=m.spectrogram.sample_rate,
        n_fft=m.spectrogram.n_fft,
        n_mels=m.spectrogram.n_mels,
        hop_length=m.spectrogram.hop_length,
        f_min=m.spectrogram.f_min,
        f_max=m.spectrogram.f_max,
        pad_mode=m.spectrogram.pad_mode,
        rhythm_weight=train_args.data.rhythm_weight,
        rhythm_token_start=rhythm_start,
        rhythm_token_end=rhythm_end + 1,
        label_smoothing=train_args.data.label_smoothing,
        max_target_positions=train_args.data.tgt_seq_len,
    )


class RBFEmbedder(nn.Module):
    """Gaussian-RBF scalar embedder (difficulty / song position basis)."""

    num_basis: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        centers = self.param("basis_centers", lambda k: jnp.linspace(0, 1, self.num_basis))
        widths = self.param("basis_widths", lambda k: jnp.ones(self.num_basis) * 0.1)
        expanded = x[..., None]
        return jnp.exp(-((expanded - centers) ** 2) / (2 * widths**2)).astype(self.dtype)


class DifficultyEmbedder(nn.Module):
    hidden_size: int
    max_difficulty: float = 10.0
    num_basis: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, difficulty: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        basis = RBFEmbedder(self.num_basis, self.dtype, name="rbf")(difficulty / self.max_difficulty)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj1")(basis)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h)


class MapperStyleEmbedder(nn.Module):
    num_mappers: int
    embedding_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, mapper_ids: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        ids = jnp.where(mapper_ids == -1, self.num_mappers, mapper_ids)
        ids = jnp.clip(ids, 0, self.num_mappers)
        emb = nn.Embed(self.num_mappers + 1, self.embedding_dim, dtype=self.dtype, name="table")(ids)
        emb = nn.Dropout(0.1)(emb, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(emb)


class SongPositionEmbedder(nn.Module):
    hidden_size: int
    num_basis: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, position_range: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        rbf = RBFEmbedder(self.num_basis, self.dtype, name="rbf")
        combined = jnp.concatenate([rbf(position_range[:, 0]), rbf(position_range[:, 1])], axis=-1)
        h = nn.Dense(self.hidden_size * 2, dtype=self.dtype, name="proj1")(combined)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.1)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="proj2")(h)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(h)


class Mapperatorinator(nn.Module):
    config: MapperatorinatorConfig

    def setup(self):
        cfg = self.config
        b = cfg.backbone
        self.spectrogram = MelSpectrogram(
            implementation=cfg.spectrogram_implementation,
            log_scale=cfg.spectrogram_log_scale,
            sample_rate=cfg.sample_rate,
            n_fft=cfg.n_fft,
            n_mels=cfg.n_mels,
            hop_length=cfg.hop_length,
            f_min=cfg.f_min,
            f_max=cfg.f_max,
            pad_mode=cfg.pad_mode,
        )
        self.transformer = OsuTransformer(b, name="transformer")
        if cfg.do_style_embed:
            self.style_embedder = nn.Embed(cfg.num_classes + 1, b.d_model, name="style_embedder")
        if cfg.do_difficulty_embed:
            self.difficulty_embedder = DifficultyEmbedder(cfg.cond_dim, name="difficulty_embedder")
        if cfg.do_mapper_embed:
            self.mapper_embedder = MapperStyleEmbedder(cfg.num_mappers, cfg.cond_dim, name="mapper_embedder")
        if cfg.do_song_position_embed:
            self.song_pos_embedder = SongPositionEmbedder(cfg.cond_dim, name="song_pos_embedder")
        if cfg.project_encoder_input:
            self.encoder_embedder = nn.Dense(
                b.d_model, dtype=b.dtype, param_dtype=b.param_dtype, name="encoder_embedder"
            )
        if cfg.embed_decoder_input:
            self.decoder_embedder = nn.Embed(
                cfg.vocab_size_in, b.d_model, dtype=b.dtype, param_dtype=b.param_dtype, name="decoder_embedder"
            )

    # -- encoder path ---------------------------------------------------------

    def encode(
        self,
        frames: jnp.ndarray,
        beatmap_idx: Optional[jnp.ndarray] = None,
        difficulty: Optional[jnp.ndarray] = None,
        mapper_idx: Optional[jnp.ndarray] = None,
        song_position: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Raw audio samples (B, n_samples) -> encoder hidden states."""
        cfg = self.config
        if cfg.input_raw_wave:
            # moonshine: the backbone's conv stem consumes raw samples
            # (reference modeling_mapperatorinator.py:175-210 input_values)
            return self.transformer.encode(frames[..., None], deterministic=deterministic)
        mel = self.spectrogram(frames)  # (B, T, n_mels), fp32
        mel = mel.astype(cfg.backbone.dtype)
        conds = []
        if cfg.do_style_embed:
            idx = beatmap_idx if beatmap_idx is not None else jnp.full((frames.shape[0],), cfg.num_classes, jnp.int32)
            conds.append(self.style_embedder(idx))
        if cfg.do_difficulty_embed:
            conds.append(self.difficulty_embedder(difficulty, deterministic))
        if cfg.do_mapper_embed:
            conds.append(self.mapper_embedder(mapper_idx, deterministic))
        if cfg.do_song_position_embed:
            conds.append(self.song_pos_embedder(song_position, deterministic))
        if conds:
            expanded = [jnp.broadcast_to(c[:, None, :], (c.shape[0], mel.shape[1], c.shape[-1])) for c in conds]
            mel = jnp.concatenate([mel] + expanded, axis=-1)
        if cfg.project_encoder_input:
            mel = self.encoder_embedder(mel)
        return self.transformer.encode(mel, deterministic=deterministic)

    # -- teacher-forced forward -------------------------------------------------

    def __call__(
        self,
        frames: Optional[jnp.ndarray] = None,
        decoder_input_ids: Optional[jnp.ndarray] = None,
        decoder_attention_mask: Optional[jnp.ndarray] = None,
        encoder_states: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        sample_weights: Optional[jnp.ndarray] = None,
        beatmap_idx: Optional[jnp.ndarray] = None,
        difficulty: Optional[jnp.ndarray] = None,
        mapper_idx: Optional[jnp.ndarray] = None,
        song_position: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.config
        if encoder_states is None:
            encoder_states = self.encode(
                frames, beatmap_idx, difficulty, mapper_idx, song_position, deterministic
            )
        embeds = self.decoder_embedder(decoder_input_ids) if cfg.embed_decoder_input else None
        logits = self.transformer(
            decoder_inputs_embeds=embeds,
            decoder_input_ids=None if cfg.embed_decoder_input else decoder_input_ids,
            decoder_attention_mask=decoder_attention_mask,
            encoder_states=encoder_states,
            deterministic=deterministic,
        )
        loss = None
        if labels is not None:
            loss = self.loss(logits, labels, sample_weights)
        return logits, loss

    def loss(
        self,
        logits: jnp.ndarray,
        labels: jnp.ndarray,
        sample_weights: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Rhythm-weighted label-smoothed CE, mean over non-ignored labels
        (reference: modeling_mapperatorinator.py:130-137, 211-216)."""
        cfg = self.config
        vocab = cfg.vocab_size_out
        valid = labels != LABEL_IGNORE_ID
        safe_labels = jnp.where(valid, labels, 0)

        class_weights = jnp.ones(vocab)
        class_weights = class_weights.at[cfg.rhythm_token_start : cfg.rhythm_token_end].set(cfg.rhythm_weight)

        log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        eps = cfg.label_smoothing
        # torch CE with label smoothing: (1-eps)*nll + eps*mean_k(-log p_k),
        # weighted by class weight of the TARGET class
        nll = -jnp.take_along_axis(log_probs, safe_labels[..., None], axis=-1)[..., 0]
        smooth = -log_probs.mean(axis=-1)
        per_tok = (1 - eps) * nll + eps * smooth
        w = class_weights[safe_labels]
        per_tok = per_tok * w * valid
        if sample_weights is not None:
            per_tok = per_tok * sample_weights[:, None]
        return per_tok.sum() / jnp.maximum(valid.sum(), 1)

    # -- decode-path plumbing (used by the generation engine) --------------------

    def embed_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        if cfg.embed_decoder_input:
            return self.decoder_embedder(input_ids)
        return self.transformer.embed_decoder_ids(input_ids)

    def init_cache(self, batch: int, max_len: int, encoder_states: jnp.ndarray):
        return self.transformer.init_cache(batch, max_len, encoder_states)

    def decode_step(self, input_embeds: jnp.ndarray, cache, cache_index, self_mask=None, positions=None,
                    k_positions=None):
        """input_embeds: already-embedded decoder tokens (engine embeds via
        ``embed_tokens`` so ids/embeds handling is uniform across models)."""
        return self.transformer.decode_step(
            input_embeds, cache, cache_index, self_mask=self_mask, positions=positions,
            k_positions=k_positions,
        )
