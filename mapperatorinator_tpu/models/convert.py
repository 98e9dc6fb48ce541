"""HF PyTorch checkpoint -> Flax parameter conversion.

Maps the reference's Mapperatorinator/VarWhisper torch state dicts
(reference: ``osuT5/osuT5/model/modeling_mapperatorinator.py:60-137``,
``custom_transformers/modeling_varwhisper.py:381-1519``) onto
:class:`~mapperatorinator_tpu.models.transformer.OsuTransformer` params.

Key layout facts this mapping relies on (verified by the torch-parity test):

* fused ``Wqkv`` packs features as (3, heads, head_dim) == our (3*heads,
  head_dim) reshape — no permutation needed, just transpose,
* torch ``nn.Linear`` weight is (out, in); flax Dense kernel is (in, out),
* torch ``Conv1d`` weight is (out, in, k); flax Conv kernel is (k, in, out),
* ``nn.RMSNorm.weight`` -> RMSNorm ``scale``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def _t(w) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w) -> np.ndarray:
    # (out, in, k) -> (k, in, out)
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 1, 0)))


def _attn_params(sd: dict, prefix: str, cross: bool) -> dict:
    out = {"wo": {"kernel": _t(sd[f"{prefix}.Wo.weight"])}}
    if f"{prefix}.Wo.bias" in sd:
        out["wo"]["bias"] = np.asarray(sd[f"{prefix}.Wo.bias"])
    if cross:
        out["wq"] = {"kernel": _t(sd[f"{prefix}.Wq.weight"])}
        out["wkv"] = {"kernel": _t(sd[f"{prefix}.Wkv.weight"])}
        if f"{prefix}.Wq.bias" in sd:
            out["wq"]["bias"] = np.asarray(sd[f"{prefix}.Wq.bias"])
            out["wkv"]["bias"] = np.asarray(sd[f"{prefix}.Wkv.bias"])
    else:
        out["wqkv"] = {"kernel": _t(sd[f"{prefix}.Wqkv.weight"])}
        if f"{prefix}.Wqkv.bias" in sd:
            out["wqkv"]["bias"] = np.asarray(sd[f"{prefix}.Wqkv.bias"])
    return out


def _norm(sd: dict, key: str) -> dict:
    return {"scale": np.asarray(sd[f"{key}.weight"])}


def _ffn(sd: dict, prefix: str) -> dict:
    out = {
        "fc1": {"kernel": _t(sd[f"{prefix}.fc1.weight"])},
        "fc2": {"kernel": _t(sd[f"{prefix}.fc2.weight"])},
    }
    if f"{prefix}.fc1.bias" in sd:
        out["fc1"]["bias"] = np.asarray(sd[f"{prefix}.fc1.bias"])
        out["fc2"]["bias"] = np.asarray(sd[f"{prefix}.fc2.bias"])
    return out


def convert_varwhisper_state_dict(sd: dict, encoder_layers: int, decoder_layers: int, tied_head: bool) -> dict:
    """torch VarWhisperForConditionalGeneration state dict -> OsuTransformer
    params dict (without the outer 'params' wrapper)."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    encoder = {
        "conv1": {"kernel": _conv(sd["encoder.conv1.weight"]), "bias": np.asarray(sd["encoder.conv1.bias"])},
        "conv2": {"kernel": _conv(sd["encoder.conv2.weight"]), "bias": np.asarray(sd["encoder.conv2.bias"])},
        "norm": {"RMSNorm_0": _norm(sd, "encoder.layer_norm")},
    }
    for i in range(encoder_layers):
        p = f"encoder.layers.{i}"
        encoder[f"layers_{i}"] = {
            "self_attn": _attn_params(sd, f"{p}.self_attn", cross=False),
            "self_attn_norm": {"RMSNorm_0": _norm(sd, f"{p}.self_attn_layer_norm")},
            "final_norm": {"RMSNorm_0": _norm(sd, f"{p}.final_layer_norm")},
            "ffn": _ffn(sd, p),
        }

    decoder = {
        "embed_tokens": {"embedding": np.asarray(sd["decoder.embed_tokens.weight"])},
        "norm": {"RMSNorm_0": _norm(sd, "decoder.layer_norm")},
    }
    for i in range(decoder_layers):
        p = f"decoder.layers.{i}"
        decoder[f"layers_{i}"] = {
            "self_attn": _attn_params(sd, f"{p}.self_attn", cross=False),
            "self_attn_norm": {"RMSNorm_0": _norm(sd, f"{p}.self_attn_layer_norm")},
            "cross_attn": _attn_params(sd, f"{p}.cross_attn", cross=True),
            "cross_attn_norm": {"RMSNorm_0": _norm(sd, f"{p}.cross_attn_layer_norm")},
            "final_norm": {"RMSNorm_0": _norm(sd, f"{p}.final_layer_norm")},
            "ffn": _ffn(sd, p),
        }

    params = {"encoder": encoder, "decoder": decoder}
    if not tied_head and "proj_out.weight" in sd:
        params["proj_out"] = {"kernel": _t(sd["proj_out.weight"])}
    return params


def convert_mapperatorinator_state_dict(sd: dict, config) -> dict:
    """Full reference Mapperatorinator torch state dict -> our params tree."""
    transformer_sd = {k.removeprefix("transformer."): v for k, v in sd.items() if k.startswith("transformer.")}
    params = {
        "transformer": convert_varwhisper_state_dict(
            transformer_sd,
            config.backbone.encoder_layers,
            config.backbone.decoder_layers,
            config.backbone.tie_word_embeddings,
        )
    }
    if config.embed_decoder_input and "decoder_embedder.weight" in sd:
        params["decoder_embedder"] = {"embedding": np.asarray(sd["decoder_embedder.weight"])}
    if config.project_encoder_input and "encoder_embedder.weight" in sd:
        params["encoder_embedder"] = {
            "kernel": _t(sd["encoder_embedder.weight"]),
            "bias": np.asarray(sd["encoder_embedder.bias"]),
        }
    # conditioning embedders (style/difficulty/mapper/song position) convert
    # here when present in the checkpoint
    if config.do_style_embed and "style_embedder.embedding_table.weight" in sd:
        params["style_embedder"] = {"embedding": np.asarray(sd["style_embedder.embedding_table.weight"])}
    return params


def load_hf_checkpoint(directory, vocab: Optional[object] = None):
    """Load a reference-format HF checkpoint directory (config.json +
    model.safetensors / pytorch_model.bin) into (model, params)."""
    import json

    directory = Path(directory)
    with open(directory / "config.json", encoding="utf-8") as f:
        hf_cfg = json.load(f)

    from .mapperatorinator import Mapperatorinator, MapperatorinatorConfig
    from .transformer import TransformerConfig

    bc = hf_cfg.get("backbone_config", {})
    backbone = TransformerConfig(
        vocab_size=hf_cfg.get("vocab_size", bc.get("vocab_size")),
        d_model=bc.get("d_model", 768),
        encoder_layers=bc.get("encoder_layers", 12),
        decoder_layers=bc.get("decoder_layers", 12),
        encoder_heads=bc.get("encoder_attention_heads", 12),
        decoder_heads=bc.get("decoder_attention_heads", 12),
        encoder_ffn=bc.get("encoder_ffn_dim", 3072),
        decoder_ffn=bc.get("decoder_ffn_dim", 3072),
        max_source_positions=bc.get("max_source_positions", 1024),
        max_target_positions=bc.get("max_target_positions", 2560),
        num_mel_bins=bc.get("num_mel_bins", 128),
        position_scheme="rope",
        norm="rms",
        rope_global_theta=bc.get("global_rope_theta", 10000),
        rope_local_theta=bc.get("local_rope_theta", 10000),
        global_attn_every_n_layers=bc.get("global_attn_every_n_layers", 1),
        local_attention=bc.get("local_attention", 128),
        attention_bias=bc.get("attention_bias", True),
        tie_word_embeddings=bc.get("tie_word_embeddings", True),
    )
    config = MapperatorinatorConfig(
        backbone=backbone,
        vocab_size_in=hf_cfg.get("vocab_size_in"),
        vocab_size_out=hf_cfg.get("vocab_size", backbone.vocab_size),
        num_classes=hf_cfg.get("num_classes", 0),
        num_mappers=hf_cfg.get("num_mappers", 3731),
        input_features=hf_cfg.get("input_features", True),
        project_encoder_input=hf_cfg.get("project_encoder_input", False),
        embed_decoder_input=hf_cfg.get("embed_decoder_input", True),
        do_style_embed=hf_cfg.get("do_style_embed", False),
        spectrogram_implementation="xla",
        spectrogram_log_scale=hf_cfg.get("spectrogram_log_scale", False),
        sample_rate=hf_cfg.get("sample_rate", 16000),
        n_fft=hf_cfg.get("n_fft", 1024),
        n_mels=hf_cfg.get("n_mels", 388),
        hop_length=hf_cfg.get("hop_length", 128),
        f_min=hf_cfg.get("f_min", 0),
        f_max=hf_cfg.get("f_max", 8000),
        pad_mode=hf_cfg.get("pad_mode", "constant"),
        rhythm_token_start=hf_cfg.get("rhythm_token_start", 17),
        rhythm_token_end=hf_cfg.get("rhythm_token_end", 836),
        max_target_positions=hf_cfg.get("max_target_positions", backbone.max_target_positions),
    )

    sd = _read_torch_weights(directory)
    params = {"params": convert_mapperatorinator_state_dict(sd, config)}
    return Mapperatorinator(config), params


def _read_torch_weights(directory: Path) -> dict:
    st = directory / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file

        return load_file(st)
    bins = sorted(directory.glob("pytorch_model*.bin"))
    if bins:
        import torch

        sd = {}
        for b in bins:
            sd.update({k: v.numpy() for k, v in torch.load(b, map_location="cpu", weights_only=True).items()})
        return sd
    raise FileNotFoundError(f"no model weights found in {directory}")
