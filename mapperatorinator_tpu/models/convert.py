"""HF PyTorch checkpoint -> Flax parameter conversion, all backbone families.

Maps the reference's Mapperatorinator torch state dicts
(reference: ``osuT5/osuT5/model/modeling_mapperatorinator.py:60-137``) onto
:class:`~mapperatorinator_tpu.models.transformer.OsuTransformer` params for
every published backbone family (reference ``model_utils.py:321-414``):

* VarWhisper (v32):   fused Wqkv/Wkv, RMSNorm   (modeling_varwhisper.py)
* stock Whisper (v28): split q/k/v, LayerNorm, learned abs positions
* RoPEWhisper (v29-31): split q/k/v, RMSNorm, RoPE (modeling_ropewhisper.py)
* NWhisper:            nGPT NormLinear/Scale layout (modeling_nwhisper.py)
* T5 / nanoT5:         block/layer layout, rel-pos bias, gated FFN (t5.py)

Key layout facts this mapping relies on (verified by the torch-parity tests):

* fused ``Wqkv`` packs features as (3, heads, head_dim) == our (3*heads,
  head_dim) reshape — no permutation needed, just transpose; split
  q/k/v projections concatenate to the same fused layout,
* torch ``nn.Linear`` weight is (out, in); flax Dense kernel is (in, out),
* torch ``Conv1d`` weight is (out, in, k); flax Conv kernel is (k, in, out),
* ``nn.RMSNorm.weight`` -> RMSNorm ``scale``; ``nn.LayerNorm`` -> scale+bias,
* frozen sinusoidal encoder position tables (whisper/nwhisper) are never
  trained (HF ``requires_grad_(False)``), so our fixed-sinusoid encoder is
  weight-free for them; decoder tables are learned and convert.
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


# ---------------------------------------------------------------------------
# VarWhisper (fused projections)
# ---------------------------------------------------------------------------


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


# ---------------------------------------------------------------------------
# stock Whisper / RoPEWhisper (split q/k/v projections)
# ---------------------------------------------------------------------------


def _split_attn_params(sd: dict, prefix: str, cross: bool) -> dict:
    """HF whisper-style q_proj/k_proj/v_proj/out_proj -> our fused layout.
    k_proj never has a bias (modeling_whisper / modeling_ropewhisper.py:384);
    the fused bias slot for k is zero, which is numerically identical."""
    q = _t(sd[f"{prefix}.q_proj.weight"])
    k = _t(sd[f"{prefix}.k_proj.weight"])
    v = _t(sd[f"{prefix}.v_proj.weight"])
    out = {"wo": {"kernel": _t(sd[f"{prefix}.out_proj.weight"])}}
    if f"{prefix}.out_proj.bias" in sd:
        out["wo"]["bias"] = np.asarray(sd[f"{prefix}.out_proj.bias"])
    has_bias = f"{prefix}.q_proj.bias" in sd
    if cross:
        out["wq"] = {"kernel": q}
        out["wkv"] = {"kernel": np.concatenate([k, v], axis=1)}
        if has_bias:
            qb = np.asarray(sd[f"{prefix}.q_proj.bias"])
            vb = np.asarray(sd[f"{prefix}.v_proj.bias"])
            out["wq"]["bias"] = qb
            out["wkv"]["bias"] = np.concatenate([np.zeros_like(vb), vb])
    else:
        out["wqkv"] = {"kernel": np.concatenate([q, k, v], axis=1)}
        if has_bias:
            qb = np.asarray(sd[f"{prefix}.q_proj.bias"])
            vb = np.asarray(sd[f"{prefix}.v_proj.bias"])
            out["wqkv"]["bias"] = np.concatenate([qb, np.zeros_like(qb), vb])
    return out


def _norm_wb(sd: dict, key: str, kind: str) -> dict:
    """kind: 'layer' (LayerNorm weight+bias) or 'rms' (RMSNorm weight)."""
    if kind == "layer":
        return {"LayerNorm_0": {"scale": np.asarray(sd[f"{key}.weight"]),
                                "bias": np.asarray(sd[f"{key}.bias"])}}
    return {"RMSNorm_0": {"scale": np.asarray(sd[f"{key}.weight"])}}


def convert_whisper_state_dict(
    sd: dict,
    encoder_layers: int,
    decoder_layers: int,
    tied_head: bool,
    norm: str = "layer",
    learned_decoder_positions: bool = True,
) -> dict:
    """Stock HF Whisper (norm='layer', learned abs positions; reference v28)
    or RoPEWhisper (norm='rms', learned_decoder_positions=False; v29-v31)
    state dict -> OsuTransformer params.

    The encoder position table is frozen sinusoids in HF
    (``WhisperEncoder.embed_positions.requires_grad_(False)``), matching our
    weight-free fixed-sinusoid encoder, so it is validated and dropped.
    """
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    encoder = {
        "conv1": {"kernel": _conv(sd["encoder.conv1.weight"]), "bias": np.asarray(sd["encoder.conv1.bias"])},
        "conv2": {"kernel": _conv(sd["encoder.conv2.weight"]), "bias": np.asarray(sd["encoder.conv2.bias"])},
        "norm": _norm_wb(sd, "encoder.layer_norm", norm),
    }
    for i in range(encoder_layers):
        p = f"encoder.layers.{i}"
        encoder[f"layers_{i}"] = {
            "self_attn": _split_attn_params(sd, f"{p}.self_attn", cross=False),
            "self_attn_norm": _norm_wb(sd, f"{p}.self_attn_layer_norm", norm),
            "final_norm": _norm_wb(sd, f"{p}.final_layer_norm", norm),
            "ffn": _ffn(sd, p),
        }

    decoder = {
        "embed_tokens": {"embedding": np.asarray(sd["decoder.embed_tokens.weight"])},
        "norm": _norm_wb(sd, "decoder.layer_norm", norm),
    }
    if learned_decoder_positions and "decoder.embed_positions.weight" in sd:
        decoder["embed_positions"] = {"embedding": np.asarray(sd["decoder.embed_positions.weight"])}
    for i in range(decoder_layers):
        p = f"decoder.layers.{i}"
        decoder[f"layers_{i}"] = {
            "self_attn": _split_attn_params(sd, f"{p}.self_attn", cross=False),
            "self_attn_norm": _norm_wb(sd, f"{p}.self_attn_layer_norm", norm),
            "cross_attn": _split_attn_params(sd, f"{p}.encoder_attn", cross=True),
            "cross_attn_norm": _norm_wb(sd, f"{p}.encoder_attn_layer_norm", norm),
            "final_norm": _norm_wb(sd, f"{p}.final_layer_norm", norm),
            "ffn": _ffn(sd, p),
        }

    params = {"encoder": encoder, "decoder": decoder}
    if not tied_head and "proj_out.weight" in sd:
        params["proj_out"] = {"kernel": _t(sd["proj_out.weight"])}
    return params


def convert_ropewhisper_state_dict(sd: dict, encoder_layers: int, decoder_layers: int, tied_head: bool) -> dict:
    return convert_whisper_state_dict(
        sd, encoder_layers, decoder_layers, tied_head,
        norm="rms", learned_decoder_positions=False,
    )


# ---------------------------------------------------------------------------
# NWhisper (nGPT layout; reference modeling_nwhisper.py)
# ---------------------------------------------------------------------------


def _nkernel(sd: dict, prefix: str) -> np.ndarray:
    """NormLinear stores its weight at ``.linear.weight`` (manual norm) or at
    ``.linear.parametrizations.weight.original`` (parametrized)."""
    for key in (f"{prefix}.linear.weight", f"{prefix}.linear.parametrizations.weight.original"):
        if key in sd:
            return _t(sd[key])
    raise KeyError(f"missing NormLinear weight at {prefix}")


def _ngpt_attn(sd: dict, prefix: str) -> dict:
    out = {
        "wq": {"kernel": _nkernel(sd, f"{prefix}.q_proj")},
        "wk": {"kernel": _nkernel(sd, f"{prefix}.k_proj")},
        "wv": {"kernel": _nkernel(sd, f"{prefix}.v_proj")},
        "wo": {"kernel": _nkernel(sd, f"{prefix}.out_proj")},
        "qk_scale": {"scale": np.asarray(sd[f"{prefix}.qk_scale.scale"])},
    }
    for ours, theirs in (("wq", "q_proj"), ("wv", "v_proj"), ("wo", "out_proj")):
        bias_key = f"{prefix}.{theirs}.linear.bias"
        if bias_key in sd:
            out[ours]["bias"] = np.asarray(sd[bias_key])
    return out


def _ngpt_ffn(sd: dict, prefix: str) -> dict:
    return {
        "fc1": {"kernel": _nkernel(sd, f"{prefix}.fc1")},
        "fc2": {"kernel": _nkernel(sd, f"{prefix}.fc2")},
    }


def _scale(sd: dict, key: str) -> dict:
    return {"scale": np.asarray(sd[f"{key}.scale"])}


def convert_nwhisper_state_dict(sd: dict, encoder_layers: int, decoder_layers: int, tied_head: bool) -> dict:
    """NWhisperForConditionalGeneration state dict -> OsuTransformer params.
    Residual slerp scales live at ``*_with_residual.branch_scale.scale``
    (reference modeling_nwhisper.py:141,863-876,963-983)."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    encoder = {
        "conv1": {"kernel": _conv(sd["encoder.conv1.weight"]), "bias": np.asarray(sd["encoder.conv1.bias"])},
        "conv2": {"kernel": _conv(sd["encoder.conv2.weight"]), "bias": np.asarray(sd["encoder.conv2.bias"])},
        "embed_positions": np.asarray(sd["encoder.embed_positions.weight"]),
        "alpha_positions": _scale(sd, "encoder.alpha_positions"),
    }
    for i in range(encoder_layers):
        p = f"encoder.layers.{i}"
        encoder[f"layers_{i}"] = {
            "self_attn": _ngpt_attn(sd, f"{p}.attn_with_residual.fn"),
            "attn_residual": {"branch_scale": _scale(sd, f"{p}.attn_with_residual.branch_scale")},
            "ffn": _ngpt_ffn(sd, f"{p}.ff_with_residual.fn"),
            "ffn_residual": {"branch_scale": _scale(sd, f"{p}.ff_with_residual.branch_scale")},
        }

    embed_key = (
        "decoder.embed_tokens.embedding.weight"
        if "decoder.embed_tokens.embedding.weight" in sd
        else "decoder.embed_tokens.embedding.parametrizations.weight.original"
    )
    decoder = {
        "embed_tokens": {"embedding": np.asarray(sd[embed_key])},
        "embed_positions": {"embedding": np.asarray(sd["decoder.embed_positions.weight"])},
        "alpha_positions": _scale(sd, "decoder.alpha_positions"),
    }
    for i in range(decoder_layers):
        p = f"decoder.layers.{i}"
        decoder[f"layers_{i}"] = {
            "self_attn": _ngpt_attn(sd, f"{p}.self_attn_with_residual.fn"),
            "attn_residual": {"branch_scale": _scale(sd, f"{p}.self_attn_with_residual.branch_scale")},
            "cross_attn": _ngpt_attn(sd, f"{p}.encoder_attn_with_residual.fn"),
            "cross_residual": {"branch_scale": _scale(sd, f"{p}.encoder_attn_with_residual.branch_scale")},
            "ffn": _ngpt_ffn(sd, f"{p}.ff_with_residual.fn"),
            "ffn_residual": {"branch_scale": _scale(sd, f"{p}.ff_with_residual.branch_scale")},
        }

    params = {"encoder": encoder, "decoder": decoder}
    params["proj_out"] = {"kernel": _nkernel(sd, "proj_out")}
    params["logit_scale"] = _scale(sd, "logit_scale")
    return params


# ---------------------------------------------------------------------------
# Moonshine (HF MoonshineForConditionalGeneration; the reference's own
# moonshine branch is unimportable — modeling_mapperatorinator.py:40-44)
# ---------------------------------------------------------------------------


def _moon_attn(sd: dict, prefix: str, cross: bool) -> dict:
    q = _t(sd[f"{prefix}.q_proj.weight"])
    k = _t(sd[f"{prefix}.k_proj.weight"])
    v = _t(sd[f"{prefix}.v_proj.weight"])
    out = {"wo": {"kernel": _t(sd[f"{prefix}.o_proj.weight"])}}
    if cross:
        out["wq"] = {"kernel": q}
        out["wkv"] = {"kernel": np.concatenate([k, v], axis=1)}
    else:
        out["wqkv"] = {"kernel": np.concatenate([q, k, v], axis=1)}
    return out


def _moon_norm(sd: dict, key: str) -> dict:
    # bias-free LayerNorm
    return {"LayerNorm_0": {"scale": np.asarray(sd[f"{key}.weight"])}}


def _moon_ffn(sd: dict, prefix: str) -> dict:
    return {
        "fc1": {"kernel": _t(sd[f"{prefix}.fc1.weight"]), "bias": np.asarray(sd[f"{prefix}.fc1.bias"])},
        "fc2": {"kernel": _t(sd[f"{prefix}.fc2.weight"]), "bias": np.asarray(sd[f"{prefix}.fc2.bias"])},
    }


def convert_moonshine_state_dict(sd: dict, encoder_layers: int, decoder_layers: int, tied_head: bool) -> dict:
    """HF Moonshine state dict -> OsuTransformer params (raw-wave conv stem,
    bias-free norms, gated-concat decoder MLP)."""
    sd = {key.removeprefix("model."): v for key, v in sd.items()}

    encoder = {
        "conv1": {"kernel": _conv(sd["encoder.conv1.weight"])},
        "groupnorm": {"scale": np.asarray(sd["encoder.groupnorm.weight"]),
                      "bias": np.asarray(sd["encoder.groupnorm.bias"])},
        "conv2": {"kernel": _conv(sd["encoder.conv2.weight"]), "bias": np.asarray(sd["encoder.conv2.bias"])},
        "conv3": {"kernel": _conv(sd["encoder.conv3.weight"]), "bias": np.asarray(sd["encoder.conv3.bias"])},
        "norm": _moon_norm(sd, "encoder.layer_norm"),
    }
    for i in range(encoder_layers):
        p = f"encoder.layers.{i}"
        encoder[f"layers_{i}"] = {
            "self_attn": _moon_attn(sd, f"{p}.self_attn", cross=False),
            "self_attn_norm": _moon_norm(sd, f"{p}.input_layernorm"),
            "final_norm": _moon_norm(sd, f"{p}.post_attention_layernorm"),
            "ffn": _moon_ffn(sd, f"{p}.mlp"),
        }

    decoder = {
        "embed_tokens": {"embedding": np.asarray(sd["decoder.embed_tokens.weight"])},
        "norm": _moon_norm(sd, "decoder.norm"),
    }
    for i in range(decoder_layers):
        p = f"decoder.layers.{i}"
        decoder[f"layers_{i}"] = {
            "self_attn": _moon_attn(sd, f"{p}.self_attn", cross=False),
            "self_attn_norm": _moon_norm(sd, f"{p}.input_layernorm"),
            "cross_attn": _moon_attn(sd, f"{p}.encoder_attn", cross=True),
            "cross_attn_norm": _moon_norm(sd, f"{p}.post_attention_layernorm"),
            "final_norm": _moon_norm(sd, f"{p}.final_layernorm"),
            "ffn": _moon_ffn(sd, f"{p}.mlp"),
        }

    params = {"encoder": encoder, "decoder": decoder}
    if not tied_head and "proj_out.weight" in sd:
        params["proj_out"] = {"kernel": _t(sd["proj_out.weight"])}
    return params


# ---------------------------------------------------------------------------
# T5 (stock HF T5ForConditionalGeneration and nanoT5; reference t5.py)
# ---------------------------------------------------------------------------


def _t5_attn(sd: dict, prefix: str, cross: bool) -> dict:
    q = _t(sd[f"{prefix}.q.weight"])
    k = _t(sd[f"{prefix}.k.weight"])
    v = _t(sd[f"{prefix}.v.weight"])
    out = {"wo": {"kernel": _t(sd[f"{prefix}.o.weight"])}}
    if cross:
        out["wq"] = {"kernel": q}
        out["wkv"] = {"kernel": np.concatenate([k, v], axis=1)}
    else:
        out["wqkv"] = {"kernel": np.concatenate([q, k, v], axis=1)}
    return out


def _t5_ffn(sd: dict, prefix: str) -> dict:
    out = {"fc2": {"kernel": _t(sd[f"{prefix}.wo.weight"])}}
    if f"{prefix}.wi_0.weight" in sd:  # v1.1 gated
        out["fc1"] = {"kernel": _t(sd[f"{prefix}.wi_0.weight"])}
        out["fc1_gate"] = {"kernel": _t(sd[f"{prefix}.wi_1.weight"])}
    else:
        out["fc1"] = {"kernel": _t(sd[f"{prefix}.wi.weight"])}
    return out


def convert_t5_state_dict(sd: dict, encoder_layers: int, decoder_layers: int, tied_head: bool) -> dict:
    """HF T5 block/layer state dict -> OsuTransformer params. The shared
    relative-position bias lives on block 0 (HF T5 semantics, matching our
    per-stack ``rel_bias``)."""
    sd = {k.removeprefix("model."): v for k, v in sd.items()}

    encoder = {
        "norm": {"RMSNorm_0": _norm(sd, "encoder.final_layer_norm")},
        "rel_bias": {"embedding": {"embedding": np.asarray(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        )}},
    }
    for i in range(encoder_layers):
        p = f"encoder.block.{i}"
        encoder[f"layers_{i}"] = {
            "self_attn": _t5_attn(sd, f"{p}.layer.0.SelfAttention", cross=False),
            "self_attn_norm": {"RMSNorm_0": _norm(sd, f"{p}.layer.0.layer_norm")},
            "ffn": _t5_ffn(sd, f"{p}.layer.1.DenseReluDense"),
            "final_norm": {"RMSNorm_0": _norm(sd, f"{p}.layer.1.layer_norm")},
        }

    embed = None
    for key in ("decoder.embed_tokens.weight", "shared.weight"):
        if key in sd:
            embed = np.asarray(sd[key])
            break
    decoder = {
        "norm": {"RMSNorm_0": _norm(sd, "decoder.final_layer_norm")},
        "rel_bias": {"embedding": {"embedding": np.asarray(
            sd["decoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        )}},
    }
    if embed is not None:
        decoder["embed_tokens"] = {"embedding": embed}
    for i in range(decoder_layers):
        p = f"decoder.block.{i}"
        decoder[f"layers_{i}"] = {
            "self_attn": _t5_attn(sd, f"{p}.layer.0.SelfAttention", cross=False),
            "self_attn_norm": {"RMSNorm_0": _norm(sd, f"{p}.layer.0.layer_norm")},
            "cross_attn": _t5_attn(sd, f"{p}.layer.1.EncDecAttention", cross=True),
            "cross_attn_norm": {"RMSNorm_0": _norm(sd, f"{p}.layer.1.layer_norm")},
            "ffn": _t5_ffn(sd, f"{p}.layer.2.DenseReluDense"),
            "final_norm": {"RMSNorm_0": _norm(sd, f"{p}.layer.2.layer_norm")},
        }

    params = {"encoder": encoder, "decoder": decoder}
    if not tied_head and "lm_head.weight" in sd:
        params["proj_out"] = {"kernel": _t(sd["lm_head.weight"])}
    return params


# ---------------------------------------------------------------------------
# full wrapper conversion (backbone + conditioning embedders)
# ---------------------------------------------------------------------------

_BACKBONE_CONVERTERS = {
    "varwhisper": convert_varwhisper_state_dict,
    "whisper": convert_whisper_state_dict,
    "ropewhisper": convert_ropewhisper_state_dict,
    "nwhisper": convert_nwhisper_state_dict,
    "t5": convert_t5_state_dict,
    "moonshine": convert_moonshine_state_dict,
}


def backbone_family(backbone_model_name: str) -> str:
    """Reference backbone_model_name -> converter family key
    (reference modeling_mapperatorinator.py:16-57)."""
    name = backbone_model_name.lower()
    if "varwhisper" in name:
        return "varwhisper"
    if "ropewhisper" in name:
        return "ropewhisper"
    if "nwhisper" in name:
        return "nwhisper"
    if "moonshine" in name:
        return "moonshine"
    if name.startswith("google/t5") or "t5" in name:
        return "t5"
    if "whisper" in name:
        return "whisper"
    raise NotImplementedError(f"unknown backbone family: {backbone_model_name}")


def _mlp_embedder(sd: dict, prefix: str, proj: str) -> dict:
    """RBF + [Linear, LayerNorm, ReLU, Dropout, Linear, LayerNorm] stack
    (reference modeling_mapperatorinator.py:463-518,580-659). torch Sequential
    indices 0/1/4/5 map to proj1/norm1/proj2/norm2."""
    return {
        "rbf": {
            "basis_centers": np.asarray(sd[f"{prefix}.basis_centers"]),
            "basis_widths": np.asarray(sd[f"{prefix}.basis_widths"]),
        },
        "proj1": {"kernel": _t(sd[f"{prefix}.{proj}.0.weight"]), "bias": np.asarray(sd[f"{prefix}.{proj}.0.bias"])},
        "norm1": {"scale": np.asarray(sd[f"{prefix}.{proj}.1.weight"]), "bias": np.asarray(sd[f"{prefix}.{proj}.1.bias"])},
        "proj2": {"kernel": _t(sd[f"{prefix}.{proj}.4.weight"]), "bias": np.asarray(sd[f"{prefix}.{proj}.4.bias"])},
        "norm2": {"scale": np.asarray(sd[f"{prefix}.{proj}.5.weight"]), "bias": np.asarray(sd[f"{prefix}.{proj}.5.bias"])},
    }


def convert_mapperatorinator_state_dict(sd: dict, config, family: str = "varwhisper") -> dict:
    """Full reference Mapperatorinator torch state dict -> our params tree,
    including every conditioning embedder
    (reference modeling_mapperatorinator.py:100-137,446-659)."""
    transformer_sd = {k.removeprefix("transformer."): v for k, v in sd.items() if k.startswith("transformer.")}
    convert = _BACKBONE_CONVERTERS[family]
    params = {
        "transformer": convert(
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
    if config.do_style_embed and "style_embedder.embedding_table.weight" in sd:
        params["style_embedder"] = {"embedding": np.asarray(sd["style_embedder.embedding_table.weight"])}
    if config.do_difficulty_embed and "difficulty_embedder.basis_centers" in sd:
        params["difficulty_embedder"] = _mlp_embedder(sd, "difficulty_embedder", "difficulty_proj")
    if config.do_mapper_embed and "mapper_embedder.embedding.weight" in sd:
        params["mapper_embedder"] = {
            "table": {"embedding": np.asarray(sd["mapper_embedder.embedding.weight"])},
            "norm": {
                "scale": np.asarray(sd["mapper_embedder.layer_norm.weight"]),
                "bias": np.asarray(sd["mapper_embedder.layer_norm.bias"]),
            },
        }
    if config.do_song_position_embed and "song_pos_embedder.basis_centers" in sd:
        params["song_pos_embedder"] = _mlp_embedder(sd, "song_pos_embedder", "position_proj")
    return params


def _backbone_config_from_hf(hf_cfg: dict):
    """Reference checkpoint config.json -> our TransformerConfig. Dispatches
    on ``backbone_model_name`` exactly like the reference's
    configuration_mapperatorinator.py:66-135 materialization."""
    from .transformer import TransformerConfig

    name = hf_cfg.get("backbone_model_name", "OliBomby/varwhisper-small")
    family = backbone_family(name)
    bc = hf_cfg.get("backbone_config", {}) or {}
    if not isinstance(bc, dict):
        bc = dict(bc)

    if family == "t5":
        return family, TransformerConfig(
            vocab_size=hf_cfg.get("vocab_size", bc.get("vocab_size")),
            d_model=bc.get("d_model", 512),
            encoder_layers=bc.get("num_layers", 8),
            decoder_layers=bc.get("num_decoder_layers", bc.get("num_layers", 8)),
            encoder_heads=bc.get("num_heads", 6),
            decoder_heads=bc.get("num_heads", 6),
            encoder_ffn=bc.get("d_ff", 1024),
            decoder_ffn=bc.get("d_ff", 1024),
            head_dim_override=bc.get("d_kv", 64),
            activation="gelu_tanh" if "gelu" in bc.get("feed_forward_proj", "gated-gelu") else "relu",
            ffn_gated="gated" in bc.get("feed_forward_proj", "gated-gelu"),
            max_source_positions=hf_cfg.get("max_source_positions", 1024),
            max_target_positions=hf_cfg.get("max_target_positions", 2048),
            num_mel_bins=hf_cfg.get("n_mels", 388),
            position_scheme="t5_relpos",
            relative_attention_num_buckets=bc.get("relative_attention_num_buckets", 32),
            relative_attention_max_distance=bc.get("relative_attention_max_distance", 128),
            norm="rms",
            norm_eps=bc.get("layer_norm_epsilon", 1e-6),
            attention_bias=False,
            attention_scale=False,
            mlp_bias=False,
            conv_stem=False,
            tie_word_embeddings=bc.get("tie_word_embeddings", False),
        )

    if family == "moonshine":
        return family, TransformerConfig(
            vocab_size=hf_cfg.get("vocab_size", bc.get("vocab_size")),
            d_model=bc.get("hidden_size", 288),
            encoder_layers=bc.get("encoder_num_hidden_layers", 6),
            decoder_layers=bc.get("decoder_num_hidden_layers", 6),
            encoder_heads=bc.get("encoder_num_attention_heads", 8),
            decoder_heads=bc.get("decoder_num_attention_heads", 8),
            encoder_ffn=bc.get("intermediate_size", 1152),
            decoder_ffn=bc.get("intermediate_size", 1152),
            max_source_positions=hf_cfg.get("max_source_positions", 1024),
            max_target_positions=bc.get("max_position_embeddings", 2048),
            num_mel_bins=1,
            position_scheme="rope",
            rope_global_theta=bc.get("rope_theta", 10000.0),
            rope_local_theta=bc.get("rope_theta", 10000.0),
            rope_partial_factor=bc.get("partial_rotary_factor", 0.9),
            norm="layer",
            norm_bias=False,
            attention_bias=bc.get("attention_bias", False),
            decoder_activation=bc.get("decoder_hidden_act", "silu"),
            decoder_ffn_gated_concat=True,
            conv_stem=True,
            stem_type="moonshine",
            tie_word_embeddings=bc.get("tie_word_embeddings", True),
        )

    common = dict(
        vocab_size=hf_cfg.get("vocab_size", bc.get("vocab_size")),
        d_model=bc.get("d_model", 768),
        encoder_layers=bc.get("encoder_layers", 12),
        decoder_layers=bc.get("decoder_layers", 12),
        encoder_heads=bc.get("encoder_attention_heads", 12),
        decoder_heads=bc.get("decoder_attention_heads", 12),
        encoder_ffn=bc.get("encoder_ffn_dim", 3072),
        decoder_ffn=bc.get("decoder_ffn_dim", 3072),
        activation=bc.get("activation_function", "gelu"),
        max_source_positions=bc.get("max_source_positions", 1024),
        max_target_positions=bc.get("max_target_positions", 2560),
        num_mel_bins=bc.get("num_mel_bins", 128),
        scale_embedding=bc.get("scale_embedding", False),
        tie_word_embeddings=bc.get("tie_word_embeddings", True),
    )
    if family == "varwhisper":
        cfg = TransformerConfig(
            position_scheme="rope",
            norm="rms",
            rope_global_theta=bc.get("global_rope_theta", 10000),
            rope_local_theta=bc.get("local_rope_theta", 10000),
            global_attn_every_n_layers=bc.get("global_attn_every_n_layers", 1),
            local_attention=bc.get("local_attention", 128),
            attention_bias=bc.get("attention_bias", True),
            **common,
        )
    elif family == "ropewhisper":
        cfg = TransformerConfig(
            position_scheme="rope",
            norm="rms",
            rope_type=bc.get("rope_type", "default"),
            rope_encoder_scaling_factor=bc.get("rope_encoder_scaling_factor", 1.0),
            rope_decoder_scaling_factor=bc.get("rope_decoder_scaling_factor", 1.0),
            **common,
        )
    elif family == "nwhisper":
        cfg = TransformerConfig(
            position_scheme="whisper_abs",
            norm="layer",
            norm_scheme="ngpt",
            input_vocab_size=bc.get("input_vocab_size"),
            **common,
        )
    else:  # stock whisper
        cfg = TransformerConfig(position_scheme="whisper_abs", norm="layer", **common)
    return family, cfg


def load_hf_checkpoint(directory, vocab: Optional[object] = None):
    """Load a reference-format HF checkpoint directory (config.json +
    model.safetensors / pytorch_model.bin) into (model, params). Covers all
    published backbone families (reference model_utils.py:321-414)."""
    import json

    directory = Path(directory)
    with open(directory / "config.json", encoding="utf-8") as f:
        hf_cfg = json.load(f)

    from .mapperatorinator import Mapperatorinator, MapperatorinatorConfig

    family, backbone = _backbone_config_from_hf(hf_cfg)
    config = MapperatorinatorConfig(
        backbone=backbone,
        vocab_size_in=hf_cfg.get("vocab_size_in"),
        vocab_size_out=hf_cfg.get("vocab_size", backbone.vocab_size),
        num_classes=hf_cfg.get("num_classes", 0),
        num_mappers=hf_cfg.get("num_mappers", 3731),
        input_features=hf_cfg.get("input_features", True),
        input_raw_wave=hf_cfg.get("input_raw_wave", False),
        project_encoder_input=hf_cfg.get("project_encoder_input", False),
        embed_decoder_input=hf_cfg.get("embed_decoder_input", True),
        do_style_embed=hf_cfg.get("do_style_embed", False),
        do_difficulty_embed=hf_cfg.get("do_difficulty_embed", False),
        do_mapper_embed=hf_cfg.get("do_mapper_embed", False),
        do_song_position_embed=hf_cfg.get("do_song_position_embed", False),
        cond_dim=hf_cfg.get("cond_dim", 128),
        cond_size=hf_cfg.get("cond_size", 0),
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
    params = {"params": convert_mapperatorinator_state_dict(sd, config, family)}
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
