"""Checkpoint save/load.

Native format: a directory holding ``model_config.json`` (the
MapperatorinatorConfig tree), ``params.msgpack`` (flax-serialized params),
and ``tokenizer.json`` (the Vocabulary state, reference schema). HF PyTorch
checkpoints convert through :mod:`mapperatorinator_tpu.models.convert`.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional, Union

import flax.serialization
import jax.numpy as jnp

from ..osu.vocab import Vocabulary
from .mapperatorinator import Mapperatorinator, MapperatorinatorConfig
from .transformer import TransformerConfig


def _config_to_dict(cfg: MapperatorinatorConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["backbone"]["dtype"] = str(jnp.dtype(cfg.backbone.dtype).name)
    d["backbone"]["param_dtype"] = str(jnp.dtype(cfg.backbone.param_dtype).name)
    return d


def _config_from_dict(d: dict) -> MapperatorinatorConfig:
    bd = dict(d["backbone"])
    bd["dtype"] = jnp.dtype(bd.get("dtype", "float32")).type
    bd["param_dtype"] = jnp.dtype(bd.get("param_dtype", "float32")).type
    backbone = TransformerConfig(**bd)
    rest = {k: v for k, v in d.items() if k != "backbone"}
    return MapperatorinatorConfig(backbone=backbone, **rest)


def quantize_checkpoint(model: Mapperatorinator, params, bits: int = 8):
    """Rebuild ``model`` with int8 weight-only decode (QDense routed through
    the fused Pallas qmm kernel) and convert ``params`` to match.

    Structure-driven: only kernels the quantized architecture actually
    expects become int8 (the backbone's dense_cls sites) — conditioning
    embedders and family-specific plain-Dense layers (e.g. the moonshine
    gated MLP) pass through untouched. Returns ``(qmodel, qparams)``.
    """
    import flax.traverse_util
    import jax

    from .transformer import quantize_params

    cfg = dataclasses.replace(
        model.config,
        backbone=dataclasses.replace(model.config.backbone, quantized_weights=True),
    )
    qmodel = Mapperatorinator(cfg)
    shapes = jax.eval_shape(
        lambda: qmodel.init(
            jax.random.PRNGKey(0),
            frames=jnp.zeros((1, cfg.hop_length * 15), jnp.float32),
            decoder_input_ids=jnp.ones((1, 4), jnp.int32),
        )
    )
    expected = set(flax.traverse_util.flatten_dict(shapes, sep="/"))
    return qmodel, quantize_params(params, bits, expected)


def save_checkpoint(
    directory: Union[str, Path],
    config: MapperatorinatorConfig,
    params,
    vocab: Optional[Vocabulary] = None,
) -> None:
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    with open(directory / "model_config.json", "w", encoding="utf-8") as f:
        json.dump(_config_to_dict(config), f)
    with open(directory / "params.msgpack", "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    if vocab is not None:
        vocab.save_pretrained(directory)


def load_checkpoint(directory: Union[str, Path]):
    """Returns (model, params, vocab). Detects native vs HF torch format."""
    directory = Path(directory)
    vocab = Vocabulary.from_pretrained(directory) if (directory / "tokenizer.json").exists() else None

    if (directory / "model_config.json").exists():
        with open(directory / "model_config.json", encoding="utf-8") as f:
            config = _config_from_dict(json.load(f))
        model = Mapperatorinator(config)
        import jax

        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0),
                frames=jnp.zeros((1, config.hop_length * 15), jnp.float32),
                decoder_input_ids=jnp.ones((1, 4), jnp.int32),
            )
        )
        with open(directory / "params.msgpack", "rb") as f:
            params = flax.serialization.from_bytes(shapes, f.read())
        return model, params, vocab

    if (directory / "config.json").exists():
        from .convert import load_hf_checkpoint

        model, params = load_hf_checkpoint(directory, vocab)
        return model, params, vocab

    from .legacy import is_legacy_checkpoint

    if is_legacy_checkpoint(directory):
        raise ValueError(
            f"{directory} is a legacy accelerate checkpoint; load it with "
            "mapperatorinator_tpu.models.legacy.load_legacy_checkpoint(dir, train_args) "
            "(it carries no model config, so the training config is required)"
        )

    raise FileNotFoundError(f"no recognizable checkpoint at {directory}")
