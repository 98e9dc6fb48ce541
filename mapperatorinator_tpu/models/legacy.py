"""Legacy accelerate-format checkpoint loading.

The reference's older checkpoints are accelerate state dirs:
``pytorch_model.bin`` (torch weights) + ``custom_checkpoint_0.pkl`` (pickled
tokenizer state whose module paths moved between releases — the reference
ships a module-rename unpickler, ``utils/routed_pickle.py``). This module
routes ALL the reference's event/tokenizer module names onto our own classes
(whose pickle-relevant shapes match: EventType/ContextType string enums,
EventRange dataclass) and converts the weights with the standard torch->Flax
mapping.
"""

from __future__ import annotations

import pickle
import sys
import types
from pathlib import Path
from typing import Union

from ..osu import events as _events
from ..osu.vocab import Vocabulary

# every module path the reference ever pickled event classes under
_MODULE_MAPPING = {
    "osuT5.tokenizer.event": "mapperatorinator_tpu.osu.events",
    "osuT5.osuT5.event": "mapperatorinator_tpu.osu.events",
    "osuT5.event": "mapperatorinator_tpu.osu.events",
    "osuT5.osuT5.tokenizer": "mapperatorinator_tpu.osu.events",
    "libs.tokenizer.event": "mapperatorinator_tpu.osu.events",
    "libs.event": "mapperatorinator_tpu.osu.events",
    "classifier.libs.tokenizer.event": "mapperatorinator_tpu.osu.events",
}


class RoutedUnpickler(pickle.Unpickler):
    """Reference: ``utils/routed_pickle.py`` — renames modules at load time."""

    def find_class(self, mod_name: str, name: str):
        mod_name = _MODULE_MAPPING.get(mod_name, mod_name)
        return super().find_class(mod_name, name)


# torch.load(pickle_module=...) wants a module exposing Unpickler/load
routed_pickle_module = types.ModuleType("routed_pickle_module")
routed_pickle_module.Unpickler = RoutedUnpickler
routed_pickle_module.load = lambda f, **kw: RoutedUnpickler(f).load()
routed_pickle_module.loads = lambda b, **kw: RoutedUnpickler(__import__("io").BytesIO(b)).load()
sys.modules.setdefault("routed_pickle_module", routed_pickle_module)


def _normalize_tokenizer_state(state: dict) -> dict:
    """Pickled states may carry EventType/EventRange objects instead of the
    plain-dict schema; normalize to the schema from_state_dict expects."""

    def er_dict(er):
        if isinstance(er, dict):
            return er
        return {"type": er.type.value, "min_value": er.min_value, "max_value": er.max_value}

    def key(k):
        return k.value if hasattr(k, "value") else k

    out = dict(state)
    for field in ("event_ranges", "input_event_ranges"):
        if field in out:
            out[field] = [er_dict(er) for er in out[field]]
    for field in ("context_sos", "context_eos", "event_start", "event_end"):
        if field in out:
            out[field] = {key(k): v for k, v in out[field].items()}
    if "event_range" in out:
        out["event_range"] = {key(k): er_dict(v) for k, v in out["event_range"].items()}
    return out


def is_legacy_checkpoint(directory: Union[str, Path]) -> bool:
    directory = Path(directory)
    return (directory / "custom_checkpoint_0.pkl").is_file() and (
        (directory / "pytorch_model.bin").is_file()
        or any(directory.glob("model*.safetensors"))
    )


def load_legacy_checkpoint(directory: Union[str, Path], train_args=None):
    """Returns (model, params, vocab) from an accelerate checkpoint dir
    (reference: model_utils.py:356-397 local-custom branch)."""
    import torch

    from .convert import backbone_family, convert_mapperatorinator_state_dict
    from .mapperatorinator import Mapperatorinator, build_config

    directory = Path(directory)
    tokenizer_state = torch.load(
        directory / "custom_checkpoint_0.pkl", pickle_module=routed_pickle_module, weights_only=False
    )
    vocab = Vocabulary.from_state_dict(_normalize_tokenizer_state(tokenizer_state))

    if (directory / "pytorch_model.bin").is_file():
        state = torch.load(directory / "pytorch_model.bin", map_location="cpu", weights_only=True)
    else:
        from safetensors.torch import load_file

        state = {}
        for shard in sorted(directory.glob("model*.safetensors")):
            state.update(load_file(shard))

    if train_args is None:
        raise ValueError(
            "legacy accelerate checkpoints carry no model config; pass the "
            "training config (train_args) that produced them"
        )
    config = build_config(train_args, vocab)
    # the training config's mixed_precision describes how the checkpoint was
    # TRAINED, not how it should infer; legacy loads default to fp32 compute
    # (the reference's inference `precision` default) and the inference entry
    # re-applies its own precision flag on top (inference.py:load_model)
    import dataclasses

    import jax.numpy as jnp

    config = dataclasses.replace(
        config, backbone=dataclasses.replace(config.backbone, dtype=jnp.float32)
    )
    model = Mapperatorinator(config)
    params = {"params": convert_mapperatorinator_state_dict(
        {k: v for k, v in state.items()}, config,
        family=backbone_family(train_args.model.name),
    )}
    return model, params, vocab
