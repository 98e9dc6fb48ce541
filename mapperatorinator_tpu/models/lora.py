"""LoRA adapters as functional param-tree transforms.

The reference fine-tunes with peft LoRA and merges adapters at load time
(reference: ``osuT5/train.py:93-99``, ``osuT5/osuT5/utils/model_utils.py:
154-258, 399-406``). The TPU-native design needs no model-code changes:
adapters are a pytree of (A, B) factors keyed by the target kernel's path,
``merge_lora`` folds them into the dense weights (W + scale * A @ B), and
training differentiates the merge itself — base params stay frozen, gradients
flow only to the factors.

Checkpoint format: ``lora.msgpack`` (factors) + ``lora_config.json`` carrying
rank/alpha/targets and the reference's compatibility metadata
(``format_version``, ``ckpt_subfolders``).
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Optional, Union

import flax
import jax
import jax.numpy as jnp
import numpy as np

LORA_CONFIG_FILENAME = "lora_config.json"
LORA_WEIGHTS_FILENAME = "lora.msgpack"

# reference peft target names -> our packed-projection kernel names
# (whisper-family uses *_proj; VarWhisper uses Wq/Wkv/Wqkv/Wo)
_TARGET_ALIASES = {
    "q_proj": "wq",
    "k_proj": "wkv",
    "v_proj": "wkv",
    "out_proj": "wo",
    "o_proj": "wo",
    "qkv_proj": "wqkv",
    "Wq": "wq",
    "Wkv": "wkv",
    "Wqkv": "wqkv",
    "Wo": "wo",
}
DEFAULT_TARGETS = ("wq", "wkv", "wqkv", "wo")


def normalize_targets(target_modules) -> tuple[str, ...]:
    """Translate reference peft module names to our kernel names."""
    if not target_modules:
        return DEFAULT_TARGETS
    out = []
    for t in target_modules:
        name = _TARGET_ALIASES.get(t, t)
        if name not in out:
            out.append(name)
    return tuple(out)


def _target_kernels(params, targets) -> dict[str, jnp.ndarray]:
    """Flattened path -> kernel for every 2-D kernel whose parent module name
    is in ``targets``."""
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    found = {}
    for path, leaf in flat.items():
        parts = path.split("/")
        if parts[-1] == "kernel" and len(parts) >= 2 and parts[-2] in targets and leaf.ndim == 2:
            found[path] = leaf
    return found


def init_lora_params(rng, params, rank: int = 64, target_modules=None, dtype=jnp.float32):
    """A ~ N(0, 1/rank) (fan-in style), B = 0 — merged delta starts at zero."""
    targets = normalize_targets(target_modules)
    kernels = _target_kernels(params, targets)
    lora = {}
    keys = jax.random.split(rng, max(len(kernels), 1))
    for key, (path, kernel) in zip(keys, sorted(kernels.items())):
        d_in, d_out = kernel.shape
        lora[path] = {
            "a": jax.random.normal(key, (d_in, rank), dtype) / np.sqrt(rank),
            "b": jnp.zeros((rank, d_out), dtype),
        }
    return flax.traverse_util.unflatten_dict(lora, sep="/")


def merge_lora(params, lora_params, alpha: float = 128.0):
    """W_eff = W + (alpha / rank) * A @ B for each adapted kernel.

    Differentiable in ``lora_params`` — used both for inference merging and
    as the forward transform during LoRA training.
    """
    flat = dict(flax.traverse_util.flatten_dict(params, sep="/"))
    flat_lora = flax.traverse_util.flatten_dict(lora_params, sep="/")
    pairs = {}
    for path, leaf in flat_lora.items():
        base, field = path.rsplit("/", 1)
        pairs.setdefault(base, {})[field] = leaf
    for base, ab in pairs.items():
        a, b = ab["a"], ab["b"]
        scale = alpha / a.shape[1]
        flat[base] = flat[base] + scale * (a @ b).astype(flat[base].dtype)
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def save_lora(directory: Union[str, Path], lora_params, *, rank: int, alpha: float,
              target_modules=None, ckpt_subfolders: Optional[list[str]] = None) -> None:
    """Write lora.msgpack + lora_config.json (reference: model_utils.py:154-169)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    with open(directory / LORA_WEIGHTS_FILENAME, "wb") as f:
        f.write(flax.serialization.to_bytes(lora_params))
    config = {
        "format_version": 1,
        "r": rank,
        "lora_alpha": alpha,
        "target_modules": list(normalize_targets(target_modules)),
        "ckpt_subfolders": sorted(ckpt_subfolders) if ckpt_subfolders else None,
    }
    with open(directory / LORA_CONFIG_FILENAME, "w", encoding="utf-8") as f:
        json.dump(config, f, indent=2, sort_keys=True)
        f.write("\n")


def load_lora(directory: Union[str, Path], params) -> tuple[dict, dict]:
    """Returns (lora_params, config); ``params`` provides the target shapes."""
    directory = Path(directory)
    with open(directory / LORA_CONFIG_FILENAME, encoding="utf-8") as f:
        config = json.load(f)
    template = init_lora_params(
        jax.random.PRNGKey(0), params, rank=config["r"],
        target_modules=config.get("target_modules"),
    )
    with open(directory / LORA_WEIGHTS_FILENAME, "rb") as f:
        lora_params = flax.serialization.from_bytes(template, f.read())
    return lora_params, config


_GAMEMODE_SUBFOLDER_PATTERN = re.compile(r"gamemode=\d+")


def get_model_checkpoint_subfolder(ckpt_path) -> str:
    """'gamemode=N' component of a checkpoint path, if any
    (reference: model_utils.py:215-229)."""
    if not ckpt_path:
        return ""
    for part in str(ckpt_path).replace("\\", "/").split("/"):
        if _GAMEMODE_SUBFOLDER_PATTERN.fullmatch(part):
            return part
    return ""


def resolve_model_checkpoint_path(ckpt_path, gamemode: Optional[int] = None,
                                  auto_select_gamemode_model: bool = True):
    """Prefer a ``gamemode=N`` fine-tune subfolder when it exists
    (reference: model_utils.py:269-301)."""
    if not ckpt_path or gamemode is None or not auto_select_gamemode_model:
        return ckpt_path
    gamemode_path = Path(ckpt_path) / f"gamemode={gamemode}"
    if gamemode_path.is_dir():
        return gamemode_path
    return ckpt_path


def resolve_compatible_lora_path(lora_path, ckpt_subfolder: str = "", verbose: bool = True):
    """Skip adapters whose metadata restricts them to other base checkpoints
    (reference: model_utils.py:231-258)."""
    if not lora_path:
        return None, None
    config_path = Path(lora_path) / LORA_CONFIG_FILENAME
    if not config_path.is_file():
        return lora_path, None
    try:
        with open(config_path, encoding="utf-8") as f:
            config = json.load(f)
    except (OSError, json.JSONDecodeError) as exc:
        print(f"Warning: Failed to read LoRA metadata from {config_path}: {exc}")
        return lora_path, None
    compatible = config.get("ckpt_subfolders")
    if compatible is not None and ckpt_subfolder not in compatible:
        if verbose:
            print(
                f"Skipping LoRA {lora_path}: it supports checkpoint subfolders "
                f"{compatible}, not {ckpt_subfolder!r}."
            )
        return None, config
    return lora_path, config
