"""Hydra-compatible YAML config composition (no Hydra dependency).

Implements the subset of Hydra 1.3 semantics the reference configs use
(reference: ``configs/**``, ``osuT5/osuT5/config.py:256-258``):

* ``defaults:`` lists with group entries (``- default``,
  ``- ../model@model: varwhisper_small_v3``, ``- inference: v32``),
  structured-config bases (``- /train/base@_here_``, ``- base_fid``),
  ``- _self_`` ordering, and ``- override hydra/...`` entries (ignored).
* OmegaConf-style interpolation: relative/absolute refs
  (``${..model.spectrogram.hop_length}``), and the resolvers
  ``${context_type:map}`` and ``${now:%Y-%m-%d}``.
* Dotted CLI overrides (``optim.base_lr=1e-3``, ``+key=v``, ``key=null``).

Composition happens on plain dicts; the result is *structured* into the
dataclass tree from :mod:`mapperatorinator_tpu.config.schema`, which supplies
defaults for unset fields and coerces enums.
"""

from __future__ import annotations

import dataclasses
import datetime
import re
import typing
from enum import Enum
from pathlib import Path
from typing import Any, Optional, Type, Union

import yaml

from ..osu.events import ContextType
from . import schema

# Registry of Hydra "structured config" nodes, mirroring the reference's
# ConfigStore registrations.
_STRUCTURED: dict[str, type] = {
    "train/base": schema.TrainConfig,
    "inference/base": schema.InferenceConfig,
    "diffusion/base": schema.DiffusionTrainConfig,
    "base_fid": schema.FidConfig,
    "base_mai_mod": schema.MaiModConfig,
    # the v1-v18 era legacy presets (reference configs/legacy/*) name the
    # structured bases bare: ``- inference`` / ``- train``
    "inference": schema.InferenceConfig,
    "train": schema.TrainConfig,
}

_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


# ---------------------------------------------------------------------------
# dict utilities
# ---------------------------------------------------------------------------


def deep_merge(dst: dict, src: dict) -> dict:
    """Recursively merge ``src`` into ``dst`` (src wins). Returns dst."""
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def _dataclass_to_dict(obj: Any) -> Any:
    """Like dataclasses.asdict but keeps enums and non-dataclass leaves intact."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _dataclass_to_dict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    if isinstance(obj, list):
        return [_dataclass_to_dict(x) for x in obj]
    if isinstance(obj, dict):
        return {k: _dataclass_to_dict(v) for k, v in obj.items()}
    return obj


def _set_path(root: dict, path: str, value: dict) -> None:
    node = root
    if path:
        for part in path.split("."):
            node = node.setdefault(part, {})
    deep_merge(node, value)


# ---------------------------------------------------------------------------
# composition
# ---------------------------------------------------------------------------


class ConfigCompositionError(Exception):
    pass


def _parse_default_entry(entry) -> Optional[tuple[str, str, Optional[str]]]:
    """Returns (group_path, name, package) or None for entries to skip.

    ``group_path`` is relative to the directory of the file declaring the
    default (or absolute when it starts with '/'). ``package`` of None means
    merge at the current node; otherwise a dotted path under it.
    """
    if isinstance(entry, str):
        key, name = entry, None
    elif isinstance(entry, dict):
        (key, name), = entry.items()
    else:
        raise ConfigCompositionError(f"unparseable defaults entry: {entry!r}")

    if key == "_self_":
        return ("_self_", "", None)
    if key.startswith("override "):
        return None

    package = None
    if "@" in key:
        key, package = key.split("@", 1)
        if package == "_here_":
            package = ""
    if name is None:
        # "- default" or "- base_fid" or "- /train/base@_here_"
        group, _, name = key.rpartition("/")
        return (group or ".", name, package)
    return (key, name, package or key.split("/")[-1])


def _compose_file(path: Path, root_dir: Path) -> dict:
    with open(path, encoding="utf-8") as f:
        body = yaml.safe_load(f) or {}
    if not isinstance(body, dict):
        raise ConfigCompositionError(f"{path}: top level must be a mapping")

    defaults = body.pop("defaults", None)
    if defaults is None:
        return body

    result: dict = {}
    saw_self = False
    for raw in defaults:
        parsed = _parse_default_entry(raw)
        if parsed is None:
            continue
        group, name, package = parsed
        if group == "_self_":
            deep_merge(result, body)
            saw_self = True
            continue

        # the v1-v18 era legacy presets (reference configs/legacy/*) nest the
        # training recipe under the historical group name 'osut5'; the modern
        # schema field is 'train' and the recipe file sits next to the preset
        if group == "osut5":
            group, package = ".", "train"

        structured_key = f"{group.lstrip('/')}/{name}".lstrip("/") if group not in (".", "") else name
        if structured_key in _STRUCTURED or name in _STRUCTURED:
            cls = _STRUCTURED.get(structured_key) or _STRUCTURED[name]
            sub = _dataclass_to_dict(cls())
        else:
            if group.startswith("/"):
                sub_dir = root_dir / group.lstrip("/")
            elif group == ".":
                sub_dir = path.parent
            else:
                sub_dir = (path.parent / group).resolve()
            sub_path = _find_default(sub_dir, path, group, name)
            if sub_path is None:
                raise ConfigCompositionError(
                    f"{path}: default '{raw}' not found at {sub_dir / (name + '.yaml')}"
                )
            sub = _compose_file(sub_path, root_dir)

        _set_path(result, package or "", sub)

    if not saw_self:
        deep_merge(result, body)
    return result


def _find_default(sub_dir: Path, path: Path, group: str, name: str) -> Optional[Path]:
    """Resolve a defaults entry to a file, with legacy-layout fallbacks.

    Presets under a ``legacy/`` subdirectory (reference
    ``configs/{train,inference}/legacy/*``) reference their group siblings as
    if they still lived one level up (``- default``,
    ``- ../train@train: tiny41`` where tiny41 is itself a legacy preset), so
    after the primary location we retry against the parent directory and the
    target group's own ``legacy/`` subdirectory.
    """
    fname = f"{name}.yaml"
    candidates = [sub_dir / fname, sub_dir / "legacy" / fname]
    up = path.parent.parent
    if group in (".", ""):
        candidates.append(up / fname)
    else:
        resolved = (up / group).resolve()
        candidates += [resolved / fname, resolved / "legacy" / fname]
    for c in candidates:
        if c.exists():
            return c
    return None


# ---------------------------------------------------------------------------
# interpolation
# ---------------------------------------------------------------------------


def _lookup(root: dict, node_path: list[str], ref: str) -> Any:
    if ref.startswith("."):
        # OmegaConf semantics: one dot = the node containing the key,
        # each extra dot = one level further up.
        n_dots = len(ref) - len(ref.lstrip("."))
        rest = ref.lstrip(".")
        base = node_path[: max(0, len(node_path) - n_dots)]
    else:
        rest, base = ref, []
    node: Any = root
    for part in base:
        node = node[part]
    for part in rest.split(".") if rest else []:
        if not isinstance(node, dict) or part not in node:
            raise KeyError(f"interpolation target '{ref}' not found")
        node = node[part]
    return node


def _resolve_value(value: Any, root: dict, node_path: list[str]) -> Any:
    if isinstance(value, str):
        m = _INTERP_RE.fullmatch(value.strip())
        if m:
            return _resolve_expr(m.group(1), root, node_path)
        # partial interpolation inside a larger string
        def sub(mm):
            return str(_resolve_expr(mm.group(1), root, node_path))
        return _INTERP_RE.sub(sub, value)
    return value


def _resolve_expr(expr: str, root: dict, node_path: list[str]) -> Any:
    if expr.startswith("context_type:"):
        return ContextType(expr.split(":", 1)[1].lower())
    if expr.startswith("now:"):
        return datetime.datetime.now().strftime(expr.split(":", 1)[1])
    if expr.startswith("hydra."):
        return ""
    val = _lookup(root, node_path, expr)
    return _resolve_value(val, root, node_path)


def resolve_interpolations(tree: dict) -> dict:
    def walk(node: Any, path: list[str]) -> Any:
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path) for v in node]
        return _resolve_value(node, tree, path)

    return walk(tree, [])


# ---------------------------------------------------------------------------
# structuring into dataclasses
# ---------------------------------------------------------------------------


def _coerce(value: Any, tp: Any) -> Any:
    origin = typing.get_origin(tp)
    if origin is Union:
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        if value is None:
            return None
        return _coerce(value, args[0]) if len(args) == 1 else value
    if dataclasses.is_dataclass(tp):
        return structure(tp, value if isinstance(value, dict) else {})
    if origin in (list, tuple):
        args = typing.get_args(tp)
        elem = args[0] if args else Any
        seq = [_coerce(v, elem) for v in (value or [])]
        return tuple(seq) if origin is tuple else seq
    if isinstance(tp, type) and issubclass(tp, Enum):
        if isinstance(value, tp):
            return value
        if isinstance(value, str):
            try:
                return tp(value)
            except ValueError:
                return tp[value]
        return tp(value)
    if tp is float and isinstance(value, (int, str)):
        return float(value)
    if tp is int and isinstance(value, float) and value.is_integer():
        return int(value)
    if tp is int and isinstance(value, str):
        return int(value)
    if tp is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "on")
    return value


def structure(cls: Type, data: dict):
    """Build dataclass ``cls`` from a plain dict, using field defaults for
    missing keys. Unknown keys raise (typo protection), except 'hydra'."""
    data = dict(data or {})
    data.pop("hydra", None)
    kwargs = {}
    fields = {f.name: f for f in dataclasses.fields(cls)}
    hints = typing.get_type_hints(cls)
    for key in list(data):
        if key not in fields:
            raise ConfigCompositionError(f"unknown config key '{key}' for {cls.__name__}")
    for name, f in fields.items():
        if name == "hydra":
            continue
        if name in data:
            kwargs[name] = _coerce(data[name], hints.get(name, Any))
    return cls(**kwargs)


# Special handling: the reference's context_types entries are dicts
# {"in": [...], "out": [...]} whose values must become ContextType lists.
def normalize_context_types(entries: list) -> list:
    out = []
    for e in entries or []:
        if isinstance(e, dict):
            out.append(
                {
                    "in": [_as_context(x) for x in _as_list(e.get("in"))],
                    "out": [_as_context(x) for x in _as_list(e.get("out"))],
                }
            )
        else:
            out.append(_as_context(e))
    return out


def _as_list(x) -> list:
    # legacy presets write a bare string where a list is expected
    # (configs/legacy/train_timer_v24.yaml: {"in": ["none"], "out": "timing"})
    if x is None:
        return []
    if isinstance(x, (str, ContextType)):
        return [x]
    return list(x)


def _as_context(x) -> ContextType:
    if isinstance(x, ContextType):
        return x
    return ContextType(str(x).lower())


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def apply_overrides(tree: dict, overrides: list[str]) -> dict:
    for ov in overrides:
        if "=" not in ov:
            raise ConfigCompositionError(f"override '{ov}' must be key=value")
        key, _, raw = ov.partition("=")
        key = key.lstrip("+~")
        value = yaml.safe_load(raw) if raw != "" else None
        node = tree
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        leaf = parts[-1]
        if isinstance(value, dict) and isinstance(node.get(leaf), dict):
            deep_merge(node[leaf], value)
        else:
            node[leaf] = value
    return tree


def compose(
    config_dir: Union[str, Path],
    config_name: str,
    overrides: Optional[list[str]] = None,
    schema_cls: Optional[Type] = None,
):
    """Compose ``<config_dir>/<config_name>.yaml`` with its defaults tree,
    apply dotted CLI overrides, resolve interpolations, and structure into
    ``schema_cls`` (auto-detected from the structured base when omitted)."""
    config_dir = Path(config_dir)
    path = config_dir / f"{config_name}.yaml"
    if not path.exists():
        # allow group-qualified names like "train/v32"
        raise ConfigCompositionError(f"config not found: {path}")

    tree = _compose_file(path, config_dir)
    if overrides:
        apply_overrides(tree, overrides)
    tree = resolve_interpolations(tree)

    if schema_cls is None:
        schema_cls = _infer_schema(path)

    # legacy inference presets (configs/legacy/inference_v7.yaml) attach a
    # model group at the top level; the modern schema nests it at train.model
    if schema_cls is schema.InferenceConfig and isinstance(tree.get("model"), dict):
        deep_merge(tree.setdefault("train", {}).setdefault("model", {}), tree.pop("model"))

    cfg = structure(schema_cls, tree)
    _post_normalize(cfg)
    return cfg


def _infer_schema(path: Path) -> type:
    group = path.parent.name
    mapping = {
        "train": schema.TrainConfig,
        "inference": schema.InferenceConfig,
        "diffusion": schema.DiffusionTrainConfig,
    }
    if group in mapping:
        return mapping[group]
    name = path.stem
    if "fid" in name:
        return schema.FidConfig
    if "mai_mod" in name:
        return schema.MaiModConfig
    return schema.InferenceConfig


def _post_normalize(cfg) -> None:
    """Coerce ContextType-bearing fields after structuring."""
    if isinstance(cfg, schema.TrainConfig):
        cfg.data.context_types = normalize_context_types(cfg.data.context_types)
    elif isinstance(cfg, schema.InferenceConfig):
        cfg.in_context = [_as_context(x) for x in (cfg.in_context or [])]
        cfg.output_type = [_as_context(x) for x in (cfg.output_type or [])]
        cfg.train.data.context_types = normalize_context_types(cfg.train.data.context_types)
    elif isinstance(cfg, (schema.FidConfig, schema.MaiModConfig)):
        _post_normalize(cfg.inference)
