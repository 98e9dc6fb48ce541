"""Checkpoint tree inspection: every parameter path with shape/dtype plus
size totals (equivalent of the reference's
``osu_diffusion/testing/print_ckpt.py:1-21`` state-dict walker).

Accepts any of the formats this framework reads or writes:

- a native checkpoint directory (``model_config.json`` + ``params.msgpack``)
- a bare flax ``.msgpack`` file
- an orbax checkpoint directory (a ``CheckpointManager`` step dir, its
  ``state`` subdir, or the manager root — the latest step is picked)
- a torch state-dict file (``.bin``/``.pt``/``.ckpt``/``.safetensors``),
  loaded through the routed unpickler so reference-repo pickles resolve

    python utils/print_ckpt.py checkpoints/400000 [--filter decoder] [--tree]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def _flatten(tree, prefix=""):
    """Yield (dotted_path, leaf) over nested dicts/lists, reference-style."""
    if isinstance(tree, dict):
        for key, value in tree.items():
            yield from _flatten(value, f"{prefix}{key}.")
    elif isinstance(tree, (list, tuple)):
        for i, value in enumerate(tree):
            yield from _flatten(value, f"{prefix}{i}.")
    else:
        yield prefix.rstrip("."), tree


def load_tree(path: Path):
    """(tree, format_name) for any supported checkpoint layout."""
    path = Path(path)
    if path.is_dir():
        if (path / "params.msgpack").exists():
            from flax import serialization

            return serialization.msgpack_restore((path / "params.msgpack").read_bytes()), "native"
        for candidate in (path / "state", path):
            if (candidate / "_METADATA").exists() or (candidate / "manifest.ocdbt").exists():
                import orbax.checkpoint as ocp

                with ocp.StandardCheckpointer() as ckptr:
                    return ckptr.restore(candidate), "orbax"
        # a CheckpointManager root: pick the newest step directory
        steps = sorted((d for d in path.iterdir() if d.is_dir() and d.name.isdigit()),
                       key=lambda d: int(d.name))
        if steps:
            return load_tree(steps[-1])
        raise ValueError(f"no checkpoint recognized under {path}")
    if path.suffix == ".msgpack":
        from flax import serialization

        return serialization.msgpack_restore(path.read_bytes()), "flax msgpack"
    if path.suffix == ".safetensors":
        from safetensors import safe_open

        tree = {}
        with safe_open(str(path), framework="np") as f:
            for key in f.keys():
                tree[key] = f.get_tensor(key)
        return tree, "safetensors"
    # torch pickle; the routed unpickler maps reference module paths
    import torch

    from mapperatorinator_tpu.models.legacy import routed_pickle_module

    return (
        torch.load(path, map_location="cpu", pickle_module=routed_pickle_module,
                   weights_only=False),
        "torch",
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("checkpoint", help="checkpoint dir or file")
    parser.add_argument("--filter", default=None, help="only paths containing this substring")
    parser.add_argument("--tree", action="store_true",
                        help="print non-array leaves (optimizer counts, metadata) too")
    args = parser.parse_args(argv)

    tree, fmt = load_tree(Path(args.checkpoint))
    total_params = 0
    total_bytes = 0
    rows = 0
    for dotted, leaf in _flatten(tree):
        shape = getattr(leaf, "shape", None)
        if shape is None and not args.tree:
            continue
        if args.filter and args.filter not in dotted:
            continue
        if shape is not None:
            import numpy as np

            count = int(np.prod(shape)) if len(shape) else 1
            nbytes = getattr(leaf, "nbytes", 0) or 0
            total_params += count
            total_bytes += int(nbytes)
            dtype = getattr(leaf, "dtype", "?")
            print(f"{dotted}  {tuple(shape)}  {dtype}")
        else:
            print(f"{dotted}  = {leaf!r}")
        rows += 1
    print(f"\n[{fmt}] {rows} entries, {total_params:,} parameters, "
          f"{total_bytes / 1e6:.1f} MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
