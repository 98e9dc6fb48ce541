"""Publish checkpoints to the HuggingFace Hub (reference: ``push_to_hub.py:20-167``).

Stages the root checkpoint plus any discovered gamemode subfolder checkpoints
into a temp bundle, nulls the embeddings of mappers who requested removal
(``datasets/removed_users.txt``), and uploads the folder. With no network or
no ``huggingface_hub``, use ``--stage-dir`` to produce the bundle locally.

    python push_to_hub.py -cn v32 model_path=... [repo_id=...] [--stage-dir DIR]
"""

from __future__ import annotations

import sys
from pathlib import Path
from tempfile import TemporaryDirectory

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

CHECKPOINT_FILES = ("params.msgpack", "tokenizer.json")


def load_removed_users(path: Path | None = None) -> list[int]:
    path = path or REPO_ROOT / "datasets" / "removed_users.txt"
    if not path.exists():
        return []
    with open(path, encoding="utf-8") as f:
        return [int(line.strip()) for line in f if line.strip()]


def remove_mappers_from_params(params, vocab, removed_users: list[int]):
    """Null removed mappers' embedding rows (reference: push_to_hub.py:20-47).

    Zeroes (a) the RBF mapper-embedder row and (b) the decoder token-embed row
    for each removed user, then drops them from the vocab's mapper index.
    Returns updated (params, vocab); params leaves are replaced functionally.
    """
    from mapperatorinator_tpu.osu.events import EventType

    if not vocab.mapper_idx:
        print("Vocabulary has no mapper index, nothing to remove.")
        return params, vocab

    import flax

    flat = flax.traverse_util.flatten_dict(params, sep="/")

    def null_row(key_substring: str, row: int, label: str):
        for key in list(flat):
            if key_substring in key and flat[key].ndim == 2:
                arr = np.array(flat[key])
                arr[row] = 0
                flat[key] = arr
                print(f"Nulled idx {row} ({label}) in {key}")

    for user in removed_users:
        if user not in vocab.mapper_idx:
            continue
        null_row("mapper_embedder", vocab.mapper_idx[user], str(user))
        if EventType.MAPPER in vocab.event_range:
            null_row("decoder_embed/embedding", vocab.encode_mapper_id(user), str(user))
        del vocab.mapper_idx[user]
        print(f"Removed mapper {user} from vocabulary idx mapping.")

    return flax.traverse_util.unflatten_dict(flat, sep="/"), vocab


def contains_loadable_model_checkpoint(path: Path) -> bool:
    return all((path / f).is_file() for f in CHECKPOINT_FILES)


def discover_submodel_paths(model_path) -> list[Path]:
    """Find nested checkpoint dirs, e.g. ``gamemode=1/`` fine-tune subfolders
    (reference: push_to_hub.py:64-79)."""
    model_root = Path(model_path)
    if not model_root.is_dir():
        print(f"Model path {model_path} is not a local directory, skipping subfolder discovery.")
        return []
    found = [
        p for p in sorted(model_root.rglob("*"))
        if p.is_dir() and contains_loadable_model_checkpoint(p)
    ]
    print(f"Discovered {len(found)} submodel folder(s).")
    for p in found:
        print(f" - {p.relative_to(model_root).as_posix()}")
    return found


def stage_checkpoints(model_path, staged_root: Path, removed_users: list[int]) -> list[str]:
    """Load, scrub, and re-save root + subfolder checkpoints into staged_root.
    Returns relative subfolder names ('' = root)."""
    from mapperatorinator_tpu.models.io import load_checkpoint, save_checkpoint

    model_root = Path(model_path)
    targets = [("", model_root)] + [
        (p.relative_to(model_root).as_posix(), p) for p in discover_submodel_paths(model_root)
    ]
    for rel, source in targets:
        print(f"Loading model checkpoint from {source}")
        model, params, vocab = load_checkpoint(source)
        params, vocab = remove_mappers_from_params(params, vocab, removed_users)
        out = staged_root if rel == "" else staged_root / rel
        save_checkpoint(out, model.config, params, vocab)
        missing = [f for f in ("model_config.json",) + CHECKPOINT_FILES if not (out / f).is_file()]
        if missing:
            raise FileNotFoundError(f"Missing expected saved artifacts in {out}: {', '.join(missing)}")
        print(f"Saved artifacts to {out}")
    return [rel for rel, _ in targets]


def main(argv=None):
    from mapperatorinator_tpu.config import compose, schema

    argv = sys.argv[1:] if argv is None else argv
    config_name, stage_dir, overrides = "v32", None, []
    i = 0
    while i < len(argv):
        if argv[i] in ("-cn", "--config-name"):
            config_name = argv[i + 1]
            i += 2
        elif argv[i] == "--stage-dir":
            stage_dir = Path(argv[i + 1])
            i += 2
        else:
            overrides.append(argv[i])
            i += 1

    repo_id = "Mapperatorinator-tpu-v32"
    overrides, plain = [o for o in overrides if not o.startswith("repo_id=")], overrides
    for o in plain:
        if o.startswith("repo_id="):
            repo_id = o.split("=", 1)[1]

    args = compose(REPO_ROOT / "configs" / "inference", config_name, overrides=overrides,
                   schema_cls=schema.InferenceConfig)
    removed_users = load_removed_users()

    if stage_dir is not None:
        stage_dir.mkdir(parents=True, exist_ok=True)
        subfolders = stage_checkpoints(args.model_path, stage_dir, removed_users)
        print(f"Staged {len(subfolders)} checkpoint(s) to {stage_dir} (no upload requested)")
        return stage_dir

    try:
        from huggingface_hub import HfApi
    except ImportError:
        raise SystemExit("huggingface_hub is not available; use --stage-dir DIR to stage locally.")

    api = HfApi()
    api.create_repo(repo_id=repo_id, repo_type="model", private=True, exist_ok=True)
    with TemporaryDirectory(prefix="push_to_hub_") as temp_dir:
        staged_root = Path(temp_dir)
        stage_checkpoints(args.model_path, staged_root, removed_users)
        api.upload_folder(repo_id=repo_id, repo_type="model", folder_path=str(staged_root),
                          commit_message="Upload root and subfolder checkpoints")
    print("Done")


if __name__ == "__main__":
    main()
