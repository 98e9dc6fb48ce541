"""Self-similarity matrix heatmaps for real vs generated beatmaps
(reference: ``utils/plot_cm3p_self_similarity.py``). Embeds windows either
with a local CM3P checkpoint (``--cm3p``, the reference's embedding model —
see models/cm3p.py) or with the trained classifier's window features
(``--classifier``, the same extractor calc_fid uses).

    python utils/plot_self_similarity.py real.osu generated.osu audio.wav \
        --cm3p /path/to/cm3p_ckpt [-o ssm.png]
    python utils/plot_self_similarity.py real.osu generated.osu audio.wav \
        --classifier /path/to/classifier_ckpt/final [-o ssm.png]
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def main(argv=None):
    import numpy as np

    from calc_fid import compute_self_similarity, extract_features, load_classifier, ssm_rmse_for_pair
    from mapperatorinator_tpu.audio.io import load_audio_file

    argv = sys.argv[1:] if argv is None else argv
    out = None
    classifier_ckpt = None
    cm3p_ckpt = None
    rest = []
    i = 0
    while i < len(argv):
        if argv[i] == "-o":
            out = argv[i + 1]
            i += 2
        elif argv[i] == "--classifier":
            classifier_ckpt = argv[i + 1]
            i += 2
        elif argv[i] == "--cm3p":
            cm3p_ckpt = argv[i + 1]
            i += 2
        else:
            rest.append(argv[i])
            i += 1
    real_path, gen_path, audio_path = (Path(p) for p in rest[:3])

    if cm3p_ckpt is not None:
        from mapperatorinator_tpu.models.cm3p import extract_cm3p_features, load_cm3p
        from mapperatorinator_tpu.osu import Beatmap

        bundle = load_cm3p(cm3p_ckpt)
        if bundle is None or bundle[3] is None:
            raise SystemExit("a loadable local CM3P checkpoint (with tokenizer.json) is required")
        audio = load_audio_file(audio_path, bundle[2].sample_rate)
        rf = extract_cm3p_features(Beatmap.from_path(real_path), audio, bundle, batch_size=8)
        gf = extract_cm3p_features(Beatmap.from_path(gen_path), audio, bundle, batch_size=8)
    else:
        bundle = load_classifier(types.SimpleNamespace(classifier_ckpt=classifier_ckpt))
        if bundle is None:
            raise SystemExit("a checkpoint is required (--cm3p or --classifier)")
        sr = bundle[2].model.spectrogram.sample_rate
        audio = load_audio_file(audio_path, sr)
        rf = extract_features(real_path, audio, bundle, batch_size=8)
        gf = extract_features(gen_path, audio, bundle, batch_size=8)
    rmse = ssm_rmse_for_pair(rf, gf)
    print(f"windows: real={len(rf)} generated={len(gf)}  ssm_rmse={rmse:.4f}")

    if out:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(10, 5))
        for ax, feats, title in ((axes[0], rf, "real"), (axes[1], gf, "generated")):
            ax.imshow(np.clip((compute_self_similarity(feats) + 1) / 2, 0, 1), cmap="magma")
            ax.set_title(title)
        fig.suptitle(f"SSM RMSE = {rmse:.4f}")
        fig.savefig(out, dpi=120)
        print(f"wrote {out}")
    return rmse


if __name__ == "__main__":
    main()
