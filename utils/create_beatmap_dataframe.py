"""Build a per-beatmap metadata table from an ORS track-folder dataset
(reference: ``osu_diffusion/testing/create_beatmap_dataframe.py`` — iterates
``TrackNNNNN/metadata.json`` and collects one row per beatmap into
``beatmap_df.pkl``). This version walks whatever tracks exist (no hardcoded
count), tolerates missing metadata keys, writes parquet (or pickle/csv by
extension), and keeps the embedding index order (row i = style class i),
so the output feeds ``utils/plot_embeddings.py --metadata`` and
``utils/validate_beatmap_dataframe.py`` directly.

Usage::

    python utils/create_beatmap_dataframe.py /path/to/ORS \
        [--out beatmap_df.parquet] [--start 0] [--end N]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

COLUMNS = [
    "BeatmapID", "BeatmapSetID", "TrackIndex", "SetIndex", "TrackName",
    "BeatmapName", "Artist", "Title", "Creator", "Source", "Tags", "Ruleset",
    "MD5Hash", "Difficulty", "DrainTime", "TotalTime", "RankedStatus",
    "CirclesCount", "SpinnersCount", "SlidersCount", "CircleSize",
    "ApproachRate", "OverallDifficulty", "HPDrainRate", "SliderVelocity",
    "StackLeniency", "StarRating",
]


def build_dataframe(dataset_path: str, start: int = 0, end: int | None = None):
    import pandas as pd

    root = Path(dataset_path)
    tracks = sorted(p for p in root.iterdir() if p.is_dir() and (p / "metadata.json").exists())
    tracks = tracks[start:end]
    if not tracks:
        raise FileNotFoundError(f"no Track*/metadata.json under {root}")

    rows = []
    for track_index, track in enumerate(tracks, start=start):
        with open(track / "metadata.json", encoding="utf-8") as f:
            metadata = json.load(f)
        beatmaps = metadata.get("Beatmaps", {})
        for set_index, (name, bm) in enumerate(beatmaps.items()):
            stars = (bm.get("StandardStarRating") or {}).get("0")
            rows.append({
                "BeatmapID": bm.get("BeatmapId"),
                "BeatmapSetID": metadata.get("BeatmapSetId"),
                "TrackIndex": track_index,
                "SetIndex": set_index,
                "TrackName": track.name,
                "BeatmapName": name,
                "Artist": metadata.get("Artist"),
                "Title": metadata.get("Title"),
                "Creator": metadata.get("Creator"),
                "Source": metadata.get("Source"),
                "Tags": metadata.get("Tags"),
                "Ruleset": bm.get("Ruleset"),
                "MD5Hash": bm.get("MD5Hash"),
                "Difficulty": bm.get("Difficulty"),
                "DrainTime": bm.get("DrainTime"),
                "TotalTime": bm.get("TotalTime"),
                "RankedStatus": bm.get("RankedStatus"),
                "CirclesCount": bm.get("CirclesCount"),
                "SpinnersCount": bm.get("SpinnersCount"),
                "SlidersCount": bm.get("SlidersCount"),
                "CircleSize": bm.get("CircleSize"),
                "ApproachRate": bm.get("ApproachRate"),
                "OverallDifficulty": bm.get("OverallDifficulty"),
                "HPDrainRate": bm.get("HPDrain", bm.get("HPDrainRate")),
                "SliderVelocity": bm.get("SliderVelocity"),
                "StackLeniency": bm.get("StackLeniency"),
                "StarRating": stars,
            })
    return pd.DataFrame(rows, columns=COLUMNS)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dataset_path", type=str)
    p.add_argument("--out", type=str, default="beatmap_df.parquet")
    p.add_argument("--start", type=int, default=0)
    p.add_argument("--end", type=int, default=None)
    args = p.parse_args(argv)

    df = build_dataframe(args.dataset_path, args.start, args.end)
    out = Path(args.out)
    if out.suffix == ".parquet":
        df.to_parquet(out)
    elif out.suffix in (".pkl", ".pickle"):
        df.to_pickle(out)
    else:
        df.to_csv(out, index=False)
    print(f"wrote {len(df)} beatmaps to {out}")
    print(df.head())
    return 0


if __name__ == "__main__":
    sys.exit(main())
