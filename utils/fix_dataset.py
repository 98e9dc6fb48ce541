"""Repair the BeatmapFile column of an MMRS metadata.parquet
(reference: ``utils/fix_dataset.py``): for rows whose recorded file is
missing, rediscover the .osu by matching BeatmapID inside each set folder.

    python utils/fix_dataset.py /path/to/MMRS [--dry-run]
"""

from __future__ import annotations

import sys
from pathlib import Path


def get_beatmap_id(osu_file: Path):
    with osu_file.open(encoding="utf-8", errors="ignore") as f:
        for line in f:
            if line.startswith("BeatmapID:"):
                return int(line.split(":")[1].strip())
    return None


def fix_dataset(dataset_path, dry_run: bool = False) -> list[tuple]:
    import pandas as pd
    from tqdm import tqdm

    dataset_path = Path(dataset_path)
    metadata_path = dataset_path / "metadata.parquet"
    df = pd.read_parquet(metadata_path)

    changed = []
    for idx, row in tqdm(df.iterrows(), total=len(df), desc="Updating BeatmapFile"):
        folder = dataset_path / "data" / str(row["BeatmapSetFolder"])
        if (folder / row["BeatmapFile"]).exists():
            continue
        found = False
        for osu_file in folder.glob("*.osu"):
            if get_beatmap_id(osu_file) == row["Id"]:
                if row["BeatmapFile"] != osu_file.name:
                    df.at[idx, "BeatmapFile"] = osu_file.name
                    changed.append((idx, row["Id"], osu_file.name))
                found = True
                break
        if not found:
            print(f"Warning: no matching .osu found for Id {row['Id']} in {folder}")

    for idx, beatmap_id, name in changed:
        print(f"Row {idx} (Id={beatmap_id}) updated to BeatmapFile={name}")
    if not dry_run:
        df.to_parquet(metadata_path)
    return changed


if __name__ == "__main__":
    args = sys.argv[1:]
    fix_dataset(args[0], dry_run="--dry-run" in args)
