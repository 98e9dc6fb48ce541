"""Mapper-class statistics for a beatmap_users.json
(reference: ``classifier/count_classes.py``).

    python utils/count_classes.py datasets/beatmap_users.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def init_mapper_idx(mappers_path):
    path = Path(mappers_path)
    if not path.exists():
        raise ValueError(f"mappers_path {path} not found")
    with open(path, encoding="utf-8") as f:
        data = json.load(f)
    if isinstance(data, dict):  # {beatmap_id: user_id} variant
        beatmap_mapper = {int(k): v for k, v in data.items()}
    else:  # list of {id, user_id} records
        beatmap_mapper = {item["id"]: item["user_id"] for item in data}
    unique = sorted(set(beatmap_mapper.values()))
    mapper_idx = {uid: i for i, uid in enumerate(unique)}
    return beatmap_mapper, mapper_idx, len(unique)


def main(path):
    beatmap_mapper, mapper_idx, num_classes = init_mapper_idx(path)
    print("Number of mapper classes:", num_classes)
    print("Number of beatmaps:", len(beatmap_mapper))
    counts: dict = {}
    for user_id in beatmap_mapper.values():
        counts[user_id] = counts.get(user_id, 0) + 1
    print("Average maps per mapper class:", len(beatmap_mapper) / num_classes)
    print("Median maps per mapper class:", sorted(counts.values())[num_classes // 2])
    max_maps = max(counts.values())
    print("Mapper with most number of maps:", [u for u, c in counts.items() if c == max_maps])
    print("Number of maps:", max_maps)
    return counts


if __name__ == "__main__":
    main(sys.argv[1])
