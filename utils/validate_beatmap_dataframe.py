"""Integrity report for a beatmap metadata table (reference:
``osu_diffusion/testing/validate_beatmap_dataframe.py`` — unique BeatmapID
count + duplicate listing over ``beatmap_df.pkl``). Generalized to this
repo's parquet/csv metadata artifacts (the MMRS/web dataset metadata tables)
with the id column auto-detected.

Usage::

    python utils/validate_beatmap_dataframe.py path/to/metadata.parquet \
        [--id-col BeatmapID]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ID_CANDIDATES = ("BeatmapID", "beatmap_id", "BeatmapId", "Id", "id")


def validate(path: str, id_col: str | None = None) -> dict:
    import pandas as pd

    table = Path(path)
    if table.suffix == ".parquet":
        df = pd.read_parquet(table)
    elif table.suffix in (".pkl", ".pickle"):
        df = pd.read_pickle(table)  # noqa: S301 — local artifact, mirrors the reference
    else:
        df = pd.read_csv(table)

    if id_col is None:
        id_col = next((c for c in ID_CANDIDATES if c in df.columns), None)
        if id_col is None:
            raise ValueError(f"no beatmap-id column found; columns: {list(df.columns)}")

    counts = df[id_col].value_counts()
    duplicated = counts[counts > 1]
    report = {
        "rows": len(df),
        "id_col": id_col,
        "unique_ids": int(df[id_col].nunique()),
        "duplicate_ids": int(len(duplicated)),
        "duplicates": {str(k): int(v) for k, v in duplicated.head(50).items()},
    }
    print(f"Number of unique beatmap IDs = {report['unique_ids']} "
          f"({report['rows']} rows, id column {id_col!r})")
    if len(duplicated):
        print("Duplicates:")
        print(df[df[id_col].isin(duplicated.index)])
    else:
        print("No duplicates.")
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("table", type=str)
    p.add_argument("--id-col", type=str, default=None)
    args = p.parse_args(argv)
    validate(args.table, args.id_col)


if __name__ == "__main__":
    sys.exit(main())
