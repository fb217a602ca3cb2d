"""Label schema + QA rules for the curated landscape dataset.

The reference labels images with an 11-column one-hot CSV (no header):
  img, quality_good, quality_medium, quality_bad, light_medium, light_dark,
  dust_medium, dust_bad, constructions_medium, constructions_bad, snow
(dataset_creator/preprocess_scripts/check_label_validity.py:8-47,
sort_images.py:10-38, count_stats.py:11-83). This module reimplements the
three rule sets against that schema:

- validity: exactly one QUALITY label; at most one of each LIGHT/DUST/
  CONSTRUCTIONS pair;
- usability: no "bad" label (quality_bad, light_dark, dust_bad,
  constructions_bad, snow), at most 2 "medium" side labels, and not
  (quality_medium AND 2 medium side labels);
- stats: quality distribution + usable-bucket counts, matching the JSON
  layout of dataset_creator/results_open_images/stats.json.
"""

from __future__ import annotations

import csv
import json
import os
import shutil
from pathlib import Path
from typing import Iterable, Iterator

LABEL_COLUMNS = (
    "img",
    "quality_good", "quality_medium", "quality_bad",
    "light_medium", "light_dark",
    "dust_medium", "dust_bad",
    "constructions_medium", "constructions_bad",
    "snow",
)


def read_label_rows(label_file: str | Path) -> Iterator[list[str]]:
    with open(label_file) as csvfile:
        yield from csv.reader(csvfile, delimiter=",", quoting=csv.QUOTE_NONE)


def is_row_valid(row: list[str]) -> bool:
    """Exactly one quality label; <=1 per LIGHT/DUST/CONSTRUCTIONS category."""
    quality = int(row[1]) + int(row[2]) + int(row[3])
    light = int(row[4]) + int(row[5])
    dust = int(row[6]) + int(row[7])
    constructions = int(row[8]) + int(row[9])
    return quality == 1 and light <= 1 and dust <= 1 and constructions <= 1


def _bad_count(row: list[str]) -> int:
    # quality_bad, light_dark, dust_bad, constructions_bad, snow
    return int(row[3]) + int(row[5]) + int(row[7]) + int(row[9]) + int(row[10])


def _medium_count(row: list[str]) -> int:
    # light_medium, dust_medium, constructions_medium
    return int(row[4]) + int(row[6]) + int(row[8])


def is_image_usable(row: list[str]) -> bool:
    """Usability rules (sort_images.py:10-38)."""
    if _bad_count(row) > 0:
        return False
    medium = _medium_count(row)
    if medium > 2:
        return False
    if medium == 2 and int(row[2]) == 1:  # quality_medium + 2 mediums
        return False
    return True


def check_label_validity(label_file: str | Path) -> list[str]:
    """Returns the image names of invalid rows (empty == valid file)."""
    return [row[0] for row in read_label_rows(label_file) if not is_row_valid(row)]


def label_stats(rows: Iterable[list[str]]) -> dict[str, int]:
    """Distribution stats in the reference's stats.json layout
    (count_stats.py:11-83)."""
    quality_good = quality_medium = quality_bad = 0
    good_unique = good_one_med = good_two_med = 0
    medium_unique = medium_one_med = 0
    for row in rows:
        quality_good += int(row[1])
        quality_medium += int(row[2])
        quality_bad += int(row[3])
        if _bad_count(row) > 0:
            continue
        medium = _medium_count(row)
        if medium > 2:
            continue
        if medium == 0:
            if int(row[1]) == 1:
                good_unique += 1
            else:
                medium_unique += 1
        elif medium == 1:
            if int(row[1]) == 1:
                good_one_med += 1
            else:
                medium_one_med += 1
        elif medium == 2 and int(row[1]) == 1:
            good_two_med += 1
    return {
        "sum_images": quality_good + quality_medium + quality_bad,
        "quality_good": quality_good,
        "quality_medium": quality_medium,
        "quality_bad": quality_bad,
        "sum_usable": (
            good_unique + good_one_med + good_two_med
            + medium_unique + medium_one_med
        ),
        "good_unique": good_unique,
        "good_one_med": good_one_med,
        "good_two_med": good_two_med,
        "medium_unique": medium_unique,
        "medium_one_med": medium_one_med,
    }


def sort_usable_images(
    label_file: str | Path, input_folder: str | Path, output_folder: str | Path
) -> int:
    """Copy usable images to output_folder; returns the copy count."""
    os.makedirs(output_folder, exist_ok=True)
    copied = 0
    for row in read_label_rows(label_file):
        if is_image_usable(row):
            shutil.copyfile(
                os.path.join(input_folder, row[0]),
                os.path.join(output_folder, row[0]),
            )
            copied += 1
    return copied


def partition_dataset(
    input_folder: str | Path, output_folder: str | Path, chunk: int = 1000
) -> int:
    """Split a flat image folder into numbered chunk-sized subfolders
    (get1000.py:13-31); returns the number of subfolders."""
    files = sorted(os.listdir(input_folder))
    folder_count = 0
    for i, file in enumerate(files):
        if i % chunk == 0:
            folder_count += 1
            os.makedirs(os.path.join(output_folder, str(folder_count)), exist_ok=True)
        shutil.copyfile(
            os.path.join(input_folder, file),
            os.path.join(output_folder, str(folder_count), file),
        )
    return folder_count


def create_id_list(
    ids_json: str | Path, output_file: str | Path, split: str = "train"
) -> int:
    """kyd_ids.json {"ids": [...]} -> '<split>/<id-sans-extension>' lines
    (id_creator.py:1-15); returns the line count."""
    with open(ids_json) as f:
        ids = json.load(f)["ids"]
    with open(output_file, "w") as f:
        for id_ in ids:
            f.write(split + "/" + os.path.splitext(id_)[0] + "\n")
    return len(ids)


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description="Label QA / dataset tooling")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("check", help="validate a label CSV")
    p.add_argument("label_file")

    p = sub.add_parser("stats", help="label distribution stats")
    p.add_argument("label_file")
    p.add_argument("stats_file")

    p = sub.add_parser("sort", help="copy usable images")
    p.add_argument("label_file")
    p.add_argument("input_folder")
    p.add_argument("output_folder")

    p = sub.add_parser("partition", help="split into chunked subfolders")
    p.add_argument("input_folder")
    p.add_argument("output_folder")
    p.add_argument("--chunk", type=int, default=1000)

    p = sub.add_parser("idlist", help="ids json -> downloader list file")
    p.add_argument("ids_json")
    p.add_argument("output_file")
    p.add_argument("--split", default="train")

    args = parser.parse_args(argv)
    if args.cmd == "check":
        invalid = check_label_validity(args.label_file)
        if not invalid:
            print("CSV file is valid.")
        else:
            print(
                f"CSV file isn't valid, there are {len(invalid)} invalid rows:",
                invalid,
            )
    elif args.cmd == "stats":
        stats = label_stats(read_label_rows(args.label_file))
        with open(args.stats_file, "w") as f:
            f.write(json.dumps(stats, indent=4, sort_keys=False))
        print(json.dumps(stats, indent=2))
    elif args.cmd == "sort":
        n = sort_usable_images(args.label_file, args.input_folder, args.output_folder)
        print(f"Copied {n} usable images.")
    elif args.cmd == "partition":
        n = partition_dataset(args.input_folder, args.output_folder, args.chunk)
        print(f"Created {n} subfolders.")
    elif args.cmd == "idlist":
        n = create_id_list(args.ids_json, args.output_file, args.split)
        print(f"Wrote {n} ids.")


if __name__ == "__main__":
    main()
