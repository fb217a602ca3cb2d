"""Open Images downloader — S3 unsigned bucket fetcher.

Counterpart of dataset_creator/download_scripts/open_images_downloader.py
(a vendored Google script, SURVEY.md §2 #23): downloads
`<split>/<image_id>.jpg` objects from the public `open-images-dataset` S3
bucket given a list file of `<split>/<id>` lines, in parallel, with resume
(existing files skipped).

Implementation differences (deliberate): plain HTTPS GETs against the
bucket's public endpoint via urllib — no boto3 dependency (the bucket allows
unsigned reads, so SDK signing machinery is unnecessary); failed downloads
are collected and reported instead of sys.exit-ing mid-run. This environment
has no egress, so network use is construction-time only and fully gated —
everything above the fetch function is unit-testable offline.
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os
import sys
import urllib.request
from pathlib import Path

BUCKET_URL = "https://open-images-dataset.s3.amazonaws.com"


def parse_image_list(list_path: str | Path) -> list[tuple[str, str]]:
    """Lines '<split>/<image_id>[.jpg]' -> (split, image_id) pairs."""
    pairs = []
    with open(list_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                split, image_id = line.split("/", 1)
            except ValueError as e:
                raise ValueError(f"malformed image list line: {line!r}") from e
            image_id = os.path.splitext(image_id)[0]
            if split not in ("train", "validation", "test", "challenge2018"):
                raise ValueError(f"unknown split in line: {line!r}")
            pairs.append((split, image_id))
    return pairs


def object_url(split: str, image_id: str) -> str:
    return f"{BUCKET_URL}/{split}/{image_id}.jpg"


def download_one(
    split: str, image_id: str, download_folder: str | Path, timeout: float = 60.0
) -> tuple[str, bool, str]:
    """Fetch one object; returns (id, ok, message). Skips existing files."""
    dest = Path(download_folder) / f"{image_id}.jpg"
    if dest.exists() and dest.stat().st_size > 0:
        return image_id, True, "exists"
    try:
        with urllib.request.urlopen(object_url(split, image_id), timeout=timeout) as r:
            data = r.read()
        tmp = dest.with_suffix(".part")
        tmp.write_bytes(data)
        tmp.rename(dest)
        return image_id, True, "ok"
    except Exception as e:  # pragma: no cover - network
        return image_id, False, str(e)


def download_all_images(
    image_list: str | Path,
    download_folder: str | Path,
    num_processes: int = 5,
) -> dict[str, int]:
    """Parallel fetch of every id in the list file; returns counters."""
    pairs = parse_image_list(image_list)
    Path(download_folder).mkdir(parents=True, exist_ok=True)
    ok = failed = 0
    failures: list[tuple[str, str]] = []
    with concurrent.futures.ThreadPoolExecutor(max_workers=num_processes) as ex:
        futures = [
            ex.submit(download_one, split, image_id, download_folder)
            for split, image_id in pairs
        ]
        for i, fut in enumerate(concurrent.futures.as_completed(futures)):
            image_id, success, msg = fut.result()
            if success:
                ok += 1
            else:
                failed += 1
                failures.append((image_id, msg))
            print(f"\r{i + 1}/{len(pairs)} done ({failed} failed)", end="", flush=True)
    print()
    for image_id, msg in failures[:20]:
        print(f"FAILED {image_id}: {msg}", file=sys.stderr)
    return {"requested": len(pairs), "ok": ok, "failed": failed}


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Download Open Images from the public S3 bucket."
    )
    parser.add_argument(
        "image_list",
        help="file of '<split>/<image_id>' lines (see datasets.labels idlist)",
    )
    parser.add_argument("--download_folder", default="images")
    parser.add_argument("--num_processes", type=int, default=5)
    args = parser.parse_args(argv)
    counters = download_all_images(
        args.image_list, args.download_folder, args.num_processes
    )
    print(counters)


if __name__ == "__main__":
    main()
