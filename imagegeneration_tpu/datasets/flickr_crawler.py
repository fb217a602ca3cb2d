"""Flickr crawler — interestingness-ranked tag search with filtering.

Counterpart of dataset_creator/download_scripts/flickrCurl.py (SURVEY.md §2
#24): walks `flickr.photos.search` (tag_mode=all, sorted by
interestingness-desc), filters candidates by

- size/aspect: in force_landscape mode, width must equal the requested size
  class's long edge and height must exceed width*9/16 (the reference's
  landscape rule, flickrCurl.py:129),
- tag blacklist (CSV of banned tags, :133-139),
- id de-duplication (:143-146),

then downloads accepted photos with 4 writer threads draining a queue
(:155-166), optionally dumping per-photo tag lists as JSON.

Implementation differences: the flickr_api package is not available (and the
environment has no egress), so the REST API is called directly via urllib
(`rest_call`), the API key comes from --api-key / FLICKR_API_KEY (the
reference hardcodes one), and all selection logic (`photo_passes_filters`) is
pure and unit-testable offline.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import queue
import threading
import urllib.parse
import urllib.request
from pathlib import Path
from typing import Iterator

REST_URL = "https://api.flickr.com/services/rest/"

# Long-edge pixel size per Flickr size class (flickrCurl.py:16).
SIZES = {
    "Square": 75, "Thumbnail": 100, "Small": 240, "Medium": 500,
    "Medium 640": 640, "Large": 1024, "Original": 0,
}
# Flickr URL extras key per size class.
_SIZE_URL_KEY = {
    "Square": "url_sq", "Thumbnail": "url_t", "Small": "url_s",
    "Medium": "url_m", "Medium 640": "url_z", "Large": "url_l",
    "Original": "url_o",
}


def load_tag_blacklist(csv_path: str | Path | None) -> set[str]:
    """One CSV row of banned tags (tagsBlack.csv format)."""
    if not csv_path:
        return set()
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    return {t.strip() for row in rows for t in row if t.strip()}


def photo_passes_filters(
    photo: dict,
    size: str,
    blacklist: set[str],
    seen_ids: set[str],
    force_landscape: bool = True,
) -> tuple[bool, str]:
    """Pure filter chain over one API photo record; returns (ok, reason)."""
    key = _SIZE_URL_KEY[size]
    if key not in photo:
        return False, "size unavailable"
    w = int(photo.get(f"width_{key[4:]}", photo.get("width", 0) or 0))
    h = int(photo.get(f"height_{key[4:]}", photo.get("height", 0) or 0))
    if force_landscape:
        long_edge = SIZES[size]
        # reference rule (flickrCurl.py:129): width must be the size class's
        # long edge and height must exceed 9/16 of it
        if w != long_edge or h <= long_edge / 16 * 9:
            return False, "photo has the wrong size"
    tags = set((photo.get("tags") or "").split())
    if blacklist & tags:
        return False, "photo is on the blacklist"
    if photo["id"] in seen_ids:
        return False, "photo already written"
    return True, ""


def rest_call(method: str, api_key: str, **params) -> dict:  # pragma: no cover
    """Minimal Flickr REST call (network; unused in offline tests)."""
    q = {
        "method": method,
        "api_key": api_key,
        "format": "json",
        "nojsoncallback": "1",
        **params,
    }
    url = REST_URL + "?" + urllib.parse.urlencode(q)
    with urllib.request.urlopen(url, timeout=60) as r:
        out = json.loads(r.read())
    if out.get("stat") != "ok":
        raise RuntimeError(f"flickr API error: {out}")
    return out


def walk_search(
    api_key: str, tags: str, per_page: int = 100
) -> Iterator[dict]:  # pragma: no cover
    """Page through photos.search sorted by interestingness-desc."""
    page = 1
    while True:
        out = rest_call(
            "flickr.photos.search",
            api_key,
            tags=tags,
            tag_mode="all",
            sort="interestingness-desc",
            per_page=str(per_page),
            page=str(page),
            extras="tags," + ",".join(_SIZE_URL_KEY.values()),
        )
        photos = out["photos"]["photo"]
        if not photos:
            return
        yield from photos
        if page >= int(out["photos"]["pages"]):
            return
        page += 1


def call_api(
    num_of_photos: int,
    tag_whitelist: str,
    tag_blacklist: str | Path | None = None,
    output_dir: str = "output",
    size: str = "Large",
    create_tag_list: bool = False,
    force_landscape: bool = True,
    api_key: str | None = None,
    num_writers: int = 4,
) -> int:  # pragma: no cover - network
    """Crawl + download loop (reference call_api, flickrCurl.py:46-173)."""
    api_key = api_key or os.environ.get("FLICKR_API_KEY")
    if not api_key:
        raise RuntimeError("FLICKR_API_KEY (or --api-key) required")
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    blacklist = load_tag_blacklist(tag_blacklist)
    seen: set[str] = set()
    q_photos: queue.Queue = queue.Queue()
    accepted = 0

    def writer() -> None:
        while True:
            photo = q_photos.get()
            try:
                url = photo[_SIZE_URL_KEY[size]]
                dest = out / f"{photo['id']}.jpg"
                with urllib.request.urlopen(url, timeout=60) as r:
                    dest.write_bytes(r.read())
                if create_tag_list:
                    (out / f"{photo['id']}.json").write_text(
                        json.dumps((photo.get("tags") or "").split())
                    )
            finally:
                q_photos.task_done()

    for _ in range(num_writers):
        threading.Thread(target=writer, daemon=True).start()

    for photo in walk_search(api_key, tag_whitelist):
        if accepted >= num_of_photos:
            break
        ok, _reason = photo_passes_filters(
            photo, size, blacklist, seen, force_landscape
        )
        if not ok:
            continue
        seen.add(photo["id"])
        q_photos.put(photo)
        accepted += 1
        print(f"\raccepted {accepted}/{num_of_photos}", end="", flush=True)
    q_photos.join()
    print("\nFinished")
    return accepted


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Crawl Flickr for photos by tag")
    parser.add_argument("numOfPhotos", type=int)
    parser.add_argument("tags", help="comma-separated whitelist (tag_mode=all)")
    parser.add_argument("-b", "--blacklist", default=None, help="CSV of banned tags")
    parser.add_argument("-o", "--output", default="output")
    parser.add_argument("-s", "--size", default="Large", choices=sorted(SIZES))
    parser.add_argument("--tag-list", action="store_true", default=False)
    parser.add_argument("--no-force-landscape", action="store_true", default=False)
    parser.add_argument("--api-key", default=None)
    args = parser.parse_args(argv)
    call_api(
        args.numOfPhotos,
        args.tags,
        args.blacklist,
        args.output,
        args.size,
        args.tag_list,
        not args.no_force_landscape,
        args.api_key,
    )


if __name__ == "__main__":
    main()
