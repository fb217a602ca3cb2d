"""Dataset-construction tooling tests: label QA rules, partitioner, crawler
filters, annotation session."""

import csv
import json

import pytest

from imagegeneration_tpu.datasets.annotation_tool import AnnotationSession
from imagegeneration_tpu.datasets.flickr_crawler import (
    load_tag_blacklist,
    photo_passes_filters,
)
from imagegeneration_tpu.datasets.labels import (
    check_label_validity,
    create_id_list,
    is_image_usable,
    is_row_valid,
    label_stats,
    partition_dataset,
    sort_usable_images,
)
from imagegeneration_tpu.datasets.open_images_downloader import (
    object_url,
    parse_image_list,
)


def _row(img="x.jpg", qg=0, qm=0, qb=0, lm=0, ld=0, dm=0, db=0, cm=0, cb=0, snow=0):
    return [img] + [str(v) for v in (qg, qm, qb, lm, ld, dm, db, cm, cb, snow)]


# ------------------------------------------------------------------ validity
def test_row_validity_rules():
    assert is_row_valid(_row(qg=1))
    assert is_row_valid(_row(qm=1, lm=1, dm=1, cm=1))
    assert not is_row_valid(_row())                 # no quality label
    assert not is_row_valid(_row(qg=1, qm=1))       # two quality labels
    assert not is_row_valid(_row(qg=1, lm=1, ld=1))  # two light labels


# ----------------------------------------------------------------- usability
def test_usability_rules():
    assert is_image_usable(_row(qg=1))
    assert is_image_usable(_row(qg=1, lm=1, dm=1))          # good + 2 medium
    assert is_image_usable(_row(qm=1, lm=1))                # medium + 1 medium
    assert not is_image_usable(_row(qb=1))                  # bad quality
    assert not is_image_usable(_row(qg=1, snow=1))          # snow is bad
    assert not is_image_usable(_row(qg=1, lm=1, dm=1, cm=1))  # 3 mediums
    assert not is_image_usable(_row(qm=1, lm=1, dm=1))      # medium + 2 medium


# --------------------------------------------------------------------- stats
def test_label_stats_buckets():
    rows = [
        _row("a", qg=1),                 # good_unique
        _row("b", qg=1, lm=1),           # good_one_med
        _row("c", qg=1, lm=1, dm=1),     # good_two_med
        _row("d", qm=1),                 # medium_unique
        _row("e", qm=1, cm=1),           # medium_one_med
        _row("f", qb=1),                 # bad, not usable
        _row("g", qm=1, lm=1, dm=1),     # medium + 2 med: counted nowhere
    ]
    stats = label_stats(rows)
    assert stats["sum_images"] == 7
    assert stats["quality_good"] == 3
    assert stats["quality_medium"] == 3
    assert stats["quality_bad"] == 1
    assert stats["good_unique"] == 1
    assert stats["good_one_med"] == 1
    assert stats["good_two_med"] == 1
    assert stats["medium_unique"] == 1
    assert stats["medium_one_med"] == 1
    assert stats["sum_usable"] == 5


def test_stats_match_reference_results_layout():
    """Key order/namespace must match the reference's stats.json."""
    stats = label_stats([])
    assert list(stats) == [
        "sum_images", "quality_good", "quality_medium", "quality_bad",
        "sum_usable", "good_unique", "good_one_med", "good_two_med",
        "medium_unique", "medium_one_med",
    ]


# ---------------------------------------------------------------- file utils
def test_sort_and_partition_and_validity(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [_row("a.jpg", qg=1), _row("b.jpg", qb=1), _row("c.jpg", qm=1)]
    for r in rows:
        (src / r[0]).write_bytes(b"fake")
    label_file = tmp_path / "labels.csv"
    with open(label_file, "w", newline="") as f:
        csv.writer(f).writerows(rows)

    out = tmp_path / "usable"
    assert sort_usable_images(label_file, src, out) == 2
    assert sorted(p.name for p in out.iterdir()) == ["a.jpg", "c.jpg"]
    assert check_label_validity(label_file) == []

    parts = tmp_path / "parts"
    parts.mkdir()
    assert partition_dataset(src, parts, chunk=2) == 2
    assert len(list((parts / "1").iterdir())) == 2
    assert len(list((parts / "2").iterdir())) == 1


def test_create_id_list(tmp_path):
    ids_json = tmp_path / "ids.json"
    ids_json.write_text(json.dumps({"ids": ["abc.jpg", "def.png"]}))
    out = tmp_path / "list.txt"
    assert create_id_list(ids_json, out) == 2
    assert out.read_text().splitlines() == ["train/abc", "train/def"]


# ------------------------------------------------------------- open images
def test_parse_image_list(tmp_path):
    p = tmp_path / "l.txt"
    p.write_text("train/abc123\nvalidation/def.jpg\n\n")
    pairs = parse_image_list(p)
    assert pairs == [("train", "abc123"), ("validation", "def")]
    assert object_url(*pairs[0]).endswith("/train/abc123.jpg")
    p.write_text("nosuchsplit/x\n")
    with pytest.raises(ValueError):
        parse_image_list(p)


# ------------------------------------------------------------------- flickr
def test_flickr_filters(tmp_path):
    blacklist_csv = tmp_path / "black.csv"
    blacklist_csv.write_text("city,people\n")
    blacklist = load_tag_blacklist(blacklist_csv)
    assert blacklist == {"city", "people"}

    seen: set = set()
    good = {
        "id": "1", "tags": "mountain lake",
        "url_l": "http://x/1.jpg", "width_l": 1024, "height_l": 768,
    }
    ok, _ = photo_passes_filters(good, "Large", blacklist, seen)
    assert ok
    seen.add("1")
    ok, reason = photo_passes_filters(good, "Large", blacklist, seen)
    assert not ok and "already" in reason
    portrait = dict(good, id="2", width_l=768, height_l=1024)
    ok, reason = photo_passes_filters(portrait, "Large", blacklist, set())
    assert not ok and "size" in reason
    tagged = dict(good, id="3", tags="mountain city")
    ok, reason = photo_passes_filters(tagged, "Large", blacklist, set())
    assert not ok and "blacklist" in reason
    flat = dict(good, id="4", height_l=500)  # height <= 1024*9/16=576
    ok, reason = photo_passes_filters(flat, "Large", blacklist, set())
    assert not ok and "size" in reason


# --------------------------------------------------------------- annotation
def test_annotation_session_csv_and_copy(tmp_path):
    src = tmp_path / "imgs"
    src.mkdir()
    for name in ("a.jpg", "b.png", "c.jpeg", "skip.txt"):
        (src / name).write_bytes(b"x")
    s = AnnotationSession(src, ["good", "bad"], mode="copy")
    assert len(s.images) == 3  # txt skipped
    s.toggle_label(0)  # a -> good
    s.next()
    s.toggle_label("bad")  # b -> bad
    s.toggle_label("bad")  # toggled off
    s.toggle_label(1)  # on again
    s.next()
    s.next()  # clamps at end
    assert s.index == 2

    out_csv = tmp_path / "labels.csv"
    s.write_csv(out_csv)
    rows = list(csv.reader(open(out_csv)))
    assert rows[0] == ["img", "good", "bad"]
    assert rows[1] == ["a.jpg", "1", "0"]
    assert rows[2] == ["b.png", "0", "1"]
    assert rows[3] == ["c.jpeg", "0", "0"]

    n = s.apply_copy_move(tmp_path / "sorted")
    assert n == 2
    assert (tmp_path / "sorted" / "good" / "a.jpg").exists()
    assert (tmp_path / "sorted" / "bad" / "b.png").exists()
