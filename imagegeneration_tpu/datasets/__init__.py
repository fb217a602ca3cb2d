"""Dataset construction toolchain.

Counterparts of the reference's dataset_creator/ scripts (SURVEY.md §2
#23-#30): downloaders (Open Images S3, Flickr crawler), the id-list
generator, label-QA scripts (validity check, stats, usable-image sorting),
the 1000-image partitioner and an annotation tool (headless CLI, optional
PyQt GUI). Unlike the reference scripts — which hardcode paths as module
globals — everything here is importable functions + argparse CLIs.
"""

from imagegeneration_tpu.datasets.labels import (
    LABEL_COLUMNS,
    is_image_usable,
    is_row_valid,
    label_stats,
)

__all__ = ["LABEL_COLUMNS", "is_row_valid", "is_image_usable", "label_stats"]
