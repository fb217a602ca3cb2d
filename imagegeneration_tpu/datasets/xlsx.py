"""Minimal stdlib .xlsx writer (no xlsxwriter/openpyxl in this image).

Counterpart of the reference annotation tool's xlsx export
(dataset_creator/preprocess_scripts/pyqt_image_annotation_tool/main.py:624-638,
which feeds csv rows through xlsxwriter's `worksheet.write`). An .xlsx file
is a zip of OOXML parts; this module emits the five mandatory parts with
inline-string / numeric cells — enough for Excel, LibreOffice, and pandas
to open the label sheet. Numbers are written as numeric cells (mirroring
xlsxwriter's `write` type dispatch), everything else as inline strings.
"""

from __future__ import annotations

import csv
import zipfile
from pathlib import Path
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_ref(idx: int) -> str:
    """0-based column index -> A1-style column letters (0 -> A, 26 -> AA)."""
    ref = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        ref = chr(ord("A") + rem) + ref
    return ref


def _is_number(value) -> bool:
    if isinstance(value, bool):
        return False
    if isinstance(value, (int, float)):
        return True
    if isinstance(value, str):
        try:
            float(value)
        except ValueError:
            return False
        return value.strip() != ""
    return False


def _cell_xml(row: int, col: int, value) -> str:
    ref = f"{_col_ref(col)}{row + 1}"
    if _is_number(value):
        return f'<c r="{ref}"><v>{float(value):g}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t>{text}</t></is></c>'


def write_xlsx(path: str | Path, rows: list[list]) -> None:
    """Write `rows` (list of cell lists) as Sheet1 of a new .xlsx file."""
    body = "".join(
        f'<row r="{r + 1}">'
        + "".join(_cell_xml(r, c, v) for c, v in enumerate(row))
        + "</row>"
        for r, row in enumerate(rows)
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main">'
        f"<sheetData>{body}</sheetData></worksheet>"
    )
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def csv_to_xlsx(csv_file_path: str | Path) -> Path:
    """Convert a csv file to `<same name>.xlsx` next to it — the reference
    tool's export path (main.py:624-638: re-reads the csv it just wrote and
    writes each cell)."""
    csv_file_path = Path(csv_file_path)
    with open(csv_file_path, newline="", encoding="utf8") as f:
        rows = list(csv.reader(f))
    out = csv_file_path.with_suffix(".xlsx")
    write_xlsx(out, rows)
    return out
