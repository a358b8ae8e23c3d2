"""Minimal stdlib .xlsx reader/writer (zip + SpreadsheetML XML).

Fallback engine for S2/S6 (reference ``preprocess.py:17-19`` multi-sheet
read, ``mapper.py:123-136`` multi-sheet write) when openpyxl is not
installed. Implements exactly the subset the pipeline needs:

- writer: one worksheet per table, header row, inline strings, numeric /
  boolean cells, None → blank;
- reader: workbook sheet list (workbook.xml + rels), sharedStrings (so
  files produced by Excel/openpyxl load too), inline strings, numbers,
  booleans; first row is the header.

The OOXML structure follows the public ECMA-376 spec. Excel data is
bounded (~1M rows/sheet) so a driver-side implementation is fine — the
scale path is parquet, not xlsx.
"""

from __future__ import annotations

import numbers
import re
import xml.etree.ElementTree as ET
import zipfile
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_REL = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_NS_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _col_letter(idx: int) -> str:
    """0-based column index → A1-style letters."""
    s = ""
    idx += 1
    while idx:
        idx, r = divmod(idx - 1, 26)
        s = chr(ord("A") + r) + s
    return s


def _col_index(ref: str) -> int:
    """A1-style cell ref → 0-based column index."""
    letters = re.match(r"[A-Z]+", ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, numbers.Integral):
        return f'<c r="{ref}"><v>{int(value)}</v></c>'
    if isinstance(value, numbers.Real):
        f = float(value)
        if f != f:  # NaN → blank
            return ""
        return f'<c r="{ref}"><v>{repr(f)}</v></c>'
    if hasattr(value, "isoformat"):
        value = value.isoformat()
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def write_xlsx(path: str, sheets: dict[str, tuple[list[str], list[tuple]]]) -> None:
    """``sheets`` maps sheet name → (column names, rows). Caller is
    responsible for any sheet-name truncation policy."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides, wb_sheets, wb_rels = [], [], []
        for i, (name, (columns, rows)) in enumerate(sheets.items(), start=1):
            overrides.append(
                f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
                '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            )
            # attribute context: escape() alone leaves '"' unescaped,
            # which would corrupt workbook.xml for quote-bearing names
            wb_sheets.append(
                f'<sheet name="{escape(name, {chr(34): "&quot;"})}" '
                f'sheetId="{i}" r:id="rId{i}"/>'
            )
            wb_rels.append(
                f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
                f'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i}.xml"/>'
            )
            row_xml = []
            for r, row in enumerate([tuple(columns)] + [tuple(r) for r in rows], start=1):
                cells = "".join(
                    _cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
                )
                row_xml.append(f'<row r="{r}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                f"<sheetData>{''.join(row_xml)}</sheetData></worksheet>",
            )
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides="\n".join(overrides)))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{''.join(wb_sheets)}</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{''.join(wb_rels)}</Relationships>",
        )


def _parse_value(cell, shared):
    t = cell.get("t", "n")
    if t == "inlineStr":
        node = cell.find(f"{_NS}is/{_NS}t")
        return None if node is None else (node.text or "")
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    f = float(v.text)
    return int(f) if f.is_integer() and "e" not in v.text.lower() and "." not in v.text else f


def read_xlsx(path: str) -> dict[str, tuple[list[str], list[tuple]]]:
    """Returns sheet name → (header row, data rows); ragged rows are
    padded with None to the header width."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        target_of = {
            rel.get("Id"): rel.get("Target").lstrip("/")
            for rel in rels.findall(f"{_NS_PKG_REL}Relationship")
        }
        out: dict[str, tuple[list[str], list[tuple]]] = {}
        for sheet in wb.findall(f"{_NS}sheets/{_NS}sheet"):
            name = sheet.get("name")
            target = target_of[sheet.get(f"{_NS_REL}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target
            ws = ET.fromstring(zf.read(target))
            raw_rows: list[dict[int, object]] = []
            for row in ws.findall(f"{_NS}sheetData/{_NS}row"):
                cells = {}
                for pos, cell in enumerate(row.findall(f"{_NS}c")):
                    ref = cell.get("r")
                    cells[_col_index(ref) if ref else pos] = _parse_value(cell, shared)
                raw_rows.append(cells)
            if not raw_rows:
                out[name] = ([], [])
                continue
            width = max(max(r, default=-1) for r in raw_rows) + 1
            grid = [tuple(r.get(c) for c in range(width)) for r in raw_rows]
            header = [str(v) if v is not None else f"col{i}" for i, v in enumerate(grid[0])]
            out[name] = (header, grid[1:])
        return out
