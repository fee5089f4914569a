"""Minimal dependency-free .xlsx reader/writer (stdlib zipfile + XML).

The reference's metadata surface is xlsx (slides_data_<id>.xlsx,
Grid_data.xlsx, run_data.xlsx — SURVEY §5.6) but this environment ships
pandas without openpyxl. xlsx is a zip of XML; flat single-sheet tables are
all the reference ever uses, so this implements exactly that: one worksheet,
header row, str/float/int/bool cells. Reader handles shared strings and
inline strings (covers files written by openpyxl, pandas, and this module).
"""

from __future__ import annotations

import re
import zipfile
from typing import Dict, List
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _col_to_idx(ref: str) -> int:
    m = re.match(r"([A-Z]+)", ref)
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def read_xlsx(path: str) -> pd.DataFrame:
    with zipfile.ZipFile(path) as z:
        shared: List[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(
                    "{%s}t" % _NS["m"])))
        sheet_name = next(
            n for n in z.namelist()
            if n.startswith("xl/worksheets/sheet") and n.endswith(".xml")
        )
        root = ET.fromstring(z.read(sheet_name))
        rows: Dict[int, Dict[int, object]] = {}
        max_col = -1
        for row in root.iter("{%s}row" % _NS["m"]):
            r = int(row.get("r")) - 1
            for c in row.findall("m:c", _NS):
                ref = c.get("r")
                col = _col_to_idx(ref)
                max_col = max(max_col, col)
                t = c.get("t", "n")
                v = c.find("m:v", _NS)
                is_node = c.find("m:is", _NS)
                if t == "s" and v is not None:
                    val = shared[int(v.text)]
                elif t == "inlineStr" and is_node is not None:
                    val = "".join(
                        tt.text or "" for tt in is_node.iter("{%s}t" % _NS["m"])
                    )
                elif t == "b" and v is not None:
                    val = bool(int(v.text))
                elif v is not None and v.text is not None:
                    f = float(v.text)
                    val = int(f) if f.is_integer() else f
                else:
                    val = None
                rows.setdefault(r, {})[col] = val

    if not rows:
        return pd.DataFrame()
    header_row = min(rows)
    header = [rows[header_row].get(c) for c in range(max_col + 1)]
    data = []
    for r in sorted(rows):
        if r == header_row:
            continue
        data.append([rows[r].get(c) for c in range(max_col + 1)])
    return pd.DataFrame(data, columns=header)


def _cell_xml(ref: str, value) -> str:
    if value is None or (isinstance(value, float) and np.isnan(value)):
        return ""
    if isinstance(value, (bool, np.bool_)):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float, np.integer, np.floating)):
        return f'<c r="{ref}"><v>{value}</v></c>'
    s = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t>{s}</t></is></c>'


def _idx_to_col(idx: int) -> str:
    col = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        col = chr(65 + rem) + col
    return col


_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WORKBOOK = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)
_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def write_xlsx(path: str, df: pd.DataFrame):
    parts = ['<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
             "<sheetData>"]
    header_cells = "".join(
        _cell_xml(f"{_idx_to_col(c)}1", col) for c, col in enumerate(df.columns)
    )
    parts.append(f'<row r="1">{header_cells}</row>')
    for r, (_, row) in enumerate(df.iterrows(), start=2):
        cells = "".join(
            _cell_xml(f"{_idx_to_col(c)}{r}", v) for c, v in enumerate(row)
        )
        parts.append(f'<row r="{r}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    sheet_xml = "".join(parts)

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def read_table(path: str) -> pd.DataFrame:
    """pd.read_excel replacement that works without openpyxl."""
    try:
        return pd.read_excel(path)
    except ImportError:
        return read_xlsx(path)
