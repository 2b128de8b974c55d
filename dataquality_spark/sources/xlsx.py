"""XLSX source/sink (SURVEY §2.1 S-2) — stdlib-only, no openpyxl.

Reference parity: ``read_data`` reads the first sheet of an ``.xlsx`` with
``pd.read_excel`` defaults (header row 0, inferred types, blank cell → null)
(`/root/reference/utils/core_operations.py:65-66`), and the run log is an
append-by-rewrite XLSX (`/root/reference/utils/core_operations.py:107-131`).

Scale posture: XLSX is a driver-side format by construction (config sheets,
reference datasets, run logs — never the 100-TB fact table). The reader
parses the zip+XML on the driver and hands Spark a ``createDataFrame``
result; anything large belongs in Parquet/Iceberg via the catalog. The
container has no openpyxl, so this is a minimal OOXML SpreadsheetML
implementation: zipfile + ElementTree, shared-string + inline-string cells,
per-column int→float→string inference mirroring pandas defaults.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_MAIN_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_REL_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKG_REL_NS = "http://schemas.openxmlformats.org/package/2006/relationships"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(cell_ref: str) -> int:
    """'C5' -> 2 (zero-based column)."""
    n = 0
    for ch in cell_ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _cell_text(cell: ET.Element) -> str:
    """Concatenated text of <v> or <is> (inline string, incl. rich runs)."""
    parts = []
    for el in cell.iter():
        if _local(el.tag) in ("v", "t") and el.text:
            parts.append(el.text)
    return "".join(parts)


def _first_sheet_path(zf: zipfile.ZipFile) -> str:
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = [el for el in wb.iter() if _local(el.tag) == "sheet"]
    rid = sheets[0].get(f"{{{_REL_NS}}}id")
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels.iter():
        if _local(rel.tag) == "Relationship" and rel.get("Id") == rid:
            target = rel.get("Target")
            # OOXML rel targets come in three shapes (all seen in the wild):
            # package-absolute "/xl/worksheets/...", part-relative
            # "worksheets/...", and already-prefixed "xl/worksheets/..."
            if target.startswith("/"):
                return target[1:]
            return target if target.startswith("xl/") else f"xl/{target}"
    return "xl/worksheets/sheet1.xml"  # conventional fallback


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    out = []
    for si in root:
        out.append("".join(t.text or "" for t in si.iter()
                           if _local(t.tag) == "t"))
    return out


def read_xlsx_pdf(path: str) -> pd.DataFrame:
    """First sheet -> pandas DataFrame, pd.read_excel-default semantics:
    row 0 is the header, blank cells are NaN/None, each column inferred
    int64 -> float64 -> object exactly as pandas coercion would."""
    with zipfile.ZipFile(path) as zf:
        strings = _shared_strings(zf)
        sheet = ET.fromstring(zf.read(_first_sheet_path(zf)))
    rows: list[dict[int, object]] = []
    for row_el in (el for el in sheet.iter() if _local(el.tag) == "row"):
        row: dict[int, object] = {}
        for i, cell in enumerate(c for c in row_el if _local(c.tag) == "c"):
            ref = cell.get("r")
            ci = _col_index(ref) if ref else i
            t = cell.get("t", "n")
            raw = _cell_text(cell)
            if raw == "":
                continue
            if t == "s":
                row[ci] = strings[int(raw)]
            elif t == "b":
                row[ci] = bool(int(raw))
            elif t in ("inlineStr", "str", "e", "d"):
                # "e" = formula-error cells (#DIV/0! …), "d" = ISO dates —
                # both carry non-numeric text; float() on them crashed the
                # whole read where pd.read_excel keeps the string
                row[ci] = raw
            else:  # numeric
                row[ci] = float(raw)
        rows.append(row)
    if not rows:
        return pd.DataFrame()
    width = max(max(r, default=-1) for r in rows) + 1
    header = [str(rows[0].get(i, f"Unnamed: {i}")) for i in range(width)]
    data = [[r.get(i) for i in range(width)] for r in rows[1:]]
    df = pd.DataFrame(data, columns=header)
    for col in df.columns:  # pandas-style narrowing: all-int floats -> int64
        s = df[col]
        if s.map(lambda v: isinstance(v, float)).all() and len(s):
            # narrow only inside the float-exact integer range (|v| < 2^53);
            # beyond it the cast is lossy and int64 can overflow
            if (s % 1 == 0).all() and (s.abs() < float(1 << 53)).all():
                df[col] = s.astype("int64")
    return df


def read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """S-2 scan: first sheet of an .xlsx as a Spark DataFrame.

    Driver-side parse by design — see module docstring; the reference's
    XLSX inputs are small dimension/config tables, which then participate
    in broadcast joins (S-4)."""
    pdf = read_xlsx_pdf(path)
    # Spark can't infer all-null object columns; stringify those.
    for col in pdf.columns:
        if pdf[col].isna().all():
            pdf[col] = pdf[col].astype("string")
    return spark.createDataFrame(pdf)


_INVALID_SHEETNAME = re.compile(r"[][*?/\\:]")
# XML 1.0 forbids these code points even escaped; Excel itself refuses such
# files. Web text can legitimately contain them — strip on write (the same
# policy openpyxl applies).
_XML_INVALID = re.compile(
    "[\x00-\x08\x0b\x0c\x0e-\x1f\ud800-\udfff￾￿]")

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
    'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_PKG_REL_NS}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<Relationships xmlns="{_PKG_REL_NS}">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_MAIN_NS}" xmlns:r="{_REL_NS}">'
        f'<sheets><sheet name="{escape(sheet_name, {chr(34): "&quot;"})}"'
        ' sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )


def _cell_xml(value: object) -> str:
    if value is None or (isinstance(value, float) and value != value):
        return "<c/>"
    if isinstance(value, bool):
        return f'<c t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f"<c><v>{value}</v></c>"
    # XML line-end normalization folds raw \r (and \r\n) to \n on parse;
    # the character reference survives it, so CRs round-trip
    body = escape(_XML_INVALID.sub("", str(value))).replace("\r", "&#13;")
    return f'<c t="inlineStr"><is><t xml:space="preserve">{body}</t></is></c>'


def write_xlsx(pdf: pd.DataFrame, path: str, sheet_name: str = "Sheet1") -> None:
    """Minimal SpreadsheetML writer (inline strings, one sheet) — used by
    the run-log XLSX export and the reader round-trip tests. Matches the
    reference log's write-whole-file-per-append behavior
    (`/root/reference/utils/core_operations.py:128-131`)."""
    sheet_name = _INVALID_SHEETNAME.sub("_", sheet_name)[:31] or "Sheet1"
    rows_xml = []
    header = "".join(_cell_xml(c) for c in pdf.columns)
    rows_xml.append(f"<row>{header}</row>")
    for rec in pdf.itertuples(index=False):
        rows_xml.append("<row>" + "".join(_cell_xml(v) for v in rec) + "</row>")
    sheet_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_MAIN_NS}"><sheetData>'
        + "".join(rows_xml) + "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
