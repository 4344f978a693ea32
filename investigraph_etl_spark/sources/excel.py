"""Excel (xlsx) extract — self-contained stdlib parser, Spark-parallel per file.

Reference parity: mimetype-dispatched ``read_excel``
(/root/reference/investigraph/logic/extract.py:14-15,29; golden count 12,482
rows at /root/reference/tests/test_extract.py:38). The container has no
openpyxl, so this module parses the OOXML container directly — an .xlsx file
is a zip of XML (sharedStrings.xml + worksheets/sheetN.xml) — with only
``zipfile``/``xml.etree``.

Spark-first shape: files load through ``spark.read.format("binaryFile")`` and
decode inside ``mapInPandas`` — one Arrow-batched task per file, so a landing
dir of many workbooks parses partition-parallel with zero driver involvement.
(A single workbook is inherently one task: the zip container is not
splittable — the same is true under openpyxl/pandas anywhere.)

Sheet addressing follows the workbook, not the zip: tab order and names come
from ``xl/workbook.xml`` + its rels (internal part numbering need not match —
``sheet10.xml`` sorts before ``sheet2.xml`` lexicographically, and parts can
be renumbered arbitrarily). Sheets select by index into that order or by name.

Typing: by default every cell surfaces as a STRING (numbers keep their
lexical form, shared/inline strings resolve, booleans → "0"/"1" raw) — the
predictable extract face. ``typed=True`` mirrors pandas ``read_excel``:
numbers → int/float, booleans → bool, and numeric cells whose style resolves
to a date/time number format (built-in ids 14-22/27-36/45-47/50-58 or a
custom format whose code carries y/m/d/h/s tokens) → datetime via the Excel
serial epoch (1899-12-30, or 1904-01-01 under ``workbookPr date1904``).
"""

from __future__ import annotations

import io
import re
import zipfile
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NSR = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_CELL_RE = re.compile(r"([A-Z]+)(\d+)")

#: Built-in number-format ids Excel renders as dates/times (ECMA-376 §18.8.30).
_BUILTIN_DATE_IDS = (
    set(range(14, 23)) | set(range(27, 37)) | set(range(45, 48)) | set(range(50, 59))
)


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 …"""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    from xml.etree import ElementTree as ET

    if "xl/sharedStrings.xml" not in z.namelist():
        return []
    root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    return [
        "".join(t.text or "" for t in si.iter(f"{_NS}t"))
        for si in root.findall(f"{_NS}si")
    ]


def _workbook_sheets(z: zipfile.ZipFile) -> tuple[list[tuple[str | None, str]], bool]:
    """Sheets in TAB order as ``(name, part_path)`` plus the date1904 flag.

    Resolved from ``xl/workbook.xml`` (order + names) joined to the workbook
    rels (r:id → part); falls back to numerically-sorted part names for
    minimal containers that omit workbook.xml.
    """
    from xml.etree import ElementTree as ET

    names = set(z.namelist())
    try:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = {r.get("Id"): r.get("Target") or "" for r in rels}
        pr = wb.find(f"{_NS}workbookPr")
        date1904 = pr is not None and (pr.get("date1904") or "").lower() in ("1", "true")
        out: list[tuple[str | None, str]] = []
        sheets = wb.find(f"{_NS}sheets")
        for s in sheets if sheets is not None else []:
            t = target.get(s.get(f"{_NSR}id"), "")
            part = t if t.startswith("xl/") else "xl/" + t.lstrip("/")
            if part in names:
                out.append((s.get("name"), part))
        if out:
            return out, date1904
    except (KeyError, ET.ParseError):
        pass
    parts = sorted(
        (n for n in names if re.match(r"xl/worksheets/sheet\d+\.xml$", n)),
        key=lambda n: int(re.search(r"sheet(\d+)", n).group(1)),
    )
    return [(None, p) for p in parts], False


def _is_date_code(code: str) -> bool:
    """Heuristic over a custom format code: date iff y/m/d/h/s tokens remain
    after stripping quoted literals, [] sections, and escapes (openpyxl uses
    the same shape)."""
    code = re.sub(r'"[^"]*"', "", code)
    code = re.sub(r"\[[^\]]*\]", "", code)
    code = code.replace("\\", "")
    return bool(re.search(r"[ymdhs]", code, re.I))


def _date_styles(z: zipfile.ZipFile) -> list[bool]:
    """Per cellXfs index: does this style render the number as a date/time?"""
    from xml.etree import ElementTree as ET

    if "xl/styles.xml" not in z.namelist():
        return []
    root = ET.fromstring(z.read("xl/styles.xml"))
    custom = {}
    nf = root.find(f"{_NS}numFmts")
    for f in nf if nf is not None else []:
        custom[int(f.get("numFmtId"))] = f.get("formatCode") or ""
    xfs = root.find(f"{_NS}cellXfs")
    flags = []
    for xf in xfs if xfs is not None else []:
        fid = int(xf.get("numFmtId") or 0)
        flags.append(
            fid in _BUILTIN_DATE_IDS or (fid in custom and _is_date_code(custom[fid]))
        )
    return flags


def _serial_to_datetime(serial: float, date1904: bool) -> datetime:
    epoch = datetime(1904, 1, 1) if date1904 else datetime(1899, 12, 30)
    dt = epoch + timedelta(days=serial)
    # Serials are binary floats; round sub-ms jitter away (openpyxl does too).
    # Round via a timedelta so carry past a second boundary propagates —
    # .replace() raised ValueError for microseconds in [999500, 999999].
    us = dt.microsecond
    return dt + timedelta(microseconds=((us + 500) // 1000) * 1000 - us)


def _typed_number(raw: str) -> int | float:
    return int(raw) if re.fullmatch(r"-?\d+", raw) else float(raw)


def _sheet_rows(
    z: zipfile.ZipFile,
    sheet: str,
    shared: list[str],
    typed: bool = False,
    date_styles: list[bool] = (),
    date1904: bool = False,
) -> Iterator[list]:
    """Yield rows (lists of cell values, gaps None-filled) of one worksheet."""
    from xml.etree import ElementTree as ET

    root = ET.fromstring(z.read(sheet))
    for row in root.iterfind(f"{_NS}sheetData/{_NS}row"):
        out: list = []
        for c in row.iterfind(f"{_NS}c"):
            ref = c.get("r") or ""
            m = _CELL_RE.match(ref)
            idx = _col_index(m.group(1)) if m else len(out)
            while len(out) < idx:
                out.append(None)
            ctype = c.get("t", "n")
            v = c.find(f"{_NS}v")
            if ctype == "s" and v is not None and v.text is not None:
                val = shared[int(v.text)]
            elif ctype == "inlineStr":
                val = "".join(t.text or "" for t in c.iter(f"{_NS}t"))
            elif not typed:
                val = v.text if v is not None else None
            elif v is None or v.text is None:
                val = None
            elif ctype == "b":
                val = v.text == "1"
            elif ctype == "n":
                s_idx = int(c.get("s") or 0)
                if s_idx < len(date_styles) and date_styles[s_idx]:
                    val = _serial_to_datetime(float(v.text), date1904)
                else:
                    val = _typed_number(v.text)
            else:  # "str" (formula result), "e" (error): surface the text
                val = v.text
            out.append(val)
        yield out


def _resolve_sheet(
    sheets: list[tuple[str | None, str]], sheet_index: int, sheet_name: str | None
) -> str:
    if sheet_name is not None:
        for name, part in sheets:
            if name == sheet_name:
                return part
        raise KeyError(
            f"no sheet named {sheet_name!r}; have {[n for n, _ in sheets]}"
        )
    return sheets[sheet_index][1]


def parse_xlsx(
    content: bytes,
    skiprows: int = 0,
    sheet_index: int = 0,
    header: bool = True,
    sheet_name: str | None = None,
    typed: bool = False,
) -> pd.DataFrame:
    """One workbook → pandas DataFrame (first sheet in TAB order by default).

    ``typed=False`` (default): every cell a string. ``typed=True``: pandas
    ``read_excel``-like values — int/float/bool/datetime/str per cell, with
    style-aware date detection (see module docstring).
    """
    z = zipfile.ZipFile(io.BytesIO(content))
    shared = _shared_strings(z)
    sheets, date1904 = _workbook_sheets(z)
    part = _resolve_sheet(sheets, sheet_index, sheet_name)
    date_styles = _date_styles(z) if typed else []
    rows = list(
        _sheet_rows(z, part, shared, typed=typed, date_styles=date_styles,
                    date1904=date1904)
    )[skiprows:]
    if not rows:
        return pd.DataFrame()
    if header:
        cols, data = rows[0], rows[1:]
        cols = [f"col_{i}" if c is None else str(c) for i, c in enumerate(cols)]
    else:
        width = max(len(r) for r in rows)
        cols, data = [f"col_{i}" for i in range(width)], rows
    width = len(cols)
    data = [r[:width] + [None] * (width - len(r)) for r in data]
    return pd.DataFrame(data, columns=cols, dtype=object)


def _infer_field(name: str, values: pd.Series) -> T.StructField:
    """Spark type for one typed column, from the sample frame's values."""
    vals = [v for v in values if v is not None]
    if vals and all(isinstance(v, datetime) for v in vals):
        dt: T.DataType = T.TimestampType()
    elif vals and all(isinstance(v, bool) for v in vals):
        dt = T.BooleanType()
    elif vals and all(isinstance(v, int) and not isinstance(v, bool) for v in vals):
        dt = T.LongType()
    elif vals and all(
        isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals
    ):
        dt = T.DoubleType()
    else:
        dt = T.StringType()
    return T.StructField(name, dt, True)


def _coerce(pdf: pd.DataFrame, schema: T.StructType) -> pd.DataFrame:
    """Align one decoded frame to the inferred schema (Arrow-friendly dtypes)."""
    out = {}
    n = len(pdf)
    for f in schema.fields:
        s = pdf[f.name] if f.name in pdf.columns else pd.Series([None] * n, dtype=object)
        if isinstance(f.dataType, T.TimestampType):
            out[f.name] = pd.to_datetime(s, errors="coerce").astype("datetime64[us]")
        elif isinstance(f.dataType, T.LongType):
            out[f.name] = pd.to_numeric(s, errors="coerce").astype("Int64")
        elif isinstance(f.dataType, T.DoubleType):
            out[f.name] = pd.to_numeric(s, errors="coerce").astype("Float64")
        elif isinstance(f.dataType, T.BooleanType):
            out[f.name] = s.astype("boolean")
        else:
            out[f.name] = s.map(lambda v: v if v is None or isinstance(v, str) else str(v))
    return pd.DataFrame(out)


def read_excel_df(
    spark: SparkSession,
    path: str,
    skiprows: int = 0,
    sheet_index: int = 0,
    sheet_name: str | None = None,
    typed: bool = False,
) -> DataFrame:
    """xlsx path/glob → DataFrame (all-string by default; ``typed=True`` infers
    long/double/boolean/timestamp columns from the first file's values).

    The header/schema sample comes from the SAME binaryFile listing the
    payload decode reads (first file in Spark's own path order) — one resolve
    path for both, so globs and non-local filesystems behave identically.
    Payload decode runs per file inside mapInPandas; files whose headers
    disagree with the first file's surface nulls for missing columns.
    """
    listing = spark.read.format("binaryFile").load(path).select("path", "content")
    first = listing.orderBy("path").limit(1).collect()
    if not first:
        raise FileNotFoundError(f"no files match {path}")
    kw = dict(skiprows=skiprows, sheet_index=sheet_index, sheet_name=sheet_name)
    head = parse_xlsx(bytes(first[0]["content"]), typed=typed, **kw)
    if typed:
        schema = T.StructType([_infer_field(c, head[c]) for c in head.columns])
    else:
        schema = T.StructType(
            [T.StructField(c, T.StringType(), True) for c in head.columns]
        )
    columns = list(head.columns)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                df = parse_xlsx(bytes(content), typed=typed, **kw)
                yield _coerce(df, schema) if typed else df.reindex(columns=columns)

    return listing.select("content").mapInPandas(decode, schema=schema)
