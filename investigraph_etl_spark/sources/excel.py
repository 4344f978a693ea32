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

Typing: every cell surfaces as a STRING (numbers keep their lexical form,
shared/inline strings resolve, booleans → "0"/"1" raw). Excel's typed view of
a cell is a render-time style concern (dates are floats + a style id);
downstream casts are explicit column mappings — the engine never guesses.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_CELL_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 …"""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in z.namelist():
        return []
    root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    return [
        "".join(t.text or "" for t in si.iter(f"{_NS}t"))
        for si in root.findall(f"{_NS}si")
    ]


def _sheet_rows(z: zipfile.ZipFile, sheet: str, shared: list[str]) -> Iterator[list]:
    """Yield rows (lists of cell strings, gaps None-filled) of one worksheet."""
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
            else:
                val = v.text if v is not None else None
            out.append(val)
        yield out


def parse_xlsx(
    content: bytes, skiprows: int = 0, sheet_index: int = 0, header: bool = True
) -> pd.DataFrame:
    """One workbook → pandas DataFrame of strings (first sheet by default)."""
    z = zipfile.ZipFile(io.BytesIO(content))
    shared = _shared_strings(z)
    sheets = sorted(
        n for n in z.namelist() if re.match(r"xl/worksheets/sheet\d+\.xml$", n)
    )
    rows = list(_sheet_rows(z, sheets[sheet_index], shared))[skiprows:]
    if not rows:
        return pd.DataFrame()
    if header:
        cols, data = rows[0], rows[1:]
        cols = [c if c is not None else f"col_{i}" for i, c in enumerate(cols)]
    else:
        width = max(len(r) for r in rows)
        cols, data = [f"col_{i}" for i in range(width)], rows
    width = len(cols)
    data = [r[:width] + [None] * (width - len(r)) for r in data]
    return pd.DataFrame(data, columns=cols, dtype=object)


def read_excel_df(
    spark: SparkSession,
    path: str,
    skiprows: int = 0,
    sheet_index: int = 0,
) -> DataFrame:
    """xlsx path/glob → DataFrame (all columns string).

    The header (column set) is read once driver-side from the first file;
    payload decode runs per file inside mapInPandas. Files whose headers
    disagree with the first file's surface nulls for missing columns.
    """
    import glob as globmod

    paths = sorted(globmod.glob(path)) or [path]
    with open(paths[0], "rb") as f:
        head = parse_xlsx(f.read(), skiprows=skiprows, sheet_index=sheet_index)
    columns = list(head.columns)
    schema = T.StructType([T.StructField(c, T.StringType(), True) for c in columns])

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                df = parse_xlsx(bytes(content), skiprows=skiprows, sheet_index=sheet_index)
                yield df.reindex(columns=columns)

    binary = spark.read.format("binaryFile").load(path).select("content")
    return binary.mapInPandas(decode, schema=schema)
