"""Lenient date/timestamp parsing for messy tabular sources.

Reference parity: the reference runs every date-ish string through
``dateparser.parse`` (/root/reference/investigraph/model/source.py:25-27) —
tolerant, format-sniffing, row-at-a-time Python. The Spark-first equivalent
is a ``coalesce`` chain of ``try_to_timestamp``/``try_to_date`` over an
ordered format list: each candidate parse is a null-safe Catalyst expression
(whole-stage codegen, no Python), the first that matches wins, and anything
unparseable surfaces as NULL for quarantine instead of raising.

The default format inventory covers the shapes investigraph configs actually
meet (ISO, European day-first, compact, US slash). Order matters for
ambiguous strings — day-first precedes US month-first, matching dateparser's
European default in the reference deployments; deployments override by
passing their own list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (spark format, duckdb strptime format) pairs, tried in order.
DEFAULT_FORMATS: tuple[tuple[str, str], ...] = (
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("yyyy-MM-dd'T'HH:mm:ss", "%Y-%m-%dT%H:%M:%S"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("dd.MM.yyyy", "%d.%m.%Y"),
    ("dd/MM/yyyy", "%d/%m/%Y"),
    ("MM/dd/yyyy", "%m/%d/%Y"),
    ("yyyyMMdd", "%Y%m%d"),
)


def lenient_to_timestamp(
    col: Column, formats: tuple[tuple[str, str], ...] = DEFAULT_FORMATS
) -> Column:
    """First-match tolerant timestamp parse; NULL when nothing matches."""
    attempts = [F.try_to_timestamp(col, F.lit(fmt)) for fmt, _ in formats]
    return F.coalesce(*attempts)


def lenient_to_date(
    col: Column, formats: tuple[tuple[str, str], ...] = DEFAULT_FORMATS
) -> Column:
    return lenient_to_timestamp(col, formats).cast("date")


def lenient_to_date_sql(
    col: str, formats: tuple[tuple[str, str], ...] = DEFAULT_FORMATS
) -> str:
    """DuckDB twin (try_strptime chain) for the driver's oracle."""
    attempts = ", ".join(f"try_strptime({col}, '{d}')" for _, d in formats)
    return f"coalesce({attempts})::DATE"
