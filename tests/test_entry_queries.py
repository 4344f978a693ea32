"""Drive the __spark_entry__ contract exactly as the driver does: every
``queries()`` entry runs at sf0.001 and matches its ``oracle_sql()`` twin in
DuckDB on row count, column names, sorted values, AND Arrow-level column
types (the driver's value hash is type-sensitive: a DuckDB HUGEINT column
hashes differently from Spark BIGINT even when Python values compare equal)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from __spark_entry__ import entry, oracle_sql, queries  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_smoke(spark):
    df = entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"conv_id", "turn_idx", "value", "props", "ts"}


def test_every_query_has_oracle():
    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    # current surface: everything is oracled
    assert set(o) == set(q)


def _canon_type(t) -> str:
    """Normalize an Arrow type the way the driver's hash effectively does:
    integer widths <=64 hash identically (pandas upcast), timestamps lose tz,
    but int128/HUGEINT (decimal128(38,0)) does NOT collapse to int."""
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    return str(t)


def _row_key(row):
    """None-safe total order (rollup super-aggregate rows carry nulls)."""
    return tuple((v is None, str(v)) for v in row)


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_matches_oracle(spark, duck, name):
    sdf = queries()[name](spark, SF_DIR)
    got = sorted((tuple(r) for r in sdf.collect()), key=_row_key)
    res = duck.sql(oracle_sql()[name])
    want = sorted((tuple(r) for r in res.fetchall()), key=_row_key)
    assert [c.lower() for c in sdf.columns] == [c.lower() for c in res.columns]
    stypes = {f.name.lower(): _canon_type(f.type) for f in sdf.toArrow().schema}
    otypes = {f.name.lower(): _canon_type(f.type) for f in res.arrow().schema}
    assert stypes == otypes
    assert len(got) == len(want)
    assert got == want


def test_sf01_parity_gate_covers_full_registry():
    """VERDICT r4 missing #2: the sf0.1 parity artifact must never silently
    lag queries() — every registry entry needs an OK/SKIP row in
    PARITY_sf0.1.md (regenerate with
    `SPARK_GRAFT_DRIVER_MEM=48g python scripts/check_entry.py /root/testdata/sf0.1`)."""
    import os
    import re

    from __spark_entry__ import queries

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "PARITY_sf0.1.md")
    text = open(path).read()
    gate = set(re.findall(r"^([a-z0-9_]+)\s+(?:OK|SKIP)", text, re.M))
    missing = sorted(set(queries()) - gate)
    assert not missing, f"sf0.1 parity gate lags the registry: {missing}"
