"""Drive the __spark_entry__ contract exactly as the driver does: every
``queries()`` entry runs at sf0.001 and matches its ``oracle_sql()`` twin in
DuckDB on row count, column names, and sorted values."""

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


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_matches_oracle(spark, duck, name):
    sdf = queries()[name](spark, SF_DIR)
    got = sorted(tuple(r) for r in sdf.collect())
    res = duck.sql(oracle_sql()[name])
    want = sorted(tuple(r) for r in res.fetchall())
    assert [c.lower() for c in sdf.columns] == [c.lower() for c in res.columns]
    assert len(got) == len(want)
    assert got == want
