"""Driver-contract self-check: run every __spark_entry__.queries() entry and
diff against its oracle_sql() twin in DuckDB, at sf0.01 (the driver's
correctness scale). Exit non-zero on any mismatch.

Usage: PYTHONPATH=/root/repo python scripts/check_entry.py [sf_dir]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="check-entry", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")

    print("entry() smoke:", entry(spark).count(), "rows")

    fails = []
    q, o = queries(), oracle_sql()
    for name in sorted(q):
        t0 = time.time()
        sdf = q[name](spark, sf_dir)
        got = sorted(tuple(r) for r in sdf.collect())
        res = con.sql(o[name])
        want = sorted(tuple(r) for r in res.fetchall())
        cols_ok = [c.lower() for c in sdf.columns] == [c.lower() for c in res.columns]
        ok = got == want and cols_ok
        print(f"{name:28s} {'OK ' if ok else 'FAIL'} rows={len(got)}/{len(want)} "
              f"{time.time()-t0:5.1f}s")
        if not ok:
            fails.append(name)
    spark.stop()
    print("FAILS:", fails or "none")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
