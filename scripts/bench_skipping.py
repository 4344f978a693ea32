"""Measure zone-map data skipping: pruned read vs full-scan+filter.

Builds a MOR table of N epochs whose event times advance epoch by epoch
(the natural shape of a CDC tail: each generation's files have a tight ts
range), then times a "recent window" query both ways:

- ``read().filter(ts >= cutoff)``  — scans every live file, filter applied
  at the parquet reader;
- ``read(where=[("ts", ">=", cutoff)])`` — zone maps prune whole files
  driver-side first, same filter applied after.

Both return identical rows (asserted). Prints one JSON line with timings,
file counts, and speedup. Usage::

    PYTHONPATH=/root/repo python scripts/bench_skipping.py [n_epochs] [events_per_epoch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from investigraph_etl_spark.cdc.apply import apply_events_batch  # noqa: E402
from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA  # noqa: E402
from investigraph_etl_spark.cdc.generator import (  # noqa: E402
    GeneratorConfig,
    generate_events,
)
from investigraph_etl_spark.lake.table import LakeTable  # noqa: E402
from investigraph_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    spark = get_spark(app_name="bench-skipping", master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})
    root = tempfile.mkdtemp(prefix="bench-skip-") + "/t"
    try:
        t = LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=8,
                             mode="mor")
        t.compact_threshold = 10**9  # keep one generation per epoch
        base = pd.Timestamp("2025-01-01")
        for e in range(n_epochs):
            ev = generate_events(GeneratorConfig(
                n_events=per_epoch, n_convs=per_epoch // 20, seed=100 + e,
                n_epochs=1))
            ev = ev.drop(columns=["epoch"])
            # advance the tail's clock: the generator spans ~2 days per
            # epoch, so step epochs 3 days apart → disjoint ts windows
            ev["ts"] = base + pd.to_timedelta(e * 3, unit="D") + (
                ev["ts"] - ev["ts"].min())
            ev["ts"] = ev["ts"].astype("datetime64[us]")
            apply_events_batch(t, spark.createDataFrame(ev), app_id="skip",
                               epoch_id=e)
        cutoff = (base + pd.to_timedelta((n_epochs - 2) * 3, unit="D")).to_pydatetime()
        pred = [("ts", ">=", cutoff)]
        kept, pruned = t.files_for(where=pred)

        def timed(df):
            s = time.perf_counter()
            n = df.count()
            return n, time.perf_counter() - s

        # warm both paths once (JIT, page cache), then best-of-3 each
        full_n, _ = timed(t.read().filter(f"ts >= '{cutoff}'"))
        prun_n, _ = timed(t.read(where=pred))
        assert full_n == prun_n, (full_n, prun_n)
        full_s = min(timed(t.read().filter(f"ts >= '{cutoff}'"))[1] for _ in range(3))
        prun_s = min(timed(t.read(where=pred))[1] for _ in range(3))
        print(json.dumps({
            "epochs": n_epochs, "events_per_epoch": per_epoch,
            "rows_matching": full_n,
            "files_total": len(kept) + pruned, "files_pruned": pruned,
            "full_scan_s": round(full_s, 3), "pruned_read_s": round(prun_s, 3),
            "speedup": round(full_s / prun_s, 2),
        }))
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
