"""Measure key-membership skipping: point lookup with vs without keysets.

Builds the SAME MOR table twice — plain, and with ``keyset_col="conv_id"``
— from N epochs of generated CDC events (conv ids are hash-like, so min/max
zone maps cannot prune a point lookup), then times ``read(where=[(conv_id,
"=", <id>)])`` on both. Also reports the per-commit write overhead the
keyset pass costs. Identical results asserted. Prints one JSON line::

    PYTHONPATH=/root/repo python scripts/bench_keyset.py [n_epochs] [events_per_epoch]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from investigraph_etl_spark.cdc.apply import apply_events_batch  # noqa: E402
from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA  # noqa: E402
from investigraph_etl_spark.cdc.generator import (  # noqa: E402
    GeneratorConfig,
    generate_events,
)
from investigraph_etl_spark.lake.table import LakeTable  # noqa: E402
from investigraph_etl_spark.session import get_spark  # noqa: E402


def _fill(spark, t, n_epochs, per_epoch):
    import hashlib

    s = time.perf_counter()
    for e in range(n_epochs):
        ev = generate_events(GeneratorConfig(
            n_events=per_epoch, n_convs=per_epoch // 20, seed=100 + e,
            n_epochs=1)).drop(columns=["epoch"])
        # hash-like ids (the realistic shape: uuids), so every file's
        # min/max spans ~the whole id space and zone maps cannot prune a
        # point lookup — what the keyset exists for
        ev["conv_id"] = ev["conv_id"].map(
            lambda x: "c" + hashlib.md5(x.encode()).hexdigest()[:12])
        apply_events_batch(t, spark.createDataFrame(ev), app_id="ks",
                           epoch_id=e)
    return time.perf_counter() - s


def main() -> None:
    n_epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    per_epoch = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    spark = get_spark(app_name="bench-keyset", master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})
    base = tempfile.mkdtemp(prefix="bench-keyset-")
    try:
        plain = LakeTable.create(spark, base + "/plain", TRANSCRIPT_SCHEMA,
                                 n_buckets=8, mode="mor")
        keyed = LakeTable.create(spark, base + "/keyed", TRANSCRIPT_SCHEMA,
                                 n_buckets=8, mode="mor",
                                 keyset_col="conv_id",
                                 keyset_bloom_ndv=per_epoch // 20)
        plain.compact_threshold = keyed.compact_threshold = 10**9
        ingest_plain_s = _fill(spark, plain, n_epochs, per_epoch)
        ingest_keyed_s = _fill(spark, keyed, n_epochs, per_epoch)

        # a COLD key (zipf tail — appears in few epochs): the point-lookup
        # shape membership pruning serves; a hot head key genuinely lives in
        # every file and nothing can prune it
        from pyspark.sql import functions as F

        target = (plain.read().groupBy("conv_id")
                  .agg(F.count(F.lit(1)).alias("n"))
                  .orderBy("n", "conv_id").first()[0])
        pred = [("conv_id", "=", target)]
        k_plain, p_plain = plain.files_for(where=pred)
        k_keyed, p_keyed = keyed.files_for(where=pred)

        def timed(df):
            s = time.perf_counter()
            n = df.count()
            return n, time.perf_counter() - s

        n0, _ = timed(plain.read(where=pred))
        n1, _ = timed(keyed.read(where=pred))
        assert n0 == n1 and n0 >= 1, (n0, n1)
        plain_s = min(timed(plain.read(where=pred))[1] for _ in range(3))
        keyed_s = min(timed(keyed.read(where=pred))[1] for _ in range(3))
        print(json.dumps({
            "epochs": n_epochs, "events_per_epoch": per_epoch,
            "rows_matching": n0,
            "files_plain": len(k_plain) + p_plain, "pruned_plain": p_plain,
            "files_keyed": len(k_keyed) + p_keyed, "pruned_keyed": p_keyed,
            "lookup_plain_s": round(plain_s, 3),
            "lookup_keyed_s": round(keyed_s, 3),
            "speedup": round(plain_s / keyed_s, 2),
            "ingest_plain_s": round(ingest_plain_s, 1),
            "ingest_keyed_s": round(ingest_keyed_s, 1),
            "keyset_write_overhead_pct": round(
                100 * (ingest_keyed_s - ingest_plain_s) / ingest_plain_s, 1),
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
