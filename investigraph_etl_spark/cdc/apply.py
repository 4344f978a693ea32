"""Epoch apply: raw event micro-batch → normalize → LWW resolve → MERGE + metrics.

One call = one micro-batch (the streaming loop's foreachBatch body, also usable
for batch backfills). The reference analog is one transform+load task pair per
chunk (/root/reference/investigraph/pipeline.py:150-159) plus the stats
collector (/root/reference/investigraph/pipeline.py:49-53) — here the whole
chunk is one declarative plan and metrics come from the same pass.

Job budget per epoch (what a 10^10-event deployment pays per micro-batch):

1. LWW resolve of the batch (cached — it feeds both lineage and the MERGE),
   carrying a per-key event count; per-bucket lineage (events applied /
   conflicts / watermark) is a tiny aggregation over the RESOLVED rows, and
   the quarantine count rides the same scan as an ``Observation`` — no
   separate full-batch metrics job, no distinct-buckets job;
2. (only if quarantined > 0) one append of the quarantine rows;
3. the MERGE: mor = append the resolved generation (O(batch));
   cow = re-reduce (touched-bucket rows ∪ batch) and rewrite those buckets.
"""

from __future__ import annotations

import os
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from investigraph_etl_spark.cdc.events import canonicalize_events
from investigraph_etl_spark.cdc.resolve import resolve_lww
from investigraph_etl_spark.lake.table import LakeTable, _bucket_expr

_METRICS_DIR = "_metrics"
_QUARANTINE_DIR = "_quarantine"


def apply_events_batch(
    table: LakeTable,
    raw_events: DataFrame,
    app_id: str,
    epoch_id: int,
    n_salts: int | None = None,
) -> dict[str, Any]:
    """Apply one raw event micro-batch to the table, exactly once.

    Returns commit metrics. Per-bucket lineage (events applied, conflicts
    resolved = events beyond one per key, watermark position = max ts) is
    appended to the `_metrics` sidecar; malformed events land in
    `_quarantine` (never abort the epoch — reference swallows per-record
    errors, /root/reference/investigraph/pipeline.py:89-94).
    """
    st = table._state()
    if (app_id, epoch_id) in st.committed_epochs:
        return {"skipped": True, "reason": "epoch already committed", "version": st.version}

    canon = canonicalize_events(raw_events)
    obs = Observation(f"epoch-{epoch_id}")
    canon = canon.observe(
        obs, F.sum(F.when(F.col("_valid"), 0).otherwise(1)).alias("n_quar")
    )
    valid = canon.filter(F.col("_valid")).drop("_valid")

    resolved = resolve_lww(valid, n_salts=n_salts, with_count=True).cache()
    try:
        # Lineage from the resolved rows (1 row/key, not 1 row/event): the
        # only full-batch pass is the resolve itself, which the MERGE needs
        # anyway. The Observation rides that same scan for quarantine counts.
        per_bucket = (
            resolved.withColumn("bucket", _bucket_expr(st.n_buckets))
            .groupBy("bucket")
            .agg(
                F.sum("_cnt").alias("events_applied"),
                (F.sum("_cnt") - F.count(F.lit(1))).alias("conflicts_resolved"),
                F.max("ts").alias("watermark_pos"),
            )
            .toPandas()
        )
        n_events = int(per_bucket["events_applied"].sum()) if len(per_bucket) else 0
        touched = [int(b) for b in per_bucket["bucket"]]
        n_quar = int((obs.get or {}).get("n_quar") or 0)

        if n_quar:
            canon.filter(~F.col("_valid")).drop("_valid").write.mode("append").parquet(
                os.path.join(table.root, _QUARANTINE_DIR)
            )

        result = table.merge(
            resolved.drop("_cnt"),
            app_id=app_id,
            epoch_id=epoch_id,
            touched=touched,
            extra_metrics={
                "events_applied": n_events,
                "events_quarantined": n_quar,
                "conflicts_resolved": int(per_bucket["conflicts_resolved"].sum())
                if len(per_bucket)
                else 0,
            },
        )

        if not result.get("skipped"):
            _write_metrics(table, epoch_id, per_bucket, n_quar)
        result.update({"events_applied": n_events, "events_quarantined": n_quar})
        return result
    finally:
        resolved.unpersist()


def _write_metrics(
    table: LakeTable, epoch_id: int, per_bucket: pd.DataFrame, n_quar: int
) -> None:
    out = per_bucket.copy()
    if len(out) == 0:
        out = pd.DataFrame(
            {"bucket": pd.array([], dtype="int32"),
             "events_applied": pd.array([], dtype="int64"),
             "conflicts_resolved": pd.array([], dtype="int64"),
             "watermark_pos": pd.array([], dtype="datetime64[us]")}
        )
    if n_quar:
        quar_row = pd.DataFrame(
            {"bucket": [-1], "events_applied": [0], "conflicts_resolved": [0],
             "watermark_pos": [pd.NaT]}
        )
        out = pd.concat([out, quar_row], ignore_index=True)
    out.insert(0, "epoch_id", epoch_id)
    out["events_quarantined"] = [0] * (len(out) - 1) + [n_quar] if n_quar else 0
    # Spark's parquet reader rejects TIMESTAMP(NANOS); pin to micros.
    out["watermark_pos"] = out["watermark_pos"].astype("datetime64[us]")
    path = os.path.join(table.root, _METRICS_DIR)
    os.makedirs(path, exist_ok=True)
    out.to_parquet(os.path.join(path, f"epoch-{epoch_id:010d}.parquet"), index=False)


def read_metrics(table: LakeTable) -> DataFrame:
    """The `_metrics` sidecar as a DataFrame (per epoch × bucket lineage)."""
    path = os.path.join(table.root, _METRICS_DIR)
    return table.spark.read.parquet(path)
