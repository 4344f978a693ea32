"""Epoch apply: raw event micro-batch → normalize → LWW resolve → MERGE + metrics.

One call = one micro-batch (the streaming loop's foreachBatch body, also usable
for batch backfills). The reference analog is one transform+load task pair per
chunk (/root/reference/investigraph/pipeline.py:150-159) plus the stats
collector (/root/reference/investigraph/pipeline.py:49-53) — here the whole
chunk is one declarative plan and metrics come from the same pass.
"""

from __future__ import annotations

import os
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from investigraph_etl_spark.cdc.events import KEY_COLS, normalize_events
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
    valid, quarantined = normalize_events(raw_events)

    # The batch is reused by resolve, per-bucket metrics, and quarantine-count;
    # cache so the source is scanned once per epoch.
    valid = valid.cache()
    try:
        st = table._state()
        if (app_id, epoch_id) in st.committed_epochs:
            return {"skipped": True, "reason": "epoch already committed", "version": st.version}

        # Per-bucket lineage in ONE small aggregation job (buckets ≤ n_buckets rows).
        per_bucket = (
            valid.withColumn("bucket", _bucket_expr(st.n_buckets))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("events_applied"),
                (F.count(F.lit(1)) - F.countDistinct(*KEY_COLS)).alias("conflicts_resolved"),
                F.max("ts").alias("watermark_pos"),
            )
            .toPandas()
        )
        n_events = int(per_bucket["events_applied"].sum()) if len(per_bucket) else 0
        n_quar = quarantined.count()

        if n_quar:
            quarantined.write.mode("append").parquet(
                os.path.join(table.root, _QUARANTINE_DIR)
            )

        if n_events == 0:
            # Still commit the epoch token so the empty batch is not re-examined.
            result = table.merge(
                resolve_lww(valid, n_salts=n_salts),
                app_id=app_id,
                epoch_id=epoch_id,
                extra_metrics={"events_applied": 0, "events_quarantined": n_quar},
            )
        else:
            resolved = resolve_lww(valid, n_salts=n_salts)
            result = table.merge(
                resolved,
                app_id=app_id,
                epoch_id=epoch_id,
                extra_metrics={
                    "events_applied": n_events,
                    "events_quarantined": n_quar,
                    "conflicts_resolved": int(per_bucket["conflicts_resolved"].sum()),
                },
            )

        if not result.get("skipped"):
            _write_metrics(table, epoch_id, per_bucket, n_quar)
        result.update({"events_applied": n_events, "events_quarantined": n_quar})
        return result
    finally:
        valid.unpersist()


def _write_metrics(table: LakeTable, epoch_id: int, per_bucket: pd.DataFrame, n_quar: int) -> None:
    out = per_bucket.copy()
    if len(out) == 0:
        out = pd.DataFrame(
            {"bucket": pd.array([], dtype="int32"),
             "events_applied": pd.array([], dtype="int64"),
             "conflicts_resolved": pd.array([], dtype="int64"),
             "watermark_pos": pd.array([], dtype="datetime64[us]")}
        )
    out.insert(0, "epoch_id", epoch_id)
    out["events_quarantined"] = n_quar
    # Spark's parquet reader rejects TIMESTAMP(NANOS); pin to micros.
    out["watermark_pos"] = out["watermark_pos"].astype("datetime64[us]")
    path = os.path.join(table.root, _METRICS_DIR)
    os.makedirs(path, exist_ok=True)
    out.to_parquet(os.path.join(path, f"epoch-{epoch_id:010d}.parquet"), index=False)


def read_metrics(table: LakeTable) -> DataFrame:
    """The `_metrics` sidecar as a DataFrame (per epoch × bucket lineage)."""
    path = os.path.join(table.root, _METRICS_DIR)
    return table.spark.read.parquet(path)
