"""Table-to-table CDC replication: consume a source table's changelog and
re-apply it downstream — the full chain the engine is built from, composed:

    src.changes (CDC out) → LWW re-resolve → dst.merge (CDC in, exactly-once)

Replication preserves the source's conflict resolution EXACTLY because the
changelog carries the original LWW stamps (``changes(with_stamps=True)``):
the replica's winner for every key is decided by the same ``(_ts, _seq)``
comparison that decided it upstream, so replica state is independent of how
many replication batches the history was consumed in.

Delivery semantics, the same discipline as the engine's own ingest:

- the consumer cursor advances only AFTER the downstream merge commits
  (at-least-once consumption);
- the merge itself carries ``(app_id="replica:<id>", epoch_id=<to_version>)``
  — a crash after merge but before ack redelivers the window and the token
  makes the re-merge a recorded no-op (exactly-once application);
- if new source commits arrive before the retry, the window WIDENS and the
  epoch token differs — re-applying the already-applied prefix is then a
  semantic no-op anyway, because LWW merge is idempotent (re-delivered
  winners lose to themselves). Convergence never depends on the token alone.

At 100 TB: each cycle moves only the delta (changes() scans just the files
the new commits added), and the merge is the same O(batch) MOR append the
primary ingest path uses.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from investigraph_etl_spark.cdc.events import KEY_COLS
from investigraph_etl_spark.cdc.resolve import resolve_lww
from investigraph_etl_spark.lake.table import LakeTable


def _changes_to_events(df):
    """Stamped changelog rows → the engine's event shape (op, key, payload,
    ts, seq), with the SOURCE's LWW stamps as the event stamps so downstream
    resolution reproduces upstream decisions exactly."""
    payload = [
        c
        for c in df.columns
        if c not in {*KEY_COLS, "ts", "_ts", "_seq", "_change_type", "_commit_version"}
    ]
    return df.select(
        F.col("_change_type").alias("op"),
        *KEY_COLS,
        *payload,
        F.col("_ts").alias("ts"),
        F.col("_seq").alias("seq"),
    )


def replicate(
    src: LakeTable, dst: LakeTable, consumer_id: str = "replica"
) -> dict[str, Any]:
    """Apply the source's un-consumed changelog window to ``dst``. Returns
    merge metrics (or ``{"skipped": True}`` when the window is empty)."""
    df, ack = src.consume_changes(consumer_id, with_stamps=True)
    last, cur = ack.window
    if cur <= last:
        return {"skipped": True, "reason": "no new commits"}
    res = dst.merge(
        resolve_lww(_changes_to_events(df)),
        app_id=f"replica:{consumer_id}",
        epoch_id=cur,
    )
    ack()
    return {**res, "window": [last, cur]}


def replicate_stream(
    spark,
    src_root: str,
    dst: LakeTable,
    checkpoint: str,
    consumer_id: str = "replica",
    trigger: dict[str, Any] | None = None,
):
    """CONTINUOUS replication: follow the source's changelog as a Structured
    Streaming source (lake/stream_source.py) and apply each micro-batch to
    ``dst``. Returns the started StreamingQuery.

    Exactly-once stacks three independent guards: the query checkpoint pins
    which commit-version window each micro-batch covered (no re-read after
    restart), the ``(app_id, batch_id)`` token makes a re-delivered batch a
    recorded no-op, and LWW merge is idempotent anyway — the same discipline
    as the primary ingest path, so replica state is exact under any crash.
    """
    from investigraph_etl_spark.lake import stream_source

    stream_source.register(spark)
    src = (
        spark.readStream.format("lake_changes")
        .option("path", src_root)
        .option("with_stamps", "true")
        .load()
    )

    def _apply(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():  # idle trigger — no commit, no empty files
            return
        dst.merge(
            resolve_lww(_changes_to_events(batch_df)),
            app_id=f"replica-stream:{consumer_id}",
            epoch_id=batch_id,
        )

    writer = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(**(trigger or {"availableNow": True}))
    )
    return writer.start()
