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


def replicate(
    src: LakeTable, dst: LakeTable, consumer_id: str = "replica"
) -> dict[str, Any]:
    """Apply the source's un-consumed changelog window to ``dst``. Returns
    merge metrics (or ``{"skipped": True}`` when the window is empty)."""
    df, ack = src.consume_changes(consumer_id, with_stamps=True)
    last, cur = ack.window
    if cur <= last:
        return {"skipped": True, "reason": "no new commits"}

    payload = [
        c
        for c in df.columns
        if c not in {*KEY_COLS, "ts", "_ts", "_seq", "_change_type", "_commit_version"}
    ]
    events = df.select(
        F.col("_change_type").alias("op"),
        *KEY_COLS,
        *payload,
        F.col("_ts").alias("ts"),
        F.col("_seq").alias("seq"),
    )
    res = dst.merge(
        resolve_lww(events), app_id=f"replica:{consumer_id}", epoch_id=cur
    )
    ack()
    return {**res, "window": [last, cur]}
