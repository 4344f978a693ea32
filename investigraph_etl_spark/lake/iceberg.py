"""Iceberg backend seam: the LakeTable MERGE semantics as real ``MERGE INTO``.

`lake/table.py` implements its own commit-logged table format because this
sandbox has no Iceberg runtime jars; its docstring promises "with a real
Iceberg catalog this function body becomes MERGE INTO". This module IS that
seam: an adapter with the same keyed-upsert surface
(``merge(resolved, app_id, epoch_id)``) that emits the equivalent Iceberg SQL
for a deployment that *does* have a catalog configured
(``spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog``).

Semantics mapping (kept EXACTLY equal to LakeTable, so a pipeline can switch
backends without behavior change):

- **Bucketing** → Iceberg partition transform ``bucket(n, conv_id)``; a MERGE
  touching few conversations rewrites few partitions, same pruning story.
- **LWW stamps** → the same hidden ``_ts``/``_seq`` columns; the MERGE's
  MATCHED clauses are guarded by the stamp-newer predicate, so reapplying any
  batch is a no-op and out-of-order updates lose.
- **Tombstones stay physical rows** (``_deleted = true``, payload blanked) —
  NOT ``WHEN MATCHED THEN DELETE``: deleting the row would let a later stale
  update re-insert via NOT MATCHED, resurrecting the turn. Reads go through
  the ``<table>_live`` view, exactly like ``LakeTable.read``'s filter.
- **Exactly-once** → the ``(app_id, epoch_id)`` token rides the Iceberg
  snapshot summary. Writing it atomically with the MERGE commit needs the
  Java helper ``org.apache.iceberg.spark.CommitMetadata.withCommitProperties``
  (deployments inject it as ``commit_hook`` — a JVM shim or py4j-callback
  wrapper); the guard re-reads the ``.snapshots`` metadata table. A retry
  after a crash re-runs the MERGE, which the stamp predicate makes
  idempotent anyway —
  the token only short-circuits the work, it is not load-bearing for
  correctness (same division of labor as LakeTable: stamps are the
  correctness mechanism, tokens the fast path).

Unit coverage (no jars in the sandbox): generated SQL text + the epoch-token
guard/flow logic against a recording stub of ``spark.sql``.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T

from investigraph_etl_spark.cdc.events import KEY_COLS

_APP_PROP = "etl.app-id"
_EPOCH_PROP = "etl.epoch-id"


def _q(ident: str) -> str:
    """Quote each dot-separated identifier part with backticks."""
    return ".".join(f"`{p}`" for p in ident.split("."))


class IcebergMergeAdapter:
    """LakeTable-compatible keyed-upsert sink over an Iceberg catalog table.

    ``identifier`` is the catalog-qualified table name
    (``catalog.db.transcripts``). All SQL-producing methods are pure string
    builders (unit-testable without a catalog); ``merge``/``create`` execute
    them via ``spark.sql`` in order.
    """

    def __init__(
        self,
        spark: Any,
        identifier: str,
        schema: T.StructType,
        n_buckets: int = 16,
        key_cols: tuple[str, ...] = KEY_COLS,
        commit_hook: Any = None,
    ) -> None:
        self.commit_hook = commit_hook
        self.spark = spark
        self.identifier = identifier
        self.schema = schema  # public schema; hidden cols added on create
        self.n_buckets = n_buckets
        self.key_cols = tuple(key_cols)
        self.payload_cols = tuple(
            f.name for f in schema.fields if f.name not in key_cols
        )

    # ------------------------------------------------------------ SQL builders
    def create_table_sql(self) -> str:
        cols = ",\n  ".join(
            f"`{f.name}` {f.dataType.simpleString().upper()}"
            for f in self.schema.fields
        )
        return (
            f"CREATE TABLE {_q(self.identifier)} (\n"
            f"  {cols},\n"
            f"  `_ts` TIMESTAMP,\n  `_seq` BIGINT,\n  `_deleted` BOOLEAN\n)\n"
            f"USING iceberg\n"
            f"PARTITIONED BY (bucket({self.n_buckets}, `{self.key_cols[0]}`))\n"
            f"TBLPROPERTIES (\n"
            f"  'format-version' = '2',\n"
            f"  'write.merge.mode' = 'merge-on-read',\n"
            f"  'write.update.mode' = 'merge-on-read',\n"
            f"  'write.delete.mode' = 'merge-on-read'\n)"
        )

    def live_view_sql(self) -> str:
        public = ", ".join(f"`{c}`" for c in (*self.key_cols, *self.payload_cols))
        return (
            f"CREATE OR REPLACE VIEW {_q(self.identifier + '_live')} AS\n"
            f"SELECT {public} FROM {_q(self.identifier)} WHERE NOT `_deleted`"
        )

    def epoch_guard_sql(self, app_id: str, epoch_id: int) -> str:
        """Count snapshots already carrying this epoch's token (summary map
        of the ``.snapshots`` metadata table — real Iceberg SQL)."""
        return (
            f"SELECT count(*) AS n FROM {_q(self.identifier)}.`snapshots`\n"
            f"WHERE summary['{_APP_PROP}'] = '{app_id}' "
            f"AND summary['{_EPOCH_PROP}'] = '{epoch_id}'"
        )

    def stamp_newer_predicate(self) -> str:
        """Source beats target iff its (ts, seq) stamp is strictly greater —
        the identical total order LakeTable's max_by re-reduce uses."""
        return (
            "(s.`ts` > t.`_ts` OR (s.`ts` = t.`_ts` AND s.`seq` > t.`_seq`))"
        )

    def merge_sql(self, source_view: str = "etl_batch") -> str:
        """The MERGE INTO statement for one LWW-resolved batch registered as
        ``source_view`` (cols: op, keys, payload, ts, seq — resolve_lww's
        output contract, one row per key)."""
        on = " AND ".join(f"t.`{k}` = s.`{k}`" for k in self.key_cols)
        is_del = "s.`op` = 'delete'"
        pay_upd = ", ".join(
            f"t.`{c}` = CASE WHEN {is_del} THEN NULL ELSE s.`{c}` END"
            for c in self.payload_cols
        )
        all_cols = (*self.key_cols, *self.payload_cols, "_ts", "_seq", "_deleted")
        ins_cols = ", ".join(f"`{c}`" for c in all_cols)
        ins_vals = ", ".join(
            [
                *(f"s.`{k}`" for k in self.key_cols),
                *(
                    f"CASE WHEN {is_del} THEN NULL ELSE s.`{c}` END"
                    for c in self.payload_cols
                ),
                "s.`ts`",
                "s.`seq`",
                is_del,
            ]
        )
        return (
            f"MERGE INTO {_q(self.identifier)} t\n"
            f"USING {source_view} s\n"
            f"ON {on}\n"
            # Tombstone, don't DELETE: the row must stay to outrank stale
            # updates (see module docstring).
            f"WHEN MATCHED AND {self.stamp_newer_predicate()} THEN UPDATE SET\n"
            f"  {pay_upd},\n"
            f"  t.`_ts` = s.`ts`, t.`_seq` = s.`seq`, t.`_deleted` = {is_del}\n"
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols})\n"
            f"VALUES ({ins_vals})"
        )

    # ------------------------------------------------------------- execution
    def create(self) -> None:
        self.spark.sql(self.create_table_sql())
        self.spark.sql(self.live_view_sql())

    def _epoch_committed(self, app_id: str, epoch_id: int) -> bool:
        row = self.spark.sql(self.epoch_guard_sql(app_id, epoch_id)).collect()[0]
        return bool(row[0])

    def merge(
        self,
        resolved: Any,
        app_id: str | None = None,
        epoch_id: int | None = None,
        source_view: str = "etl_batch",
    ) -> dict[str, Any]:
        """Apply one LWW-resolved batch via MERGE INTO, exactly once.

        Same return contract as ``LakeTable.merge``. When the Iceberg Java
        helper is on the classpath, the epoch token is attached to the MERGE's
        own snapshot (atomic); otherwise the MERGE still commits and the
        stamp predicate alone guarantees idempotent replay.
        """
        if app_id is not None and epoch_id is not None:
            if self._epoch_committed(app_id, epoch_id):
                return {"skipped": True, "reason": "epoch already committed"}
        resolved.createOrReplaceTempView(source_view)
        stmt = self.merge_sql(source_view)
        if self.commit_hook is not None:
            # Deployment-supplied wrapper that runs the statement inside
            # CommitMetadata.withCommitProperties (needs a tiny JVM shim or
            # the py4j callback server) so the token is atomic with the MERGE.
            self.commit_hook(stmt, {_APP_PROP: str(app_id), _EPOCH_PROP: str(epoch_id)})
        else:
            self.spark.sql(stmt)
        return {"skipped": False, "app_id": app_id, "epoch_id": epoch_id}
