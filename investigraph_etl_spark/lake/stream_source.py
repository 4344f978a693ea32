"""The lake changelog as a first-class Spark data source (Python DataSource
API, Spark 4): ``spark.readStream.format("lake_changes")`` follows a table's
commits as a Structured Streaming source, and ``spark.read`` over the same
format gives the batch face.

Why this shape: the commit log already IS a replayable, totally-ordered
stream with exactly-once-friendly offsets — the commit **version**. Exposing
it through the engine's native source API means every Structured Streaming
facility (checkpointed offsets, triggers, foreachBatch sinks, restart
recovery) composes with the lake's CDC-out for free, instead of the driver
polling ``consume_changes`` in a loop.

Scale/role split:

- **driver, control-plane only**: ``latestOffset`` is one LIST of the log
  prefix; ``partitions(start, end)`` walks just the commits in the window
  and emits ONE partition per data file those commits added — cost scales
  with the delta, never the table.
- **executors, data-plane**: each partition reads its single parquet file
  through the storage interface (ranged reads — object-store friendly) with
  pyarrow and yields Arrow RecordBatches — the vectorized path end to end,
  no per-row Python.

Semantics match :meth:`LakeTable.changes` exactly (same commit
classification): MOR merge commits yield their resolved LWW batch as
``upsert``/``delete`` rows + ``_commit_version``; compaction/vacuum commits
are transparent; COW merge commits fail the stream with the same clear
error; a vacuumed window raises instead of silently skipping. Offsets are
``{"version": N}`` so a restarted query resumes from its checkpoint without
re-emitting applied commits.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Sequence

import pyarrow as pa

from investigraph_etl_spark.storage import join, storage_for

_HIDDEN = ("_ts", "_seq", "_deleted")


def _log(path: str):
    from investigraph_etl_spark.lake.log import CommitLog

    return CommitLog(path)


def _spark_schema(path: str, with_stamps: bool):
    """Changelog schema from the table's commit log (no SparkSession)."""
    from pyspark.sql import types as T

    st = _log(path).read_state()
    if st is None:
        raise FileNotFoundError(f"no lake table at {path}")
    base = T.StructType.fromJson(st.schema)
    # nullability mirrors LakeTable.changes() exactly (schema-equality is
    # part of the contract): select() relaxes public columns to nullable,
    # the literal-built _change_type is non-null, the map lookup is nullable
    fields = [
        T.StructField(f.name, f.dataType, True)
        for f in base.fields
        if f.name not in _HIDDEN
    ]
    if with_stamps:
        fields += [
            T.StructField("_ts", T.TimestampType(), True),
            T.StructField("_seq", T.LongType(), True),
        ]
    fields += [
        T.StructField("_change_type", T.StringType(), False),
        T.StructField("_commit_version", T.LongType(), True),
    ]
    return T.StructType(fields)


def _window_files(path: str, since: int, to: int) -> list[tuple[str, int]]:
    """[(rel_file, commit_version)] for the logical changes in (since, to] —
    delegates to the ONE shared classifier (CommitLog.change_window_files),
    so this stream and LakeTable.changes() can never disagree."""
    log = _log(path)
    st = log.read_state(at_version=to)
    if st is None:
        return []
    return log.change_window_files(
        storage_for(path), join(path, "data"), since, to, st.mode
    )


def _read_partition(
    table_path: str, rel_file: str, version: int, arrow_schema_bytes: bytes
) -> Iterator["pa.RecordBatch"]:
    """Executor-side: one parquet file → Arrow batches in the target schema.

    Reads through the storage interface (seekable ranged reads), fills
    columns absent from older files with nulls (additive evolution), maps
    ``_deleted`` → ``_change_type`` and stamps the commit version."""
    import pyarrow.parquet as pq

    target = pa.ipc.read_schema(pa.BufferReader(arrow_schema_bytes))
    fs = storage_for(table_path)
    src = pq.ParquetFile(
        fs.open_range_reader(join(join(table_path, "data"), rel_file))
    )
    have = set(src.schema_arrow.names)
    want = [
        n for n in (set(target.names) - {"_change_type", "_commit_version"})
        if n in have
    ]
    for batch in src.iter_batches(columns=sorted(set(want) | {"_deleted"})):
        tbl = pa.Table.from_batches([batch])
        n = len(tbl)
        deleted = tbl.column("_deleted")
        cols = []
        for field in target:
            if field.name == "_change_type":
                import pyarrow.compute as pc

                cols.append(
                    pc.if_else(deleted, pa.scalar("delete"), pa.scalar("upsert"))
                )
            elif field.name == "_commit_version":
                cols.append(pa.array([version] * n, type=pa.int64()))
            elif field.name in have:
                cols.append(tbl.column(field.name).cast(field.type))
            else:  # column added to the table after this file was written
                cols.append(pa.nulls(n, type=field.type))
        out = pa.table(cols, schema=target)
        yield from out.to_batches()


class _ChangeFile:
    """Picklable InputPartition payload (one data file of one commit)."""

    def __init__(self, table_path: str, rel_file: str, version: int, schema_bytes: bytes):
        self.table_path = table_path
        self.rel_file = rel_file
        self.version = version
        self.schema_bytes = schema_bytes


def _arrow_schema_bytes(spark_schema) -> bytes:
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(spark_schema).serialize().to_pybytes()


def _make_datasource_classes():
    """Defined lazily so importing this module never hard-requires the
    DataSource API (present in pyspark >= 4.0)."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class _Part(InputPartition):
        def __init__(self, payload: _ChangeFile):
            self.payload = payload

    class _Reader(DataSourceReader):
        def __init__(self, options, schema):
            self.path = options["path"]
            self.since = int(options.get("since_version", 0))
            self.to = (
                int(options["to_version"]) if "to_version" in options else None
            )
            self.schema_bytes = _arrow_schema_bytes(schema)

        def partitions(self) -> Sequence[InputPartition]:
            to = self.to if self.to is not None else _log(self.path).latest_version()
            return [
                _Part(_ChangeFile(self.path, f, v, self.schema_bytes))
                for f, v in _window_files(self.path, self.since, to)
            ]

        def read(self, partition):
            p = partition.payload
            yield from _read_partition(
                p.table_path, p.rel_file, p.version, p.schema_bytes
            )

    class _StreamReader(DataSourceStreamReader):
        def __init__(self, options, schema):
            self.path = options["path"]
            self.since = int(options.get("since_version", 0))
            # maxFilesPerTrigger analog: cap each micro-batch at this many
            # COMMITS, so a query starting against a long backlog (or
            # resuming after downtime) drains it in bounded batches instead
            # of one unbounded first batch. 0 = unbounded. Pair the cap with
            # a CONTINUOUS trigger (processingTime): the offset ladder below
            # climbs once per trigger, which a one-shot availableNow run
            # (single batch, fresh reader each run) never gets to do — for
            # drain-once jobs use the unbounded default.
            self.max_commits = int(options.get("max_commits_per_trigger", 0))
            self.schema_bytes = _arrow_schema_bytes(schema)
            # Offset bookkeeping for the cap across RESTARTS. The reader is
            # re-created with no memory of the checkpoint, so a capped
            # latestOffset could regress below the restored offset and make
            # Spark re-plan already-delivered commits. Two monotone marks
            # close that hole:
            # - _high: highest offset edge seen — the base the cap advances
            #   from (relearned from the first planned window's start, which
            #   IS the restored offset);
            # - _floor: highest KNOWN-COMMITTED offset (batch starts are
            #   committed by definition; commit() confirms ends). partitions
            #   never emits at or below it, so even if Spark plans a window
            #   reaching back before the restore point, previously delivered
            #   commits are not re-emitted. A genuine retry of an
            #   UNcommitted batch re-plans fully (its start == _floor).
            self._high = self.since
            self._floor = self.since
            self._offered = self.since  # cap ladder: last offset we offered

        def initialOffset(self) -> dict:
            return {"version": self.since}

        def latestOffset(self) -> dict:
            cur = _log(self.path).latest_version()
            if self.max_commits:
                # Climb by max_commits per call from the best known position.
                # After a restart the reader has no memory of the checkpoint,
                # so a fixed cap could sit at or below the restored offset
                # forever (no batch ever plans, nothing is relearned). The
                # ladder (_offered grows every call, bounded by the real
                # head) reaches the restored offset in O(backlog/cap) idle
                # triggers, at which point a batch plans and _high/_floor
                # snap to the true position; the _floor guard in partitions
                # keeps any backward-reaching window from re-emitting.
                base = max(self._high, self._offered)
                offer = min(cur, base + self.max_commits)
            else:
                offer = cur
            offer = max(offer, self._high)
            self._offered = max(self._offered, offer)
            return {"version": offer}

        def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
            s, e = int(start["version"]), int(end["version"])
            self._floor = max(self._floor, s)  # batch start = committed offset
            self._high = max(self._high, s, e)
            return [
                _Part(_ChangeFile(self.path, f, v, self.schema_bytes))
                for f, v in _window_files(self.path, self._floor, e)
            ]

        def read(self, partition):
            p = partition.payload
            yield from _read_partition(
                p.table_path, p.rel_file, p.version, p.schema_bytes
            )

        def commit(self, end: dict) -> None:
            # offsets live in the query checkpoint; locally just confirm the
            # completed batch's end for the re-emission floor
            self._floor = max(self._floor, int(end["version"]))

    class LakeChangesDataSource(DataSource):
        """``format("lake_changes")``: options ``path`` (table root),
        ``with_stamps`` ("true" adds ``_ts``/``_seq``), ``since_version``,
        ``max_commits_per_trigger`` (streaming: bound each micro-batch's
        commit count — the maxFilesPerTrigger analog for backlog drains),
        and (batch only) ``to_version``."""

        @classmethod
        def name(cls) -> str:
            return "lake_changes"

        def schema(self):
            return _spark_schema(
                self.options["path"],
                str(self.options.get("with_stamps", "false")).lower() == "true",
            )

        def reader(self, schema) -> DataSourceReader:
            return _Reader(self.options, schema)

        def streamReader(self, schema) -> DataSourceStreamReader:
            return _StreamReader(self.options, schema)

    return LakeChangesDataSource


def register(spark) -> None:
    """Register ``lake_changes`` with this session (idempotent)."""
    spark.dataSource.register(_make_datasource_classes())
