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


def _public_fields(schema_json: dict) -> list[dict]:
    return [f for f in schema_json["fields"] if f["name"] not in _HIDDEN]


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
    the same commit classification as LakeTable.changes."""
    log = _log(path)
    st = log.read_state(at_version=to)
    if st is None:
        return []
    fs = storage_for(path)
    data_dir = join(path, "data")
    out: list[tuple[str, int]] = []
    seen_tokens: set[str] = set()
    for v in log.versions():
        if not (since < v <= to):
            continue
        c = log.get(v)
        if c.metrics.get("compaction") or c.metrics.get("vacuum"):
            continue
        if v == 1 or not c.added:
            continue
        if st.mode != "mor" and c.removed:
            raise ValueError(
                "changelog stream across a copy-on-write MERGE commit "
                f"(version {v}): COW rewrites mix changed and unchanged "
                "rows; use mode='mor' tables for CDC-out"
            )
        for f in c.added:
            token = f.split("/", 1)[0]
            if token not in seen_tokens:
                seen_tokens.add(token)
                if not fs.exists(join(data_dir, token)):
                    raise FileNotFoundError(
                        f"changelog files of version {v} were vacuumed; "
                        "retain them with vacuum(retain_versions=...) to "
                        "keep the stream window readable"
                    )
            out.append((f, v))
    return out


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
            # of one unbounded first batch. 0 = unbounded.
            self.max_commits = int(options.get("max_commits_per_trigger", 0))
            self.schema_bytes = _arrow_schema_bytes(schema)
            self._progress = self.since  # highest window edge seen

        def initialOffset(self) -> dict:
            return {"version": self.since}

        def latestOffset(self) -> dict:
            cur = _log(self.path).latest_version()
            if self.max_commits:
                cur = min(cur, self._progress + self.max_commits)
            return {"version": max(cur, self._progress)}

        def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
            s, e = int(start["version"]), int(end["version"])
            # learn real progress from every planned window (incl. a replayed
            # checkpoint batch after restart), so the cap advances from the
            # true position; an inverted window (possible for one trigger
            # right after restart, before progress is relearned) is empty
            self._progress = max(self._progress, s, e)
            return [
                _Part(_ChangeFile(self.path, f, v, self.schema_bytes))
                for f, v in _window_files(self.path, s, e)
            ]

        def read(self, partition):
            p = partition.payload
            yield from _read_partition(
                p.table_path, p.rel_file, p.version, p.schema_bytes
            )

        def commit(self, end: dict) -> None:
            pass  # offsets live in the query checkpoint

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
