"""Iceberg MERGE INTO adapter seam (lake/iceberg.py).

No Iceberg jars exist in this sandbox, so these tests pin (a) the generated
SQL text — the contract a real catalog deployment executes — and (b) the
epoch-token guard flow, against a recording stub of ``spark.sql``.
"""

import re

import pytest
from pyspark.sql import types as T

from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
from investigraph_etl_spark.lake.iceberg import IcebergMergeAdapter


class _Result:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


class _SparkStub:
    """Records every statement; answers the snapshots guard query."""

    def __init__(self, epoch_committed=False):
        self.stmts = []
        self.epoch_committed = epoch_committed

    def sql(self, stmt):
        self.stmts.append(stmt)
        if ".`snapshots`" in stmt:
            return _Result([[1 if self.epoch_committed else 0]])
        return _Result([])


class _BatchStub:
    def __init__(self):
        self.views = []

    def createOrReplaceTempView(self, name):
        self.views.append(name)


def _adapter(spark=None, **kw):
    return IcebergMergeAdapter(
        spark or _SparkStub(), "cat.db.transcripts", TRANSCRIPT_SCHEMA,
        n_buckets=32, **kw
    )


def test_create_table_sql_partitions_by_bucket_transform():
    sql = _adapter().create_table_sql()
    assert "CREATE TABLE `cat`.`db`.`transcripts`" in sql
    assert "PARTITIONED BY (bucket(32, `conv_id`))" in sql
    assert "USING iceberg" in sql
    # format v2 + MOR write modes = the same high-rate ingest shape as
    # LakeTable mode="mor"
    assert "'format-version' = '2'" in sql
    assert "'write.merge.mode' = 'merge-on-read'" in sql
    # hidden LWW stamp columns present and typed
    assert "`_ts` TIMESTAMP" in sql and "`_seq` BIGINT" in sql
    assert "`_deleted` BOOLEAN" in sql
    # public schema columns all present
    for f in TRANSCRIPT_SCHEMA.fields:
        assert f"`{f.name}`" in sql


def test_live_view_filters_tombstones_and_hides_stamps():
    sql = _adapter().live_view_sql()
    assert "CREATE OR REPLACE VIEW `cat`.`db`.`transcripts_live`" in sql
    assert "WHERE NOT `_deleted`" in sql
    assert "_ts" not in sql.replace("`_deleted`", "")
    assert "_seq" not in sql


def test_merge_sql_stamp_guard_and_tombstone_semantics():
    sql = _adapter().merge_sql()
    assert sql.startswith("MERGE INTO `cat`.`db`.`transcripts` t")
    assert "USING etl_batch s" in sql
    assert "ON t.`conv_id` = s.`conv_id` AND t.`turn_idx` = s.`turn_idx`" in sql
    # LWW: MATCHED updates ONLY when the source stamp is strictly newer —
    # identical total order to LakeTable's max_by((ts, seq)) re-reduce.
    assert (
        "WHEN MATCHED AND (s.`ts` > t.`_ts` OR "
        "(s.`ts` = t.`_ts` AND s.`seq` > t.`_seq`)) THEN UPDATE SET" in sql
    )
    # Tombstone, never DELETE: a deleted row must stay to outrank stale
    # updates (LakeTable parity — resurrect-proof deletes).
    assert "THEN DELETE" not in sql
    assert "t.`_deleted` = s.`op` = 'delete'" in sql
    # delete blanks every payload column on both paths
    for c in ("role", "text", "tool"):
        assert f"t.`{c}` = CASE WHEN s.`op` = 'delete' THEN NULL ELSE s.`{c}` END" in sql
    assert "WHEN NOT MATCHED THEN INSERT" in sql
    # every physical column is inserted, in declaration order
    m = re.search(r"INSERT \(([^)]*)\)", sql)
    cols = [c.strip(" `") for c in m.group(1).split(",")]
    assert cols == ["conv_id", "turn_idx", "role", "text", "tool", "ts",
                    "_ts", "_seq", "_deleted"]


def test_epoch_guard_sql_reads_snapshot_summary():
    sql = _adapter().epoch_guard_sql("app1", 7)
    assert "FROM `cat`.`db`.`transcripts`.`snapshots`" in sql
    assert "summary['etl.app-id'] = 'app1'" in sql
    assert "summary['etl.epoch-id'] = '7'" in sql


def test_merge_flow_skips_committed_epoch():
    spark = _SparkStub(epoch_committed=True)
    res = _adapter(spark).merge(_BatchStub(), app_id="a", epoch_id=3)
    assert res["skipped"] is True
    assert len(spark.stmts) == 1 and ".`snapshots`" in spark.stmts[0]


def test_merge_flow_guard_then_merge():
    spark = _SparkStub(epoch_committed=False)
    batch = _BatchStub()
    res = _adapter(spark).merge(batch, app_id="a", epoch_id=3)
    assert res == {"skipped": False, "app_id": "a", "epoch_id": 3}
    assert batch.views == ["etl_batch"]
    assert [".`snapshots`" in s for s in spark.stmts] == [True, False]
    assert spark.stmts[1].startswith("MERGE INTO")


def test_merge_flow_commit_hook_carries_epoch_token():
    spark = _SparkStub()
    seen = []
    ad = _adapter(spark, commit_hook=lambda stmt, props: seen.append((stmt, props)))
    ad.merge(_BatchStub(), app_id="a", epoch_id=9)
    (stmt, props), = seen
    assert stmt.startswith("MERGE INTO")
    assert props == {"etl.app-id": "a", "etl.epoch-id": "9"}
    # the hook replaces the plain execution path
    assert not any(s.startswith("MERGE INTO") for s in spark.stmts)


def test_create_runs_ddl_then_view():
    spark = _SparkStub()
    _adapter(spark).create()
    assert spark.stmts[0].startswith("CREATE TABLE")
    assert spark.stmts[1].startswith("CREATE OR REPLACE VIEW")


def test_evolved_schema_reflected_in_sql():
    schema = T.StructType(
        list(TRANSCRIPT_SCHEMA.fields)
        + [T.StructField("tokens", T.LongType(), True)]
    )
    ad = IcebergMergeAdapter(_SparkStub(), "c.d.t", schema)
    assert "`tokens` BIGINT" in ad.create_table_sql()
    assert "t.`tokens` = CASE WHEN" in ad.merge_sql()


def test_merge_without_epoch_token_skips_guard():
    spark = _SparkStub()
    _adapter(spark).merge(_BatchStub())
    assert len(spark.stmts) == 1 and spark.stmts[0].startswith("MERGE INTO")


def test_generated_sql_parses_with_sparks_real_parser(spark):
    """Round-3 verdict #4: the adapter's SQL had only ever been string-pinned
    — a syntax error would pass every stub test. Run every statement the
    adapter can generate through Spark's OWN parser (the same grammar an
    Iceberg deployment's spark.sql hits first); ParseException fails the test.
    """
    parser = spark._jsparkSession.sessionState().sqlParser()

    # prove the oracle bites: garbage must raise
    with pytest.raises(Exception, match="(?i)parse"):
        parser.parsePlan("MERGE INTO WHEN GARBAGE !!")

    evolved = T.StructType(
        list(TRANSCRIPT_SCHEMA.fields)
        + [T.StructField("tool_meta", T.StringType(), True),
           T.StructField("score", T.DoubleType(), True)]
    )
    for schema in (TRANSCRIPT_SCHEMA, evolved):
        for ident in ("cat.db.transcripts", "transcripts"):
            a = IcebergMergeAdapter(None, ident, schema, n_buckets=32)
            for stmt in (
                a.create_table_sql(),
                a.live_view_sql(),
                a.epoch_guard_sql("app-1", 7),
                a.merge_sql(),
                a.merge_sql(source_view="other_batch"),
            ):
                parser.parsePlan(stmt)  # raises ParseException on bad syntax
