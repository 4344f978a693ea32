"""The changelog as a native Spark data source (lake/stream_source.py):
batch face equals LakeTable.changes() bit-for-bit, the streaming face
resumes delta-only from its checkpoint, schema evolution null-fills older
files, COW merge commits are refused, and replicate_stream converges a
replica continuously with exactly-once application."""

from __future__ import annotations

import pandas as pd
import pytest

from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
from investigraph_etl_spark.cdc.resolve import resolve_lww
from investigraph_etl_spark.lake import stream_source
from investigraph_etl_spark.lake.table import LakeTable

T0 = pd.Timestamp("2025-03-01")


def _ev(spark, rows):
    return resolve_lww(spark.createDataFrame(pd.DataFrame(rows)))


def _r(op, conv, turn, text, hours, seq, **extra):
    return {"op": op, "conv_id": conv, "turn_idx": turn, "role": "user",
            "text": text, "tool": None,
            "ts": T0 + pd.Timedelta(hours=hours), "seq": seq, **extra}


def _mor(spark, root):
    t = LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=2, mode="mor")
    t.compact_threshold = 10**9
    t.merge(_ev(spark, [_r("insert", "c1", 0, "a", 0, 1),
                        _r("insert", "c2", 0, "b", 0, 2)]), app_id="x", epoch_id=0)
    t.merge(_ev(spark, [_r("update", "c1", 0, "a2", 1, 3),
                        _r("delete", "c2", 0, None, 1, 4)]), app_id="x", epoch_id=1)
    return t


def _sorted(pdf):
    return (pdf.sort_values(["_commit_version", "conv_id"])
            .reset_index(drop=True))


def test_batch_face_equals_changes(spark, tmp_table_root):
    t = _mor(spark, tmp_table_root)
    stream_source.register(spark)
    got = spark.read.format("lake_changes").option("path", tmp_table_root).load()
    ref = t.changes(0)
    assert got.schema == ref.schema
    pd.testing.assert_frame_equal(_sorted(got.toPandas()), _sorted(ref.toPandas()))


def test_batch_face_with_stamps_and_window(spark, tmp_table_root):
    t = _mor(spark, tmp_table_root)
    stream_source.register(spark)
    v1 = 2  # create=1, first merge=2
    got = (spark.read.format("lake_changes").option("path", tmp_table_root)
           .option("with_stamps", "true").option("since_version", v1).load())
    ref = t.changes(v1, with_stamps=True)
    assert got.schema == ref.schema
    pd.testing.assert_frame_equal(_sorted(got.toPandas()), _sorted(ref.toPandas()))
    assert set(got.toPandas()["conv_id"]) == {"c1", "c2"}  # second epoch only


def test_stream_resumes_delta_only_from_checkpoint(spark, tmp_path):
    t = _mor(spark, str(tmp_path / "t"))
    stream_source.register(spark)
    seen: list[tuple] = []

    def run(ckpt):
        del seen[:]
        q = (spark.readStream.format("lake_changes")
             .option("path", str(tmp_path / "t")).load()
             .writeStream.foreachBatch(
                 lambda df, eid: seen.extend(
                     (r.conv_id, r._change_type, r._commit_version)
                     for r in df.collect()))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run("ckpt")
    assert len(seen) == 4 and {c for c, *_ in seen} == {"c1", "c2"}

    t.merge(_ev(spark, [_r("insert", "c3", 0, "c", 2, 5)]), app_id="x", epoch_id=2)
    run("ckpt")  # same checkpoint: ONLY the new commit arrives
    assert seen == [("c3", "upsert", 4)]


def test_max_commits_per_trigger_drains_backlog_in_bounded_batches(spark, tmp_path):
    """A query against a 3-commit backlog with max_commits_per_trigger=1
    drains it across ≥3 micro-batches, each carrying one commit's rows."""
    import time

    t = _mor(spark, str(tmp_path / "t"))
    t.merge(_ev(spark, [_r("insert", "c3", 0, "c", 2, 5)]), app_id="x", epoch_id=2)
    stream_source.register(spark)
    batches: list[set] = []

    def sink(df, eid):
        vs = {r._commit_version for r in df.collect()}
        if vs:
            batches.append(vs)

    q = (spark.readStream.format("lake_changes")
         .option("path", str(tmp_path / "t"))
         .option("max_commits_per_trigger", "1").load()
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="500 milliseconds").start())
    try:
        deadline = time.time() + 120
        while sum(len(b) for b in batches) < 3:
            assert time.time() < deadline, f"stalled: {batches}"
            assert q.isActive, f"query died: {q.exception()}"
            time.sleep(0.25)
    finally:
        q.stop()
    assert all(len(b) == 1 for b in batches)  # one commit per micro-batch
    assert sorted(v for b in batches for v in b) == [2, 3, 4]


def test_max_commits_cap_no_reemission_after_restart(spark, tmp_path):
    """Restart regression: a fresh reader has no memory of the checkpoint,
    so a capped latestOffset starts below the restored offset — the floor
    guard must keep the catch-up window from re-emitting already-delivered
    commits, and the offset ladder must climb past the restore point
    instead of stalling."""
    import time

    t = _mor(spark, str(tmp_path / "t"))
    stream_source.register(spark)
    seen: list[tuple] = []

    def run_until(n_rows):
        q = (spark.readStream.format("lake_changes")
             .option("path", str(tmp_path / "t"))
             .option("max_commits_per_trigger", "1").load()
             .writeStream.foreachBatch(
                 lambda df, eid: seen.extend(
                     (r.conv_id, r._commit_version) for r in df.collect()))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(processingTime="300 milliseconds").start())
        try:
            deadline = time.time() + 120
            while len(seen) < n_rows:
                assert time.time() < deadline, f"stalled at {seen}"
                assert q.isActive, f"query died: {q.exception()}"
                time.sleep(0.2)
        finally:
            q.stop()

    run_until(4)  # the 4 change rows of the 2 data commits
    assert len(seen) == 4

    # new commit while the query is DOWN, then restart with the same ckpt
    t.merge(_ev(spark, [_r("insert", "c9", 0, "post", 3, 9)]),
            app_id="x", epoch_id=2)
    run_until(5)
    assert len(seen) == 5  # exactly ONE new row — nothing re-emitted
    assert seen[-1] == ("c9", 4)


def test_schema_evolution_null_fills_older_files(spark, tmp_table_root):
    t = _mor(spark, tmp_table_root)
    t.merge(_ev(spark, [_r("insert", "c4", 0, "d", 2, 6, lang="en")]),
            app_id="x", epoch_id=2)
    stream_source.register(spark)
    got = (spark.read.format("lake_changes").option("path", tmp_table_root)
           .load().toPandas())
    by_conv = got.set_index("conv_id")["lang"]
    assert by_conv["c4"] == "en" and pd.isna(by_conv["c1"]).all()


def test_cow_merge_commit_refused(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
                         n_buckets=2, mode="cow")
    t.merge(_ev(spark, [_r("insert", "c1", 0, "a", 0, 1)]), app_id="x", epoch_id=0)
    t.merge(_ev(spark, [_r("update", "c1", 0, "a2", 1, 2)]), app_id="x", epoch_id=1)
    stream_source.register(spark)
    with pytest.raises(Exception, match="copy-on-write"):
        (spark.read.format("lake_changes")
         .option("path", str(tmp_path / "t")).load().collect())


def test_replicate_stream_live_follow(spark, tmp_path):
    """Processing-time mode: the replica follows commits made WHILE the
    query runs — inserts and deletes arrive across multiple triggers with
    no restarts, and idle triggers commit nothing."""
    import time

    from investigraph_etl_spark.lake.replicate import replicate_stream

    src = _mor(spark, str(tmp_path / "src"))
    dst = LakeTable.create(spark, str(tmp_path / "dst"), TRANSCRIPT_SCHEMA,
                           n_buckets=2, mode="mor")

    def state(t):
        return {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}

    q = replicate_stream(spark, str(tmp_path / "src"), dst,
                         str(tmp_path / "ckpt"), consumer_id="live",
                         trigger={"processingTime": "1 second"})
    try:
        def wait_until(pred, timeout=120):
            deadline = time.time() + timeout
            while not pred():
                assert time.time() < deadline, "replica stalled"
                assert q.isActive, f"query died: {q.exception()}"
                time.sleep(0.3)

        wait_until(lambda: state(dst) == state(src))
        src.merge(_ev(spark, [_r("insert", "c5", 0, "live", 4, 9)]),
                  app_id="x", epoch_id=5)
        wait_until(lambda: ("c5", 0) in state(dst))
        src.merge(_ev(spark, [_r("delete", "c5", 0, None, 5, 10)]),
                  app_id="x", epoch_id=6)
        wait_until(lambda: ("c5", 0) not in state(dst)
                   and state(dst) == state(src))
        # idle triggers between the waves committed nothing on the replica:
        # one create + exactly one commit per non-empty micro-batch
        n_data_commits = len([c for c in dst.history() if c["added"]])
        assert n_data_commits <= 3
    finally:
        q.stop()


def test_replicate_stream_converges_and_resumes(spark, tmp_path):
    from investigraph_etl_spark.lake.replicate import replicate_stream

    src = _mor(spark, str(tmp_path / "src"))
    dst = LakeTable.create(spark, str(tmp_path / "dst"), TRANSCRIPT_SCHEMA,
                           n_buckets=2, mode="mor")
    ckpt = str(tmp_path / "ckpt")

    def state(t):
        return {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}

    q = replicate_stream(spark, str(tmp_path / "src"), dst, ckpt)
    q.awaitTermination(120)
    assert state(dst) == state(src) == {("c1", 0): "a2"}

    # incremental cycle: one more source epoch (incl. a late stale update
    # that must lose on the replica exactly as it loses at the source)
    src.merge(_ev(spark, [_r("insert", "c3", 0, "c", 3, 7),
                          _r("update", "c1", 0, "stale", 0, 8)]),
              app_id="x", epoch_id=2)
    v = dst.version
    q = replicate_stream(spark, str(tmp_path / "src"), dst, ckpt)
    q.awaitTermination(120)
    assert state(dst) == state(src)
    assert state(dst)[("c1", 0)] == "a2" and ("c3", 0) in state(dst)
    assert dst.version == v + 1  # exactly one replica commit for the delta

    # idle cycle: nothing new → no commit on the replica
    q = replicate_stream(spark, str(tmp_path / "src"), dst, ckpt)
    q.awaitTermination(120)
    assert dst.version == v + 1
