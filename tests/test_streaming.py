"""Streaming ingest: offset tracking, kill/resume, crash-retry exactly-once,
fresh-checkpoint redelivery safety. All state is (checkpoint offsets + table
commit log) — the reference's task-cache idempotency discipline
(/root/reference/investigraph/pipeline.py:37-47) generalized."""

import os
import shutil

import pandas as pd
import pytest

from investigraph_etl_spark.cdc.apply import apply_events_batch
from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
from investigraph_etl_spark.cdc.generator import GeneratorConfig, generate_events, write_epoch_files
from investigraph_etl_spark.cdc.oracle import replay_oracle
from investigraph_etl_spark.lake.table import LakeTable
from investigraph_etl_spark.streaming.ingest import IngestPipeline

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _final(spark, root):
    t = LakeTable.load(spark, root)
    return (
        t.read().toPandas()[PAYLOAD]
        .sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    )


@pytest.fixture()
def tail(tmp_path):
    ev = generate_events(GeneratorConfig(n_events=5000, seed=21, n_epochs=6))
    staging = str(tmp_path / "staging")
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    paths = write_epoch_files(ev, staging)
    return ev, paths, landing, str(tmp_path)


def test_stream_kill_and_resume(spark, tail):
    """Land half the tail, drain, land the rest, resume SAME checkpoint:
    already-read files are not re-read; final state matches the oracle."""
    ev, paths, landing, base = tail
    troot, ckpt = f"{base}/table", f"{base}/ckpt"
    LakeTable.create(spark, troot, TRANSCRIPT_SCHEMA, n_buckets=8)

    for p in paths[:3]:
        shutil.move(p, landing)
    p1 = IngestPipeline(spark, landing, troot, ckpt, app_id="kr", max_files_per_trigger=1)
    r1 = p1.run_available_now()
    assert len(r1) == 3 and not any(r.get("skipped") for r in r1)

    for p in paths[3:]:
        shutil.move(p, landing)
    p2 = IngestPipeline(spark, landing, troot, ckpt, app_id="kr", max_files_per_trigger=1)
    r2 = p2.run_available_now()
    # resume processed ONLY the new files (offsets survived the restart)
    assert len(r2) == 3
    assert sum(r["events_applied"] for r in r1 + r2) == len(ev)

    want = replay_oracle(ev.drop(columns=["epoch"]))
    pd.testing.assert_frame_equal(_final(spark, troot), want, check_dtype=False)


def test_stream_crash_retry_exactly_once(spark, tail):
    """foreachBatch crashes AFTER the merge commits but before the epoch is
    acknowledged → restart re-delivers the same batch id → commit log skips it."""
    ev, paths, landing, base = tail
    troot, ckpt = f"{base}/table", f"{base}/ckpt"
    LakeTable.create(spark, troot, TRANSCRIPT_SCHEMA, n_buckets=8)
    for p in paths:
        shutil.move(p, landing)

    class CrashingPipeline(IngestPipeline):
        def _apply(self, batch_df, batch_id):
            super()._apply(batch_df, batch_id)
            if batch_id == 1:  # die after the merge committed epoch 1
                raise RuntimeError("injected crash after commit")

    crash = CrashingPipeline(spark, landing, troot, ckpt, app_id="cr", max_files_per_trigger=2)
    with pytest.raises(Exception, match="injected crash"):
        crash.run_available_now()

    resumed = IngestPipeline(spark, landing, troot, ckpt, app_id="cr", max_files_per_trigger=2)
    r2 = resumed.run_available_now()
    # batch 1 re-delivered, detected in the commit log, skipped — applied once.
    assert any(r.get("skipped") for r in r2)

    want = replay_oracle(ev.drop(columns=["epoch"]))
    pd.testing.assert_frame_equal(_final(spark, troot), want, check_dtype=False)


def test_stream_fresh_checkpoint_redelivery_safe(spark, tail):
    """Losing the checkpoint and re-ingesting everything must not corrupt the
    table: new checkpoint → new commit token → full re-apply → LWW no-op."""
    ev, paths, landing, base = tail
    troot = f"{base}/table"
    LakeTable.create(spark, troot, TRANSCRIPT_SCHEMA, n_buckets=8)
    for p in paths:
        shutil.move(p, landing)

    IngestPipeline(spark, landing, troot, f"{base}/ck1", app_id="fc").run_available_now()
    before = _final(spark, troot)

    r = IngestPipeline(spark, landing, troot, f"{base}/ck2", app_id="fc").run_available_now()
    # different checkpoint ⇒ different token ⇒ NOT falsely deduped...
    assert not any(x.get("skipped") for x in r)
    # ...and the re-apply is a semantic no-op.
    pd.testing.assert_frame_equal(before, _final(spark, troot))


def test_stream_tokens_differ_per_checkpoint(spark, tmp_path):
    a = IngestPipeline(None, "x", "y", str(tmp_path / "a"), app_id="p")
    b = IngestPipeline(None, "x", "y", str(tmp_path / "b"), app_id="p")
    assert a.commit_token != b.commit_token
    assert a.commit_token == IngestPipeline(None, "x", "y", str(tmp_path / "a"), app_id="p").commit_token


def test_stream_continuous_tail_soak(spark, tail):
    """start_tail() soak: a processing-time-trigger query follows the landing
    dir across ≥3 triggers while epochs arrive OUT OF ORDER (late delivery)
    and one file is re-delivered verbatim (at-least-once source). The table
    must converge to the replay oracle — LWW is order-insensitive and the
    duplicate re-apply is a semantic no-op."""
    import time

    ev, paths, landing, base = tail
    troot, ckpt = f"{base}/table", f"{base}/ckpt"
    LakeTable.create(spark, troot, TRANSCRIPT_SCHEMA, n_buckets=8)
    pipe = IngestPipeline(spark, landing, troot, ckpt, app_id="soak")
    q = pipe.start_tail(processing_time="1 second")
    try:
        def applied():
            return sum(r.get("events_applied", 0) for r in pipe.results)

        def wait_for(n, timeout=120):
            deadline = time.time() + timeout
            while applied() < n:
                assert time.time() < deadline, f"stalled at {applied()}/{n}"
                assert q.isActive, f"query died: {q.exception()}"
                time.sleep(0.25)

        n_per = ev.groupby("epoch").size().to_dict()
        # wave 1: epochs 0-1 in order
        for p in paths[:2]:
            shutil.move(p, landing)
        w1 = n_per[0] + n_per[1]
        wait_for(w1)
        # wave 2: epochs 4-5 arrive BEFORE 2-3 (out-of-order tail)
        for p in paths[4:]:
            shutil.move(p, landing)
        w2 = w1 + n_per[4] + n_per[5]
        wait_for(w2)
        # wave 3: the stragglers 2-3, plus epoch 0's file re-delivered
        # verbatim under a new name (at-least-once duplicate)
        shutil.copy(
            os.path.join(landing, os.path.basename(paths[0])),
            os.path.join(landing, "zz-dup-" + os.path.basename(paths[0])),
        )
        for p in paths[2:4]:
            shutil.move(p, landing)
        wait_for(w2 + n_per[2] + n_per[3] + n_per[0])
    finally:
        q.stop()

    # ≥3 distinct micro-batches actually carried data (one per wave minimum)
    assert len([r for r in pipe.results if r.get("events_applied", 0) > 0]) >= 3
    want = replay_oracle(ev.drop(columns=["epoch"]))
    pd.testing.assert_frame_equal(_final(spark, troot), want, check_dtype=False)


def test_stream_schema_evolution_on_restart(spark, tmp_path):
    """North-star additive schema evolution, streaming form: a tail whose
    later epochs carry NEW columns (tool metadata) is ingested in two stream
    runs sharing one checkpoint — run 2 restarts with the WIDENED event
    schema, reads only the new files, the table schema widens on commit, and
    pre-evolution rows surface the new columns as nulls."""
    from pyspark.sql import types as T

    from investigraph_etl_spark.cdc.events import CHANGE_EVENT_SCHEMA

    base = generate_events(GeneratorConfig(n_events=1500, seed=31, n_epochs=2))
    evolved = generate_events(
        GeneratorConfig(n_events=1500, seed=32, n_epochs=2, evolve_from_epoch=0)
    )
    evolved["seq"] += 10_000_000
    evolved["conv_id"] = evolved["conv_id"].str.replace("conv-", "conv-evo-")

    landing = str(tmp_path / "landing")
    staging = str(tmp_path / "staging")
    os.makedirs(landing)
    base_paths = write_epoch_files(base, staging)
    for p in base_paths:
        shutil.move(p, os.path.join(landing, os.path.basename(p)))

    root = str(tmp_path / "table")
    LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=8, mode="mor")
    ckpt = str(tmp_path / "ckpt")
    IngestPipeline(
        spark, events_dir=landing, table_root=root, checkpoint_dir=ckpt
    ).run_available_now()
    t = LakeTable.load(spark, root)
    assert "tool_version" not in [f.name for f in t.schema().fields]

    # land the evolved epochs under later-sorting names, restart with the
    # widened schema and the SAME checkpoint
    for p in write_epoch_files(evolved, staging):
        shutil.move(
            p, os.path.join(landing, "z-" + os.path.basename(p))
        )
    widened = T.StructType(
        list(CHANGE_EVENT_SCHEMA.fields)
        + [
            T.StructField("tool_version", T.StringType(), True),
            T.StructField("tokens", T.IntegerType(), True),
        ]
    )
    results = IngestPipeline(
        spark,
        events_dir=landing,
        table_root=root,
        checkpoint_dir=ckpt,
        event_schema=widened,
    ).run_available_now()
    applied = sum(r.get("events_applied", 0) for r in results)
    assert applied == len(evolved)  # base files were NOT re-read

    t = LakeTable.load(spark, root)
    cols = [f.name for f in t.schema().fields]
    assert "tool_version" in cols and "tokens" in cols
    out = t.read().toPandas()
    pre = out[~out["conv_id"].str.startswith("conv-evo-")]
    post = out[out["conv_id"].str.startswith("conv-evo-")]
    assert len(pre) and len(post)
    assert pre["tool_version"].isna().all()  # old rows: evolved cols null
    assert post["tool_version"].notna().any()
