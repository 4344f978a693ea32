"""End-to-end drive through the PUBLIC library API (verify skill recipe)."""
import os, shutil, sys, tempfile
import pandas as pd

from investigraph_etl_spark.session import get_spark
from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
from investigraph_etl_spark.cdc.generator import GeneratorConfig, generate_events, write_epoch_files
from investigraph_etl_spark.cdc.oracle import replay_oracle
from investigraph_etl_spark.lake.table import LakeTable
from investigraph_etl_spark.streaming.ingest import IngestPipeline

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
work = tempfile.mkdtemp(prefix="verify-drive-")
landing, staging = f"{work}/landing", f"{work}/staging"
os.makedirs(landing)

spark = get_spark(master="local[8]", conf={"spark.sql.shuffle.partitions": "8"})
ev = generate_events(GeneratorConfig(n_events=20_000, seed=99, n_epochs=10))
paths = write_epoch_files(ev, staging)

# land first 6 epochs, ingest
for p in paths[:6]:
    shutil.move(p, landing)
LakeTable.create(spark, f"{work}/table", TRANSCRIPT_SCHEMA, n_buckets=16)
pipe = IngestPipeline(spark, landing, f"{work}/table", f"{work}/ckpt", max_files_per_trigger=2)
r1 = pipe.run_available_now()
print("phase1 epochs:", len(r1), "applied:", sum(r.get("events_applied",0) for r in r1))

# move the rest in, resume with SAME checkpoint
for p in paths[6:]:
    shutil.move(p, landing)
pipe2 = IngestPipeline(spark, landing, f"{work}/table", f"{work}/ckpt", max_files_per_trigger=2)
r2 = pipe2.run_available_now()
print("phase2 epochs:", len(r2), "applied:", sum(r.get("events_applied",0) for r in r2))

def table_pdf():
    t = LakeTable.load(spark, f"{work}/table")
    return (t.read().toPandas()[PAYLOAD]
            .sort_values(["conv_id","turn_idx"], kind="stable").reset_index(drop=True))

got = table_pdf()
want = replay_oracle(ev)[PAYLOAD]
pd.testing.assert_frame_equal(got, want, check_dtype=False)
print("ORACLE MATCH:", len(got), "rows; per-turn text equality 100%")

# probe: re-ingest with FRESH checkpoint — re-applies (new token) but table unchanged (LWW idempotent)
pipe3 = IngestPipeline(spark, landing, f"{work}/table", f"{work}/ckpt2", max_files_per_trigger=4)
r3 = pipe3.run_available_now()
skipped = sum(1 for r in r3 if r.get("skipped"))
print("fresh-ckpt epochs:", len(r3), "falsely-deduped:", skipped)
assert skipped == 0, "fresh checkpoint must NOT be deduped against old token"
got2 = table_pdf()
pd.testing.assert_frame_equal(got2, want, check_dtype=False)
print("fresh-ckpt re-apply: table unchanged OK")

# probe: load missing path
try:
    LakeTable.load(spark, f"{work}/nope")
    print("FAIL: load missing did not raise")
except FileNotFoundError as e:
    print("load missing path raises FileNotFoundError OK")

# probe: double create
try:
    LakeTable.create(spark, f"{work}/table", TRANSCRIPT_SCHEMA)
    print("FAIL: double create did not raise")
except FileExistsError:
    print("double create raises FileExistsError OK")

# lineage metrics present
from investigraph_etl_spark.cdc.apply import read_metrics
m = read_metrics(LakeTable.load(spark, f"{work}/table")).toPandas()
print("metrics rows:", len(m), "cols:", list(m.columns))
assert {"epoch_id","bucket","events_applied","conflicts_resolved","watermark_pos"} <= set(m.columns)

spark.stop(); shutil.rmtree(work, ignore_errors=True)
print("DRIVE PASSED")
