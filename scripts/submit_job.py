"""spark-submit entry point (north_rule deployment shape: ``spark-submit
--py-files investigraph_etl_spark.zip scripts/submit_job.py ...``).

The engine ships as a plain Python package zip on the executors' PYTHONPATH —
no install step. This driver script runs the flagship flow end-to-end:
generate a change tail → land it → streaming ingest into a fresh lake table →
verify the final state against the pandas replay oracle → print ONE JSON line.

Usage::

    cd /root/repo && zip -qr /tmp/engine.zip investigraph_etl_spark
    spark-submit --master 'local[8]' --py-files /tmp/engine.zip \
        scripts/submit_job.py --events 50000 --workdir /tmp/submit-demo

(See tests/test_submit.py for the automated run.)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--events", type=int, default=50_000)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--workdir", required=True)
    args = p.parse_args()

    # Under spark-submit the session master/conf come from the submit command.
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("cdc-submit-job").getOrCreate()

    import pandas as pd

    from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
    from investigraph_etl_spark.cdc.generator import (
        GeneratorConfig,
        generate_events,
        write_epoch_files,
    )
    from investigraph_etl_spark.cdc.oracle import replay_oracle
    from investigraph_etl_spark.lake.table import LakeTable
    from investigraph_etl_spark.streaming.ingest import IngestPipeline

    work = args.workdir
    shutil.rmtree(work, ignore_errors=True)
    landing = os.path.join(work, "landing")
    os.makedirs(landing)

    ev = generate_events(
        GeneratorConfig(
            n_events=args.events,
            n_convs=max(100, args.events // 50),
            seed=13,
            n_epochs=args.epochs,
        )
    )
    write_epoch_files(ev, landing, files_per_epoch=4)
    LakeTable.create(
        spark, os.path.join(work, "table"), TRANSCRIPT_SCHEMA, n_buckets=16, mode="mor"
    )
    t0 = time.time()
    results = IngestPipeline(
        spark,
        events_dir=landing,
        table_root=os.path.join(work, "table"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        max_files_per_trigger=4,
    ).run_available_now()
    wall = time.time() - t0

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    got = (
        LakeTable.load(spark, os.path.join(work, "table"))
        .read()
        .toPandas()[cols]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = replay_oracle(ev.drop(columns=["epoch"]))[cols].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    text_eq = (
        (got["text"].fillna("∅") == want["text"].fillna("∅")).mean() if len(got) else 1.0
    )

    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "events": len(ev),
                "events_applied": sum(r.get("events_applied", 0) for r in results),
                "epochs": len(results),
                "rows": len(got),
                "text_equality": float(text_eq),
                "wall_s": round(wall, 2),
                "master": spark.sparkContext.master,
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
