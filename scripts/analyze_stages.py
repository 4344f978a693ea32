"""Stage-level autopsy of the ingest job at one parallelism level.

Runs the bench ingest at local[N] with the Spark UI's REST API enabled and
dumps every completed stage: tasks, wall duration, total executor run time,
and the core-utilization it implies. Run at two levels and diff to find
which stage anti-scales (scripts/profile_ingest.py showed the write job
itself, not the commit path, is what loses 1->4 efficiency).

Usage: python scripts/analyze_stages.py --cpus 4 [--events 1000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--events", type=int, default=None)
    args = ap.parse_args()
    if args.events:
        os.environ["SPARK_GRAFT_BENCH_EVENTS"] = str(args.events)

    from investigraph_etl_spark.session import get_spark

    spark = get_spark(
        app_name=f"stage-autopsy-{args.cpus}",
        master=f"local[{args.cpus}]",
        conf={**bench.BENCH_CONF, "spark.ui.enabled": "true",
              "spark.ui.port": "0"},
    )
    bench.run_ingest(spark, 50_000, n_epochs=1, warmup=False, use_pregen=False)
    sc = spark.sparkContext
    # mark the boundary: stages before this are warmup
    boundary = sc.parallelize([1]).count()  # noqa: F841  one throwaway job
    res = bench.run_ingest(spark, bench._n_events(), warmup=False)
    ui = sc.uiWebUrl
    app_id = sc.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=COMPLETE") as r:
        stages = json.loads(r.read())
    spark.stop()

    stages.sort(key=lambda s: s["stageId"])
    # drop everything up to and including the single-task boundary job
    b_idx = max(
        (i for i, s in enumerate(stages)
         if s["numTasks"] == 1 and "count" in (s.get("name") or "")),
        default=-1,
    )
    timed = stages[b_idx + 1:]
    total_run_ms = 0
    total_wall_ms = 0
    print(f"{'stage':>5} {'tasks':>5} {'wall_s':>8} {'cpu_s':>8} {'util':>5}  name")
    for s in timed:
        import datetime

        def ts(x):
            return datetime.datetime.strptime(x[:23], "%Y-%m-%dT%H:%M:%S.%f")

        wall = (ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])).total_seconds()
        run_s = s["executorRunTime"] / 1000.0
        util = run_s / max(wall * args.cpus, 1e-9)
        total_run_ms += s["executorRunTime"]
        total_wall_ms += wall * 1000
        print(f"{s['stageId']:>5} {s['numTasks']:>5} {wall:>8.2f} {run_s:>8.2f} {util:>5.2f}  {(s['name'] or '')[:70]}")
    print(f"\ningest_s={res['ingest_s']}  events/sec={res['events_per_sec']:,}")
    print(f"sum stage wall = {total_wall_ms/1000:.2f}s  sum executor cpu = {total_run_ms/1000:.2f}s"
          f"  overall util at {args.cpus} cores over ingest wall = "
          f"{total_run_ms/1000 / (res['ingest_s']*args.cpus):.2f}")


if __name__ == "__main__":
    main()
