"""Benchmark harness: headline CDC ingest throughput + per-query timings.

Prints ONE JSON line:
  {"metric": ..., "value": <events/sec>, "unit": "events/sec",
   "queries": {<name>: seconds, ...}, "sf": <sf>, ...}

Headline: a synthetic transcript change tail (deterministic, adversarial —
skew/late/duplicates, investigraph_etl_spark.cdc.generator) is ingested
end-to-end: Structured Streaming availableNow over the landing dir →
foreachBatch normalize → LWW resolve → copy-on-write MERGE into a LakeTable
with exactly-once commit log + lineage metrics. value = events applied / wall
seconds (the BASELINE.json north-star metric).

Scaling evidence (north_rule two-cluster-size criterion, sandboxed per driver
instruction): ``python bench.py --scaling`` runs the identical ingest at
local[8] and local[32] in fresh subprocesses and reports throughput at both
plus efficiency = (T8/T32)/(32/8); results land in BENCH.md.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
(default 32), SPARK_GRAFT_BENCH_EVENTS (default scaled by sf).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

#: queries() entries timed per round (full registry; collect() to materialize).
QUERY_NAMES = None  # None = all


def _sf() -> float:
    name = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return -1.0


def _n_events() -> int:
    if "SPARK_GRAFT_BENCH_EVENTS" in os.environ:
        return int(os.environ["SPARK_GRAFT_BENCH_EVENTS"])
    # ~10M events/sf-unit: sf0.1 → 1M (large enough that fixed overhead is
    # amortized, small enough for a per-round run).
    return max(20_000, int(10_000_000 * _sf()))


def run_ingest(spark, n_events: int, n_epochs: int = 4) -> dict:
    """Generate a tail, land it, ingest end-to-end; return timing metrics."""
    from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
    from investigraph_etl_spark.cdc.generator import (
        GeneratorConfig,
        generate_events,
        write_epoch_files,
    )
    from investigraph_etl_spark.lake.table import LakeTable
    from investigraph_etl_spark.streaming.ingest import IngestPipeline

    work = tempfile.mkdtemp(prefix="bench-ingest-")
    landing = os.path.join(work, "landing")
    os.makedirs(landing)
    t0 = time.time()
    ev = generate_events(
        GeneratorConfig(n_events=n_events, n_convs=max(100, n_events // 50), seed=7, n_epochs=n_epochs)
    )
    write_epoch_files(ev, landing)
    gen_s = time.time() - t0

    LakeTable.create(spark, os.path.join(work, "table"), TRANSCRIPT_SCHEMA, n_buckets=32)
    pipe = IngestPipeline(
        spark,
        events_dir=landing,
        table_root=os.path.join(work, "table"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        max_files_per_trigger=1,
    )
    t1 = time.time()
    results = pipe.run_available_now()
    ingest_s = time.time() - t1
    applied = sum(r.get("events_applied", 0) for r in results)
    shutil.rmtree(work, ignore_errors=True)
    return {
        "events": len(ev),
        "events_applied": applied,
        "epochs": len(results),
        "gen_s": round(gen_s, 2),
        "ingest_s": round(ingest_s, 2),
        "events_per_sec": round(len(ev) / ingest_s, 1),
    }


def run_queries(spark) -> dict[str, float]:
    from investigraph_etl_spark.plans.queries import QUERIES

    names = QUERY_NAMES or list(QUERIES)
    out = {}
    for name in names:
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).collect()
        out[name] = round(time.time() - t0, 3)
    return out


def main() -> dict:
    from investigraph_etl_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    ingest = run_ingest(spark, _n_events())
    queries = run_queries(spark)
    spark.stop()
    return {
        "metric": (
            "change-events/sec applied end-to-end "
            "(streaming ingest -> LWW resolve -> lake MERGE, exactly-once)"
        ),
        "value": ingest["events_per_sec"],
        "unit": "events/sec",
        "queries": queries,
        "sf": _sf(),
        "ingest": ingest,
        "cpus": CPUS,
    }


def _scaling_child(cpus: int) -> None:
    """Subprocess body: one ingest run at local[cpus], print JSON."""
    from investigraph_etl_spark.session import get_spark

    spark = get_spark(app_name=f"bench-scale-{cpus}", master=f"local[{cpus}]")
    res = run_ingest(spark, _n_events())
    spark.stop()
    print("SCALE_RESULT " + json.dumps({"cpus": cpus, **res}))


def scaling() -> None:
    """local[8] vs local[32] on identical input → BENCH.md."""
    import subprocess

    rows = []
    for cpus in (8, 32):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child", str(cpus)],
            capture_output=True,
            text=True,
            env={**os.environ},
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("SCALE_RESULT ")]
        if not line:
            sys.stderr.write(p.stdout + p.stderr)
            raise RuntimeError(f"scaling child local[{cpus}] failed")
        rows.append(json.loads(line[0].removeprefix("SCALE_RESULT ")))
    r8, r32 = rows
    ratio = r32["events_per_sec"] / r8["events_per_sec"]
    eff = ratio / (32 / 8)
    report = {
        "local8_events_per_sec": r8["events_per_sec"],
        "local32_events_per_sec": r32["events_per_sec"],
        "speedup_8_to_32": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
        "events": r8["events"],
        "sf": _sf(),
    }
    print(json.dumps(report))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run ({time.strftime('%Y-%m-%d %H:%M:%S')} UTC)\n\n"
            f"Identical ingest job ({r8['events']:,} events, 4 epochs, sf={_sf()}) "
            f"at two parallelism levels (sandbox stand-in for N vs 4N executors "
            f"per driver instruction):\n\n"
            f"| parallelism | ingest wall (s) | events/sec |\n|---|---|---|\n"
            f"| local[8] | {r8['ingest_s']} | {r8['events_per_sec']:,} |\n"
            f"| local[32] | {r32['ingest_s']} | {r32['events_per_sec']:,} |\n\n"
            f"Speedup 8→32 = **{ratio:.2f}×**; scaling efficiency = "
            f"(T8/T32)/(32/8) = **{eff:.2f}** (target ≥ 0.8 per BASELINE.json).\n"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        scaling()
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        _scaling_child(int(sys.argv[2]))
    else:
        print(json.dumps(main()))
