"""Per-epoch phase breakdown of the CDC ingest at two parallelism levels.

Round-3 verdict #1: at 1→4 cores the hardware calibration scales ~3.5–3.9×
but ingest scaled only 2.30× — ~35% of ideal lost INSIDE the engine. This
script measures where: it runs the exact bench ingest (same generator, same
files-per-epoch, same conf) at local[N] and local[4N] on one pre-generated
landing dir, with investigraph_etl_spark.profiling collecting per-phase wall
time, and prints the serial-vs-parallel decomposition plus the efficiency
each phase predicts.

Usage:
    python scripts/profile_ingest.py [--pair 1,4] [--rounds 2] [--events N]

Each (level, round) runs in a fresh subprocess (fresh JVM) and rounds are
interleaved across levels to cancel host CPU drift; per level the best run
(highest events/sec) is kept.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: shared conf + ingest body)


def child(cpus: int) -> None:
    """One warmed-up, phase-collected ingest at local[cpus]."""
    from investigraph_etl_spark.profiling import collecting
    from investigraph_etl_spark.session import get_spark

    spark = get_spark(
        app_name=f"profile-{cpus}", master=f"local[{cpus}]", conf=bench.BENCH_CONF
    )
    bench.run_ingest(spark, 50_000, n_epochs=1, warmup=False, use_pregen=False)
    with collecting() as timer:
        res = bench.run_ingest(spark, bench._n_events(), warmup=False)
    spark.stop()
    phases = timer.report()
    epoch_total = phases.get("epoch", {}).get("total_s", 0.0)
    print("PROFILE_RESULT " + json.dumps({
        "cpus": cpus,
        "events_per_sec": res["events_per_sec"],
        "ingest_s": res["ingest_s"],
        "epochs": res["epochs"],
        "events": res["events"],
        "stream_overhead_s": round(res["ingest_s"] - epoch_total, 3),
        "phases": phases,
    }))


def run_child(cpus: int) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", str(cpus)],
        capture_output=True, text=True, env={**os.environ},
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("PROFILE_RESULT ")]
    if not lines:
        sys.stderr.write(p.stdout + p.stderr)
        raise RuntimeError(f"profile child local[{cpus}] failed")
    return json.loads(lines[0].removeprefix("PROFILE_RESULT "))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--pair", default="1,4")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--events", type=int, default=None)
    args = ap.parse_args()
    if args.child is not None:
        child(args.child)
        return
    if args.events:
        os.environ["SPARK_GRAFT_BENCH_EVENTS"] = str(args.events)
    n, n4 = (int(x) for x in args.pair.split(","))

    from investigraph_etl_spark.cdc.generator import (
        GeneratorConfig, generate_events, write_epoch_files,
    )
    n_events = bench._n_events()
    n_epochs = int(os.environ.get("SPARK_GRAFT_BENCH_EPOCHS", "4"))
    pregen = tempfile.mkdtemp(prefix="profile-landing-", dir=bench.BENCH_DIR)
    ev = generate_events(GeneratorConfig(
        n_events=n_events, n_convs=max(100, n_events // 50), seed=7,
        n_epochs=n_epochs,
        text_words=int(os.environ.get("SPARK_GRAFT_BENCH_TEXT_WORDS", "8")),
    ))
    write_epoch_files(ev, pregen, files_per_epoch=int(
        os.environ.get("SPARK_GRAFT_BENCH_FILES_PER_EPOCH", "16")))
    del ev
    os.environ["SPARK_GRAFT_PREGEN_LANDING"] = pregen

    best: dict[int, dict] = {}
    try:
        for _ in range(args.rounds):
            for cpus in (n, n4):
                res = run_child(cpus)
                if cpus not in best or res["events_per_sec"] > best[cpus]["events_per_sec"]:
                    best[cpus] = res
    finally:
        shutil.rmtree(pregen, ignore_errors=True)
        os.environ.pop("SPARK_GRAFT_PREGEN_LANDING", None)

    lo, hi = best[n], best[n4]
    names = sorted(set(lo["phases"]) | set(hi["phases"]))
    print(f"\n{'phase':<16} {'local[' + str(n) + ']':>10} {'local[' + str(n4) + ']':>10} {'ratio':>7}")
    for name in names:
        a = lo["phases"].get(name, {}).get("total_s", 0.0)
        b = hi["phases"].get(name, {}).get("total_s", 0.0)
        print(f"{name:<16} {a:>10.3f} {b:>10.3f} {(a / b if b else float('inf')):>7.2f}")
    print(f"{'stream_overhead':<16} {lo['stream_overhead_s']:>10.3f} {hi['stream_overhead_s']:>10.3f}")
    print(f"{'TOTAL ingest_s':<16} {lo['ingest_s']:>10.3f} {hi['ingest_s']:>10.3f}")
    sp = hi["events_per_sec"] / lo["events_per_sec"]
    print(f"\nevents/sec: {lo['events_per_sec']:,.0f} -> {hi['events_per_sec']:,.0f}  "
          f"speedup {sp:.2f}x  efficiency {sp / (n4 / n):.3f}")
    print("RAW " + json.dumps({"pair": [n, n4], "low": lo, "high": hi}))


if __name__ == "__main__":
    main()
