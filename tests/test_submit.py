"""north_rule deployment shape: the engine runs via ``spark-submit
--py-files <package.zip>`` — the library reaches the executors as a zip on
PYTHONPATH, no install. The submitted job runs the full flagship flow
(generate → land → streaming ingest → lake MERGE → replay-oracle verify) in
its own JVM and must report 100% per-turn text equality."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _package_zip(dest: str) -> str:
    pkg_root = os.path.join(REPO, "investigraph_etl_spark")
    zpath = os.path.join(dest, "investigraph_etl_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_py_files_end_to_end(tmp_path):
    zpath = _package_zip(str(tmp_path))
    spark_home = os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)),
        "lib",
        f"python{sys.version_info.major}.{sys.version_info.minor}",
        "site-packages",
        "pyspark",
    )
    submit = shutil.which("spark-submit") or os.path.join(spark_home, "bin", "spark-submit")
    env = {
        **os.environ,
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    }
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY way to the package
    proc = subprocess.run(
        [
            submit,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zpath,
            os.path.join(REPO, "scripts", "submit_job.py"),
            "--events",
            "20000",
            "--epochs",
            "3",
            "--workdir",
            str(tmp_path / "work"),
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=420,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")]
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert lines, proc.stdout[-2000:]
    res = json.loads(lines[0].removeprefix("SUBMIT_RESULT "))
    # the adversarial generator adds duplicate deliveries on top of n_events
    assert res["events"] >= 20000
    assert res["events_applied"] == res["events"]
    assert res["epochs"] == 3
    assert res["text_equality"] == 1.0
    assert res["master"] == "local[4]"
