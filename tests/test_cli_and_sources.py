"""CLI surface + source-format coverage: JSON change tails, glob sources,
watermarked stream-dedup, metadata export (SURVEY O1/O21-O23; reference CLI
tests /root/reference/tests/test_cli.py:17-55)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
from investigraph_etl_spark.cdc.generator import (
    GeneratorConfig,
    generate_events,
    write_epoch_files,
)
from investigraph_etl_spark.cdc.oracle import replay_oracle
from investigraph_etl_spark.cli import main as cli_main
from investigraph_etl_spark.lake.table import LakeTable
from investigraph_etl_spark.streaming.ingest import IngestPipeline

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _final(table):
    return (
        table.read().toPandas()[PAYLOAD]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


def test_json_change_tail_ingest(spark, tmp_path):
    """The tail lands as JSON-lines instead of parquet (reference extracts
    JSON sources, /root/reference/investigraph/logic/extract.py:14-15)."""
    ev = generate_events(GeneratorConfig(n_events=2000, seed=17, n_epochs=3))
    landing = str(tmp_path / "landing")
    write_epoch_files(ev, landing, fmt="json")
    table = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, n_buckets=4, mode="mor")
    pipe = IngestPipeline(
        spark, landing, str(tmp_path / "t"), str(tmp_path / "ckpt"), fmt="json"
    )
    pipe.run_available_now()
    want = replay_oracle(ev.drop(columns=["epoch"]))[PAYLOAD]
    got = _final(table)
    # JSON carries ISO-microsecond ts; compare on equal terms
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_watermarked_stream_dedup_matches_oracle(spark, tmp_path):
    ev = generate_events(
        GeneratorConfig(n_events=3000, seed=23, n_epochs=3, p_duplicate=0.2)
    )
    landing = str(tmp_path / "landing")
    write_epoch_files(ev, landing)
    table = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, n_buckets=4, mode="mor")
    pipe = IngestPipeline(
        spark,
        landing,
        str(tmp_path / "t"),
        str(tmp_path / "ckpt"),
        dedup_within_watermark="2 hours",
    )
    pipe.run_available_now()
    want = replay_oracle(ev.drop(columns=["epoch"]))[PAYLOAD]
    pd.testing.assert_frame_equal(_final(table), want, check_dtype=False)


def test_glob_source_reads_multiple_files(spark, tmp_path):
    """O1 seed: glob discovery (reference fsspec glob,
    /root/reference/investigraph/logic/seed.py:14-23)."""
    from investigraph_etl_spark.config import read_source

    for i in range(3):
        pd.DataFrame({"a": [i]}).to_csv(tmp_path / f"part-{i}.csv", index=False)
    df = read_source(
        spark, {"format": "csv", "path": str(tmp_path / "part-*.csv")}
    )
    assert df.count() == 3


def test_metadata_export_index_json(spark, tmp_path):
    ev = generate_events(GeneratorConfig(n_events=500, seed=29, n_epochs=1))
    table = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, n_buckets=4)
    from investigraph_etl_spark.cdc.apply import apply_events_batch

    apply_events_batch(
        table, spark.createDataFrame(ev.drop(columns=["epoch"])), app_id="m", epoch_id=0
    )
    meta = table.export_metadata()
    assert meta["stats"]["events_applied"] == len(ev)
    assert meta["committed_epochs"] == 1
    on_disk = json.load(open(os.path.join(str(tmp_path / "t"), "index.json")))
    assert on_disk == json.loads(json.dumps(meta))
    assert [c["name"] for c in on_disk["schema"]] == PAYLOAD


def test_cli_inspect_and_run(spark, tmp_path, capsys):
    pd.DataFrame(
        {"Name": [f"N{i}" for i in range(20)], "Category": ["A"] * 20}
    ).to_csv(tmp_path / "src.csv", index=False)
    cfg = {
        "name": "t",
        "source": {"format": "csv", "path": str(tmp_path / "src.csv")},
        "columns": {"name": {"column": "Name"}},
        "sink": {"kind": "parquet", "uri": str(tmp_path / "out")},
    }
    import yaml

    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    assert cli_main(["inspect", "-c", str(cfg_path), "-n", "3"]) == 0
    out = capsys.readouterr().out
    assert "N0" in out

    assert cli_main(["run", "-c", str(cfg_path)]) == 0
    assert spark.read.parquet(str(tmp_path / "out")).count() == 20


def test_cli_history_and_vacuum(spark, tmp_path, capsys):
    ev = generate_events(GeneratorConfig(n_events=300, seed=31, n_epochs=2))
    root = str(tmp_path / "t")
    table = LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=2, mode="mor")
    from investigraph_etl_spark.cdc.apply import apply_events_batch

    for epoch, part in ev.groupby("epoch", sort=True):
        apply_events_batch(
            table, spark.createDataFrame(part.drop(columns=["epoch"])), "h", int(epoch)
        )
    table.compact()
    assert cli_main(["history", "--table", root]) == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) >= 3  # create + merge + compaction
    assert cli_main(["vacuum", "--table", root, "--orphan-grace-s", "0"]) == 0
    assert json.loads(capsys.readouterr().out)["files_removed"] > 0


def test_cli_read_where_and_changes(spark, tmp_path, capsys):
    """`read --where` reports pruning and filters; `changes --since` emits
    the changelog as JSONL."""
    from investigraph_etl_spark.cdc.apply import apply_events_batch

    root = str(tmp_path / "t")
    table = LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=4, mode="mor")
    ev = generate_events(GeneratorConfig(n_events=400, seed=31, n_epochs=2))
    for e, g in ev.groupby("epoch"):
        apply_events_batch(
            table, spark.createDataFrame(g.drop(columns=["epoch"])),
            app_id="cli", epoch_id=int(e),
        )
    assert cli_main(["read", "--table", root, "--where", "turn_idx<=1"]) == 0
    out = capsys.readouterr()
    rows = [json.loads(line) for line in out.out.strip().splitlines()]
    assert rows and all(r["turn_idx"] <= 1 for r in rows)
    assert '"files_pruned"' in out.err  # pruning report on stderr

    assert cli_main(["changes", "--table", root, "--since", "0"]) == 0
    ch = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert ch and {c["_change_type"] for c in ch} <= {"upsert", "delete"}
    assert len({c["_commit_version"] for c in ch}) == 2  # one per epoch
