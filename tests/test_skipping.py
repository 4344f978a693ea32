"""Zone-map data skipping (lake/stats.py + LakeTable.read(where=...)):
stats collection via footer-only ranged reads, conservative pruning,
COW-vs-MOR prune-safety, commit-log/checkpoint carriage, and the invariant
that a pruned read always equals a full read + filter."""

from __future__ import annotations

import io

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
from investigraph_etl_spark.cdc.resolve import resolve_lww
from investigraph_etl_spark.lake.stats import collect_file_stats, prune_files
from investigraph_etl_spark.lake.table import LakeTable
from investigraph_etl_spark.storage import MemoryStorage

T0 = pd.Timestamp("2025-01-01")


def _ev(spark, rows):
    return resolve_lww(spark.createDataFrame(pd.DataFrame(rows)))


def _rows(convs, turns, ts, text="x"):
    return [
        {"op": "upsert", "conv_id": c, "turn_idx": t, "role": "user",
         "text": text, "tool": None, "ts": ts, "seq": int(ts.value // 1000)}
        for c in convs
        for t in turns
    ]


def _same(df_a, df_b):
    key = ["conv_id", "turn_idx"]
    a = df_a.toPandas().sort_values(key).reset_index(drop=True)
    b = df_b.toPandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------- stats collection
def test_collect_stats_footer_only_on_fake_remote():
    """Stats come from ranged GETs of the parquet footer — the full object is
    never fetched through the control plane (the 100 TB requirement)."""
    fs = MemoryStorage()
    pdf = pd.DataFrame(
        {"conv_id": ["a", "b", "c"], "turn_idx": [3, 9, 5],
         "ts": pd.to_datetime(["2025-01-01", "2025-01-02", "2025-01-03"])}
    )
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(pdf), buf)
    fs.put_bytes("memory://lake/data/f1.parquet", buf.getvalue())
    fs.ops.clear()

    stats = collect_file_stats(
        fs, "memory://lake/data", ["f1.parquet"], ["conv_id", "turn_idx", "ts"]
    )
    s = stats["f1.parquet"]
    assert s["conv_id"] == {"min": "a", "max": "c", "nulls": 0}
    assert s["turn_idx"] == {"min": 3, "max": 9, "nulls": 0}
    # timestamps are canonicalized to epoch micros
    assert s["ts"]["min"] == int(pd.Timestamp("2025-01-01").value // 1000)
    assert s["ts"]["max"] == int(pd.Timestamp("2025-01-03").value // 1000)
    kinds = {op for op, _ in fs.ops}
    assert "get_range" in kinds and "get" not in kinds


def test_collect_stats_missing_column_and_nulls():
    fs = MemoryStorage()
    # typed all-null column (untyped None columns become arrow null type,
    # which carries no statistics at all — conservatively unprunable)
    pdf = pd.DataFrame(
        {"conv_id": ["a", "b"], "tool": pd.array([None, None], dtype="string")}
    )
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(pdf), buf)
    fs.put_bytes("memory://d/f.parquet", buf.getvalue())
    stats = collect_file_stats(fs, "memory://d", ["f.parquet"], ["conv_id", "tool", "nope"])
    s = stats["f.parquet"]
    assert "nope" not in s  # absent column → unprunable, not an error
    assert s["tool"]["min"] is None and s["tool"]["max"] is None  # all-null


# ----------------------------------------------------------- pruning algebra
def test_prune_semantics():
    file_stats = {
        "f_lo": {"turn_idx": {"min": 0, "max": 9, "nulls": 0}},
        "f_hi": {"turn_idx": {"min": 10, "max": 19, "nulls": 0}},
        "f_nostats": {},
        "f_allnull": {"turn_idx": {"min": None, "max": None, "nulls": 5}},
    }
    files = list(file_stats)
    kept, n = prune_files(files, file_stats, [("turn_idx", "<", 5)], {"turn_idx"})
    # f_hi provably disjoint; f_allnull unmatchable by any comparison;
    # f_nostats conservatively kept
    assert set(kept) == {"f_lo", "f_nostats"} and n == 2
    # non-prunable column → nothing pruned
    kept, n = prune_files(files, file_stats, [("turn_idx", "<", 5)], set())
    assert n == 0
    # incomparable literal → conservatively kept
    kept, n = prune_files(files, file_stats, [("turn_idx", ">", "zz")], {"turn_idx"})
    assert set(kept) == {"f_lo", "f_nostats", "f_hi"}


# ------------------------------------------------------------------ COW path
def test_cow_append_skips_files_and_matches_full_scan(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, TRANSCRIPT_SCHEMA, n_buckets=4)
    day1, day2 = T0, T0 + pd.Timedelta("30d")
    df1 = spark.createDataFrame(
        pd.DataFrame(_rows([f"c{i}" for i in range(8)], [0, 1], day1))
    ).drop("op", "seq")
    df2 = spark.createDataFrame(
        pd.DataFrame(_rows([f"d{i}" for i in range(8)], [0, 1], day2))
    ).drop("op", "seq")
    t.append(df1.withColumn("ts", df1.ts))
    t.append(df2.withColumn("ts", df2.ts))

    total = len(t.files_for()[0])
    pred = [("ts", ">=", (day2 - pd.Timedelta("1d")).to_pydatetime())]
    kept, pruned = t.files_for(where=pred)
    assert pruned > 0 and len(kept) + pruned == total  # append-1 files skipped
    _same(t.read(where=pred), t.read().filter("ts >= '2025-01-30'"))
    assert t.read(where=pred).count() == 16


def test_cow_merge_records_stats_and_prunes_on_key(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, TRANSCRIPT_SCHEMA, n_buckets=2)
    t.merge(_ev(spark, _rows(["a1", "a2"], range(5), T0)), app_id="x", epoch_id=0)
    st = t._state()
    assert set(st.file_stats) == set(st.live_files)  # merge recorded bounds
    # every live file holds turn_idx <= 4 → a disjoint key range prunes ALL
    # files: the read is answered from the commit log with zero data I/O
    kept, pruned = t.files_for(where=[("turn_idx", ">=", 100)])
    assert kept == [] and pruned == len(st.live_files)
    _same(t.read(where=[("turn_idx", ">=", 100)]),
          t.read().filter("turn_idx >= 100"))
    assert t.read(where=[("turn_idx", ">=", 100)]).count() == 0


# ------------------------------------------------------------------ MOR path
def test_mor_key_pruning_payload_safety(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, TRANSCRIPT_SCHEMA,
                         n_buckets=2, mode="mor")
    t.compact_threshold = 10**9  # keep generations apart for the test
    # gen 1: turns 0-4, text "old"; gen 2: turns 100-104 AND an update that
    # flips ("m1", 0) from "old" to "new"
    t.merge(_ev(spark, _rows(["m1", "m2"], range(5), T0, text="old")),
            app_id="m", epoch_id=0)
    gen2 = _rows(["m1", "m2"], range(100, 105), T0 + pd.Timedelta("2h"), text="hi")
    gen2 += _rows(["m1"], [0], T0 + pd.Timedelta("3h"), text="new")
    t.merge(_ev(spark, gen2), app_id="m", epoch_id=1)

    # KEY predicate prunes: gen-1 files can't contain turn_idx >= 100
    kept, pruned = t.files_for(where=[("turn_idx", ">=", 100)])
    assert pruned > 0
    _same(t.read(where=[("turn_idx", ">=", 100)]),
          t.read().filter("turn_idx >= 100"))

    # PAYLOAD predicate must NOT prune files even though ``ts`` HAS recorded
    # bounds that would prune gen 2 under COW rules: the LWW winner for
    # ("m1",0) lives in gen 2 with ts=+3h — pruning gen-2 files for
    # ``ts < +1h`` would resurrect the stale gen-1 row. The safe answer
    # scans everything, reduces, THEN filters: ("m1",0) is excluded because
    # its winner's ts fails the predicate.
    t1h = (T0 + pd.Timedelta("1h")).to_pydatetime()
    kept, pruned = t.files_for(where=[("ts", "<", t1h)])
    assert pruned == 0  # non-monotone op on the stamp: not prunable under MOR
    got = t.read(where=[("ts", "<", t1h)]).toPandas()
    exp = t.read().filter(f"ts < '{t1h}'").toPandas()
    got_keys = sorted(map(tuple, got[["conv_id", "turn_idx"]].values.tolist()))
    exp_keys = sorted(map(tuple, exp[["conv_id", "turn_idx"]].values.tolist()))
    assert got_keys == exp_keys
    assert ("m1", 0) not in set(got_keys)


# ------------------------------------------- log carriage, compact, vacuum
def test_stats_survive_checkpoint_compact_and_vacuum(spark, tmp_table_root, monkeypatch):
    import investigraph_etl_spark.lake.log as log_mod

    monkeypatch.setattr(log_mod, "CHECKPOINT_EVERY", 3)
    t = LakeTable.create(spark, tmp_table_root, TRANSCRIPT_SCHEMA,
                         n_buckets=2, mode="mor")
    t.compact_threshold = 10**9
    for e in range(4):
        t.merge(
            _ev(spark, _rows([f"k{e}"], range(e * 10, e * 10 + 3),
                             T0 + pd.Timedelta(hours=e))),
            app_id="cp", epoch_id=e,
        )
    st = t._state()
    assert st.version > 3  # a checkpoint was written and replayed over
    assert set(st.file_stats) == set(st.live_files)  # stats carried for all

    # compaction rewrites generations; stats follow the new files and the
    # removed files' stats are dropped from state
    t.compact()
    st2 = t._state()
    assert set(st2.file_stats) == set(st2.live_files)
    kept, pruned = t.files_for(where=[("turn_idx", ">=", 0)])
    assert pruned == 0 and kept == st2.live_files

    # pruned read still equals filtered full read after compaction
    _same(t.read(where=[("turn_idx", ">=", 20)]),
          t.read().filter("turn_idx >= 20"))


def test_stats_disabled_table(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, TRANSCRIPT_SCHEMA,
                         n_buckets=2, stats_cols=())
    t.merge(_ev(spark, _rows(["z1"], range(3), T0)), app_id="z", epoch_id=0)
    st = t._state()
    assert st.file_stats == {}
    kept, pruned = t.files_for(where=[("turn_idx", ">=", 100)])
    assert pruned == 0  # no stats → conservative full scan
    assert t.read(where=[("turn_idx", ">=", 100)]).count() == 0


def test_where_rejects_unknown_op(spark, tmp_table_root):
    t = LakeTable.create(spark, tmp_table_root, TRANSCRIPT_SCHEMA, n_buckets=2)
    with pytest.raises(ValueError):
        t.read(where=[("turn_idx", "!=", 1)])


def test_mor_monotone_stamp_pruning(spark, tmp_table_root):
    """>=/> on the LWW stamp column prunes old MOR generations safely — the
    'recent window' query — including the late-data trap where a STALE update
    sits in a NEW generation."""
    t = LakeTable.create(spark, tmp_table_root, TRANSCRIPT_SCHEMA,
                         n_buckets=2, mode="mor")
    t.compact_threshold = 10**9
    # gen 1: ("w", 0) written at +5h — the eventual WINNER, in an OLD file
    t.merge(_ev(spark, _rows(["w"], [0], T0 + pd.Timedelta("5h"), text="win")
                + _rows(["x1", "x2"], range(3), T0)), app_id="mono", epoch_id=0)
    # gen 2: late STALE update to ("w", 0) at +1h (loses LWW) + fresh rows at +10h
    t.merge(_ev(spark, _rows(["w"], [0], T0 + pd.Timedelta("1h"), text="stale")
                + _rows(["y1"], range(3), T0 + pd.Timedelta("10h"))),
            app_id="mono", epoch_id=1)

    cutoff = (T0 + pd.Timedelta("8h")).to_pydatetime()
    kept, pruned = t.files_for(where=[("ts", ">=", cutoff)])
    assert pruned > 0  # gen-1 files (max ts +5h) provably fail ts >= +8h
    _same(t.read(where=[("ts", ">=", cutoff)]),
          t.read().filter(f"ts >= '{cutoff}'"))
    got = {r.conv_id for r in t.read(where=[("ts", ">=", cutoff)]).collect()}
    assert got == {"y1"}  # winner of ("w",0) is +5h < cutoff; stale +1h must not leak

    # the trap the monotone rule exists for: cutoff BELOW the stale row.
    # Full gen-2 files are kept (bounds span +1h..+10h) and the reduce still
    # awards ("w",0) to the +5h winner from gen 1, which passes the filter.
    cutoff2 = (T0 + pd.Timedelta("30m")).to_pydatetime()
    _same(t.read(where=[("ts", ">=", cutoff2)]),
          t.read().filter(f"ts >= '{cutoff2}'"))
    texts = {(r.conv_id, r.turn_idx): r.text
             for r in t.read(where=[("ts", ">=", cutoff2)]).collect()}
    assert texts[("w", 0)] == "win"
