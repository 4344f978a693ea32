"""delete_where (targeted logical deletes — the GDPR face) and rebucket
(partition-spec evolution): both compose with the engine's invariants —
changelog visibility, LWW anti-resurrection, exactly-once tokens, OCC."""

from __future__ import annotations

import pandas as pd

from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
from investigraph_etl_spark.cdc.resolve import resolve_lww
from investigraph_etl_spark.lake.table import LakeTable

T0 = pd.Timestamp("2025-03-01")


def _ev(spark, rows):
    return resolve_lww(spark.createDataFrame(pd.DataFrame(rows)))


def _r(op, conv, turn, text, hours, seq):
    return {"op": op, "conv_id": conv, "turn_idx": turn, "role": "user",
            "text": text, "tool": None,
            "ts": T0 + pd.Timedelta(hours=hours), "seq": seq}


def _mor(spark, root, n_buckets=2):
    t = LakeTable.create(spark, root, TRANSCRIPT_SCHEMA,
                         n_buckets=n_buckets, mode="mor")
    t.compact_threshold = 10**9
    t.merge(_ev(spark, [_r("insert", "c1", 0, "a", 0, 1),
                        _r("insert", "c1", 1, "b", 0, 2),
                        _r("insert", "c2", 0, "c", 0, 3)]),
            app_id="x", epoch_id=0)
    return t


def _state(t):
    return {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}


def test_delete_where_tombstones_changelog_and_no_resurrection(spark, tmp_path):
    t = _mor(spark, str(tmp_path / "t"))
    v0 = t.version
    res = t.delete_where("conv_id = 'c1'", app_id="gdpr", epoch_id=0)
    assert not res.get("skipped")
    assert _state(t) == {("c2", 0): "c"}
    # the deletes are REAL change rows: changelog window shows them
    ch = t.changes(v0).toPandas()
    assert set(ch[ch._change_type == "delete"]
               .apply(lambda r: (r.conv_id, r.turn_idx), axis=1)) == {
                   ("c1", 0), ("c1", 1)}
    # a late stale update (old stamp) cannot resurrect the deleted turn
    t.merge(_ev(spark, [_r("update", "c1", 0, "zombie", 1, 9)]),
            app_id="x", epoch_id=1)
    assert _state(t) == {("c2", 0): "c"}
    # exactly-once: replaying the same delete token is a recorded no-op
    v = t.version
    again = t.delete_where("conv_id = 'c1'", app_id="gdpr", epoch_id=0)
    assert again["skipped"] and t.version == v


def test_delete_where_physical_purge_via_compact_vacuum(spark, tmp_path):
    t = _mor(spark, str(tmp_path / "t"))
    t.delete_where("conv_id = 'c1'", app_id="gdpr", epoch_id=0)
    t.compact()
    t.vacuum(orphan_grace_s=0.0)
    # the purged text is gone from every live byte on disk
    import glob

    live_rows = spark.read.parquet(
        *[f"{tmp_path}/t/data/{f}" for f in t._state().live_files]
    ).collect()
    texts = {r.text for r in live_rows}
    assert "a" not in texts and "b" not in texts
    # tombstones survive compaction (anti-resurrection), rows stay hidden
    assert _state(t) == {("c2", 0): "c"}


def test_rebucket_preserves_data_and_changes_layout(spark, tmp_path):
    from investigraph_etl_spark.lake.table import _bucket_of

    t = _mor(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(_ev(spark, [_r("update", "c2", 0, "c2v2", 1, 4),
                        _r("insert", "c3", 0, "d", 1, 5)]),
            app_id="x", epoch_id=1)
    before = _state(t)
    res = t.rebucket(4)
    assert res["rebucketed"] and res["n_buckets"] == 4
    st = t._state()
    assert st.n_buckets == 4
    assert _state(t) == before  # values identical through the rewrite
    assert {_bucket_of(f) for f in st.live_files} <= {0, 1, 2, 3}
    # post-rebucket merges use the new layout and resolve correctly
    t.merge(_ev(spark, [_r("update", "c3", 0, "d2", 2, 6)]),
            app_id="x", epoch_id=2)
    assert _state(t)[("c3", 0)] == "d2"
    # changelog treats the rebucket commit as physical-only (transparent)
    ch = t.changes(0).toPandas()
    assert ch._commit_version.nunique() == 3  # the three merges, no rebucket rows


def test_cli_delete_where_and_rebucket(spark, tmp_path, capsys):
    import json

    from investigraph_etl_spark.cli import main as cli_main

    root = str(tmp_path / "t")
    t = _mor(spark, root)
    assert cli_main(["delete-where", "--table", root,
                     "--where", "conv_id = 'c1'",
                     "--app-id", "gdpr", "--epoch-id", "0"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not out.get("skipped")
    assert _state(t) == {("c2", 0): "c"}
    assert cli_main(["rebucket", "--table", root, "--n-buckets", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rebucketed"] and t._state().n_buckets == 4
    assert _state(t) == {("c2", 0): "c"}


def test_merge_recomputes_after_concurrent_rebucket(spark, tmp_path):
    """A merge racing a rebucket must not publish files laid out under the
    OLD bucket count — the OCC revalidate detects the layout change and the
    whole merge recomputes under the new layout."""
    from investigraph_etl_spark.lake.table import _bucket_of

    t = _mor(spark, str(tmp_path / "t"))
    b = LakeTable.load(spark, str(tmp_path / "t"))
    b.compact_threshold = 10**9
    orig = t.log.commit
    fired = {"n": 0}

    def hook(commit):
        if fired["n"] == 0:
            fired["n"] = 1
            b.rebucket(4)
        orig(commit)

    t.log.commit = hook
    res = t.merge(_ev(spark, [_r("insert", "c9", 0, "raced", 2, 9)]),
                  app_id="x", epoch_id=1)
    assert not res["skipped"]
    st = t._state()
    assert st.n_buckets == 4
    assert _state(t)[("c9", 0)] == "raced"
    assert {_bucket_of(f) for f in st.live_files} <= {0, 1, 2, 3}
    # the raced row sits in the NEW layout's bucket for its key
    nb = spark.sql("select pmod(hash('c9'), 4)").first()[0]
    assert any(_bucket_of(f) == nb for f in st.live_files)


def test_append_recomputes_after_concurrent_rebucket(spark, tmp_path):
    """COW duplicate-key regression: an append racing a rebucket used to
    publish old-layout files that later merges neither read nor removed."""
    t = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
                         n_buckets=2, mode="cow")
    t.merge(_ev(spark, [_r("insert", "c1", 0, "a", 0, 1)]),
            app_id="x", epoch_id=0)
    b = LakeTable.load(spark, str(tmp_path / "t"))
    orig = t.log.commit
    fired = {"n": 0}

    def hook(commit):
        if fired["n"] == 0:
            fired["n"] = 1
            b.rebucket(4)
        orig(commit)

    t.log.commit = hook
    pdf = pd.DataFrame([{"conv_id": "c2", "turn_idx": 0, "role": "user",
                         "text": "bulk", "tool": None, "ts": T0}])
    res = t.append(spark.createDataFrame(pdf))
    assert res["files_added"] >= 1
    # the appended key must be visible to a later merge: update it and
    # check exactly ONE row survives (no old-layout orphan duplicate)
    t.merge(_ev(spark, [_r("update", "c2", 0, "v2", 5, 9)]),
            app_id="x", epoch_id=1)
    rows = [r for r in t.read().collect() if r.conv_id == "c2"]
    assert len(rows) == 1 and rows[0].text == "v2"


def test_rebucket_aborts_on_concurrent_commit(spark, tmp_path):
    t = _mor(spark, str(tmp_path / "t"))
    b = LakeTable.load(spark, str(tmp_path / "t"))
    b.compact_threshold = 10**9
    orig = t.log.commit
    fired = {"n": 0}

    def hook(commit):
        if fired["n"] == 0:
            fired["n"] = 1
            b.merge(_ev(spark, [_r("insert", "c9", 0, "late", 2, 9)]),
                    app_id="x", epoch_id=7)
        orig(commit)

    t.log.commit = hook
    res = t.rebucket(4)
    assert res == {"rebucketed": False,
                   "aborted": "concurrent commit during rebucket"}
    st = t._state()
    assert st.n_buckets == 2  # layout unchanged, the winner's row survived
    assert _state(t)[("c9", 0)] == "late"
