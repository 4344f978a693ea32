"""End-to-end batch apply: full adversarial tail, applied epoch by epoch through
apply_events_batch, must reach 100% per-turn text equality with the pandas
replay oracle — and be invariant to how the tail is chopped into epochs
(the generalization of the reference's chunk_size-invariance test,
/root/reference/tests/test_pipeline.py:72-79)."""

import pandas as pd
import pytest

from investigraph_etl_spark.cdc.apply import apply_events_batch, read_metrics
from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
from investigraph_etl_spark.cdc.generator import GeneratorConfig, generate_events
from investigraph_etl_spark.cdc.oracle import replay_oracle
from investigraph_etl_spark.lake.table import LakeTable

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _apply_all(spark, root, ev, n_salts=None):
    table = LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=8)
    for epoch, part in ev.groupby("epoch", sort=True):
        batch = spark.createDataFrame(part.drop(columns=["epoch"]))
        apply_events_batch(table, batch, app_id="e2e", epoch_id=int(epoch), n_salts=n_salts)
    return table


def _final(table):
    return (
        table.read()
        .toPandas()[PAYLOAD]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("n_salts", [None, 8])
def test_e2e_matches_oracle(spark, tmp_path, n_salts):
    ev = generate_events(GeneratorConfig(n_events=6000, seed=42, n_epochs=5))
    table = _apply_all(spark, str(tmp_path / "t"), ev, n_salts=n_salts)
    got = _final(table)
    want = replay_oracle(ev.drop(columns=["epoch"]))[PAYLOAD].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # 100% per-turn text equality, explicitly (BASELINE.json correctness gate)
    assert (got["text"].fillna("∅") == want["text"].fillna("∅")).all()


def test_e2e_epoch_partitioning_invariance(spark, tmp_path):
    """Same tail, chopped into 2 vs 9 epochs ⇒ byte-identical final table."""
    base = GeneratorConfig(n_events=4000, seed=7, n_epochs=2)
    ev_a = generate_events(base)
    ev_b = ev_a.copy()
    ev_b["epoch"] = (pd.RangeIndex(len(ev_b)) * 9 // len(ev_b)).astype("int64")
    ta = _apply_all(spark, str(tmp_path / "a"), ev_a)
    tb = _apply_all(spark, str(tmp_path / "b"), ev_b)
    pd.testing.assert_frame_equal(_final(ta), _final(tb))


def test_e2e_quarantine_and_metrics(spark, tmp_path):
    ev = generate_events(GeneratorConfig(n_events=1000, seed=3, n_epochs=1))
    bad = ev.head(20).copy()
    bad["conv_id"] = None  # null key → quarantine, never applied
    evq = pd.concat([ev, bad], ignore_index=True)
    table = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, n_buckets=8)
    res = apply_events_batch(
        table, spark.createDataFrame(evq.drop(columns=["epoch"])), app_id="q", epoch_id=0
    )
    assert res["events_quarantined"] == 20
    assert res["events_applied"] == len(ev)

    m = read_metrics(table).toPandas()
    assert m["events_applied"].sum() == len(ev)
    assert (m["conflicts_resolved"] >= 0).all()
    # applied buckets carry a watermark; the bucket=-1 quarantine lineage
    # row legitimately has none
    assert m.loc[m["events_applied"] > 0, "watermark_pos"].notna().all()
    assert m["events_quarantined"].sum() == 20
    # final state matches oracle despite the junk rows
    want = replay_oracle(ev.drop(columns=["epoch"]))[PAYLOAD].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(table), want, check_dtype=False)


def test_crash_between_write_and_commit_keeps_quarantine(spark, tmp_path):
    """Regression (round-2 advice): quarantine + metrics used to be written
    AFTER the commit-log append — a crash between the two permanently lost
    the quarantined rows, since the committed epoch token makes the retry a
    no-op. Both now happen in the pre-commit hook; a crash injected at the
    log commit must leave the retry able to converge with no loss and no
    quarantine duplicates."""
    from investigraph_etl_spark.cdc.apply import read_quarantine

    ev = generate_events(GeneratorConfig(n_events=800, seed=13, n_epochs=1))
    bad = ev.head(15).copy()
    bad["conv_id"] = None
    evq = pd.concat([ev, bad], ignore_index=True)
    table = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, n_buckets=8)
    batch = spark.createDataFrame(evq.drop(columns=["epoch"]))

    real_commit = table.log.commit
    boom = {"armed": True}

    def crashing_commit(c):
        if boom["armed"]:  # data + quarantine + metrics written, token not yet
            boom["armed"] = False
            raise RuntimeError("injected crash before log commit")
        return real_commit(c)

    table.log.commit = crashing_commit
    with pytest.raises(RuntimeError, match="injected crash"):
        apply_events_batch(table, batch, app_id="cr", epoch_id=0)
    # the crash lost the token but NOT the quarantine rows
    assert read_quarantine(table).count() == 15

    res = apply_events_batch(table, batch, app_id="cr", epoch_id=0)  # retry
    assert res["events_quarantined"] == 15
    assert res["events_applied"] == len(ev)
    assert read_quarantine(table).count() == 15  # overwrite, not append: no dupes
    m = read_metrics(table).toPandas()
    assert m["events_quarantined"].sum() == 15  # metrics not duplicated either
    want = replay_oracle(ev.drop(columns=["epoch"]))[PAYLOAD].reset_index(drop=True)
    pd.testing.assert_frame_equal(_final(table), want, check_dtype=False)

    res2 = apply_events_batch(table, batch, app_id="cr", epoch_id=0)  # re-delivery
    assert res2.get("skipped")


def test_e2e_schema_evolution_mid_stream(spark, tmp_path):
    ev = generate_events(
        GeneratorConfig(n_events=3000, seed=5, n_epochs=6, evolve_from_epoch=3)
    )
    table = LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, n_buckets=8)
    for epoch, part in ev.groupby("epoch", sort=True):
        body = part.drop(columns=["epoch"])
        if epoch < 3:  # early epochs genuinely lack the new columns
            body = body.drop(columns=["tool_version", "tokens"])
        apply_events_batch(table, spark.createDataFrame(body), app_id="se", epoch_id=int(epoch))

    cols = [f.name for f in table.schema().fields]
    assert cols[-2:] == ["tool_version", "tokens"]
    got = (
        table.read().toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    )
    want = replay_oracle(ev.drop(columns=["epoch"]))
    pd.testing.assert_frame_equal(
        got[PAYLOAD], want[PAYLOAD].reset_index(drop=True), check_dtype=False
    )
    # evolved column values survive the merge for winners from evolved epochs
    want_tokens = want["tokens"].reset_index(drop=True)
    got_tokens = got["tokens"]
    assert (got_tokens.isna() == want_tokens.isna()).all()
    both = got_tokens.notna()
    assert (got_tokens[both].astype("int64") == want_tokens[both].astype("int64")).all()


def test_lineage_parity_across_apply_paths(spark, tmp_path):
    """The one-action MOR path (per-bucket lineage via Observation riding the
    write job) and the two-action COW path (separate lineage aggregation) must
    emit IDENTICAL _metrics rows for the same tail — lineage semantics are a
    property of the data, not of the physical apply strategy."""
    ev = generate_events(GeneratorConfig(n_events=4000, seed=11, n_epochs=3))

    def metrics_of(mode, root):
        table = LakeTable.create(
            spark, root, TRANSCRIPT_SCHEMA, n_buckets=8, mode=mode
        )
        for epoch, part in ev.groupby("epoch", sort=True):
            batch = spark.createDataFrame(part.drop(columns=["epoch"]))
            apply_events_batch(table, batch, app_id="par", epoch_id=int(epoch))
        return (
            read_metrics(table)
            .toPandas()
            .sort_values(["epoch_id", "bucket"], kind="stable")
            .reset_index(drop=True)
        )

    mor = metrics_of("mor", str(tmp_path / "mor"))
    cow = metrics_of("cow", str(tmp_path / "cow"))
    pd.testing.assert_frame_equal(mor, cow, check_dtype=False)
    assert (mor["events_applied"] > 0).any()


def test_fused_epoch_shape_unique_keys(spark, tmp_path):
    """The adaptive epoch shape: a dup≈1 tail flips epochs ≥2 to the fused
    one-exchange plan (previous epoch's lineage is the hint). End-to-end
    result must match the replay oracle, and every MOR commit must still add
    at most one file per bucket (the murmur3/partition-id alignment)."""
    import pandas as pd

    from investigraph_etl_spark.cdc.generator import write_epoch_files
    from investigraph_etl_spark.cdc.oracle import replay_oracle
    from investigraph_etl_spark.streaming.ingest import IngestPipeline

    n_buckets = 8
    rows = []
    t0 = pd.Timestamp("2025-05-01")
    for epoch in range(3):
        for i in range(400):  # unique keys per epoch AND across epochs
            rows.append({
                "op": "insert", "conv_id": f"c{epoch}-{i}", "turn_idx": 0,
                "role": "user", "text": f"t{epoch}.{i}", "tool": None,
                "ts": t0 + pd.Timedelta(seconds=epoch * 1000 + i),
                "seq": epoch * 1000 + i, "epoch": epoch,
            })
    ev = pd.DataFrame(rows)
    ev["turn_idx"] = ev["turn_idx"].astype("int32")
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["tool"] = ev["tool"].astype("string")  # all-null object → parquet INT32
    landing = str(tmp_path / "landing")
    write_epoch_files(ev, landing, files_per_epoch=4)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA, n_buckets=n_buckets, mode="mor"
    )
    table.compact_threshold = 10**9
    pipe = IngestPipeline(
        spark, events_dir=landing, table_root=table.root,
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=4,
    )
    results = pipe.run_available_now()
    assert len(results) == 3
    # epoch 1 has no hint (combine-first); epochs 2-3 see dup==1.0 → fused
    assert pipe._shape_hints() == (
        1.0,
        pytest.approx(results[-1]["max_bucket_share"]),
        pytest.approx(results[-1]["max_key_flood"]),
    )
    assert [r["plan_shape"] for r in results] == ["combine", "fused", "fused"]
    # every merge commit added at most one file per bucket
    for c in table.history():
        if c.get("epoch_id") is not None and c.get("added"):
            per_bucket: dict = {}
            for f in c["added"]:
                b = [p for p in f.split("/") if p.startswith("bucket=")][0]
                per_bucket[b] = per_bucket.get(b, 0) + 1
            assert max(per_bucket.values()) == 1
    got = (
        table.read().orderBy("conv_id", "turn_idx")
        .toPandas()[["conv_id", "turn_idx", "text"]]
    )
    want = (
        replay_oracle(ev.drop(columns=["epoch"]))
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)[["conv_id", "turn_idx", "text"]]
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_fused_width_divisor_rules(spark):
    from investigraph_etl_spark.cdc.apply import _fused_width

    cores = spark.sparkContext.defaultParallelism
    assert _fused_width(spark, 1) == 1
    w = _fused_width(spark, 32)
    if 32 <= 2 * cores:
        assert w == 32
    else:
        assert w is not None and 32 % w == 0 and w <= 2 * cores
    # prime bucket counts that cannot divide near the core count fall back
    assert _fused_width(spark, 997) is None


def test_hot_bucket_tail_stays_on_combine_shape(spark, tmp_path):
    """A dup≈1 tail would normally fuse — but when one conversation owns
    ~50% of the previous epoch (hottest-bucket share ≥ FUSE_SKEW_MAX, free
    from lineage), the fused conv_id exchange would serialize that bucket
    into one task, so the epoch must stay combine-first."""
    import pandas as pd

    from investigraph_etl_spark.cdc.generator import write_epoch_files
    from investigraph_etl_spark.streaming.ingest import IngestPipeline

    rows = []
    t0 = pd.Timestamp("2025-06-01")
    seq = 0
    for epoch in range(2):
        for i in range(400):
            hot = i % 2 == 0
            rows.append({
                "op": "insert",
                "conv_id": "hot-conv" if hot else f"c{epoch}-{i}",
                "turn_idx": seq if hot else 0,
                "role": "user", "text": f"t{seq}", "tool": None,
                "ts": t0 + pd.Timedelta(seconds=seq), "seq": seq, "epoch": epoch,
            })
            seq += 1
    ev = pd.DataFrame(rows)
    ev["turn_idx"] = ev["turn_idx"].astype("int32")
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["tool"] = ev["tool"].astype("string")
    landing = str(tmp_path / "landing")
    write_epoch_files(ev, landing, files_per_epoch=4)
    LakeTable.create(spark, str(tmp_path / "t"), TRANSCRIPT_SCHEMA,
                     n_buckets=8, mode="mor")
    pipe = IngestPipeline(
        spark, events_dir=landing, table_root=str(tmp_path / "t"),
        checkpoint_dir=str(tmp_path / "ckpt"), max_files_per_trigger=4,
    )
    results = pipe.run_available_now()
    assert len(results) == 2
    assert all(r["max_bucket_share"] >= 0.5 for r in results)
    dup, skew, flood = pipe._shape_hints()
    assert dup == 1.0 and skew >= 0.5
    assert flood is not None and flood < 0.2  # unique keys: no single-key flood
    # dup says fuse; the skew gate must override
    assert [r["plan_shape"] for r in results] == ["combine", "combine"]


def test_fused_width_env_parsed_defensively(monkeypatch):
    """ADVICE r4 (+ round-5 review): SPARK_GRAFT_FUSED_WIDTH is parsed at
    ONE site; junk values and non-divisor widths WARN once and fall back to
    the adaptive heuristic — a tuning knob must never kill a running
    stream, and a fleet-wide setting may not divide every table's bucket
    count."""
    import warnings as _warnings

    from investigraph_etl_spark.cdc import apply as apply_mod
    from investigraph_etl_spark.cdc.apply import _parse_fused_width_env

    monkeypatch.delenv("SPARK_GRAFT_FUSED_WIDTH", raising=False)
    assert _parse_fused_width_env(32) == (False, None)
    monkeypatch.setenv("SPARK_GRAFT_FUSED_WIDTH", "  ")
    assert _parse_fused_width_env(32) == (False, None)
    monkeypatch.setenv("SPARK_GRAFT_FUSED_WIDTH", "0")
    assert _parse_fused_width_env(32) == (True, None)   # explicit disable
    monkeypatch.setenv("SPARK_GRAFT_FUSED_WIDTH", "8")
    assert _parse_fused_width_env(32) == (True, 8)

    monkeypatch.setattr(apply_mod, "_WARNED", set())
    monkeypatch.setenv("SPARK_GRAFT_FUSED_WIDTH", "4x")
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        assert _parse_fused_width_env(32) == (False, None)
        assert _parse_fused_width_env(32) == (False, None)  # warned once
    assert len(w) == 1 and "not an integer" in str(w[0].message)

    monkeypatch.setattr(apply_mod, "_WARNED", set())
    monkeypatch.setenv("SPARK_GRAFT_FUSED_WIDTH", "5")
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        assert _parse_fused_width_env(32) == (False, None)
    assert len(w) == 1 and "does not divide" in str(w[0].message)


def _epoch_tail(flood_rows: int, uniq_rows: int, n_epochs: int):
    """Synthetic tail: per epoch, `flood_rows` upserts re-write ONE
    (conv, turn) key and `uniq_rows` inserts hit unique keys."""
    import pandas as pd

    rows = []
    t0 = pd.Timestamp("2025-06-01")
    seq = 0
    for epoch in range(n_epochs):
        for i in range(flood_rows + uniq_rows):
            hot = i < flood_rows
            rows.append({
                "op": "upsert" if hot else "insert",
                "conv_id": "flood" if hot else f"c{epoch}-{i}",
                "turn_idx": 0,
                "role": "user", "text": f"t{seq}", "tool": None,
                "ts": t0 + pd.Timedelta(seconds=seq), "seq": seq,
                "epoch": epoch,
            })
            seq += 1
    ev = pd.DataFrame(rows)
    ev["turn_idx"] = ev["turn_idx"].astype("int32")
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    ev["tool"] = ev["tool"].astype("string")
    return ev


def _run_tail(spark, tmp_path, ev, tag):
    from investigraph_etl_spark.cdc.generator import write_epoch_files
    from investigraph_etl_spark.streaming.ingest import IngestPipeline

    landing = str(tmp_path / f"landing-{tag}")
    write_epoch_files(ev, landing, files_per_epoch=4)
    LakeTable.create(spark, str(tmp_path / f"t-{tag}"), TRANSCRIPT_SCHEMA,
                     n_buckets=32, mode="mor")
    pipe = IngestPipeline(
        spark, events_dir=landing, table_root=str(tmp_path / f"t-{tag}"),
        checkpoint_dir=str(tmp_path / f"ckpt-{tag}"), max_files_per_trigger=4,
    )
    return pipe.run_available_now()


def test_single_key_flood_vetoes_fused_shape(spark, tmp_path):
    """VERDICT r4 #4, resolved by measurement (bench.py --skew keyflood
    rows): map-side combine absorbs single-key floods in the COMBINE-FIRST
    shape (forcing the salted reduce on a 50%-one-key tail COSTS ~1.4x), so
    the lineage's hottest-key share must instead VETO the FUSED shape — the
    one shape with no combine, where the flood's whole share folds in one
    task. This tail is crafted so dup < FUSE_DUP_MAX and hottest-bucket
    share < FUSE_SKEW_MAX (the old gates would fuse); only the key-flood
    signal catches it."""
    from investigraph_etl_spark.cdc.apply import (
        FUSE_DUP_MAX,
        FUSE_FLOOD_MAX,
        FUSE_SKEW_MAX,
    )

    # ~20.5% of each epoch on one key, 32 buckets → bucket share ≈ 0.23
    results = _run_tail(spark, tmp_path,
                        _epoch_tail(flood_rows=205, uniq_rows=795, n_epochs=3),
                        "flood")
    assert len(results) == 3
    for r in results:
        dup = r["events_applied"] / (r["events_applied"] - r["conflicts_resolved"])
        assert dup < FUSE_DUP_MAX                       # dup gate would pass
        assert r["max_bucket_share"] < FUSE_SKEW_MAX    # skew gate would pass
        assert r["max_key_flood"] >= FUSE_FLOOD_MAX     # flood signal fires
        assert r["n_salts_used"] == 0                   # salting stays manual
    # epoch 1 has no hint (combine by default); epochs 2-3 would have fused
    # on dup/skew alone — the flood hint keeps them combine-first
    assert [r["plan_shape"] for r in results] == ["combine"] * 3

    # control: same tail shape with a sub-threshold flood fuses as before
    ctl = _run_tail(spark, tmp_path,
                    _epoch_tail(flood_rows=50, uniq_rows=950, n_epochs=3),
                    "ctl")
    assert all(r["max_key_flood"] < FUSE_FLOOD_MAX for r in ctl)
    assert [r["plan_shape"] for r in ctl] == ["combine", "fused", "fused"]
