"""The synthetic tail must be deterministic and adversarial; the oracle must
implement the pinned LWW/tombstone semantics (FIXTURES.md §2)."""

import pandas as pd

from investigraph_etl_spark.cdc.generator import GeneratorConfig, generate_events
from investigraph_etl_spark.cdc.oracle import replay_oracle


def test_generator_deterministic():
    a = generate_events(GeneratorConfig(n_events=2000, seed=7))
    b = generate_events(GeneratorConfig(n_events=2000, seed=7))
    pd.testing.assert_frame_equal(a, b)


def test_generator_adversarial_features():
    df = generate_events(GeneratorConfig(n_events=5000, seed=42))
    # duplicates: same seq delivered twice
    assert df["seq"].duplicated().any()
    # ts collisions on the same key with different seq
    g = df.groupby(["conv_id", "turn_idx", "ts"])["seq"].nunique()
    assert (g > 1).any()
    # skew: hottest conv gets far more than its fair share
    counts = df["conv_id"].value_counts()
    assert counts.iloc[0] > 5 * counts.mean()
    # deletes exist and carry no payload
    dels = df[df["op"] == "delete"]
    assert len(dels) > 0 and dels["text"].isna().all()


def test_generator_schema_evolution_columns():
    df = generate_events(GeneratorConfig(n_events=2000, seed=1, evolve_from_epoch=2, n_epochs=4))
    assert {"tool_version", "tokens"} <= set(df.columns)
    assert df.loc[df["epoch"] < 2, "tokens"].isna().all()
    assert df.loc[df["epoch"] >= 2, "tokens"].notna().any()


def test_oracle_lww_and_tombstones():
    t0 = pd.Timestamp("2025-01-01")
    ev = pd.DataFrame(
        [
            # plain insert then newer update wins
            {"op": "insert", "conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "v1", "tool": None, "ts": t0, "seq": 1},
            {"op": "update", "conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "v2", "tool": None, "ts": t0 + pd.Timedelta("1h"), "seq": 2},
            # late event (older ts, higher seq) must lose
            {"op": "update", "conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "late", "tool": None, "ts": t0 - pd.Timedelta("1h"), "seq": 3},
            # ts collision: seq breaks the tie
            {"op": "update", "conv_id": "c2", "turn_idx": 1, "role": "user",
             "text": "a", "tool": None, "ts": t0, "seq": 10},
            {"op": "update", "conv_id": "c2", "turn_idx": 1, "role": "user",
             "text": "b", "tool": None, "ts": t0, "seq": 11},
            # delete, then stale update must NOT resurrect
            {"op": "insert", "conv_id": "c3", "turn_idx": 2, "role": "user",
             "text": "x", "tool": None, "ts": t0, "seq": 20},
            {"op": "delete", "conv_id": "c3", "turn_idx": 2, "role": None,
             "text": None, "tool": None, "ts": t0 + pd.Timedelta("2h"), "seq": 21},
            {"op": "update", "conv_id": "c3", "turn_idx": 2, "role": "user",
             "text": "zombie", "tool": None, "ts": t0 + pd.Timedelta("1h"), "seq": 22},
            # delete then strictly newer update DOES resurrect
            {"op": "insert", "conv_id": "c4", "turn_idx": 0, "role": "user",
             "text": "x", "tool": None, "ts": t0, "seq": 30},
            {"op": "delete", "conv_id": "c4", "turn_idx": 0, "role": None,
             "text": None, "tool": None, "ts": t0 + pd.Timedelta("1h"), "seq": 31},
            {"op": "update", "conv_id": "c4", "turn_idx": 0, "role": "user",
             "text": "reborn", "tool": None, "ts": t0 + pd.Timedelta("2h"), "seq": 32},
        ]
    )
    out = replay_oracle(ev).set_index(["conv_id", "turn_idx"])
    assert out.loc[("c1", 0), "text"] == "v2"
    assert out.loc[("c2", 1), "text"] == "b"
    assert ("c3", 2) not in out.index
    assert out.loc[("c4", 0), "text"] == "reborn"


def test_oracle_duplicate_delivery_noop():
    ev = generate_events(GeneratorConfig(n_events=3000, seed=3, p_duplicate=0.0))
    dup = pd.concat([ev, ev.sample(frac=0.3, random_state=0)], ignore_index=True)
    pd.testing.assert_frame_equal(replay_oracle(ev), replay_oracle(dup))
