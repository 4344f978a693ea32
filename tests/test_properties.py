"""Property-based invariants (hypothesis): the LWW apply must converge to the
replay oracle's state under ANY delivery order and ANY epoch chopping — the
algebraic property (commutative + idempotent merge) that makes exactly-once
achievable with nothing but an idempotency token.

Examples are capped low: each one drives real Spark jobs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from investigraph_etl_spark.cdc.apply import apply_events_batch
from investigraph_etl_spark.cdc.events import TRANSCRIPT_SCHEMA
from investigraph_etl_spark.cdc.generator import GeneratorConfig, generate_events
from investigraph_etl_spark.cdc.oracle import replay_oracle
from investigraph_etl_spark.cdc.resolve import resolve_lww
from investigraph_etl_spark.lake.table import LakeTable

PAYLOAD = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

#: One fixed adversarial tail (dupes, deletes, ts collisions); the PROPERTY
#: varies delivery order and epoch boundaries.
_EVENTS = generate_events(GeneratorConfig(n_events=400, n_convs=30, seed=77, n_epochs=1))
_ORACLE = replay_oracle(_EVENTS.drop(columns=["epoch"]))[PAYLOAD].reset_index(drop=True)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 2**31 - 1))
def test_resolve_is_order_insensitive(spark, seed):
    rng = np.random.default_rng(seed)
    shuffled = _EVENTS.iloc[rng.permutation(len(_EVENTS))].reset_index(drop=True)
    df = spark.createDataFrame(shuffled.drop(columns=["epoch"]))
    got = (
        resolve_lww(df)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    base = spark.createDataFrame(_EVENTS.drop(columns=["epoch"]))
    want = (
        resolve_lww(base)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(0, 2**31 - 1), n_epochs=st.integers(1, 6))
def test_chopped_apply_converges_to_oracle(spark, tmp_path_factory, seed, n_epochs):
    rng = np.random.default_rng(seed)
    ev = _EVENTS.iloc[rng.permutation(len(_EVENTS))].reset_index(drop=True)
    ev = ev.drop(columns=["epoch"])
    ev["epoch"] = rng.integers(0, n_epochs, size=len(ev))

    root = str(tmp_path_factory.mktemp("prop") / "t")
    table = LakeTable.create(spark, root, TRANSCRIPT_SCHEMA, n_buckets=4, mode="mor")
    for e in sorted(ev["epoch"].unique()):
        batch = spark.createDataFrame(ev[ev["epoch"] == e].drop(columns=["epoch"]))
        apply_events_batch(table, batch, app_id="prop", epoch_id=int(e))
    got = (
        table.read()
        .toPandas()[PAYLOAD]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ORACLE, check_dtype=False)
    assert (got["text"].fillna("∅") == _ORACLE["text"].fillna("∅")).all()
