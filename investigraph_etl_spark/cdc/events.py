"""Change-event and transcript schemas + event normalization/quarantine.

Reference parity:
- "Entities without id are rejected" (/root/reference/investigraph/model/context.py:130-132)
  → events with a null key column are quarantined, never applied.
- "Transform errors are logged and swallowed per record"
  (/root/reference/investigraph/pipeline.py:89-94) → bad events go to a
  quarantine DataFrame (side channel), they never abort the epoch.
- Fragment ordinal (/root/reference/investigraph/logic/load.py:25-31) → ``seq``,
  the binlog position and total-order tie-breaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Primary key of the transcript table (input_hint).
KEY_COLS: tuple[str, ...] = ("conv_id", "turn_idx")

#: Payload columns of the base transcript table (additive evolution may add more).
PAYLOAD_COLS: tuple[str, ...] = ("role", "text", "tool")

#: Recognized change operations. insert/update/upsert all carry a payload and are
#: resolved identically under LWW (the reference's merge is likewise op-agnostic:
#: /root/reference/investigraph/logic/aggregate.py:25-28); delete is a tombstone.
OPS: tuple[str, ...] = ("insert", "update", "delete", "upsert")

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

#: Columns every change event must carry non-null to be applicable.
_REQUIRED = ("op", "conv_id", "turn_idx", "ts", "seq")


def canonicalize_events(events: DataFrame) -> DataFrame:
    """Canonicalize an event batch and tag each row with ``_valid``.

    Pure Catalyst expressions — one codegen stage, no shuffle. Payload columns
    (incl. additively-evolved ones) pass through untouched. Callers split on
    ``_valid`` (quarantine semantics) or aggregate over it (one-pass metrics).
    """
    canon_types = {"op", "conv_id", "turn_idx", "ts", "seq"}
    payload = [c for c in events.columns if c not in canon_types]
    # Known payload columns are pinned to their declared types here (not just
    # in the MERGE): quarantined rows are appended to the _quarantine parquet
    # dir as-is, and without the cast two epochs with differently-inferred
    # input types would write conflicting parquet schemas there. Evolved
    # (unknown) columns pass through untouched.
    #
    # Built as ONE selectExpr: this runs once per micro-batch on the driver,
    # and Column-by-Column construction was ~0.2 s of py4j round-trips per
    # epoch — a pure serial term the scaling criterion punishes (same
    # rationale as apply._lineage_agg).
    known = {f.name: f.dataType for f in CHANGE_EVENT_SCHEMA.fields}
    casts = {
        "op": "cast(lower(op) as string)",
        "conv_id": "cast(conv_id as string)",
        "turn_idx": "cast(turn_idx as int)",
        "ts": "cast(ts as timestamp)",
        "seq": "cast(seq as long)",
    }
    ops = ", ".join(f"'{o}'" for o in OPS)
    # Null-safe validity ON THE CANONICAL values (a failed cast → null →
    # quarantine): a null op makes IN return null, which filter() would
    # silently drop from BOTH branches — coalesce pins it to False.
    required = " and ".join(f"{casts[c]} is not null" for c in _REQUIRED)
    valid = f"coalesce({casts['op']} in ({ops}) and {required}, false) as _valid"
    return events.selectExpr(
        *[f"{e} as {c}" for c, e in casts.items()],
        *[
            f"cast(`{c}` as {known[c].simpleString()}) as `{c}`"
            if c in known else f"`{c}`"
            for c in payload
        ],
        valid,
    )


def normalize_events(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a raw event batch into (valid, quarantined) and canonicalize types.

    Pure Catalyst expressions — the whole check stays inside one codegen stage,
    no shuffle. Extra columns (schema evolution) pass through untouched.
    """
    canon = canonicalize_events(events)
    valid = canon.filter(F.col("_valid")).drop("_valid")
    quarantined = canon.filter(~F.col("_valid")).drop("_valid")
    return valid, quarantined
