"""Last-writer-wins reduce: N change events per key → 1 winning event per key.

This is the Spark replacement for the reference's two merge layers:
- map-side partial merge (``TaskContext.emit`` id-dict,
  /root/reference/investigraph/model/context.py:128-137) → Spark's partial
  hash aggregation (automatic) and, under extreme key skew, the explicit
  salted phase-1 below;
- final merge-by-id (/root/reference/investigraph/logic/aggregate.py:68-75)
  → ``groupBy(key).agg(max_by(event, (ts, seq)))``.

Conflict resolution is LWW by ``(ts, seq)`` (strictly ordered, ties impossible
because seq is unique), replacing the reference's union-of-values merge
(/root/reference/investigraph/logic/aggregate.py:25-28) per the north-star
semantics. Everything is declarative Catalyst aggregation — whole-stage
codegen, partial agg map-side, spill-safe — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from investigraph_etl_spark.cdc.events import KEY_COLS

#: Event columns that are never payload.
_EVENT_META = {"op", *KEY_COLS, "ts", "seq"}


def event_payload_cols(
    events: DataFrame, key_cols: tuple[str, ...] = KEY_COLS
) -> list[str]:
    """Payload columns of an event batch = everything that isn't key/op/ts/seq.

    This is how additive schema evolution enters the engine: new columns in the
    tail simply show up here (reference analog: mappings tolerate extra record
    keys, /root/reference/investigraph/model/mapping.py:9-29).
    """
    meta = {"op", *key_cols, "ts", "seq"}
    return [c for c in events.columns if c not in meta]


def resolve_lww(
    events: DataFrame,
    n_salts: int | None = None,
    strategy: str = "max_by",
    key_cols: tuple[str, ...] = KEY_COLS,
    with_count: bool = False,
    pre_partition: int | None = None,
) -> DataFrame:
    """Reduce an event batch to one winning event per ``(conv_id, turn_idx)``.

    Output columns: conv_id, turn_idx, op, <payload...>, ts, seq — where op/
    payload/ts/seq come from the event with the greatest ``(ts, seq)`` stamp.

    ``n_salts``: when set, a salted two-phase reduce — phase 1 groups by
    ``(key, pmod(xxhash64(seq), n_salts))`` so a hot key's events spread over
    ``n_salts`` reducers, phase 2 merges the ≤n_salts survivors per key. Spark's
    partial (map-side) aggregation already bounds shuffle volume to one row per
    key per map task, so salting only pays when a single key floods single map
    tasks too (e.g. a hot conv re-written millions of times in one epoch);
    benchmarked in bench.py, configurable per deployment.

    ``strategy``: physical plan choice, semantics identical (bench.py measures
    both):

    - ``max_by`` — ``max_by(struct(event), struct(ts, seq))``. The struct
      aggregation buffer forces SortAggregate (map-side sort + partial agg);
      shuffle volume is still one row per key per map task.
    - ``packed`` — the event is packed into ONE orderable string
      ``hex(ts)||hex(seq)||json(payload)``, reduced with plain ``max()``
      (primitive buffer → whole-stage-codegen HashAggregate, no sort anywhere),
      then unpacked with ``from_json``. Trades sort for JSON encode/decode, all
      JVM-side.

    ``pre_partition``: hash-partition the events by ``key_cols[0]`` into this
    many partitions BEFORE the reduce. HashPartitioning([conv_id]) satisfies
    the groupBy's ClusteredDistribution([conv_id, turn_idx]) (subset rule),
    so the aggregation runs on that single exchange — and because the lake's
    bucket function is the same murmur3 hash, a width dividing n_buckets
    leaves the output writable with NO second exchange (the fused ingest
    path, see lake/table.py ``_bucket_expr``). The whole epoch becomes
    scan → one exchange → [reduce + write].
    """
    if pre_partition and not (n_salts and n_salts > 1):
        events = events.repartition(pre_partition, F.col(key_cols[0]))
    if strategy == "packed":
        if with_count:
            raise ValueError("with_count is not supported by the packed strategy")
        return _resolve_packed(events, n_salts, key_cols)
    payload = event_payload_cols(events, key_cols)
    # The candidate row travels inside the aggregate as one struct; max_by keeps
    # whole-stage codegen and partial aggregation (no window, no sort).
    # Expressions are built as SQL strings (one parse each, ~3 py4j calls
    # total) — this runs once per micro-batch and Column-op construction was
    # a measurable slice of the per-epoch serial driver floor.
    cols = ", ".join(["op", *[f"`{c}`" for c in payload], "ts", "seq"])
    win = F.expr(f"max_by(struct({cols}), struct(ts, seq))").alias("w")
    cnt = F.expr("count(1)").alias("_cnt")

    if n_salts and n_salts > 1:
        salt = F.expr(f"pmod(xxhash64(seq), {int(n_salts)})").alias("_salt")
        local = events.groupBy(*key_cols, salt).agg(win, cnt)
        # Phase 2: re-aggregate the per-salt winners; stamp lives inside w.
        resolved = local.groupBy(*key_cols).agg(
            F.expr("max_by(w, struct(w.ts, w.seq))").alias("w"),
            F.expr("sum(_cnt)").alias("_cnt"),
        )
    else:
        resolved = events.groupBy(*key_cols).agg(win, cnt)

    return resolved.selectExpr(
        *key_cols,
        "w.op as op",
        *[f"w.`{c}` as `{c}`" for c in payload],
        "w.ts as ts",
        "w.seq as seq",
        # events folded into this winner — per-bucket lineage derives from it
        # for free instead of a second full-batch aggregation.
        *(["_cnt"] if with_count else []),
    )


def _resolve_packed(
    events: DataFrame, n_salts: int | None, key_cols: tuple[str, ...] = KEY_COLS
) -> DataFrame:
    """Hash-aggregate LWW: pack (ts, seq, event) into one max()-able string.

    Big-endian fixed-width hex of non-negative ints sorts lexicographically in
    numeric order, so ``max(packed)`` picks the greatest (ts, seq). ts is
    offset by 2^62 so pre-1970 timestamps stay non-negative.
    """
    from pyspark.sql import types as T

    payload = event_payload_cols(events, key_cols)
    ts_type = events.schema["ts"].dataType
    body = F.to_json(F.struct(F.col("op"), *[F.col(c) for c in payload]))
    packed = F.concat(
        # cast("timestamp"): unix_micros rejects TIMESTAMP_NTZ; under the
        # engine's pinned UTC session tz the cast is wall-clock-preserving.
        F.lpad(
            F.hex(F.unix_micros(F.col("ts").cast("timestamp")) + F.lit(1 << 62)),
            16,
            "0",
        ),
        F.lpad(F.hex(F.col("seq")), 16, "0"),
        body,
    ).alias("p")

    src = events.select(*key_cols, packed, F.col("seq"))
    if n_salts and n_salts > 1:
        salt = F.pmod(F.xxhash64(F.col("seq")), F.lit(n_salts)).alias("_salt")
        local = src.groupBy(*key_cols, salt).agg(F.max("p").alias("p"))
        resolved = local.groupBy(*key_cols).agg(F.max("p").alias("p"))
    else:
        resolved = src.groupBy(*key_cols).agg(F.max("p").alias("p"))

    body_schema = T.StructType(
        [T.StructField("op", T.StringType())]
        + [T.StructField(c, events.schema[c].dataType) for c in payload]
    )
    w = F.from_json(F.substring(F.col("p"), 33, 2_000_000_000), body_schema).alias("w")
    return resolved.select(
        *key_cols,
        w,
        (F.conv(F.substring(F.col("p"), 1, 16), 16, 10).cast("long") - F.lit(1 << 62)).alias("_ts_us"),
        F.conv(F.substring(F.col("p"), 17, 16), 16, 10).cast("long").alias("seq"),
    ).select(
        *key_cols,
        F.col("w.op").alias("op"),
        *[F.col(f"w.{c}").alias(c) for c in payload],
        F.timestamp_micros(F.col("_ts_us")).cast(ts_type).alias("ts"),
        F.col("seq"),
    )
