"""Driver contract for the spark-graft builder (PySpark target).

The real registry lives in ``investigraph_etl_spark/plans/queries.py`` —
every entry is a PySpark plan plus a value-identical DuckDB oracle (shared
md5-based portable hashing, order-stable double folds, exact decimal sums;
see that module's docstring for the parity conventions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from investigraph_etl_spark.plans.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full multi-epoch CDC apply (normalize → LWW resolve →
    copy-on-write MERGE with exactly-once commit log) on sf0.001."""
    return QUERIES["cdc_apply_epochs"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data pipeline operators: dedup, similarity search, text
    analysis, multimodal plumbing)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle per query, value-identical by construction."""
    return dict(ORACLES)
