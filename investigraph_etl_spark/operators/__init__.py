"""Dataset-level operators for the 100 TB training-data pipeline.

Each operator is a function ``(DataFrame, ...) -> DataFrame`` built from
declarative Spark ops (the scale path: shuffle only on candidate keys, never
all-pairs), plus a ``*_sql`` twin generating the equivalent DuckDB query for
the driver's value-level oracle. See :mod:`investigraph_etl_spark.functions`
for the shared scalar kernels.
"""
