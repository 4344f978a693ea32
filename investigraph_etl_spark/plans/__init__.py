"""Query plans: the engine's public query surface over lake/parquet tables.

``queries.py`` holds the driver-facing registry — every operator from
SURVEY.md §2 (plus the training-data additions) expressed as a
``(spark, sf_dir) -> DataFrame`` plan with a value-identical DuckDB oracle.
"""
