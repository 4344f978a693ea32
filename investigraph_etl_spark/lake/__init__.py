"""Transactional, bucketed lake-table layer (Iceberg-style commit log on parquet).

No Iceberg/Delta jars exist in this sandbox, so the engine carries its own
minimal table format with the properties the CDC sink needs: atomic commits,
snapshot reads, MERGE that rewrites only touched key-buckets, additive schema
evolution, an epoch commit log for exactly-once, and time travel for debugging.
On a deployment with a real Iceberg catalog the apply step can be swapped for
``MERGE INTO`` (the public API of :class:`LakeTable` is sink-shaped for that).
"""

from investigraph_etl_spark.lake.table import LakeTable

__all__ = ["LakeTable"]
