"""Structured Streaming ingest: change-tail directory → exactly-once MERGE loop."""

from investigraph_etl_spark.streaming.ingest import IngestPipeline

__all__ = ["IngestPipeline"]
