"""Remote-source acquisition: HTTP(S) fetch with conditional re-read, and
format decoders Spark lacks natively (xlsx)."""

from investigraph_etl_spark.sources.http import FetchResult, fetch, head_key

__all__ = ["FetchResult", "fetch", "head_key"]
