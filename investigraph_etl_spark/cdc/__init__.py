"""CDC core: change-event schema, deterministic generator, LWW resolve, MERGE apply,
pandas replay oracle, and the streaming ingest loop."""

from investigraph_etl_spark.cdc.events import (
    CHANGE_EVENT_SCHEMA,
    KEY_COLS,
    OPS,
    PAYLOAD_COLS,
    TRANSCRIPT_SCHEMA,
    normalize_events,
)
from investigraph_etl_spark.cdc.generator import GeneratorConfig, generate_events
from investigraph_etl_spark.cdc.oracle import replay_oracle
from investigraph_etl_spark.cdc.resolve import resolve_lww

__all__ = [
    "CHANGE_EVENT_SCHEMA",
    "KEY_COLS",
    "OPS",
    "PAYLOAD_COLS",
    "TRANSCRIPT_SCHEMA",
    "normalize_events",
    "GeneratorConfig",
    "generate_events",
    "replay_oracle",
    "resolve_lww",
]
