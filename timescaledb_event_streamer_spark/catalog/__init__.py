from timescaledb_event_streamer_spark.catalog.chunks import (
    CHUNK_INTERVAL_S,
    chunk_catalog,
    resolve_chunks,
)
from timescaledb_event_streamer_spark.catalog.naming import (
    DEFAULT_PREFIX,
    event_topic,
    message_topic,
    schema_topic,
)
from timescaledb_event_streamer_spark.catalog.tablefilter import (
    TableFilter,
    pattern_to_regex,
)

__all__ = [
    "CHUNK_INTERVAL_S",
    "chunk_catalog",
    "resolve_chunks",
    "DEFAULT_PREFIX",
    "event_topic",
    "schema_topic",
    "message_topic",
    "TableFilter",
    "pattern_to_regex",
]
