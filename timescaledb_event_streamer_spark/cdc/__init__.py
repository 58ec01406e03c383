from timescaledb_event_streamer_spark.cdc.envelope import (
    OP_CREATE,
    OP_DELETE,
    OP_MESSAGE,
    OP_READ,
    OP_TIMESCALE,
    OP_TRUNCATE,
    OP_UPDATE,
    derive_op,
    read_envelope,
    stream_envelope,
    ts_ms,
)

__all__ = [
    "OP_READ",
    "OP_CREATE",
    "OP_UPDATE",
    "OP_DELETE",
    "OP_TRUNCATE",
    "OP_MESSAGE",
    "OP_TIMESCALE",
    "derive_op",
    "read_envelope",
    "stream_envelope",
    "ts_ms",
]
