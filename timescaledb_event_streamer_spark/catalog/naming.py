"""Debezium naming strategy for event/schema topics.

Reference parity: spi/schema/namegenerator.go +
internal/eventing/namingstrategy/debezium.go — event topic is
``{prefix}.{schemaName}.{tableName}``, schema topic the same, and
replication messages go to ``{prefix}.message``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_PREFIX = "timescaledb"


def _topic(prefix: str, schema: Column | str, table: Column | str) -> Column:
    schema_col = F.col(schema) if isinstance(schema, str) else schema
    table_col = F.col(table) if isinstance(table, str) else table
    return F.concat_ws(".", F.lit(prefix), schema_col, table_col)


def event_topic(schema: Column | str, table: Column | str, prefix: str = DEFAULT_PREFIX) -> Column:
    return _topic(prefix, schema, table)


def schema_topic(schema: Column | str, table: Column | str, prefix: str = DEFAULT_PREFIX) -> Column:
    return _topic(prefix, schema, table)


def message_topic(prefix: str = DEFAULT_PREFIX) -> Column:
    return F.concat_ws(".", F.lit(prefix), F.lit("message"))


def sanitize_topic(topic: Column) -> Column:
    """Broker-safe topic names: every character outside
    ``[A-Za-z0-9._-]`` becomes ``_`` (reference
    internal/eventing/namingstrategy/sanitization.go:24-40)."""
    return F.regexp_replace(topic, r"[^A-Za-z0-9._\-]", "_")
