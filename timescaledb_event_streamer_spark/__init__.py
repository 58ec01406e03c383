"""PySpark-native analytics engine with the data-processing
capabilities of noctarius/timescaledb-event-streamer.

The reference (Go, /root/reference) streams TimescaleDB CDC events:
logical replication -> chunk->hypertable resolution -> Debezium-style
envelopes -> sinks. This package re-expresses those semantics
Spark-first (DataFrame/SQL + Structured Streaming) and adds the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

See SURVEY.md for the capability inventory and architecture.
"""

__version__ = "0.1.0"
