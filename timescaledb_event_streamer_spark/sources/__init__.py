from timescaledb_event_streamer_spark.sources.tables import TABLES, load

__all__ = ["TABLES", "load"]
