from timescaledb_event_streamer_spark.functions.timeseries import (
    gapfill_buckets,
    gapfill_buckets_auto,
    locf,
    time_bucket,
    time_bucket_epoch,
)

__all__ = [
    "time_bucket",
    "time_bucket_epoch",
    "gapfill_buckets",
    "gapfill_buckets_auto",
    "locf",
]
