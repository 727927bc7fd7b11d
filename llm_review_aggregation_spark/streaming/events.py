"""Structured Streaming ingestion for the engine's event/page feeds.

The reference pipeline is batch-only (SURVEY §2.9); this module is the
engine's forward path for continuously-arriving crawl data: a file-source
stream with event-time watermarking and tumbling-window aggregation, plus an
incremental exact-dedup stage (dropDuplicatesWithinWatermark) matching the
batch fingerprint semantics.

Tests drive it with ``trigger(availableNow=True)`` against parquet
directories so results are comparable to the batch equivalents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(path)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling-window counts + value sums per event_type, late data bounded
    by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint_dir: str):
    """Drain everything currently available into a memory sink; returns the
    finished StreamingQuery (results at `SELECT * FROM <query_name>`)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Incremental exact dedup on (event_id) within the watermark — the
    streaming analog of operators/dedup.dedup_exact."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_append_to_memory(stream_df: DataFrame, query_name: str, checkpoint_dir: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
