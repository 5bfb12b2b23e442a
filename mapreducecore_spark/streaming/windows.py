"""Streaming operators over the events schema.

Each builder takes a (streaming) DataFrame with the events schema
(event_id long, ts timestamp, user_id long, event_type string,
value double, props string) and returns the transformed streaming
DataFrame; the caller owns the sink. Batch DataFrames work too — the
logical plans are identical, which is how the oracle-backed batch
queries in queries/streaming_batch.py stay in lockstep with these.

Watermarks bound state: at 100 TB/day the window state store only
retains (watermark window, key) entries, and late rows beyond the
watermark are dropped instead of growing state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def read_event_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based streaming source (one batch per file by default —
    deterministic micro-batches for tests; swap for Kafka in prod)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling event-time windows; append-mode-finalizable via watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )


def session_counts(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows: merge events per user while gaps stay < gap."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def dedup_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup on event_id: state holds ids only within the
    watermark horizon (bounded), duplicates beyond it age out."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def enrich_with_static(events: DataFrame, dim: DataFrame, on: str | list[str]) -> DataFrame:
    """Stream-static join: each micro-batch joins against the (batch)
    dimension table; Spark re-plans per batch so broadcast applies when
    the dim is small."""
    return events.join(dim, on)


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Running per-user counts (update/complete mode; unbounded keys ->
    in production pair with state TTL or switch to windowed counts)."""
    return events.groupBy("user_id").agg(
        F.count("*").alias("n"), F.max("ts").alias("last_seen")
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    watermark: str = "10 minutes",
    join_horizon: str = "5 minutes",
) -> DataFrame:
    """Stream-stream inner join: pair each left event with right events
    of the SAME user within [left.ts, left.ts + join_horizon]. Both
    sides are watermarked so the state store can evict rows once the
    event-time range condition can no longer match — without the time
    bound, stream-stream join state grows forever."""
    l = left.withWatermark("ts", watermark).select(
        F.col("event_id").alias("l_id"),
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
        F.col("event_type").alias("r_type"),
    )
    return l.join(
        r,
        F.expr(
            f"""
            l_user = r_user AND
            r_ts >= l_ts AND
            r_ts <= l_ts + INTERVAL {join_horizon}
            """
        ),
    )
