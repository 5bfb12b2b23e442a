"""Batch-mode equivalents of the streaming operator surface over
`events` — tumbling/sliding/session windows, dedup, stateful counts.

Structured Streaming executes the same logical plans incrementally
(streaming/windows.py builds the readStream variants; tests run them
with processAllAvailable). These batch forms carry the DuckDB oracles.

events.ts is ns in parquet: Spark truncates to micros, DuckDB keeps ns;
casting to micros on the DuckDB side and formatting outputs at second
precision keeps both engines on shared ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register
from mapreducecore_spark.queries._util import SPARK_TS_FMT, dec

_DUCK_TS = "CAST(ts AS TIMESTAMP)"  # ns -> us truncation, same as Spark


@register(
    "events_tumbling_window",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '1 hour', {_DUCK_TS}), '%Y-%m-%d %H:%M:%S') AS wstart,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows (streaming form: same agg after
    readStream + withWatermark)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(dec("value", 4)).cast("double").alias("total_value"))
        .select(
            F.date_format("w.start", SPARK_TS_FMT).alias("wstart"),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "events_sliding_window",
    oracle=f"""
    SELECT strftime(time_bucket(INTERVAL '30 minutes', {_DUCK_TS})
                    - o.off * INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS wstart,
           COUNT(*) AS n
    FROM events, (SELECT unnest([0, 1]) AS off) o
    GROUP BY 1
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1h length, 30min slide (each event in 2 windows)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", SPARK_TS_FMT).alias("wstart"), "n")
    )


@register(
    "events_session_window",
    oracle=f"""
    WITH e AS (SELECT user_id, {_DUCK_TS} AS ts, value FROM events),
    flagged AS (
      SELECT *, CASE WHEN ts - LAG(ts) OVER w >= INTERVAL '5 minutes'
                       OR LAG(ts) OVER w IS NULL
                     THEN 1 ELSE 0 END AS new_s
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 5-minute gap per user (F.session_window;
    the oracle reproduces gap-merge semantics via island detection)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum(dec("value", 4)).cast("double").alias("total_value"))
        .select(
            "user_id",
            F.date_format("w.start", SPARK_TS_FMT).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@register(
    "events_dedup",
    oracle=f"""
    SELECT event_id,
           strftime(MIN({_DUCK_TS}), '%Y-%m-%d %H:%M:%S') AS first_ts,
           COUNT(*) AS n_copies
    FROM events GROUP BY event_id
    """,
)
def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup on event_id (keep earliest). Streaming form:
    dropDuplicates(['event_id']) under a watermark — tested in
    tests/test_streaming.py."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("event_id")
        .agg(
            F.date_format(F.min("ts"), SPARK_TS_FMT).alias("first_ts"),
            F.count("*").alias("n_copies"),
        )
    )


@register(
    "events_stateful_counts",
    oracle=f"""
    SELECT user_id, event_type, COUNT(*) AS n,
           strftime(MAX({_DUCK_TS}), '%Y-%m-%d %H:%M:%S') AS last_seen
    FROM events GROUP BY user_id, event_type
    """,
)
def events_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-key counts (streaming form: groupBy().count() in
    update mode / applyInPandasWithState — tests drive the stateful
    variant)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.date_format(F.max("ts"), SPARK_TS_FMT).alias("last_seen"),
        )
    )
