"""Kafka-style streaming source (SURVEY.md §2.A row S8).

The real path is Spark's built-in Kafka connector
(`format("kafka")` — requires the spark-sql-kafka-0-10 package on the
classpath, absent in this container). `kafka_stream` builds exactly
that reader; `simulated_kafka_stream` produces the SAME wire schema
from the rate source so every downstream operator (parse, watermark,
windowed agg) is testable offline and swaps to the real connector by
changing one call.

Kafka wire schema (fixed by the connector, not by us):
  key BINARY, value BINARY, topic STRING, partition INT, offset LONG,
  timestamp TIMESTAMP, timestampType INT

Scale notes: one Spark input partition per Kafka topic-partition;
`maxOffsetsPerTrigger` bounds micro-batch size (backpressure);
`minPartitions` splits hot topic-partitions. Parsed payloads should
drop key/value bytes immediately after `from_json` so state and
shuffles carry typed columns, not blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_WIRE_SCHEMA = (
    "key BINARY, value BINARY, topic STRING, partition INT, "
    "offset BIGINT, timestamp TIMESTAMP, timestampType INT"
)


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
) -> DataFrame:
    """readStream against real Kafka. Raises a clear error when the
    connector jar is absent (this container) — callers that want an
    offline stand-in use simulated_kafka_stream, same schema."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    try:
        return reader.load()
    except Exception as exc:  # connector not on classpath
        raise RuntimeError(
            "Kafka connector unavailable (needs org.apache.spark:"
            "spark-sql-kafka-0-10 on the classpath). Use "
            "simulated_kafka_stream() for an offline source with the "
            "identical wire schema."
        ) from exc


def simulated_kafka_stream(
    spark: SparkSession,
    topic: str = "events",
    rows_per_second: int = 100,
    n_partitions: int = 4,
) -> DataFrame:
    """Rate-source stand-in emitting the exact Kafka wire schema.
    value is a JSON payload (event_id/user_id/event_type/value) so the
    standard parse step (`parse_event_payload`) exercises the same code
    the real connector would feed."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )  # schema: timestamp TIMESTAMP, value LONG
    payload = F.to_json(
        F.struct(
            F.col("value").alias("event_id"),
            F.pmod(F.col("value"), F.lit(97)).alias("user_id"),
            F.element_at(
                F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
                (F.pmod(F.col("value"), F.lit(3)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.col("value"), F.lit(1000)) / 10.0).alias("value"),
        )
    )
    return rate.select(
        F.col("value").cast("string").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.col("value"), F.lit(n_partitions)).cast("int").alias("partition"),
        F.col("value").alias("offset"),
        F.col("timestamp").alias("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),
    )


EVENT_PAYLOAD_SCHEMA = (
    "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE"
)


def parse_event_payload(kafka_df: DataFrame) -> DataFrame:
    """Standard parse step: bytes -> typed columns, blobs dropped
    immediately so downstream state/shuffles carry narrow rows."""
    return kafka_df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), EVENT_PAYLOAD_SCHEMA).alias("ev"),
    ).select("topic", "partition", "offset", "kafka_ts", "ev.*")
