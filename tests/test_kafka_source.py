"""Kafka-style source: wire-schema parity between the real connector
builder and the offline simulator, payload parsing, and the clear
failure mode when the connector jar is absent (SURVEY §2.A S8)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from mapreducecore_spark.sources.kafka import (
    KAFKA_WIRE_SCHEMA,
    kafka_stream,
    parse_event_payload,
    simulated_kafka_stream,
)


def test_simulator_emits_kafka_wire_schema(spark):
    df = simulated_kafka_stream(spark)
    assert df.isStreaming
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    expect = [
        ("key", "binary"),
        ("value", "binary"),
        ("topic", "string"),
        ("partition", "int"),
        ("offset", "bigint"),
        ("timestamp", "timestamp"),
        ("timestampType", "int"),
    ]
    assert got == expect
    # The declared schema constant round-trips through Spark DDL.
    ddl = spark.createDataFrame([], KAFKA_WIRE_SCHEMA).schema
    assert [(f.name, f.dataType.simpleString()) for f in ddl.fields] == expect


def test_parse_event_payload_on_wire_rows(spark):
    # parse step is pure column ops — verify on a static frame with the
    # exact wire schema (what a real Kafka micro-batch looks like).
    ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    wire = spark.createDataFrame(
        [
            (
                b"1",
                b'{"event_id": 1, "user_id": 7, "event_type": "click", "value": 2.5}',
                "events",
                0,
                1,
                ts,
                0,
            ),
            (b"2", b"not json at all", "events", 1, 2, ts, 0),
        ],
        KAFKA_WIRE_SCHEMA,
    )
    rows = {r["offset"]: r for r in parse_event_payload(wire).collect()}
    ok = rows[1]
    assert (ok["event_id"], ok["user_id"], ok["event_type"], ok["value"]) == (
        1,
        7,
        "click",
        2.5,
    )
    # Malformed payloads surface as NULL columns (PERMISSIVE), not errors.
    assert rows[2]["event_id"] is None


def test_simulated_stream_drains_through_parse(spark):
    out = parse_event_payload(simulated_kafka_stream(spark, rows_per_second=500))
    q = (
        out.writeStream.format("memory")
        .queryName("kafka_sim_parse")
        .outputMode("append")
        .trigger(processingTime="250 milliseconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) FROM kafka_sim_parse").collect()[0][0]
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
        row = spark.sql(
            "SELECT * FROM kafka_sim_parse ORDER BY offset LIMIT 1"
        ).collect()[0]
        assert row["event_type"] in ("view", "click", "purchase")
        assert row["user_id"] == row["offset"] % 97
    finally:
        q.stop()


def test_real_kafka_reader_raises_clear_error_without_connector(spark):
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        kafka_stream(spark, brokers="localhost:9092", topics="events")
