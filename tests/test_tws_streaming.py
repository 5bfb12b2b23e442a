"""transformWithStateInPandas (Spark 4.x stateful API): running stats
in ValueState and distinct-type membership in MapState, driven by
deterministic file-source micro-batches.

The TWS state protocol needs the protobuf package (its driver worker
imports pyspark...proto.StateMessage_pb2). The *_auto entry points run
real TWS when protobuf is present (standard cluster image) and execute
the SAME StatefulProcessor classes on the applyInPandasWithState
fallback runtime otherwise — so these tests run everywhere, exercising
the processor logic and per-key state accumulation either way.
"""

from __future__ import annotations

import shutil
import uuid
from datetime import datetime

import pytest

from mapreducecore_spark.streaming.tws import (
    distinct_types_auto,
    running_user_stats_auto,
)
from mapreducecore_spark.streaming.windows import read_event_stream

EVENTS_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _ev(eid, ts, user=1, etype="click", value=1.0):
    return (eid, datetime.fromisoformat(ts), user, etype, value, "{}")


@pytest.fixture()
def stream_env(spark, tmp_path):
    src = str(tmp_path / "src")

    def write_batch(rows):
        spark.createDataFrame(rows, EVENTS_COLS).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    yield src, write_batch
    shutil.rmtree(src, ignore_errors=True)


def _start(df, name):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"/tmp/chk-{name}-{uuid.uuid4().hex}")
        .start()
    )


def test_tws_running_stats_accumulate_across_batches(spark, stream_env):
    src, write_batch = stream_env
    write_batch([_ev(1, "2024-06-01 10:00:00", user=7, value=2.0),
                 _ev(2, "2024-06-01 10:01:00", user=7, value=5.0)])
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = _start(running_user_stats_auto(read_event_stream(spark, src)), name)
    try:
        q.processAllAvailable()
        write_batch([_ev(3, "2024-06-01 10:02:00", user=7, value=1.0),
                     _ev(4, "2024-06-01 10:03:00", user=9, value=4.0)])
        q.processAllAvailable()
        # update mode appends one row per key per batch; last row per
        # key carries the final accumulator.
        rows = spark.sql(
            f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
            f"ORDER BY n_events DESC) rn FROM {name}) WHERE rn = 1"
        ).collect()
        stats = {r["user_id"]: r for r in rows}
        assert stats[7]["n_events"] == 3
        assert stats[7]["total_value"] == pytest.approx(8.0)
        assert stats[7]["max_value"] == pytest.approx(5.0)
        assert stats[9]["n_events"] == 1
    finally:
        q.stop()


def test_tws_mapstate_distinct_types(spark, stream_env):
    src, write_batch = stream_env
    write_batch([_ev(1, "2024-06-01 10:00:00", user=7, etype="view"),
                 _ev(2, "2024-06-01 10:01:00", user=7, etype="click")])
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = _start(distinct_types_auto(read_event_stream(spark, src)), name)
    try:
        q.processAllAvailable()
        # 'view' repeats (no growth), 'purchase' is new.
        write_batch([_ev(3, "2024-06-01 10:02:00", user=7, etype="view"),
                     _ev(4, "2024-06-01 10:03:00", user=7, etype="purchase")])
        q.processAllAvailable()
        last = spark.sql(
            f"SELECT max(n_types) AS n FROM {name} WHERE user_id = 7"
        ).collect()[0]["n"]
        assert last == 3
    finally:
        q.stop()
