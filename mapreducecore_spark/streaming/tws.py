"""Custom stateful streaming on the transformWithStateInPandas API
(Spark 4.x) — the successor to applyInPandasWithState with typed,
composable state primitives (ValueState / ListState / MapState and
timers) instead of one opaque tuple.

Two processors:
- RunningStatsProcessor: per-user count/sum/max in a ValueState —
  functionally the twin of streaming/stateful.py's
  applyInPandasWithState version, so both APIs stay covered;
- DistinctTypesProcessor: per-user set of seen event types in a
  MapState (grow-only membership), emitting the distinct-count —
  state that the old API would force into a serialized blob.

Scale notes: state is keyed and partitioned by the grouping key in the
state store (RocksDB-backed on a real cluster); per-batch work touches
only keys present in the micro-batch. The Pandas variant moves rows
Arrow-batched, never per-row.

Environment note: the TWS state protocol requires the protobuf package
(pyspark's transform_with_state_driver_worker imports generated
StateMessage_pb2). This container lacks protobuf, so tests/
test_tws_streaming.py skips itself when `google.protobuf` is missing;
the code runs unchanged on a standard cluster image.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

STATS_OUTPUT = "user_id BIGINT, n_events BIGINT, total_value DOUBLE, max_value DOUBLE"
DISTINCT_OUTPUT = "user_id BIGINT, n_types BIGINT"


class RunningStatsProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "stats", "n BIGINT, total DOUBLE, mx DOUBLE"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n, total, mx = (
            self._state.get() if self._state.exists() else (0, 0.0, float("-inf"))
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        self._state.update((n, total, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [total],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


class DistinctTypesProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getMapState("seen", "t STRING", "one TINYINT")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        for pdf in rows:
            for t in pdf["event_type"].unique():
                if not self._seen.containsKey((t,)):
                    self._seen.updateValue((t,), (1,))
        n = sum(1 for _ in self._seen.keys())
        yield pd.DataFrame({"user_id": [key[0]], "n_types": [n]})

    def close(self) -> None:
        pass


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running count/sum/max via transformWithStateInPandas."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningStatsProcessor(),
            outputStructType=STATS_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )


def distinct_types_tws(events: DataFrame) -> DataFrame:
    """Per-user distinct event-type count held in MapState."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            DistinctTypesProcessor(),
            outputStructType=DISTINCT_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )
    )
