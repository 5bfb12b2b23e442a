"""Custom stateful streaming via applyInPandasWithState.

For operators the built-in windowed aggregations can't express —
running per-key accumulators with arbitrary Python transition logic.
State lives in Spark's state store per key; each micro-batch hands the
key's new rows + prior state to the function. This is the Spark-native
replacement for "stateful reducer" patterns a MapReduce user would
hand-roll with external storage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE, max_value DOUBLE"
STATE_SCHEMA = "n BIGINT, total DOUBLE, mx DOUBLE"


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "max_value": [mx]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Running per-user count/sum/max maintained in the state store;
    emits the updated accumulator for each key seen in the batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
