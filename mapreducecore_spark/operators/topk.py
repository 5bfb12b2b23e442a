"""Per-group top-k: window row_number + filter.

Catalyst (3.5+) rewrites rank<=k filters into WindowGroupLimit, which
pushes a per-partition partial top-k below the exchange — each map task
keeps at most k rows per group before shuffling, so the shuffle volume
is bounded by k x groups, not the input size. That is why this beats
sort-per-group at 100 TB (asserted in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, part_cols: list[str], order_cols: list[Column], k: int
) -> DataFrame:
    """order_cols must define a total order within each group for a
    deterministic result (append a unique key as the last tiebreak)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
