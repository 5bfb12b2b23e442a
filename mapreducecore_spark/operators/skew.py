"""Skew mitigation: salting for hot keys.

The reference OOMs on a hot key (whole partition in one std::map,
worker.h:127 — SURVEY §7 risk 5). Spark's AQE skew-join splitting
covers sort-merge joins; these helpers cover the remaining cases:
aggregations with a dominant key, and broadcast-infeasible joins where
one side's key histogram is pathological.

Salts are deterministic (hash of the full row, not rand()) so results
are reproducible and retries are safe — a nondeterministic salt breaks
Spark's task-retry exactly-once story.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n_salts: int) -> Column:
    # Hash every column -> stable pseudo-random salt per row.
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys: partial-aggregate on
    (key, salt) — spreading a hot key over n_salts reducers — then
    final-aggregate on key. Only decomposable aggregates (sum/count/
    min/max) are valid; the caller passes the partial aggs and we
    re-sum them (sum-of-sums, sum-of-counts, min-of-mins, max-of-maxs
    are all the same re-aggregation except count -> sum).

    aggs must be pre-aliased; the final phase re-aggregates by alias:
    sum for sum/count aliases, min/max if the alias starts min_/max_.
    """
    salted = df.withColumn("__salt", _salt_col(df, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(*aggs)
    agg_names = [c for c in partial.columns if c not in (*keys, "__salt")]

    def refold(name: str) -> Column:
        if name.startswith("min_"):
            return F.min(name).alias(name)
        if name.startswith("max_"):
            return F.max(name).alias(name)
        return F.sum(name).alias(name)  # sums and counts re-sum

    return partial.groupBy(*keys).agg(*[refold(n) for n in agg_names])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: salt the (large, skewed) left side and
    replicate the right side n_salts times so a hot key's rows spread
    over n_salts tasks instead of one straggler.

    Right-side replication multiplies its shuffle volume by n_salts —
    use when `right` is too big to broadcast but far smaller than
    `left` (else prefer AQE skew-join on the plain join).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics of replication)")
    salted_left = left.withColumn("__salt", _salt_col(left, n_salts))
    replicated_right = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_left.join(replicated_right, [*on, "__salt"], how)
    return out.drop("__salt")
