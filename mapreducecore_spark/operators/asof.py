"""Merge-asof join: for each left row, the latest right row at-or-before it.

The reference has no joins at all (SURVEY.md §2.D: the only operators in
/root/reference/src/ are the map/shuffle/reduce surface, worker.h:73-160);
as-of is declared-scope from the north star (time-series enrichment is a
staple of large-scale event pipelines). Engines like DuckDB expose it as
`ASOF JOIN`; Spark has no built-in, so we implement the classic scalable
merge pattern:

    union(tag left rows, tag right rows)
      -> single shuffle on the join key
      -> one sort per partition on (time, tag, tie_break)
      -> running `last(value, ignorenulls=True)` window fills each left
         row with the most recent right row's payload

Scale stance (100 TB): exactly ONE shuffle + ONE sort over |L|+|R| rows,
same cost shape as a sort-merge join — no per-row subqueries, no
broadcast of either side, no skew beyond what the key distribution
already implies. Rows-between running windows stream in Spark (no full
partition materialization), so hot keys spill instead of OOM.

Tie semantics: right rows sort BEFORE left rows at an equal timestamp
(inclusive <=), and among right rows with equal timestamps the LAST one
in `tie_break` ascending order wins (i.e. max tie_break) — fully
deterministic output.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_K, _T, _R = "__asof_k", "__asof_t", "__asof_isright"


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tie_break: str | None = None,
) -> DataFrame:
    """Left as-of join: attach, to every `left` row, `value_cols` from the
    latest `right` row with right_on == left_on and right_time <= left_time.
    Unmatched left rows keep NULL values (filter afterwards for inner).
    """
    right_types = {f.name: f.dataType for f in right.schema.fields}
    lcols = left.columns

    l_tagged = left.select(
        *lcols,
        F.col(left_on).alias(_K),
        F.col(left_time).alias(_T),
        F.lit(0).alias(_R),
        *[F.lit(None).cast(right_types[c]).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.col(right_on).alias(_K),
        F.col(right_time).alias(_T),
        F.lit(1).alias(_R),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )

    order: list[Column] = [F.col(_T).asc(), F.col(_R).desc()]
    if tie_break is not None:
        # among equal-time right rows, the max tie_break is the survivor
        order.append(F.when(F.col(_R) == 1, F.col(f"__v_{tie_break}")).asc_nulls_first())

    w = (
        Window.partitionBy(_K)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tagged.unionByName(r_tagged).select(
        *lcols,
        F.col(_R),
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.filter(F.col(_R) == 0).drop(_R)
