"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship query; queries()/oracle_sql() expose the full
operator registry from mapreducecore_spark.queries (one entry per
implemented SURVEY.md §2 operator, each oracle-checked against DuckDB
where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreducecore_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped 6-way
    join + aggregate (broadcast dims, shuffled facts)."""
    from mapreducecore_spark.queries.relational import q5_nation_revenue

    return q5_nation_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for the genuinely
    non-SQL-expressible ops -> driver does rows-only checks there)."""
    return all_oracles()
