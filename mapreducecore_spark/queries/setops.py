"""Set operations — SURVEY.md §2.D "Set ops" row."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register


def _cust_nations(t):
    return t["customer"].select(F.col("c_nationkey").cast("int").alias("nationkey"))


def _supp_nations(t):
    return t["supplier"].select(F.col("s_nationkey").cast("int").alias("nationkey"))


@register(
    "set_union_all",
    oracle="""
    SELECT nationkey, COUNT(*) AS n FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserves duplicates (counted to keep output compact)."""
    t = load_tables(spark, sf_dir)
    return (
        _cust_nations(t)
        .unionAll(_supp_nations(t))
        .groupBy("nationkey")
        .agg(F.count("*").alias("n"))
    )


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return _cust_nations(t).union(_supp_nations(t)).distinct()


@register(
    "set_union_by_name",
    oracle="""
    SELECT nationkey, src FROM (
        SELECT c_nationkey AS nationkey, 'cust' AS src FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supp' AS src FROM supplier
    )
    """,
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: columns aligned by name, not position (the two
    inputs deliberately have different column orders)."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(
        F.col("c_nationkey").cast("int").alias("nationkey"), F.lit("cust").alias("src")
    )
    b = t["supplier"].select(
        F.lit("supp").alias("src"), F.col("s_nationkey").cast("int").alias("nationkey")
    )
    return a.unionByName(b)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return _cust_nations(t).intersect(_supp_nations(t))


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics, matching SQL EXCEPT in both engines)."""
    t = load_tables(spark, sf_dir)
    return _cust_nations(t).subtract(_supp_nations(t))
