"""Window-function queries — SURVEY.md §2.D "Window functions" row.

Determinism contract: ranks computed over ties are engine-stable only
when the ORDER BY either is total (unique key appended) or the ranked
value depends solely on the sort key (rank/dense_rank). row_number over
a non-total order is NOT deterministic — every query here orders by a
provably-unique key set before using row_number/lag/lead/rows frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register
from mapreducecore_spark.queries._util import d_str, dec


@register(
    "window_row_number",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
    FROM orders
    """,
)
def window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return t["orders"].select("o_custkey", "o_orderkey", F.row_number().over(w).alias("rn"))


@register(
    "window_rank_dense",
    oracle="""
    SELECT o_orderkey,
           CAST(RANK()       OVER (PARTITION BY o_orderstatus ORDER BY year(o_orderdate)) AS INT) AS rk,
           CAST(DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY year(o_orderdate)) AS INT) AS drk
    FROM orders
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over a tied sort key (deterministic despite ties)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy(F.year("o_orderdate"))
    return t["orders"].select(
        "o_orderkey", F.rank().over(w).alias("rk"), F.dense_rank().over(w).alias("drk")
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(LAG(o_totalprice)  OVER w AS DOUBLE) AS prev_price,
           CAST(LEAD(o_totalprice) OVER w AS DOUBLE) AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum (exact decimal inside the frame -> engine-stable)."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS moving_avg
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average via exact sum / frame count."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        (F.sum(dec("o_totalprice")).over(w).cast("double") / F.count("*").over(w)).alias(
            "moving_avg"
        ),
    )


@register(
    "window_range_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, sz,
           CAST(COUNT(*) OVER (PARTITION BY l_returnflag ORDER BY sz
                               RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_near
    FROM (SELECT l_orderkey, l_linenumber, l_returnflag,
                 CAST(l_quantity AS BIGINT) AS sz
          FROM lineitem WHERE l_orderkey < 1000)
    """,
)
def window_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric value (value-defined, so tie-safe)."""
    t = load_tables(spark, sf_dir)
    base = (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 1000)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.col("l_quantity").cast("bigint").alias("sz"),
        )
    )
    w = Window.partitionBy("l_returnflag").orderBy("sz").rangeBetween(-2, Window.currentRow)
    return base.select(
        "l_orderkey", "l_linenumber", "sz", F.count("*").over(w).alias("n_near")
    )


@register(
    "window_extras",
    oracle="""
    SELECT o_orderkey,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 9) AS cume,
           FIRST_VALUE(o_orderkey) OVER wf AS first_key,
           LAST_VALUE(o_orderkey) OVER wf AS last_key,
           NTH_VALUE(o_orderkey, 2) OVER wf AS second_key
    FROM orders
    WINDOW w  AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey),
           wf AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / first,last,nth_value over a
    total order (rank fractions are int-ratio doubles -> exact)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t["orders"].select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cume"),
        F.first("o_orderkey").over(wf).alias("first_key"),
        F.last("o_orderkey").over(wf).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear
    interpolation over the sorted set)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
        )
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: window row_number + filter (Catalyst pushes the
    rank limit into a partial top-k before the shuffle on Spark 3.5+)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "orderby_limit_multikey",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def orderby_limit_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-key sort + limit (TakeOrderedAndProject physical op)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            d_str("o_orderdate", "orderdate"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "window_range_interval_90d",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rev_90d
    FROM orders WHERE o_custkey < 200
    """,
)
def window_range_interval_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per-customer trailing-90-day revenue.
    RANGE peers (same order date) aggregate identically on both engines,
    so date ties are safe. Spark's numeric range frame over epoch
    seconds == DuckDB's INTERVAL frame (both bounds inclusive)."""
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-90 * 86400, Window.currentRow)
    )
    return (
        t["orders"]
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w)
            .cast("double")
            .alias("rev_90d"),
        )
    )


@register(
    "agg_rollup_grouping_flags",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           count(*) AS n
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING() markers distinguishing subtotal rows from
    genuine NULL group keys."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
            F.count("*").alias("n"),
        )
    )


@register(
    "agg_multi_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS d_parts,
           count(DISTINCT l_suppkey) AS d_supps,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate — Catalyst plans an
    Expand (one replicated stream per distinct set) so a single pass
    covers all three aggregates."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("d_parts"),
        F.countDistinct("l_suppkey").alias("d_supps"),
        F.count("*").alias("n"),
    )


@register(
    "window_ignore_nulls",
    oracle="""
    SELECT o_orderkey,
           lag(o_orderkey, 2, -1) OVER w AS lag2,
           lead(o_orderkey, 3, -1) OVER w AS lead3,
           last_value(nullif(o_orderstatus, 'O') IGNORE NULLS) OVER
               (PARTITION BY o_custkey ORDER BY o_orderkey
                ROWS UNBOUNDED PRECEDING) AS last_nonopen
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with offset+default, and last_value IGNORE NULLS (the
    forward-fill idiom: carry the last non-null observation)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t["orders"].select(
        "o_orderkey",
        F.lag("o_orderkey", 2, -1).over(w).alias("lag2"),
        F.lead("o_orderkey", 3, -1).over(w).alias("lead3"),
        F.last(F.nullif(F.col("o_orderstatus"), F.lit("O")), ignorenulls=True)
        .over(wf)
        .alias("last_nonopen"),
    )
