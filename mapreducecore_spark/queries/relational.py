"""Core relational queries — scans, filters, joins, aggregations.

Covers SURVEY.md §2.D rows: projection/filter, all join types, group-by
aggregates, count-distinct, rollup/cube/grouping-sets, having. The
reference has none of these (SURVEY §2.D: grep-level absence of join/
SQL machinery in /root/reference/src/); they are declared scope from
BASELINE.json's north star, expressed as stock DataFrame ops so
Catalyst owns pushdown, pruning, and join selection.

Scale notes (100 TB stance):
- fact-to-fact joins (lineitem⋈orders) shuffle on the join key and rely
  on AQE for skew splitting; dimension joins (nation, region) are
  explicit `broadcast()` — dimension size is constant in SF;
- every aggregate is partial-aggregated map-side by Catalyst (the
  reference ships every (k,v) to the reducer: mr_tasks.h:46 — Spark's
  hash-partial aggregation is the fix);
- filters sit directly on parquet scan columns so they push down
  (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register
from mapreducecore_spark.queries._util import d_str, davg, dec, dsum


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, the canonical partial-agg test."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.col("l_shipdate") <= "1998-09-02")
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    n = F.count("*")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        F.sum(disc_price).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity")).cast("double") / n).alias("avg_qty"),
        (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
        (F.sum(dec("l_discount")).cast("double") / n).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "q3_top_orders_by_revenue",
    oracle="""
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact⋈fact join, aggregate, deterministic top-k."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(18,2)")
    revenue = dec("l_extendedprice") * (one - dec("l_discount"))
    joined = (
        t["orders"]
        .filter(F.col("o_orderdate") < "1998-01-01")
        .join(
            t["lineitem"].filter(F.col("l_shipdate") > "1998-01-01"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    return (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", d_str("o_orderdate", "orderdate"), "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    oracle="""
    SELECT n.n_name, r.r_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name, r.r_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; dims broadcast, facts shuffle on keys."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(18,2)")
    revenue = dec("l_extendedprice") * (one - dec("l_discount"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    return (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(t["supplier"]),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.09
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushed-down filter + global aggregate."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.03, 0.09)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount")).cast("double").alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@register(
    "scan_filter_predicates",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5, 7)
      AND c_acctbal BETWEEN 100.0 AND 5000.0
      AND c_name LIKE '%1%'
      AND c_mktsegment IS NOT NULL
    """,
)
def scan_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter surface: IN / BETWEEN / LIKE / IS NULL (SURVEY §2.D row 1)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .filter(
            F.col("c_nationkey").isin(1, 3, 5, 7)
            & F.col("c_acctbal").between(100.0, 5000.0)
            & F.col("c_name").like("%1%")
            & F.col("c_mktsegment").isNotNull()
        )
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    )


@register(
    "project_rename_compute",
    oracle="""
    SELECT p_partkey AS part_id,
           lower(p_brand) AS brand_lc,
           p_size * 2 AS double_size,
           CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)) * 1.10, 2) AS DOUBLE) AS marked_up
    FROM part WHERE p_size >= 25
    """,
)
def project_rename_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + rename + computed columns."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_size") >= 25)
        .select(
            F.col("p_partkey").alias("part_id"),
            F.lower("p_brand").alias("brand_lc"),
            (F.col("p_size") * 2).alias("double_size"),
            F.round(dec("p_retailprice") * F.lit("1.10").cast("decimal(18,2)"), 2)
            .cast("double")
            .alias("marked_up"),
        )
    )


@register(
    "join_inner_customer_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def join_inner_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice", "total_spend"))
    )


@register(
    "join_left_outer_orders",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join — customers without orders count 0."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer_lineitem",
    oracle="""
    SELECT o.o_orderkey, COUNT(l.l_orderkey) AS n_items
    FROM lineitem l RIGHT JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey
    """,
)
def join_right_outer_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"), "right")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("n_items"))
    )


@register(
    "join_full_outer_counts",
    oracle="""
    SELECT COALESCE(a.k, b.k) AS nationkey,
           COALESCE(a.n_cust, 0) AS n_cust,
           COALESCE(b.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) a
    FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) b
    ON a.k = b.k
    """,
)
def join_full_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    a = t["customer"].groupBy(F.col("c_nationkey").alias("k")).agg(F.count("*").alias("n_cust"))
    b = t["supplier"].groupBy(F.col("s_nationkey").alias("k")).agg(F.count("*").alias("n_supp"))
    return a.join(b, "k", "full").select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join: customers having at least one big order."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 200000)
    return (
        t["customer"]
        .join(big, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers with no orders at all."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_cross_dims",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join on fixed-size dims (5 x 25 — safe at any SF)."""
    t = load_tables(spark, sf_dir)
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@register(
    "join_theta_nonequi",
    oracle="""
    SELECT a.n_nationkey AS k1, b.n_nationkey AS k2
    FROM nation a JOIN nation b
    ON a.n_nationkey < b.n_nationkey AND a.n_regionkey = b.n_regionkey
    """,
)
def join_theta_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi part (regionkey) + non-equi inequality."""
    t = load_tables(spark, sf_dir)
    a = t["nation"].select(F.col("n_nationkey").alias("k1"), F.col("n_regionkey").alias("r1"))
    b = t["nation"].select(F.col("n_nationkey").alias("k2"), F.col("n_regionkey").alias("r2"))
    return (
        a.join(b, (F.col("k1") < F.col("k2")) & (F.col("r1") == F.col("r2")))
        .select("k1", "k2")
    )


@register(
    "join_range_ship_after_order",
    oracle="""
    SELECT l.l_returnflag, COUNT(*) AS n_late
    FROM lineitem l JOIN orders o
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_returnflag
    """,
)
def join_range_ship_after_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate riding on an equi join (shipped >90 days late)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            t["orders"],
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_late"))
    )


@register(
    "agg_stats_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
           CAST(MIN(l_shipdate) AS VARCHAR) AS first_ship
    FROM lineitem
    """,
)
def agg_stats_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global min/max/sum/avg/count in one aggregate."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].agg(
        F.count("*").alias("n_rows"),
        F.min("l_quantity").cast("double").alias("min_qty"),
        F.max("l_quantity").cast("double").alias("max_qty"),
        dsum("l_quantity", "sum_qty"),
        davg("l_quantity", "avg_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias("first_ship"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
        )
    )


@register("agg_approx_count_distinct", oracle=None)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch — no oracle (DuckDB's approx sketch differs); the
    exact-count neighbor query is the accuracy reference in tests."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_n_part"))
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
            dsum("l_quantity", "sum_qty"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_salted_hot_keys",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS cnt,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation (operators/skew.py): a hot key
    spreads over n_salts partial reducers, then re-folds — result is
    identical to the plain group-by (that IS the oracle)."""
    from mapreducecore_spark.operators import salted_aggregate

    t = load_tables(spark, sf_dir)
    out = salted_aggregate(
        t["lineitem"],
        ["l_returnflag"],
        [F.count("*").alias("cnt"), F.sum(dec("l_quantity")).alias("sum_qty")],
        n_salts=16,
    )
    return out.select("l_returnflag", "cnt", F.col("sum_qty").cast("double").alias("sum_qty"))


@register(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 5)
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (SELECT nullif(o_orderstatus, 'P') AS k, count(*) AS n_a
               FROM orders GROUP BY 1),
         b AS (SELECT nullif(o_orderstatus, 'F') AS k, count(*) AS n_b
               FROM orders GROUP BY 1)
    SELECT a.k AS k, a.n_a, b.n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of dropping out."""
    t = load_tables(spark, sf_dir)
    a = (
        t["orders"]
        .groupBy(F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k"))
        .agg(F.count("*").alias("n_a"))
    )
    b = (
        t["orders"]
        .groupBy(F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("k"))
        .agg(F.count("*").alias("n_b"))
    )
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(a["k"].alias("k"), "n_a", "n_b")


@register(
    "join_salted_hot_keys",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_orderkey < 5000
    """,
)
def join_salted_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join (operators/skew.py): the left side gets a
    random-but-bounded salt, the right side is replicated n_salts ways,
    so one hot join key spreads over n_salts tasks. The result set is
    EXACTLY the plain join's — that is the oracle."""
    from mapreducecore_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.col("l_orderkey") < 5000).select(
        "l_orderkey", "l_linenumber"
    )
    o = t["orders"].filter(F.col("o_orderkey") < 5000).selectExpr(
        "o_orderkey AS l_orderkey", "o_orderstatus", "o_totalprice"
    )
    return salted_join(l, o, ["l_orderkey"], n_salts=8).select(
        "l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice"
    )


@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a correlated inequality — expressed
    as a left-semi join with a compound condition (equi key + theta
    predicate), so the semi join still hash-partitions on the key."""
    t = load_tables(spark, sf_dir)
    o, l = t["orders"], t["lineitem"]
    return (
        o.join(
            l,
            (l["l_orderkey"] == o["o_orderkey"]) & (l["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: count-of-counts (orders per customer, then the
    distribution of those counts). Two aggregations; the second input is
    one row per customer, so the second shuffle is tiny."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 120)
    GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a HAVING aggregate -> semi join against
    the pre-aggregated big-order keys, then the detail join+aggregate.
    Both shuffles key on orderkey, so AQE can reuse the partitioning."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 120)
        .select("l_orderkey")
    )
    o = t["orders"].join(big, F.col("o_orderkey") == big["l_orderkey"], "left_semi")
    return (
        o.join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, yr,
           CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS yr,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
        JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')))
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two aliased broadcast joins against the SAME
    dimension (nation as supplier-side n1 and customer-side n2), a
    disjunctive cross-nation filter, and a 3-key aggregate."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].selectExpr("n_nationkey AS n1_key", "n_name AS supp_nation")
    n2 = t["nation"].selectExpr("n_nationkey AS n2_key", "n_name AS cust_nation")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    volume = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("c_nationkey"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("yr"),
            volume.cast("decimal(18,4)").alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "yr")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )


@register(
    "q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT s_suppkey) AS supplier_cnt
    FROM part p JOIN supplier s ON s.s_suppkey % 200 = p.p_partkey % 200
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 9, 16, 25)
      AND s.s_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery (anti join), IN-list + <> scan
    filters, count-distinct per 3-key group. (The synthetic schema has
    no partsupp table; a deterministic mod-join stands in for it.)"""
    t = load_tables(spark, sf_dir)
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    s = t["supplier"].join(bad, "s_suppkey", "left_anti")
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 16, 25)
    )
    return (
        p.join(s, s["s_suppkey"] % 200 == p["p_partkey"] % 200)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("s_suppkey").alias("supplier_cnt"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS thr
        FROM customer WHERE c_acctbal > 0)
    SELECT c_nationkey AS nationkey, count(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.thr
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS (anti
    join) + aggregate. The threshold broadcast and the anti join both
    avoid shuffling the big side more than once."""
    t = load_tables(spark, sf_dir)
    thr = (
        t["customer"]
        .filter(F.col("c_acctbal") > 0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("thr"))
    )
    return (
        t["customer"]
        .crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("thr"))
        .join(t["orders"], F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           CAST(c.c_acctbal AS DOUBLE) AS c_acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20.
    Filter pushes to the lineitem scan; nation broadcasts; the final
    top-20 compiles to TakeOrderedAndProject (no global sort)."""
    t = load_tables(spark, sf_dir)
    one = F.lit(1).cast("decimal(18,2)")
    rev = dec("l_extendedprice") * (one - dec("l_discount"))
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
