"""Remaining TPC-H query shapes (Q2, Q8, Q9, Q11, Q12, Q14, Q15, Q17,
Q19, Q20, Q21) — completes all 22 TPC-H shapes in the registry.

The synthetic schema has no partsupp table and lineitem lacks
commitdate/receiptdate/shipmode, so the classic stand-ins used by
q16_parts_supplier_counts are reused here: the deterministic mod-join
(s_suppkey % 200 = p_partkey % 200) plays partsupp, s_acctbal plays
ps_supplycost, l_returnflag = 'R' plays "received late", and
l_linenumber % 3 derives a ship-mode. Every adaptation keeps the
*query shape* (the joins, the correlation pattern, the aggregate
structure) that the original exercises.

Scale notes (100 TB stance):
- correlated min/avg subqueries (Q2, Q17) are expressed as window
  functions over the already-joined fact — ONE shuffle on the
  correlation key instead of a self-join that recomputes the input;
- scalar thresholds (Q11, Q15) broadcast a 1-row aggregate instead of
  re-scanning the fact table;
- Q21's double EXISTS / NOT EXISTS correlation collapses to a single
  orderkey-partitioned window (collect_set of suppliers / late
  suppliers) — one shuffle where the literal translation does three;
- all sums feeding the value-hash go through DECIMAL (exact,
  order-independent) per queries/_util.py.

Reference parity: the reference engine has no SQL layer (SURVEY.md §2.D
— mr_tasks.h exposes map/reduce only); these shapes are declared scope
from BASELINE.json's north star, expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register
from mapreducecore_spark.queries._util import dec, dsum, materialize


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH reg AS (
        SELECT n.n_nationkey, n.n_name
        FROM nation n JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'),
    ps AS (
        SELECT p.p_partkey, p.p_name, s.s_name, reg.n_name, s.s_acctbal,
               MIN(s.s_acctbal) OVER (PARTITION BY p.p_partkey) AS mn
        FROM part p
        JOIN supplier s ON s.s_suppkey % 200 = p.p_partkey % 200
        JOIN reg ON reg.n_nationkey = s.s_nationkey
        WHERE p.p_size IN (5, 25, 40) AND p.p_type = 'LARGE')
    SELECT p_partkey, p_name, s_name, n_name,
           CAST(s_acctbal AS DOUBLE) AS s_acctbal
    FROM ps WHERE s_acctbal = mn
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-cost supplier per part within a region.
    The correlated MIN subquery is a window over the joined fact —
    one shuffle on p_partkey, no self-join recompute. Region-filtered
    nation is broadcast (constant size in SF)."""
    t = load_tables(spark, sf_dir)
    reg = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    p = t["part"].filter(
        F.col("p_size").isin(5, 25, 40) & (F.col("p_type") == "LARGE")
    )
    w = Window.partitionBy("p_partkey")
    return (
        p.join(t["supplier"], F.col("s_suppkey") % 200 == F.col("p_partkey") % 200)
        .join(F.broadcast(reg), F.col("n_nationkey") == F.col("s_nationkey"))
        .withColumn("mn", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("mn"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
               CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS volume,
               n2.n_name AS supp_nation
        FROM part p
        JOIN lineitem l ON l.l_partkey = p.p_partkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        WHERE p.p_type = 'STANDARD' AND r.r_name = 'AMERICA')
    SELECT yr,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM vol GROUP BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — conditional share-of-
    total per year over a 6-join star. Both sums stay DECIMAL until the
    final double division (identical expression tree to the oracle)."""
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].selectExpr("n_nationkey AS n1_key", "n_regionkey")
    n2 = t["nation"].selectExpr("n_nationkey AS n2_key", "n_name AS supp_nation")
    volume = (
        dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    ).cast("decimal(18,4)")
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_type") == "STANDARD").select("p_partkey"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "AMERICA")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .select(F.year("o_orderdate").alias("yr"), volume.alias("volume"), "supp_nation")
        .groupBy("yr")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS yr,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
                  - CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
                         * CAST(l.l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE)
             AS sum_profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%an%'
    GROUP BY n.n_name, yr
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus retail cost stand-in for
    ps_supplycost * quantity) per supplier nation per year, for parts
    matching a name pattern. Both products are cast to DECIMAL(18,4)
    before the subtraction so the sum is exact on both engines."""
    t = load_tables(spark, sf_dir)
    rev = (
        dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    ).cast("decimal(18,4)")
    cost = (dec("p_retailprice") * dec("l_quantity")).cast("decimal(18,4)")
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_name").like("%an%")).select(
                "p_partkey", "p_retailprice"
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(F.sum(rev - cost).cast("double").alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS vdec
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_3', 'NATION_13')
        GROUP BY l.l_partkey),
    tot AS (SELECT CAST(SUM(vdec) AS DOUBLE) AS total FROM val)
    SELECT val.l_partkey AS partkey, CAST(vdec AS DOUBLE) AS value
    FROM val, tot
    WHERE CAST(vdec AS DOUBLE) > 0.001 * total
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a fraction-of-grand-total
    threshold (scalar subquery + HAVING). The grand total is a decimal
    sum-of-sums over the per-part aggregate (exact, order-independent)
    broadcast as a 1-row DataFrame; the fact table is scanned once —
    the per-part aggregate is materialized and reused for the total."""
    t = load_tables(spark, sf_dir)
    nat = t["nation"].filter(F.col("n_name").isin("NATION_3", "NATION_13"))
    vdec = F.sum(
        dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    ).alias("vdec")
    val = materialize(
        t["lineitem"]
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(vdec)
    )
    tot = val.agg(F.sum("vdec").cast("double").alias("total"))
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(F.col("vdec").cast("double") > F.lit(0.001) * F.col("total"))
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("vdec").cast("double").alias("value"),
        )
    )


@register(
    "q12_shipmode_priority",
    oracle="""
    SELECT CASE CAST(l.l_linenumber % 3 AS INT)
             WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' ELSE 'RAIL' END AS shipmode,
           count(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
             AS high_line_count,
           count(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
             AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-class line counts per ship mode
    (derived from l_linenumber — the schema has no shipmode column).
    The date filter pushes to the lineitem scan; the conditional
    counts are a single partial-aggregated shuffle of 3 groups."""
    t = load_tables(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    shipmode = (
        F.when(F.col("l_linenumber") % 3 == 0, "MAIL")
        .when(F.col("l_linenumber") % 3 == 1, "SHIP")
        .otherwise("RAIL")
    )
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(shipmode.alias("shipmode"))
        .agg(
            F.count_if(hi).alias("high_line_count"),
            F.count_if(~hi).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue",
    oracle="""
    SELECT (100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE))
             / CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
             AS promo_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-type revenue share for one ship month —
    conditional-sum over unconditional-sum, both exact DECIMAL until
    the final double division."""
    t = load_tables(spark, sf_dir)
    volume = (
        dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    ).cast("decimal(18,4)")
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
        )
        .join(t["part"].select("p_partkey", "p_type"), F.col("p_partkey") == F.col("l_partkey"))
        .select(volume.alias("volume"), "p_type")
        .agg(
            (
                (
                    F.lit(100.0)
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", F.col("volume")).otherwise(
                            F.lit(0).cast("decimal(18,4)")
                        )
                    ).cast("double")
                )
                / F.sum("volume").cast("double")
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                 AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey),
    mx AS (SELECT MAX(total_revenue) AS mx FROM rev)
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM supplier s JOIN rev ON rev.suppkey = s.s_suppkey, mx
    WHERE rev.total_revenue = mx.mx
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + scalar MAX subquery selecting
    the top supplier(s) for a quarter. The per-supplier aggregate is
    materialized once; the 1-row max broadcasts back against it."""
    t = load_tables(spark, sf_dir)
    rev = materialize(
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
            )
            .cast("double")
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH li AS (
        SELECT l.l_quantity, l.l_extendedprice,
               CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
                      OVER (PARTITION BY l.l_partkey) AS DOUBLE)
                 / COUNT(*) OVER (PARTITION BY l.l_partkey) AS avg_qty
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3')
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM li WHERE l_quantity < 0.5 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue of small-quantity orders relative to a
    correlated per-part average. The correlated AVG subquery is a
    window over the brand-filtered join — one shuffle on l_partkey,
    no per-part self-join."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("l_partkey")
    avg_qty = F.sum(dec("l_quantity")).over(w).cast("double") / F.count("*").over(w)
    return (
        t["lineitem"]
        .join(
            t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .withColumn("avg_qty", avg_qty)
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of three brand/size/quantity
    conjunctions across the join — Catalyst extracts the common
    part-side predicate (brand IN ..., size <= 15) and pushes it to
    the part scan while keeping the full OR as the post-join filter."""
    t = load_tables(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            dsum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")),
                "revenue",
                scale=4,
            )
        )
    )


@register(
    "q20_potential_promotion",
    oracle="""
    WITH qty AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey),
    cand AS (
        SELECT DISTINCT q.l_suppkey
        FROM qty q JOIN part p ON p.p_partkey = q.l_partkey
        WHERE p.p_name LIKE '%al%' AND q.total_qty > 120)
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM cand)
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped a significant quantity
    of pattern-named parts in a year — nested IN subqueries expressed
    as an aggregate feeding a semi join. The year filter pushes to the
    lineitem scan; the candidate-supplier set is tiny and broadcasts
    into the semi join."""
    t = load_tables(spark, sf_dir)
    qty = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "total_qty"))
    )
    cand = (
        qty.filter(F.col("total_qty") > 120)
        .join(
            t["part"].filter(F.col("p_name").like("%al%")).select("p_partkey"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select("l_suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(F.broadcast(cand), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
    )


@register(
    "q21_suppliers_who_kept_waiting",
    oracle="""
    WITH base AS (
        SELECT l.l_orderkey, l.l_suppkey, l.l_returnflag
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'),
    l1 AS (SELECT * FROM base WHERE l_returnflag = 'R')
    SELECT s.s_name, count(*) AS numwait
    FROM l1 JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM base l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM base l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
)
def q21_suppliers_who_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole late supplier on multi-supplier
    finalized orders (l_returnflag = 'R' stands in for "received
    late"). The EXISTS / NOT EXISTS pair over the same fact collapses
    to ONE orderkey-partitioned window: collect_set of all suppliers
    and of late suppliers per order — a late row survives iff the
    order has >1 supplier and exactly 1 late supplier (necessarily
    this row's). One shuffle where the literal translation does three.
    The oracle keeps the literal EXISTS form — a cross-formulation
    check, not just a transliteration."""
    t = load_tables(spark, sf_dir)
    base = (
        t["lineitem"]
        .join(
            t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "l_returnflag")
    )
    w = Window.partitionBy("l_orderkey")
    late_supp = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    flagged = base.select(
        "l_orderkey",
        "l_suppkey",
        "l_returnflag",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(F.collect_set(late_supp).over(w)).alias("n_late_supp"),
    )
    return (
        flagged.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
        .join(t["supplier"], F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
