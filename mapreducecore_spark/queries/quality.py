"""Data-quality operators: anomaly scoring, column profiling,
referential-integrity checks. The validation layer a pipeline runs on
every ingest — [EXT] scope (reference validates only its config file,
mapreduce_spec.h:87-157; nothing validates data).

Determinism: moments are summed in DECIMAL and combined with identical
double expression trees on both engines (same trick as agg_corr_covar);
fractions are rounded after an exact integer divide.

Scale notes: all three are single-pass groupBy/agg or one
co-partitioned join — each is the cheapest possible shape for its
check (profiling never shuffles raw rows, only per-partition partials;
the orphan check is a left-anti join that AQE turns into a broadcast
when the parent key set is small after filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register
from mapreducecore_spark.queries._util import dec


@register(
    "dq_anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  AS DOUBLE) AS sxx
      FROM events GROUP BY event_type
    ), z AS (
      SELECT e.event_id, e.event_type, e.value,
             ROUND((e.value - s.sx / s.n)
                   / sqrt(s.sxx / s.n - (s.sx / s.n) * (s.sx / s.n)), 6) AS zscore
      FROM events e JOIN s USING (event_type)
    )
    SELECT event_id, event_type, value, zscore
    FROM z WHERE abs(zscore) > 2.5
    """,
)
def dq_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outliers (|z| > 2.5). Two passes sharing the
    event_type partitioning: DECIMAL-exact moments per type (tiny
    broadcast result), then a map-side score of every row against its
    type's mean/stddev — raw events never shuffle."""
    t = load_tables(spark, sf_dir)
    v = dec("value")
    s = t["events"].groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("sx"),
        F.sum(v * v).cast("double").alias("sxx"),
    )
    mean = F.col("sx") / F.col("n")
    std = F.sqrt(F.col("sxx") / F.col("n") - mean * mean)
    # try_divide: an all-constant event_type has std 0 -> NULL zscore
    # (mirrors DuckDB x/0 -> NULL); the |z| filter then drops it.
    z = F.round(F.try_divide(F.col("value") - mean, std), 6)
    return (
        t["events"]
        .join(F.broadcast(s), "event_type")
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .filter(F.abs(F.col("zscore")) > 2.5)
    )


@register(
    "dq_column_profile",
    oracle="""
    SELECT 'o_totalprice' AS col,
           COUNT(*) AS n_rows,
           COUNT(o_totalprice) AS n_non_null,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonpositive,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_v,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_v,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice)
             AS mean_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           COUNT(*), COUNT(o_custkey),
           CAST(SUM(CASE WHEN o_custkey <= 0 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE),
           CAST(SUM(CAST(o_custkey AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_custkey)
    FROM orders
    """,
)
def dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (null count, range-violation count, min/max/mean)
    for monitored columns, one output row per column. Each column's
    stats fold into ONE aggregate over the same scan — Spark computes
    both branches from a single pass over cached partials at scale
    (and the union keeps the per-column schema uniform for a metrics
    sink)."""
    t = load_tables(spark, sf_dir)

    def profile(col: str) -> DataFrame:
        return t["orders"].agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n_rows"),
            F.count(col).alias("n_non_null"),
            F.sum(F.when(F.col(col) <= 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_nonpositive"),
            F.min(col).cast("double").alias("min_v"),
            F.max(col).cast("double").alias("max_v"),
            (F.sum(dec(col)).cast("double") / F.count(col)).alias("mean_v"),
        )

    return profile("o_totalprice").unionByName(profile("o_custkey"))


@register(
    "dq_referential_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orders->customer', COUNT(*)
    FROM orders od LEFT JOIN customer c ON od.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: child rows whose foreign key has no
    parent, per relationship. Left-anti joins (the parent side carries
    only its key column, so even a 100 TB parent shuffles just keys) —
    a zero row count is the passing state."""
    t = load_tables(spark, sf_dir)
    li_orphans = (
        t["lineitem"]
        .select("l_orderkey")
        .join(t["orders"].select("o_orderkey"),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.lit("lineitem->orders").alias("fk"), F.count("*").alias("n_orphans"))
    )
    ord_orphans = (
        t["orders"]
        .select("o_custkey")
        .join(t["customer"].select("c_custkey"),
              F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.lit("orders->customer").alias("fk"), F.count("*").alias("n_orphans"))
    )
    return li_orphans.unionByName(ord_orphans)


# ------------------------------------------------ sketch aggregates

@register(
    "agg_approx_top_k",
    oracle="""
    SELECT l_returnflag AS item, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k heavy hitters over return flags. With k and the
    tracked-item budget above the true cardinality the sketch is exact,
    so the DuckDB group-by oracle applies verbatim — while the plan is
    the sketch plan (mergeable partials, no full shuffle of raw rows),
    which is what survives when the column has a billion distinct
    values and you only want the top 10."""
    t = load_tables(spark, sf_dir)
    t["lineitem"].createOrReplaceTempView("_qk_lineitem")
    return spark.sql(
        """
        SELECT s.item AS item, s.count AS n FROM (
          SELECT explode(approx_top_k(l_returnflag, 10, 1000)) AS s
          FROM _qk_lineitem
        )
        """
    )


@register("agg_hll_sketch_merge", oracle=None, doc="rows-only: HLL estimate")
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counts: per-status HLL sketches built
    in one pass, then merged with hll_union_agg for the global
    estimate — the pattern for distinct-count rollups across
    partitions/days without re-reading raw data. Estimates carry
    sketch error -> rows-only driver check; accuracy pinned vs exact
    in tests/test_operators.py."""
    t = load_tables(spark, sf_dir)
    t["orders"].createOrReplaceTempView("_qk_orders")
    per_status = spark.sql(
        """
        SELECT o_orderstatus, hll_sketch_agg(o_custkey, 14) AS sk
        FROM _qk_orders GROUP BY o_orderstatus
        """
    )
    per_status.createOrReplaceTempView("_qk_sketches")
    return spark.sql(
        """
        SELECT o_orderstatus AS scope,
               hll_sketch_estimate(sk) AS approx_custkeys
        FROM _qk_sketches
        UNION ALL
        SELECT 'ALL', hll_sketch_estimate(hll_union_agg(sk)) FROM _qk_sketches
        """
    )


@register(
    "json_dead_letter_split",
    oracle="""
    WITH raw AS (
      SELECT event_id, event_type,
             CASE WHEN event_id % 13 = 0 THEN substr(props, 1, 4) ELSE props END
               AS payload
      FROM events
    )
    SELECT event_type,
           CAST(SUM(CASE WHEN json_valid(payload) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_parsed,
           CAST(SUM(CASE WHEN json_valid(payload) THEN 0 ELSE 1 END) AS BIGINT)
             AS n_dead_letter
    FROM raw GROUP BY event_type
    """,
)
def json_dead_letter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion robustness: route malformed JSON payloads (a
    deterministic 1/13 of rows truncated to simulate upstream
    corruption) to a dead-letter count instead of failing the job.
    Validity = "the expected field extracts": get_json_object returns
    NULL on malformed input, while PERMISSIVE from_json yields a struct
    of NULLs that cannot distinguish bad JSON from absent fields. At
    scale the same predicate splits the stream into a clean sink and a
    DLQ sink in one pass."""
    t = load_tables(spark, sf_dir)
    raw = t["events"].selectExpr(
        "event_type",
        "CASE WHEN event_id % 13 = 0 THEN substr(props, 1, 4) ELSE props END"
        " AS payload",
    )
    parsed = raw.withColumn(
        "ok", F.get_json_object("payload", "$.k").isNotNull()
    )
    return parsed.groupBy("event_type").agg(
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias("n_parsed"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_dead_letter"),
    )


@register(
    "dq_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type,
             ROUND(quantile_cont(value, 0.5), 4) AS med_v
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type,
             ROUND(quantile_cont(abs(e.value - m.med_v), 0.5), 4) AS mad
      FROM events e JOIN med m USING (event_type) GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND(abs(e.value - m.med_v) / d.mad, 4) AS mad_score
    FROM events e
    JOIN med m USING (event_type) JOIN dev d USING (event_type)
    WHERE abs(e.value - m.med_v) / d.mad > 3.5
    """,
)
def dq_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outliers by median absolute deviation (immune to the
    outliers themselves, unlike z-scores). Two percentile aggregates
    sharing the event_type partitioning, then a map-side score against
    the broadcast (median, MAD) table — raw events never shuffle."""
    t = load_tables(spark, sf_dir)
    med = t["events"].groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("med_v")
    )
    dev = (
        t["events"]
        .join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(
                F.expr("percentile(abs(value - med_v), 0.5)"), 4
            ).alias("mad")
        )
    )
    # try_divide: a constant-majority type has MAD 0 (very common for
    # e.g. value=0 click events) -> NULL score, dropped by the filter,
    # matching DuckDB's x/0 -> NULL — not an ANSI divide-by-zero kill.
    score = F.round(
        F.try_divide(F.abs(F.col("value") - F.col("med_v")), F.col("mad")), 4
    )
    return (
        t["events"]
        .join(F.broadcast(med), "event_type")
        .join(F.broadcast(dev), "event_type")
        .select("event_id", "event_type", "value", score.alias("mad_score"))
        .filter(F.col("mad_score") > 3.5)
    )
