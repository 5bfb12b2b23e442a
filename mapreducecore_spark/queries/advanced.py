"""Advanced relational surface: pivot/unpivot, subqueries, multiset set
ops, argmax aggregates, exact cross-engine correlation, listagg, NULL
ordering, deterministic sampling, as-of join, batch sessionization.

All [EXT] per SURVEY.md §2.D (the reference has no relational operators;
its whole surface is map/shuffle/reduce — worker.h:73-160). Determinism
rules from queries/__init__ apply: decimal-exact aggregates, identical
double expression trees on both engines, tie-proof orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register
from mapreducecore_spark.queries._util import d_str, dec


@register(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
           count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p,
           CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
                AS DOUBLE) AS rev_f
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority x status (fixed pivot values ->
    no extra distinct-values job at scale), plus one pivoted revenue sum."""
    t = load_tables(spark, sf_dir)
    piv = (
        t["orders"]
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum(dec("o_totalprice")).alias("rev"))
    )
    z = F.lit(0).cast("long")
    return piv.select(
        "o_orderpriority",
        F.coalesce("F_cnt", z).alias("cnt_f"),
        F.coalesce("O_cnt", z).alias("cnt_o"),
        F.coalesce("P_cnt", z).alias("cnt_p"),
        F.coalesce(F.col("F_rev").cast("double"), F.lit(0.0)).alias("rev_f"),
    )


@register(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide part measures -> long (measure, value) rows.
    Narrow transform, no shuffle — stays in one stage with the scan."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .withColumn("p_size", F.col("p_size").cast("double"))
        .unpivot("p_partkey", ["p_retailprice", "p_size"], "measure", "value")
    )


@register(
    "subquery_scalar_threshold",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > 1.5 * (
        SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM part)
    """,
)
def subquery_scalar_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts priced >1.5x the global mean.
    The 1-row aggregate is broadcast — at any SF this is a map-side
    filter, not a shuffle (threshold is decimal-exact on both engines)."""
    t = load_tables(spark, sf_dir)
    thr = t["part"].agg(
        (F.sum(dec("p_retailprice")).cast("double") / F.count("*")).alias("__thr")
    )
    return (
        t["part"]
        .crossJoin(F.broadcast(thr))
        .filter(F.col("p_retailprice") > 1.5 * F.col("__thr"))
        .select("p_partkey", "p_name", "p_retailprice")
    )


@register(
    "subquery_correlated_avg",
    oracle="""
    SELECT p.p_partkey, p.p_type, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice > (
        SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM part p2 WHERE p2.p_type = p.p_type)
    """,
)
def subquery_correlated_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (price above its type's mean),
    decorrelated into a window aggregate: ONE shuffle on p_type instead
    of a per-row subquery — the standard rewrite Catalyst/DuckDB both
    apply, here made explicit."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("p_type")
    thr = F.sum(dec("p_retailprice")).over(w).cast("double") / F.count("*").over(w)
    return (
        t["part"]
        .withColumn("__thr", thr)
        .filter(F.col("p_retailprice") > F.col("__thr"))
        .select("p_partkey", "p_type", "p_retailprice")
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
    INTERSECT ALL
    SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics (min of multiplicities)."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(F.col("c_nationkey").cast("int").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
    SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
    EXCEPT ALL
    SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference of multiplicities."""
    t = load_tables(spark, sf_dir)
    a = t["customer"].select(F.col("c_nationkey").cast("int").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").cast("int").alias("nationkey"))
    return a.exceptAll(b)


# Zero-padded "price|key" string: lexicographic order == (price, key)
# numeric order, so argmax/argmin are tie-proof on BOTH engines even if
# two orders share a totalprice.
_PAD_FMT = "%020.4f|%019d"


@register(
    "agg_min_max_by",
    oracle=f"""
    SELECT o_orderstatus,
           max_by(o_orderkey, printf('{_PAD_FMT}', o_totalprice, o_orderkey)) AS top_key,
           min_by(o_orderkey, printf('{_PAD_FMT}', o_totalprice, o_orderkey)) AS bottom_key,
           max(o_totalprice) AS top_price,
           min(o_totalprice) AS bottom_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by / min_by (argmax/argmin) with a tie-proof composite key."""
    t = load_tables(spark, sf_dir)
    pad = F.format_string(_PAD_FMT, F.col("o_totalprice"), F.col("o_orderkey"))
    return t["orders"].groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", pad).alias("top_key"),
        F.min_by("o_orderkey", pad).alias("bottom_key"),
        F.max("o_totalprice").alias("top_price"),
        F.min("o_totalprice").alias("bottom_price"),
    )


@register(
    "agg_corr_covar",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           ROUND((n * sxy - sx * sy) / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 9) AS corr_qty_price,
           ROUND((n * sxy - sx * sy) / (CAST(n AS DOUBLE) * (n - 1)), 6) AS covar_samp
    FROM s
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation/covariance rebuilt from DECIMAL-exact moment sums so
    the value is bit-identical across engines (built-in corr() streams
    doubles in engine-specific order -> low-bit drift). Single partial-
    aggregated shuffle; the moments trick is also how you'd fold corr
    into one pass at 100 TB."""
    t = load_tables(spark, sf_dir)
    q, p = dec("l_quantity"), dec("l_extendedprice")
    s = t["lineitem"].groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        # try_divide: a constant column (zero variance) or a 1-row group
        # must yield NULL like DuckDB's division, not an ANSI crash.
        F.round(
            F.try_divide(
                n * sxy - sx * sy,
                F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            ),
            9,
        ).alias("corr_qty_price"),
        F.round(
            F.try_divide(n * sxy - sx * sy, n.cast("double") * (n - 1)), 6
        ).alias("covar_samp"),
    )


@register(
    "agg_bool_countif",
    oracle="""
    SELECT o_orderpriority,
           bool_and(o_totalprice > 50000)  AS all_big,
           bool_or(o_totalprice > 400000)  AS any_huge,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_bool_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or / count_if conditional aggregates."""
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 50000).alias("all_big"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
    )


@register(
    "agg_listagg_sorted",
    oracle="""
    SELECT n.n_name, string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def agg_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg/string_agg with deterministic order: collect_list then
    array_sort (collect order is nondeterministic under parallelism —
    sorting after collection is the scale-safe idiom)."""
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"))
    )


@register(
    "orderby_nulls_first",
    oracle="""
    SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null
    FROM orders
    ORDER BY status_or_null NULLS FIRST, o_orderkey
    LIMIT 50
    """,
)
def orderby_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS FIRST global sort (Spark default for ASC is nulls-first;
    declared explicitly here) with a unique tiebreaker key."""
    t = load_tables(spark, sf_dir)
    key = F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null")
    return (
        t["orders"]
        .select("o_orderkey", key)
        .orderBy(F.col("status_or_null").asc_nulls_first(), "o_orderkey")
        .limit(50)
    )


@register(
    "sample_deterministic_hash",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'a'
    """,
)
def sample_deterministic_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/16 sample by hashing the key (md5 agrees across
    engines, unlike rand()/TABLESAMPLE). At 100 TB this is the
    reproducible-sampling idiom: pure map-side, repeatable across runs
    and engines, no seed coordination."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "a")
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "join_asof_last_order",
    oracle="""
    WITH m AS (
        SELECT e.event_id, e.user_id, max(o.o_orderdate) AS asof_ts
        FROM events e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        GROUP BY e.event_id, e.user_id)
    SELECT m.event_id,
           strftime(m.asof_ts, '%Y-%m-%d') AS asof_date,
           max(o.o_orderkey) AS asof_orderkey
    FROM m JOIN orders o
      ON o.o_custkey = m.user_id AND o.o_orderdate = m.asof_ts
    GROUP BY m.event_id, m.asof_ts
    """,
)
def join_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event is enriched with the customer's latest
    order at-or-before the event time (merge_asof: one shuffle + one
    sort over |events|+|orders|, vs the oracle's O(E*O) subquery shape).
    Ties on order date resolve to max o_orderkey on both engines."""
    from mapreducecore_spark.operators.asof import merge_asof

    t = load_tables(spark, sf_dir)
    enriched = merge_asof(
        t["events"].select("event_id", "user_id", "ts"),
        t["orders"].select("o_custkey", "o_orderdate", "o_orderkey"),
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderdate", "o_orderkey"],
        tie_break="o_orderkey",
    )
    return enriched.filter(F.col("o_orderkey").isNotNull()).select(
        "event_id",
        d_str("o_orderdate", "asof_date"),
        F.col("o_orderkey").alias("asof_orderkey"),
    )


@register(
    "events_sessionize_batch",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, date_trunc('second', ts) AS ts_s
        FROM events),
    gaps AS (
        SELECT user_id, event_id, ts_s,
               CASE WHEN lag(ts_s) OVER w IS NULL
                         OR date_diff('second', lag(ts_s) OVER w, ts_s) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id))
    SELECT user_id,
           CAST(SUM(is_new) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
)
def events_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts
    after a >30 min silence. One shuffle on user_id shared by the lag
    window and the final aggregate. Timestamps truncated to seconds so
    the gap test agrees across engines (events.ts is ns in parquet)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    e = t["events"].select(
        "user_id", "event_id", F.date_trunc("second", "ts").alias("ts_s")
    )
    prev = F.lag("ts_s").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_timestamp("ts_s") - F.unix_timestamp(prev) > 1800),
        1,
    ).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .groupBy("user_id")
        .agg(
            F.sum("is_new").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "events_funnel_conversion",
    oracle="""
    WITH s AS (
        SELECT user_id, min(date_trunc('second', ts)) AS signup_s
        FROM events WHERE event_type = 'signup' GROUP BY user_id),
    p AS (
        SELECT e.user_id, min(date_trunc('second', e.ts)) AS first_purchase_s
        FROM events e JOIN s ON s.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND date_trunc('second', e.ts) > s.signup_s
        GROUP BY e.user_id)
    SELECT s.user_id,
           strftime(s.signup_s, '%Y-%m-%d %H:%M:%S') AS signup_ts,
           strftime(p.first_purchase_s, '%Y-%m-%d %H:%M:%S') AS first_purchase_ts
    FROM s LEFT JOIN p ON p.user_id = s.user_id
    """,
)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per signed-up user, the first purchase strictly
    after signup (NULL = not converted). Both stages aggregate on
    user_id, so the whole funnel runs in one partitioning. Timestamps
    are second-truncated before comparison so the ns (DuckDB) vs micros
    (Spark) gap cannot flip the strict > at the boundary."""
    from mapreducecore_spark.queries._util import ts_str

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "user_id", "event_type", F.date_trunc("second", "ts").alias("ts_s")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("signup_s"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts_s") > F.col("signup_s"))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("first_purchase_s"))
    )
    return s.join(p, "user_id", "left").select(
        "user_id",
        ts_str("signup_s", "signup_ts"),
        ts_str("first_purchase_s", "first_purchase_ts"),
    )


@register(
    "events_day_retention",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events)
    SELECT strftime(a.d, '%Y-%m-%d') AS day,
           count(*) AS retained_next_day
    FROM days a JOIN days b
      ON b.user_id = a.user_id AND b.d = a.d + INTERVAL 1 DAY
    GROUP BY a.d
    """,
)
def events_day_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day retention: users active on day d who return on
    d+1. The (user, day) dedup is the only shuffle that scales with raw
    events; the self-join runs on the far smaller distinct set."""
    t = load_tables(spark, sf_dir)
    days = t["events"].select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    a = days
    b = days.select(F.col("user_id"), F.col("d").alias("d_next"))
    return (
        a.join(b, (b["user_id"] == a["user_id"]) & (F.col("d_next") == F.date_add(a["d"], 1)))
        .groupBy(a["d"])
        .agg(F.count("*").alias("retained_next_day"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "retained_next_day")
    )


@register(
    "events_cdc_latest_state",
    oracle="""
    SELECT user_id,
           max_by(event_type, printf('%019d|%019d',
                  CAST(epoch(date_trunc('second', ts)) AS BIGINT), event_id))
             AS last_type,
           CAST(max_by(value, printf('%019d|%019d',
                  CAST(epoch(date_trunc('second', ts)) AS BIGINT), event_id))
             AS DOUBLE) AS last_value,
           count(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def events_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style latest-state compaction: one row per key holding the
    most recent attributes (argmax over a zero-padded time|id key —
    tie-proof and identical across engines). One aggregate, no window,
    no sort of the full history."""
    t = load_tables(spark, sf_dir)
    ordkey = F.format_string(
        "%019d|%019d",
        F.unix_timestamp(F.date_trunc("second", "ts")),
        F.col("event_id"),
    )
    return t["events"].groupBy("user_id").agg(
        F.max_by("event_type", ordkey).alias("last_type"),
        F.max_by("value", ordkey).cast("double").alias("last_value"),
        F.count("*").alias("n_events"),
    )


@register("agg_approx_percentile", oracle=None)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (approx_percentile): single pass,
    bounded memory per partition, partial sketches merge at the
    exchange — the 100 TB alternative to exact percentile's full sort.
    Rows-only check (sketch internals are engine-specific); the exact
    twin `agg_percentiles` is the oracle-checked variant. Output is
    three scalar columns (not the raw array) because the driver's
    rows-only canonicalizer sorts every column with pandas, which
    cannot hash an ndarray cell."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", [0.25, 0.5, 0.75], 10000
            ).alias("pcts")
        )
        .select(
            "o_orderstatus",
            F.col("pcts")[0].alias("p25"),
            F.col("pcts")[1].alias("p50"),
            F.col("pcts")[2].alias("p75"),
        )
    )


@register("sample_stratified", oracle=None)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling (sampleBy): per-stratum fractions with a
    fixed seed — map-side, no shuffle; deterministic within Spark but
    RNG-specific, hence rows-only (the cross-engine-deterministic
    variant is sample_deterministic_hash)."""
    t = load_tables(spark, sf_dir)
    return t["orders"].sampleBy(
        "o_orderstatus", {"F": 0.1, "O": 0.05, "P": 0.5}, seed=42
    ).select("o_orderkey", "o_orderstatus")


@register(
    "sample_per_group_hash",
    oracle="""
    SELECT o_orderstatus, o_orderkey FROM (
        SELECT o_orderstatus, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
                 AS rn
        FROM orders)
    WHERE rn <= 10
    """,
)
def sample_per_group_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 10 rows per stratum chosen by
    md5(key) order — behaves like a uniform draw but is reproducible
    across runs AND engines (unlike sampleBy's RNG). The oracle-checked
    twin of sample_stratified."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        t["orders"]
        .select("o_orderstatus", "o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("o_orderstatus", "o_orderkey")
    )


@register(
    "events_scd2_intervals",
    oracle="""
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           COALESCE(strftime(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S'), 'current')
             AS valid_to,
           event_type AS state,
           CAST(LEAD(ts) OVER w IS NULL AS BOOLEAN) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 build from a change stream: each event opens a
    validity interval closed by the user's next event ((ts, event_id)
    ordering is tie-proof). One window over the user_id partitioning —
    the standard dimension-history materialization at any scale."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return t["events"].select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"), F.lit("current")
        ).alias("valid_to"),
        F.col("event_type").alias("state"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "events_debounce",
    oracle="""
    WITH o AS (
      SELECT event_id, user_id, event_type, ts,
             LAG(ts) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS prev_ts
      FROM events)
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM o
    WHERE prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000
    """,
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce: keep a (user, type) event only if the previous event of
    the same key is more than 1 hour older (lag-based gap filter, the
    batch twin of streaming dropDuplicates-within-watermark). One window
    shuffle on (user_id, event_type). Epoch-microsecond comparison on
    both engines — second-floor casts would disagree on sub-second
    gaps."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    return (
        t["events"]
        .withColumn("prev_ts", prev)
        .filter(
            F.col("prev_ts").isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                > 3_600_000_000
            )
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
    )


@register(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER clause on aggregates — several conditional aggregates
    in ONE pass/shuffle instead of N filtered subqueries."""
    t = load_tables(spark, sf_dir)
    t["orders"].createOrReplaceTempView("_fc_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
               COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS open_total
        FROM _fc_orders GROUP BY o_orderpriority
        """
    )


@register(
    "join_lateral_topn",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
    WHERE c.c_custkey < 200
    """,
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's single most
    expensive order. Catalyst decorrelates this to the same
    window-rank plan as topk_per_group — the surface matters for SQL
    users migrating correlated queries verbatim."""
    t = load_tables(spark, sf_dir)
    t["customer"].createOrReplaceTempView("_lt_customer")
    t["orders"].createOrReplaceTempView("_lt_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM _lt_customer c,
             LATERAL (SELECT o_orderkey, o_totalprice FROM _lt_orders
                      WHERE o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) o
        WHERE c.c_custkey < 200
        """
    )


@register(
    "join_hint_broadcast_sql",
    oracle="""
    SELECT n.n_name, COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_hint_broadcast_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-level BROADCAST hint — the escape hatch when statistics
    mislead the planner (e.g. a filtered dimension whose post-filter
    size the optimizer overestimates). Plan gate asserts the hint is
    honored."""
    t = load_tables(spark, sf_dir)
    t["customer"].createOrReplaceTempView("_bh_customer")
    t["nation"].createOrReplaceTempView("_bh_nation")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n) */ n.n_name, COUNT(*) AS n_customers
        FROM _bh_customer c JOIN _bh_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


@register(
    "incremental_daily_rollup",
    oracle="""
    WITH partials AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS d, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_v,
             MIN(value) AS min_v, MAX(value) AS max_v
      FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(sum_v) AS DOUBLE) AS sum_v,
           MIN(min_v) AS min_v, MAX(max_v) AS max_v
    FROM partials GROUP BY event_type
    """,
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregation: per-day partial aggregates (what a
    pipeline persists per ingest partition) merged into the global
    rollup WITHOUT rescanning history — count/sum/min/max are all
    re-aggregatable, so day N's update touches one day of raw data
    plus the small partials table. The two-level plan here proves the
    merge is exact (oracle computes the same two-level rollup)."""
    t = load_tables(spark, sf_dir)
    partials = (
        t["events"]
        .groupBy(
            F.date_trunc("day", "ts").cast("date").alias("d"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(dec("value")).cast("decimal(38,2)").alias("sum_v"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )
    return partials.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sum_v").cast("double").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


@register(
    "events_weekly_cohort_retention",
    oracle="""
    WITH weekly AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(w) AS cohort_week FROM weekly GROUP BY user_id
    ), sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM cohort GROUP BY cohort_week
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('week', c.cohort_week, a.w) AS INT) AS weeks_since,
           COUNT(*) AS n_active,
           ROUND(COUNT(*) / CAST(s.cohort_size AS DOUBLE), 6) AS retention
    FROM cohort c
    JOIN weekly a USING (user_id)
    JOIN sizes s ON s.cohort_week = c.cohort_week
    GROUP BY c.cohort_week, date_diff('week', c.cohort_week, a.w), s.cohort_size
    """,
)
def events_weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-active
    week, tracked across subsequent weeks. The (user, week) dedup is
    the only shuffle scaling with raw events; cohorts and sizes are
    derived from that small distinct set and the final join is
    broadcast-sized per cohort week."""
    t = load_tables(spark, sf_dir)
    weekly = (
        t["events"]
        .select("user_id", F.date_trunc("week", "ts").cast("date").alias("w"))
        .distinct()
    )
    from mapreducecore_spark.queries._util import materialize

    weekly = materialize(weekly)
    cohort = weekly.groupBy("user_id").agg(F.min("w").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(F.count("*").alias("cohort_size"))
    joined = (
        cohort.join(weekly, "user_id")
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            (F.datediff(F.col("w"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("weeks_since"),
            "cohort_size",
        )
    )
    return (
        joined.groupBy("cohort_week", "weeks_since", "cohort_size")
        .agg(F.count("*").alias("n_active"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "weeks_since",
            "n_active",
            F.round(F.col("n_active") / F.col("cohort_size").cast("double"), 6).alias(
                "retention"
            ),
        )
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus,
           max_by(o_orderpriority,
                  printf('%019d|%s', n, o_orderpriority)) AS mode_priority,
           MAX(n) AS mode_count
    FROM c GROUP BY o_orderstatus
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value; ties broken by the
    value's own ordering — built-in mode() picks arbitrarily on ties,
    which would never survive a cross-engine hash check). Two-level
    aggregate: counts shuffle once on the composite key, the argmax
    runs on the tiny count table."""
    t = load_tables(spark, sf_dir)
    c = t["orders"].groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n")
    )
    key = F.format_string("%019d|%s", F.col("n"), F.col("o_orderpriority"))
    return c.groupBy("o_orderstatus").agg(
        F.max_by("o_orderpriority", key).alias("mode_priority"),
        F.max("n").alias("mode_count"),
    )
