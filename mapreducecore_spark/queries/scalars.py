"""Scalar-function queries — SURVEY.md §2.D "Scalar functions" row.

String / date / math / conditional / array / JSON functions, all
built-in `pyspark.sql.functions` (JVM-side, codegen'd — the UDF slow
path is reserved for the genuinely non-expressible ops in llm.py).

Float-function caveat: ln/pow may differ by an ulp between libm
implementations, so those outputs are rounded to 6 decimals on both
sides; sqrt and integer-power are IEEE-exact and need no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register
from mapreducecore_spark.queries._util import dec


@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           lower(p_type) AS type_lc,
           upper(p_brand) AS brand_uc,
           trim(concat('  ', p_brand, '  ')) AS brand_trim,
           substr(p_name, 1, 5) AS name5,
           concat(p_brand, ':', p_type) AS brand_type,
           CAST(length(p_name) AS INT) AS name_len,
           regexp_extract(p_type, '^([a-z]+)', 1) AS first_word,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words
    FROM part
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.lower("p_type").alias("type_lc"),
        F.upper("p_brand").alias("brand_uc"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_type", r"^([a-z]+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch95
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
            F.dayofmonth("o_orderdate").alias("d"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "month_start"
            ),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
                "days_since_epoch95"
            ),
        )
    )


@register(
    "scalar_math_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 0) AS DOUBLE) AS price_round,
           CAST(ABS(o_totalprice - 100000.0) AS DOUBLE) AS dist_100k,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil,
           ROUND(SQRT(o_totalprice), 6) AS price_sqrt,
           ROUND(LN(o_totalprice), 6) AS price_ln,
           ROUND(POWER(o_totalprice, 2), 2) AS price_sq
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice").cast("decimal(18,2)"), 0)
            .cast("double")
            .alias("price_round"),
            F.abs(F.col("o_totalprice") - 100000.0).cast("double").alias("dist_100k"),
            F.floor("o_totalprice").cast("bigint").alias("price_floor"),
            F.ceil("o_totalprice").cast("bigint").alias("price_ceil"),
            F.round(F.sqrt("o_totalprice"), 6).alias("price_sqrt"),
            F.round(F.log(F.col("o_totalprice")), 6).alias("price_ln"),
            F.round(F.pow("o_totalprice", F.lit(2)), 2).alias("price_sq"),
        )
    )


@register(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           CAST(COALESCE(NULLIF(c_acctbal, 0.0), -1.0) AS DOUBLE) AS bal_nonzero
    FROM customer
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    bal = F.col("c_acctbal")
    return t["customer"].select(
        "c_custkey",
        F.when(bal < 0, "debt")
        .when(bal < 1000, "low")
        .when(bal < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0)).cast("double").alias("bal_nonzero"),
    )


@register(
    "scalar_array_funcs",
    oracle="""
    SELECT p_partkey,
           CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
           list_contains(string_split(p_name, ' '), 'green') AS has_green,
           CAST(unnest(range(len(string_split(p_name, ' ')))) AS INT) AS pos,
           unnest(string_split(p_name, ' ')) AS word
    FROM part WHERE p_partkey < 200
    """,
)
def scalar_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / array_contains / posexplode over a split array."""
    t = load_tables(spark, sf_dir)
    base = (
        t["part"]
        .filter(F.col("p_partkey") < 200)
        .select("p_partkey", F.split("p_name", " ").alias("words"))
    )
    return base.select(
        "p_partkey",
        F.size("words").alias("n_words"),
        F.array_contains("words", "green").alias("has_green"),
        F.posexplode("words").alias("pos", "word"),
    )


@register(
    "scalar_string_funcs2",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS brand_lpad,
           rpad(p_brand, 12, '.') AS brand_rpad,
           replace(p_type, ' ', '_') AS type_snake,
           repeat(p_brand, 2) AS brand_twice,
           left(p_name, 4) AS name_left,
           right(p_name, 4) AS name_right,
           contains(p_name, 'a') AS has_a,
           starts_with(p_type, 's') AS starts_s,
           ends_with(p_type, 'd') AS ends_d,
           split_part(p_name, ' ', 2) AS second_word,
           CAST(strpos(p_name, 'e') AS INT) AS first_e,
           translate(p_brand, 'AB', 'ab') AS brand_tr
    FROM part WHERE p_partkey < 400
    """,
)
def scalar_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string batch: pad/replace/repeat/left/right/contains/
    starts/ends/split_part/instr/translate."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") < 400)
        .select(
            "p_partkey",
            F.lpad("p_brand", 12, "*").alias("brand_lpad"),
            F.rpad("p_brand", 12, ".").alias("brand_rpad"),
            F.expr("replace(p_type, ' ', '_')").alias("type_snake"),
            F.repeat("p_brand", 2).alias("brand_twice"),
            F.expr("left(p_name, 4)").alias("name_left"),
            F.expr("right(p_name, 4)").alias("name_right"),
            F.col("p_name").contains("a").alias("has_a"),
            F.col("p_type").startswith("s").alias("starts_s"),
            F.col("p_type").endswith("d").alias("ends_d"),
            F.split_part("p_name", F.lit(" "), F.lit(2)).alias("second_word"),
            F.instr("p_name", "e").alias("first_e"),
            F.translate("p_brand", "AB", "ab").alias("brand_tr"),
        )
    )


@register(
    "scalar_date_funcs2",
    oracle="""
    SELECT o_orderkey,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(isodow(o_orderdate) AS INT) AS isodow,
           CAST(weekofyear(o_orderdate) AS INT) AS woy,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY, '%Y-%m-%d') AS plus_week,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
    FROM orders WHERE o_orderkey < 1500
    """,
)
def scalar_date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date batch: quarter / ISO day-of-week / ISO week /
    date_add / add_months / last_day."""
    t = load_tables(spark, sf_dir)
    d = F.col("o_orderdate").cast("date")
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 1500)
        .select(
            "o_orderkey",
            F.quarter("o_orderdate").alias("q"),
            (F.weekday("o_orderdate") + 1).alias("isodow"),
            F.weekofyear("o_orderdate").alias("woy"),
            F.date_format(F.date_add(d, 7), "yyyy-MM-dd").alias("plus_week"),
            F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2mo"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        )
    )


@register(
    "scalar_map_funcs",
    oracle="""
    SELECT p_partkey,
           array_to_string(map_keys(MAP(['brand','type'], [p_brand, p_type])), ',') AS keys_csv,
           map_extract(MAP(['brand','type'], [p_brand, p_type]), 'brand')[1] AS brand_val,
           CAST(cardinality(MAP(['brand','type'], [p_brand, p_type])) AS INT) AS n_entries
    FROM part WHERE p_partkey < 300
    """,
)
def scalar_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: construction, key listing, value extraction."""
    t = load_tables(spark, sf_dir)
    m = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return (
        t["part"]
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.array_join(F.map_keys(m), ",").alias("keys_csv"),
            F.element_at(m, "brand").alias("brand_val"),
            F.size(m).alias("n_entries"),
        )
    )


@register(
    "scalar_higher_order_funcs",
    oracle="""
    WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
    SELECT p_partkey,
           len(list_filter(words, x -> len(x) = 5)) > 0 AS has_len5,
           len(list_filter(words, x -> len(x) > 2)) = len(words) AS all_len3plus,
           CAST(list_sum(list_transform(words, x -> len(x))) AS BIGINT) AS total_chars
    FROM w
    """,
)
def scalar_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions: exists / forall / aggregate fold."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .select("p_partkey", F.split("p_name", " ").alias("words"))
        .selectExpr(
            "p_partkey",
            "exists(words, x -> length(x) = 5) AS has_len5",
            "forall(words, x -> length(x) > 2) AS all_len3plus",
            "CAST(aggregate(words, 0, (acc, x) -> acc + length(x)) AS BIGINT) AS total_chars",
        )
    )


@register(
    "scalar_json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object + from_json agree on the extracted value; the sum
    uses the from_json-typed column (exact integer arithmetic)."""
    t = load_tables(spark, sf_dir)
    parsed = t["events"].select(
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_str_path"),
        F.from_json("props", "k BIGINT").getField("k").alias("k_typed"),
    )
    return (
        parsed.filter(F.col("k_str_path").eqNullSafe(F.col("k_typed")))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k_typed").alias("sum_k"))
    )


@register(
    "scalar_bitwise_hash",
    oracle="""
    SELECT p_partkey,
           p_partkey & 255 AS and_mask,
           p_partkey | 4096 AS or_mask,
           xor(p_partkey, 1023) AS xor_k,
           p_partkey << 2 AS shl2,
           p_partkey >> 1 AS shr1,
           sha256(p_name) AS name_sha,
           md5(p_brand) AS brand_md5,
           CAST(least(CAST(p_size AS BIGINT), length(p_name)) AS BIGINT) AS lo,
           CAST(greatest(CAST(p_size AS BIGINT), length(p_name)) AS BIGINT) AS hi
    FROM part WHERE p_partkey < 500
    """,
)
def scalar_bitwise_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise ops, cryptographic hashes, least/greatest."""
    t = load_tables(spark, sf_dir)
    k = F.col("p_partkey")
    return (
        t["part"]
        .filter(k < 500)
        .select(
            "p_partkey",
            k.bitwiseAND(255).alias("and_mask"),
            k.bitwiseOR(4096).alias("or_mask"),
            k.bitwiseXOR(1023).alias("xor_k"),
            F.expr("p_partkey << 2").alias("shl2"),
            F.expr("p_partkey >> 1").alias("shr1"),
            F.sha2("p_name", 256).alias("name_sha"),
            F.md5("p_brand").alias("brand_md5"),
            F.least(F.col("p_size").cast("bigint"), F.length("p_name")).alias("lo"),
            F.greatest(F.col("p_size").cast("bigint"), F.length("p_name")).alias("hi"),
        )
    )


@register(
    "scalar_struct_to_json",
    oracle="""
    SELECT p_partkey,
           to_json({'key': p_partkey, 'brand': p_brand, 'size': p_size}) AS doc
    FROM part WHERE p_partkey < 300
    """,
)
def scalar_struct_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction + JSON serialization (field order preserved,
    compact encoding — byte-identical across engines)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.to_json(
                F.struct(
                    F.col("p_partkey").alias("key"),
                    F.col("p_brand").alias("brand"),
                    F.col("p_size").alias("size"),
                )
            ).alias("doc"),
        )
    )


@register(
    "scalar_regexp_funcs",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_name, '([aeiou])', '<\\1>', 'g') AS vowels_marked,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
           regexp_matches(p_name, '^[a-m]') AS starts_low,
           regexp_extract(p_type, '([a-z]+)$', 1) AS last_word
    FROM part WHERE p_partkey < 400
    """,
)
def scalar_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: global replace with backreference, match count,
    rlike predicate, group extraction. (Spark replaces globally by
    default; DuckDB needs the 'g' flag — same semantics either way.)"""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") < 400)
        .select(
            "p_partkey",
            F.regexp_replace("p_name", "([aeiou])", "<$1>").alias("vowels_marked"),
            F.regexp_count("p_name", F.lit("[aeiou]")).cast("int").alias("n_vowels"),
            F.col("p_name").rlike("^[a-m]").alias("starts_low"),
            F.regexp_extract("p_type", "([a-z]+)$", 1).alias("last_word"),
        )
    )


@register(
    "scalar_try_cast",
    oracle="""
    SELECT p_partkey,
           try_cast(split_part(p_name, ' ', 1) AS INT) AS first_tok_int,
           try_cast(p_brand AS DOUBLE) AS brand_dbl,
           try_cast(CAST(p_size AS VARCHAR) AS INT) AS size_roundtrip
    FROM part WHERE p_partkey < 400
    """,
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_cast: malformed input becomes NULL instead of failing the
    job — the difference between one bad record and a dead 100 TB run."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") < 400)
        .select(
            "p_partkey",
            F.expr("try_cast(split_part(p_name, ' ', 1) AS INT)").alias("first_tok_int"),
            F.expr("try_cast(p_brand AS DOUBLE)").alias("brand_dbl"),
            F.expr("try_cast(CAST(p_size AS STRING) AS INT)").alias("size_roundtrip"),
        )
    )


@register(
    "scalar_timestamp_diff",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT) AS ship_delay_days,
           CAST(date_diff('second', date_trunc('second', o.o_orderdate),
                          date_trunc('second', l.l_shipdate)) AS BIGINT) AS ship_delay_s
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_orderkey < 1500
    """,
)
def scalar_timestamp_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal arithmetic across a join: order-to-ship latency in days
    (boundary count) and in exact seconds."""
    t = load_tables(spark, sf_dir)
    j = (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 1500)
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
    )
    return j.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("ship_delay_days"),
        (
            F.unix_timestamp(F.date_trunc("second", "l_shipdate"))
            - F.unix_timestamp(F.date_trunc("second", "o_orderdate"))
        ).alias("ship_delay_s"),
    )


@register(
    "agg_null_semantics",
    oracle="""
    WITH t AS (SELECT nullif(o_orderstatus, 'O') AS s, o_totalprice FROM orders)
    SELECT count(*) AS n_all,
           count(s) AS n_nonnull,
           CAST(count(DISTINCT s) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN s IS NULL THEN NULL
                    ELSE CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE)
             AS sum_nonnull_price,
           count(*) FILTER (WHERE s IS NULL) AS n_null
    FROM t
    """,
)
def agg_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling aggregate contract: count(*) counts rows, count(col)
    and SUM skip NULLs, count(DISTINCT) excludes NULL."""
    t = load_tables(spark, sf_dir)
    s = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    base = t["orders"].select(s.alias("s"), "o_totalprice")
    return base.agg(
        F.count("*").alias("n_all"),
        F.count("s").alias("n_nonnull"),
        F.countDistinct("s").alias("n_distinct"),
        F.sum(F.when(F.col("s").isNull(), None).otherwise(dec("o_totalprice")))
        .cast("double")
        .alias("sum_nonnull_price"),
        F.count_if(F.col("s").isNull()).alias("n_null"),
    )


@register(
    "scalar_array_funcs2",
    oracle="""
    WITH t AS (SELECT p_partkey,
                      list_filter(string_split(p_name, ' '), x -> x <> '') AS words
               FROM part WHERE p_partkey < 400)
    SELECT p_partkey,
           CAST(list_position(words, 'lace') AS INT) AS pos_lace,
           coalesce(array_to_string(words[1:2], ','), '') AS first_two,
           coalesce(array_to_string(list_reverse_sort(words), ','), '')
             AS words_desc,
           CAST(len(range(1, CAST(len(words) AS BIGINT) + 1)) AS INT) AS idx_len
    FROM t
    """,
)
def scalar_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second array batch: array_position / slice / descending sort /
    sequence length round-trip. Array results are serialized with
    concat_ws so the output schema is scalar-only (the driver's
    canonicalizer sorts columns with pandas, which cannot hash array
    cells); the array ops themselves still run natively."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_partkey") < 400)
        .selectExpr(
            "p_partkey",
            "filter(split(p_name, ' '), x -> x != '') AS words",
        )
        .selectExpr(
            "p_partkey",
            "CAST(array_position(words, 'lace') AS INT) AS pos_lace",
            "concat_ws(',', slice(words, 1, 2)) AS first_two",
            "concat_ws(',', reverse(array_sort(words))) AS words_desc",
            "CAST(size(sequence(1, size(words))) AS INT) AS idx_len",
        )
    )


@register(
    "events_hourly_profile",
    oracle="""
    SELECT CAST(hour(ts) AS INT) AS hr,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'view') AS n_view,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(*) AS n_total
    FROM events GROUP BY 1
    """,
)
def events_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day activity profile (conditional counts per event type) —
    the aggregate underlying traffic-shaping decisions; one shuffle of
    24 x |types| partial counts."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.hour("ts").cast("int").alias("hr"))
        .agg(
            F.count_if(F.col("event_type") == "click").alias("n_click"),
            F.count_if(F.col("event_type") == "view").alias("n_view"),
            F.count_if(F.col("event_type") == "purchase").alias("n_purchase"),
            F.count("*").alias("n_total"),
        )
    )


@register(
    "scalar_array_funcs3",
    oracle="""
    WITH a AS (
      SELECT p_partkey,
             string_split(p_name, ' ') AS words,
             [p_partkey % 7, p_partkey % 5, p_partkey % 7] AS nums
      FROM part WHERE p_partkey < 400
    )
    SELECT p_partkey,
           coalesce(array_to_string(flatten([words, ['x']]), ','), '') AS flat,
           coalesce(array_to_string(
               list_filter(nums, e -> e <> p_partkey % 7), ','), '') AS removed,
           coalesce(array_to_string(
               list_sort(list_distinct(list_concat(nums, [1, 2]))), ','), '')
             AS unioned,
           coalesce(array_to_string(
               list_sort(list_filter(list_distinct(nums),
                                     e -> NOT list_contains([1, 2], e))), ','), '')
             AS excepted,
           coalesce(array_to_string(
               list_sort(list_filter(list_distinct(nums),
                                     e -> list_contains([1, 2], e))), ','), '')
             AS intersected
    FROM a
    """,
)
def scalar_array_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array batch 3: flatten, array_remove, and the sorted forms of
    array_union/except/intersect (sorted because the engines'
    first-seen orders differ; set semantics are the portable part).
    Results are concat_ws-serialized so the output schema is
    scalar-only for the driver's pandas canonicalizer; empty arrays
    become '' on both engines (DuckDB side coalesces its NULL)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter("p_partkey < 400")
        .selectExpr(
            "p_partkey",
            "split(p_name, ' ') AS words",
            "array(p_partkey % 7, p_partkey % 5, p_partkey % 7) AS nums",
        )
        .selectExpr(
            "p_partkey",
            "concat_ws(',', flatten(array(words, array('x')))) AS flat",
            "concat_ws(',', transform(array_remove(nums, p_partkey % 7),"
            " e -> CAST(e AS STRING))) AS removed",
            "concat_ws(',', transform(array_sort(array_union(nums, array(1, 2))),"
            " e -> CAST(e AS STRING))) AS unioned",
            "concat_ws(',', transform(array_sort(array_except(nums, array(1, 2))),"
            " e -> CAST(e AS STRING))) AS excepted",
            "concat_ws(',', transform(array_sort(array_intersect(nums, array(1, 2))),"
            " e -> CAST(e AS STRING))) AS intersected",
        )
    )


@register(
    "scalar_binary_funcs",
    oracle="""
    SELECT p_partkey,
           hex(encode(p_brand)) AS brand_hex,
           decode(unhex(hex(encode(p_brand)))) AS roundtrip,
           to_base64(encode(p_name)) AS name_b64,
           bin(p_partkey) AS key_bits,
           octet_length(encode(p_name)) AS n_bytes
    FROM part WHERE p_partkey < 400
    """,
)
def scalar_binary_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary batch: hex/unhex round-trip, base64, bit string, byte
    length — the cheap end of binary-payload handling (the expensive
    end is the multimodal mapInPandas path)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter("p_partkey < 400")
        .selectExpr(
            "p_partkey",
            "hex(encode(p_brand, 'UTF-8')) AS brand_hex",
            "decode(unhex(hex(encode(p_brand, 'UTF-8'))), 'UTF-8') AS roundtrip",
            "base64(encode(p_name, 'UTF-8')) AS name_b64",
            "bin(p_partkey) AS key_bits",
            "octet_length(encode(p_name, 'UTF-8')) AS n_bytes",
        )
    )


@register(
    "scalar_date_funcs3",
    oracle="""
    SELECT o_orderkey,
           dayofyear(o_orderdate) AS doy,
           CAST(date_part('month', o_orderdate) AS INT) AS mth,
           strftime(make_date(2024, CAST(o_orderkey % 12 + 1 AS INT), 15),
                    '%Y-%m-%d') AS mid_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS INT)
             AS epoch_days,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_s,
           strftime(to_timestamp(86400 * 10000), '%Y-%m-%d %H:%M:%S') AS from_unix
    FROM orders WHERE o_orderkey < 300
    """,
)
def scalar_date_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date batch 3: day-of-year, date_part, make_date, trunc-to-month,
    days/seconds since epoch, epoch -> timestamp."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter("o_orderkey < 300")
        .selectExpr(
            "o_orderkey",
            "dayofyear(o_orderdate) AS doy",
            "CAST(date_part('month', o_orderdate) AS INT) AS mth",
            "date_format(make_date(2024, CAST(o_orderkey % 12 + 1 AS INT), 15),"
            " 'yyyy-MM-dd') AS mid_month",
            "date_format(trunc(o_orderdate, 'MM'), 'yyyy-MM-dd') AS month_start",
            "CAST(unix_date(CAST(o_orderdate AS DATE)) AS INT) AS epoch_days",
            "to_unix_timestamp(CAST(o_orderdate AS TIMESTAMP)) AS epoch_s",
            "date_format(to_timestamp(86400 * 10000), 'yyyy-MM-dd HH:mm:ss')"
            " AS from_unix",
        )
    )


@register(
    "scalar_math_funcs2",
    oracle="""
    SELECT p_partkey,
           ROUND(exp(p_size / 25.0), 9) AS e_x,
           ROUND(log2(p_size + 1.0), 9) AS lg2,
           ROUND(cbrt(CAST(p_size AS DOUBLE)), 9) AS cbrt_v,
           CAST(sign(p_size - 25) AS DOUBLE) AS sgn,
           CASE WHEN p_partkey % 10 = 0 THEN NULL
                ELSE ROUND(p_retailprice / (p_partkey % 10), 6) END AS safe_div
    FROM part WHERE p_partkey < 400
    """,
)
def scalar_math_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math batch 2: exp/log2/cbrt/sign and try_divide (NULL on zero
    divisor — the oracle spells the CASE out since DuckDB has no try_
    family)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter("p_partkey < 400")
        .selectExpr(
            "p_partkey",
            "ROUND(exp(p_size / 25.0), 9) AS e_x",
            "ROUND(log2(p_size + 1.0), 9) AS lg2",
            "ROUND(cbrt(CAST(p_size AS DOUBLE)), 9) AS cbrt_v",
            "CAST(signum(p_size - 25) AS DOUBLE) AS sgn",
            "ROUND(try_divide(p_retailprice, p_partkey % 10), 6) AS safe_div",
        )
    )
