"""Table-maintenance operators: snapshot reconciliation (diff by row
hash) and CDC merge/upsert. The ops a pipeline runs when migrating
between engines or maintaining a mutable serving copy of an
append-only log — [EXT] scope (reference's only sink is an append-only
text emit, mr_tasks.h:109-121).

Both build their "second version" deterministically from the base
table (modular-arithmetic picks), so Spark and DuckDB can be checked
against each other without fixture files.

Scale notes: the diff is one full-outer join partitioned on the key —
row hashes collapse wide rows to one comparison column BEFORE the
shuffle, so the exchange carries (key, 32-byte hash), not whole rows.
The merge is the same join shape; at 100 TB both would run against
bucketed/sorted base files so only the CDC side shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register

# Simulated next snapshot of `orders`:
#   - every 1000th key deleted,
#   - every 997th key's totalprice bumped by 1.00,
#   - a new key (base key + 1e9) inserted for every 999th row.
_V2_SPARK = """
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 997 = 0
                THEN CAST(o_totalprice + 1.00 AS DOUBLE) ELSE o_totalprice END
             AS o_totalprice
    FROM {src} WHERE o_orderkey % 1000 <> 0
    UNION ALL
    SELECT o_orderkey + 1000000000, o_orderstatus, o_totalprice
    FROM {src} WHERE o_orderkey % 999 = 0
"""


def _v2(spark: SparkSession, t) -> DataFrame:
    t["orders"].createOrReplaceTempView("_maint_orders")
    return spark.sql(_V2_SPARK.format(src="_maint_orders"))


_ROWHASH = "md5(concat_ws('|', o_orderstatus, CAST(o_totalprice AS DECIMAL(18,2))))"


@register(
    "table_diff_rowhash",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), v2 AS ({_V2_SPARK.format(src="orders")}),
    h1 AS (SELECT o_orderkey, {_ROWHASH} AS h FROM v1),
    h2 AS (SELECT o_orderkey, {_ROWHASH} AS h FROM v2),
    d AS (
      SELECT COALESCE(h1.o_orderkey, h2.o_orderkey) AS k,
             CASE WHEN h2.o_orderkey IS NULL THEN 'deleted'
                  WHEN h1.o_orderkey IS NULL THEN 'added'
                  WHEN h1.h <> h2.h THEN 'changed'
                  ELSE 'same' END AS action
      FROM h1 FULL OUTER JOIN h2 ON h1.o_orderkey = h2.o_orderkey
    )
    SELECT action, COUNT(*) AS n FROM d WHERE action <> 'same' GROUP BY action
    """,
)
def table_diff_rowhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: added/deleted/changed counts between two
    table versions. Rows collapse to (key, md5 row hash) before the
    full-outer join, so the shuffle carries 40-byte rows regardless of
    table width — the migration-audit idiom at any scale."""
    t = load_tables(spark, sf_dir)
    v1 = t["orders"].selectExpr("o_orderkey", f"{_ROWHASH} AS h")
    v2 = _v2(spark, t).selectExpr("o_orderkey", f"{_ROWHASH} AS h2")
    joined = v1.withColumnRenamed("o_orderkey", "k1").join(
        v2.withColumnRenamed("o_orderkey", "k2"),
        F.col("k1") == F.col("k2"),
        "full_outer",
    )
    action = (
        F.when(F.col("k2").isNull(), "deleted")
        .when(F.col("k1").isNull(), "added")
        .when(F.col("h") != F.col("h2"), "changed")
        .otherwise("same")
    )
    return (
        joined.select(action.alias("action"))
        .filter("action <> 'same'")
        .groupBy("action")
        .agg(F.count("*").alias("n"))
    )


@register(
    "table_merge_upsert",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    ), cdc AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 1000 = 0 THEN 'D' ELSE 'U' END AS op,
             o_orderstatus,
             CAST(o_totalprice + 1.00 AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 1000000000, 'I', o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 999 = 0
    ), merged AS (
      SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
             COALESCE(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
             COALESCE(c.o_totalprice, b.o_totalprice) AS o_totalprice
      FROM base b FULL OUTER JOIN cdc c ON b.o_orderkey = c.o_orderkey
      WHERE c.op IS NULL OR c.op <> 'D'
    )
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM merged GROUP BY o_orderstatus
    """,
)
def table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics on plain parquet tables: apply a CDC batch of
    inserts/updates/deletes to a base snapshot in one full-outer join
    (matched+D -> drop, matched+U -> take source, unmatched source ->
    insert). Output is the merged table's per-status count and exact
    decimal total — a compact witness that every row landed. The same
    plan is what Delta/Iceberg MERGE lowers to; here it's explicit."""
    t = load_tables(spark, sf_dir)
    base = t["orders"].select("o_orderkey", "o_orderstatus", "o_totalprice")
    upd = (
        base.filter("o_orderkey % 7 = 0")
        .selectExpr(
            "o_orderkey",
            "CASE WHEN o_orderkey % 1000 = 0 THEN 'D' ELSE 'U' END AS op",
            "o_orderstatus",
            "CAST(o_totalprice + 1.00 AS DOUBLE) AS o_totalprice",
        )
    )
    ins = base.filter("o_orderkey % 999 = 0").selectExpr(
        "o_orderkey + 1000000000 AS o_orderkey",
        "'I' AS op",
        "o_orderstatus",
        "o_totalprice",
    )
    cdc = upd.unionByName(ins)
    b = base.toDF("bk", "bs", "bp")
    c = cdc.toDF("ck", "op", "cs", "cp")
    merged = (
        b.join(c, F.col("bk") == F.col("ck"), "full_outer")
        .filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce("cs", "bs").alias("o_orderstatus"),
            F.coalesce("cp", "bp").alias("o_totalprice"),
        )
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


# ----------------------------------------- small-file compaction

# The "small files problem": a streaming or over-partitioned writer
# leaves thousands of KB-sized parquet files; every scan then pays
# per-file open/footer cost and the file index balloons. Compaction
# rewrites them into row-count-targeted files.
_COMPACT_SMALL_FILES = 64
_COMPACT_TARGET_ROWS = 4096

# File-count contract (ADVICE r3 hardening): the scatter targets
# LEAST(64, rows) partitions and the Spark side makes that count exact
# by coalescing to one upstream partition first — multi-partition
# round-robin starts each input partition at an arbitrary offset, so
# output partitions can collide and undershoot the count when
# rows ~ partitions. An empty table short-circuits to all-zero counts
# on both sides (Spark writes no parquet for empty partitions, so the
# scatter directory would not even be readable). maxRecordsPerFile=0
# is pinned on both writes so a host session's file-splitting conf
# cannot diverge from this contract.
_COMPACT_ORACLE = f"""
    SELECT CAST(LEAST({_COMPACT_SMALL_FILES}, COUNT(*)) AS BIGINT) AS n_files_before,
           CAST(CASE WHEN COUNT(*) = 0 THEN 0
                     ELSE CEIL(COUNT(*) / {_COMPACT_TARGET_ROWS}.0) END AS BIGINT)
               AS n_files_after,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_totalprice
    FROM orders
"""


def _write_exact_files(df: DataFrame, n_files: int, path: str) -> None:
    """Write df as EXACTLY n_files parquet files.

    Precondition: n_files <= rows (callers clamp with
    min(n_files, count)). Round-robin from one partition then gives
    every target partition >= floor(rows/n_files) >= 1 row — this
    matters because Spark writes partition 0's file even when EMPTY
    (schema preservation), so an unfilled partition 0 would add a
    spurious empty file to the count.

    coalesce(1) first: round-robin from ONE input partition fills the
    target partitions strictly sequentially, so with n_files <= rows
    every partition is non-empty — multi-partition round-robin starts
    each source partition at an arbitrary offset, and with rows near
    n_files the offsets collide and leave empty partitions. The
    eager localCheckpoint MATERIALIZES the single-partition layout:
    without it, Catalyst's CollapseRepartition rewrites
    coalesce(1).repartition(n) into repartition(n) over the raw
    multi-partition scan and silently reintroduces exactly that
    collision (ADVICE r4 — verified: 70 rows over 8 input partitions
    yielded 49 of 64 target files). maxRecordsPerFile=0 pins the
    one-file-per-partition contract even when a host session sets a
    global file-splitting conf."""
    one = df.coalesce(1).localCheckpoint(eager=True)
    one.repartition(n_files).write.option("maxRecordsPerFile", 0).mode(
        "overwrite"
    ).parquet(path)


@register("maintenance_compact_small_files", oracle=_COMPACT_ORACLE)
def maintenance_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction as an operator: scatter `orders` into 64
    deliberately tiny parquet files, then rewrite into
    ceil(rows / 4096) right-sized files, reporting before/after file
    counts plus row count and an exact content checksum (decimal sum)
    proving the rewrite lost nothing. The oracle states the CONTRACT:
    file counts are deterministic functions of the row count, and the
    content aggregates must equal the source table's.

    Scale notes: the rewrite is one round-robin repartition — a single
    full shuffle, the price of exact output sizing. At 100 TB the
    knobs change, not the shape: target by bytes (file bytes / avg row
    width), compact per partition-directory so only hot partitions
    rewrite, or skip the shuffle entirely with
    `write.option("maxRecordsPerFile", N)` when approximate sizing is
    acceptable (file count then depends on input layout, which is why
    the deterministic contract here uses repartition)."""
    import shutil
    import tempfile

    t = load_tables(spark, sf_dir)
    orders = t["orders"].select("o_orderkey", "o_totalprice")
    n_rows = orders.count()
    schema = (
        "n_files_before bigint, n_files_after bigint, "
        "n_rows bigint, sum_totalprice double"
    )
    if n_rows == 0:
        # Spark writes no parquet file for empty partitions, so the
        # scatter directory would be unreadable — mirror the oracle's
        # all-zero contract directly.
        return spark.createDataFrame([(0, 0, 0, None)], schema)
    scratch = tempfile.mkdtemp(prefix="mrc_compact_")
    try:
        small_dir, compact_dir = f"{scratch}/small", f"{scratch}/compact"
        n_small = min(_COMPACT_SMALL_FILES, n_rows)
        _write_exact_files(orders, n_small, small_dir)
        small = spark.read.parquet(small_dir)
        n_before = len(small.inputFiles())
        n_target = -(-n_rows // _COMPACT_TARGET_ROWS)
        # Multi-partition round-robin is provably exact HERE (unlike
        # the scatter): the widest input partition holds
        # ceil(rows/64) >= ceil(rows/4096) = n_target rows, and k rows
        # cycled from one partition hit min(k, n_target) distinct
        # targets — so every target partition is non-empty without
        # paying the scatter's coalesce(1) serialization.
        small.repartition(n_target).write.option("maxRecordsPerFile", 0).mode(
            "overwrite"
        ).parquet(compact_dir)
        compact = spark.read.parquet(compact_dir)
        n_after = len(compact.inputFiles())
        # Materialize the 1-row summary BEFORE dropping the scratch dir
        # (the lazy plan reads compact_dir); returning a local 1-row
        # frame lets the function own its cleanup instead of leaking
        # the directory until process exit (ADVICE r3).
        row = compact.agg(
            F.lit(n_before).cast("bigint").alias("n_files_before"),
            F.lit(n_after).cast("bigint").alias("n_files_after"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_totalprice"),
        )
        collected = row.collect()
        return spark.createDataFrame(collected, row.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
