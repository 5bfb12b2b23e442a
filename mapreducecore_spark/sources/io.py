"""File sources and sinks.

[REF] rows: text line scan (worker.h:89-103 — Spark's text source with
maxPartitionBytes split sizing replaces the byte-range sharder
file_shard.h:28-94, including newline alignment) and the sorted
hash-partitioned text sink (mr_tasks.h:109-121). [EXT] rows: columnar
Parquet/CSV/JSON for the relational surface.

All readers take explicit schemas where the format can't self-describe
— schema inference is a scan of the whole input, unacceptable at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_text_lines(
    spark: SparkSession, paths: list[str] | str, max_partition_bytes: int | None = None
) -> DataFrame:
    """S1: newline-delimited text -> DataFrame[value: string]. Split
    sizing (the reference's map_kilobytes, file_shard.h:35) is
    spark.sql.files.maxPartitionBytes; Spark's LineRecordReader handles
    shard-spanning lines exactly like file_shard.h:73-86's alignment."""
    if max_partition_bytes is not None:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_partition_bytes))
    return spark.read.text(paths if isinstance(paths, list) else [paths])


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_parquet(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def sorted_partitioned_text_sink(
    df: DataFrame,
    path: str,
    key_col: str,
    value_col: str,
    n_outputs: int = 8,
    sep: str = " ",
) -> None:
    """S2: the reference's result sink — n_outputs hash partitions by
    key, rows "key value", each partition key-sorted (mr_tasks.h:109-121
    + sortedness from worker.h:127). Content/sort/count equivalence, not
    std::hash file-assignment identity (SURVEY §2 S2)."""
    (
        df.select(F.col(key_col).cast("string").alias("k"), F.col(value_col).cast("string").alias("v"))
        .repartition(n_outputs, F.col("k"))
        .sortWithinPartitions("k")
        .select(F.concat_ws(sep, "k", "v").alias("value"))
        .write.mode("overwrite")
        .text(path)
    )


def write_parquet_observed(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> dict:
    """Write with sink metrics via the Observation API: row count and
    null-key count ride along the write itself — no second scan of the
    input to audit what landed. At 100 TB a post-write count() would
    re-read the whole output; observe() folds the metrics into the
    write job for free. Returns {"n_rows": ..., "n_null_first_col": ...}.
    """
    from pyspark.sql import Observation

    first = df.columns[0]
    obs = Observation("sink_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col(first).isNull(), 1).otherwise(0)).alias(
            "n_null_first_col"
        ),
    )
    observed.write.mode(mode).parquet(path)
    got = obs.get
    return {
        "n_rows": got["n_rows"],
        "n_null_first_col": got["n_null_first_col"] or 0,
    }
