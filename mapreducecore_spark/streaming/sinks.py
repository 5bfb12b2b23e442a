"""Streaming sinks beyond the built-ins.

foreachBatch is the general-purpose exactly-once-capable sink: Spark
replays a failed micro-batch with the SAME batch_id, so any write that
is deterministic-per-batch_id (overwrite a batch-keyed location, MERGE
on a key, idempotent upsert) yields end-to-end exactly-once even though
the batch may execute more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter


def idempotent_parquet_sink(
    stream: DataFrame, out_dir: str, checkpoint_dir: str
) -> DataStreamWriter:
    """Write each micro-batch to `{out_dir}/batch=<id>` with overwrite:
    a replayed batch rewrites its own directory instead of duplicating
    rows — the batch_id-keyed-overwrite idempotency pattern."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def versioned_merge_sink(
    stream: DataFrame, state_dir: str, checkpoint_dir: str
) -> DataStreamWriter:
    """Incremental MERGE-upsert through foreachBatch: micro-batch b
    aggregates its rows per key, merges them into the previous state
    snapshot, and writes the result as `{state_dir}/v=<b>` (overwrite).

    Exactly-once without a table format: a replayed batch re-reads the
    newest snapshot with version < its own batch_id and overwrites its
    own version — both deterministic in batch_id, so a retry converges
    to the identical snapshot. This is the parquet-only skeleton of
    what Delta/Iceberg MERGE does with a commit log; production keeps
    the same pattern and adds snapshot expiry (here old versions are
    left for the test harness to inspect).

    The state row per key is (last_type, last_value, ordkey, n_events)
    with ordkey the zero-padded 'epoch|event_id' argmax key — state
    stores AGGREGATES, not history, so a key seen a million times
    still holds one row: the state size is bounded by key cardinality,
    never by stream length.

    Expects input columns: user_id, event_type, value, ordkey.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_batch_into(batch_df, batch_id, state_dir)

    return (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def _snapshot_versions(spark, state_dir: str) -> list[int]:
    """List `v=<n>` snapshot versions under state_dir through the
    Hadoop FileSystem API, so the sink works against ANY
    Hadoop-compatible URI (HDFS/S3/local) — a driver-local os.listdir
    would silently see no prior versions on a remote filesystem and
    reset state every batch (ADVICE r3)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(state_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            out.append(int(name.split("=", 1)[1]))
    return out


def merge_batch_into(batch_df: DataFrame, batch_id: int, state_dir: str) -> None:
    """One MERGE step of versioned_merge_sink, module-level so replay
    idempotency is directly unit-testable: deterministic in
    (batch contents, batch_id, prior snapshots < batch_id)."""
    from pyspark.sql import functions as F

    spark = batch_df.sparkSession
    b = batch_df.groupBy("user_id").agg(
        F.max_by("event_type", "ordkey").alias("last_type"),
        F.max_by("value", "ordkey").alias("last_value"),
        F.max("ordkey").alias("ordkey"),
        F.count("*").alias("n_events"),
    )
    prior = [v for v in _snapshot_versions(spark, state_dir) if v < batch_id]
    if prior:
        # Rename by NAME, not positionally: a positional toDF would
        # silently mismap state if the snapshot's column order ever
        # changed (schema evolution of the merge state; ADVICE r3).
        p = spark.read.parquet(f"{state_dir}/v={max(prior)}").select(
            "user_id",
            F.col("last_type").alias("p_type"),
            F.col("last_value").alias("p_value"),
            F.col("ordkey").alias("p_ordkey"),
            F.col("n_events").alias("p_n"),
        )
        newer = F.col("p_ordkey").isNull() | (
            F.col("ordkey").isNotNull() & (F.col("ordkey") > F.col("p_ordkey"))
        )
        b = (
            b.join(p, "user_id", "full_outer")
            .select(
                "user_id",
                F.when(newer, F.col("last_type"))
                .otherwise(F.col("p_type"))
                .alias("last_type"),
                F.when(newer, F.col("last_value"))
                .otherwise(F.col("p_value"))
                .alias("last_value"),
                F.greatest("ordkey", "p_ordkey").alias("ordkey"),
                (
                    F.coalesce("n_events", F.lit(0)) + F.coalesce("p_n", F.lit(0))
                ).alias("n_events"),
            )
        )
    b.write.mode("overwrite").parquet(f"{state_dir}/v={batch_id}")


def latest_merge_snapshot(spark, state_dir: str) -> DataFrame:
    """Read the newest versioned snapshot written by
    versioned_merge_sink."""
    versions = _snapshot_versions(spark, state_dir)
    if not versions:
        raise FileNotFoundError(
            f"no merge snapshots (v=<n> directories) under {state_dir}"
        )
    return spark.read.parquet(f"{state_dir}/v={max(versions)}")
