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
