"""Custom pluggable source via Spark 4's Python DataSource API — the
engine's extension seam for formats Spark has no built-in reader for
(the reference's S1 custom text scan generalized; see SURVEY.md §2 S1,
reference `file_shard.h:28-94` for the sharding it replaces).

`ParquetRowGroupDataSource` re-reads parquet through pyarrow with ONE
InputPartition PER ROW GROUP — the same shard-at-natural-boundaries
planning the reference does with `map_kilobytes` byte offsets, except
the boundaries are parquet row groups, so every task reads a
self-contained column chunk with its own statistics. `read()` yields
pyarrow RecordBatches (the Arrow fast path — rows never materialize in
Python objects).

This is demo-grade for parquet (Spark's native scan is strictly better:
vectorized, pushdown, pruning) — the point is the PLUMBING: schema from
the footer, partition planning, Arrow-batch emission. Swap the pyarrow
calls for any exotic format reader (proprietary log format, tensor
shards, a REST-paged API) and the same class distributes it.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

FORMAT_NAME = "mrc_rowgroups"


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, index: int):
        self.path = path
        self.index = index


class _RowGroupReader(DataSourceReader):
    def __init__(self, schema, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("mrc_rowgroups requires .option('path', ...)")
        self.columns = [f.name for f in schema.fields]

    def partitions(self):
        import pyarrow.parquet as pq

        n = pq.ParquetFile(self.path).metadata.num_row_groups
        return [_RowGroupPartition(self.path, i) for i in range(n)]

    def read(self, partition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(partition.path)
        tbl = f.read_row_group(partition.index, columns=self.columns)
        yield from tbl.to_batches()


class ParquetRowGroupDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("mrc_rowgroups requires .option('path', ...)")
        return from_arrow_schema(pq.ParquetFile(path).schema_arrow)

    def reader(self, schema):
        return _RowGroupReader(schema, self.options)


def register_sources(spark) -> None:
    """Idempotently register the custom formats on a session."""
    spark.dataSource.register(ParquetRowGroupDataSource)
