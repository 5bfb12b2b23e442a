"""The reference's map/reduce contract, re-expressed on Spark.

Reproduces the semantics of the reference's user-facing API
(`/root/reference/external/include/mr_task_factory.h:14-43`):

- mapper: one input line -> zero or more ``(key, value)`` string pairs
  (BaseMapper::map + emit, invoked per line at worker.h:98-100);
- shuffle: hash-partition pairs into ``n_outputs`` partitions
  (mr_tasks.h:44-45);
- reducer: called once per distinct key with all its values, in
  ascending key order within each partition (worker.h:127-152);
- output: ``n_outputs`` partitions, each key-sorted (mr_tasks.h:109-121,
  description.md:56).

Differences by design (scale fixes, not semantic changes):
- grouping streams over a sorted partition iterator with bounded
  memory, instead of the reference's whole-partition in-memory
  ``std::map`` (worker.h:127 — OOMs on skew);
- partition assignment uses Spark's ``portable_hash`` rather than
  ``std::hash`` (implementation-defined); we guarantee content +
  per-partition-sortedness + partition-count equivalence, not
  byte-identical file routing (SURVEY §2 S2);
- the shuffle is Spark's binary sort-based shuffle, not M×R
  intermediate text files (mr_tasks.h:52) — the "key value\\n" text
  round-trip (and its key-with-whitespace corruption bug,
  worker.h:134-137) is gone.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.rdd import portable_hash
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

MapperFn = Callable[[str], Iterable[tuple[str, str]]]
ReducerFn = Callable[[str, list[str]], Iterable[tuple[str, str]]]

# User-code registry keyed by user_id — mirrors the reference's task
# factory (mr_task_factory.cc:74-88), as a plain dict of callables.
_TASKS: dict[str, tuple[MapperFn, ReducerFn]] = {}


def register_tasks(user_id: str, mapper: MapperFn, reducer: ReducerFn) -> None:
    _TASKS[user_id] = (mapper, reducer)


def get_tasks(user_id: str) -> tuple[MapperFn, ReducerFn]:
    if user_id not in _TASKS:
        raise KeyError(f"no tasks registered for user_id={user_id!r}")
    return _TASKS[user_id]


KV_SCHEMA = StructType(
    [StructField("key", StringType(), False), StructField("value", StringType(), True)]
)

PARTITIONED_KV_SCHEMA = StructType(
    [
        StructField("partition_id", IntegerType(), False),
        StructField("key", StringType(), False),
        StructField("value", StringType(), True),
    ]
)


def _grouped_reduce(reducer: ReducerFn):
    """Stream key-runs off a sorted partition iterator (bounded memory:
    only one key's values are resident, vs worker.h:127's whole-partition
    map)."""

    def run(it: Iterator[tuple[str, str]]) -> Iterator[tuple[str, str]]:
        cur_key: str | None = None
        vals: list[str] = []
        for k, v in it:
            if k != cur_key:
                if cur_key is not None:
                    yield from reducer(cur_key, vals)
                cur_key, vals = k, [v]
            else:
                vals.append(v)
        if cur_key is not None:
            yield from reducer(cur_key, vals)

    return run


def run_mapreduce(
    spark: SparkSession,
    lines: DataFrame,
    mapper: MapperFn,
    reducer: ReducerFn,
    n_outputs: int = 8,
    with_partition_id: bool = False,
) -> DataFrame:
    """Full map -> shuffle -> sorted reduce pipeline over a one-string-
    column DataFrame; returns (key, value) rows (plus partition_id when
    requested, for sortedness verification)."""
    pairs = lines.rdd.flatMap(lambda row: mapper(row[0]))
    sorted_parts = pairs.repartitionAndSortWithinPartitions(
        numPartitions=n_outputs, partitionFunc=portable_hash
    )
    reduce_fn = _grouped_reduce(reducer)
    if with_partition_id:
        out = sorted_parts.mapPartitionsWithIndex(
            lambda pid, it: ((pid, k, v) for k, v in reduce_fn(it)),
            preservesPartitioning=True,
        )
        return spark.createDataFrame(out, PARTITIONED_KV_SCHEMA)
    out = sorted_parts.mapPartitions(reduce_fn, preservesPartitioning=True)
    return spark.createDataFrame(out, KV_SCHEMA)


def run_job(
    spark: SparkSession,
    input_paths: list[str],
    user_id: str,
    output_dir: str,
    n_outputs: int = 8,
) -> None:
    """End-to-end job like MapReduce::run (mapreduce_impl.cc:8-26):
    text inputs -> registered (mapper, reducer) -> n_outputs key-sorted
    text files formatted "key value" (mr_tasks.h:118 format)."""
    mapper, reducer = get_tasks(user_id)
    lines = spark.read.text(list(input_paths))
    pairs = lines.rdd.flatMap(lambda row: mapper(row[0]))
    sorted_parts = pairs.repartitionAndSortWithinPartitions(
        numPartitions=n_outputs, partitionFunc=portable_hash
    )
    out = sorted_parts.mapPartitions(_grouped_reduce(reducer), preservesPartitioning=True)
    out.map(lambda kv: f"{kv[0]} {kv[1]}").saveAsTextFile(output_dir)


def run(spark: SparkSession, config_path: str) -> None:
    """The reference's public entry point, MapReduce::run(config)
    (mapreduce.h:15 -> mapreduce_impl.cc:8-26): read+validate spec ->
    configure Spark (shard size, R) -> run the job. Shard creation and
    the master loop are Spark's file-source partitioning and scheduler."""
    from mapreducecore_spark.config import read_and_validate_spec

    spec = read_and_validate_spec(config_path)
    for k, v in spec.spark_confs().items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    run_job(
        spark,
        spec.input_files,
        spec.user_id,
        spec.output_dir,
        n_outputs=spec.n_output_files,
    )
