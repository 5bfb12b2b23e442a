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


_REDUCE_BATCH_ROWS = 8192


def md5_partitioner(n_outputs: int) -> Callable[[str], int]:
    """Engine-portable routing: two hex chars of md5(key) -> [0, n).

    The reference routes with std::hash (mr_tasks.h:44-45), which is
    implementation-defined — S2's contract is deterministic routing +
    per-partition sortedness, not specific hash values. md5 is
    computable identically in Spark SQL, DuckDB, and Python, so a query
    routed this way can have its partition_id column value-checked by a
    cross-engine oracle (portable_hash cannot be expressed in SQL)."""
    import hashlib

    def pid(key: str) -> int:
        h = hashlib.md5(key.encode("utf-8", "surrogateescape")).hexdigest()
        return (ord(h[30]) * 16 + ord(h[31])) % n_outputs

    return pid


def run_mapreduce(
    spark: SparkSession,
    lines: DataFrame,
    mapper: MapperFn,
    reducer: ReducerFn,
    n_outputs: int = 8,
    with_partition_id: bool = False,
    partition_fn: Callable[[str], int] | None = None,
) -> DataFrame:
    """Full map -> shuffle -> sorted reduce pipeline over a one-string-
    column DataFrame; returns (key, value) rows (plus partition_id when
    requested, for sortedness verification).

    Arrow end to end: the mapper and reducer are per-row Python (that IS
    the reference's user contract), but every engine boundary moves
    columnar record batches — ``mapInArrow`` for the map+partition
    stage, a DataFrame (JVM Tungsten) shuffle co-locating each logical
    partition, and a second ``mapInArrow`` streaming key-runs through
    the reducer. No pickled Python RDD shuffle, no per-row
    ``createDataFrame`` re-ingestion (the round-1 bench bottleneck).
    Logical partition = ``portable_hash(key) % n_outputs`` exactly as
    before; rows of one logical partition are contiguous and key-sorted.
    """
    import pyarrow as pa

    from pyspark.sql import functions as F

    route = partition_fn or (lambda k: portable_hash(k) % n_outputs)

    def map_to_pairs(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            pids: list[int] = []
            keys: list[str] = []
            vals: list[str] = []
            for line in batch.column(0).to_pylist():
                if line is None:
                    continue
                for k, v in mapper(line):
                    pids.append(route(k))
                    keys.append(k)
                    vals.append(v)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(pids, pa.int32()),
                    pa.array(keys, pa.string()),
                    pa.array(vals, pa.string()),
                ],
                ["partition_id", "key", "value"],
            )

    kv = lines.mapInArrow(map_to_pairs, "partition_id int, key string, value string")
    # One JVM shuffle: all rows of a logical partition land in the same
    # task; the sort gives the reducer its ascending-key contract
    # (worker.h:150-152) with logical partitions laid out contiguously.
    shuffled = kv.repartition(n_outputs, F.col("partition_id")).sortWithinPartitions(
        "partition_id", "key"
    )

    def reduce_stream(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        cur: tuple[int, str] | None = None
        vals: list[str] = []
        out_p: list[int] = []
        out_k: list[str] = []
        out_v: list[str] = []

        def flush_group() -> None:
            if cur is not None:
                for k2, v2 in reducer(cur[1], vals):
                    out_p.append(cur[0])
                    out_k.append(k2)
                    out_v.append(v2)
            vals.clear()

        def emit() -> "pa.RecordBatch":
            b = pa.RecordBatch.from_arrays(
                [
                    pa.array(out_p, pa.int32()),
                    pa.array(out_k, pa.string()),
                    pa.array(out_v, pa.string()),
                ],
                ["partition_id", "key", "value"],
            )
            out_p.clear(), out_k.clear(), out_v.clear()
            return b

        for batch in batches:
            d = batch.to_pydict()
            for pid, k, v in zip(d["partition_id"], d["key"], d["value"]):
                if cur is None or (pid, k) != cur:
                    flush_group()
                    cur = (pid, k)
                vals.append(v)
            if len(out_k) >= _REDUCE_BATCH_ROWS:
                yield emit()
        flush_group()
        if out_k:
            yield emit()

    out = shuffled.mapInArrow(
        reduce_stream, "partition_id int, key string, value string"
    )
    return out if with_partition_id else out.select("key", "value")


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
