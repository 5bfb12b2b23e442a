"""Table catalog over the driver-generated parquet testdata.

Loads the star schema + events/documents/embeddings tables
(TESTDATA.md / FIXTURES.md) and registers them as temp views so both the
DataFrame API and spark.sql() can address them. Parquet scans give
column pruning + predicate pushdown for free — the scan layer the
reference implements by hand for text (worker.h:89-103) is Spark's file
source here.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

from mapreducecore_spark.session import tune_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5 rows, nation=25 rows — fixed-size irrespective of SF).
BROADCAST_DIMS = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# id(session) -> {sf_dir -> table dict}. DataFrames are lazy
# plans — caching them skips 10 parquet-footer/analysis round-trips per
# query call (every registry query starts with load_tables), which adds
# up across a 170-query bench run. A DataFrame is bound to the session
# that read it — the expanding_session clone (per-query AQE advisory)
# must not be handed frames built on the base session — so entries are
# per session OBJECT. Keying a WeakKeyDictionary on the session itself
# (r8's fix) never actually evicted (ADVICE r9): the cached DataFrames
# hold a strong ref back to their session, and the dict holds its
# values strongly, so every key session was kept alive by its own
# entry. Key by id() instead and evict via weakref.finalize — the
# callback fires when the session is deallocated (its cache entry does
# not pin it, since the dict no longer references the session object),
# popping the entry and every plan in it. id() reuse is safe: the
# finalizer runs at deallocation, before the address can be handed to
# a new object.
_TABLE_CACHE: dict[int, dict[str, dict[str, DataFrame]]] = {}


def _session_cache(spark: SparkSession) -> dict[str, dict[str, DataFrame]]:
    key = id(spark)
    entry = _TABLE_CACHE.get(key)
    if entry is None:
        entry = _TABLE_CACHE[key] = {}
        weakref.finalize(spark, _TABLE_CACHE.pop, key, None)
    return entry


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, register: bool = True
) -> dict[str, DataFrame]:
    """Load every table in `sf_dir`; optionally register temp views."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    tune_session(spark)
    cache = _session_cache(spark)
    cached = cache.get(sf_dir)
    if cached is not None:
        if register:
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
        return dict(cached)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        if name == "events":
            df = _fix_event_ts(df)
        out[name] = df
        if register:
            df.createOrReplaceTempView(name)
    cache[sf_dir] = dict(out)
    return out


def _fix_event_ts(df: DataFrame) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) in parquet, surfaced as long nanos
    via spark.sql.legacy.parquet.nanosAsLong; convert to a proper
    timestamp with exact integer division (ns div 1000 -> micros,
    matching DuckDB's CAST(ts_ns AS TIMESTAMP) truncation)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune_session(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
