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


# Per-session {sf_dir -> table dict}, stored ON the session object.
# DataFrames are lazy plans — caching them skips 10 parquet-footer/
# analysis round-trips per query call (every registry query starts
# with load_tables), which adds up across a 170-query bench run. A
# DataFrame is bound to the session that read it — the
# expanding_session clone (per-query AQE advisory) must not be handed
# frames built on the base session — so entries are per session
# OBJECT. Any GLOBAL map cannot evict here (ADVICE r9): cached
# DataFrames hold a strong ref back to their session, so a
# global->entry->frame->session path pins the session whether the map
# is weak-keyed (the r8 shape) or id-keyed with a deallocation
# finalizer (which then never fires). Hanging the cache off
# spark.__dict__ makes session -> cache -> DataFrame -> session a
# pure reference CYCLE with no global root: CPython's cycle collector
# reclaims the whole group — session, plans and all — as soon as the
# session is otherwise unreachable. (The JVM-side session follows via
# Py4J finalizers; the Python-side plan objects were the leak.)


def _session_cache(spark: SparkSession) -> dict[str, dict[str, DataFrame]]:
    return spark.__dict__.setdefault("_graft_table_cache", {})


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
