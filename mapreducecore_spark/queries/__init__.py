"""Query registry: every operator from SURVEY.md §2 as a named query.

Each entry pairs a Spark DataFrame program with (where SQL-expressible)
an equivalent DuckDB oracle SQL string over the same parquet tables.
The driver hash-compares the two at sf0.01 (CORRECTNESS_r{N}.json);
tests/test_oracle_parity.py does the same comparison at sf0.001.

Determinism rules every query follows so the cross-engine value-hash
matches:
- every computed column is aliased identically in Spark and SQL;
- money/quantity aggregates are summed in DECIMAL(18,2) (exact,
  order-independent) then cast to DOUBLE — never raw double sums whose
  low bits depend on reduction order;
- timestamps in outputs are formatted to strings (second precision);
- window/rank queries order by a key set that is provably total
  (no ties), so ranks are engine-independent.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (they self-register)."""
    global _LOADED
    if _LOADED:
        return
    from mapreducecore_spark.queries import (  # noqa: F401
        relational,
        windows,
        setops,
        scalars,
        mapreduce_queries,
        llm,
        streaming_batch,
        udfs,
        advanced,
        tpch_full,
        pipeline,
        graph,
        maintenance,
        quality,
        streaming_live,
    )

    _LOADED = True
