"""Adversarial events-table parity: the generator's events are dense
and well-behaved, so boundary cases — a gap of exactly the session
threshold, sub-second debounce gaps at exactly the cutoff, duplicate
event_ids, single-event users — never arise. Rebuild a tmp sf_dir
with crafted events and re-run the Spark-vs-DuckDB comparison for the
event-analytics operators whose semantics stay deterministic under
these inputs (orderings are on (ts, event_id), kept unique)."""

from __future__ import annotations

import math
import shutil
from datetime import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreducecore_spark.queries import REGISTRY, _load_all

_load_all()


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


# (event_id, ts, user_id, event_type, value, props)
_EVENTS = [
    # user 1: session-gap boundary. 30-min rule is STRICTLY > 1800 s.
    (1, _ts("2026-01-01 00:00:00"), 1, "click", 1.0, "{}"),
    (2, _ts("2026-01-01 00:30:00"), 1, "click", 1.0, "{}"),  # gap = 1800 -> same session
    (3, _ts("2026-01-01 01:00:01"), 1, "click", 1.0, "{}"),  # gap = 1801 -> new session
    # user 2: debounce cutoff is STRICTLY > 3600000000 us per (user, type).
    (10, _ts("2026-01-02 10:00:00"), 2, "view", 1.0, "{}"),
    (11, _ts("2026-01-02 10:00:00.500000"), 2, "view", 1.0, "{}"),  # 0.5 s -> dropped
    (12, _ts("2026-01-02 11:00:00.500000"), 2, "view", 1.0, "{}"),  # exactly 3600 s -> dropped
    (13, _ts("2026-01-02 12:00:00.500001"), 2, "view", 1.0, "{}"),  # 3600.000001 s -> kept
    (14, _ts("2026-01-02 10:30:00"), 2, "click", 2.0, "{}"),  # other type, independent
    # user 3: single event (lag NULL branch everywhere).
    (20, _ts("2026-01-03 09:00:00"), 3, "purchase", 9.5, "{}"),
    # duplicate event_id at distinct ts (re-delivery): dedup keeps MIN ts.
    (999, _ts("2026-01-04 08:00:00"), 4, "click", 1.0, "{}"),
    (999, _ts("2026-01-04 08:00:01"), 4, "click", 1.0, "{}"),
]

_OPS = [
    "events_sessionize_batch",
    "dq_anomaly_zscore",
    "dq_mad_outliers",
    "events_debounce",
    "events_dedup",
    "events_scd2_intervals",
]


@pytest.fixture(scope="module")
def crafted_ev_dir(sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("crafted_ev")
    for name in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        shutil.copy(f"{sf_dir}/{name}.parquet", root / f"{name}.parquet")
    tbl = pa.table(
        {
            "event_id": pa.array([e[0] for e in _EVENTS], pa.int64()),
            "ts": pa.array([e[1] for e in _EVENTS], pa.timestamp("us")),
            "user_id": pa.array([e[2] for e in _EVENTS], pa.int64()),
            "event_type": pa.array([e[3] for e in _EVENTS], pa.string()),
            "value": pa.array([e[4] for e in _EVENTS], pa.float64()),
            "props": pa.array([e[5] for e in _EVENTS], pa.string()),
        }
    )
    pq.write_table(tbl, root / "events.parquet")
    return str(root)


@pytest.fixture(scope="module")
def crafted_ev_duck(crafted_ev_dir):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{crafted_ev_dir}/{name}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(round(v, 9)))
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", _OPS)
def test_crafted_events_parity(name, spark, crafted_ev_dir, crafted_ev_duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, crafted_ev_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = crafted_ev_duck.sql(spec.oracle)
    duck_rows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = _normalize(spark_rows, sdf.columns)
    nd = _normalize(duck_rows, rel.columns)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"


def test_crafted_session_boundary(spark, crafted_ev_dir):
    """Gap of exactly 1800 s does NOT split; 1801 s does."""
    rows = {
        r["user_id"]: r
        for r in REGISTRY["events_sessionize_batch"].fn(spark, crafted_ev_dir).collect()
    }
    assert (rows[1]["n_sessions"], rows[1]["n_events"]) == (2, 3)
    assert (rows[3]["n_sessions"], rows[3]["n_events"]) == (1, 1)


def test_crafted_debounce_cutoff(spark, crafted_ev_dir):
    """Gap of exactly 3600 s is dropped; 3600.000001 s is kept; the
    other event_type debounces independently."""
    kept = {
        r["event_id"]
        for r in REGISTRY["events_debounce"].fn(spark, crafted_ev_dir).collect()
        if r["user_id"] == 2
    }
    assert kept == {10, 13, 14}


def test_crafted_dedup_redelivery(spark, crafted_ev_dir):
    rows = {
        r["event_id"]: r
        for r in REGISTRY["events_dedup"].fn(spark, crafted_ev_dir).collect()
    }
    assert rows[999]["n_copies"] == 2
    assert rows[999]["first_ts"] == "2026-01-04 08:00:00"
