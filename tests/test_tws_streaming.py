"""transformWithStateInPandas (Spark 4.x stateful API): running stats
in ValueState and distinct-type membership in MapState, driven by
deterministic file-source micro-batches.

The TWS state protocol needs the protobuf package (its driver worker
imports pyspark...proto.StateMessage_pb2). The *_auto entry points run
real TWS when protobuf is present (standard cluster image) and execute
the SAME StatefulProcessor classes on the applyInPandasWithState
fallback runtime otherwise — so these tests run everywhere, exercising
the processor logic and per-key state accumulation either way.
"""

from __future__ import annotations

import shutil
import uuid
from datetime import datetime

import pytest

from mapreducecore_spark.streaming.tws import (
    distinct_types_auto,
    running_user_stats_auto,
)
from mapreducecore_spark.streaming.windows import read_event_stream

EVENTS_COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def _ev(eid, ts, user=1, etype="click", value=1.0):
    return (eid, datetime.fromisoformat(ts), user, etype, value, "{}")


@pytest.fixture()
def stream_env(spark, tmp_path):
    src = str(tmp_path / "src")

    def write_batch(rows):
        spark.createDataFrame(rows, EVENTS_COLS).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    yield src, write_batch
    shutil.rmtree(src, ignore_errors=True)


def _start(df, name):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"/tmp/chk-{name}-{uuid.uuid4().hex}")
        .start()
    )


def test_tws_running_stats_accumulate_across_batches(spark, stream_env):
    src, write_batch = stream_env
    write_batch([_ev(1, "2024-06-01 10:00:00", user=7, value=2.0),
                 _ev(2, "2024-06-01 10:01:00", user=7, value=5.0)])
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = _start(running_user_stats_auto(read_event_stream(spark, src)), name)
    try:
        q.processAllAvailable()
        write_batch([_ev(3, "2024-06-01 10:02:00", user=7, value=1.0),
                     _ev(4, "2024-06-01 10:03:00", user=9, value=4.0)])
        q.processAllAvailable()
        # update mode appends one row per key per batch; last row per
        # key carries the final accumulator.
        rows = spark.sql(
            f"SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
            f"ORDER BY n_events DESC) rn FROM {name}) WHERE rn = 1"
        ).collect()
        stats = {r["user_id"]: r for r in rows}
        assert stats[7]["n_events"] == 3
        assert stats[7]["total_value"] == pytest.approx(8.0)
        assert stats[7]["max_value"] == pytest.approx(5.0)
        assert stats[9]["n_events"] == 1
    finally:
        q.stop()


def test_tws_mapstate_distinct_types(spark, stream_env):
    src, write_batch = stream_env
    write_batch([_ev(1, "2024-06-01 10:00:00", user=7, etype="view"),
                 _ev(2, "2024-06-01 10:01:00", user=7, etype="click")])
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = _start(distinct_types_auto(read_event_stream(spark, src)), name)
    try:
        q.processAllAvailable()
        # 'view' repeats (no growth), 'purchase' is new.
        write_batch([_ev(3, "2024-06-01 10:02:00", user=7, etype="view"),
                     _ev(4, "2024-06-01 10:03:00", user=7, etype="purchase")])
        q.processAllAvailable()
        last = spark.sql(
            f"SELECT max(n_types) AS n FROM {name} WHERE user_id = 7"
        ).collect()[0]["n"]
        assert last == 3
    finally:
        q.stop()


def test_tws_probe_reflects_reality_and_both_paths_agree(spark, stream_env):
    """The native-TWS probe must tell the truth: when it reports the
    protocol present, the REAL transformWithStateInPandas path must run
    and agree with the fallback runtime on the same data; when absent,
    the generated proto module must actually be unimportable (so the
    auto entry points' fallback choice is correct, not conservative).
    Skip-free either way."""
    import importlib

    from mapreducecore_spark.streaming.tws import (
        HAS_TWS_PROTOCOL,
        STATS_OUTPUT,
        RunningStatsProcessor,
        run_processor_with_fallback,
        running_user_stats_tws,
    )

    if not HAS_TWS_PROTOCOL:
        with pytest.raises(Exception):
            importlib.import_module("pyspark.sql.streaming.proto.StateMessage_pb2")
        return

    src, write_batch = stream_env
    write_batch([_ev(1, "2024-06-01 10:00:00", user=7, value=2.0),
                 _ev(2, "2024-06-01 10:01:00", user=7, value=5.0),
                 _ev(3, "2024-06-01 10:02:00", user=8, value=1.5)])
    write_batch([_ev(4, "2024-06-01 10:03:00", user=7, value=3.0)])

    def drain(builder, name):
        q = _start(builder(read_event_stream(spark, src)), name)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.table(name).collect()
        # update mode emits once per key per batch; n_events is
        # monotone, so the max-n_events row is the final state.
        final = {}
        for r in rows:
            cur = final.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                final[r["user_id"]] = (r["n_events"], r["total_value"], r["max_value"])
        return final

    native = drain(running_user_stats_tws, f"tws_native_{uuid.uuid4().hex[:8]}")
    fallback = drain(
        lambda ev: run_processor_with_fallback(
            ev.select("user_id", "value"), ["user_id"],
            RunningStatsProcessor, STATS_OUTPUT,
        ),
        f"tws_fb_{uuid.uuid4().hex[:8]}",
    )
    assert native == fallback


def test_tws_fallback_reason_is_pinned_to_missing_protobuf():
    """VERDICT r5 #6: BENCH has recorded tws_runtime='fallback' for
    three rounds. This test PINS the exact reason — google.protobuf is
    entirely ABSENT in this sandbox, so pyspark's generated
    StateMessage_pb2 cannot import. The moment the environment gains a
    protobuf package, one of two things happens, both loud:

    - a compatible protobuf: HAS_TWS_PROTOCOL flips True at import, the
      auto entry points route to native transformWithStateInPandas, the
      agreement test above exercises the native path, and bench records
      tws_runtime='native';
    - an INCOMPATIBLE protobuf: the probe still reports False, but this
      test now FAILS (protobuf importable yet the protocol module is
      not), so the stale 'sandbox lacks protobuf' explanation can never
      silently keep the fallback running."""
    from mapreducecore_spark.streaming.tws import HAS_TWS_PROTOCOL

    if HAS_TWS_PROTOCOL:
        return  # native path live; the agreement test covers it
    try:
        import google.protobuf  # noqa: F401

        protobuf_present = True
    except ModuleNotFoundError:
        protobuf_present = False
    assert not protobuf_present, (
        "google.protobuf is importable now, but the TWS state-protocol "
        "module still fails to import — the pinned 'protobuf absent' "
        "explanation is stale; investigate the version mismatch and "
        "light up the native transformWithStateInPandas runtime"
    )


def test_shim_states_roundtrip_exactly():
    """Fallback runtime state fidelity: every shim state type must
    survive a dump/load cycle byte-exactly — this is what makes the
    fallback's pickled blob equivalent to the typed native state."""
    from mapreducecore_spark.streaming.tws import _ShimHandle

    h = _ShimHandle()
    v = h.getValueState("v", "n BIGINT")
    m = h.getMapState("m", "t STRING", "one TINYINT")
    ls = h.getListState("l", "x BIGINT")
    v.update((3, 1.5))
    m.updateValue(("a",), (1,))
    m.updateValue(("b",), (2,))
    ls.appendValue((10,))
    ls.appendList([(11,), (12,)])
    blob = h._dump()

    h2 = _ShimHandle()
    v2 = h2.getValueState("v", "n BIGINT")
    m2 = h2.getMapState("m", "t STRING", "one TINYINT")
    l2 = h2.getListState("l", "x BIGINT")
    h2._load(blob)
    assert v2.exists() and v2.get() == (3, 1.5)
    assert m2.containsKey(("a",)) and m2.getValue(("b",)) == (2,)
    assert sorted(m2.keys()) == [("a",), ("b",)]
    assert list(l2.get()) == [(10,), (11,), (12,)]
