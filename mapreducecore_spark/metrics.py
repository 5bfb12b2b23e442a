"""Measured shuffle volume per query via the Spark UI REST API.

Wall-time alone can hide a shuffle explosion behind parallelism; scale
claims should ride on measured shuffle bytes (VERDICT r2 item 9). The
stage endpoint aggregates executor-reported shuffle write per stage, so
the delta between two snapshots bounds exactly the work a query did —
no SparkListener callback plumbing (py4j listeners are fragile across
py4j versions) and no Observation (row metrics, not I/O metrics).

Usage: build the session with spark.ui.enabled=true and a fixed port,
then wrap each run in snapshot()/delta().
"""

from __future__ import annotations

import json
import urllib.request

DEFAULT_UI_PORT = 4049


def _stages(app_id: str, port: int) -> list[dict]:
    url = f"http://localhost:{port}/api/v1/applications/{app_id}/stages"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def snapshot(app_id: str, port: int = DEFAULT_UI_PORT) -> tuple[int, dict[int, int]]:
    """(max stage id seen, {stageId: shuffle-write bytes})."""
    per: dict[int, int] = {}
    max_id = -1
    for s in _stages(app_id, port):
        sid = s.get("stageId", -1)
        max_id = max(max_id, sid)
        per[sid] = int(s.get("shuffleWriteBytes", 0) or 0)
    return max_id, per


def delta(app_id: str, before_max_stage: int, port: int = DEFAULT_UI_PORT) -> tuple[int, int]:
    """(total shuffle-write bytes, peak single-stage bytes) across all
    stages newer than `before_max_stage`."""
    _, per = snapshot(app_id, port)
    new = {sid: b for sid, b in per.items() if sid > before_max_stage}
    # RETENTION GUARD (ADVICE r11): bench.py bounds UI stage retention
    # (400) for driver-GC stability; a query spawning a stage count
    # near that window would silently age its own earliest stages out
    # of the REST view and under-report shuffle bytes. Warn loudly at
    # half the window so the sample is flagged instead of quietly low.
    if len(new) > 200:
        import sys

        print(
            f"metrics: WARNING query produced {len(new)} retained stages — "
            "approaching bench.py's retainedStages=400 window; "
            "shuffle-byte sample may be truncated",
            file=sys.stderr,
        )
    return sum(new.values()), max(new.values(), default=0)
