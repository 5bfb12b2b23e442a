"""Guards on the driver-verification window.

The external driver verifies only the FIRST ~50 entries of queries()
dict order each round, so `_PRIORITY` in queries/__init__.py is the
attestation budget. Round 5 declared 56 names for 50 slots and the
last 6 were silently never verified (VERDICT r5 'What's wrong' #2) —
these tests make any future overflow or shape hazard a loud failure
instead.
"""

from __future__ import annotations

import pytest

from mapreducecore_spark.queries import REGISTRY, _PRIORITY, _load_all, all_queries

WINDOW = 50

# The round-10 window composition (VERDICT r9 #5): 8 flagship/streaming
# keepers + the 5 queries whose shared minhash pipeline code changed
# this round (staged sides + the base-join restructure in
# _minhash_member_rows touch every _emit_bucket_pairs consumer) + 37
# of the 39 r4-stale entries (full list and the two documented
# deferrals pinned in queries/__init__.py).
ROUND10_REQUIRED = {
    # keepers
    "dedup_minhash_lsh",
    "dedup_neardup_keeper",
    "ann_lsh_bucketed",
    "dedup_exact",
    "ann_cosine_topk",
    "stream_live_tumbling_counts",
    "stream_live_append_watermark",
    "stream_live_foreachbatch_sink",
    # shared-pipeline rework — must re-attest on the shipped code
    "dedup_lsh_verified_pairs",
    "minhash_estimate_accuracy",
    "dedup_candidate_recall",
    "dedup_connected_components",
    "dedup_savings_report",
    # representative r4-stale refreshes (full set in queries/__init__.py)
    "q8_market_share",
    "scalar_try_cast",
    "stream_live_tws_distinct_types",
    "dq_column_profile",
    "table_merge_upsert",
}


def test_priority_names_all_registered():
    _load_all()
    unknown = [n for n in _PRIORITY if n not in REGISTRY]
    assert not unknown, f"_PRIORITY names not in REGISTRY: {unknown}"


def test_priority_has_no_duplicates():
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_round10_window_membership():
    window = set(list(all_queries())[:WINDOW])
    missing = ROUND10_REQUIRED - window
    assert not missing, f"declared round-10 entries fell out of the window: {missing}"


@pytest.mark.parametrize("sf_dir_fixture", ["sf_dir"])
def test_window_outputs_are_scalar_only(spark, sf_dir, sf_dir_fixture):
    """Every non-streaming window entry must emit only scalar columns:
    the driver's rows-only canonicalizer sorts every column with
    pandas, which raises `unhashable type: numpy.ndarray` on array
    cells (the exact crash CORRECTNESS_r05 recorded for
    agg_approx_percentile)."""
    _load_all()
    window = list(all_queries().items())[:WINDOW]
    offenders = []
    for name, fn in window:
        if name.startswith("stream_live"):
            continue  # drains are slow; their schemas are flat by design
        df = fn(spark, sf_dir)
        for f in df.schema.fields:
            s = f.dataType.simpleString()
            if any(t in s for t in ("array", "map", "struct")):
                offenders.append(f"{name}.{f.name}: {s}")
    assert not offenders, offenders
