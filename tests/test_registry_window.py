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

# The round-12 window composition (VERDICT r11 #6): 5 flagship keepers
# + all 15 stream_live entries (every drain consumer is touched by this
# round's state-width/checkpoint/re-lay changes and must re-attest on
# the shipped code) + all 30 remaining r4/r5-stale entries (full list
# and the staleness derivation pinned in queries/__init__.py).
ROUND12_REQUIRED = {
    # keepers
    "dedup_minhash_lsh",
    "dedup_neardup_keeper",
    "ann_lsh_bucketed",
    "dedup_exact",
    "ann_cosine_topk",
    # touched streaming — must re-attest on the shipped code
    "stream_live_incremental_dedup_wm",
    "stream_live_cdc_merge",
    "stream_live_interval_join",
    "stream_live_tws_distinct_types",
    "stream_live_foreachbatch_sink",
    # representative r4/r5-stale refreshes (full set in queries/__init__.py)
    "dedup_exact_normalized",
    "doc_fingerprint",
    "ann_pq_trained",
    "classifier_lr_train",
    "corpus_curation_pipeline_v2",
    "events_weekly_cohort_retention",
    "subquery_correlated_avg",
}


def test_priority_names_all_registered():
    _load_all()
    unknown = [n for n in _PRIORITY if n not in REGISTRY]
    assert not unknown, f"_PRIORITY names not in REGISTRY: {unknown}"


def test_priority_has_no_duplicates():
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_round12_window_membership():
    window = set(list(all_queries())[:WINDOW])
    missing = ROUND12_REQUIRED - window
    assert not missing, f"declared round-12 entries fell out of the window: {missing}"


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
