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

# The round-7 window composition (VERDICT r6 #2): 8 flagship/streaming
# keepers + the 7 queries reworked after their last green driver row
# (r6 reworks: tfidf/semdedup/ngram-jaccard/components/weighted-sample;
# r7 value-changing reworks: semdedup sampled training, candidate-recall
# sampled truth, basket packed-key exchange) + 35 staleness refreshes
# whose newest green row dated to r1/r2.
ROUND7_REQUIRED = {
    # keepers
    "dedup_minhash_lsh",
    "dedup_neardup_keeper",
    "ann_lsh_bucketed",
    "dedup_exact",
    "ann_cosine_topk",
    "stream_live_tumbling_counts",
    "stream_live_append_watermark",
    "stream_live_foreachbatch_sink",
    # reworked after their last green row — must re-attest
    "tfidf_top_terms",
    "semdedup_prune",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "sample_weighted_by_source",
    "dedup_candidate_recall",
    "basket_part_pairs",
}


def test_priority_names_all_registered():
    _load_all()
    unknown = [n for n in _PRIORITY if n not in REGISTRY]
    assert not unknown, f"_PRIORITY names not in REGISTRY: {unknown}"


def test_priority_has_no_duplicates():
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_round7_window_membership():
    window = set(list(all_queries())[:WINDOW])
    missing = ROUND7_REQUIRED - window
    assert not missing, f"declared round-7 entries fell out of the window: {missing}"


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
