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

# The round-6 window composition (VERDICT r5 #1): 8 flagship/streaming
# keepers + the reshaped approx-percentile + the 30 never-attested
# entries + multimodal_decode (output changed: PNG) + 10 re-certs of
# the minhash/incremental-dedup family.
ROUND6_REQUIRED = {
    # keepers
    "dedup_minhash_lsh",
    "dedup_neardup_keeper",
    "ann_lsh_bucketed",
    "dedup_exact",
    "ann_cosine_topk",
    "stream_live_tumbling_counts",
    "stream_live_append_watermark",
    "stream_live_foreachbatch_sink",
    # reshaped this round
    "agg_approx_percentile",
    "scalar_array_funcs2",
    "scalar_array_funcs3",
    "embedding_quantize_int8",
    "multimodal_decode",
    "multimodal_binary_dedup",
    # the never-attested tail (30, minus the 3 already above)
    "stream_live_dedup_within_watermark",
    "quality_repetition_ratio",
    "token_length_histogram",
    "source_quality_profile",
    "embedding_centroid_per_label",
    "basket_part_pairs",
    "rolling_7d_distinct_users",
    "kmeans_assign_seeded",
    "layout_zorder_sort",
    "bigram_lm_counts",
    "decontam_neardup_minhash",
    "mixture_sample_token_budget",
    "scalar_string_funcs2",
    "scalar_date_funcs2",
    "scalar_bitwise_hash",
    "scalar_struct_to_json",
    "scalar_timestamp_diff",
    "scalar_binary_funcs",
    "scalar_date_funcs3",
    "scalar_math_funcs2",
    "orderby_nulls_first",
    "unpivot_part_measures",
    "incremental_daily_rollup",
    "graph_pagerank_step",
    "table_diff_rowhash",
    "ann_cosine_quantized",
    "json_dead_letter_split",
}


def test_priority_names_all_registered():
    _load_all()
    unknown = [n for n in _PRIORITY if n not in REGISTRY]
    assert not unknown, f"_PRIORITY names not in REGISTRY: {unknown}"


def test_priority_has_no_duplicates():
    assert len(_PRIORITY) == len(set(_PRIORITY))


def test_round6_window_membership():
    window = set(list(all_queries())[:WINDOW])
    missing = ROUND6_REQUIRED - window
    assert not missing, f"declared round-6 entries fell out of the window: {missing}"


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
