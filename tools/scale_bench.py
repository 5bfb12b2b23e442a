"""Scaling-slope spot bench (VERDICT r2 items 1/2/4): run the heavy-tail
queries at sf0.1 and at a generated scaled copy (tools/gen_scaledata.py),
print per-query times, the big/small ratio, and MEASURED shuffle volume
(total + peak single stage) from Spark's stage REST API — so scale
claims ride on shuffle bytes, not wall-time alone.

A ratio near the data factor is linear; super-linear ratios flag an
operator whose plan won't survive a further scale-up. The scaled
documents table plants a 30-docs-per-copy exact-dup cluster (3000 docs
at 100x) — the degenerate-bucket case the MinHash/SimHash star-edge
guards bound.

Usage:
  python tools/scale_bench.py [--big DIR] [--factor N] [query ...]
  # 10x:  python tools/scale_bench.py
  # 100x: python tools/scale_bench.py --big /root/repo/_scaledata/sf10 --factor 100
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from mapreducecore_spark import metrics  # noqa: E402

SMALL = "/root/testdata/sf0.1"
UI_PORT = metrics.DEFAULT_UI_PORT

HEAVY = [
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "dedup_neardup_keeper",
    "dedup_ngram_jaccard",
    "dedup_lsh_verified_pairs",
    "simhash_neardup_pairs",
    "ann_lsh_bucketed",
    "ann_ivf_trained",
    "corpus_curation_pipeline",
    "basket_part_pairs",
    "tfidf_top_terms",
    "q1_pricing_summary",
    "q5_nation_revenue",
    # Round-3 part-3 curation operators.
    "semdedup_prune",
    "dedup_substring_spans",
    "quality_classifier_hashed",
    "domain_cap_documents",
    "minhash_estimate_accuracy",
    # Round-4 additions: kept-set domain cap (WindowGroupLimit path),
    # newline line dedup, linearized entropy.
    "domain_cap_kept",
    "dedup_lines_newline",
    # Round-5 additions: persisted band index, incremental-vs-index,
    # survivor-trained DSIR pipeline, per-batch ingest composition.
    "dedup_band_index_build",
    "dedup_incremental_persisted",
    "corpus_curation_pipeline_v3",
    "corpus_ingest_incremental",
    "ann_pq_topk",
    "ann_pq_trained",
    "classifier_lr_train",
    "dedup_lines_ccnet",
    "quality_token_entropy",
]


def main() -> None:
    args = sys.argv[1:]
    big = "/root/repo/_scaledata/sf1"
    factor = 10.0
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--big":
            big = args[i + 1]
            i += 2
        elif args[i] == "--factor":
            factor = float(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    names = names or HEAVY

    from mapreducecore_spark.queries import REGISTRY, _load_all
    from mapreducecore_spark.session import get_spark

    _load_all()
    spark = get_spark(
        app_name="scale-bench",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    def run(name: str, sf: str) -> tuple[float, int, int]:
        """(seconds, total shuffle-write bytes, peak single-stage bytes)."""
        fn = REGISTRY[name].fn
        before_max, _ = metrics.snapshot(app_id)
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        total, peak = metrics.delta(app_id, before_max)
        return dt, total, peak

    # Warm JVM + both catalogs + Python worker pools.
    run("q1_pricing_summary", SMALL)
    run("q1_pricing_summary", big)

    out = {}
    for name in names:
        t_small = min(run(name, SMALL)[0], run(name, SMALL)[0])
        t_big, shuf, peak = run(name, big)
        t_big = min(t_big, run(name, big)[0])
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        # Per-decade slope: linear scaling is 10x per decade of data, so
        # a factor-100 run has two decades -> slope = sqrt(ratio).
        per_decade = (
            round(ratio ** (1.0 / math.log10(factor)), 2)
            if ratio is not None and factor > 1
            else ratio
        )
        out[name] = {
            "small_sec": round(t_small, 2),
            "big_sec": round(t_big, 2),
            f"ratio_{int(factor)}x": ratio,
            "ratio_per_decade": per_decade,
            "shuffle_mb": round(shuf / 1e6, 1),
            "peak_stage_shuffle_mb": round(peak / 1e6, 1),
        }
        print(
            f"{name:32s} {t_small:6.2f}s -> {t_big:7.2f}s  ratio {ratio}"
            f"  (per-decade {per_decade})  shuffle {shuf / 1e6:.1f} MB"
            f"  peak-stage {peak / 1e6:.1f} MB"
        )
    print(json.dumps({"big_dir": big, "factor": factor, "queries": out}))


if __name__ == "__main__":
    main()
