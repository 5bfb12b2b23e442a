"""Scaling-slope spot bench (VERDICT r1 item 8): run the heavy-tail
queries at sf0.1 and at the 10x generated copy (_scaledata/sf1, see
tools/gen_scaledata.py), print per-query times and the 10x/1x ratio.
A ratio near 10 is linear; super-linear ratios flag an operator whose
plan won't survive a 100x scale-up.

Usage: python tools/scale_bench.py [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SMALL = "/root/testdata/sf0.1"
BIG = "/root/repo/_scaledata/sf1"

HEAVY = [
    "dedup_neardup_keeper",
    "dedup_connected_components",
    "basket_part_pairs",
    "tfidf_top_terms",
    "dedup_minhash_lsh",
    "ann_lsh_bucketed",
    "q1_pricing_summary",
    "q5_nation_revenue",
]


def main() -> None:
    names = sys.argv[1:] or HEAVY
    from mapreducecore_spark.queries import REGISTRY, _load_all
    from mapreducecore_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="scale-bench", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf: str) -> float:
        fn = REGISTRY[name].fn
        t0 = time.time()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # Warm JVM + both catalogs + Python worker pools.
    run("q1_pricing_summary", SMALL)
    run("q1_pricing_summary", BIG)

    out = {}
    for name in names:
        t_small = min(run(name, SMALL), run(name, SMALL))
        t_big = min(run(name, BIG), run(name, BIG))
        ratio = round(t_big / t_small, 2) if t_small > 0 else None
        out[name] = {
            "sf0.1_sec": round(t_small, 2),
            "sf1_sec": round(t_big, 2),
            "ratio_10x": ratio,
        }
        print(f"{name:32s} {t_small:6.2f}s -> {t_big:7.2f}s  ratio {ratio}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
