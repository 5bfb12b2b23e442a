"""One-off evidence run (VERDICT r6 #4): show that the hash-sampled
candidate-recall estimate agrees with the full-corpus recall at 100x.

The round-7 dedup_candidate_recall grades the MinHash-LSH generator on
a deterministic md5(text) half-sample; this script computes BOTH the
sampled metric (the shipped operator) and the full-corpus metric (the
pre-round-7 composition: full exact-Jaccard truth x full LSH candidate
set) on the same corpus and prints them side by side. Recorded once in
BASELINE.md; not part of the registry (the full form is exactly the
cost the rework removes).

Usage: python tools/recall_agreement.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/_scaledata/sf100_clusters"


def main() -> None:
    from pyspark.sql import functions as F

    from mapreducecore_spark.queries import REGISTRY, _load_all
    from mapreducecore_spark.queries._util import materialize
    from mapreducecore_spark.queries.llm import (
        _jaccard_truth_pairs,
        _minhash_band_pairs,
        _TOKS,
    )
    from mapreducecore_spark.catalog import load_tables
    from mapreducecore_spark.queries._util import spread
    from mapreducecore_spark.session import get_spark

    _load_all()
    spark = get_spark(app_name="recall-agreement", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    sampled = REGISTRY["dedup_candidate_recall"].fn(spark, SF).collect()[0]
    t_sampled = time.time() - t0

    t = load_tables(spark, SF)
    docs = spread(t["documents"])
    t0 = time.time()
    truth = materialize(_jaccard_truth_pairs(docs).select("doc_a", "doc_b"))
    cand = materialize(
        _minhash_band_pairs(docs.selectExpr("doc_id", f"{_TOKS} AS toks")).select(
            "doc_a", "doc_b"
        )
    )
    hit = truth.join(cand, ["doc_a", "doc_b"], "left_semi")
    n_truth = truth.count()
    n_hit = hit.count()
    t_full = time.time() - t0

    print(
        json.dumps(
            {
                "sf_dir": SF,
                "sampled": {
                    "n_truth": sampled["n_truth"],
                    "n_candidates": sampled["n_candidates"],
                    "n_hit": sampled["n_hit"],
                    "recall": sampled["recall"],
                    "sec": round(t_sampled, 1),
                },
                "full": {
                    "n_truth": n_truth,
                    "n_hit": n_hit,
                    "recall": round(n_hit / max(n_truth, 1), 6),
                    "sec": round(t_full, 1),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
