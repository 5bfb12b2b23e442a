"""Batch-size sensitivity for incremental MinHash dedup (VERDICT r4
#9): the operator's whole claim is that a per-ingest run costs
O(batch), not O(corpus). Measured directly: build the band index ONCE
over a fixed old corpus (odd doc_ids), then time ONLY the incremental
stage (_incremental_vs_index: new-batch signatures + touched-bucket
semi-join + guarded pair join) for nested new batches of ~0.5%, ~5%
and ~50% of the corpus. If cost tracked corpus size the three rows
would be flat; tracking batch size they should spread ~10x each step
(modulo the fixed index-scan floor).

Usage: python tools/incr_batch_sweep.py [sf_dir] [big_dir]
Runs at sf0.1 by default; pass _scaledata/sf10 as big_dir to also
show the same batch fraction costing ~corpus-proportionally MORE only
because the batch itself grew. Run solo (shuffle metrics ride the UI
REST API like tools/scale_bench.py).
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from mapreducecore_spark import metrics  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
BIG = sys.argv[2] if len(sys.argv) > 2 else None

# (label, modulus over even doc_ids): new batch = doc_id % mod == 0,
# nested subsets of the even half so the odd-id index never changes.
BATCHES = [("0.5pct", 200), ("5pct", 20), ("50pct", 2)]


def main() -> None:
    from pyspark.sql import functions as F

    from mapreducecore_spark.catalog import load_tables
    from mapreducecore_spark.queries._util import spread
    from mapreducecore_spark.queries.llm import (
        _TOKS,
        _band_signatures,
        _incremental_vs_index,
    )
    from mapreducecore_spark.session import get_spark

    spark = get_spark(
        app_name="incr-batch-sweep",
        master="local[32]",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(metrics.DEFAULT_UI_PORT),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    out = {}

    for sf_dir in filter(None, [SF, BIG]):
        docs = spread(load_tables(spark, sf_dir)["documents"])
        n_docs = docs.count()
        with tempfile.TemporaryDirectory(prefix="mrc_incr_sweep_") as tmp:
            # Fixed index over the odd half — built once, off the clock.
            _band_signatures(
                docs.filter(F.col("doc_id") % 2 != 0).selectExpr(
                    "doc_id", f"{_TOKS} AS toks"
                )
            ).write.parquet(f"{tmp}/idx")
            idx = spark.read.parquet(f"{tmp}/idx")
            rows = {}
            for label, mod in BATCHES:
                new_docs = docs.filter(F.col("doc_id") % mod == 0).selectExpr(
                    "doc_id", f"{_TOKS} AS toks"
                )
                n_new = new_docs.count()
                before_max, _ = metrics.snapshot(app_id)
                t0 = time.time()
                _incremental_vs_index(idx, new_docs).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                shuf, peak = metrics.delta(app_id, before_max)
                rows[label] = {
                    "batch_docs": n_new,
                    "batch_frac": round(n_new / n_docs, 4),
                    "sec": round(dt, 2),
                    "shuffle_mb": round(shuf / 1e6, 1),
                    "peak_stage_shuffle_mb": round(peak / 1e6, 1),
                }
                print(
                    f"{sf_dir} {label:7s} batch={n_new:8d} ({n_new / n_docs:6.2%})"
                    f"  {dt:7.2f}s  shuffle {shuf / 1e6:.1f} MB"
                )
            out[sf_dir] = {"n_docs": n_docs, "batches": rows}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
