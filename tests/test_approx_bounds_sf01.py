"""Error-bound checks for the rows-only approximate operators at
BENCH scale (sf0.1), per VERDICT r3 #10: the four entries with no
value-oracle by nature (agg_approx_count_distinct,
agg_approx_percentile, sample_stratified, agg_hll_sketch_merge) are
asserted against their exact counterparts on the corpus the driver
benches — ~10x the data the default unit-test bounds see, where a
sketch whose error grows with cardinality would show it.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest

from pyspark.sql import functions as F

from mapreducecore_spark.queries import REGISTRY, _load_all

_load_all()

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF01), reason=f"bench-scale dir {SF01} not present"
)


def test_approx_count_distinct_bound_sf01(spark):
    approx = {
        r["l_returnflag"]: r["approx_n_part"]
        for r in REGISTRY["agg_approx_count_distinct"].fn(spark, SF01).collect()
    }
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] < 0.05, (k, approx[k], exact[k])


def test_approx_percentile_bound_sf01(spark):
    approx = {
        r["o_orderstatus"]: [r["p25"], r["p50"], r["p75"]]
        for r in REGISTRY["agg_approx_percentile"].fn(spark, SF01).collect()
    }
    od = spark.read.parquet(f"{SF01}/orders.parquet")
    exact = {
        r["o_orderstatus"]: (r["pcts"], r["lo"], r["hi"])
        for r in od.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))").alias("pcts"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .collect()
    }
    for k, (ex, lo, hi) in exact.items():
        span = float(hi) - float(lo)
        for a, e in zip(approx[k], ex):
            assert abs(float(a) - float(e)) <= 0.01 * span, (k, a, e)
        assert list(approx[k]) == sorted(approx[k])


def test_hll_sketch_merge_bound_sf01(spark):
    rows = {
        r["scope"]: r["approx_custkeys"]
        for r in REGISTRY["agg_hll_sketch_merge"].fn(spark, SF01).collect()
    }
    exact_all = (
        spark.read.parquet(f"{SF01}/orders.parquet")
        .select("o_custkey")
        .distinct()
        .count()
    )
    # lgConfigK=14 -> rse ~0.8%; 3-sigma bound with slack.
    assert abs(rows["ALL"] - exact_all) / exact_all < 0.03
    assert rows["ALL"] >= max(v for k, v in rows.items() if k != "ALL")


def test_sample_stratified_bound_sf01(spark):
    got1 = REGISTRY["sample_stratified"].fn(spark, SF01).collect()
    got2 = REGISTRY["sample_stratified"].fn(spark, SF01).collect()
    assert sorted(map(tuple, got1)) == sorted(map(tuple, got2))
    totals = {
        r["o_orderstatus"]: r["n"]
        for r in spark.read.parquet(f"{SF01}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    targets = {"F": 0.1, "O": 0.05, "P": 0.5}
    counts = Counter(r["o_orderstatus"] for r in got1)
    for k, frac in targets.items():
        if totals.get(k, 0) >= 2000:  # tighter bound at 10x the mass
            rate = counts[k] / totals[k]
            assert abs(rate - frac) < max(0.25 * frac, 0.01), (k, rate, frac)
