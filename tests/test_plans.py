"""Physical-plan quality gates — the 100 TB stance, asserted.

Correctness tests prove the answers match; these prove the *plans* are
the ones that survive a 1000-executor scale-up: filters pushed into the
parquet scan, columns pruned, dimension joins broadcast, aggregates
partial-aggregated map-side, codegen covering the hot path.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from mapreducecore_spark.queries import REGISTRY, _load_all

_load_all()


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # Column pruning: untouched wide columns must not be read.
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_comment"):
        assert col not in read_schema, f"unpruned column {col} in scan: {read_schema}"
    # Codegen spans are only visible in codegen mode under AQE.
    assert "WholeStageCodegen subtrees" in plan_of(df, "codegen")


def test_q1_partial_aggregation(spark, sf_dir):
    plan = plan_of(REGISTRY["q1_pricing_summary"].fn(spark, sf_dir))
    # Catalyst inserts partial + final hash aggregates around the
    # exchange (the map-side combine the reference lacks, SURVEY §4.2).
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_q5_broadcasts_dimensions(spark, sf_dir):
    plan = plan_of(REGISTRY["q5_nation_revenue"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    # nation+region+supplier broadcast -> at least 3 broadcast joins.
    assert plan.count("BroadcastHashJoin") >= 3


def test_scan_filter_pushdown_predicates(spark, sf_dir):
    plan = plan_of(REGISTRY["scan_filter_predicates"].fn(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "In(c_nationkey" in plan
    assert "GreaterThanOrEqual(c_acctbal" in plan


def test_wordcount_partial_aggregates(spark, sf_dir):
    plan = plan_of(REGISTRY["wordcount_documents"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, (
        "wordcount must partial-aggregate map-side (vs reference's "
        "one-line-per-occurrence shuffle, mr_tasks.h:46)"
    )


def test_topk_is_take_ordered_or_windowed_limit(spark, sf_dir):
    plan = plan_of(REGISTRY["orderby_limit_multikey"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, (
        "global ORDER BY + LIMIT must not global-sort; expected "
        f"TakeOrderedAndProject in:\n{plan}"
    )


def test_ann_topk_broadcasts_queries(spark, sf_dir):
    plan = plan_of(REGISTRY["ann_cosine_topk"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


@pytest.mark.parametrize(
    "name", ["dedup_exact", "join_inner_customer_orders", "events_tumbling_window"]
)
def test_no_cartesian_products(spark, sf_dir, name):
    plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    """merge_asof = union -> ONE exchange -> sort -> window. A second
    exchange would mean the union sides shuffle separately."""
    plan = plan_of(REGISTRY["join_asof_last_order"].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange") == 1, plan
    assert "CartesianProduct" not in plan


def test_sessionize_single_shuffle(spark, sf_dir):
    """Gaps-and-islands: the lag window and the per-user aggregate must
    share one hashpartitioning(user_id) exchange."""
    plan = plan_of(REGISTRY["events_sessionize_batch"].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange") == 1, plan


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Co-located join: two tables bucketed+sorted on the join key join
    with ZERO exchanges — the bucketing-instead-of-shuffle strategy for
    repeated fact-to-fact joins at 100 TB."""
    import uuid

    from mapreducecore_spark.catalog import load_tables

    t = load_tables(spark, sf_dir)
    suffix = uuid.uuid4().hex[:8]
    bo, bl = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    try:
        (
            t["orders"].write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").saveAsTable(bo)
        )
        (
            t["lineitem"].write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").saveAsTable(bl)
        )
        # Force the sort-merge path (at test SF the tables are tiny and
        # would auto-broadcast, hiding the property under test).
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(bo).join(
                spark.table(bl),
                spark.table(bo)["o_orderkey"] == spark.table(bl)["l_orderkey"],
            )
            plan = plan_of(joined, "simple")
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {bo}")
        spark.sql(f"DROP TABLE IF EXISTS {bl}")


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Hive-style partitioned layout: a filter on the partition column
    must prune directories at planning time (PartitionFilters on the
    scan), not read-then-filter — the difference between scanning 1/5th
    and 5/5ths of 100 TB."""
    from mapreducecore_spark.catalog import load_tables
    from mapreducecore_spark.sources.io import write_parquet

    t = load_tables(spark, sf_dir)
    out = str(tmp_path / "orders_by_status")
    write_parquet(t["orders"], out, partition_by=["o_orderstatus"])
    df = spark.read.parquet(out).filter("o_orderstatus = 'F'")
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    assert df.count() > 0


def test_aqe_splits_skewed_join(spark):
    """Runtime skew handling: a 99%-hot key must trigger AQE's skew
    split (SortMergeJoin(skew=true) + AQEShuffleRead skewed) instead of
    one straggler task — the mechanism the reference lacks entirely
    (its reducer dies on hot keys, worker.h:127)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300_000).withColumn(
            "k", F.when(F.col("id") % 100 < 99, 0).otherwise(F.col("id"))
        )
        right = spark.range(0, 5_000).withColumn("k", F.col("id") % 1000)
        j = left.join(right.withColumnRenamed("id", "rid"), "k")
        j.collect()  # AQE finalizes the plan only on this DF's own action
        plan = plan_of(j, "simple")
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE did not split the skewed join:\n{plan}"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_tfidf_df_join_has_no_forced_broadcast(spark, sf_dir):
    # Vocabulary is NOT bounded (Heaps' law — the 1000x clusters sweep
    # grew it ~1000x, and a hard broadcast(df) hint killed the JVM
    # collecting the vocab to the driver). The static plan must NOT
    # carry a broadcast hint on the tf ⋈ df join; AQE upgrades it to
    # broadcast at runtime when df is genuinely small, which the
    # executed adaptive plan demonstrates at this test's scale.
    df = REGISTRY["tfidf_top_terms"].fn(spark, sf_dir)
    # The hint check must read the ANALYZED plan (mode="extended"):
    # hint nodes are erased before the physical plan that
    # explain("formatted") prints, so asserting on the formatted output
    # is vacuous — a reintroduced broadcast(df) would still pass
    # (ADVICE r6). Verified empirically: a forced F.broadcast join
    # shows "ResolvedHint" only in the extended output.
    assert "ResolvedHint" not in plan_of(df, "extended")
    df.collect()  # finalize AQE
    final = plan_of(df, "simple")
    assert "isFinalPlan=true" in final
    assert "BroadcastHashJoin" in final, (
        "AQE should still pick broadcast for the small-scale vocab:\n" + final
    )


def test_decontam_broadcasts_benchmark_shingles(spark, sf_dir):
    plan = plan_of(REGISTRY["decontam_ngram_overlap"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_kmeans_broadcasts_centroids(spark, sf_dir):
    plan = plan_of(REGISTRY["kmeans_assign_seeded"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_fuzzy_match_joins_on_block_key(spark, sf_dir):
    # Blocking must make this an equi-join (hash join on blk); a plan
    # that fell back to CartesianProduct means the blocking key was
    # lost to the optimizer.
    plan = plan_of(REGISTRY["fuzzy_match_blocked"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_basket_pairs_no_cartesian(spark, sf_dir):
    plan = plan_of(REGISTRY["basket_part_pairs"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("name", ["basket_part_pairs", "bigram_lm_counts"])
def test_global_topk_is_take_ordered(spark, sf_dir, name):
    # Global top-N must compile to TakeOrderedAndProject (per-partition
    # heaps merged at the driver), never a single-task global window.
    plan = plan_of(REGISTRY[name].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "RunningWindowFunction" not in plan


def test_sql_broadcast_hint_is_honored(spark, sf_dir):
    plan = plan_of(REGISTRY["join_hint_broadcast_sql"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_gopher_rules_single_scan_no_exchange(spark, sf_dir):
    # Pure per-row rule evaluation: the plan must be a scan + project
    # with NO shuffle — at 100 TB this runs fully map-side.
    plan = plan_of(REGISTRY["quality_gopher_rules"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_boilerplate_partial_aggregates_at_shingle_grain(spark, sf_dir):
    # df-count and per-doc regroup both get map-side partial aggs;
    # nothing in the plan may be a cartesian join.
    plan = plan_of(REGISTRY["boilerplate_ngram_flag"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 4  # partial+final x 2 aggs
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_ivf_trained_broadcasts_codebook_every_iteration(spark, sf_dir):
    """Every Lloyd assignment pass must broadcast the constant-size
    codebook against the embedding scan — a shuffled join here would
    re-exchange the full corpus once per iteration."""
    plan = plan_of(REGISTRY["ann_ivf_trained"].fn(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_minhash_pairs_bucket_collect_no_pair_exchange(spark, sf_dir):
    """dedup_minhash_lsh (round 5): pairs come from the bucket-collect
    + minimal-band-emission pipeline — buckets aggregate on
    (band_id, sig), pair structs are born inside a higher-order
    expression, and NO operator is keyed by the pair: no join on
    doc_a/doc_b, no distinct aggregate over pair columns, no
    cartesian. The only joins are the narrow band-metadata joins."""
    plan = plan_of(REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "band_id" in plan and "sig" in plan
    for line in plan.splitlines():
        if "Join" in line or "HashAggregate" in line:
            assert "doc_a" not in line and "doc_b" not in line, (
                f"pair-keyed operator resurrected:\n{line}"
            )


def test_minhash_star_branch_is_reps_join_not_window(spark, sf_dir):
    """Round-6 star-path shape: oversized buckets obtain their
    representative payload via a shuffle-hash join against the tiny
    reps frame — never a window/sort over the wide member rows (the
    window variant re-sorted shingle-set payloads per giant bucket and
    measured 5.01/decade on the keeper at the 100x replicate sweep)
    and never a collect of the whole bucket into one array row
    (unbounded executor memory). The hint must survive planning: a
    sort-merge join here re-sorts the wide side, which is the exact
    cost the shape exists to avoid."""
    plan = plan_of(REGISTRY["dedup_minhash_lsh"].fn(spark, sf_dir))
    assert "ShuffledHashJoin" in plan, f"reps join lost its shuffle_hash hint:\n{plan[:2000]}"
    assert "Window" not in plan, "a window resurfaced in the pair-generation plan"


def test_jaccard_df_cap_window_precedes_join(spark, sf_dir):
    """The df-cap window keys on `shingle` — the same key the
    inverted-index equi-join uses — and the join is never cartesian."""
    plan = plan_of(REGISTRY["dedup_ngram_jaccard"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "Window" in plan
    assert "Join" in plan
    assert "shingle" in plan


def test_line_dedup_partial_agg_and_equijoin(spark, sf_dir):
    """dedup_lines_ccnet: the line-frequency argmin must partial-agg
    map-side (hot boilerplate lines collapse before the shuffle) and
    the join-back must be an equi-join on the line text — a cartesian
    fallback here would be quadratic in corpus size."""
    plan = plan_of(REGISTRY["dedup_lines_ccnet"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("HashAggregate") >= 2  # partial+final argmin
    assert "line" in plan and "Join" in plan


def test_pii_scrub_single_scan_no_exchange(spark, sf_dir):
    """pii_redact_scrub is a pure per-row string pass: scan + project,
    zero shuffles, and the untouched lang/source columns pruned."""
    plan = plan_of(REGISTRY["pii_redact_scrub"].fn(spark, sf_dir))
    assert "Exchange" not in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "lang" not in read_schema and "source" not in read_schema


def test_token_entropy_single_scan_no_exchange(spark, sf_dir):
    """quality_token_entropy's fold is per-row: no shuffle anywhere."""
    plan = plan_of(REGISTRY["quality_token_entropy"].fn(spark, sf_dir))
    assert "Exchange" not in plan


def test_semdedup_broadcasts_centroids_only(spark, sf_dir):
    """semdedup_prune: the prune is a single centroid_id exchange
    into the vectorized per-cluster kernel (FlatMapGroupsInPandas) —
    never a cartesian, and no pair-keyed join anywhere in the outer
    plan. (The K-centroid assignment cross-join is asserted on the
    unmaterialized assignment subplan below: broadcast nested loop
    over the tiny centroid set, never CartesianProduct.)"""
    plan = plan_of(REGISTRY["semdedup_prune"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "centroid_id" in plan

    # Rebuild the assignment's scored stage sans materialize to see
    # its join and aggregation shape: the n x K explosion must be a
    # broadcast nested loop over the tiny centroid set, and the argmin
    # must partial-aggregate map-side (narrow rows — the row_number
    # variant shuffled embeddings with every scored row and OOM'd the
    # 100x sweep).
    from pyspark.sql import functions as F

    from mapreducecore_spark.catalog import load_tables
    from mapreducecore_spark.queries.curation import _D2_SPARK, _SEM_MIN_K

    t = load_tables(spark, sf_dir)
    e = t["embeddings"].selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb"
    )
    c = e.filter(F.col("vec_id") < _SEM_MIN_K).selectExpr(
        "vec_id AS centroid_id",
        "emb AS c_emb",
        "aggregate(zip_with(emb, emb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS c_norm2",
    )
    scored = e.crossJoin(F.broadcast(c)).selectExpr(
        "vec_id", "centroid_id", f"{_D2_SPARK} AS d2"
    )
    best = scored.groupBy("vec_id").agg(F.min("d2").alias("d2"))
    aplan = plan_of(best)
    assert "BroadcastNestedLoopJoin" in aplan
    assert "CartesianProduct" not in aplan
    assert aplan.count("HashAggregate") >= 2  # map-side partial argmin


def test_substring_spans_equijoin_on_gram(spark, sf_dir):
    """dedup_substring_spans: the inverted-index join back must be an
    equi-join on gram (1:1 per (doc, pos) — hot grams cannot blow up),
    with the distinct-doc df count partial-aggregated map-side."""
    plan = plan_of(REGISTRY["dedup_substring_spans"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("HashAggregate") >= 2
    assert "gram" in plan and "Join" in plan


def test_classifier_partial_agg_and_pruning(spark, sf_dir):
    """quality_classifier_hashed: token features partial-agg map-side
    into one (doc_id) shuffle; untouched lang/source/n_chars columns
    never reach the scan."""
    plan = plan_of(REGISTRY["quality_classifier_hashed"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2
    for line in (l for l in plan.splitlines() if "ReadSchema" in l):
        assert "source" not in line and "n_chars" not in line


def test_domain_cap_skew_safe_rank(spark, sf_dir):
    """domain_cap_documents (audit form): the rank must NOT come from a
    window partitioned only by source (a mega-domain would be a single
    task). The ranking stage carries a rangepartitioning exchange over
    the full rank ordering and its row_number window's partition spec
    includes the range-partition id. The stage is inspected directly
    because the query materializes it (localCheckpoint truncates the
    outer visible plan)."""
    from mapreducecore_spark.catalog import load_tables
    from mapreducecore_spark.queries.curation import _ranged_local_rank

    d = load_tables(spark, sf_dir)["documents"].select("doc_id", "source", "n_chars")
    plan = plan_of(_ranged_local_rank(d, 32), "simple")
    assert "rangepartitioning" in plan, plan
    window_lines = [l for l in plan.splitlines() if "Window" in l and "row_number" in l]
    assert window_lines, plan
    for line in window_lines:
        assert "pid" in line, f"rank window not bounded by range-partition id:\n{line}"
    # The outer query must not re-shuffle wide: no source-only
    # row_number window anywhere, and text never read.
    full = plan_of(REGISTRY["domain_cap_documents"].fn(spark, sf_dir))
    for line in (l for l in full.splitlines() if "row_number" in l):
        assert "pid" in line, f"source-only rank window in outer plan:\n{line}"
    for line in (l for l in full.splitlines() if "ReadSchema" in l):
        assert "text" not in line


def test_domain_cap_kept_window_group_limit(spark, sf_dir):
    """domain_cap_kept: the rank <= cap filter must rewrite into
    WindowGroupLimit so each map task keeps at most cap rows per source
    BELOW the exchange (same partial-top-k shape as topk_per_group)."""
    plan = plan_of(REGISTRY["domain_cap_kept"].fn(spark, sf_dir), "simple")
    assert "WindowGroupLimit" in plan, plan


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Runtime row-level filtering: with a selective dimension filter
    on the creation side of a shuffle join, Catalyst injects a Bloom
    filter that prunes fact rows BEFORE the exchange — the 100 TB
    technique for joins too big to broadcast. Thresholds are lowered
    to trigger at test scale; the assertion is that the engine's plan
    carries the bloom stage (bloom_filter_agg / BloomFilterMightContain)
    when the conditions hold."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter("c_custkey % 50 = 0")
        plan = plan_of(o.join(c, o["o_custkey"] == c["c_custkey"]))
        assert "bloom" in plan.lower(), plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dsir_no_cartesian_and_partial_aggs(spark, sf_dir):
    """dsir_importance_weights: the only nested-loop joins are the
    1-row total broadcasts (never a CartesianProduct); the bucket
    counts and per-doc sums partial-aggregate map-side."""
    plan = plan_of(REGISTRY["dsir_importance_weights"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4
    assert "BroadcastHashJoin" in plan  # lnr table joined broadcast


def test_incremental_minhash_no_cartesian(spark, sf_dir):
    """dedup_incremental_minhash: the band join is an equi-join on
    (band_id, sig) — never a cartesian — and the new-batch filter
    sits below it."""
    plan = plan_of(REGISTRY["dedup_incremental_minhash"].fn(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan


def test_winnow_zero_shuffle_after_spread(spark, sf_dir):
    """doc_fingerprint_winnow is pure per-row expression work: the only
    exchange allowed is spread()'s round-robin widen of the narrow
    input scan; no aggregate anywhere."""
    plan = plan_of(REGISTRY["doc_fingerprint_winnow"].fn(spark, sf_dir), "simple")
    assert plan.count("Exchange") <= 1, plan
    assert "HashAggregate" not in plan


def test_percentile_skew_safe_rank(spark, sf_dir):
    """quality_percentile_by_source rides the same range-partitioned
    rank as domain_cap: no source-only row_number window in the outer
    plan (the ranking stage itself is gated via _ranged_local_rank in
    test_domain_cap_skew_safe_rank)."""
    plan = plan_of(REGISTRY["quality_percentile_by_source"].fn(spark, sf_dir))
    for line in (l for l in plan.splitlines() if "row_number" in l):
        assert "pid" in line, f"source-only rank window:\n{line}"


def test_incremental_persisted_semi_join_scopes_index(spark, sf_dir):
    """dedup_incremental_persisted: the persisted index must be
    RESTRICTED to touched buckets via a LeftSemi join before any
    window/pair work (the untouched majority of a 100 TB index never
    widens), and the pair joins stay equi-joins."""
    from mapreducecore_spark.queries.llm import (
        _TOKS,
        _band_signatures,
        _incremental_vs_index,
    )
    from mapreducecore_spark.catalog import load_tables
    from pyspark.sql import functions as F

    from mapreducecore_spark.queries.llm import _touched_bucket_rows

    docs = load_tables(spark, sf_dir)["documents"]
    idx = _band_signatures(
        docs.filter(F.col("doc_id") % 10 != 0).selectExpr("doc_id", f"{_TOKS} AS toks")
    )
    new_docs = docs.filter(F.col("doc_id") % 10 == 0).selectExpr(
        "doc_id", f"{_TOKS} AS toks"
    )
    # The semi-join stage sits below a localCheckpoint in the full
    # operator (which truncates the outer plan to Scan ExistingRDD),
    # so gate the stage frame directly — the operator is wired to it
    # by construction (llm._incremental_vs_index).
    plan = plan_of(_touched_bucket_rows(idx, _band_signatures(new_docs)), "simple")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    full = plan_of(_incremental_vs_index(idx, new_docs), "simple")
    assert "CartesianProduct" not in full


def test_scorers_never_join_on_pairs(spark, sf_dir):
    """The exact-Jaccard scorers must never join anything BY PAIR —
    pairs x arrays was the 8-10 GB / 16g-heap shape VERDICT r4 #3
    killed. The in-bucket design's only joins are narrow band-metadata
    joins (doc_id / band keys); pair rows are born scored, after the
    minimal-band emission test, so no distinct aggregate over pair
    keys exists either."""
    for name in ("dedup_lsh_verified_pairs", "minhash_estimate_accuracy"):
        plan = plan_of(REGISTRY[name].fn(spark, sf_dir), "simple")
        assert "CartesianProduct" not in plan, name
        for line in plan.splitlines():
            if "Join" in line:
                assert "doc_a" not in line and "doc_b" not in line, (
                    f"{name} joins by pair:\n{line}"
                )
            if "HashAggregate" in line:
                assert "doc_a" not in line, (
                    f"{name} aggregates over pair keys (global distinct "
                    f"resurrected):\n{line}"
                )


def test_curation_v3_shares_v2_plan_shape(spark, sf_dir):
    """corpus_curation_pipeline_v3: no cartesian products beyond the
    1-row total broadcasts, partial aggregation on the model counts,
    and the cap's rank filter still rides a window group limit (the
    cap stage sits below v3's checkpoint boundary, so its gate reads
    the stage frame directly)."""
    from mapreducecore_spark.queries.pipeline import _gate_dedup_cap

    plan = plan_of(REGISTRY["corpus_curation_pipeline_v3"].fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4
    assert "WindowGroupLimit" in plan_of(_gate_dedup_cap(spark, sf_dir), "simple")
