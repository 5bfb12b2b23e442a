"""Semantic tests for the training-data-pipeline operators
(queries/pipeline.py) on constructed inputs — independent of the
DuckDB parity check, these pin the intended behavior."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreducecore_spark.queries.pipeline import (
    decontam_ngram_overlap,
    embedding_centroid_per_label,
    kmeans_assign_seeded,
    quality_repetition_ratio,
)


def test_decontam_flags_docs_sharing_benchmark_shingles(spark, sf_dir):
    rows = {r["doc_id"]: r for r in decontam_ngram_overlap(spark, sf_dir).collect()}
    # Every flagged doc has sane counts and a ratio in (0, 1].
    for r in rows.values():
        assert 1 <= r["n_overlap"] <= r["n_shingles"]
        assert 0 < r["overlap_frac"] <= 1
        assert math.isclose(
            r["overlap_frac"], round(r["n_overlap"] / r["n_shingles"], 6)
        )
    # Benchmark docs themselves (doc_id % 97 == 0) are never in the output.
    assert all(d % 97 != 0 for d in rows)


def test_repetition_ratio_on_crafted_docs(spark, sf_dir):
    out = {r["doc_id"]: r for r in quality_repetition_ratio(spark, sf_dir).collect()}
    # Spot-check invariants over the real table.
    for r in out.values():
        assert r["n_distinct"] <= r["n_tokens"]
        assert 0 <= r["token_rep"] < 1
        assert 0 <= r["bigram_rep"] <= 1
    # Crafted check via the same expressions on a literal doc: "a a a a"
    # has token_rep 0.75 and a single distinct bigram (rep 2/3).
    df = spark.createDataFrame([(0, "a a a a")], "doc_id INT, text STRING")
    df.createOrReplaceTempView("_rep_probe")
    row = spark.sql(
        """
        SELECT size(toks) AS n,
               size(array_distinct(toks)) AS nd,
               size(array_distinct(transform(sequence(1, size(toks) - 1),
                    i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))))
                 AS ng2
        FROM (SELECT filter(split(text, '[^a-zA-Z0-9]+'), x -> x <> '') AS toks
              FROM _rep_probe)
        """
    ).collect()[0]
    assert (row["n"], row["nd"], row["ng2"]) == (4, 1, 1)


def test_centroid_is_columnwise_mean(spark, sf_dir):
    cent = embedding_centroid_per_label(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # Independent computation: mean of dim 1 for the lowest label.
    label = emb.agg(F.min("label")).collect()[0][0]
    expect = (
        emb.filter(F.col("label") == label)
        .select(F.element_at("embedding", 1).cast("double").alias("x"))
        .agg(F.avg("x"))
        .collect()[0][0]
    )
    got = cent.filter((F.col("label") == label) & (F.col("dim") == 1)).collect()[0][
        "centroid"
    ]
    assert math.isclose(got, round(expect, 6), abs_tol=1e-6)
    # Full cross-product coverage: n_labels x 64 rows.
    n_labels = emb.select("label").distinct().count()
    assert cent.count() == n_labels * 64


def test_kmeans_assignment_is_nearest_centroid(spark, sf_dir):
    out = kmeans_assign_seeded(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert out.count() == emb.count()  # every vector assigned exactly once
    rows = {r["vec_id"]: r for r in out.collect()}
    # Seed centroids assign to themselves at distance ~0.
    for cid in range(8):
        if cid in rows:
            assert rows[cid]["centroid_id"] == cid
            assert abs(rows[cid]["dist2"]) < 1e-9
    # Independent nearest-centroid check for one non-seed vector.
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter("vec_id < 20").collect()
    }
    probe = max(vecs)  # deterministic non-seed id
    dists = {
        cid: sum((a - b) ** 2 for a, b in zip(vecs[probe], vecs[cid]))
        for cid in range(8)
        if cid in vecs
    }
    best = min(dists, key=lambda c: (round(dists[c], 5), c))
    assert rows[probe]["centroid_id"] == best


def test_pack_sequences_matches_python_reference(spark, sf_dir):
    import re

    import duckdb

    from mapreducecore_spark.queries.pipeline import (
        PACK_CAPACITY,
        pack_sequences_greedy,
    )

    got = {
        (r["lang"], r["doc_id"]): (r["bin_id"], r["n_tokens"])
        for r in pack_sequences_greedy(spark, sf_dir).collect()
    }
    # Pure-Python reference: same tokenization, same greedy first-fit.
    rows = duckdb.sql(
        f"SELECT lang, doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY lang, doc_id"
    ).fetchall()
    expect = {}
    state = {}
    for lang, doc_id, text in rows:
        n = len([t for t in re.split(r"[^a-zA-Z0-9]+", text) if t])
        cur, fill = state.get(lang, (0, 0))
        if fill > 0 and fill + n > PACK_CAPACITY:
            cur, fill = cur + 1, 0
        expect[(lang, doc_id)] = (cur, n)
        state[lang] = (cur, fill + n)
    assert got == expect


def test_zorder_interleave_properties():
    # Pure-Python mirror of _z_expr's arithmetic: fixing one coordinate,
    # z is strictly monotone in the other (the locality property file
    # skipping relies on); and interleaving is a bijection on the grid.
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def z(x, y, bits=10):
        out = 0
        for i in range(bits):
            out += ((x >> i) & 1) << (2 * i)
            out += ((y >> i) & 1) << (2 * i + 1)
        return out

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(0, 1023), st.integers(0, 1023), st.integers(0, 1023)
    )
    def monotone(x1, x2, y):
        if x1 < x2:
            assert z(x1, y) < z(x2, y)
            assert z(y, x1) < z(y, x2)

    monotone()
    grid = {z(x, y, 4) for x in range(16) for y in range(16)}
    assert len(grid) == 256 and max(grid) == 255


def test_zorder_sql_matches_python(spark):
    from mapreducecore_spark.queries.pipeline import _z_expr

    def z(x, y, bits=10):
        out = 0
        for i in range(bits):
            out += ((x >> i) & 1) << (2 * i)
            out += ((y >> i) & 1) << (2 * i + 1)
        return out

    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 513, 1023) for y in (0, 2, 7, 800, 1023)],
        "x INT, y INT",
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.selectExpr(
            "x", "y", f"CAST({_z_expr('x', 'y', 10, 'div')} AS BIGINT) AS z"
        ).collect()
    }
    for (x, y), v in got.items():
        assert v == z(x, y)


def test_curation_pipeline_invariants(spark, sf_dir):
    from mapreducecore_spark.queries.pipeline import corpus_curation_pipeline

    out = corpus_curation_pipeline(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    # Every surviving doc passes the quality bar and has a split.
    assert all(r["quality"] >= 0.3 for r in rows)
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    # Dedup keeper: no two surviving docs share normalized content.
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept_ids = [r["doc_id"] for r in rows]
    norm = docs.filter(docs.doc_id.isin(kept_ids)).selectExpr(
        "md5(trim(regexp_replace(lower(text), '[ \\t\\n\\r]+', ' '))) AS h"
    )
    assert norm.count() == norm.distinct().count()


def test_quantized_ann_recall_vs_exact(spark, sf_dir):
    from mapreducecore_spark.queries.llm import ann_cosine_topk
    from mapreducecore_spark.queries.pipeline import ann_cosine_quantized

    exact = {
        (r["q_id"], r["neighbor_id"]) for r in ann_cosine_topk(spark, sf_dir).collect()
    }
    quant = {
        (r["q_id"], r["neighbor_id"])
        for r in ann_cosine_quantized(spark, sf_dir).collect()
    }
    # int8 with per-vector max-abs scaling keeps ~7 significant bits:
    # top-5 neighbor sets should overlap strongly.
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"quantized recall {recall:.2f}"
