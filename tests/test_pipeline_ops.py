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
