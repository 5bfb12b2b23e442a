"""Validation for the non-SQL-expressible LLM ops (SimHash, LSH recall)
and the multimodal decode seam."""

from __future__ import annotations

import pytest

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.llm.simhash import add_simhash, simhash64, simhash_band_pairs
from mapreducecore_spark.queries import REGISTRY, _load_all

_load_all()


def test_simhash_udf_matches_core(spark, sf_dir):
    """The Arrow/pandas-UDF path must agree with direct core calls."""
    docs = load_tables(spark, sf_dir)["documents"].limit(50)
    rows = add_simhash(docs).select("doc_id", "text", "simhash").collect()
    assert rows
    for r in rows:
        assert r["simhash"] == simhash64(r["text"]), f"doc {r['doc_id']}"


def test_simhash_similar_texts_close():
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    c = "completely different content about spark shuffles and parquet files"
    ham_ab = bin((simhash64(a) ^ simhash64(b)) & (2**64 - 1)).count("1")
    ham_ac = bin((simhash64(a) ^ simhash64(c)) & (2**64 - 1)).count("1")
    assert ham_ab < ham_ac
    assert ham_ab <= 16


def test_simhash_banding_catches_small_hamming(spark, sf_dir):
    """Pigeonhole guarantee: any pair with Hamming <= 3 shares one of
    the four 16-bit bands, so banding must surface it."""
    docs = load_tables(spark, sf_dir)["documents"]
    hashed = add_simhash(docs).cache()
    pairs = simhash_band_pairs(hashed)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # Brute-force reference on the collected hashes (test-only collect).
    hs = [(r["doc_id"], r["simhash"]) for r in hashed.select("doc_id", "simhash").collect()]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            ham = bin((hs[i][1] ^ hs[j][1]) & (2**64 - 1)).count("1")
            if ham <= 3:
                pair = (min(hs[i][0], hs[j][0]), max(hs[i][0], hs[j][0]))
                assert pair in got, f"missed near-dup pair {pair} (hamming={ham})"
    hashed.unpersist()


def test_ann_lsh_recall_on_planted_neardups(spark):
    """Sign-LSH's actual guarantee: high-cosine pairs collide in some
    table w.h.p. (1-(1-p^8)^4 ≈ 0.75 at cosine 0.9). Plant near-dup
    pairs deterministically and require most to be surfaced."""
    import random

    from mapreducecore_spark.llm.similarity import add_lsh_codes

    rng = random.Random(42)
    rows = []
    n_planted = 40
    for i in range(n_planted):
        base = [rng.gauss(0, 1) for _ in range(64)]
        # near-dup: tiny perturbation -> cosine ≈ 0.995
        near = [x + rng.gauss(0, 0.05) for x in base]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, near))
    df = spark.createDataFrame(rows, ["vec_id", "emb"]).selectExpr(
        "vec_id", "transform(emb, x -> CAST(x AS DOUBLE)) AS emb"
    )
    be = add_lsh_codes(df)
    a = be.selectExpr("vec_id AS id_a", "tbl", "code")
    b = be.selectExpr("vec_id AS id_b", "tbl", "code")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, ["tbl", "code"])
        .filter("id_a < id_b")
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    found = sum(1 for i in range(n_planted) if (2 * i, 2 * i + 1) in pairs)
    assert found / n_planted >= 0.8, (
        f"LSH missed too many planted near-dups: {found}/{n_planted}"
    )


def test_multimodal_decode_raises_for_unknown_codec():
    """PNG and baseline JPEG decode for real since round 6; the seam
    now covers only containers the engine has no decoder for at all
    (MP3/H.264 and anything unrecognized)."""
    from mapreducecore_spark.llm.multimodal import decode_image, decode_payload

    mp3 = b"ID3\x04\x00\x00\x00\x00\x00\x00"
    with pytest.raises(NotImplementedError):
        decode_image(mp3)
    with pytest.raises(NotImplementedError):
        decode_payload(mp3)
    # A JPEG variant outside the baseline-sequential scope must raise
    # loudly too (SOF2 progressive), never decode silently wrong.
    import struct

    sof2 = (
        b"\xff\xd8"
        + struct.pack(">HH", 0xFFC2, 11)
        + bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    )
    with pytest.raises(NotImplementedError):
        decode_image(sof2)


def test_ppm_codec_roundtrip_and_comments():
    from mapreducecore_spark.llm.multimodal import decode_ppm, encode_ppm

    m = decode_ppm(encode_ppm(5, 4, bytes([77]) * 60))
    assert (m["width"], m["height"], m["mean_pixel"]) == (5, 4, 77.0)
    # '#' comments inside the header are part of the PPM spec
    m2 = decode_ppm(b"P6\n# a comment\n3 2\n255\n" + bytes([10]) * 18)
    assert (m2["width"], m2["height"], m2["mean_pixel"]) == (3, 2, 10.0)


def test_wav_codec_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from mapreducecore_spark.llm.multimodal import decode_wav, encode_wav

    w = encode_wav(8200, np.full(350, -123, dtype="<i2"))
    m = decode_wav(w)
    assert (m["sample_rate"], m["n_samples"], m["mean_amplitude"]) == (8200, 350, -123.0)
    assert abs(m["duration_sec"] - 350 / 8200) < 1e-12
    # an unknown odd-sized chunk before 'data' must be skipped (word-aligned)
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"
    w2 = w[:12] + extra + w[12:]
    w2 = w2[:4] + struct.pack("<I", len(w2) - 8) + w2[8:]
    assert decode_wav(w2) == m


def test_multimodal_decode_query_inverts_synthesizer(spark, sf_dir):
    """Spark-side check: decoded metadata matches the doc_id-derived
    generation parameters for both modalities."""
    from mapreducecore_spark.queries import REGISTRY

    rows = REGISTRY["multimodal_decode"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        d = r["doc_id"]
        if d % 2 == 0:
            expect = (
                "image/jpeg" if d % 8 == 0
                else "image/png" if d % 4 == 0
                else "image/ppm"
            )
            assert r["kind"] == expect
            assert (r["width"], r["height"]) == (4 + d % 13, 3 + d % 7)
            assert r["mean_pixel"] == float(d % 251)
            assert r["sample_rate"] is None
        else:
            assert r["kind"] == "audio/wav"
            assert r["sample_rate"] == 8000 + 100 * (d % 5)
            assert r["n_samples"] == 100 + d % 900
            assert r["mean_amplitude"] == float(d % 1000 - 500)
            assert r["width"] is None


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF (nprobe=2, 16 cells) must recover most of the exact top-5
    neighbors (measured 0.92 mean recall on the fixed sf0.001 data)."""
    from collections import defaultdict

    from mapreducecore_spark.queries import REGISTRY

    exact, ivf = defaultdict(set), defaultdict(set)
    for r in REGISTRY["ann_cosine_topk"].fn(spark, sf_dir).collect():
        exact[r["q_id"]].add(r["neighbor_id"])
    for r in REGISTRY["ann_ivf_coarse"].fn(spark, sf_dir).collect():
        ivf[r["q_id"]].add(r["neighbor_id"])
    recalls = [len(exact[q] & ivf.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.5


def test_frame_sampling_fanout_and_schema(spark, sf_dir):
    """One payload row fans out to ceil(n_frames / k) frame rows with
    typed (doc_id, frame_idx, frame, n_frame_bytes) output."""
    from pyspark.sql import functions as F

    from mapreducecore_spark.catalog import load_tables
    from mapreducecore_spark.llm.multimodal import _FRAME_BYTES, sample_frames

    t = load_tables(spark, sf_dir)
    blobs = (
        t["documents"].limit(20).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )
    frames = sample_frames(blobs, every_k=4)
    assert [f.name for f in frames.schema.fields] == [
        "doc_id", "frame_idx", "frame", "n_frame_bytes",
    ]
    rows = frames.collect()
    src = {r["doc_id"]: r["payload"] for r in blobs.collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, payload in src.items():
        n = max(1, len(payload) // _FRAME_BYTES)
        expect = len(range(0, n, 4))
        assert len(by_doc[doc_id]) == expect
        for r in by_doc[doc_id]:
            assert bytes(r["frame"]) == payload[
                r["frame_idx"] * _FRAME_BYTES : (r["frame_idx"] + 1) * _FRAME_BYTES
            ]


def test_feature_vectors_compose_with_similarity(spark, sf_dir):
    """Fake featurizer yields ARRAY<FLOAT> vectors usable by the cosine
    expression from llm/similarity.py (the compose-downstream contract)."""
    from pyspark.sql import functions as F

    from mapreducecore_spark.catalog import load_tables
    from mapreducecore_spark.llm.multimodal import extract_feature_vectors
    from mapreducecore_spark.llm.similarity import COS_SPARK

    t = load_tables(spark, sf_dir)
    blobs = (
        t["documents"].limit(10).select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    )
    feats = extract_feature_vectors(blobs).selectExpr(
        "doc_id", "transform(feature, x -> CAST(x AS DOUBLE)) AS emb"
    )
    cos = COS_SPARK.format(a="emb", b="emb")
    rows = feats.selectExpr("doc_id", f"{cos} AS self_sim").collect()
    assert len(rows) == 10
    for r in rows:
        assert abs(r["self_sim"] - 1.0) < 1e-9  # self-cosine == 1


def test_wide_lsh_code_width_identity(spark):
    """Corpus-adaptive code widths (round 8): a b-bit code generated
    directly (the Spark side) must equal the MAX_BITS code reduced
    modulo 2^b (the DuckDB oracle's data-dependent-width form), for
    every width on the ladder, on both engines, over random vectors.
    This is the identity the semdedup oracle's semmask CTE rides on."""
    import random

    import duckdb

    from mapreducecore_spark.llm.similarity import (
        MAX_BITS,
        add_lsh_codes,
        duck_tables_select,
    )

    rng = random.Random(20260816)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "emb"]).selectExpr(
        "vec_id", "transform(emb, x -> CAST(x AS DOUBLE)) AS emb"
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, [{', '.join(repr(x) for x in emb)}]::DOUBLE[])"
            for i, emb in rows
        )
        + ") t(vec_id, emb)"
    )
    wide = add_lsh_codes(df, bits=MAX_BITS)
    for bits in (8, 11, 13, 16):
        narrow = {
            (r["vec_id"], r["tbl"]): r["code"]
            for r in add_lsh_codes(df, bits=bits).collect()
        }
        masked = {
            (r["vec_id"], r["tbl"]): r["code"] % (1 << bits)
            for r in wide.collect()
        }
        assert narrow == masked, f"spark mask identity broke at bits={bits}"
        duck = {
            (vid, tbl): code
            for vid, tbl, code in con.execute(
                f"SELECT vec_id, tbl, code FROM (SELECT vec_id, "
                f"{duck_tables_select('emb', mask=str(1 << bits))} FROM v)"
            ).fetchall()
        }
        assert duck == narrow, f"cross-engine code mismatch at bits={bits}"


def test_reserve_hyperplanes_disjoint_from_primaries():
    """ADVICE r8: each table's reserve pairs (bits 9..16) must touch no
    coordinate of that table's own primary pairs (bits 1..8) — shared
    coordinates correlate the extra bits and split buckets unevenly.
    Exhaustive over the whole pool; also pins pair distinctness and the
    64-dim coordinate bound."""
    from mapreducecore_spark.llm.similarity import (
        BITS,
        MAX_BITS,
        N_TABLES,
        _hyperplane,
    )

    for t in range(N_TABLES):
        primary = set()
        for i in range(1, BITS + 1):
            lo, hi = _hyperplane(t, i)
            primary |= {lo, hi}
        reserve_pairs = set()
        reserve = set()
        for i in range(BITS + 1, MAX_BITS + 1):
            lo, hi = _hyperplane(t, i)
            reserve_pairs.add((lo, hi))
            reserve |= {lo, hi}
        assert not (primary & reserve), (
            f"table {t}: reserve coords {sorted(primary & reserve)} reuse primaries"
        )
        assert len(reserve_pairs) == MAX_BITS - BITS
        assert all(1 <= c <= 64 for c in primary | reserve)
