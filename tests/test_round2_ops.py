"""Unit tests for the round-2 operators, independent of the DuckDB
oracles: each checks the implementation against a second, simpler
reference computation (numpy indexing, brute-force pair scan, hand
PageRank) so a shared misunderstanding between query and oracle SQL
can't hide a bug."""

from __future__ import annotations

import numpy as np
import pytest

from mapreducecore_spark.llm.multimodal import (
    _ppm_raster,
    decode_ppm,
    encode_ppm,
    encode_wav,
    resize_ppm_nn,
)


def test_resize_nn_matches_numpy_reference():
    rng = np.random.RandomState(7)
    for w, h, ow, oh in [(13, 9, 8, 6), (4, 3, 8, 6), (16, 16, 4, 4), (5, 7, 5, 7)]:
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = encode_ppm(w, h, rgb.tobytes())
        out_w, out_h, _maxval, out = _ppm_raster(resize_ppm_nn(payload, ow, oh))
        assert (out_w, out_h) == (ow, oh)
        rows = (np.arange(oh) * h) // oh
        cols = (np.arange(ow) * w) // ow
        np.testing.assert_array_equal(out, rgb[rows][:, cols])


def test_resize_identity_roundtrip():
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8)
    payload = encode_ppm(8, 6, rgb.tobytes())
    # Same dims -> identical raster and identical decoded stats.
    again = resize_ppm_nn(payload, 8, 6)
    assert _ppm_raster(again)[3].tobytes() == rgb.tobytes()
    assert decode_ppm(again)["mean_pixel"] == pytest.approx(float(rgb.mean()))


def test_audio_window_stats_matches_numpy(spark):
    from mapreducecore_spark.llm.multimodal import audio_window_stats

    rng = np.random.RandomState(3)
    samples = {1: rng.randint(-500, 500, 257), 2: rng.randint(-500, 500, 100)}
    rows = [(d, encode_wav(8000, s.astype("<i2"))) for d, s in samples.items()]
    blobs = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {
        (r["doc_id"], r["window_idx"]): (r["n_samples"], r["mean_amp"])
        for r in audio_window_stats(blobs).collect()
    }
    for d, s in samples.items():
        n_windows = (len(s) + 99) // 100
        for w in range(n_windows):
            win = s[w * 100 : (w + 1) * 100]
            n, mean = got[(d, w)]
            assert n == win.size
            assert mean == pytest.approx(float(win.mean()))
    assert len(got) == sum((len(s) + 99) // 100 for s in samples.values())


def _brute_pairs(hashes: dict[int, int]):
    """Reference pair set: for each band, docs sharing the 16-bit chunk
    pair up; if (band, chunk) is wide (>200), additionally require the
    next band's chunk to agree."""
    out = set()
    ids = sorted(hashes)
    chunk = lambda h, b: (h >> (16 * b)) & 0xFFFF
    from collections import Counter

    for b in range(4):
        width = Counter(chunk(hashes[i], b) for i in ids)
        for i_pos, i in enumerate(ids):
            for j in ids[i_pos + 1 :]:
                if chunk(hashes[i], b) != chunk(hashes[j], b):
                    continue
                if width[chunk(hashes[i], b)] > 200 and chunk(
                    hashes[i], (b + 1) % 4
                ) != chunk(hashes[j], (b + 1) % 4):
                    continue
                out.add((i, j))
    return out


def test_simhash_degenerate_bucket_guard(spark):
    from mapreducecore_spark.llm.simhash import simhash_band_pairs

    rng = np.random.RandomState(5)
    hashes: dict[int, int] = {}
    # 250 docs all sharing band 0 == 0xBEEF (a degenerate bucket), upper
    # 48 bits random; doc pairs that ALSO share band 1 must survive.
    for i in range(250):
        upper = int(rng.randint(0, 2**31)) << 32 | int(rng.randint(0, 2**16)) << 16
        hashes[i] = upper | 0xBEEF
    # A planted near-dup pair inside the wide bucket (bands 0 AND 1 equal).
    hashes[300] = (0xABCD << 32) | (0x1234 << 16) | 0xBEEF
    hashes[301] = (0xDCBA << 32) | (0x1234 << 16) | 0xBEEF
    # A pair in a NARROW bucket (band 3 shared only).
    hashes[400] = (0x7777 << 48) | (0x0101 << 32) | (0x0202 << 16) | 0x0303
    hashes[401] = (0x7777 << 48) | (0x1111 << 32) | (0x2222 << 16) | 0x3333
    df = spark.createDataFrame(
        [(i, h - (1 << 64) if h >= 1 << 63 else h) for i, h in hashes.items()],
        "doc_id LONG, simhash LONG",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_band_pairs(df).select("id_a", "id_b").collect()
    }
    signed = {i: h - (1 << 64) if h >= 1 << 63 else h for i, h in hashes.items()}
    unsigned = {i: h & ((1 << 64) - 1) for i, h in signed.items()}
    expect = _brute_pairs(unsigned)
    assert got == expect
    assert (300, 301) in got  # survives the wide-bucket refinement
    assert (400, 401) in got  # narrow bucket needs only one band


def test_pagerank_converged_known_graph(spark):
    from pyspark.sql import functions as F

    # Path graph 1-2-3: degrees 1,2,1. Exact integer fixed-point by hand.
    edges = [(1, 2), (2, 3)]
    S, ITERS = 1_000_000, 4
    deg = {1: 1, 2: 2, 3: 1}
    adj = {1: [2], 2: [1, 3], 3: [2]}
    pr = {n: S for n in deg}
    for _ in range(ITERS):
        pr = {
            v: 150000 + (85 * sum(pr[u] // deg[u] for u in adj[v])) // 100
            for v in deg
        }
    # Run the same loop through the Spark implementation shape by
    # building the pipeline on a fake pair DataFrame.
    from mapreducecore_spark.queries._util import materialize

    pairs = spark.createDataFrame(edges, "doc_a LONG, doc_b LONG")
    e = pairs.selectExpr("doc_a AS u", "doc_b AS v").unionAll(
        pairs.selectExpr("doc_b AS u", "doc_a AS v")
    )
    d = e.groupBy("u").agg(F.count("*").alias("d"))
    ed = e.join(d, "u")
    cur = e.selectExpr("u AS node").distinct().withColumn(
        "r", F.lit(S).cast("long")
    )
    for _ in range(ITERS):
        cur = (
            ed.join(cur.withColumnRenamed("node", "u"), "u")
            .groupBy("v")
            .agg(F.expr("150000 + (85 * sum(r div d)) div 100").alias("r"))
            .withColumnRenamed("v", "node")
        )
        cur = materialize(cur)
    got = {r["node"]: r["r"] for r in cur.collect()}
    assert got == pr
