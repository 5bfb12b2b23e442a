"""Adversarial embeddings parity: crafted vectors with exact
geometry — a scaled copy (cos exactly 1), an orthogonal pair (0), an
anti-parallel pair (-1), and a ZERO vector (the division-by-zero-norm
case: Spark double math gives NaN where DuckDB division gives NULL;
COS_SPARK's nullif guard makes both engines yield NULL, so zero
vectors never rank). Runs the driver comparison for the cosine family
plus direct geometric assertions."""

from __future__ import annotations

import math
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreducecore_spark.queries import REGISTRY, _load_all

_load_all()

_DIM = 64


def _vec(**coords: float) -> list[float]:
    v = [0.0] * _DIM
    for k, x in coords.items():
        v[int(k[1:])] = x
    return v


# (vec_id, embedding, label)
_EMB = [
    (0, _vec(d0=1.0), 1),
    (1, _vec(d0=2.0), 1),  # scaled copy of v0 -> cos exactly 1.0
    (2, _vec(d1=1.0), 2),  # orthogonal to v0 -> cos 0.0
    (3, _vec(d0=-1.0), 2),  # anti-parallel to v0 -> cos -1.0
    (4, [0.0] * _DIM, 3),  # zero vector: sim must be NULL, never NaN
    (5, _vec(d0=1.0, d1=1.0), 3),  # 45 degrees from v0
    (6, _vec(d2=1.0, d3=2.0), 1),
    (7, _vec(d0=0.5, d2=0.5), 2),
    (8, _vec(d1=3.0, d4=1.0), 1),
    (9, _vec(d0=1.0, d5=1.0, d6=1.0), 2),
    (10, _vec(d7=1.0), 3),
    (11, _vec(d0=-2.0, d1=1.0), 3),
]

_OPS = [
    "ann_cosine_topk",
    "ann_cosine_quantized",
    "embedding_centroid_per_label",
    "ann_lsh_bucketed",
    "embedding_neardup_pairs",
    "embedding_quantize_int8",
]


@pytest.fixture(scope="module")
def crafted_emb_dir(sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("crafted_emb")
    for name in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        shutil.copy(f"{sf_dir}/{name}.parquet", root / f"{name}.parquet")
    tbl = pa.table(
        {
            "vec_id": pa.array([e[0] for e in _EMB], pa.int64()),
            "embedding": pa.array(
                [e[1] for e in _EMB], pa.list_(pa.float32())
            ),
            "label": pa.array([e[2] for e in _EMB], pa.int32()),
        }
    )
    pq.write_table(tbl, root / "embeddings.parquet")
    return str(root)


@pytest.fixture(scope="module")
def crafted_emb_duck(crafted_emb_dir):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{crafted_emb_dir}/{name}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append("NaN" if math.isnan(v) else repr(round(v, 9)))
            elif v is None:
                vals.append("NULL")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", _OPS)
def test_crafted_embeddings_parity(name, spark, crafted_emb_dir, crafted_emb_duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, crafted_emb_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = crafted_emb_duck.sql(spec.oracle)
    duck_rows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = _normalize(spark_rows, sdf.columns)
    nd = _normalize(duck_rows, rel.columns)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"


def test_crafted_geometry(spark, crafted_emb_dir):
    """Exact cosine geometry through the full top-k operator: the
    scaled copy ranks first for v0 at sim 1.0; the orthogonal vector
    scores 0; the anti-parallel one scores -1; the zero vector's sims
    are NULL (nullif guard), so it appears as a neighbor only with
    NULL sim and its own query rows are all-NULL sims."""
    rows = REGISTRY["ann_cosine_topk"].fn(spark, crafted_emb_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_id"], []).append(r)
    top0 = sorted(by_q[0], key=lambda r: (-(r["sim"] if r["sim"] is not None else -9), r["neighbor_id"]))
    assert top0[0]["neighbor_id"] == 1 and top0[0]["sim"] == 1.0
    sims0 = {r["neighbor_id"]: r["sim"] for r in by_q[0]}
    if 2 in sims0:
        assert sims0[2] == 0.0
    assert all(r["sim"] is None for r in by_q[4])  # zero-vector query
    for q, rs in by_q.items():
        for r in rs:
            if r["neighbor_id"] == 4:
                assert r["sim"] is None  # zero-vector neighbor never scores
