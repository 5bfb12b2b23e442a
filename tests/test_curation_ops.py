"""Round-3 part-3 curation operators: crafted-input parity + semantic
assertions for SemDeDup, substring-span dedup, the hashed classifier,
and the per-domain cap.

Crafted cases target the degenerate inputs each operator must survive:
zero-norm embeddings inside a cluster (cos NULL -> never pruned),
identical vectors split across seed-centroid clusters (no cross-cluster
prune by design), docs shorter than the k-gram width, multiple disjoint
duplicated spans in one document, zero-token documents through the
classifier (sigmoid(0) = 0.5), and quality ties in the domain cap
(doc_id tiebreak)."""

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


# Seed centroids are vec_id < 8 (each its own cluster); 8+ exercise the
# prune logic.
_EMB = [
    (0, _vec(d0=1.0), 1),
    (1, _vec(d0=2.0), 1),  # scaled copy of v0 but its OWN centroid
    (2, _vec(d1=1.0), 2),
    (3, _vec(d0=-1.0), 2),
    (4, [0.0] * _DIM, 3),  # zero centroid
    (5, _vec(d0=1.0, d1=1.0), 3),
    (6, _vec(d2=1.0, d3=2.0), 1),
    (7, _vec(d7=1.0), 2),
    (8, _vec(d0=3.0), 1),  # -> cluster 1; cos(v8, v1) = 1 -> pruned by 1
    (9, _vec(d0=2.5), 1),  # -> cluster 1; pruned by min neighbor = 1
    (10, [0.0] * _DIM, 3),  # second zero vector -> cluster 4, cos NULL, kept
    (11, _vec(d1=0.9), 2),  # -> cluster 2; cos(v11, v2) = 1 -> pruned by 2
]

# (doc_id, text, source): spans docs 0-3, cap docs 10-29, empties 30-31.
_DOCS = (
    [
        (0, "a b c d e f g h i j", "spans"),
        (1, "a b c d e f g h x y", "spans"),
        (2, "p q r s", "spans"),  # < k tokens: no grams, no spans
        (3, "m n o p q a b c d e z z1 z2 z3 f g h i j k", "spans"),
    ]
    + [(10 + i, f"cap doc w{i}", "caps") for i in range(20)]
    + [
        (30, "", "empty"),  # zero tokens
        (31, "... ,,''", "empty"),  # only delimiters -> zero tokens
    ]
)

_OPS = [
    "semdedup_prune",
    "dedup_substring_spans",
    "quality_classifier_hashed",
    "domain_cap_documents",
]


@pytest.fixture(scope="module")
def crafted_dir(sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("crafted_curation")
    for name in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        shutil.copy(f"{sf_dir}/{name}.parquet", root / f"{name}.parquet")
    docs = pa.table(
        {
            "doc_id": pa.array([d[0] for d in _DOCS], pa.int64()),
            "text": pa.array([d[1] for d in _DOCS], pa.string()),
            "lang": pa.array(["en"] * len(_DOCS), pa.string()),
            "source": pa.array([d[2] for d in _DOCS], pa.string()),
            "n_chars": pa.array([len(d[1]) for d in _DOCS], pa.int64()),
        }
    )
    pq.write_table(docs, root / "documents.parquet")
    emb = pa.table(
        {
            "vec_id": pa.array([e[0] for e in _EMB], pa.int64()),
            "embedding": pa.array([e[1] for e in _EMB], pa.list_(pa.float32())),
            "label": pa.array([e[2] for e in _EMB], pa.int32()),
        }
    )
    pq.write_table(emb, root / "embeddings.parquet")
    return str(root)


@pytest.fixture(scope="module")
def crafted_duck(crafted_dir):
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{crafted_dir}/{name}.parquet'"
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
def test_crafted_curation_parity(name, spark, crafted_dir, crafted_duck):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, crafted_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    rel = crafted_duck.sql(spec.oracle)
    duck_rows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rows spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = _normalize(spark_rows, sdf.columns)
    nd = _normalize(duck_rows, rel.columns)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"


def test_semdedup_prune_semantics(spark, crafted_dir):
    """v8/v9 land in v1's cluster and are shadowed by it; identical
    copies split across centroid clusters (v0 vs v1) are NOT pruned
    (documented SemDeDup semantics — within-cluster only); zero
    vectors never prune each other (cos NULL)."""
    rows = {r["vec_id"]: r for r in REGISTRY["semdedup_prune"].fn(spark, crafted_dir).collect()}
    assert not rows[8]["kept"] and rows[8]["pruned_by"] == 1
    assert not rows[9]["kept"] and rows[9]["pruned_by"] == 1
    assert not rows[11]["kept"] and rows[11]["pruned_by"] == 2
    assert rows[0]["kept"] and rows[1]["kept"]  # cross-cluster copies
    assert rows[4]["kept"] and rows[10]["kept"]  # zero vectors
    assert rows[10]["centroid_id"] == 4  # both zeros share cluster 4


def test_substring_spans_semantics(spark, crafted_dir):
    """Doc 1 shares its 8-token prefix with doc 0 -> one island of 4
    grams spanning tokens 1..8. Doc 3 shares two disjoint 5-token runs
    -> two islands. Doc 2 is shorter than k -> absent. Cap docs are
    3-token docs -> absent."""
    spans = {}
    for r in REGISTRY["dedup_substring_spans"].fn(spark, crafted_dir).collect():
        spans.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_tokens"], r["n_grams"])
        )
    assert spans[1] == [(1, 8, 8, 4)]
    assert sorted(spans[3]) == [(6, 10, 5, 1), (15, 19, 5, 1)]
    assert sorted(spans[0]) == [(1, 8, 8, 4), (6, 10, 5, 1)]
    assert 2 not in spans and 10 not in spans


def test_classifier_zero_token_docs(spark, crafted_dir):
    """Zero-token docs (empty / all-delimiter text) score exactly
    sigmoid(0) = 0.5 and are kept — no NULL/NaN leakage."""
    rows = {
        r["doc_id"]: r
        for r in REGISTRY["quality_classifier_hashed"].fn(spark, crafted_dir).collect()
    }
    for did in (30, 31):
        assert rows[did]["n_toks"] == 0
        assert rows[did]["score"] == 0.5
        assert rows[did]["keep"] is True
    assert len(rows) == len(_DOCS)


def test_domain_cap_tiebreak(spark, crafted_dir):
    """The 20 'caps' docs have distinct n_chars except the single-digit
    group; ranks are total via the doc_id tiebreak and exactly 15 are
    kept."""
    rows = [
        r
        for r in REGISTRY["domain_cap_documents"].fn(spark, crafted_dir).collect()
        if r["source"] == "caps"
    ]
    assert len(rows) == 20
    kept = [r for r in rows if r["kept"]]
    assert len(kept) == 15
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(1, 21))
    # ties: docs 10..19 all have n_chars == len('cap doc wN') equal for
    # single-digit N -> doc_id ascending within the tie
    tied = sorted(
        (r for r in rows if r["doc_id"] in range(10, 20)), key=lambda r: r["rank"]
    )
    assert [r["doc_id"] for r in tied] == sorted(r["doc_id"] for r in tied)


def _rand_docs_root(sf_dir, tmp_path_factory, docs, name):
    import pandas as pd

    root = tmp_path_factory.mktemp(name)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{sf_dir}/{t}.parquet", root / f"{t}.parquet")
    pdf = pd.DataFrame(
        [(d, t, "en", "srcR", len(t)) for d, t in docs],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    pdf.to_parquet(root / "documents.parquet", index=False)
    return str(root)


def test_random_corpus_substring_spans_vs_python_reference(
    spark, sf_dir, tmp_path_factory
):
    """Differential test: a seeded random corpus (small vocab so
    5-grams collide across docs, plus planted shared paragraphs) run
    through dedup_substring_spans must match an independent pure-Python
    implementation of the duplicated-gram island merge."""
    import random

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for did in range(50):
        n = rng.randint(0, 30)
        docs.append((did, " ".join(rng.choice(vocab) for _ in range(n))))
    # Planted shared paragraph inside otherwise-random text.
    para = "alpha beta gamma delta epsilon zeta eta"
    for did in range(50, 56):
        pre = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 6)))
        post = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 6)))
        docs.append((did, " ".join(x for x in (pre, para, post) if x)))

    K = 5
    grams = {}  # gram -> set of doc_ids
    per_doc = {}  # doc_id -> [(pos, gram)]
    for did, text in docs:
        toks = [t for t in text.split(" ") if t]
        pg = []
        for p in range(1, len(toks) - K + 2):
            g = " ".join(toks[p - 1 : p + K - 1])
            pg.append((p, g))
            grams.setdefault(g, set()).add(did)
        per_doc[did] = pg
    expect = set()
    for did, pg in per_doc.items():
        dup_pos = sorted(p for p, g in pg if len(grams[g]) >= 2)
        island = []
        for p in dup_pos:
            if island and p == island[-1] + 1:
                island.append(p)
            else:
                if island:
                    expect.add(
                        (did, island[0], island[-1] + K - 1,
                         island[-1] + K - island[0], len(island))
                    )
                island = [p]
        if island:
            expect.add(
                (did, island[0], island[-1] + K - 1,
                 island[-1] + K - island[0], len(island))
            )

    root = _rand_docs_root(sf_dir, tmp_path_factory, docs, "rand_spans")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"], r["n_grams"])
        for r in REGISTRY["dedup_substring_spans"].fn(spark, root).collect()
    }
    assert got == expect


def test_random_corpus_classifier_vs_python_reference(
    spark, sf_dir, tmp_path_factory
):
    """Differential test: the hashed linear classifier on a random
    corpus must match an independent pure-Python md5-bucket/weight
    computation to the rounded precision."""
    import hashlib
    import random
    from math import exp

    rng = random.Random(42424242)
    vocab = [f"tok{i}" for i in range(200)]
    docs = [(0, ""), (1, "..., '")]  # zero-token docs
    for did in range(2, 60):
        n = rng.randint(1, 80)
        docs.append((did, " ".join(rng.choice(vocab) for _ in range(n))))

    expect = {}
    for did, text in docs:
        toks = [t for t in text.replace(",", " ").replace(".", " ").replace("'", " ").split() if t]
        w_sum = 0
        for tok in toks:
            bucket = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 1024
            w_sum += (bucket * 2654435761) % 2001 - 1000
        n = len(toks)
        score = round(1.0 / (1.0 + exp(-(w_sum / (1000.0 * max(n, 1))))), 6)
        expect[did] = (n, score, score >= 0.5)

    root = _rand_docs_root(sf_dir, tmp_path_factory, docs, "rand_cls")
    got = {
        r["doc_id"]: (r["n_toks"], r["score"], r["keep"])
        for r in REGISTRY["quality_classifier_hashed"].fn(spark, root).collect()
    }
    assert got == expect


def test_random_embeddings_semdedup_vs_python_reference(
    spark, sf_dir, tmp_path_factory
):
    """Differential test: SemDeDup on seeded random float32 vectors
    (with planted scaled copies that must prune and a planted zero
    vector that must not) vs an independent numpy implementation of
    the LSH-pruned assign-then-prune (sign-LSH candidate buckets with
    full-argmin fallback, mirroring llm/similarity's code layout)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(20260814)
    n, dim = 80, 64
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs[70] = (2.5 * vecs[3]).astype(np.float32)  # scaled copy of a centroid
    vecs[71] = (0.5 * vecs[70]).astype(np.float32)  # copy of the copy
    vecs[72] = np.zeros(dim, dtype=np.float32)  # zero vector
    v = vecs.astype(np.float64)

    def codes(x):  # 4 tables x 8 bits: bit i compares e[lo] vs e[lo+32], 1-based
        out = []
        for t in range(4):
            code = 0
            for i in range(1, 9):
                lo = t * 8 + i
                if x[lo - 1] >= x[lo + 31]:
                    code += 1 << (i - 1)
            out.append(code)
        return out

    K = max(8, -(-n // 250))

    def lsh_assign(cent, cell_ids):
        """LSH-pruned assignment (bucket match + full-argmin fallback,
        two-phase min ties), mirroring _sem_assign."""
        c_norm2 = (cent * cent).sum(axis=1)
        ccodes = [codes(c) for c in cent]
        d2 = np.round(
            (v * v).sum(axis=1)[:, None] - 2.0 * (v @ cent.T) + c_norm2[None, :], 5
        )
        out = np.empty(n, dtype=int)
        m = cent.shape[0]
        for b in range(n):
            vc = codes(v[b])
            cand = [
                j for j in range(m) if any(vc[t] == ccodes[j][t] for t in range(4))
            ]
            if not cand:
                cand = list(range(m))  # fallback: full argmin
            best = min(d2[b, j] for j in cand)
            out[b] = min(cell_ids[j] for j in cand if d2[b, j] == best)
        return out

    # Lloyd-trained centroids (round 4): seeds = K lowest vec_ids, then
    # _SEM_TRAIN_ITERS assign+mean rounds; cluster labels stay the seed
    # ids and empty cells drop from the codebook.
    from mapreducecore_spark.queries.curation import _SEM_TRAIN_ITERS

    cent, cell_ids = v[:K], list(range(K))
    for _ in range(_SEM_TRAIN_ITERS):
        asg = lsh_assign(cent, cell_ids)
        cells = sorted(set(int(a) for a in asg))
        # id-ordered labels must map to row order for the next round
        id2row = {cid: i for i, cid in enumerate(cells)}
        cent = np.stack(
            [v[asg == cid].mean(axis=0) for cid in cells]
        )
        cell_ids = cells
        del id2row
    assigned = lsh_assign(cent, cell_ids)
    nrm = np.sqrt((v * v).sum(axis=1))
    expect = {}
    for b in range(n):
        pruned_by = None
        for a in range(b):
            if assigned[a] != assigned[b]:
                continue
            denom = nrm[a] * nrm[b]
            if denom == 0.0:
                continue  # NULL cosine in both engines
            # Floor-quantized dot, the _PAIR_COS_Q_DUCK rule: exact
            # order-independent int64 sum, so this reference matches
            # the engine BY CONSTRUCTION (round 7; previously a
            # BLAS-ordered v@v + banker's round only happened to
            # agree at this n).
            q = int(np.floor(v[a] * v[b] * 1099511627776.0).astype(np.int64).sum())
            if (q / 1099511627776.0) / denom >= 0.4:
                pruned_by = a
                break
        expect[b] = (int(assigned[b]), pruned_by is None, pruned_by)

    root = tmp_path_factory.mktemp("rand_semdedup")
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        shutil.copy(f"{sf_dir}/{t}.parquet", root / f"{t}.parquet")
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array([list(r) for r in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * n, pa.int32()),
        }
    )
    pq.write_table(tbl, root / "embeddings.parquet")
    got = {
        r["vec_id"]: (r["centroid_id"], r["kept"], r["pruned_by"])
        for r in REGISTRY["semdedup_prune"].fn(spark, str(root)).collect()
    }
    # Scaled copies (cosine 1.0) prune whenever they share a cluster —
    # under TRAINED euclidean centroids a 2.5x-scaled copy can land in
    # a different cell, so assert against the reference's clustering.
    if expect[70][0] == expect[3][0]:
        assert not got[70][1]
    assert got[72][1]  # zero vector kept (NULL cosine never prunes)
    assert got == expect
