"""Corpus-curation operators, round 3 part 3: semantic dedup
(SemDeDup), substring-span dedup (Lee et al. 2022 style), a hashed
linear quality classifier (fastText-shaped), and per-domain document
caps.

Reference has no analogue (its only data operators are S1-S6/D1-D7,
`mr_tasks.h:43-121` / `worker.h:73-160`); these extend the [EXT]
LLM-data-pipeline surface of SURVEY.md §2.D with the remaining
curation stages a 100 TB training pipeline runs:

- SemDeDup (Abbas et al. 2023): cluster embeddings with k-means, then
  prune within-cluster pairs above a cosine threshold. Candidate
  generation is quadratic only WITHIN a cluster; K is chosen ~ n/1000
  at scale so cluster width stays bounded — the cross-cluster O(n^2)
  never materializes. Centroids broadcast; one shuffle on centroid_id.
- Substring-span dedup (Lee et al., "Deduplicating Training Data Makes
  Language Models Better"): find maximal token spans whose k-grams all
  occur in >= 2 distinct documents. The scale shape is an inverted
  k-gram index joined back 1:1 per (doc, pos) — the join key carries a
  per-gram boolean, so hot grams CANNOT blow up the output (contrast
  the pairwise jaccard join, which needs its df cap).
- Hashed linear classifier: fastText-shaped quality scoring with
  bucketed unigram features and formula-derived weights — the weight
  table is pure arithmetic on the bucket id, so scoring is one
  JVM-side aggregation with NO model broadcast and no Python. Swapping
  real trained weights in means broadcasting a 2^20-row map — still
  map-side only.
- Per-domain cap: keep the top-N documents per source (quality-ordered)
  — the standard guard against a single crawl domain flooding the
  training mix. Two forms: the audit-rank form ranks EVERY row via
  range-partitioned exact ranking (a per-source window would put a
  mega-domain in one task; AQE skew handling applies to joins, not
  window partitions), and the kept-set form filters rank <= cap inside
  the operator so Catalyst's WindowGroupLimit keeps at most cap rows
  per source per map task BELOW the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.llm.similarity import add_lsh_codes, duck_tables_select
from mapreducecore_spark.queries import register
from mapreducecore_spark.queries._util import materialize, spread
from mapreducecore_spark.queries.llm import _TOKS, _TOKS_DUCK

# ------------------------------------------------------------ SemDeDup

# K scales with the corpus (paper: K ~ n/1000; here n/250 so test SFs
# keep K >= 8): cluster width — and with it the intra-cluster pair
# count — stays ~constant per cluster, so total pairs grow LINEARLY in
# n. The first 10x sweep ran with a fixed K=8 and clocked 30x at 10x
# data (clusters grew 10x -> pairs 100x): the same quadratic class as
# the unguarded LSH buckets, fixed at the source by scaling K.
#
# Assignment is LSH-pruned: a vector computes exact distances only to
# centroids sharing a sign-LSH bucket (llm/similarity's 4x8-bit
# tables), with a full-argmin fallback for vectors matching no
# centroid bucket. Brute-force assignment is n x K distance evals
# with K ~ n — the 100x sweep measured it at 9.3x/decade (160M evals
# at 200k vectors); bucketed candidates cut that ~64x and the
# fallback fraction DECAYS as K grows (P[no bucket hit] =
# (1 - 1/256)^(4K)), so small corpora stay near-exact and large ones
# stay cheap. The same two-level shape as ann_ivf_trained, and the
# oracle mirrors the pruning exactly.
_SEM_MIN_K = 8
_SEM_DOCS_PER_CLUSTER = 250
_SEM_T = 0.4  # cosine prune threshold (matches data's near-dup band)

# ---- corpus-adaptive LSH code width (round 8, VERDICT r7 #1) ----
# A FIXED 4x8-bit code space (1024 (tbl,code) slots) saturates once K
# outgrows it: at the fourth decade (K ~ 24k) every bucket held ~94
# centroids, candidates per vector grew ~K/64, and the training
# assignment went quadratic-in-n by construction (measured 4.20x wall
# for 3x data, BASELINE.md round-7 semdedup notes). Scaling code bits
# with log2(K) pins expected centroids-per-bucket at <= ~16 per table
# (bits = smallest b >= 8 with 2^b >= K/16, capped at MAX_BITS), so
# candidates per vector stay ~4*16 regardless of corpus size while
# P[a vector's buckets hold no centroid at all] stays ~e^-K/2^bits
# per table — vanishing, so the exact-argmin fallback never becomes a
# hidden n x K path. The comparison ladder below (not a float log2)
# keeps the tier flip bit-deterministic across engines; the oracle
# computes the SAME ladder from its k CTE and reduces MAX_BITS codes
# modulo 2^bits, which equals generating bits-wide codes directly
# (llm/similarity._hyperplane is bit-positional).
_SEM_OCC_LOG2 = 4  # target ~2^4 centroids per bucket per table
_SEM_BITS_LADDER = tuple(1 << t for t in range(8 + _SEM_OCC_LOG2, 16 + _SEM_OCC_LOG2))


def _sem_bits(k: int) -> int:
    """Code width for codebook size k: 8 + one per ladder rung passed."""
    return 8 + sum(k > rung for rung in _SEM_BITS_LADDER)


_SEM_BITS_DUCK = "8 + " + " + ".join(
    f"CAST(k > {rung} AS INT)" for rung in _SEM_BITS_LADDER
)
# Scalar mask CTEs the oracle threads through every code computation.
_SEM_MASK_CTES = (
    f"semb AS (SELECT {_SEM_BITS_DUCK} AS bits FROM k),\n"
    "    semmask AS (SELECT CAST(1 AS BIGINT) << bits AS m FROM semb)"
)
_SEM_MASK = "SELECT m FROM semmask"

# |a-c|^2 argmin == argmin(|a|^2 - 2 a.c + |c|^2); ROUND pins the
# cross-engine tie landscape exactly like kmeans_assign_seeded.
_D2_SPARK = (
    "ROUND(aggregate(zip_with(emb, emb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    " - 2 * aggregate(zip_with(emb, c_emb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    " + c_norm2, 5)"
)
_D2_DUCK = (
    "ROUND(list_inner_product(emb, emb) - 2 * list_inner_product(emb, c_emb) + c_norm2, 5)"
)

# Per-pair cosine for the PRUNE stage, in FLOOR-QUANTIZED form
# (round 7): the dot product is sum(floor(a_i * b_i * 2^40)) as int64
# — every term is an IEEE double product scaled by an exact power of
# two and floored, so the sum is exact, ORDER-INDEPENDENT, and
# therefore bit-identical across numpy (the applyInPandas prune
# kernel), DuckDB (this oracle expression), and any Spark SQL form —
# BY CONSTRUCTION, not by matching summation order. That frees the
# prune kernel to use vectorized numpy (the previous zip_with
# per-pair fold burned 64% of the 1000x query's core-seconds; see
# BASELINE.md round-7 semdedup notes) and drops the ROUND(cos, 6)
# tie-pinning crutch: with identical quantized dots and the nrm
# column computed ONCE by Spark and passed through, the raw >=
# comparison is already deterministic everywhere. Quantization shifts
# a cosine by < dim * 2^-40 / (|a||b|) — semantically nil against the
# 0.4 threshold. Zero norms -> NULL in DuckDB (nullif), masked in the
# kernel: zero vectors never prune.
_SEM_Q = 1099511627776.0  # 2^40, float for exact IEEE scaling
_PAIR_COS_Q_DUCK = (
    "CAST(list_sum(list_transform(generate_series(1, len(ea.emb)), i -> "
    "CAST(FLOOR(list_extract(ea.emb, i) * list_extract(eb.emb, i) * 1099511627776.0) AS BIGINT)"
    ")) AS DOUBLE) / 1099511627776.0 / nullif(ea.nrm * eb.nrm, 0)"
)

_SEM_TRAIN_ITERS = 2  # Lloyd iterations before the prune (Abbas et al.)

# Lloyd TRAINS on a deterministic md5 hash-sample (~1/4) of the corpus
# (VERDICT r6 #1): with K ~ n/250 the full-corpus training pass costs
# n x candidates PER ROUND, so the 2 training rounds were ~2/3 of the
# 1000x wall (1351 s). Centroid quality needs only a representative
# sample (~62 sampled members per cluster at the n/250 K) — standard
# k-means practice — while the FINAL assignment and the prune still
# see every vector, so coverage is exact. The sample is the md5-prefix
# idiom (same as sample_deterministic_hash): engine-agnostic,
# reproducible, pure map-side; the oracle trains on the identical
# subset so the trained centroids stay bit-identical cross-engine.
#
# Sampling only kicks in at n >= _SEM_TRAIN_SAMPLE_MIN_N: below it the
# empty-cluster-drop rule would collapse the codebook (a 12-vector
# crafted corpus samples ~2 training vectors against K=8 seeds), and
# tiny corpora gain nothing from a 4x training cut. The threshold is
# mirrored in the oracle as a scalar COUNT(*) subquery, so both
# engines flip branches on exactly the same corpus size; 300 puts the
# driver's sf0.01 run (500 vectors) on the SAMPLED branch — the branch
# that matters at scale is the value-attested one — while the crafted
# and numpy-differential tests (12/80 vectors) keep exact full-corpus
# training.
_SEM_TRAIN_SAMPLE_MIN_N = 300
_SEM_TRAIN_SAMPLE_SPARK = (
    "substring(md5(CAST(vec_id AS STRING)), 1, 1) IN ('0', '1', '2', '3')"
)
_SEM_TRAIN_SAMPLE_DUCK = (
    "substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) IN ('0', '1', '2', '3')"
)


def _sem_assign_ctes(tag: str, cents: str, src: str = "e", codes: str = "vcodes") -> str:
    """One LSH-pruned assignment round against centroid CTE `cents`,
    assigning the vectors of CTE `src` (with LSH codes in `codes`):
    candidate buckets -> full-argmin fallback -> two-phase MIN argmin.
    Mirrors the Spark _sem_assign helper CTE-for-stage. Training rounds
    pass src="es"/codes="vscodes" (the hash-sampled training subset);
    the final assignment passes the full-corpus defaults. Codes are
    width-masked by the semmask scalar CTE (corpus-adaptive bits)."""
    return f"""
    cc{tag} AS MATERIALIZED (SELECT centroid_id, {duck_tables_select("c_emb", mask=_SEM_MASK)} FROM {cents}),
    cand{tag} AS MATERIALIZED (
      SELECT DISTINCT v.vec_id, cc.centroid_id
      FROM {codes} v JOIN cc{tag} cc USING (tbl, code)
    ),
    ca{tag} AS MATERIALIZED (
      SELECT vec_id, centroid_id FROM cand{tag}
      UNION ALL
      SELECT e.vec_id, c.centroid_id FROM {src} e CROSS JOIN {cents} c
      WHERE e.vec_id NOT IN (SELECT vec_id FROM cand{tag})
    ),
    sc{tag} AS MATERIALIZED (
      SELECT a.vec_id, a.centroid_id, {_D2_DUCK} AS d2
      FROM ca{tag} a
      JOIN {src} e ON e.vec_id = a.vec_id
      JOIN {cents} c ON c.centroid_id = a.centroid_id
    ),
    bs{tag} AS MATERIALIZED (SELECT vec_id, MIN(d2) AS d2 FROM sc{tag} GROUP BY vec_id),
    asg{tag} AS MATERIALIZED (
      SELECT s.vec_id, MIN(s.centroid_id) AS centroid_id
      FROM sc{tag} s JOIN bs{tag} USING (vec_id, d2)
      GROUP BY s.vec_id
    )"""


def _semdedup_oracle(iters: int) -> str:
    """DuckDB mirror of the trained-centroid SemDeDup chain: rank-based
    seeds, `iters` Lloyd rounds (LSH-pruned assign + DECIMAL-exact mean
    update), final assignment, intra-cluster cosine prune."""
    blocks = []
    for i in range(iters):
        blocks.append(_sem_assign_ctes(str(i), f"c{i}", src="es", codes="vscodes"))
        blocks.append(f"""
    u{i} AS MATERIALIZED (
      SELECT centroid_id, idx, emb[idx] AS val FROM (
        SELECT a.centroid_id, e.emb,
               unnest(generate_series(1, len(e.emb))) AS idx
        FROM asg{i} a JOIN es e ON e.vec_id = a.vec_id)
    ),
    c{i + 1} AS MATERIALIZED (
      SELECT centroid_id, c_emb, list_inner_product(c_emb, c_emb) AS c_norm2
      FROM (
        SELECT centroid_id, list(cv ORDER BY idx) AS c_emb FROM (
          SELECT centroid_id, idx,
                 CAST(SUM(CAST(val AS DECIMAL(38,20))) AS DOUBLE) / COUNT(*) AS cv
          FROM u{i} GROUP BY centroid_id, idx)
        GROUP BY centroid_id)
    )""")
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
                      sqrt(list_inner_product(
                          list_transform(embedding, x -> CAST(x AS DOUBLE)),
                          list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS nrm
               FROM embeddings),
    k AS (SELECT GREATEST({_SEM_MIN_K},
                          CAST(CEIL(COUNT(*) / {_SEM_DOCS_PER_CLUSTER}.0) AS BIGINT)) AS k
          FROM e),
    {_SEM_MASK_CTES},
    c0 AS MATERIALIZED (SELECT vec_id AS centroid_id, emb AS c_emb,
                  list_inner_product(emb, emb) AS c_norm2
           FROM e
           QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= (SELECT k FROM k)),
    vcodes AS MATERIALIZED (SELECT vec_id, {duck_tables_select("emb", mask=_SEM_MASK)} FROM e),
    es AS MATERIALIZED (
      SELECT * FROM e
      WHERE (SELECT COUNT(*) FROM e) < {_SEM_TRAIN_SAMPLE_MIN_N}
         OR {_SEM_TRAIN_SAMPLE_DUCK}),
    vscodes AS MATERIALIZED (
      SELECT v.* FROM vcodes v JOIN es USING (vec_id)),
    {",".join(blocks)},
    {_sem_assign_ctes("f", f"c{iters}")},
    pruned AS (
      SELECT b.vec_id, MIN(a.vec_id) AS pruned_by
      FROM asgf a JOIN asgf b
        ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE {_PAIR_COS_Q_DUCK} >= {_SEM_T}
      GROUP BY b.vec_id
    )
    SELECT s.vec_id, s.centroid_id, p.vec_id IS NULL AS kept, p.pruned_by
    FROM asgf s LEFT JOIN pruned p ON p.vec_id = s.vec_id
"""


def _sem_assign(
    e: DataFrame, vcodes: DataFrame, c: DataFrame, bits: int = 8
) -> DataFrame:
    """One LSH-pruned assignment round: exact distances only to
    centroids sharing a sign-LSH bucket, full-argmin fallback for
    vectors matching no centroid bucket, then a single-pass
    min(struct(d2, centroid_id)) argmin — a row_number window here
    would shuffle every scored row WITH its embedding (n x K x 550B
    ~ 90 GB at the 100x sweep, measured heap OOM), while the struct
    min partial-aggregates map-side so the exchange carries n rows
    and the n x ~124 scored frame never materializes. Ties: min d2,
    then min centroid_id (lexicographic struct order) — identical to
    the oracle's two-phase MIN ordering."""
    ccodes = add_lsh_codes(
        c.select(F.col("centroid_id"), F.col("c_emb").alias("emb")), bits=bits
    ).select("centroid_id", "tbl", "code")
    # The candidate set deliberately KEEPS duplicates (a vector whose
    # codes match a centroid in several LSH tables scores that centroid
    # several times): the two-phase MIN argmin below is invariant to
    # duplicate (vec_id, centroid_id) rows — identical d2, identical
    # min — so results match the oracle's SELECT DISTINCT form exactly,
    # while Spark skips a full n x ~124-row DISTINCT exchange AND the
    # disk round-trip of checkpointing it (round 7: the pair cost the
    # 1000x sweep measured in every assignment round). The broadcast
    # hash join is map-side and cheap to recompute for the fallback's
    # left_anti, whose right side compacts to n rows map-side anyway.
    cand = vcodes.join(F.broadcast(ccodes), ["tbl", "code"]).select(
        "vec_id", "centroid_id"
    )
    fallback = (
        e.select("vec_id")
        .join(cand.select("vec_id").distinct(), "vec_id", "left_anti")
        .crossJoin(F.broadcast(c.select("centroid_id")))
    )
    cand_all = cand.unionByName(fallback)
    # Single-pass argmin (round 7): min(struct(d2, centroid_id)) is
    # lexicographic — min d2 first, then min centroid_id among exact
    # d2 ties — IDENTICAL to the oracle's two-phase MIN ordering (both
    # engines compute d2 from the same expression, so ties are the
    # same bit-equal doubles). One map-side partial aggregation
    # replaces the previous shape's DISK_ONLY checkpoint of the
    # n x ~124-row scored frame PLUS its re-join against the per-vec
    # min PLUS a second aggregation: the scored rows now collapse to n
    # rows inside the map task and the wide frame never exists outside
    # the pipeline. (The checkpoint itself was the round-6 fix for
    # protected-storage pinning; not materializing at all supersedes
    # it.)
    return (
        cand_all.join(e.select("vec_id", "emb"), "vec_id")
        .join(F.broadcast(c), "centroid_id")
        .selectExpr(
            "vec_id",
            f"named_struct('d2', {_D2_SPARK}, 'centroid_id', centroid_id) AS s",
        )
        .groupBy("vec_id")
        .agg(F.min("s").alias("s"))
        .selectExpr("vec_id", "s.centroid_id AS centroid_id")
    )


def _sem_mean_update(assigned: DataFrame, e: DataFrame) -> DataFrame:
    """Lloyd mean step: recompute each centroid as its members' mean,
    per (centroid, dim) with map-side partial aggregation. Means go
    through DECIMAL(38,20) so the centroid doubles are bit-identical
    across engines (same trick as ann_ivf_trained); empty cells drop
    out of the codebook naturally."""
    members = assigned.join(e.select("vec_id", "emb"), "vec_id").select(
        "centroid_id", F.posexplode("emb").alias("pos", "val")
    )
    dims = members.groupBy("centroid_id", "pos").agg(
        (
            F.sum(F.col("val").cast("decimal(38,20)")).cast("double") / F.count("*")
        ).alias("cv")
    )
    return materialize(
        dims.groupBy("centroid_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)"
            ).alias("c_emb")
        )
        .selectExpr(
            "centroid_id",
            "c_emb",
            "aggregate(zip_with(c_emb, c_emb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS c_norm2",
        )
    )


def _prune_cluster_pdf(pdf):
    """Per-cluster SemDeDup prune kernel (applyInPandas): for each
    vector (ascending vec_id) find the LOWEST-id earlier member with
    quantized cosine >= _SEM_T. The pairwise kernel is inherently
    quadratic WITHIN a cluster — exactly the case the PySpark guide
    reserves for vectorized Python: the previous pure-SQL self-join
    evaluated an interpreted zip_with fold per pair (64% of the 1000x
    query's core-seconds), while one numpy row-sweep per member is
    vectorized across the cluster. Parity is BY CONSTRUCTION: the dot
    is the order-independent floor-quantized int64 sum mirrored
    literally in _PAIR_COS_Q_DUCK, nrm comes in as the column Spark
    computed (never recomputed here), and the division order matches
    the oracle expression. Memory: one (j x dim) product block at a
    time, so a cluster of width w costs O(w * dim) per step — K ~
    n/250 bounds expected w; a degenerate all-identical corpus is
    quadratic in ANY implementation of this operator's semantics."""
    import numpy as np
    import pandas as pd

    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    X = np.stack(pdf["emb"].to_numpy()) if len(pdf) else np.empty((0, 0))
    nrm = pdf["nrm"].to_numpy()
    pruned_by = [None] * len(ids)
    for j in range(1, len(ids)):
        scaled = X[:j] * X[j] * _SEM_Q
        # Loud range check (ADVICE r7): .astype(np.int64) silently
        # WRAPS a scaled term >= 2^63 while the oracle's CAST(... AS
        # BIGINT) raises Out of Range — extreme-magnitude embeddings
        # (|a_i*b_i| >= 2^23) must fail identically on both engines,
        # not diverge quietly.
        if scaled.size and float(np.abs(scaled).max()) >= 2.0**63:
            raise ValueError(
                "semdedup prune: quantized dot term out of int64 range "
                "(embedding magnitudes too large for the 2^40 scale)"
            )
        q = np.floor(scaled).astype(np.int64).sum(axis=1)
        denom = nrm[:j] * nrm[j]
        ok = denom != 0
        cos = np.zeros(j)
        cos[ok] = (q[ok].astype(np.float64) / _SEM_Q) / denom[ok]
        hits = np.nonzero(ok & (cos >= _SEM_T))[0]
        if hits.size:
            pruned_by[j] = int(ids[hits[0]])  # ids ascending -> min id
    return pd.DataFrame(
        {
            "vec_id": ids,
            "centroid_id": pdf["centroid_id"].to_numpy(),
            "kept": [p is None for p in pruned_by],
            "pruned_by": pd.array(pruned_by, dtype="Int64"),
        }
    )


@register("semdedup_prune", oracle=_semdedup_oracle(_SEM_TRAIN_ITERS))
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embeddings,
    then within each cluster prune any vector that has a lower-id
    neighbor with cosine >= threshold (keep-lowest-id — deterministic
    stand-in for the paper's keep-one-per-group). Output: every vec_id
    with its cluster, kept flag, and the keeper that shadows it.

    Centroids are TRAINED, per the paper's recipe: seeds are the K
    lowest vec_ids (rank-based — robust to sparse/offset ids, ADVICE
    r3), then _SEM_TRAIN_ITERS Lloyd rounds reuse the ann_ivf_trained
    loop shape on squared-Euclidean argmin (assign via the LSH-pruned
    helper below, mean update in DECIMAL so both engines see
    bit-identical centroids). Above _SEM_TRAIN_SAMPLE_MIN_N vectors the
    Lloyd rounds train on a DETERMINISTIC ~1/4 md5 hash-sample of the
    corpus (VERDICT r6 #1): training cost drops 4x per round while
    every vector still gets a final assignment and prune pass —
    clusters whose sampled membership is empty drop out of the
    codebook identically on both engines. Training tightens
    clusters — measured intra-cluster mean d2 drops vs the seeded
    codebook (tests/test_round3_ops.py) — which is what bounds the
    prune stage's within-cluster pair count.

    Round 8: the LSH code WIDTH is corpus-adaptive (bits = 8 +
    ladder(K), see _sem_bits) so the candidate space grows with the
    codebook instead of saturating — the fixed 1024-slot space made
    the fourth-decade training assignment ~n*K/64 (4.20x wall for 3x
    data, BASELINE.md round 7). The oracle computes the same ladder
    from its k CTE and masks MAX_BITS codes modulo 2^bits, which is
    bit-identical to generating bits-wide codes.

    Scale shape: the K centroids broadcast every round (argmin is a
    codegen'd fold per row, big side never shuffles for assignment);
    the prune shuffles once on centroid_id into a vectorized
    per-cluster applyInPandas kernel (_prune_cluster_pdf — quantized
    order-independent dot, oracle-mirrored by construction) and is
    quadratic only within a cluster — K = max(8, ceil(n / 250)) grows
    with the corpus (the paper's own knob) so cluster width, and with
    it the total pair count, stays LINEAR in n; the first 10x sweep
    with a fixed K=8 measured 30x and motivated this. Norms are
    precomputed per vector by Spark and passed through to the kernel
    unchanged. Assignment is LSH-pruned: brute-force n x K
    assignment with K ~ n re-measured 9.3x/decade at the 100x sweep;
    pruning cuts candidates ~64x and the fallback fraction decays
    exponentially in K, so the approximation tightens exactly where it
    is cheap (small K) and prunes exactly where it matters (large K).
    The oracle mirrors seeds, every training round, and the pruning
    rule bit-for-bit, so the APPROXIMATE assignment itself is
    value-checked cross-engine."""
    t = load_tables(spark, sf_dir)
    e = spread(t["embeddings"]).selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb",
    ).selectExpr(
        "vec_id",
        "emb",
        "sqrt(aggregate(zip_with(emb, emb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)) AS nrm",
    )
    e = materialize(e, big=True)  # corpus-sized embedding frame
    # Single driver-side scalar (accepted pattern, cf. pipeline.py
    # n_docs): K must be known to pick the centroid set.
    n_vecs = t["embeddings"].count()
    k = max(_SEM_MIN_K, -(-n_vecs // _SEM_DOCS_PER_CLUSTER))
    bits = _sem_bits(k)  # corpus-adaptive code width (see ladder note)
    # Rank-based seeds (K lowest vec_ids): TakeOrdered partial top-k,
    # not a vec_id < k filter that silently shrinks on sparse ids.
    c = e.orderBy("vec_id").limit(k).selectExpr(
        "vec_id AS centroid_id",
        "emb AS c_emb",
        "aggregate(zip_with(emb, emb, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS c_norm2",
    )
    vcodes = add_lsh_codes(e.select("vec_id", "emb"), bits=bits).select(
        "vec_id", "tbl", "code"
    )
    # Training set: deterministic ~1/4 md5 hash-sample above the
    # corpus-size threshold (see _SEM_TRAIN_SAMPLE_* above). Only the
    # Lloyd rounds shrink; the final assignment and the prune below
    # still run over e/vcodes. n_vecs is already on the driver, so the
    # branch costs nothing extra; the oracle mirrors it via a scalar
    # COUNT(*) subquery.
    if n_vecs >= _SEM_TRAIN_SAMPLE_MIN_N:
        es = materialize(e.filter(F.expr(_SEM_TRAIN_SAMPLE_SPARK)), big=True)
        vscodes = vcodes.filter(F.expr(_SEM_TRAIN_SAMPLE_SPARK))
    else:
        es, vscodes = e, vcodes
    for _ in range(_SEM_TRAIN_ITERS):
        c = _sem_mean_update(_sem_assign(es, vscodes, c, bits), es)
    # The checkpoint here is a JOB BARRIER, not just reuse (round 7):
    # the prune consumes the assignment only once, but dropping the
    # materialize merged the final assignment's sort-based struct-min
    # aggregation and the prune into ONE job whose independent stages
    # ran concurrently — measured heap OOM at 1000x where the
    # barriered form completes. DISK_ONLY per the corpus-sized-frame
    # rule; the Arrow grouped-map below then reads compact
    # checkpointed blocks.
    assigned = materialize(
        _sem_assign(e, vcodes, c, bits)
        .join(e, "vec_id")
        .select("vec_id", "centroid_id", "emb", "nrm"),
        big=True,
    )
    return assigned.groupBy("centroid_id").applyInPandas(
        _prune_cluster_pdf,
        "vec_id bigint, centroid_id bigint, kept boolean, pruned_by bigint",
    )


# ------------------------------------------- substring-span dedup

_SPAN_K = 5  # k-gram width (tokens)

_SPAN_ORACLE = f"""
    WITH docs AS (
      SELECT doc_id, {_TOKS_DUCK} AS toks FROM documents
    ), grams AS (
      SELECT doc_id, unnest(generate_series(1, len(toks) - {_SPAN_K - 1})) AS pos,
             toks
      FROM docs WHERE len(toks) >= {_SPAN_K}
    ), g AS (
      SELECT doc_id, pos,
             CAST(('0x' || substr(md5(
               concat_ws(' ', {", ".join(f"list_extract(toks, pos + {j})" for j in range(_SPAN_K))})
             ), 1, 15)) AS BIGINT) AS gram_h
      FROM grams
    ), dup AS (
      SELECT gram_h FROM g GROUP BY gram_h HAVING COUNT(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT g.doc_id, g.pos,
             g.pos - ROW_NUMBER() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS grp
      FROM g JOIN dup USING (gram_h)
    )
    SELECT doc_id, MIN(pos) AS span_start,
           MAX(pos) + {_SPAN_K - 1} AS span_end,
           MAX(pos) + {_SPAN_K} - MIN(pos) AS span_tokens,
           COUNT(*) AS n_grams
    FROM hits GROUP BY doc_id, grp
"""


@register("dedup_substring_spans", oracle=_SPAN_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup (Lee et al. 2022, k-gram form): maximal
    token spans whose every k-gram occurs in >= 2 distinct documents —
    the spans an exact-substring dedup pass would cut from the
    training mix (doc-level near-dup misses these when two long
    documents share only a paragraph). Gaps-and-islands merge:
    duplicated k-gram start positions, grouped by pos - row_number.

    Scale shape: inverted k-gram index (one groupBy on the gram key
    with map-side partial distinct), joined back to the position table.
    The key is a 60-bit md5 prefix of the gram TEXT, computed map-side
    before the exchange: the 100x sweep measured 1.8 GB of gram-text
    shuffle (VERDICT r3 #5); hashing cuts the shuffled key to 8 bytes.
    Both engines hash identically, so a (astronomically rare, ~n^2/2^61)
    colliding gram pair merges doc counts identically on both sides —
    and a false-positive span is exactly the error class a k-gram
    dedup already tolerates. The dup side carries exactly one row per
    duplicated gram, so the join is 1:1 per (doc, pos) — a boilerplate
    gram in 10k docs produces 10k rows total, NOT 10k^2 (contrast the
    pairwise jaccard join and its df cap). The island merge is one
    window + one aggregate, both keyed by doc_id."""
    t = load_tables(spark, sf_dir)
    docs = spread(t["documents"]).selectExpr("doc_id", f"{_TOKS} AS toks")
    g = (
        docs.filter(F.expr(f"size(toks) >= {_SPAN_K}"))
        .select(
            "doc_id",
            "toks",
            F.explode(F.expr(f"sequence(1, size(toks) - {_SPAN_K - 1})")).alias("pos"),
        )
        .selectExpr(
            "doc_id",
            "pos",
            "CAST(conv(substring(md5(concat_ws(' ', "
            + ", ".join(f"element_at(toks, pos + {j})" for j in range(_SPAN_K))
            + ")), 1, 15), 16, 10) AS BIGINT) AS gram_h",
        )
    )
    g = materialize(g, big=True)  # one row per (doc, gram): corpus-sized
    # "occurs in >= 2 distinct docs" == min(doc_id) != max(doc_id):
    # COUNT(DISTINCT doc_id) plans a partial DEDUP map keyed by every
    # (gram_h, doc_id) pair — grams are near-unique, so the map holds
    # ~every input row and the fourth-decade run OOMed inside it
    # (round 7). min/max partial-aggregate keyed by gram_h alone (one
    # 24-byte entry per gram, one exchange level fewer), and the dup
    # SET is provably identical, so the oracle keeps its literal
    # HAVING COUNT(DISTINCT doc_id) >= 2 form — dup feeds only a
    # semi-join, no reported value involves the count.
    dup = (
        g.groupBy("gram_h")
        .agg(F.min("doc_id").alias("d_min"), F.max("doc_id").alias("d_max"))
        .filter(F.col("d_min") != F.col("d_max"))
        .select("gram_h")
    )
    hits = g.join(dup, "gram_h").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (_SPAN_K - 1)).alias("span_end"),
            (F.max("pos") + _SPAN_K - F.min("pos")).alias("span_tokens"),
            F.count("*").alias("n_grams"),
        )
        .select("doc_id", "span_start", "span_end", "span_tokens", "n_grams")
    )


# --------------------------------------- hashed linear classifier

_CLS_BUCKETS = 1024
# w(bucket) = ((bucket * 2654435761) % 2001 - 1000) / 1000 in [-1, 1]:
# a deterministic stand-in for trained fastText weights (Knuth
# multiplicative hash spreads buckets uniformly). Integer arithmetic
# end-to-end until the final divide, so both engines agree exactly.
_CLS_WMUL = 2654435761
_CLS_WMOD = 2001

_CLS_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKS_DUCK}) AS token FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % {_CLS_BUCKETS} AS bucket
      FROM toks
    ), scored AS (
      SELECT doc_id,
             COUNT(*) AS n_toks,
             SUM((bucket * {_CLS_WMUL}) % {_CLS_WMOD} - 1000) AS w_sum
      FROM feats GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(s.n_toks, 0) AS n_toks,
           ROUND(1.0 / (1.0 + exp(-(COALESCE(s.w_sum, 0) / (1000.0 * GREATEST(COALESCE(s.n_toks, 0), 1))))), 6) AS score,
           ROUND(1.0 / (1.0 + exp(-(COALESCE(s.w_sum, 0) / (1000.0 * GREATEST(COALESCE(s.n_toks, 0), 1))))), 6) >= 0.5 AS keep
    FROM documents d LEFT JOIN scored s ON s.doc_id = d.doc_id
"""


@register("quality_classifier_hashed", oracle=_CLS_ORACLE)
def quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped quality classifier: hash each token into one of
    1024 buckets (md5, same 60-bit trick as the minhash stage), score a
    document as sigmoid(mean bucket weight), keep if score >= 0.5.
    Weights here are formula-derived (deterministic stand-in for a
    trained model) so the whole scorer is arithmetic — swapping real
    weights in means one broadcast map lookup, still JVM-side.

    Scale shape: explode -> map-side partial SUM/COUNT -> one shuffle
    keyed by doc_id; the weight "table" costs nothing (pure
    expression). Zero-token docs survive the LEFT JOIN with
    score = sigmoid(0) = 0.5 — the same empty-token guard the gopher
    oracle needed (ADVICE r2)."""
    t = load_tables(spark, sf_dir)
    docs = spread(t["documents"])
    feats = docs.selectExpr("doc_id", f"explode({_TOKS}) AS token").selectExpr(
        "doc_id",
        f"CAST(conv(substring(md5(token), 1, 15), 16, 10) AS BIGINT) % {_CLS_BUCKETS} AS bucket",
    )
    scored = feats.groupBy("doc_id").agg(
        F.count("*").alias("n_toks"),
        F.sum(F.expr(f"(bucket * {_CLS_WMUL}) % {_CLS_WMOD} - 1000")).alias("w_sum"),
    )
    score = (
        "ROUND(1.0 / (1.0 + exp(-(COALESCE(w_sum, 0) / "
        "(1000.0 * GREATEST(COALESCE(n_toks, 0), 1))))), 6)"
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "COALESCE(n_toks, 0) AS n_toks",
            f"{score} AS score",
            f"{score} >= 0.5 AS keep",
        )
    )


# ------------------------------------------------ per-domain cap

_DOMAIN_CAP = 15  # keep top-N docs per source (quality-ordered)

_DOMAIN_ORACLE = f"""
    SELECT doc_id, source, rank, rank <= {_DOMAIN_CAP} AS kept FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents
    )
"""


def _ranged_local_rank(d: DataFrame, nparts: int) -> DataFrame:
    """Stage 1-2 of the skew-safe exact rank: range-partition on the
    full (source, n_chars DESC, doc_id) ordering, then row_number per
    (range-partition id, source) — group width bounded by the balanced
    partition size no matter how skewed the source key is."""
    ranged = d.repartitionByRange(
        nparts, F.col("source"), F.col("n_chars").desc(), F.col("doc_id")
    ).withColumn("pid", F.spark_partition_id())
    w_local = Window.partitionBy("pid", "source").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return ranged.withColumn("local_rank", F.row_number().over(w_local))


def _rank_offsets(local: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Stage 3 of the skew-safe exact rank, shared by the domain-cap
    and percentile operators: per-(partition, source) counts (tiny —
    sources are contiguous under the range order) cumulated per source
    over ascending partition id. Returns (cnt, offs): offs carries
    each partition's rank offset to broadcast-join back; cnt also
    yields per-source totals for percentile denominators."""
    cnt = local.groupBy("pid", "source").agg(F.count("*").alias("cnt"))
    w_off = (
        Window.partitionBy("source")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cnt.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    ).select("pid", "source", "off")
    return cnt, offs


@register("domain_cap_documents", oracle=_DOMAIN_ORACLE)
def domain_cap_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap, audit form: rank each source's
    documents by a quality proxy (n_chars DESC, doc_id tiebreak) and
    flag the top _DOMAIN_CAP — the standard guard against one crawl
    domain flooding the mix. Emits every doc with its rank and kept
    flag so the dropped set is auditable.

    Scale shape — range-partitioned exact ranking, NOT a per-source
    window. `row_number().over(partitionBy(source))` puts an entire
    domain in ONE task; a mega-domain (billions of docs behind one
    crawl host — the precise case this operator exists for) is a
    straggler/OOM, and AQE's skew handling does not apply to window
    partitions (VERDICT r3). Instead:

      1. repartitionByRange on the FULL rank ordering
         (source, n_chars DESC, doc_id) — doc_id is unique, so the
         ordering is total and the range partitioner can always split
         a mega-domain evenly across tasks;
      2. local row_number per (range-partition, source) — group width
         is bounded by the partition size regardless of domain skew;
      3. per-(partition, source) counts (tiny: sources are contiguous
         under the range order, so ~n_partitions + n_sources rows)
         cumulated per source over ascending partition id give each
         partition's rank offset, broadcast-joined back.

    Range order guarantees every row in partition i sorts before every
    row in partition i+1, so local_rank + offset IS the exact global
    per-source rank; AQE coalescing merges only adjacent range
    partitions, which preserves the invariant. Cost: two balanced
    shuffles of (doc_id, source, n_chars) + one broadcast — vs one
    shuffle with an unbounded straggler. The kept-set form that needs
    no ranks at all is domain_cap_kept below."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "source", "n_chars")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    # Materialized because both the offset aggregation and the final
    # join read it; the plan gate inspects _ranged_local_rank directly
    # (localCheckpoint truncates the visible plan to Scan ExistingRDD).
    local = materialize(_ranged_local_rank(d, nparts))
    _, offs = _rank_offsets(local)
    return (
        local.join(F.broadcast(offs), ["pid", "source"])
        .withColumn("rank", (F.col("local_rank") + F.col("off")).cast("int"))
        .select(
            "doc_id",
            "source",
            "rank",
            (F.col("rank") <= _DOMAIN_CAP).alias("kept"),
        )
    )


_DOMAIN_KEPT_ORACLE = f"""
    SELECT doc_id, source, rank FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents
    ) WHERE rank <= {_DOMAIN_CAP}
"""


@register("domain_cap_kept", oracle=_DOMAIN_KEPT_ORACLE)
def domain_cap_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain cap, kept-set form: emit ONLY the top _DOMAIN_CAP
    documents per source — the variant a production mix-builder
    actually feeds downstream (the audit form above keeps every row).

    Scale shape: because the rank filter is part of the operator,
    Catalyst rewrites the window into WindowGroupLimit (plan-gated in
    tests/test_plans.py): every map task keeps at most _DOMAIN_CAP
    rows per source BEFORE the exchange, so a billion-doc mega-domain
    ships ~cap rows per upstream partition instead of the whole
    domain, and the post-shuffle group is bounded by
    cap x n_map_partitions regardless of skew."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        t["documents"]
        .select("doc_id", "source", "n_chars")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _DOMAIN_CAP)
        .select("doc_id", "source", "rank")
    )


# ------------------------------------------ DSIR importance weights

# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score every raw document by the log-likelihood
# ratio of a TARGET distribution vs the RAW distribution under a
# hashed bag-of-ngrams model, then resample the raw corpus toward the
# target. Here: unigram features hashed into _CLS_BUCKETS buckets (the
# classifier's md5 trick), target = the 'src1' slice (a deterministic
# stand-in for "a Wikipedia-quality seed set"), add-one smoothing.
_DSIR_TARGET = "src1"


def _dsir_oracle_sql(table: str = "documents") -> str:
    """The DSIR scoring chain over an arbitrary (doc_id, source, text)
    relation — `documents` for the standalone entry, the curated
    survivor set for corpus_curation_pipeline_v3."""
    return f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_TOKS_DUCK}) AS token FROM {table}
    ), feats AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % {_CLS_BUCKETS} AS bucket
      FROM toks
    ), raw AS (
      SELECT bucket, COUNT(*) AS cr FROM feats GROUP BY bucket
    ), tgt AS (
      SELECT bucket, COUNT(*) AS ct FROM feats
      WHERE source = '{_DSIR_TARGET}' GROUP BY bucket
    ), nt AS (SELECT COUNT(*) AS n FROM feats WHERE source = '{_DSIR_TARGET}'),
    nr AS (SELECT COUNT(*) AS n FROM feats),
    lr AS (
      SELECT r.bucket,
             ROUND(ln(COALESCE(t.ct, 0) + 1) - ln(nt.n + {_CLS_BUCKETS})
                   - ln(r.cr + 1) + ln(nr.n + {_CLS_BUCKETS}), 6) AS lnr
      FROM raw r LEFT JOIN tgt t USING (bucket) CROSS JOIN nt CROSS JOIN nr
    ), scored AS (
      SELECT f.doc_id, CAST(lr.lnr AS DECIMAL(28,9)) AS lnr
      FROM feats f JOIN lr USING (bucket)
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_toks,
             ROUND(CAST(SUM(lnr) AS DOUBLE), 6) AS log_weight
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_toks, 0) AS BIGINT) AS n_toks,
           COALESCE(a.log_weight, 0.0) AS log_weight,
           COALESCE(a.log_weight, 0.0) >= 0 AS selected
    FROM {table} d LEFT JOIN agg a USING (doc_id)
"""


_DSIR_ORACLE = _dsir_oracle_sql()


def _dsir_oracle_xt(train_table: str, score_table: str) -> str:
    """Cross-trained DSIR oracle: raw/target unigram models fit on
    `train_table`, every `score_table` row scored — the production
    ingest shape where models are trained once on the existing corpus
    and each arriving batch is scored against them. Unlike the
    same-table form, a scored token can hash to a bucket the training
    corpus never produced, so the log-ratio table is built over the
    full 0..N-1 bucket spine with COALESCE(0) counts (add-one
    smoothing keeps every bucket finite)."""
    return f"""
    WITH t_toks AS (
      SELECT doc_id, source, unnest({_TOKS_DUCK}) AS token FROM {train_table}
    ), t_feats AS (
      SELECT source,
             CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % {_CLS_BUCKETS} AS bucket
      FROM t_toks
    ), raw AS (
      SELECT bucket, COUNT(*) AS cr FROM t_feats GROUP BY bucket
    ), tgt AS (
      SELECT bucket, COUNT(*) AS ct FROM t_feats
      WHERE source = '{_DSIR_TARGET}' GROUP BY bucket
    ), nt AS (SELECT COUNT(*) AS n FROM t_feats WHERE source = '{_DSIR_TARGET}'),
    nr AS (SELECT COUNT(*) AS n FROM t_feats),
    spine AS (SELECT unnest(generate_series(0, {_CLS_BUCKETS - 1})) AS bucket),
    lr AS (
      SELECT s.bucket,
             ROUND(ln(COALESCE(t.ct, 0) + 1) - ln(nt.n + {_CLS_BUCKETS})
                   - ln(COALESCE(r.cr, 0) + 1) + ln(nr.n + {_CLS_BUCKETS}), 6) AS lnr
      FROM spine s
      LEFT JOIN raw r USING (bucket) LEFT JOIN tgt t USING (bucket)
      CROSS JOIN nt CROSS JOIN nr
    ), s_feats AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % {_CLS_BUCKETS} AS bucket
      FROM (SELECT doc_id, unnest({_TOKS_DUCK}) AS token FROM {score_table})
    ), agg AS (
      SELECT f.doc_id, COUNT(*) AS n_toks,
             ROUND(CAST(SUM(CAST(lr.lnr AS DECIMAL(28,9))) AS DOUBLE), 6) AS log_weight
      FROM s_feats f JOIN lr USING (bucket) GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(a.n_toks, 0) AS BIGINT) AS n_toks,
           COALESCE(a.log_weight, 0.0) AS log_weight,
           COALESCE(a.log_weight, 0.0) >= 0 AS selected
    FROM {score_table} d LEFT JOIN agg a USING (doc_id)
"""


def _dsir_scores_xt(train_docs: DataFrame, score_docs: DataFrame) -> DataFrame:
    """Spark side of _dsir_oracle_xt: fit the bucket models on
    train_docs (doc_id, source, text), score score_docs. Both model
    tables are bounded at _CLS_BUCKETS rows (full spine) and
    broadcast; the only corpus-wide shuffle is the per-doc DECIMAL
    sum. Same rounding discipline as dsir_importance_weights."""
    t_feats = materialize(
        train_docs.selectExpr("source", f"explode({_TOKS}) AS token").selectExpr(
            "source",
            f"CAST(conv(substring(md5(token), 1, 15), 16, 10) AS BIGINT) % {_CLS_BUCKETS} AS bucket",
        )
    )
    spark = train_docs.sparkSession
    raw = t_feats.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt = (
        t_feats.filter(F.col("source") == _DSIR_TARGET)
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )
    nt = t_feats.filter(F.col("source") == _DSIR_TARGET).agg(
        F.count("*").alias("n_t")
    )
    nr = t_feats.agg(F.count("*").alias("n_r"))
    spine = spark.range(_CLS_BUCKETS).select(F.col("id").alias("bucket"))
    lr = (
        spine.join(raw, "bucket", "left")
        .join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .selectExpr(
            "bucket",
            f"CAST(ROUND(ln(COALESCE(ct, 0) + 1) - ln(n_t + {_CLS_BUCKETS})"
            f" - ln(COALESCE(cr, 0) + 1) + ln(n_r + {_CLS_BUCKETS}), 6) AS DECIMAL(28,9)) AS lnr",
        )
    )
    s_feats = score_docs.selectExpr(
        "doc_id", f"explode({_TOKS}) AS token"
    ).selectExpr(
        "doc_id",
        f"CAST(conv(substring(md5(token), 1, 15), 16, 10) AS BIGINT) % {_CLS_BUCKETS} AS bucket",
    )
    agg = (
        s_feats.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.round(F.sum("lnr").cast("double"), 6).alias("log_weight"),
        )
    )
    return (
        score_docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "CAST(COALESCE(n_toks, 0) AS BIGINT) AS n_toks",
            "COALESCE(log_weight, 0.0D) AS log_weight",
            "COALESCE(log_weight, 0.0D) >= 0 AS selected",
        )
    )


@register("dsir_importance_weights", oracle=_DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023): per-document log importance weight
    ln p_target(doc) - ln p_raw(doc) under add-one-smoothed hashed
    unigram models, the standard importance-resampling score for
    steering a 100 TB raw crawl toward a high-quality seed
    distribution. `selected` marks docs the target model likes at
    least as much as the raw model (the deterministic stand-in for
    the paper's Gumbel-top-k resample).

    Scale shape: both bucket tables are bounded at _CLS_BUCKETS rows
    regardless of corpus size — one map-side-partial count pass each,
    then broadcast; scoring is a broadcast join per token with a
    DECIMAL map-side-partial sum per doc (one shuffle keyed by
    doc_id). Per-bucket log-ratios are rounded to 6 decimals BEFORE
    the decimal sum — coarse enough that a 1-ulp JVM-vs-libm ln()
    divergence (4 ln calls x 1024 buckets; a 9-decimal grid measured a
    real flip at sf0.1) sits ~9 orders inside the rounding grid — and
    the order-independent DECIMAL sum is emitted at the SAME 6-decimal
    scale (an identity round): a COARSER final round would land on
    exact .5 half-cases of the decimal grid, which Spark (BigDecimal
    HALF_UP on the decimal string) and DuckDB (binary-double rounding)
    break differently — measured as 42 one-ulp-of-grid mismatches at
    sf0.1 before this was pinned."""
    t = load_tables(spark, sf_dir)
    return _dsir_scores(spread(t["documents"]))


def _dsir_scores(docs: DataFrame) -> DataFrame:
    """The DSIR scoring chain over an arbitrary (doc_id, source, text)
    frame — raw and target unigram models are trained on THIS corpus,
    every row of it is scored. corpus_curation_pipeline_v3 feeds the
    gated+deduped+capped survivor set here (the order Xie et al. run);
    the standalone entry feeds the whole documents table."""
    feats = materialize(
        docs.selectExpr("doc_id", "source", f"explode({_TOKS}) AS token").selectExpr(
            "doc_id",
            "source",
            f"CAST(conv(substring(md5(token), 1, 15), 16, 10) AS BIGINT) % {_CLS_BUCKETS} AS bucket",
        )
    )
    raw = feats.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt = (
        feats.filter(F.col("source") == _DSIR_TARGET)
        .groupBy("bucket")
        .agg(F.count("*").alias("ct"))
    )
    nt = feats.filter(F.col("source") == _DSIR_TARGET).agg(
        F.count("*").alias("n_t")
    )
    nr = feats.agg(F.count("*").alias("n_r"))
    lr = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
        .selectExpr(
            "bucket",
            f"CAST(ROUND(ln(COALESCE(ct, 0) + 1) - ln(n_t + {_CLS_BUCKETS})"
            f" - ln(cr + 1) + ln(n_r + {_CLS_BUCKETS}), 6) AS DECIMAL(28,9)) AS lnr",
        )
    )
    agg = (
        feats.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.round(F.sum("lnr").cast("double"), 6).alias("log_weight"),
        )
    )
    return (
        docs.select("doc_id")
        .join(agg, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "CAST(COALESCE(n_toks, 0) AS BIGINT) AS n_toks",
            "COALESCE(log_weight, 0.0D) AS log_weight",
            "COALESCE(log_weight, 0.0D) >= 0 AS selected",
        )
    )


# --------------------------------- per-source quality percentile

_PCTL_ORACLE = """
    SELECT doc_id, source,
           ROUND(PERCENT_RANK() OVER (PARTITION BY source
                                      ORDER BY n_chars DESC, doc_id), 6) AS pctl
    FROM documents
"""


@register("quality_percentile_by_source", oracle=_PCTL_ORACLE)
def quality_percentile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-percentile calibration: each document's
    percent rank within its source under the quality ordering
    (n_chars DESC, doc_id) — the normalization step before mixing
    sources with different score distributions (keep "top 20% of each
    source" instead of one global threshold a verbose source would
    dominate).

    Scale shape: the same skew-safe exact-rank machinery as
    domain_cap_documents (_ranged_local_rank: range partition over the
    full ordering, local row_number, broadcast offsets) plus tiny
    per-source totals — a PERCENT_RANK window partitioned by source
    would put a mega-domain in one task. percent_rank ==
    (row_number - 1) / (n - 1) because the ordering is total (doc_id
    tiebreak); single-document sources score 0 in both engines."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select("doc_id", "source", "n_chars")
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    local = materialize(_ranged_local_rank(d, nparts))
    cnt, offs = _rank_offsets(local)
    totals = cnt.groupBy("source").agg(F.sum("cnt").alias("n_src"))
    return (
        local.join(F.broadcast(offs), ["pid", "source"])
        .join(F.broadcast(totals), "source")
        .selectExpr(
            "doc_id",
            "source",
            "CASE WHEN n_src = 1 THEN 0.0D ELSE"
            " ROUND((local_rank + off - 1) / CAST(n_src - 1 AS DOUBLE), 6)"
            " END AS pctl",
        )
    )


# --------------------------------- classifier training (round 5)

_LR_RATE = "0.1"  # learning rate, literal on both engines

_LR_TRAIN_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_TOKS_DUCK}) AS token FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % {_CLS_BUCKETS} AS bucket,
             COUNT(*) AS x
      FROM toks GROUP BY doc_id, bucket
    ), labels AS (
      SELECT doc_id, CASE WHEN source = '{_DSIR_TARGET}' THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    g1 AS (
      -- step 1: w0 = 0 so every p = sigmoid(0) = 0.5 exactly;
      -- (0.5 - y) * x lands on the 0.5 grid -> DECIMAL-exact sum
      SELECT f.bucket,
             SUM(CAST((0.5 - l.y) * f.x AS DECIMAL(28,1))) AS grad
      FROM feats f JOIN labels l USING (doc_id) GROUP BY f.bucket
    ), w1 AS (
      SELECT bucket,
             ROUND(-{_LR_RATE} * CAST(grad AS DOUBLE) / n.n_docs, 6) AS w
      FROM g1 CROSS JOIN n
    ), z AS (
      -- per-term product rounded to a 9-decimal grid, DECIMAL sum ->
      -- the dot product is order-independent on both engines
      SELECT f.doc_id,
             CAST(SUM(CAST(ROUND(w1.w * f.x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS z
      FROM feats f JOIN w1 USING (bucket) GROUP BY f.doc_id
    ), p AS (
      SELECT doc_id, ROUND(1.0 / (1.0 + exp(-z)), 6) AS p FROM z
    ), g2 AS (
      -- (p - y) sits on the 1e-6 grid; times an integer count it is
      -- exactly representable in DECIMAL(28,6) -> exact sum again
      SELECT f.bucket,
             SUM(CAST(p.p - l.y AS DECIMAL(18,6)) * f.x) AS grad
      FROM feats f JOIN p USING (doc_id) JOIN labels l USING (doc_id)
      GROUP BY f.bucket
    )
    SELECT w1.bucket,
           w1.w AS w_step1,
           ROUND(w1.w - {_LR_RATE} * CAST(g2.grad AS DOUBLE) / n.n_docs, 6) AS w_step2
    FROM w1 JOIN g2 USING (bucket) CROSS JOIN n
"""


@register("classifier_lr_train", oracle=_LR_TRAIN_ORACLE)
def classifier_lr_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAIN the hashed quality classifier in-engine: two full-batch
    gradient-descent steps of logistic regression over hashed unigram
    count features (y = doc is from the 'src1' seed source, the same
    target convention DSIR uses). Completes the classifier surface —
    quality_classifier_hashed applies fixed weights; this is where
    those weights come from when no external trainer is available, the
    fastText-at-100 TB story run as two aggregation passes.

    Scale shape: each step is one broadcast-joined pass over the
    (doc, bucket, count) features with a map-side-partial DECIMAL
    gradient sum into a table bounded at 1024 rows; the per-doc margin
    z is one more bounded-broadcast join + per-doc sum. Nothing ever
    shuffles more than (doc_id | bucket)-keyed narrow rows.

    Determinism: step 1 uses w0 = 0, so p = 0.5 EXACTLY and the
    gradient is a pure DECIMAL sum; step 2 rounds each dot-product
    term to a 9-decimal grid before the DECIMAL sum, rounds the
    sigmoid to 6 decimals (the 1-ulp exp() engine divergence sits ~5
    orders inside that grid — the perplexity op's argument), and
    (p - y) * count is exactly representable in DECIMAL(28,6)."""
    w, _feats = _lr_train_parts(spark, sf_dir)
    return w


def _lr_train_parts(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """classifier_lr_train's body, returning (weights, feats) so the
    train-then-apply query can SCORE on the same checkpointed feature
    table training already built instead of re-running the
    tokenize/md5/count pass — one full corpus tokenization saved per
    composed run (round 11; guide §1.2 'don't compute things twice').
    Row-identical to recomputing: feats is deterministic per corpus."""
    t = load_tables(spark, sf_dir)
    docs = spread(t["documents"])
    feats = materialize(
        docs.selectExpr("doc_id", f"explode({_TOKS}) AS token")
        .selectExpr(
            "doc_id",
            f"CAST(conv(substring(md5(token), 1, 15), 16, 10) AS BIGINT) % {_CLS_BUCKETS} AS bucket",
        )
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("x"))
    )
    labels = docs.selectExpr(
        "doc_id",
        f"CASE WHEN source = '{_DSIR_TARGET}' THEN 1.0D ELSE 0.0D END AS y",
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    g1 = (
        feats.join(labels, "doc_id")
        .groupBy("bucket")
        .agg(
            F.sum(((F.lit(0.5) - F.col("y")) * F.col("x")).cast("decimal(28,1)")).alias(
                "grad"
            )
        )
    )
    w1 = materialize(
        g1.crossJoin(F.broadcast(n)).selectExpr(
            "bucket",
            f"ROUND(-{_LR_RATE} * CAST(grad AS DOUBLE) / n_docs, 6) AS w",
        )
    )
    z = (
        feats.join(F.broadcast(w1), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("CAST(ROUND(w * x, 9) AS DECIMAL(28,9))"))
            .cast("double")
            .alias("z")
        )
    )
    p = z.selectExpr("doc_id", "ROUND(1.0D / (1.0D + exp(-z)), 6) AS p")
    g2 = (
        feats.join(p, "doc_id")
        .join(labels, "doc_id")
        .groupBy("bucket")
        .agg(
            F.sum(F.expr("CAST(p - y AS DECIMAL(18,6)) * x")).alias("grad")
        )
    )
    w = (
        w1.join(g2, "bucket")
        .crossJoin(F.broadcast(n))
        .selectExpr(
            "bucket",
            "w AS w_step1",
            f"ROUND(w - {_LR_RATE} * CAST(grad AS DOUBLE) / n_docs, 6) AS w_step2",
        )
    )
    return w, feats


_CLS_TRAINED_ORACLE = f"""
    WITH trained AS ({_LR_TRAIN_ORACLE}),
    toks AS (
      SELECT doc_id, unnest({_TOKS_DUCK}) AS token FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) % {_CLS_BUCKETS} AS bucket,
             COUNT(*) AS x
      FROM toks GROUP BY doc_id, bucket
    ), z AS (
      SELECT f.doc_id,
             CAST(SUM(CAST(ROUND(t.w_step2 * f.x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS z
      FROM feats f JOIN trained t USING (bucket) GROUP BY f.doc_id
    )
    SELECT d.doc_id,
           ROUND(1.0 / (1.0 + exp(-COALESCE(z.z, 0))), 6) AS score,
           ROUND(1.0 / (1.0 + exp(-COALESCE(z.z, 0))), 6) >= 0.5 AS keep
    FROM documents d LEFT JOIN z USING (doc_id)
"""


@register("quality_classifier_trained", oracle=_CLS_TRAINED_ORACLE)
def quality_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full train-then-apply loop: score every document under the
    weights classifier_lr_train just produced (w_step2) — sigmoid of
    the hashed-count dot product, keep at score >= 0.5. Together with
    quality_classifier_hashed (fixed external weights) this covers
    both provenances a production gate has: weights shipped in, or
    weights trained in-engine on the corpus's own seed labels.

    Scale shape: training's bounded passes plus ONE scoring pass — the
    1024-row trained weight table broadcasts, the per-doc margin is a
    map-side-partial DECIMAL sum keyed by doc_id. Same 9-decimal-grid
    dot product and 6-decimal sigmoid as the trainer, so the composed
    oracle stays hash-exact."""
    t = load_tables(spark, sf_dir)
    docs = spread(t["documents"])
    # Round 11: score on the SAME checkpointed feature table training
    # built (row-identical by determinism) — previously this block
    # re-ran the whole tokenize/explode/md5/count pipeline, a second
    # full corpus tokenization per composed run.
    trained, feats = _lr_train_parts(spark, sf_dir)
    w = materialize(trained.select("bucket", "w_step2"))
    z = (
        feats.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("CAST(ROUND(w_step2 * x, 9) AS DECIMAL(28,9))"))
            .cast("double")
            .alias("z")
        )
    )
    return (
        docs.select("doc_id")
        .join(z, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "ROUND(1.0D / (1.0D + exp(-COALESCE(z, 0.0D))), 6) AS score",
            "ROUND(1.0D / (1.0D + exp(-COALESCE(z, 0.0D))), 6) >= 0.5 AS keep",
        )
    )
