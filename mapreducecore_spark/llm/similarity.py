"""Embedding similarity: cosine expressions + multi-table sign-LSH.

Sign-LSH (random-hyperplane family, here deterministic coordinate-pair
hyperplanes e[i] - e[i+32]): P[bit agrees] = 1 - angle/pi. One k-bit
table has recall p^k, so L tables give 1 - (1-p^k)^L — at cosine 0.9,
4 tables x 8 bits ≈ 0.75 recall; at 0.95 ≈ 0.9. Each table is a plain
equi-join on (table, code): candidate count scales with bucket
occupancy, never O(n²) — that is the 100 TB path. Brute force
(ann_cosine_topk) stays as the exact baseline.

Everything is generated SQL over array columns (JVM-side, codegen'd);
the same generator emits the DuckDB oracle so parity holds per-table.
"""

from __future__ import annotations

N_TABLES = 4
BITS = 8
MAX_BITS = 16  # widest per-table code the hyperplane pool supports
_HALF = 32  # hyperplane pairs (i, i+32) over 64-dim embeddings

# The denominator is wrapped in nullif so a zero-norm vector yields
# NULL, matching DuckDB's division semantics (x/0 -> NULL there, but
# IEEE NaN in Spark double math — a crafted-corpus divergence caught by
# tests/test_crafted_embeddings.py). NULL sims sort last under DESC and
# fail >= thresholds in BOTH engines, so zero vectors simply never rank.
COS_SPARK = (
    "aggregate(zip_with({a}, {b}, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    " / nullif(sqrt(aggregate(transform({a}, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
    " * sqrt(aggregate(transform({b}, x -> x * x), CAST(0 AS DOUBLE), (acc, v) -> acc + v)), CAST(0 AS DOUBLE))"
)

COS_DUCK = (
    "list_inner_product({a}, {b})"
    " / (sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b})))"
)


def _hyperplane(table: int, i: int) -> tuple[int, int]:
    """Coordinate pair (1-based) for bit i of `table`'s code.

    Bits 1..8 are the original family (lo = table*8 + i vs lo + 32) so
    every default-BITS caller — and every static oracle SQL string
    built from it — is byte-identical to the pre-parameterized form.
    Bits 9..16 draw from a disjoint reserve pool of +16-offset pairs
    (r, r + 16) with r rotated one table-band forward:
    r = ((table*8 + (i-8) - 1 + 8) mod 32) + 1. The rotation makes a
    table's reserve coordinates DISJOINT from its own primary {lo, hi}
    set (ADVICE r8: without it, reserve bit i shared its lo coordinate
    with primary bit i-8, correlating every wide-code extra bit with an
    existing bit and splitting buckets less evenly on correlated
    embeddings); table t's reserve r-band {t'*8+1..t'*8+8, t'=(t+1)%4}
    never meets its primary lo-band {t*8+1..t*8+8} or hi-band (+32),
    and r+16 lands outside both as well (verified exhaustively in
    tests/test_llm_ops.py). Cross-table reuse remains (the pool is only
    64 coordinates wide) but union-recall across tables is insensitive
    to it. Wide codes exist for the corpus-adaptive semdedup assignment
    (bits grows with K so centroids-per-bucket stays bounded); a b-bit
    code equals the MAX_BITS code modulo 2^b by bit-positional
    construction, which is how the DuckDB oracle expresses a
    data-dependent width — the oracle calls this same function, so the
    rotation holds identically in both engines."""
    if i <= BITS:
        lo = table * BITS + i
        return lo, lo + _HALF
    r = ((table * BITS + (i - BITS) - 1 + BITS) % 32) + 1
    return r, r + 16


def _code_expr(table: int, elem_fn: str, emb: str = "emb", bits: int = BITS) -> str:
    """bits-wide sign code for one table over the _hyperplane pool."""
    terms = []
    for i in range(1, bits + 1):
        lo, hi = _hyperplane(table, i)
        terms.append(
            f"(CASE WHEN {elem_fn}({emb}, {lo}) >= {elem_fn}({emb}, {hi}) "
            f"THEN {1 << (i - 1)} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def spark_code_expr(table: int, emb: str = "emb", bits: int = BITS) -> str:
    return _code_expr(table, "element_at", emb, bits)


def duck_code_expr(table: int, emb: str = "emb", bits: int = BITS) -> str:
    return _code_expr(table, "list_extract", emb, bits)


def spark_tables_expr(emb: str = "emb", bits: int = BITS) -> str:
    """Array of (table, code) structs — explode to get one row per table."""
    entries = ", ".join(
        f"struct({t} AS tbl, {spark_code_expr(t, emb, bits)} AS code)"
        for t in range(N_TABLES)
    )
    return f"array({entries})"


def duck_tables_select(emb: str = "emb", mask: str | None = None) -> str:
    """DuckDB: one (tbl, code) per table via parallel unnest.

    `mask` (a SQL expression, typically a scalar subquery yielding
    2^bits) selects a DATA-DEPENDENT code width: codes are generated
    at MAX_BITS and reduced modulo the mask, which equals generating
    the narrower code directly (bit i contributes 2^(i-1), so mod 2^b
    keeps exactly bits 1..b). Without a mask this emits the default
    8-bit family, byte-identical to the pre-parameterized generator —
    the static ANN oracle strings depend on that."""
    tbls = ", ".join(str(t) for t in range(N_TABLES))
    if mask is None:
        codes = ", ".join(duck_code_expr(t, emb) for t in range(N_TABLES))
    else:
        codes = ", ".join(
            f"({duck_code_expr(t, emb, MAX_BITS)} % ({mask}))" for t in range(N_TABLES)
        )
    return f"unnest([{tbls}]) AS tbl, unnest([{codes}]) AS code"


def add_lsh_codes(df, emb_col: str = "emb", bits: int = BITS):
    """Explode a vector DataFrame to one row per (vector, table) with
    its bucket code. Input must carry `emb` as array<double>."""
    cols = [c for c in df.columns if c != emb_col]
    return df.selectExpr(
        *cols,
        emb_col,
        f"explode({spark_tables_expr(emb_col, bits)}) AS tc",
    ).selectExpr(*cols, emb_col, "tc.tbl AS tbl", "tc.code AS code")
