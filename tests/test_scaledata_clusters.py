"""The SCALE_MODE=clusters corpus generator (VERDICT r5 #5) must
produce REALISTIC near-dup growth: within-copy near-dup structure
byte-equivalent to the base corpus's, cross-copy 3-gram Jaccard ~0,
and planted dup clusters of FIXED size (more clusters, not bigger
ones). These properties are what separates "operator cost" from
"corpus-construction artifact" in the 100x Jaccard-scorer sweep, so
they are pinned here at a 3-copy sf0.001 generation (DuckDB only —
no Spark session, runs in seconds).
"""

from __future__ import annotations

import os
import subprocess
import sys

import duckdb
import pytest

SRC = "/root/testdata/sf0.001"
TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "gen_scaledata.py")

# The engine's tokenizer delimiters (functions/text.py SPLIT_REGEX_SQL)
# and 3-gram shingles, mirrored in DuckDB exactly as llm.py's oracles do.
_TOKS = "list_filter(string_split_regex(text, '[ ,.\"'']+'), x -> x <> '')"
_SHINGLES = (
    f"list_distinct(list_transform(range(1, len({_TOKS}) - 1), "
    f"i -> list_aggregate(list_slice({_TOKS}, i, i + 2), 'string_agg', ' ')))"
)


@pytest.fixture(scope="module")
def clusters_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scaledata") / "clusters3")
    env = dict(os.environ, SCALE_COPIES="3", SCALE_MODE="clusters")
    subprocess.run(
        [sys.executable, TOOL, SRC, dst], env=env, check=True, capture_output=True
    )
    return dst


def test_cross_copy_shingles_disjoint(clusters_dir):
    """Copies of the same base doc share NO 3-gram shingles: every
    alphanumeric run carries a per-copy suffix, so cross-copy Jaccard
    is 0 and true near-dup pairs grow linearly in COPIES (the
    replicate mode's quadratic growth is the artifact this kills)."""
    con = duckdb.connect()
    n = con.sql(
        f"""
        WITH d AS (
          SELECT doc_id % 10000000000 AS base_id, doc_id // 10000000000 AS copy,
                 {_SHINGLES} AS sh
          FROM '{clusters_dir}/documents.parquet'
          WHERE doc_id < 900000000000000 AND len({_TOKS}) >= 3
        )
        SELECT count(*) FROM d a JOIN d b
          ON a.base_id = b.base_id AND a.copy < b.copy
        WHERE len(list_intersect(a.sh, b.sh)) > 0
        """
    ).fetchone()[0]
    assert n == 0


def test_within_copy_structure_preserved(clusters_dir):
    """Within every copy, the pairwise shingle-set Jaccard between the
    first 40 base docs equals the base corpus's exactly: identical
    text segments transform identically, so the near-dup workload per
    copy is the base workload, just repeated."""
    con = duckdb.connect()

    def pair_jaccards(table_expr: str, copy_filter: str) -> list[tuple]:
        return con.sql(
            f"""
            WITH d AS (
              SELECT doc_id % 10000000000 AS base_id, {_SHINGLES} AS sh
              FROM {table_expr}
              WHERE {copy_filter} AND doc_id % 10000000000 < 40
                AND len({_TOKS}) >= 3
            )
            SELECT a.base_id, b.base_id,
                   ROUND(len(list_intersect(a.sh, b.sh))
                         / CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE), 9)
            FROM d a JOIN d b ON a.base_id < b.base_id
            ORDER BY 1, 2
            """
        ).fetchall()

    base = pair_jaccards(f"'{SRC}/documents.parquet'", "TRUE")
    assert base, "base corpus slice must not be empty"
    for copy in (1, 2):
        got = pair_jaccards(
            f"'{clusters_dir}/documents.parquet'",
            f"doc_id // 10000000000 = {copy} AND doc_id < 900000000000000",
        )
        assert got == base


def test_planted_clusters_fixed_size(clusters_dir):
    """The planted degenerate cluster becomes COPIES clusters of
    exactly 30 (fixed size, growing count) — not one 30*COPIES-doc
    cluster whose pair count is quadratic in COPIES."""
    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT text, count(*) FROM '{clusters_dir}/documents.parquet'
        WHERE doc_id >= 900000000000000 GROUP BY text ORDER BY text
        """
    ).fetchall()
    assert len(rows) == 3
    assert all(n == 30 for _, n in rows)
