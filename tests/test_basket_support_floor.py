"""basket_part_pairs round-7 rework: the broadcast min-support
pre-filter (provably lossless for the top-100) and the packed-bigint
pair key, exercised on CRAFTED corpora.

The sf0.001/sf0.01 driver parity runs never take the filter branch
(uniform TPC-H has c100 = 2 and every part in >= 2 orders, so the
floor prunes nothing and is skipped); these tests plant a skewed
corpus where the floor provably bites, and a wide-key corpus
(partkeys >= 2^31) that must fall back to the struct pair row — both
compared against the same DuckDB oracle SQL the driver uses.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mapreducecore_spark.queries import REGISTRY, _load_all

_load_all()

SF_SRC = "/root/testdata/sf0.001"


def _write_dir(tmp, lineitem_rows):
    """A table dir that load_tables can open: every sf0.001 table
    copied as-is, lineitem replaced by the crafted rows."""
    d = str(tmp)
    for name in (
        "region nation customer supplier part orders events documents embeddings"
    ).split():
        src = os.path.join(SF_SRC, f"{name}.parquet")
        shutil.copy(src, os.path.join(d, f"{name}.parquet"))
    orderkeys, partkeys = zip(*lineitem_rows)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(orderkeys, pa.int64()),
                "l_partkey": pa.array(partkeys, pa.int64()),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    return d


def _oracle_rows(d):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet')"
    )
    return sorted(
        tuple(r) for r in con.execute(REGISTRY["basket_part_pairs"].oracle).fetchall()
    )


def _spark_rows(spark, d):
    return sorted(
        (r["part_a"], r["part_b"], r["n_orders"])
        for r in REGISTRY["basket_part_pairs"].fn(spark, d).collect()
    )


def _skewed_rows():
    """20 hot items co-occurring in 400 orders (190 hot-hot pairs, all
    with count 400 >> 1) + 300 cold items in <= 2 orders each: the
    phase-A floor L lands at 400 and prunes every cold item."""
    rows = []
    for o in range(400):
        for p in range(20):
            rows.append((o, p))
    # cold tail: items 1000..1299, each in two orders, paired with one
    # hot item so they form real (but low-count) pairs
    for i in range(300):
        for o in (500 + i, 900 + i):
            rows.append((o, 1000 + i))
            rows.append((o, i % 20))
    return rows


def test_support_floor_branch_is_taken_and_lossless(spark, tmp_path_factory):
    rows = _skewed_rows()
    d = _write_dir(tmp_path_factory.mktemp("basket_skew"), rows)
    # The branch predicate, recomputed independently: the corpus must
    # actually exercise filter-on (floor > 1, qualifying set a strict
    # subset) — this is what pins the filter path, since both engines
    # are deterministic on the same bytes.
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet')"
    )
    floor_l, n_parts, n_qual = con.execute(
        """
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        f AS (SELECT l_partkey, COUNT(*) AS f FROM items GROUP BY 1),
        pairs AS (
          SELECT a.l_partkey pa, b.l_partkey pb, COUNT(*) n
          FROM items a JOIN items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2),
        top100 AS (SELECT n FROM pairs ORDER BY n DESC, pa, pb LIMIT 100),
        L AS (SELECT CASE WHEN COUNT(*) >= 100 THEN MIN(n) ELSE 1 END AS l
              FROM top100)
        SELECT (SELECT l FROM L),
               (SELECT COUNT(*) FROM f),
               (SELECT COUNT(*) FROM f WHERE f >= (SELECT l FROM L))
        """
    ).fetchone()
    assert floor_l > 1, "crafted corpus must produce a biting floor"
    assert n_qual < n_parts, "filter must prune at least one item"
    assert _spark_rows(spark, d) == _oracle_rows(d)


def test_wide_partkeys_fall_back_to_struct_key(spark, tmp_path_factory):
    """Partkeys >= 2^31 cannot ride the shifted-bigint pack (signed
    overflow); the struct-key fallback must produce identical results."""
    base = 1 << 31
    rows = []
    for o in range(50):
        for p in range(4):  # 4 wide-key items per basket -> 6 pairs
            rows.append((o, base + 7 * p))
    rows.append((60, base + 1))
    rows.append((60, base + 100))
    d = _write_dir(tmp_path_factory.mktemp("basket_wide"), rows)
    assert _spark_rows(spark, d) == _oracle_rows(d)


def test_bonferroni_floor_is_lossless_on_random_corpora():
    """Round-8 tier-1 floor: on random corpora the driver-side
    Bonferroni bound must never exceed c100 (the 100th-highest true
    pair count, or 1 when fewer than 100 pairs exist) — that is the
    property the broadcast filter's losslessness proof rides on."""
    import itertools
    import random
    from collections import Counter

    from mapreducecore_spark.queries.pipeline import _basket_floor_bonferroni

    for seed in range(8):
        rng = random.Random(seed)
        n_items = rng.randint(5, 40)
        n_baskets = rng.randint(5, 60)
        baskets = [
            rng.sample(range(n_items), rng.randint(2, min(6, n_items)))
            for _ in range(n_baskets)
        ]
        freq = Counter(p for b in baskets for p in set(b))
        pair_counts = Counter(
            pair
            for b in baskets
            for pair in itertools.combinations(sorted(set(b)), 2)
        )
        counts = sorted(pair_counts.values(), reverse=True)
        c100 = counts[99] if len(counts) >= 100 else 1
        floor = _basket_floor_bonferroni(list(freq.values()), n_baskets)
        assert floor <= max(c100, 1), (seed, floor, c100)


def test_bonferroni_floor_fires_on_extreme_skew():
    """Head items present in ~every basket: the inclusion-exclusion
    bound must produce a floor > 1 with zero cluster work."""
    from mapreducecore_spark.queries.pipeline import _basket_floor_bonferroni

    n_baskets = 1000
    freqs = [990] * 20 + [3] * 500  # 20 items in 99% of baskets
    floor = _basket_floor_bonferroni(freqs, n_baskets)
    # any two head items co-occur in >= 990 + 990 - 1000 = 980 baskets;
    # C(20,2) = 190 pairs >= 100, so the floor is the 100th bound.
    assert floor == 980
