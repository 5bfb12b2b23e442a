"""UDF-surface queries — SURVEY.md §2.D "UDF surface" row.

Demonstrates all four UDF shapes with engine-deterministic outputs:
- row UDF (str -> str): mirrors the reference's per-line map contract
  (mr_task_factory.h:20) — the slow path, kept off hot paths;
- vectorized scalar pandas_udf (Arrow batches, elementwise double ops
  are IEEE-exact so the oracle matches bit-for-bit);
- grouped-map applyInPandas: mirrors the reference's reduce contract
  (per-key grouped apply, mr_task_factory.h:38) — output is integer
  ranks so cross-engine comparison is exact;
- grouped-agg pandas_udf over int64 (exact arithmetic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.queries import register


@register(
    "udf_row_strmap",
    oracle="""
    SELECT p_partkey, reverse(upper(p_name)) AS name_rev
    FROM part WHERE p_partkey < 500
    """,
)
def udf_row_strmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the reference's map() shape). Kept on a
    filtered slice — this is the documented slow path."""
    t = load_tables(spark, sf_dir)

    @F.udf(StringType())
    def rev_upper(s: str) -> str:
        return s.upper()[::-1]

    return (
        t["part"]
        .filter(F.col("p_partkey") < 500)
        .select("p_partkey", rev_upper("p_name").alias("name_rev"))
    )


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: elementwise double arithmetic is
    IEEE-exact, so it hash-matches the SQL expression with no rounding."""
    t = load_tables(spark, sf_dir)

    @F.pandas_udf("double")
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1 - discount)

    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 2000)
        .select(
            "l_orderkey",
            "l_linenumber",
            disc_price("l_extendedprice", "l_discount").alias("disc_price"),
        )
    )


@register(
    "udf_grouped_map_rank",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_quantity DESC, l_linenumber) AS INT)
             AS qty_rank
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def udf_grouped_map_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the reference's reduce contract shape:
    all rows of one key -> arbitrary Python). Integer ranks keep the
    comparison exact."""
    t = load_tables(spark, sf_dir)

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["l_quantity", "l_linenumber"], ascending=[False, True]
        ).reset_index(drop=True)
        pdf["qty_rank"] = (pdf.index + 1).astype("int32")
        return pdf[["l_orderkey", "l_linenumber", "qty_rank"]]

    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 2000)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        # The filter keeps only ~2k keys: bound the grouped-map fan-out so
        # we don't pay 32 Python-worker spin-ups for a few thousand rows
        # (measured 5.2s -> 1.6s at sf0.1). Unfiltered grouped-maps keep
        # the session's full shuffle parallelism.
        .repartition(8, "l_orderkey")
        .groupBy("l_orderkey")
        .applyInPandas(rank_group, "l_orderkey BIGINT, l_linenumber INT, qty_rank INT")
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag, CAST(SUM(l_linenumber) AS BIGINT) AS line_total
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF over int64 (exact, order-free)."""
    t = load_tables(spark, sf_dir)

    @F.pandas_udf(LongType())
    def int_sum(v: pd.Series) -> int:
        return int(v.astype("int64").sum())

    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .agg(int_sum("l_linenumber").alias("line_total"))
    )


# SimHash IS SQL-expressible because the token hash is md5 (available in
# both engines): DuckDB re-derives the 64-bit hash from the first 16 hex
# chars of md5(token) — verified byte-identical to Python's
# struct.unpack(">Q", md5(tok).digest()[:8]).
_SIMHASH_ORACLE_CTE = """
    toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split_regex(text, '[ ,."'']+')) AS tok
        FROM documents)
      WHERE tok <> ''
    ), h AS (
      SELECT doc_id, ('0x'||substr(md5(tok),1,16))::UBIGINT AS h64 FROM toks
    ), bits AS (
      SELECT doc_id, b.bit AS bit,
             SUM(CASE WHEN (h64 >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS vote
      FROM h CROSS JOIN (SELECT unnest(range(0,64)) AS bit) b
      GROUP BY doc_id, b.bit
    ), packed AS (
      SELECT doc_id,
             SUM(CASE WHEN vote > 0 THEN (1::UBIGINT << bit::INTEGER)
                 ELSE 0 END)::UBIGINT AS usim
      FROM bits GROUP BY doc_id
    ), sim AS (
      SELECT d.doc_id, COALESCE(p.usim, 0::UBIGINT) AS usim
      FROM documents d LEFT JOIN packed p USING (doc_id)
    )
"""


@register(
    "simhash_docs",
    oracle="WITH "
    + _SIMHASH_ORACLE_CTE
    + """
    SELECT doc_id,
           CAST(usim::HUGEINT - CASE WHEN usim >= 9223372036854775808::UBIGINT
                THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END
                AS BIGINT) AS simhash
    FROM sim
    """,
)
def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document. Spark side is the Arrow-batched
    pandas UDF (llm/simhash.py); the oracle recomputes the identical
    md5-bit majority vote in pure SQL, so the UDF path is value-checked
    end to end (was rows-only before)."""
    from mapreducecore_spark.llm.simhash import add_simhash

    t = load_tables(spark, sf_dir)
    return add_simhash(t["documents"]).select("doc_id", "simhash")


@register(
    "simhash_neardup_pairs",
    oracle="WITH "
    + _SIMHASH_ORACLE_CTE
    + """
    , reps AS (
      SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
    ), simr AS (
      SELECT s.doc_id, s.usim FROM sim s JOIN reps r ON r.doc_id = s.doc_id
    ), banded0 AS (
      SELECT doc_id, usim, b.band AS band,
             (usim >> (16*b.band)::INTEGER) & 65535 AS chunk,
             (usim >> (16*((b.band+1)%4))::INTEGER) & 65535 AS chunk2
      FROM simr CROSS JOIN (SELECT unnest(range(0,4)) AS band) b
    ), widths AS (
      SELECT band, chunk, COUNT(*) AS w FROM banded0 GROUP BY band, chunk
    ), banded AS (
      SELECT b.doc_id, b.usim, b.band, b.chunk,
             CASE WHEN w.w > 200 THEN b.chunk2 ELSE -1 END AS subkey
      FROM banded0 b JOIN widths w ON w.band = b.band AND w.chunk = b.chunk
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.usim, b.usim)) AS INTEGER) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.chunk = b.chunk AND a.subkey = b.subkey
     AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.usim, b.usim)) <= 16
    """,
)
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banding join: candidate pairs sharing a 16-bit band,
    with exact Hamming distance attached. EXACT dups are collapsed to
    their min-doc_id representative before hashing (identical texts
    have identical simhashes, so a k-way dup cluster otherwise sits in
    ONE refined bucket — next-band refinement cannot split it — and
    emits C(k,2) hamming-0 pairs; the same exact-then-near ordering as
    dedup_ngram_jaccard, expand via dedup_exact when needed). hd<=3
    pairs among representatives are caught by pigeonhole EXCEPT in the
    documented degenerate-bucket refinement case (llm/simhash.py: the
    pair's only flip-free band lands in a >MAX_BUCKET bucket and a
    flip hits that band's refining neighbor). Value-checked against a
    full SQL re-derivation of the collapse + band join + refinement."""
    from mapreducecore_spark.llm.simhash import add_simhash, simhash_band_pairs

    t = load_tables(spark, sf_dir)
    reps = t["documents"].groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    return (
        simhash_band_pairs(add_simhash(reps))
        .filter(F.col("hamming") <= 16)
        .select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity * 2 + 1 AS DOUBLE) AS derived
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: the lowest-overhead Python hook — RecordBatches come
    straight from the JVM with no pandas conversion. Arithmetic is done
    with pyarrow.compute (vectorized C++), so the Python layer only
    orchestrates."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t = load_tables(spark, sf_dir)

    def double_plus_one(batches):
        for batch in batches:
            derived = pc.add(pc.multiply(batch.column("l_quantity"), 2.0), 1.0)
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), batch.column("l_linenumber"), derived],
                ["l_orderkey", "l_linenumber", "derived"],
            )

    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 2000)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .mapInArrow(
            double_plus_one, "l_orderkey BIGINT, l_linenumber INT, derived DOUBLE"
        )
    )


@register(
    "udf_arrow_optimized",
    oracle="""
    SELECT p_partkey, upper(p_brand) || '/' || CAST(p_size AS VARCHAR) AS tag
    FROM part WHERE p_partkey < 500
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 4's useArrow=True): same
    row-at-a-time authoring model as udf_row_strmap but Arrow-batched
    transfer instead of pickle — the drop-in upgrade for legacy row
    UDFs that can't be vectorized."""
    t = load_tables(spark, sf_dir)

    @F.udf(StringType(), useArrow=True)
    def tag(brand: str, size: int) -> str:
        return f"{brand.upper()}/{size}"

    return (
        t["part"]
        .filter(F.col("p_partkey") < 500)
        .select("p_partkey", tag("p_brand", "p_size").alias("tag"))
    )


@register(
    "udf_apply_in_arrow",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS line_sum
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map over raw Arrow tables (applyInArrow): zero-copy
    access to the group's columnar batch — the path for groups too
    wide/large for a pandas conversion. Integer-only output keeps the
    comparison exact."""
    import pyarrow as pa

    t = load_tables(spark, sf_dir)

    def summarize(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "l_returnflag": [table.column("l_returnflag")[0].as_py()],
                "n_rows": [table.num_rows],
                "line_sum": [
                    pc.sum(pc.cast(table.column("l_linenumber"), pa.int64())).as_py()
                ],
            }
        )

    return (
        t["lineitem"]
        .select("l_returnflag", "l_linenumber")
        .repartition(8, "l_returnflag")
        .groupBy("l_returnflag")
        .applyInArrow(
            summarize, "l_returnflag STRING, n_rows BIGINT, line_sum BIGINT"
        )
    )


@register(
    "udtf_segment_lateral",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        WHERE doc_id < 500
    )
    SELECT doc_id, i AS pos,
           CAST(least(12, len(tk) - i*12) AS INT) AS n_words,
           tk[i*12 + 1] AS first_word
    FROM toks, UNNEST(range((len(tk)+11)//12)) AS u(i)
    """,
)
def udtf_segment_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 user-defined TABLE function) applied via a
    SQL LATERAL join: one input document fans out to one row per
    12-word segment — the table-valued generalization of the
    reference's map() contract (one line in, many pairs out,
    mr_task_factory.h:20), here with a declared output schema instead
    of untyped string pairs. Kept on a filtered slice like the row UDF:
    UDTFs run row-at-a-time in Python and are the documented slow path
    — segmentation on the hot path uses the JVM-side higher-order
    expression in dedup_lines_ccnet instead."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, n_words: int, first_word: string")
    class SegmentUdtf:
        def eval(self, text: str):
            toks = text.split(" ")
            for i in range((len(toks) + 11) // 12):
                seg = toks[i * 12 : (i + 1) * 12]
                yield i, len(seg), seg[0]

    load_tables(spark, sf_dir)
    spark.udtf.register("segment_udtf", SegmentUdtf)
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.n_words, s.first_word
        FROM documents d, LATERAL segment_udtf(d.text) s
        WHERE d.doc_id < 500
        """
    )
