"""Tests for the config source (S6) and file sources/sinks (S1/S2/S7)."""

from __future__ import annotations

import glob

import pytest

from mapreducecore_spark.catalog import load_tables
from mapreducecore_spark.config import JobSpec, SpecError, read_and_validate_spec
from mapreducecore_spark.sources import (
    read_csv,
    read_json,
    read_text_lines,
    sorted_partitioned_text_sink,
    write_csv,
    write_json,
)

REF_CONFIG_FORMAT = """\
n_workers=6
worker_ipaddr_ports=localhost:50051,localhost:50052,localhost:50053,localhost:50054,localhost:50055,localhost:50056
input_files={inp1},{inp2}
output_dir={out}
n_output_files=8
map_kilobytes=500
user_id=cs6210
"""


def test_parse_reference_config_format(tmp_path):
    """Round-trips the reference's own config.ini shape
    (test/config.ini:1-7 / mapreduce_spec.h:30-83)."""
    inp = sorted(glob.glob("/root/reference/test/input/testdata_*.txt"))[:2]
    cfg = tmp_path / "config.ini"
    out = tmp_path / "output"
    cfg.write_text(REF_CONFIG_FORMAT.format(inp1=inp[0], inp2=inp[1], out=out))
    spec = read_and_validate_spec(str(cfg))
    assert spec.n_workers == 6
    assert len(spec.worker_ipaddr_ports) == 6
    assert spec.n_output_files == 8
    assert spec.map_kilobytes == 500
    assert spec.user_id == "cs6210"
    assert spec.master_url == "local[6]"
    assert spec.max_partition_bytes == 500 * 1024
    assert spec.spark_confs()["spark.sql.shuffle.partitions"] == "8"


@pytest.mark.parametrize(
    "mutation,msg",
    [
        ({"n_workers": 0}, "n_workers"),
        ({"n_output_files": -1}, "n_output_files"),
        ({"map_kilobytes": 0}, "map_kilobytes"),
        ({"user_id": ""}, "user_id"),
        ({"input_files": []}, "input_files"),
        ({"worker_ipaddr_ports": ["only:1"]}, "worker address count"),
        ({"input_files": ["/does/not/exist.txt"]}, "does not exist"),
    ],
)
def test_spec_validation_rejects(mutation, msg):
    """Mirrors validate_mr_spec's rejection set (mapreduce_spec.h:87-157)."""
    from mapreducecore_spark.config import validate_spec

    inp = sorted(glob.glob("/root/reference/test/input/testdata_*.txt"))[:1]
    base = dict(
        n_workers=2,
        worker_ipaddr_ports=["a:1", "b:2"],
        input_files=inp,
        output_dir="/tmp/out",
        n_output_files=4,
        map_kilobytes=100,
        user_id="u",
    )
    base.update(mutation)
    with pytest.raises(SpecError, match=msg):
        validate_spec(JobSpec(**base))


def test_text_scan_split_invariance(spark):
    """Every line consumed exactly once regardless of split size —
    the file_shard.h newline-alignment contract (SURVEY §5 item 3)."""
    paths = sorted(glob.glob("/root/reference/test/input/testdata_*.txt"))
    n_lines = sum(1 for p in paths for _ in open(p, errors="surrogateescape"))
    for mpb in (16 * 1024, 64 * 1024, 8 * 1024 * 1024):
        df = read_text_lines(spark, paths, max_partition_bytes=mpb)
        assert df.count() == n_lines, f"split size {mpb} lost/duplicated lines"


def test_csv_json_roundtrip(spark, sf_dir, tmp_path):
    """S7: columnar tables survive CSV and JSON round-trips with
    explicit schemas (no inference scans)."""
    nation = load_tables(spark, sf_dir)["nation"]
    schema = "n_nationkey INT, n_name STRING, n_regionkey INT"

    csv_path = str(tmp_path / "nation_csv")
    write_csv(nation, csv_path)
    back_csv = read_csv(spark, csv_path, schema)
    assert sorted(map(tuple, back_csv.collect())) == sorted(map(tuple, nation.collect()))

    json_path = str(tmp_path / "nation_json")
    write_json(nation, json_path)
    back_json = read_json(spark, json_path, schema)
    assert sorted(map(tuple, back_json.select("n_nationkey", "n_name", "n_regionkey").collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_sorted_partitioned_text_sink(spark, sf_dir, tmp_path):
    """S2 sink: n_outputs files, 'key value' rows, each file key-sorted,
    all content preserved."""
    out = str(tmp_path / "sink")
    docs = load_tables(spark, sf_dir)["documents"].selectExpr(
        "CAST(doc_id AS STRING) AS k", "lang AS v"
    )
    sorted_partitioned_text_sink(docs, out, "k", "v", n_outputs=4)
    files = sorted(glob.glob(out + "/part-*"))
    assert len(files) == 4
    seen = {}
    for f in files:
        keys = []
        for line in open(f):
            k, v = line.rstrip("\n").split(" ", 1)
            keys.append(k)
            seen[k] = v
        assert keys == sorted(keys), f"{f} not key-sorted"
    expect = {str(r["k"]): r["v"] for r in docs.collect()}
    assert seen == expect


def test_write_parquet_observed_metrics_ride_the_write(spark, tmp_path):
    from mapreducecore_spark.sources.io import write_parquet_observed

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "c")], "k INT, v STRING"
    )
    out = str(tmp_path / "obs")
    m = write_parquet_observed(df, out)
    assert m == {"n_rows": 3, "n_null_first_col": 1}
    assert spark.read.parquet(out).count() == 3


def test_cli_job_runs_reference_config(spark, tmp_path, capsys):
    """python -m mapreducecore_spark <config>: the reference demo's
    entry shape (test/main.cc) — INI spec in, key-sorted partition
    files out."""
    from mapreducecore_spark.__main__ import run_cli_job

    inp = sorted(glob.glob("/root/reference/test/input/testdata_*.txt"))[:2]
    cfg = tmp_path / "config.ini"
    out = tmp_path / "cli_output"
    cfg.write_text(REF_CONFIG_FORMAT.format(inp1=inp[0], inp2=inp[1], out=out))
    assert run_cli_job(spark, str(cfg)) == 0
    assert "wrote" in capsys.readouterr().out
    files = sorted(p for p in out.iterdir() if p.name.startswith("part-"))
    assert len(files) == 8
    # Each partition file is key-sorted "key value" lines.
    total = 0
    for p in files:
        keys = [ln.split(" ")[0] for ln in p.read_text().splitlines()]
        assert keys == sorted(keys)
        total += len(keys)
    assert total > 0


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """S7 extension: ORC write/read round-trip preserves rows and schema
    (the other columnar format Spark ships a native source for)."""
    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    out = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
