"""SparkSession factory with scale-oriented defaults.

The reference's runtime knobs (`mapreduce_spec.h:18-26`: n_workers,
map_kilobytes shard size, n_output_files R) map onto Spark confs:
worker count -> master URL / executor confs, shard size ->
spark.sql.files.maxPartitionBytes, R -> spark.sql.shuffle.partitions.

Settings are chosen for a large cluster and scale down fine to local[N]:
AQE handles partition coalescing and skew joins at runtime, so a fixed
shuffle-partition count is only the pre-AQE upper bound.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied even to an externally created session
# (the driver owns its own SparkSession; tune_session() makes query
# behavior independent of who built the session).
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    # rejects; read as long and convert in catalog.load_tables (exact
    # integer div — double math would lose precision above 2^53 ns).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # 10k-row Arrow batches keep pandas-UDF memory bounded at wide rows.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Stateful STREAMING can't use AQE partition coalescing, so an
    # externally-built session's 200-partition default becomes 200 real
    # state-store tasks per micro-batch; pin a width that matches the
    # test scale. (Batch queries are unaffected in practice — AQE
    # coalesces either way. At cluster scale raise via get_spark.)
    "spark.sql.shuffle.partitions": "32",
    # With AQE on, the BATCH shuffle width actually used is
    # initialPartitionNum coalesced DOWN to advisory size — so the 32
    # above must not double as the ceiling for large shuffles. The
    # round-6 three-decade sweep (1000x clusters corpus) caught exactly
    # that: the Jaccard scorers pushed a linear-in-data 19 GB shuffle
    # through 32 fixed partitions (600 MB/task), went spill-bound
    # (5.7-6.0/decade vs <=4 at 100x), and dedup_candidate_recall's
    # hash aggregate died with UNABLE_TO_ACQUIRE_MEMORY at default 8g
    # heap. Starting shuffles wide and letting AQE coalesce makes the
    # width data-adaptive: sf0.001 tests still run a handful of reduce
    # tasks, the 1000x corpus gets ~75 MB/task. On a real cluster this
    # number scales with executor count (env-tunable).
    "spark.sql.adaptive.coalescePartitions.initialPartitionNum": os.environ.get(
        "SPARK_GRAFT_INITIAL_SHUFFLE", "256"
    ),
    # AQE's coalesce target stays at the 64 MB default — the right
    # size for non-expanding exchanges — but it is EXPANSION-BLIND:
    # AQE widths a reduce stage by its INPUT bytes, and the dedup
    # flagship's bucket-collect stage expands ~3.6x, so at the fourth
    # decade each 64 MB-input task sorted ~230 MB and spill went
    # super-linear (18 GB spill over 37 tasks). A 16 MB override
    # measured 45% off the 3000x wall (390 -> 213 s, spill 4.5x
    # lower; BASELINE.md round-7 fourth-decade notes). Override
    # per-run with SPARK_GRAFT_ADVISORY_PARTITION (bytes); raise
    # SPARK_GRAFT_INITIAL_SHUFFLE with it past 256-task stages.
    **(
        {
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": os.environ[
                "SPARK_GRAFT_ADVISORY_PARTITION"
            ]
        }
        if os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION")
        else {}
    ),
}


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    return os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable by EXECUTOR-side Python workers.

    In pure local[N] mode the python workers run with the driver JVM's
    cwd, so the repo-root package resolves by accident of layout. On
    any real cluster master — including local-cluster[W,C,M], whose
    executors are separate JVMs in their own work dirs (round-9
    multi-executor attestation found this the first time a pandas UDF
    deserialized off-driver: ModuleNotFoundError) — the package must
    travel with the job. addPyFile(zip) is the cluster-portable
    mechanism (same path spark-submit --py-files uses: the zip is
    fetched per-executor and prepended to the worker's sys.path);
    a shared filesystem is NOT assumed. Shipped once per CONTEXT —
    the guard lives on the SparkContext, not the session, because
    newSession() clones (the expanding-advisory clone) share the
    context's file registry and a second addPyFile of the same
    filename from a different path is rejected (round-9 full
    local-cluster sim caught exactly that: 13 @expanding queries
    erroring on 'already registered with a different path').

    The zip itself is CONTENT-ADDRESSED (ADVICE r9): one
    $TMPDIR/graft_pkg_<sha256-of-sources>/ dir per distinct package
    content, built atomically (write-then-rename) and reused by every
    later context in any process — a host that cycles contexts (the
    chaos/speculation tools build several) no longer accumulates one
    orphaned mkdtemp per context, and the on-disk residue is bounded
    by the number of distinct package versions seen since boot. Not
    deleted at exit on purpose: a concurrently running sibling process
    may be serving the same zip to late-launching executors."""
    sc = spark.sparkContext
    if sc.master == "local" or sc.master.startswith("local["):
        return
    if getattr(sc, "_graft_pkg_shipped", False):
        return
    import hashlib
    import shutil
    import tempfile

    import mapreducecore_spark

    pkg_dir = os.path.dirname(os.path.abspath(mapreducecore_spark.__file__))
    digest = hashlib.sha256()
    for root, dirs, files in os.walk(pkg_dir):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for fname in sorted(f for f in files if f.endswith(".py")):
            path = os.path.join(root, fname)
            digest.update(os.path.relpath(path, pkg_dir).encode())
            with open(path, "rb") as fh:
                digest.update(fh.read())
    out_dir = os.path.join(
        tempfile.gettempdir(), f"graft_pkg_{digest.hexdigest()[:16]}"
    )
    zip_path = os.path.join(out_dir, "mapreducecore_spark.zip")
    if not os.path.exists(zip_path):
        build_dir = tempfile.mkdtemp(prefix="graft_pkg_build_")
        try:
            built = shutil.make_archive(
                os.path.join(build_dir, "mapreducecore_spark"),
                "zip",
                root_dir=os.path.dirname(pkg_dir),
                base_dir="mapreducecore_spark",
            )
            os.makedirs(out_dir, exist_ok=True)
            os.replace(built, zip_path)
        finally:
            shutil.rmtree(build_dir, ignore_errors=True)
    sc.addPyFile(zip_path)
    sc._graft_pkg_shipped = True


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable at runtime on this build — keep going
    _ship_package(spark)
    return spark


def get_spark(
    app_name: str = "mapreducecore-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or default_master())
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        # 128 MiB splits: the Spark analogue of the reference's
        # map_kilobytes shard sizing (file_shard.h:35), newline-safe and
        # column-pruned for parquet out of the box.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Heap-floor fail-fast (VERDICT r10 #4): an under-heaped TRAINING
    # operator (the IVF/Lloyd family has a per-JVM heap floor — one 8g
    # executor completes where two 4g executors OOM at the same
    # aggregate memory, BASELINE.md round 10) otherwise relaunch-loops
    # its executor 100+ times on a standalone worker before the master
    # gives up. Set SPARK_GRAFT_MAX_TASK_FAILURES (e.g. 2) on cluster
    # runs so a doomed configuration dies in seconds; unset, Spark's
    # default stands (local mode fails fast already at 1).
    if os.environ.get("SPARK_GRAFT_MAX_TASK_FAILURES"):
        builder = builder.config(
            "spark.task.maxFailures", os.environ["SPARK_GRAFT_MAX_TASK_FAILURES"]
        )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return tune_session(builder.getOrCreate())
