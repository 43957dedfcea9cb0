"""SparkSession factory tuned for the engine.

The reference builds its session ad hoc (`sample_stream_job.py:107-118`:
``local[*]`` + pinned Kafka package). We centralize session creation with
scale-aware defaults:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster this should be ~2-3x total executor cores (the AQE coalescer
  shrinks it back when partitions are small, so erring high is safe).
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB correctness oracle and are cluster-location-independent.
- Arrow enabled for the pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "local-stream-stack-spark"


def _cpus() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    In local mode one JVM hosts everything, so ``spark.driver.memory``
    is the only memory knob; on a cluster the same config set works
    unchanged because none of it is local-specific except the master.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # keep saveAsTable (bucketed tables etc.) out of the repo tree
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/lss-spark-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_package_shipped(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via addPyFile.

    An external driver may import the engine from a directory that is
    on the DRIVER's sys.path only (``__spark_entry__.py`` self-inserts
    it). Worker processes spawn with the JVM's environment, so a
    mapInPandas/pandas_udf closure that references a module here would
    die with ModuleNotFoundError. addPyFile distributes a zip of the
    package and prepends it to every worker's sys.path — the standard
    Spark mechanism for shipping job code, and exactly what a real
    cluster submit does with --py-files.
    """
    sc = spark.sparkContext
    if getattr(sc, "_lss_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    import local_stream_stack_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    parent = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="lss-pyfiles-"), "local_stream_stack_spark.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, parent))
    sc.addPyFile(zpath)
    sc._lss_pkg_shipped = True


def configure_for_oracle(spark: SparkSession) -> SparkSession:
    """Runtime-settable conf for a session we did NOT create.

    The correctness driver owns its own SparkSession and hands it to
    ``queries()`` callables; pin the runtime-mutable settings that the
    DuckDB comparison depends on (timezone, ANSI-interval parsing) and
    the AQE switches that are safe to flip at runtime.
    """
    ensure_package_shipped(spark)
    # Shuffle-partition count sized to the session's actual cores: AQE
    # coalesces small batch shuffles anyway, but STATEFUL streaming
    # fixes its state-store partition count from this setting at first
    # run — the vanilla default of 200 means 200 state stores per
    # query, which turns a 3 s bounded replay into ~30 s of store
    # init/commit overhead on a local session.
    cores = max(4, spark.sparkContext.defaultParallelism)
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.shuffle.partitions", str(cores)),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on some builds; defaults are acceptable
    return spark
