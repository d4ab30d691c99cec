"""SparkSession factory with the configs this engine assumes."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "groonga_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # 1x cores, not 2x: every reduce stage schedules shuffle_partitions
    # tasks regardless of data volume, and the measured per-stage cost of
    # the extra near-empty tasks exceeds any load-balance win at this
    # node size (A/B: corpus build 8.2k->8.7k files/s cold and 13.2k->15.1k
    # warm going 64->32 at local[32]; small-shuffle latency 0.34s->0.30s).
    # On a real cluster this is sized to data (bytes / 128MB target), and
    # AQE coalesces the small end either way.
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    # Python workers inherit the driver's environment, not its sys.path:
    # UDFs defined in this package pickle by reference and need the repo
    # root importable on the worker regardless of the driver's cwd.  On a
    # real cluster the same is done with spark-submit --py-files
    # (submit_job.py); this covers local-mode drivers started elsewhere.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = os.environ.get("PYTHONPATH", "")
    if pkg_root not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + prev if prev else "")
        )
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # plan STRINGS (UI/event-listener explain) are O(plan size) heap
        # allocations on the driver — a query-set union over dozens of
        # branches can otherwise OOM the driver just rendering its plan
        .config("spark.sql.maxPlanStringLength", "2000000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
