"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "escp_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build the session. In production this runs under
    ``spark-submit --py-files`` on a multi-executor cluster; locally it
    defaults to ``local[$SPARK_GRAFT_CPUS]``.

    AQE is on (runtime coalescing + skew-join splitting), Arrow is on
    (every UDF in the engine is Arrow-vectorized), timezone pinned UTC so
    results compare bit-stable against the DuckDB oracle.
    """
    # glibc returns large (>128KB) frees straight back to the OS via
    # munmap, so every numpy temporary in the Arrow-UDF kernels re-mmaps
    # and page-faults tens of MB per call — measured as a bimodal 15×
    # slowdown inside Python workers. Raise the thresholds so arenas are
    # kept and reused. Must be in the environment BEFORE the JVM (and
    # thus the forked python daemon/workers) starts.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(128 * 1024 * 1024))
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(128 * 1024 * 1024))

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = cpus if master.startswith("local") else "200"
        try:
            shuffle_partitions = int(master.split("[")[1].rstrip("]*")) if "[" in master else int(n)
        except ValueError:
            shuffle_partitions = 32

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE partition coalescing targets ~64MB of shuffle BYTES per task —
        # the wrong cost metric for the CPU-heavy Arrow-UDF stages
        # (tokenize/encode): it collapses the bucket shuffle to a handful of
        # tasks and serializes the build. Keep AQE (skew-join splitting,
        # runtime re-planning) but size partitions explicitly.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
