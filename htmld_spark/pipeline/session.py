"""SparkSession factory with the pipeline's tuned defaults (R5: AQE,
coalescing, skew-join, Arrow batch sizing for html blobs)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "htmld_spark",
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 512,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    - AQE on: runtime partition coalescing + skew-join splitting (R5).
    - For Python-heavy stages (mapInArrow extraction) set
      ``extra_conf={"spark.task.cpus": "2"}``: each task is a JVM feeder
      thread PLUS a Python worker process, so task slots must be sized at
      cores/2 or the two populations oversubscribe the host (measured 4.1×
      throughput difference at 32 cores — BENCH/BASELINE.md).
    - ``arrow_max_records`` bounds rows per Arrow batch crossing into the
      extraction UDF; the UDF additionally re-chunks by byte budget, so this
      is a coarse knob (512 rows × ~100 KB Common-Crawl page ≈ 50 MB).
    - UTC session timezone (duckdb-oracle comparability).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; real cluster → 2-3× total cores is the usual rule
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = int(cpus if n == "*" else n)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
