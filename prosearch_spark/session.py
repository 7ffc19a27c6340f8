"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]`` but every knob here is chosen for the
1000-executor / 100 TB case: AQE on (runtime coalescing + skew-join
splitting), shuffle partitions sized by parallelism, Arrow enabled for
every pandas-UDF boundary.
"""

from __future__ import annotations

import os

from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def query_mode(spark: SparkSession, shuffle_partitions: int | None = None):
    """Low-latency settings for short interactive queries.

    AQE's runtime re-planning adds per-query stages worth ~0.25 s each
    on sub-second queries (measured at sf0.1: 0.79 -> 0.53 s/query
    with AQE off). Index BUILDS should keep AQE on (skew-join
    splitting, partition coalescing); point queries should not pay for
    it. Restores previous settings on exit.
    """
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions",
                           str(shuffle_partitions))
        yield spark
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)


def get_spark(
    app_name: str = "prosearch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # one-ish partition per core locally; on a real cluster this is
        # overridden to ~2-3x total cores (AQE coalesces the excess).
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small Arrow batches: large batches (10k rows of wide/array
        # data) serialize GBs into concurrent Python workers and
        # anti-scale past ~8 cores; 2048 keeps the pipeline streaming
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
