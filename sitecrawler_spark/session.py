"""SparkSession factory tuned for this engine.

Local-mode testing uses local[N]; the same settings scale to a real
cluster (AQE, Arrow, shuffle-partition sizing). Reference parallelism
mapping: threadLimit = availableProcessors (SiteCrawler.java:126) ≙
Spark task slots; downloadVsProcessRatio (SiteCrawler.java:155) is
subsumed by Spark's unified task scheduling (fetch+parse fuse into one
stage, SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app_name: str = "sitecrawler_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE parallelismFirst computes its coalesce target as
        # max(shuffleBytes/defaultParallelism, minPartitionSize); the
        # 1 MiB default floor collapses every sub-MB exchange to ONE
        # partition, serializing the CPU-dense operators that sit above
        # post-shuffle stages (measured: the minhash band build over a
        # deduped frame ran 1-core, 21.5 s → 5.3 s at sf0.1 with the
        # floor at 64k). Inert at scale: once shuffleBytes exceeds
        # parallelism × 64 KiB the bytes/parallelism term dominates and
        # partition sizing is unchanged.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
