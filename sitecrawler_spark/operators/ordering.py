"""Scalable global-order assignment (FIFO discovery_order).

The crawl needs a total enqueue order (SURVEY.md §3.4: discovery_order
reproduces the reference's single-consumer FIFO at any parallelism).
A naive ``row_number() OVER (ORDER BY ...)`` collapses to ONE partition
— a non-starter at 10^10 rows. Instead: range-partition on the sort
key, rank within partitions, and add per-partition offsets (computed
from a tiny per-partition count collected to the driver). This is the
zipWithIndex pattern expressed natively — no Python per row, shuffle
bounded by the range partitioner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F


def assign_global_order(
    df: DataFrame,
    sort_cols: list[str],
    out_col: str = "discovery_order",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Adds ``out_col`` = start + 0-based rank of the row in the total
    order defined by ``sort_cols`` (which must be tie-free)."""
    # materialize the input ONCE: isEmpty, the range-partitioner's
    # sampling pass, and the ranking would otherwise each re-execute the
    # (often expensive) upstream plan. The row count needed for the
    # small/ranged path split rides the checkpoint as an Observation —
    # previously a second count() job per call (one per crawl wave).
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=True
    )
    cnt = int(obs.get["c"])
    if cnt == 0:
        return df.withColumn(out_col, F.lit(None).cast("long"))
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # small inputs: skip the range shuffle; a single-partition window is
    # cheaper than two-pass ranking until ~1M rows
    if cnt <= 1_000_000 and num_partitions is None:
        w = Window.orderBy(*sort_cols)
        return df.withColumn(
            out_col, (F.row_number().over(w) + F.lit(start - 1)).cast("long")
        )
    ranged = df.repartitionByRange(n, *sort_cols)
    # pin partition ids before using them twice (window + offset pass)
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    local = with_pid.withColumn("_lrank", F.row_number().over(w))
    # per-partition offsets = exclusive cumsum of partition counts,
    # computed DISTRIBUTED (n tiny rows) and broadcast-joined back —
    # previously a separate collect() job + a driver-built map literal;
    # now the offset branch rides the same final job over the pinned
    # input (one action fewer per call, no driver round-trip)
    pc = with_pid.groupBy("_pid").agg(F.count("*").alias("_pc"))
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    off = pc.select(
        "_pid",
        (F.coalesce(F.sum("_pc").over(wo), F.lit(0)) + F.lit(start)).alias(
            "_off"
        ),
    )
    return (
        local.join(F.broadcast(off), "_pid")
        .withColumn(
            out_col, (F.col("_off") + F.col("_lrank") - 1).cast("long")
        )
        .drop("_pid", "_lrank", "_off")
    )
