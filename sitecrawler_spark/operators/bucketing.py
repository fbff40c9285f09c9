"""Bucketed-table co-location: shuffle-free joins for repeatedly
joined big tables.

At 100 TB the visited/frontier/links tables are joined on the same key
(url / host) every wave; hash-bucketing both sides at WRITE time
(Spark's ``bucketBy`` — the Iceberg ``bucket(N, col)`` partition
transform analog, same motivation as the SnapshotStore's
``repartition`` commit option) lets every subsequent equi-join read
co-located buckets and skip BOTH exchanges: the scan reports
``outputPartitioning = HashPartitioning(bucket cols)`` and Catalyst
elides the shuffle. The win compounds: one write-time shuffle is
amortized over every future join/aggregation on that key.

Caveats encoded here:
- both sides must use the SAME bucket count (mismatch → Spark
  re-shuffles one side, silently);
- ``spark.sql.sources.bucketing.enabled`` must be on (default);
- bucket pruning applies to equality filters on the bucket column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed managed table: one shuffle now,
    zero join shuffles later. ``sort_col`` additionally sorts within
    buckets (lets SortMergeJoin skip its per-task sort too)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
) -> DataFrame:
    """Equi-join two co-bucketed tables on their bucket column. With
    matching bucket counts the physical plan contains NO Exchange under
    the join — pinned by tests/test_plans.py."""
    return spark.table(left_table).join(spark.table(right_table), on)
