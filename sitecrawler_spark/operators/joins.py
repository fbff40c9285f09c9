"""Temporal join operators Spark's built-ins lack: AS-OF join and
bucketed RANGE join.

A naive SQL formulation of either (theta-join on an inequality) makes
Spark pick BroadcastNestedLoopJoin — O(|L|×|R|) work per key and a
driver-killing broadcast at scale. Both operators here re-express the
semantics with shuffle-friendly primitives:

- ``asof_join``: union the two sides, one window pass per key ordered
  by time — each left row reads the latest preceding right row from
  running state. One hash shuffle on the key, zero join explosion.
  (The composition trick Flink/kdb users expect from an as-of join.)
- ``range_join_bucketed``: explode intervals into fixed-width time
  buckets, equi-join points on their bucket, post-filter exact
  containment. Shuffle is |points| + Σ interval-widths/bucket — the
  standard interval-bucketing rewrite (also what Databricks' range
  join optimization does under the hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` within the same ``on`` key (backward
    as-of; ties on timestamp prefer the right row — <= semantics,
    matching DuckDB's ASOF JOIN). Right columns come back as
    ``payload_cols`` (null when no prior right row exists — left
    join semantics)."""
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    payload = F.struct(*[F.col(c) for c in payload_cols])
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload.alias("_p"),
    )
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    r = r.select(
        "_k", "_ts", "_side", "_p",
        *[F.lit(None).cast(dict(zip(lcols, [left.schema[c].dataType for c in lcols]))[c]).alias(f"_l_{c}") for c in lcols],
    )
    u = l.unionByName(r)
    # right rows (_side=0) sort BEFORE left rows at equal ts, so a
    # right row at exactly left_ts is visible (<= semantics)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = u.withColumn(
        "_m", F.last(F.col("_p"), ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    out = matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_m").getField(c).alias(f"r_{c}") for c in payload_cols],
    )
    return out


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """All (point, interval) pairs with lo <= point_ts < hi, via
    interval bucketing: intervals explode to the fixed-width epoch
    buckets they cover, points equi-join on their own bucket, exact
    containment filtered after. Each point meets an interval in exactly
    one bucket (the point's), so no distinct pass is needed. Handles
    OVERLAPPING intervals (unlike the as-of trick, which requires
    disjoint ones)."""
    b = F.lit(bucket_seconds)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo)) / b),
                F.floor((F.unix_timestamp(F.col(hi)) - 1) / b),
            )
        ),
    )
    pt = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / b)
    )
    return (
        pt.join(iv, "_bucket")
        .filter(
            (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) < F.col(hi))
        )
        .drop("_bucket")
    )
