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
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row, attach one right row within the same ``on``
    key (left-join semantics — nulls when no match), selected by
    ``direction`` — the pandas ``merge_asof`` / DuckDB ASOF surface:

    - ``backward``: greatest ``right_ts`` <= ``left_ts`` (ties on the
      timestamp prefer the right row — <= semantics, matching DuckDB's
      ASOF JOIN);
    - ``forward``: smallest ``right_ts`` >= ``left_ts``;
    - ``nearest``: whichever of those two is closer in absolute time;
      an exact tie in distance prefers the BACKWARD row (pandas
      merge_asof's prior-row tie rule).

    ``tolerance_seconds`` bounds the match: a candidate farther than
    the tolerance from ``left_ts`` becomes null (applied per side
    BEFORE the nearest choice, like merge_asof's ``tolerance``).

    DETERMINISM: when several right rows share (key, right_ts), the one
    with the greatest payload tuple (field order = ``payload_cols``)
    wins — pinned via the window's ordering, not left to shuffle
    nondeterminism (ADVICE r03).

    Right columns come back as ``r_<payload_col>``. Plan shape: union +
    one hash shuffle on the key with per-direction window passes over
    the SAME partitioning — never a BroadcastNestedLoopJoin, never a
    per-key join explosion."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    # payload carries the matched right_ts alongside the user payload so
    # tolerance / nearest can measure distance after the window pass
    payload = F.struct(
        F.col(right_ts).alias("_rts"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_pp"),
    )
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
    # backward: right rows (_side=0) sort BEFORE left rows at equal ts,
    # so a right row at exactly left_ts is visible (<= semantics); among
    # right ties on _ts the greatest _p sorts last → last() picks it
    wb = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side", "_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: left rows (_side=1, desc) sort BEFORE right rows at equal
    # ts so an equal-ts right is in the following frame (>= semantics);
    # _p desc puts the greatest payload first among right-ts ties
    wf = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side").desc(), F.col("_p").desc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    matched = u
    need_b = direction in ("backward", "nearest")
    need_f = direction in ("forward", "nearest")
    if need_b:
        matched = matched.withColumn(
            "_mb", F.last(F.col("_p"), ignorenulls=True).over(wb)
        )
    if need_f:
        matched = matched.withColumn(
            "_mf", F.first(F.col("_p"), ignorenulls=True).over(wf)
        )
    matched = matched.filter(F.col("_side") == 1)

    # distance in seconds: numeric ts casts straight to double;
    # timestamp(_ntz)/date hops through TIMESTAMP first (NTZ → double is
    # not a legal cast). Both sides shift identically, so differences
    # are exact epoch-second deltas.
    from pyspark.sql import types as T

    ts_type = u.schema["_ts"].dataType
    if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        def _secs(c):
            return c.cast("timestamp").cast("double")
    else:
        def _secs(c):
            return c.cast("double")
    lt = _secs(F.col("_ts"))
    if need_b:
        db = lt - _secs(F.col("_mb._rts"))
        mb = F.col("_mb")
        if tolerance_seconds is not None:
            mb = F.when(db <= F.lit(float(tolerance_seconds)), mb)
    if need_f:
        df_ = _secs(F.col("_mf._rts")) - lt
        mf = F.col("_mf")
        if tolerance_seconds is not None:
            mf = F.when(df_ <= F.lit(float(tolerance_seconds)), mf)
    if direction == "backward":
        m = mb
    elif direction == "forward":
        m = mf
    else:  # nearest: closer side wins; exact distance tie → backward
        mb_n, mf_n = mb, mf
        m = (
            F.when(mb_n.isNull(), mf_n)
            .when(mf_n.isNull(), mb_n)
            .when(db <= df_, mb_n)
            .otherwise(mf_n)
        )
    out = matched.withColumn("_m", m).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_m._pp").getField(c).alias(f"r_{c}") for c in payload_cols],
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
