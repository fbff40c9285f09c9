"""Structured Streaming operators.

The crawl itself is a batch micro-wave loop by design (the frontier
feeds back into itself — cyclic dataflow Structured Streaming can't
express; SURVEY.md §2.10). Streaming applies to the MONITORING and
INGEST sides:

- ``windowed_event_counts``: file-source stream → watermark → tumbling
  window aggregation (late-data tolerant crawl/event telemetry).
- ``stateful_user_counts``: applyInPandasWithState — the custom
  stateful-operator shape (running per-key counters with timeout),
  used e.g. for per-host rate accounting over a fetch-log stream.

Both run with ``trigger(availableNow=True)`` in tests (bounded drain of
the file source), and identically against a live directory in
production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(
    spark: SparkSession,
    source_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """readStream(parquet dir) → watermarked tumbling-window agg."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type", "n", "total_value",
        )
    )


STATE_SCHEMA = T.StructType([T.StructField("count", T.LongType())])
STATEFUL_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_total", T.LongType()),
    ]
)


def _count_updates(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    prev = state.get[0] if state.exists else 0
    n = prev + sum(len(p) for p in pdfs)
    state.update((n,))
    yield pd.DataFrame({"user_id": [user_id], "events_total": [n]})


def stateful_user_counts(spark: SparkSession, source_dir: str) -> DataFrame:
    """applyInPandasWithState: running per-user event counters — the
    custom stateful-operator pattern (per-host fetch-rate accounting
    uses the identical shape with host as the key)."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _count_updates,
            outputStructType=STATEFUL_OUT,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_dedup(
    spark: SparkSession,
    source_dir: str,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: dropDuplicatesWithinWatermark on the key
    columns — the ingest-side analog of dedup.exact_dedup. State per key
    is evicted once the watermark passes, so memory is bounded by the
    key cardinality of one watermark interval, not of the whole stream
    (the property that makes exact dedup viable on an unbounded crawl
    feed). Duplicates arriving within the watermark window are
    suppressed; older re-arrivals are the late-data tradeoff every
    watermarked operator shares."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_interval_join(
    spark: SparkSession,
    source_dir: str,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INNER interval join with watermarks: every click
    joined to the same user's view events in the preceding ``max_lag``
    (vts ∈ [cts − max_lag, cts]) — the attribution-join shape. Both
    sides carry a watermark and the join condition time-bounds each
    side against the other, so Spark can evict join state once the
    watermark passes: state is bounded by one (watermark + max_lag)
    interval of events, not the whole stream — the property that makes
    a stream-stream join viable on an unbounded feed. Batch-equivalent
    semantics pinned by test (same join over the drained input)."""
    clicks = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(source_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("cts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("cts", watermark)
    )
    views = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(source_dir)
        .filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("vts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("vts", watermark)
    )
    joined = clicks.join(
        views,
        F.expr(
            f"c_user = v_user AND vts <= cts "
            f"AND vts >= cts - INTERVAL {max_lag}"
        ),
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "view_id",
        F.date_format("cts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("vts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
    )


def run_to_memory(df: DataFrame, name: str, mode: str = "complete") -> None:
    """Drain all available input into an in-memory table (tests/dev)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_hll_registers(
    spark: SparkSession, source_dir: str, col: str = "user_id",
    p: int = 6, bits: int = 16,
) -> DataFrame:
    """Streaming HyperLogLog: the same register construction as the
    batch sketch (sketches.hll_registers — portable hash → bucket →
    rho) as a streaming groupBy(bucket).max(rho). HLL registers merge
    by max, so Complete-mode output over ANY prefix of the stream
    equals the batch sketch of the rows seen so far, and state is a
    CONSTANT 2^p rows no matter how many distinct keys flow past —
    the property that makes distinct-user counting viable on an
    unbounded crawl/event feed (streaming COUNT(DISTINCT) state grows
    with cardinality; this never does). Feed the drained register
    table to sketches.hll_estimate for the count."""
    from sitecrawler_spark.sketches import hll_register_cols

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    bucket, rho = hll_register_cols(F.col(col).cast("string"), p, bits)
    return (
        stream.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )


def streaming_cms_cells(
    spark: SparkSession, source_dir: str, col: str = "user_id",
    d: int = 3, w: int = 64,
) -> DataFrame:
    """Streaming Count-Min sketch: the same single-scan cell
    construction as the batch sketch (sketches.cms_build — each value
    emits its d (row, bucket) cells as one inline array) as a
    streaming groupBy count. CMS cells merge by SUM, so Complete-mode
    output over any prefix of the stream equals the batch table of
    the rows seen so far, and state is a CONSTANT ≤ d×w rows no
    matter how many distinct keys flow past — frequency tracking on
    an unbounded feed (hot-host detection, trending queries) without
    per-key state. Feed the drained table to sketches.cms_estimate
    for point queries."""
    from sitecrawler_spark.sketches import _cms_bucket

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    v = F.col(col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                _cms_bucket(v, j, w).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    return (
        stream.select(F.explode(cells).alias("_c"))
        .groupBy(F.col("_c.row").alias("row"), F.col("_c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def streaming_hist_cells(
    spark: SparkSession, source_dir: str, col: str = "value",
    lo: float = 0.0, hi: float = 640.0, nbins: int = 256,
) -> DataFrame:
    """Streaming histogram sketch: fixed-boundary bin counts as a
    streaming groupBy. Bins merge by SUM, so Complete-mode output over
    any stream prefix equals the batch sketch (sketches.hist_build)
    of the rows seen so far, with CONSTANT ≤ nbins state — quantile
    monitoring (latency p99s, size distributions) on an unbounded
    feed without the full sort exact percentiles need. Drain into
    sketches.hist_quantiles for the estimates."""
    width = (hi - lo) / nbins
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    b = (
        F.least(
            F.lit(nbins - 1),
            F.greatest(F.lit(0), F.floor((F.col(col) - lo) / width)),
        )
    ).cast("int")
    return stream.groupBy(b.alias("bin")).agg(F.count("*").alias("cnt"))


# --- streaming change-rate estimation (crawl/recrawl.py on a feed) ---------

FETCH_HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("full_url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("wave", T.LongType()),
        T.StructField("fp", T.LongType()),
    ]
)

_CR_STATE = T.StructType(
    [
        T.StructField("n_fetches", T.LongType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("last_fp", T.LongType()),
        T.StructField("last_wave", T.LongType()),
    ]
)

_CR_OUT = T.StructType(
    [
        T.StructField("full_url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("n_fetches", T.LongType()),
        T.StructField("n_changes", T.LongType()),
    ]
)


def _change_rate_updates(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (url,) = key
    if state.exists:
        n, x, last_fp, last_wave = state.get
    else:
        n, x, last_fp, last_wave = 0, 0, None, -1
    host = None
    for p in pdfs:
        p = p.sort_values("wave")
        for host, wave, fp in zip(p["host"], p["wave"], p["fp"]):
            if wave <= last_wave:
                continue  # late/duplicate delivery — drop, never recount
            if last_fp is not None and fp != last_fp:
                x += 1
            n += 1
            last_fp, last_wave = fp, int(wave)
    state.update((n, x, last_fp if last_fp is not None else 0, last_wave))
    yield pd.DataFrame(
        {"full_url": [url], "host": [host], "n_fetches": [n],
         "n_changes": [x]}
    )


def streaming_change_rates(
    spark: SparkSession, source_dir: str
) -> DataFrame:
    """Change-rate estimation over an UNBOUNDED fetch log — the
    streaming form of crawl/recrawl.change_rates_from_history: state
    per URL is four scalars (n_fetches, n_changes, last_fp,
    last_wave), each micro-batch folds its rows in wave order, and the
    update stream carries the running (n, X) counts from which the
    Cho & Garcia-Molina λ̂ follows by the same closed-form expression
    the batch estimator applies. Rows at or before the per-URL
    frontier (late or duplicate delivery) are dropped, never
    recounted, so replays cannot inflate the estimate. State is O(1)
    per URL regardless of history length — the property that lets the
    re-crawl scheduler run forever on the live fetch feed instead of
    rescanning the pages log."""
    stream = spark.readStream.schema(FETCH_HISTORY_SCHEMA).parquet(source_dir)
    return stream.groupBy("full_url").applyInPandasWithState(
        _change_rate_updates,
        outputStructType=_CR_OUT,
        stateStructType=_CR_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
