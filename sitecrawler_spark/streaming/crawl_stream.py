"""Streaming seed ingestion: a Structured Streaming file source feeds
the crawl engine continuously.

The crawl loop itself is cyclic dataflow (frontier feeds back into
itself), which Structured Streaming cannot express — but the INGEST
side streams cleanly: seed-list files landing in a watched directory
become micro-batches; each batch's URLs are admitted into the live
engine (``enqueue_seeds`` — static filter, seen/frontier anti-joins,
order continuation) and the engine drains its frontier between
batches. ``foreachBatch`` is the documented escape hatch for exactly
this batch-engine-inside-a-stream composition.

Tests run with ``trigger(availableNow=True)`` (bounded drain of the
file source); production would run the same code with a continuous
trigger and a durable checkpointLocation for exactly-once file
tracking.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def stream_seed_crawl(
    engine,
    seed_dir: str,
    checkpoint_dir: str,
    max_waves_per_batch: int = 200,
) -> dict:
    """Drain all currently-available seed files in ``seed_dir`` into
    ``engine`` (one enqueue + crawl per micro-batch) and return
    {"batches": n, "enqueued": total}. Callable repeatedly: the
    streaming checkpoint remembers which files were already ingested,
    so only NEW files form batches on later calls."""
    stats = {"batches": 0, "enqueued": 0}

    def handle(batch_df, batch_id: int) -> None:
        seeds = (
            batch_df.select(F.trim(F.col("value")).alias("raw_url"))
            .filter(
                (F.col("raw_url") != "")
                & ~F.col("raw_url").startswith("#")
            )
            .withColumn("seed_order", F.monotonically_increasing_id())
        )
        stats["batches"] += 1
        stats["enqueued"] += engine.enqueue_seeds(seeds)
        # frontier is non-None after enqueue_seeds, so crawl() drains
        # the live frontier without re-seeding
        engine.crawl(seed_paths=None, max_waves=max_waves_per_batch)

    q = (
        engine.spark.readStream.text(seed_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
