"""Change-rate-driven re-crawl scheduling wired into the crawl loop.

The engine's ``pages`` APPEND table is a fetch LOG: a URL re-enqueued
by ``SparkSiteCrawler.recrawl`` gets a new row each epoch, with the
engine-monotonic ``wave`` as the time axis. From that log this module
estimates per-URL change rates with the bias-corrected Poisson
estimator of Cho & Garcia-Molina ("Estimating frequency of change",
ACM TOIT 2003) — the same recurrence q_recrawl_schedule gates against
DuckDB — and rolls them up to per-host scores in the exact
``(host, rank)`` shape ``set_host_scores_df`` consumes, so
``frontier_priority="host_score"`` dequeues fast-changing hosts first
under wave caps. That closes the loop the same way host-OPIC does for
importance (operators/graph.host_opic): crawl → estimate → re-crawl.

Distributed shape (100 TB): ONE hash exchange on full_url feeds the
per-URL lag window and the per-URL aggregation (same-key partitioning
reused by Catalyst), then one small exchange on host; the score table
is per-host (≤10^7 rows) and broadcasts into the frontier dequeue.
No driver-side row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fetch_history(pages: DataFrame) -> DataFrame:
    """Fetch log → per-fetch content observations: one row per
    SUCCESSFUL fetch (error rows carry no content and are not change
    observations), with a 64-bit content fingerprint over the parsed
    spans. Columns: (full_url, host, wave, fp)."""
    return pages.filter(F.col("spans").isNotNull()).select(
        "full_url",
        "host",
        "wave",
        F.xxhash64(F.to_json("spans")).alias("fp"),
    )


def change_rates_from_history(
    hist: DataFrame, min_fetches: int = 2
) -> DataFrame:
    """Per-URL λ̂ from a generic fetch history (full_url, host, wave,
    fp): order each URL's fetches by wave, flag fingerprint changes
    between consecutive fetches, then the bias-corrected estimator
    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) over n = fetches-1 observed
    intervals (Cho & Garcia-Molina 2003, §4 — identical to
    queries.q_recrawl_schedule's gated form). URLs seen fewer than
    ``min_fetches`` times carry no interval evidence and are dropped.
    Columns: (full_url, host, n_fetches, n_changes, lambda_hat)."""
    w = Window.partitionBy("full_url").orderBy("wave")
    obs = hist.select(
        "full_url",
        "host",
        (F.col("fp") != F.lag("fp").over(w)).cast("int").alias("changed"),
    )
    agg = obs.groupBy("full_url", "host").agg(
        F.count("*").alias("n_fetches"),
        F.coalesce(F.sum("changed"), F.lit(0)).alias("n_changes"),
    )
    n_int = F.col("n_fetches") - F.lit(1)
    lam = -F.log(
        (n_int - F.col("n_changes") + F.lit(0.5)) / (n_int + F.lit(0.5))
    )
    return agg.filter(F.col("n_fetches") >= min_fetches).select(
        "full_url",
        "host",
        "n_fetches",
        F.col("n_changes").cast("long").alias("n_changes"),
        # + 0.0 canonicalizes IEEE -0.0 (X=0 → -ln(1)) to 0.0
        (lam + F.lit(0.0)).alias("lambda_hat"),
    )


def url_change_rates(pages: DataFrame, min_fetches: int = 2) -> DataFrame:
    """Per-URL λ̂ over the ENGINE's pages fetch log — see
    change_rates_from_history for the estimator."""
    return change_rates_from_history(
        fetch_history(pages), min_fetches=min_fetches
    )


def host_change_rates(pages: DataFrame, min_fetches: int = 2) -> DataFrame:
    """Per-host re-crawl priority: mean per-URL λ̂ over the host's
    multiply-fetched URLs — the ``(host, rank)`` contract of
    ``SparkSiteCrawler.set_host_scores_df``, so fast-changing hosts
    dequeue first under ``frontier_priority="host_score"``."""
    return (
        url_change_rates(pages, min_fetches=min_fetches)
        .groupBy("host")
        .agg(F.avg("lambda_hat").alias("rank"))
    )
