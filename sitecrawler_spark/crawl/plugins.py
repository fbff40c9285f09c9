"""Plugin surface — SiteCrawlerAction parity as registered Arrow UDFs.

Reference contract (SiteCrawlerAction.java:41,53): every registered
action gets, per page, ``takeAction(page, rawHrefs, referrers)`` on
success and ``handleError(code, url, referrers, response)`` on error
(invoked ProcessPage.java:217-219, 269-278). The north star maps this
to "plugin-equivalent page processors expressed as registered
pandas/Arrow UDFs".

Spark-native shape: a plugin contributes COLUMNS to the pages
DataFrame. The engine hands each plugin the page row set joined with
its referrer sets (ProcessPage.java:218 ``urlFrom.get(location)``) and
the RAW pre-normalization hrefs (plugins fire before normalization,
ProcessPage.java:217 — the span array stores raw attribute values, so
this comes for free). Side-effecting sinks subscribe via
``foreach_batch`` over the same DataFrame instead of a column.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sitecrawler_spark.operators.graph import referrer_sets


@dataclass
class Action:
    """One registered plugin.

    on_success(df) -> Column: evaluated over success pages; df has
      columns (full_url, spans, raw_hrefs, referrers). Result is added
      as column ``<name>``.
    on_error(df) -> Column: evaluated over error pages; df has columns
      (full_url, error_code, referrers). Added as ``<name>_error``.
    Either may be None.
    """

    name: str
    on_success: Callable[[DataFrame], Column] | None = None
    on_error: Callable[[DataFrame], Column] | None = None


def raw_hrefs_col() -> Column:
    """Raw pre-normalization hrefs in reference extraction order
    (iframe srcs first, then non-blank anchor hrefs —
    ProcessPage.java:203-216)."""
    iframes = F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("iframe"))
    anchors = F.filter(
        F.col("spans"),
        lambda s: (s["kind"] == F.lit("anchor"))
        & (F.trim(F.coalesce(s["text"], F.lit(""))) != ""),
    )
    return F.concat(
        F.transform(iframes, lambda s: s["media_ref"]),
        F.transform(anchors, lambda s: s["text"]),
    )


def apply_actions(
    pages: DataFrame, links: DataFrame, actions: list[Action]
) -> tuple[DataFrame, DataFrame]:
    """Returns (success_df, error_df) with one extra column per action.

    success_df: success pages + raw_hrefs + referrers + plugin columns.
    error_df:   error pages (error_code != null) + referrers + columns.
    The referrer agg is broadcast when small (Catalyst decides via AQE).
    """
    refs = referrer_sets(links).withColumnRenamed("dst", "_ref_dst")
    base = pages.join(
        refs, pages.full_url == F.col("_ref_dst"), "left"
    ).drop("_ref_dst")
    base = base.withColumn(
        "referrers", F.coalesce(F.col("referrers"), F.lit(""))
    )

    success = base.filter(F.col("spans").isNotNull()).withColumn(
        "raw_hrefs", raw_hrefs_col()
    )
    error = base.filter(F.col("error_code").isNotNull())

    for a in actions:
        if a.on_success is not None:
            success = success.withColumn(a.name, a.on_success(success))
        if a.on_error is not None:
            error = error.withColumn(f"{a.name}_error", a.on_error(error))
    return success, error
