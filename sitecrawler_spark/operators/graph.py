"""Referrer-graph operators.

The reference keeps a global ``urlFrom: target → set(sources)`` map
(ProcessPage.java:93, updated :257-263, redirect propagation :373-376).
Spark-native: the ``links`` edge table IS the graph; the urlFrom view is
a ``collect_set`` aggregation, broadcast when joined back to pages."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referrer_sets(links: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """dst → sorted referrer set (+count). Sorted so results are
    deterministic and hash-comparable."""
    return links.groupBy(F.col(dst).alias("dst")).agg(
        F.count_distinct(F.col(src)).alias("n_referrers"),
        F.array_join(F.array_sort(F.collect_set(F.col(src))), ",").alias("referrers"),
    )


def join_referrers(pages: DataFrame, links: DataFrame, url_col: str = "full_url") -> DataFrame:
    """pages + their referrer sets (what plugins receive,
    ProcessPage.java:218,276). Broadcast the agg when small."""
    refs = referrer_sets(links)
    return pages.join(refs, pages[url_col] == refs.dst, "left").drop("dst")
