"""sitecrawler_spark — a PySpark-native crawl/analytics engine.

From-scratch reimplementation of the capabilities of the reference
``forcedotcom/SiteCrawler`` (a single-JVM thread-pool crawler) as an
idiomatic Spark design: DataFrame micro-batch crawl waves over
snapshot-versioned columnar tables, vectorized Arrow/pandas UDFs, a
distributed bloom URL-seen filter, per-host politeness budgets, and
host-hash partitioning with explicit skew handling.

No code is copied from the reference; reference files are cited as
``path:line`` in docstrings for semantic parity only.
"""

__version__ = "0.1.0"

from sitecrawler_spark.config import CrawlerConfig  # noqa: F401
