"""Fetch-stage building blocks.

The engine's default fetch is the synthetic join in engine._fetch
(tests/bench run offline by design). This module holds:

- ``urljoin_udf`` — Arrow UDF for makeRelativeUrlAbsolute
  (ProcessPage.java:231-245; ``new URL(base, href)`` ≙ urljoin for the
  URL shapes the crawl produces).
- ``http_fetch_in_pandas`` — the real-HTTP fetch stage shape for a
  cluster deployment: ``applyInPandas`` over host(-salt) groups, one
  politeness-serialized session per group, bounded retry with the
  reference's linear backoff (10 s × attempt, max 5 —
  WebClientExtended.java:48,53,62,220). The network call itself is
  stdlib urllib; THIS PATH IS NOT EXERCISED IN THE SANDBOX (no
  network) — the Spark-side plumbing (grouping, schema, batching,
  retry bookkeeping) is the tested surface via the synthetic fetch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sitecrawler_spark.kernel import urls_pd

FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("full_url", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("discovery_order", T.LongType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("redirect_location", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("retries", T.IntegerType()),
    ]
)


@F.pandas_udf(T.StringType())
def urljoin_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    # whole-batch absolutization (urls_pd.urljoin_series): vectorized
    # fast paths for absolute/root-relative hrefs, exact urljoin
    # fallback only for the residual minority (:240-242 keeps raw href
    # on resolution failure, mirrored inside the kernel).
    return urls_pd.urljoin_series(base, href)


def http_fetch_in_pandas(
    fetch_set: DataFrame,
    n_salts: int = 1,
    timeout_s: float = 10.0,
    max_retries: int = 5,
    backoff_base_s: float = 10.0,
    user_agent: str = "Mozilla/5.0 (compatible; sitecrawler-spark/0.1)",
) -> DataFrame:
    """Real-HTTP fetch stage: group by (host, salt) so one task owns a
    host slice (per-client politeness serialization, the pool analog of
    WebClientPool.java:185-223), fetch sequentially inside the task with
    linear backoff on transient errors, return FETCH_RESULT_SCHEMA rows.

    Host salting spreads a hot host's budgeted rows over ``n_salts``
    tasks (north rule skew handling); AQE cannot split grouped-map UDF
    groups, hence the explicit salt column.
    """
    import socket
    import time
    import urllib.error
    import urllib.request

    def fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.sort_values("discovery_order").itertuples():
            status, ctype, redirect, body, attempts = None, None, None, None, 0
            while attempts <= max_retries:
                try:
                    req = urllib.request.Request(
                        r.full_url, headers={"User-Agent": user_agent}
                    )
                    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                        status = resp.status
                        ctype = resp.headers.get("Content-Type", "")
                        body = resp.read().decode("utf-8", "replace")
                    break
                except urllib.error.HTTPError as e:
                    status = e.code
                    redirect = e.headers.get("Location")
                    break
                except (TimeoutError, socket.timeout, OSError):
                    # recoverable-error retry (WebClientExtended.java:213-241):
                    # linear backoff base × attempt#, client recycled
                    attempts += 1
                    if attempts > max_retries:
                        status = 2000
                        break
                    time.sleep(backoff_base_s * attempts)
            rows.append(
                (
                    r.full_url, r.host, r.discovery_order, r.depth,
                    status, ctype, redirect, body, attempts,
                )
            )
        return pd.DataFrame(rows, columns=[f.name for f in FETCH_RESULT_SCHEMA])

    salted = fetch_set.withColumn(
        "_salt", F.pmod(F.xxhash64("full_url"), F.lit(n_salts)).cast("int")
    )
    return (
        salted.groupBy("host", "_salt")
        .applyInPandas(fetch_group, FETCH_RESULT_SCHEMA)
    )
