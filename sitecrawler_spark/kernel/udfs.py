"""Arrow-vectorized pandas UDFs over the URL kernel.

The engine's hot path uses the native Column builders in
``urls_spark`` (JVM, whole-stage codegen). These Arrow UDFs exist for
(a) the north-star requirement that canonicalize+hash be available as
vectorized Arrow UDFs, (b) parity testing against the Python kernel,
and (c) callers that want the byte-exact java.net.URL behavior in one
call. Batches move via Arrow (spark.sql.execution.arrow.pyspark.enabled);
there is no per-row Python at the Spark row level.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sitecrawler_spark.kernel import urls_pd


def make_normalize_udf(base: str | None):
    """normalize2 (URLNormalizer.java:49-60), vectorized with pandas
    string ops across the whole Arrow batch."""
    base_lit = "null" if base is None else base

    @F.pandas_udf(T.StringType())
    def normalize_urls(s: pd.Series) -> pd.Series:
        u = s.str.replace(r"^[\x00-\x20]+|[\x00-\x20]+$", "", regex=True)
        rel = u.str.startswith("/") & ~u.str.startswith("//")
        u = u.mask(rel, base_lit + u)
        idx = u.str.endswith("/index.jsp")
        u = u.mask(idx, u.str.replace("/index.jsp", "/", regex=False))
        return u

    return normalize_urls


def make_clean_udf(
    allowed_parameters: list[str] | None = None,
    url_path_should_not_end_in_slash: bool = True,
):
    """clean_url (URLCleaner.java:58-108) as an Arrow UDF — whole-batch
    pandas string ops (urls_pd.clean_series), byte-parity with the
    scalar oracle urls_py.clean_url enforced by tests/test_url_kernel."""
    params = list(allowed_parameters or [])
    strip = url_path_should_not_end_in_slash

    @F.pandas_udf(T.StringType())
    def clean_urls(s: pd.Series) -> pd.Series:
        return urls_pd.clean_series(s, params, strip)

    return clean_urls


@F.pandas_udf(T.StringType())
def host_udf(s: pd.Series) -> pd.Series:
    """Host extraction via the vectorized java.net.URL-parity parser."""
    return urls_pd.host_series(s)


def portable_hash64_py(s: str) -> int:
    """Scalar Python form of urls_spark.portable_hash64 (md5 first 15
    hex chars as a 60-bit int) — for textbook-scan UDF internals and
    driver-side cross-checks."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@F.pandas_udf(T.LongType())
def portable_hash64_udf(s: pd.Series) -> pd.Series:
    """Same value as urls_spark.portable_hash64 (md5 first 15 hex chars),
    computed Python-side — used to cross-check the portable hash."""
    return s.map(
        lambda u: int(hashlib.md5(u.encode("utf-8")).hexdigest()[:15], 16)
        if u is not None
        else None
    ).astype("Int64")
