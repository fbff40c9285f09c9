"""SQL-registered Arrow UDFs over the batch URL kernels.

The north star maps SiteCrawler's Java plugin classes to "plugin-
equivalent page processors expressed as REGISTERED pandas/Arrow UDFs".
The engine itself uses native Column kernels (kernel/urls_spark.py) in
every hot path and the pandas batch kernels (kernel/urls_pd.py) behind
Arrow UDF barriers; this module additionally REGISTERS the batch
kernels with the session so plugin authors and plain-SQL users can
call them by name:

    register_udfs(spark, allowed_parameters=[...])
    spark.sql("SELECT sc_clean_url(url), sc_url_host(url) FROM t")

Parity: the registered functions are the SAME pandas kernels that are
fuzz-pinned against the scalar reference model (urls_py) and the
native Column kernels in tests/test_url_kernel.py /
test_url_properties.py, so SQL callers get byte-identical semantics
(URLCleaner.java:58-108 quirks included).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

from sitecrawler_spark.kernel.urls_pd import (
    clean_series,
    host_series,
    urljoin_series,
)


def register_udfs(
    spark: SparkSession,
    allowed_parameters: list[str] | None = None,
    url_path_should_not_end_in_slash: bool = True,
    prefix: str = "sc_",
) -> list[str]:
    """Register the batch URL kernels as session SQL functions.

    Returns the registered names: ``<prefix>clean_url`` (1 arg),
    ``<prefix>url_host`` (1 arg), ``<prefix>urljoin`` (base, href).
    Config (param whitelist, slash quirk) is bound at registration
    time, mirroring how the reference wires a configured URLCleaner
    into its plugin pipeline.
    """
    params = list(allowed_parameters or [])
    strip = url_path_should_not_end_in_slash

    @pandas_udf("string")
    def _clean(u):
        return clean_series(u, params, strip)

    @pandas_udf("string")
    def _host(u):
        return host_series(u)

    @pandas_udf("string")
    def _join(base, href):
        return urljoin_series(base, href)

    names = [f"{prefix}clean_url", f"{prefix}url_host", f"{prefix}urljoin"]
    spark.udf.register(names[0], _clean)
    spark.udf.register(names[1], _host)
    spark.udf.register(names[2], _join)
    return names
