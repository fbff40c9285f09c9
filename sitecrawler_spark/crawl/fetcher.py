"""Fetch-stage building blocks.

The engine's default fetch is the synthetic join in engine._fetch
(tests/bench run offline by design); when constructed with
``web_df=None`` the engine routes every wave through the live stage
here instead (engine._fetch_live). This module holds:

- ``urljoin_udf`` — Arrow UDF for makeRelativeUrlAbsolute
  (ProcessPage.java:231-245; ``new URL(base, href)`` ≙ urljoin for the
  URL shapes the crawl produces).
- ``http_fetch_in_pandas`` — the real-HTTP fetch stage:
  ``applyInPandas`` over (host, salt) groups, one politeness-serialized
  opener per group (the pool analog of WebClientPool.java:185-223),
  bounded retry with the reference's linear backoff
  (WebClientExtended.java:48,53,62,220), client config parity with
  WebClientFactory.java:47-105 (UA, cookies, proxy, insecure-SSL,
  timeout) and the FULL error-code taxonomy of
  SiteCrawlerErrorCodes.java:15-32 / ProcessPage.java:160-185,307-329.
  Exercised offline by tests/test_live_fetch.py against a loopback
  http.server.
- ``build_opener_for`` — the WebClientFactory.getClient analog,
  factored out so the config surface is unit-testable without network.
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
        T.StructField("retry_count", T.IntegerType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("redirect_location", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("err_code", T.IntegerType()),
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


class ResponseCache:
    """Per-executor LRU response cache — the analog of the HtmlUnit
    ``Cache`` shared across the client pool (WebClientPool.java:55-69,
    max 10,240 entries). Python UDF workers are reused across tasks, so
    a module-level instance lives for the executor's lifetime; cross-
    wave memoization additionally comes free from the visited dedupe,
    this layer serves retries and duplicate in-flight URLs."""

    def __init__(
        self,
        max_entries: int = 10_240,
        flush_after: int = 5_000,
        flush_cache: bool = False,
    ):
        from collections import OrderedDict

        self.max_entries = max_entries
        # periodic-flush cadence parity (WebClientPool.java:61-69,
        # 214-221): every ``flush_after`` puts (client returns), the
        # counter resets and — only when ``flush_cache`` is enabled,
        # matching the reference's default-off ``flushCache`` flag —
        # the whole cache clears. LRU eviction still dominates.
        self.flush_after = flush_after
        self.flush_cache = flush_cache
        self.flush_counter = 0
        self.flushes = 0
        self._d: "OrderedDict[str, tuple]" = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, url: str):
        v = self._d.get(url)
        if v is not None:
            self._d.move_to_end(url)
            self.hits += 1
        else:
            self.misses += 1
        return v

    def put(self, url: str, value: tuple) -> None:
        self._d[url] = value
        self._d.move_to_end(url)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)
        self.flush_counter += 1
        if self.flush_counter > self.flush_after:
            if self.flush_cache:
                self._d.clear()
                self.flushes += 1
            self.flush_counter = 0


# one instance per executor python worker (≙ one Cache per pool)
_RESPONSE_CACHE = ResponseCache()


class _NoRedirect:
    """Redirect handler that surfaces 3xx as HTTPError (Location kept in
    headers) — the disable_redirects client mode
    (SiteCrawler.java:252,503-512)."""

    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None


def build_opener_for(
    user_agent: str,
    cookies: list[tuple[str, str]] | None = None,
    proxy: str | None = None,
    insecure_ssl: bool = False,
    follow_redirects: bool = True,
    max_redirect_hops: int = 20,
):
    """WebClientFactory.getClient analog (WebClientFactory.java:47-105):
    one configured opener per fetch task. Returns (opener, headers)."""
    import ssl
    import urllib.request

    handlers = []
    if proxy:
        # PROXY_STRING semantics (WebClientFactory.java:47-60): one
        # host:port applied to both schemes
        handlers.append(
            urllib.request.ProxyHandler({"http": proxy, "https": proxy})
        )
    if insecure_ssl:
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
        handlers.append(urllib.request.HTTPSHandler(context=ctx))
    if not follow_redirects:
        class H(_NoRedirect, urllib.request.HTTPRedirectHandler):
            pass

        handlers.append(H())
    else:
        class H(urllib.request.HTTPRedirectHandler):
            max_redirections = max_redirect_hops

        handlers.append(H())
    opener = urllib.request.build_opener(*handlers)
    headers = {"User-Agent": user_agent}
    if cookies:
        # addCookie applied pool-wide (SiteCrawler.java:260,545-569)
        headers["Cookie"] = "; ".join(f"{k}={v}" for k, v in cookies)
    return opener, headers


def http_fetch_in_pandas(
    fetch_set: DataFrame,
    n_salts: int = 1,
    timeout_s: float = 10.0,
    max_retries: int = 5,
    backoff_base_s: float = 10.0,
    user_agent: str = "Mozilla/5.0 (compatible; sitecrawler-spark/0.1)",
    cookies: list[tuple[str, str]] | None = None,
    proxy: str | None = None,
    insecure_ssl: bool = False,
    follow_redirects: bool = True,
    max_redirect_hops: int = 20,
    cache_size: int = 10_240,
) -> DataFrame:
    """Real-HTTP fetch stage: group by (host, salt) so one task owns a
    host slice (per-client politeness serialization, the pool analog of
    WebClientPool.java:185-223), fetch sequentially inside the task with
    linear backoff on transient errors, return FETCH_RESULT_SCHEMA rows.

    Host salting spreads a hot host's budgeted rows over ``n_salts``
    tasks (north rule skew handling); AQE cannot split grouped-map UDF
    groups, hence the explicit salt column.

    Error taxonomy (ProcessPage.java:307-329 exception dispatch +
    :160-185 degenerate-page dispatch), emitted in ``err_code``:
      2001 connection reset        (SOCKET_EXCEPTION "Connection reset")
      2000 other socket/timeouts   (SOCKET_EXCEPTION, after retries)
      3000 unknown host            (UnknownHostException)
       900 any other exception     (HTTP_GENERIC_ERROR)
      1001 null response           (WEBRESPONSE_COULD_NOT_BE_FOUND)
      1002 body read/decode failed (CONTENTSTRING_COULD_NOT_BE_FOUND)
    (1000 — null Page object — cannot occur in this client: a non-null
    response always constructs the page row; kept reachable via the
    engine's dispatch for parity, see engine._classify_live.)
    """
    import http.client
    import socket
    import time
    import urllib.error
    import urllib.request

    cookie_list = list(cookies or [])

    def classify(exc) -> int:
        if isinstance(exc, urllib.error.URLError) and exc.reason is not None:
            return classify(exc.reason)
        if isinstance(exc, ConnectionResetError) or (
            isinstance(exc, (http.client.RemoteDisconnected, OSError))
            and "reset" in str(exc).lower()
        ):
            return 2001  # ProcessPage.java:317-320
        if isinstance(exc, socket.gaierror):
            return 3000  # ProcessPage.java:324-325 UnknownHostException
        if isinstance(exc, (TimeoutError, socket.timeout, OSError)):
            return 2000  # ProcessPage.java:321-323 SocketException
        return 900  # ProcessPage.java:327-329 generic

    def fetch_group(pdf: pd.DataFrame) -> pd.DataFrame:
        opener, headers = build_opener_for(
            user_agent, cookie_list, proxy, insecure_ssl, follow_redirects,
            max_redirect_hops,
        )
        cache = _RESPONSE_CACHE if cache_size > 0 else None
        if cache is not None:
            cache.max_entries = cache_size
        rows = []
        for r in pdf.sort_values("discovery_order").itertuples():
            status, ctype, redirect, body, err, attempts = (
                None, None, None, None, None, 0,
            )
            if cache is not None:
                hit = cache.get(r.full_url)
                if hit is not None:
                    status, ctype, redirect, body = hit
                    rows.append(
                        (r.full_url, r.host, r.discovery_order, r.depth,
                         r.retry_count, status, ctype, redirect, body, None, 0)
                    )
                    continue
            while attempts <= max_retries:
                err = None
                try:
                    req = urllib.request.Request(r.full_url, headers=headers)
                    with opener.open(req, timeout=timeout_s) as resp:
                        if resp is None:  # defensive: null response → 1001
                            err = 1001
                            break
                        status = resp.status
                        ctype = resp.headers.get("Content-Type", "")
                        try:
                            body = resp.read().decode("utf-8", "replace")
                        except Exception:
                            # null content string (ProcessPage.java:173-179)
                            err = 1002
                    break
                except urllib.error.HTTPError as e:
                    status = e.code
                    redirect = e.headers.get("Location")
                    break
                except Exception as e:  # exception dispatch (:307-329)
                    code = classify(e)
                    if code in (2000, 2001):
                        # recoverable-error retry
                        # (WebClientExtended.java:213-241): linear backoff
                        # base × attempt#, client recycled
                        attempts += 1
                        if attempts > max_retries:
                            err = code
                            break
                        time.sleep(backoff_base_s * attempts)
                        continue
                    err = code
                    break
            if cache is not None and err is None and status == 200:
                # memoize healthy responses only (a failed fetch must be
                # retryable on re-admission)
                cache.put(r.full_url, (status, ctype, redirect, body))
            rows.append(
                (
                    r.full_url, r.host, r.discovery_order, r.depth,
                    r.retry_count, status, ctype, redirect, body, err,
                    attempts,
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
