"""Live-HTTP fetch path: the engine crawling a REAL (loopback) web
server matches the reference model's visit order and seen set — the
same parity gate as test_crawl_e2e, but through
crawl/fetcher.http_fetch_in_pandas instead of the synthetic join
(WebClientExtended.java:144-168 + WebClientPool.java:185-223 analog).

Also covers: cookie config honored pool-wide (SiteCrawler.java:545-569),
the full SiteCrawlerErrorCodes taxonomy (ProcessPage.java:160-185,
307-329), and client-factory toggles (WebClientFactory.java:47-105).
No external network — everything talks to 127.0.0.1.
"""

from __future__ import annotations

import threading
import time
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.crawl import sitegen
from sitecrawler_spark.crawl.engine import SparkSiteCrawler
from sitecrawler_spark.crawl.fetcher import build_opener_for, http_fetch_in_pandas
from sitecrawler_spark.crawl.model import ReferenceCrawlModel


class SiteHandler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        srv = self.server
        # special routes for the exception taxonomy
        if self.path == "/__reset__":
            # connection reset mid-handshake → ConnectionResetError (2001)
            self.connection.setsockopt(
                __import__("socket").SOL_SOCKET,
                __import__("socket").SO_LINGER,
                __import__("struct").pack("ii", 1, 0),
            )
            self.connection.close()
            return
        if self.path == "/__sleep__":
            time.sleep(3)  # > client timeout → 2000
            self.send_response(200)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        if self.path == "/__midbody__":
            # Content-Length longer than the body → IncompleteRead on
            # read() → null content string (1002)
            body = b"<html>partial"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body) + 100))
            self.end_headers()
            self.wfile.write(body)
            self.wfile.flush()
            self.connection.close()
            return
        if srv.require_cookie and self.headers.get("Cookie") != srv.require_cookie:
            self.send_response(403)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        row = srv.web.get(self.path)
        if row is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        status = row["status"]
        if status in (301, 302):
            self.send_response(status)
            self.send_header("Location", row["redirect_location"])
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        body = b"" if row["empty_body"] else row["html"].encode("utf-8")
        self.send_response(status)
        self.send_header("Content-Type", row["content_type"])
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if status < 400:
            self.wfile.write(body)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), SiteHandler)
    srv.web = {}
    srv.require_cookie = None
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _load_site(srv, **kw):
    host = f"127.0.0.1:{srv.server_address[1]}"
    rows = sitegen.generate_site(hosts=(host,), scheme="http", **kw)
    srv.web = {r["url"].split(host, 1)[1]: r for r in rows}
    return rows, f"http://{host}"


def _run_live(spark, cfg, rows, seeds, max_waves=40):
    model = ReferenceCrawlModel(cfg, rows)
    expected = model.crawl(seeds)
    eng = SparkSiteCrawler(spark, cfg, web_df=None)  # live fetcher
    eng.crawl(seeds, max_waves=max_waves)
    got_order = [r["full_url"] for r in eng.visit_order_df().collect()]
    got_visited = {r["s"] for r in eng.visited_df().collect()}
    return expected, got_order, got_visited, eng


def test_live_e2e_matches_model(spark, server):
    rows, base = _load_site(server, n_pages=24, seed=11)
    server.require_cookie = None
    cfg = CrawlerConfig(base_url=base, disable_redirects=True,
                        fetch_timeout_s=5.0, backoff_base_ms=0)
    seeds = sitegen.seeds_for(rows, 2)
    expected, order, visited, _ = _run_live(spark, cfg, rows, seeds)
    assert len(expected.visit_order) > 8
    assert order == expected.visit_order
    assert visited == expected.visited


def test_live_e2e_redirects_followed(spark, server):
    rows, base = _load_site(server, n_pages=24, seed=13)
    server.require_cookie = None
    cfg = CrawlerConfig(base_url=base, disable_redirects=False,
                        fetch_timeout_s=5.0, backoff_base_ms=0)
    seeds = sitegen.seeds_for(rows, 2)
    expected, order, visited, _ = _run_live(spark, cfg, rows, seeds)
    assert order == expected.visit_order
    assert visited == expected.visited


def test_live_cookie_honored(spark, server):
    rows, base = _load_site(server, n_pages=12, seed=17)
    server.require_cookie = "sid=abc123; lang=en"
    try:
        cfg = CrawlerConfig(base_url=base, disable_redirects=True,
                            cookies=[("sid", "abc123"), ("lang", "en")],
                            fetch_timeout_s=5.0, backoff_base_ms=0)
        seeds = sitegen.seeds_for(rows, 1)
        expected, order, visited, _ = _run_live(spark, cfg, rows, seeds)
        assert order == expected.visit_order  # cookie sent ⇒ normal crawl

        # without the cookie every page 403s: seed visited, nothing parsed
        cfg2 = CrawlerConfig(base_url=base, disable_redirects=True,
                             fetch_timeout_s=5.0, backoff_base_ms=0)
        eng = SparkSiteCrawler(spark, cfg2, web_df=None)
        eng.crawl(seeds, max_waves=5)
        codes = {r["error_code"] for r in eng.visit_order_df().collect()}
        assert codes == {403}
    finally:
        server.require_cookie = None


def test_live_error_taxonomy(spark, server):
    """Every exception-path SiteCrawlerErrorCodes value is actually
    produced by the live fetcher (ProcessPage.java:307-329 dispatch)."""
    _load_site(server, n_pages=4, seed=19)
    port = server.server_address[1]
    urls = [
        (f"http://127.0.0.1:{port}/__reset__", "reset"),        # → 2001
        (f"http://127.0.0.1:{port}/__sleep__", "timeout"),      # → 2000
        (f"http://127.0.0.1:{port}/__midbody__", "midbody"),    # → 1002
        ("http://nonexistent-host.invalid/x", "unknownhost"),   # → 3000
        ("gopher://127.0.0.1/x", "generic"),                    # → 900
    ]
    df = spark.createDataFrame(
        [(u, "127.0.0.1", i, 0, 0) for i, (u, _) in enumerate(urls)],
        "full_url string, host string, discovery_order long, depth int, retry_count int",
    )
    out = http_fetch_in_pandas(
        df, timeout_s=0.8, max_retries=1, backoff_base_s=0.0
    ).collect()
    by_url = {r["full_url"]: r for r in out}
    assert by_url[urls[0][0]]["err_code"] == 2001
    assert by_url[urls[1][0]]["err_code"] == 2000
    assert by_url[urls[2][0]]["err_code"] == 1002
    assert by_url[urls[3][0]]["err_code"] == 3000
    assert by_url[urls[4][0]]["err_code"] == 900


def test_classifier_emits_1000_1001(spark):
    """Null page / null response dispatch (ProcessPage.java:160-171) —
    defensive codes a healthy client can't produce, classified from raw
    fetch rows."""
    from sitecrawler_spark.crawl.fetcher import FETCH_RESULT_SCHEMA

    cfg = CrawlerConfig(base_url="http://x.com", disable_redirects=True)
    eng = SparkSiteCrawler(spark, cfg, web_df=None)
    raw = spark.createDataFrame(
        [
            ("http://x.com/a", "x.com", 0, 0, 0, None, None, None, None, None, 0),
            ("http://x.com/b", "x.com", 1, 0, 0, 200, "text/html", None, None, 1001, 0),
            ("http://x.com/c", "x.com", 2, 0, 0, 200, "text/html", None, None, 1002, 0),
        ],
        FETCH_RESULT_SCHEMA,
    )
    got = {r["full_url"]: r["error_code"]
           for r in eng._classify_live(raw).collect()}
    assert got["http://x.com/a"] == 1000
    assert got["http://x.com/b"] == 1001
    assert got["http://x.com/c"] == 1002


def test_opener_client_config():
    """WebClientFactory parity: proxy, insecure-SSL, cookie header,
    redirect toggle (WebClientFactory.java:47-105)."""
    import ssl
    import urllib.request

    opener, headers = build_opener_for(
        "ua/1.0", cookies=[("a", "1"), ("b", "2")], proxy="proxy.local:3128",
        insecure_ssl=True, follow_redirects=False,
    )
    assert headers["User-Agent"] == "ua/1.0"
    assert headers["Cookie"] == "a=1; b=2"
    kinds = [type(h).__mro__ for h in opener.handlers]
    assert any(urllib.request.ProxyHandler in m for m in kinds)
    https = [h for h in opener.handlers
             if isinstance(h, urllib.request.HTTPSHandler)]
    assert https and https[0]._context.verify_mode == ssl.CERT_NONE
    proxies = [h for h in opener.handlers
               if isinstance(h, urllib.request.ProxyHandler)]
    assert proxies[0].proxies == {"http": "proxy.local:3128",
                                  "https": "proxy.local:3128"}
    # disable mode surfaces 3xx instead of following
    redirects = [h for h in opener.handlers
                 if isinstance(h, urllib.request.HTTPRedirectHandler)]
    assert redirects and redirects[0].redirect_request(
        None, None, 301, "", {}, "http://x"
    ) is None


def test_response_cache_memoizes_within_executor(spark, server):
    """D9 analog (WebClientPool.java:55-69): the per-executor LRU serves
    repeat URLs without re-hitting the network."""
    rows, base = _load_site(server, n_pages=6, seed=23)
    server.require_cookie = None
    url = rows[0]["url"]
    # duplicate rows in ONE (host, salt) group → second is a cache hit
    df = spark.createDataFrame(
        [(url, "h", 0, 0, 0), (url, "h", 1, 0, 0)],
        "full_url string, host string, discovery_order long, depth int, retry_count int",
    ).coalesce(1)
    out = http_fetch_in_pandas(df, timeout_s=5.0, max_retries=0,
                               backoff_base_s=0.0).collect()
    assert len(out) == 2
    assert out[0]["status"] == out[1]["status"] == 200
    assert out[0]["body"] == out[1]["body"]
    # cache off → both rows fetch (smoke check the toggle)
    out2 = http_fetch_in_pandas(df, timeout_s=5.0, max_retries=0,
                                backoff_base_s=0.0, cache_size=0).collect()
    assert len(out2) == 2


def test_pool_accounting_balances(spark, server):
    """A4 analog: take/return balance at wave boundaries, recycles count
    transient re-admissions (WebClientPool.java:272-282)."""
    rows, base = _load_site(server, n_pages=10, seed=29)
    server.require_cookie = None
    cfg = CrawlerConfig(base_url=base, disable_redirects=True,
                        fetch_timeout_s=5.0, backoff_base_ms=0)
    eng = SparkSiteCrawler(spark, cfg, web_df=None)
    eng.crawl(sitegen.seeds_for(rows, 2), max_waves=20)
    acct = eng.pool_accounting()
    assert acct["take"] == acct["return"] == eng.visited_counter > 0
    assert acct["unaccounted_for"] == 0


def test_robots_parse_and_live_prefetch(spark, server):
    """robots.txt workflow the reference README delegates to users
    (README.md:159-160): parse Disallow groups, prefetch over live HTTP,
    compile into the blocked predicate — crawl parity with a model fed
    the same rules."""
    from sitecrawler_spark.crawl.robots import (
        fetch_robots_rules,
        parse_robots_txt,
    )

    body = """
# comment
User-agent: evilbot
Disallow: /everything

User-agent: *
Disallow: /cloud
Disallow:            # empty = allow-all, skipped
Disallow: /crm/p1

User-agent: sitecrawler-spark
User-agent: otherbot
Disallow: /extra
"""
    rules = parse_robots_txt(body, "h.com", user_agent="sitecrawler-spark")
    assert [(r.host, r.disallow) for r in rules] == [
        ("h.com", "/cloud"), ("h.com", "/crm/p1"), ("h.com", "/extra")
    ]
    # generic UA only matches the '*' group
    rules2 = parse_robots_txt(body, "h.com", user_agent="randombot")
    assert [r.disallow for r in rules2] == ["/cloud", "/crm/p1"]

    # live prefetch: loopback server serves /robots.txt; engine honors it
    rows, base = _load_site(server, n_pages=20, seed=31)
    server.require_cookie = None
    host = base.split("://", 1)[1]
    server.web["/robots.txt"] = {
        "status": 200, "content_type": "text/plain",
        "redirect_location": None, "empty_body": False,
        "html": "User-agent: *\nDisallow: /crm\n",
    }
    fetched = fetch_robots_rules([base])
    assert [(r.host, r.disallow) for r in fetched] == [(host, "/crm")]
    cfg = CrawlerConfig(base_url=base, disable_redirects=True,
                        robots_rules=fetched,
                        fetch_timeout_s=5.0, backoff_base_ms=0)
    # robots rules compile into the blocked predicate on BOTH the engine
    # (urls_spark.is_excluded_static) and the model (urls_py.is_excluded)
    seeds = sitegen.seeds_for(rows, 2)
    expected, order, visited, _ = _run_live(spark, cfg, rows, seeds)
    assert order == expected.visit_order
    assert not any("/crm" in u for u in order)
