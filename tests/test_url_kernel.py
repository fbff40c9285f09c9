"""URL kernel tests: golden pairs from the reference's own unit tests
(URLCleanerTest.java:12-82), branch coverage of URLNormalizer.java:49-108
and SiteCrawler.java:1120-1141,1152-1227, and three-way equivalence
(Python kernel == native Column == Arrow UDF) on a randomized corpus.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.kernel import udfs, urls_py, urls_spark

# --- golden pairs: URLCleanerTest.java:12-33 (param whitelist) -------------

CLEAN_GOLDEN = [
    # (url, allowed_params, strip_slash, expected)
    ("https://www.salesforce.com?a=b&c=d&e=f", [], True, "www.salesforce.com"),
    ("https://www.salesforce.com?a=b&c=d&e=f", ["a"], True, "www.salesforce.com?a=b"),
    ("https://www.salesforce.com?a=b&c=d&e=f", ["a", "c"], True,
     "www.salesforce.com?a=b&c=d"),
    # URLCleanerTest.java:36-82 (trailing-slash matrix)
    ("https://www.salesforce.com", [], True, "www.salesforce.com"),
    ("https://www.salesforce.com/", [], True, "www.salesforce.com"),
    ("https://www.salesforce.com/crm", [], True, "www.salesforce.com/crm"),
    ("https://www.salesforce.com/crm/", [], True, "www.salesforce.com/crm"),
    ("https://www.salesforce.com/crm.html", [], True, "www.salesforce.com/crm.html"),
    ("https://www.salesforce.com", [], False, "www.salesforce.com"),
    ("https://www.salesforce.com/", [], False, "www.salesforce.com/"),
    ("https://www.salesforce.com/crm", [], False, "www.salesforce.com/crm"),
    ("https://www.salesforce.com/crm/", [], False, "www.salesforce.com/crm/"),
    ("https://www.salesforce.com/crm.html", [], False, "www.salesforce.com/crm.html"),
    # malformed → null (URLCleaner.java:104-107)
    ("not a url", [], True, None),
    ("/relative/only", [], True, None),
    ("", [], True, None),
    # port and userinfo are dropped (URLCleaner.java:69 host+path only)
    ("https://www.salesforce.com:8080/crm.html", [], True, "www.salesforce.com/crm.html"),
    ("http://user@www.salesforce.com/crm.html", [], True, "www.salesforce.com/crm.html"),
    # fragment stripped by java.net.URL
    ("https://www.salesforce.com/crm.html#frag", [], True, "www.salesforce.com/crm.html"),
    # the whole-string truncation quirk (URLCleaner.java:66): trailing-slash
    # path + query ⇒ the last QUERY char is dropped, slash retained
    ("https://www.salesforce.com/crm/?a=b", ["a"], True,
     "www.salesforce.com/crm/?a="),
    # dot in path blocks the strip even in a directory name
    ("https://www.salesforce.com/v1.0/crm/", [], True,
     "www.salesforce.com/v1.0/crm/"),
    # key-only param, no '='
    ("https://www.salesforce.com/x.html?a&c=d", ["a"], True,
     "www.salesforce.com/x.html?a"),
]


@pytest.mark.parametrize("url,params,strip,expected", CLEAN_GOLDEN)
def test_clean_url_python_golden(url, params, strip, expected):
    assert urls_py.clean_url(url, params, strip) == expected


# --- normalize branch coverage (URLNormalizer.java:49-108) -----------------

BASE = "http://www.salesforce.com"
N2_CASES = [
    ("/x", BASE, BASE + "/x"),                      # :51-53 prepend
    ("//cdn.com/x", BASE, "//cdn.com/x"),           # protocol-relative untouched
    ("http://a.com/index.jsp", BASE, "http://a.com/"),   # :55-57
    ("http://a.com/sub/index.jsp", BASE, "http://a.com/sub/"),
    ("http://a.com/index.jsp/x/index.jsp", BASE,
     "http://a.com//x/"),                           # replace-all quirk
    ("  /pad.html  ", BASE, BASE + "/pad.html"),    # java trim
    ("/x", None, "null/x"),                         # null base quirk
    ("x.html", BASE, "x.html"),                     # non-slash untouched
]


@pytest.mark.parametrize("url,base,expected", N2_CASES)
def test_normalize2_python(url, base, expected):
    assert urls_py.normalize2(url, base) == expected


ORIGIN = "https://www.salesforce.com/a/b.html"
ORIGIN_SLASH = "https://www.salesforce.com/a/"
N3_CASES = [
    ("/x", BASE, ORIGIN, BASE + "/x"),                 # slash-relative → 2-arg
    ("https://z.com/q.html", BASE, ORIGIN, "https://z.com/q.html"),
    ("", BASE, ORIGIN, ""),                            # empty passthrough
    ("tel:12345", BASE, ORIGIN, "tel:12345"),
    ("#frag", BASE, ORIGIN, "#frag"),
    ("???", BASE, ORIGIN, "???"),
    ("mailto:x@y.z", BASE, ORIGIN, "mailto:x@y.z"),
    ("javascript:void(0)", BASE, ORIGIN, "javascript:void(0)"),
    ("//cdn.com/x", BASE, ORIGIN, "https://cdn.com/x"),    # :84-90
    ("rel.html", BASE, ORIGIN,
     "https://www.salesforce.com/a/rel.html"),             # :92-98
    ("rel.html", BASE, ORIGIN_SLASH,
     "https://www.salesforce.com/a/rel.html"),             # :101-106
    ("rel.html", BASE, None, "rel.html"),                  # fallthrough :107
]


@pytest.mark.parametrize("url,base,origin,expected", N3_CASES)
def test_normalize3_python(url, base, origin, expected):
    assert urls_py.normalize3(url, base, origin) == expected


# --- prependBaseUrlIfNeeded (SiteCrawler.java:1120-1141) -------------------

def test_prepend_base():
    f = urls_py.prepend_base_if_needed
    assert f("http://x.com/y", "http://b.com", "https://b.com") == "http://x.com/y"
    assert f("/y", "http://b.com", "https://b.com") == "https://b.com/y"
    assert f("y", "http://b.com", "https://b.com") == "https://b.com/y"
    assert f("y", "http://b.com", None) == "http://b.com/y"
    assert f("", "http://b.com", None) == "http://b.com/"
    with pytest.raises(ValueError):
        f("y", None, None)


# --- isExcluded static predicates (SiteCrawler.java:1152-1227) -------------

CFG = dict(
    base_url="http://www.salesforce.com",
    base_url_secure="https://www.salesforce.com",
    allowed_suffixes=["/", ".jsp", ".htm", ".html"],
    require_allowed_suffixes=True,
    blocked=["/logout"],
    allowed=[],
)

EXCL_CASES = [
    ("http://www.salesforce.com/a.html", False),
    ("https://www.salesforce.com/a/", False),
    ("http://evil.com/a.html", True),              # scope fail
    ("/rel.html", False),                          # site-relative ok
    ("//proto.rel/a.html", True),                  # protocol-relative not ok
    ("/", True),                                   # length>1 required
    ("http://www.salesforce.com/a.pdf", True),     # suffix fail
    ("http://www.salesforce.com/a.HTML", False),   # lowercased before match
    ("http://www.salesforce.com/a.pdf?x=/", True),  # suffix checked pre-'?'
    ("http://www.salesforce.com/a.html?x=1", False),
    ("http://www.salesforce.com/logout/a.html", True),  # blocked substring
]


@pytest.mark.parametrize("url,excluded", EXCL_CASES)
def test_is_excluded_static_python(url, excluded):
    assert urls_py.is_excluded_static(url, **CFG) is excluded


def test_is_excluded_allowed_whitelist():
    cfg = dict(CFG, allowed=["/products/"])
    assert urls_py.is_excluded_static(
        "http://www.salesforce.com/products/a.html", **cfg) is False
    assert urls_py.is_excluded_static(
        "http://www.salesforce.com/other/a.html", **cfg) is True


def test_is_excluded_visited_probes():
    visited = {"http://www.salesforce.com/a.html", "www.salesforce.com/b"}
    kw = dict(CFG)
    assert urls_py.is_excluded("http://www.salesforce.com/a.html",
                               visited, **kw) is True          # exact (F3)
    assert urls_py.is_excluded("http://www.salesforce.com/b/",
                               visited, **kw) is True          # cleaned (F6)
    assert urls_py.is_excluded("http://www.salesforce.com/c.html",
                               visited, **kw) is False


# --- randomized corpus for three-way equivalence ---------------------------

def _random_urls(n=400, seed=42):
    rng = random.Random(seed)
    hosts = ["www.salesforce.com", "blogs.salesforce.com", "x.org", "a.b.co"]
    paths = ["", "/", "/crm", "/crm/", "/a/b.html", "/a.b/c/", "/index.jsp",
             "/sub/index.jsp", "/x.htm", "/y.jsp", "/v1.0/d/", "/%20sp"]
    queries = ["", "?a=b", "?a=b&c=d&e=f", "?a", "?x=1&a=b&", "?=v", "?a=b#f"]
    prefixes = ["https://", "http://", "HTTP://", "", "//", "/", "tel:",
                "mailto:", "javascript:", "#", "  ", "ftp://"]
    out = []
    for _ in range(n):
        p = rng.choice(prefixes)
        if p in ("https://", "http://", "HTTP://", "//"):
            u = p + rng.choice(hosts) + rng.choice(paths) + rng.choice(queries)
        elif p == "/":
            u = "/" + rng.choice(paths).lstrip("/") + rng.choice(queries)
        else:
            u = p + rng.choice(paths).lstrip("/")
        out.append(u)
    out.extend(u for (u, _p, _s, _e) in CLEAN_GOLDEN)
    # path-form java.net.URL shapes (host='', rest is the path) — all
    # three kernels must agree (ADVICE r1: native used to null these)
    out.extend(["http:foo", "https:foo/bar", "HTTP:x?a=b", "http:/x/", "http:",
                "https:#f", "http:foo#frag?notq"])
    return out


def test_three_way_equivalence(spark):
    """Native Column == Arrow UDF == Python kernel, on the random corpus,
    for clean_url / normalize2 / host / static admission."""
    urls = _random_urls()
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    params = ["a", "c"]
    cfg = CrawlerConfig(
        base_url="http://www.salesforce.com",
        base_url_secure="https://www.salesforce.com",
        blocked=["/logout"],
    )
    got = (
        df.withColumn("clean_native", urls_spark.clean_url(F.col("url"), params, True))
        .withColumn("clean_udf", udfs.make_clean_udf(params, True)("url"))
        .withColumn("norm_native", urls_spark.normalize2(F.col("url"), BASE))
        .withColumn("norm_udf", udfs.make_normalize_udf(BASE)("url"))
        .withColumn("host_native", urls_spark.url_host(F.col("url")))
        .withColumn("host_udf", udfs.host_udf("url"))
        .withColumn("excl_native", urls_spark.is_excluded_static(F.col("url"), cfg))
        .collect()
    )
    for row in got:
        u = row["url"]
        exp_clean = urls_py.clean_url(u, params, True)
        exp_norm = urls_py.normalize2(u, BASE)
        exp_host = urls_py.url_host(u)
        exp_excl = urls_py.is_excluded_static(
            u, cfg.base_url, cfg.base_url_secure, cfg.allowed_suffixes,
            cfg.require_allowed_suffixes, cfg.blocked, cfg.allowed)
        assert row["clean_native"] == exp_clean, f"clean_native {u!r}"
        assert row["clean_udf"] == exp_clean, f"clean_udf {u!r}"
        assert row["norm_native"] == exp_norm, f"norm_native {u!r}"
        assert row["norm_udf"] == exp_norm, f"norm_udf {u!r}"
        assert row["host_native"] == exp_host, f"host {u!r}"
        assert row["excl_native"] == exp_excl, f"excl {u!r}"


def test_registered_sql_udfs_match_kernel(spark):
    """register_udfs exposes the batch kernels as session SQL functions
    (the north star's 'registered pandas/Arrow UDFs' plugin surface):
    plain-SQL calls must return byte-identical results to the scalar
    reference kernel on the random corpus, including the clean-url
    quirks bound at registration time."""
    from sitecrawler_spark.register import register_udfs

    urls = _random_urls()
    params = ["a", "c"]
    names = register_udfs(spark, allowed_parameters=params)
    assert names == ["sc_clean_url", "sc_url_host", "sc_urljoin"]
    spark.createDataFrame(
        [(u,) for u in urls], ["url"]
    ).createOrReplaceTempView("_reg_urls")
    rows = spark.sql(
        "SELECT url, sc_clean_url(url) AS c, sc_url_host(url) AS h, "
        "sc_urljoin('http://www.salesforce.com/a/b', url) AS j "
        "FROM _reg_urls"
    ).collect()
    from sitecrawler_spark.kernel.urls_pd import urljoin_series
    import pandas as pd

    base = "http://www.salesforce.com/a/b"
    exp_j = urljoin_series(
        pd.Series([base] * len(urls)), pd.Series(urls, dtype="string")
    )
    exp_j = {u: (None if v is pd.NA or v is None else v)
             for u, v in zip(urls, exp_j)}
    for row in rows:
        u = row["url"]
        assert row["c"] == urls_py.clean_url(u, params, True), f"clean {u!r}"
        assert row["h"] == urls_py.url_host(u), f"host {u!r}"
        assert row["j"] == exp_j[u], f"join {u!r}"


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    urls = _random_urls(50)
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    spark_vals = {
        r["url"]: r["h"]
        for r in df.withColumn("h", urls_spark.portable_hash64(F.col("url"))).collect()
    }
    con = duckdb.connect()
    for u in urls:
        (dv,) = con.execute(
            "select ('0x' || substr(md5(?),1,15))::BIGINT", [u]
        ).fetchone()
        assert spark_vals[u] == dv, u
