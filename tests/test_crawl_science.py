"""Behavioral pins for the crawl-science operators: OPIC importance,
crawl-trap scoring, and change-rate-driven re-crawl scheduling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_opic_conserves_cash(spark):
    """Total cash is 1.0 every step, so the time-averaged importance
    sums to 1 (up to the 9dp per-iteration rounding drift)."""
    out = entrymod.queries()["q_opic"](spark, SF)
    total = out.agg(F.sum("importance")).collect()[0][0]
    assert math.isclose(total, 1.0, abs_tol=1e-3), total
    assert out.filter(F.col("importance") < 0).count() == 0


def test_opic_rewards_indegree(spark):
    """Nodes with higher in-degree on the derived graph should average
    higher importance than zero-in-degree nodes (cash flows along
    edges; dangling redistribution alone is the floor)."""
    from sitecrawler_spark.operators.graph import opic

    rows = [(i,) for i in range(20)]
    nodes = spark.createDataFrame(rows, ["id"])
    # star: everyone links to node 0 (plus a chain so no node dangles)
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 20)] + [(0, 1)], ["src", "dst"]
    )
    imp = {r["id"]: r["importance"] for r in opic(nodes, edges, n_iters=5).collect()}
    assert imp[0] == max(imp.values())
    assert imp[0] > 5 * imp[5]


def test_trap_score_is_map_only_and_flags_repeats(spark):
    """The trap scorer must stay exchange-free (frontier hygiene runs
    at 10^10 URLs as a scan-project), and every URL whose max repeated
    segment count >= 3 must be flagged."""
    q = entrymod.queries()["q_url_trap_score"]
    df = q(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    rows = df.collect()
    assert any(r["is_trap"] for r in rows)
    for r in rows:
        assert r["is_trap"] == (r["trap_score"] >= 1.0)
        if r["max_seg_repeat"] >= 3:
            assert r["is_trap"], r
        # depth counts non-empty path segments of the actual URL
        path = r["url"].split("://", 1)[1].split("?", 1)[0]
        segs = [s for s in path.split("/")[1:] if s != ""]
        assert r["depth"] == len(segs), r


def test_recrawl_lambda_tracks_change_cadence(spark):
    """Pages whose content version flips every hour must estimate a
    higher change rate than pages flipping every 5 hours (the
    Cho–Garcia-Molina estimator is monotone in observed change
    fraction)."""
    out = entrymod.queries()["q_recrawl_schedule"](spark, SF).withColumn(
        "cadence", F.lit(1) + F.col("page_id") % 5
    )
    means = {
        r["cadence"]: r["m"]
        for r in out.groupBy("cadence").agg(F.avg("lambda_hat").alias("m")).collect()
    }
    assert means[1] > means[5], means
    # re-crawl interval is the inverse signal
    inv = {
        r["cadence"]: r["m"]
        for r in out.groupBy("cadence")
        .agg(F.avg("recrawl_intervals").alias("m"))
        .collect()
    }
    assert inv[1] < inv[5], inv


def test_seed_from_sitemaps_matches_list_seed(spark):
    """Sitemap-XML seeding equals list seeding: same frontier rows,
    same discovery order; urlset entry order within a document and
    document order across rows define seed order; nested sitemapindex
    refs are NOT enqueued as pages."""
    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    xml1 = (
        "<urlset>"
        "<url><loc>/a.html</loc><priority>0.9</priority></url>"
        "<url><loc>/b.html</loc></url>"
        "<sitemap><loc>/nested-sitemap.xml</loc></sitemap>"
        "</urlset>"
    )
    xml2 = "<urlset><url><loc>/c.html</loc></url><url><loc>/a.html</loc></url></urlset>"
    cfg = CrawlerConfig(
        base_url="http://www.salesforce.com",
        base_url_secure="https://www.salesforce.com",
        blocked=["/logout"],
    )
    sitemaps = spark.createDataFrame([(0, xml1), (1, xml2)], ["ord", "xml"])
    eng_s = SparkSiteCrawler(spark, cfg, web_df=None)
    eng_s.seed_from_sitemaps(sitemaps, xml_col="xml", order_col="ord")
    got = [(r["raw_url"], r["discovery_order"])
           for r in eng_s.frontier.orderBy("discovery_order").collect()]

    eng_l = SparkSiteCrawler(spark, cfg, web_df=None)
    eng_l.seed(["/a.html", "/b.html", "/c.html", "/a.html"])
    want = [(r["raw_url"], r["discovery_order"])
            for r in eng_l.frontier.orderBy("discovery_order").collect()]
    assert got == want
    assert [u for u, _ in got] == ["/a.html", "/b.html", "/c.html"]


def test_host_opic_scores_feed_host_priority(spark):
    """host_opic produces positive (host, rank) scores over a URL link
    table and plugs into the engine's host_score priority path."""
    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler
    from sitecrawler_spark.operators.graph import host_opic

    links = spark.createDataFrame(
        [
            ("https://a.example.com/1", "https://b.example.com/x"),
            ("https://a.example.com/2", "https://b.example.com/y"),
            ("https://c.example.com/1", "https://b.example.com/x"),
            ("https://b.example.com/x", "https://c.example.com/2"),
        ],
        ["src", "dst"],
    )
    scores = host_opic(links, n_iters=4)
    ranks = {r["host"]: r["rank"] for r in scores.collect()}
    assert set(ranks) == {"a.example.com", "b.example.com", "c.example.com"}
    assert all(v > 0 for v in ranks.values())
    # b receives cash from both a and c: it must outrank a (no in-links)
    assert ranks["b.example.com"] > ranks["a.example.com"]

    cfg = CrawlerConfig(
        base_url="https://a.example.com",
        frontier_priority="host_score",
    )
    eng = SparkSiteCrawler(spark, cfg, web_df=None)
    eng.set_host_scores_df(scores)  # accepts the (host, rank) shape
    assert eng._host_scores_df is not None
