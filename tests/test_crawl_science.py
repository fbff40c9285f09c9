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
    # the scorer itself adds NO data-flow shuffle; the only permitted
    # exchange is register_views' conditional single-row-group scan
    # lift (hash on the table's unique id — OPTIMIZATION_r06.md), which
    # does not fire on at-scale multi-split inputs
    import re

    exchanges = re.findall(r"Exchange (\w+)\(([a-zA-Z_0-9]+)", plan)
    assert all(
        kind == "hashpartitioning" and col.startswith("doc_id")
        for kind, col in exchanges
    ), exchanges
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


def _recrawl_site(ver: int):
    """Two-host site for the change-rate loop: fast.example.com's page
    text carries the epoch version (content changes every epoch),
    slow.example.com is static. Pages link within-host rings plus one
    cross-host edge so two seeds reach everything."""
    from sitecrawler_spark.crawl.parse import render_spans_to_html

    hosts = ["fast.example.com", "slow.example.com"]
    urls = {
        h: [f"https://{h}/p{i}.html" for i in range(3)] for h in hosts
    }
    rows = []
    for h in hosts:
        for i in range(3):
            text = (
                f"fast content version {ver} page {i}"
                if h == "fast.example.com"
                else f"slow content page {i}"
            )
            spans = [
                {"kind": "text", "text": text, "media_ref": None,
                 "offset": 0},
                {"kind": "anchor", "text": urls[h][(i + 1) % 3],
                 "media_ref": None, "offset": 1},
                {"kind": "anchor",
                 "text": urls[hosts[1 - hosts.index(h)]][i],
                 "media_ref": None, "offset": 2},
            ]
            rows.append({
                "url": urls[h][i], "host": h, "status": 200,
                "content_type": "text/html", "redirect_location": None,
                "empty_body": False, "transient_fails": 0,
                "spans": spans,
                "html": render_spans_to_html(spans, title=f"{h}/{i}"),
            })
    return rows, [urls[hosts[0]][0], urls[hosts[1]][0]]


def test_change_rate_recrawl_closed_loop(spark):
    """The Cho & Garcia-Molina loop end-to-end: crawl twice (content on
    the fast host changes between epochs), schedule_recrawl estimates
    per-host lambda-hat from the pages fetch log and installs it as the
    host_score priority, and the THIRD epoch's first capped wave fetches
    the fast host's pages before any slow-host page."""
    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    rows1, seeds = _recrawl_site(1)
    cfg = CrawlerConfig(
        base_url="https://", disable_redirects=True,
        frontier_priority="host_score",
    )
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, rows1))
    eng.crawl(seeds, max_waves=20)
    assert eng.pages.count() == 6

    # epoch 2: fast host's content changed; re-crawl everything
    eng.web_df = sitegen.site_to_df(spark, _recrawl_site(2)[0])
    n = eng.recrawl()
    assert n == 6
    eng.crawl(max_waves=20)
    per_url = eng.pages.groupBy("full_url").count().collect()
    assert {r["count"] for r in per_url} == {2}

    # estimate: fast lambda-hat = -ln(0.5/1.5) = ln 3, slow = 0
    scores = eng.schedule_recrawl()
    ranks = {r["host"]: r["rank"] for r in scores.collect()}
    assert abs(ranks["fast.example.com"] - math.log(3.0)) < 1e-9
    assert ranks["slow.example.com"] == 0.0
    assert eng._host_scores_df is not None

    # epoch 3 under a wave cap: fast host dequeues first
    eng.web_df = sitegen.site_to_df(spark, _recrawl_site(3)[0])
    eng.cfg.max_wave_size = 3
    assert eng.recrawl() == 6
    w0 = eng.wave
    eng.run_wave()
    first = eng.pages.filter(F.col("wave") == w0)
    assert first.count() == 3
    assert {r["host"] for r in first.select("host").collect()} == {
        "fast.example.com"
    }
    # drain the epoch: every URL ends with exactly 3 fetch observations
    eng.crawl(max_waves=20)
    per_url = eng.pages.groupBy("full_url").count().collect()
    assert len(per_url) == 6 and {r["count"] for r in per_url} == {3}
    # and the fast host's third-epoch fetches all precede the slow host's
    ep3 = eng.pages.filter(F.col("wave") >= w0)
    fast_max = ep3.filter(F.col("host") == "fast.example.com").agg(
        F.max("wave")
    ).collect()[0][0]
    slow_min = ep3.filter(F.col("host") == "slow.example.com").agg(
        F.min("wave")
    ).collect()[0][0]
    assert fast_max < slow_min


def test_trustrank_starves_spam_and_decays_with_distance(spark):
    """TrustRank's defining properties (Gyöngyi 2004): pages with no
    inlink path from a trusted seed get exactly 0 trust (teleport mass
    goes only to seeds), spam → good links cannot leak trust BACK into
    the spam cluster, and trust decays along the seed-distance chain."""
    from sitecrawler_spark.operators.graph import trustrank

    nodes = spark.createDataFrame([(i,) for i in range(5)], ["id"])
    # trusted chain 0 → 1 → 2; spam cluster {3, 4} points at the good
    # pages (the classic spam tactic) but receives no trusted inlink
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (4, 3), (3, 0), (4, 1)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(0,)], ["id"])
    t = {r["id"]: r["trust"]
         for r in trustrank(nodes, edges, seeds, n_iters=5).collect()}
    assert t[3] == 0.0 and t[4] == 0.0, t
    assert t[0] > t[1] > t[2] > 0.0, t


def test_host_trustrank_ranks_trusted_neighborhood_first(spark):
    """Host-level TrustRank: the seed host and hosts it links to
    outrank a spam farm that only links INTO the trusted set."""
    from sitecrawler_spark.operators.graph import host_trustrank

    links = spark.createDataFrame(
        [
            ("http://good.com/a", "http://partner.com/x"),
            ("http://partner.com/x", "http://good.com/b"),
            ("http://spam.com/p", "http://spam2.com/q"),
            ("http://spam2.com/q", "http://spam.com/r"),
            ("http://spam.com/p", "http://good.com/a"),
        ],
        ["src", "dst"],
    )
    seeds = spark.createDataFrame([("good.com",)], ["host"])
    r = {row["host"]: row["rank"]
         for row in host_trustrank(links, seeds, n_iters=5).collect()}
    # trust circulates inside the good ⇄ partner cycle (their relative
    # order oscillates by parity — not pinned); the spam farm, with no
    # trusted inlink, stays at exactly 0
    assert r["good.com"] > 0.0 and r["partner.com"] > 0.0, r
    assert r["spam.com"] == 0.0 and r["spam2.com"] == 0.0, r


def _trust_site():
    """Three-host site for the TrustRank loop: a trusted host and its
    partner link to each other; a spam farm links INTO the trusted host
    (the classic tactic) but receives no trusted inlink."""
    from sitecrawler_spark.crawl.parse import render_spans_to_html

    pages = {
        "https://trusted.example.com/t0.html": [
            "https://trusted.example.com/t1.html",
            "https://partner.example.com/p0.html",
        ],
        "https://trusted.example.com/t1.html": [
            "https://trusted.example.com/t0.html",
        ],
        "https://partner.example.com/p0.html": [
            "https://partner.example.com/p1.html",
        ],
        "https://partner.example.com/p1.html": [
            "https://trusted.example.com/t0.html",
        ],
        "https://spam.example.com/s0.html": [
            "https://spam.example.com/s1.html",
            "https://trusted.example.com/t0.html",
        ],
        "https://spam.example.com/s1.html": [
            "https://spam.example.com/s0.html",
        ],
    }
    rows = []
    for url, hrefs in pages.items():
        host = url.split("/")[2]
        spans = [{"kind": "text", "text": f"page at {url}",
                  "media_ref": None, "offset": 0}]
        spans += [{"kind": "anchor", "text": h, "media_ref": None,
                   "offset": i + 1} for i, h in enumerate(hrefs)]
        rows.append({
            "url": url, "host": host, "status": 200,
            "content_type": "text/html", "redirect_location": None,
            "empty_body": False, "transient_fails": 0,
            "spans": spans,
            "html": render_spans_to_html(spans, title=url),
        })
    return rows


def test_schedule_trustrank_closed_loop(spark):
    """The anti-spam loop end-to-end (Gyöngyi 2004): crawl a web whose
    spam farm links into the trusted host, schedule_trustrank installs
    host-level trust as the host_score priority, and the next recrawl
    epoch under a wave cap fetches every trusted-neighborhood page
    strictly before any spam page."""
    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    cfg = CrawlerConfig(
        base_url="https://", disable_redirects=True,
        frontier_priority="host_score",
    )
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, _trust_site()))
    eng.crawl(
        ["https://trusted.example.com/t0.html",
         "https://spam.example.com/s0.html"],
        max_waves=20,
    )
    assert eng.pages.count() == 6

    scores = eng.schedule_trustrank(["trusted.example.com"])
    ranks = {r["host"]: r["rank"] for r in scores.collect()}
    assert ranks["trusted.example.com"] > 0.0
    assert ranks["partner.example.com"] > 0.0
    assert ranks["spam.example.com"] == 0.0
    assert eng._host_scores_df is not None

    # epoch 2 under a wave cap: the trusted neighborhood dequeues first
    eng.cfg.max_wave_size = 2
    w0 = eng.wave
    assert eng.recrawl() == 6
    eng.crawl(max_waves=20)
    ep2 = eng.pages.filter(F.col("wave") >= w0)
    assert ep2.count() == 6
    good_max = ep2.filter(F.col("host") != "spam.example.com").agg(
        F.max("wave")
    ).collect()[0][0]
    spam_min = ep2.filter(F.col("host") == "spam.example.com").agg(
        F.min("wave")
    ).collect()[0][0]
    assert good_max < spam_min


def _quality_site():
    """Two-host site for the quality-blocklist loop: a good host whose
    pages are stopword-rich lowercase prose, and a junk host whose
    pages are caps/punctuation noise (quality_score ~0.1 vs ~1.0).
    The good host links into the junk host, so epoch 2 re-discovers
    the junk URLs — admission must drop them."""
    from sitecrawler_spark.crawl.parse import render_spans_to_html

    good = (
        "the cat and the dog sat on the mat with a friend "
        "and the story goes on for a while in the sun "
    ) * 6
    junk = "ZZZZ!!!! @@@@ #### %%%% ^^^^ &&&& " * 6
    pages = {
        "https://good.example.com/g0.html": (
            ["https://good.example.com/g1.html"], good),
        "https://good.example.com/g1.html": (
            ["https://junk.example.com/j0.html"], good),
        "https://junk.example.com/j0.html": (
            ["https://junk.example.com/j1.html"], junk),
        "https://junk.example.com/j1.html": (
            ["https://good.example.com/g0.html"], junk),
    }
    rows = []
    for url, (hrefs, body) in pages.items():
        host = url.split("/")[2]
        spans = [{"kind": "text", "text": body,
                  "media_ref": None, "offset": 0}]
        spans += [{"kind": "anchor", "text": h, "media_ref": None,
                   "offset": i + 1} for i, h in enumerate(hrefs)]
        rows.append({
            "url": url, "host": host, "status": 200,
            "content_type": "text/html", "redirect_location": None,
            "empty_body": False, "transient_fails": 0,
            "spans": spans,
            "html": render_spans_to_html(spans, title=url),
        })
    return rows


def test_quality_blocklist_closed_loop(spark):
    """The domain-quality loop end-to-end (the FineWeb blocklist rule):
    crawl both hosts, schedule_quality_blocklist derives + installs the
    junk host, and the next recrawl epoch never admits it at dequeue —
    even though the good host still links into it."""
    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    cfg = CrawlerConfig(base_url="https://", disable_redirects=True)
    eng = SparkSiteCrawler(
        spark, cfg, sitegen.site_to_df(spark, _quality_site())
    )
    eng.crawl(["https://good.example.com/g0.html"], max_waves=20)
    assert eng.pages.count() == 4

    bl = eng.schedule_quality_blocklist(min_docs=2)
    assert {r["host"] for r in bl.collect()} == {"junk.example.com"}

    w0 = eng.wave
    assert eng.recrawl() == 4
    eng.crawl(max_waves=20)
    ep2 = eng.pages.filter(F.col("wave") >= w0)
    assert {r["host"] for r in ep2.select("host").distinct().collect()} == {
        "good.example.com"
    }
    assert ep2.count() == 2

    # clearing the blocklist restores admission
    eng.set_blocked_hosts_df(None)
    assert eng._blocked_hosts_df is None


def _diff_site(ver: int):
    """Snapshot-diff fixture: fast pages' text carries the epoch
    version (→ changed), the slow page is static (→ unchanged), and
    in epoch 2 fast p0 grows a link to a brand-new page (→ added)."""
    from sitecrawler_spark.crawl.parse import render_spans_to_html

    fast = [f"https://fast.example.com/p{i}.html" for i in range(3)]
    pages = {}
    for i, u in enumerate(fast):
        hrefs = [fast[(i + 1) % 3]]
        if i == 0:
            hrefs.append("https://slow.example.com/q0.html")
            if ver >= 2:
                hrefs.append("https://fast.example.com/extra.html")
        pages[u] = (hrefs, f"fast content version {ver} page {i}")
    pages["https://slow.example.com/q0.html"] = ([fast[0]], "slow static")
    if ver >= 2:
        pages["https://fast.example.com/extra.html"] = (
            [fast[0]], "brand new page")
    rows = []
    for url, (hrefs, body) in pages.items():
        spans = [{"kind": "text", "text": body, "media_ref": None,
                  "offset": 0}]
        spans += [{"kind": "anchor", "text": h, "media_ref": None,
                   "offset": k + 1} for k, h in enumerate(hrefs)]
        rows.append({
            "url": url, "host": url.split("/")[2], "status": 200,
            "content_type": "text/html", "redirect_location": None,
            "empty_body": False, "transient_fails": 0,
            "spans": spans,
            "html": render_spans_to_html(spans, title=url),
        })
    return rows


def test_diff_crawl_snapshots_classifies_cdc(spark, tmp_path):
    """engine.diff_crawl_snapshots over REAL time-travel reads: crawl
    epoch 1, swap in the changed site, recrawl epoch 2, and the diff
    between the two snapshots classifies changed / unchanged / added
    per URL (pages is an APPEND log, so 'removed' never occurs here —
    tableio.diff_snapshots supports it for REPLACE'd tables)."""
    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    cfg = CrawlerConfig(base_url="https://", disable_redirects=True)
    eng = SparkSiteCrawler(
        spark, cfg, sitegen.site_to_df(spark, _diff_site(1)),
        state_dir=str(tmp_path / "state"),
    )
    eng.crawl(["https://fast.example.com/p0.html"], max_waves=20)
    assert eng.pages.count() == 4
    snap_a = eng.store.latest()["snapshot"]

    eng.web_df = sitegen.site_to_df(spark, _diff_site(2))
    assert eng.recrawl() == 4
    eng.crawl(max_waves=20)
    snap_b = eng.store.latest()["snapshot"]

    got = {r["full_url"]: r["status"]
           for r in eng.diff_crawl_snapshots(snap_a, snap_b).collect()}
    assert got == {
        "https://fast.example.com/p0.html": "changed",
        "https://fast.example.com/p1.html": "changed",
        "https://fast.example.com/p2.html": "changed",
        "https://slow.example.com/q0.html": "unchanged",
        "https://fast.example.com/extra.html": "added",
    }

    # the generic tableio differ agrees when fed pre-fingerprinted sides
    # (identity check on the same snapshot → everything unchanged)
    same = eng.diff_crawl_snapshots(snap_b, snap_b)
    assert {r["status"] for r in same.collect()} == {"unchanged"}
