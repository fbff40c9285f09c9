"""Multi-host crawl: politeness budgets and ordering across hosts.

Scope trick faithful to the reference: base_url='https://' admits every
https URL through the startsWith scope check (SiteCrawler.java:1156-1163),
turning the single-site crawler into a multi-host crawler with no
semantic changes — the configuration README.md suggests for broad
crawls.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.crawl import sitegen
from sitecrawler_spark.crawl.engine import SparkSiteCrawler
from sitecrawler_spark.crawl.model import ReferenceCrawlModel

HOSTS = ("www.salesforce.com", "blogs.salesforce.com", "trailhead.salesforce.com")


@pytest.fixture(scope="module")
def site():
    return sitegen.generate_site(n_pages=45, hosts=HOSTS, seed=42)


def _cfg(**kw):
    return CrawlerConfig(base_url="https://", disable_redirects=True,
                         blocked=["/logout"], **kw)


def test_multihost_parity_with_model(spark, site):
    cfg = _cfg()
    seeds = [r["url"] for r in site[:3]]  # absolute URLs as seeds
    model = ReferenceCrawlModel(cfg, site)
    expected = model.crawl(seeds)
    hosts_seen = {u.split("/")[2] for u in expected.visit_order}
    # crawl crosses all three site hosts; the scope trick also admits
    # external https hosts and "https:///x" (empty host, from
    # site-relative hrefs prepended with the bare-scheme base) — both
    # faithful to startsWith scoping, present on model AND engine
    assert {h for h in hosts_seen if h.endswith("salesforce.com")} == set(HOSTS)

    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
    eng.crawl(seeds, max_waves=60)
    assert [r["full_url"] for r in eng.visit_order_df().collect()] == (
        expected.visit_order
    )
    assert {r["s"] for r in eng.visited_df().collect()} == expected.visited


def test_multihost_politeness_budget(spark, site):
    cfg = _cfg(politeness_budget=2)
    seeds = [r["url"] for r in site[:3]]
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
    eng.crawl(seeds, max_waves=80)
    per_wave_host = (
        eng.pages.groupBy("wave", "host").count()
        .agg(F.max("count").alias("mx")).collect()[0]["mx"]
    )
    assert per_wave_host <= 2
    # same seen set as unbudgeted crawl
    eng2 = SparkSiteCrawler(spark, _cfg(), sitegen.site_to_df(spark, site))
    eng2.crawl(seeds, max_waves=80)
    assert {r["s"] for r in eng.visited_df().collect()} == {
        r["s"] for r in eng2.visited_df().collect()
    }


def test_politeness_salted_equals_unsalted(spark, site):
    """host_salts>1 changes the physical plan (two-phase top-k) but not
    the semantics: identical visit order vs the unsalted engine."""
    seeds = [r["url"] for r in site[:3]]
    orders = []
    for salts in (1, 4):
        cfg = _cfg(politeness_budget=2, host_salts=salts)
        eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
        eng.crawl(seeds, max_waves=80)
        orders.append([r["full_url"] for r in eng.visit_order_df().collect()])
    assert orders[0] == orders[1]


def test_multihop_crosshost_redirect_chains(spark):
    """3-hop redirect chains crossing hosts with site-relative middle
    Locations: engine follow-mode resolves each Location against the
    CURRENT hop (crawl/model.py chases with urljoin) — parity gate."""
    chained = sitegen.generate_site(n_pages=40, hosts=HOSTS, seed=5,
                                    redirect_chains=4)
    # the planted chains really are multi-hop: a 3xx whose target is 3xx
    by_url = {r["url"]: r for r in chained}
    hops = [r for r in chained if r["status"] in (301, 302)
            and r["redirect_location"] in by_url
            and by_url[r["redirect_location"]]["status"] in (301, 302)]
    assert hops, "sitegen planted no multi-hop chains"
    cfg = CrawlerConfig(base_url="https://", disable_redirects=False,
                        blocked=["/logout"])
    seeds = [r["url"] for r in chained[:4]]
    model = ReferenceCrawlModel(cfg, chained)
    expected = model.crawl(seeds)
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, chained))
    eng.crawl(seeds, max_waves=60)
    assert [r["full_url"] for r in eng.visit_order_df().collect()] == (
        expected.visit_order
    )
    assert {r["s"] for r in eng.visited_df().collect()} == expected.visited


def test_frontier_priority_host_depth_vs_fifo(spark, site):
    """North-rule priority frontier: with a 1-page wave cap, fifo
    dequeues in pure discovery order while host_depth dequeues the
    lexicographically-first (host, depth, order) row — so the visit
    SEQUENCE differs, but the final crawl state (seen set, page set) is
    identical because priority only permutes work, never admission."""
    seeds = [r["url"] for r in site[:3]]

    eng_f = SparkSiteCrawler(spark, _cfg(max_wave_size=1),
                             sitegen.site_to_df(spark, site))
    eng_f.crawl(seeds, max_waves=12)
    fifo_order = [r["full_url"] for r in eng_f.visit_order_df().collect()]

    eng_p = SparkSiteCrawler(
        spark, _cfg(max_wave_size=1, frontier_priority="host_depth"),
        sitegen.site_to_df(spark, site))
    eng_p.crawl(seeds, max_waves=12)
    pri_rows = eng_p.pages.orderBy("wave").select(
        "full_url", "host", "depth").collect()
    pri_order = [r["full_url"] for r in pri_rows]

    assert pri_order != fifo_order  # the priority key really reorders
    # crisp invariant: wave 1's frontier is exactly the three seeds, so
    # host_depth must fetch the lexicographically-smallest seed host
    # first — fifo fetches seed #1 regardless of host
    seed_hosts = sorted(u.split("/")[2] for u in seeds)
    assert pri_rows[0]["host"] == seed_hosts[0]
    assert fifo_order[0] == seeds[0]


def test_frontier_priority_same_final_state(spark, site):
    """All three dequeue policies converge to the same seen set and
    page set on a full crawl — priority permutes order, not coverage."""
    seeds = [r["url"] for r in site[:3]]
    finals = []
    for mode in ("fifo", "depth", "host_depth"):
        eng = SparkSiteCrawler(spark, _cfg(frontier_priority=mode),
                               sitegen.site_to_df(spark, site))
        eng.crawl(seeds, max_waves=60)
        finals.append((
            frozenset(r["s"] for r in eng.visited_df().collect()),
            frozenset(r["full_url"] for r in eng.pages.collect()),
        ))
    assert finals[0] == finals[1] == finals[2]


def test_budgeted_model_matches_engine(spark, site):
    """The pure-Python wave-mode model (crawl_budgeted) reproduces the
    engine's budgeted realized order and seen set exactly — the oracle
    that backs q_crawl_e2e_budgeted (VERDICT r02 #6)."""
    cfg = _cfg(politeness_budget=2, host_salts=4, seen_filter="bloom",
               seen_filter_expected_n=10_000)
    seeds = [r["url"] for r in site[:3]]
    expected = ReferenceCrawlModel(cfg, site).crawl_budgeted(seeds, budget=2)
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
    eng.crawl(seeds, max_waves=120)
    got_order = [r["full_url"] for r in eng.visit_order_df().collect()]
    assert got_order == expected.visit_order
    assert {r["s"] for r in eng.visited_df().collect()} == expected.visited
    # and the budget=0 degenerate case equals the plain sequential model
    cfg0 = _cfg()
    seq = ReferenceCrawlModel(cfg0, site).crawl(seeds)
    bud0 = ReferenceCrawlModel(cfg0, site).crawl_budgeted(seeds, budget=0)
    assert bud0.visited == seq.visited


def test_per_host_budget_overrides_match_model(spark, site):
    """host_budgets (robots Crawl-delay analog): per-host caps override
    the global politeness budget — engine ≡ wave-model parity, and the
    slow host's per-wave fetch count never exceeds its override."""
    hb = {"blogs.salesforce.com": 1, "trailhead.salesforce.com": 3}
    cfg = _cfg(politeness_budget=2, host_budgets=hb)
    seeds = [r["url"] for r in site[:3]]
    expected = ReferenceCrawlModel(cfg, site).crawl_budgeted(
        seeds, budget=2, host_budgets=hb
    )
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
    eng.crawl(seeds, max_waves=120)
    assert [r["full_url"] for r in eng.visit_order_df().collect()] == (
        expected.visit_order
    )
    assert {r["s"] for r in eng.visited_df().collect()} == expected.visited
    per_wave = (
        eng.pages.groupBy("wave", "host").count().collect()
    )
    for r in per_wave:
        cap = hb.get(r["host"], 2)
        assert r["count"] <= cap, (r["host"], r["wave"], r["count"])


def test_frontier_priority_host_score(spark, site):
    """host_score priority: with a 1-page wave cap, the highest-scored
    host's seed is fetched first (fifo fetches seed #1 regardless);
    final crawl state is identical — priority permutes work, never
    admission."""
    seeds = [r["url"] for r in site[:3]]
    seed_hosts = [u.split("/")[2] for u in seeds]
    # score the LAST seed's host highest so score order != fifo order
    scores = {seed_hosts[-1]: 10.0, seed_hosts[0]: 1.0}
    eng_s = SparkSiteCrawler(
        spark,
        _cfg(max_wave_size=1, frontier_priority="host_score",
             host_scores=scores),
        sitegen.site_to_df(spark, site),
    )
    eng_s.crawl(seeds, max_waves=12)
    first = eng_s.pages.orderBy("wave").select("host", "full_url").collect()[0]
    assert first["host"] == seed_hosts[-1]

    eng_f = SparkSiteCrawler(
        spark, _cfg(frontier_priority="host_score", host_scores=scores),
        sitegen.site_to_df(spark, site),
    )
    eng_f.crawl(seeds, max_waves=60)
    eng_0 = SparkSiteCrawler(spark, _cfg(), sitegen.site_to_df(spark, site))
    eng_0.crawl(seeds, max_waves=60)
    assert {r["s"] for r in eng_f.visited_df().collect()} == {
        r["s"] for r in eng_0.visited_df().collect()
    }


def test_pagerank_feeds_prioritized_recrawl(spark, site):
    """Closed loop: crawl → host-level PageRank of the links table →
    prioritized re-crawl via the score-TABLE path (set_host_scores_df —
    the web-scale alternative to the cfg.host_scores map literal).
    The re-crawl's first capped wave fetches a seed of the top-ranked
    seed host, and the final state matches the unprioritized crawl."""
    from sitecrawler_spark.operators.graph import host_pagerank

    seeds = [r["url"] for r in site[:3]]
    eng1 = SparkSiteCrawler(spark, _cfg(), sitegen.site_to_df(spark, site))
    eng1.crawl(seeds, max_waves=60)
    scores = host_pagerank(eng1.links)
    ranks = {r["host"]: r["rank"] for r in scores.collect()}
    assert len(ranks) >= 3 and all(v > 0 for v in ranks.values())

    seed_hosts = [u.split("/")[2] for u in seeds]
    top_seed_host = max(seed_hosts, key=lambda h: ranks.get(h, 0.0))

    eng2 = SparkSiteCrawler(
        spark, _cfg(max_wave_size=1, frontier_priority="host_score"),
        sitegen.site_to_df(spark, site),
    )
    eng2.set_host_scores_df(scores)
    eng2.crawl(seeds, max_waves=12)
    first = eng2.pages.orderBy("wave").select("host").collect()[0]
    assert first["host"] == top_seed_host

    # full prioritized crawl converges to the same state
    eng3 = SparkSiteCrawler(
        spark, _cfg(frontier_priority="host_score"),
        sitegen.site_to_df(spark, site),
    )
    eng3.set_host_scores_df(scores)
    eng3.crawl(seeds, max_waves=60)
    assert {r["s"] for r in eng3.visited_df().collect()} == {
        r["s"] for r in eng1.visited_df().collect()
    }
