"""End-to-end crawl parity: SparkSiteCrawler vs the single-threaded
reference model (SURVEY.md §5.3) — identical visit order and identical
final URL-seen set across configs: default, blocked/allowed, suffix
gates, query cleaning, redirects (disabled and followed), short-circuit,
robots, and HTML-parse mode.
"""

from __future__ import annotations

import pytest

from sitecrawler_spark.config import CrawlerConfig, RobotsRule
from sitecrawler_spark.crawl import sitegen
from sitecrawler_spark.crawl.engine import SparkSiteCrawler
from sitecrawler_spark.crawl.model import ReferenceCrawlModel

BASE = "http://www.salesforce.com"
SEC = "https://www.salesforce.com"


def run_both(spark, cfg, rows, seeds, use_html=False, max_waves=60):
    model = ReferenceCrawlModel(cfg, rows, use_html=use_html)
    expected = model.crawl(seeds)

    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, rows),
                           use_html=use_html)
    eng.crawl(seeds, max_waves=max_waves)
    got_order = [r["full_url"] for r in eng.visit_order_df().collect()]
    got_visited = {r["s"] for r in eng.visited_df().collect()}
    return expected, got_order, got_visited


def assert_parity(expected, got_order, got_visited):
    assert got_order == expected.visit_order
    assert got_visited == expected.visited


@pytest.fixture(scope="module")
def site():
    return sitegen.generate_site(n_pages=40, seed=42)


def test_default_config(spark, site):
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC, disable_redirects=True,
                        blocked=["/logout"])
    seeds = sitegen.seeds_for(site, 2)
    expected, order, visited = run_both(spark, cfg, site, seeds)
    assert len(expected.visit_order) > 10  # crawl actually expanded
    assert_parity(expected, order, visited)


def test_default_seed_when_no_seeds(spark, site):
    # trailing-slash base passes the suffix gate; sitegen serves a root
    # index page at {base}/ so the default seed resolves
    cfg = CrawlerConfig(base_url="https://www.salesforce.com/",
                        disable_redirects=True)
    expected, order, visited = run_both(spark, cfg, site, [])
    assert expected.visit_order[0] == "https://www.salesforce.com/"
    assert len(expected.visit_order) > 3
    assert_parity(expected, order, visited)


def test_default_seed_suffix_gate_quirk(spark, site):
    """Faithful reference quirk: a bare base URL without trailing slash
    fails the allowed-suffix gate (SiteCrawler.java:1185-1202) — the
    default-seeded crawl visits nothing, on both model and engine."""
    cfg = CrawlerConfig(base_url="https://www.salesforce.com",
                        disable_redirects=True)
    expected, order, visited = run_both(spark, cfg, site, [], max_waves=3)
    assert expected.visit_order == []
    assert_parity(expected, order, visited)


def test_blocked_and_allowed(spark, site):
    cfg = CrawlerConfig(
        base_url=BASE, base_url_secure=SEC, disable_redirects=True,
        blocked=["/logout", "/admin"], allowed=["salesforce.com"],
    )
    expected, order, visited = run_both(spark, cfg, site, sitegen.seeds_for(site, 3))
    assert_parity(expected, order, visited)


def test_suffix_gate_off(spark, site):
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC, disable_redirects=True,
                        require_allowed_suffixes=False)
    expected, order, visited = run_both(spark, cfg, site, sitegen.seeds_for(site, 2))
    assert_parity(expected, order, visited)


def test_allowed_parameters_cleaning(spark, site):
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC, disable_redirects=True,
                        allowed_parameters=["a"],
                        url_path_should_not_end_in_slash=False)
    expected, order, visited = run_both(spark, cfg, site, sitegen.seeds_for(site, 2))
    assert_parity(expected, order, visited)


def test_ignore_query_params(spark, site):
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC, disable_redirects=True,
                        ignore_query_params=True)
    expected, order, visited = run_both(spark, cfg, site, sitegen.seeds_for(site, 2))
    assert_parity(expected, order, visited)


def test_redirects_followed(spark, site):
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC, disable_redirects=False)
    expected, order, visited = run_both(spark, cfg, site, sitegen.seeds_for(site, 2))
    assert_parity(expected, order, visited)


def test_short_circuit(spark, site):
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC, disable_redirects=True,
                        short_circuit_after=7)
    expected, order, visited = run_both(spark, cfg, site, sitegen.seeds_for(site, 2))
    # reference processes N+1 items (counter check is strict-greater)
    assert len(expected.visit_order) == 8
    assert_parity(expected, order, visited)


def test_robots_rules(spark, site):
    cfg = CrawlerConfig(
        base_url=BASE, base_url_secure=SEC, disable_redirects=True,
        robots_rules=[RobotsRule(host="www.salesforce.com", disallow="/cloud/")],
    )
    expected, order, visited = run_both(spark, cfg, site, sitegen.seeds_for(site, 2))
    assert all("www.salesforce.com/cloud/" not in u for u in order)
    assert_parity(expected, order, visited)


def test_parse_html_mode(spark, site):
    """Engine parsing rendered HTML must equal engine trusting spans."""
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC, disable_redirects=True)
    expected, order, visited = run_both(spark, cfg, site, sitegen.seeds_for(site, 2),
                                        use_html=True)
    assert_parity(expected, order, visited)


def test_make_relative_absolute(spark, site):
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=None, disable_redirects=True,
                        make_relative_url_absolute=True)
    # no secure base → relative-absolutize branch active (ProcessPage.java:231-245)
    rows = sitegen.generate_site(n_pages=30, seed=11, scheme="http")
    expected, order, visited = run_both(spark, cfg, rows, sitegen.seeds_for(rows, 2))
    assert_parity(expected, order, visited)


def test_politeness_budget_deterministic(spark, site):
    """Target-only politeness: realized order is (wave, discovery_order)
    and the final seen set equals the unbudgeted crawl's seen set."""
    cfg_b = CrawlerConfig(base_url=BASE, base_url_secure=SEC, disable_redirects=True,
                          politeness_budget=3)
    cfg_nb = CrawlerConfig(base_url=BASE, base_url_secure=SEC, disable_redirects=True)
    seeds = sitegen.seeds_for(site, 2)
    web = sitegen.site_to_df(spark, site)

    e1 = SparkSiteCrawler(spark, cfg_b, web)
    e1.crawl(seeds, max_waves=80)
    e2 = SparkSiteCrawler(spark, cfg_nb, web)
    e2.crawl(seeds, max_waves=80)
    v1 = {r["s"] for r in e1.visited_df().collect()}
    v2 = {r["s"] for r in e2.visited_df().collect()}
    assert v1 == v2
    # determinism: same run twice → same realized order
    e3 = SparkSiteCrawler(spark, cfg_b, web)
    e3.crawl(seeds, max_waves=80)
    o1 = [r["full_url"] for r in e1.visit_order_df().collect()]
    o3 = [r["full_url"] for r in e3.visit_order_df().collect()]
    assert o1 == o3
    # budget respected within each wave
    from pyspark.sql import functions as F
    per = (
        e1.pages.groupBy("wave", "host").count()
        .agg(F.max("count").alias("mx")).collect()[0]["mx"]
    )
    assert per <= 3


def test_ranged_ordering_path_parity(spark, site):
    """order_partitions forces assign_global_order's range-partitioned
    path (the >1M-row scale path) through the WHOLE engine — parity with
    the model must be unchanged (VERDICT r1 #7: the ranged path needs
    end-to-end evidence, not just unit tests)."""
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC,
                        disable_redirects=True, blocked=["/logout"],
                        order_partitions=3)
    seeds = sitegen.seeds_for(site, 2)
    expected, order, visited = run_both(spark, cfg, site, seeds)
    assert len(expected.visit_order) > 10
    assert_parity(expected, order, visited)


def test_ranged_ordering_path_parity(spark, site):
    """order_partitions forces assign_global_order's range-partitioned
    two-pass ranking inside the live crawl loop (not just unit/bench) —
    parity must hold and no wave may fall back to the single-partition
    window (VERDICT r02 #7)."""
    import sitecrawler_spark.operators.ordering as ordering_mod
    from pyspark.sql import Window as W

    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC,
                        disable_redirects=True, blocked=["/logout"],
                        order_partitions=4)
    seeds = sitegen.seeds_for(site, 2)
    model = ReferenceCrawlModel(cfg, site)
    expected = model.crawl(seeds)

    # spy: fail if any assign_global_order call takes the small-input
    # single-partition window branch while the ranged path is forced
    orig = ordering_mod.assign_global_order
    calls = {"ranged": 0, "fast": 0}

    def spy(df, sort_cols, out_col="discovery_order", start=0,
            num_partitions=None):
        calls["ranged" if num_partitions else "fast"] += 1
        return orig(df, sort_cols, out_col, start, num_partitions)

    ordering_mod.assign_global_order = spy
    # the engine imports the symbol at module load — patch there too
    import sitecrawler_spark.crawl.engine as engine_mod
    eng_orig = engine_mod.assign_global_order
    engine_mod.assign_global_order = spy
    try:
        eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
        eng.crawl(seeds, max_waves=60)
    finally:
        ordering_mod.assign_global_order = orig
        engine_mod.assign_global_order = eng_orig

    assert calls["ranged"] > 0 and calls["fast"] == 0, calls
    got_order = [r["full_url"] for r in eng.visit_order_df().collect()]
    got_visited = {r["s"] for r in eng.visited_df().collect()}
    assert_parity(expected, got_order, got_visited)


def test_visited_parts_fold_bounds_plan_width(spark):
    """The in-memory visited union folds into one checkpointed part
    every _VISITED_FOLD_PARTS waves — a 10^4-wave crawl must not build
    a 10^4-child union plan (analysis cost alone would grow per wave).
    Crawl correctness (seen set vs the reference model) is unchanged."""
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler
    from sitecrawler_spark.crawl.model import ReferenceCrawlModel
    from sitecrawler_spark.config import CrawlerConfig

    site = sitegen.generate_site(n_pages=30, seed=13)
    # politeness budget 1 on a broad site forces MANY small waves
    cfg = CrawlerConfig(
        base_url="http://www.salesforce.com",
        base_url_secure="https://www.salesforce.com",
        disable_redirects=True, politeness_budget=1,
    )
    model = ReferenceCrawlModel(cfg, site)
    expected = model.crawl(sitegen.seeds_for(site, 2))

    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
    eng._VISITED_FOLD_PARTS = 4  # exercise several folds in a short crawl
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=80)
    assert eng.wave > 8, "site produced too few waves to exercise folding"
    assert len(eng._visited_parts) <= 5  # folded, never one part per wave
    assert {r["s"] for r in eng.visited_df().collect()} == expected.visited
    assert [r["full_url"] for r in eng.visit_order_df().collect()] == (
        expected.visit_order
    )
