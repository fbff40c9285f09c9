"""Pure-Python model properties (no Spark): the budgeted wave-mode
model vs the sequential reference model across randomized sites and
configs. These pin the SEMANTIC contract the engine is separately
tested against — politeness scheduling must never change WHAT gets
crawled, only WHEN."""

from __future__ import annotations

import pytest

from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.crawl import sitegen
from sitecrawler_spark.crawl.model import ReferenceCrawlModel

BASE = "http://www.salesforce.com"
SEC = "https://www.salesforce.com"
HOSTS = ("www.salesforce.com", "blogs.salesforce.com",
         "trailhead.salesforce.com")


def _canon(u: str, cfg: CrawlerConfig) -> str:
    from sitecrawler_spark.kernel.urls_py import clean_url

    return clean_url(
        u, cfg.allowed_parameters, cfg.url_path_should_not_end_in_slash
    ) or u


@pytest.mark.parametrize("seed", [1, 7, 23, 42])
@pytest.mark.parametrize("budget", [0, 1, 2, 5])
def test_budget_preserves_canonical_page_set(seed, budget):
    """The set of CANONICAL pages crawled is invariant under the
    politeness budget. (The exact visited set is NOT in general: when
    two URL variants share a clean form, scheduling decides which
    variant is fetched — budget=0 must match the sequential model
    exactly, budget>0 only up to the clean-form projection.)"""
    site = sitegen.generate_site(n_pages=35, hosts=HOSTS, seed=seed)
    cfg = CrawlerConfig(base_url="https://", disable_redirects=True,
                        blocked=["/logout"])
    seeds = [r["url"] for r in site[:3]]
    seq = ReferenceCrawlModel(cfg, site).crawl(seeds)
    bud = ReferenceCrawlModel(cfg, site).crawl_budgeted(seeds, budget=budget)
    assert {_canon(u, cfg) for u in bud.visit_order} == {
        _canon(u, cfg) for u in seq.visit_order
    }
    if budget == 0:
        assert bud.visited == seq.visited
        assert sorted(bud.visit_order) == sorted(seq.visit_order)


@pytest.mark.parametrize("seed", [3, 11])
def test_budget_respects_per_wave_host_cap(seed):
    """No wave fetches more than `budget` URLs from one host: realized
    order chunks into waves whose per-host counts stay <= budget.
    Wave boundaries are recovered from the order: within a wave,
    every host appears at most budget times, and a wave ends exactly
    when the next fetch would overflow its host's budget — so greedily
    re-chunking the realized order must reproduce a valid schedule."""
    from sitecrawler_spark.kernel.urls_py import url_host

    budget = 2
    site = sitegen.generate_site(n_pages=40, hosts=HOSTS, seed=seed)
    cfg = CrawlerConfig(base_url="https://", disable_redirects=True)
    seeds = [r["url"] for r in site[:3]]
    res = ReferenceCrawlModel(cfg, site).crawl_budgeted(seeds, budget=budget)
    assert res.visit_order, "crawl did not expand"
    # single-config structural check: greedy per-host chunking never
    # needs to split earlier than the model's own wave boundary
    counts: dict[str, int] = {}
    for u in res.visit_order:
        h = url_host(u)
        if counts.get(h, 0) >= budget:
            counts = {}  # wave boundary at the latest here
        counts[h] = counts.get(h, 0) + 1
        assert counts[h] <= budget


@pytest.mark.parametrize("seed", [5, 19])
def test_budgeted_with_blocked_and_suffix_configs(seed):
    """Seen-set invariance also holds under restrictive admission
    configs (blocked substrings, suffix gate off-default shapes)."""
    site = sitegen.generate_site(n_pages=30, seed=seed)
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC,
                        disable_redirects=True,
                        blocked=["/logout", "/doc3"])
    seeds = sitegen.seeds_for(site, 2)
    seq = ReferenceCrawlModel(cfg, site).crawl(seeds)
    bud = ReferenceCrawlModel(cfg, site).crawl_budgeted(seeds, budget=1)
    assert {_canon(u, cfg) for u in bud.visit_order} == {
        _canon(u, cfg) for u in seq.visit_order
    }
