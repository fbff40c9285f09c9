"""Lifecycle controls (O-C2/C5/C9) + progress sink (O-S10) + ordering op."""

from __future__ import annotations

from pyspark.sql import functions as F

from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.crawl import sitegen
from sitecrawler_spark.crawl.engine import SparkSiteCrawler
from sitecrawler_spark.operators.ordering import assign_global_order

BASE = "http://www.salesforce.com"
SEC = "https://www.salesforce.com"


def _cfg(**kw):
    return CrawlerConfig(base_url=BASE, base_url_secure=SEC,
                         disable_redirects=True, blocked=["/logout"], **kw)


def test_assign_global_order(spark):
    df = spark.createDataFrame(
        [(x, y) for x in range(10) for y in range(20)], ["a", "b"]
    )
    out = assign_global_order(df, ["a", "b"], "ord", start=5, num_partitions=7)
    rows = out.orderBy("ord").collect()
    assert [r["ord"] for r in rows] == list(range(5, 205))
    assert [(r["a"], r["b"]) for r in rows] == sorted(
        [(x, y) for x in range(10) for y in range(20)]
    )
    empty = assign_global_order(df.limit(0), ["a"], "ord")
    assert empty.count() == 0


def test_disable_crawling_drains_without_discovery(spark):
    site = sitegen.generate_site(n_pages=30, seed=42)
    web = sitegen.site_to_df(spark, site)
    eng = SparkSiteCrawler(spark, _cfg(), web)
    eng.seed(sitegen.seeds_for(site, 3))
    eng.run_wave()  # discover some links
    frontier_size = eng.frontier.count()
    assert frontier_size > 0
    eng.disable_crawling()
    eng.crawl(max_waves=20)
    # all previously queued URLs drained, nothing new discovered
    assert eng.frontier.count() == 0
    assert eng.visited_counter <= 3 + frontier_size


def test_pause_stops_scheduling(spark):
    site = sitegen.generate_site(n_pages=30, seed=42)
    web = sitegen.site_to_df(spark, site)
    eng = SparkSiteCrawler(spark, _cfg(), web)
    eng.seed(sitegen.seeds_for(site, 2))
    eng.run_wave()
    eng.pause()
    waves_before = eng.wave
    eng.crawl(max_waves=10)
    assert eng.wave == waves_before  # no further wave ran
    eng.unpause()
    eng.crawl(max_waves=50)
    assert eng.wave > waves_before
    assert eng.frontier.count() == 0


def test_progress_sink(spark):
    site = sitegen.generate_site(n_pages=30, seed=42)
    web = sitegen.site_to_df(spark, site)
    eng = SparkSiteCrawler(spark, _cfg(), web)
    eng.seed(sitegen.seeds_for(site, 2))
    eng.run_wave()
    p = eng.crawl_progress()
    assert p["crawled"] == eng.visited_counter > 0
    assert p["left_to_crawl"] == eng.frontier.count()
    denom = p["fully_processed"] + p["left_to_crawl"]
    assert p["complete"] == round(p["fully_processed"] / denom * 10000) / 100.0
    s = eng.crawl_progress_string()
    assert "crawled." in s and "% complete." in s
    # finish the crawl -> 100%
    eng.crawl(max_waves=60)
    assert eng.crawl_progress()["complete"] == 100.0


def test_submit_cli_surface(tmp_path):
    """O-C7 conf-surface audit: the spark-submit entry point accepts the
    full knob set and completes a synthetic crawl, committing snapshots
    (run in-process via argv to reuse the session-scoped JVM)."""
    import json
    import os
    import sys
    from unittest import mock

    sys.path.insert(0, "/root/repo/submit")
    import crawl_job

    state = str(tmp_path / "subrun")
    argv = ["crawl_job.py", "--synthetic", "30", "--state-dir", state,
            "--short-circuit-after", "8", "--politeness-budget", "4",
            "--politeness-salts", "2", "--seen-filter", "bloom",
            "--expected-urls", "100000", "--order-partitions", "2",
            "--bloom-shards", "4", "--bloom-hot-shards", "2",
            "--cookie", "sid=abc", "--http-cache-size", "64"]
    with mock.patch.object(sys, "argv", argv), mock.patch(
        "pyspark.sql.SparkSession.stop", lambda self: None
    ):
        crawl_job.main()
    assert os.path.isdir(os.path.join(state, "_snapshots"))
    snaps = [f for f in os.listdir(os.path.join(state, "_snapshots"))
             if f.endswith(".json")]
    assert snaps
    with open(os.path.join(state, "_snapshots", sorted(snaps)[-1])) as f:
        m = json.load(f)
    assert m["meta"]["visited_counter"] > 0


def test_seed_from_files_matches_list_seed(spark, tmp_path):
    """File-backed seeding (setIncludePath from seed-list files) equals
    list seeding: same frontier rows, same discovery order; comments and
    blank lines skipped; cross-file order = file argument order."""
    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    f1 = tmp_path / "seeds1.txt"
    f1.write_text("/a.html\n\n# comment\n/b.html\n/a.html\n")
    f2 = tmp_path / "seeds2.txt"
    f2.write_text("/c.html\n/logout/x.html\n")
    cfg = CrawlerConfig(
        base_url="http://www.salesforce.com",
        base_url_secure="https://www.salesforce.com",
        blocked=["/logout"],
    )
    eng_f = SparkSiteCrawler(spark, cfg, web_df=None)
    eng_f.seed_from_files([str(f1), str(f2)])
    got = [(r["raw_url"], r["discovery_order"])
           for r in eng_f.frontier.orderBy("discovery_order").collect()]

    eng_l = SparkSiteCrawler(spark, cfg, web_df=None)
    eng_l.seed(["/a.html", "/b.html", "/a.html", "/c.html", "/logout/x.html"])
    want = [(r["raw_url"], r["discovery_order"])
            for r in eng_l.frontier.orderBy("discovery_order").collect()]
    assert got == want
    assert [u for u, _ in got] == ["/a.html", "/b.html", "/c.html"]


def test_scaling_knob_parity_mapping(spark):
    """threadLimit / downloadVsProcessRatio / maxProcessWaitingRatio
    config-bean parity (SiteCrawler.java:126,155,162): the fields exist,
    map onto wave-size/parallelism derivations, and the engine's wave
    cap honors them (VERDICT r02 #9). The reference's backwards 0..1
    validator on setDownloadVsProcessRatio (default 2.0 would fail its
    own setter, SiteCrawler.java:384-393) is deliberately NOT
    replicated."""
    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    cfg = CrawlerConfig(
        base_url="http://www.salesforce.com",
        base_url_secure="https://www.salesforce.com",
        disable_redirects=True,
        thread_limit=3, download_vs_process_ratio=2.0,
    )
    # pageExecutorSize = ceil(threadLimit * ratio) (SiteCrawler.java:779)
    assert cfg.derived_page_slots() == 6
    # maxProcessWaiting = heap_mb * ratio (SiteCrawler.java:784-789;
    # javadoc example: 8 GB heap, 0.4 → 3276)
    assert cfg.derived_max_process_waiting(8 * 1024) == 3276
    # wave cap: explicit max_wave_size wins; else derived page slots
    assert cfg.effective_max_wave_size() == 6
    assert CrawlerConfig(
        base_url="http://x/", max_wave_size=4, thread_limit=3
    ).effective_max_wave_size() == 4
    assert CrawlerConfig(base_url="http://x/").effective_max_wave_size() == 0
    # values the reference's buggy validator rejects are accepted here
    assert CrawlerConfig(
        base_url="http://x/", download_vs_process_ratio=2.5, thread_limit=2
    ).derived_page_slots() == 5

    # the engine actually caps waves at the derived slot count
    site = sitegen.generate_site(n_pages=30, seed=42)
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=40)
    from pyspark.sql import functions as F

    per_wave = eng.pages.groupBy("wave").count().agg(
        F.max("count")
    ).collect()[0][0]
    assert per_wave <= 6


def test_response_cache_flush_cadence():
    """Periodic-flush parity (WebClientPool.java:61-69,214-221): after
    flush_after puts the counter resets; the cache clears only when
    flush_cache is enabled (reference default: off)."""
    from sitecrawler_spark.crawl.fetcher import ResponseCache

    c = ResponseCache(max_entries=10, flush_after=5, flush_cache=True)
    for i in range(6):
        c.put(f"u{i}", (i,))
    assert c.flushes == 1 and len(c._d) == 0 and c.flush_counter == 0
    # default mode matches the reference's flushCache=false: counter
    # cycles but the cache is never wiped
    c2 = ResponseCache(max_entries=10, flush_after=5)
    for i in range(12):
        c2.put(f"u{i}", (i,))
    assert c2.flushes == 0 and len(c2._d) > 0


def test_package_zip_importable(tmp_path):
    """submit/package.py builds a --py-files zip from which the full
    package imports (north-rule packaging)."""
    import subprocess
    import sys
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "submit", "package.py")],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert out.endswith("sitecrawler_spark.zip") and os.path.exists(out)
    probe = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, sys.argv[1]); "
         "import sitecrawler_spark.kernel.urls_py as u; "
         "import sitecrawler_spark.crawl.model; "
         "import sitecrawler_spark.dedup.dedup; "
         "import sitecrawler_spark.streaming.crawl_stream; "
         "print(u.url_host('https://x.com/a'))",
         out],
        capture_output=True, text=True, cwd=str(tmp_path),
    )
    assert probe.returncode == 0, probe.stderr
    assert probe.stdout.strip() == "x.com"
