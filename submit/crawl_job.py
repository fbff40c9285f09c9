#!/usr/bin/env python
"""spark-submit entry point for a crawl run.

Cluster usage (north rule packaging):

    python submit/package.py                       # builds dist/sitecrawler_spark.zip
    spark-submit \
        --py-files dist/sitecrawler_spark.zip \
        --conf spark.sql.adaptive.enabled=true \
        --conf spark.sql.shuffle.partitions=<4x cores> \
        submit/crawl_job.py \
        --state-dir hdfs:///crawls/run1 \
        --base-url http://www.salesforce.com \
        --base-url-secure https://www.salesforce.com \
        --seeds /seeds.txt --politeness-budget 64 \
        --seen-filter bloom --expected-urls 10000000000

Local smoke (this sandbox): add --synthetic N to crawl the generated
synthetic site instead of live HTTP (no network here), e.g.
    python submit/crawl_job.py --synthetic 200 --state-dir /tmp/crawlrun
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://www.salesforce.com")
    ap.add_argument("--base-url-secure", default="https://www.salesforce.com")
    ap.add_argument("--seeds", help="file with one seed path/URL per line")
    ap.add_argument("--seeds-distributed", action="store_true",
                    help="read --seeds via spark.read.text (billion-seed "
                         "lists never touch the driver)")
    ap.add_argument("--frontier-priority",
                    choices=["fifo", "depth", "host_depth", "host_score"],
                    default="fifo",
                    help="dequeue policy: fifo = reference parity; "
                         "depth / host_depth = BFS-strict priority keys; "
                         "host_score = quality-driven (--host-score)")
    ap.add_argument("--host-score", action="append", default=[],
                    metavar="HOST=SCORE",
                    help="host quality scores for --frontier-priority "
                         "host_score (e.g. PageRank of a prior crawl)")
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--blocked", nargs="*", default=[])
    ap.add_argument("--politeness-budget", type=int, default=0)
    ap.add_argument("--host-budget", action="append", default=[],
                    metavar="HOST=N",
                    help="per-host override of the politeness budget "
                         "(robots Crawl-delay analog); repeatable")
    ap.add_argument("--max-wave-size", type=int, default=0)
    ap.add_argument("--short-circuit-after", type=int, default=0)
    ap.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default=None)
    ap.add_argument("--expected-urls", type=int, default=1_000_000)
    ap.add_argument("--bloom-shards", type=int, default=None,
                    help="bloom shard count (None = auto ~8MiB/shard)")
    ap.add_argument("--bloom-hot-shards", type=int, default=None,
                    help="driver-resident bloom shard cap (LRU + .npy "
                         "spill under the state dir)")
    ap.add_argument("--cuckoo-shards", type=int, default=1,
                    help="cuckoo sub-filter count (key-hash routed)")
    ap.add_argument("--cuckoo-hot-shards", type=int, default=None,
                    help="driver-resident cuckoo shard cap (LRU + .npy "
                         "spill under the state dir)")
    ap.add_argument("--max-waves", type=int, default=10_000)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="crawl a generated synthetic site of N pages")
    ap.add_argument("--live", action="store_true",
                    help="fetch over real HTTP (crawl/fetcher) instead of "
                         "a synthetic web table")
    ap.add_argument("--follow-redirects", action="store_true")
    ap.add_argument("--politeness-salts", type=int, default=1)
    ap.add_argument("--fetch-salts", type=int, default=1)
    ap.add_argument("--order-partitions", type=int, default=None)
    ap.add_argument("--http-cache-size", type=int, default=10_240)
    ap.add_argument("--user-agent",
                    default="Mozilla/5.0 (compatible; sitecrawler-spark/0.1)")
    ap.add_argument("--cookie", action="append", default=[],
                    metavar="NAME=VALUE")
    ap.add_argument("--proxy", default=None)
    ap.add_argument("--insecure-ssl", action="store_true")
    # config-bean parity knobs (SiteCrawler.java:126,155,162): thread
    # count / executor-ratio names mapped onto the wave cap derivation
    ap.add_argument("--thread-limit", type=int, default=None)
    ap.add_argument("--download-vs-process-ratio", type=float, default=2.0)
    ap.add_argument("--max-process-waiting-ratio", type=float, default=0.4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    if SparkSession.getActiveSession() is None and "SPARK_ENV_LOADED" not in os.environ:
        # direct `python submit/crawl_job.py` invocation: build a tuned
        # local session (spark-submit provides its own conf otherwise)
        from sitecrawler_spark.session import get_spark

        spark = get_spark(app_name="sitecrawler-spark")
    else:
        spark = SparkSession.builder.appName("sitecrawler-spark").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    cfg = CrawlerConfig(
        base_url=args.base_url,
        base_url_secure=args.base_url_secure,
        blocked=args.blocked,
        disable_redirects=not args.follow_redirects,
        politeness_budget=args.politeness_budget,
        host_budgets={
            h: int(n)
            for h, n in (x.split("=", 1) for x in args.host_budget)
        },
        frontier_priority=args.frontier_priority,
        host_scores={
            h: float(v)
            for h, v in (x.split("=", 1) for x in args.host_score)
        },
        max_wave_size=args.max_wave_size,
        thread_limit=args.thread_limit,
        download_vs_process_ratio=args.download_vs_process_ratio,
        max_process_waiting_ratio=args.max_process_waiting_ratio,
        short_circuit_after=args.short_circuit_after,
        seen_filter=args.seen_filter,
        seen_filter_expected_n=args.expected_urls,
        bloom_n_shards=args.bloom_shards,
        bloom_max_hot_shards=args.bloom_hot_shards,
        cuckoo_n_shards=args.cuckoo_shards,
        cuckoo_max_hot_shards=args.cuckoo_hot_shards,
        host_salts=args.politeness_salts,
        fetch_salts=args.fetch_salts,
        order_partitions=args.order_partitions,
        http_cache_size=args.http_cache_size,
        user_agent=args.user_agent,
        cookies=[tuple(c.split("=", 1)) for c in args.cookie],
        proxy=args.proxy,
        insecure_ssl=args.insecure_ssl,
    )

    seeds: list[str] = []
    if args.seeds and not args.seeds_distributed:
        with open(args.seeds) as f:
            # same filter as the distributed path (engine.seed_from_files):
            # skip blanks and '#' comment lines so both flags yield the
            # same frontier from the same seed file
            seeds = [
                s for line in f if (s := line.strip()) and not s.startswith("#")
            ]

    if args.synthetic:
        from sitecrawler_spark.crawl import sitegen

        rows = sitegen.generate_site(n_pages=args.synthetic, seed=42)
        web = sitegen.site_to_df(spark, rows)
        if not seeds:
            seeds = sitegen.seeds_for(rows, 3)
        eng = SparkSiteCrawler(spark, cfg, web, state_dir=args.state_dir)
    elif args.live:
        # live-HTTP mode: engine fetch stage is
        # crawl/fetcher.http_fetch_in_pandas (applyInPandas over
        # host+salt groups; tested offline against a loopback server in
        # tests/test_live_fetch.py)
        eng = SparkSiteCrawler(spark, cfg, web_df=None, state_dir=args.state_dir)
    else:
        raise SystemExit("pass --synthetic N (offline) or --live")

    if args.resume:
        eng.resume()
        eng.crawl(max_waves=args.max_waves)
    elif args.seeds and args.seeds_distributed:
        eng.seed_from_files([args.seeds])
        eng.crawl(max_waves=args.max_waves)
    else:
        eng.crawl(seeds, max_waves=args.max_waves)
    print(json.dumps({
        "waves": eng.wave,
        "visited_total": eng.visited_counter,
        "state_dir": args.state_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
