#!/usr/bin/env python
"""Side benchmarks for optimization work (guide §1.4): per-query
noop-sink isolation + explain("formatted") capture.  bench.py is FROZEN
for the driver's measurement; everything exploratory lives here.

Usage:
  python bench_extra.py time q_minhash_pairs q_dsir_select   # noop-timed
  python bench_extra.py plan q_dsir_select                    # plans/r06/*.txt
  python bench_extra.py crawl                                 # engine e2e timing

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), PLAN_TAG (before|after, default none).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from sitecrawler_spark.session import get_spark


def _spark():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return get_spark(cores=cpus, app_name="sitecrawler-bench-extra",
                     shuffle_partitions=cpus)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def cmd_time(names: list[str], repeats: int = 2) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _spark()
    qs = entrymod.queries()
    # session warmup (same rationale as bench.py)
    qs["q_admission_filter"](spark, sf_dir).count()
    out = {}
    for name in names:
        runs = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            noop(qs[name](spark, sf_dir))
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
        print(json.dumps({name: runs}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


def cmd_plan(names: list[str]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = os.environ.get("PLAN_TAG", "plan")
    here = os.path.dirname(os.path.abspath(__file__))
    outdir = os.path.join(here, "plans", "r06")
    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(p)
        print(f"wrote {path} ({len(p)} chars)")
    spark.stop()


def cmd_crawl(n_pages: int = 6000) -> None:
    """bench.py's crawl_engine_e2e, reproduced here for iteration."""
    from pyspark.sql import functions as F  # noqa: F401
    from sitecrawler_spark.config import CrawlerConfig
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    spark = _spark()
    rows = sitegen.generate_site(n_pages=n_pages, seed=42, links_per_page=14)
    web = sitegen.site_to_df(spark, rows).cache()
    web.count()
    cfg = CrawlerConfig(
        base_url="http://www.salesforce.com",
        base_url_secure="https://www.salesforce.com",
        disable_redirects=True, blocked=["/logout"],
    )
    for run in range(2):
        eng = SparkSiteCrawler(spark, cfg, web, broadcast_web=True)
        t0 = time.time()
        eng.crawl(sitegen.seeds_for(rows, 3), max_waves=50)
        dt = time.time() - t0
        print(json.dumps({
            "run": run, "sec": round(dt, 2), "pages": eng.visited_counter,
            "waves": eng.wave,
            "pages_per_sec": round(eng.visited_counter / dt, 1),
            "wave_ms": [m["wall_ms"] for m in eng.metrics_rows],
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "time":
        cmd_time(sys.argv[2:])
    elif cmd == "plan":
        cmd_plan(sys.argv[2:])
    elif cmd == "crawl":
        cmd_crawl(int(sys.argv[2]) if len(sys.argv) > 2 else 6000)
    else:
        raise SystemExit(f"unknown cmd {cmd}")
