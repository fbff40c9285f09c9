#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule / BASELINE.md protocol).

The sandbox has no multi-node cluster, so the two-cluster-size
criterion is evidenced by running the IDENTICAL job on the same input
at two parallelism levels — local[8] (N) and local[32] (4N) — and
reporting throughput at both plus efficiency = (thr@32 / thr@8) / 4.

The measured job is the engine's frontier dequeue+dedup stage (the
per-wave hot path: static admission → seen anti-join → clean →
within-wave dedup window → host extraction) over a generated synthetic
frontier (BASELINE: the 10^10 frontier is generated, not materialized —
row count scales by env BENCH_FRONTIER_N).

Each parallelism level runs in a FRESH JVM (subprocess) so no executor
state leaks between measurements; per level: 1 warmup + K timed runs,
best-of reported (machine noise guard).

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F, Window
from sitecrawler_spark.session import get_spark
from sitecrawler_spark.kernel import urls_spark as K
from sitecrawler_spark.queries import CFG
from bench import synthetic_frontier

cores = %(cores)d
n = %(n)d
runs = %(runs)d
spark = get_spark(cores=cores, app_name=f"scaling-{cores}",
                  shuffle_partitions=max(cores, 8))

def job():
    frontier = synthetic_frontier(spark, n)
    visited = synthetic_frontier(spark, n // 4).select(F.col("url").alias("s"))
    adm = frontier.filter(K.admitted_static(F.col("url"), CFG))
    adm = adm.join(visited, adm.url == visited.s, "left_anti")
    adm = adm.withColumn("url_clean", K.clean_url(F.col("url"), ["a"], True))
    key = F.coalesce(F.col("url_clean"), F.concat(F.lit("RAW:"), F.col("url")))
    w = Window.partitionBy(key).orderBy("discovery_order")
    adm = adm.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    adm = adm.withColumn("host", K.url_host(F.col("url")))
    return adm.count()

job()  # warmup (codegen compile, JIT)
best = None
for _ in range(runs):
    t0 = time.time()
    out = job()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cores": cores, "n": n, "sec": best, "rows": out,
                  "urls_per_sec": n / best}))
spark.stop()
"""


def run_level(cores: int, n: int, runs: int) -> dict:
    code = CHILD % {"repo": REPO, "cores": cores, "n": n, "runs": runs}
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1200
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(os.environ.get("BENCH_FRONTIER_N", "4000000"))
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    t0 = time.time()
    r8 = run_level(8, n, runs)
    r32 = run_level(32, n, runs)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0
    result = {
        "job": "frontier dequeue+dedup (admission, seen anti-join, clean, "
               "dedup window, host)",
        "frontier_n": n,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "wall_sec": round(time.time() - t0, 1),
    }
    md = f"""# BENCH/BASELINE.md — scaling-efficiency evidence

Protocol (BASELINE.md): identical job, same input, two parallelism
levels in fresh JVMs; best of {runs} timed runs after warmup.

Job: the engine's per-wave frontier dequeue+dedup stage — static
admission filter -> seen-set anti-join (|visited| = n/4) -> URL clean
-> within-wave clean-dedup window -> host extraction, over a generated
synthetic frontier of {n:,} URLs.

| parallelism | wall sec | URLs/sec |
|---|---|---|
| local[8]  (N)  | {r8['sec']:.2f} | {r8['urls_per_sec']:,.0f} |
| local[32] (4N) | {r32['sec']:.2f} | {r32['urls_per_sec']:,.0f} |

**Scaling efficiency (N -> 4N) = (thr@32 / thr@8) / 4 = {eff:.3f}**
(target >= 0.8 per north rule)

Caveat: single machine, shared memory bus and shuffle-on-local-disk;
on a real 4N-executor cluster the shuffle crosses the network but each
executor keeps its own memory bandwidth — local[·] numbers are the
sandbox-available proxy the driver prescribes.
"""
    with open(os.path.join(HERE, "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
