"""Bloom/cuckoo seen-filter correctness + engine integration parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.crawl import sitegen
from sitecrawler_spark.crawl.engine import SparkSiteCrawler
from sitecrawler_spark.crawl.model import ReferenceCrawlModel
from sitecrawler_spark.operators.seen import (
    SparkBloomFilter,
    SparkCuckooFilter,
    anti_join_seen,
)

BASE = "http://www.salesforce.com"
SEC = "https://www.salesforce.com"


def _strings_df(spark, n, prefix="key"):
    return spark.range(n).select(
        F.concat(F.lit(f"https://h.com/{prefix}"), F.col("id")).alias("s")
    )


def test_bloom_no_false_negatives(spark):
    members = _strings_df(spark, 2000, "in")
    bloom = SparkBloomFilter.sized(spark, 2000, fpp=0.01)
    bloom.add_df(members, "s")
    probed = members.withColumn("hit", bloom.maybe_contains(F.col("s")))
    assert probed.filter(~F.col("hit")).count() == 0  # membership is certain


def test_bloom_fpp_reasonable(spark):
    members = _strings_df(spark, 2000, "in")
    others = _strings_df(spark, 2000, "out")
    bloom = SparkBloomFilter.sized(spark, 2000, fpp=0.01)
    bloom.add_df(members, "s")
    fp = others.withColumn("hit", bloom.maybe_contains(F.col("s"))).filter(
        F.col("hit")
    ).count()
    assert fp < 2000 * 0.05  # generous bound around the 1% target


def test_anti_join_seen_exactness(spark):
    cand = _strings_df(spark, 3000, "in").union(_strings_df(spark, 1000, "out"))
    visited = _strings_df(spark, 3000, "in")
    bloom = SparkBloomFilter.sized(spark, 3000, fpp=0.02)
    bloom.add_df(visited, "s")
    cand = cand.withColumnRenamed("s", "url")
    plain = {r["url"] for r in cand.join(
        visited, cand.url == visited.s, "left_anti").collect()}
    with_bloom = {r["url"] for r in anti_join_seen(
        cand, "url", visited, "s", bloom).collect()}
    assert with_bloom == plain  # bloom is a pure routing optimization


def test_cuckoo_insert_delete(spark):
    f = SparkCuckooFilter.sized(spark, 1000)
    members = _strings_df(spark, 500, "in")
    assert f.add_df(members, "s") == 0
    hit = members.withColumn("h", f.maybe_contains(F.col("s")))
    assert hit.filter(~F.col("h")).count() == 0
    # delete half, they must become (at least mostly) invisible
    to_del = members.filter(F.col("s").endswith("0"))
    n_del = f.delete_df(to_del, "s")
    assert n_del == to_del.count()
    still = to_del.withColumn("h", f.maybe_contains(F.col("s"))).filter(
        F.col("h")
    ).count()
    # residual hits only via fingerprint collisions with remaining keys
    assert still <= to_del.count() * 0.05
    # non-deleted keys still present
    kept = members.subtract(to_del)
    assert kept.withColumn("h", f.maybe_contains(F.col("s"))).filter(
        ~F.col("h")
    ).count() == 0


def test_engine_with_bloom_matches_model(spark):
    site = sitegen.generate_site(n_pages=40, seed=42)
    cfg = CrawlerConfig(
        base_url=BASE, base_url_secure=SEC, disable_redirects=True,
        blocked=["/logout"], seen_filter="bloom",
        seen_filter_expected_n=10_000,
    )
    model = ReferenceCrawlModel(cfg, site)
    expected = model.crawl(sitegen.seeds_for(site, 2))
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=60)
    assert [r["full_url"] for r in eng.visit_order_df().collect()] == (
        expected.visit_order
    )
    assert {r["s"] for r in eng.visited_df().collect()} == expected.visited


def test_engine_retry_transient_with_cuckoo(spark):
    site = sitegen.generate_site(n_pages=25, seed=9, p_transient=0.4)
    cfg = CrawlerConfig(
        base_url=BASE, base_url_secure=SEC, disable_redirects=True,
        blocked=["/logout"], seen_filter="cuckoo",
        seen_filter_expected_n=5_000, retry_transient=True,
    )
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=80)

    pages = eng.pages
    # transient failures recorded, then retried to success
    n_transient = pages.filter(F.col("error_code") == 2000).count()
    assert n_transient > 0
    assert sum(m.get("retried", 0) for m in eng.metrics_rows) == n_transient
    # every transiently-failed URL eventually succeeded (none exhausted
    # the retry budget at fails<=2) exactly once
    failed_urls = {
        r["full_url"]
        for r in pages.filter(F.col("error_code") == 2000).collect()
    }
    ok_counts = (
        pages.filter(F.col("error_code").isNull() | (F.col("error_code") != 2000))
        .groupBy("full_url").count().collect()
    )
    ok_map = {r["full_url"]: r["count"] for r in ok_counts}
    for u in failed_urls:
        assert ok_map.get(u) == 1, u
    # deterministic: same run again → same realized order
    eng2 = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site))
    eng2.crawl(sitegen.seeds_for(site, 2), max_waves=80)
    o1 = [(r["full_url"], r["wave"]) for r in eng.visit_order_df().collect()]
    o2 = [(r["full_url"], r["wave"]) for r in eng2.visit_order_df().collect()]
    assert o1 == o2


def test_bloom_sharded_no_false_negatives_and_fpp(spark):
    """Multi-shard bloom: membership certain per shard, fpp holds, and
    probing a never-inserted shard returns definitely-new."""
    members = _strings_df(spark, 4000, "in")
    others = _strings_df(spark, 4000, "out")
    bloom = SparkBloomFilter.sized(spark, 4000, fpp=0.01, n_shards=8)
    assert bloom.n_shards == 8
    bloom.add_df(members, "s")
    assert members.withColumn(
        "h", bloom.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count() == 0
    fp = others.withColumn("h", bloom.maybe_contains(F.col("s"))).filter(
        F.col("h")
    ).count()
    assert fp < 4000 * 0.05


def test_bloom_sharded_equals_single_shard_routing(spark):
    """anti_join_seen output is identical for 1-shard and 8-shard blooms
    (sharding is pure routing, never semantics)."""
    cand = _strings_df(spark, 2000, "in").union(_strings_df(spark, 800, "out"))
    visited = _strings_df(spark, 2000, "in")
    cand = cand.withColumnRenamed("s", "url")
    outs = []
    for shards in (1, 8):
        b = SparkBloomFilter.sized(spark, 2000, fpp=0.02, n_shards=shards)
        b.add_df(visited, "s")
        outs.append(
            {r["url"] for r in anti_join_seen(cand, "url", visited, "s", b).collect()}
        )
    plain = {
        r["url"]
        for r in cand.join(visited, cand.url == visited.s, "left_anti").collect()
    }
    assert outs[0] == outs[1] == plain


def test_bloom_incremental_add_touches_only_dirty_shards(spark):
    bloom = SparkBloomFilter.sized(spark, 4000, fpp=0.01, n_shards=8)
    bloom.add_df(_strings_df(spark, 500, "a"), "s")
    first = {sh: arr.copy() for sh, arr in bloom._shards.items()}
    bloom.maybe_contains(F.lit("x"))  # flush broadcasts
    assert not bloom._dirty
    bloom.add_df(_strings_df(spark, 500, "b"), "s")
    # only shards whose bits changed are marked dirty for re-broadcast
    for sh in bloom._dirty:
        assert sh not in first or not (bloom._shards[sh] == first[sh]).all()


def test_cuckoo_overflow_saturates_and_antijoin_falls_back(spark):
    """Insert far beyond capacity: add_df reports failures, the filter
    flips saturated, and anti_join_seen returns EXACT results anyway."""
    f = SparkCuckooFilter(16, spark)  # 16 buckets × 4 slots = 64 capacity
    members = _strings_df(spark, 2000, "in")
    failed = f.add_df(members, "s")
    assert failed > 0
    assert f.saturated
    cand = members.union(_strings_df(spark, 500, "out")).withColumnRenamed(
        "s", "url"
    )
    got = {
        r["url"] for r in anti_join_seen(cand, "url", members, "s", f).collect()
    }
    exp = {
        r["url"]
        for r in cand.join(members, cand.url == members.s, "left_anti").collect()
    }
    assert got == exp  # no silently re-admitted visited URL


def test_cuckoo_bulk_insert_matches_sequential_contract(spark):
    """Vectorized bulk insert keeps the membership contract: every
    successfully inserted key probes True; deletes still work."""
    f = SparkCuckooFilter.sized(spark, 5000)
    members = _strings_df(spark, 5000, "in")
    assert f.add_df(members, "s") == 0
    assert not f.saturated
    assert members.withColumn(
        "h", f.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count() == 0
    some = members.limit(700)
    assert f.delete_df(some, "s") == 700


def test_cuckoo_build_df_distributed_matches_add_df(spark):
    """build_df (distributed placement, packed-table collect) is
    membership-equivalent to the driver-side bulk add: no false
    negatives on inserted keys, comparable FP rate on fresh keys, and
    deletes still work afterwards (VERDICT r02 #3)."""
    members = _strings_df(spark, 5000, "in")
    fresh = _strings_df(spark, 3000, "out")

    built = SparkCuckooFilter.sized(spark, 5000)
    assert built.build_df(members, "s") == 0
    assert not built.saturated
    # residual kick path must be a tiny fraction — the point of the
    # distributed build is that ~everything places in the two rounds
    # (measured: ~1.8% at this load; bound at 5%)
    assert built._residual_built <= 250

    # zero false negatives
    assert members.withColumn(
        "h", built.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count() == 0
    # FP rate on fresh keys stays filter-like (16-bit fps → ~<2%)
    fp = fresh.withColumn("h", built.maybe_contains(F.col("s"))).filter(
        F.col("h")
    ).count()
    assert fp / 3000 < 0.05
    # deletes work on a built table
    some = members.limit(300)
    assert built.delete_df(some, "s") == 300

    # guard: build_df refuses a non-empty table
    import pytest

    with pytest.raises(ValueError):
        built.build_df(members, "s")


def test_cuckoo_resume_rebuild_is_distributed(spark, tmp_path):
    """engine.resume with seen_filter='cuckoo' must NOT pull the full
    visited set through the driver: the rebuild goes through build_df
    (packed-table collect), never through _arrays (16 B/key toPandas)."""
    from sitecrawler_spark.operators import seen as seen_mod

    site = sitegen.generate_site(n_pages=120, seed=11)
    web = sitegen.site_to_df(spark, site)
    cfg = CrawlerConfig(
        base_url=BASE + "/", base_url_secure=SEC + "/",
        disable_redirects=True, seen_filter="cuckoo",
        seen_filter_expected_n=10000,
    )
    eng = SparkSiteCrawler(spark, cfg, web, state_dir=str(tmp_path / "st"))
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=3)
    visited_before = sorted(r["s"] for r in eng.visited.select("s").collect())

    calls = []
    orig = seen_mod.SparkCuckooFilter._arrays

    def spy(self, df, col):
        calls.append(df.count())
        return orig(self, df, col)

    seen_mod.SparkCuckooFilter._arrays = spy
    try:
        eng2 = SparkSiteCrawler(
            spark, cfg, web, state_dir=str(tmp_path / "st")
        )
        eng2.resume()
    finally:
        seen_mod.SparkCuckooFilter._arrays = orig

    assert calls == [], f"_arrays pulled {calls} rows through the driver"
    assert getattr(eng2.seen, "_residual_built", None) is not None
    # the rebuilt filter sees every visited URL (no false negatives)
    vis = eng2.visited.select("s")
    misses = vis.withColumn(
        "h", eng2.seen.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count()
    assert misses == 0
    # and the resumed crawl proceeds identically to an uninterrupted one
    assert sorted(r["s"] for r in eng2.visited.select("s").collect()) == visited_before


def test_bloom_shard_spill_bounds_driver_bytes(spark, tmp_path):
    """With max_hot_shards=K < n_shards, the driver holds at most K shard
    arrays; evicted shards live as .npy artifacts and reload on demand
    with unchanged membership semantics (VERDICT r02 #4)."""
    import os

    spill = str(tmp_path / "shards")
    f = SparkBloomFilter(
        m_bits=8 * 4096 * 64, k=4, spark=spark, n_shards=8,
        spill_dir=spill, max_hot_shards=2,
    )
    members = _strings_df(spark, 4000, "in")
    fresh = _strings_df(spark, 2000, "out")
    f.add_df(members, "s")

    per_shard = (f.m + 63) // 64 * 8
    assert f.hot_shard_bytes() <= 2 * per_shard
    spilled = [x for x in os.listdir(spill) if x.endswith(".npy")]
    assert len(spilled) >= 6  # 8 shards touched, at most 2 hot

    # no false negatives through the spill/reload cycle
    assert members.withColumn(
        "h", f.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count() == 0
    # fpp stays bloom-like
    fp = fresh.withColumn("h", f.maybe_contains(F.col("s"))).filter(
        F.col("h")
    ).count()
    assert fp / 2000 < 0.05

    # incremental add to a COLD shard merges with its persisted bits
    more = _strings_df(spark, 1000, "in2")
    f.add_df(more, "s")
    assert f.hot_shard_bytes() <= 2 * per_shard
    both = members.unionByName(more)
    assert both.withColumn(
        "h", f.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count() == 0


def test_engine_bloom_spill_matches_model(spark, tmp_path):
    """Crawl with n_shards > max_hot_shards: seen-set and visit-order
    equality vs the reference model must hold with shard spilling on."""
    site = sitegen.generate_site(n_pages=40, seed=42)
    cfg = CrawlerConfig(
        base_url=BASE, base_url_secure=SEC, disable_redirects=True,
        blocked=["/logout"], seen_filter="bloom",
        seen_filter_expected_n=10_000,
        bloom_n_shards=8, bloom_max_hot_shards=2,
    )
    model = ReferenceCrawlModel(cfg, site)
    expected = model.crawl(sitegen.seeds_for(site, 2))
    eng = SparkSiteCrawler(
        spark, cfg, sitegen.site_to_df(spark, site),
        state_dir=str(tmp_path / "st"),
    )
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=60)
    assert [r["full_url"] for r in eng.visit_order_df().collect()] == (
        expected.visit_order
    )
    assert {r["s"] for r in eng.visited_df().collect()} == expected.visited
    per_shard = (eng.seen.m + 63) // 64 * 8
    assert eng.seen.hot_shard_bytes() <= 2 * per_shard


def test_cuckoo_shard_spill_bounds_driver_bytes(spark, tmp_path):
    """Sharded cuckoo (VERDICT r03 #2): with max_hot_shards=K <
    n_shards the driver holds at most K shard tables; evicted shards
    live as .npy artifacts and reload on demand with unchanged
    membership AND delete semantics."""
    import os

    spill = str(tmp_path / "cshards")
    f = SparkCuckooFilter.sized(
        spark, 8000, n_shards=8, spill_dir=spill, max_hot_shards=2
    )
    members = _strings_df(spark, 4000, "in")
    fresh = _strings_df(spark, 2000, "out")
    assert f.add_df(members, "s") == 0

    per_shard = f.n * f.SLOTS * 2  # uint16 table bytes
    assert f.hot_shard_bytes() <= 2 * per_shard
    spilled = [x for x in os.listdir(spill) if x.endswith(".npy")]
    assert len(spilled) >= 6  # 8 shards touched, at most 2 hot

    # no false negatives through the spill/reload cycle
    assert members.withColumn(
        "h", f.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count() == 0
    fp = fresh.withColumn("h", f.maybe_contains(F.col("s"))).filter(
        F.col("h")
    ).count()
    assert fp / 2000 < 0.05  # 16-bit fingerprints

    # deletes work across cold shards and stay bounded
    to_del = members.filter(F.col("s").endswith("0"))
    assert f.delete_df(to_del, "s") == to_del.count()
    assert f.hot_shard_bytes() <= 2 * per_shard
    kept = members.subtract(to_del)
    assert kept.withColumn(
        "h", f.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count() == 0


def test_cuckoo_sharded_build_df_bounded_and_equivalent(spark, tmp_path):
    """build_df on a sharded+spilling filter: distributed placement per
    (shard, bucket), driver residency stays K x shard bytes DURING the
    packed fill, membership matches the unsharded build."""
    members = _strings_df(spark, 5000, "in")
    fresh = _strings_df(spark, 3000, "out")

    f = SparkCuckooFilter.sized(
        spark, 5000, n_shards=8,
        spill_dir=str(tmp_path / "cb"), max_hot_shards=2,
    )
    assert f.build_df(members, "s") == 0
    per_shard = f.n * f.SLOTS * 2
    assert f.hot_shard_bytes() <= 2 * per_shard
    assert members.withColumn(
        "h", f.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count() == 0
    fp = fresh.withColumn("h", f.maybe_contains(F.col("s"))).filter(
        F.col("h")
    ).count()
    assert fp / 3000 < 0.05
    # deletes work on a built sharded table
    assert f.delete_df(members.limit(300), "s") == 300


def test_cuckoo_sharded_antijoin_equals_unsharded(spark):
    """anti_join_seen output identical for 1-shard and 8-shard cuckoo
    (sharding is pure routing, never semantics)."""
    cand = _strings_df(spark, 2000, "in").union(_strings_df(spark, 800, "out"))
    visited = _strings_df(spark, 2000, "in")
    cand = cand.withColumnRenamed("s", "url")
    outs = []
    for shards in (1, 8):
        f = SparkCuckooFilter.sized(spark, 2000, n_shards=shards)
        assert f.add_df(visited, "s") == 0
        outs.append(
            {r["url"] for r in anti_join_seen(cand, "url", visited, "s", f).collect()}
        )
    plain = {
        r["url"]
        for r in cand.join(visited, cand.url == visited.s, "left_anti").collect()
    }
    assert outs[0] == outs[1] == plain


def test_bloom_fresh_build_ignores_stale_spill_artifacts(spark, tmp_path):
    """A fresh (non-resume) filter pointed at a reused spill_dir must
    NOT adopt the previous run's bits — stale artifacts would inflate
    the FP rate, and wrong-geometry arrays would be read as corrupt
    (ADVICE r03). Construction clears them; resume rebuilds from the
    authoritative visited table anyway."""
    import os

    spill = str(tmp_path / "reused")
    a = SparkBloomFilter(
        m_bits=8 * 4096 * 64, k=4, spark=spark, n_shards=8,
        spill_dir=spill, max_hot_shards=2,
    )
    a.add_df(_strings_df(spark, 4000, "old"), "s")
    assert any(x.endswith(".npy") for x in os.listdir(spill))

    b = SparkBloomFilter(
        m_bits=8 * 4096 * 64, k=4, spark=spark, n_shards=8,
        spill_dir=spill, max_hot_shards=2,
    )
    assert not any(x.endswith(".npy") for x in os.listdir(spill))
    # the old run's members are invisible to the fresh filter
    hits = _strings_df(spark, 4000, "old").withColumn(
        "h", b.maybe_contains(F.col("s"))
    ).filter(F.col("h")).count()
    assert hits == 0


def test_engine_cuckoo_resume_sharded_spill_bounded(spark, tmp_path):
    """resume() with a sharded+spilling cuckoo: the distributed rebuild
    fills shards via the packed collect, the driver never holds more
    than max_hot_shards tables, and the resumed crawl still sees every
    visited URL (the r03 scale-killer: the unsharded rebuild held the
    FULL table as driver + broadcast state)."""
    import os

    site = sitegen.generate_site(n_pages=120, seed=11)
    web = sitegen.site_to_df(spark, site)
    cfg = CrawlerConfig(
        base_url=BASE + "/", base_url_secure=SEC + "/",
        disable_redirects=True, seen_filter="cuckoo",
        seen_filter_expected_n=10000,
        cuckoo_n_shards=8, cuckoo_max_hot_shards=2,
    )
    eng = SparkSiteCrawler(spark, cfg, web, state_dir=str(tmp_path / "st"))
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=3)

    eng2 = SparkSiteCrawler(spark, cfg, web, state_dir=str(tmp_path / "st"))
    eng2.resume()
    per_shard = eng2.seen.n * eng2.seen.SLOTS * 2
    assert eng2.seen.hot_shard_bytes() <= 2 * per_shard
    spill = os.path.join(str(tmp_path / "st"), "_cuckoo_shards")
    assert any(x.endswith(".npy") for x in os.listdir(spill))
    vis = eng2.visited.select("s")
    assert vis.withColumn(
        "h", eng2.seen.maybe_contains(F.col("s"))
    ).filter(~F.col("h")).count() == 0
