"""Checkpoint/resume (M6) and plugin surface (M7) tests."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.crawl import sitegen
from sitecrawler_spark.crawl.engine import SparkSiteCrawler
from sitecrawler_spark.crawl.plugins import Action

BASE = "http://www.salesforce.com"
SEC = "https://www.salesforce.com"


@pytest.fixture(scope="module")
def site():
    return sitegen.generate_site(n_pages=35, seed=42)


def _cfg(**kw):
    return CrawlerConfig(base_url=BASE, base_url_secure=SEC,
                         disable_redirects=True, blocked=["/logout"], **kw)


def test_resume_midcrawl_equals_uninterrupted(spark, site, tmp_path):
    web = sitegen.site_to_df(spark, site)
    seeds = sitegen.seeds_for(site, 2)

    # uninterrupted run
    full = SparkSiteCrawler(spark, _cfg(), web)
    full.crawl(seeds, max_waves=60)
    exp_order = [r["full_url"] for r in full.visit_order_df().collect()]
    exp_seen = {r["s"] for r in full.visited_df().collect()}

    # interrupted: 2 waves, then a NEW engine resumes from snapshot
    sd = str(tmp_path / "state")
    first = SparkSiteCrawler(spark, _cfg(), web, state_dir=sd)
    first.seed(seeds)
    first.run_wave()
    first.run_wave()

    second = SparkSiteCrawler(spark, _cfg(), web, state_dir=sd)
    second.resume()
    assert second.wave == 2 and second.visited_counter == first.visited_counter
    second.crawl(seeds, max_waves=60)  # continues (frontier already set)

    got_order = [r["full_url"] for r in second.visit_order_df().collect()]
    got_seen = {r["s"] for r in second.visited_df().collect()}
    assert got_order == exp_order
    assert got_seen == exp_seen
    # per-wave + per-partition lineage metrics persisted
    metrics = second.store.read(spark, "metrics")
    assert metrics.count() >= second.wave - 1
    waves = metrics.filter(F.col("bucket") == -1).collect()
    per_part = metrics.filter(F.col("bucket") >= 0)
    # bucket rows sum to the wave-level fetched count
    for w in waves:
        bucket_sum = (
            per_part.filter(F.col("wave") == w["wave"])
            .agg(F.sum("fetched")).collect()[0][0]
        )
        assert bucket_sum == w["fetched"], w


def test_snapshot_expiry(spark, site, tmp_path):
    import os

    web = sitegen.site_to_df(spark, site)
    sd = str(tmp_path / "state2")
    eng = SparkSiteCrawler(spark, _cfg(), web, state_dir=sd)
    eng.seed(sitegen.seeds_for(site, 2))
    for _ in range(3):
        eng.run_wave()
    eng.store.expire_snapshots(keep=1)
    snaps = os.listdir(os.path.join(sd, "_snapshots"))
    assert len(snaps) == 1
    # latest snapshot still fully readable
    again = SparkSiteCrawler(spark, _cfg(), web, state_dir=sd)
    again.resume()
    assert again.visited_counter == eng.visited_counter


def test_plugin_actions(spark, site):
    web = sitegen.site_to_df(spark, site)
    eng = SparkSiteCrawler(spark, _cfg(), web)
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=40)

    @F.pandas_udf(T.IntegerType())
    def count_hrefs(hrefs: pd.Series) -> pd.Series:
        return hrefs.map(len).astype("int32")

    actions = [
        Action("n_raw_hrefs", on_success=lambda df: count_hrefs(F.col("raw_hrefs"))),
        Action(
            "link_density",
            on_success=lambda df: F.round(
                F.size("raw_hrefs") / F.greatest(F.size("spans"), F.lit(1)), 4
            ),
        ),
        Action(
            "err_tag",
            on_error=lambda df: F.concat_ws(
                ":", F.lit("E"), F.col("error_code"), F.col("full_url")
            ),
        ),
    ]
    success, error = eng.apply_actions(actions)

    srows = success.select("full_url", "n_raw_hrefs", "link_density",
                           "referrers", "raw_hrefs").collect()
    assert len(srows) > 10
    by_url = {r["url"]: r for r in site}
    from sitecrawler_spark.crawl.parse import raw_hrefs_from_spans

    for r in srows:
        exp = raw_hrefs_from_spans(by_url[r["full_url"]]["spans"])
        # plugins see RAW pre-normalization hrefs (ProcessPage.java:217)
        assert list(r["raw_hrefs"]) == exp, r["full_url"]
        assert r["n_raw_hrefs"] == len(exp)

    erows = error.select("full_url", "error_code", "err_tag_error").collect()
    assert len(erows) > 0
    for r in erows:
        assert r["err_tag_error"] == f"E:{r['error_code']}:{r['full_url']}"

    # referrer sets: spot-check one page against the links table
    links = eng.links
    some = srows[5]["full_url"]
    exp_refs = sorted(
        {r["src"] for r in links.filter(
            (F.col("dst") == some) & F.col("src").isNotNull()).collect()}
    )
    got = [r["referrers"] for r in srows if r["full_url"] == some][0]
    got_list = got.split(",") if got else []
    assert got_list == exp_refs


def test_resume_ignores_torn_tmp_manifest(spark, site, tmp_path):
    """A crash between writing '<id>.json.tmp' and os.replace must not
    poison resume: latest() IGNORES .tmp files (never deletes them — a
    concurrent writer may be mid-publish); only gc reaps, and only once
    the .tmp is older than the grace period (ADVICE r02)."""
    import os

    from sitecrawler_spark.tableio import SnapshotStore

    state = str(tmp_path / "state")
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC,
                        disable_redirects=True, short_circuit_after=5)
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site),
                           state_dir=state)
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=10)
    snap_dir = os.path.join(state, "_snapshots")
    good = sorted(f for f in os.listdir(snap_dir) if f.endswith(".json"))
    # simulate the torn write: a stale .tmp that sorts after every .json
    torn = os.path.join(snap_dir, "99999999.json.tmp")
    with open(torn, "w") as f:
        f.write("{ torn")
    store = SnapshotStore(state, eng.store.tables)
    m = store.latest()
    assert m is not None and f"{m['snapshot']:08d}.json" == good[-1]
    # read paths leave the .tmp alone (a live writer could own it)
    assert os.path.exists(torn)
    # gc within the grace period also leaves it (could be mid-publish)
    store.expire_snapshots(keep=1)
    assert os.path.exists(torn)
    # gc reaps it once it is clearly stale
    old = os.path.getmtime(torn) - store._TMP_GRACE_SEC - 5
    os.utime(torn, (old, old))
    store.expire_snapshots(keep=1)
    assert not os.path.exists(torn)
    assert store.latest() is not None


def test_compact_state_preserves_rows_and_resume(spark, site, tmp_path):
    """Compaction (Iceberg rewrite_data_files analog): after a
    multi-wave crawl the APPEND tables hold one part dir per wave;
    compact_state rewrites them into one, row-for-row identical, old
    parts stay readable until expiry, and resume + continued crawling
    works off the compacted manifest."""
    import os

    state = str(tmp_path / "state")
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC,
                        disable_redirects=True)
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site),
                           state_dir=state)
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=10)

    before = eng.store.latest()
    assert len(before["tables"]["pages"]) > 1  # one part dir per wave
    rows_before = sorted(
        (r["full_url"], r["wave"])
        for r in eng.store.read(spark, "pages").collect()
    )

    compacted = eng.compact_state(max_parts=1)
    assert "pages" in compacted and "links" in compacted
    after = eng.store.latest()
    assert len(after["tables"]["pages"]) == 1
    rows_after = sorted(
        (r["full_url"], r["wave"])
        for r in eng.store.read(spark, "pages").collect()
    )
    assert rows_after == rows_before
    # old per-wave parts still on disk (time travel) until expiry
    assert all(os.path.isdir(p) for p in before["tables"]["pages"])
    eng.store.expire_snapshots(keep=1)
    assert not any(os.path.isdir(p) for p in before["tables"]["pages"])
    assert os.path.isdir(after["tables"]["pages"][0])

    # resume off the compacted manifest and keep crawling
    eng2 = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site),
                            state_dir=state)
    eng2.resume()
    assert sorted(
        (r["full_url"], r["wave"])
        for r in eng2.store.read(spark, "pages").collect()
    ) == rows_before
    eng2.crawl(max_waves=3)  # no error continuing off compacted state

    # post-compaction commits must be VISIBLE: commit ids allocate above
    # the compaction manifests (not from the wave counter, which would
    # publish below them and leave latest() pointing at stale compacted
    # state — ADVICE r03, high). The store must equal the engine's
    # in-memory state, and a fresh resume must see it.
    assert {r["s"] for r in eng2.store.read(spark, "visited").collect()} == {
        r["s"] for r in eng2.visited.collect()
    }
    assert sorted(
        (r["full_url"], r["wave"])
        for r in eng2.store.read(spark, "pages").collect()
    ) == sorted(
        (r["full_url"], r["wave"]) for r in eng2.pages.collect()
    )
    eng3 = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site),
                            state_dir=state)
    eng3.resume()
    assert eng3.visited_counter == eng2.visited_counter
    assert eng3.wave == eng2.wave


def test_visited_delta_commits_and_retry_replace(spark, tmp_path):
    """`visited` commits per-wave DELTAS (append parts), not a full
    rewrite — and the retry path's deletion wave issues a REPLACE
    commit so the store equals the in-memory set even after un-seeing
    URLs. Resume off both shapes must agree with the engine."""
    state = str(tmp_path / "state")
    site = sitegen.generate_site(n_pages=25, seed=9, p_transient=0.4)
    cfg = CrawlerConfig(base_url=BASE, base_url_secure=SEC,
                        disable_redirects=True, blocked=["/logout"],
                        seen_filter="cuckoo", seen_filter_expected_n=5000,
                        retry_transient=True)
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, site),
                           state_dir=state)
    eng.crawl(sitegen.seeds_for(site, 2), max_waves=80)
    assert eng.pages.filter(F.col("error_code") == 2000).count() > 0

    stored = {r["s"] for r in eng.store.read(spark, "visited").collect()}
    live = {r["s"] for r in eng.visited_df().collect()}
    assert stored == live

    # without retries, visited accumulates as one delta part per wave
    site2 = sitegen.generate_site(n_pages=25, seed=4)
    state2 = str(tmp_path / "state2")
    cfg2 = CrawlerConfig(base_url=BASE, base_url_secure=SEC,
                         disable_redirects=True)
    eng2 = SparkSiteCrawler(spark, cfg2, sitegen.site_to_df(spark, site2),
                            state_dir=state2)
    eng2.crawl(sitegen.seeds_for(site2, 2), max_waves=10)
    m = eng2.store.latest()
    assert len(m["tables"]["visited"]) == eng2.wave  # one delta per wave
    assert {r["s"] for r in eng2.store.read(spark, "visited").collect()} == {
        r["s"] for r in eng2.visited_df().collect()
    }

    eng3 = SparkSiteCrawler(spark, cfg2, sitegen.site_to_df(spark, site2),
                            state_dir=state2)
    eng3.resume()
    assert {r["s"] for r in eng3.visited_df().collect()} == {
        r["s"] for r in eng2.visited_df().collect()
    }


def test_time_travel_reads_and_rollback_resume(spark, site, tmp_path):
    """Snapshot time travel (VERDICT r03 #7): read(name, snapshot_id=k)
    returns the state EXACTLY as snapshot k published it even after
    later waves append; resume(snapshot_id=k) rolls the engine back and
    continuing from there reproduces the uninterrupted crawl — new
    commits chain off the resumed snapshot, not off the rolled-away
    manifests."""
    state = str(tmp_path / "state")
    cfg = _cfg()
    web = sitegen.site_to_df(spark, site)
    seeds = sitegen.seeds_for(site, 2)

    eng = SparkSiteCrawler(spark, cfg, web, state_dir=state)
    eng.seed(seeds)
    eng.run_wave()
    eng.run_wave()
    snap_k = eng.store.latest()["snapshot"]
    seen_at_k = {r["s"] for r in eng.visited.collect()}
    frontier_at_k = sorted(r["raw_url"] for r in eng.frontier.collect())
    counter_at_k = eng.visited_counter

    eng.crawl(max_waves=60)  # run to completion past snapshot k
    final_seen = {r["s"] for r in eng.visited.collect()}
    final_order = [r["full_url"] for r in eng.visit_order_df().collect()]
    assert final_seen > seen_at_k  # later waves really appended

    # (1) time-travel read: snapshot k's tables, not the newest state
    assert {
        r["s"] for r in eng.store.read(spark, "visited", snapshot_id=snap_k).collect()
    } == seen_at_k
    assert sorted(
        r["raw_url"]
        for r in eng.store.read(spark, "frontier", snapshot_id=snap_k).collect()
    ) == frontier_at_k

    # (2) rollback-resume parity: a new engine resumed AT snapshot k and
    # crawled to completion equals the uninterrupted run
    redo = SparkSiteCrawler(spark, cfg, web, state_dir=state)
    redo.resume(snapshot_id=snap_k)
    assert redo.visited_counter == counter_at_k
    redo.crawl(seeds, max_waves=60)
    assert {r["s"] for r in redo.visited.collect()} == final_seen
    assert [r["full_url"] for r in redo.visit_order_df().collect()] == final_order

    # (3) the rolled-forward store reflects the redo, and resumes clean
    again = SparkSiteCrawler(spark, cfg, web, state_dir=state)
    again.resume()
    assert {r["s"] for r in again.visited.collect()} == final_seen


def test_time_travel_to_expired_snapshot_raises(spark, site, tmp_path):
    """Expired snapshots are gone for good: read/resume at an expired id
    fails loudly (listing the surviving ids), never silently serves the
    newest state instead."""
    import pytest

    web = sitegen.site_to_df(spark, site)
    eng = SparkSiteCrawler(spark, _cfg(), web,
                           state_dir=str(tmp_path / "st"))
    eng.seed(sitegen.seeds_for(site, 2))
    for _ in range(3):
        eng.run_wave()
    ids = eng.store.snapshot_ids()
    assert len(ids) == 3
    eng.store.expire_snapshots(keep=1)
    assert eng.store.snapshot_ids() == ids[-1:]
    with pytest.raises(ValueError, match="no snapshot"):
        eng.store.read(spark, "visited", snapshot_id=ids[0])
    with pytest.raises(ValueError, match="no snapshot"):
        eng.resume(snapshot_id=ids[0])
    eng.resume(snapshot_id=ids[-1])  # surviving snapshot still resumable


def test_recrawl_epoch_survives_resume(spark, site, tmp_path):
    """recrawl() deletes visited rows, which an APPEND delta cannot
    express — the next wave's snapshot must REPLACE the visited table
    so a resumed engine still re-fetches the un-seen URLs."""
    web = sitegen.site_to_df(spark, site)
    seeds = sitegen.seeds_for(site, 2)
    sd = str(tmp_path / "state_recrawl")

    eng = SparkSiteCrawler(spark, _cfg(), web, state_dir=sd)
    eng.crawl(seeds, max_waves=60)
    n_urls = eng.pages.select("full_url").distinct().count()
    assert n_urls > 0

    # open epoch 2 and run ONE capped wave (its commit must REPLACE
    # visited; the cap keeps the epoch mid-flight across the resume)
    assert eng.recrawl() == n_urls
    eng.cfg.max_wave_size = 10
    eng.run_wave()
    done_ep2 = eng.pages.groupBy("full_url").count().filter(
        F.col("count") >= 2
    ).count()
    assert 0 < done_ep2 < n_urls  # mid-epoch: some re-fetched, not all

    # a NEW engine resumes from the store and finishes the epoch
    eng2 = SparkSiteCrawler(spark, _cfg(), web, state_dir=sd)
    eng2.resume()
    eng2.crawl(seeds, max_waves=60)
    per_url = eng2.pages.groupBy("full_url").count().collect()
    assert len(per_url) == n_urls
    assert {r["count"] for r in per_url} == {2}  # every URL re-fetched once


def test_tableio_diff_snapshots_generic_cdc(spark, tmp_path):
    """SnapshotStore.diff_snapshots on an OVERWRITE table: added /
    removed / changed / unchanged all reachable (the engine's pages
    twin never sees 'removed' because pages is an APPEND log)."""
    from sitecrawler_spark.tableio import SnapshotStore, OVERWRITE

    store = SnapshotStore(str(tmp_path / "st"), {"t": OVERWRITE})
    v1 = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, fp long"
    )
    v2 = spark.createDataFrame(
        [("a", 1), ("b", 9), ("d", 4)], "k string, fp long"
    )
    s1 = store.commit(store.next_snapshot_id(), {"t": v1})["snapshot"]
    s2 = store.commit(store.next_snapshot_id(), {"t": v2})["snapshot"]
    got = {
        r["k"]: r["status"]
        for r in store.diff_snapshots(
            spark, "t", s1, s2, ["k"], "fp"
        ).collect()
    }
    assert got == {
        "a": "unchanged", "b": "changed", "c": "removed", "d": "added"
    }
