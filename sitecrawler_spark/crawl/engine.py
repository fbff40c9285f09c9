"""SparkSiteCrawler — the distributed micro-wave crawl engine.

One wave = one bounded Spark job over DataFrames (SURVEY.md §3.1):

    wave     = frontier slice after dequeue checks + politeness budget
    visited' = visited ∪ wave.url ∪ wave.url_clean      (BEFORE fetch,
               ≙ SiteCrawler.java:1042-1047 — the ordering that makes
               the seen set deterministic)
    pages'   = fetch+parse wave                          (≙ NavigateThread+ProcessPage)
    cand     = outlinks (iframe-first order) + redirect targets
    admitted = cand after static filter, visited'/frontier anti-joins,
               keep-first dedup                          (≙ SiteCrawler.java:943-957)
    frontier'= deferred ∪ admitted, FIFO discovery_order
    commit   → snapshot (checkpoint; resume re-reads latest)

Equality with the reference's canonical single-consumer order
(threadLimit=1, SURVEY.md §3.4) holds because (a) admission predicates
run in the same order with the same visited-set visibility, (b)
within-wave duplicate resolution keeps the earliest discovery_order —
exactly what sequential dequeue produces, and (c) discovery_order
totally orders enqueues by (parent order, iframe-first span position).

Scale design (north rule): no global single-partition ops — ordering
via range-partitioned ranking (operators/ordering.py); anti-joins
shuffle on the url key (bloom prefilter added by operators/seen.py);
per-host politeness via host-partitioned windows; state commits
hash-partitioned by host bucket.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.crawl.parse import explode_outlinks, parse_html_udf
from sitecrawler_spark.kernel import urls_spark as K
from sitecrawler_spark.operators.ordering import assign_global_order

FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("raw_url", T.StringType(), False),
        T.StructField("discovery_order", T.LongType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
    ]
)


class SparkSiteCrawler:
    # fold the in-memory visited parts into one checkpointed frame once
    # the union exceeds this many children (plan-width bound — see
    # run_wave); store-side parts compact separately (compact_state)
    _VISITED_FOLD_PARTS = 32

    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlerConfig,
        web_df: DataFrame | None = None,
        state_dir: str | None = None,
        use_html: bool = False,
        broadcast_web: bool | None = None,
    ):
        """web_df: the synthetic web (sitegen.WEB_SCHEMA) the fetch stage
        resolves against; None → fetcher must be a live HTTP fetcher
        (crawl/fetcher.py). use_html: run the HTML parse kernel on the
        rendered body instead of trusting stored spans."""
        self.spark = spark
        self.cfg = cfg
        self.web_df = web_df
        self.use_html = use_html
        self.broadcast_web = broadcast_web
        self.store = None
        if state_dir:
            from sitecrawler_spark.tableio import APPEND, OVERWRITE, SnapshotStore

            self.store = SnapshotStore(
                state_dir,
                {
                    "frontier": OVERWRITE,
                    # append-only by nature: each wave commits ONLY its
                    # insert delta — an OVERWRITE table would rewrite the
                    # whole visited set every wave, O(history) per wave
                    # and quadratic over a 10^4-wave crawl
                    "visited": APPEND,
                    "pages": APPEND,
                    "links": APPEND,
                    "metrics": APPEND,
                },
            )
        self.seen = None  # bloom/cuckoo prefilter (operators/seen.py)
        # in-memory state between waves (always mirrored to store if set).
        # visited/pages/links accumulate as PER-WAVE checkpointed parts —
        # a union re-materialized every wave would be O(history) work per
        # wave (quadratic over the crawl); parts keep appends O(wave).
        self.frontier: DataFrame | None = None
        self._visited_parts: list[DataFrame] = []
        self._pages_parts: list[DataFrame] = []
        self._links_parts: list[DataFrame] = []
        self.metrics_rows: list = []
        self.wave = 0
        self.visited_counter = 0
        self._max_order = -1  # running max discovery_order (driver state)
        # snapshot the next commit's APPEND deltas chain off (None =
        # latest): set by _commit_snapshot / resume / compact_state
        self._snap_base: int | None = None

    @staticmethod
    def _union_parts(parts: list[DataFrame]) -> DataFrame | None:
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    @property
    def visited(self) -> DataFrame | None:
        return self._union_parts(self._visited_parts)

    @property
    def pages(self) -> DataFrame | None:
        return self._union_parts(self._pages_parts)

    @property
    def links(self) -> DataFrame | None:
        return self._union_parts(self._links_parts)

    # -- column helpers ------------------------------------------------------

    def _full_url(self, c):
        return K.prepend_base_if_needed(c, self.cfg.base_url, self.cfg.base_url_secure)

    def _clean(self, c):
        # Arrow UDF, not the native expression: inside the fused wave
        # stages the native clean tree blows past Janino's 64KB method
        # limit (compile-fail-then-fallback costs seconds per stage per
        # wave). The Arrow path is the north-star canonicalize UDF and
        # byte-identical to the native version (tests/test_url_kernel).
        if not hasattr(self, "_clean_udf"):
            from sitecrawler_spark.kernel.udfs import make_clean_udf

            self._clean_udf = make_clean_udf(
                self.cfg.allowed_parameters,
                self.cfg.url_path_should_not_end_in_slash,
            )
        return self._clean_udf(c)

    def _make_bloom(self):
        """Sharded bloom sized from config. With bloom_max_hot_shards
        set, cold shards spill as .npy artifacts under the state dir
        (SnapshotStore root — the Iceberg state-table analog), so the
        driver holds at most K shard arrays (VERDICT r02 #4)."""
        from sitecrawler_spark.operators.seen import SparkBloomFilter

        spill_dir = None
        if self.cfg.bloom_max_hot_shards is not None:
            if self.store is not None:
                spill_dir = os.path.join(self.store.root, "_bloom_shards")
            else:
                spill_dir = tempfile.mkdtemp(prefix="bloom_shards_")
        return SparkBloomFilter.sized(
            self.spark,
            self.cfg.seen_filter_expected_n,
            self.cfg.seen_filter_fpp,
            n_shards=self.cfg.bloom_n_shards,
            spill_dir=spill_dir,
            max_hot_shards=self.cfg.bloom_max_hot_shards,
        )

    def _make_cuckoo(self):
        """Sharded cuckoo sized from config — same shard-route + LRU/
        spill machinery as the bloom (VERDICT r03 #2), so neither the
        driver nor any executor holds the full fingerprint table on the
        resume-rebuild path."""
        from sitecrawler_spark.operators.seen import SparkCuckooFilter

        spill_dir = None
        if self.cfg.cuckoo_max_hot_shards is not None:
            if self.store is not None:
                spill_dir = os.path.join(self.store.root, "_cuckoo_shards")
            else:
                spill_dir = tempfile.mkdtemp(prefix="cuckoo_shards_")
        return SparkCuckooFilter.sized(
            self.spark,
            self.cfg.seen_filter_expected_n,
            n_shards=self.cfg.cuckoo_n_shards,
            spill_dir=spill_dir,
            max_hot_shards=self.cfg.cuckoo_max_hot_shards,
        )

    # -- seeding -------------------------------------------------------------

    def seed_from_files(self, paths: list[str]) -> None:
        """Seed the frontier from seed-list files (one raw path per
        line, blanks and '#' comments skipped) — the file-backed analog
        of setIncludePath (SiteCrawler.java:437-448; the reference's
        callers read path collections from files). Line order within a
        file and file order across ``paths`` define seed order, matching
        the reference's collection iteration order. Reads distributed
        (spark.read.text), so a billion-seed list never lands on the
        driver."""
        dfs = []
        for i, p in enumerate(paths):
            # per-file read keeps cross-file ordering deterministic
            # regardless of glob/listing order; within a file,
            # monotonically_increasing_id orders by (split, offset) =
            # physical line order
            df = self.spark.read.text(p).select(
                F.trim(F.col("value")).alias("raw_url"),
                F.lit(i).alias("_file"),
                F.monotonically_increasing_id().alias("_line"),
            )
            dfs.append(df)
        allseeds = dfs[0]
        for d in dfs[1:]:
            allseeds = allseeds.unionByName(d)
        allseeds = allseeds.filter(
            (F.col("raw_url") != "") & ~F.col("raw_url").startswith("#")
        )
        ordered = assign_global_order(
            allseeds, ["_file", "_line"], "seed_order", start=0,
            num_partitions=self.cfg.order_partitions,
        ).select("raw_url", "seed_order")
        self._seed_from_df(ordered)

    def seed_from_sitemaps(self, sitemaps, xml_col: str = "xml",
                           order_col: str | None = None) -> None:
        """Seed the frontier from sitemap XML documents — the reference
        README's "give it a collection (your sitemap?) to start from"
        (README.md:33) as a distributed source: native-regex <urlset>
        parse (sources/sitemap.py), seed order = (document order, entry
        position within the sitemap). ``order_col`` names a column that
        orders the sitemap documents; omitted, a distributed
        monotonically_increasing_id preserves partition/row order the
        way seed_from_files orders lines."""
        from sitecrawler_spark.operators.ordering import assign_global_order
        from sitecrawler_spark.sources.sitemap import sitemap_seed_urls

        if order_col is None:
            sitemaps = sitemaps.withColumn(
                "_doc", F.monotonically_increasing_id()
            )
            order_col = "_doc"
        urls = sitemap_seed_urls(sitemaps, xml_col, order_cols=[order_col])
        ordered = assign_global_order(
            urls, [order_col, "pos"], "seed_order", start=0,
            num_partitions=self.cfg.order_partitions,
        ).select("raw_url", "seed_order")
        self._seed_from_df(ordered)

    def seed(self, seed_paths: list[str] | None = None) -> None:
        """setIncludePath (SiteCrawler.java:437-448) + navigate() default
        seed (:621-628). Raw paths are enqueued; exclusion is checked on
        the base-prepended form; duplicates keep first occurrence."""
        spark = self.spark
        rows = [(p, i) for i, p in enumerate(seed_paths or [])]
        df = spark.createDataFrame(rows, ["raw_url", "seed_order"]) if rows else None
        self._seed_from_df(df)

    def _seed_from_df(self, df: DataFrame | None) -> None:
        """Shared distributed seeding core: admission filter on the
        base-prepended form, keep-first dedup, FIFO discovery order —
        entirely DataFrame ops, so a billion-row seed list never touches
        the driver."""
        cfg = self.cfg
        spark = self.spark
        if df is not None:
            full = self._full_url(F.col("raw_url"))
            df = df.filter(~K.is_excluded_static(full, cfg))
            w = Window.partitionBy("raw_url").orderBy("seed_order")
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            df = assign_global_order(df, ["seed_order"], "discovery_order", start=0,
                                     num_partitions=cfg.order_partitions)
            df = df.select(
                "raw_url", "discovery_order", F.lit(0).alias("depth"),
                F.lit(0).alias("retry_count"),
            )
            if df.isEmpty():
                df = None
        if df is None:
            # default seed: baseUrl preferred, secure as fallback
            seed_url = cfg.base_url if cfg.base_url is not None else cfg.base_url_secure
            df = spark.createDataFrame([(seed_url, 0, 0, 0)], FRONTIER_SCHEMA)
        self.frontier = df
        self._max_order = int(
            df.agg(F.coalesce(F.max("discovery_order"), F.lit(0))).collect()[0][0]
        )
        # discovery orders are dense from 0 (assign_global_order), so
        # the seeded frontier size is exactly max+1 — known without a
        # count job, enabling latency mode from the first wave
        self._frontier_rows = self._max_order + 1
        self._visited_parts = [self.spark.createDataFrame([], "s string")]
        if cfg.seen_filter == "bloom":
            self.seen = self._make_bloom()
        elif cfg.seen_filter == "cuckoo":
            self.seen = self._make_cuckoo()
        self._pages_parts = []
        self._links_parts = []
        self.wave = 0
        self.visited_counter = 0
        self._snap_base = None

    def enqueue_seeds(self, df: DataFrame) -> int:
        """ADD seeds to a live crawl without resetting state — the
        continuous-ingestion entry point (streaming/crawl_stream.py
        feeds each micro-batch of a seed-file stream through here).
        ``df``: (raw_url, seed_order). Admission mirrors the per-wave
        outlink path: static filter, keep-first dedup, anti-join
        visited (url AND clean form), anti-join frontier; survivors get
        discovery orders continuing after the global max. Returns the
        number of seeds enqueued."""
        from sitecrawler_spark.operators.seen import anti_join_seen

        cfg = self.cfg
        if self.frontier is None:
            self._reset_state()
        full = self._full_url(F.col("raw_url"))
        adm = df.filter(~K.is_excluded_static(full, cfg))
        w = Window.partitionBy("raw_url").orderBy("seed_order")
        adm = (
            adm.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        adm = adm.withColumn("_full", full)
        visited = self.visited
        adm = anti_join_seen(adm, "_full", visited, "s", self.seen)
        adm = adm.withColumn("_clean", self._clean(F.col("_full")))
        adm = anti_join_seen(adm, "_clean", visited, "s", self.seen)
        adm = adm.join(
            self.frontier.select("raw_url"), "raw_url", "left_anti"
        )
        adm = assign_global_order(
            adm, ["seed_order"], "discovery_order",
            start=self._max_order + 1, num_partitions=cfg.order_partitions,
        ).select(
            "raw_url", "discovery_order", F.lit(0).alias("depth"),
            F.lit(0).alias("retry_count"),
        )
        adm = adm.localCheckpoint(eager=True)
        n = adm.count()
        if n:
            prev = getattr(self, "_frontier_rows", None)
            self.frontier = self.frontier.unionByName(adm)
            self._frontier_rows = None if prev is None else prev + n
            self._max_order = int(
                adm.agg(F.max("discovery_order")).collect()[0][0]
            )
        return n

    def _reset_state(self) -> None:
        """Empty crawl state (no frontier rows, empty visited, fresh
        filters) — for callers that enqueue seeds incrementally."""
        self.frontier = self.spark.createDataFrame([], FRONTIER_SCHEMA)
        self._frontier_rows = 0
        self._visited_parts = [self.spark.createDataFrame([], "s string")]
        if self.cfg.seen_filter == "bloom":
            self.seen = self._make_bloom()
        elif self.cfg.seen_filter == "cuckoo":
            self.seen = self._make_cuckoo()
        self._pages_parts = []
        self._links_parts = []
        self.wave = 0
        self.visited_counter = 0
        self._max_order = -1
        self._snap_base = None

    # -- one wave ------------------------------------------------------------

    _WAVE_AQE_KEYS = (
        "spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    def run_wave(self) -> dict:
        """One crawl wave. Wave-scoped AQE override (guide §2.2): tiny
        per-wave shuffles coalesce to byte-sized partitions instead of
        shuffle.partitions-many near-empty tasks; restored on exit so
        the session's global tuning is untouched.

        Measured negative (kept OUT): a "latency mode" running small
        waves with AQE disabled and a volume-derived tiny shuffle
        partition count was consistently ~15-20% SLOWER per wave than
        AQE + advisory coalescing — AQE's runtime SMJ→BHJ conversion of
        the four per-wave seen anti-joins is worth more than its
        query-stage barriers cost."""
        if not self.cfg.wave_shuffle_advisory_bytes:
            return self._run_wave_inner()
        conf = self.spark.conf
        saved = {k: conf.get(k) for k in self._WAVE_AQE_KEYS}
        conf.set(self._WAVE_AQE_KEYS[0], "false")
        conf.set(
            self._WAVE_AQE_KEYS[1],
            str(self.cfg.wave_shuffle_advisory_bytes) + "b",
        )
        try:
            return self._run_wave_inner()
        finally:
            for k, v in saved.items():
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)

    def _run_wave_inner(self) -> dict:
        cfg, spark = self.cfg, self.spark
        t0 = time.time()
        wave = self.wave
        frontier = self.frontier
        visited = self.visited
        # NOTE (measured, guide §1.1): hinting the small visited side of
        # the anti-joins as an explicit broadcast was TRIED and was
        # SLOWER (per-join broadcast-build latency ~0.3 s × 4 joins/wave
        # — AQE already converts these tiny shuffled anti-joins to
        # broadcast with a local shuffle read, reusing one exchange).
        # The shuffled plan + AQE stays.

        fr = frontier.withColumn("full_url", self._full_url(F.col("raw_url")))
        if getattr(self, "_host_scores_df", None) is not None:
            # broadcast score-table join (host count too large for a
            # map literal): adds _host_score for the host_score priority
            fr = fr.withColumn("_h", K.url_host(F.col("full_url"))).join(
                F.broadcast(self._host_scores_df), F.col("_h") == F.col("_score_host"),
                "left",
            ).drop("_h", "_score_host")

        # frontier dequeue priority (north rule "priority queue"):
        # fifo = pure discovery order (reference parity); depth /
        # host_depth = BFS-strict variants. Within per-URL and per-host
        # window partitions host is constant, so (depth, order) there
        # is exactly the (host, depth, order) key.
        if cfg.frontier_priority in ("depth", "host_depth"):
            pri = [F.col("depth"), F.col("discovery_order")]
        else:
            pri = [F.col("discovery_order")]
        if cfg.frontier_priority == "host_depth":
            pri_cap = [F.col("host")] + pri
        elif cfg.frontier_priority == "host_score":
            # quality-driven dequeue: higher-scored hosts first under
            # wave caps. Small score sets ride as a map literal (no
            # join); web-scale host counts use the score-table join
            # installed by set_host_scores_df.
            if getattr(self, "_host_scores_df", None) is not None:
                score = F.coalesce(F.col("_host_score"), F.lit(0.0))
            elif cfg.host_scores:
                kv = [
                    F.lit(x)
                    for h, v in sorted(cfg.host_scores.items())
                    for x in (h, float(v))
                ]
                score = F.coalesce(
                    F.create_map(*kv)[F.col("host")], F.lit(0.0)
                )
            else:
                score = F.lit(0.0)
            pri_cap = [score.desc()] + pri
        else:
            pri_cap = pri

        # ---- dequeue-time checks (SiteCrawler.java:1029,1042-1047,1204-1224)
        from sitecrawler_spark.operators.seen import anti_join_seen

        ok = fr.filter(~K.is_excluded_static(F.col("full_url"), cfg))
        if getattr(self, "_blocked_hosts_df", None) is not None:
            # dynamic quality/spam host blocklist
            # (schedule_quality_blocklist): broadcast anti-join at
            # admission — the scale form of cfg.blocked for
            # host-cardinality blocklists
            ok = (
                ok.withColumn("_bh", K.url_host(F.col("full_url")))
                .join(
                    F.broadcast(self._blocked_hosts_df),
                    F.col("_bh") == F.col("_blocked_host"),
                    "left_anti",
                )
                .drop("_bh")
            )
        ok = anti_join_seen(ok, "full_url", visited, "s", self.seen)
        ok = ok.withColumn("url_clean", self._clean(F.col("full_url")))
        ok = anti_join_seen(ok, "url_clean", visited, "s", self.seen)
        # within-wave sequential-dequeue emulation: one keep-earliest
        # window on the CLEAN key alone. Equivalent to the former
        # two-step (earliest per exact url, then earliest per clean
        # form): rows sharing a full_url share a clean key, and the
        # min-by-pri row of a clean group is also the min of its own
        # full_url group — min of per-group minima = global min. Null
        # cleans get a per-full_url sentinel key, preserving the exact
        # per-url dedup for them. One exchange+sort per wave, not two.
        clean_key = F.coalesce(
            F.col("url_clean"), F.concat(F.lit("\x00"), F.col("full_url"))
        )
        w_clean = Window.partitionBy(clean_key).orderBy(*pri)
        ok = ok.withColumn("_rn", F.row_number().over(w_clean)).filter(
            F.col("_rn") == 1
        ).drop("_rn")

        # ---- politeness budget (target-only; north rule) ------------------
        ok = ok.withColumn("host", K.url_host(F.col("full_url")))
        # materialize the dequeue-check result once: politeness,
        # deferred-frontier derivation, and admission all reuse it.
        # Observations piggyback the per-wave scalar metrics on the
        # checkpoint actions themselves — no extra count()/collect()
        # jobs per wave (each was a full driver round-trip).
        obs_ok = Observation(f"e{id(self)}_w{wave}_ok")
        ok = ok.observe(obs_ok, F.count(F.lit(1)).alias("c"))
        ok = ok.localCheckpoint(eager=True)
        if cfg.politeness_budget > 0 or cfg.host_budgets:
            budget = cfg.politeness_budget
            # per-host override map (robots Crawl-delay analog) as a
            # pure map literal — no join, stays in codegen; cap NULL or
            # <= 0 means unlimited for that host
            if cfg.host_budgets:
                kv = [
                    F.lit(x)
                    for h, b in sorted(cfg.host_budgets.items())
                    for x in (h, b)
                ]
                override = F.create_map(*kv)[F.col("host")]
            else:
                override = F.lit(None).cast("int")
            cap = F.coalesce(
                override,
                F.lit(budget if budget > 0 else None).cast("int"),
            )

            def within(rn):
                return cap.isNull() | (cap <= 0) | (rn <= cap)

            pol = ok
            if cfg.host_salts > 1:
                # two-phase top-k for hot-host skew (north rule N4): rank
                # within (host, salt) first — a row ranked past the
                # budget inside its salt cannot make the host's global
                # top-budget — so the final per-host window sees at most
                # salts × budget rows per host instead of the host's
                # whole frontier slice
                salt = F.pmod(F.xxhash64("full_url"), F.lit(cfg.host_salts))
                w_hs = Window.partitionBy("host", salt).orderBy(*pri)
                pol = (
                    pol.withColumn("_srn", F.row_number().over(w_hs))
                    .filter(within(F.col("_srn")))
                    .drop("_srn")
                )
            w_host = Window.partitionBy("host").orderBy(*pri)
            pol = pol.withColumn("_hrn", F.row_number().over(w_host))
            fetch_set = pol.filter(within(F.col("_hrn"))).drop("_hrn")
        else:
            fetch_set = ok
        # shortCircuitAfter: stop after counter exceeds N
        # (SiteCrawler.java:1086: processes N+1 items total)
        if cfg.short_circuit_after != 0:
            remaining = cfg.short_circuit_after + 1 - self.visited_counter
            fetch_set = (
                fetch_set.orderBy(*pri_cap).limit(max(remaining, 0))
            )
        # explicit max_wave_size, else the threadLimit×ratio-derived
        # page-slot cap (config-bean parity, SiteCrawler.java:779)
        wave_cap = cfg.effective_max_wave_size()
        if wave_cap > 0:
            fetch_set = fetch_set.orderBy(*pri_cap).limit(wave_cap)
        if fetch_set is not ok:
            obs_fs = Observation(f"e{id(self)}_w{wave}_fs")
            fetch_set = fetch_set.observe(
                obs_fs, F.count(F.lit(1)).alias("c")
            ).localCheckpoint(eager=True)
            n_fetched = int(obs_fs.get["c"])
        else:
            # no cap narrowed the wave — ok is already checkpointed (a
            # second materialization of the identical frame is pure
            # waste) and its observed count IS the wave size
            n_fetched = int(obs_ok.get["c"])
        if n_fetched == 0:
            self.frontier = frontier.limit(0).localCheckpoint(eager=True)
            self._frontier_rows = 0
            return {"wave": wave, "fetched": 0, "admitted": 0, "stopped": True}

        # ---- visited insert BEFORE fetch (SiteCrawler.java:1042-1047) -----
        inserts = fetch_set.select(F.col("full_url").alias("s")).unionByName(
            fetch_set.filter(F.col("url_clean").isNotNull()).select(
                F.col("url_clean").alias("s")
            )
        )
        # duplicate rows are harmless to anti-joins, so no global distinct
        # — only the (small) per-wave insert set is deduped and
        # checkpointed; the union over parts stays lazy
        ins_part = inserts.distinct().localCheckpoint(eager=True)
        visited2 = visited.unionByName(ins_part)
        if self.seen is not None:
            self.seen.add_df(ins_part, "s")

        # ---- fetch (join against synthetic web; miss → 404) ---------------
        # the error count (metrics) and the transient-retry candidate
        # count both ride the ONE fetch checkpoint as observations —
        # previously a separate pages_out materialization + an isEmpty
        # probe job
        obs_p = Observation(f"e{id(self)}_w{wave}_pages")
        retry_pred = (
            F.col("error_code").isin(2000, 2001)
            & (F.col("retry_count") < cfg.max_retries)
        )
        pages = (
            self._fetch(fetch_set)
            .observe(
                obs_p,
                F.count(
                    F.when(F.col("error_code").isNotNull(), 1)
                ).alias("ne"),
                F.count(F.when(retry_pred, 1)).alias("nr"),
            )
            .localCheckpoint(eager=True)
        )

        # ---- outlinks + redirect targets ----------------------------------
        cand, links_out = self._extract_candidates(pages)

        # ---- admission (SiteCrawler.java:943-957) -------------------------
        # no-cap waves: a statically-EMPTY LocalRelation (not
        # frontier.limit(0), which Catalyst cannot prove empty) lets
        # PropagateEmptyRelation erase the deferred anti-join and the
        # deferred side of the frontier union from every wave plan
        deferred = frontier.join(
            fetch_set.select("discovery_order"), "discovery_order", "left_anti"
        ).join(ok.select("discovery_order"), "discovery_order", "semi") \
            if cfg.politeness_budget > 0 or cfg.host_budgets or wave_cap > 0 \
            or cfg.short_circuit_after != 0 \
            else spark.createDataFrame([], frontier.schema)

        if not getattr(self, "_discover_urls", True):
            cand = cand.limit(0)  # disableCrawling: drain without discovery
        adm = cand.filter(~K.is_excluded_static(F.col("href"), cfg))
        adm = anti_join_seen(adm, "href", visited2, "s", self.seen)
        adm = adm.withColumn("_clean", self._clean(F.col("href")))
        adm = anti_join_seen(adm, "_clean", visited2, "s", self.seen).drop("_clean")
        adm = adm.join(
            deferred.select(F.col("raw_url").alias("href")), "href", "left_anti"
        )
        w_href = Window.partitionBy("href").orderBy("parent_order", "link_pos")
        adm = adm.withColumn("_rn", F.row_number().over(w_href)).filter(
            F.col("_rn") == 1
        ).drop("_rn")
        # discovery_order continues monotonically from the global max,
        # carried in driver state since the last assignment (no per-wave
        # 1-row agg job)
        max_order = self._max_order
        adm = assign_global_order(
            adm, ["parent_order", "link_pos"], "discovery_order",
            start=max_order + 1, num_partitions=cfg.order_partitions,
        )
        admitted = adm.select(
            F.col("href").alias("raw_url"),
            "discovery_order",
            (F.col("parent_depth") + 1).alias("depth"),
            F.lit(0).alias("retry_count"),
        )

        new_frontier = deferred.unionByName(admitted)

        # ---- transient-retry re-admission (target-only; cuckoo delete) ----
        n_retried = 0
        if cfg.retry_transient and int(obs_p.get["nr"]) > 0:
            # candidate count observed on the fetch checkpoint — no
            # isEmpty probe job over the (checkpointed) pages
            n_retried = int(obs_p.get["nr"])
            retry = pages.filter(retry_pred).localCheckpoint(eager=True)
            # un-see: remove exact strings; cuckoo supports true
            # delete, bloom stays stale (exact backstop keeps
            # correctness, only prefilter selectivity degrades)
            rm = retry.select(F.col("full_url").alias("s")).unionByName(
                retry.select(self._clean(F.col("full_url")).alias("s"))
                .filter(F.col("s").isNotNull())
            )
            visited2 = visited2.join(rm, "s", "left_anti").localCheckpoint(
                eager=True
            )
            self._visited_parts = [visited2]
            ins_part = None  # already folded into the collapsed part
            from sitecrawler_spark.operators.seen import SparkCuckooFilter

            if isinstance(self.seen, SparkCuckooFilter):
                self.seen.delete_df(rm, "s")
            base_order = new_frontier.agg(
                F.coalesce(F.max("discovery_order"), F.lit(max_order))
            ).collect()[0][0]
            requeue = assign_global_order(
                retry.select(
                    F.col("full_url").alias("raw_url"),
                    F.col("discovery_order").alias("_old"),
                    "depth", "retry_count",
                ),
                ["_old"], "discovery_order", start=base_order + 1,
                num_partitions=cfg.order_partitions,
            ).select(
                "raw_url", "discovery_order", "depth",
                (F.col("retry_count") + 1).alias("retry_count"),
            )
            new_frontier = new_frontier.unionByName(requeue)

        # ---- commit -------------------------------------------------------
        # pages_out / links_part stay LAZY projections over the wave's
        # checkpointed frames (pages, raw) — each was previously a
        # second materialization job of data already pinned this wave
        pages_out = pages.select(
            "full_url", "host", F.lit(wave).alias("wave"), "discovery_order",
            "depth", "eff_status", "error_code", "spans",
        )
        links_part = links_out
        # the frontier checkpoint's observation does double duty:
        # frontier size (metrics) + running max discovery_order
        # (carried forward for the next wave) — previously a separate
        # 1-row agg job per wave
        obs_f = Observation(f"e{id(self)}_w{wave}_frontier")
        self.frontier = new_frontier.observe(
            obs_f,
            F.count(F.lit(1)).alias("c"),
            F.coalesce(
                F.max("discovery_order"), F.lit(self._max_order)
            ).alias("m"),
        ).localCheckpoint(eager=True)
        if ins_part is not None:
            self._visited_parts.append(ins_part)
            # bound the visited UNION plan width: at one part per wave a
            # 10^4-wave crawl builds a 10^4-child union whose ANALYSIS
            # cost alone grows linearly per wave (quadratic over the
            # crawl) — fold into one checkpointed part every
            # _VISITED_FOLD_PARTS waves (amortized O(|visited|/K) extra
            # materialization per wave; store-side parts are unaffected
            # and compact separately via compact_state)
            if len(self._visited_parts) > self._VISITED_FOLD_PARTS:
                self._visited_parts = [
                    self._union_parts(self._visited_parts).localCheckpoint(
                        eager=True
                    )
                ]
        # what the snapshot commit writes for `visited`: the wave's
        # delta normally; None = the retry path folded/deleted rows, so
        # this wave must REPLACE the table (Iceberg overwrite op)
        self._last_visited_delta = ins_part
        if getattr(self, "_recrawl_replace_visited", False):
            # a recrawl() un-saw URLs since the last commit — deletions
            # an APPEND delta cannot express; force one REPLACE commit
            self._last_visited_delta = None
            self._recrawl_replace_visited = False
        self._pages_parts.append(pages_out)
        self._links_parts.append(links_part)
        self.visited_counter += n_fetched
        row = obs_f.get
        n_admitted = int(row["c"])
        self._max_order = int(row["m"])
        # frontier size carried in driver state so crawl_progress needs
        # no count() job (the observation already measured it)
        self._frontier_rows = n_admitted
        wall = time.time() - t0
        n_errors = int(obs_p.get["ne"])
        metrics = {
            "wave": wave, "fetched": n_fetched, "errors": n_errors,
            "retried": n_retried,
            "admitted": n_admitted, "wall_ms": int(wall * 1000),
            "visited_total": self.visited_counter, "stopped": False,
        }
        self.metrics_rows.append(metrics)
        if self.store:
            self._commit_snapshot(metrics)
        self.wave += 1
        return metrics

    # -- fetch + process -----------------------------------------------------

    def _fetch(self, fetch_set: DataFrame) -> DataFrame:
        """Synthetic fetch: resolve wave URLs against the web table.
        Unknown URL → 404 (throw-on-bad-status path). Redirect-follow
        mode chases Location chains with bounded iterative joins.
        With no web table (web_df=None) the wave goes over real HTTP
        (crawl/fetcher.http_fetch_in_pandas)."""
        if self.web_df is None:
            return self._fetch_live(fetch_set)
        web = self.web_df.drop("host")
        if self.broadcast_web is not False:
            web = F.broadcast(web)
        j = fetch_set.join(web, fetch_set.full_url == web.url, "left").drop("url")
        j = j.withColumn("eff_status", F.coalesce(F.col("status"), F.lit(404)))
        if self.cfg.retry_transient:
            # synthetic transient failure: attempt #retry_count fails while
            # retry_count < transient_fails → SOCKET_EXCEPTION (2000)
            j = j.withColumn(
                "eff_status",
                F.when(
                    F.col("retry_count")
                    < F.coalesce(F.col("transient_fails"), F.lit(0)),
                    F.lit(2000),
                ).otherwise(F.col("eff_status")),
            )

        if not self.cfg.disable_redirects:
            # follow 301/302 chains (bounded cfg.max_redirect_hops;
            # cycle/overflow → 404 like the model's chain guard): resolve
            # Location against the CURRENT hop URL with the same urljoin
            # the model uses (crawl/model.py chases with
            # urljoin(cur["url"], Location) — a site-relative Location
            # after a cross-host hop must land on the NEW host, and
            # path-relative Locations resolve against the hop's path),
            # re-join, keep original full_url identity
            from sitecrawler_spark.crawl.fetcher import urljoin_udf

            j = j.withColumn("_cur", F.col("full_url"))
            for _hop in range(self.cfg.max_redirect_hops):
                # one job per hop: the live-redirect count rides an
                # Observation on a localCheckpoint action, so hop k's
                # emptiness check neither re-executes hops 1..k-1 (the
                # old isEmpty-on-the-growing-plan was O(hops²) work per
                # wave) nor issues a separate probe job
                obs = Observation(f"redir_{id(self)}_{self.wave}_{_hop}")
                j = j.observe(
                    obs,
                    F.count(
                        F.when(F.col("eff_status").isin(301, 302), 1)
                    ).alias("live"),
                ).localCheckpoint(eager=True)
                if int(obs.get["live"]) == 0:
                    break
                # PIN the redirect flag as a real column BEFORE any
                # update: a bare F.col("eff_status") expression re-resolves
                # against the REPLACED eff_status in later withColumns, so
                # the landing page's content/spans/empty flags were never
                # copied on the terminal hop (caught by the multi-hop
                # chain parity test)
                j = j.withColumn("_red", F.col("eff_status").isin(301, 302))
                red = F.col("_red")
                j = j.withColumn(
                    "_next",
                    F.when(
                        red,
                        urljoin_udf(F.col("_cur"), F.col("redirect_location")),
                    ),
                ).withColumn(
                    "_cur", F.when(red, F.col("_next")).otherwise(F.col("_cur"))
                )
                web2 = self.web_df.select(
                    F.col("url").alias("_next"),
                    F.col("status").alias("n_status"),
                    F.col("content_type").alias("n_ct"),
                    F.col("redirect_location").alias("n_redir"),
                    F.col("empty_body").alias("n_empty"),
                    F.col("spans").alias("n_spans"),
                    F.col("html").alias("n_html"),
                )
                j = (
                    j.join(F.broadcast(web2), "_next", "left")
                    .withColumn(
                        "eff_status",
                        F.when(red, F.coalesce(F.col("n_status"), F.lit(404)))
                        .otherwise(F.col("eff_status")),
                    )
                    .withColumn(
                        "content_type",
                        F.when(red, F.col("n_ct")).otherwise(F.col("content_type")),
                    )
                    .withColumn(
                        "redirect_location",
                        F.when(red, F.col("n_redir")).otherwise(
                            F.col("redirect_location")
                        ),
                    )
                    .withColumn(
                        "empty_body",
                        F.when(red, F.col("n_empty")).otherwise(F.col("empty_body")),
                    )
                    .withColumn(
                        "spans", F.when(red, F.col("n_spans")).otherwise(F.col("spans"))
                    )
                    .withColumn(
                        "html", F.when(red, F.col("n_html")).otherwise(F.col("html"))
                    )
                    .drop("_next", "_red", "n_status", "n_ct", "n_redir",
                          "n_empty", "n_spans", "n_html")
                )
            # unresolved after the hop budget (cycle or long chain) → 404
            j = j.withColumn(
                "eff_status",
                F.when(
                    F.col("eff_status").isin(301, 302), F.lit(404)
                ).otherwise(F.col("eff_status")),
            )

        spans_col = (
            parse_html_udf(F.col("html")) if self.use_html else F.col("spans")
        )
        is_redirect_err = F.col("eff_status").isin(301, 302) & F.lit(
            self.cfg.disable_redirects
        )
        is_error = (F.col("eff_status") >= 400) | is_redirect_err
        is_gone = ~is_error & F.coalesce(F.col("empty_body"), F.lit(False))
        is_nonhtml = (
            ~is_error & ~is_gone
            & ~F.coalesce(F.col("content_type"), F.lit("")).startswith("text/html")
        )
        is_success = ~is_error & ~is_gone & ~is_nonhtml
        return j.select(
            "full_url", "host", "discovery_order", "depth", "retry_count",
            "eff_status", "redirect_location",
            F.when(is_error, F.col("eff_status"))
            .when(is_gone, F.lit(410))
            .alias("error_code"),
            F.when(is_success, spans_col).alias("spans"),
            is_redirect_err.alias("is_redirect_err"),
        )

    def _fetch_live(self, fetch_set: DataFrame) -> DataFrame:
        """Real-HTTP fetch (crawl/fetcher.http_fetch_in_pandas) mapped to
        the same output contract as the synthetic join — the rest of the
        wave (extract/admit/retry) is fetch-strategy-agnostic."""
        from sitecrawler_spark.crawl.fetcher import http_fetch_in_pandas

        cfg = self.cfg
        raw = http_fetch_in_pandas(
            fetch_set.select(
                "full_url", "host", "discovery_order", "depth", "retry_count"
            ),
            n_salts=cfg.fetch_salts,
            timeout_s=cfg.fetch_timeout_s,
            max_retries=cfg.max_retries,
            backoff_base_s=cfg.backoff_base_ms / 1000.0,
            user_agent=cfg.user_agent,
            cookies=cfg.cookies,
            proxy=cfg.proxy,
            insecure_ssl=cfg.insecure_ssl,
            follow_redirects=not cfg.disable_redirects,
            max_redirect_hops=cfg.max_redirect_hops,
            cache_size=cfg.http_cache_size,
        )
        return self._classify_live(raw)

    def _classify_live(self, raw: DataFrame) -> DataFrame:
        """Degenerate-page + exception dispatch (ProcessPage.java:160-193,
        307-329) over live-fetch rows. Separated from the HTTP stage so
        the full SiteCrawlerErrorCodes taxonomy — including 1000/1001,
        which a healthy client never produces — is unit-testable."""
        cfg = self.cfg
        eff = F.coalesce(F.col("status"), F.col("err_code"))
        if not cfg.disable_redirects:
            # follow mode: a residual 3xx means the client hit its hop cap
            # or a redirect loop — the model 404s these chains
            eff = F.when(F.col("status").isin(301, 302), F.lit(404)).otherwise(eff)
        # nothing known at all ⇒ null Page object (ProcessPage.java:160-164)
        j = raw.withColumn("eff_status", F.coalesce(eff, F.lit(1000)))
        is_redirect_err = F.col("eff_status").isin(301, 302) & F.lit(
            cfg.disable_redirects
        )
        is_excep = F.col("err_code").isNotNull()
        is_error = (F.col("eff_status") >= 400) | is_redirect_err | is_excep
        is_gone = ~is_error & (F.coalesce(F.col("body"), F.lit("")) == "")
        is_nonhtml = (
            ~is_error & ~is_gone
            & ~F.coalesce(F.col("content_type"), F.lit("")).startswith("text/html")
        )
        is_success = ~is_error & ~is_gone & ~is_nonhtml
        return j.select(
            "full_url", "host", "discovery_order", "depth", "retry_count",
            "eff_status", "redirect_location",
            F.when(is_excep, F.col("err_code"))
            .when(is_error, F.col("eff_status"))
            .when(is_gone, F.lit(410))
            .alias("error_code"),
            F.when(is_success, parse_html_udf(F.col("body"))).alias("spans"),
            is_redirect_err.alias("is_redirect_err"),
        )

    def _extract_candidates(self, pages: DataFrame):
        """ProcessPage link pipeline (ProcessPage.java:203-267) + redirect
        targets (:368-379). Returns (candidates, links_out)."""
        cfg = self.cfg
        success = pages.filter(F.col("spans").isNotNull()).select(
            F.col("full_url"), F.col("discovery_order").alias("parent_order"),
            F.col("depth").alias("parent_depth"), "spans",
        )
        raw = explode_outlinks(success, "spans")
        raw = raw.filter(F.col("raw_href") != "")  # isEmpty skip (:222-224)

        base, sec = cfg.base_url, cfg.base_url_secure
        # Arrow UDFs (north-star canonicalize path). Also a deliberate
        # codegen barrier: with the native expression, predicate pushdown
        # inlines the whole normalize tree into every admission-filter
        # term, blowing past Janino's 64KB method limit.
        from sitecrawler_spark.kernel.udfs import make_normalize_udf

        n_base = make_normalize_udf(base)(F.col("raw_href"))
        if sec is not None:
            n_sec = make_normalize_udf(sec)(F.col("raw_href"))
            href = F.when(F.col("full_url").startswith(sec), n_sec).otherwise(n_base)
        else:
            href = n_base
        raw = raw.withColumn("href", href)
        if cfg.make_relative_url_absolute:
            from sitecrawler_spark.crawl.fetcher import urljoin_udf

            need = (
                ~F.col("href").startswith("http") & ~F.col("href").contains("://")
            )
            if sec is not None:
                need = need & ~F.col("full_url").startswith(sec)
            raw = raw.withColumn(
                "href",
                F.when(need, urljoin_udf(F.col("full_url"), F.col("href"))).otherwise(
                    F.col("href")
                ),
            )
        if cfg.ignore_query_params:
            raw = raw.withColumn("href", F.substring_index(F.col("href"), "?", 1))

        # per-page dedup keep-first (:252-255)
        w_page = Window.partitionBy("full_url", "href").orderBy("link_pos")
        raw = raw.withColumn("_rn", F.row_number().over(w_page)).filter(
            F.col("_rn") == 1
        ).drop("_rn")
        # materialize ONCE: both consumers (links commit + admission
        # chain) would otherwise re-run the explode + normalize/urljoin
        # UDFs + dedup window — the wave's heaviest parse work — twice
        raw = raw.localCheckpoint(eager=True)

        links_out = raw.select(
            F.col("full_url").alias("src"), F.col("href").alias("dst"),
            F.lit("link").alias("kind"), F.lit(self.wave).alias("wave"),
        )

        cand = raw.select("href", "parent_order", "parent_depth", "link_pos")

        # redirect targets (disable_redirects mode): Location normalized
        # against baseUrl — NOT baseUrlSecure (ProcessPage.java:369)
        red = pages.filter(
            F.col("is_redirect_err") & F.col("redirect_location").isNotNull()
        ).select(
            K.normalize2(F.col("redirect_location"), cfg.base_url).alias("href"),
            F.col("discovery_order").alias("parent_order"),
            F.col("depth").alias("parent_depth"),
            F.lit(-1).cast("long").alias("link_pos"),
        )
        # redirect edges union into links for the referrer graph
        # (ProcessPage.java:373-376)
        pages_red = pages.filter(F.col("is_redirect_err")).select(
            F.col("full_url").alias("src"),
            K.normalize2(F.col("redirect_location"), cfg.base_url).alias("dst"),
            F.lit("redirect").alias("kind"), F.lit(self.wave).alias("wave"),
        )
        return cand.unionByName(red), links_out.unionByName(pages_red)

    # -- crawl loop ----------------------------------------------------------

    def crawl(
        self, seed_paths: list[str] | None = None, max_waves: int = 1000,
        crawl_id: str | None = None,
    ) -> dict:
        if self.frontier is None:
            self.seed(seed_paths)
        self._paused = getattr(self, "_paused", False)
        self._discover_urls = getattr(self, "_discover_urls", True)
        last_logged = 0
        for _ in range(max_waves):
            if self._paused:  # forcePause (SiteCrawler.java:1094)
                break
            if not self._discover_urls and (
                self.frontier is None or self.frontier.isEmpty()
            ):
                break
            if self.cfg.short_circuit_after != 0 and (
                self.visited_counter > self.cfg.short_circuit_after
            ):
                break
            if crawl_id:  # crawl-id tagging (≙ MDC/thread naming, O-C8)
                self.spark.sparkContext.setJobGroup(
                    crawl_id, f"crawl {crawl_id} wave {self.wave}"
                )
            m = self.run_wave()
            # progress log cadence (every reportProgressPerDownloadedPages,
            # SiteCrawler.java:176,1105-1112 — default 2000)
            if self.visited_counter - last_logged >= 2000:
                print(self.crawl_progress_string())
                last_logged = self.visited_counter
            # "admitted" is the post-wave frontier size — 0 means done
            if m.get("stopped") or m["admitted"] == 0:
                break
        return {
            "waves": self.wave,
            "visited_total": self.visited_counter,
            "metrics": self.metrics_rows,
        }

    # -- results -------------------------------------------------------------

    def visit_order_df(self) -> DataFrame:
        """Realized fetch order: (wave, discovery_order). Without
        politeness/wave caps this equals discovery_order — the
        single-consumer FIFO order (SURVEY.md §3.4)."""
        if self.pages is None:  # crawl never fetched anything
            return self.spark.createDataFrame(
                [],
                "full_url string, wave int, discovery_order long, "
                "eff_status int, error_code int",
            )
        return self.pages.orderBy("wave", "discovery_order").select(
            "full_url", "wave", "discovery_order", "eff_status", "error_code"
        )

    def visited_df(self) -> DataFrame:
        return self.visited

    # -- lifecycle & progress (O-C2/C5/C8/C9, O-S10) --------------------------

    def pause(self) -> None:
        """forcePause analog (SiteCrawler.java:265,398-407): stop
        scheduling further waves; in-flight wave finishes."""
        self._paused = True

    def unpause(self) -> None:
        self._paused = False

    def disable_crawling(self) -> None:
        """disableCrawling (SiteCrawler.java:496-498): drain the queue
        without discovering new URLs — remaining waves run with outlink
        enqueue disabled."""
        self._discover_urls = False

    def pool_accounting(self) -> dict:
        """WebClientPool take/return/recycle accounting analog
        (WebClientPool.java:68,71-73,272-282). The wave model is a
        barrier: every fetch slot taken inside a wave is returned before
        the wave commits, so unaccountedFor is structurally 0 at every
        wave boundary (the reference's leak detector exists because its
        pool outlives any one page); recycles map to transient-retry
        re-admissions (client recycled per WebClientPool.java:236-247)."""
        total_retried = sum(m.get("retried", 0) for m in self.metrics_rows)
        return {
            "take": self.visited_counter,
            "return": self.visited_counter,
            "recycle": total_retried,
            "unaccounted_for": 0,
        }

    def crawl_progress(self) -> dict:
        """CrawlProgress parity (SiteCrawler.java:725-736;
        beans/CrawlProgress.java:10-34). Wave-model mapping: nothing sits
        in download/processing limbo between waves, so scheduled counts
        are 0 at wave boundaries; leftToCrawl = frontier size."""
        left = getattr(self, "_frontier_rows", None)
        if left is None:
            left = self.frontier.count() if self.frontier is not None else 0
        fully = self.visited_counter
        denom = fully + left
        complete = round(fully / denom * 10000) / 100.0 if denom else 100.0
        return {
            "crawled": self.visited_counter,
            "left_to_crawl": left,
            "scheduled_for_download": 0,
            "scheduled_for_processing": 0,
            "fully_processed": fully,
            "complete": complete,
        }

    def crawl_progress_string(self) -> str:
        """getCrawlProgress format (SiteCrawler.java:708-718)."""
        p = self.crawl_progress()
        return (
            f"{p['crawled']} crawled. {p['left_to_crawl']} left to crawl. "
            f"{p['scheduled_for_download']} scheduled for download. "
            f"{p['scheduled_for_processing']} scheduled for processing. "
            f"{p['fully_processed']} fully processed. "
            f"{p['complete']}% complete."
        )

    # -- plugin surface (O-S8/S9) -------------------------------------------

    def apply_actions(self, actions) -> tuple:
        """Run registered plugin actions over all crawled pages
        (crawl/plugins.py). Returns (success_df, error_df)."""
        from sitecrawler_spark.crawl.plugins import apply_actions

        return apply_actions(self.pages, self.links, actions)

    # -- checkpointing -------------------------------------------------------

    def _commit_snapshot(self, metrics: dict) -> None:
        import pandas as pd

        wave_pages = self._pages_parts[-1]
        wave_links = self._links_parts[-1]
        # per-partition lineage (north star): fetch/parse/error counts per
        # host bucket per wave, alongside the wave-level row (bucket=-1)
        bucket = F.pmod(F.xxhash64("host"), F.lit(self.cfg.host_buckets)).cast(
            "int"
        )
        per_part = (
            wave_pages.groupBy(bucket.alias("bucket"))
            .agg(
                F.count("*").alias("fetched"),
                F.count("error_code").alias("errors"),
                F.count("spans").alias("parsed"),
            )
            .withColumn("wave", F.lit(metrics["wave"]))
            .select("wave", "bucket", "fetched", "errors", "parsed")
        )
        wave_row = self.spark.createDataFrame(
            pd.DataFrame(
                [
                    {
                        "wave": metrics["wave"],
                        "bucket": -1,
                        "fetched": metrics["fetched"],
                        "errors": metrics["errors"],
                        "parsed": metrics["fetched"] - metrics["errors"],
                    }
                ]
            )
        ).select(
            F.col("wave").cast("int"), F.col("bucket").cast("int"),
            F.col("fetched").cast("long"), F.col("errors").cast("long"),
            F.col("parsed").cast("long"),
        )
        mdf = per_part.select(
            F.col("wave").cast("int"), F.col("bucket").cast("int"),
            F.col("fetched").cast("long"), F.col("errors").cast("long"),
            F.col("parsed").cast("long"),
        ).unionByName(wave_row)
        delta = getattr(self, "_last_visited_delta", None)
        # snapshot ids allocate monotonically from the store, NOT from
        # self.wave: a compaction publishes manifests above the wave
        # counter, and a wave-numbered commit after it would land below
        # the compaction manifest — invisible to latest(), dropped on
        # resume (ADVICE r03). The wave number lives in meta only.
        sid = self.store.next_snapshot_id()
        self.store.commit(
            sid,
            {
                "frontier": self.frontier,
                "visited": self.visited if delta is None else delta,
                "pages": wave_pages,
                "links": wave_links,
                "metrics": mdf,
            },
            replace=(set() if delta is not None else {"visited"}),
            meta={
                "wave": self.wave,
                "visited_counter": self.visited_counter,
                "config": {"short_circuit_after": self.cfg.short_circuit_after},
            },
            repartition={
                "frontier": [F.pmod(F.xxhash64("raw_url"), F.lit(self.cfg.host_buckets))],
                "visited": [F.pmod(F.xxhash64("s"), F.lit(self.cfg.host_buckets))],
            },
            # deltas chain off the snapshot this engine last saw — after
            # a time-travel resume that is the OLDER manifest, not
            # latest() (rollback-and-continue semantics)
            base_snapshot_id=self._snap_base,
        )
        self._snap_base = sid

    def set_host_scores_df(self, scores: DataFrame | None) -> None:
        """Install a (host, rank) score TABLE for
        frontier_priority="host_score" — the web-scale alternative to
        cfg.host_scores (a map literal cannot hold 10^7 hosts; a
        broadcast — or at extreme cardinality, shuffled — join can).
        Typically fed from operators.graph.host_pagerank of a prior
        crawl's links table. Pass None to clear."""
        if scores is None:
            self._host_scores_df = None
            return
        self._host_scores_df = scores.select(
            F.col("host").alias("_score_host"),
            F.col("rank").cast("double").alias("_host_score"),
        ).localCheckpoint(eager=True)

    def recrawl(self, urls: DataFrame | None = None) -> int:
        """Open a new fetch EPOCH: un-see previously-crawled URLs and
        re-enqueue them, so the wave loop fetches them again and the
        pages APPEND log accumulates one observation per epoch (the
        fetch history crawl/recrawl.py estimates change rates from).
        ``urls`` narrows the epoch to a (full_url) selection — e.g.
        only hosts above a λ̂ threshold; None re-crawls everything.

        Un-seeing reuses the transient-retry re-admission pattern
        (run_wave's cuckoo-delete block): exact visited rows for both
        the url and its clean form are anti-joined away; a cuckoo seen
        filter gets true deletes, a bloom stays stale (prefilter
        positives only cost selectivity — anti_join_seen keeps
        exact-set semantics). Re-enqueue order preserves each URL's
        original discovery order, so FIFO parity holds within the
        epoch. Returns the number of URLs re-enqueued."""
        pages = self.pages
        if pages is None:
            raise RuntimeError("recrawl: nothing crawled yet")
        targets = (
            urls.select("full_url") if urls is not None
            else pages.select("full_url")
        ).distinct()
        rm = targets.select(F.col("full_url").alias("s")).unionByName(
            targets.select(self._clean(F.col("full_url")).alias("s"))
            .filter(F.col("s").isNotNull())
        )
        visited2 = self.visited.join(rm, "s", "left_anti").localCheckpoint(
            eager=True
        )
        self._visited_parts = [visited2]
        # the next wave's snapshot must REPLACE the visited table: an
        # APPEND delta cannot express the deletions, and a resume from
        # a delta-only commit would still see the un-seen URLs
        self._recrawl_replace_visited = True
        from sitecrawler_spark.operators.seen import SparkCuckooFilter

        if isinstance(self.seen, SparkCuckooFilter):
            self.seen.delete_df(rm, "s")
        old = pages.groupBy("full_url").agg(
            F.min("discovery_order").alias("_old")
        )
        req = targets.join(old, "full_url", "left").select(
            F.col("full_url").alias("raw_url"),
            F.coalesce(F.col("_old"), F.lit(2 ** 62)).alias("_old"),
        )
        obs_rq = Observation(f"e{id(self)}_recrawl_rq_{self.wave}")
        requeue = assign_global_order(
            req, ["_old", "raw_url"], "discovery_order",
            start=self._max_order + 1,
            num_partitions=self.cfg.order_partitions,
        ).select(
            "raw_url", "discovery_order",
            F.lit(0).cast("int").alias("depth"),
            F.lit(0).cast("int").alias("retry_count"),
        ).observe(obs_rq, F.count(F.lit(1)).alias("c"))
        fr = (
            self.frontier if self.frontier is not None
            else self.spark.createDataFrame([], FRONTIER_SCHEMA)
        )
        # both observations ride the ONE checkpoint action
        obs_fr = Observation(f"e{id(self)}_recrawl_fr_{self.wave}")
        self.frontier = (
            fr.unionByName(requeue)
            .observe(
                obs_fr,
                F.coalesce(
                    F.max("discovery_order"), F.lit(self._max_order)
                ).alias("m"),
            )
            .localCheckpoint(eager=True)
        )
        self._frontier_rows = None
        self._max_order = int(obs_fr.get["m"])
        return int(obs_rq.get["c"])

    def schedule_recrawl(self, min_fetches: int = 2) -> DataFrame:
        """Closed crawl → estimate → re-crawl loop (Cho &
        Garcia-Molina 2003), the change-rate analog of feeding
        operators.graph.host_opic into set_host_scores_df: per-host
        mean λ̂ over the pages fetch log installs as the host_score
        dequeue priority, so the next recrawl() epoch fetches
        fast-changing hosts first under wave caps
        (frontier_priority="host_score"). Returns the (host, rank)
        score table it installed."""
        from sitecrawler_spark.crawl.recrawl import host_change_rates

        pages = self.pages
        if pages is None:
            raise RuntimeError("schedule_recrawl: nothing crawled yet")
        scores = host_change_rates(pages, min_fetches=min_fetches)
        self.set_host_scores_df(scores)
        return scores

    def schedule_trustrank(
        self, seed_hosts, n_iters: int = 5
    ) -> DataFrame:
        """Closed crawl → rank → re-crawl loop, anti-spam edition
        (Gyöngyi 2004): host-level TrustRank over THIS crawl's links
        table, teleporting only to ``seed_hosts`` (an iterable of host
        strings, or a 1-column DataFrame for web-scale seed sets),
        installed as the host_score dequeue priority. Hosts with no
        inlink path from a trusted seed score exactly 0, so under
        frontier_priority="host_score" the next recrawl() epoch
        fetches the trusted neighborhood before spam farms — the
        TrustRank analog of schedule_recrawl's change-rate loop.
        Returns the (host, rank) score table it installed."""
        from sitecrawler_spark.operators.graph import host_trustrank

        links = self.links
        if links is None:
            raise RuntimeError("schedule_trustrank: nothing crawled yet")
        if isinstance(seed_hosts, DataFrame):
            seeds = seed_hosts
        else:
            seeds = self.spark.createDataFrame(
                [(h,) for h in seed_hosts], "host string"
            )
        scores = host_trustrank(links, seeds, n_iters=n_iters)
        self.set_host_scores_df(scores)
        return scores

    def set_blocked_hosts_df(self, hosts: DataFrame | None) -> None:
        """Install a dynamic host blocklist applied at dequeue
        admission as a broadcast anti-join — the web-scale alternative
        to cfg.blocked substrings (a static pattern list cannot hold
        10^6 quality-derived domains; an anti-join can; at extreme
        cardinality Spark falls back to a shuffled anti-join on the
        same plan). Pass None to clear."""
        if hosts is None:
            self._blocked_hosts_df = None
            return
        self._blocked_hosts_df = hosts.select(
            F.col("host").alias("_blocked_host")
        ).distinct()

    def derive_quality_blocklist(
        self, min_docs: int = 2, frac_num: int = 4, frac_den: int = 5
    ) -> DataFrame:
        """FineWeb-style domain-level quality filter over THIS crawl:
        per-host mean page quality (textops.quality_score over each
        page's text spans) in integer micro-units; a host is blocked
        when it has >= min_docs fetched pages and its mean falls below
        frac_num/frac_den of the crawl-wide mean — the comparison is an
        all-integer cross-multiply, so the cut is exact at any scale.
        Plan: one host-keyed partial agg + a broadcast crossJoin of the
        1-row crawl total. Returns a 1-column (host) DataFrame. The
        same rule at document grain is the driver-gated
        q_domain_blocklist."""
        from sitecrawler_spark.textops import functions as TX

        pages = self.pages
        if pages is None:
            raise RuntimeError("derive_quality_blocklist: nothing crawled")
        text = F.concat_ws(
            " ",
            F.transform(
                F.filter("spans", lambda s: s["kind"] == "text"),
                lambda s: s["text"],
            ),
        )
        q = pages.filter(F.col("spans").isNotNull()).select(
            "host",
            F.round(TX.quality_score(text) * 10000).cast("long").alias("qm"),
        )
        per = q.groupBy("host").agg(
            F.count("*").alias("n"), F.sum("qm").alias("s")
        )
        tot = q.agg(F.count("*").alias("_tn"), F.sum("qm").alias("_tq"))
        return (
            per.crossJoin(F.broadcast(tot))
            .filter(
                (F.col("n") >= min_docs)
                & (
                    F.col("s") * F.col("_tn") * frac_den
                    < F.col("_tq") * F.col("n") * frac_num
                )
            )
            .select("host")
        )

    def schedule_quality_blocklist(
        self, min_docs: int = 2, frac_num: int = 4, frac_den: int = 5
    ) -> DataFrame:
        """Closed crawl → score → re-crawl loop, quality edition
        (the domain-blocklist analog of schedule_trustrank): derive the
        low-quality host blocklist from this crawl's pages and install
        it so subsequent waves / recrawl() epochs never admit those
        hosts at dequeue (test_quality_blocklist_closed_loop). Returns
        the blocklist it installed."""
        bl = self.derive_quality_blocklist(
            min_docs, frac_num, frac_den
        ).localCheckpoint(eager=True)
        self.set_blocked_hosts_df(bl)
        return bl

    def diff_crawl_snapshots(
        self, old_snapshot_id: int, new_snapshot_id: int
    ) -> DataFrame:
        """What changed on the web between two crawl snapshots: per
        full_url, classify added / removed / changed / unchanged across
        the two time-travel reads of the ``pages`` table (the Iceberg
        changelog analog — tableio.diff_snapshots). A URL re-fetched
        across epochs has several page rows; each side keeps its LATEST
        observation per URL (max_by over (wave, discovery_order) — one
        partial agg, map-side combined) and compares an 8-byte xxhash64
        of the canonical span JSON, so the diff join never carries
        span payloads."""
        if self.store is None:
            raise RuntimeError("diff_crawl_snapshots: no state_dir")

        def latest_fp(df: DataFrame) -> DataFrame:
            fp = F.xxhash64(F.to_json(F.col("spans")))
            return (
                df.filter(F.col("spans").isNotNull())
                .groupBy("full_url")
                .agg(
                    F.max_by(
                        fp, F.struct("wave", "discovery_order")
                    ).alias("fp")
                )
            )

        # same classify step as tableio.diff_snapshots, inlined because
        # the fingerprint is derived (pages stores spans, not an fp
        # column) and each side must reduce to latest-per-url first
        old = latest_fp(
            self.store.read(self.spark, "pages", snapshot_id=old_snapshot_id)
        )
        new = latest_fp(
            self.store.read(self.spark, "pages", snapshot_id=new_snapshot_id)
        )
        j = old.withColumnRenamed("fp", "_fp_old").join(
            new.withColumnRenamed("fp", "_fp_new"), "full_url", "full_outer"
        )
        status = (
            F.when(F.col("_fp_old").isNull(), F.lit("added"))
            .when(F.col("_fp_new").isNull(), F.lit("removed"))
            .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
        )
        return j.select("full_url", status.alias("status"))

    def export_warc(self, out_dir: str) -> None:
        """Archive the crawl's fetched pages as WARC response records
        (sources/warc.py): WARC-Target-URI = full_url, HTTP status =
        eff_status, payload = the canonical span-array JSON (the
        engine's parsed page representation — the PageCrawl analog;
        span order is the parse contract, so the archive round-trips
        to the exact crawl output). Record ids are deterministic, so
        re-exporting an identical crawl yields a byte-identical
        archive. Runs fully distributed: one .warc file per partition,
        no driver collect."""
        from sitecrawler_spark.sources.warc import write_warc

        pages = self.pages
        if pages is None:
            raise RuntimeError("export_warc: no crawl output to archive")
        df = pages.select(
            "full_url",
            F.coalesce(F.col("eff_status"), F.lit(0)).alias("status"),
            F.coalesce(F.to_json("spans"), F.lit("[]")).alias("content"),
        )
        write_warc(df, out_dir, url_col="full_url",
                   content_col="content", status_col="status")

    def export_training_corpus(self, **kw) -> "DataFrame":
        """Crawl → pretraining corpus (corpus.training_corpus): the
        fetched span pages become (doc_id, host, lines) — doc_id is the
        page's rank among spans-bearing pages in realized visit order
        (the same (wave, discovery_order) ordering visit_order_df
        exposes, so the reference model reproduces the ids exactly),
        lines are the text-span texts in span order — then boilerplate
        strip → quality/lang gate → exact+minhash dedup →
        decontamination → sequence packing. Keyword args pass through
        to corpus.training_corpus."""
        from sitecrawler_spark.corpus import training_corpus

        pages = self.pages
        if pages is None:
            raise RuntimeError("export_training_corpus: nothing crawled")
        # ranged two-pass global rank (operators/ordering.py) — a plain
        # row_number() OVER (ORDER BY …) would collapse a 10^10-page
        # crawl onto one partition
        docs = (
            assign_global_order(
                pages.filter(F.col("spans").isNotNull()),
                ["wave", "discovery_order"],
                out_col="doc_id",
                start=1,
            )
            .select(
                "doc_id",
                "host",
                F.transform(
                    F.filter("spans", lambda s: s["kind"] == "text"),
                    lambda s: s["text"],
                ).alias("lines"),
            )
        )
        return training_corpus(docs, **kw)

    def compact_state(self, max_parts: int = 1) -> list[str]:
        """Maintenance compaction of the APPEND state tables (pages /
        links / metrics): rewrite accumulated per-wave part dirs into
        ``max_parts`` consolidated parts (Iceberg rewrite_data_files
        analog — run between crawls, like Iceberg's maintenance
        procedures). Returns the table names compacted. Readers only
        ever see the atomic manifest publish; prior snapshots stay
        valid until expire_snapshots."""
        if self.store is None:
            return []
        m = self.store.latest()
        if not m:
            return []
        sid = m["snapshot"] + 1
        done = []
        for name in ("pages", "links", "metrics", "visited"):
            r = self.store.compact(self.spark, name, sid, max_parts=max_parts)
            if r is not None:
                done.append(name)
                self._snap_base = sid  # later waves chain off the rewrite
                sid += 1
        return done

    def resume(self, snapshot_id: int | None = None) -> None:
        """Resume from the latest snapshot (hardPause/reset analog,
        SiteCrawler.java:412-430) — or TIME-TRAVEL to an older
        ``snapshot_id`` and continue from exactly the state that
        manifest published (Iceberg rollback: subsequent commits chain
        off the resumed snapshot, not off the newer manifests rolled
        away from)."""
        m = (
            self.store.manifest(snapshot_id)
            if snapshot_id is not None
            else self.store.latest()
        )
        if m is None:
            raise ValueError("no snapshot to resume from")
        sid = m["snapshot"]
        self._snap_base = sid
        self.frontier = self.store.read(self.spark, "frontier", snapshot_id=sid)
        self._frontier_rows = None
        self._visited_parts = [
            self.store.read(self.spark, "visited", snapshot_id=sid)
        ]
        pages = self.store.read(self.spark, "pages", snapshot_id=sid)
        links = self.store.read(self.spark, "links", snapshot_id=sid)
        self._pages_parts = [pages] if pages is not None else []
        self._links_parts = [links] if links is not None else []
        self.wave = m["meta"]["wave"] + 1
        self.visited_counter = m["meta"]["visited_counter"]
        self._max_order = int(
            self.frontier.agg(
                F.coalesce(F.max("discovery_order"), F.lit(0))
            ).collect()[0][0]
        )
        # rebuild the approximate seen-filter from the authoritative
        # visited table (filters are derived state, not checkpointed)
        if self.cfg.seen_filter == "bloom":
            self.seen = self._make_bloom()
            self.seen.add_df(self.visited, "s")
        elif self.cfg.seen_filter == "cuckoo":
            self.seen = self._make_cuckoo()
            # distributed bulk build: placement happens in executors and
            # only the packed table transits the driver — NOT 16 B/key of
            # (fp, i1) rows for the whole visited history (VERDICT r02 #3);
            # with cuckoo_max_hot_shards set the packed fill LRU-spills,
            # bounding even the coordinator copy (VERDICT r03 #2)
            self.seen.build_df(self.visited, "s")
