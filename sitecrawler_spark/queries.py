"""Driver-contract queries: one per operator family (SURVEY.md §2).

Each function takes (spark, sf_dir) and returns a DataFrame whose
columns/aliases match the DuckDB oracle SQL in ``oracles.py`` exactly
(the driver hash-compares values column-name-sorted).

The crawl-kernel queries run over a URL corpus derived DETERMINISTICALLY
from the driver's ``documents`` table (same derivation SQL in both
engines), then apply the engine's native operators — so the oracle is a
genuinely independent SQL re-implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sitecrawler_spark.config import CrawlerConfig
from sitecrawler_spark.kernel import urls_spark as K
from sitecrawler_spark.operators.graph import referrer_sets

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Deterministic URL corpus derivation — VALID IN BOTH Spark SQL and
# DuckDB; keep dialect-neutral (concat, CASE, %, no casts).
URLS_SQL = """
SELECT doc_id, lang, source, text,
  concat(
    CASE WHEN doc_id % 11 = 0 THEN 'https://external.example.org'
         WHEN doc_id % 2 = 0 THEN 'https://www.salesforce.com'
         ELSE 'http://www.salesforce.com' END,
    CASE WHEN doc_id % 13 = 0 THEN '/logout' ELSE '' END,
    '/', source, '/doc', doc_id,
    CASE doc_id % 5 WHEN 0 THEN '.html' WHEN 1 THEN '/' WHEN 2 THEN '.jsp'
         WHEN 3 THEN '.php' ELSE '.htm' END,
    CASE WHEN doc_id % 7 = 0 THEN concat('?a=', doc_id % 3, '&c=d&e=f')
         WHEN doc_id % 7 = 1 THEN '?x=1' ELSE '' END
  ) AS url
FROM documents
"""

# href corpus for the normalize kernel — covers every branch of
# URLNormalizer.java:49-60 reachable through the 2-arg path
HREFS_SQL = """
SELECT doc_id,
  CASE doc_id % 8
    WHEN 0 THEN concat('/', source, '/doc', doc_id, '.html')
    WHEN 1 THEN concat('  /pad/doc', doc_id, '.html  ')
    WHEN 2 THEN concat('http://www.salesforce.com/', source, '/abs', doc_id, '.htm')
    WHEN 3 THEN concat('/', source, '/index.jsp')
    WHEN 4 THEN concat('//cdn.example.org/w', doc_id, '.html')
    WHEN 5 THEN 'mailto:x@y.com'
    WHEN 6 THEN concat('rel/doc', doc_id, '.html')
    ELSE concat('/q', doc_id, '/index.jsp/x/index.jsp')
  END AS href
FROM documents
"""

CFG = CrawlerConfig(
    base_url="http://www.salesforce.com",
    base_url_secure="https://www.salesforce.com",
    blocked=["/logout"],
)
ALLOWED_PARAMS = ["a"]
NORM_BASE = "https://www.salesforce.com"
POLITENESS_K = 3
# q_mirror_detect boilerplate guard: a content fingerprint shared by
# more hosts than this is template chrome, not mirror evidence — the
# exact-dup path owns it (same rationale as winnow_pairs/banded_pairs'
# max_bucket_size). Inert at gate scale (pinned in tests/test_plans.py).
MIRROR_FP_BUCKET_CAP = 10_000


# Payload tables whose scans feed expensive per-row map work (minhash
# signatures, SRP buckets, hashed features, tokenize+md5 …). The test
# fixtures are SINGLE-row-group parquet files, so their scans are ONE
# partition and all that map work serializes onto one core (guide §2.5:
# unsplittable input — repartition immediately after the read). The
# lift is conditional: a scan that already has ≥ defaultParallelism
# splits (any real at-scale table) is left untouched, so no shuffle is
# added where the input is already parallel. Hash-keyed repartition
# (unique id) — deterministic placement, no sort-before-repartition.
_PARALLEL_TABLES = {"documents": "doc_id", "embeddings": "vec_id"}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    p = spark.sparkContext.defaultParallelism
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        key = _PARALLEL_TABLES.get(t)
        if key is not None and df.rdd.getNumPartitions() < p:
            df = df.repartition(p, F.col(key))
        df.createOrReplaceTempView(t)


def _urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(URLS_SQL)


# --------------------------------------------------------------------------
# crawl-kernel queries
# --------------------------------------------------------------------------

def q_admission_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-F1/F2/F4/F5: static admission predicate (SiteCrawler.java:1152-1217)."""
    return (
        _urls(spark, sf_dir)
        .filter(K.admitted_static(F.col("url"), CFG))
        .select("doc_id", "url")
    )


def q_url_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-P4: URLCleaner.getCleanedUrl with param whitelist (URLCleaner.java:58-108)."""
    return _urls(spark, sf_dir).select(
        "doc_id", "url",
        K.clean_url(F.col("url"), ALLOWED_PARAMS, True).alias("url_clean"),
    )


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-P3: URLNormalizer.normalize 2-arg (URLNormalizer.java:49-60)."""
    register_views(spark, sf_dir)
    return spark.sql(HREFS_SQL).select(
        "doc_id", "href",
        K.normalize2(F.col("href"), NORM_BASE).alias("url_norm"),
    )


def q_prepend_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """prependBaseUrlIfNeeded (SiteCrawler.java:1120-1141)."""
    register_views(spark, sf_dir)
    return spark.sql(HREFS_SQL).select(
        "doc_id", "href",
        K.prepend_base_if_needed(
            F.col("href"), CFG.base_url, CFG.base_url_secure
        ).alias("full_url"),
    )


def q_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-F3/F6: seen-set anti-join on exact AND cleaned form
    (SiteCrawler.java:1204-1224). Visited = every 3rd doc's url + clean."""
    # materialize the derived corpus + clean ONCE: four consumers
    # (both visited branches, the candidate side, and the joins) would
    # otherwise each re-run the parquet scan + URL derivation + clean
    # kernel (measured 10.3 s → 5.4 s at sf0.1/local[32])
    clean = K.clean_url(F.col("url"), ALLOWED_PARAMS, True)
    urls = (
        _urls(spark, sf_dir)
        .select("doc_id", "url", clean.alias("url_clean"))
        .localCheckpoint(eager=True)
    )
    visited = (
        urls.filter(F.col("doc_id") % 3 == 0)
        .select(F.col("url").alias("s"))
        .unionByName(
            urls.filter(F.col("doc_id") % 3 == 0)
            .select(F.col("url_clean").alias("s"))
            .filter(F.col("s").isNotNull())
        )
    )
    cand = urls.filter(F.col("doc_id") % 3 != 0).select(
        "doc_id", "url", "url_clean"
    )
    out = cand.join(visited, cand.url == visited.s, "left_anti")
    out = out.join(visited, out.url_clean == visited.s, "left_anti")
    return out.select("doc_id", "url")


def q_frontier_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-F7 within-wave dedup: keep earliest discovery_order per cleaned
    form (sequential-dequeue emulation, engine.run_wave)."""
    urls = _urls(spark, sf_dir).select(
        "doc_id", "url", K.clean_url(F.col("url"), [], True).alias("url_clean")
    )
    key = F.coalesce(F.col("url_clean"), F.concat(F.lit("RAW:"), F.col("url")))
    w = Window.partitionBy(key).orderBy("doc_id")
    return (
        urls.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "url")
    )


def q_politeness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host politeness budget: first K per host by discovery order
    (engine.run_wave politeness window; north rule)."""
    urls = _urls(spark, sf_dir).withColumn("host", K.url_host(F.col("url")))
    w = Window.partitionBy("host").orderBy("doc_id")
    return (
        urls.withColumn("hrn", F.row_number().over(w))
        .filter(F.col("hrn") <= POLITENESS_K)
        .select("doc_id", "url", "host", "hrn")
    )


def q_referrer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 urlFrom view: dst → sorted referrer set (ProcessPage.java:93,257-263)."""
    urls = _urls(spark, sf_dir).select("doc_id", "url")
    # the modulus rides along as a broadcast 1-row frame — no separate
    # driver action to materialize it (plan hygiene, VERDICT r03)
    nd = urls.agg((F.max("doc_id") + 1).alias("_n"))
    a = urls.crossJoin(F.broadcast(nd)).select(
        F.col("url").alias("src"), "doc_id", "_n"
    )
    e1 = a.join(
        urls.alias("b"), F.col("b.doc_id") == (a["doc_id"] * 7 + 3) % F.col("_n")
    ).select("src", F.col("b.url").alias("dst"))
    e2 = a.join(
        urls.alias("b"), F.col("b.doc_id") == (a["doc_id"] * 3 + 1) % F.col("_n")
    ).select("src", F.col("b.url").alias("dst"))
    return referrer_sets(e1.unionByName(e2))


def q_suffix_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-F2 in isolation: per-suffix admitted counts."""
    urls = _urls(spark, sf_dir)
    suffix = F.lower(F.substring_index(F.col("url"), "?", 1))
    ok = F.lit(False)
    for s in CFG.allowed_suffixes:
        ok = ok | suffix.endswith(s)
    return (
        urls.withColumn("admitted", ok)
        .groupBy("admitted")
        .agg(F.count("*").alias("n"))
    )


def q_error_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-E2/E3 error-code mapping (SiteCrawlerErrorCodes.java:15-32,
    ProcessPage.java:154-193): status/empty/content-type → error_code."""
    urls = _urls(spark, sf_dir)
    status = F.element_at(
        F.array(*[F.lit(x) for x in [200, 301, 302, 403, 404, 410, 500, 200, 200]]),
        (F.col("doc_id") % 9 + 1).cast("int"),
    )
    # exception dispatch (ProcessPage.java:307-329) + degenerate-page
    # codes (:160-185): deterministic doc_id slots for every
    # SiteCrawlerErrorCodes value, taking precedence over the status map
    exc = F.element_at(
        F.array(*[
            F.lit(x).cast("int")
            for x in [None, None, None, None, None, None, None,
                      900, 1000, 1001, 1002, 2000, 2001, 3000]
        ]),
        (F.col("doc_id") % 14 + 1).cast("int"),
    )
    empty = F.col("doc_id") % 10 == 9
    ctype = F.when(F.col("doc_id") % 12 == 11, F.lit("application/pdf")).otherwise(
        F.lit("text/html")
    )
    is_error = status >= 400
    is_redirect = (status > 300) & (status < 303)
    code = (
        F.when(exc.isNotNull(), exc)
        .when(is_error | is_redirect, status)
        .when(empty, F.lit(410))
        .when(~ctype.startswith("text/html"), F.lit(None))
        .otherwise(F.lit(None))
    )
    return (
        urls.select(F.col("doc_id"), code.alias("error_code"))
        .groupBy("error_code")
        .agg(F.count("*").alias("n"))
    )


# --------------------------------------------------------------------------
# analytics breadth (joins / aggs / windows over the driver tables)
# --------------------------------------------------------------------------

def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        """
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS hour,
               event_type,
               count(*) AS n,
               round(sum(value), 4) AS total_value
        FROM events
        GROUP BY 1, 2
        """
    )


# --------------------------------------------------------------------------
# end-to-end crawl (non-SQL-expressible → rows-only check)
# --------------------------------------------------------------------------

def crawl_e2e_setup():
    """Shared fixture for q_crawl_e2e and its oracle: the deterministic
    synthetic site + config. The oracle side runs the single-threaded
    reference model (crawl/model.py) over the SAME inputs and emits its
    visit order as a SQL VALUES literal — two independent
    implementations, driver-hash-compared."""
    from sitecrawler_spark.crawl import sitegen

    rows = sitegen.generate_site(n_pages=30, seed=42)
    cfg = CrawlerConfig(
        base_url="http://www.salesforce.com",
        base_url_secure="https://www.salesforce.com",
        disable_redirects=True, blocked=["/logout"],
    )
    return rows, cfg, sitegen.seeds_for(rows, 2)


def q_crawl_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full micro-wave crawl of the deterministic synthetic site; returns
    (visit_rank, full_url, error_code) in realized fetch order. The
    oracle is the independent single-threaded reference model
    (oracles.crawl_e2e_oracle), the same parity gate as
    tests/test_crawl_e2e.py but driver-checkable."""
    from pyspark.sql import Window
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    rows, cfg, seeds = crawl_e2e_setup()
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, rows))
    eng.crawl(seeds, max_waves=40)
    w = Window.orderBy("wave", "discovery_order")  # result is wave-sized
    return (
        eng.visit_order_df()
        .withColumn("visit_rank", F.row_number().over(w))
        .select("visit_rank", "full_url", "error_code")
    )


def crawl_to_corpus_setup():
    """Shared fixture for q_crawl_to_corpus and its oracle: the
    deterministic multi-host corpus site (sitegen.generate_corpus_site
    plants boilerplate chrome, French pages, exact/near dups and
    n-gram contamination) + a multi-host config. Both sides crawl the
    SAME rows — engine vs the single-threaded reference model — so the
    gate covers crawl-order parity AND the corpus pipeline."""
    from sitecrawler_spark.crawl import sitegen

    rows = sitegen.generate_corpus_site()
    cfg = CrawlerConfig(base_url="https://", disable_redirects=True)
    return rows, cfg, [rows[0]["url"], rows[1]["url"]]


def q_crawl_to_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP composition — crawl → training corpus: the wave engine
    crawls the deterministic corpus site, then export_training_corpus
    chains boilerplate strip → Gopher/quality+lang gate → exact+minhash
    dedup (canonical pick) → decontamination → sequence packing over
    the crawled span pages (corpus.py). The oracle re-runs the
    independent single-threaded reference model for the crawl and
    composes the per-stage SQL CTEs over its pages
    (oracles.crawl_to_corpus_oracle) — one gate over the whole
    crawl-to-corpus story."""
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    rows, cfg, seeds = crawl_to_corpus_setup()
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, rows))
    eng.crawl(seeds, max_waves=60)
    return eng.export_training_corpus()


def crawl_e2e_budgeted_setup():
    """Shared fixture for q_crawl_e2e_budgeted: multi-host site + a
    NON-default config — per-host politeness budget, host salting for
    skew, and the bloom prefilter all active — so the driver gate
    exercises the politeness window, two-phase salted top-k, and bloom
    routing end to end (VERDICT r02 #6)."""
    from sitecrawler_spark.crawl import sitegen

    rows = sitegen.generate_site(
        n_pages=36,
        hosts=(
            "www.salesforce.com",
            "blogs.salesforce.com",
            "trailhead.salesforce.com",
        ),
        seed=7,
    )
    cfg = CrawlerConfig(
        base_url="https://", disable_redirects=True, blocked=["/logout"],
        politeness_budget=2, host_salts=4,
        seen_filter="bloom", seen_filter_expected_n=10_000,
    )
    return rows, cfg, [r["url"] for r in rows[:3]]


def q_crawl_e2e_budgeted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted micro-wave crawl (politeness + salts + bloom); oracle is
    the independent pure-Python wave-mode model
    (oracles.crawl_e2e_budgeted_oracle)."""
    from pyspark.sql import Window
    from sitecrawler_spark.crawl import sitegen
    from sitecrawler_spark.crawl.engine import SparkSiteCrawler

    rows, cfg, seeds = crawl_e2e_budgeted_setup()
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, rows))
    eng.crawl(seeds, max_waves=120)
    w = Window.orderBy("wave", "discovery_order")  # result is wave-sized
    return (
        eng.visit_order_df()
        .withColumn("visit_rank", F.row_number().over(w))
        .select("visit_rank", "full_url", "error_code")
    )


# --------------------------------------------------------------------------
# training-data pipeline operators (textops / dedup / ann)
# --------------------------------------------------------------------------


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continual-ingestion dedup: new batch (doc_id % 3 == 0) checked
    against the existing corpus (doc_id % 3 != 0) via shared LSH bands —
    batch×index join, never all-pairs within the corpus."""
    from sitecrawler_spark.dedup.dedup import (
        banded_pairs_against,
        minhash_band_keys,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    # both sides come from ONE table here, so compute the (expensive)
    # signatures once: a single band frame, one band_key exchange, and
    # the batch/corpus sides are filters ABOVE the shared exchange
    # (ReusedExchange). A production deployment would instead read the
    # corpus side from a materialized band index table
    # (minhash_lsh_pairs_against takes two frames for that shape).
    bands = docs.select(
        F.col("doc_id").alias("id"),
        (F.col("doc_id") % 3 == 0).alias("is_batch"),
        F.explode(
            minhash_band_keys(F.col("text"), n_hashes=8, n_bands=4, k=5)
        ).alias("band_key"),
    ).repartition("band_key")
    # NOTE: Catalyst pushes the two filters BELOW the repartition, so
    # each side computes signatures for ITS slice only (1/3 + 2/3 = one
    # full pass total) — already optimal. A localCheckpoint barrier to
    # force a literal ReusedExchange was measured WORSE (38 s vs 25 s:
    # materialization cost + lost stage fusion with the join).
    batch_b = bands.filter("is_batch").drop("is_batch")
    corpus_b = bands.filter("NOT is_batch").drop("is_batch")
    return banded_pairs_against(
        batch_b, corpus_b, 10_000, corpus_prepartitioned=True
    )


def q_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-constrained ANN: exact top-5 cosine neighbors per probe
    restricted to the probe's own label partition — the filtered-search
    shape (lang/license/domain constraints) retrieval pipelines need.
    Probe set broadcast; the label equi-condition joins the filter
    INTO the similarity scan instead of post-filtering top-k (which
    would under-fill k)."""
    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    p = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("nvec"),
        "label",
    )
    from sitecrawler_spark.dedup.ann import cosine_sim

    crossed = c.join(
        F.broadcast(p),
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("label") == F.col("qlabel")),
    )
    scored = crossed.select(
        "query_id", "neighbor_id",
        F.round(cosine_sim(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based quality filtering: keep the top half of documents
    per language by quality score (count-based median — exact and
    engine-portable, unlike percentile interpolation). The per-stratum
    rank gets the WindowGroupLimit treatment only when k is constant,
    so this uses rn <= ceil(n/2) with both from one window pass."""
    from sitecrawler_spark.textops import functions as TX

    register_views(spark, sf_dir)
    q = spark.table("documents").select(
        "lang", "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("lang")
    rn = F.row_number().over(
        w.orderBy(F.col("quality").desc(), "doc_id")
    )
    n = F.count("*").over(w)
    return (
        q.withColumn("_rn", rn)
        .withColumn("_n", n)
        .filter(F.col("_rn") <= F.ceil(F.col("_n") / 2))
        .select("lang", "doc_id", "quality")
    )


def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native gap-based sessionization: F.session_window (30-min
    gap) — the built-in merging-session-window operator (batch here;
    the same expression works under Structured Streaming with state).
    Oracle recomputes sessions via the lag/cumsum construction —
    independent algorithm, same semantics (end = last event + gap)."""
    register_views(spark, sf_dir)
    ev = spark.table("events")
    g = ev.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.count("*").alias("n_events"))
    return g.select(
        "user_id",
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def q_span_media_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal span alignment over the interleaved data model
    (input_hint shape): for every media span, the nearest preceding and
    following TEXT span — the caption/context-extraction primitive a
    multimodal training pipeline needs. Pure window functions over the
    exploded span array: partition by doc, order by offset, IGNORE
    NULLS last/first — no self-join, shuffle = one exchange on doc_id."""
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.col("text"), " ")
    spans = F.transform(
        toks,
        lambda x, i: F.struct(
            F.when(i % 5 == 0, F.lit("anchor"))
            .when(i % 7 == 0, F.lit("media"))
            .otherwise(F.lit("text"))
            .alias("kind"),
            x.alias("text"),
            i.cast("long").alias("offset"),
        ),
    )
    ex = docs.select("doc_id", F.explode(spans).alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.offset"
    )
    txt = F.when(F.col("kind") == "text", F.col("text"))
    w = Window.partitionBy("doc_id").orderBy("offset")
    prev = F.last(txt, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    nxt = F.first(txt, ignorenulls=True).over(
        w.rowsBetween(1, Window.unboundedFollowing)
    )
    return (
        ex.withColumn("prev_text", prev)
        .withColumn("next_text", nxt)
        .filter(F.col("kind") == "media")
        .select(
            "doc_id",
            "offset",
            F.concat(F.lit("ref://"), F.col("text")).alias("media_ref"),
            "prev_text",
            "next_text",
        )
    )


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing (the standard LLM pretraining
    batcher): documents concatenate in doc_id order within each source
    and split at a 256-token budget; a doc belongs to the sequence its
    first token falls in. One window cumsum per source + one groupBy —
    both shuffle on `source`, reusable exchange, no driver loops."""
    register_views(spark, sf_dir)
    B = 256
    d = spark.table("documents").select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).alias("ntok")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = d.withColumn("cum_before", F.sum("ntok").over(w) - F.col("ntok"))
    seq = F.floor(F.col("cum_before") / B)
    crosses = F.floor((F.col("cum_before") + F.col("ntok") - 1) / B) != seq
    return (
        c.groupBy("source", seq.cast("long").alias("seq_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").cast("long").alias("tokens"),
            F.sum(F.when(crosses, 1).otherwise(0))
            .cast("long")
            .alias("boundary_crossings"),
        )
    )


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word 3-gram with the held-out eval slice (doc_id % 97 == 0) — the
    n-gram-overlap contamination check every serious pretraining
    pipeline runs. The eval gram set is distinct-small → BROADCAST to
    the training-side gram explode; the only shuffle is the per-doc
    distinct-hit aggregation."""
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    ts = F.split(F.col("text"), " ")
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.size(ts) - 2),
        lambda j: F.concat_ws(" ", F.slice(ts, j, 3)),
    )
    grams = docs.filter(F.size(ts) >= 3).select(
        "doc_id", F.explode(grams_arr).alias("g")
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
    )
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )


def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_decontamination's contamination report computed through the
    SHARDED-BLOOM route (corpus.decontaminate_bloom): eval grams build
    the engine's bloom filter, the training gram stream is prefiltered
    map-side (bloom negatives are definite), and only survivors reach
    the exact verify join. Identical results by construction — the
    oracle IS q_decontamination's — making the 100 TB no-broadcast
    path a driver-gated equivalence, not a claim."""
    from sitecrawler_spark.operators.seen import SparkBloomFilter

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    ts = F.split(F.col("text"), " ")
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.size(ts) - 2),
        lambda j: F.concat_ws(" ", F.slice(ts, j, 3)),
    )
    grams = docs.filter(F.size(ts) >= 3).select(
        "doc_id", F.explode(grams_arr).alias("g")
    )
    bench = (
        grams.filter(F.col("doc_id") % 97 == 0)
        .select("g")
        .distinct()
        .localCheckpoint(eager=True)
    )
    bloom = SparkBloomFilter.sized(spark, max(bench.count(), 1), fpp=0.01)
    bloom.add_df(bench, "g")
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .filter(bloom.maybe_contains(F.col("g")))
        .join(bench, "g")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: top-3 docs per language by
    portable md5 hash order — hash-order sampling is reproducible
    across engines AND across cluster sizes (no RNG state). Per-stratum
    top-k via window-group-limit: Spark pushes the rank filter into a
    per-partition top-k, so the shuffle carries at most k rows per
    stratum per map task."""
    register_views(spark, sf_dir)
    h = spark.table("documents").select(
        "lang",
        "doc_id",
        K.portable_hash64(F.col("doc_id").cast("string")).alias("hk"),
    )
    w = Window.partitionBy("lang").orderBy("hk", "doc_id")
    return (
        h.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("lang", "doc_id", "rk")
    )


def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mix weighting (temperature 0.5): per-source token mass →
    sqrt-damped sampling weight and effective epochs at a 1M-token
    budget — the mixture-allocation step of a training-data pipeline.
    One agg on source, then a 20-row window; rounded to 6dp for
    cross-engine float portability."""
    register_views(spark, sf_dir)
    s = (
        spark.table("documents")
        .groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.col("text"), " ")))
            .cast("long")
            .alias("tokens")
        )
    )
    wsum = F.sum(F.sqrt(F.col("tokens"))).over(
        Window.partitionBy()
    )
    weight = F.sqrt(F.col("tokens")) / wsum
    return s.select(
        "source",
        "tokens",
        F.round(weight, 6).alias("weight"),
        F.round(weight * 1_000_000 / F.col("tokens"), 6).alias("epochs"),
    )

def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.textops import functions as TX

    register_views(spark, sf_dir)
    docs = spark.table("documents")
    return docs.select(
        "doc_id",
        TX.token_count_ws(F.col("text")).alias("n_ws_tokens"),
        TX.token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
    )


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.textops import functions as TX

    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.textops import functions as TX

    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id", TX.lang_id(F.col("text")).alias("lang_pred")
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.textops import functions as TX

    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id",
        TX.fingerprint_md5(F.col("text")).alias("fp_md5"),
        TX.rolling_hash64(F.col("text")).alias("fp_rolling"),
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.dedup.dedup import exact_dedup

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return exact_dedup(docs, "text", "doc_id").select("doc_id")


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.dedup.dedup import minhash_signature

    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id",
        F.concat_ws(",", minhash_signature(F.col("text"), 8, 5)).alias("sig"),
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.dedup.dedup import minhash_lsh_pairs

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return minhash_lsh_pairs(docs, "text", "doc_id", n_hashes=8, n_bands=4, k=5)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.dedup.dedup import simhash64

    register_views(spark, sf_dir)
    return spark.table("documents").select(
        "doc_id", simhash64(F.col("text"), 24).alias("simhash")
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard of consecutive doc pairs (verify-stage shape: exact
    similarity on candidate pairs only, never all-pairs)."""
    from sitecrawler_spark.dedup.dedup import ngram_jaccard

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    b = docs.select(
        (F.col("doc_id") - 1).alias("join_id"), F.col("text").alias("text_b")
    )
    pairs = docs.join(b, docs.doc_id == b.join_id).select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b"),
        ngram_jaccard(F.col("text"), F.col("text_b"), 5).alias("jaccard"),
    )
    return pairs


def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.dedup.ann import brute_force_topk

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, probes, "vec_id", "embedding", k=5)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sitecrawler_spark.dedup.ann import lsh_topk

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, probes, dim=64, k=5, n_planes=6)


def q_cms_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch point queries over the document word stream
    (sketches.py): d=3 × w=64 counters, estimate = min over rows —
    deterministic integers end to end, so the DuckDB mirror matches
    exactly. Behavioral guarantee (never undercounts) is pinned in
    tests; the sketch stays d×w cells at any corpus size."""
    from sitecrawler_spark.sketches import cms_build, cms_estimate

    register_views(spark, sf_dir)
    words = spark.table("documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    cms = cms_build(words, "word")
    items = words.distinct()
    return cms_estimate(cms, items, "word")


def q_cms_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-algebra driver gate for Count-Min: Spark builds TWO
    partial sketches over doc_id-parity splits of the corpus and
    MERGES them (elementwise sum), then answers the same point queries
    as q_cms_word_counts. The oracle builds the direct single-pass
    table — the driver's hash equality IS the cross-engine proof that
    merged partials ≡ direct build (the property that lets partition/
    batch/stream partials combine at 100 TB without rescans)."""
    from sitecrawler_spark.sketches import cms_build, cms_estimate, cms_merge

    register_views(spark, sf_dir)
    words = spark.table("documents").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    a = cms_build(words.filter(F.col("doc_id") % 2 == 0), "word")
    b = cms_build(words.filter(F.col("doc_id") % 2 == 1), "word")
    cms = cms_merge(a, b)
    items = words.select("word").distinct()
    return cms_estimate(cms, items, "word")


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate over events (sketches.py):
    2^6 registers from the portable hash; the harmonic sum is exact
    (powers of two), so the estimate is reproducible bit-for-bit in
    the DuckDB mirror. Output carries the exact distinct count too —
    accuracy is pinned in tests."""
    from sitecrawler_spark.sketches import hll_estimate, hll_registers

    register_views(spark, sf_dir)
    ev = spark.table("events").select(
        F.col("user_id").cast("string").alias("u")
    ).distinct()
    regs = hll_registers(ev, "u")
    est = hll_estimate(regs)
    exact = spark.table("events").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.crossJoin(exact)


def q_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-algebra rollup: per-event-type distinct-user HLL sketches,
    PLUS a global estimate computed by MERGING the per-type register
    tables (max per bucket) — never rescanning the events table. This
    is the property that makes sketches the 100-TB answer: partial
    sketches from partitions/batches/stream epochs combine exactly
    (merged registers ≡ direct-build registers, test-pinned). Output:
    (scope, est) — one row per event_type + an 'ALL' row from the
    merge."""
    from sitecrawler_spark.sketches import (
        hll_estimate,
        hll_estimate_by,
        hll_merge,
        hll_registers_by,
    )

    register_views(spark, sf_dir)
    # sketch event_id (distinct per row) so per-type cardinalities
    # genuinely differ — user_id saturates every type at small SF
    ev = spark.table("events").select(
        "event_type", F.col("event_id").cast("string").alias("u")
    ).distinct()
    regs = hll_registers_by(ev, "u", ["event_type"])
    per_type = hll_estimate_by(regs, ["event_type"]).select(
        F.col("event_type").alias("scope"), "est"
    )
    merged_all = hll_estimate(hll_merge(regs)).select(
        F.lit("ALL").alias("scope"), "est"
    )
    return per_type.unionByName(merged_all)


def q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join (operators/joins.asof_join): every click event gets
    the user's latest view event at or before it — the temporal join
    Spark lacks natively, built as union + one keyed window (no
    BroadcastNestedLoopJoin, no per-key explosion). Oracle: DuckDB's
    native ASOF LEFT JOIN — a genuinely independent implementation."""
    from sitecrawler_spark.operators.joins import asof_join

    register_views(spark, sf_dir)
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    out = asof_join(
        clicks, views, on="user_id", left_ts="ts", right_ts="vts",
        payload_cols=["vid", "vts"],
    )
    return out.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("r_vid").alias("view_event_id"),
        F.date_format("r_vts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
    )


def q_events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join, full merge_asof surface (VERDICT r03 #6): every
    click gets its NEAREST view event within ±10 minutes — both
    directions considered, exact-distance ties prefer the backward
    (prior) row, matches farther than the tolerance become null.
    Oracle: an independent DuckDB LATERAL formulation (order by
    absolute distance with a backward-preferring tie key, LIMIT 1)."""
    from sitecrawler_spark.operators.joins import asof_join

    register_views(spark, sf_dir)
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    out = asof_join(
        clicks, views, on="user_id", left_ts="ts", right_ts="vts",
        payload_cols=["vid", "vts"], direction="nearest",
        tolerance_seconds=600,
    )
    return out.select(
        "user_id", "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.col("r_vid").alias("view_event_id"),
        F.date_format("r_vts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed RANGE join (operators/joins.range_join_bucketed):
    events matched to (possibly overlapping) 2-hour incident windows
    anchored at every 97th event — interval containment via bucket
    explode + equi-join + exact filter, never a nested-loop theta
    join. Oracle: the plain SQL BETWEEN join."""
    from sitecrawler_spark.operators.joins import range_join_bucketed

    register_views(spark, sf_dir)
    ev = spark.table("events")
    intervals = ev.filter(F.col("event_id") % 97 == 0).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("hi"),
    )
    pts = ev.select("event_id", "ts")
    out = range_join_bucketed(pts, intervals, "ts", "lo", "hi")
    return out.select("event_id", "interval_id").orderBy(
        "event_id", "interval_id"
    )


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (encode + asymmetric distance): corpus
    compressed to m_sub codes per vector, probes scored via broadcast
    lookup tables — the memory-bound ANN family completing brute /
    LSH / IVF / filtered. Deterministic sampled codebooks so the SQL
    oracle mirrors bit-for-bit."""
    from sitecrawler_spark.dedup.ann import pq_topk

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    return pq_topk(emb, emb.filter(F.col("vec_id") < 10))


def q_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved span documents (input_hint shape): build a REAL
    array<struct<kind,text,media_ref,offset>> column from document text,
    explode it, aggregate per kind — exercises the span data model as a
    first-class query (the oracle derives the same aggregates scalar-
    wise, an independent path)."""
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.col("text"), " ")
    spans = F.transform(
        toks,
        lambda x, i: F.struct(
            F.when(i % 5 == 0, F.lit("anchor"))
            .when(i % 7 == 0, F.lit("media"))
            .otherwise(F.lit("text"))
            .alias("kind"),
            x.alias("text"),
            F.when(
                (i % 7 == 0) & (i % 5 != 0), F.concat(F.lit("ref://"), x)
            ).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    ex = docs.select("doc_id", F.explode(spans).alias("s"))
    return (
        ex.groupBy(F.col("s.kind").alias("kind"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("s.text")).alias("chars"),
            F.count("s.media_ref").alias("n_refs"),
            F.max("s.offset").cast("bigint").alias("max_offset"),
        )
    )


def q_ann_lsh_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table multiprobe SRP ANN (scale path): 6 plane families ×
    Hamming-1 probe fan-out; recall vs brute force pinned ≥0.9 by
    tests/test_textops_dedup."""
    from sitecrawler_spark.dedup.ann import lsh_topk

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, probes, dim=64, k=5, n_planes=4, n_tables=6,
                    multiprobe=True)


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) — the stateful-
    stream analog expressed as batch windows."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH ordered AS (
          SELECT user_id, ts, event_id, event_type,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_ts
          FROM events
        ),
        flagged AS (
          SELECT user_id, ts, event_id, event_type,
                 CASE WHEN prev_ts IS NULL
                        OR (unix_timestamp(ts) - unix_timestamp(prev_ts)) > 1800
                      THEN 1 ELSE 0 END AS new_session
          FROM ordered
        ),
        sess AS (
          SELECT user_id, ts, event_type,
                 sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
          FROM flagged
        )
        SELECT user_id, session_id, count(*) AS n_events,
               date_format(min(ts), 'yyyy-MM-dd HH:mm:ss') AS session_start
        FROM sess GROUP BY user_id, session_id
        """
    )


# Deterministic link graph derived from documents — VALID IN BOTH
# Spark SQL and DuckDB (keep dialect-neutral). Three modular-arithmetic
# out-edges per doc, self-loops excluded.
PAGERANK_EDGES_SQL = """
SELECT src, dst FROM (
  SELECT doc_id AS src, (doc_id * 2 + 1) % t.n AS dst
  FROM documents, (SELECT count(*) AS n FROM documents) t
  UNION ALL
  SELECT doc_id, (doc_id * 3 + 2) % t.n
  FROM documents, (SELECT count(*) AS n FROM documents) t
  UNION ALL
  SELECT doc_id, (doc_id * 7 + 5) % t.n
  FROM documents, (SELECT count(*) AS n FROM documents) t
) e
WHERE src <> dst
"""


def q_ann_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search over TRAINED centroids: 2 deterministic Lloyd
    iterations (distributed: broadcast assignment + posexplode mean
    update), then 3-probe IVF. The oracle unrolls the same two
    iterations as SQL CTEs — gating the iterative trainer itself, not
    just the search."""
    from sitecrawler_spark.dedup.ann import ivf_topk, kmeans_centroids

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    cents = kmeans_centroids(emb, n_centroids=20, n_iters=2, init_stride=25)
    probes = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, probes, k=5, centroids=cents, n_probe=3)


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP rollup: event counts/value by (event_type, hour) with
    subtotal and grand-total rows (GROUP BY ROLLUP)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               date_format(date_trunc('hour', ts),
                           'yyyy-MM-dd HH:mm:ss') AS hour,
               count(*) AS n, round(sum(value), 4) AS total_value
        FROM events GROUP BY ROLLUP(event_type, hour)
        """
    )


def q_events_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per type (p50/p90/
    p99 — the monitoring-table shape)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT event_type,
               round(percentile(value, 0.5), 6) AS p50,
               round(percentile(value, 0.9), 6) AS p90,
               round(percentile(value, 0.99), 6) AS p99
        FROM events GROUP BY event_type
        """
    )


def q_orders_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table join + top-k: biggest customers by total order value with
    their nation (broadcastable dims; ranking on the ROUNDED total so
    float-summation order can't flip a rank)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH t AS (
          SELECT c.c_custkey, c.c_name, n.n_name,
                 round(sum(o.o_totalprice), 2) AS total,
                 count(*) AS n_orders
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          GROUP BY c.c_custkey, c.c_name, n.n_name
        )
        SELECT * FROM (
          SELECT t.*, row_number() OVER (ORDER BY total DESC, c_custkey)
                   AS rank
          FROM t) WHERE rank <= 20
        """
    )


def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick text featurization (documents → dense vectors the
    ANN/near-dup ops consume), exploded to (doc_id, dim, feat) scalars
    so the value gate compares floats, not array renderings."""
    from sitecrawler_spark.textops.functions import hashed_text_features

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return docs.select(
        "doc_id",
        F.posexplode(hashed_text_features(F.col("text"), 16)).alias(
            "dim", "feat"
        ),
    )


def q_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (keyword extraction): tf ×
    ln(N/df), rounded 6dp before ranking so JVM/libm ulp differences
    can't flip a rank; ties break lexicographically."""
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = toks.select("doc_id", "word").distinct().groupBy("word").agg(
        F.count("*").alias("df")
    )
    # N rides along as a broadcast 1-row aggregate instead of a separate
    # docs.count() driver action (plan hygiene, VERDICT r03)
    nd = docs.agg(F.count("*").cast("double").alias("_n"))
    scored = tf.join(dfreq, "word").crossJoin(F.broadcast(nd)).select(
        "doc_id", "word",
        F.round(
            F.col("tf") * F.log(F.col("_n") / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "word", "tfidf")
    )


def q_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary metadata extraction (the multimodal column model:
    binary payload + typed metadata): byte length, md5 checksum, magic
    prefix, ascii-ness — all JVM-native over a deterministic binary
    column derived from text (the sandbox has no real codecs; the
    decode stage proper is the mapInPandas path in multimodal.py)."""
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    b = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.length(b).alias("n_bytes"),
        F.md5(b).alias("checksum"),
        F.lower(F.substring(F.hex(b), 1, 8)).alias("magic_hex"),
        (F.length(b) == F.length(F.col("text"))).alias("is_ascii"),
    )


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking (64-token windows, 16 overlap): doc_id,
    chunk_id, chunk text, chunk token count — the context-window prep
    stage of a training pipeline."""
    from sitecrawler_spark.textops.functions import chunk_texts

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    out = docs.select(
        "doc_id",
        F.posexplode(chunk_texts(F.col("text"), 64, 16)).alias(
            "chunk_id", "chunk_text"
        ),
    ).filter(F.col("chunk_text") != "")
    return out.select(
        "doc_id", "chunk_id", "chunk_text",
        F.size(F.split(F.col("chunk_text"), r"\s+")).alias("n_chunk_tokens"),
    )


def q_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with frequencies (vocab-building stage):
    lowercase whitespace tokens, counts + document frequency."""
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    return toks.groupBy("word").agg(
        F.count("*").alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over a deterministic derived link graph
    (the post-crawl link-analysis op). 5 iterations, d=0.85; oracle is
    the same recurrence unrolled as SQL CTEs."""
    from sitecrawler_spark.operators.graph import pagerank

    register_views(spark, sf_dir)
    edges = spark.sql(PAGERANK_EDGES_SQL)
    nodes = spark.table("documents").select(F.col("doc_id").alias("id"))
    return pagerank(nodes, edges, n_iters=5).select(
        F.col("id").alias("doc_id"), "rank"
    )


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-overlap dedup via winnowed fingerprints (Schleimer
    2003; the modality word-set minhash cannot see — any shared run of
    ≥ k+w-1 = 7 words is guaranteed a shared fingerprint): word
    4-gram hashes → per-doc 4-hash window minima → pairs sharing ≥ 3
    fingerprints. Subsumes q_fingerprint's rolling-hash surface."""
    from sitecrawler_spark.dedup.dedup import winnow_fingerprints, winnow_pairs

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    fps = winnow_fingerprints(docs, "text", "doc_id", k=4, w=4)
    return winnow_pairs(fps, min_shared=3)


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS hub/authority scores over the same derived
    link graph as q_pagerank (operators/graph.hits) — the second
    classic crawl link-analysis op. Max-normalized per pass, 9dp
    iteration contract; oracle is the recurrence unrolled as SQL CTEs
    (two aggregate-join CTEs per iteration)."""
    from sitecrawler_spark.operators.graph import hits

    register_views(spark, sf_dir)
    edges = spark.sql(PAGERANK_EDGES_SQL)
    nodes = spark.table("documents").select(F.col("doc_id").alias("id"))
    return hits(nodes, edges, n_iters=5).select(
        F.col("id").alias("doc_id"), "hub", "authority"
    )


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank (Gyöngyi 2004) over the same derived link graph as
    q_pagerank, with a deterministic trusted seed set (doc_id % 13 ==
    0 — the oracle-labeled good pages of the paper, picked by rule so
    both engines agree without a fixture). The anti-spam biased
    PageRank: teleport mass goes only to seeds, so trust decays with
    link distance and spam neighborhoods starve. Oracle: the
    recurrence unrolled as SQL CTEs (oracles.trustrank_oracle), same
    pattern as q_pagerank's."""
    from sitecrawler_spark.operators.graph import trustrank

    register_views(spark, sf_dir)
    edges = spark.sql(PAGERANK_EDGES_SQL)
    nodes = spark.table("documents").select(F.col("doc_id").alias("id"))
    seeds = nodes.filter(F.col("id") % 13 == 0)
    return trustrank(nodes, edges, seeds, n_iters=5).select(
        F.col("id").alias("doc_id"), "trust"
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (retrieval-side of a training-data
    pipeline): word → document frequency, total term frequency, and the
    sorted posting list (capped at 100 doc ids — the stopword skew
    guard: a full posting list for 'the' at 100 TB is a single-key
    hot-spot; production shards postings, the cap keeps the gate honest
    and is mirrored in the oracle). One tokenize → one groupBy(word)
    with map-side combine."""
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    return toks.groupBy("word").agg(
        F.count_distinct("doc_id").alias("df"),
        F.count("*").alias("tf_total"),
        F.array_join(
            F.slice(F.sort_array(F.collect_set("doc_id")), 1, 100), ","
        ).alias("postings"),
    )


#: fixed deterministic retrieval queries over the synthetic vocabulary
BM25_QUERIES = {
    1: ["join", "filter", "window"],
    2: ["stream", "batch", "merge"],
    3: ["slow", "query", "scan"],
}


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza 2009; Lucene idf
    variant) — top-10 documents per term query. Per-term scores are
    integer-scaled before the per-(query, doc) sum so ranking is exact
    across engines (no float-summation-order hazard)."""
    from sitecrawler_spark.textops.functions import bm25_topk

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return bm25_topk(docs, BM25_QUERIES)


def q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 evaluation of the BM25 ranking (Järvelin & Kekäläinen
    2002) with rule-derived graded relevance (rel = total tf of the
    query's terms; linear gain), so the retrieval stack carries its own
    quality metric — the eval harness a training-data pipeline runs
    after every index rebuild. Discounted gains are micro-integer
    scaled before summing (exact cross-engine); oracle composes the
    shared BM25 CTE chain (oracles.ndcg_oracle)."""
    from sitecrawler_spark.textops.functions import ndcg_at_k

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return ndcg_at_k(docs, BM25_QUERIES, k=10)


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality scoring (perplexity-proxy document
    filtering): corpus bigram/unigram counts with add-one smoothing
    over the vocabulary, per-doc mean log P(wᵢ|wᵢ₋₁). The classic cheap
    LM filter for pretraining corpora (Wenzek et al., "CCNet", 2020 use
    a real LM; the n-gram model is its SQL-expressible stand-in).
    Plan: one tokenize feeding a per-doc lag window (bigrams), counts
    via two map-side-combined groupBys, V and the counts joined back —
    log terms rounded 6dp before the mean so cross-engine libm ulp
    differences can't accumulate."""
    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        toks.withColumn("prev", F.lag("word").over(w))
        .filter(F.col("prev").isNotNull())
        .select("doc_id", "prev", "word")
    )
    uni = toks.groupBy("word").agg(F.count("*").alias("uc")).select(
        F.col("word").alias("prev"), "uc"
    )
    bigc = big.groupBy("prev", "word").agg(F.count("*").alias("bc"))
    vocab = toks.agg(F.count_distinct("word").cast("double").alias("_v"))
    scored = (
        big.join(bigc, ["prev", "word"])
        .join(uni, "prev")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            # log terms as exact integer MICRO-units: the per-doc sum is
            # then order-independent (integer addition), and the mean is
            # one deterministic double division — avg of rounded doubles
            # drifted across engines at the 6dp boundary
            F.round(
                F.log((F.col("bc") + 1.0) / (F.col("uc") + F.col("_v")))
                * 1e6
            ).cast("long").alias("lp6"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            F.sum("lp6") / (F.count("*") * F.lit(1e6)), 6
        ).alias("lm_score"),
    )


def q_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline over documents: quality score +
    lang-id + token count → keep (quality ≥ 0.5, en) → exact dedup →
    minhash-LSH near-dup clustering → canonical docs with their cluster
    sizes. Each stage is the already-gated operator; this query gates
    the COMPOSITION (filters push into the scan; dedup/cluster shuffles
    run over the filtered survivor set only)."""
    from sitecrawler_spark.dedup.components import dedup_clusters
    from sitecrawler_spark.dedup.dedup import exact_dedup, minhash_lsh_pairs
    from sitecrawler_spark.textops.functions import (
        lang_id, quality_score, token_count_ws,
    )

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    scored = docs.select(
        "doc_id", "text",
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang_pred"),
        token_count_ws(F.col("text")).alias("n_tokens"),
    )
    kept = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("lang_pred") == "en")
    )
    # pin the deduped survivors: uniq feeds THREE consumers (band build,
    # cluster nodes, final join) and sits on a Window subtree that AQE's
    # runtime stage-reuse does not canonicalize across the band
    # self-join's re-aliasing — unpinned, the minhash signature scan ran
    # 3× (measured 26 s vs 8 s for the band stage at sf0.1)
    uniq = exact_dedup(kept, "text", "doc_id").localCheckpoint(eager=True)
    edges = minhash_lsh_pairs(uniq, "text", "doc_id",
                              n_hashes=8, n_bands=4, k=5)
    clusters = dedup_clusters(
        uniq.select(F.col("doc_id").alias("id")), edges
    )
    return (
        clusters.filter(F.col("is_canonical"))
        .join(uniq, clusters.id == uniq.doc_id)
        .select("doc_id", "lang_pred", "quality", "n_tokens", "cluster_size")
    )


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: band-bucket candidates + exact Hamming
    verify (≤ 8 of 24 bits — loose enough to yield pairs on the
    fixture corpus)."""
    from sitecrawler_spark.dedup.dedup import simhash_pairs

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    return simhash_pairs(docs, "text", "doc_id", n_bits=24, n_bands=4,
                         max_hamming=8)


def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup shape): SRP-LSH
    buckets → within-bucket self-join → exact cosine verify. Threshold
    0.4 because the fixture embeddings carry no planted high-sim dups —
    the pipeline shape, not the threshold, is what's under test."""
    from sitecrawler_spark.dedup.ann import embedding_neardup_pairs

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    return embedding_neardup_pairs(
        emb, dim=64, threshold=0.4, n_planes=3, n_tables=6
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: deterministic sampled centroids (vec_id % 25),
    nearest-centroid inverted lists, 3-probe search, exact re-rank."""
    from sitecrawler_spark.dedup.ann import ivf_topk

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(emb, probes, k=5, centroid_stride=25, n_probe=3)


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (IVFADC) with a TRAINED coarse quantizer — the FAISS
    production pattern: Lloyd k-means (the q_ann_kmeans-gated trainer)
    learns the inverted-list centroids, 3-probe lists restrict the
    search set, PQ asymmetric distance scores the candidates — the
    composed billion-vector scale path. Deterministic end-to-end
    (stride init, rounded-argmax assignment, FLOAT-cast updates), so
    the SQL oracle unrolls the same Lloyd iterations and mirrors
    bit-for-bit; the sampled-quantizer form degrades to exactly
    q_ann_pq when every list is probed (test-pinned)."""
    from sitecrawler_spark.dedup.ann import ivfpq_topk, kmeans_centroids

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    cents = kmeans_centroids(emb, n_centroids=20, n_iters=2, init_stride=25)
    return ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 10), centroids=cents
    )


def q_ann_ivfpq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with residual quantization (the FAISS by_residual
    default): codes quantize vec − coarse_centroid and the score
    decomposes as exact q·c_list + ADC(residual) — with trained
    codebooks on clustered data the residual has lower variance than
    the raw vector (the production rationale; on uniform-random test
    vectors the variants are comparable). Deterministic end-to-end;
    SQL oracle mirrors bit-for-bit; zero-quantization-error law on
    codebook-source rows is test-pinned."""
    from sitecrawler_spark.dedup.ann import ivfpq_topk

    register_views(spark, sf_dir)
    emb = spark.table("embeddings")
    return ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 10), by_residual=True
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: minhash-LSH candidate pairs → connected
    components (iterative min-label propagation) → canonical pick
    (min doc_id per component). The oracle is a DuckDB recursive CTE
    over the same edge set — an independent fixpoint implementation."""
    from sitecrawler_spark.dedup.components import dedup_clusters
    from sitecrawler_spark.dedup.dedup import minhash_lsh_pairs

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    edges = minhash_lsh_pairs(docs, "text", "doc_id", n_hashes=8, n_bands=4, k=5)
    nodes = docs.select(F.col("doc_id").alias("id"))
    return dedup_clusters(nodes, edges).select(
        F.col("id").alias("doc_id"), "component_id", "cluster_size",
        "is_canonical",
    )


# --------------------------------------------------------------------------
# crawl-science queries: importance-ordered scheduling, trap detection,
# change-rate-driven re-crawl
# --------------------------------------------------------------------------

# deterministic deep-path URL corpus for trap detection — VALID IN BOTH
# Spark SQL and DuckDB (concat/repeat/CASE/% only). Path-segment
# repetition and a session-id param are the two classic trap signals
# (mirrors the reference's excluded-suffix + blocked-substring hygiene,
# SiteCrawler.java:1152-1217, generalized to score instead of block).
TRAP_URLS_SQL = """
SELECT doc_id,
  concat(
    'https://www.salesforce.com',
    repeat(concat('/', source), 1 + doc_id % 5),
    '/doc', doc_id,
    CASE doc_id % 5 WHEN 0 THEN '.html' WHEN 1 THEN '/' ELSE '.htm' END,
    CASE WHEN doc_id % 4 = 0 THEN concat('?sess=', doc_id % 97)
         WHEN doc_id % 7 = 0 THEN '?a=1&b=2' ELSE '' END
  ) AS url
FROM documents
"""


def q_opic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous OPIC importance (Abiteboul et al., WWW 2003) over the
    same derived link graph as q_pagerank — the crawl-ordering signal
    production crawlers use to pick what to fetch next. Oracle is the
    cash/history recurrence unrolled as SQL CTEs."""
    from sitecrawler_spark.operators.graph import opic

    register_views(spark, sf_dir)
    edges = spark.sql(PAGERANK_EDGES_SQL)
    nodes = spark.table("documents").select(F.col("doc_id").alias("id"))
    return opic(nodes, edges, n_iters=5).select(
        F.col("id").alias("doc_id"), "importance"
    )


def q_url_trap_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap scoring: per-URL structural signals — path depth,
    max repeated path segment (calendar/mirror traps), query-param
    count, session-id param — combined into a deterministic score.
    Entirely map-side (no shuffle): at 10^10 URLs this runs as a
    scan-project with zero exchanges, the shape a frontier-hygiene
    filter must have. All arithmetic is exact binary fractions
    (0.5/0.25 steps over small ints) so no rounding contract is
    needed."""
    register_views(spark, sf_dir)
    urls = spark.sql(TRAP_URLS_SQL)
    path = F.regexp_extract(F.col("url"), r"^[a-z]+://[^/]+(/[^?]*)", 1)
    query = F.regexp_extract(F.col("url"), r"\?(.*)$", 1)
    segs = F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    depth = F.size(segs)
    max_rep = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(segs),
                lambda s: F.size(F.filter(segs, lambda x: x == s)),
            )
        ),
        F.lit(0),
    )
    n_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    has_sess = F.when(query.contains("sess="), F.lit(1)).otherwise(F.lit(0))
    score = (
        0.5 * (max_rep - F.lit(1))
        + 0.25 * F.greatest(depth - F.lit(3), F.lit(0))
        + 0.25 * has_sess
    )
    return urls.select(
        "doc_id",
        "url",
        depth.cast("long").alias("depth"),
        max_rep.cast("long").alias("max_seg_repeat"),
        n_params.cast("long").alias("n_params"),
        has_sess.cast("long").alias("has_session_param"),
        score.alias("trap_score"),
        (score >= 1.0).alias("is_trap"),
    )


def q_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-rate-driven re-crawl scheduling (Cho & Garcia-Molina,
    "Estimating frequency of change", ACM TOIT 2003): from a derived
    per-page fetch history (events → page_id, fetch ts, content
    version), detect changes between consecutive fetches with a lag
    window, then the bias-corrected Poisson estimator
    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) changes-per-fetch-interval and
    a re-crawl interval ∝ 1/λ̂. The ln() argument is a ratio of exact
    half-integers — bit-identical cross-engine — and the output rounds
    6dp.

    Distributed shape: one hash exchange on page_id feeding both the
    lag window and the aggregation (same-key partitioning reused);
    scales as a single pass over the fetch log."""
    register_views(spark, sf_dir)
    ev = spark.table("events")
    # derived fetch history: page = user, content version changes at a
    # page-specific cadence (hours per version = 1 + page_id % 5)
    hist = ev.select(
        F.col("user_id").alias("page_id"),
        F.col("ts"),
        F.floor(
            F.unix_timestamp("ts")
            / (F.lit(3600) * (F.lit(1) + F.col("user_id") % 5))
        ).alias("content_ver"),
    )
    w = Window.partitionBy("page_id").orderBy("ts")
    obs = hist.select(
        "page_id",
        "ts",
        (F.col("content_ver") != F.lag("content_ver").over(w))
        .cast("int")
        .alias("changed"),
    )
    agg = obs.groupBy("page_id").agg(
        F.count("*").alias("n_fetches"),
        F.coalesce(F.sum("changed"), F.lit(0)).alias("n_changes"),
    )
    n_int = F.col("n_fetches") - F.lit(1)  # observed intervals
    lam = -F.log(
        (n_int - F.col("n_changes") + F.lit(0.5)) / (n_int + F.lit(0.5))
    )
    return (
        agg.filter(F.col("n_fetches") >= 3)
        .select(
            "page_id",
            "n_fetches",
            F.col("n_changes").cast("long").alias("n_changes"),
            F.round(lam, 6).alias("lambda_hat"),
            F.round(
                F.when(lam > 0, F.least(F.lit(1.0) / lam, F.lit(1000.0)))
                .otherwise(F.lit(1000.0)),
                6,
            ).alias("recrawl_intervals"),
        )
    )


def q_url_change_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recrawl MODULE's estimator (crawl/recrawl.py —
    change_rates_from_history, the exact code path
    engine.schedule_recrawl runs over the pages fetch log) gated on a
    derived fetch history: events → (full_url, host, wave, fp) with
    wave = fetch epoch second and fp = the page-cadence content
    version (same derivation as q_recrawl_schedule). λ̂ rounds 6dp —
    the ln() argument is a ratio of exact half-integers, bit-identical
    cross-engine. One hash exchange on full_url feeds both the lag
    window and the aggregation."""
    from sitecrawler_spark.crawl.recrawl import change_rates_from_history

    register_views(spark, sf_dir)
    ev = spark.table("events")
    hist = ev.select(
        F.concat(
            F.lit("https://h"), (F.col("user_id") % 37).cast("string"),
            F.lit(".example.com/p"), F.col("user_id").cast("string"),
        ).alias("full_url"),
        F.concat(
            F.lit("h"), (F.col("user_id") % 37).cast("string"),
            F.lit(".example.com"),
        ).alias("host"),
        F.unix_timestamp("ts").alias("wave"),
        F.floor(
            F.unix_timestamp("ts")
            / (F.lit(3600) * (F.lit(1) + F.col("user_id") % 5))
        ).alias("fp"),
    )
    r = change_rates_from_history(hist, min_fetches=3)
    return r.select(
        "full_url", "host", "n_fetches", "n_changes",
        F.round("lambda_hat", 6).alias("lambda_hat"),
    )


# deterministic sitemap-XML corpus — VALID IN BOTH Spark SQL and DuckDB
# (concat/CASE/% only). Two page entries per doc (one fully attributed,
# one loc-only) plus a nested sitemapindex reference every 10th doc.
SITEMAPS_SQL = """
SELECT doc_id,
  concat(
    '<?xml version="1.0" encoding="UTF-8"?><urlset>',
    '<url><loc>https://www.salesforce.com/', source, '/doc', doc_id,
    '.html</loc><lastmod>2024-0', doc_id % 9 + 1, '-1', doc_id % 9,
    '</lastmod><changefreq>',
    CASE doc_id % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
         ELSE 'monthly' END,
    '</changefreq><priority>0.', doc_id % 10, '</priority></url>',
    '<url><loc>https://www.salesforce.com/', source, '/page', doc_id,
    '/</loc></url>',
    CASE WHEN doc_id % 10 = 0
         THEN concat('<sitemap><loc>https://www.salesforce.com/sitemaps/sm',
                     doc_id, '.xml</loc></sitemap>')
         ELSE '' END,
    '</urlset>'
  ) AS xml
FROM documents
"""


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap XML seed ingestion (sources/sitemap.py): explode
    urlset + sitemapindex entries with native regexp — the reference
    README's sitemap seed path (README.md:33). Map-only per record
    kind; the oracle re-parses the same derived XML with DuckDB's
    regexp_extract_all + generate_subscripts."""
    from sitecrawler_spark.sources.sitemap import sitemap_entries

    register_views(spark, sf_dir)
    sitemaps = spark.sql(SITEMAPS_SQL)
    return sitemap_entries(sitemaps, "xml", keep_cols=["doc_id"]).select(
        "doc_id", "kind",
        F.col("pos").cast("long").alias("pos"),
        "loc", "lastmod", "changefreq", "priority",
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023): k-means
    cluster the embeddings (deterministic Lloyd, the already-gated
    trainer), then drop any doc whose cluster contains a more-canonical
    (smaller-id) doc with rounded cosine ≥ 0.4. Pairwise work is
    intra-cluster only — the Σ|cluster|² shape that keeps semantic
    dedup tractable at LAION scale. Oracle: the Lloyd recurrence
    unrolled as SQL CTEs + a within-cluster pair anti-join."""
    from sitecrawler_spark.dedup.ann import semantic_dedup

    register_views(spark, sf_dir)
    emb = spark.table("embeddings").select("vec_id", "embedding")
    kept = semantic_dedup(
        emb, "vec_id", "embedding",
        n_clusters=8, n_iters=2, init_stride=60, threshold=0.4,
    )
    return kept.select(
        "vec_id", F.col("centroid_id").cast("long").alias("centroid_id")
    )


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition rules (Rae et al. 2021, arXiv:2112.11446),
    word-level: duplicate-word fraction, duplicate-3-gram fraction,
    mean word length, stopword hits, and the top-2-gram character
    fraction (most frequent word 2-gram's share of non-space chars —
    computed DISTRIBUTED: explode grams → map-side-combined count →
    per-doc argmax window; ties prefer count desc then gram desc).
    keep = every signal inside its Gopher-style band."""
    from sitecrawler_spark.textops import functions as TX

    register_views(spark, sf_dir)
    docs = spark.table("documents").select("doc_id", "text")
    base = docs.select(
        "doc_id",
        TX.token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
        TX.dup_word_frac(F.col("text")).alias("dup_word_frac"),
        TX.dup_ngram_frac(F.col("text"), 3).alias("dup_3gram_frac"),
        TX.mean_word_len(F.col("text")).alias("mean_word_len"),
        TX.stopword_hits(F.col("text"), "en").cast("long").alias("stop_hits"),
        F.length(
            F.regexp_replace(F.trim(F.col("text")), r"\s", "")
        ).cast("long").alias("n_chars_nospace"),
    )
    grams = docs.select(
        "doc_id", F.explode(TX.word_ngrams(F.col("text"), 2)).alias("gram")
    )
    counts = grams.groupBy("doc_id", "gram").count()
    w = Window.partitionBy("doc_id").orderBy(
        F.col("count").desc(), F.col("gram").desc()
    )
    top = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "doc_id",
            F.col("gram").alias("top_2gram"),
            F.col("count").cast("long").alias("top_2gram_count"),
        )
    )
    j = base.join(top, "doc_id", "left")
    # chars covered by the top 2-gram = count × len(gram without space)
    top_frac = F.round(
        F.coalesce(
            F.col("top_2gram_count")
            * (F.length("top_2gram") - 1).cast("double")
            / F.greatest(F.col("n_chars_nospace"), F.lit(1)).cast("double"),
            F.lit(0.0),
        ),
        6,
    )
    j = j.withColumn("top_2gram_frac", top_frac)
    keep = (
        (F.col("n_tokens") >= 20)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("dup_3gram_frac") <= 0.2)
        & (F.col("top_2gram_frac") <= 0.08)
        & (F.col("stop_hits") >= 2)
    )
    return j.select(
        "doc_id", "n_tokens", "dup_word_frac", "dup_3gram_frac",
        "mean_word_len", "stop_hits", "top_2gram", "top_2gram_count",
        "top_2gram_frac", keep.alias("keep"),
    )


def q_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output sharding (serpentine LPT,
    operators/layout.balanced_shards): rank documents by whitespace
    token count desc and deal them boustrophedon across 8 shards so
    per-shard token totals near-equalize — the training-writer layout
    that keeps every data-parallel reader finishing together. Returns
    the per-shard summary (n_docs, shard_tokens) — all exact integer
    arithmetic, so the DuckDB oracle reproduces the assignment
    bit-for-bit. Scale: ranking is assign_global_order's ranged
    two-pass (no single-partition window); the serpentine map and the
    final 8-group agg are map-side + one tiny exchange."""
    from sitecrawler_spark.operators.layout import balanced_shards
    from sitecrawler_spark.textops.functions import token_count_ws

    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", token_count_ws(F.col("text")).alias("tokens")
    )
    sharded = balanced_shards(docs, "tokens", 8, "doc_id")
    return sharded.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("tokens").cast("long").alias("shard_tokens"),
    )


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over events (user_id × value):
    explicit-bounds quantization + bit interleave as a pure codegen
    integer expression — zero shuffles for the key itself; the layout
    op range-partitions + sorts by it so parquet min/max prune on BOTH
    dimensions (operators/layout.py; Delta OPTIMIZE ZORDER analog).
    Oracle: the identical integer arithmetic unrolled in SQL."""
    from sitecrawler_spark.operators.layout import quantize, zorder_key

    register_views(spark, sf_dir)
    ev = spark.table("events")
    return ev.select(
        "event_id",
        quantize(F.col("user_id"), 0.0, 150.0, 16).alias("ucell"),
        quantize(F.col("value"), 0.0, 500.0, 16).alias("vcell"),
        zorder_key(
            [F.col("user_id"), F.col("value")],
            [(0.0, 150.0), (0.0, 500.0)], 16,
        ).alias("zkey"),
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis,
    IPL 2006): per-language top-3 docs by key = ln(u)/w with
    w = n_chars and u a portable-hash uniform — heavier docs win more
    often, yet the draw is deterministic and reproducible across
    engines AND cluster sizes (no RNG state, unlike sample()/
    rand(seed) which are partition-layout dependent). Key rounded 9dp
    (libm-ulp guard), ties break by doc_id."""
    register_views(spark, sf_dir)
    m = float(1 << 40)
    h = K.portable_hash64(F.col("doc_id").cast("string"))
    u = (F.pmod(h, F.lit(1 << 40)).cast("double") + F.lit(1.0)) / F.lit(
        m + 1.0
    )
    key = F.round(F.log(u) / F.col("n_chars").cast("double"), 9)
    d = spark.table("documents").select(
        "lang", "doc_id", "n_chars", key.alias("es_key")
    )
    w = Window.partitionBy("lang").orderBy(F.col("es_key").desc(), "doc_id")
    return (
        d.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("lang", "doc_id", "n_chars", "es_key", "rk")
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., NeurIPS 2023): hashed
    unigram+bigram importance log-weights of every RAW doc against the
    TARGET slice (doc_id % 13 == 0), then Gumbel-top-k resampling
    without replacement — sel_key = logw + Gumbel(0,1), with the
    Gumbel draw derived from a portable-hash uniform so the resample
    is deterministic and engine/partition-layout independent (the
    q_weighted_sample rationale). All arithmetic lands in integer
    micro-units before summing/comparison. Top 64 raw docs by
    sel_key — a TakeOrderedAndProject, never a single-partition
    window."""
    from sitecrawler_spark.textops.functions import dsir_logweights

    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", "text", (F.col("doc_id") % 13 == 0).alias("is_target")
    )
    lw = dsir_logweights(docs, "text", "doc_id", "is_target")
    m = float(1 << 40)
    h = K.portable_hash64(F.concat(F.lit("dsir|"), F.col("id").cast("string")))
    u = (F.pmod(h, F.lit(1 << 40)).cast("double") + F.lit(1.0)) / F.lit(
        m + 1.0
    )
    g_micro = F.round(-F.log(-F.log(u)) * 1e6).cast("long")
    return (
        lw.filter(~F.col("is_target"))
        .select(
            F.col("id").alias("doc_id"),
            "logw_micro",
            (F.col("logw_micro") + g_micro).alias("sel_key"),
        )
        .orderBy(F.col("sel_key").desc(), "doc_id")
        .limit(64)
    )


# Shared train hyperparameters for q_quality_classifier — the oracle
# generator (oracles.logreg_oracle) reads THESE, so query and oracle
# cannot drift (the bm25_oracle rationale from ADVICE r04).
QUALITY_CLF = {"n_buckets": 1024, "n_iters": 8, "lr": 2.0}


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality-classifier filter (GPT-3 Appendix A / fastText):
    hashed-unigram logistic regression trained by distributed batch GD
    to separate English docs (y = lang='en') from the rest, then every
    doc scored under the final weights. The ORACLE re-runs the whole
    training loop as unrolled SQL CTEs — the gate pins the trainer, not
    just the scorer (the q_ann_kmeans precedent for iterative fits).
    All sums are exact integer micro-units; the only float op is the
    per-doc sigmoid, rounded straight back to a long (classifier.py's
    determinism contract)."""
    from sitecrawler_spark.textops.classifier import train_logreg_hashed

    register_views(spark, sf_dir)
    docs = spark.table("documents").select(
        "doc_id", "text", (F.col("lang") == "en").alias("is_en")
    )
    _, scored = train_logreg_hashed(
        docs, "text", "is_en", "doc_id", **QUALITY_CLF
    )
    return scored.select(
        F.col("id").alias("doc_id"), "y", "margin_micro", "pred"
    )


def q_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the trained quality classifier against its
    labels — integer counts per (y, pred) cell, the evaluation loop
    that belongs beside any trained filter. Oracle = q_quality_
    classifier's full unrolled training CTE wrapped in one GROUP BY."""
    return (
        q_quality_classifier(spark, sf_dir)
        .groupBy("y", "pred")
        .agg(F.count("*").cast("long").alias("n"))
    )


def bpe_corpus() -> list[tuple[str, int]]:
    """Deterministic synthetic word-frequency corpus for the BPE gate —
    sf-independent shared INPUT (the crawl_e2e synthetic-site pattern;
    the training computation in engine and oracle stays independent).
    Words are base-4 digit strings over 'abcd' with Zipf-ish repeated
    substructure, so merges have real signal."""
    agg: dict[str, int] = {}
    for i in range(150):
        n = 3 + (i % 4)
        w = "".join("abcd"[(i // (4 ** k)) % 4] for k in range(n))
        agg[w] = agg.get(w, 0) + 1 + (i * i) % 10
    return sorted(agg.items())


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al., ACL 2016;
    textops/tokenizer.py): 12 merges over the synthetic word-frequency
    corpus; gated on the FINAL SEGMENTATION of every word — any wrong
    pair count, argmax tie-break, or greedy merge application at any
    iteration changes downstream segmentations. Oracle: an independent
    textbook Python BPE rendered as a VALUES literal (the cyclic
    train loop is not SQL-expressible)."""
    from sitecrawler_spark.textops.tokenizer import bpe_train

    words = spark.createDataFrame(bpe_corpus(), "word string, freq long")
    merges, seg = bpe_train(words, 12)
    return seg.select(
        "word", "freq", F.array_join("sym", " ").alias("seg")
    )


# --- round 4c: interleaved-payload pipeline ops ----------------------------


def _span_kind_counts(n):
    """Span-kind counts for the deterministic token→span rule used by
    q_span_media_align (offset i: i%5==0 → anchor, elif i%7==0 → media,
    else text), in closed form over a token count ``n`` so both the
    Spark plan and the DuckDB oracle compute them without exploding:
    multiples of k in [0, n-1] = floor((n-1)/k) + 1."""
    n_anchor = F.floor((n - 1) / 5) + 1
    n_media = (F.floor((n - 1) / 7) + 1) - (F.floor((n - 1) / 35) + 1)
    return n_anchor.cast("long"), n_media.cast("long")


def q_interleaved_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal sequence packing over the interleaved span model
    (input_hint shape): each doc's cost is its text/anchor spans at one
    token each plus a fixed 16-patch-token budget per media span (the
    vision-encoder placeholder convention), then docs pack into
    512-token training sequences per source in doc_id order (same
    first-token rule as q_sequence_packing). Span-kind counts are
    closed-form arithmetic — the whole per-doc stage is map-side, and
    the only exchange is the per-source packing window reused by the
    final groupBy."""
    register_views(spark, sf_dir)
    B, PATCH = 512, 16
    n = F.size(F.split(F.col("text"), " "))
    d = spark.table("documents").select("doc_id", "source", n.alias("ntok"))
    _, n_media = _span_kind_counts(F.col("ntok"))
    d = d.withColumn("n_media", n_media).withColumn(
        "cost", (F.col("ntok") - F.col("n_media")) + PATCH * F.col("n_media")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = d.withColumn("cum_before", F.sum("cost").over(w) - F.col("cost"))
    return (
        c.groupBy(
            "source", F.floor(F.col("cum_before") / B).cast("long").alias("seq_id")
        )
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("ntok") - F.col("n_media")).cast("long").alias("text_tokens"),
            F.sum(PATCH * F.col("n_media")).cast("long").alias("media_tokens"),
            F.sum("n_media").cast("long").alias("n_media"),
        )
    )


def q_span_reconstruct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved-document round-trip: render each doc's span sequence
    (kind, text, media_ref, offset) to a sentinel-token string —
    anchors as [tok], media as <|media:ref://tok|>, text verbatim —
    and verify the rendering is lossless by stripping the sentinels
    back off and comparing to the source text. This gates the north
    rule's per-row invariant (span-sequence equality: kind, text,
    media_ref, order) INSIDE the driver hash: any kind misclassify,
    reorder, or dropped span flips roundtrip_ok / recon_hash. Entirely
    array-native per row — zero shuffles, zero explodes; at 100 TB this
    is a map-only pass."""
    register_views(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    rend = F.transform(
        toks,
        lambda x, i: F.when(i % 5 == 0, F.concat(F.lit("["), x, F.lit("]")))
        .when(i % 7 == 0, F.concat(F.lit("<|media:ref://"), x, F.lit("|>")))
        .otherwise(x),
    )
    recon = F.array_join(rend, " ")
    n = F.size(toks)
    _, n_media = _span_kind_counts(n)
    stripped = F.replace(
        F.replace(
            F.replace(
                F.replace(recon, F.lit("<|media:ref://"), F.lit("")),
                F.lit("|>"),
                F.lit(""),
            ),
            F.lit("["),
            F.lit(""),
        ),
        F.lit("]"),
        F.lit(""),
    )
    return spark.table("documents").select(
        "doc_id",
        n.cast("long").alias("n_spans"),
        n_media.alias("n_media"),
        (stripped == F.col("text")).alias("roundtrip_ok"),
        K.portable_hash64(recon).alias("recon_hash"),
    )


def synthetic_doc_lines(docs: DataFrame, line_tokens: int = 8) -> DataFrame:
    """Deterministic doc→lines fixture shared by the line-granular gates
    (q_boilerplate_strip, q_line_dedup): a per-source nav header, the
    doc's 8-token text chunks, and a per-source footer — so cross-doc
    duplicate lines exist at every sf. Map-only (posexplode); returns
    (doc_id, source, line_id, line_text). Mirrored verbatim by the `la`
    CTE in both oracles."""
    L = line_tokens
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(L)).cast("int")
    chunk_lines = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda g: F.array_join(F.slice(toks, g * L + 1, L), " "),
    )
    hdr = F.concat_ws(" ", F.lit("nav"), F.col("source"), F.lit("home login"))
    ftr = F.concat_ws(
        " ", F.lit("footer"), F.col("source"), F.lit("copyright contact")
    )
    lines = F.concat(F.array(hdr), chunk_lines, F.array(ftr))
    return docs.select(
        "doc_id", "source", F.posexplode(lines).alias("line_id", "line_text")
    )


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-level keep-first dedup (CCNet, Wenzek et al.,
    LREC 2020 §3.1) over the shared synthetic line fixture: across the
    WHOLE corpus each distinct line survives only at its first
    (doc_id, line_id) occurrence — every later nav header, footer, and
    repeated text chunk is dropped, regardless of host. Per-doc
    summary: n_lines, n_kept, and a bit_xor hash of the kept
    (line_id, line_text) payload so the gate pins exactly WHICH lines
    survive, not just how many.

    Plan (see dedup.line_dedup_keep_first): one map-side-combined
    groupBy(line_hash).min(struct) — a line repeated 10^6 times costs
    one shuffle row per partition — then a long-keyed join back and one
    per-doc agg. No windows over the line hash."""
    from sitecrawler_spark.dedup.dedup import line_dedup_keep_first

    register_views(spark, sf_dir)
    ex = synthetic_doc_lines(spark.table("documents"))
    flagged = line_dedup_keep_first(ex)
    kept_hash = F.when(
        F.col("keep"),
        K.portable_hash64(
            F.concat(
                F.col("line_id").cast("string"), F.lit(":"), F.col("line_text")
            )
        ),
    )
    return (
        flagged.withColumn("_khash", kept_hash)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.expr("bit_xor(_khash)").alias("kept_hash"),
        )
    )


def q_exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr dedup (Lee et al., ACL 2022 §4.1) at 8-token-gram
    granularity over the documents table: every duplicated token run
    of length ≥ 8 is marked for removal at all but its lexicographic-
    first occurrence; overlapping/adjacent marks merge into maximal
    per-doc islands. Output = one row per island (doc_id, island,
    start, end) — pinning exact removal boundaries, not just counts.
    The fixture has ~1000 naturally duplicated 8-grams (repeated
    passages across docs), so the gate exercises real cross-doc and
    within-doc repeats. Plan (dedup.exact_substring_spans): map-side
    rolling fingerprints, one fp agg with map-side combine, join back
    restricted to duplicated fps only, per-doc island-merge window."""
    from sitecrawler_spark.dedup.dedup import exact_substring_spans

    register_views(spark, sf_dir)
    islands = exact_substring_spans(
        spark.table("documents"), "text", "doc_id", l_tokens=8
    )
    return islands.select(
        F.col("id").alias("doc_id"),
        F.col("island").cast("long").alias("island"),
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
    )


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host boilerplate line removal (the C4/RefinedWeb chrome
    strip): a doc's lines are a synthetic per-source nav header, its
    8-token text chunks, and a per-source footer; a line is boilerplate
    on a host when it appears in >20% of the host's docs (integer
    arithmetic: 5*n_docs_line > host_docs — float-free, portable) and
    in at least 3 docs. Plan: map-side line build + explode, one
    (source, line) agg for line frequencies, a broadcast of the tiny
    per-host doc counts, one shuffle join back, one per-doc agg —
    frequencies key on (host, line) so a globally common line never
    concentrates on one reducer at 100 TB."""
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    ex = synthetic_doc_lines(docs)
    stats = ex.groupBy("source", "line_text").agg(
        F.count_distinct("doc_id").alias("n_docs_line")
    )
    hostc = docs.groupBy("source").agg(
        F.count_distinct("doc_id").alias("host_docs")
    )
    flagged = (
        stats.join(F.broadcast(hostc), "source")
        .filter(
            (F.col("n_docs_line") >= 3)
            & (5 * F.col("n_docs_line") > F.col("host_docs"))
        )
        .select("source", "line_text", F.lit(True).alias("_bp"))
    )
    kept_hash = F.when(
        F.col("_bp").isNull(),
        K.portable_hash64(
            F.concat(F.col("line_id").cast("string"), F.lit(":"), F.col("line_text"))
        ),
    )
    return (
        ex.join(flagged, ["source", "line_text"], "left")
        .withColumn("_khash", kept_hash)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(F.col("_bp").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.expr("bit_xor(_khash)").alias("kept_hash"),
        )
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (email + IPv4 redaction with match counts), the
    standard pre-training privacy pass. PII is synthesised
    deterministically per doc (the corpus text itself is clean words)
    so the gate exercises real match/replace behavior on both engines.
    Single regexp pass per pattern, map-only — no shuffle at any
    scale; regex stays off the crawl hot path by design."""
    register_views(spark, sf_dir)
    d = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            d % 3 != 0,
            F.concat(
                F.lit(" contact user"),
                (d % 97).cast("string"),
                F.lit("@ex"),
                (d % 7).cast("string"),
                F.lit(".com"),
            ),
        ).otherwise(F.lit(" contact none")),
        F.when(
            d % 4 != 0,
            F.concat(
                F.lit(" from 10."),
                (d % 256).cast("string"),
                F.lit(".0."),
                (d % 100).cast("string"),
            ),
        ).otherwise(F.lit(" from nowhere")),
        F.when(d % 5 == 0, F.lit(" cc admin@site.org")).otherwise(F.lit("")),
    )
    EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
    red = F.regexp_replace(
        F.regexp_replace(aug, EMAIL, "<EMAIL>"), IP, "<IP>"
    )
    return spark.table("documents").select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(IP), F.lit(0)))
        .cast("long")
        .alias("n_ips"),
        K.portable_hash64(red).alias("red_hash"),
    )


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch percentiles (p50/p90/p99 of event value per
    type) — the constant-state alternative to q_events_quantiles'
    exact sort: one map-side-combined (type, bin) count (≤256 rows per
    key cross the exchange) + a window over the tiny sketch. Rank
    targets are pure integer arithmetic; only the within-bin
    interpolation touches floats (6dp-rounded). At 100 TB the exact
    percentile is a full shuffle-sort per key; this is one scan."""
    from sitecrawler_spark.sketches import hist_build, hist_quantiles

    register_views(spark, sf_dir)
    LO, HI, NB = 0.0, 640.0, 256  # width 2.5 — exact binary fraction
    ev = spark.table("events")
    h = hist_build(ev, "value", LO, HI, NB, keys=("event_type",))
    return hist_quantiles(
        h,
        [("p50", 50, 100), ("p90", 90, 100), ("p99", 99, 100)],
        LO, HI, NB, keys=("event_type",),
    )


def q_anchor_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text index (the classic web-search ranking signal:
    Brin & Page 1998 §2.2 — text of inlink anchors describes the
    TARGET page): each doc's anchor spans (the span model's i%5==0
    tokens) travel along its two deterministic outlinks (the
    q_referrer_agg edge rule); per destination, the index row is the
    sorted distinct anchor vocabulary of all inlinks. Anchor arrays
    are built map-side from the span rule (array filter — no
    explode); the per-dst agg flattens ≤ inlink-count small arrays,
    and sort+distinct normalizes collect order so the result is
    layout-independent. Hot pages (many inlinks) are the skew case:
    vocabulary is capped at 64 terms after sort (mirrored in the
    oracle) so a 10^8-inlink homepage cannot blow a reducer."""
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    toks = F.split(F.col("text"), " ")
    anchors = F.filter(toks, lambda x, i: i % 5 == 0)
    d = docs.select("doc_id", anchors.alias("anchor_toks"))
    nd = d.agg((F.max("doc_id") + 1).alias("_n"))
    a = d.crossJoin(F.broadcast(nd))
    ids = docs.select(F.col("doc_id").alias("dst_id"))
    e1 = a.join(ids, F.col("dst_id") == (a["doc_id"] * 7 + 3) % F.col("_n"))
    e2 = a.join(ids, F.col("dst_id") == (a["doc_id"] * 3 + 1) % F.col("_n"))
    edges = e1.unionByName(e2).select("dst_id", "anchor_toks")
    return (
        edges.groupBy("dst_id")
        .agg(
            F.count("*").cast("long").alias("n_inlinks"),
            F.slice(
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("anchor_toks")))
                ),
                1,
                64,
            ).alias("_terms"),
        )
        .select(
            "dst_id",
            "n_inlinks",
            F.array_join("_terms", " ").alias("anchor_terms"),
        )
    )


def q_mirror_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-mirror detection (Bharat & Broder 1999: mirrored hosts
    serve the same content under different names — a crawler that
    misses them fetches everything twice): a deterministic mirrored
    corpus (docs with doc_id%3==0 are republished under
    'mirror-of-<source>' (3 ⊥ 20 sources, so EVERY host is partially
    mirrored)) is fingerprinted per doc; host pairs are
    joined on content fingerprint and flagged when they share ≥ 3
    docs. The fingerprint join is the whole cost: keyed on the hash,
    so identical content concentrates per fingerprint — a single hot
    fingerprint (empty page, soft-404 template, cookie-wall chrome
    shared by 10^5 hosts) would make 10^10 join pairs, so buckets
    larger than ``MIRROR_FP_BUCKET_CAP`` are pre-counted and dropped
    BEFORE the self-join (winnow_pairs' guard, dedup/dedup.py:406 —
    boilerplate that common is the exact-dup path's job, not mirror
    evidence). The cap is mirrored in the oracle and provably inert
    at gate scale (tests/test_plans.py pins max bucket < cap); the
    per-pair agg is tiny. Output ratio uses integer doc counts —
    float-free ordering."""
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    base = docs.select("source", "doc_id", K.portable_hash64(F.col("text")).alias("fp"))
    mirrored = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(
            F.concat(F.lit("mirror-of-"), F.col("source")).alias("source"),
            "doc_id",
            K.portable_hash64(F.col("text")).alias("fp"),
        )
    )
    corpus = base.unionByName(mirrored)
    hostn = corpus.groupBy("source").agg(F.count("*").alias("n_docs"))
    sizes = corpus.groupBy("fp").agg(F.count("*").alias("_bn"))
    capped = (
        corpus.join(sizes, "fp")
        .filter(F.col("_bn") <= MIRROR_FP_BUCKET_CAP)
        .drop("_bn")
    )
    a = capped.select(F.col("source").alias("host_a"), "fp")
    b = capped.select(F.col("source").alias("host_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count("*").cast("long").alias("shared_docs"))
        .filter(F.col("shared_docs") >= 3)
    )
    return (
        shared.join(
            F.broadcast(hostn.select(F.col("source").alias("host_a"),
                                     F.col("n_docs").alias("docs_a"))),
            "host_a",
        )
        .join(
            F.broadcast(hostn.select(F.col("source").alias("host_b"),
                                     F.col("n_docs").alias("docs_b"))),
            "host_b",
        )
        .select(
            "host_a", "host_b", "shared_docs", "docs_a", "docs_b",
            F.round(
                F.col("shared_docs")
                / F.least(F.col("docs_a"), F.col("docs_b")),
                6,
            ).alias("overlap"),
        )
    )


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-seeded training-order shuffle: position =
    rank of the 60-bit portable hash of 'epoch-1:<doc_id>'. A new
    epoch is a new salt string — the corpus is re-permuted without
    rewriting a byte, and any worker can recompute its slice's order
    independently (no stored permutation table). The only exchange is
    assign_global_order's ranged two-pass rank (operators/ordering.py)
    — never a single-partition window at scale. Oracle: row_number
    over the same md5-derived key in DuckDB."""
    from sitecrawler_spark.operators.ordering import assign_global_order

    register_views(spark, sf_dir)
    keyed = spark.table("documents").select(
        "doc_id",
        K.portable_hash64(
            F.concat(F.lit("epoch-1:"), F.col("doc_id").cast("string"))
        ).alias("_k"),
    )
    return assign_global_order(
        keyed, ["_k", "doc_id"], out_col="position", start=1
    ).select("doc_id", "position")


def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility / compression eval (the
    standard subword-tokenizer quality metrics: subword tokens per
    whitespace word, bytes per subword token). Sums are exact integer
    partial aggregates — one tiny shuffle keyed by lang with map-side
    combine; each ratio is ONE IEEE division of exact integers rounded
    to integer micro-units, bit-portable cross-engine."""
    from sitecrawler_spark.textops import functions as TX

    register_views(spark, sf_dir)
    agg = spark.table("documents").groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(TX.token_count_ws(F.col("text"))).alias("ws_tokens"),
        F.sum(TX.token_count_bpe(F.col("text"))).alias("bpe_tokens"),
        F.sum(F.octet_length("text")).alias("text_bytes"),
    )
    one = F.lit(1).cast("long")
    return agg.select(
        "lang", "n_docs", "ws_tokens", "bpe_tokens", "text_bytes",
        F.round(
            F.col("bpe_tokens") * 1_000_000.0
            / F.greatest(F.col("ws_tokens"), one)
        ).cast("long").alias("fertility_micro"),
        F.round(
            F.col("text_bytes") * 1_000_000.0
            / F.greatest(F.col("bpe_tokens"), one)
        ).cast("long").alias("bytes_per_token_micro"),
    )


def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level quality filtering (the FineWeb/RefinedWeb
    domain-blocklist derivation): per-source mean document quality in
    exact integer micro-units; a source is blocked when it has enough
    evidence (n_docs >= 10) and its mean falls below 4/5 of the
    corpus-wide mean. The comparison is an all-integer cross-multiply
    (sum_q*total_n*5 < total_q*n*4), so the flag is exact in both
    engines. Plan: one partial-agg shuffle keyed by source + a
    broadcast crossJoin of the 1-row corpus total (an aggregate frame,
    never a data cartesian). engine.schedule_quality_blocklist closes
    the crawl-side loop at host grain
    (test_quality_blocklist_closed_loop)."""
    from sitecrawler_spark.textops import functions as TX

    register_views(spark, sf_dir)
    q = spark.table("documents").select(
        "source",
        F.round(TX.quality_score(F.col("text")) * 10000)
        .cast("long").alias("q_micro"),
    )
    per = q.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("q_micro").alias("sum_q_micro")
    )
    tot = q.agg(F.count("*").alias("_tn"), F.sum("q_micro").alias("_tq"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source", "n_docs", "sum_q_micro",
        F.round(F.col("sum_q_micro") / (F.col("n_docs") * 10000.0), 4)
        .alias("mean_quality"),
        (
            (F.col("n_docs") >= 10)
            & (F.col("sum_q_micro") * F.col("_tn") * 5
               < F.col("_tq") * F.col("n_docs") * 4)
        ).alias("blocked"),
    )


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC between two corpus epochs (the Iceberg
    changelog-scan analog; engine.diff_crawl_snapshots is the crawl-
    table twin over real time-travel reads). Epoch 2 is derived
    DETERMINISTICALLY from the documents table — docs with
    doc_id%7==0 removed, text rewritten for doc_id%5==0, clones with
    doc_id+1000000 added for doc_id%11==0 — same derivation in the
    DuckDB oracle. Each side carries only (doc_id, 60-bit content
    fingerprint), so the ONE full-outer sort-merge join never moves
    text payloads; classification is a null/compare case over the two
    fp columns."""
    register_views(spark, sf_dir)
    docs = spark.table("documents")
    e1 = docs.select(
        "doc_id", K.portable_hash64(F.col("text")).alias("_fp_old")
    )
    e2 = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        K.portable_hash64(
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit("v2:"), F.col("text")),
            ).otherwise(F.col("text"))
        ).alias("_fp_new"),
    )
    added = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        K.portable_hash64(F.concat(F.lit("new:"), F.col("text"))).alias(
            "_fp_new"
        ),
    )
    j = e1.join(e2.unionByName(added), "doc_id", "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") != F.col("_fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select("doc_id", status.alias("status"))
