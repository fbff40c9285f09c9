"""Referrer-graph operators.

The reference keeps a global ``urlFrom: target → set(sources)`` map
(ProcessPage.java:93, updated :257-263, redirect propagation :373-376).
Spark-native: the ``links`` edge table IS the graph; the urlFrom view is
a ``collect_set`` aggregation, broadcast when joined back to pages."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def referrer_sets(links: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """dst → sorted referrer set (+count). Sorted so results are
    deterministic and hash-comparable."""
    return links.groupBy(F.col(dst).alias("dst")).agg(
        F.count_distinct(F.col(src)).alias("n_referrers"),
        F.array_join(F.array_sort(F.collect_set(F.col(src))), ",").alias("referrers"),
    )


def join_referrers(pages: DataFrame, links: DataFrame, url_col: str = "full_url") -> DataFrame:
    """pages + their referrer sets (what plugins receive,
    ProcessPage.java:218,276). Broadcast the agg when small."""
    refs = referrer_sets(links)
    return pages.join(refs, pages[url_col] == refs.dst, "left").drop("dst")


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iters: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank over the crawl link graph — the standard
    post-crawl link-analysis op (Page et al., "The PageRank citation
    ranking", Stanford 1999). r₀ = 1/N; rₖ₊₁(v) = (1−d)/N +
    d·Σ_{u→v} rₖ(u)/out(u). Dangling-node mass vanishes (simplified
    variant, documented to match the oracle exactly).

    Distributed shape per iteration: one join of ranks onto edge
    sources (shuffle on src) + one groupBy(dst).sum with map-side
    combine — identical cost profile to the components rounds.
    ``localCheckpoint`` per iteration cuts lineage. Fixed n_iters (no
    convergence check) keeps the plan deterministic and the oracle
    expressible as unrolled SQL CTEs. Returns (id, rank) rounded 6dp."""
    n = nodes.count()
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # out-degree rides along with every rank row so the per-iteration
    # join is single (ranks ⋈ edges), not double
    ranks = (
        nodes.select(F.col(id_col).alias("id"))
        .join(deg, F.col("id") == F.col("src"), "left")
        .select(
            "id",
            F.lit(1.0 / n).alias("rank"),
            F.coalesce(F.col("out_deg"), F.lit(0)).alias("out_deg"),
        )
        .localCheckpoint(eager=True)
    )
    base = 1.0 - damping
    for _ in range(n_iters):
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .select(F.col("dst"), (F.col("rank") / F.col("out_deg")).alias("c"))
        )
        sums = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            ranks.join(sums, ranks.id == sums.dst, "left")
            .select(
                "id",
                (F.lit(base / n)
                 + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                 ).alias("rank"),
                "out_deg",
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def host_pagerank(links: DataFrame, n_iters: int = 5) -> DataFrame:
    """Host-level PageRank over a crawl's links table (src, dst full
    URLs): collapse URLs to hosts, drop self-loops, rank the host
    graph. The standard crawl-scheduling signal — feed the result into
    the next crawl as ``frontier_priority="host_score"`` (via
    cfg.host_scores for small host sets, or engine.set_host_scores_df
    for web-scale host counts). Returns (host, rank)."""
    from sitecrawler_spark.kernel import urls_spark as K

    e = (
        links.filter(F.col("src").isNotNull())
        .select(
            K.url_host(F.col("src")).alias("src"),
            K.url_host(F.col("dst")).alias("dst"),
        )
        .filter((F.col("src") != F.col("dst"))
                & (F.col("src") != "") & (F.col("dst") != ""))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    pr = pagerank(nodes, e, n_iters=n_iters)
    return pr.select(F.col("id").alias("host"), "rank")


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iters: int = 5,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg, "Authoritative sources in a
    hyperlinked environment", JACM 1999) — the hub/authority complement
    to PageRank for crawl link analysis: authority(v) = Σ_{u→v} hub(u),
    hub(u) = Σ_{u→v} authority(v), each pass normalized by its MAX
    (max-normalization keeps the divisor one of the summed values —
    friendlier cross-engine than an L2 sqrt) and rounded to 9dp so the
    unrolled-SQL oracle reproduces the fixpoint bit-for-bit.

    Distributed shape per half-iteration: one join of scores onto edge
    endpoints (shuffle on the edge key) + one groupBy.sum with map-side
    combine — the pagerank cost profile, twice per iteration.
    ``localCheckpoint`` per iteration cuts lineage. Returns
    (id, hub, authority) rounded 6dp."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    ids = nodes.select(F.col(id_col).alias("id"))
    scores = ids.select(
        "id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
    ).localCheckpoint(eager=True)
    for _ in range(n_iters):
        a_raw = (
            e.join(scores, e.src == scores.id)
            .groupBy("dst").agg(F.sum("hub").alias("s"))
        )
        amax = a_raw.agg(F.max("s").alias("m"))
        auth = (
            ids.join(a_raw, ids.id == a_raw.dst, "left")
            .crossJoin(F.broadcast(amax))
            .select(
                "id",
                F.round(
                    F.coalesce(F.col("s"), F.lit(0.0)) / F.col("m"), 9
                ).alias("auth"),
            )
        )
        h_raw = (
            e.join(auth, e.dst == auth.id)
            .groupBy("src").agg(F.sum("auth").alias("s"))
        )
        hmax = h_raw.agg(F.max("s").alias("m"))
        hub = (
            ids.join(h_raw, ids.id == h_raw.src, "left")
            .crossJoin(F.broadcast(hmax))
            .select(
                "id",
                F.round(
                    F.coalesce(F.col("s"), F.lit(0.0)) / F.col("m"), 9
                ).alias("hub"),
            )
        )
        scores = (
            hub.join(auth.withColumnRenamed("id", "_aid"),
                     hub.id == F.col("_aid"))
            .select("id", "hub", "auth")
            .localCheckpoint(eager=True)
        )
    return scores.select(
        "id", F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("authority"),
    )


def opic(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    n_iters: int = 5,
) -> DataFrame:
    """Fixed-iteration synchronous OPIC — On-line Page Importance
    Computation (Abiteboul, Preda & Cobéna, "Adaptive on-line page
    importance computation", WWW 2003) — the crawl-ORDERING importance
    signal: unlike PageRank it needs no damping and converges while the
    crawl is still running, which is why production crawlers use it to
    pick what to fetch next. Each node starts with cash 1/N; per
    iteration every node banks its cash into its history then
    distributes it equally over its out-links, with dangling-node cash
    redistributed uniformly (total cash is conserved at 1.0 every
    step). importance = (history + cash) / (n_iters + 1), i.e. the
    time-averaged cash flow.

    Cash is rounded to 9dp per iteration (the hits() contract) so the
    unrolled-SQL oracle reproduces the fixpoint exactly. Distributed
    shape per iteration: one join of cash onto edge sources (shuffle on
    src) + one groupBy(dst).sum with map-side combine + a broadcast
    1-row dangling-mass frame — no driver-side collect in the loop.
    ``localCheckpoint`` per iteration cuts lineage. Returns
    (id, importance) rounded 6dp."""
    n = nodes.count()
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    state = (
        nodes.select(F.col(id_col).alias("id"))
        .join(deg, F.col("id") == F.col("src"), "left")
        .select(
            "id",
            F.round(F.lit(1.0 / n), 9).alias("cash"),
            F.lit(0.0).alias("hist"),
            F.coalesce(F.col("out_deg"), F.lit(0)).alias("out_deg"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(n_iters):
        contribs = (
            e.join(state, e.src == state.id)
            .select(F.col("dst"), (F.col("cash") / F.col("out_deg")).alias("c"))
        )
        sums = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        dang = state.filter(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("cash"), F.lit(0.0)).alias("d")
        )
        state = (
            state.join(sums, state.id == sums.dst, "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                F.round(
                    F.coalesce(F.col("s"), F.lit(0.0))
                    + F.col("d") / F.lit(float(n)),
                    9,
                ).alias("cash"),
                F.round(F.col("hist") + F.col("cash"), 9).alias("hist"),
                "out_deg",
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "id",
        F.round((F.col("hist") + F.col("cash")) / F.lit(float(n_iters + 1)), 6)
        .alias("importance"),
    )


def host_opic(links: DataFrame, n_iters: int = 5) -> DataFrame:
    """Host-level OPIC over a crawl's links table — the same
    collapse-to-hosts graph as host_pagerank but scored with the
    crawl-ordering OPIC importance (opic() above). Feed the result into
    frontier_priority="host_score" via engine.set_host_scores_df.
    Returns (host, rank)."""
    from sitecrawler_spark.kernel import urls_spark as K

    e = (
        links.filter(F.col("src").isNotNull())
        .select(
            K.url_host(F.col("src")).alias("src"),
            K.url_host(F.col("dst")).alias("dst"),
        )
        .filter((F.col("src") != F.col("dst"))
                & (F.col("src") != "") & (F.col("dst") != ""))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    return opic(nodes, e, n_iters=n_iters).select(
        F.col("id").alias("host"), F.col("importance").alias("rank")
    )

def trustrank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iters: int = 5,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, "Combating web
    spam with TrustRank", VLDB 2004, §4.3): biased PageRank whose
    teleport vector is uniform over a trusted seed set instead of over
    all pages — t₀ = d, tₖ₊₁ = α·T·tₖ + (1−α)·d, where d(v) = 1/|S|
    for seeds and 0 elsewhere. Trust decays with link distance from
    the seeds, so link-spam neighborhoods with no inlink path from a
    trusted page receive no teleport mass and starve toward 0 — the
    crawl-side spam/quality prior that complements OPIC's pure
    importance ordering.

    Distributed shape: identical per-iteration cost to pagerank()
    above — ONE join of the trust frame onto edge sources (shuffle on
    src) + ONE groupBy(dst).sum with map-side combine. The static
    teleport mass d rides the trust frame the way out_deg does, so no
    per-iteration seed join exists; the seed indicator is applied once
    at setup via a broadcast join (seed sets are small by construction
    — the paper's oracle-labeled pages). localCheckpoint per iteration
    cuts lineage. Fixed n_iters keeps the plan deterministic and the
    oracle expressible as unrolled SQL CTEs (oracles.trustrank_oracle).
    Returns (id, trust) rounded 6dp."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    s = seeds.select(F.col(seeds.columns[0]).alias("sid")).distinct()
    n_seeds = s.count()
    if n_seeds == 0:
        raise ValueError("trustrank needs a non-empty seed set")
    d0 = F.when(F.col("sid").isNotNull(), F.lit(1.0 / n_seeds)).otherwise(
        F.lit(0.0)
    )
    trust = (
        nodes.select(F.col(id_col).alias("id"))
        .join(deg, F.col("id") == F.col("src"), "left")
        .join(F.broadcast(s), F.col("id") == F.col("sid"), "left")
        .select(
            "id",
            d0.alias("d"),
            d0.alias("trust"),
            F.coalesce(F.col("out_deg"), F.lit(0)).alias("out_deg"),
        )
        .localCheckpoint(eager=True)
    )
    base = 1.0 - damping
    for _ in range(n_iters):
        contribs = (
            e.join(trust, e.src == trust.id)
            .select(F.col("dst"), (F.col("trust") / F.col("out_deg")).alias("c"))
        )
        sums = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        trust = (
            trust.join(sums, trust.id == sums.dst, "left")
            .select(
                "id",
                "d",
                (F.lit(base) * F.col("d")
                 + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                 ).alias("trust"),
                "out_deg",
            )
            .localCheckpoint(eager=True)
        )
    return trust.select("id", F.round("trust", 6).alias("trust"))


def host_trustrank(
    links: DataFrame, seed_hosts: DataFrame, n_iters: int = 5
) -> DataFrame:
    """Host-level TrustRank over a crawl's links table — the same
    collapse-to-hosts graph as host_pagerank, teleporting only to the
    trusted seed hosts. Feed the result into
    frontier_priority="host_score" via engine.set_host_scores_df to
    bias the NEXT crawl's politeness dequeue toward trusted
    neighborhoods and away from spam farms (the closed crawl → rank →
    re-crawl loop, anti-spam edition). Returns (host, rank)."""
    from sitecrawler_spark.kernel import urls_spark as K

    e = (
        links.filter(F.col("src").isNotNull())
        .select(
            K.url_host(F.col("src")).alias("src"),
            K.url_host(F.col("dst")).alias("dst"),
        )
        .filter((F.col("src") != F.col("dst"))
                & (F.col("src") != "") & (F.col("dst") != ""))
        .distinct()
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    return trustrank(nodes, e, seed_hosts, n_iters=n_iters).select(
        F.col("id").alias("host"), F.col("trust").alias("rank")
    )
