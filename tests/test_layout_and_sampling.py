"""Behavioral pins for the round-4 pipeline batch: Z-order layout,
SemDeDup semantic dedup, weighted sampling, and the Gopher repetition
rules. (Oracle parity for each lives in test_driver_contract.py; these
pin the SEMANTICS on hand-checkable inputs and the physical plans.)"""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- zorder

def test_zorder_interleave_hand_values(spark):
    """Morton key of (u=0b101, v=0b011) with bit j of column i at
    position j*2+i: u bits land at even positions (1,0,1), v bits at
    odd (1,1,0) → bits 0,1,3,4 set → 0b011011 = 27."""
    from sitecrawler_spark.operators.layout import interleave_bits

    df = spark.range(1).select(
        interleave_bits(
            [F.lit(0b101).cast("long"), F.lit(0b011).cast("long")], 3
        ).alias("z")
    )
    assert df.collect()[0].z == 0b011011


def test_zorder_quantize_bounds(spark):
    """Quantization clamps to [0, 2^bits): below-lo → 0, above-hi →
    the last cell, exact interior arithmetic."""
    from sitecrawler_spark.operators.layout import quantize

    df = spark.createDataFrame(
        [Row(v=-5.0), Row(v=0.0), Row(v=250.0), Row(v=500.0), Row(v=999.0)]
    ).select(quantize(F.col("v"), 0.0, 500.0, 16).alias("c"))
    cells = [r.c for r in df.collect()]
    assert cells == [0, 0, 32768, 65535, 65535]


def test_zorder_layout_tightens_partition_bboxes(spark):
    """Range-partitioning by the z-key should give per-partition
    bounding boxes (on BOTH dimensions) far tighter than arrival
    order — that bbox IS the parquet min/max pruning surface."""
    from sitecrawler_spark.operators.layout import zorder_layout

    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "value"
    )

    def avg_bbox_area(df):
        stats = (
            df.withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .agg(
                (F.max("user_id") - F.min("user_id")).alias("du"),
                (F.max("value") - F.min("value")).alias("dv"),
            )
            .agg(F.avg(F.col("du") * F.col("dv")))
            .collect()[0][0]
        )
        return stats

    plain = ev.repartitionByRange(8, "event_id")
    z = zorder_layout(ev, ["user_id", "value"],
                      [(0.0, 150.0), (0.0, 500.0)], 16, n_partitions=8)
    assert avg_bbox_area(z) < avg_bbox_area(plain) * 0.5


def test_zorder_key_query_is_map_only(spark):
    """The key computation itself must add no shuffle: scan → project,
    zero Exchange nodes, no Python evaluators."""
    plan = entrymod.queries()["q_zorder_key"](
        spark, SF
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "Python" not in plan, plan


# ------------------------------------------------------- semantic dedup

def test_semantic_dedup_drops_planted_duplicate(spark):
    """A planted exact-duplicate embedding (same vector, larger id)
    must be pruned; its smaller-id twin survives; both land in the
    same cluster."""
    from sitecrawler_spark.dedup.ann import semantic_dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    twin = emb.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    kept = semantic_dedup(
        emb.unionByName(twin), "vec_id", "embedding",
        n_clusters=4, n_iters=1, init_stride=100, threshold=0.99,
    )
    ids = {r.vec_id for r in kept.collect()}
    assert 7 in ids and 100007 not in ids


def test_semantic_dedup_threshold_one_keeps_all_nondup(spark):
    """With an unreachable threshold nothing is pruned — the operator
    reduces to cluster assignment."""
    from sitecrawler_spark.dedup.ann import semantic_dedup

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    kept = semantic_dedup(
        emb, "vec_id", "embedding",
        n_clusters=4, n_iters=1, init_stride=100, threshold=1.1,
    )
    assert kept.count() == emb.count()


# ------------------------------------------------------ weighted sample

def test_weighted_sample_extreme_weight_always_wins(spark):
    """Efraimidis–Spirakis key = ln(u)/w: as w → ∞ the key → 0⁻, the
    maximum possible, so an overwhelming-weight item must rank first
    in its stratum."""
    from sitecrawler_spark.kernel import urls_spark as K
    from pyspark.sql import Window

    rows = [Row(lang="xx", doc_id=i, n_chars=100) for i in range(50)]
    rows.append(Row(lang="xx", doc_id=999, n_chars=10**9))
    d = spark.createDataFrame(rows)
    m = float(1 << 40)
    h = K.portable_hash64(F.col("doc_id").cast("string"))
    u = (F.pmod(h, F.lit(1 << 40)).cast("double") + F.lit(1.0)) / F.lit(m + 1.0)
    key = F.round(F.log(u) / F.col("n_chars").cast("double"), 9)
    w = Window.partitionBy("lang").orderBy(F.col("es_key").desc(), "doc_id")
    top = (
        d.select("lang", "doc_id", key.alias("es_key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .collect()
    )
    assert top[0].doc_id == 999


def test_weighted_sample_is_partitioning_invariant(spark):
    """The draw depends only on values, not layout: 1-partition and
    16-partition runs of the gated query pick identical rows."""
    q = entrymod.queries()["q_weighted_sample"]
    a = sorted(map(tuple, q(spark, SF).coalesce(1).collect()))
    b = sorted(map(tuple, q(spark, SF).repartition(16).collect()))
    assert a == b


# ------------------------------------------------------- gopher quality

def test_gopher_stats_hand_case(spark):
    """Exact fractions on a hand-computed doc: 'spam spam spam eggs'
    → 4 tokens, dup_word_frac = 1 - 2/4, dup 3-grams {'spam spam
    spam','spam spam eggs'} distinct → 0.0, top 2-gram 'spam spam'
    (count 2, 8 chars of 16 non-space)."""
    from sitecrawler_spark.textops import functions as TX

    df = spark.createDataFrame([Row(text="spam spam spam eggs")]).select(
        TX.dup_word_frac(F.col("text")).alias("dw"),
        TX.dup_ngram_frac(F.col("text"), 3).alias("d3"),
        TX.mean_word_len(F.col("text")).alias("mw"),
        TX.word_ngrams(F.col("text"), 2).alias("g2"),
    )
    r = df.collect()[0]
    assert math.isclose(r.dw, 0.5)
    assert r.d3 == 0.0
    assert math.isclose(r.mw, 4.0)
    assert r.g2 == ["spam spam", "spam spam", "spam eggs"]


def test_gopher_flags_repetitive_doc(spark):
    """An injected pathological doc (one 2-gram dominating) must come
    out keep=false while the corpus keeps a non-trivial share."""
    out = entrymod.queries()["q_gopher_quality"](spark, SF)
    kept = out.filter(F.col("keep")).count()
    total = out.count()
    assert 0 < kept < total
    # the most repetitive doc by top-2gram share must be rejected
    worst = out.orderBy(F.col("top_2gram_frac").desc()).first()
    assert worst.keep is False


def test_gopher_short_doc_rejected(spark):
    from sitecrawler_spark.textops import functions as TX

    df = spark.createDataFrame([Row(text="the a is")])
    n = df.select(TX.token_count_ws(F.col("text")).alias("n")).collect()[0].n
    assert n < 20  # fails the n_tokens gate by construction


# ------------------------------------------------------ balanced shards

def test_balanced_shards_serpentine_and_near_equal_totals(spark):
    """Hand-check the serpentine walk (S=2: ranks 0,1,2,3 → shards
    0,1,1,0) and pin the balance guarantee on a skewed weight
    distribution: serpentine LPT's max/min shard-total ratio stays
    within 5% on a bounded token-count-like distribution (the op's
    documented domain: max weight ≪ total/S; heavy-head Zipf needs
    upstream chunking, not a cleverer dealer)."""
    from sitecrawler_spark.operators.layout import balanced_shards

    df = spark.createDataFrame(
        [(i, 100 - i) for i in range(4)], ["doc_id", "w"]
    )
    got = {
        r["doc_id"]: r["shard"]
        for r in balanced_shards(df, "w", 2, "doc_id").collect()
    }
    # weights 100,99,98,97 → ranks 0..3 (already desc) → 0,1,1,0
    assert got == {0: 0, 1: 1, 2: 1, 3: 0}

    # bounded skew (doc-token-count-like: 50..2000 tokens), 4 shards
    big = spark.createDataFrame(
        [(i, 50 + (i * 137) % 1951) for i in range(500)],
        ["doc_id", "w"],
    )
    out = balanced_shards(big, "w", 4, "doc_id")
    totals = [
        r["t"] for r in out.groupBy("shard").agg(
            F.sum("w").alias("t")).collect()
    ]
    assert len(totals) == 4
    assert max(totals) / min(totals) < 1.05
    # every row assigned exactly one shard in [0, 4)
    assert out.filter((F.col("shard") < 0) | (F.col("shard") >= 4)).count() == 0
    assert out.count() == 500
