"""Crawl → training-corpus export: the end-to-end pipeline the engine
feeds (the brief's actual story — crawled pages in, pretraining-ready
packed sequences out).

Chains the individually-gated stages over the engine's ``pages`` span
table: per-host boilerplate strip (C4/RefinedWeb chrome removal) →
Gopher-style quality + language gate (Rae et al. 2021) → exact dedup →
minhash-LSH near-dup clustering with canonical pick (Broder 1997) →
benchmark decontamination (word-n-gram overlap vs the held-out slice)
→ concat-and-split sequence packing. Every stage is the same operator
the per-stage driver gates pin (q_boilerplate_strip,
q_training_pipeline, q_decontamination, q_sequence_packing); this
module gates the COMPOSITION from a real crawl.

Scale notes (100 TB): the only shuffles are (host, line) frequency
counting (keyed per host — no global-line hot key), the dedup
fingerprint/band exchanges (bucket-capped in minhash_lsh_pairs), the
n-gram join (eval grams broadcast), and one per-host window for
packing. Per-host doc counts broadcast. No driver-side row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sitecrawler_spark.dedup.components import dedup_clusters
from sitecrawler_spark.dedup.dedup import exact_dedup, minhash_lsh_pairs
from sitecrawler_spark.textops import functions as TX


def strip_boilerplate(
    docs: DataFrame, min_docs: int = 3
) -> DataFrame:
    """(doc_id, host, lines:array<string>) → (doc_id, host, text) with
    per-host boilerplate lines removed: a line is chrome on a host when
    it appears in ≥ ``min_docs`` docs AND >20% of the host's docs
    (integer arithmetic, float-free). A doc whose every line is chrome
    drops out entirely. Same rule as queries.q_boilerplate_strip."""
    ex = docs.select(
        "doc_id", "host", F.posexplode("lines").alias("line_id", "line")
    )
    stats = ex.groupBy("host", "line").agg(
        F.count_distinct("doc_id").alias("_n_docs_line")
    )
    hostc = docs.groupBy("host").agg(
        F.count_distinct("doc_id").alias("_host_docs")
    )
    flagged = (
        stats.join(F.broadcast(hostc), "host")
        .filter(
            (F.col("_n_docs_line") >= min_docs)
            & (5 * F.col("_n_docs_line") > F.col("_host_docs"))
        )
        .select("host", "line", F.lit(True).alias("_bp"))
    )
    kept = ex.join(flagged, ["host", "line"], "left").filter(
        F.col("_bp").isNull()
    )
    return kept.groupBy("doc_id", "host").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_id", "line"))),
                lambda x: x["line"],
            ),
            " ",
        ).alias("text")
    )


def quality_gate(docs: DataFrame) -> DataFrame:
    """Gopher-style quality + language gate on (…, text): composite
    quality ≥ 0.5, predicted language 'en', ≥20 tokens, mean word
    length in [3, 10], ≥2 English stopword hits. The same signals
    q_quality_filter / q_lang_id / q_gopher_quality gate per-stage."""
    scored = docs.select(
        "*",
        TX.quality_score(F.col("text")).alias("quality"),
        TX.lang_id(F.col("text")).alias("lang_pred"),
        TX.token_count_ws(F.col("text")).cast("long").alias("n_tokens"),
        TX.mean_word_len(F.col("text")).alias("_mwl"),
        TX.stopword_hits(F.col("text"), "en").cast("long").alias("_stops"),
    )
    return scored.filter(
        (F.col("quality") >= 0.5)
        & (F.col("lang_pred") == "en")
        & (F.col("n_tokens") >= 20)
        & (F.col("_mwl") >= 3.0)
        & (F.col("_mwl") <= 10.0)
        & (F.col("_stops") >= 2)
    ).drop("_mwl", "_stops")


def dedup_canonical(docs: DataFrame) -> DataFrame:
    """Exact dedup (keep lowest doc_id per normalized text) then
    minhash-LSH near-dup clustering (16 hashes / 4 bands of 4 / 5-char
    shingles — similarity threshold (1/4)^(1/4) ≈ 0.71, the "true
    near-dup" operating point: crawled pages share site chrome and
    phrasing, so the r=2 banding q_training_pipeline uses on the
    synthetic documents table would chain whole templates into one
    cluster); keep each cluster's canonical (minimum doc_id)."""
    uniq = exact_dedup(docs, "text", "doc_id")
    edges = minhash_lsh_pairs(
        uniq, "text", "doc_id", n_hashes=16, n_bands=4, k=5
    )
    clusters = dedup_clusters(
        uniq.select(F.col("doc_id").alias("id")), edges
    )
    return (
        clusters.filter(F.col("is_canonical"))
        .select(F.col("id").alias("doc_id"))
        .join(uniq, "doc_id")
    )


def decontaminate(
    docs: DataFrame, eval_mod: int = 11, gram_n: int = 8
) -> DataFrame:
    """Benchmark decontamination: the held-out eval slice is
    doc_id % eval_mod == 0; eval docs are EXCLUDED from the corpus and
    any remaining doc sharing a word ``gram_n``-gram with an eval doc
    is dropped. Eval grams are distinct-small → broadcast."""
    ts = F.split(F.col("text"), " ")
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.size(ts) - (gram_n - 1)),
        lambda j: F.concat_ws(" ", F.slice(ts, j, gram_n)),
    )
    grams = docs.filter(F.size(ts) >= gram_n).select(
        "doc_id", F.explode(grams_arr).alias("g")
    )
    evalg = (
        grams.filter(F.col("doc_id") % eval_mod == 0).select("g").distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % eval_mod != 0)
        .join(F.broadcast(evalg), "g")
        .select("doc_id")
        .distinct()
    )
    return docs.filter(F.col("doc_id") % eval_mod != 0).join(
        contaminated, "doc_id", "left_anti"
    )


def pack_sequences(docs: DataFrame, budget: int = 128) -> DataFrame:
    """Concat-and-split packing per host in doc_id order at a
    ``budget``-token boundary (a doc belongs to the sequence its first
    token falls in — q_sequence_packing semantics). Output one row per
    packed sequence: (host, seq_id, n_docs, tokens, doc_list)."""
    d = docs.select(
        "doc_id", "host",
        TX.token_count_ws(F.col("text")).cast("long").alias("_ntok"),
    )
    w = Window.partitionBy("host").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = d.withColumn("_cum_before", F.sum("_ntok").over(w) - F.col("_ntok"))
    seq = F.floor(F.col("_cum_before") / budget)
    return (
        c.groupBy("host", seq.cast("long").alias("seq_id"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_ntok").cast("long").alias("tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("doc_list"),
        )
    )


def training_corpus(
    docs: DataFrame,
    *,
    boiler_min_docs: int = 3,
    eval_mod: int = 11,
    gram_n: int = 8,
    pack_budget: int = 128,
) -> DataFrame:
    """Full pipeline over (doc_id:long, host:string,
    lines:array<string>) — see module docstring. Returns one row per
    packed training sequence."""
    stripped = strip_boilerplate(docs, min_docs=boiler_min_docs)
    gated = quality_gate(stripped)
    canon = dedup_canonical(gated)
    clean = decontaminate(canon, eval_mod=eval_mod, gram_n=gram_n)
    return pack_sequences(clean, budget=pack_budget)
