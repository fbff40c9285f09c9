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


def heuristic_quality_labels(docs: DataFrame) -> DataFrame:
    """The quality_gate predicate as a 0/1 LABEL column (_y) instead of
    a hard filter — the pseudo-label source for classifier_filter."""
    scored = docs.select(
        "*",
        TX.quality_score(F.col("text")).alias("_q"),
        TX.lang_id(F.col("text")).alias("_lang"),
        TX.token_count_ws(F.col("text")).cast("long").alias("_nt"),
        TX.mean_word_len(F.col("text")).alias("_mwl"),
        TX.stopword_hits(F.col("text"), "en").cast("long").alias("_stops"),
    )
    y = (
        (F.col("_q") >= 0.5)
        & (F.col("_lang") == "en")
        & (F.col("_nt") >= 20)
        & (F.col("_mwl") >= 3.0)
        & (F.col("_mwl") <= 10.0)
        & (F.col("_stops") >= 2)
    )
    return scored.withColumn("_y", y.cast("int")).drop(
        "_q", "_lang", "_nt", "_mwl", "_stops"
    )


def classifier_filter(docs: DataFrame, **clf_kwargs) -> DataFrame:
    """GPT-3-style trained quality filter (Brown et al. 2020 Appendix
    A), bootstrapped by weak supervision: pseudo-labels come from the
    Gopher-style heuristic gate, a hashed-presence logistic regression
    (textops/classifier.py) is trained on them, and docs keep their
    place iff the TRAINED model's margin is positive. Unlike the hard
    heuristic filter, the learned decision boundary generalizes —
    documents the heuristics misjudge but that look like high-quality
    text (and vice versa) cross sides. Same distributed shape as
    q_quality_classifier: broadcast model, exact long margins, no
    row-data collects."""
    from sitecrawler_spark.textops.classifier import train_logreg_hashed

    labeled = heuristic_quality_labels(docs)
    _, scored = train_logreg_hashed(
        labeled, "text", "_y", "doc_id", **clf_kwargs
    )
    keep = scored.filter(F.col("pred")).select(F.col("id").alias("doc_id"))
    return docs.join(keep, "doc_id")


def dedup_canonical(docs: DataFrame) -> DataFrame:
    """Exact dedup (keep lowest doc_id per normalized text) then
    minhash-LSH near-dup clustering (16 hashes / 4 bands of 4 / 5-char
    shingles — similarity threshold (1/4)^(1/4) ≈ 0.71, the "true
    near-dup" operating point: crawled pages share site chrome and
    phrasing, so the r=2 banding q_training_pipeline uses on the
    synthetic documents table would chain whole templates into one
    cluster); keep each cluster's canonical (minimum doc_id)."""
    # pin the survivors (same rationale as q_training_pipeline): uniq
    # feeds the band build, the cluster nodes and the final join, and
    # its boilerplate-strip + gate + window subtree defeats AQE's
    # runtime stage-reuse across the band self-join — unpinned, the
    # whole upstream pipeline re-ran once per consumer
    uniq = exact_dedup(docs, "text", "doc_id").localCheckpoint(eager=True)
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


def decontaminate_bloom(
    docs: DataFrame,
    eval_mod: int = 11,
    gram_n: int = 8,
    fpp: float = 0.01,
    n_shards: int | None = None,
) -> DataFrame:
    """EXACT-set decontamination with the eval-gram set routed through
    the engine's sharded bloom filter (operators/seen.py) instead of a
    broadcast — the 100 TB path when the held-out slice outgrows a
    broadcast table. Same semantics as ``decontaminate`` (equivalence
    test-pinned): bloom negatives are DEFINITE, so the corpus gram
    stream shrinks map-side to the ~fpp false-positive tail plus true
    hits before the exact verify semi-join — anti_join_seen's
    prefilter pattern applied to decontamination. The shuffle is
    |bloom survivors|, not |corpus grams|."""
    from sitecrawler_spark.operators.seen import SparkBloomFilter

    ts = F.split(F.col("text"), " ")
    grams_arr = F.transform(
        F.sequence(F.lit(1), F.size(ts) - (gram_n - 1)),
        lambda j: F.concat_ws(" ", F.slice(ts, j, gram_n)),
    )
    grams = docs.filter(F.size(ts) >= gram_n).select(
        "doc_id", F.explode(grams_arr).alias("g")
    )
    evalg = (
        grams.filter(F.col("doc_id") % eval_mod == 0)
        .select("g")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_eval = evalg.count()
    bloom = SparkBloomFilter.sized(
        docs.sparkSession, max(n_eval, 1), fpp, n_shards=n_shards
    )
    bloom.add_df(evalg, "g")
    train = grams.filter(F.col("doc_id") % eval_mod != 0)
    maybe = train.filter(bloom.maybe_contains(F.col("g")))
    contaminated = maybe.join(evalg, "g").select("doc_id").distinct()
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


def dedup_lines_global(docs: DataFrame) -> DataFrame:
    """Optional CCNet stage over the raw (doc_id, host, lines) input:
    corpus-WIDE keep-first line dedup (Wenzek 2020 §3.1) BEFORE the
    per-host frequency strip — repeated lines vanish everywhere but
    their first (doc_id, line_id) occurrence, across host boundaries.
    Docs whose every line is a repeat drop out."""
    from sitecrawler_spark.dedup.dedup import line_dedup_keep_first

    ex = docs.select(
        "doc_id", "host", F.posexplode("lines").alias("line_id", "line")
    )
    flagged = line_dedup_keep_first(ex, "doc_id", "line_id", "line")
    return (
        flagged.filter(F.col("keep"))
        .groupBy("doc_id", "host")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_id", "line"))),
                lambda x: x["line"],
            ).alias("lines")
        )
    )


def dedup_substrings(docs: DataFrame, l_tokens: int = 8) -> DataFrame:
    """Optional ExactSubstr stage (Lee 2022) on (…, text) docs:
    duplicated token runs ≥ l_tokens are cut from all but their first
    occurrence (maximal-island removal), docs left empty drop out."""
    from sitecrawler_spark.dedup.dedup import (
        exact_substring_spans,
        remove_spans,
    )

    islands = exact_substring_spans(docs, "text", "doc_id", l_tokens)
    return remove_spans(docs, islands).filter(F.length("text") > 0)


def training_corpus(
    docs: DataFrame,
    *,
    boiler_min_docs: int = 3,
    eval_mod: int = 11,
    gram_n: int = 8,
    pack_budget: int = 128,
    line_dedup: bool = False,
    substr_dedup: bool = False,
    trained_filter: bool = False,
    clf_kwargs: dict | None = None,
) -> DataFrame:
    """Full pipeline over (doc_id:long, host:string,
    lines:array<string>) — see module docstring. Returns one row per
    packed training sequence.

    Optional stages (default off — the q_crawl_to_corpus gate pins the
    default composition): ``line_dedup`` inserts the CCNet corpus-wide
    keep-first line pass before the per-host strip; ``trained_filter``
    REPLACES the hard heuristic gate with the GPT-3-style trained
    classifier (pseudo-labeled by those same heuristics);
    ``substr_dedup`` adds ExactSubstr span removal after canonical
    dedup (full/near dups are gone by then — what remains is partial
    overlap, exactly the span case)."""
    if line_dedup:
        docs = dedup_lines_global(docs)
    stripped = strip_boilerplate(docs, min_docs=boiler_min_docs)
    if trained_filter:
        gated = classifier_filter(stripped, **(clf_kwargs or {}))
    else:
        gated = quality_gate(stripped)
    canon = dedup_canonical(gated)
    if substr_dedup:
        canon = dedup_substrings(canon, l_tokens=gram_n)
    clean = decontaminate(canon, eval_mod=eval_mod, gram_n=gram_n)
    return pack_sequences(clean, budget=pack_budget)
