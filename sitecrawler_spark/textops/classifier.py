"""Trained quality classifier: hashed-feature logistic regression via
distributed batch gradient descent.

The modern web-corpus curation step this implements is the
"quality-classifier filter" — GPT-3 trained a logistic classifier to
separate curated reference text from raw Common Crawl (Brown et al.,
"Language Models are Few-Shot Learners", NeurIPS 2020, Appendix A);
fastText popularized the hashed bag-of-words linear form (Joulin et
al., "Bag of Tricks for Efficient Text Classification", EACL 2017).
CCNet applies the same family per-language (Wenzek et al., LREC 2020).

Determinism contract (the DSIR / q_lm_score micro-unit discipline):
weights live in integer MICRO-units (long). Every sum — margins
(Σ count·weight), gradients (Σ count·residual) — is an exact long sum,
order- and partition-layout-independent. The only float op per
iteration is the per-doc sigmoid, computed from an exact long margin
and rounded straight back to a long residual, so the DuckDB oracle
(oracles.logreg_oracle) reproduces training bit-for-bit.

Distributed shape (100 TB):
- Features are built ONCE: tokenize + bigram map-side, hash to
  ``n_buckets`` presence buckets, one (id, y, bucket) distinct with
  map-side partial dedup → at most n_buckets+1 rows per doc (the +1 is
  the bias pseudo-bucket b=-1, which makes bias updates flow through
  the same joins as weights). ``localCheckpoint`` pins them for the
  iterations.
- The model NEVER leaves the executors: weights are an
  (n_buckets+1)-row DataFrame, broadcast into the margin join each
  iteration; the gradient agg collapses to n_buckets+1 rows with
  map-side combine. Per iteration: one broadcast join + doc-keyed agg
  (margins), one id-keyed join + bucket agg (gradients), one 65-row
  update. No .collect() of row data, no windows, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sitecrawler_spark.kernel.urls_spark import portable_hash64

MICRO = 1_000_000


def hashed_presence_features(
    docs: DataFrame,
    text_col: str,
    label_col: str,
    id_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, y, b, c=1): per-doc hashed unigram+bigram PRESENCE buckets
    plus one bias row (b=-1, c=1) per doc. Tokenization, bigram build,
    and bucket hash match dsir_logweights' portable contract
    (lower/trim/whitespace split, 60-bit md5 mod n_buckets).

    Presence (0/1), not counts: raw counts scale margins with document
    length, which saturates the sigmoid and makes batch GD oscillate
    (measured: count features never beat the majority class on the
    corpus; presence features reach ~0.83). fastText's mean-of-counts
    normalization needs rationals — presence keeps every sum an exact
    long while bounding |margin| ≤ n_buckets·max|w|."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                  F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # per-doc presence == per-row distinct, so dedup happens MAP-SIDE
    # inside the bucket array — no corpus-wide distinct shuffle, and
    # the whole feature build is a single narrow stage (also what lets
    # score_docs run on an unbounded STREAM, where chained
    # aggregations are prohibited)
    buckets = F.array_distinct(
        F.transform(
            F.concat(toks, bigrams),
            lambda g: F.pmod(portable_hash64(g), F.lit(n_buckets))
            .cast("int"),
        )
    )
    presence = docs.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("int").alias("y"),
        F.explode(buckets).alias("b"),
    ).withColumn("c", F.lit(1).cast("long"))
    bias = docs.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("int").alias("y"),
        F.lit(-1).alias("b"),
        F.lit(1).cast("long").alias("c"),
    )
    return presence.unionByName(bias)


def _margins(feats: DataFrame, w: DataFrame) -> DataFrame:
    """Exact long margins: m_micro(doc) = Σ_b c·w_micro[b] (the bias
    row contributes w_micro[-1]·1). Broadcast the 65-row model."""
    return (
        feats.join(F.broadcast(w), "b")
        .groupBy("id", "y")
        .agg(F.sum(F.col("c") * F.col("w_micro")).alias("m_micro"))
    )


def train_logreg_hashed(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "y",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    n_iters: int = 8,
    lr: float = 2.0,
) -> tuple[DataFrame, DataFrame]:
    """Batch-GD logistic regression over hashed n-gram presence.

    Returns ``(weights, scored)``: weights = (b, w_micro) for
    b in -1..n_buckets-1 (b=-1 is the bias), scored = per-doc
    (id, y, margin_micro, pred) under the FINAL weights.

    Update rule (exact-integer except the sigmoid):
      m_micro   = Σ c·w_micro                     (long, exact)
      p         = 1 / (1 + exp(-m_micro/1e6))    (double)
      r_micro   = round(1e6·(p - y))             (long)
      grad[b]   = Σ_docs c·r_micro               (long, exact)
      w_micro  -= round(lr·grad[b] / n_docs)     (long)
    """
    spark = docs.sparkSession
    # checkpoint the feature table HASH-PARTITIONED ON id: the margin
    # aggregation (groupBy id, y) of every iteration and of the final
    # scoring pass then needs NO exchange (HashPartitioning(id)
    # satisfies the clustered distribution on (id, y)), and the
    # gradient join's probe side is already id-clustered — the feature
    # rows are shuffled once at build instead of once per iteration.
    feats = (
        hashed_presence_features(
            docs, text_col, label_col, id_col, n_buckets
        )
        .repartition("id")
        .localCheckpoint(eager=True)
    )
    n_docs = docs.count()

    w = spark.createDataFrame(
        [(b, 0) for b in range(-1, n_buckets)], "b int, w_micro long"
    )
    for _ in range(n_iters):
        m = _margins(feats, w)
        p = F.lit(1.0) / (
            F.lit(1.0) + F.exp(-F.col("m_micro") / F.lit(float(MICRO)))
        )
        resid = m.select(
            "id",
            F.round(F.lit(float(MICRO)) * (p - F.col("y")))
            .cast("long")
            .alias("r_micro"),
        )
        grad = (
            feats.join(resid, "id")
            .groupBy("b")
            .agg(F.sum(F.col("c") * F.col("r_micro")).alias("g"))
        )
        w = (
            w.join(grad, "b", "left")
            .select(
                "b",
                (
                    F.col("w_micro")
                    - F.round(
                        F.lit(lr)
                        * F.coalesce(F.col("g"), F.lit(0))
                        / F.lit(float(n_docs))
                    ).cast("long")
                ).alias("w_micro"),
            )
            # 65 rows; eager checkpoint cuts the iterative lineage so
            # iteration i+1's plan does not re-run iterations 1..i
            .localCheckpoint(eager=True)
        )

    scored = _margins(feats, w).select(
        "id", "y",
        F.col("m_micro").alias("margin_micro"),
        (F.col("m_micro") > 0).alias("pred"),
    )
    return w, scored


def score_docs(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Score documents under a TRAINED model (train offline, score
    online): per-doc (id, margin_micro, pred) from a (b, w_micro)
    weights table. The whole plan is map-side feature build → one
    broadcast join → ONE aggregation, so it runs unchanged on an
    unbounded STREAM (readStream docs + static weights; Spark permits
    exactly one aggregation per streaming query) — the live-crawl
    quality filter. Margins are the same exact long sums as training,
    so batch and stream scores are bit-identical (parity test-pinned).
    ``n_buckets`` must match the trained model's."""
    feats = hashed_presence_features(
        docs.withColumn("_y0", F.lit(0)), text_col, "_y0", id_col, n_buckets
    ).drop("y")
    return (
        feats.join(F.broadcast(weights), "b")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("w_micro")).alias("margin_micro"))
        .select(
            "id", "margin_micro", (F.col("margin_micro") > 0).alias("pred")
        )
    )
