"""Text-analysis operators for large-scale training-data pipelines.

All hot-path operators are native Column expressions (JVM codegen, no
Python). Each has a matching DuckDB oracle in oracles.py so the
driver's correctness gate covers them.

Operators: token counting (whitespace + regex-BPE-ish), quality
scoring (length/punct/stopword/caps ratios), language ID (stopword
hit argmax heuristic), document fingerprinting (normalized md5 +
min-of-rolling-window hash sketch — the sketch follows the winnowing
idea of Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# regex-BPE-ish token classes: letter runs, digit runs, single symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "on", "with", "a"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "eine", "zu"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "para", "con"],
}

PUNCT_RE = r"[!-/:-@\[-`{-~]"  # ASCII punctuation ranges


def token_count_ws(c: Column) -> Column:
    """Whitespace token count; empty/blank → 0."""
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def token_count_bpe(c: Column) -> Column:
    """Regex-BPE-ish token count (letter runs / digit runs / symbols)."""
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def stopword_regex(lang: str) -> str:
    return r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"


def stopword_hits(c: Column, lang: str) -> Column:
    return F.regexp_count(F.lower(c), F.lit(stopword_regex(lang)))


def quality_score(c: Column) -> Column:
    """Composite quality heuristic ~[0,1]: rewards reasonable length and
    stopword density, penalizes punctuation/caps excess. Deterministic,
    rounded for oracle comparison."""
    n = F.length(c).cast("double")
    toks = token_count_ws(c).cast("double")
    punct = F.regexp_count(c, F.lit(PUNCT_RE)).cast("double")
    caps = F.regexp_count(c, F.lit("[A-Z]")).cast("double")
    stop = stopword_hits(c, "en").cast("double")
    nz = F.greatest(n, F.lit(1.0))
    toks_nz = F.greatest(toks, F.lit(1.0))
    score = (
        F.least(n / F.lit(500.0), F.lit(1.0)) * 0.3
        + F.least(stop / toks_nz * F.lit(4.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct / nz * F.lit(10.0), F.lit(1.0))) * 0.2
        + (F.lit(1.0) - F.least(caps / nz * F.lit(10.0), F.lit(1.0))) * 0.1
    )
    return F.round(score, 4)


def lang_id(c: Column) -> Column:
    """Stopword-hit argmax over {en,fr,de,es}; 'und' when zero hits.
    Ties break in fixed language order (dict insertion order)."""
    lowered = F.lower(c)
    scores = {
        lang: F.regexp_count(lowered, F.lit(stopword_regex(lang)))
        for lang in STOPWORDS
    }
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("und"))
    for lang in STOPWORDS:  # first lang reaching the max wins
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def normalize_text(c: Column) -> Column:
    """lower + collapse whitespace + trim — canonical form for
    fingerprinting and exact dedup."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint_md5(c: Column) -> Column:
    return F.md5(normalize_text(c))


def rolling_hash64(c: Column, window: int = 16) -> Column:
    """Min-of-rolling-window hash sketch (winnowing-style): min over i
    of portable_hash64(substr(norm_text, i, window)). Portable md5-based
    hash so DuckDB reproduces it bit-for-bit."""
    t = normalize_text(c)
    n = F.greatest(F.length(t) - F.lit(window - 1), F.lit(1))
    windows = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.conv(
            F.substring(F.md5(t.substr(i, F.lit(window))), 1, 15), 16, 10
        ).cast("long"),
    )
    return F.array_min(windows)


def chunk_texts(c: Column, chunk: int = 64, overlap: int = 16) -> Column:
    """Token-window chunking with overlap — context-window prep for
    training pipelines. Whitespace tokens, windows of ``chunk`` tokens
    every ``chunk - overlap`` tokens, last window ragged. Pure Column
    expression (sequence + slice), one pass per row."""
    stride = chunk - overlap
    toks = F.split(F.trim(c), r"\s+")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(stride))
    return F.transform(
        starts, lambda s: F.array_join(F.slice(toks, s, chunk), " ")
    )


def hashed_text_features(c: Column, dim: int = 64) -> Column:
    """Hashing-trick bag-of-words feature vector (Weinberger et al.,
    "Feature hashing for large scale multitask learning", ICML 2009):
    token t adds sign(t) at index hash(t) % dim; L2-normalized, rounded
    6dp (cross-engine float portability). Turns raw documents into
    array<double> vectors the ANN/near-dup operators consume — no
    model, no Python, one pass per row (the token-hash array and the
    unnormalized vector are lambda-bound so the dim aggregates and the
    normalizer don't re-inline them; see dedup._bind)."""
    from sitecrawler_spark.dedup.dedup import _bind, portable_hash_str

    toks = F.filter(
        F.split(F.trim(F.lower(c)), r"\s+"), lambda t: t != ""
    )

    def vec_from(hs: Column) -> Column:
        def dim_sum(d: int) -> Column:
            # sign from x % 2dim < dim — exact long arithmetic (a
            # floor(x / dim) parity goes through double division and
            # mangles the low bits of a 60-bit hash)
            return F.aggregate(
                hs, F.lit(0.0),
                lambda acc, x: acc + F.when(
                    F.pmod(x, F.lit(dim)) == d,
                    F.when(F.pmod(x, F.lit(2 * dim)) < dim,
                           F.lit(1.0)).otherwise(F.lit(-1.0)),
                ).otherwise(F.lit(0.0)),
            )
        return F.array(*[dim_sum(d) for d in range(dim)])

    def normalize(v: Column) -> Column:
        norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
        return _bind(
            norm,
            lambda n: F.transform(
                v, lambda x: F.round(x / F.greatest(n, F.lit(1e-12)), 6)
            ),
        )

    hashes = F.transform(toks, lambda t: portable_hash_str(t, 1))
    return _bind(hashes, lambda hs: _bind(vec_from(hs), normalize))


def word_ngrams(c: Column, n: int = 2) -> Column:
    """Word n-grams as an array<string> (space-joined windows over
    whitespace tokens). Empty array when the doc has < n tokens."""
    toks = F.split(F.trim(c), r"\s+")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    )
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(starts, lambda s: F.array_join(F.slice(toks, s, n), " "))
    )


def dup_word_frac(c: Column) -> Column:
    """Fraction of word occurrences that are repeats of an earlier
    word: 1 - distinct/total (Gopher repetition signal, Rae et al.
    2021, arXiv:2112.11446 — word-level analog of the duplicate-line
    fraction). Exact integer ratio rounded 6dp."""
    toks = F.split(F.trim(c), r"\s+")
    tot = F.greatest(F.size(toks), F.lit(1)).cast("double")
    return F.round(
        F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double") / tot, 6
    )


def dup_ngram_frac(c: Column, n: int = 3) -> Column:
    """Fraction of word n-gram occurrences that are duplicates —
    Gopher's dup-n-gram repetition rule at the word level."""
    grams = word_ngrams(c, n)
    tot = F.size(grams)
    return F.when(tot <= 0, F.lit(0.0)).otherwise(
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double")
            / tot.cast("double"),
            6,
        )
    )


def mean_word_len(c: Column) -> Column:
    """Mean whitespace-token length, exact integer sums rounded 6dp
    (Gopher quality gate: docs outside [3, 10] mean word length are
    boilerplate/gibberish)."""
    toks = F.split(F.trim(c), r"\s+")
    total_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return F.round(
        total_chars.cast("double")
        / F.greatest(F.size(toks), F.lit(1)).cast("double"),
        6,
    )


def bm25_topk(
    docs,
    query_terms: dict[int, list[str]],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
):
    """BM25 ranked retrieval (Robertson & Zaragoza 2009, the Lucene
    `1 + (N-df+0.5)/(df+0.5)` idf variant): score every document
    against a set of term queries, return the top-``k`` per query.

    Cross-engine exactness: each per-term score is scaled to a BIGINT
    (round(term·1e6)) BEFORE the per-(query, doc) sum, so the
    aggregation is integer-exact and order-free — float summation
    order can never flip a rank between Spark and the oracle.

    Distributed shape: ONE tokenize scan feeds tf (doc, word) and
    doc-length aggregations (both map-side combined); the query-term
    table and the 1-row (N, avgdl) stats ride broadcasts; df for the
    ≤|Q| query words is computed AFTER the tf×queries join, so the
    full-vocabulary df never materializes. Shuffles: tf groupBy,
    dl groupBy, final (query, doc) sum + top-k window — all keyed,
    no skew (query words fan out ≤|Q| rows per doc)."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "word"
        ),
    ).filter(F.col("word") != "")
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    # doc length = Σ tf — derived from the (much smaller) tf frame so
    # the corpus is tokenized ONCE, not re-scanned for lengths
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    qterms = spark.createDataFrame(
        [(qid, w) for qid, ws in sorted(query_terms.items()) for w in ws],
        "query_id int, word string",
    )
    tfq = tf.join(F.broadcast(qterms), "word")
    dfq = tfq.groupBy("word").agg(
        F.count_distinct("doc_id").alias("df")
    )
    scored = (
        tfq.join(F.broadcast(dfq), "word")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")) + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    den = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") / avgdl)
    )
    term_i = F.round(
        idf * F.col("tf") * F.lit(k1 + 1.0) / den * F.lit(1e6)
    ).cast("long")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_i"), F.col("doc_id")
    )
    return (
        scored.select("query_id", "doc_id", term_i.alias("ti"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("ti").alias("score_i"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank",
            F.round(F.col("score_i").cast("double") / F.lit(1e6), 6).alias(
                "score"
            ),
        )
    )


def dsir_logweights(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_col: str = "is_target",
    n_buckets: int = 1024,
):
    """DSIR importance log-weights (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): hashed
    unigram+bigram bag features, add-one-smoothed bucket distributions
    for the TARGET slice vs the RAW rest, and per-doc
    log w(d) = Σ_g log(p_target[h(g)] / p_raw[h(g)]).

    Determinism contract: bucket = portable 60-bit md5 hash mod
    n_buckets; each bucket's log-ratio is rounded once to integer
    MICRO-units, so the per-doc weight is an exact long sum —
    order-independent and bit-identical in the SQL oracle (the
    q_lm_score pattern).

    Distributed shape (100 TB): one tokenize pass builds the gram
    array map-side; bucket counting is a map-side-combined agg to
    ≤ n_buckets×2 rows; totals are a 1-row broadcast; the per-doc sum
    re-uses the SAME exploded grams with the n_buckets-row ratio
    table broadcast — shuffle = one doc_id exchange of pre-combined
    partials. Returns (id, is_target, logw_micro)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # guard: F.sequence(1, 0) DESCENDS in Spark — a 1-token doc must
    # yield an empty bigram array, not indices [1, 0]
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i),
                                  F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from sitecrawler_spark.kernel.urls_spark import portable_hash64

    grams = docs.select(
        F.col(id_col).alias("id"),
        F.col(target_col).alias("is_target"),
        F.explode(F.concat(toks, bigrams)).alias("g"),
    ).select(
        "id", "is_target",
        F.pmod(portable_hash64(F.col("g")), F.lit(n_buckets)).alias("b"),
    )
    # pre-combine occurrences to (id, is_target, b) partials FIRST: the
    # bucket-count branch and the per-doc weight branch then both hang
    # off ONE identical exchange (ReusedExchange — the banded_pairs
    # pattern), so the expensive tokenize + md5-per-gram scan runs once
    # instead of once per consumer. Σ over occurrences == Σ c·(per-
    # bucket term) exactly (all-long arithmetic), so results are
    # bit-identical to the per-occurrence formulation.
    per = grams.groupBy("id", "is_target", "b").agg(
        F.count("*").cast("long").alias("_c")
    )
    counts = per.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), F.col("_c")).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(F.col("_c"))).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("tt"), F.sum("cr").alias("tr")
    )
    lr = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        F.round(
            1e6
            * (
                F.log(F.col("ct") + 1)
                - F.log(F.col("tt") + n_buckets)
                - F.log(F.col("cr") + 1)
                + F.log(F.col("tr") + n_buckets)
            )
        ).cast("long").alias("lr_micro"),
    )
    return per.join(F.broadcast(lr), "b").groupBy("id", "is_target").agg(
        F.sum(F.col("_c") * F.col("lr_micro")).alias("logw_micro")
    )


def ndcg_at_k(
    docs,
    query_terms: dict[int, list[str]],
    k: int = 10,
):
    """NDCG@k retrieval evaluation (Järvelin & Kekäläinen, "Cumulated
    gain-based evaluation of IR techniques", TOIS 2002) of the BM25
    ranking above, with rule-derived graded relevance so no labeled
    fixture is needed: rel(q, d) = total occurrences of q's terms in d
    — a raw-tf grade that deliberately DIFFERS from BM25's
    length-normalized idf-weighted score, so NDCG < 1 and the metric
    actually discriminates rankings (capped grades were degenerate
    here: every top-10 doc saturated the cap → NDCG ≡ 1.0). Linear
    gain (Järvelin's original; the 2^rel−1 Burges variant would
    overflow on unbounded tf): DCG@k = Σᵢ relᵢ / log2(i+1),
    NDCG = DCG / IDCG where IDCG ranks the relevance pool ideally
    (rel desc, doc_id asc).

    Cross-engine exactness: each per-position discounted gain is
    rounded to integer MICRO-units before the per-query sum (the
    bm25_topk discipline), so DCG/IDCG are exact longs and the final
    NDCG is one exactly-rounded double division — float summation
    order can never shift the metric between Spark and the oracle.

    Distributed shape: the ranked lists are |Q|·k rows (tiny); the
    relevance pool is built from ONE extra corpus tokenize whose
    explode is pre-filtered to the broadcast query vocabulary, so only
    query-term occurrences survive to the groupBy — the only shuffle
    of corpus cardinality. IDCG's window partitions by query_id over
    the (small) relevance pool."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    ranked = bm25_topk(docs, query_terms, k=k)
    qterms = spark.createDataFrame(
        [(qid, w) for qid, ws in sorted(query_terms.items()) for w in ws],
        "query_id int, word string",
    )
    vocab = sorted({w for ws in query_terms.values() for w in ws})
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "word"
        ),
    ).filter(F.col("word").isin(vocab))
    rel = (
        toks.join(F.broadcast(qterms), "word")
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").cast("int").alias("rel"))
    )

    def gain_micro(rel_col, pos_col):
        g = rel_col.cast("double")
        return F.round(g / F.log2(pos_col + F.lit(1)) * F.lit(1e6)).cast(
            "long"
        )

    dcg = (
        ranked.join(rel, ["query_id", "doc_id"], "left")
        .select(
            "query_id",
            gain_micro(
                F.coalesce(F.col("rel"), F.lit(0)), F.col("rank")
            ).alias("gm"),
        )
        .groupBy("query_id")
        .agg(F.sum("gm").alias("dcg_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.col("doc_id")
    )
    idcg = (
        rel.withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select("query_id", gain_micro(F.col("rel"), F.col("pos")).alias("gm"))
        .groupBy("query_id")
        .agg(F.sum("gm").alias("idcg_micro"))
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        F.round(
            F.col("dcg_micro").cast("double") / F.col("idcg_micro"), 6
        ).alias("ndcg"),
        F.round(F.col("dcg_micro") / F.lit(1e6), 6).alias("dcg"),
        F.round(F.col("idcg_micro") / F.lit(1e6), 6).alias("idcg"),
    )
