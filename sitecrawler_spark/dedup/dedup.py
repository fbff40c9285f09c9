"""Deduplication operators for training-data pipelines.

All signatures are pure Column expressions over the portable md5-based
hash (reproducible in DuckDB for the oracle gate).

Algorithms: MinHash per Broder, "On the resemblance and containment of
documents" (SEQUENCES 1997) with LSH banding per Leskovec/Rajaraman/
Ullman, *Mining of Massive Datasets* ch.3; SimHash per Charikar,
"Similarity estimation techniques from rounding algorithms" (STOC
2002). Scale notes:

- exact: hash-groupBy keep-first — one shuffle on the fingerprint.
- minhash+LSH: signatures are per-row map-side work; banding explodes
  to (n_bands × rows) then ONE shuffle on band_key; candidate pairs
  come from within-bucket self-joins of (usually tiny) buckets — never
  an all-pairs join.
- simhash: per-row 64-ish-bit signature; near-dup candidates via exact
  band-of-bits buckets (4×16-bit bands → Hamming ≤ 3 within banding
  guarantees), same explode-shuffle shape as LSH.
- n-gram Jaccard: exact verify step on candidate pairs only.
- embedding cosine: see ann.py (brute-force + LSH-bucketed variants).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sitecrawler_spark.kernel.urls_spark import portable_hash64
from sitecrawler_spark.textops.functions import normalize_text


def portable_hash_str(c: Column, salt: int) -> Column:
    """Deterministic salted 60-bit hash, identical in DuckDB:
    ('0x' || substr(md5(concat(x, '#', salt)), 1, 15))::BIGINT"""
    return F.conv(
        F.substring(F.md5(F.concat(c, F.lit(f"#{salt}"))), 1, 15), 16, 10
    ).cast("long")


def char_shingles(c: Column, k: int = 5) -> Column:
    """Distinct character k-shingles of the normalized text. NOT sorted:
    every consumer (array_min in minhash, array_intersect/size in
    jaccard) is order-independent, so the per-row string sort was pure
    waste (q_minhash_pairs 27.6 s → 22.3 s at sf0.1/local[32])."""
    t = normalize_text(c)
    n = F.greatest(F.length(t) - F.lit(k - 1), F.lit(1))
    arr = F.transform(F.sequence(F.lit(1), n), lambda i: t.substr(i, F.lit(k)))
    return F.array_distinct(arr)


def _bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` ONCE and make it available to ``fn`` as a bound
    lambda variable: transform(array(expr), x -> fn(x))[0].

    Catalyst's CollapseProject inlines a projected column expression
    into EVERY downstream reference — element_at(sig, i) used 8 times
    re-evaluates the whole signature 8 times (measured 120 s vs 4 s on
    the sf0.1 band build). A lambda variable is a true binding the
    optimizer cannot inline through, so shared subexpressions (shingle
    arrays, token-hash arrays, signatures) are computed once per row."""
    return F.element_at(F.transform(F.array(expr), fn), 1)


def _hash_with_salt(j: int):
    # closure factory: a default-arg lambda would make pyspark treat
    # the extra parameter as a lambda variable (index column)
    return lambda s: portable_hash_str(s, j)


def minhash_signature(c: Column, n_hashes: int = 16, k: int = 5) -> Column:
    """Array of n minhash values: min over shingles of salted hash.
    The shingle array is lambda-bound so it is computed once, not once
    per hash."""
    return _bind(
        char_shingles(c, k),
        lambda sh: F.array(
            *[F.array_min(F.transform(sh, _hash_with_salt(j)))
              for j in range(n_hashes)]
        ),
    )


def minhash_band_keys(
    c: Column, n_hashes: int = 16, n_bands: int = 4, k: int = 5
) -> Column:
    """Array of LSH band keys ("<band>_<h>_<h>…") with BOTH the shingle
    array and the signature lambda-bound — one shingle pass + n_hashes
    hash passes per row, regardless of how many band keys reference
    the signature."""
    rows_per_band = n_hashes // n_bands

    def bands_from(sig: Column) -> Column:
        return F.array(
            *[
                F.concat_ws(
                    "_",
                    F.lit(b),
                    *[F.element_at(sig, b * rows_per_band + j + 1)
                      for j in range(rows_per_band)],
                )
                for b in range(n_bands)
            ]
        )

    return _bind(
        char_shingles(c, k),
        lambda sh: _bind(
            F.array(
                *[F.array_min(F.transform(sh, _hash_with_salt(j)))
                  for j in range(n_hashes)]
            ),
            bands_from,
        ),
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact near-free dedup: keep the lowest id per normalized-text
    fingerprint (hash-groupBy; one shuffle)."""
    key = F.md5(normalize_text(F.col(text_col)))
    w = Window.partitionBy(key).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    n_bands: int = 4,
    k: int = 5,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: rows sharing any band of
    the minhash signature. Returns (id_a, id_b) with id_a < id_b,
    distinct. Shuffles on band_key only; bucket self-join never goes
    all-pairs.

    ``max_bucket_size`` is the degenerate-bucket skew guard: a band
    bucket larger than the cap (e.g. a mass-duplicated boilerplate
    corpus) would make the within-bucket self-join quadratic in that
    bucket — those buckets are excluded here because their contents are
    by construction near-identical and owned by the EXACT dedup path
    (md5 fingerprint, ``exact_dedup``), which is linear. Set 0 to
    disable."""
    bands = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            minhash_band_keys(F.col(text_col), n_hashes, n_bands, k)
        ).alias("band_key"),
    )
    return banded_pairs(bands, max_bucket_size)


def minhash_lsh_pairs_against(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    n_hashes: int = 16,
    n_bands: int = 4,
    k: int = 5,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Incremental dedup: candidate near-dup pairs between a NEW batch
    and an EXISTING corpus (continual-ingestion shape — the batch is
    checked against the index, never all-pairs within the corpus).
    Returns (batch_id, corpus_id), distinct. Shuffle = one band_key
    exchange per side; the bucket cap applies to CORPUS buckets (a
    boilerplate-flooded index bucket would make the join quadratic in
    that bucket; those contents belong to the exact-dup path)."""

    def bands_of(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.explode(
                minhash_band_keys(F.col(text_col), n_hashes, n_bands, k)
            ).alias("band_key"),
        )

    return banded_pairs_against(bands_of(batch), bands_of(corpus),
                                max_bucket_size)


def banded_pairs_against(
    batch_bands: DataFrame,
    corpus_bands: DataFrame,
    max_bucket_size: int,
    corpus_prepartitioned: bool = False,
) -> DataFrame:
    """(batch_id, corpus_id) pairs sharing ≥1 band bucket, two-sided.
    Pass ``corpus_prepartitioned=True`` when the corpus band frame is
    already hash-partitioned on band_key (e.g. both sides derive from
    ONE repartitioned scan — the exchange is then reused, not redone)."""
    if not corpus_prepartitioned:
        corpus_bands = corpus_bands.repartition("band_key")
    if max_bucket_size > 0:
        sizes = corpus_bands.groupBy("band_key").agg(
            F.count("*").alias("_bn")
        )
        corpus_bands = (
            corpus_bands.join(sizes, "band_key")
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    a = batch_bands.alias("a")
    b = corpus_bands.alias("b")
    return (
        a.join(b, F.col("a.band_key") == F.col("b.band_key"))
        .select(
            F.col("a.id").alias("batch_id"), F.col("b.id").alias("corpus_id")
        )
        .distinct()
    )


def banded_pairs(bands: DataFrame, max_bucket_size: int) -> DataFrame:
    """Distinct (id_a, id_b) pairs sharing ≥1 band bucket, from a
    (id, band_key) frame. Shared candidate-join core of minhash and
    simhash LSH."""
    # Force the band_key hash exchange HERE: the bucket-size agg and
    # both sides of the self-join then hang off one identical shuffle
    # (ReusedExchange — signatures computed once). Without it, AQE
    # broadcast-joins the small side at low SF and each consumer
    # recomputes the full signature scan (measured 225 s vs 6 s, sf0.1).
    bands = bands.repartition("band_key")
    if max_bucket_size > 0:
        # one extra agg on the same band_key shuffle key; over-cap
        # buckets never enter the self-join
        sizes = bands.groupBy("band_key").agg(F.count("*").alias("_bn"))
        bands = (
            bands.join(sizes, "band_key")
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard(a_text: Column, b_text: Column, k: int = 5) -> Column:
    """Exact Jaccard similarity of distinct char k-shingle sets."""
    sa, sb = char_shingles(a_text, k), char_shingles(b_text, k)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = (F.size(sa) + F.size(sb)).cast("double") - inter
    return F.round(inter / F.greatest(union, F.lit(1.0)), 6)


def simhash64(c: Column, n_bits: int = 60) -> Column:
    """SimHash over whitespace word tokens using the portable hash:
    bit j of the signature = sign of Σ_tokens (2·((h(tok)>>j)&1) − 1).
    60 bits so the value stays in the portable-hash range."""
    toks = F.split(F.trim(F.lower(c)), r"\s+")

    def bit_merge(j: int):
        return lambda acc, h: acc + (
            F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1
        )

    def sig_from(hashes: Column) -> Column:
        bit_sums = [
            F.aggregate(hashes, F.lit(0).cast("long"), bit_merge(j))
            for j in range(n_bits)
        ]
        out = F.lit(0).cast("long")
        for j, s in enumerate(bit_sums):
            out = out + F.when(s > 0, F.lit(2 ** j).cast("long")).otherwise(
                F.lit(0)
            )
        return out

    # token-hash array lambda-bound: md5 per token once, not once per bit
    return _bind(
        F.transform(toks, lambda t: portable_hash_str(t, 0)), sig_from
    )


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_bits: int = 24,
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """SimHash near-dup pairs: banding guarantees every pair within
    Hamming distance < n_bands shares ≥1 exact band bucket; candidates
    are then verified exactly (bit_count of xor ≤ max_hamming). Same
    one-shuffle banded-join shape as minhash_lsh_pairs. Returns
    (id_a, id_b, hamming)."""
    sims = df.select(
        F.col(id_col).alias("id"),
        simhash64(F.col(text_col), n_bits).alias("sim"),
    )
    bands = sims.select(
        "id", F.explode(simhash_bands(F.col("sim"), n_bands, n_bits)).alias(
            "band_key"
        ),
    )
    cand = banded_pairs(bands, max_bucket_size)
    # verify on candidates only — join the (small) signature table back
    sa = sims.select(F.col("id").alias("id_a"), F.col("sim").alias("_sa"))
    sb = sims.select(F.col("id").alias("id_b"), F.col("sim").alias("_sb"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a", "id_b",
            F.bit_count(
                F.col("_sa").bitwiseXOR(F.col("_sb"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_bands(sim: Column, n_bands: int = 4, n_bits: int = 60) -> Column:
    """Band keys for simhash near-dup bucketing: rows equal in ≥1 band
    (Hamming distance < n_bands guaranteed caught)."""
    bits_per = n_bits // n_bands
    mask = (1 << bits_per) - 1
    return F.array(
        *[
            F.concat_ws(
                "_", F.lit(b),
                F.shiftright(sim, b * bits_per).bitwiseAND(F.lit(mask)),
            )
            for b in range(n_bands)
        ]
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Winnowed document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: local algorithms for document fingerprinting", SIGMOD
    2003): hash every word k-gram, slide a w-hash window per document,
    keep each window's MINIMUM hash (simplified min rule — every
    window minimum, deduplicated — mirrored exactly in the SQL
    oracle). This is a DELIBERATE simplification of §4's robust rule:
    the per-window selected VALUE is always the window minimum, so the
    distinct (id, fp) set here is identical to robust winnowing's —
    see winnow_fingerprints_robust for the stateful rightmost-tie
    variant that additionally thins recorded POSITIONS on repetitive
    text.
    Winnowing guarantees any shared substring of ≥ k+w-1 words yields
    at least one shared fingerprint — the SUBSTRING-overlap dedup
    modality (Lee et al., "Deduplicating Training Data Makes Language
    Models Better", ACL 2022 motivate it) that word-set minhash cannot
    see. Hashes use the portable md5-based hash so the oracle
    reproduces bit-for-bit.

    Distributed shape: one tokenize, per-doc lead/window passes over
    ONE (id, pos) sort — no self-join, no explosion; output is the
    distinct (id, fp) set, ≈ n_grams/w rows per doc. Returns
    (id, fp)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "word"),
    ).filter(F.col("word") != "")
    wl = Window.partitionBy("id").orderBy("pos")
    gram = F.concat_ws(
        " ", F.col("word"), *[F.lead("word", i).over(wl) for i in range(1, k)]
    )
    grams = (
        toks.withColumn("_g", gram)
        .withColumn("_last", F.lead("word", k - 1).over(wl))
        .filter(F.col("_last").isNotNull())  # complete k-grams only
        .select("id", "pos", portable_hash64(F.col("_g")).alias("h"))
    )
    wmin = Window.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    fps = (
        grams.withColumn("_full", F.lead("h", w - 1).over(wl))
        .withColumn("fp", F.min("h").over(wmin))
        .filter(F.col("_full").isNotNull())  # complete w-windows only
        .select("id", "fp")
        .distinct()
    )
    return fps


def winnow_fingerprints_robust(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """ROBUST winnowing exactly as Schleimer, Wilkerson & Aiken §4: in
    each window select the minimum hash; break ties by keeping the
    PREVIOUS window's selection when it is still in the window and
    still minimal, else select the RIGHTMOST minimal hash; record a
    (pos, fp) only when the selection changes. The selected VALUE per
    window is always the window minimum, so the distinct fingerprint
    set equals winnow_fingerprints' simplified every-minimum rule —
    what robust winnowing adds is POSITIONAL density: on repetitive
    text (the adversarial case §4 targets, e.g. a run of one repeated
    k-gram) it records ~1/w of the positions the state-free
    rightmost-tie rule would, giving sparser localization anchors.

    The selection rule is sequential per document (the tie-break
    depends on the previous window's selection), so this runs the
    textbook scan inside an Arrow-batched applyInPandas over id
    groups — per-doc memory O(tokens), the same bound the HTML parser
    already carries; the state-free winnow_fingerprints stays the
    default set-level scale path. Hashes are the same portable
    md5-based word-k-gram hashes, so robust and simplified variants
    interoperate (shared-substring guarantee: any match of ≥ k+w-1
    words still yields ≥1 shared fingerprint). Returns (id, pos, fp)
    with pos = the recorded gram's word offset."""
    import pandas as pd

    from sitecrawler_spark.kernel.udfs import portable_hash64_py

    id_type = df.schema[id_col].dataType.simpleString()
    toks = df.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("_ws"),
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        out_id, out_pos, out_fp = [], [], []
        for did, ws in zip(pdf["id"], pdf["_ws"]):
            words = [x for x in ws if x != ""]
            n = len(words) - k + 1
            if n < w:
                continue
            hs = [
                portable_hash64_py(" ".join(words[i : i + k]))
                for i in range(n)
            ]
            sel = -1  # previously selected gram index
            for p in range(n - w + 1):
                win = hs[p : p + w]
                m = min(win)
                # keep the previous selection while it is still in the
                # window and still minimal; else rightmost minimal
                if not (sel >= p and hs[sel] == m):
                    sel = p + w - 1 - win[::-1].index(m)
                    out_id.append(did)
                    out_pos.append(sel)
                    out_fp.append(hs[sel])
        return pd.DataFrame({"id": out_id, "pos": out_pos, "fp": out_fp})

    return toks.groupBy("id").applyInPandas(
        scan, schema=f"id {id_type}, pos long, fp long"
    )


def winnow_pairs(
    fps: DataFrame,
    min_shared: int = 3,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """(id_a, id_b, shared) document pairs sharing ≥ ``min_shared``
    winnowed fingerprints (id_a < id_b). The fingerprint inverted index
    self-joins per fp bucket — ``max_bucket_size`` is the boilerplate
    skew guard (an fp present in >10k docs is boilerplate owned by the
    exact-dup path, same rationale as the LSH band cap); shared-count
    aggregation gets map-side combine."""
    f = fps.repartition("fp")
    if max_bucket_size > 0:
        sizes = f.groupBy("fp").agg(F.count("*").alias("_bn"))
        f = f.join(sizes, "fp").filter(
            F.col("_bn") <= max_bucket_size
        ).drop("_bn")
    a = f.alias("a")
    b = f.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )


def line_dedup_keep_first(
    lines: DataFrame,
    doc_col: str = "doc_id",
    pos_col: str = "line_id",
    line_col: str = "line_text",
) -> DataFrame:
    """Corpus-WIDE line-level exact dedup (CCNet, Wenzek et al.,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data", LREC 2020 §3.1): across ALL documents, only the FIRST
    occurrence of each distinct line survives; every later repetition —
    navigation chrome, cookie banners, boilerplate shared across hosts —
    is dropped. Complements q_boilerplate_strip, which is per-HOST
    frequency-threshold removal (drop everywhere when >20% of host
    docs); CCNet's rule is global keep-first regardless of frequency.

    Input: exploded lines (doc, pos, text). Output: the input plus a
    boolean ``keep`` — True iff (doc, pos) is the lexicographic-minimum
    occurrence of that line's 60-bit portable hash.

    Distributed shape (100 TB): lines hash to a long key map-side; the
    first-occurrence table is ONE groupBy(line_hash).min(struct) —
    map-side combine collapses each partition to its distinct hashes, so
    a line repeated 10^6 times costs one row per partition in the
    shuffle, never a hot reducer. The flag comes from ONE long-keyed
    join of the lines against that 1-row-per-hash table (AQE skew-join
    splits any residual hot hash on the probe side) — no windows over
    the hash (a window's per-key sort would put every occurrence of a
    hot line on one task), and no second join back: the payload rides
    the probe side."""
    ex = lines.withColumn("_lh", portable_hash64(F.col(line_col)))
    first = ex.groupBy("_lh").agg(
        F.min(
            F.struct(F.col(doc_col).alias("_d"), F.col(pos_col).alias("_p"))
        ).alias("_fo")
    )
    keep = (
        (F.col(doc_col) == F.col("_fo._d"))
        & (F.col(pos_col) == F.col("_fo._p"))
    ).alias("keep")
    return ex.join(first, "_lh").select(*lines.columns, keep)


def exact_substring_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    l_tokens: int = 8,
) -> DataFrame:
    """ExactSubstr dedup at token-L-gram granularity (Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", ACL
    2022 §4.1): any token run of length ≥ L that appears at more than
    one (doc, pos) is removed from every occurrence EXCEPT the
    lexicographic-first one; overlapping/adjacent removal windows merge
    into maximal islands. L-gram granularity is the deliberate
    simplification of the paper's suffix-array construction: a shared
    run of length s ≥ L is covered by its s−L+1 duplicated L-grams, so
    the merged islands equal the suffix-array answer for runs ≥ L (the
    winnow_fingerprints ≥k+w−1 rationale); runs shorter than L are
    below the dedup threshold by definition.

    Returns per-doc maximal removal islands (id, island, start, end) —
    end exclusive, token offsets. Empty result for docs with no
    duplicated span.

    Distributed shape (100 TB): the rolling L-gram fingerprint array is
    built map-side per doc (no explode-then-window); first-occurrence +
    multiplicity is ONE groupBy(fp).min(struct) with map-side combine;
    fps seen once — the overwhelming majority — are dropped BEFORE the
    join back, so the join touches only duplicated fingerprints. The
    island merge is a per-doc window (bounded by doc length, never by
    corpus size)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # guard: F.sequence(0, negative) DESCENDS — short docs must yield
    # an empty fingerprint array (the dsir_logweights bigram rule)
    fp_arr = F.when(
        n >= l_tokens,
        F.transform(
            F.sequence(F.lit(0), n - l_tokens),
            lambda i: portable_hash64(
                F.array_join(F.slice(toks, i + 1, l_tokens), " ")
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))
    occ = docs.select(
        F.col(id_col).alias("id"), F.posexplode(fp_arr).alias("pos", "fp")
    )
    dup_first = (
        occ.groupBy("fp")
        .agg(F.min(F.struct("id", "pos")).alias("_fo"),
             F.count("*").alias("_cnt"))
        .filter(F.col("_cnt") > 1)
    )
    marked = (
        occ.join(dup_first, "fp")
        .filter(
            ~(
                (F.col("id") == F.col("_fo.id"))
                & (F.col("pos") == F.col("_fo.pos"))
            )
        )
        .select(
            "id",
            F.col("pos").alias("start"),
            (F.col("pos") + l_tokens).alias("end"),
        )
    )
    w = Window.partitionBy("id").orderBy("start", "end")
    prev_max = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        marked.withColumn(
            "_new",
            F.when(
                prev_max.isNull() | (F.col("start") > prev_max), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("_new").over(w))
        .groupBy("id", "island")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
    )


def remove_spans(
    docs: DataFrame,
    islands: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply exact_substring_spans' removal islands: drop every token
    whose position falls inside an island, rejoin the survivors with
    single spaces. Docs without islands pass through untouched. The
    per-doc island list is collected into ONE array column (bounded by
    doc length / l_tokens) and applied with JVM higher-order functions
    — no explode of the token stream, no Python."""
    isl_agg = islands.groupBy("id").agg(
        F.sort_array(F.collect_list(F.struct("start", "end"))).alias("_isl")
    )
    j = docs.join(
        isl_agg, docs[id_col] == isl_agg["id"], "left"
    ).drop("id")
    toks = F.split(F.col(text_col), " ")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_isl"),
            lambda s: (i >= s["start"]) & (i < s["end"]),
        ),
    )
    out = F.when(F.col("_isl").isNull(), F.col(text_col)).otherwise(
        F.array_join(kept, " ")
    )
    return j.withColumn(text_col, out).drop("_isl")
