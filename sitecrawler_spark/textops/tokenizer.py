"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016) — the tokenizer-training step of a training-data pipeline,
expressed in the shape that scales:

- the working set is the DISTINCT-word frequency table (Zipf: orders
  of magnitude smaller than the token stream it summarizes), built
  with one map-side-combined groupBy over the corpus;
- each merge iteration is (1) a pair-count aggregation — explode
  adjacent symbol pairs weighted by word frequency, map-side partial
  aggregation, ONE shuffle of (pair, partial-count) rows; (2) a
  global argmax of which only a single row reaches the driver;
  (3) a narrow per-row fold that applies the merge greedily
  left-to-right (pure Column expression, no shuffle, no Python);
- per-iteration ``localCheckpoint`` cuts the growing lineage, so
  n_merges iterations cost n_merges bounded jobs (the kmeans /
  pagerank iteration discipline used across this repo).

Ties in the argmax break deterministically: highest summed frequency,
then lexicographically smallest (left, right).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table: one map-side-combined groupBy
    over the exploded token stream. Returns (word, freq)."""
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_fold(sym: Column, left: str, right: str) -> Column:
    """Apply merge (left, right) greedily left-to-right: fold the
    symbol array, replacing the tail element when (tail, next) equals
    the pair — the canonical non-overlapping BPE merge as a pure
    Column expression."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (s == lit_r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(lit_l, lit_r)),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
) -> tuple[DataFrame, DataFrame]:
    """Train ``n_merges`` BPE merges over a (word, freq) table.

    Returns ``(merges, segmented)``: merges = (rank, left, right,
    pair_freq) learned in order; segmented = (word, freq, symbols)
    with each word's final segmentation under the learned merges.
    """
    spark = words.sparkSession
    cur = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).cast("long").alias("freq"),
        F.split(F.col(word_col), "").alias("sym"),
    ).localCheckpoint(eager=True)

    learned: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = cur.select(
            "freq",
            F.explode(
                F.when(
                    F.size("sym") < 2,
                    F.array().cast("array<struct<l:string,r:string>>"),
                )
                .otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.size("sym") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("sym"), i).alias("l"),
                            F.element_at(F.col("sym"), i + 1).alias("r"),
                        ),
                    )
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0].c < 1:
            break
        left, right, cnt = top[0].l, top[0].r, int(top[0].c)
        learned.append((rank, left, right, cnt))
        cur = cur.withColumn(
            "sym", _merge_fold(F.col("sym"), left, right)
        ).localCheckpoint(eager=True)

    merges = spark.createDataFrame(
        learned, "rank long, left string, right string, pair_freq long"
    )
    return merges, cur.select("word", "freq", "sym")


def segment(words: DataFrame, merges: list[tuple[str, str]],
            word_col: str = "word") -> DataFrame:
    """Apply an already-learned merge list to new words (tokenizer
    INFERENCE): the same greedy fold per merge, no shuffles at all —
    a pure map over the input."""
    out = words.withColumn("sym", F.split(F.col(word_col), ""))
    for left, right in merges:
        out = out.withColumn("sym", _merge_fold(F.col("sym"), left, right))
    return out
