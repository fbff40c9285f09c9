"""Behavioral pins for distributed BPE training (textops/tokenizer.py):
hand-checkable merge order, greedy-merge semantics, inference parity,
and the one-row-to-driver iteration shape."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F


def _words(spark, rows):
    return spark.createDataFrame(rows, "word string, freq long")


def test_bpe_learns_most_frequent_pair_first(spark):
    """Corpus dominated by 'ab': the first merge must be (a, b)."""
    from sitecrawler_spark.textops.tokenizer import bpe_train

    w = _words(spark, [("abab", 10), ("abc", 5), ("cd", 1)])
    merges, seg = bpe_train(w, 1)
    m = merges.collect()
    assert [(r.left, r.right) for r in m] == [("a", "b")]
    # 'ab' occurs 2×10 (in abab) + 1×5 (in abc) = pair freq 25
    assert m[0].pair_freq == 25
    got = {r.word: r.sym for r in seg.collect()}
    assert got["abab"] == ["ab", "ab"]
    assert got["abc"] == ["ab", "c"]


def test_bpe_merge_is_greedy_left_to_right(spark):
    """'aaa' under merge (a,a) segments to [aa, a], never [a, aa]."""
    from sitecrawler_spark.textops.tokenizer import bpe_train

    w = _words(spark, [("aaa", 3)])
    merges, seg = bpe_train(w, 1)
    assert [(r.left, r.right) for r in merges.collect()] == [("a", "a")]
    assert seg.collect()[0].sym == ["aa", "a"]


def test_bpe_tie_breaks_lexicographically(spark):
    """Equal pair counts: (a,b) beats (b,a) and (c,d)."""
    from sitecrawler_spark.textops.tokenizer import bpe_train

    w = _words(spark, [("ab", 4), ("ba", 4), ("cd", 4)])
    merges, _ = bpe_train(w, 1)
    assert [(r.left, r.right) for r in merges.collect()] == [("a", "b")]


def test_bpe_stops_when_no_pairs_left(spark):
    """Single-char words have no adjacent pairs: zero merges learned,
    no crash, segmentation = the characters."""
    from sitecrawler_spark.textops.tokenizer import bpe_train

    w = _words(spark, [("a", 5), ("b", 3)])
    merges, seg = bpe_train(w, 4)
    assert merges.count() == 0
    assert {r.word: r.sym for r in seg.collect()} == {"a": ["a"], "b": ["b"]}


def test_bpe_segment_inference_matches_training(spark):
    """Applying the learned merge list to the SAME words via segment()
    reproduces the training-side segmentation exactly (train/serve
    parity), and segment() adds zero exchanges (pure map)."""
    from sitecrawler_spark.queries import bpe_corpus
    from sitecrawler_spark.textops.tokenizer import bpe_train, segment

    w = _words(spark, bpe_corpus())
    merges, seg = bpe_train(w, 12)
    mlist = [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    inf = segment(w.select("word"), mlist)
    plan = inf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    got = {r.word: r.sym for r in inf.collect()}
    want = {r.word: r.sym for r in seg.collect()}
    assert got == want


def test_bpe_model_matches_spark_merges(spark):
    """The independent Python model (oracles.bpe_model) and the Spark
    trainer learn the SAME ordered merge list on the gate corpus —
    the merge-sequence analog of the segmentation hash gate."""
    from sitecrawler_spark.oracles import bpe_model
    from sitecrawler_spark.queries import bpe_corpus
    from sitecrawler_spark.textops.tokenizer import bpe_train

    corpus = bpe_corpus()
    model_merges, _ = bpe_model(corpus, 12)
    merges, _ = bpe_train(_words(spark, corpus), 12)
    got = [(r.rank, r.left, r.right, r.pair_freq)
           for r in merges.orderBy("rank").collect()]
    assert got == model_merges
