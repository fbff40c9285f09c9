"""Crawl → training-corpus export (corpus.py + engine hook): every
stage of the flagship composition does real, intentional work on the
deterministic corpus fixture, and the composed result is pinned
against the independent model+SQL oracle by the driver gate
(tests/test_driver_contract.py covers q_crawl_to_corpus)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sitecrawler_spark import corpus as C
from sitecrawler_spark.crawl import sitegen
from sitecrawler_spark.crawl.engine import SparkSiteCrawler
from sitecrawler_spark.queries import crawl_to_corpus_setup


def _crawled_docs(spark):
    rows, cfg, seeds = crawl_to_corpus_setup()
    eng = SparkSiteCrawler(spark, cfg, sitegen.site_to_df(spark, rows))
    eng.crawl(seeds, max_waves=60)
    from sitecrawler_spark.operators.ordering import assign_global_order

    docs = assign_global_order(
        eng.pages.filter(F.col("spans").isNotNull()),
        ["wave", "discovery_order"], out_col="doc_id", start=1,
    ).select(
        "doc_id", "host",
        F.transform(
            F.filter("spans", lambda s: s["kind"] == "text"),
            lambda s: s["text"],
        ).alias("lines"),
    )
    return eng, docs


def test_export_training_corpus_stages(spark):
    """Stage-by-stage: the fixture plants chrome, French pages,
    exact/near dups and n-gram bait — each stage must actually drop
    something, and the packer must produce multiple sequences per
    host within (or crossing once at) the 128-token boundary."""
    eng, docs = _crawled_docs(spark)
    n_crawled = docs.count()
    assert n_crawled == 44  # every fixture page reached from 2 seeds

    stripped = C.strip_boilerplate(docs)
    assert stripped.count() == n_crawled  # no doc is ALL chrome
    # nav/footer chrome never survives the strip
    texts = [r["text"] for r in stripped.collect()]
    assert all("nav " not in t and "footer " not in t for t in texts)
    assert all("subscribe to the weekly" not in t for t in texts)

    gated = C.quality_gate(stripped)
    n_gated = gated.count()
    assert 0 < n_gated < n_crawled  # French pages dropped
    assert gated.filter(F.col("lang_pred") != "en").count() == 0

    canon = C.dedup_canonical(gated)
    n_canon = canon.count()
    assert 0 < n_canon < n_gated  # exact dups AND near-dups removed

    clean = C.decontaminate(canon)
    n_clean = clean.count()
    # eval slice excluded and at least one contaminated doc dropped
    # beyond it (the fixture's planted bait lines)
    n_eval = canon.filter(F.col("doc_id") % 11 == 0).count()
    assert n_clean < n_canon - n_eval
    assert clean.filter(F.col("doc_id") % 11 == 0).count() == 0

    packed = C.pack_sequences(clean)
    rows = packed.collect()
    assert len(rows) > 2  # multiple sequences exist
    assert {r["host"] for r in rows} == {
        "www.salesforce.com", "docs.salesforce.com"
    }
    assert sum(r["n_docs"] for r in rows) == n_clean
    # first-token rule: every sequence starts below the next boundary,
    # so per-host seq_ids are dense from 0
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r["seq_id"])
    for ids in by_host.values():
        assert sorted(ids) == list(range(len(ids)))

    # the engine hook composes the same stages
    via_engine = eng.export_training_corpus()
    a = sorted(map(tuple, via_engine.collect()))
    b = sorted(map(tuple, packed.collect()))
    assert a == b


def test_training_corpus_cross_host_mirror_collapses(spark):
    """The mirror story: page i%9==8 republishes the previous page's
    body on (usually) the OTHER host with that host's chrome; after
    the per-host boilerplate strip the two bodies are byte-identical,
    so exact dedup collapses them — cross-host mirrors need no
    special-casing once chrome is gone."""
    _, docs = _crawled_docs(spark)
    stripped = C.strip_boilerplate(docs)
    dupes = (
        stripped.groupBy(F.md5(F.col("text")).alias("k"))
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("host").alias("nhosts"),
        )
        .filter(F.col("n") > 1)
    )
    rows = dupes.collect()
    assert rows, "fixture must contain post-strip exact duplicates"
    assert any(r["nhosts"] > 1 for r in rows), "…including cross-host"


def test_optional_corpus_stages_compose(spark):
    """Round-5b optional stages: CCNet global line dedup leaves every
    surviving line corpus-unique; ExactSubstr leaves no duplicated
    8-gram among survivors; the trained classifier filter keeps a
    nonempty subset; and the full pipeline with every option on still
    packs sequences."""
    from sitecrawler_spark.dedup.dedup import exact_substring_spans

    eng, docs = _crawled_docs(spark)
    n_docs = docs.count()

    ld = C.dedup_lines_global(docs)
    ex = ld.select(F.explode("lines").alias("line"))
    assert ex.groupBy("line").count().filter("count > 1").count() == 0
    assert 0 < ld.count() <= n_docs

    stripped = C.strip_boilerplate(docs)
    clf = {"n_buckets": 256, "n_iters": 6, "lr": 2.0}
    tf = C.classifier_filter(stripped, **clf)
    assert 0 < tf.count() <= stripped.count()

    canon = C.dedup_canonical(C.quality_gate(stripped))
    sd = C.dedup_substrings(canon, l_tokens=8)
    assert exact_substring_spans(sd, "text", "doc_id", 8).count() == 0

    seqs = C.training_corpus(
        docs, line_dedup=True, substr_dedup=True,
        trained_filter=True, clf_kwargs=clf,
    )
    assert seqs.count() > 0


def test_decontaminate_bloom_exact_equivalence(spark, sf_dir):
    """The bloom-routed decontamination path must return EXACTLY the
    broadcast path's surviving doc set (bloom negatives are definite;
    positives are re-verified), while the prefilter genuinely prunes
    the gram stream before the join."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    base = {r.doc_id for r in C.decontaminate(docs, 11, 8).collect()}
    via_bloom = {
        r.doc_id for r in C.decontaminate_bloom(docs, 11, 8).collect()
    }
    assert via_bloom == base
    assert 0 < len(base) < docs.count()
