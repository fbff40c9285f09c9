"""Streaming corpus ingestion with incremental dedup: document files
landing in a watched directory become micro-batches; each batch is
exact-deduped within itself, then checked against the ACCUMULATED
corpus — exact fingerprints first, minhash-LSH near-dup bands second
(dedup.minhash_lsh_pairs_against: batch×index join, never all-pairs
within the corpus) — and only the survivors join the corpus.

This is the ingest half of a continuously-fed training-data pipeline:
the crawl engine emits pages (streaming/crawl_stream.py feeds IT seeds
the same way), and this stream keeps the growing corpus dedup-clean
without ever rescanning it. ``foreachBatch`` is the documented escape
hatch for the batch-engine-inside-a-stream composition, exactly as in
stream_seed_crawl; tests drain with ``trigger(availableNow=True)``,
production runs continuous with a durable checkpointLocation.

Scale notes (100 TB): per batch, the corpus side costs one band-key
exchange over its band INDEX (in production a materialized band table
— the signatures are never recomputed) and one fingerprint anti-join;
the accumulated-state handle here is a localCheckpoint (the tableio
SnapshotStore APPEND-delta analog), so lineage never grows with batch
count.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sitecrawler_spark.dedup.dedup import (
    exact_dedup,
    minhash_lsh_pairs_against,
)
from sitecrawler_spark.textops.functions import normalize_text


def dedup_batch_against(
    batch,
    corpus,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    n_bands: int = 4,
    k: int = 5,
):
    """One ingest step, usable batch-side too: within-batch exact dedup,
    exact-fingerprint anti-join against ``corpus`` (None ⇒ empty), then
    minhash-LSH near-dup rejection against the corpus. Returns the
    surviving batch rows."""
    b = exact_dedup(batch, text_col, id_col)
    if corpus is None:
        return b
    fp = F.md5(normalize_text(F.col(text_col)))
    corpus_fp = corpus.select(fp.alias("_cfp")).distinct()
    b = (
        b.withColumn("_fp", fp)
        .join(corpus_fp, F.col("_fp") == F.col("_cfp"), "left_anti")
        .drop("_fp")
    )
    near = minhash_lsh_pairs_against(
        b, corpus, text_col, id_col,
        n_hashes=n_hashes, n_bands=n_bands, k=k,
    ).select("batch_id").distinct()
    return b.join(
        near, b[id_col] == near["batch_id"], "left_anti"
    )


def stream_corpus_ingest(
    spark,
    doc_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    initial_corpus=None,
    max_files_per_trigger: int | None = None,
    **dedup_kwargs,
) -> dict:
    """Drain all currently-available document files in ``doc_dir``,
    incrementally deduping each micro-batch against the accumulated
    corpus. Returns {"batches", "arrived", "ingested", "corpus"} —
    ``corpus`` is the final deduped DataFrame. Callable repeatedly: the
    streaming checkpoint remembers which files were already ingested."""
    state = {
        "batches": 0,
        "arrived": 0,
        "ingested": 0,
        "corpus": initial_corpus,
    }

    def handle(batch_df, batch_id: int) -> None:
        state["batches"] += 1
        state["arrived"] += batch_df.count()
        survivors = dedup_batch_against(
            batch_df, state["corpus"], **dedup_kwargs
        )
        merged = (
            survivors
            if state["corpus"] is None
            else state["corpus"].unionByName(survivors)
        )
        # eager checkpoint: the NEXT batch's anti-joins read a flat
        # snapshot, not a lineage chain over every prior batch
        state["corpus"] = merged.localCheckpoint(eager=True)
        state["ingested"] += survivors.count()

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(doc_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state
