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

Scale notes (100 TB): the dedup state is a MATERIALIZED incremental
index carried across batches — ``fps`` (distinct md5 fingerprints) and
``bands`` (minhash band keys), both accumulated as per-batch
checkpointed parts exactly like the engine's visited-parts design.
Each batch signatures ONLY its own survivors, once; prior batches'
text is never re-tokenized or re-hashed, so per-batch signature work
is O(batch), not O(accumulated corpus) — the probe joins scan the
index parts (the batch side broadcasts), and the parts fold into one
flat checkpoint every ``_FOLD_PARTS`` batches to bound plan width.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sitecrawler_spark.dedup.dedup import (
    banded_pairs_against,
    exact_dedup,
    minhash_band_keys,
    minhash_lsh_pairs_against,
)
from sitecrawler_spark.textops.functions import normalize_text

# fold accumulated index/corpus parts into one checkpoint when the
# union plan exceeds this many children (engine._VISITED_FOLD_PARTS
# rationale: analysis cost of a union grows with its width)
_FOLD_PARTS = 32


def _fp(text_col: str):
    return F.md5(normalize_text(F.col(text_col)))


def _band_frame(df, text_col, id_col, n_hashes, n_bands, k):
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            minhash_band_keys(F.col(text_col), n_hashes, n_bands, k)
        ).alias("band_key"),
    )


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
    corpus via the MATERIALIZED fingerprint/band index (module
    docstring). Returns {"batches", "arrived", "ingested", "corpus"} —
    ``corpus`` is the final deduped DataFrame. Callable repeatedly: the
    streaming checkpoint remembers which files were already ingested."""
    text_col = dedup_kwargs.get("text_col", "text")
    id_col = dedup_kwargs.get("id_col", "doc_id")
    n_hashes = dedup_kwargs.get("n_hashes", 16)
    n_bands = dedup_kwargs.get("n_bands", 4)
    k = dedup_kwargs.get("k", 5)

    state = {
        "batches": 0,
        "arrived": 0,
        "ingested": 0,
        "corpus": None,
        "_corpus_parts": [],
        "_fps_parts": [],
        "_bands_parts": [],
    }

    def _union(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _append(key: str, part) -> None:
        """Append a checkpointed part; fold when the union gets wide."""
        parts = state[key]
        parts.append(part)
        if len(parts) > _FOLD_PARTS:
            state[key] = [
                _union(parts).localCheckpoint(eager=True)
            ]

    def _ingest(survivors) -> None:
        """Index the batch's survivors ONCE: their corpus rows, their
        distinct fingerprints, their band keys — the only signature
        computation this batch's text ever gets."""
        surv = survivors.localCheckpoint(eager=True)
        _append("_corpus_parts", surv)
        _append(
            "_fps_parts",
            surv.select(_fp(text_col).alias("_cfp")).distinct()
            .localCheckpoint(eager=True),
        )
        _append(
            "_bands_parts",
            _band_frame(surv, text_col, id_col, n_hashes, n_bands, k)
            .localCheckpoint(eager=True),
        )
        state["corpus"] = _union(state["_corpus_parts"])
        # the materialized index handles, exposed so callers (and the
        # pin test) can see the dedup state is RDD-backed, not a
        # recompute-from-text plan
        state["fps"] = _union(state["_fps_parts"])
        state["bands"] = _union(state["_bands_parts"])
        state["ingested"] += surv.count()

    if initial_corpus is not None:
        _ingest(initial_corpus)
        state["ingested"] = 0  # pre-existing rows are not "ingested"

    def handle(batch_df, batch_id: int) -> None:
        state["batches"] += 1
        state["arrived"] += batch_df.count()
        b = exact_dedup(batch_df, text_col, id_col)
        if state["_fps_parts"]:
            # probe the materialized index: exact fingerprints, then
            # LSH bands — the accumulated corpus TEXT is never touched
            b = (
                b.withColumn("_fp", _fp(text_col))
                .join(
                    _union(state["_fps_parts"]),
                    F.col("_fp") == F.col("_cfp"),
                    "left_anti",
                )
                .drop("_fp")
            )
            near = banded_pairs_against(
                _band_frame(b, text_col, id_col, n_hashes, n_bands, k),
                _union(state["_bands_parts"]),
                10_000,
                corpus_prepartitioned=True,
            ).select("batch_id").distinct()
            b = b.join(near, b[id_col] == near["batch_id"], "left_anti")
        _ingest(b)

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
