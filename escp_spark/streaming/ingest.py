"""Incremental index ingest via Structured Streaming.

The reference is batch-only (the scroll is a one-shot paged scan;
estail is a bounded pull, cmd/estail/README.md:7 admits no `tail -f`), so
SURVEY.md §2.10 required no streaming operators. This module adds the
capability a living corpus needs anyway: `readStream` over the web_pages
directory → `foreachBatch` → each micro-batch becomes its own family of
level-0 segments, exactly-once via the streaming checkpoint +
epoch-scoped idempotent writes (the streaming analog of the build
ledger's group commits).

Semantics:
- Each epoch e gets effective buckets ``e * n_buckets + bucket`` so
  docids (bucket_eff<<40 | rank) stay globally unique and every
  (epoch, bucket) remains a complete docid window — the WAND serving
  path and the merge work unchanged.
- Within a batch: last-write-wins dedup. Across epochs: append-only —
  already-indexed urls are dropped (anti-join against the docmap).
  True cross-epoch updates need delete+reindex compaction, the same
  trade Lucene makes with soft-deletes; out of scope here.
- Queries only ever see a published manifest: call
  ``finalize_streamed_index`` after (or periodically between) epochs to
  merge + re-stat + atomically republish (D3/D5 analogs).
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..build import (
    DOC_BUCKET_SHIFT,
    _ledger_append,
    bucket_expr,
    build_segments,
    dedup_last_write_wins,
    docmap_for,
    extract_text_udf,
    merge_segments,
)
from ..sources.tables import IndexLayout, publish_manifest

log = logging.getLogger("escp_spark.streaming")


def _ingest_epoch(batch_df: DataFrame, epoch: int, layout: IndexLayout,
                  n_buckets: int) -> None:
    spark = batch_df.sparkSession
    prepared = (
        dedup_last_write_wins(batch_df)
        .withColumn("text", extract_text_udf(F.col("html")))
        .withColumn(
            "bucket",
            (bucket_expr(F.col("url"), n_buckets) + F.lit(epoch * n_buckets)).cast("int"),
        )
        .select("url", "bucket", "text")
    )
    # Append-only: drop urls already indexed in earlier epochs.
    if os.path.isdir(layout.docmap) and os.listdir(layout.docmap):
        existing = spark.read.parquet(layout.docmap).select("url")
        prepared = prepared.join(existing, "url", "left_anti")

    from ..build import DOCMAP_ROW_GROUP_BYTES

    dm_path = os.path.join(layout.docmap, f"group=e{epoch}")
    (
        docmap_for(prepared).write.mode("overwrite")
        .option("parquet.block.size", str(DOCMAP_ROW_GROUP_BYTES))
        .parquet(dm_path)
    )
    seg_path = os.path.join(layout.postings_l0, f"group=e{epoch}")
    build_segments(prepared).write.mode("overwrite").parquet(seg_path)
    docs = spark.read.parquet(dm_path).count()
    _ledger_append(
        spark, layout,
        [{
            "build_id": layout.build_id,
            "partition_id": int(epoch),
            "stage": "stream_epoch",
            "status": "committed",
            "segment_path": seg_path,
            "docs": int(docs),
            "bytes": 0,
            "input_snapshot": f"epoch={epoch}",
        }],
    )
    log.info("stream epoch %d committed: %d new docs", epoch, docs)


def stream_ingest_once(spark: SparkSession, source_dir: str, index_dir: str,
                       schema, n_buckets: int = 8,
                       build_id: str = "stream0") -> int:
    """Drain everything currently available from source_dir into the
    index (Trigger.AvailableNow semantics via processAllAvailable).
    Returns the number of epochs processed. Restart-safe: the streaming
    checkpoint skips files already ingested."""
    layout = IndexLayout(index_dir, build_id)
    layout.ensure_dirs()
    checkpoint = os.path.join(layout.root, "stream_checkpoint")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    epochs = {"n": 0}

    def _sink(batch_df: DataFrame, epoch: int):
        if batch_df.isEmpty():
            return
        _ingest_epoch(batch_df, epoch, layout, n_buckets)
        epochs["n"] += 1

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return epochs["n"]


def _stats_and_publish(spark: SparkSession, layout: IndexLayout,
                       max_segments: int, consolidation_shift: int) -> dict:
    """Rebuild dictionary + corpus stats from the published postings and
    atomically (re)publish the manifest — shared by finalize (cheap,
    unconsolidated) and compaction (full tail consolidation)."""
    postings = spark.read.parquet(layout.postings)
    (
        postings.groupBy("term")
        .agg(F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"))
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(layout.dictionary)
    )
    n_docs = spark.read.parquet(layout.docmap).count()
    total_tokens = (
        spark.read.parquet(layout.dictionary).agg(F.sum("cf")).collect()[0][0] or 0
    )
    return publish_manifest(
        layout,
        {
            "n_docs": int(n_docs),
            "avgdl": (total_tokens / n_docs) if n_docs else 0.0,
            "n_buckets": -1,  # open-ended (epoch-scoped buckets)
            "max_segments": max_segments,
            "block_size": 128,
            "codec_version": 1,
            "layout_version": 2,
            "analyzer_version": "escp-spark-analyzer-1",
            "input_snapshot": "streaming",
            "consolidation_shift": consolidation_shift,
        },
    )


def finalize_streamed_index(spark: SparkSession, index_dir: str,
                            max_segments: int = 5,
                            build_id: str = "stream0") -> dict:
    """Merge all streamed level-0 segments and atomically (re)publish —
    the force-merge + refresh-restore lifecycle step (D3/D5). Cheap and
    epoch-incremental-friendly: modulo segment placement, no tail
    consolidation (fragmentation grows with epochs — run
    ``compact_streamed_index`` periodically to reset it)."""
    layout = IndexLayout(index_dir, build_id)
    # Segment assignment must not depend on a fixed bucket count (epochs
    # keep adding effective buckets), so merge with modulo placement.
    l0 = spark.read.parquet(layout.postings_l0)
    merged = (
        l0.withColumn("segment", (F.col("bucket") % max_segments).cast("int"))
        .withColumn(
            "block_id",
            (F.col("bucket").cast("long") * F.lit(1 << 20)) + F.col("block_id"),
        )
        .sortWithinPartitions("segment", "term", "doc_id_lo")
        .drop("bucket", "group")
    )
    from ..build import POSTINGS_ROW_GROUP_BYTES

    (
        merged.write.mode("overwrite")
        .option("parquet.block.size", str(POSTINGS_ROW_GROUP_BYTES))
        .partitionBy("segment")
        .parquet(layout.postings)
    )
    # Modulo segment placement (open-ended epoch buckets) is not
    # docid-contiguous, so tails stay unconsolidated and every block
    # remains inside one effective bucket → prune window stays the bucket.
    return _stats_and_publish(spark, layout, max_segments, DOC_BUCKET_SHIFT)


def compact_streamed_index(spark: SparkSession, index_dir: str,
                           max_segments: int = 5,
                           build_id: str = "stream0") -> dict:
    """Periodic epoch compaction (the missing lifecycle step for a
    long-lived streamed index): re-merge ALL level-0 segments with
    CONTIGUOUS segment ranges over the now-known effective-bucket space
    and full tail consolidation, then atomically republish.

    After compaction ≤1 block per (segment, term) is short, so per-term
    fragmentation no longer grows with epoch count. Correctness:
    effective bucket = epoch·n_buckets + bucket, so contiguous
    effective-bucket ranges are epoch-contiguous docid ranges, and the
    batch merge's window proof applies unchanged at prune_shift =
    DOC_BUCKET_SHIFT + seg_shift (a consolidated block never crosses a
    segment boundary). Future epochs append NEW effective buckets;
    finalize/compact re-derive the published layout from level-0, so
    compaction is a pure re-layout — idempotent and repeatable."""
    from ..build import merge_segments

    layout = IndexLayout(index_dir, build_id)
    l0 = spark.read.parquet(layout.postings_l0)
    n_eff = int(l0.agg(F.max("bucket")).first()[0] or 0) + 1
    prune_shift = merge_segments(
        spark, layout, n_buckets=n_eff, max_segments=max_segments,
        merge_parallelism=spark.sparkContext.defaultParallelism,
    )
    return _stats_and_publish(spark, layout, max_segments, prune_shift)
