"""Streaming ingest: incremental epochs must yield query results
rank-identical to a batch build over the same corpus (urls + scores —
docids legitimately differ because epoch-scoped buckets assign them)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from escp_spark.query import search_topk
from escp_spark.streaming import finalize_streamed_index, stream_ingest_once


# stream_source fixture lives in conftest.py (shared with
# test_deletes.py).


def test_stream_ingest_matches_batch_build(spark, stream_source, tmp_path):
    from pyspark.sql import types as T

    from escp_spark.build import build_index

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    stream_idx = str(tmp_path / "stream_idx")
    n_epochs = stream_ingest_once(spark, stream_source, stream_idx, schema,
                                  n_buckets=4)
    assert n_epochs >= 2, "expected multiple micro-batches"
    manifest = finalize_streamed_index(spark, stream_idx, max_segments=3)

    batch_idx = str(tmp_path / "batch_idx")
    build_index(spark, stream_source, batch_idx, n_buckets=4,
                max_segments=3, n_groups=1)

    # Same doc count (no dup urls across the split) and rank-identical
    # results on a mixed query set.
    from escp_spark.sources.tables import load_manifest

    assert manifest["n_docs"] == load_manifest(batch_idx)["n_docs"]
    queries = [
        {"query_id": 0, "query_text": "t00000", "k": 10},
        {"query_id": 1, "query_text": "t00000 t09500", "k": 10},
        {"query_id": 2, "query_text": "t00001 t00200", "k": 5},
    ]
    got_s = [(r["query_id"], r["rank"], r["doc_url"], round(r["score"], 9))
             for r in search_topk(stream_idx, queries)]
    got_b = [(r["query_id"], r["rank"], r["doc_url"], round(r["score"], 9))
             for r in search_topk(batch_idx, queries)]
    assert got_s == got_b


def test_stream_compaction_consolidates_and_preserves_results(
    spark, stream_source, tmp_path
):
    """Epoch compaction: after many epochs, compact_streamed_index must
    leave ≤1 short block per (segment, term) (the batch-merge D5
    invariant), advertise the coarsened prune window, and leave query
    results bit-identical to the uncompacted index."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from escp_spark.codec import BLOCK_SIZE
    from escp_spark.sources.tables import IndexLayout, load_manifest
    from escp_spark.streaming import compact_streamed_index

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    idx = str(tmp_path / "compact_idx")
    stream_ingest_once(spark, stream_source, idx, schema, n_buckets=4)
    finalize_streamed_index(spark, idx, max_segments=3)
    queries = [
        {"query_id": 0, "query_text": "t00000", "k": 10},
        {"query_id": 1, "query_text": "t00000 t09500", "k": 10},
        {"query_id": 2, "query_text": "t00001 t00200", "k": 5},
    ]
    before = [(r["query_id"], r["rank"], r["doc_url"], round(r["score"], 9))
              for r in search_topk(idx, queries)]
    layout = IndexLayout(idx, "stream0")
    p = spark.read.parquet(layout.postings)
    frag_before = (
        p.filter(F.col("n") < BLOCK_SIZE).groupBy("segment", "term")
        .count().filter(F.col("count") > 1).count()
    )
    assert frag_before > 0, "corpus too small to fragment — weak test"

    manifest = compact_streamed_index(spark, idx, max_segments=3)
    assert manifest["consolidation_shift"] > 40
    p = spark.read.parquet(layout.postings)
    frag = (
        p.filter(F.col("n") < BLOCK_SIZE).groupBy("segment", "term")
        .count().filter(F.col("count") > 1).count()
    )
    assert frag == 0, f"{frag} (segment, term) groups still fragmented"
    s = manifest["consolidation_shift"]
    bad = p.filter(
        F.shiftright(F.col("doc_id_lo"), s) != F.shiftright(F.col("doc_id_hi"), s)
    ).count()
    assert bad == 0
    assert load_manifest(idx)["consolidation_shift"] == s
    after = [(r["query_id"], r["rank"], r["doc_url"], round(r["score"], 9))
             for r in search_topk(idx, queries)]
    assert after == before


def test_cli_compact_surface(spark, stream_source, tmp_path, capsys):
    """`cli compact` republished manifest reaches stdout as JSON and the
    compacted index still serves (the operational lifecycle surface)."""
    import json

    from pyspark.sql import types as T

    from escp_spark.cli import main as cli_main

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    idx = str(tmp_path / "cli_compact_idx")
    stream_ingest_once(spark, stream_source, idx, schema, n_buckets=4)
    finalize_streamed_index(spark, idx, max_segments=3)
    rc = cli_main(["compact", idx, "--maxsegs", "3"])
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    manifest = json.loads(out)
    assert manifest["consolidation_shift"] > 40
    assert search_topk(idx, [{"query_id": 0, "query_text": "t00000", "k": 3}])


def test_stream_epoch_dedup_is_bloom_pruned(spark, stream_source, tmp_path):
    """VERDICT r03 wrong-#2: the per-epoch append-only dedup must NOT
    full-scan the docmap every micro-batch. With disjoint epochs (the
    common case) the bloom classifies every row definitely-new and the
    docmap read is skipped outright."""
    from pyspark.sql import types as T

    import escp_spark.streaming.ingest as ing

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    idx = str(tmp_path / "bloom_idx")
    n = stream_ingest_once(spark, stream_source, idx, schema, n_buckets=4)
    assert n >= 2
    # Last epoch ran with a prior docmap present; its urls are disjoint
    # → bloom says "new" for all (false-positive odds at 16 bits/url
    # over a few hundred urls are ~0) → docmap read skipped.
    assert ing.last_dedup_stats["docmap_verify"] == "skipped"
    assert ing.last_dedup_stats["maybe_hits"] == 0
    assert os.path.exists(os.path.join(idx, "url_bloom.npz"))


def test_stream_overlapping_batch_drops_dups_via_pruned_verify(
    spark, stream_source, tmp_path
):
    """True cross-epoch duplicates: bloom maybe-hits are verified with
    an isin-pruned docmap anti-join; dups are dropped, new urls kept."""
    import pyarrow as pa

    from pyspark.sql import types as T

    import escp_spark.streaming.ingest as ing
    from escp_spark.sources.tables import IndexLayout

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    # Private copy of the source dir (the streaming checkpoint pins the
    # source path, and the shared fixture must not gain files).
    import shutil

    src = tmp_path / "overlap_src"
    src.mkdir()
    for f in glob.glob(os.path.join(stream_source, "*.parquet")):
        shutil.copy(f, str(src))
    idx = str(tmp_path / "overlap_idx")
    stream_ingest_once(spark, str(src), idx, schema, n_buckets=4)
    layout = IndexLayout(idx, "stream0")
    n_before = spark.read.parquet(layout.docmap).count()

    # New arrival: half duplicates of already-ingested urls, half new.
    first = pq.read_table(sorted(glob.glob(str(src / "*.parquet")))[0])
    dup_half = first.slice(0, 50)
    pdf = dup_half.to_pandas()
    new_pdf = pdf.copy()
    new_pdf["url"] = ["https://new.example/%d" % i for i in range(len(new_pdf))]
    both = pa.concat_tables([
        dup_half,
        pa.Table.from_pandas(new_pdf, preserve_index=False).cast(
            dup_half.schema
        ),
    ])
    pq.write_table(both, str(src / "zz_more.parquet"))

    n_epochs = stream_ingest_once(spark, str(src), idx, schema, n_buckets=4)
    assert n_epochs == 1
    assert ing.last_dedup_stats["maybe_hits"] >= 50
    assert ing.last_dedup_stats["docmap_verify"] == "isin_pruned"
    dm = spark.read.parquet(layout.docmap)
    assert dm.count() == n_before + 50, "dups must be dropped, new kept"
    assert dm.select("url").distinct().count() == n_before + 50


def test_stream_huge_overlap_fallback_is_bucket_pruned(
    spark, stream_source, tmp_path, monkeypatch
):
    """VERDICT r04 next-#6: when the bloom maybe-set outgrows the isin
    budget (a re-ingest of a known corpus), the verify anti-join's
    docmap read is pruned to the batch's base buckets × known epochs
    (effective-bucket isin literals → row-group stats pruning), not a
    full docmap scan. Dedup results stay exact."""
    import hashlib
    import shutil

    from pyspark.sql import types as T

    import escp_spark.streaming.ingest as ing
    from escp_spark.sources.tables import IndexLayout

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    src = tmp_path / "bp_src"
    src.mkdir()
    for f in glob.glob(os.path.join(stream_source, "*.parquet")):
        shutil.copy(f, str(src))
    idx = str(tmp_path / "bp_idx")
    stream_ingest_once(spark, str(src), idx, schema, n_buckets=4)
    layout = IndexLayout(idx, "stream0")
    n_before = spark.read.parquet(layout.docmap).count()

    # A batch of ONLY duplicates, all in base bucket 0 — the same md5
    # rule the engine buckets with.
    first = pq.read_table(sorted(glob.glob(str(src / "*.parquet")))[0])
    pdf = first.to_pandas()
    b = pdf["url"].map(
        lambda u: int(hashlib.md5(u.encode()).hexdigest()[:8], 16) % 4
    )
    dup = pdf[b == 0].head(20)
    assert len(dup) >= 8, "fixture hash skew — widen the slice"
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(dup, preserve_index=False).cast(first.schema),
        str(src / "zz_reingest.parquet"),
    )
    # Shrink the isin budget so this overlap takes the fallback branch.
    monkeypatch.setattr(ing, "_MAYBE_ISIN_MAX", 5)
    n_epochs = stream_ingest_once(spark, str(src), idx, schema, n_buckets=4)
    assert n_epochs == 1
    st = ing.last_dedup_stats
    assert st["docmap_verify"] == "bucket_pruned"
    assert 0 < st["docmap_bucket_candidates"] < st["docmap_eff_buckets_total"]
    dm = spark.read.parquet(layout.docmap)
    assert dm.count() == n_before, "pure-duplicate batch must add nothing"
    assert dm.select("url").distinct().count() == n_before


def test_stream_restart_skips_ingested(spark, stream_source, tmp_path):
    """Restart safety: a second drain over the same source must ingest
    nothing new (streaming checkpoint = the scroll-continuation analog,
    esscroll.go:293-294)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    idx = str(tmp_path / "restart_idx")
    first = stream_ingest_once(spark, stream_source, idx, schema, n_buckets=4)
    assert first >= 1
    again = stream_ingest_once(spark, stream_source, idx, schema, n_buckets=4)
    assert again == 0
