"""Streaming ingest: incremental epochs must yield query results
rank-identical to a batch build over the same corpus (urls + scores —
docids legitimately differ because epoch-scoped buckets assign them)."""

import glob
import os

import pyarrow.parquet as pq
import pytest

from escp_spark.corpus import generate_web_pages
from escp_spark.query import search_topk
from escp_spark.streaming import finalize_streamed_index, stream_ingest_once


@pytest.fixture(scope="module")
def stream_source(tmp_path_factory):
    """The corpus split into 3 parquet files (arriving 'over time')."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("stream_src")
    cols = generate_web_pages(600, seed=11)
    table = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
            "html": pa.array(cols["html"], pa.binary()),
            "text": pa.array(cols["text"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
        }
    )
    # Streaming ingest is append-only across epochs (first write wins;
    # see ingest.py docstring) while the batch build is last-write-wins,
    # so for the equivalence check feed a url-deduplicated stream (the
    # documented operating condition for streamed corpora).
    pdf = table.to_pandas().sort_values("warc_ts").drop_duplicates(
        "url", keep="last"
    ).sort_index()
    table = pa.Table.from_pandas(pdf, preserve_index=False).cast(table.schema)
    n = table.num_rows
    for i in range(3):
        pq.write_table(table.slice(i * n // 3, n // 3 + (n % 3 if i == 2 else 0)),
                       str(d / f"part{i}.parquet"))
    return str(d)


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
