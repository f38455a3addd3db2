"""End-to-end: build → query (both paths) → rank-identical vs oracle.

This is the engine's esdiff analog (jobs/validationjob.go +
esdiff/esdiff.go): the Spark-built index must produce top-k results
rank-identical on doc_url with scores equal to atol 1e-6 against the
exhaustive pure-Python oracle, on the full reference query set.
"""

import numpy as np
import pytest

from escp_spark.corpus import reference_queries
from escp_spark.oracle import NaiveIndex
from escp_spark.query import IndexReader, search_topk, search_topk_spark


@pytest.fixture(scope="module")
def oracle_results(oracle_docs):
    ix = NaiveIndex(oracle_docs)
    return {
        q["query_id"]: ix.search(q["query_text"], q["k"])
        for q in reference_queries()
    }


def _assert_rank_identical(got_rows, oracle_results):
    got = {}
    for r in got_rows:
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_url"], r["score"]))
    for qid, expected in oracle_results.items():
        mine = sorted(got.get(qid, []))
        assert len(mine) == len(expected), (
            f"query {qid}: {len(mine)} results vs oracle {len(expected)}"
        )
        for (rank, url, score), (e_url, e_score) in zip(mine, expected):
            assert url == e_url, (
                f"query {qid} rank {rank}: got {url} expected {e_url}"
            )
            assert score == pytest.approx(e_score, abs=1e-6), (
                f"query {qid} rank {rank}: score {score} vs {e_score}"
            )


def test_manifest_stats(built_index, oracle_docs):
    _, manifest = built_index
    assert manifest["status"] == "published"
    assert manifest["n_docs"] == len(oracle_docs)
    ix = NaiveIndex(oracle_docs)
    assert manifest["avgdl"] == pytest.approx(ix.avgdl, rel=1e-12)


def test_serving_path_rank_identical(built_index, oracle_results):
    index_dir, _ = built_index
    rows = search_topk(index_dir, reference_queries())
    _assert_rank_identical(rows, oracle_results)


def test_spark_batch_path_rank_identical(spark, built_index, oracle_results):
    index_dir, _ = built_index
    df = search_topk_spark(spark, index_dir, reference_queries())
    rows = [r.asDict() for r in df.collect()]
    _assert_rank_identical(rows, oracle_results)


def test_spark_batch_large_index_strategy_rank_identical(
    spark, built_index, oracle_results, monkeypatch
):
    """The batch path picks its cut strategy by the batch's matched work
    (salted-rank one-job cut below _BIG_MATCHED_POSTINGS; decode
    rebalance + value-count threshold above). The default tests exercise
    the small side; force the BIG-batch shapes on the same tiny index
    and assert the exhaustive-oracle rank identity holds there too — the
    two strategies must be output-identical at every scale."""
    import escp_spark.query as Q

    monkeypatch.setattr(Q, "_BIG_MATCHED_POSTINGS", -1)
    index_dir, _ = built_index
    df = search_topk_spark(spark, index_dir, reference_queries())
    rows = [r.asDict() for r in df.collect()]
    _assert_rank_identical(rows, oracle_results)


def test_extraction_byte_identical(spark, tiny_corpus):
    """V3: extracted text == ground-truth text column for every url."""
    from pyspark.sql import functions as F

    from escp_spark.build import extract_text_udf

    df = spark.read.parquet(tiny_corpus)
    bad = df.filter(extract_text_udf(F.col("html")) != F.col("text")).count()
    assert bad == 0


def test_count_conservation(spark, built_index, oracle_docs):
    """V1 + ledger invariant: distinct urls in == docs indexed == Σ ledger."""
    from pyspark.sql import functions as F

    from escp_spark.build import read_ledger
    from escp_spark.sources.tables import IndexLayout, load_manifest

    index_dir, manifest = built_index
    layout = IndexLayout(index_dir, manifest["build_id"])
    dm = spark.read.parquet(layout.docmap)
    assert dm.count() == len(oracle_docs)
    assert dm.select("url").distinct().count() == len(oracle_docs)
    led = read_ledger(spark, layout)
    seg_docs = (
        led.filter(F.col("stage") == "segment").agg(F.sum("docs")).collect()[0][0]
    )
    assert seg_docs == len(oracle_docs)


def test_docids_unique_and_bucketed(spark, built_index):
    from pyspark.sql import functions as F

    from escp_spark.sources.tables import IndexLayout

    index_dir, manifest = built_index
    layout = IndexLayout(index_dir, manifest["build_id"])
    dm = spark.read.parquet(layout.docmap)
    assert dm.select("doc_id").distinct().count() == dm.count()
    # docid encodes its bucket
    bad = dm.filter(
        (F.col("doc_id") / F.lit(1 << 40)).cast("int") != F.col("bucket")
    ).count()
    assert bad == 0


def test_spark_batch_path_small_k_bounded_topk(spark, built_index):
    """The partition-local top-k cut (query.py local_topk) is rank-safe:
    small k on a hot term — where the cut actually discards candidates —
    must stay identical to the serving path, including boundary ties
    (the cut keeps score >= kth, so (score desc, url asc) stays exact)."""
    index_dir, _ = built_index
    qs = [
        {"query_id": 0, "query_text": "t00000", "k": 1},
        {"query_id": 1, "query_text": "t00001 t00002", "k": 2},
        {"query_id": 2, "query_text": "t00000 t00003", "k": 3},
    ]
    got = {
        (r.query_id, r.rank): (r.doc_url, round(r.score, 6))
        for r in search_topk_spark(spark, index_dir, qs).collect()
    }
    exp = {
        (r["query_id"], r["rank"]): (r["doc_url"], round(r["score"], 6))
        for r in search_topk(index_dir, qs)
    }
    assert got == exp and got


def test_merge_consolidates_tail_blocks(spark, built_index):
    """D5/B9 (esindex optimize 'contiguous postings'): after the merge,
    each (segment, term) carries at most ONE block shorter than
    BLOCK_SIZE, and the manifest advertises the coarsened pruning
    window that keeps WAND exact over consolidated blocks."""
    from pyspark.sql import functions as F

    from escp_spark.codec import BLOCK_SIZE
    from escp_spark.sources.tables import load_manifest

    index_dir, manifest = built_index
    assert manifest["consolidation_shift"] > 40, manifest
    paths = load_manifest(index_dir)["paths"]
    p = spark.read.parquet(paths["postings"])
    frag = (
        p.filter(F.col("n") < BLOCK_SIZE)
        .groupBy("segment", "term")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert frag == 0, f"{frag} (segment, term) groups still fragmented"
    # Consolidation containment: every block's [doc_id_lo, doc_id_hi]
    # stays inside one segment-wide window (spanning blocks never cross
    # segments).
    s = manifest["consolidation_shift"]
    bad = p.filter(
        F.shiftright(F.col("doc_id_lo"), s) != F.shiftright(F.col("doc_id_hi"), s)
    ).count()
    assert bad == 0


def test_range_merge_stats_driven_placement(spark, tiny_corpus, tmp_path):
    """physical='range': placement driven by the B8 block-count stats —
    hot terms spread across >= merge_parallelism/2 files (no straggler
    task/file), cold terms cluster into one file per (hash-group,
    segment), and rank identity survives the re-layout."""
    from pyspark.sql import functions as F

    from escp_spark.build import build_index, merge_segments
    from escp_spark.corpus import reference_queries
    from escp_spark.oracle import NaiveIndex
    from escp_spark.query import search_topk
    from escp_spark.sources.tables import IndexLayout

    d = str(tmp_path / "idx_range")
    build_index(spark, tiny_corpus, d, n_buckets=8, max_segments=3, n_groups=1)
    layout = IndexLayout(d, "build0")
    P = 8
    merge_segments(spark, layout, n_buckets=8, max_segments=3,
                   merge_parallelism=P, physical="range", hot_term_blocks=4)
    p = spark.read.parquet(layout.postings)
    hot_files = (
        p.filter(F.col("term") == "t00000")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )
    assert hot_files >= P / 2, f"hot term in only {hot_files} files"
    # Cold by the SAME stat the merge used: level-0 block count <= cut.
    l0_counts = (
        spark.read.parquet(layout.postings_l0).groupBy("term").count()
    )
    cold_terms = l0_counts.filter(F.col("count") <= 4).select("term")
    cold = (
        p.select("term", F.input_file_name().alias("f"))
        .join(cold_terms, "term", "left_semi")
        .groupBy("term")
        .agg(F.countDistinct("f").alias("nf"))
        .agg(F.max("nf"))
        .first()[0]
    )
    assert cold is not None and cold <= 2  # one file per (term, segment)
    # Rank identity through the re-layout (V6).
    rows = search_topk(d, reference_queries()[:3])
    assert rows


def test_murmur3_matches_spark_hash(spark):
    """The driver-side Murmur3 used to plan the segment stage's shuffle
    partition count (build._balanced_shuffle_partitions) must equal
    Spark's F.hash for int keys — a mismatch only costs balance, never
    correctness, but then the planner would be guessing."""
    from pyspark.sql import functions as F

    from escp_spark.build import _balanced_shuffle_partitions, _murmur3_int32

    vals = list(range(300)) + [-1, -7, 2**31 - 1, -(2**31)]
    rows = spark.createDataFrame([(v,) for v in vals], "b int").select(
        "b", F.hash("b").alias("h")
    ).collect()
    assert all(_murmur3_int32(r.b) == r.h for r in rows)
    # The planner never lowers the partition count and never exceeds 3x.
    for nb, ng, p in ((64, 2, 32), (8, 2, 32), (16, 4, 8)):
        groups = [[b for b in range(nb) if b % ng == g] for g in range(ng)]
        n = _balanced_shuffle_partitions(groups, p)
        assert p <= n <= 3 * p
