"""Persisted serving-metadata sidecar (VERDICT r04 missing #2): the
reader's interval indexes load from one build-time artifact, not a
per-reader walk of every row-group footer."""

import os

import pyarrow.parquet as pq
import pytest


def _queries():
    from escp_spark.corpus import reference_queries

    return reference_queries()


def test_reader_uses_sidecar_and_stays_rank_identical(spark, built_index,
                                                      oracle_docs):
    from escp_spark.oracle import NaiveIndex
    from escp_spark.query import IndexReader, search_topk
    from escp_spark.sidecar import SIDECAR_NAME

    d, _ = built_index
    assert os.path.exists(os.path.join(d, SIDECAR_NAME))
    reader = IndexReader(d)
    rows = search_topk(d, _queries(), reader=reader)
    assert reader.rg_index_source == "sidecar"
    assert reader.dm_index_source == "sidecar"

    ix = NaiveIndex(oracle_docs)
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append((r["doc_url"], r["score"]))
    for q in _queries():
        expect = ix.search(q["query_text"], q["k"])
        mine = got.get(q["query_id"], [])
        assert [u for u, _ in mine] == [u for u, _ in expect], q["query_id"]
        for (_, s), (_, es) in zip(mine, expect):
            assert s == pytest.approx(es, abs=1e-6)


def test_sidecar_reader_opens_no_files_for_metadata(spark, tiny_corpus,
                                                    tmp_path):
    """An index with hundreds of row groups: building both interval
    indexes from the sidecar opens ZERO data files (the old footer walk
    opened every postings + docmap file); the first real query then
    opens only its candidate files."""
    from escp_spark.build import build_index
    from escp_spark.query import IndexReader, search_topk
    from escp_spark.sidecar import SIDECAR_NAME

    d = str(tmp_path / "fine_idx")
    build_index(
        spark, tiny_corpus, d, n_buckets=8, max_segments=3, n_groups=1,
        postings_row_group_bytes=2048,
    )
    n_rg = sum(
        1
        for _ in pq.read_table(os.path.join(d, SIDECAR_NAME))
        .column("rg").to_pylist()
    )
    assert n_rg >= 200, f"fixture too coarse: only {n_rg} row groups"

    reader = IndexReader(d)
    reader._rg_stats()
    reader._dm_rg_index()
    assert reader.rg_index_source == "sidecar"
    assert reader.dm_index_source == "sidecar"
    assert len(reader._pf) == 0, "metadata build opened postings files"
    assert len(reader._dm_pf) == 0, "metadata build opened docmap files"

    n_pfiles = len(reader._pfiles)
    rows = search_topk(d, _queries()[:5], reader=reader)
    assert rows
    assert len(reader._pf) < n_pfiles, (
        "a 5-query batch should not touch every postings file"
    )


def test_stale_or_missing_sidecar_falls_back_to_footers(spark, built_index,
                                                        tmp_path):
    """Missing/stale sidecar (e.g. a reader catching the compaction
    purge window): the footer walk takes over and results are
    byte-identical to the sidecar path."""
    import shutil

    from escp_spark.query import IndexReader, search_topk
    from escp_spark.sidecar import SIDECAR_NAME

    d, _ = built_index
    reader = IndexReader(d)
    want = search_topk(d, _queries(), reader=reader)
    assert reader.rg_index_source == "sidecar"

    d2 = str(tmp_path / "idx_copy")
    shutil.copytree(d, d2)

    # Stale sidecar: drop every row of one postings file → file-set
    # mismatch → fallback.
    p = os.path.join(d2, SIDECAR_NAME)
    t = pq.read_table(p)
    first_path = next(
        v for k, v in zip(t.column("kind").to_pylist(),
                          t.column("path").to_pylist())
        if k == "postings"
    )
    import pyarrow.compute as pc

    pq.write_table(
        t.filter(pc.not_equal(t.column("path"), first_path)), p
    )
    r_stale = IndexReader(d2)
    got_stale = search_topk(d2, _queries(), reader=r_stale)
    assert r_stale.rg_index_source == "footers"
    assert got_stale == want

    # Missing sidecar entirely (pre-sidecar index).
    os.remove(p)
    r_none = IndexReader(d2)
    got_none = search_topk(d2, _queries(), reader=r_none)
    assert r_none.rg_index_source == "footers"
    assert r_none.dm_index_source == "footers"
    assert got_none == want


def test_republish_refreshes_sidecar(spark, stream_source, tmp_path):
    """Streaming finalize + compaction keep the sidecar current: after
    each republish a fresh reader takes the sidecar path."""
    from pyspark.sql import types as T

    from escp_spark.query import IndexReader
    from escp_spark.streaming import (
        compact_streamed_index,
        finalize_streamed_index,
        stream_ingest_once,
    )

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ])
    idx = str(tmp_path / "stream_idx")
    stream_ingest_once(spark, stream_source, idx, schema, n_buckets=4)
    finalize_streamed_index(spark, idx, max_segments=3)
    r1 = IndexReader(idx)
    r1._rg_stats()
    r1._dm_rg_index()
    assert r1.rg_index_source == "sidecar"
    assert r1.dm_index_source == "sidecar"

    compact_streamed_index(spark, idx, max_segments=3)
    r2 = IndexReader(idx)
    r2._rg_stats()
    r2._dm_rg_index()
    assert r2.rg_index_source == "sidecar"
    assert r2.dm_index_source == "sidecar"


def test_batch_post_bytes_falls_back_to_sidecar(spark, built_index,
                                                oracle_docs, monkeypatch):
    """search_topk_spark sizes its postings-scan splits from the
    published-postings byte count. On a remote FS the driver-side walk
    yields nothing; the fallback reads the rg_stats sidecar's
    payload_bytes (persisted at build time for exactly this kind of
    listing-free consumer). Force the walk to return 0 and assert the
    batch path still produces oracle-identical results — and that the
    sidecar actually yields a positive size for the scan heuristic."""
    import escp_spark.build as B
    from escp_spark.oracle import NaiveIndex

    d, _ = built_index
    monkeypatch.setattr(B, "_dir_bytes", lambda path: 0)

    import pandas as pd

    sc = pq.read_table(
        os.path.join(d, "rg_stats.parquet"), columns=["kind", "payload_bytes"]
    ).to_pandas()
    assert int(sc.loc[sc["kind"] == "postings", "payload_bytes"].sum()) > 0

    from escp_spark.query import search_topk_spark

    qs = _queries()[:8]
    got = {}
    for r in search_topk_spark(spark, d, qs).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_url, r.score))
    ix = NaiveIndex(oracle_docs)
    for q in qs:
        exp = ix.search(q["query_text"], q["k"])
        mine = sorted(got.get(q["query_id"], []))
        assert len(mine) == len(exp)
        for (rank, url, score), (e_url, e_score) in zip(mine, exp):
            assert url == e_url
            assert score == pytest.approx(e_score, abs=1e-6)
