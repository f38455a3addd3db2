"""Index build pipeline — the escp copy-job analog (jobs/escopyjob.go:83-216).

Where escp scans an ES index and bulk-writes documents into another ES index
(letting Lucene build the inverted index), this pipeline scans the
``web_pages`` corpus and builds the inverted index itself, Spark-first:

  scan → last-write-wins dedup → html→text extraction (Arrow UDF) →
  deterministic md5 bucketing → per-bucket segment build (applyInPandas,
  numpy codec) → dictionary/stats aggregation → merge → atomic publish

escp behaviors carried over:
- **Resumable units of work** (esscroll.go:129 + 293-294 "Continue" stub →
  realized): work is split into ``n_groups`` bucket groups; each group's
  artifacts are written idempotently (overwrite of a group-scoped dir) and
  recorded in an append-only checkpoint **ledger** with doc/byte counters
  and input-snapshot lineage. A restarted build anti-joins the ledger and
  skips committed groups.
- **Doc/byte counters + progress** (esscroll.go:197-275): per-group log
  lines and ledger columns ``docs``/``bytes``.
- **Explicit parallelism/skew control** (cmd/escp/main.go:103-105,
  estypes.go:104-116): ``n_buckets`` is the shard-count analog; buckets are
  md5-uniform over urls so segment build has no key skew by construction;
  per-term skew inside a bucket is bounded by the bucket's doc count.
- **Build-then-optimize lifecycle** (escopyjob.go:139-141/183-195 +
  esindex/optimize.go:13-28): level-0 segments are merged down to
  ``max_segments`` (the ``-maxsegs`` analog, default 5) and the index only
  becomes visible via the final atomic manifest publish.
- **Last-write-wins on duplicate ids** (esbulk/bulktypes.go:28-30), made
  deterministic: latest ``warc_ts`` wins, ties broken by md5(html).

Scale notes (the 10^12-doc design point):
- One wide shuffle total: the url-hash repartition that co-locates each
  bucket. Dedup reuses the same hash partitioning (window over url), and
  docid assignment is a window over the already-clustered data.
- The dedup shuffle is materialized once to staging (stage ``shuffle``,
  partitioned by checkpoint group). The CPU-heavy html→text extraction
  runs inside that wide pass by default (``extract_mode="wide"`` —
  staging stores text, the corpus is read+written exactly once); see
  build_index's docstring for the "fused"/"staged" placements that
  trade bytes for finer extraction-resume granularity. A mid-segment
  failure never recomputes the corpus-wide shuffle, and per-group
  builds re-read a pruned scan.
- Segment build is ``applyInPandas`` per bucket: memory per task is one
  bucket's text + postings; choose ``n_buckets`` ≈ corpus_bytes /
  (executor_mem / tasks_per_executor). Buckets are hash-uniform, so no
  straggler buckets (cf. estypes.go:104-116 skew heuristic).
- The merge is *metadata-level*: per-bucket docid ranges are disjoint and
  ordered (docid = bucket<<40 | rank), so concatenating per-bucket posting
  blocks in bucket order yields a globally sorted posting list with no
  decode/re-encode. The physical merge is a repartitionByRange +
  sortWithinPartitions + partitioned write — embarrassingly parallel,
  no single-task whole-term materialization even for the hottest term.
"""

from __future__ import annotations

import logging
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analyzer import ANALYZER_VERSION, extract_text, tokenize
from .functions.fmt import iec_format
from .codec import (
    BLOCK_SIZE,
    CODEC_VERSION,
    decode_blocks_bulk,
    encode_posting_frame,
)
from .sources.tables import (
    IndexLayout,
    input_snapshot_fingerprint,
    publish_manifest,
    read_web_pages,
)

log = logging.getLogger("escp_spark.build")

DOC_BUCKET_SHIFT = 40  # docid = bucket << 40 | rank-within-bucket
MERGE_BLOCK_SHIFT = 20  # merged block_id = bucket << 20 | level0 block_id

# Parquet row-group size of the PUBLISHED postings: the row group is the
# serving path's physical I/O skip unit (a column chunk is read whole), so
# small row groups = fine-grained payload skipping for pruned docid
# windows — the Lucene skip-block analog. 8 MB keeps footer overhead
# negligible while a hot term's posting list spans many row groups in
# docid order at scale.
POSTINGS_ROW_GROUP_BYTES = 8 << 20

# Docmap is a point-lookup table at serve time (doc_id → url): small row
# groups keep the read amplification of a ≤k-id lookup bounded.
DOCMAP_ROW_GROUP_BYTES = 2 << 20

# Bump when the PHYSICAL index layout changes (row-group sizing, term
# placement) — distinct from codec_version (block byte format). Cached
# indexes with an older layout are rebuilt, not silently served.
INDEX_LAYOUT_VERSION = 2

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("doc_id_lo", T.LongType(), False),
        T.StructField("doc_id_hi", T.LongType(), False),
        T.StructField("max_tf", T.IntegerType(), False),
        T.StructField("min_dl", T.IntegerType(), False),
        T.StructField("sum_tf", T.LongType(), False),
        T.StructField("doc_ids", T.BinaryType(), False),
        T.StructField("tfs", T.BinaryType(), False),
        T.StructField("dls", T.BinaryType(), False),
    ]
)

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("build_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),  # bucket group
        T.StructField("stage", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("segment_path", T.StringType(), False),
        T.StructField("docs", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("input_snapshot", T.StringType(), False),
    ]
)


# --------------------------------------------------------------------------
# Relational stages (pure Catalyst — no Python)
# --------------------------------------------------------------------------

def bucket_expr(col, n_buckets: int):
    """Deterministic bucket = int(md5(url)[:8], 16) % n_buckets.

    md5 (not xxhash64/crc32) because the same rule must be reproducible in
    the pure-Python oracle and in DuckDB oracle SQL
    (``conv(substring(md5(url),1,8),16,10) % n``)."""
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long") % n_buckets).cast("int")


def dedup_last_write_wins(df: DataFrame) -> DataFrame:
    """Keep the newest version of each url (bulktypes.go:28-30 analog,
    deterministic: warc_ts desc, then md5(html) desc).

    Implemented as max_by over a struct ordering key, NOT a row_number
    window: the aggregate gets map-side partial aggregation (duplicates
    collapse before the shuffle) and needs no full sort of the payload —
    the window variant cost ~600 core-s + heavy GC on a 2M-doc corpus.
    """
    cols = df.columns
    key = F.struct(F.col("warc_ts"), F.md5(F.col("html")).alias("__tie"))
    picked = df.groupBy("url").agg(
        F.max_by(F.struct(*[F.col(c) for c in cols if c != "url"]), key).alias("__row")
    )
    return picked.select("url", *[F.col(f"__row.{c}") for c in cols if c != "url"])


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-vectorized html→text (B2); byte-identical per url by the
    analyzer's invertible-wrapper contract (esdiff.go:80-82 analog)."""
    return html.map(extract_text)


@F.pandas_udf(T.IntegerType())
def token_count_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda t: len(tokenize(t or "")))


def prepared_corpus(df: DataFrame, n_buckets: int) -> DataFrame:
    """dedup → extract → bucket; the input to all build stages."""
    return (
        dedup_last_write_wins(df)
        .withColumn("text", extract_text_udf(F.col("html")))
        .withColumn("bucket", bucket_expr(F.col("url"), n_buckets))
        .select("url", "bucket", "text", "lang")
    )


DOCMAP_SCHEMA = "bucket int, url string, doc_id long"


def _rank_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
    base = int(pdf["bucket"].iloc[0]) << DOC_BUCKET_SHIFT
    return pd.DataFrame(
        {
            "bucket": pdf["bucket"],
            "url": pdf["url"],
            "doc_id": base + np.arange(len(pdf), dtype=np.int64),
        }
    )


def docmap_for(df: DataFrame) -> DataFrame:
    """docid = bucket<<40 | rank(url within bucket) — deterministic and
    independent of parallelism; the url↔docid table (B4).

    Per-bucket Arrow UDF rank, not a row_number window: the window's
    whole-corpus JVM sort cost ~600 core-s at 2M docs, while sorting each
    bucket's urls in pandas is milliseconds. No tokenization here — doc
    lengths live inline in posting blocks and avgdl derives from the
    dictionary's Σcf, so nothing tokenizes twice."""
    return df.select("bucket", "url").groupBy("bucket").applyInPandas(
        _rank_bucket, DOCMAP_SCHEMA
    )


# --------------------------------------------------------------------------
# Segment build (applyInPandas per bucket; numpy inside — B5/B6/B7)
# --------------------------------------------------------------------------

def _build_bucket_segment(pdf: pd.DataFrame) -> pd.DataFrame:
    """One bucket → encoded posting blocks. Vectorized: one lexsort over
    all (term, docid) token pairs of the bucket, run-length tf counting,
    per-term block encoding with the numpy codec."""
    bucket = int(pdf["bucket"].iloc[0])
    pdf = pdf.sort_values("url", kind="mergesort").reset_index(drop=True)
    base = np.uint64(bucket) << np.uint64(DOC_BUCKET_SHIFT)
    doc_ids = base + np.arange(len(pdf), dtype=np.uint64)

    tok_lists = [tokenize(t or "") for t in pdf["text"]]
    dls = np.array([len(t) for t in tok_lists], dtype=np.uint64)
    total = int(dls.sum())
    if total == 0:
        return pd.DataFrame({f.name: pd.Series(dtype="object") for f in POSTINGS_SCHEMA})

    all_terms = np.empty(total, dtype=object)
    pos = 0
    for toks in tok_lists:
        all_terms[pos : pos + len(toks)] = toks
        pos += len(toks)

    # Factorize terms to int codes (C-speed), sorted so segment output is
    # term-ordered. Sort ONE composite int64 key (term_code * n_docs +
    # doc_index) instead of a lexsort over two arrays — fewer temporaries
    # and a single radix-friendly pass (allocation pressure inside workers
    # is the measured bottleneck on this class of VM, not arithmetic).
    # (An Arrow-compute alternative — utf8_lower → split_pattern_regex →
    # dictionary_encode — was A/B'd round 4: identical output, ~15%
    # SLOWER than findall+factorize on this corpus; per-doc regex is not
    # the bottleneck of this kernel.)
    term_codes, term_uniques = pd.factorize(all_terms, sort=True)
    del all_terms
    n_docs_b = len(pdf)
    doc_idx = np.repeat(np.arange(n_docs_b, dtype=np.int64), dls.astype(np.int64))
    key = term_codes.astype(np.int64) * n_docs_b + doc_idx
    key.sort()
    # Run boundaries of (term, doc) keys → tf per pair.
    new_pair = np.empty(total, dtype=bool)
    new_pair[0] = True
    new_pair[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new_pair)
    tf = np.diff(np.append(starts, total)).astype(np.uint64)
    u_key = key[starts]
    u_term = (u_key // n_docs_b).astype(np.int64)
    u_doc_idx = (u_key % n_docs_b).astype(np.int64)
    u_doc = doc_ids[u_doc_idx]
    u_dl = dls[u_doc_idx]

    # One vectorized pass encodes every term's blocks (no per-term loop).
    enc = encode_posting_frame(u_term, u_doc, tf, u_dl)
    out = pd.DataFrame(
        {
            "bucket": np.full(enc["n"].size, bucket, dtype=np.int64),
            "term": np.asarray(term_uniques)[enc["term_code"]],
            "block_id": enc["block_id"],
            "n": enc["n"],
            "doc_id_lo": enc["doc_id_lo"],
            "doc_id_hi": enc["doc_id_hi"],
            "max_tf": enc["max_tf"],
            "min_dl": enc["min_dl"],
            "sum_tf": enc["sum_tf"],
            "doc_ids": enc["doc_ids"],
            "tfs": enc["tfs"],
            "dls": enc["dls"],
        }
    )
    return out[[f.name for f in POSTINGS_SCHEMA]]


def build_segments(df: DataFrame) -> DataFrame:
    """Per-bucket level-0 segment build. Input: url, bucket, text."""
    return df.groupBy("bucket").applyInPandas(_build_bucket_segment, POSTINGS_SCHEMA)


# --------------------------------------------------------------------------
# Ledger (checkpoint/resume — B10)
# --------------------------------------------------------------------------

_LEDGER_ARROW = None


def _ledger_arrow_schema():
    global _LEDGER_ARROW
    if _LEDGER_ARROW is None:
        import pyarrow as pa

        _LEDGER_ARROW = pa.schema(
            [
                ("build_id", pa.string()),
                ("partition_id", pa.int32()),
                ("stage", pa.string()),
                ("status", pa.string()),
                ("segment_path", pa.string()),
                ("docs", pa.int64()),
                ("bytes", pa.int64()),
                ("input_snapshot", pa.string()),
            ]
        )
    return _LEDGER_ARROW


def _ledger_append(spark: SparkSession, layout: IndexLayout, rows: list[dict]):
    """Append-only checkpoint commit. The ledger is tiny driver-side
    metadata (one row per unit of work — escp's scroll-progress analog),
    so it's written directly with pyarrow: no Spark job, and the
    write+rename is atomic per commit."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _ledger_arrow_schema()
    table = pa.Table.from_pylist(rows, schema=schema)
    tmp = os.path.join(layout.ledger, f".tmp-{uuid.uuid4().hex}")
    dst = os.path.join(layout.ledger, f"commit-{uuid.uuid4().hex}.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, dst)


def _ledger_pandas(layout: IndexLayout):
    import pyarrow.dataset as pads

    if not os.path.isdir(layout.ledger):
        return None
    files = [
        os.path.join(layout.ledger, f)
        for f in os.listdir(layout.ledger)
        if f.endswith(".parquet")
    ]
    if not files:
        return None
    return pads.dataset(files, format="parquet").to_table().to_pandas()


def read_ledger(spark: SparkSession, layout: IndexLayout) -> DataFrame:
    pdf = _ledger_pandas(layout)
    if pdf is None:
        return spark.createDataFrame([], LEDGER_SCHEMA)
    pdf = pdf.drop_duplicates(["build_id", "partition_id", "stage"])
    return spark.createDataFrame(pdf, LEDGER_SCHEMA)


def committed_groups(
    spark: SparkSession, layout: IndexLayout, stage: str, snapshot: str
) -> set[int]:
    pdf = _ledger_pandas(layout)
    if pdf is None:
        return set()
    m = (
        (pdf["build_id"] == layout.build_id)
        & (pdf["stage"] == stage)
        & (pdf["status"] == "committed")
        & (pdf["input_snapshot"] == snapshot)
    )
    return set(pdf.loc[m, "partition_id"].astype(int).tolist())


class SimulatedFailure(RuntimeError):
    """Raised by build_index(fail_after_groups=k) — the resume-test kill
    switch (SURVEY.md §5.4)."""


from contextlib import contextmanager


@contextmanager
def _scoped_conf(spark: SparkSession, settings: dict):
    """Set runtime SQL confs for one job scope and restore afterwards —
    scan-split sizing is a per-workload decision (VERDICT r03 #1: a
    session-global 32 MB maxPartitionBytes multiplied task count on
    every small relational query in the bench), so the build sets it
    only around its own scans."""
    saved = {}
    for k, v in settings.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, str(v))
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# Corpus-scan split ceiling for the build's wide pass: with the 128 MB
# default a 350 MB corpus file yields THREE map tasks — the whole
# scan+dedup stage then tops out at 3-way parallelism regardless of
# cores (measured: the shuffle stage scaled 2.1× from 2→8 cores).
# 32 MB splits let split count track row groups (corpus files use
# 64k-row ≈ 43 MB row groups). Scoped to the build scan — NOT session
# config (VERDICT r03 #1).
_CORPUS_SCAN_CONF = {
    "spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024),
}

# Group-scoped staging reads (fused extract path): staging group dirs
# hold up to shuffle-partitions smallish files; small splits + low open
# cost keep the Arrow-UDF extraction at full core parallelism instead
# of bin-packing the whole group into a couple of tasks.
_GROUP_SCAN_CONF = {
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(1 * 1024 * 1024),
}


def _murmur3_int32(x: int, seed: int = 42) -> int:
    """Spark's Murmur3Hash of an INT column value (the hash behind
    ``repartition``/``groupBy`` hash partitioning — Murmur3_x86_32
    hashInt with Spark's seed 42), reimplemented for DRIVER-SIDE
    partition-count planning. Asserted equal to ``F.hash`` in
    tests/test_e2e_index.py. Correctness never depends on it — a
    mismatch only costs balance."""
    mask = 0xFFFFFFFF
    k1 = (x & mask) * 0xCC9E2D51 & mask
    k1 = ((k1 << 15) | (k1 >> 17)) & mask
    k1 = k1 * 0x1B873593 & mask
    h1 = (seed ^ k1) & mask
    h1 = ((h1 << 13) | (h1 >> 19)) & mask
    h1 = (h1 * 5 + 0xE6546B64) & mask
    h1 ^= 4  # total bytes hashed
    h1 ^= h1 >> 16
    h1 = h1 * 0x85EBCA6B & mask
    h1 ^= h1 >> 13
    h1 = h1 * 0xC2B2AE35 & mask
    h1 ^= h1 >> 16
    return h1 - 0x100000000 if h1 >= 0x80000000 else h1


def _balanced_shuffle_partitions(key_groups: list[list[int]],
                                 default_n: int) -> int:
    """Pick the shuffle-partition count for the per-bucket kernel stages.

    ``groupBy("bucket").applyInPandas`` hash-partitions ~P atomic bucket
    kernels into spark.sql.shuffle.partitions bins; with P keys in P
    bins, balls-into-bins puts 3-4 buckets on one task — a 3-4×
    straggler on an otherwise perfectly uniform stage (guide §2.5,
    "synthetic partitioning keys with too few distinct values": use more
    bins than keys). Spark's key→partition map is pmod(Murmur3(key), n),
    known driver-side, so scan n ∈ [default_n, 3·default_n] and take the
    smallest n minimizing the worst per-group max-load (each group's
    segment/docmap jobs see only that group's buckets). Beyond 3× the
    empty-task scheduling overhead outweighs the remaining load-2 tail.
    """
    # With keys ≫ bins the hash balance is already smooth (relative load
    # variance ~ 1/sqrt(keys/bins)) and the scan would cost O(n·keys)
    # driver time for nothing — the straggler this fixes only exists
    # when #keys per group is O(bins).
    if min((len(ks) for ks in key_groups if ks), default=0) >= 8 * default_n:
        return default_n
    hashed = [[_murmur3_int32(k) for k in ks] for ks in key_groups if ks]
    if not hashed:
        return default_n
    best_n, best_load = default_n, max(len(ks) for ks in hashed)
    for n in range(default_n, default_n * 3 + 1):
        load = 0
        for hs in hashed:
            counts: dict[int, int] = {}
            for h in hs:
                p = h % n  # python floor-mod == Spark pmod for n > 0
                counts[p] = counts.get(p, 0) + 1
            load = max(load, max(counts.values()))
        if load < best_load:
            best_n, best_load = n, load
            if load == 1:
                break
    return best_n


# Wall-clock per stage of the most recent build_index call (M1/M2-style
# telemetry; bench_scaling uses it to attribute scaling loss to a stage).
last_build_timings: dict = {}

# Finer-grained driver-wall attribution of the most recent build — one
# entry per Spark action / driver-side step inside each stage. The
# scaling harness records this at BOTH parallelism levels; diffing the
# two decomposes the parallelism-independent fixed cost f that sets the
# small-corpus efficiency ceiling (VERDICT r05 next-#2: f ≈ 27 s at 2M
# docs — "instrument once, then cut the top item").
last_build_detail: dict = {}

import contextlib as _contextlib
import time as _time_mod


@_contextlib.contextmanager
def _detail(key: str):
    t0 = _time_mod.perf_counter()
    try:
        yield
    finally:
        last_build_detail[key] = round(
            last_build_detail.get(key, 0.0)
            + (_time_mod.perf_counter() - t0), 3,
        )


# --------------------------------------------------------------------------
# Merge (D5 force-merge analog — esindex/optimize.go:13-28: postings get
# CONTIGUOUS, not just concatenated)
# --------------------------------------------------------------------------

MERGED_SCHEMA = T.StructType(
    [T.StructField("segment", T.IntegerType(), False)]
    + [f for f in POSTINGS_SCHEMA if f.name != "bucket"]
)
_MERGED_COLS = [f.name for f in MERGED_SCHEMA]

# Consolidated blocks get ids above every bucket<<20|id label (bucket is
# int32): block_id is a unique label only — no reader orders by it.
CONSOLIDATED_BLOCK_BASE = 1 << 60


def _seg_shift(n_buckets: int, max_segments: int) -> int:
    """Power-of-two bucket-group width giving ≤ max_segments segments.
    Segments are then CONTIGUOUS bucket (hence docid) ranges, so
    segment id == doc_id >> (DOC_BUCKET_SHIFT + shift) — the property
    that lets consolidated blocks keep a valid pruning window."""
    shift = 0
    while ((n_buckets - 1) >> shift) + 1 > max_segments:
        shift += 1
    return shift


def _consolidate_tails_arrow(batches):
    """Re-block one partition's tail fragments — Arrow-native mapInArrow
    kernel (zero per-row Python objects; the earlier applyInPandas
    version materialized ~5M python str/bytes objects per 500k-doc merge
    and spent ~50 s in object churn — measured 48 s → ~3 s).

    Input: every tail block (n < BLOCK_SIZE) of the terms hash-routed to
    this partition, across all (segment, term). For each (segment, term)
    with ≥2 tails: bulk-decode straight from the Arrow binary buffers
    (the values of a combined BinaryArray are already back-to-back, so
    the codec's concatenated-stream decode needs no per-block bytes),
    concatenate (already docid-sorted — tails are ≤1 per source bucket
    and bucket docid ranges are disjoint and ordered), re-encode into
    ⌈total/BLOCK_SIZE⌉ contiguous blocks — afterwards ≤1 block per
    (segment, term) has n < BLOCK_SIZE. Single-tail groups pass through
    as an Arrow take, untouched.

    Bounded regardless of corpus size: a term has ≤1 tail per bucket, so
    a term contributes ≤ n_buckets × (BLOCK_SIZE−1) postings; size
    n_tgrp so a partition's tails fit executor memory."""
    import pyarrow as pa
    import pyarrow.compute as pc

    batch_list = list(batches)
    if not batch_list:
        return
    tbl = pa.Table.from_batches(batch_list).select(_MERGED_COLS)
    n_rows = tbl.num_rows
    if n_rows == 0:
        return
    tbl = tbl.sort_by(
        [("segment", "ascending"), ("term", "ascending"),
         ("doc_id_lo", "ascending")]
    ).combine_chunks()
    seg = tbl.column("segment").to_numpy()
    term = tbl.column("term").chunk(0)
    if n_rows == 1:
        new_grp = np.array([True])
    else:
        tneq = pc.not_equal(
            term.slice(1), term.slice(0, n_rows - 1)
        ).to_numpy(zero_copy_only=False)
        new_grp = np.concatenate(([True], (seg[1:] != seg[:-1]) | tneq))
    grp_id = np.cumsum(new_grp) - 1
    multi = np.bincount(grp_id)[grp_id] > 1
    singles = np.flatnonzero(~multi)
    if singles.size:
        yield from tbl.take(pa.array(singles)).to_batches()
    midx = np.flatnonzero(multi)
    if midx.size == 0:
        return
    sub = tbl.take(pa.array(midx)).combine_chunks()
    ns = sub.column("n").to_numpy()

    def offsets_and_data(name: str):
        arr = sub.column(name).chunk(0)
        bufs = arr.buffers()
        wide = pa.types.is_large_binary(arr.type)
        offs = np.frombuffer(
            bufs[1], dtype=np.int64 if wide else np.int32,
            count=len(arr) + 1, offset=arr.offset * (8 if wide else 4),
        )
        return offs, memoryview(bufs[2])

    payloads = [offsets_and_data(c) for c in ("doc_ids", "tfs", "dls")]
    sub_grp = grp_id[midx]  # nondecreasing
    bump = sub_grp[1:] != sub_grp[:-1]
    codes = np.cumsum(np.concatenate(([0], bump.astype(np.int64))))
    starts = np.flatnonzero(np.concatenate(([True], bump)))

    # Chunk decode+re-encode at GROUP boundaries, ~64k postings per
    # chunk: keeps every temporary a couple of MB and arena-reusable —
    # the one-shot whole-partition variant allocated ~100 MB of fresh
    # pages per task and this host's first-touch fault storm made the
    # arithmetic irrelevant (27.9 s cold vs 0.96 s warm, measured; same
    # pathology and fix as the minhash kernel — see CLAUDE.md).
    row_off = np.concatenate(([0], np.cumsum(ns)))
    g_bounds = np.append(starts, len(midx))
    g_pair_start = row_off[g_bounds[:-1]]
    chunk_of_group = g_pair_start // (1 << 16)
    seg_sub = seg[midx]
    term_sub = sub.column("term").chunk(0)
    out_meta: dict[str, list] = {k: [] for k in (
        "segment_src", "block_id", "n", "doc_id_lo", "doc_id_hi",
        "max_tf", "min_dl", "sum_tf",
    )}
    out_bufs: dict[str, list] = {"doc_ids": [], "tfs": [], "dls": []}
    for c in np.unique(chunk_of_group):
        gsel = np.flatnonzero(chunk_of_group == c)
        r0, r1 = g_bounds[gsel[0]], g_bounds[gsel[-1] + 1]
        ids, tfs, dls, blk = decode_blocks_bulk(
            *(data[offs[r0]:offs[r1]] for offs, data in payloads),
            ns[r0:r1],
        )
        enc = encode_posting_frame(
            (codes[r0:r1] - codes[r0])[blk], ids, tfs, dls
        )
        out_meta["segment_src"].append(starts[enc["term_code"] + codes[r0]])
        for k in ("block_id", "n", "doc_id_lo", "doc_id_hi",
                  "max_tf", "min_dl", "sum_tf"):
            out_meta[k].append(enc[k])
        for k in out_bufs:
            out_bufs[k].extend(enc[k])
    src = np.concatenate(out_meta["segment_src"])

    def cat(k):
        return np.concatenate(out_meta[k])

    yield pa.RecordBatch.from_arrays(
        [
            pa.array(seg_sub[src].astype(np.int32), pa.int32()),
            term_sub.take(pa.array(src)),
            pa.array(CONSOLIDATED_BLOCK_BASE + cat("block_id"), pa.int64()),
            pa.array(cat("n").astype(np.int32), pa.int32()),
            pa.array(cat("doc_id_lo"), pa.int64()),
            pa.array(cat("doc_id_hi"), pa.int64()),
            pa.array(cat("max_tf").astype(np.int32), pa.int32()),
            pa.array(cat("min_dl").astype(np.int32), pa.int32()),
            pa.array(cat("sum_tf"), pa.int64()),
            pa.array(out_bufs["doc_ids"], sub.column("doc_ids").chunk(0).type),
            pa.array(out_bufs["tfs"], sub.column("tfs").chunk(0).type),
            pa.array(out_bufs["dls"], sub.column("dls").chunk(0).type),
        ],
        names=_MERGED_COLS,
    )


# Vocabulary size up to which the merge-placement stats are computed on
# the driver in pandas (one Spark job — the limit-collect — instead of
# the persist + three jobs of the distributed path). 1M terms ≈ 30 MB:
# trivially driver-sized, and most corpora below Common-Crawl scale fit.
_PLACEMENT_DRIVER_MAX_TERMS = 1_000_000


def _write_dictionary(spark, layout: IndexLayout, stats: DataFrame | None,
                      driver_pdf: pd.DataFrame | None = None) -> int:
    """Write the term dictionary (term, df, cf) from the LEVEL-0 block
    stats and return Σcf (the corpus token count, for avgdl).

    df = Σn and cf = Σsum_tf per term are invariant under the merge's
    tail consolidation (re-encoding preserves every posting), so the
    dictionary derives from the same single aggregation pass that drives
    merge placement — the old finalize re-scanned the PUBLISHED postings
    for it, a second full metadata pass per build (VERDICT r04 #4).

    ``driver_pdf`` (term/df/cf, ≤ _PLACEMENT_DRIVER_MAX_TERMS rows) is
    the already-collected fast path: one globally term-sorted file
    written with pyarrow, zero extra Spark jobs. Otherwise ``stats``
    (ideally persisted by the caller) is written distributed, term-sorted
    within partitions so dictionary row-group footer stats stay
    seek-friendly for the serving path's filtered scans."""
    if driver_pdf is not None:
        import shutil
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        pdf = driver_pdf.sort_values("term").reset_index(drop=True)
        tbl = pa.table({
            "term": pa.array(pdf["term"], pa.string()),
            "df": pa.array(pdf["df"].astype("int64"), pa.int64()),
            "cf": pa.array(pdf["cf"].astype("int64"), pa.int64()),
        })
        tmp = os.path.join(layout.root, f".tmp-dict-{uuid.uuid4().hex}")
        pq.write_table(tbl, tmp, row_group_size=1 << 20)
        if os.path.isdir(layout.dictionary):
            shutil.rmtree(layout.dictionary)
        os.makedirs(layout.dictionary)
        os.replace(tmp, os.path.join(layout.dictionary, "part-0.parquet"))
        return int(pdf["cf"].sum()) if len(pdf) else 0
    (
        stats.select(
            "term", F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
        )
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(layout.dictionary)
    )
    return int(stats.agg(F.sum("cf")).collect()[0][0] or 0)


def _bounds_pandas(cold: pd.DataFrame, merge_parallelism: int) -> list[str]:
    """Driver-side reference of the cold-term bounds (identical formula
    to _cold_term_bounds — the distributed test asserts equality)."""
    if not len(cold):
        return []
    ref = cold.sort_values("term").reset_index(drop=True)
    cum = ref["nblocks"].cumsum()
    per_part = max(
        float(ref["nblocks"].sum()) / float(max(merge_parallelism, 1)), 1.0
    )
    p = np.floor((cum - ref["nblocks"]) / per_part)
    return sorted(ref.groupby(p)["term"].min().tolist())


def _cold_term_bounds(cold: DataFrame, merge_parallelism: int) -> list[str]:
    """Block-balanced contiguous term-range boundaries for cold-term
    placement: partition p starts at the first term whose cumulative
    block count (in term order) crosses p × (total/P).

    The cumulative sum is a DISTRIBUTED two-pass prefix sum (VERDICT r03
    wrong-#1: the old global ``Window.orderBy("term")`` moved the whole
    vocabulary — 10^9+ terms at Common-Crawl scale — through ONE task;
    Spark itself warned "No Partition Defined"). Pass 1 range-partitions
    the stats by term and aggregates one block total per partition; the
    ≤P totals come to the driver and become broadcast offsets. Pass 2
    computes each partition's LOCAL cumsum with a window partitioned by
    the range-partition id (parallel — every window partition is one
    range partition) and adds the offset. The persist pins the sampled
    range boundaries so both passes see the identical partitioning.
    Output is byte-identical to a single global window (asserted against
    a pandas reference in tests/test_e2e_index.py)."""
    n_ps = max(merge_parallelism, 1)
    cold_sorted = (
        cold.repartitionByRange(n_ps, "term")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    try:
        part_tot = {
            int(r.pid): int(r.tot)
            for r in cold_sorted.groupBy("pid")
            .agg(F.sum("nblocks").alias("tot"))
            .collect()
        }
        if not part_tot:
            return []
        per_part = max(float(sum(part_tot.values())) / float(n_ps), 1.0)
        offs, acc = [], 0
        for pid in range(max(part_tot) + 1):
            offs.append(acc)
            acc += part_tot.get(pid, 0)
        off_arr = F.array(*[F.lit(o) for o in offs])
        wv = Window.partitionBy("pid").orderBy("term").rowsBetween(
            Window.unboundedPreceding, 0
        )
        return sorted(
            r.t0
            for r in cold_sorted.withColumn(
                "cum",
                F.sum("nblocks").over(wv)
                + F.element_at(off_arr, F.col("pid") + 1),
            )
            .withColumn(
                "p",
                F.floor((F.col("cum") - F.col("nblocks")) / F.lit(per_part)),
            )
            .groupBy("p")
            .agg(F.min("term").alias("t0"))
            .collect()
        )
    finally:
        cold_sorted.unpersist()


def merge_segments(
    spark: SparkSession,
    layout: IndexLayout,
    n_buckets: int,
    max_segments: int,
    merge_parallelism: int,
    physical: str = "range",
    consolidate: bool = True,
    hot_term_blocks: int | None = None,
    row_group_bytes: int = POSTINGS_ROW_GROUP_BYTES,
) -> dict:
    """Merge level-0 (per-bucket) segments down to ≤ max_segments.
    Returns ``{"prune_shift", "total_tokens"}``: the docid window
    granularity the serving path must use (recorded in the manifest) and
    Σcf for avgdl. The term dictionary is written HERE, fused into the
    same level-0 stats aggregation that drives placement — finalize no
    longer re-scans the published postings for it (VERDICT r04 #4).

    Two phases, mirroring Lucene's merge-then-compact:

    1. **Concatenation (narrow)**: per-bucket docid ranges are disjoint
       and ordered, so a term's global posting list is its per-bucket
       blocks in bucket order — full blocks (n == BLOCK_SIZE) move
       without decode/re-encode and the hottest term's blocks stay
       distributed across merge tasks. Segment = bucket >> seg_shift
       (contiguous power-of-two bucket ranges, ≤ max_segments of them).
    2. **Tail consolidation** (the esindex/optimize.go:13-28 semantic,
       SURVEY.md §7 "hard part #1"): every (bucket × term) level-0 list
       ends in a tail block < BLOCK_SIZE — up to n_buckets fragments per
       term: read amplification and loose block-max bounds at serve
       time. Tails shuffle by hash(term) (bounded: ≤ n_buckets×127
       postings per term) and are re-encoded per (segment, term) into
       contiguous blocks, leaving ≤1 short block per (segment, term).

    Window correctness: a consolidated block spans buckets, so the WAND
    pruning window coarsens from bucket to segment — a segment is a
    complete, contiguous docid range (window id = doc_id >> prune_shift),
    so the serving path's exact-θ invariant is preserved at prune_shift =
    DOC_BUCKET_SHIFT + seg_shift. With consolidate=False (streaming
    finalize, where modulo segment placement breaks contiguity) every
    block stays inside one bucket and prune_shift stays DOC_BUCKET_SHIFT.

    physical="range" (default): clusters whole terms per output file so a
    query touches ONE file per (cold term, segment), and — decisive for
    the metadata-first serving path — each row group's [term-min,
    term-max] footer range is NARROW, so per-query metadata reads touch
    only the query terms' row groups. (physical="narrow" avoids the
    block shuffle but leaves every file spanning the whole vocabulary,
    which makes every row group a stats-candidate for every query —
    measured 5-8× worse serving p50.) Placement is driven by the B8
    df-stats pass (block counts per term from level-0 metadata), NOT by
    repartitionByRange's sampling job. Terms above ``hot_term_blocks``
    (default 4096 blocks — an absolute work-unit bound, see the inline
    rationale; top-4P by block count so the list stays driver-sized)
    are classified hot and spread across the partition space by
    source-bucket position, so the hottest term's postings land in
    ~merge_parallelism files instead of one straggler task/file —
    estypes.go:104-116's skew heuristic, wired into placement. The
    right choice at 10^12-doc scale where file-count per segment
    matters; overkill at bench scale.
    """
    seg_shift = _seg_shift(n_buckets, max_segments)
    l0 = spark.read.parquet(layout.postings_l0)
    base = (
        l0.withColumn(
            "segment", F.shiftright(F.col("bucket"), seg_shift).cast("int")
        )
        .withColumn(
            "block_id",
            (F.col("bucket").cast("long") * F.lit(1 << MERGE_BLOCK_SHIFT))
            + F.col("block_id"),
        )
        .drop("bucket", "group")
    )
    if consolidate:
        full = base.filter(F.col("n") == BLOCK_SIZE).select(*_MERGED_COLS)
        tails = base.filter(F.col("n") < BLOCK_SIZE)
        n_tgrp = max(merge_parallelism * 2, 8)
        # All tails of a term hash to ONE partition (repartition on the
        # term column), so the Arrow kernel sees every fragment of each
        # (segment, term) together.
        consolidated = tails.select(*_MERGED_COLS).repartition(
            n_tgrp, "term"
        ).mapInArrow(_consolidate_tails_arrow, MERGED_SCHEMA)
        merged = full.unionByName(consolidated)
    else:
        merged = base.select(*_MERGED_COLS)
    # ONE aggregation pass over the level-0 block metadata feeds the
    # placement derivations (hot list, range bounds) AND the term
    # dictionary (df = Σn, cf = Σsum_tf — invariant under consolidation).
    stats = l0.groupBy("term").agg(
        F.count("*").alias("nblocks"),
        F.sum("n").alias("df"),
        F.sum("sum_tf").alias("cf"),
    )
    total_tokens: int
    if physical == "range":
        # A cold term must be a BOUNDED work unit for every consumer —
        # one merge task, one batch-scoring task (its whole list lands in
        # one file = one input split), one serving metadata read. The cut
        # is therefore absolute work size (4096 blocks ≈ 0.5M postings ≈
        # ~5 MB payload), not a fraction of the corpus: the old
        # total/P/2 cut classified a 1M-posting term as cold at 2M docs,
        # and its single-file placement made one straggler task decode
        # the hottest query term's entire list in the batch path
        # (measured: query N→4N scaling 0.36). The hot list stays
        # driver-sized via top-(4P): residual terms beyond it are at
        # most as big as the (4P+1)-th hottest — under any Zipf-ish law
        # the fat head is covered.
        hot_cut = hot_term_blocks or 4096
        n_top = 4 * max(merge_parallelism, 1)
        # Cold terms get CONTIGUOUS, block-balanced term ranges (not a
        # hash): a query term then lives in ONE file per segment and the
        # metadata-first serving reader's footer check prunes every other
        # FILE outright — with a hash each file spans the whole
        # vocabulary and a tiny index reads every row group's metadata
        # per query (measured 5-8× worse serving p50). Range boundaries
        # come from cumulative block counts over the term-sorted stats.
        #
        # Small-vocab fast path (≤ _PLACEMENT_DRIVER_MAX_TERMS): ONE
        # limit-collect job, hot list + bounds in pandas on the driver —
        # the fixed cost of the distributed derivations (~4 extra jobs)
        # was a measurable slice of the sf0.1 merge stage. limit(N+1)
        # returning ≤ N rows proves we saw the whole vocabulary; above
        # the cap, the distributed two-pass prefix sum (_cold_term_bounds
        # — byte-identical, tested) handles 10^9+-term vocabularies with
        # no single-partition step.
        with _detail("merge_placement"):
            rows = stats.limit(_PLACEMENT_DRIVER_MAX_TERMS + 1).collect()
        if len(rows) <= _PLACEMENT_DRIVER_MAX_TERMS:
            with _detail("merge_placement"):
                spdf = pd.DataFrame(
                    {"term": [r.term for r in rows],
                     "nblocks": [r.nblocks for r in rows],
                     "df": [r.df for r in rows],
                     "cf": [r.cf for r in rows]}
                )
                hot_pdf = (
                    spdf[spdf["nblocks"] > hot_cut]
                    .sort_values(["nblocks", "term"], ascending=[False, True])
                    .head(n_top)
                )
                hot_terms = hot_pdf["term"].tolist()
                bounds = _bounds_pandas(
                    spdf[~spdf["term"].isin(hot_terms)], merge_parallelism
                )
            with _detail("merge_dict"):
                total_tokens = _write_dictionary(
                    spark, layout, None, driver_pdf=spdf
                )
        else:
            stats = stats.persist()
            with _detail("merge_placement"):
                hot_terms = [
                    r.term
                    for r in stats.filter(F.col("nblocks") > hot_cut)
                    .orderBy(F.col("nblocks").desc(), "term")
                    .limit(n_top)
                    .collect()
                ]
                cold = (
                    stats.filter(~F.col("term").isin(hot_terms))
                    if hot_terms else stats
                )
                bounds = _cold_term_bounds(cold, merge_parallelism)
            with _detail("merge_dict"):
                total_tokens = _write_dictionary(spark, layout, stats)
            stats.unpersist()
        pos = F.shiftright(F.col("doc_id_lo"), DOC_BUCKET_SHIFT)
        barr = (
            F.array(*[F.lit(b) for b in bounds]) if bounds else F.array(F.lit(""))
        )
        cold_part = F.greatest(
            F.size(F.filter(barr, lambda b: b <= F.col("term"))) - F.lit(1),
            F.lit(0),
        )
        mpart = F.when(
            F.col("term").isin(hot_terms) if hot_terms else F.lit(False),
            F.pmod(pos, F.lit(merge_parallelism)),
        ).otherwise(F.lit(merge_parallelism) + cold_part)
        merged = (
            merged.withColumn("mpart", mpart)
            .repartition(merge_parallelism + max(len(bounds), 1), "mpart")
            .drop("mpart")
        )
    else:
        total_tokens = _write_dictionary(spark, layout, stats)
    merged = merged.sortWithinPartitions("segment", "term", "doc_id_lo")
    with _detail("merge_write"):
        (
            merged.write.mode("overwrite")
            .option("parquet.block.size", str(row_group_bytes))
            # parquet-mr only checks the accumulated size every N rows
            # (default 100) — scale the interval with the target so small
            # row groups (tests, fine-grained indexes) are actually honored.
            .option(
                "parquet.page.size.row.check.min",
                str(max(4, min(100, row_group_bytes // (64 * 1024)))),
            )
            .partitionBy("segment")
            .parquet(layout.postings)
        )
    return {
        "prune_shift": DOC_BUCKET_SHIFT + (seg_shift if consolidate else 0),
        "total_tokens": total_tokens,
    }


# --------------------------------------------------------------------------
# Orchestration
# --------------------------------------------------------------------------

def _run_segment_groups(spark, pending, run_group, fail_after_groups,
                        concurrent_groups):
    """Execute the pending segment groups sequentially, or — on request —
    from a small thread pool to overlap per-group driver gaps (job setup,
    parquet commit, ledger write, FS walk): groups are independent (their
    writes target disjoint group-scoped dirs; ledger commits are atomic
    uuid-named files), and on a real cluster the scheduler caps
    concurrent tasks at total cores while the per-group driver barrier is
    the growing cost as executors scale. Default is OFF (sequential): on
    this sandbox's microVM host, concurrent Arrow-UDF stages page-fault
    together and anti-scale 5× (measured — see BENCH.md environment
    note), and the same is true of any memory-bound single-node
    deployment."""
    if fail_after_groups is not None:
        # Deterministic kill switch for resume tests: run groups in
        # order, die after exactly N commits.
        for groups_run, g in enumerate(pending, 1):
            run_group(g)
            if groups_run >= fail_after_groups:
                raise SimulatedFailure(
                    f"killed after {groups_run} groups (test)"
                )
    elif concurrent_groups > 1 and len(pending) > 1:
        from concurrent.futures import (
            FIRST_EXCEPTION, ThreadPoolExecutor, wait,
        )

        workers = min(concurrent_groups, len(pending))
        with ThreadPoolExecutor(max_workers=workers) as ex:
            futs = [ex.submit(run_group, g) for g in pending]
            done_f, not_done = wait(futs, return_when=FIRST_EXCEPTION)
            # Surface the FIRST failure promptly (not in submit order)
            # and don't keep sibling groups running behind it: unstarted
            # futures cancel; in-flight ones finish their idempotent
            # group write harmlessly (ADVICE r02).
            for f in not_done:
                f.cancel()
            for f in done_f:
                f.result()  # re-raise
    else:
        for g in pending:
            run_group(g)


def build_index(
    spark: SparkSession,
    source: str,
    index_dir: str,
    n_buckets: int = 32,
    max_segments: int = 5,
    n_groups: int = 4,
    build_id: str = "build0",
    merge_parallelism: int | None = None,
    fail_after_groups: int | None = None,
    fail_after_extract_groups: int | None = None,
    pages: DataFrame | None = None,
    source_filter: str | None = None,
    concurrent_groups: int = 1,
    postings_row_group_bytes: int = POSTINGS_ROW_GROUP_BYTES,
    extract_mode: str = "wide",
) -> dict:
    """Run (or resume) a full index build. Returns the published manifest.

    Parameters mirror escp's CLI: n_buckets ≅ --shards (D2), max_segments ≅
    --maxsegs (D5), n_groups = checkpoint granularity (the scroll-page
    analog of resumable units, esscroll.go:129), source_filter = a SQL
    predicate pushed into the corpus scan (the escopyjob.go:37 query
    filter POSTed at esscroll.go:79-90 — index only the matching docs
    without pre-materializing a filtered corpus).

    ``extract_mode`` places the html→text extraction (VERDICT r03 #1/#7:
    round 3's separate materialized extract stage was a second staging
    copy of the corpus, and its cost showed up directly in the headline
    build time — measured per-stage in BENCH.md):

    - ``"wide"`` (default): extraction runs inside the one wide pass —
      staging stores TEXT, the corpus' html is read and written exactly
      once, minimum total bytes. A failure during the wide pass redoes
      it whole (dedup+extract are one stage), after it per-group resume
      applies as usual.
    - ``"fused"``: staging stores html; extraction re-runs inside each
      group's segment stage (Catalyst prunes text out of the docmap job).
      Wide-pass failures no longer redo extraction work, per-group
      failures redo only that group's extraction. Costs reading html per
      group instead of the (smaller) text.
    - ``"staged"``: round-3 behavior — a separate per-group extract
      stage materialized to staging with its own ledger commits; finest
      resume granularity (a mid-group segment failure resumes AFTER
      extraction), at 1× extra corpus write amplification. For
      deployments where re-extracting one group is expensive.
    """
    import hashlib

    if fail_after_extract_groups is not None:
        extract_mode = "staged"  # the kill switch targets that stage
    if extract_mode not in ("wide", "fused", "staged"):
        raise ValueError(f"unknown extract_mode {extract_mode!r}")

    layout = IndexLayout(index_dir, build_id)
    layout.ensure_dirs()
    snapshot = input_snapshot_fingerprint(source)
    # Resume units are only interchangeable between runs with identical
    # bucketing/grouping/filtering — key the ledger on input AND params
    # so a re-run with different n_buckets/n_groups/filter rebuilds
    # instead of silently mixing layouts.
    # extract_mode changes what staging HOLDS (text vs html) — resume
    # units are not interchangeable across modes.
    params = (
        f"nb={n_buckets}|ng={n_groups}|flt={source_filter or ''}"
        f"|xm={extract_mode}"
    )
    resume_key = (
        snapshot + "|" + hashlib.md5(params.encode()).hexdigest()[:12]
    )
    merge_parallelism = merge_parallelism or spark.sparkContext.defaultParallelism

    import time as _time

    last_build_timings.clear()
    last_build_detail.clear()
    _t0 = _time.perf_counter()

    def _mark(stage: str):
        nonlocal _t0
        now = _time.perf_counter()
        last_build_timings[stage] = round(now - _t0, 3)
        _t0 = now

    shuffled_dir = os.path.join(layout.staging, "shuffled")
    extracted_dir = os.path.join(layout.staging, "extracted")

    # ---- Stage "shuffle": the ONE wide pass — dedup shuffle + md5
    # bucketing (+ extraction when extract_mode="wide") — materialized
    # partitioned by checkpoint group. Its resumable unit is the whole
    # shuffle (a shuffle either completes or doesn't). Staging write
    # amplification is 1× of the input or less (text < html) — the same
    # cost the reference pays bulk-writing every doc into the target
    # index.
    if not committed_groups(spark, layout, "shuffle", resume_key):
        if pages is None:
            pages = read_web_pages(spark, source)
        if source_filter:
            # Catalyst pushes this predicate into the Parquet/Iceberg
            # scan (plan-asserted in tests/test_plans.py).
            pages = pages.filter(F.expr(source_filter))
        # The corpus ``text`` column never survives the wide pass (every
        # mode re-derives text from html via the byte-identical
        # extractor), but the dedup aggregate's max_by struct would
        # otherwise carry it through the one wide exchange — drop it
        # BEFORE the aggregate so the shuffle ships html only (guide
        # §2.3 "project before the exchange"; ~45% fewer dedup-exchange
        # bytes on the bench corpus, where text ≈ html payload).
        pages = pages.drop("text")
        shuffled = (
            dedup_last_write_wins(pages)
            .withColumn("bucket", bucket_expr(F.col("url"), n_buckets))
            .withColumn("grp", (F.col("bucket") % n_groups))
        )
        if extract_mode == "wide":
            # Extraction inside the wide pass: the Arrow UDF runs on the
            # post-dedup stage tasks and staging stores text — the html
            # is never written anywhere.
            shuffled = shuffled.withColumn(
                "text", extract_text_udf(F.col("html"))
            ).select("url", "bucket", "grp", "text", "lang")
        else:
            shuffled = shuffled.select("url", "bucket", "grp", "html", "lang")
        with _scoped_conf(spark, _CORPUS_SCAN_CONF), _detail("shuffle_write"):
            shuffled.write.mode("overwrite").partitionBy("grp").parquet(
                shuffled_dir
            )
        # Per-group doc counters (M2 analog) from the staging files'
        # parquet FOOTERS — driver-side metadata reads (num_rows is
        # exact), not a Spark scan of the staging bytes (r07: the old
        # count job re-read the whole staging dataset; ~0.3-0.8 s at
        # sf1.0 and growing with corpus size).
        with _detail("shuffle_counts"):
            import pyarrow.parquet as _pq

            grp_counts = {}
            for entry in os.listdir(shuffled_dir):
                if not entry.startswith("grp="):
                    continue
                g = int(entry.split("=", 1)[1])
                n = 0
                for broot, _, bfiles in os.walk(
                    os.path.join(shuffled_dir, entry)
                ):
                    for fn in bfiles:
                        if fn.endswith(".parquet") and not fn.startswith(
                            (".", "_")
                        ):
                            n += _pq.ParquetFile(
                                os.path.join(broot, fn)
                            ).metadata.num_rows
                grp_counts[g] = n
        with _detail("shuffle_ledger"):
            _ledger_append(
                spark,
                layout,
                [
                    {
                        "build_id": build_id,
                        "partition_id": int(g),
                        "stage": "shuffle",
                        "status": "committed",
                        "segment_path": os.path.join(shuffled_dir, f"grp={g}"),
                        "docs": int(docs),
                        "bytes": _dir_bytes(
                            os.path.join(shuffled_dir, f"grp={g}")
                        ),
                        "input_snapshot": resume_key,
                    }
                    for g, docs in grp_counts.items()
                ],
            )
        log.info("shuffle committed: %d docs", sum(grp_counts.values()))
    else:
        pdf = _ledger_pandas(layout)
        m = (
            (pdf["build_id"] == build_id)
            & (pdf["stage"] == "shuffle")
            & (pdf["input_snapshot"] == resume_key)
        )
        grp_counts = dict(
            zip(pdf.loc[m, "partition_id"].astype(int), pdf.loc[m, "docs"].astype(int))
        )
        log.info("shuffle stage already committed — skipping (resume)")

    _mark("shuffle")

    # ---- Stage "extract" (opt-in, extract_stage=True): per-group
    # Arrow-UDF html→text extraction materialized to staging with a
    # ledger commit per group (the esscroll.go:129 per-page checkpoint
    # analog at sub-group granularity). Default is FUSED extraction in
    # the segment stage below — same per-group resume unit, no second
    # staging copy of the corpus (VERDICT r03 #1/#7).
    if extract_mode == "staged":
        done_extract = committed_groups(spark, layout, "extract", resume_key)

        def _extract_group(g: int) -> None:
            part = spark.read.parquet(shuffled_dir).filter(F.col("grp") == g)
            out_path = os.path.join(extracted_dir, f"grp={g}")
            with _scoped_conf(spark, _GROUP_SCAN_CONF):
                (
                    part.withColumn("text", extract_text_udf(F.col("html")))
                    .select("url", "bucket", "text", "lang")
                    .write.mode("overwrite")
                    .parquet(out_path)
                )
            _ledger_append(
                spark,
                layout,
                [
                    {
                        "build_id": build_id,
                        "partition_id": g,
                        "stage": "extract",
                        "status": "committed",
                        "segment_path": out_path,
                        "docs": int(grp_counts.get(g, 0)),
                        "bytes": _dir_bytes(out_path),
                        "input_snapshot": resume_key,
                    }
                ],
            )
            log.info(
                "extract group %d committed: %d docs", g, grp_counts.get(g, 0)
            )

        pending_extract = [g for g in range(n_groups) if g not in done_extract]
        if done_extract:
            log.info(
                "%d extract groups already committed — skipping (resume)",
                len(done_extract),
            )
        for run_count, g in enumerate(pending_extract, 1):
            _extract_group(g)
            if (
                fail_after_extract_groups is not None
                and run_count >= fail_after_extract_groups
            ):
                raise SimulatedFailure(
                    f"killed after {run_count} extract groups (test)"
                )

        _mark("extract")

    # ---- Stage "segment": per-group docmap + level-0 segment build,
    # idempotent group-scoped writes, ledger commit per group. In the
    # fused (default) path this stage also extracts: the docmap job
    # never computes the UDF (Catalyst prunes the text column — it only
    # needs url+bucket) and the segment job extracts on the group-scan
    # tasks right before the bucket shuffle.
    done = committed_groups(spark, layout, "segment", resume_key)

    def _group_input(g: int) -> DataFrame:
        if extract_mode == "staged":
            return spark.read.parquet(extracted_dir).filter(F.col("grp") == g)
        part = spark.read.parquet(shuffled_dir).filter(F.col("grp") == g)
        if extract_mode == "wide":
            return part.select("url", "bucket", "text", "lang")
        return part.withColumn("text", extract_text_udf(F.col("html"))).select(
            "url", "bucket", "text", "lang"
        )

    def _run_group(g: int) -> None:
        part = _group_input(g)
        # Group-scan splits sized small (scoped conf set by the caller
        # around this whole stage): staging group dirs hold many small
        # files and the fused extraction runs on the scan tasks — the
        # default 128 MB bin-packing would collapse a group to a couple
        # of tasks and serialize the Arrow UDF.
        # docmap group files are written straight to their final location
        # (clustered by doc_id via the window's output order) — publish is
        # zero-copy, which matters when the docmap has 10^12 rows.
        dm_path = os.path.join(layout.docmap, f"group={g}")
        with _detail("segment_docmap"):
            (
                docmap_for(part).write.mode("overwrite")
                .option("parquet.block.size", str(DOCMAP_ROW_GROUP_BYTES))
                .parquet(dm_path)
            )
        seg_path = os.path.join(layout.postings_l0, f"group={g}")
        with _detail("segment_postings"):
            build_segments(part.select("url", "bucket", "text")).write.mode(
                "overwrite"
            ).parquet(seg_path)
        docs_g = int(grp_counts.get(g, 0))
        with _detail("segment_ledger"):
            bytes_g = _dir_bytes(seg_path)  # FS listing, no Spark job
            _ledger_append(
                spark,
                layout,
                [
                    {
                        "build_id": build_id,
                        "partition_id": g,
                        "stage": "segment",
                        "status": "committed",
                        "segment_path": seg_path,
                        "docs": docs_g,
                        "bytes": bytes_g,
                        "input_snapshot": resume_key,
                    }
                ],
            )
        log.info(
            "group %d committed: %d docs, %s of segments",
            g, docs_g, iec_format(bytes_g),
        )

    pending = [g for g in range(n_groups) if g not in done]
    if len(done):
        log.info("%d groups already committed — skipping (resume)", len(done))
    # One scope around the whole stage (not per group): identical values
    # for every group, and concurrent_groups threads must not race the
    # restore mid-plan. The shuffle-partition override spreads the
    # per-bucket kernels 1-2 per task instead of the 3-4 balls-into-bins
    # worst bin (see _balanced_shuffle_partitions) — scoped to this
    # stage only; every other query keeps the session's sizing.
    seg_conf = dict(_GROUP_SCAN_CONF)
    # Scale gate (A/B-measured): below ~2000 docs/bucket a kernel is
    # ~50 ms and the straggler the planner removes is smaller than the
    # extra empty-task/file overhead it adds (sf0.1: planner 7.36 s vs
    # default 6.94 s; sf1.0: planner ≈1.5-2 s FASTER) — the override
    # only engages when per-bucket work dominates scheduling.
    if sum(grp_counts.values()) >= 2000 * n_buckets:
        seg_conf["spark.sql.shuffle.partitions"] = str(
            _balanced_shuffle_partitions(
                [
                    [b for b in range(n_buckets) if b % n_groups == g]
                    for g in range(n_groups)
                ],
                int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
            )
        )
    with _scoped_conf(spark, seg_conf):
        _run_segment_groups(
            spark, pending, _run_group, fail_after_groups, concurrent_groups
        )

    _mark("segment")

    # ---- Finalize (idempotent overwrites): merge (which also writes the
    # dictionary from its own level-0 stats pass), stats, atomic manifest
    # publish (D3/B11).
    merged = merge_segments(
        spark, layout, n_buckets, max_segments, merge_parallelism,
        row_group_bytes=postings_row_group_bytes,
    )
    prune_shift = merged["prune_shift"]
    _mark("merge")

    n_docs = int(sum(grp_counts.values()))
    avgdl = merged["total_tokens"] / n_docs if n_docs else 0.0

    # Serving-metadata sidecar: the row-group footer stats the reader's
    # interval indexes need, scanned ONCE here instead of per reader per
    # publish (VERDICT r04 wrong-#1; the Lucene persist-at-merge analog).
    from .sidecar import write_rg_sidecar

    with _detail("final_sidecar"):
        write_rg_sidecar(layout, spark)

    manifest = publish_manifest(
        layout,
        {
            "n_docs": int(n_docs),
            "avgdl": float(avgdl),
            "n_buckets": n_buckets,
            "max_segments": max_segments,
            "block_size": BLOCK_SIZE,
            "codec_version": CODEC_VERSION,
            "layout_version": INDEX_LAYOUT_VERSION,
            "analyzer_version": ANALYZER_VERSION,
            "input_snapshot": snapshot,
            "source_filter": source_filter,
            # Consolidated tail blocks span up to 2^(shift-40) buckets
            # (always within one segment); the serving path handles them
            # as spanning blocks (query._prune_and_score step 0).
            "consolidation_shift": prune_shift,
        },
    )
    _mark("finalize")
    log.info("published index: %d docs, avgdl=%.2f", n_docs, avgdl)
    return manifest


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total
