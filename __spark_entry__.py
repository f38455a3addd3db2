"""Driver contract for the spark-graft builder (PySpark target).

``entry`` builds (or reuses) a BM25 inverted index over the sf0.001
``documents`` table with the full engine pipeline and runs the flagship
top-k query set through the distributed batch path.

``queries()``/``oracle_sql()``: every implemented operator from
SURVEY.md §2 with a DuckDB-checkable ANSI-SQL oracle. Float outputs are
rounded identically on both sides so value-hashes compare stably.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Flagship BM25 query set over the documents table (vocab is ASCII, so the
# engine's frozen [^\W_]+ tokenizer ≡ the SQL oracle's [a-z0-9]+).
# ---------------------------------------------------------------------------
DOC_QUERIES = [
    {"query_id": 0, "query_text": "batch", "k": 10},          # hottest term
    {"query_id": 1, "query_text": "dup", "k": 10},            # rarest term
    {"query_id": 2, "query_text": "zzznotaword", "k": 10},    # absent
    {"query_id": 3, "query_text": "dup scan", "k": 10},       # rare+common
    {"query_id": 4, "query_text": "batch small agg", "k": 10},
    {"query_id": 5, "query_text": "the fast key", "k": 10},
    {"query_id": 6, "query_text": "dup", "k": 1},
    {"query_id": 7, "query_text": "vector value column", "k": 25},
    {"query_id": 8, "query_text": "spark query row", "k": 10},
    {"query_id": 9, "query_text": "merge sort", "k": 10},
]


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(_t(sf_dir, name))


def _read_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """_read, but restore scan parallelism when the table is ONE parquet
    row group (r07, guide §2.5 "input skew"): a single row group is one
    input split no matter the split size, so every row-wise expression
    after the scan (regex tokenization, per-row cosine) runs on ONE core.
    The repartition is gated on that pathological layout — a production
    table has thousands of row groups and takes the plain scan, so this
    never adds a shuffle at scale."""
    df = _read(spark, sf_dir, name)
    try:
        import pyarrow.parquet as pq

        n_rg = pq.ParquetFile(_t(sf_dir, name)).metadata.num_row_groups
    except Exception:
        return df
    if n_rg == 1:
        return df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from escp_spark.docindex import doc_id_from_url_expr, ensure_documents_index
    from escp_spark.query import search_topk_spark

    index_dir = ensure_documents_index(spark, sf_dir)
    res = search_topk_spark(spark, index_dir, DOC_QUERIES)
    return res.select(
        "query_id",
        "rank",
        doc_id_from_url_expr(F.col("doc_url")).alias("doc_id"),
        F.round("score", 4).alias("score"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full index build + distributed BM25 top-k at sf0.001."""
    return _bm25_topk(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Relational / operator queries (SURVEY.md §2 coverage), DuckDB-oracled
# ---------------------------------------------------------------------------

def q_dedup_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: last-write-wins dedup — newest event per user (deterministic
    tie-break by event_id desc); the bulktypes.go:28-30 analog."""
    ev = _read(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", F.round("value", 4).alias("value"))
    )


def q_count_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1/S4: count-equality precheck shape — per-lang doc counts + byte
    accounting (estypes.go:74-102 stats analog)."""
    return (
        _read(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


def q_sampled_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V2-V5: deterministic Bernoulli-sample (doc_id % 20 == 0, the seeded
    dice.Intn analog) + per-doc diff classification + aggregate verdict."""
    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    status = F.when(F.length("text") == F.col("n_chars"), "matched").otherwise(
        "mismatched"
    )
    return (
        d.withColumn("status", status)
        .groupBy("status")
        .agg(F.count("*").alias("checked"), F.sum("n_chars").alias("bytes"))
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + global top-k (TakeOrderedAndProject — the distributed
    bounded-heap, Q4's relational cousin)."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    return (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count("*").alias("n_orders"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "revenue", "n_orders")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(5)
    )


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (DiffMissing analog, esdiff.go:51-53)."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_asia_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join chain through broadcast dims (S9 point-lookup as a
    broadcast join, not per-row RPC)."""
    r = _read(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _read(spark, sf_dir, "nation")
    s = _read(spark, sf_dir, "supplier")
    asia_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
    return (
        s.join(
            F.broadcast(asia_nations), s.s_nationkey == asia_nations.n_nationkey
        )
        .select("s_suppkey", "s_name", "n_name", F.round("s_acctbal", 2).alias("acctbal"))
    )


def q_term_df_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8: the hot-term statistics pass that drives salting — document
    frequency per term, flagged when df exceeds the skew threshold."""
    d = _read_parallel(spark, sf_dir, "documents")
    # Per-doc dedup via array_distinct BEFORE the explode (r07, guide
    # §2.4): doc_id is unique per row, so distinct (doc_id, term) pairs
    # ≡ exploding each doc's distinct-term array — the global
    # .distinct() exchange over the whole token stream disappears and
    # the groupBy's map-side partial agg is the only shuffle (plan:
    # 2 Exchanges → 1; doc_id is no longer read at all).
    toks = d.select(
        F.explode(
            F.array_distinct(
                F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
            )
        ).alias("term")
    )
    # Row count from parquet footers (driver-side metadata), not a second
    # full Spark scan of the table.
    import pyarrow.dataset as pads

    total = pads.dataset(_t(sf_dir, "documents")).count_rows()
    return (
        toks.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn("is_hot", (F.col("df") > total * 0.5).cast("int"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(20)
    )


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text analysis: token counting (whitespace/word-regex) per doc."""
    d = _read(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias(
            "n_tokens"
        ),
        F.length("text").alias("n_bytes"),
    ).orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc()).limit(10)


def q_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality scoring: stopword ratio + mean token length per lang."""
    d = _read(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("term"),
    )
    stop = F.col("term").isin("the", "a", "of", "and", "to", "in", "is")
    return (
        toks.groupBy("lang")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(stop.cast("double")), 6).alias("stopword_ratio"),
            F.round(F.avg(F.length("term")), 6).alias("avg_token_len"),
        )
    )


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content hash-groupBy (md5 fingerprint)."""
    d = _read(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("fingerprint"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: content hash + shape features, sampled."""
    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id",
        F.md5("text").alias("md5"),
        F.substring("text", 1, 16).alias("prefix"),
        F.length("text").alias("n_bytes"),
    )


def q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity search: brute-force cosine vs vec_id=0 over the embedding
    column, JVM-vectorized (F.aggregate/zip_with — no UDF)."""
    e = _read(spark, sf_dir, "embeddings")
    probe = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe")
    )
    # Filter first (pushdown intact), then _read_parallel-style
    # repartition: the sf embeddings table is ONE row group = one scan
    # split, so the per-row higher-order-function cosine otherwise runs
    # single-core (r07; the 6 MB shuffle is ~free next to the fold).
    rest = _read_parallel(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") != 0
    )
    joined = rest.crossJoin(F.broadcast(probe))
    a = F.col("embedding").cast("array<double>")
    b = F.col("probe").cast("array<double>")
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))
    cos = F.round(dot / (na * nb), 4)
    return (
        joined.select("vec_id", "label", cos.alias("cos"))
        .filter(F.col("cos") >= 0.15)
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprints (dedup family) — Catalyst-only
    expression, bit-for-bit reproducible in the SQL oracle."""
    from escp_spark.operators import simhash_expr

    return simhash_expr(_read(spark, sf_dir, "documents"))


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS (byte-pigeonhole blocked self-join with
    exact-duplicate pre-collapse). At max_hamming=3 < n_bits/8 the
    4-byte blocking is provably COMPLETE (a pair within distance 3 must
    agree on ≥1 of 4 bytes), so the blocked output equals the all-pairs
    form — which is exactly what the DuckDB oracle computes."""
    from escp_spark.operators import simhash_near_dups

    return simhash_near_dups(
        _read(spark, sf_dir, "documents"), max_hamming=3
    )


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID over documents (sampled)."""
    from escp_spark.operators import langid_scores

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return langid_scores(d)


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features per doc (sampled)."""
    from escp_spark.operators import quality_scores

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    return quality_scores(d)


def q_token_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs (n-gram family, n=1) over a
    doc sample — the verify step of the dedup pipeline."""
    from escp_spark.operators import ngram_jaccard_pairs

    d = _read(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    return ngram_jaccard_pairs(d, n=1, threshold=0.6)


def q_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection. Scheme v2's BIGINT-exact hashing
    makes the full pipeline (shingle hash → signature minima → band
    candidates → Jaccard verify) reproducible in the DuckDB oracle."""
    from escp_spark.operators import minhash_near_dups

    d = _read(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 10 == 0) & (F.length("text") >= 5)
    )
    return minhash_near_dups(d, threshold=0.5)


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbours over the MATERIALIZED
    bucket layout: the bucket is a Parquet partition column, so the
    candidate restriction is partition pruning, not per-row math. The
    seeded planes are deterministic, so the DuckDB oracle reproduces the
    exact candidate set and 4-decimal ranking."""
    from escp_spark.operators import ann_lsh_topk_bucketed, ensure_embedding_buckets

    bdir = ensure_embedding_buckets(spark, sf_dir, n_planes=8)
    e = _read(spark, sf_dir, "embeddings")
    probe = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    return ann_lsh_topk_bucketed(
        spark, bdir, probe, k=10, n_planes=8, probe_hamming=4,
        where=F.col("vec_id") != 0,
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup PAIRS (dedup family): banded
    random-hyperplane LSH blocking (8 bands × 2 sign bits, seeded
    planes) + exact cosine verify — the scale path, never all-pairs.
    The planes are deterministic, so the DuckDB oracle reproduces the
    EXACT banded candidate set (band-code agreement join), then the
    same 4-decimal cosine — like the ann_lsh oracle, it checks the
    operator's defined semantics, not an all-pairs proxy whose ~2%
    recall gap at this threshold would be a false mismatch."""
    from escp_spark.operators import embedding_near_dup_pairs

    e = _read(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e, threshold=0.35)


def q_filtered_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The estail analog (cmd/estail/estail.go:22-106): bool terms filter
    + time-range over the newest window, newest first — data-anchored
    (max ts), not wall-clock, so it's deterministic."""
    ev = _read(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    return (
        ev.filter(
            (F.col("ts") >= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS"))
            & F.col("event_type").isin("click", "error")
            & ~F.col("event_type").isin("signup")
        )
        .select(
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
        )
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(50)
    )


def q_bm25_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVING path (pyarrow + numpy block-max WAND, no Spark in the
    request loop) against the same SQL oracle as the batch path — proves
    the pruning is rank-identical, not just the distributed job."""
    from escp_spark.docindex import URL_PREFIX, ensure_documents_index
    from escp_spark.query import search_topk

    index_dir = ensure_documents_index(spark, sf_dir)
    rows = search_topk(index_dir, DOC_QUERIES)
    out = [
        (r["query_id"], r["rank"], int(r["doc_url"][len(URL_PREFIX):]),
         round(r["score"], 4))
        for r in rows
    ]
    return spark.createDataFrame(
        out, "query_id int, rank int, doc_id long, score double"
    )


def q_revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join aggregate (customer ⋈ orders ⋈ nation) — TPC-H-Q5-ish."""
    c = _read(spark, sf_dir, "customer")
    o = _read(spark, sf_dir, "orders")
    n = _read(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def q_doc_rank_in_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: longest 3 docs per language (rank + tie-break)."""
    d = _read(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        d.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("lang", "rnk", "doc_id", "n_chars")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>30min cumsum — the batch form of
    session_window; per-session stats per user."""
    # Timestamp SUBTRACTION is timezone-free (works on NTZ, exact to the
    # microsecond) — no session-tz mutation and no whole-second epoch
    # truncation on either side of the oracle compare.
    ev = _read(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES"), 1
    ).otherwise(0)
    sess = (
        ev.withColumn("new_sess", gap)
        .withColumn("session_id", F.sum("new_sess").over(
            w.rowsBetween(W.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event counts per user cohort × event type as columns."""
    ev = _read(spark, sf_dir, "events").withColumn(
        "cohort", (F.col("user_id") % 10).cast("int")
    )
    return (
        ev.groupBy("cohort")
        .pivot("event_type", ["click", "view", "signup", "error", "purchase"])
        .count()
        .na.fill(0)
    )


def q_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over lineitem (subtotal + grand-total rows)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n",
            "qty",
        )
    )


def q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch form of the streaming op)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": _bm25_topk,
        "dedup_lww": q_dedup_lww,
        "count_validate": q_count_validate,
        "sampled_diff": q_sampled_diff,
        "tpch_q1": q_tpch_q1,
        "top_revenue_customers": q_top_revenue_customers,
        "customers_without_orders": q_customers_without_orders,
        "asia_suppliers": q_asia_suppliers,
        "term_df_stats": q_term_df_stats,
        "token_counts": q_token_counts,
        "lang_quality": q_lang_quality,
        "exact_dup_groups": q_exact_dup_groups,
        "doc_fingerprint": q_doc_fingerprint,
        "ann_cosine": q_ann_cosine,
        "events_window_agg": q_events_window_agg,
        "simhash": q_simhash,
        "simhash_pairs": q_simhash_pairs,
        "langid": q_langid,
        "quality": q_quality,
        "token_jaccard_pairs": q_token_jaccard_pairs,
        "minhash_near_dups": q_minhash_near_dups,
        "ann_lsh": q_ann_lsh,
        "embedding_near_dups": q_embedding_near_dups,
        "filtered_tail": q_filtered_tail,
        "bm25_serving": q_bm25_serving,
        "revenue_by_segment": q_revenue_by_segment,
        "doc_rank_in_lang": q_doc_rank_in_lang,
        "sessionize": q_sessionize,
        "event_type_pivot": q_event_type_pivot,
        "rollup_lineitem": q_rollup_lineitem,
    }


_BM25_QUERY_VALUES = ", ".join(
    f"({q['query_id']}, '{t}', {q['k']})"
    for q in DOC_QUERIES
    for t in q["query_text"].split()
)

_BM25_SQL = f"""
WITH q(query_id, term, k) AS (VALUES {_BM25_QUERY_VALUES}),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM documents) AS avgdl
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT q.query_id, q.k, tf.doc_id,
         ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * 2.2
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS c
  FROM q
  JOIN df USING (term)
  JOIN tf USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats s
),
scores AS (
  SELECT query_id, k, doc_id, sum(c) AS score
  FROM contrib GROUP BY query_id, k, doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC
         ) AS rank, k
  FROM scores
)
SELECT query_id::INT AS query_id, rank::INT AS rank, doc_id,
       round(score, 4) AS score
FROM ranked WHERE rank <= k
ORDER BY query_id, rank
"""


def _ann_lsh_oracle_sql() -> str:
    from escp_spark.operators.similarity import ann_lsh_sql

    return ann_lsh_sql(dim=64, k=10, n_planes=8, probe_hamming=4)


def _embedding_near_dup_oracle_sql(threshold: float = 0.35,
                                   n_bands: int = 8, band_bits: int = 2,
                                   dim: int = 64) -> str:
    """DuckDB oracle for q_embedding_near_dups: identical seeded planes
    embedded as literals, identical per-band sign-bit codes, candidate
    pairs = agreement on ≥1 full band (exactly the operator's blocking),
    then the identical 4-decimal cosine verify."""
    from escp_spark.operators.similarity import _planes

    planes = _planes(dim, n_bands * band_bits, seed=42)

    def plane_lit(i: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in planes[i]) + "]::DOUBLE[]"

    def band_code(bd: int) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product(v, {plane_lit(bd * band_bits + j)})"
            f" >= 0 THEN {1 << j} ELSE 0 END)"
            for j in range(band_bits)
        )

    codes = ", ".join(f"({band_code(bd)}) AS c{bd}" for bd in range(n_bands))
    agree = " OR ".join(f"a.c{bd} = b.c{bd}" for bd in range(n_bands))
    return f"""
        WITH v AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        coded AS (SELECT vec_id, v, {codes} FROM v),
        cand AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                 round(list_dot_product(a.v, b.v)
                       / (sqrt(list_dot_product(a.v, a.v))
                          * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
          FROM coded a JOIN coded b
            ON a.vec_id < b.vec_id AND ({agree})
        )
        SELECT id_a, id_b, cos FROM cand WHERE cos >= {threshold}
    """


def _minhash_oracle_sql() -> str:
    from escp_spark.operators.dedup import minhash_near_dups_sql

    return minhash_near_dups_sql(doc_filter="doc_id % 10 = 0", threshold=0.5)


def _simhash_oracle_sql() -> str:
    from escp_spark.operators.dedup import simhash_sql

    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        )
        SELECT doc_id, ({simhash_sql('duckdb', 'term', 'tf')})::BIGINT AS simhash
        FROM tf GROUP BY doc_id
    """


_SIMHASH_SQL = _simhash_oracle_sql()


def _simhash_pairs_oracle_sql() -> str:
    """All-pairs reference for the BLOCKED engine pairs — valid because
    pigeonhole blocking is complete at max_hamming 3 with 4 bytes."""
    from escp_spark.operators.dedup import simhash_sql

    return f"""
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
        ), sig AS (
          SELECT doc_id, ({simhash_sql('duckdb', 'term', 'tf')})::BIGINT AS simhash
          FROM tf GROUP BY doc_id
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


_SIMHASH_PAIRS_SQL = _simhash_pairs_oracle_sql()


def oracle_sql() -> dict[str, str]:
    return {
        "bm25_topk": _BM25_SQL,
        "dedup_lww": """
            SELECT user_id, event_id, event_type, round(value, 4) AS value
            FROM (
              SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY ts DESC, event_id DESC
              ) AS rn FROM events
            ) WHERE rn = 1
        """,
        "count_validate": """
            SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
                   min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
            FROM documents GROUP BY lang
        """,
        "sampled_diff": """
            SELECT CASE WHEN length(text) = n_chars
                        THEN 'matched' ELSE 'mismatched' END AS status,
                   count(*) AS checked, sum(n_chars)::BIGINT AS bytes
            FROM documents WHERE doc_id % 20 = 0 GROUP BY 1
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   round(avg(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_revenue_customers": """
            SELECT c_custkey, c_name, round(revenue, 2) AS revenue, n_orders
            FROM (
              SELECT o_custkey, sum(o_totalprice) AS revenue, count(*) AS n_orders
              FROM orders GROUP BY o_custkey
            ) r JOIN customer ON c_custkey = o_custkey
            ORDER BY revenue DESC, c_custkey ASC LIMIT 5
        """,
        "customers_without_orders": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        """,
        "asia_suppliers": """
            SELECT s_suppkey, s_name, n_name, round(s_acctbal, 2) AS acctbal
            FROM supplier
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA')
        """,
        "term_df_stats": """
            WITH toks AS (
              SELECT DISTINCT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents
            )
            SELECT term, count(*) AS df,
                   CASE WHEN count(*) > (SELECT count(*) FROM documents) * 0.5
                        THEN 1 ELSE 0 END AS is_hot
            FROM toks GROUP BY term
            ORDER BY df DESC, term ASC LIMIT 20
        """,
        "token_counts": """
            SELECT doc_id,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens,
                   length(text) AS n_bytes
            FROM documents ORDER BY n_tokens DESC, doc_id ASC LIMIT 10
        """,
        "lang_quality": """
            WITH toks AS (
              SELECT lang, doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents
            )
            SELECT lang, count(*) AS n_tokens,
                   round(avg(CASE WHEN term IN
                     ('the','a','of','and','to','in','is') THEN 1.0 ELSE 0.0 END), 6)
                     AS stopword_ratio,
                   round(avg(length(term)), 6) AS avg_token_len
            FROM toks GROUP BY lang
        """,
        "exact_dup_groups": """
            SELECT md5(text) AS fingerprint, count(*) AS n_dups,
                   min(doc_id) AS keeper_doc_id
            FROM documents GROUP BY md5(text) HAVING count(*) > 1
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS md5, substring(text, 1, 16) AS prefix,
                   length(text) AS n_bytes
            FROM documents WHERE doc_id % 10 = 0
        """,
        "ann_cosine": """
            WITH probe AS (
              SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0
            ),
            c AS (
              SELECT vec_id, label,
                     round(
                       list_dot_product(embedding::DOUBLE[], p)
                       / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                          * sqrt(list_dot_product(p, p))), 4) AS cos
              FROM embeddings CROSS JOIN probe WHERE vec_id <> 0
            )
            SELECT vec_id, label, cos FROM c WHERE cos >= 0.15
        """,
        "events_window_agg": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
                   event_type, count(*) AS n, round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "bm25_serving": _BM25_SQL,
        "sessionize": """
            WITH g AS (
              SELECT user_id, event_id, value, ts,
                     CASE WHEN ts - lag(ts) OVER
                          (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
            ), s AS (
              SELECT user_id, value,
                     sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                     ) AS session_id
              FROM g
            )
            SELECT user_id, session_id::BIGINT AS session_id,
                   count(*) AS n_events, round(sum(value), 2) AS session_value
            FROM s GROUP BY user_id, session_id
        """,
        "event_type_pivot": """
            SELECT (user_id % 10)::INT AS cohort,
                   count(*) FILTER (event_type = 'click')    AS click,
                   count(*) FILTER (event_type = 'view')     AS view,
                   count(*) FILTER (event_type = 'signup')   AS signup,
                   count(*) FILTER (event_type = 'error')    AS error,
                   count(*) FILTER (event_type = 'purchase') AS purchase
            FROM events GROUP BY 1
        """,
        "rollup_lineitem": """
            SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
                   coalesce(l_linestatus, 'ALL') AS l_linestatus,
                   count(*) AS n, round(sum(l_quantity), 2) AS qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "revenue_by_segment": """
            SELECT n_name, c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
                   count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name, c_mktsegment
        """,
        "doc_rank_in_lang": """
            SELECT lang, rnk, doc_id, n_chars FROM (
              SELECT lang, doc_id, n_chars,
                     row_number() OVER (
                       PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC
                     ) AS rnk
              FROM documents
            ) WHERE rnk <= 3
        """,
        "simhash": _SIMHASH_SQL,
        "simhash_pairs": _SIMHASH_PAIRS_SQL,
        "minhash_near_dups": _minhash_oracle_sql(),
        "ann_lsh": _ann_lsh_oracle_sql(),
        "embedding_near_dups": _embedding_near_dup_oracle_sql(),
        "langid": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents WHERE doc_id % 5 = 0
            ), s AS (
              SELECT doc_id,
                avg(CASE WHEN term IN ('the','and','of','to','is') THEN 1.0 ELSE 0.0 END) AS s_en,
                avg(CASE WHEN term IN ('der','die','und','das','ist') THEN 1.0 ELSE 0.0 END) AS s_de,
                avg(CASE WHEN term IN ('le','la','et','les','est') THEN 1.0 ELSE 0.0 END) AS s_fr,
                avg(CASE WHEN term IN ('el','los','que','es','una') THEN 1.0 ELSE 0.0 END) AS s_es
              FROM toks GROUP BY doc_id
            )
            SELECT doc_id,
                   round(s_en, 6) AS score_en, round(s_de, 6) AS score_de,
                   round(s_fr, 6) AS score_fr, round(s_es, 6) AS score_es,
                   CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
                        WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                        WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                        WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                        ELSE 'es' END AS lang_pred
            FROM s
        """,
        "quality": """
            WITH base AS (
              SELECT doc_id, text,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
                     length(text) AS n_chars
              FROM documents WHERE doc_id % 7 = 0
            )
            SELECT doc_id, n_chars, len(toks) AS n_tokens,
                   round(n_chars * 1.0 / greatest(len(toks), 1), 6) AS chars_per_token,
                   round((n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                         * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
                   round(len(list_filter(toks,
                         t -> t IN ('the','a','of','and','to','in','is')))
                         * 1.0 / greatest(len(toks), 1), 6) AS stopword_ratio,
                   round((n_chars - length(regexp_replace(text, '[A-Z]', '', 'g')))
                         * 1.0 / greatest(n_chars, 1), 6) AS upper_ratio
            FROM base
        """,
        "token_jaccard_pairs": """
            WITH d AS (
              SELECT doc_id,
                     list_distinct(regexp_extract_all(lower(text), '[^\\W_]+')) AS toks
              FROM documents WHERE doc_id % 25 = 0
            ), p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     len(list_intersect(a.toks, b.toks)) AS inter,
                     len(a.toks) + len(b.toks)
                       - len(list_intersect(a.toks, b.toks)) AS un
              FROM d a JOIN d b ON a.doc_id < b.doc_id
              WHERE len(a.toks) > 0 AND len(b.toks) > 0
            )
            SELECT id_a, id_b, round(inter * 1.0 / un, 6) AS jaccard
            FROM p WHERE inter * 1.0 / un >= 0.6
        """,
        "filtered_tail": """
            WITH m AS (SELECT max(ts) AS mt FROM events)
            SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
                   user_id, event_type, round(value, 4) AS value
            FROM events, m
            WHERE ts >= mt - INTERVAL 2 HOUR
              AND event_type IN ('click', 'error')
              AND event_type NOT IN ('signup')
            ORDER BY ts DESC, event_id DESC LIMIT 50
        """,
    }
