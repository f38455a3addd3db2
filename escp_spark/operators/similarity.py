"""Similarity search over an embedding column (array<float>).

- ``ann_bruteforce_topk``: exact cosine top-k — JVM higher-order
  functions (F.zip_with/F.aggregate), no UDF; the correctness baseline.
- ``ann_lsh_topk``: random-hyperplane LSH — deterministic planes
  (seeded numpy, broadcast as literals), sign-bit bucket, search only
  buckets within ``probe_hamming`` of the probe's bucket.
- ``bucketize_embeddings`` + ``ann_lsh_topk_bucketed``: the SCALE path —
  the bucket is materialized once as a Parquet partition column, so a
  query prunes partitions at the scan (PartitionFilters) instead of
  computing n_planes dot products per row per query.
- ``ann_lsh_sql``: the DuckDB oracle for the LSH query — the seeded
  planes are embedded as literals, so the exact candidate set and
  ranking are reproducible in ANSI SQL.

Ranking happens at 4-decimal reporting precision with an id tie-break:
(round(cos, 4) desc, id asc). That makes the top-k cut independent of
floating-point summation order, hence identical across Spark's fold,
numpy's dot, and DuckDB's list_dot_product.

At 100 TB the bruteforce scan is a full pass per probe; bucketed LSH
reads only the matching partitions. Recall is tested against bruteforce
(tests/test_operators).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _cosine(vec_col, probe_lit):
    a = F.col(vec_col).cast("array<double>")
    dot = F.aggregate(F.zip_with(a, probe_lit, lambda x, y: x * y),
                      F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0),
                            lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(probe_lit, lambda x: x * x),
                            F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def _ranked_topk(df: DataFrame, vec_col: str, id_col: str,
                 probe: list[float], k: int) -> DataFrame:
    probe_lit = F.array(*[F.lit(float(x)) for x in probe])
    return (
        df.select(id_col, F.round(_cosine(vec_col, probe_lit), 4).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_bruteforce_topk(df: DataFrame, probe: list[float], k: int = 10,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    return _ranked_topk(df, vec_col, id_col, probe, k)


def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_expr(vec_col: str, planes: np.ndarray):
    """Sign-bit bucket id — Σ 2^i·[vᵢ·p ≥ 0], pure Catalyst: one
    zip_with/aggregate per plane over literal plane vectors."""
    bucket = F.lit(0).cast("long")
    a = F.col(vec_col).cast("array<double>")
    for i, p in enumerate(planes):
        plane_lit = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(F.zip_with(a, plane_lit, lambda x, y: x * y),
                          F.lit(0.0), lambda s, x: s + x)
        bucket = bucket + F.when(dot >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def _probe_bucket(probe: list[float], planes: np.ndarray) -> int:
    p = np.asarray(probe, dtype=np.float64)
    return int(sum(1 << i for i, pl in enumerate(planes) if float(pl @ p) >= 0))


def _near_buckets(probe_bucket: int, n_planes: int, probe_hamming: int) -> list[int]:
    return [
        b for b in range(1 << n_planes)
        if bin(b ^ probe_bucket).count("1") <= probe_hamming
    ]


def ann_lsh_topk(df: DataFrame, probe: list[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 n_planes: int = 8, probe_hamming: int = 2,
                 seed: int = 42) -> DataFrame:
    """LSH-bucketed approximate top-k over an UN-materialized table: scan
    rows whose computed bucket is within ``probe_hamming`` bits of the
    probe's bucket, then exact cosine + top-k inside the candidate set.
    For repeated querying, materialize with ``bucketize_embeddings`` and
    use ``ann_lsh_topk_bucketed`` — that turns this full scan into a
    partition-pruned read."""
    planes = _planes(len(probe), n_planes, seed)
    probe_bucket = _probe_bucket(probe, planes)
    bucketed = df.withColumn("__bucket", lsh_bucket_expr(vec_col, planes))
    near = F.bit_count(
        F.col("__bucket").bitwiseXOR(F.lit(probe_bucket))
    ) <= probe_hamming
    return _ranked_topk(bucketed.filter(near), vec_col, id_col, probe, k)


def bucketize_embeddings(df: DataFrame, out_dir: str,
                         vec_col: str = "embedding", n_planes: int = 8,
                         seed: int = 42) -> str:
    """Materialize the LSH bucket as a Parquet PARTITION column — the
    one-time build step that lets every subsequent ANN query prune
    partitions at the scan instead of computing n_planes dot products
    per row. One shuffle (repartition on bucket) → ≤2^n_planes files."""
    dim = len(df.select(vec_col).first()[0])
    planes = _planes(dim, n_planes, seed)
    (
        df.withColumn("bucket", lsh_bucket_expr(vec_col, planes))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(out_dir)
    )
    return out_dir


def ann_lsh_topk_bucketed(spark: SparkSession, bucketed_dir: str,
                          probe: list[float], k: int = 10,
                          vec_col: str = "embedding", id_col: str = "vec_id",
                          n_planes: int = 8, probe_hamming: int = 2,
                          seed: int = 42, where=None) -> DataFrame:
    """ANN top-k over a ``bucketize_embeddings`` output: the bucket
    membership test becomes ``bucket IN (near buckets)`` on the partition
    column — Spark prunes the non-matching partitions at planning time
    (assert via inputFiles/PartitionFilters in tests)."""
    planes = _planes(len(probe), n_planes, seed)
    near = _near_buckets(_probe_bucket(probe, planes), n_planes, probe_hamming)
    df = spark.read.parquet(bucketed_dir).filter(F.col("bucket").isin(near))
    if where is not None:
        df = df.filter(where)
    return _ranked_topk(df, vec_col, id_col, probe, k)


def ensure_embedding_buckets(spark: SparkSession, sf_dir: str,
                             work_root: str = "/root/repo/.work",
                             n_planes: int = 8, seed: int = 42) -> str:
    """Build (or reuse) the bucketized copy of sf_dir's embeddings table,
    fingerprint-keyed like docindex.ensure_documents_index."""
    from ..sources.tables import input_snapshot_fingerprint

    src = os.path.join(sf_dir, "embeddings.parquet")
    fp = input_snapshot_fingerprint(src)
    out = os.path.join(
        work_root,
        "embbuckets_" + os.path.basename(os.path.normpath(sf_dir)),
    )
    marker = os.path.join(out, "_fingerprint")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == f"{fp}:{n_planes}:{seed}":
                return out
    bucketize_embeddings(
        spark.read.parquet(src), out, n_planes=n_planes, seed=seed
    )
    with open(marker, "w") as fh:
        fh.write(f"{fp}:{n_planes}:{seed}")
    return out


def ann_lsh_sql(dim: int, k: int = 10, n_planes: int = 8,
                probe_hamming: int = 2, seed: int = 42,
                table: str = "embeddings", id_col: str = "vec_id",
                vec_col: str = "embedding", probe_id: int = 0) -> str:
    """DuckDB oracle for the LSH ANN query: identical planes (seeded,
    embedded as literals), identical bucket rule, identical candidate
    set (hamming ≤ probe_hamming) and identical 4-decimal ranking."""
    planes = _planes(dim, n_planes, seed)

    def plane_lit(i: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in planes[i]) + "]::DOUBLE[]"

    def bucket_of(vcol: str) -> str:
        return " + ".join(
            f"(CASE WHEN list_dot_product({vcol}, {plane_lit(i)}) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
            for i in range(n_planes)
        )

    return f"""
        WITH pb AS (
          SELECT {vec_col}::DOUBLE[] AS p, ({bucket_of(f"{vec_col}::DOUBLE[]")}) AS pbucket
          FROM {table} WHERE {id_col} = {probe_id}
        ),
        b AS (
          SELECT {id_col}, {vec_col}::DOUBLE[] AS v,
                 ({bucket_of(f"{vec_col}::DOUBLE[]")}) AS bucket
          FROM {table} WHERE {id_col} <> {probe_id}
        ),
        cand AS (
          SELECT {id_col},
                 round(list_dot_product(v, p)
                       / (sqrt(list_dot_product(v, v))
                          * sqrt(list_dot_product(p, p))), 4) AS cos
          FROM b, pb
          WHERE bit_count(xor(bucket::BIGINT, pbucket::BIGINT)) <= {probe_hamming}
        )
        SELECT {id_col}, cos FROM cand
        ORDER BY cos DESC, {id_col} ASC LIMIT {k}
    """
