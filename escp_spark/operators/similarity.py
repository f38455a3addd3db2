"""Similarity search over an embedding column (array<float>).

- ``ann_bruteforce_topk``: exact cosine top-k — JVM higher-order
  functions (F.zip_with/F.aggregate), no UDF; the correctness baseline.
- ``ann_lsh_topk``: random-hyperplane LSH — deterministic planes
  (seeded numpy, broadcast as literals), sign-bit bucket, search only
  buckets within ``probe_hamming`` of the probe's bucket. The scale
  path: the bucket predicate prunes the scan before any dot products.

At 100 TB the bruteforce scan is a full pass per probe; LSH makes it
|bucket| work. Recall is tested against bruteforce (tests/test_operators).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
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


def ann_bruteforce_topk(df: DataFrame, probe: list[float], k: int = 10,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    probe_lit = F.array(*[F.lit(float(x)) for x in probe])
    return (
        df.select(id_col, _cosine(vec_col, probe_lit).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )


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


def ann_lsh_topk(df: DataFrame, probe: list[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 n_planes: int = 8, probe_hamming: int = 2,
                 seed: int = 42) -> DataFrame:
    """LSH-bucketed approximate top-k: scan only rows whose bucket is
    within ``probe_hamming`` bits of the probe's bucket, then exact
    cosine + top-k inside the candidate set. In a materialized pipeline
    the bucket column is precomputed and partition-pruned."""
    dim = len(probe)
    planes = _planes(dim, n_planes, seed)
    probe_np = np.asarray(probe, dtype=np.float64)
    probe_bucket = int(sum(1 << i for i, p in enumerate(planes)
                           if float(p @ probe_np) >= 0))
    bucketed = df.withColumn("__bucket", lsh_bucket_expr(vec_col, planes))
    near = F.bit_count(
        F.col("__bucket").bitwiseXOR(F.lit(probe_bucket))
    ) <= probe_hamming
    probe_lit = F.array(*[F.lit(float(x)) for x in probe])
    return (
        bucketed.filter(near)
        .select(id_col, _cosine(vec_col, probe_lit).alias("cos"))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
    )
