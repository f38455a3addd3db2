"""Adapter: the driver's ``documents`` table → a web_pages corpus → index.

The driver's correctness gate runs over ``/root/testdata/sf*/documents``
(doc_id, text, lang, source, n_chars). This module wraps it into the
engine's canonical ``web_pages`` shape (url, warc_ts, html, text, lang),
runs the *real* build pipeline (including html extraction — the html is
generated with the same invertible wrapper, so the byte-identity invariant
is exercised, not bypassed), and caches the published index keyed on the
input fingerprint so repeated driver/bench calls don't rebuild.

urls are ``doc://{doc_id zero-padded to 12}`` so lexicographic url order ==
numeric doc_id order — the engine's (score desc, url asc) tie-break then
matches a SQL oracle's (score desc, doc_id asc).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .analyzer import wrap_html
from .build import build_index
from .sources.tables import input_snapshot_fingerprint, load_manifest

URL_PREFIX = "doc://"


@F.pandas_udf(T.BinaryType())
def _wrap_html_udf(url: pd.Series, text: pd.Series) -> pd.Series:
    return pd.Series(
        [wrap_html(u, t if t is not None else "") for u, t in zip(url, text)]
    )


def url_for_doc_id_expr(doc_id_col):
    return F.concat(
        F.lit(URL_PREFIX), F.lpad(doc_id_col.cast("string"), 12, "0")
    )


def doc_id_from_url_expr(url_col):
    return F.substring(url_col, len(URL_PREFIX) + 1, 12).cast("long")


def documents_as_web_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    url = url_for_doc_id_expr(F.col("doc_id")).alias("url")
    return docs.select(
        url,
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.col("doc_id"))
        ).alias("warc_ts"),
        _wrap_html_udf(url_for_doc_id_expr(F.col("doc_id")), F.col("text")).alias(
            "html"
        ),
        F.col("text"),
        F.col("lang"),
    )


def ensure_documents_index(
    spark: SparkSession,
    sf_dir: str,
    work_root: str = "/root/repo/.work",
    n_buckets: int = 8,
    max_segments: int = 3,
) -> str:
    """Build (or reuse a cached) index over sf_dir's documents table.

    Cache key: the input parquet's fingerprint recorded in the published
    manifest (the Iceberg snapshot-pinning analog) — a changed input
    invalidates and rebuilds.
    """
    src = os.path.join(sf_dir, "documents.parquet")
    fp = input_snapshot_fingerprint(src)
    index_dir = os.path.join(
        work_root, "docindex_" + os.path.basename(os.path.normpath(sf_dir))
    )
    try:
        m = load_manifest(index_dir)
        from .build import INDEX_LAYOUT_VERSION

        if (
            m.get("input_snapshot") == fp
            and m.get("n_buckets") == n_buckets
            and m.get("max_segments") == max_segments
            and m.get("layout_version") == INDEX_LAYOUT_VERSION
        ):
            return index_dir
    except Exception:
        pass
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    build_index(
        spark,
        src,
        index_dir,
        n_buckets=n_buckets,
        max_segments=max_segments,
        n_groups=2,
        pages=documents_as_web_pages(spark, sf_dir),
    )
    return index_dir
