"""Table layer: sources, index table layout, atomic staged publish.

Production target is Iceberg (the ``web_pages`` corpus and the index
artifact tables); this sandbox image has no Iceberg jars, so the layer
reads/writes plain Parquet directories and reproduces the two Iceberg
properties the engine depends on:

1. **Snapshot pinning** (the scroll's point-in-time view, esscroll.go:154):
   the build records an ``input_snapshot`` fingerprint in its ledger.
2. **Atomic publish** (delay-refresh D3, jobs/escopyjob.go:139-141 +
   183-195): the build writes into a staging layout and a query never sees
   a half-built index because readers resolve everything through a
   manifest pointer that is swapped atomically (os.replace) at the end.

When Iceberg jars are present (``spark.sql.catalog.*`` configured), the
same calls go through ``spark.read.format("iceberg")`` — gated behind an
import/config check, never assumed.
"""

from __future__ import annotations

import json
import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

MANIFEST_NAME = "_manifest.json"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        return bool(spark.conf.get("spark.sql.catalog.spark_catalog", None))
    except Exception:
        return False


def read_web_pages(spark: SparkSession, source: str) -> DataFrame:
    """Scan the corpus (S1 analog, esscroll.go:71-194). ``source`` is a
    parquet path (sandbox) or an Iceberg table identifier (production)."""
    if not source.endswith(".parquet") and _iceberg_available(spark):
        return spark.read.format("iceberg").load(source)
    return spark.read.parquet(source)


class IndexLayout:
    """Directory layout of one index build.

    index_dir/
      staging/<build_id>/postings_l0/   per-bucket level-0 segments
      staging/<build_id>/...            intermediate artifacts
      postings/                         published merged postings
      docmap/                           published docid↔url map
      dictionary/                       published term → df/cf
      ledger/                           checkpoint ledger (append-only parquet)
      _manifest.json                    atomic pointer + stats (publish gate)
    """

    def __init__(self, index_dir: str, build_id: str = "build0"):
        self.root = index_dir
        self.build_id = build_id
        self.staging = os.path.join(index_dir, "staging", build_id)
        self.postings_l0 = os.path.join(self.staging, "postings_l0")
        self.postings = os.path.join(index_dir, "postings")
        self.docmap = os.path.join(index_dir, "docmap")
        self.dictionary = os.path.join(index_dir, "dictionary")
        self.ledger = os.path.join(index_dir, "ledger")
        self.manifest_path = os.path.join(index_dir, MANIFEST_NAME)

    def ensure_dirs(self):
        for d in (self.root, self.staging, self.ledger):
            os.makedirs(d, exist_ok=True)


def input_snapshot_fingerprint(source: str) -> str:
    """Lineage fingerprint of the input (Iceberg snapshot-id analog):
    path + mtime + total size — enough to detect a changed input on
    resume without scanning data."""
    total, mtime = 0, 0.0
    if os.path.isfile(source):
        st = os.stat(source)
        total, mtime = st.st_size, st.st_mtime
    elif os.path.isdir(source):
        for root, _, files in os.walk(source):
            for f in files:
                st = os.stat(os.path.join(root, f))
                total += st.st_size
                mtime = max(mtime, st.st_mtime)
    return f"{source}|{total}|{int(mtime)}"


def publish_manifest(layout: IndexLayout, stats: dict):
    """Atomic publish: readers only trust an index whose manifest exists
    and whose ``status`` is ``published`` (D3 delay-refresh analog)."""
    import uuid

    doc = {
        "build_id": layout.build_id,
        "status": "published",
        # Publish identity: long-lived readers compare this (via the
        # manifest file's stat signature) and re-resolve their datasets
        # and caches after a republish (finalize/compact overwrite the
        # old files — ADVICE r03).
        "publish_id": uuid.uuid4().hex,
        "published_unix": int(time.time()),
        "paths": {
            "postings": layout.postings,
            "docmap": layout.docmap,
            "dictionary": layout.dictionary,
        },
        **stats,
    }
    fd, tmp = tempfile.mkstemp(dir=layout.root, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(doc, f, indent=1)
    os.replace(tmp, layout.manifest_path)  # atomic on POSIX
    return doc


def load_manifest(index_dir: str) -> dict:
    p = os.path.join(index_dir, MANIFEST_NAME)
    with open(p) as f:
        doc = json.load(f)
    if doc.get("status") != "published":
        raise RuntimeError(f"index at {index_dir} is not published")
    return doc
