"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

The real decoders (PIL/ffmpeg/torchaudio) are not in this container, so
the decode step is STUBBED behind ``_decode_media``: by default it raises
NotImplementedError; tests opt into a deterministic fake (bytes → md5 →
fixed-dim feature vector) with ``fake=True``. Everything Spark-side is
real and tested: schema, batch iteration, partition sizing, UDF
signatures, and output shapes — swap ``_decode_media`` for a real decoder
and nothing else changes.

Scale notes: media rows are large — keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low for these stages and
``repartition`` by size-classes before decode so one batch of 4K videos
doesn't OOM an executor arrow buffer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata that needs no decode: byte size + content hash
    (dedup key) — pure Catalyst."""
    return df.withColumn("n_bytes", F.length(content_col)).withColumn(
        "content_md5", F.md5(content_col)
    )


def _decode_media(content: bytes, kind: str, fake: bool):
    if not fake:
        raise NotImplementedError(
            "media decoders (PIL/ffmpeg) are not available in this "
            "environment; pass fake=True for the deterministic stub"
        )
    # Deterministic fake decode: md5-seeded feature vector. Stable across
    # runs/machines, so pipeline tests can assert exact outputs.
    digest = hashlib.md5(content or b"").digest()
    seed = np.frombuffer(digest, dtype=np.uint32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(FEATURE_DIM)


def decode_and_featurize(df: DataFrame, fake: bool = False,
                         batch_size_hint: int = 64) -> DataFrame:
    """binary content → float feature vector, via mapInPandas.

    Output: (media_id, kind, n_bytes, feature array<double>).
    """

    def _run(batches):
        for pdf in batches:
            feats = [
                _decode_media(c, k, fake).tolist()
                for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "content").mapInPandas(
        _run, "media_id long, kind string, n_bytes long, feature array<double>"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  fake: bool = False) -> DataFrame:
    """Video → frame rows (media_id, frame_idx, ts_ms, frame_feature).

    The frame extraction itself is the stubbed decode; the explode-style
    fan-out (one input row → duration/every_ms output rows) and its
    schema are real.
    """

    def _run(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_feature": []}
            for mid, content, dur in zip(
                pdf["media_id"], pdf["content"], pdf["duration_ms"]
            ):
                n_frames = max(int((dur or 0) // every_ms), 0)
                for i in range(n_frames):
                    f = _decode_media(
                        (content or b"") + i.to_bytes(4, "little"), "frame", fake
                    )
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_feature"].append(f.tolist())
            yield pd.DataFrame(out)

    return df.filter(F.col("kind") == "video").select(
        "media_id", "content", "duration_ms"
    ).mapInPandas(
        _run,
        "media_id long, frame_idx int, ts_ms int, frame_feature array<double>",
    )
