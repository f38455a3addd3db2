"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched mapInPandas.

Real decoders exist for the formats a pure-numpy parser can handle
byte-exactly — PPM/PGM (P6/P5), uncompressed 24-bit BMP, and PCM-16 WAV
(``decode_image`` / ``decode_audio`` below, VERDICT r05 next-#6) — so
decode → featurize runs end-to-end with zero native dependencies.
Formats that need compiled codecs (JPEG/PNG/MP4 — PIL/ffmpeg are not in
this container) remain a STUB behind ``_decode_media``: unrecognized
content raises NotImplementedError; tests can instead opt into a
deterministic fake (bytes → md5 → fixed-dim feature vector) with
``fake=True``. Everything Spark-side is real and tested: schema, batch
iteration, partition sizing, UDF signatures, and output shapes — extend
``_decode_media`` with a codec-backed branch and nothing else changes.

Scale notes: media rows are large — keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low for these stages and
``repartition`` by size-classes before decode so one batch of 4K videos
doesn't OOM an executor arrow buffer.
"""

from __future__ import annotations

import hashlib
import struct

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


# --------------------------------------------------------------------------
# Real pure-numpy decoders (no native codec libraries required)
# --------------------------------------------------------------------------

def _ppm_tokens(buf: bytes, n: int, start: int):
    """First ``n`` whitespace-separated PNM header tokens after ``start``
    (comments ``#...\\n`` skipped, per the netpbm spec). Returns (tokens,
    offset one whitespace byte past the last token — where raster data
    begins)."""
    toks, i, cur = [], start, b""
    while len(toks) < n and i < len(buf):
        c = buf[i:i + 1]
        if c == b"#" and not cur:
            while i < len(buf) and buf[i:i + 1] not in (b"\n", b"\r"):
                i += 1
            continue
        if c.isspace():
            if cur:
                toks.append(cur)
                cur = b""
            i += 1
            if len(toks) == n:
                return toks, i
            continue
        cur += c
        i += 1
    raise ValueError("truncated PNM header")


def decode_image(content: bytes) -> np.ndarray:
    """Decode PPM (P6, 8-bit RGB → HxWx3 uint8) / PGM (P5, 8-bit gray →
    HxW uint8) / uncompressed bottom-up 24-bit BI_RGB BMP (→ HxWx3 uint8,
    top-down RGB). Raises NotImplementedError for anything else (the
    declared stub boundary — JPEG/PNG need native codecs)."""
    if content[:2] in (b"P6", b"P5"):
        gray = content[:2] == b"P5"
        (w, h, maxval), off = _ppm_tokens(content, 3, 2)
        w, h, maxval = int(w), int(h), int(maxval)
        if maxval > 255:
            raise NotImplementedError("16-bit PNM not supported")
        n = w * h * (1 if gray else 3)
        raster = np.frombuffer(content, np.uint8, count=n, offset=off)
        return raster.reshape((h, w) if gray else (h, w, 3)).copy()
    if content[:2] == b"BM":
        data_off, = struct.unpack_from("<I", content, 10)
        w, h = struct.unpack_from("<ii", content, 18)
        bpp, = struct.unpack_from("<H", content, 28)
        comp, = struct.unpack_from("<I", content, 30)
        if bpp != 24 or comp != 0:
            raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = ((w * 3 + 3) // 4) * 4
        rows = np.frombuffer(
            content, np.uint8, count=stride * h, offset=data_off
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]  # stored BGR
        return (rgb[::-1] if flip else rgb).copy()
    raise NotImplementedError(
        "unrecognized image format (PPM/PGM/uncompressed-BMP supported "
        "natively; JPEG/PNG need PIL, absent from this container)"
    )


def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM-16 WAV → (samples int16 [n, channels], sample_rate).
    Walks RIFF chunks per the spec; raises NotImplementedError for
    non-PCM encodings (those need ffmpeg)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise NotImplementedError("unrecognized audio format (PCM WAV only)")
    i, fmt, data = 12, None, None
    while i + 8 <= len(content):
        cid = content[i:i + 4]
        size, = struct.unpack_from("<I", content, i + 4)
        body = content[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"WAV format={audio_format} bits={bits}: PCM-16 only"
        )
    samples = np.frombuffer(
        data, np.int16, count=(len(data) // (2 * channels)) * channels
    )
    return samples.reshape(-1, channels).copy(), rate


def _image_features(arr: np.ndarray) -> np.ndarray:
    """Deterministic FEATURE_DIM stats vector from decoded pixels:
    [h, w, channels, mean, std, ch-means(3), 8-bin gray histogram]."""
    a = arr.astype(np.float64)
    if a.ndim == 2:
        a = a[:, :, None]
    ch_means = a.mean(axis=(0, 1))
    ch3 = np.resize(ch_means, 3)
    gray = a.mean(axis=2)
    hist = np.histogram(gray, bins=8, range=(0, 256))[0] / gray.size
    return np.concatenate([
        [arr.shape[0], arr.shape[1], a.shape[2], a.mean(), a.std()],
        ch3, hist,
    ])


def _audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """[n_frames, rate, mean, rms, zero-crossing rate, peak,
    10-bin |amplitude| histogram]."""
    x = samples.astype(np.float64).mean(axis=1)  # mono mixdown
    n = max(x.size, 1)
    zcr = float(np.count_nonzero(np.diff(np.signbit(x)))) / n
    rms = float(np.sqrt(np.mean(x ** 2))) if x.size else 0.0
    hist = np.histogram(np.abs(x), bins=10, range=(0, 32768))[0] / n
    return np.concatenate([
        [samples.shape[0], rate, x.mean() if x.size else 0.0, rms, zcr,
         float(np.abs(x).max()) if x.size else 0.0],
        hist,
    ])


def _decode_media(content: bytes, kind: str, fake: bool):
    if fake:
        # Deterministic fake decode: md5-seeded feature vector. Stable
        # across runs/machines, so pipeline tests can assert exact
        # outputs for formats the native decoders don't cover.
        digest = hashlib.md5(content or b"").digest()
        seed = np.frombuffer(digest, dtype=np.uint32)
        rng = np.random.default_rng(seed)
        return rng.standard_normal(FEATURE_DIM)
    content = content or b""
    if kind == "image":
        return _image_features(decode_image(content))
    if kind == "audio":
        return _audio_features(*decode_audio(content))
    raise NotImplementedError(
        f"no native decoder for kind={kind!r} (video frame extraction "
        "needs ffmpeg; pass fake=True for the deterministic stub)"
    )


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
