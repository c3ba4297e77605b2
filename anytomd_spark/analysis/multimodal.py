"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no decoding libraries, so the decode step is a
deterministic fake behind ``FAKE_DECODE`` (clearly marked; swap in a real
decoder on a cluster with PIL/ffmpeg). Everything Spark-side — schema,
partition-friendly batching, Arrow UDF signatures, batch shapes — is real
and tested.

Design: media rows are (media_id long, kind string, payload binary,
meta struct<width:int, height:int, sample_rate:int, duration_ms:int>).
Feature extraction runs through ``mapInPandas`` so one Arrow batch holds
many blobs and the decoder amortizes per-batch setup; frame sampling and
resizing are expressed as batch transforms over the payload bytes.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "features array<float>, decode_error string"
)

FAKE_DECODE = True  # no image/audio libs in this container


def _fake_features(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic stand-in for a real decode->embed step: seeds a tiny
    PRNG from the payload hash. Replace with PIL/torchvision/ffmpeg on a
    real cluster; the Spark plumbing is identical."""
    seed = zlib.crc32(payload) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32).tolist()


def _real_decode(payload: bytes, kind: str):  # pragma: no cover - stub
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg, not present in this "
        "container — enable on a real cluster and set FAKE_DECODE = False"
    )


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Decode + feature-extract each blob, Arrow batch at a time."""

    def run(iterator):
        for pdf in iterator:
            out_rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                err = None
                try:
                    feats = (
                        _fake_features(payload, dim)
                        if FAKE_DECODE
                        else _real_decode(payload, kind)
                    )
                except NotImplementedError as e:
                    feats, err = [], str(e)
                out_rows.append((
                    int(media_id), kind, len(payload),
                    hashlib.sha256(payload).hexdigest(), feats, err,
                ))
            yield pd.DataFrame(
                out_rows,
                columns=["media_id", "kind", "n_bytes", "sha256",
                         "features", "decode_error"],
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

FRAMES_SCHEMA = (
    "media_id long, frame_idx int, ts_ms int, frame binary, n_bytes long"
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode->resize->encode (no PIL in this
    container): derives width*height/16 printable bytes from the payload
    hash. Swap for a real resampler on a cluster with imaging libs; the
    Spark plumbing (binary in/out, meta rewrite, Arrow batching) is what
    this module actually exercises."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed ^ (width << 16) ^ height)
    idx = rng.integers(0, 62, size=max(16, width * height // 16))
    return "".join(_B62[j] for j in idx).encode("ascii")


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize every image row (other kinds pass through untouched),
    Arrow batch at a time; meta.width/height reflect the new size."""

    def run(iterator):
        for pdf in iterator:
            out = pdf.copy()
            payloads, metas = [], []
            for kind, payload, meta in zip(
                out["kind"], out["payload"], out["meta"]
            ):
                if kind != "image":
                    payloads.append(payload)
                    metas.append(meta)
                    continue
                data = bytes(payload) if payload is not None else b""
                if FAKE_DECODE:
                    resized = _fake_resize(data, width, height)
                else:  # pragma: no cover - needs PIL
                    resized = _real_decode(data, kind)
                meta = dict(meta or {})
                meta["width"], meta["height"] = width, height
                payloads.append(bytearray(resized))
                metas.append(meta)
            out["payload"] = payloads
            out["meta"] = metas
            yield out

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video rows -> one output row per sampled frame at ``every_ms``
    intervals across meta.duration_ms (non-video rows emit nothing).
    Frame extraction itself is the deterministic fake; the exploded
    one-to-many Arrow batch shape is the real contract."""

    def run(iterator):
        for pdf in iterator:
            rows = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                duration = int((meta or {}).get("duration_ms") or 0)
                data = bytes(payload) if payload is not None else b""
                n_frames = max(1, duration // every_ms)
                for i in range(n_frames):
                    ts = i * every_ms
                    if FAKE_DECODE:
                        frame = _fake_frame(data, i)
                    else:  # pragma: no cover - needs ffmpeg
                        frame = _real_decode(data, kind)
                    rows.append((
                        int(media_id), i, ts, bytearray(frame), len(frame)
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "ts_ms", "frame",
                         "n_bytes"],
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def _fake_frame(payload: bytes, frame_idx: int) -> bytes:
    """Deterministic printable frame bytes derived from (payload, idx)."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed + frame_idx)
    idx = rng.integers(0, 62, size=48)
    return "".join(_B62[j] for j in idx).encode("ascii")


_B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"


def media_payloads(n: int = 64, seed: int = 42) -> list[tuple[int, str, bytes]]:
    """Deterministic (media_id, kind, payload) rows shared by the Spark
    media table and the DuckDB oracle. Payloads are printable base62
    bytes so an independent engine can hash them as text — they still
    travel Spark-side as an opaque ``binary`` column."""
    rng = np.random.default_rng(seed)
    kinds = ("image", "audio", "video")
    rows = []
    for i in range(n):
        idx = rng.integers(0, 62, size=64 + (i % 5) * 32)
        payload = "".join(_B62[j] for j in idx).encode("ascii")
        rows.append((i, kinds[i % 3], payload))
    return rows


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (binary column plumbing)."""
    rows = []
    for i, kind, payload in media_payloads(n, seed):
        meta = {
            "width": 64 if kind == "image" else None,
            "height": 64 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 1000 if kind != "image" else None,
        }
        rows.append((i, kind, bytearray(payload), meta))
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    return spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
