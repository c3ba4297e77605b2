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
