"""Pure-stdlib WAV (RIFF/PCM) decoder — makes the multimodal AUDIO path
real, like kernels/png.py does for images.

Scope: canonical RIFF WAVE files with PCM (format tag 1) or IEEE-float
(tag 3) sample data, 8/16/32-bit integer or 32-bit float, any channel
count/sample rate. Compressed formats (ADPCM, MP3-in-WAV, ...) raise
:class:`WavError` — fail loudly, never a wrong answer. Chunk walking
tolerates the extra chunks real writers emit (LIST, fact, cue) by
skipping them.
"""

from __future__ import annotations

import struct

import numpy as np


class WavError(ValueError):
    """Not a RIFF/WAVE or unsupported encoding."""


def decode_wav(data: bytes) -> dict:
    """Decode a WAV file into float32 samples in [-1, 1].

    Returns ``{"sample_rate", "channels", "bit_depth", "n_frames",
    "duration_ms", "samples"}`` with ``samples`` shaped
    (n_frames, channels).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if len(body) < size:
                raise WavError("truncated data chunk")
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavError("missing fmt chunk")
    if pcm is None:
        raise WavError("missing data chunk")
    tag, channels, rate, _byte_rate, _align, bits = fmt
    if channels == 0 or rate == 0:
        raise WavError("zero channels or sample rate")
    if tag == 1 and bits in (8, 16, 32):
        dt = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
        raw = np.frombuffer(pcm[: len(pcm) - len(pcm) % (bits // 8)], dt)
        if bits == 8:  # 8-bit WAV is unsigned, midpoint 128
            samples = (raw.astype(np.float32) - 128.0) / 128.0
        else:
            samples = raw.astype(np.float32) / float(1 << (bits - 1))
    elif tag == 3 and bits == 32:
        samples = np.frombuffer(
            pcm[: len(pcm) - len(pcm) % 4], np.dtype("<f4")
        ).astype(np.float32)
    else:
        raise WavError(f"unsupported format tag {tag} / {bits}-bit")
    n_frames = len(samples) // channels
    samples = samples[: n_frames * channels].reshape(n_frames, channels)
    return {
        "sample_rate": rate,
        "channels": channels,
        "bit_depth": bits,
        "n_frames": n_frames,
        "duration_ms": int(round(n_frames * 1000.0 / rate)),
        "samples": samples,
    }


def encode_wav(
    samples: "np.ndarray",
    sample_rate: int,
    bit_depth: int = 16,
) -> bytes:
    """Minimal canonical PCM writer for tests/synthesis. ``samples`` is
    float in [-1, 1], shape (n_frames, channels)."""
    samples = np.asarray(samples, dtype=np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, channels = samples.shape
    if bit_depth == 16:
        pcm = np.clip(np.round(samples * 32767.0), -32768, 32767) \
            .astype("<i2").tobytes()
    elif bit_depth == 8:
        pcm = np.clip(np.round(samples * 127.0) + 128, 0, 255) \
            .astype(np.uint8).tobytes()
    else:
        raise WavError("writer supports 8/16-bit PCM only")
    block = channels * bit_depth // 8
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bit_depth)
    out = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:
        out += b"\0"
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WAVE" + out


def wav_features(data: bytes) -> dict:
    """Decode + shallow audio features: duration, per-file RMS and peak
    over all channels (rounded for cross-engine reproducibility)."""
    w = decode_wav(data)
    s = w["samples"]
    return {
        "sample_rate": w["sample_rate"],
        "channels": w["channels"],
        "bit_depth": w["bit_depth"],
        "n_frames": w["n_frames"],
        "duration_ms": w["duration_ms"],
        "rms": float(round(float(np.sqrt(np.mean(s * s))), 6)) if s.size
        else 0.0,
        "peak": float(round(float(np.max(np.abs(s))), 6)) if s.size else 0.0,
    }
