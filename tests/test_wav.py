"""WAV decoder tests — byte-level vectors hand-built from the RIFF/PCM
spec (not via the sibling writer), then writer round-trips."""

import struct

import numpy as np
import pytest

from anytomd_spark.kernels.wav import (
    WavError,
    decode_wav,
    encode_wav,
    wav_features,
)


def _riff(chunks: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _fmt(tag=1, channels=1, rate=8000, bits=16) -> bytes:
    block = channels * bits // 8
    body = struct.pack("<HHIIHH", tag, channels, rate, rate * block,
                       block, bits)
    return b"fmt " + struct.pack("<I", len(body)) + body


def _data(payload: bytes) -> bytes:
    return b"data" + struct.pack("<I", len(payload)) + payload


class TestHandVectors:
    def test_16bit_scaling(self):
        pcm = struct.pack("<3h", 0, 16384, -32768)
        w = decode_wav(_riff(_fmt() + _data(pcm)))
        assert w["sample_rate"] == 8000 and w["channels"] == 1
        assert w["n_frames"] == 3
        assert w["samples"][:, 0].tolist() == [0.0, 0.5, -1.0]

    def test_8bit_unsigned_midpoint(self):
        pcm = bytes([128, 255, 0])
        w = decode_wav(_riff(_fmt(bits=8) + _data(pcm)))
        assert w["samples"][:, 0].tolist() == [
            0.0, 127 / 128, -1.0]

    def test_stereo_interleave(self):
        pcm = struct.pack("<4h", 100, -100, 200, -200)
        w = decode_wav(_riff(_fmt(channels=2) + _data(pcm)))
        assert w["n_frames"] == 2 and w["channels"] == 2
        assert w["samples"][0, 0] == 100 / 32768
        assert w["samples"][1, 1] == -200 / 32768

    def test_float32_format(self):
        pcm = struct.pack("<2f", 0.25, -0.75)
        w = decode_wav(_riff(_fmt(tag=3, bits=32) + _data(pcm)))
        assert w["samples"][:, 0].tolist() == [0.25, -0.75]

    def test_extra_chunks_skipped(self):
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        pcm = struct.pack("<1h", 16384)
        w = decode_wav(_riff(extra + _fmt() + _data(pcm)))
        assert w["samples"][0, 0] == 0.5

    def test_odd_chunk_word_alignment(self):
        # a 3-byte chunk is padded to 4; the walker must still find data
        odd = b"junk" + struct.pack("<I", 3) + b"abc\0"
        pcm = struct.pack("<1h", -16384)
        w = decode_wav(_riff(odd + _fmt() + _data(pcm)))
        assert w["samples"][0, 0] == -0.5

    def test_duration(self):
        pcm = struct.pack("<8000h", *([0] * 8000))
        w = decode_wav(_riff(_fmt(rate=8000) + _data(pcm)))
        assert w["duration_ms"] == 1000


class TestErrors:
    def test_not_riff(self):
        with pytest.raises(WavError, match="RIFF"):
            decode_wav(b"OggS" + b"\0" * 40)

    def test_missing_fmt(self):
        with pytest.raises(WavError, match="fmt"):
            decode_wav(_riff(_data(b"\0\0")))

    def test_missing_data(self):
        with pytest.raises(WavError, match="data"):
            decode_wav(_riff(_fmt()))

    def test_compressed_tag_rejected(self):
        with pytest.raises(WavError, match="format tag"):
            decode_wav(_riff(_fmt(tag=85) + _data(b"\0\0")))  # MP3-in-WAV

    def test_zero_rate_rejected(self):
        with pytest.raises(WavError, match="zero"):
            decode_wav(_riff(_fmt(rate=0) + _data(b"\0\0")))


class TestRoundTrip:
    @pytest.mark.parametrize("bits,channels", [(16, 1), (16, 2), (8, 1)])
    def test_encode_decode(self, bits, channels):
        rng = np.random.default_rng(bits + channels)
        s = rng.uniform(-1, 1, size=(300, channels)).astype(np.float32)
        w = decode_wav(encode_wav(s, 16000, bit_depth=bits))
        assert w["n_frames"] == 300 and w["channels"] == channels
        # scale mismatch (x32767 encode, /32768 decode) adds |v|/32768
        # on top of the half-step rounding error
        tol = 1.6 / (1 << (bits - 1))
        assert np.max(np.abs(w["samples"] - s)) <= tol

    def test_features(self):
        s = np.full((100, 1), 0.5, dtype=np.float32)
        f = wav_features(encode_wav(s, 10000))
        assert f["duration_ms"] == 10
        assert abs(f["rms"] - 0.5) < 1e-3
        assert abs(f["peak"] - 0.5) < 1e-3
