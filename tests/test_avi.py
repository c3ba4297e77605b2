"""AVI (RIFF/MJPEG) container tests — byte-level structures hand-built
from the RIFF + AVI spec (not via the sibling writer), then writer
round-trips, generator-truth checks and corruption fuzz."""

import struct

import numpy as np
import pytest

from anytomd_spark.kernels import jpeg
from anytomd_spark.kernels.avi import (
    AviError,
    build_avi_mjpeg,
    decode_avi_frames,
)


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _riff(body: bytes) -> bytes:
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def _avih(w: int, h: int, n: int) -> bytes:
    return _chunk(b"avih", struct.pack(
        "<10I16x", 250_000, 0, 0, 0x10, n, 0, 1, 0, w, h))


def _strh(handler=b"MJPG", scale=1, rate=4, length=1) -> bytes:
    body = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, scale, rate, 0,
                      length, 0, 0, 0)
        + struct.pack("<4h", 0, 0, 0, 0)
    )
    return _chunk(b"strh", body)


def _strf(w: int, h: int) -> bytes:
    return _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0))


def _gray_jpeg(w=8, h=8, val=100) -> bytes:
    px = np.full((h, w), val, np.uint8)
    return jpeg.encode_jpeg(w, h, px.tobytes(), mode="L")


def _hand_avi(frames, scale=1, rate=4, handler=b"MJPG", w=8, h=8):
    hdrl = _list(b"hdrl", _avih(w, h, len(frames)) + _list(
        b"strl", _strh(handler, scale, rate, len(frames)) + _strf(w, h)))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    return _riff(hdrl + movi)


class TestHandBuiltStructures:
    def test_minimal_hand_built_file_decodes(self):
        out = decode_avi_frames(_hand_avi([_gray_jpeg(val=77)]))
        assert (out["width"], out["height"]) == (8, 8)
        assert out["n_frames"] == 1 and out["duration_ms"] == 250
        assert out["frames"][0]["pixels"] == bytes([77]) * 64

    def test_timeline_from_scale_rate(self):
        # 5 fps -> 200 ms per frame
        out = decode_avi_frames(
            _hand_avi([_gray_jpeg()] * 3, scale=1, rate=5))
        assert [f["ts_ms"] for f in out["frames"]] == [0, 200, 400]
        assert out["duration_ms"] == 600
        # non-integral frame duration floors per frame: 3 fps with
        # scale=1 -> 0, 333, 666
        out = decode_avi_frames(
            _hand_avi([_gray_jpeg()] * 3, scale=1, rate=3))
        assert [f["ts_ms"] for f in out["frames"]] == [0, 333, 666]

    def test_00db_chunk_id_accepted(self):
        f = _gray_jpeg(val=5)
        hdrl = _list(b"hdrl", _avih(8, 8, 1) + _list(
            b"strl", _strh(length=1) + _strf(8, 8)))
        movi = _list(b"movi", _chunk(b"00db", f))
        out = decode_avi_frames(_riff(hdrl + movi))
        assert out["n_frames"] == 1

    def test_junk_and_idx1_chunks_skipped(self):
        f = _gray_jpeg(val=9)
        hdrl = _list(b"hdrl", _avih(8, 8, 1) + _list(
            b"strl", _strh(length=1) + _strf(8, 8)))
        movi = _list(b"movi", _chunk(b"00dc", f))
        junk = _chunk(b"JUNK", b"\x00" * 11)
        idx1 = _chunk(b"idx1", b"00dc" + struct.pack("<III", 0x10, 4, len(f)))
        out = decode_avi_frames(_riff(junk + hdrl + movi + idx1))
        assert out["n_frames"] == 1

    def test_odd_size_frame_chunk_is_padded(self):
        # force an odd-length JPEG by appending a comment segment of odd
        # total size before EOI
        f = _gray_jpeg(val=3)
        assert f[-2:] == b"\xff\xd9"
        com = b"\xff\xfe" + struct.pack(">H", 3) + b"x"
        f_odd = f[:-2] + com + b"\xff\xd9"
        if len(f_odd) % 2 == 0:
            f_odd = f[:-2] + b"\xff\xfe" + struct.pack(">H", 4) + b"xy" + b"\xff\xd9"
        assert len(f_odd) % 2 == 1
        out = decode_avi_frames(_hand_avi([f_odd, _gray_jpeg(val=4)]))
        assert out["n_frames"] == 2
        assert out["frames"][1]["pixels"] == bytes([4]) * 64


class TestValidation:
    def test_bad_magic(self):
        with pytest.raises(AviError, match="not a RIFF/AVI"):
            decode_avi_frames(b"RIFX" + b"\x00" * 20)
        with pytest.raises(AviError, match="not a RIFF/AVI"):
            decode_avi_frames(_riff(b"")[:8] + b"WAVE")

    def test_missing_headers(self):
        movi = _list(b"movi", _chunk(b"00dc", _gray_jpeg()))
        with pytest.raises(AviError, match="missing avih"):
            decode_avi_frames(_riff(movi))
        hdrl = _list(b"hdrl", _avih(8, 8, 1))
        with pytest.raises(AviError, match="no MJPG video stream"):
            decode_avi_frames(_riff(hdrl + movi))

    def test_non_mjpg_handler_rejected(self):
        data = _hand_avi([_gray_jpeg()], handler=b"H264")
        with pytest.raises(AviError, match="unsupported video handler"):
            decode_avi_frames(data)

    def test_no_frames(self):
        hdrl = _list(b"hdrl", _avih(8, 8, 0) + _list(
            b"strl", _strh(length=0) + _strf(8, 8)))
        with pytest.raises(AviError, match="no movi frame chunks"):
            decode_avi_frames(_riff(hdrl + _list(b"movi", b"")))

    def test_zero_rate_rejected(self):
        data = _hand_avi([_gray_jpeg()], scale=1, rate=0)
        with pytest.raises(AviError, match="dwScale/dwRate"):
            decode_avi_frames(data)

    def test_frame_size_mismatch_rejected(self):
        data = _hand_avi([_gray_jpeg(8, 8), _gray_jpeg(16, 8)])
        with pytest.raises(AviError, match="!= *stream size|!= \nstream"):
            decode_avi_frames(data)

    def test_corrupt_frame_reports_index(self):
        good = _gray_jpeg()
        bad = good[:20] + b"\x00\x00" + good[22:]
        try:
            decode_avi_frames(_hand_avi([good, bad]))
        except AviError as e:
            assert "frame 1" in str(e)
        else:  # the flip may land somewhere harmless for this layout
            pass

    def test_max_frames_guard(self):
        data = _hand_avi([_gray_jpeg()] * 3)
        with pytest.raises(AviError, match="exceeds max_frames"):
            decode_avi_frames(data, max_frames=2)


class TestWriterRoundTrip:
    def test_block_constant_frames_roundtrip_exactly(self):
        rng = np.random.default_rng(5)
        truths, frames = [], []
        for _ in range(4):
            vals = rng.integers(0, 256, (2, 2), dtype=np.uint8)
            px = np.repeat(np.repeat(vals, 8, 0), 8, 1)
            frames.append(jpeg.encode_jpeg(16, 16, px.tobytes(), mode="L"))
            truths.append(px.tobytes())
        out = decode_avi_frames(build_avi_mjpeg(16, 16, frames, rate=2))
        assert out["n_frames"] == 4 and out["duration_ms"] == 2000
        for f, t in zip(out["frames"], truths):
            assert f["pixels"] == t

    def test_rgb_frames_match_color_formula(self):
        vals = np.array([[[10, 200, 30]]], np.uint8)
        px = np.repeat(np.repeat(vals, 8, 0), 8, 1)
        f = jpeg.encode_jpeg(8, 8, px.tobytes(), mode="RGB")
        out = decode_avi_frames(build_avi_mjpeg(8, 8, [f]))
        want = jpeg.ycbcr_to_rgb(jpeg.rgb_to_ycbcr(px))
        assert out["frames"][0]["pixels"] == np.ascontiguousarray(want).tobytes()

    def test_writer_needs_frames(self):
        with pytest.raises(AviError, match="at least one frame"):
            build_avi_mjpeg(8, 8, [])

    def test_idx1_offsets_point_at_chunks(self):
        frames = [_gray_jpeg(val=v) for v in (1, 2, 3)]
        data = build_avi_mjpeg(8, 8, frames)
        i = data.find(b"idx1")
        (size,) = struct.unpack("<I", data[i + 4:i + 8])
        assert size == 16 * 3
        movi = data.find(b"movi")
        for e in range(3):
            off = i + 8 + 16 * e
            assert data[off:off + 4] == b"00dc"
            flags, rel, sz = struct.unpack("<III", data[off + 4:off + 16])
            assert flags == 0x10
            # offset is relative to the 'movi' fourcc position
            assert data[movi + rel:movi + rel + 4] == b"00dc"
            assert sz == len(frames[e])


class TestGeneratorTruth:
    def test_payloads_decode_to_recorded_truth(self):
        from anytomd_spark.analysis.multimodal import avi_video_payloads
        import hashlib

        for r in avi_video_payloads(12):
            out = decode_avi_frames(r["payload"])
            assert (out["width"], out["height"]) == (r["width"], r["height"])
            assert out["duration_ms"] == r["duration_ms"]
            starts = [f["ts_ms"] for f in out["frames"]]
            for s in r["samples"]:
                import bisect
                j = max(0, bisect.bisect_right(starts, s["ts_ms"]) - 1)
                px = out["frames"][j]["pixels"]
                assert len(px) == s["n_bytes"]
                assert hashlib.sha256(px).hexdigest() == s["sha256"]


class TestCorruptionFuzz:
    def test_truncation_ladder(self):
        data = build_avi_mjpeg(8, 8, [_gray_jpeg()] * 2)
        for cut in range(0, len(data), 7):
            try:
                decode_avi_frames(data[:cut])
            except (AviError, ValueError):
                pass  # never any other exception type

    def test_random_byte_corruption(self):
        rng = np.random.default_rng(11)
        base = build_avi_mjpeg(8, 8, [_gray_jpeg()] * 2)
        for _ in range(300):
            data = bytearray(base)
            for _ in range(rng.integers(1, 6)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                decode_avi_frames(bytes(data))
            except (AviError, ValueError):
                pass

    def test_pure_garbage(self):
        rng = np.random.default_rng(13)
        for n in (0, 1, 8, 12, 64, 500):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            with pytest.raises((AviError, ValueError)):
                decode_avi_frames(b"RIFF" + blob[:4] + b"AVI " + blob)
