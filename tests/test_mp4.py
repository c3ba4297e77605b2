"""MP4 / ISO-BMFF tests — hand-built box structures from the spec
(64-bit sizes, co64, multi-entry stsc/stts), writer round-trips,
codec gating, generator truth and corruption fuzz."""

import struct

import numpy as np
import pytest

from anytomd_spark.kernels import jpeg
from anytomd_spark.kernels.mp4 import (
    Mp4Error,
    _box,
    _full,
    build_mp4_mjpeg,
    decode_mp4_frames,
    mp4_info,
)


def _gray_jpeg(w=8, h=8, val=100) -> bytes:
    px = np.full((h, w), val, np.uint8)
    return jpeg.encode_jpeg(w, h, px.tobytes(), mode="L")


class TestWriterRoundTrip:
    def test_block_constant_frames_exact(self):
        rng = np.random.default_rng(3)
        frames, truths = [], []
        for _ in range(4):
            vals = rng.integers(0, 256, (2, 2), dtype=np.uint8)
            px = np.repeat(np.repeat(vals, 8, 0), 8, 1)
            frames.append(jpeg.encode_jpeg(16, 16, px.tobytes(), mode="L"))
            truths.append(px.tobytes())
        out = decode_mp4_frames(build_mp4_mjpeg(16, 16, frames, rate=2))
        assert out["n_frames"] == 4 and out["duration_ms"] == 2000
        assert [f["ts_ms"] for f in out["frames"]] == [0, 500, 1000, 1500]
        for f, t in zip(out["frames"], truths):
            assert f["pixels"] == t

    def test_info_structure(self):
        data = build_mp4_mjpeg(24, 16, [_gray_jpeg(24, 16)] * 3, rate=4)
        info = mp4_info(data)
        assert len(info["tracks"]) == 1
        t = info["tracks"][0]
        assert t["handler"] == "vide" and t["codec"] == "jpeg"
        assert (t["width"], t["height"]) == (24, 16)
        assert t["n_samples"] == 3 and t["duration_ms"] == 750

    def test_stco_offsets_point_at_samples(self):
        frames = [_gray_jpeg(val=v) for v in (1, 2, 3)]
        data = build_mp4_mjpeg(8, 8, frames)
        i = data.find(b"stco")
        (count, off) = struct.unpack(">II", data[i + 8:i + 16])
        assert count == 1
        assert data[off:off + 3] == b"\xff\xd8\xff"  # first JPEG SOI
        assert data[off:off + len(frames[0])] == frames[0]

    def test_writer_needs_frames(self):
        with pytest.raises(Mp4Error, match="at least one frame"):
            build_mp4_mjpeg(8, 8, [])


class TestHandBuiltStructures:
    def test_64bit_box_size_and_co64(self):
        # take a writer file and rewrite mdat with a 64-bit size and
        # stco -> co64 (offsets shift by the 8 extra header bytes)
        frames = [_gray_jpeg(val=7), _gray_jpeg(val=9)]
        data = build_mp4_mjpeg(8, 8, frames)
        ftyp_end = struct.unpack(">I", data[0:4])[0]
        (mdat_size,) = struct.unpack(">I", data[ftyp_end:ftyp_end + 4])
        mdat_body = data[ftyp_end + 8:ftyp_end + mdat_size]
        big_mdat = (struct.pack(">I", 1) + b"mdat"
                    + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body)
        moov = bytearray(data[ftyp_end + mdat_size:])
        i = bytes(moov).find(b"stco")
        (count, off) = struct.unpack(">II", moov[i + 8:i + 16])
        co64 = (struct.pack(">I", 8 + 4 + 4 + 8) + b"co64"
                + b"\x00\x00\x00\x00" + struct.pack(">I", 1)
                + struct.pack(">Q", off + 8))
        # stco box is 8+4+4+4=20 bytes; co64 is 24 -> patch parents
        old_stco = bytes(moov[i - 4:i + 16])
        assert struct.unpack(">I", old_stco[:4])[0] == 20
        new_moov = bytes(moov).replace(old_stco, co64)
        # grow every ancestor box size by 4 (moov, trak, mdia, minf, stbl)
        new_moov = bytearray(new_moov)
        pos = 0
        for cc in (b"moov",):
            (sz,) = struct.unpack(">I", new_moov[0:4])
            new_moov[0:4] = struct.pack(">I", sz + 4)
        for cc in (b"trak", b"mdia", b"minf", b"stbl"):
            j = bytes(new_moov).find(cc)
            (sz,) = struct.unpack(">I", new_moov[j - 4:j])
            new_moov[j - 4:j] = struct.pack(">I", sz + 4)
        patched = data[:ftyp_end] + big_mdat + bytes(new_moov)
        out = decode_mp4_frames(patched)
        assert out["n_frames"] == 2
        assert out["frames"][0]["pixels"] == bytes([7]) * 64
        assert out["frames"][1]["pixels"] == bytes([9]) * 64

    def test_multi_entry_stts(self):
        # 3 frames: first two at delta 250, last at delta 500
        frames = [_gray_jpeg(val=v) for v in (1, 2, 3)]
        data = bytearray(build_mp4_mjpeg(8, 8, frames, rate=4))
        i = bytes(data).find(b"stts")
        old = bytes(data[i - 4:i + 8 + 12])
        new = (struct.pack(">I", 8 + 4 + 4 + 16) + b"stts"
               + b"\x00" * 4 + struct.pack(">I", 2)
               + struct.pack(">II", 2, 250) + struct.pack(">II", 1, 500))
        patched = bytes(data).replace(old, new)
        patched = bytearray(patched)
        for cc in (b"moov",):
            (sz,) = struct.unpack(">I", patched[bytes(patched).find(b"moov") - 4:
                                               bytes(patched).find(b"moov")])
        # fix ancestor sizes (+8)
        for cc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
            j = bytes(patched).find(cc)
            (sz,) = struct.unpack(">I", patched[j - 4:j])
            patched[j - 4:j] = struct.pack(">I", sz + 8)
        out = decode_mp4_frames(bytes(patched))
        assert [f["ts_ms"] for f in out["frames"]] == [0, 250, 500]
        assert out["duration_ms"] == 1000


class TestValidation:
    def test_not_bmff(self):
        with pytest.raises(Mp4Error, match="ftyp"):
            decode_mp4_frames(b"\x00" * 40)
        with pytest.raises(Mp4Error, match="too short|ftyp"):
            mp4_info(b"RIFF1234")

    def test_non_mjpeg_codec_named(self):
        data = bytearray(build_mp4_mjpeg(8, 8, [_gray_jpeg()]))
        i = bytes(data).find(b"jpeg", bytes(data).find(b"stsd"))
        data[i:i + 4] = b"avc1"
        with pytest.raises(Mp4Error, match="'avc1' requires"):
            decode_mp4_frames(bytes(data))
        # structure remains readable
        assert mp4_info(bytes(data))["tracks"][0]["codec"] == "avc1"

    def test_no_video_track(self):
        data = bytearray(build_mp4_mjpeg(8, 8, [_gray_jpeg()]))
        i = bytes(data).find(b"vide")
        data[i:i + 4] = b"soun"
        with pytest.raises(Mp4Error, match="no video track"):
            decode_mp4_frames(bytes(data))

    def test_sample_past_eof(self):
        data = build_mp4_mjpeg(8, 8, [_gray_jpeg()] * 2)
        # moov after mdat: truncating from the mdat tail removes moov
        # entirely -> structure error, so instead inflate stsz
        d = bytearray(data)
        i = bytes(d).find(b"stsz")
        d[i + 16:i + 20] = struct.pack(">I", 1 << 24)  # first sample huge
        with pytest.raises(Mp4Error, match="past file end|overruns"):
            decode_mp4_frames(bytes(d))

    def test_corrupt_frame_reports_index(self):
        good = _gray_jpeg()
        frames = [good, good]
        data = bytearray(build_mp4_mjpeg(8, 8, frames))
        # corrupt the second JPEG's SOF inside mdat
        ftyp_end = struct.unpack(">I", data[0:4])[0]
        second = ftyp_end + 8 + len(good)
        data[second + 2:second + 4] = b"\x00\x00"
        with pytest.raises(Mp4Error, match="frame 1"):
            decode_mp4_frames(bytes(data))


class TestGeneratorTruth:
    def test_payloads_decode_to_recorded_truth(self):
        import bisect
        import hashlib

        from anytomd_spark.analysis.multimodal import mp4_video_payloads

        for r in mp4_video_payloads(12):
            out = decode_mp4_frames(r["payload"])
            assert (out["width"], out["height"]) == (r["width"], r["height"])
            assert out["duration_ms"] == r["duration_ms"]
            starts = [f["ts_ms"] for f in out["frames"]]
            for s in r["samples"]:
                j = max(0, bisect.bisect_right(starts, s["ts_ms"]) - 1)
                px = out["frames"][j]["pixels"]
                assert hashlib.sha256(px).hexdigest() == s["sha256"]


class TestCorruptionFuzz:
    def test_truncation_ladder(self):
        data = build_mp4_mjpeg(8, 8, [_gray_jpeg()] * 2)
        for cut in range(0, len(data), 5):
            try:
                decode_mp4_frames(data[:cut])
            except (Mp4Error, ValueError, struct.error):
                pass  # never any other exception type

    def test_random_byte_corruption(self):
        rng = np.random.default_rng(53)
        base = build_mp4_mjpeg(8, 8, [_gray_jpeg()] * 2)
        for _ in range(300):
            data = bytearray(base)
            for _ in range(rng.integers(1, 5)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                decode_mp4_frames(bytes(data))
            except (Mp4Error, ValueError, struct.error, MemoryError):
                pass

    def test_pure_garbage(self):
        rng = np.random.default_rng(59)
        for n in (0, 8, 60, 400):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            with pytest.raises((Mp4Error, ValueError, struct.error)):
                decode_mp4_frames(struct.pack(">I", 16) + b"ftyp" + blob)
