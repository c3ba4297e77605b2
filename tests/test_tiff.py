"""TIFF decoder tests — hand-built IFDs from the TIFF 6.0 spec (not via
the sibling writer), writer round-trips, hand-built LZW/PackBits
streams, generator truth and corruption fuzz."""

import struct

import numpy as np
import pytest

from anytomd_spark.kernels import tiff
from anytomd_spark.kernels.tiff import (
    TiffError,
    _lzw_decode,
    _unpackbits,
    decode_tiff,
    encode_tiff,
)


def _hand_tiff(entries, payload=b"", endian="<", ifd_off=8):
    """entries: list of (tag, type, count, raw_value_field_4bytes)."""
    magic = tiff.MAGIC_LE if endian == "<" else tiff.MAGIC_BE
    out = bytearray(magic)
    out += struct.pack(endian + "I", ifd_off)
    out += struct.pack(endian + "H", len(entries))
    for tag, typ, count, field in sorted(entries):
        out += struct.pack(endian + "HHI", tag, typ, count) + field
    out += struct.pack(endian + "I", 0)
    out += payload
    return bytes(out)


def _short(endian, v):
    return struct.pack(endian + "H", v).ljust(4, b"\x00")


def _long(endian, v):
    return struct.pack(endian + "I", v)


class TestHandBuiltIFDs:
    def _gray(self, endian):
        px = bytes(range(12))  # 4x3 gray
        hdr = 8 + 2 + 12 * 7 + 4
        entries = [
            (256, 3, 1, _short(endian, 4)),
            (257, 3, 1, _short(endian, 3)),
            (258, 3, 1, _short(endian, 8)),
            (262, 3, 1, _short(endian, 1)),
            (273, 4, 1, _long(endian, hdr)),
            (277, 3, 1, _short(endian, 1)),
            (279, 4, 1, _long(endian, 12)),
        ]
        return _hand_tiff(entries, px, endian), px

    @pytest.mark.parametrize("endian", ["<", ">"])
    def test_gray_both_byte_orders(self, endian):
        data, px = self._gray(endian)
        out = decode_tiff(data)
        assert (out["width"], out["height"], out["channels"]) == (4, 3, 1)
        assert out["pixels"] == px
        assert out["byte_order"] == ("II" if endian == "<" else "MM")

    def test_white_is_zero_inverted(self):
        data, px = self._gray("<")
        # flip photometric to 0 (WhiteIsZero)
        i = data.find(struct.pack("<HHI", 262, 3, 1))
        data = data[:i + 8] + _short("<", 0) + data[i + 12:]
        out = decode_tiff(data)
        assert out["pixels"] == bytes(255 - b for b in px)

    def test_palette_colormap_16bit(self):
        endian = "<"
        idx = bytes([0, 1, 1, 0])  # 2x2
        hdr = 8 + 2 + 12 * 8 + 4
        cmap_off = hdr + 4
        # 3*256 SHORT colormap: entry0 = (0x1100,0x2200,0x3300) -> RGB 11 22 33
        cmap = [0] * (3 * 256)
        cmap[0], cmap[256], cmap[512] = 0x1100, 0x2200, 0x3300
        cmap[1], cmap[257], cmap[513] = 0xAA00, 0xBB00, 0xCC00
        cm_bytes = struct.pack(endian + "768H", *cmap)
        entries = [
            (256, 3, 1, _short(endian, 2)),
            (257, 3, 1, _short(endian, 2)),
            (258, 3, 1, _short(endian, 8)),
            (262, 3, 1, _short(endian, 3)),
            (273, 4, 1, _long(endian, hdr)),
            (277, 3, 1, _short(endian, 1)),
            (279, 4, 1, _long(endian, 4)),
            (320, 3, 768, _long(endian, cmap_off)),
        ]
        data = _hand_tiff(entries, idx + cm_bytes)
        out = decode_tiff(data)
        assert out["channels"] == 3
        px = np.frombuffer(out["pixels"], np.uint8).reshape(2, 2, 3)
        assert px[0, 0].tolist() == [0x11, 0x22, 0x33]
        assert px[0, 1].tolist() == [0xAA, 0xBB, 0xCC]

    def test_unknown_field_types_skipped(self):
        data, px = self._gray("<")
        # append nothing; decoder must tolerate a tag with bogus type 99
        # -> rebuild with an extra entry
        endian = "<"
        hdr = 8 + 2 + 12 * 8 + 4
        entries = [
            (256, 3, 1, _short(endian, 4)),
            (257, 3, 1, _short(endian, 3)),
            (258, 3, 1, _short(endian, 8)),
            (262, 3, 1, _short(endian, 1)),
            (273, 4, 1, _long(endian, hdr)),
            (277, 3, 1, _short(endian, 1)),
            (279, 4, 1, _long(endian, 12)),
            (999, 99, 1, b"\x00\x00\x00\x00"),
        ]
        out = decode_tiff(_hand_tiff(entries, bytes(range(12))))
        assert out["pixels"] == bytes(range(12))


class TestValidation:
    def test_bad_magic(self):
        with pytest.raises(TiffError, match="byte-order magic"):
            decode_tiff(b"XX*\x00" + b"\x00" * 20)
        with pytest.raises(TiffError, match="too short"):
            decode_tiff(b"II*")

    def test_missing_required_tag(self):
        data = _hand_tiff([(256, 3, 1, _short("<", 4))])
        with pytest.raises(TiffError, match="missing required tag 257"):
            decode_tiff(data)

    def test_unsupported_features_fail_loudly(self):
        px = np.zeros((2, 2, 3), np.uint8)
        base = encode_tiff(2, 2, px.tobytes())

        def patched(tag, val):
            i = base.find(struct.pack("<HH", tag, 3))
            return base[:i + 8] + _short("<", val) + base[i + 12:]

        with pytest.raises(TiffError, match="Compression"):
            decode_tiff(patched(259, 7))  # JPEG-in-TIFF
        with pytest.raises(TiffError, match="BitsPerSample"):
            decode_tiff(patched(258, 16))
        # the writer never emits PlanarConfiguration, so hand-build it
        endian = "<"
        hdr = 8 + 2 + 12 * 8 + 4
        entries = [
            (256, 3, 1, _short(endian, 2)),
            (257, 3, 1, _short(endian, 2)),
            (258, 3, 1, _short(endian, 8)),
            (262, 3, 1, _short(endian, 1)),
            (273, 4, 1, _long(endian, hdr)),
            (277, 3, 1, _short(endian, 1)),
            (279, 4, 1, _long(endian, 4)),
            (284, 3, 1, _short(endian, 2)),
        ]
        with pytest.raises(TiffError, match="Planar"):
            decode_tiff(_hand_tiff(entries, b"\x00" * 4))

    def test_strip_past_eof(self):
        px = np.zeros((4, 4, 3), np.uint8)
        data = encode_tiff(4, 4, px.tobytes())
        with pytest.raises(TiffError, match="past file end|short"):
            decode_tiff(data[:-10])


class TestPackBits:
    def test_spec_example(self):
        # the TIFF 6.0 spec's canonical example
        src = bytes([0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA,
                     0x03, 0x80, 0x00, 0x2A, 0x22, 0xF7, 0xAA])
        want = (bytes([0xAA] * 3) + bytes([0x80, 0x00, 0x2A])
                + bytes([0xAA] * 4) + bytes([0x80, 0x00, 0x2A, 0x22])
                + bytes([0xAA] * 10))
        assert _unpackbits(src, len(want)) == want

    def test_noop_128_skipped(self):
        assert _unpackbits(bytes([128, 0x00, 0x41]), 1) == b"A"

    def test_truncated_runs(self):
        with pytest.raises(TiffError, match="truncated"):
            _unpackbits(bytes([0x05, 0x01]), 6)
        with pytest.raises(TiffError, match="truncated"):
            _unpackbits(bytes([0xFE]), 3)


class _LzwWriter:
    def __init__(self):
        self.bits = []

    def put(self, code, width):
        for b in range(width - 1, -1, -1):
            self.bits.append((code >> b) & 1)

    def tobytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (7 - (i & 7))
        return bytes(out)


class TestLzw:
    def test_literals_and_kwkwk(self):
        w = _LzwWriter()
        w.put(256, 9)
        w.put(65, 9)
        w.put(258, 9)  # KwKwK: "AA"
        w.put(257, 9)
        assert _lzw_decode(w.tobytes(), 3) == b"AAA"

    def test_clear_resets_table(self):
        w = _LzwWriter()
        w.put(256, 9)
        w.put(65, 9)
        w.put(66, 9)   # adds 258="AB"
        w.put(256, 9)  # clear
        w.put(67, 9)
        w.put(258, 9)  # after clear 258 is undefined -> KwKwK on "C"
        w.put(257, 9)
        assert _lzw_decode(w.tobytes(), 5) == b"ABCCC"

    def test_early_change_width_bump(self):
        # fill the table to 510 entries so the NEXT read must be 10-bit
        w = _LzwWriter()
        w.put(256, 9)
        # emit 253 distinct literals: table grows 258..510
        seq = [(i * 7 + 1) % 256 for i in range(254)]
        w.put(seq[0], 9)
        for s in seq[1:]:
            w.put(s, 9)
        # table is now 258 + 253 = 511 -> early change: width is 10
        w.put(seq[0], 10)
        w.put(257, 10)
        out = _lzw_decode(w.tobytes(), 255)
        assert out == bytes(seq) + bytes([seq[0]])

    def test_first_code_must_be_literal(self):
        w = _LzwWriter()
        w.put(256, 9)
        w.put(300, 9)
        with pytest.raises(TiffError, match="not a literal"):
            _lzw_decode(w.tobytes(), 2)

    def test_code_beyond_table(self):
        w = _LzwWriter()
        w.put(256, 9)
        w.put(65, 9)
        w.put(300, 9)
        with pytest.raises(TiffError, match="beyond table"):
            _lzw_decode(w.tobytes(), 5)

    def test_lzw_strip_in_full_tiff(self):
        endian = "<"
        w = _LzwWriter()
        w.put(256, 9)
        for b in (10, 20, 30, 10, 20, 30):
            w.put(b, 9)
        w.put(257, 9)
        strip = w.tobytes()
        hdr = 8 + 2 + 12 * 8 + 4
        entries = [
            (256, 3, 1, _short(endian, 3)),
            (257, 3, 1, _short(endian, 2)),
            (258, 3, 1, _short(endian, 8)),
            (259, 3, 1, _short(endian, 5)),
            (262, 3, 1, _short(endian, 1)),
            (273, 4, 1, _long(endian, hdr)),
            (277, 3, 1, _short(endian, 1)),
            (279, 4, 1, _long(endian, len(strip))),
        ]
        out = decode_tiff(_hand_tiff(entries, strip))
        assert out["pixels"] == bytes([10, 20, 30, 10, 20, 30])
        assert out["compression"] == 5


class TestWriterRoundTrip:
    @pytest.mark.parametrize("bo", ["II", "MM"])
    @pytest.mark.parametrize("comp", [1, 32773])
    @pytest.mark.parametrize("ch", [1, 3, 4])
    def test_round_trip(self, bo, comp, ch):
        rng = np.random.default_rng(ch * 5 + comp)
        px = rng.integers(0, 256, (5, 7, ch), dtype=np.uint8)
        for rps in (None, 2):
            data = encode_tiff(7, 5, px.tobytes(), channels=ch,
                               byte_order=bo, compression=comp,
                               rows_per_strip=rps)
            assert decode_tiff(data)["pixels"] == px.tobytes()

    def test_packbits_shrinks_runs(self):
        px = np.zeros((16, 64, 3), np.uint8)
        px[:, 32:] = 255
        a = encode_tiff(64, 16, px.tobytes(), compression=32773)
        b = encode_tiff(64, 16, px.tobytes(), compression=1)
        assert len(a) < len(b) / 5

    def test_writer_validation(self):
        with pytest.raises(TiffError, match="size mismatch"):
            encode_tiff(2, 2, b"\x00" * 5)
        with pytest.raises(TiffError, match="channels"):
            encode_tiff(1, 1, b"\x00\x00", channels=2)
        with pytest.raises(TiffError, match="Compression"):
            encode_tiff(1, 1, b"\x00" * 3, compression=5)


class TestGeneratorTruth:
    def test_payloads_decode_to_recorded_truth(self):
        import hashlib

        from anytomd_spark.analysis.multimodal import tiff_media_payloads

        for r in tiff_media_payloads(24):
            out = decode_tiff(r["payload"])
            assert (out["width"], out["height"]) == (r["width"], r["height"])
            assert out["channels"] == r["channels"]
            assert out["pixels"] == r["pixels"]
            assert hashlib.md5(out["pixels"]).hexdigest() == r["pixel_md5"]


class TestCorruptionFuzz:
    def test_truncation_ladder(self):
        px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        data = encode_tiff(4, 4, px.tobytes(), compression=32773)
        for cut in range(len(data)):
            try:
                decode_tiff(data[:cut])
            except (TiffError, ValueError):
                pass  # never any other exception type

    def test_random_byte_corruption(self):
        rng = np.random.default_rng(31)
        px = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
        base = encode_tiff(5, 4, px.tobytes(), compression=32773,
                           rows_per_strip=2)
        for _ in range(400):
            data = bytearray(base)
            for _ in range(rng.integers(1, 5)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                out = decode_tiff(bytes(data))
                assert (len(out["pixels"])
                        == out["width"] * out["height"] * out["channels"])
            except (TiffError, ValueError, MemoryError):
                pass

    def test_pure_garbage(self):
        rng = np.random.default_rng(37)
        for n in (0, 4, 30, 200):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            with pytest.raises((TiffError, ValueError)):
                decode_tiff(b"II*\x00" + blob)
