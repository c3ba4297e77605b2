"""PNG codec tests.

The filter-path vectors are HAND-COMPUTED from the PNG spec (RFC 2083
§6.2-6.6), not produced by the sibling encoder — decode(encode(x)) == x
round-trips alone could hide a bug shared by both directions.
"""

import struct
import zlib

import numpy as np
import pytest

from anytomd_spark.kernels.png import (
    MAGIC,
    PngError,
    _chunk,
    decode_png,
    encode_png,
)


def _png(width, height, color_type, raw, palette=None, bit_depth=8,
         interlace=0):
    out = bytearray(MAGIC)
    out += _chunk(b"IHDR", struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace))
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    out += _chunk(b"IDAT", zlib.compress(raw))
    out += _chunk(b"IEND", b"")
    return bytes(out)


class TestHandVectors:
    def test_sub_up_average_grayscale(self):
        # rows: [10,20,30], [15,25,35], [100,200,44]; filters Sub/Up/Avg
        raw = (b"\x01\x0a\x0a\x0a"          # Sub: deltas of 10
               b"\x02\x05\x05\x05"          # Up: +5 over previous row
               b"\x03\x5d\x8a\xb7")         # Avg: hand-computed
        img = decode_png(_png(3, 3, 0, raw))
        assert (img["width"], img["height"], img["channels"]) == (3, 3, 1)
        assert img["mode"] == "L"
        assert list(img["pixels"]) == [10, 20, 30, 15, 25, 35, 100, 200, 44]

    def test_paeth_grayscale(self):
        # row0 [5,10,15] unfiltered; row1 [9,13,20] Paeth-filtered by hand
        raw = b"\x00\x05\x0a\x0f" b"\x04\x04\x03\x05"
        img = decode_png(_png(3, 2, 0, raw))
        assert list(img["pixels"]) == [5, 10, 15, 9, 13, 20]

    def test_sub_rgb_bpp3(self):
        # Sub must look back bpp=3 bytes, not 1: pixels (10,20,30),(40,60,80)
        raw = b"\x01" + bytes([10, 20, 30, 30, 40, 50])
        img = decode_png(_png(2, 1, 2, raw))
        assert img["channels"] == 3 and img["mode"] == "RGB"
        assert list(img["pixels"]) == [10, 20, 30, 40, 60, 80]

    def test_palette_expansion(self):
        pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        raw = b"\x00\x00\x01\x02"
        img = decode_png(_png(3, 1, 3, raw, palette=pal))
        assert img["channels"] == 3 and img["mode"] == "RGB"
        assert list(img["pixels"]) == [255, 0, 0, 0, 255, 0, 0, 0, 255]


class TestRoundTrip:
    @pytest.mark.parametrize("color_type", [0, 2, 4, 6])
    def test_all_filters_all_color_types(self, color_type):
        ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
        rng = np.random.default_rng(color_type + 1)
        w, h = 17, 11
        pixels = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
        filters = [i % 5 for i in range(h)]  # every unfilter path
        data = encode_png(w, h, pixels, color_type=color_type, filters=filters)
        img = decode_png(data)
        assert (img["width"], img["height"], img["channels"]) == (w, h, ch)
        assert img["pixels"] == pixels

    def test_palette_round_trip(self):
        rng = np.random.default_rng(9)
        pal = rng.integers(0, 256, size=24, dtype=np.uint8).tobytes()  # 8 RGB
        idx = rng.integers(0, 8, size=6 * 4, dtype=np.uint8).tobytes()
        data = encode_png(6, 4, idx, color_type=3, palette=pal,
                          filters=[0, 1, 2, 4])
        img = decode_png(data)
        expected = np.frombuffer(pal, np.uint8).reshape(8, 3)[
            np.frombuffer(idx, np.uint8)
        ].tobytes()
        assert img["pixels"] == expected


class TestErrors:
    def test_bad_signature(self):
        with pytest.raises(PngError, match="signature"):
            decode_png(b"NOTAPNG!" + b"\0" * 32)

    def test_bad_crc(self):
        data = bytearray(_png(2, 1, 0, b"\x00\x01\x02"))
        data[-17] ^= 0xFF  # flip a byte inside IDAT body
        with pytest.raises(PngError, match="CRC"):
            decode_png(bytes(data))

    def test_interlaced_rejected(self):
        with pytest.raises(PngError, match="interlaced"):
            decode_png(_png(2, 1, 0, b"\x00\x01\x02", interlace=1))

    def test_16bit_rejected(self):
        with pytest.raises(PngError, match="bit depth"):
            decode_png(_png(2, 1, 0, b"\x00\x00\x01\x00\x02", bit_depth=16))

    def test_truncated_idat(self):
        with pytest.raises(PngError, match="does not match dimensions"):
            decode_png(_png(3, 2, 0, b"\x00\x01\x02\x03"))

    def test_dimension_budget(self):
        # 2^14 x 2^14 = 2^28 > 2^26 sample budget: rejected BEFORE any
        # inflate work (zip-bomb guard, mirrors the ZIP central-dir
        # budget in the OOXML path)
        with pytest.raises(PngError, match="dimensions"):
            decode_png(_png(1 << 14, 1 << 14, 0, b""))

    def test_palette_missing_plte(self):
        with pytest.raises(PngError, match="PLTE"):
            decode_png(_png(1, 1, 3, b"\x00\x00"))

    def test_corrupt_zlib_stream(self):
        out = bytearray(MAGIC)
        out += _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        out += _chunk(b"IDAT", b"\x00not-zlib")
        out += _chunk(b"IEND", b"")
        with pytest.raises(PngError, match="inflate"):
            decode_png(bytes(out))
