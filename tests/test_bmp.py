"""BMP decoder tests — byte-level vectors hand-built from the
BITMAPFILEHEADER/BITMAPINFOHEADER spec (not via the sibling writer),
then writer round-trips, generator-truth checks and corruption fuzz."""

import struct

import numpy as np
import pytest

from anytomd_spark.kernels.bmp import BmpError, decode_bmp, encode_bmp


def _hand_bmp(width, height, bit_count, pixel_rows: bytes,
              palette: bytes = b"", compression=0, hdr_size=40,
              planes=1) -> bytes:
    """Build a BMP byte-for-byte from the spec structs."""
    off = 14 + hdr_size + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", hdr_size, width, height, planes, bit_count,
        compression, len(pixel_rows), 0, 0, len(palette) // 4, 0,
    ) + b"\x00" * (hdr_size - 40)
    hdr = struct.pack("<2sIHHI", b"BM", off + len(pixel_rows), 0, 0, off)
    return hdr + info + palette + pixel_rows


class TestHandVectors:
    def test_24bit_bottom_up_bgr_and_padding(self):
        # 2x2, stride = 8 (2*3 rounded to 4): bottom row written first
        rows = (
            bytes([255, 0, 0, 0, 255, 0]) + b"\x00\x00"   # file row 0 = image bottom
            + bytes([0, 0, 255, 10, 20, 30]) + b"\x00\x00"  # image top
        )
        out = decode_bmp(_hand_bmp(2, 2, 24, rows))
        assert (out["width"], out["height"], out["channels"]) == (2, 2, 3)
        assert not out["top_down"]
        px = np.frombuffer(out["pixels"], np.uint8).reshape(2, 2, 3)
        # BGR in file -> RGB out; bottom-up flipped to top-down
        assert px[0, 0].tolist() == [255, 0, 0]   # file BGR (0,0,255)
        assert px[0, 1].tolist() == [30, 20, 10]
        assert px[1, 0].tolist() == [0, 0, 255]   # file BGR (255,0,0)
        assert px[1, 1].tolist() == [0, 255, 0]

    def test_24bit_top_down_negative_height(self):
        rows = bytes([1, 2, 3, 4, 5, 6]) + b"\x00\x00"
        out = decode_bmp(_hand_bmp(2, -1, 24, rows))
        assert out["top_down"] and out["height"] == 1
        px = np.frombuffer(out["pixels"], np.uint8).reshape(1, 2, 3)
        assert px[0, 0].tolist() == [3, 2, 1]

    def test_8bit_palette_lookup(self):
        pal = bytes([10, 20, 30, 0, 200, 100, 50, 0])  # 2 BGRX quads
        rows = bytes([1, 0]) + b"\x00\x00"  # one row, stride 4
        out = decode_bmp(_hand_bmp(2, 1, 8, rows, palette=pal))
        px = np.frombuffer(out["pixels"], np.uint8).reshape(1, 2, 3)
        assert px[0, 0].tolist() == [50, 100, 200]  # entry 1, BGR->RGB
        assert px[0, 1].tolist() == [30, 20, 10]

    def test_32bit_x_byte_dropped(self):
        rows = bytes([1, 2, 3, 99, 4, 5, 6, 42])  # stride already 8
        out = decode_bmp(_hand_bmp(2, 1, 32, rows))
        px = np.frombuffer(out["pixels"], np.uint8).reshape(1, 2, 3)
        assert px[0, 0].tolist() == [3, 2, 1]
        assert px[0, 1].tolist() == [6, 5, 4]

    def test_v5_header_first_40_bytes_compatible(self):
        rows = bytes([9, 8, 7]) + b"\x00"
        out = decode_bmp(_hand_bmp(1, 1, 24, rows, hdr_size=124))
        assert np.frombuffer(out["pixels"], np.uint8).tolist() == [7, 8, 9]


class TestValidation:
    def test_bad_magic(self):
        with pytest.raises(BmpError, match="not a BMP"):
            decode_bmp(b"PM" + b"\x00" * 60)

    def test_compression_rejected(self):
        rows = bytes([1, 2, 3]) + b"\x00"
        with pytest.raises(BmpError, match="compression"):
            decode_bmp(_hand_bmp(1, 1, 24, rows, compression=1))  # RLE8

    def test_unsupported_depths(self):
        for depth in (1, 4, 16):
            with pytest.raises(BmpError, match="bit depth"):
                decode_bmp(_hand_bmp(1, 1, depth, b"\x00" * 4))

    def test_bad_planes(self):
        with pytest.raises(BmpError, match="planes"):
            decode_bmp(_hand_bmp(1, 1, 24, b"\x00" * 4, planes=2))

    def test_truncated_pixels(self):
        rows = bytes([1, 2, 3]) + b"\x00"
        data = _hand_bmp(1, 2, 24, rows)  # header claims 2 rows
        with pytest.raises(BmpError, match="truncated pixel data"):
            decode_bmp(data)

    def test_palette_index_out_of_range(self):
        pal = bytes([0, 0, 0, 0])  # 1 entry
        rows = bytes([3, 0]) + b"\x00\x00"
        with pytest.raises(BmpError, match="palette index"):
            decode_bmp(_hand_bmp(2, 1, 8, rows, palette=pal))


class TestWriterRoundTrip:
    @pytest.mark.parametrize("top_down", [False, True])
    @pytest.mark.parametrize("w", [1, 2, 3, 4, 5])
    def test_24bit_all_padding_remainders(self, w, top_down):
        rng = np.random.default_rng(w * 2 + top_down)
        px = rng.integers(0, 256, (3, w, 3), dtype=np.uint8)
        out = decode_bmp(encode_bmp(w, 3, px.tobytes(), top_down=top_down))
        assert out["pixels"] == px.tobytes()
        assert out["top_down"] == top_down

    def test_8bit_palette_roundtrip(self):
        rng = np.random.default_rng(2)
        pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
        idx = rng.integers(0, 7, (5, 6), dtype=np.uint8)
        data = encode_bmp(6, 5, idx.tobytes(), bit_count=8,
                          palette=pal.tobytes())
        out = decode_bmp(data)
        assert out["pixels"] == pal[idx].tobytes()
        assert out["bit_count"] == 8

    def test_writer_validation(self):
        with pytest.raises(BmpError, match="size mismatch"):
            encode_bmp(2, 2, b"\x00" * 5)
        with pytest.raises(BmpError, match="palette"):
            encode_bmp(1, 1, b"\x00", bit_count=8)
        with pytest.raises(BmpError, match="index out of range"):
            encode_bmp(1, 1, b"\x05", bit_count=8,
                       palette=bytes(9))
        with pytest.raises(BmpError, match="encode bit depth"):
            encode_bmp(1, 1, b"\x00" * 4, bit_count=32)


class TestGeneratorTruth:
    def test_payloads_decode_to_recorded_truth(self):
        import hashlib

        from anytomd_spark.analysis.multimodal import bmp_media_payloads

        for r in bmp_media_payloads(24):
            out = decode_bmp(r["payload"])
            assert (out["width"], out["height"]) == (r["width"], r["height"])
            assert out["pixels"] == r["pixels"]
            assert hashlib.md5(out["pixels"]).hexdigest() == r["pixel_md5"]


class TestCorruptionFuzz:
    def test_truncation_ladder(self):
        px = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
        data = encode_bmp(4, 3, px.tobytes())
        for cut in range(len(data)):
            try:
                decode_bmp(data[:cut])
            except (BmpError, ValueError):
                pass  # never any other exception type

    def test_random_byte_corruption(self):
        rng = np.random.default_rng(17)
        px = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
        base = encode_bmp(5, 4, px.tobytes())
        for _ in range(400):
            data = bytearray(base)
            for _ in range(rng.integers(1, 5)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                out = decode_bmp(bytes(data))
                # header fields bound the work: dims stay sane
                assert out["width"] * out["height"] * 3 == len(out["pixels"])
            except (BmpError, ValueError, MemoryError):
                pass

    def test_pure_garbage(self):
        rng = np.random.default_rng(19)
        for n in (0, 2, 14, 54, 200):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            with pytest.raises((BmpError, ValueError)):
                decode_bmp(b"BM" + blob)
