"""JPEG codec tests.

Spec-level vectors are HAND-COMPUTED from ITU-T T.81 (canonical Huffman
code assignment, EXTEND, zigzag, byte stuffing) or computed from the
textbook DCT definition with an explicit double loop — not produced by
the sibling encoder, so a bug shared by both directions cannot hide.
Round-trip exactness for 8x8-block-constant images under a flat quant
table is a THEOREM (DC = 8*(v-128) integral, AC quantizes to 0), which
is what makes the generator-ground-truth oracle sound.
"""

import numpy as np
import pytest

from anytomd_spark.kernels.jpeg import (
    AC_LUM_BITS,
    AC_LUM_VALS,
    DC_LUM_BITS,
    DC_LUM_VALS,
    MAGIC,
    ZIGZAG,
    JpegError,
    _BitReader,
    _BitWriter,
    _extend,
    _fdct_blocks,
    _idct_blocks,
    build_huffman,
    decode_jpeg,
    encode_jpeg,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


class TestSpecVectors:
    def test_zigzag_is_a_permutation_with_known_entries(self):
        assert sorted(ZIGZAG) == list(range(64))
        # T.81 Figure A.6 first diagonal walk: 0,1,8,16,9,2,3,10
        assert ZIGZAG[:8] == (0, 1, 8, 16, 9, 2, 3, 10)
        assert ZIGZAG[63] == 63

    def test_canonical_huffman_assignment(self):
        # DC luminance (Annex K.3.1): one 2-bit code, five 3-bit codes...
        t = build_huffman(DC_LUM_BITS, DC_LUM_VALS)
        inv = {v: k for k, v in t.items()}
        assert inv[0] == (2, 0b00)
        assert inv[1] == (3, 0b010)
        assert inv[5] == (3, 0b110)
        assert inv[6] == (4, 0b1110)
        assert inv[11] == (9, 0b111111110)

    def test_canonical_huffman_ac_first_codes(self):
        t = build_huffman(AC_LUM_BITS, AC_LUM_VALS)
        inv = {v: k for k, v in t.items()}
        # K.3.2: symbols 0x01,0x02 get the two 2-bit codes; EOB (0x00)
        # is the first 4-bit code after 0x03,0x04,0x11 fill length 3/4
        assert inv[0x01] == (2, 0b00)
        assert inv[0x02] == (2, 0b01)
        assert inv[0x03] == (3, 0b100)
        assert inv[0x00] == (4, 0b1010)
        assert inv[0xF0] == (11, 0b11111111001)  # ZRL

    def test_huffman_inconsistent_table_raises(self):
        with pytest.raises(JpegError):
            build_huffman((1,) + (0,) * 15, (0, 1))  # 1 count, 2 vals

    def test_extend(self):
        # T.81 F.2.2.1: category s field maps to +-[2^(s-1), 2^s - 1]
        assert _extend(0, 0) == 0
        assert _extend(0b1, 1) == 1
        assert _extend(0b0, 1) == -1
        assert _extend(0b101, 3) == 5
        assert _extend(0b011, 3) == -4
        assert _extend(0b000, 3) == -7
        assert _extend(0b111111111, 9) == 511

    def test_bit_reader_destuffing(self):
        # 0xFF 0x00 in entropy data is a stuffed 0xFF byte
        r = _BitReader(b"\xab\xff\x00\xcd", 0)
        assert r.read_bits(8) == 0xAB
        assert r.read_bits(8) == 0xFF
        assert r.read_bits(8) == 0xCD

    def test_bit_reader_pads_past_end_with_ones(self):
        r = _BitReader(b"\x00", 0)
        assert r.read_bits(8) == 0
        assert r.read_bits(4) == 0b1111

    def test_bit_writer_stuffs_ff(self):
        w = _BitWriter()
        w.write(0xFF, 8)
        assert bytes(w.out) == b"\xff\x00"

    def test_bit_writer_align_pads_with_ones(self):
        # 0-bit then align: 0 + 1111111 = 0x7F (no stuffing)
        w = _BitWriter()
        w.write(0b0, 1)
        w.align()
        assert bytes(w.out) == b"\x7f"
        # 1-bit then align: 1 + 1111111 = 0xFF, which must be stuffed
        w = _BitWriter()
        w.write(0b1, 1)
        w.align()
        assert bytes(w.out) == b"\xff\x00"

    def test_fdct_matches_textbook_definition(self):
        rng = np.random.default_rng(3)
        blk = rng.integers(0, 256, (8, 8)).astype(np.float64)
        # T.81 A.3.3 with explicit loops (independent of the matrix path)
        ref = np.zeros((8, 8))
        for u in range(8):
            for v in range(8):
                cu = 1 / np.sqrt(2) if u == 0 else 1.0
                cv = 1 / np.sqrt(2) if v == 0 else 1.0
                s = 0.0
                for x in range(8):
                    for y in range(8):
                        s += (blk[x, y] - 128) * np.cos(
                            (2 * x + 1) * u * np.pi / 16
                        ) * np.cos((2 * y + 1) * v * np.pi / 16)
                ref[u, v] = 0.25 * cu * cv * s
        out = _fdct_blocks(blk[None].astype(np.uint8))[0]
        assert np.abs(out - ref).max() < 1e-9

    def test_dct_constant_block_is_dc_only(self):
        blk = np.full((1, 8, 8), 130, np.uint8)
        coefs = _fdct_blocks(blk)[0]
        assert abs(coefs[0, 0] - 16.0) < 1e-9  # 8 * (130 - 128)
        assert np.abs(coefs).sum() - abs(coefs[0, 0]) < 1e-9

    def test_idct_inverts_fdct(self):
        rng = np.random.default_rng(5)
        blk = rng.integers(0, 256, (4, 8, 8)).astype(np.uint8)
        back = _idct_blocks(_fdct_blocks(blk))
        assert (back == blk).all()

    def test_color_convert_hand_vectors(self):
        # pure red/white/black per the JFIF constants, rounded half-up
        px = np.array([[[255, 0, 0], [255, 255, 255], [0, 0, 0]]], np.uint8)
        ycc = rgb_to_ycbcr(px)
        assert ycc[0, 0].tolist() == [76, 85, 255]   # Cr 255.5 clamps
        assert ycc[0, 1].tolist() == [255, 128, 128]
        assert ycc[0, 2].tolist() == [0, 128, 128]
        back = ycbcr_to_rgb(np.array([[[255, 128, 128]]], np.uint8))
        assert back[0, 0].tolist() == [255, 255, 255]


class TestContainer:
    def test_marker_layout(self):
        data = encode_jpeg(8, 8, bytes(64), mode="L")
        assert data[:3] == MAGIC
        assert data[3] == 0xE0 and data[6:11] == b"JFIF\x00"
        assert b"\xff\xdb" in data  # DQT
        assert b"\xff\xc0" in data  # SOF0
        assert b"\xff\xc4" in data  # DHT
        assert b"\xff\xda" in data  # SOS
        assert data[-2:] == b"\xff\xd9"

    def test_bad_signature(self):
        with pytest.raises(JpegError):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")

    def test_progressive_rejected(self):
        data = bytearray(encode_jpeg(8, 8, bytes(64), mode="L"))
        i = bytes(data).index(b"\xff\xc0")
        data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
        with pytest.raises(JpegError, match="SOF"):
            decode_jpeg(bytes(data))

    def test_truncated_segment(self):
        data = encode_jpeg(8, 8, bytes(64), mode="L")
        i = data.index(b"\xff\xc0")
        with pytest.raises(JpegError):
            decode_jpeg(data[:i + 4])

    def test_restart_markers_emitted_and_consumed(self):
        rng = np.random.default_rng(9)
        px = rng.integers(0, 256, (8, 32)).astype(np.uint8)
        data = encode_jpeg(32, 8, px.tobytes(), mode="L", restart_interval=1)
        assert b"\xff\xd0" in data and b"\xff\xd1" in data
        dec = np.frombuffer(decode_jpeg(data)["pixels"], np.uint8)
        assert np.abs(dec.reshape(8, 32).astype(int) - px).max() <= 2

    def test_pixel_buffer_size_mismatch(self):
        with pytest.raises(JpegError):
            encode_jpeg(8, 8, bytes(63), mode="L")


class TestRoundTrip:
    def test_gray_block_constant_exact(self):
        rng = np.random.default_rng(7)
        vals = rng.integers(0, 256, (3, 4), dtype=np.uint8)
        px = np.repeat(np.repeat(vals, 8, 0), 8, 1)
        out = decode_jpeg(encode_jpeg(32, 24, px.tobytes(), mode="L"))
        assert (out["width"], out["height"], out["mode"]) == (32, 24, "L")
        assert np.frombuffer(out["pixels"], np.uint8).reshape(24, 32).tolist() \
            == px.tolist()

    def test_rgb444_block_constant_matches_color_formula(self):
        rng = np.random.default_rng(8)
        vals = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
        px = np.repeat(np.repeat(vals, 8, 0), 8, 1)
        out = decode_jpeg(encode_jpeg(24, 16, px.tobytes(), mode="RGB"))
        exp = ycbcr_to_rgb(rgb_to_ycbcr(px))
        assert out["n_components"] == 3
        dec = np.frombuffer(out["pixels"], np.uint8).reshape(16, 24, 3)
        assert (dec == exp).all()

    def test_rgb420_mcu_constant_exact(self):
        rng = np.random.default_rng(13)
        vals = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
        px = np.repeat(np.repeat(vals, 16, 0), 16, 1)
        data = encode_jpeg(32, 32, px.tobytes(), mode="RGB",
                           subsampling="420")
        dec = np.frombuffer(decode_jpeg(data)["pixels"], np.uint8)
        exp = ycbcr_to_rgb(rgb_to_ycbcr(px))
        assert (dec.reshape(32, 32, 3) == exp).all()

    @pytest.mark.parametrize("w,h", [(11, 13), (8, 8), (17, 9), (40, 16)])
    def test_gray_general_bounded_error(self, w, h):
        rng = np.random.default_rng(w * 100 + h)
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        dec = np.frombuffer(
            decode_jpeg(encode_jpeg(w, h, px.tobytes(), mode="L"))["pixels"],
            np.uint8,
        ).reshape(h, w)
        # flat q=1: per-coefficient rounding error <= 0.5 -> tiny pixel err
        assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2

    def test_rgb_general_bounded_error(self):
        rng = np.random.default_rng(21)
        px = rng.integers(0, 256, (12, 20, 3)).astype(np.uint8)
        dec = np.frombuffer(
            decode_jpeg(encode_jpeg(20, 12, px.tobytes(), mode="RGB"))["pixels"],
            np.uint8,
        ).reshape(12, 20, 3)
        exp = ycbcr_to_rgb(rgb_to_ycbcr(px)).astype(int)
        # DCT stage error (<=2 per YCbCr sample) + color-matrix slope ~2
        assert np.abs(dec.astype(int) - exp).max() <= 5

    def test_fuzz_gray_roundtrip(self):
        rng = np.random.default_rng(0)
        for trial in range(12):
            w = int(rng.integers(1, 30))
            h = int(rng.integers(1, 30))
            px = rng.integers(0, 256, (h, w)).astype(np.uint8)
            ri = int(rng.integers(0, 3))
            data = encode_jpeg(w, h, px.tobytes(), mode="L",
                               restart_interval=ri)
            out = decode_jpeg(data)
            assert (out["width"], out["height"]) == (w, h)
            dec = np.frombuffer(out["pixels"], np.uint8).reshape(h, w)
            assert np.abs(dec.astype(int) - px.astype(int)).max() <= 2


class TestGeneratorGroundTruth:
    def test_payloads_decode_to_recorded_truth(self):
        import hashlib

        from anytomd_spark.analysis.multimodal import jpeg_media_payloads

        for r in jpeg_media_payloads(n=12):
            img = decode_jpeg(r["payload"])
            assert (img["width"], img["height"]) == (r["width"], r["height"])
            assert img["n_components"] == r["n_components"]
            assert hashlib.md5(img["pixels"]).hexdigest() == r["pixel_md5"]
            px = np.frombuffer(img["pixels"], np.uint8)
            assert float(round(float(px.mean()), 6)) == r["mean_lum"]


class TestCorruptionRobustness:
    """A decoder fed crawl data must fail typed (JpegError) on garbage,
    never crash or hang — mirror of the PNG/GIF chaos tests."""

    def test_truncation_ladder(self):
        rng = np.random.default_rng(31)
        px = rng.integers(0, 256, (16, 16)).astype(np.uint8)
        data = encode_jpeg(16, 16, px.tobytes(), mode="L")
        for cut in range(0, len(data), max(1, len(data) // 40)):
            try:
                decode_jpeg(data[:cut])
            except JpegError:
                pass  # typed failure is the contract

    def test_random_byte_corruption(self):
        rng = np.random.default_rng(37)
        px = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
        data = bytearray(encode_jpeg(24, 16, px.tobytes(), mode="RGB"))
        for _ in range(60):
            mut = bytearray(data)
            for _ in range(int(rng.integers(1, 6))):
                mut[int(rng.integers(2, len(mut)))] = int(rng.integers(256))
            try:
                out = decode_jpeg(bytes(mut))
                # decoded despite corruption: output must still be
                # structurally sane, never garbage dimensions
                assert 0 < out["width"] <= 1 << 16
                assert 0 < out["height"] <= 1 << 16
                assert len(out["pixels"]) == (
                    out["width"] * out["height"] * out["n_components"]
                )
            except JpegError:
                pass

    def test_pure_garbage(self):
        rng = np.random.default_rng(41)
        for n in (0, 1, 2, 3, 16, 400):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            with pytest.raises(JpegError):
                decode_jpeg(b"\xff\xd8\xff" + blob[3:] if n >= 3 else blob)
