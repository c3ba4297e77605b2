"""WebP lossless (VP8L) tests — hand-built bitstreams for every
decoder-only path (transforms, color cache, meta prefix, neighbor
distance codes), encoder round-trips, generator truth, corruption
fuzz. RFC 9649 semantics."""

import struct

import numpy as np
import pytest

from anytomd_spark.kernels import webp
from anytomd_spark.kernels.webp import (
    WebpError,
    _BitReader,
    _BitWriter,
    _cache_key,
    _canonical_codes,
    _channels,
    _emit,
    _huffman_lengths,
    _neighbor_map,
    _pack,
    _plane_code_to_distance,
    _prefix_value,
    _split_prefix_value,
    _write_code,
    _write_entropy_image,
    decode_vp8l,
    decode_webp,
    encode_webp,
)


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


class TestBitIO:
    def test_lsb_first_reader(self):
        br = _BitReader(bytes([0b10110010, 0b01]))
        assert br.read(3) == 0b010
        assert br.read(5) == 0b10110
        assert br.read(2) == 0b01

    def test_writer_reader_roundtrip(self):
        bw = _BitWriter()
        vals = [(0x2F, 8), (99, 14), (5, 3), (1, 1), (12345, 14)]
        for v, n in vals:
            bw.write(v, n)
        br = _BitReader(bw.tobytes())
        for v, n in vals:
            assert br.read(n) == v

    def test_truncation_raises(self):
        br = _BitReader(b"\xff")
        br.read(6)
        with pytest.raises(WebpError, match="truncated"):
            br.read(3)


class TestPrefixCoding:
    def test_canonical_assignment_matches_deflate_rule(self):
        # lengths (2,1,3,3) -> codes: sym1:0, sym0:10, sym2:110, sym3:111
        codes = _canonical_codes([2, 1, 3, 3])
        assert codes[1] == (0b0, 1)
        assert codes[0] == (0b10, 2)
        assert codes[2] == (0b110, 3)
        assert codes[3] == (0b111, 3)

    def test_prefix_value_spec_table(self):
        # codes 0..3 are literals 1..4; above that (2+(c&1))<<eb + extra + 1
        for code, want in ((0, 1), (1, 2), (2, 3), (3, 4)):
            assert _prefix_value(code, _BitReader(b"")) == want
        # code 4: eb=1, offset=4 -> value 5 + extra
        assert _prefix_value(4, _BitReader(bytes([0b1]))) == 6
        assert _prefix_value(5, _BitReader(bytes([0b0]))) == 7
        # code 6: eb=2, offset=8
        assert _prefix_value(6, _BitReader(bytes([0b11]))) == 12

    def test_split_is_inverse_of_prefix_value(self):
        for v in list(range(1, 200)) + [777, 4096]:
            sym, extra, ebits = _split_prefix_value(v)
            bw = _BitWriter()
            bw.write(extra, ebits)
            assert _prefix_value(sym, _BitReader(bw.tobytes() or b"")) == v

    def test_oversubscribed_code_rejected(self):
        bw = _BitWriter()
        _header(bw, 1, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        # simple-form code is always valid; force a broken normal code:
        bw.write(0, 1)       # normal form
        bw.write(0, 4)       # 4 code-length codes
        # order 17,18,0,1 all length 1 -> cl code {17:1,18:1} invalid with 0/1?
        for ln in (1, 1, 1, 1):
            bw.write(ln, 3)
        with pytest.raises(WebpError):
            decode_vp8l(bw.tobytes() + b"\x00" * 8)


class TestNeighborMap:
    def test_window_shape_and_first_entries(self):
        m = _neighbor_map()
        assert len(m) == 120
        # code 1 = pixel above, code 2 = pixel to the left (the two
        # universally-documented entries), then the diagonals
        assert m[0] == (0, 1)
        assert m[1] == (1, 0)
        assert m[2] == (1, 1)
        assert m[3] == (-1, 1)
        assert m[4] == (0, 2)
        assert m[5] == (2, 0)

    def test_sorted_by_euclidean_distance(self):
        m = _neighbor_map()
        d2 = [dx * dx + dy * dy for dx, dy in m]
        assert d2 == sorted(d2)

    def test_plane_code_mapping(self):
        assert _plane_code_to_distance(1, 10) == 10   # above
        assert _plane_code_to_distance(2, 10) == 1    # left
        assert _plane_code_to_distance(121, 10) == 1  # scan-order
        assert _plane_code_to_distance(150, 10) == 30

    def test_minimum_distance_clamped_to_one(self):
        # (-1, 0)-style negatives can't appear, but (dx<0, dy small)
        # with tiny xsize can go <= 0 -> clamp to 1
        assert _plane_code_to_distance(4, 1) >= 1  # (-1,1) at xsize=1


def _build_copy_stream(dist_value, w, h, lits, length=3):
    bw = _BitWriter()
    _header(bw, w, h)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    lsym, lextra, lbits = _split_prefix_value(length)
    g_codes = _write_code(
        bw,
        _huffman_lengths({**{g: 1 for g, _ in lits}, 256 + lsym: 1}),
        256 + 24,
    )
    r_codes = _write_code(bw, _huffman_lengths({r: 1 for _, r in lits}), 256)
    b_codes = _write_code(bw, {0: 1}, 256)
    a_codes = _write_code(bw, {0xFF: 1}, 256)
    dsym, dextra, dbits = _split_prefix_value(dist_value)
    d_codes = _write_code(bw, {dsym: 1}, 40)
    for g, r in lits:
        _emit(bw, g_codes, g)
        _emit(bw, r_codes, r)
        _emit(bw, b_codes, 0)
        _emit(bw, a_codes, 0xFF)
    _emit(bw, g_codes, 256 + lsym)
    bw.write(lextra, lbits)
    _emit(bw, d_codes, dsym)
    bw.write(dextra, dbits)
    return decode_vp8l(bw.tobytes())


class TestHandBuiltStreams:
    def test_lz77_above_code(self):
        out = _build_copy_stream(1, 3, 2, [(10, 1), (20, 2), (30, 3)])
        px = np.frombuffer(out["pixels"], np.uint8).reshape(2, 3, 4)
        assert (px[1] == px[0]).all()

    def test_lz77_left_code_overlapping_run(self):
        out = _build_copy_stream(2, 6, 1, [(10, 1), (20, 2), (30, 3)])
        px = np.frombuffer(out["pixels"], np.uint8).reshape(6, 4)
        for i in (3, 4, 5):
            assert (px[i] == px[2]).all()

    def test_lz77_scan_order_distance(self):
        out = _build_copy_stream(123, 6, 1, [(10, 1), (20, 2), (30, 3)])
        px = np.frombuffer(out["pixels"], np.uint8).reshape(6, 4)
        assert (px[3] == px[0]).all() and (px[5] == px[2]).all()

    def test_color_cache(self):
        p1, p2 = 0xFF102030, 0xFF405060
        cache_bits = 4
        k1, k2 = _cache_key(p1, cache_bits), _cache_key(p2, cache_bits)
        assert k1 != k2
        bw = _BitWriter()
        _header(bw, 4, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(cache_bits, 4)
        bw.write(0, 1)
        gsyms = {0x20: 2, 0x50: 2, 280 + k1: 2, 280 + k2: 2}
        g_codes = _write_code(bw, gsyms, 256 + 24 + (1 << cache_bits))
        r_codes = _write_code(bw, {0x10: 1, 0x40: 1}, 256)
        b_codes = _write_code(bw, {0x30: 1, 0x60: 1}, 256)
        a_codes = _write_code(bw, {0xFF: 1}, 256)
        _write_code(bw, {0: 1}, 40)
        for g, r, b in ((0x20, 0x10, 0x30), (0x50, 0x40, 0x60)):
            _emit(bw, g_codes, g)
            _emit(bw, r_codes, r)
            _emit(bw, b_codes, b)
            _emit(bw, a_codes, 0xFF)
        _emit(bw, g_codes, 280 + k1)
        _emit(bw, g_codes, 280 + k2)
        out = decode_vp8l(bw.tobytes())
        px = np.frombuffer(out["pixels"], np.uint8).reshape(4, 4)
        assert px[2].tolist() == [0x10, 0x20, 0x30, 0xFF]
        assert px[3].tolist() == [0x40, 0x50, 0x60, 0xFF]

    def test_meta_prefix_groups(self):
        w, h = 8, 2
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(0, 3)  # meta_bits = 2 -> 4-pixel blocks, meta image 2x1
        _write_entropy_image(
            bw, np.array([0x000000, 0x000100], np.uint64), level0=False
        )
        for red in (0xAA, 0xBB):
            _write_code(bw, {0: 1}, 256 + 24)
            _write_code(bw, {red: 1}, 256)
            _write_code(bw, {0: 1}, 256)
            _write_code(bw, {0xFF: 1}, 256)
            _write_code(bw, {0: 1}, 40)
        out = decode_vp8l(bw.tobytes())
        px = np.frombuffer(out["pixels"], np.uint8).reshape(h, w, 4)
        assert (px[:, :4, 0] == 0xAA).all()
        assert (px[:, 4:, 0] == 0xBB).all()

    def test_color_indexing_packed(self):
        w, h = 7, 3
        palette = [0xFF112233, 0xFF445566, 0xFF778899]
        rng = np.random.default_rng(4)
        idx = rng.integers(0, 3, (h, w))
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(3, 2)
        bw.write(len(palette) - 1, 8)
        deltas, prev = [], 0
        for c in palette:
            pa, pr, pg, pb = _channels(c)
            qa, qr, qg, qb = _channels(prev)
            deltas.append(_pack((pa - qa) & 0xFF, (pr - qr) & 0xFF,
                                (pg - qg) & 0xFF, (pb - qb) & 0xFF))
            prev = c
        _write_entropy_image(bw, np.array(deltas, np.uint64), level0=False)
        bw.write(0, 1)
        packed_w = (w + 3) >> 2  # 3 colors -> 2-bit indices
        packed = np.zeros(h * packed_w, np.uint64)
        for y in range(h):
            for x in range(w):
                j = y * packed_w + (x >> 2)
                green = (int(packed[j]) >> 8) & 0xFF
                green |= int(idx[y, x]) << ((x & 3) * 2)
                packed[j] = (int(packed[j]) & ~0xFF00) | (green << 8)
        _write_entropy_image(bw, packed, level0=True)
        out = decode_vp8l(bw.tobytes())
        want = np.zeros((h, w, 4), np.uint8)
        for y in range(h):
            for x in range(w):
                a, r, g, b = _channels(palette[idx[y, x]])
                want[y, x] = [r, g, b, a]
        assert out["pixels"] == want.tobytes()

    @pytest.mark.parametrize("mode", list(range(14)))
    def test_predictor_transform_every_mode(self, mode):
        w, h = 5, 4
        rng = np.random.default_rng(mode + 10)
        target = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        argb = (
            (target[:, :, 3].astype(np.uint64) << 24)
            | (target[:, :, 0].astype(np.uint64) << 16)
            | (target[:, :, 1].astype(np.uint64) << 8)
            | target[:, :, 2]
        )
        res = np.zeros((h, w), np.uint64)
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    m = 0
                elif y == 0:
                    m = 1
                elif x == 0:
                    m = 2
                else:
                    m = mode
                l = int(argb[y, x - 1]) if x > 0 else 0
                t = int(argb[y - 1, x]) if y > 0 else 0
                tl = int(argb[y - 1, x - 1]) if x > 0 and y > 0 else 0
                if y > 0:
                    tr = (int(argb[y - 1, x + 1]) if x < w - 1
                          else int(argb[y, 0]))
                else:
                    tr = 0
                pred = webp._predict(m, l, t, tr, tl)
                ta, trr, tg, tb = _channels(int(argb[y, x]))
                pa, pr, pg, pb = _channels(pred)
                res[y, x] = _pack((ta - pa) & 0xFF, (trr - pr) & 0xFF,
                                  (tg - pg) & 0xFF, (tb - pb) & 0xFF)
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(3 - 2, 3)  # 8x8 block: whole image one mode
        _write_entropy_image(bw, np.array([mode << 8], np.uint64),
                             level0=False)
        bw.write(0, 1)
        _write_entropy_image(bw, res.reshape(-1), level0=True)
        out = decode_vp8l(bw.tobytes())
        assert out["pixels"] == target.tobytes()

    def test_color_transform(self):
        cte = _pack(0, 0x05, 0x10, 0xF0)
        rng = np.random.default_rng(9)
        tgt = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
        d = webp._ct_delta
        res = np.zeros(16, np.uint64)
        for j in range(16):
            y, x = divmod(j, 4)
            r, g, b, a = (int(v) for v in tgt[y, x])
            er = (r - d(0xF0, g)) & 0xFF
            eb = (b - d(0x10, g) - d(0x05, r)) & 0xFF
            res[j] = _pack(a, er, g, eb)
        bw = _BitWriter()
        _header(bw, 4, 4)
        bw.write(1, 1)
        bw.write(1, 2)
        bw.write(3 - 2, 3)
        _write_entropy_image(bw, np.array([cte], np.uint64), level0=False)
        bw.write(0, 1)
        _write_entropy_image(bw, res, level0=True)
        out = decode_vp8l(bw.tobytes())
        assert out["pixels"] == tgt.tobytes()

    def test_ct_delta_signed_semantics(self):
        assert webp._ct_delta(0xF0, 0x40) == (-16 * 64) >> 5  # -32
        assert webp._ct_delta(0x10, 0x90) == (16 * -112) >> 5
        assert webp._ct_delta(0x7F, 0x7F) == (127 * 127) >> 5


class TestEncoderRoundTrip:
    @pytest.mark.parametrize("sg", [False, True])
    @pytest.mark.parametrize("wh", [(1, 1), (3, 2), (8, 8), (17, 5)])
    def test_random_rgba(self, wh, sg):
        w, h = wh
        rng = np.random.default_rng(w * 31 + h + sg)
        px = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        out = decode_webp(encode_webp(w, h, px.tobytes(), subtract_green=sg))
        assert out["pixels"] == px.tobytes()
        assert (out["width"], out["height"], out["channels"]) == (w, h, 4)

    def test_run_image_uses_lz77_and_shrinks(self):
        # one color per row: 32 long runs; without LZ77 every pixel
        # costs green+red+blue bits, with LZ77 each row is one literal
        # plus one copy token. (A fully-constant image is NOT a good
        # case: single-symbol codes already cost 0 data bits there.)
        rng = np.random.default_rng(3)
        rows = rng.integers(0, 256, (32, 1, 4), dtype=np.uint8)
        px = np.repeat(rows, 32, axis=1)
        with_runs = encode_webp(32, 32, px.tobytes(), use_lz77=True)
        without = encode_webp(32, 32, px.tobytes(), use_lz77=False)
        assert decode_webp(with_runs)["pixels"] == px.tobytes()
        assert decode_webp(without)["pixels"] == px.tobytes()
        assert len(with_runs) < len(without) / 4

    def test_alpha_hint(self):
        px = np.full((2, 2, 4), 255, np.uint8)
        assert not decode_webp(encode_webp(2, 2, px.tobytes()))["has_alpha"]
        px[0, 0, 3] = 9
        assert decode_webp(encode_webp(2, 2, px.tobytes()))["has_alpha"]


class TestContainer:
    def test_bad_magic(self):
        with pytest.raises(WebpError, match="not a RIFF/WEBP"):
            decode_webp(b"RIFF\x00\x00\x00\x00WAVE")

    def test_lossy_vp8_rejected_loudly(self):
        body = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
        with pytest.raises(WebpError, match="lossy VP8.*libvpx"):
            decode_webp(data)

    def test_vp8x_wrapped_vp8l_found(self):
        px = np.full((2, 2, 4), 7, np.uint8)
        plain = encode_webp(2, 2, px.tobytes())
        vp8l_chunk = plain[12:]
        vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
        data = (b"RIFF"
                + struct.pack("<I", 4 + len(vp8x) + len(vp8l_chunk))
                + b"WEBP" + vp8x + vp8l_chunk)
        assert decode_webp(data)["pixels"] == px.tobytes()

    def test_no_image_chunk(self):
        data = b"RIFF" + struct.pack("<I", 4) + b"WEBP"
        with pytest.raises(WebpError, match="no VP8L chunk"):
            decode_webp(data)

    def test_bad_vp8l_signature(self):
        with pytest.raises(WebpError, match="signature"):
            decode_vp8l(b"\x30\x00\x00\x00\x00")

    def test_nonzero_version_rejected(self):
        bw = _BitWriter()
        bw.write(0x2F, 8)
        bw.write(0, 14)
        bw.write(0, 14)
        bw.write(0, 1)
        bw.write(5, 3)
        with pytest.raises(WebpError, match="version"):
            decode_vp8l(bw.tobytes())


class TestGeneratorTruth:
    def test_payloads_decode_to_recorded_truth(self):
        import hashlib

        from anytomd_spark.analysis.multimodal import webp_media_payloads

        for r in webp_media_payloads(24):
            out = decode_webp(r["payload"])
            assert (out["width"], out["height"]) == (r["width"], r["height"])
            assert out["pixels"] == r["pixels"]
            assert hashlib.md5(out["pixels"]).hexdigest() == r["pixel_md5"]


class TestCorruptionFuzz:
    def test_truncation_ladder(self):
        px = np.arange(64, dtype=np.uint8).reshape(2, 8, 4)
        data = encode_webp(8, 2, px.tobytes())
        for cut in range(len(data)):
            try:
                decode_webp(data[:cut])
            except (WebpError, ValueError):
                pass  # never any other exception type

    def test_random_byte_corruption(self):
        rng = np.random.default_rng(23)
        px = rng.integers(0, 256, (6, 7, 4), dtype=np.uint8)
        base = encode_webp(7, 6, px.tobytes())
        for _ in range(400):
            data = bytearray(base)
            for _ in range(rng.integers(1, 5)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                out = decode_webp(bytes(data))
                assert len(out["pixels"]) == out["width"] * out["height"] * 4
            except (WebpError, ValueError):
                pass

    def test_pure_garbage(self):
        rng = np.random.default_rng(29)
        for n in (0, 4, 20, 100):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            with pytest.raises((WebpError, ValueError)):
                decode_webp(b"RIFF" + blob[:4] + b"WEBP" + blob)

    def test_pixel_budget_guard(self):
        bw = _BitWriter()
        bw.write(0x2F, 8)
        bw.write((1 << 14) - 1, 14)
        bw.write((1 << 14) - 1, 14)
        bw.write(0, 1)
        bw.write(0, 3)
        with pytest.raises(WebpError, match="budget"):
            decode_vp8l(bw.tobytes() + b"\x00" * 64, max_pixels=1 << 20)
