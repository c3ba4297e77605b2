"""FLAC codec tests — hand-built frames from the format spec for every
decoder-only path (LPC, stereo decorrelation, rice2, escape partitions,
multi-partition residuals, wasted bits, CRC checks), encoder round
trips, generator truth and corruption fuzz."""

import struct

import numpy as np
import pytest

from anytomd_spark.kernels import flac
from anytomd_spark.kernels.flac import (
    MAGIC,
    FlacError,
    _best_rice_param,
    _BitWriter,
    _crc8,
    _crc16,
    _rice_encode,
    _utf8_number,
    decode_flac,
    encode_flac,
    flac_features,
)


def _streaminfo(rate, ch, bps, total, bsz):
    h = _BitWriter()
    h.write(bsz, 16)
    h.write(bsz, 16)
    h.write(0, 24)
    h.write(0, 24)
    h.write(rate, 20)
    h.write(ch - 1, 3)
    h.write(bps - 1, 5)
    h.write(total, 36)
    si = h.tobytes() + b"\x00" * 16
    return MAGIC + bytes([0x80]) + struct.pack(">I", len(si))[1:] + si


def _header(bsz, ch_code, frame_no=0):
    hw = _BitWriter()
    hw.write(0x3FFE, 14)
    hw.write(0, 1)
    hw.write(0, 1)
    hw.write(6, 4)          # 8-bit block size follows
    hw.write(0, 4)          # rate from STREAMINFO
    hw.write(ch_code, 4)
    hw.write(0, 3)          # size from STREAMINFO
    hw.write(0, 1)
    header = hw.tobytes() + _utf8_number(frame_no) + bytes([bsz - 1])
    return header + bytes([_crc8(header)])


def _wrap(streaminfo, header, subframes: _BitWriter):
    subframes.align()
    body = header + subframes.tobytes()
    return streaminfo + body + struct.pack(">H", _crc16(body))


def _verbatim(vals, bits):
    b = _BitWriter()
    b.write(0, 1)
    b.write(1, 6)
    b.write(0, 1)
    for v in vals:
        b.write_signed(v, bits)
    return b


class TestHandBuiltFrames:
    def test_lpc_subframe(self):
        bsz, coefs, shift, prec = 16, [3, -1], 1, 4
        want = [100, 102]
        resid = []
        for i in range(2, bsz):
            pred = (coefs[0] * want[i - 1] + coefs[1] * want[i - 2]) >> shift
            want.append(pred + ((-1) ** i) * (i % 3))
            resid.append(want[i] - pred)
        sw = _BitWriter()
        sw.write(0, 1)
        sw.write(32 + (2 - 1), 6)   # LPC order 2
        sw.write(0, 1)
        sw.write_signed(want[0], 16)
        sw.write_signed(want[1], 16)
        sw.write(prec - 1, 4)
        sw.write_signed(shift, 5)
        for c in coefs:
            sw.write_signed(c, prec)
        sw.write(0, 2)
        sw.write(0, 4)
        p = _best_rice_param(resid)
        sw.write(p, 4)
        _rice_encode(sw, resid, p)
        data = _wrap(_streaminfo(8000, 1, 16, bsz, bsz), _header(bsz, 0), sw)
        assert decode_flac(data)["samples"][:, 0].tolist() == want

    @pytest.mark.parametrize("mode", [8, 9, 10])
    def test_stereo_decorrelation(self, mode):
        left = [10, -5, 1000, 7]
        right = [3, 8, -999, -7]
        side = [l - r for l, r in zip(left, right)]
        if mode == 8:
            chans = [(left, 16), (side, 17)]
        elif mode == 9:
            chans = [(side, 17), (right, 16)]
        else:
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            chans = [(mid, 16), (side, 17)]
        fw = _BitWriter()
        for vals, bits in chans:
            fw.bits.extend(_verbatim(vals, bits).bits)
        data = _wrap(_streaminfo(8000, 2, 16, 4, 4), _header(4, mode), fw)
        out = decode_flac(data)
        assert out["samples"][:, 0].tolist() == left
        assert out["samples"][:, 1].tolist() == right

    def test_rice2_method_and_multiple_partitions(self):
        # order-0 FIXED, partition order 2 -> 4 partitions of 2, rice2
        vals = [5, -3, 12, 0, -1, 7, 2, -8]
        sw = _BitWriter()
        sw.write(0, 1)
        sw.write(8, 6)   # FIXED order 0
        sw.write(0, 1)
        sw.write(1, 2)   # rice2 (5-bit params)
        sw.write(2, 4)   # partition order 2
        for i in range(4):
            part = vals[2 * i:2 * i + 2]
            p = _best_rice_param(part)
            sw.write(p, 5)
            _rice_encode(sw, part, p)
        data = _wrap(_streaminfo(8000, 1, 16, 8, 8), _header(8, 0), sw)
        assert decode_flac(data)["samples"][:, 0].tolist() == vals

    def test_escape_partition_raw_bits(self):
        vals = [1, -2, 3, -4]
        sw = _BitWriter()
        sw.write(0, 1)
        sw.write(8, 6)
        sw.write(0, 1)
        sw.write(0, 2)
        sw.write(0, 4)
        sw.write(15, 4)   # escape
        sw.write(6, 5)    # 6 raw bits per residual
        for v in vals:
            sw.write_signed(v, 6)
        data = _wrap(_streaminfo(8000, 1, 16, 4, 4), _header(4, 0), sw)
        assert decode_flac(data)["samples"][:, 0].tolist() == vals

    def test_wasted_bits_shifted_back(self):
        # samples all multiples of 4 -> 2 wasted bits, constant subframe
        sw = _BitWriter()
        sw.write(0, 1)
        sw.write(0, 6)   # CONSTANT
        sw.write(1, 1)   # wasted-bits flag
        sw.write_unary(1)  # unary 1 -> wasted = 2
        sw.write_signed(25, 14)  # 16 - 2 effective bits
        data = _wrap(_streaminfo(8000, 1, 16, 3, 3), _header(3, 0), sw)
        assert decode_flac(data)["samples"][:, 0].tolist() == [100, 100, 100]

    def test_fixed_order_4(self):
        want = [0, 1, 16, 81, 256, 625, 1296, 2401]  # i^4: order-4 diff = 24
        sw = _BitWriter()
        sw.write(0, 1)
        sw.write(8 + 4, 6)
        sw.write(0, 1)
        for w in want[:4]:
            sw.write_signed(w, 16)
        resid = [24, 24, 24, 24]
        sw.write(0, 2)
        sw.write(0, 4)
        p = _best_rice_param(resid)
        sw.write(p, 4)
        _rice_encode(sw, resid, p)
        data = _wrap(_streaminfo(8000, 1, 16, 8, 8), _header(8, 0), sw)
        got = decode_flac(data)["samples"][:, 0].tolist()
        # verify via the predictor, not np.diff: s[i] = r + 4a-6b+4c-d
        assert got[:4] == want[:4]
        for i in range(4, 8):
            pred = 4 * got[i - 1] - 6 * got[i - 2] + 4 * got[i - 3] - got[i - 4]
            assert got[i] == 24 + pred


class TestValidation:
    def test_bad_magic_and_ogg(self):
        with pytest.raises(FlacError, match="not a FLAC"):
            decode_flac(b"fLaX" + b"\x00" * 50)
        with pytest.raises(FlacError, match="Ogg"):
            decode_flac(b"OggS" + b"\x00" * 50)

    def test_header_crc8_detected(self):
        data = bytearray(encode_flac(np.arange(100, dtype=np.int32), 8000))
        # find the first frame sync (0xFF 0xF8) and corrupt its CRC byte
        i = data.find(b"\xff\xf8", 4)
        assert i > 0
        # header: 4 fixed bytes + utf8(0)=1 byte + (maybe bs bytes) + crc
        data[i + 4] ^= 0xFF
        with pytest.raises(FlacError, match="CRC-8|sync|truncated|reserved|invalid"):
            decode_flac(bytes(data))

    def test_frame_crc16_detected(self):
        x = np.arange(300, dtype=np.int32)
        data = bytearray(encode_flac(x, 8000, block_size=256))
        data[-1] ^= 0x01  # last frame's CRC-16 low byte
        with pytest.raises(FlacError, match="CRC-16"):
            decode_flac(bytes(data))

    def test_streaminfo_total_mismatch(self):
        x = np.arange(64, dtype=np.int32)
        data = encode_flac(x, 8000, block_size=64)
        si = _streaminfo(8000, 1, 16, 999, 64)
        patched = si + data[len(_streaminfo(8000, 1, 16, 64, 64)):]
        with pytest.raises(FlacError, match="declares"):
            decode_flac(patched)

    def test_sample_range_guard(self):
        with pytest.raises(FlacError, match="range"):
            encode_flac(np.array([40000], np.int32), 8000, bit_depth=16)


class TestUtf8Number:
    def test_round_trip_boundaries(self):
        from anytomd_spark.kernels.flac import _BitReader, _read_utf8_number

        for n in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000,
                  (1 << 31) - 1, (1 << 36) - 1):
            br = _BitReader(_utf8_number(n))
            assert _read_utf8_number(br) == n


class TestEncoderRoundTrip:
    @pytest.mark.parametrize("channels", [1, 2, 3])
    @pytest.mark.parametrize("bit_depth", [8, 16, 24])
    def test_random_and_smooth(self, channels, bit_depth):
        rng = np.random.default_rng(channels * 7 + bit_depth)
        lim = 1 << (bit_depth - 2)
        n = 1500
        t = np.arange(n)
        smooth = (lim * np.sin(t / 40)).astype(np.int64)
        noise = rng.integers(-lim, lim, n)
        x = np.stack(
            [smooth if c % 2 == 0 else noise for c in range(channels)], 1
        ).astype(np.int64)
        data = encode_flac(x, 16000, bit_depth=bit_depth, block_size=512)
        out = decode_flac(data)
        assert (out["samples"] == x).all()
        assert out["bit_depth"] == bit_depth
        assert out["channels"] == channels

    def test_compression_on_smooth_signals(self):
        t = np.arange(8000)
        x = (10000 * np.sin(t / 60)).astype(np.int32)
        data = encode_flac(x, 16000)
        assert len(data) < x.size * 2 / 3  # beats raw 16-bit PCM

    def test_partial_final_block(self):
        x = np.arange(1000, dtype=np.int32)  # 1024 block -> partial
        out = decode_flac(encode_flac(x, 8000, block_size=1024))
        assert out["n_frames"] == 1000

    def test_empty_signal(self):
        out = decode_flac(encode_flac(np.zeros((0, 1), np.int32), 8000))
        assert out["n_frames"] == 0

    def test_features_shape_matches_wav(self):
        t = np.arange(4000)
        x = (16384 * np.sin(t / 20)).astype(np.int32)
        f = flac_features(encode_flac(x, 16000))
        assert set(f) == {"sample_rate", "channels", "bit_depth",
                          "n_frames", "duration_ms", "rms", "peak"}
        assert f["duration_ms"] == 250
        assert 0.34 < f["rms"] < 0.36  # amplitude 0.5 sine: rms = 0.5/sqrt(2)


class TestCorruptionFuzz:
    def test_truncation_ladder(self):
        x = np.arange(600, dtype=np.int32)
        data = encode_flac(x, 8000, block_size=256)
        for cut in range(0, len(data), 3):
            try:
                decode_flac(data[:cut])
            except (FlacError, ValueError):
                pass  # never any other exception type

    def test_random_byte_corruption(self):
        rng = np.random.default_rng(43)
        x = (500 * np.sin(np.arange(800) / 9)).astype(np.int32)
        base = encode_flac(x, 8000, block_size=256)
        for _ in range(300):
            data = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
            try:
                decode_flac(bytes(data))
            except (FlacError, ValueError):
                pass

    def test_pure_garbage(self):
        rng = np.random.default_rng(47)
        for n in (0, 8, 40, 300):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            with pytest.raises((FlacError, ValueError)):
                decode_flac(MAGIC + blob)


class TestGeneratorTruth:
    def test_payloads_decode_to_recorded_truth(self):
        from anytomd_spark.analysis.multimodal import flac_media_payloads

        for r in flac_media_payloads(24):
            f = flac_features(r["payload"])
            assert f["sample_rate"] == r["sample_rate"]
            assert f["channels"] == r["channels"]
            assert f["bit_depth"] == r["bit_depth"]
            assert f["n_frames"] == r["n_frames"]
            assert f["duration_ms"] == r["duration_ms"]
            assert f["rms"] == r["rms"]
            assert f["peak"] == r["peak"]
