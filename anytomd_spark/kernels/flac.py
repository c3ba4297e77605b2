"""Pure-stdlib FLAC decoder/encoder — the lossless audio companion to
kernels/wav.py, making the audio path real for the format that
dominates real-world audio columns.

Scope (decoder): the full native-FLAC frame layer — 'fLaC' metadata
walk (STREAMINFO required, other blocks skipped), frame headers
(blocking strategy, all block-size/sample-rate/sample-size codes, the
UTF-8-style frame number, CRC-8), every subframe type (CONSTANT,
VERBATIM, FIXED orders 0-4, LPC any order with quantized coefficients
and shift), rice/rice2 residual partitions incl. the raw-bits escape,
wasted-bits shifting, stereo decorrelation (left/side, right/side,
mid/side), and the frame CRC-16. Ogg-FLAC containers raise
:class:`FlacError` — fail loudly, never a wrong answer.

Scope (encoder): STREAMINFO + fixed-blocksize frames choosing per block
between CONSTANT, FIXED order 0-2 with single-partition rice, and
VERBATIM — enough to build deterministic payloads whose decode must be
sample-exact, while exercising the rice and fixed-predictor paths for
real (LPC decode is pinned by hand-built bitstreams in test_flac.py).

All multi-bit fields are big-endian MSB-first (the opposite bit order
of VP8L in kernels/webp.py).
"""

from __future__ import annotations

import struct

import numpy as np


class FlacError(ValueError):
    """Not a FLAC stream or a corrupt/unsupported encoding."""


MAGIC = b"fLaC"

_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}
_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 \
                else (crc << 1) & 0xFFFF
    return crc


class _BitReader:
    """MSB-first bit reader with byte-position access (frame layer is
    byte-aligned between frames)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos * 8

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > len(self.data) * 8:
            raise FlacError("bitstream truncated")
        v = 0
        d = self.data
        for i in range(n):
            v = (v << 1) | ((d[(p + i) >> 3] >> (7 - ((p + i) & 7))) & 1)
        self.pos = p + n
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        p = self.pos
        d = self.data
        nbits = len(d) * 8
        while True:
            if p >= nbits:
                raise FlacError("bitstream truncated in unary run")
            if (d[p >> 3] >> (7 - (p & 7))) & 1:
                self.pos = p + 1
                return q
            q += 1
            p += 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    @property
    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise FlacError("invalid UTF-8-coded frame number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.read(8)
        if c & 0xC0 != 0x80:
            raise FlacError("invalid UTF-8-coded continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _BitReader, block_size: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise FlacError(f"reserved residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = br.read(4)
    if block_size % (1 << po):
        raise FlacError("partition order does not divide block size")
    out: list[int] = []
    part = block_size >> po
    for i in range(1 << po):
        n = part - order if i == 0 else part
        if n < 0:
            raise FlacError("predictor order exceeds first partition")
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = br.read_unary()
                low = br.read(param) if param else 0
                v = (q << param) | low
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise FlacError("subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise FlacError("wasted bits exceed sample size")

    if stype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * block_size
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = stype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4)
        if precision == 15:
            raise FlacError("invalid LPC precision code")
        precision += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise FlacError("negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        samples = list(warm)
        for r in resid:
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise FlacError(f"reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(data: bytes, max_samples: int = 1 << 28) -> dict:
    """Decode a native FLAC stream. Returns ``{"sample_rate",
    "channels", "bit_depth", "n_frames" (total inter-channel samples),
    "duration_ms", "samples"}`` with ``samples`` an int32 array shaped
    (n_frames, channels)."""
    if data[:4] == b"OggS":
        raise FlacError("Ogg-FLAC container unsupported (native FLAC only)")
    if len(data) < 42 or data[:4] != MAGIC:
        raise FlacError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(data):
            raise FlacError("truncated metadata block header")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + blen]
        if len(body) < blen:
            raise FlacError("truncated metadata block body")
        if btype == 0:
            if blen < 34:
                raise FlacError("STREAMINFO too short")
            br = _BitReader(body)
            br.read(16)  # min block size
            br.read(16)  # max block size
            br.read(24)  # min frame size
            br.read(24)  # max frame size
            rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
            info = {"rate": rate, "channels": channels, "bps": bps,
                    "total": total}
        elif btype == 127:
            raise FlacError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise FlacError("missing STREAMINFO")
    if not info["rate"]:
        raise FlacError("sample rate 0 in STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(info["channels"])]
    n_total = 0
    while pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        sync = br.read(14)
        if sync != 0x3FFE:
            raise FlacError(f"bad frame sync at byte {pos}")
        if br.read(1):
            raise FlacError("frame header reserved bit set")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        rate_code = br.read(4)
        ch_code = br.read(4)
        size_code = br.read(3)
        if br.read(1):
            raise FlacError("frame header reserved bit set")
        _read_utf8_number(br)
        if bs_code == 0:
            raise FlacError("reserved block size code 0")
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 0:
            pass
        elif rate_code in _RATE_CODES:
            pass
        elif rate_code == 12:
            br.read(8)
        elif rate_code in (13, 14):
            br.read(16)
        else:
            raise FlacError("invalid sample rate code 15")
        if size_code == 0:
            bps = info["bps"]
        elif size_code in _SIZE_CODES:
            bps = _SIZE_CODES[size_code]
        else:
            raise FlacError(f"reserved sample size code {size_code}")
        br.align()
        header_bytes = data[frame_start:br.byte_pos]
        crc8 = br.read(8)
        if _crc8(header_bytes) != crc8:
            raise FlacError("frame header CRC-8 mismatch")

        if ch_code <= 7:
            n_ch = ch_code + 1
            if n_ch != info["channels"]:
                raise FlacError("frame channel count != STREAMINFO")
            subs = [_decode_subframe(br, block_size, bps)
                    for _ in range(n_ch)]
        elif ch_code in (8, 9, 10):
            if info["channels"] != 2:
                raise FlacError("stereo decorrelation in non-stereo stream")
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                right = [l - s for l, s in zip(left, side)]
                subs = [left, right]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(br, block_size, bps + 1)
                right = _decode_subframe(br, block_size, bps)
                left = [r + s for r, s in zip(right, side)]
                subs = [left, right]
            else:  # mid/side
                mid = _decode_subframe(br, block_size, bps)
                side = _decode_subframe(br, block_size, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m2 = (m << 1) | (s & 1)
                    subs[0].append((m2 + s) >> 1)
                    subs[1].append((m2 - s) >> 1)
        else:
            raise FlacError(f"reserved channel assignment {ch_code}")
        br.align()
        frame_body = data[frame_start:br.byte_pos]
        crc16 = br.read(16)
        if _crc16(frame_body) != crc16:
            raise FlacError("frame CRC-16 mismatch")
        pos = br.byte_pos
        n_total += block_size
        if n_total > max_samples:
            raise FlacError("sample count exceeds budget")
        for c, s in zip(chans, subs):
            c.extend(s)

    if info["total"] and n_total != info["total"]:
        raise FlacError(
            f"decoded {n_total} samples, STREAMINFO declares {info['total']}"
        )
    samples = np.array(chans, np.int32).T if n_total else \
        np.zeros((0, info["channels"]), np.int32)
    return {
        "sample_rate": info["rate"],
        "channels": info["channels"],
        "bit_depth": info["bps"],
        "n_frames": n_total,
        "duration_ms": n_total * 1000 // info["rate"],
        "samples": samples,
    }


def flac_features(data: bytes) -> dict:
    """WAV-features-shaped stats from a FLAC payload (same columns as
    kernels/wav.wav_features, so the two formats can share one oracle
    schema). RMS/peak over samples normalized by 2^(bps-1)."""
    f = decode_flac(data)
    scale = float(1 << (f["bit_depth"] - 1))
    x = f["samples"].astype(np.float64) / scale
    return {
        "sample_rate": f["sample_rate"],
        "channels": f["channels"],
        "bit_depth": f["bit_depth"],
        "n_frames": f["n_frames"],
        "duration_ms": f["duration_ms"],
        "rms": float(round(float(np.sqrt((x ** 2).mean())), 6)) if x.size else 0.0,
        "peak": float(round(float(np.abs(x).max()), 6)) if x.size else 0.0,
    }


# --------------------------------------------------------------------------
# minimal writer
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        self.bits.extend([0] * q)
        self.bits.append(1)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 0x80 >> (i & 7)
        return bytes(out)


def _utf8_number(n: int) -> bytes:
    """FLAC's UTF-8-style number coding: k total bytes carry 5k+1 bits
    (lead byte has k ones then a zero, so 7-k payload bits; each
    continuation byte carries 6)."""
    if n < 0x80:
        return bytes([n])
    for k in range(2, 8):
        if n < (1 << (5 * k + 1)):
            break
    else:
        raise FlacError("frame number too large for UTF-8 coding")
    lead = ((0xFF << (8 - k)) & 0xFF) | (n >> (6 * (k - 1)))
    out = [lead]
    for i in range(k - 2, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def _rice_encode(bw: _BitWriter, values: list[int], param: int) -> None:
    for v in values:
        z = (v << 1) if v >= 0 else ((-v) << 1) - 1  # zigzag
        q, low = z >> param, z & ((1 << param) - 1)
        bw.write_unary(q)
        if param:
            bw.write(low, param)


def _best_rice_param(values: list[int]) -> int:
    if not values:
        return 0
    mean = sum((v << 1) if v >= 0 else ((-v) << 1) - 1 for v in values) \
        / len(values)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def encode_flac(
    samples: "np.ndarray",
    sample_rate: int,
    bit_depth: int = 16,
    block_size: int = 1024,
) -> bytes:
    """Encode int samples shaped (n, channels) as native FLAC with
    independent channels; per block each channel picks CONSTANT, FIXED
    order 0-2 (single-partition rice) or VERBATIM, whichever is
    smallest — lossless by construction."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    n, channels = arr.shape
    if not 1 <= channels <= 8:
        raise FlacError("1-8 channels supported")
    lo, hi = -(1 << (bit_depth - 1)), (1 << (bit_depth - 1)) - 1
    if arr.size and (arr.min() < lo or arr.max() > hi):
        raise FlacError(f"samples exceed {bit_depth}-bit range")

    head = _BitWriter()
    head.write(block_size, 16)
    head.write(block_size, 16)
    head.write(0, 24)
    head.write(0, 24)
    head.write(sample_rate, 20)
    head.write(channels - 1, 3)
    head.write(bit_depth - 1, 5)
    head.write(n, 36)
    streaminfo = head.tobytes() + b"\x00" * 16  # md5 unset (zeros = unknown)
    out = bytearray(MAGIC)
    out += bytes([0x80]) + struct.pack(">I", len(streaminfo))[1:] + streaminfo

    def subframe_bits(chan: list[int]) -> "_BitWriter":
        best = None
        if all(v == chan[0] for v in chan):
            bw = _BitWriter()
            bw.write(0, 1)
            bw.write(0, 6)       # CONSTANT
            bw.write(0, 1)
            bw.write_signed(chan[0], bit_depth)
            return bw
        for order in (0, 1, 2):
            if len(chan) <= order:
                continue
            # FIXED-order residual = order-th difference series
            resid = list(chan)
            for _ in range(order):
                resid = [b - a for a, b in zip(resid, resid[1:])]
            bw = _BitWriter()
            bw.write(0, 1)
            bw.write(8 + order, 6)  # FIXED
            bw.write(0, 1)
            for w in chan[:order]:
                bw.write_signed(w, bit_depth)
            bw.write(0, 2)   # rice method 0
            bw.write(0, 4)   # partition order 0
            param = min(_best_rice_param(resid), 14)
            bw.write(param, 4)
            _rice_encode(bw, resid, param)
            if best is None or len(bw.bits) < len(best.bits):
                best = bw
        vb = _BitWriter()
        vb.write(0, 1)
        vb.write(1, 6)           # VERBATIM
        vb.write(0, 1)
        for v in chan:
            vb.write_signed(v, bit_depth)
        if best is None or len(vb.bits) < len(best.bits):
            best = vb
        return best

    bs_field = None
    for code, size in _BLOCKSIZE_CODES.items():
        if size == block_size:
            bs_field = (code, None)
            break
    if bs_field is None:
        bs_field = (7, block_size - 1)

    frame_no = 0
    for start in range(0, n, block_size):
        block = arr[start:start + block_size]
        bsz = len(block)
        if bsz == block_size:
            code, extra = bs_field
        else:
            code, extra = 7, bsz - 1
        hw = _BitWriter()
        hw.write(0x3FFE, 14)
        hw.write(0, 1)
        hw.write(0, 1)           # fixed blocksize strategy
        hw.write(code, 4)
        hw.write(0, 4)           # rate: from STREAMINFO
        hw.write(channels - 1, 4)
        hw.write(0, 3)           # size: from STREAMINFO
        hw.write(0, 1)
        header = hw.tobytes() + _utf8_number(frame_no)
        if extra is not None:
            header += struct.pack(">H", extra)
        header += bytes([_crc8(header)])
        fw = _BitWriter()
        for c in range(channels):
            sub = subframe_bits([int(v) for v in block[:, c]])
            fw.bits.extend(sub.bits)
        fw.align()
        body = header + fw.tobytes()
        out += body + struct.pack(">H", _crc16(body))
        frame_no += 1
    return bytes(out)
