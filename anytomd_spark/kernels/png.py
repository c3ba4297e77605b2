"""Pure-stdlib PNG codec: zlib inflate + scanline unfilter (decode) and
the inverse filter + deflate (encode, used by tests and the synthetic
media generator).

Scope: baseline non-interlaced 8-bit-per-sample PNGs — grayscale (color
type 0), RGB (2), palette (3, expanded to RGB on decode), gray+alpha
(4), RGBA (6). Interlaced (Adam7) and 1/2/4/16-bit images raise
:class:`PngError` — the honest "unsupported, fail loudly" path, not a
wrong answer.

This makes the multimodal image path REAL for PNG (the reference treats
images as opaque bytes + an optional describer hook,
src/converter/image.rs:41-146 — decoding exceeds reference scope but is
first-class for a training-data pipeline). Performance shape: decode
runs per-blob inside an Arrow batch (``mapInPandas``); the unfilter hot
paths for filter types 0/1/2 are vectorized with numpy (None/copy,
Sub/per-channel-cumsum, Up/column-cumsum) and only Average/Paeth fall
back to per-byte loops — swap in a native decoder on a real cluster for
those.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


class PngError(ValueError):
    """Malformed or unsupported PNG."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunks(data: bytes):
    if data[:8] != MAGIC:
        raise PngError("bad PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError(f"truncated {ctype!r} chunk")
        # CRC is validated (stdlib zlib.crc32 — the same polynomial PNG
        # uses over type+data)
        crc_bytes = data[pos + 8 + length:pos + 12 + length]
        if len(crc_bytes) != 4:
            raise PngError(f"truncated CRC after {ctype!r} chunk")
        (crc,) = struct.unpack(">I", crc_bytes)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"bad CRC in {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse per-scanline filtering. Stride = width*bpp bytes/row; each
    raw row is 1 filter-type byte + stride bytes."""
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise PngError("IDAT length does not match dimensions")
    out = np.zeros((height, stride), dtype=np.uint8)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    for y in range(height):
        ft = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:  # None
            out[y] = cur.astype(np.uint8)
        elif ft == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp] -> prefix
            # sum per channel lane (mod 256 via uint8 overflow)
            lanes = cur.reshape(-1, bpp)
            out[y] = (
                np.cumsum(lanes, axis=0, dtype=np.int64) % 256
            ).astype(np.uint8).reshape(-1)
        elif ft == 2:  # Up
            out[y] = ((cur + prev) % 256).astype(np.uint8)
        elif ft == 3:  # Average — left dependency, sequential
            row = out[y]
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(cur[x]) + (left + int(prev[x])) // 2) % 256
        elif ft == 4:  # Paeth — left dependency, sequential
            row = out[y]
            for x in range(stride):
                a = int(row[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(out[y - 1, x - bpp]) if (x >= bpp and y) else 0
                row[x] = (int(cur[x]) + _paeth(a, b, c)) % 256
        else:
            raise PngError(f"unknown filter type {ft}")
    return out.tobytes()


def decode_png(data: bytes) -> dict:
    """Decode a PNG into raw 8-bit samples.

    Returns ``{"width", "height", "channels", "mode", "pixels"}`` with
    ``pixels`` = row-major interleaved samples; palette images are
    expanded to RGB (``channels=3``).
    """
    ihdr = None
    idat = bytearray()
    palette: bytes | None = None
    for ctype, body in _chunks(bytes(data)):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise PngError("missing IHDR")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if width == 0 or height == 0 or width * height > 1 << 26:
        raise PngError(f"unsupported dimensions {width}x{height}")
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace != 0:
        raise PngError("interlaced (Adam7) PNG not supported")
    if bit_depth != 8:
        raise PngError(f"bit depth {bit_depth} not supported (8 only)")
    if color_type not in _CHANNELS:
        raise PngError(f"unknown color type {color_type}")
    if not idat:
        raise PngError("missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from None
    bpp = _CHANNELS[color_type]
    pixels = _unfilter(raw, width, height, bpp)
    channels = bpp
    mode = _MODES[color_type]
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        pal = np.frombuffer(palette.ljust(768, b"\0"), dtype=np.uint8)
        pal = pal[: 3 * 256].reshape(256, 3)
        idx = np.frombuffer(pixels, dtype=np.uint8)
        pixels = pal[idx].tobytes()
        channels, mode = 3, "RGB"
    return {
        "width": width, "height": height, "channels": channels,
        "mode": mode, "pixels": pixels,
    }


# --------------------------------------------------------------------------
# encoder (tests + deterministic synthetic media)
# --------------------------------------------------------------------------

def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + ctype + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _filter_row(ft: int, cur: np.ndarray, prev: np.ndarray, bpp: int) -> bytes:
    """Forward filter (encoder side) — the exact inverse of _unfilter."""
    stride = len(cur)
    if ft == 0:
        return cur.astype(np.uint8).tobytes()
    if ft == 1:
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
        return ((cur - left) % 256).astype(np.uint8).tobytes()
    if ft == 2:
        return ((cur - prev) % 256).astype(np.uint8).tobytes()
    if ft == 3:
        out = bytearray(stride)
        for x in range(stride):
            left = int(cur[x - bpp]) if x >= bpp else 0
            out[x] = (int(cur[x]) - (left + int(prev[x])) // 2) % 256
        return bytes(out)
    if ft == 4:
        out = bytearray(stride)
        for x in range(stride):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            out[x] = (int(cur[x]) - _paeth(a, b, c)) % 256
        return bytes(out)
    raise PngError(f"unknown filter type {ft}")


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    color_type: int = 2,
    palette: bytes | None = None,
    filters: list[int] | int = 0,
) -> bytes:
    """Minimal PNG writer. ``filters`` is one type for all rows or a
    per-row list — tests cycle 0..4 so every decoder unfilter path is
    exercised by round-trip."""
    bpp = _CHANNELS[color_type]
    stride = width * bpp
    if len(pixels) != height * stride:
        raise PngError("pixel buffer does not match dimensions")
    if isinstance(filters, int):
        filters = [filters] * height
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
    raw = bytearray()
    for y in range(height):
        cur = arr[y].astype(np.int32)
        prev = arr[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        raw.append(filters[y])
        raw.extend(_filter_row(filters[y], cur, prev, bpp))
    out = bytearray(MAGIC)
    out += _chunk(
        b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    )
    if color_type == 3:
        if palette is None:
            raise PngError("palette encoding needs a PLTE")
        out += _chunk(b"PLTE", palette)
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)
