"""Pure-stdlib GIF decoder (LZW + palette, GIF87a/89a) and a minimal
writer — the third real image/media codec next to kernels/png.py and
kernels/wav.py.

Decoder scope: full static decode of the FIRST image frame (palette
indices -> RGB; local color table overrides global; Adam-less GIF
interlace supported), frame counting across the file, extension blocks
skipped by sub-block walking. Animation compositing (disposal methods,
partial frames) is out of scope — ``n_frames`` reports what a real
pipeline would route to a video path.

Writer: the classic "uncompressed GIF" LZW trick — every pixel emitted
as a literal code with a CLEAR before the code width would grow, so the
encoder never builds a dictionary but emits a fully spec-conformant
stream (decoders build theirs as usual). Used by tests and the
deterministic media generator.
"""

from __future__ import annotations

import struct

import numpy as np


class GifError(ValueError):
    """Not a GIF / corrupt / unsupported structure."""


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; returns
    (payload, position after the 0 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos:pos + n]
        if len(out) > 1 << 26:
            raise GifError("sub-block budget exceeded")
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> bytes:
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = bits = 0
    for byte in data:
        acc |= byte << bits
        bits += 8
        while bits >= code_size:
            code = acc & ((1 << code_size) - 1)
            acc >>= code_size
            bits -= code_size
            if code == clear:
                table = table[: clear + 2]
                code_size = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise GifError("LZW: first code not in table")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise GifError("LZW: code beyond table")
            out += entry
            if len(out) > max_pixels:
                raise GifError("LZW output exceeds image size")
            prev = entry
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
    return bytes(out)  # missing END: tolerate, like most decoders


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: "np.ndarray") -> "np.ndarray":
    h = rows.shape[0]
    order = [y for start, step in _INTERLACE_PASSES
             for y in range(start, h, step)]
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(data: bytes) -> dict:
    """Decode the first frame; count all frames.

    Returns ``{"width", "height", "n_frames", "pixels"}`` with
    ``pixels`` = RGB bytes of the first frame (its own sub-rectangle).
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad GIF signature")
    if len(data) < 13:
        raise GifError("truncated header")
    _sw, _sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
        if len(gct) < 3 * n:
            raise GifError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    first = None
    n_frames = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = _sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        _l, _t, w, h, ipacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
            if len(pal) < 3 * n:
                raise GifError("truncated local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pos >= len(data):
            raise GifError("missing LZW data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        n_frames += 1
        if first is None:
            if w == 0 or h == 0 or w * h > 1 << 26:
                raise GifError(f"unsupported dimensions {w}x{h}")
            if pal is None:
                raise GifError("image without any color table")
            idx = _lzw_decode(lzw, min_code, w * h)
            if len(idx) < w * h:
                raise GifError("LZW output shorter than image")
            rows = np.frombuffer(idx[: w * h], np.uint8).reshape(h, w)
            if ipacked & 0x40:
                rows = _deinterlace(rows)
            if int(rows.max(initial=0)) >= len(pal):
                raise GifError("palette index out of range")
            first = {
                "width": w, "height": h,
                "pixels": pal[rows.reshape(-1)].tobytes(),
            }
    if first is None:
        raise GifError("no image frame")
    first["n_frames"] = n_frames
    return first


def decode_gif_frames(data: bytes, max_frames: int = 1024) -> dict:
    """Decode EVERY frame of an animated GIF with its timestamp — the
    real-codec substrate for video frame sampling (the fake-decode
    retirement path: an animated GIF is a genuine multi-frame container
    a pure-stdlib decoder can fully handle, unlike mp4/h264).

    Scope: full-frame animations only — each image descriptor must be
    drawn at (0,0) with the logical-screen size (the shape the writer
    emits); sub-rectangle frames or disposal compositing raise
    :class:`GifError` (honest unsupported, not a wrong composite).
    Frame delay comes from the Graphic Control Extension (0xF9), in
    centiseconds; ``ts_ms`` is the cumulative start time of each frame.

    Returns ``{"width", "height", "duration_ms",
    "frames": [{"ts_ms", "delay_ms", "pixels"}]}``.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad GIF signature")
    if len(data) < 13:
        raise GifError("truncated header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
        if len(gct) < 3 * n:
            raise GifError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    frames = []
    ts = 0
    delay_ms = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = data[pos] if pos < len(data) else None
            pos += 1
            sub, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(sub) >= 3:
                delay_ms = int.from_bytes(sub[1:3], "little") * 10
            continue
        if block != 0x2C:
            raise GifError(f"unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        if (left, top, w, h) != (0, 0, sw, sh):
            raise GifError(
                "sub-rectangle frames unsupported (disposal compositing "
                "out of scope)"
            )
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n], np.uint8)
            if len(pal) < 3 * n:
                raise GifError("truncated local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise GifError("image without any color table")
        if pos >= len(data):
            raise GifError("missing LZW data")
        min_code = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        if len(frames) >= max_frames:
            raise GifError(f"more than {max_frames} frames")
        if w == 0 or h == 0 or w * h > 1 << 26:
            raise GifError(f"unsupported dimensions {w}x{h}")
        idx = _lzw_decode(lzw, min_code, w * h)
        if len(idx) < w * h:
            raise GifError("LZW output shorter than image")
        rows = np.frombuffer(idx[: w * h], np.uint8).reshape(h, w)
        if ipacked & 0x40:
            rows = _deinterlace(rows)
        if int(rows.max(initial=0)) >= len(pal):
            raise GifError("palette index out of range")
        frames.append({
            "ts_ms": ts, "delay_ms": delay_ms,
            "pixels": pal[rows.reshape(-1)].tobytes(),
        })
        ts += delay_ms
        delay_ms = 0
    if not frames:
        raise GifError("no image frame")
    return {
        "width": sw, "height": sh, "duration_ms": ts, "frames": frames,
    }


# --------------------------------------------------------------------------
# minimal writer (tests + deterministic synthetic media)
# --------------------------------------------------------------------------

def _lzw_encode_uncompressed(indices: bytes, min_code_size: int) -> bytes:
    """Spec-conformant LZW stream that never grows the code width:
    CLEAR is emitted before the decoder's table would reach the next
    width (every 2^min - 2 literal codes)."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int):
        nonlocal acc, bits
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    since_clear = 0
    for b in indices:
        if since_clear == clear - 2:
            emit(clear)
            since_clear = 0
        emit(b)
        since_clear += 1
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: bytes,
    interlace: bool = False,
) -> bytes:
    """Single-frame GIF89a. ``palette`` is RGB bytes (length a power of
    two * 3, >= 4 entries); ``indices`` row-major palette indices."""
    n_colors = len(palette) // 3
    if n_colors < 4 or n_colors & (n_colors - 1):
        raise GifError("palette must hold a power-of-two >= 4 colors")
    if len(indices) != width * height:
        raise GifError("indices do not match dimensions")
    gct_bits = n_colors.bit_length() - 1
    min_code = max(2, gct_bits)
    rows = np.frombuffer(indices, np.uint8).reshape(height, width)
    if interlace:
        order = [y for start, step in _INTERLACE_PASSES
                 for y in range(start, height, step)]
        rows = rows[order]
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (gct_bits - 1),
                       0, 0)
    out += palette
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height,
                                 0x40 if interlace else 0)
    out.append(min_code)
    lzw = _lzw_encode_uncompressed(rows.tobytes(), min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out += b"\x3B"
    return bytes(out)


def encode_gif_animation(
    width: int,
    height: int,
    frames: list,
    palette: bytes,
    delays_ms: list,
) -> bytes:
    """Multi-frame GIF89a: one full-frame image per entry of ``frames``
    (row-major palette indices), each preceded by a Graphic Control
    Extension carrying its delay (milliseconds, rounded down to the
    centisecond the format stores). The shape :func:`decode_gif_frames`
    round-trips exactly."""
    n_colors = len(palette) // 3
    if n_colors < 4 or n_colors & (n_colors - 1):
        raise GifError("palette must hold a power-of-two >= 4 colors")
    if not frames or len(frames) != len(delays_ms):
        raise GifError("frames/delays mismatch")
    gct_bits = n_colors.bit_length() - 1
    min_code = max(2, gct_bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (gct_bits - 1), 0, 0)
    out += palette
    for indices, delay in zip(frames, delays_ms):
        if len(indices) != width * height:
            raise GifError("indices do not match dimensions")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay // 10) + b"\x00\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(min_code)
        lzw = _lzw_encode_uncompressed(bytes(indices), min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3B"
    return bytes(out)
