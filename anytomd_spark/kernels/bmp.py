"""Pure-stdlib BMP (Windows DIB) decoder/encoder — another real image
codec for the multimodal path, alongside kernels/png.py, kernels/gif.py
and kernels/jpeg.py. BMP is the simplest widely-seen raster container
(screenshots, legacy Windows exports), so the decoder doubles as the
easiest-to-audit reference for the resample/re-encode plumbing.

Scope: BITMAPFILEHEADER + BITMAPINFOHEADER (or the later V4/V5 headers,
whose first 40 bytes are identical) with uncompressed BI_RGB pixel data
at 8-bit palettized, 24-bit BGR, or 32-bit BGRX depth; bottom-up and
top-down (negative height) row orders; 4-byte-aligned rows. Compressed
variants (RLE4/RLE8/BITFIELDS) and other depths raise :class:`BmpError`
— fail loudly, never a wrong answer. Output is always interleaved RGB
(palette entries resolve to their RGB triples; the X byte of 32-bit
pixels is dropped).
"""

from __future__ import annotations

import struct

import numpy as np


class BmpError(ValueError):
    """Not a BMP or unsupported encoding."""


MAGIC = b"BM"


def decode_bmp(data: bytes) -> dict:
    """Decode a BMP into top-down interleaved RGB.

    Returns ``{"width", "height", "channels" (always 3), "bit_count",
    "top_down", "pixels"}``.
    """
    if len(data) < 54 or data[:2] != MAGIC:
        raise BmpError("not a BMP file")
    (off_bits,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise BmpError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bit_count = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    (clr_used,) = struct.unpack("<I", data[46:50])
    if planes != 1:
        raise BmpError(f"planes must be 1, got {planes}")
    if compression != 0:
        raise BmpError(
            f"unsupported compression {compression} (only BI_RGB)"
        )
    if bit_count not in (8, 24, 32):
        raise BmpError(f"unsupported bit depth {bit_count}")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise BmpError("non-positive dimensions")

    palette = None
    if bit_count == 8:
        n_colors = clr_used or 256
        pal_off = 14 + hdr_size
        pal = data[pal_off:pal_off + 4 * n_colors]
        if len(pal) < 4 * n_colors:
            raise BmpError("truncated palette")
        # BGRX quads -> RGB table
        q = np.frombuffer(pal, np.uint8).reshape(n_colors, 4)
        palette = q[:, [2, 1, 0]].copy()

    bypp = bit_count // 8
    stride = (width * bypp + 3) & ~3
    need = stride * height
    body = data[off_bits:off_bits + need]
    if len(body) < need:
        raise BmpError("truncated pixel data")
    rows = np.frombuffer(body, np.uint8).reshape(height, stride)
    rows = rows[:, : width * bypp].reshape(height, width, bypp)
    if not top_down:
        rows = rows[::-1]
    if bit_count == 8:
        if int(rows.max()) >= len(palette):
            raise BmpError("palette index out of range")
        rgb = palette[rows[:, :, 0]]
    else:
        rgb = rows[:, :, [2, 1, 0]]  # BGR(X) -> RGB, X dropped
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "bit_count": bit_count,
        "top_down": top_down,
        "pixels": np.ascontiguousarray(rgb).tobytes(),
    }


def encode_bmp(
    width: int,
    height: int,
    pixels: bytes,
    bit_count: int = 24,
    top_down: bool = False,
    palette: bytes | None = None,
) -> bytes:
    """Write a BMP. For ``bit_count=24`` ``pixels`` is top-down
    interleaved RGB; for ``bit_count=8`` it is one palette index per
    pixel with ``palette`` as packed RGB triples (<= 256 entries)."""
    if bit_count == 24:
        arr = np.frombuffer(pixels, np.uint8)
        if arr.size != width * height * 3:
            raise BmpError("pixel buffer size mismatch")
        rows = arr.reshape(height, width, 3)[:, :, [2, 1, 0]]  # RGB->BGR
        pal_bytes = b""
    elif bit_count == 8:
        arr = np.frombuffer(pixels, np.uint8)
        if arr.size != width * height:
            raise BmpError("pixel buffer size mismatch")
        if palette is None or len(palette) % 3 or len(palette) > 768:
            raise BmpError("8-bit BMP needs an RGB palette (<=256 entries)")
        n_colors = len(palette) // 3
        if int(arr.max(initial=0)) >= n_colors:
            raise BmpError("palette index out of range")
        p = np.frombuffer(palette, np.uint8).reshape(n_colors, 3)
        quads = np.zeros((n_colors, 4), np.uint8)
        quads[:, :3] = p[:, [2, 1, 0]]  # RGB -> BGRX
        pal_bytes = quads.tobytes()
        rows = arr.reshape(height, width, 1)
    else:
        raise BmpError(f"unsupported encode bit depth {bit_count}")

    bypp = bit_count // 8
    stride = (width * bypp + 3) & ~3
    padded = np.zeros((height, stride), np.uint8)
    padded[:, : width * bypp] = rows.reshape(height, width * bypp)
    if not top_down:
        padded = padded[::-1]
    body = padded.tobytes()

    off_bits = 14 + 40 + len(pal_bytes)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height if top_down else height, 1, bit_count,
        0, len(body), 2835, 2835,
        (len(pal_bytes) // 4) if pal_bytes else 0, 0,
    )
    file_hdr = struct.pack(
        "<2sIHHI", MAGIC, off_bits + len(body), 0, 0, off_bits
    )
    return file_hdr + info + pal_bytes + body
