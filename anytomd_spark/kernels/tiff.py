"""Pure-stdlib baseline TIFF decoder/encoder — the next image MIME type
of the reference's table (/root/reference/src/converter/image.rs:125:
"tiff", "tif") to get a real decode path.

Scope: classic (non-Big) TIFF, both byte orders (II little / MM big),
single image (first IFD), 8-bit samples, chunky planar config, strip
layout, grayscale (photometric 0/1, incl. WhiteIsZero inversion), RGB,
RGBA (extra sample), and palette-color (16-bit ColorMap entries) images
with Compression = 1 (none), 32773 (PackBits) or 5 (TIFF LZW — the
MSB-first variable-width variant with early code-size change, distinct
from GIF's LSB-first LZW in kernels/gif.py). Tiled layouts, 1/4/16-bit
samples, planar configuration 2 and JPEG-in-TIFF raise
:class:`TiffError` — fail loudly, never a wrong answer.
"""

from __future__ import annotations

import struct

import numpy as np


class TiffError(ValueError):
    """Not a TIFF or unsupported encoding."""


MAGIC_LE = b"II*\x00"
MAGIC_BE = b"MM\x00*"

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(data: bytes, endian: str, offset: int) -> dict[int, list[int]]:
    if offset + 2 > len(data):
        raise TiffError("truncated IFD")
    (n_entries,) = struct.unpack_from(endian + "H", data, offset)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        e = offset + 2 + 12 * i
        if e + 12 > len(data):
            raise TiffError("truncated IFD entry")
        tag, typ, count = struct.unpack_from(endian + "HHI", data, e)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown field type: skip per spec
        total = size * count
        if total <= 4:
            voff = e + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", data, e + 8)
        if voff + total > len(data):
            raise TiffError(f"tag {tag} value runs past file end")
        if typ == 3:
            vals = list(struct.unpack_from(endian + f"{count}H", data, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(endian + f"{count}I", data, voff))
        elif typ in (1, 6, 7, 2):
            vals = list(data[voff:voff + count])
        else:  # rational etc. — not needed for pixel decode
            vals = []
        tags[tag] = vals
    return tags


def _unpackbits(src: bytes, expect: int) -> bytes:
    """PackBits (RLE) per the TIFF spec / Macintosh convention."""
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expect:
        n = src[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(src):
                raise TiffError("PackBits literal run truncated")
            out += src[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(src):
                raise TiffError("PackBits repeat run truncated")
            out += bytes([src[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise TiffError("PackBits output short of expected strip size")
    return bytes(out[:expect])


_LZW_CLEAR = 256
_LZW_EOI = 257


def _lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF LZW: MSB-first variable-width codes, 9..12 bits, early
    code-size change (width bumps one code BEFORE the table fills)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    bitpos = 0
    nbits = len(src) * 8
    prev: bytes | None = None
    while len(out) < expect:
        if bitpos + width > nbits:
            raise TiffError("LZW stream truncated")
        code = 0
        for _ in range(width):
            code = (code << 1) | ((src[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            reset()
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise TiffError("LZW first code after clear not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffError("LZW code beyond table (KwKwK violation)")
        out += entry
        prev = entry
        # early change: width grows when the NEXT added code would
        # overflow, i.e. at table sizes 511/1023/2047
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    if len(out) < expect:
        raise TiffError("LZW output short of expected strip size")
    return bytes(out[:expect])


def decode_tiff(data: bytes) -> dict:
    """Decode the first IFD of a TIFF into top-down interleaved
    samples. Returns ``{"width", "height", "channels", "compression",
    "byte_order", "pixels"}`` (palette resolves to RGB; WhiteIsZero
    grayscale is inverted to normal intensity)."""
    if len(data) < 8:
        raise TiffError("not a TIFF (too short)")
    if data[:4] == MAGIC_LE:
        endian = "<"
    elif data[:4] == MAGIC_BE:
        endian = ">"
    else:
        raise TiffError("not a TIFF (bad byte-order magic)")
    (ifd_off,) = struct.unpack_from(endian + "I", data, 4)
    tags = _read_ifd(data, endian, ifd_off)

    def one(tag: int, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise TiffError(f"missing required tag {tag}")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    if width <= 0 or height <= 0:
        raise TiffError("non-positive dimensions")
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise TiffError(f"unsupported BitsPerSample {bits} (only 8)")
    compression = one(259, 1)
    photometric = one(262)
    planar = one(284, 1)
    if planar != 1:
        raise TiffError("unsupported PlanarConfiguration 2 (planar)")
    if 322 in tags or 323 in tags:
        raise TiffError("tiled TIFF unsupported (strips only)")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("missing/mismatched strip offsets or byte counts")
    rows_per_strip = one(278, height)

    row_bytes = width * spp
    raw = bytearray()
    row0 = 0
    for off, cnt in zip(offsets, counts):
        rows = min(rows_per_strip, height - row0)
        if rows <= 0:
            break
        expect = rows * row_bytes
        if off + cnt > len(data):
            raise TiffError("strip data runs past file end")
        strip = data[off:off + cnt]
        if compression == 1:
            if len(strip) < expect:
                raise TiffError("uncompressed strip short")
            raw += strip[:expect]
        elif compression == 32773:
            raw += _unpackbits(strip, expect)
        elif compression == 5:
            raw += _lzw_decode(strip, expect)
        else:
            raise TiffError(
                f"unsupported Compression {compression} "
                "(only none/PackBits/LZW)"
            )
        row0 += rows
    if row0 < height:
        raise TiffError("strips cover fewer rows than ImageLength")
    arr = np.frombuffer(bytes(raw), np.uint8).reshape(height, width, spp)

    if photometric == 3:  # palette
        if spp != 1:
            raise TiffError("palette image must have 1 sample per pixel")
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise TiffError("missing/short ColorMap")
        cm = np.array(cmap[: 3 * 256], np.uint16).reshape(3, 256)
        pal = (cm >> 8).astype(np.uint8).T  # 16-bit entries -> 8-bit RGB
        out = pal[arr[:, :, 0]]
        channels = 3
    elif photometric == 0:  # WhiteIsZero
        if spp != 1:
            raise TiffError("WhiteIsZero requires 1 sample per pixel")
        out = 255 - arr
        channels = 1
    elif photometric == 1:  # BlackIsZero
        if spp != 1:
            raise TiffError("BlackIsZero requires 1 sample per pixel")
        out = arr
        channels = 1
    elif photometric == 2:  # RGB (+ optional extra/alpha sample)
        if spp not in (3, 4):
            raise TiffError("RGB requires 3 or 4 samples per pixel")
        out = arr
        channels = spp
    else:
        raise TiffError(f"unsupported PhotometricInterpretation {photometric}")
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "compression": compression,
        "byte_order": "II" if endian == "<" else "MM",
        "pixels": np.ascontiguousarray(out).tobytes(),
    }


# --------------------------------------------------------------------------
# minimal writer (tests + deterministic synthetic corpora)
# --------------------------------------------------------------------------

def _packbits(row: bytes) -> bytes:
    """Per-row PackBits encoding (repeat runs >= 3, else literals)."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and row[i + run] == row[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit = i
        while (i < n and i - lit < 128
               and not (i + 2 < n and row[i] == row[i + 1] == row[i + 2])):
            i += 1
        out += bytes([i - lit - 1]) + row[lit:i]
    return bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    byte_order: str = "II",
    compression: int = 1,
    rows_per_strip: int | None = None,
) -> bytes:
    """Write a classic TIFF: 8-bit chunky samples, grayscale (1), RGB
    (3) or RGBA (4), Compression 1 (none) or 32773 (PackBits), strip
    layout with ``rows_per_strip`` (default: whole image one strip)."""
    if channels not in (1, 3, 4):
        raise TiffError("channels must be 1, 3 or 4")
    if byte_order not in ("II", "MM"):
        raise TiffError("byte_order must be II or MM")
    if compression not in (1, 32773):
        raise TiffError("writer supports Compression 1 or 32773 only")
    arr = np.frombuffer(pixels, np.uint8)
    if arr.size != width * height * channels:
        raise TiffError("pixel buffer size mismatch")
    endian = "<" if byte_order == "II" else ">"
    rps = rows_per_strip or height
    row_bytes = width * channels

    strips = []
    for y0 in range(0, height, rps):
        rows = min(rps, height - y0)
        chunk = pixels[y0 * row_bytes:(y0 + rows) * row_bytes]
        if compression == 32773:
            enc = b"".join(
                _packbits(chunk[r * row_bytes:(r + 1) * row_bytes])
                for r in range(rows)
            )
        else:
            enc = chunk
        strips.append(enc)

    photometric = 1 if channels == 1 else 2
    entries = []  # (tag, type, count, values)
    entries.append((256, 3, 1, [width]))
    entries.append((257, 3, 1, [height]))
    entries.append((258, 3, channels, [8] * channels))
    entries.append((259, 3, 1, [compression]))
    entries.append((262, 3, 1, [photometric]))
    entries.append((277, 3, 1, [channels]))
    entries.append((278, 3, 1, [rps]))
    entries.append((279, 4, len(strips), [len(s) for s in strips]))
    if channels == 4:
        entries.append((338, 3, 1, [2]))  # unassociated alpha
    # strip offsets resolved after layout
    n_entries = len(entries) + 1  # + StripOffsets
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    extra_off = ifd_off + ifd_size
    extra = bytearray()

    def value_bytes(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(endian + fmt * len(vals), *vals)

    # lay out out-of-line values first, then strips
    resolved = []
    for tag, typ, count, vals in entries:
        vb = value_bytes(typ, vals)
        if len(vb) <= 4:
            resolved.append((tag, typ, count, vb.ljust(4, b"\x00"), None))
        else:
            resolved.append((tag, typ, count, None, len(extra)))
            extra += vb
    strip_area = extra_off + len(extra)
    offsets = []
    pos = strip_area + (4 * len(strips) if len(strips) > 1 else 0)
    # multi-strip: offsets array itself lives in the extra area
    off_vb = None
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    if len(strips) == 1:
        off_entry = (273, 4, 1, struct.pack(endian + "I", offsets[0]), None)
    else:
        off_entry = (273, 4, len(strips), None, len(extra))
        extra += struct.pack(endian + "I" * len(strips), *offsets)
        # NB: offsets were computed assuming the array sits at
        # strip_area; it does — extra grew by exactly 4*len(strips)
    resolved.append(off_entry)
    resolved.sort(key=lambda e: e[0])

    out = bytearray()
    out += (MAGIC_LE if byte_order == "II" else MAGIC_BE)
    out += struct.pack(endian + "I", ifd_off)
    out += struct.pack(endian + "H", n_entries)
    for tag, typ, count, inline, rel in resolved:
        out += struct.pack(endian + "HHI", tag, typ, count)
        if inline is not None:
            out += inline
        else:
            out += struct.pack(endian + "I", extra_off + rel)
    out += struct.pack(endian + "I", 0)  # next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)
