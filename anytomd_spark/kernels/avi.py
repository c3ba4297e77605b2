"""Pure-stdlib AVI (RIFF) container reader/writer for MJPEG video —
makes the multimodal VIDEO path real for an actual multi-frame *video
container*, the way kernels/gif.py does for animated GIF and
kernels/jpeg.py does for still images. The reference treats video as an
opaque attachment (it converts documents, not media); this module is
part of the beyond-reference training-data pipeline surface
(SURVEY.md "multimodal columns").

Scope: RIFF 'AVI ' files with a single MJPEG video stream — the classic
structure every camera/ffmpeg MJPEG AVI uses:

    RIFF('AVI '
      LIST('hdrl' avih LIST('strl' strh strf))
      LIST('movi' 00dc 00dc ...)
      idx1)

Each ``00dc``/``00db`` chunk body is one baseline JPEG, decoded by
:mod:`anytomd_spark.kernels.jpeg`. The frame timeline is the constant
rate declared by ``strh`` (``dwScale``/``dwRate``): frame *i* starts at
``i * 1000 * scale // rate`` ms. Anything else — other stream handlers
(DIB, h264, ...), missing headers, truncated chunks — raises
:class:`AviError`: fail loudly, never a wrong answer.

Chunk walking tolerates the extra chunks real writers emit (JUNK
padding, INFO lists, odd-size chunks padded to even) by skipping them.
"""

from __future__ import annotations

import struct

from anytomd_spark.kernels import jpeg


class AviError(ValueError):
    """Not a RIFF/AVI file or unsupported stream layout."""


def _chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for each RIFF chunk in
    data[pos:end]; bodies are padded to even length per RIFF."""
    while pos + 8 <= end:
        cid = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = pos + 8
        if body + size > end:
            raise AviError(
                f"truncated chunk {cid!r}: body runs past container end"
            )
        yield cid, body, size
        pos = body + size + (size & 1)


def _parse_strh(body: bytes) -> dict:
    if len(body) < 48:
        raise AviError("strh too short")
    fcc_type = body[0:4]
    fcc_handler = body[4:8]
    scale, rate, _start, length = struct.unpack("<IIII", body[20:36])
    return {
        "type": fcc_type,
        "handler": fcc_handler,
        "scale": scale,
        "rate": rate,
        "length": length,
    }


def decode_avi_frames(data: bytes, max_frames: int = 4096) -> dict:
    """Decode an MJPEG AVI into per-frame RGB/grayscale pixels.

    Returns ``{"width", "height", "n_frames", "scale", "rate",
    "duration_ms", "frames": [{"frame_idx", "ts_ms", "n_components",
    "pixels"}, ...]}`` where ``pixels`` is the interleaved uint8 buffer
    from the JPEG decoder and ``ts_ms`` the frame's start instant under
    the strh constant-rate timeline.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviError("not a RIFF/AVI file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    end = min(len(data), 8 + riff_size)

    avih = None
    vids = None
    movi_chunks: list[tuple[int, int]] = []
    for cid, body, size in _chunks(data, 12, end):
        if cid == b"LIST":
            ltype = data[body:body + 4]
            if ltype == b"hdrl":
                for c2, b2, s2 in _chunks(data, body + 4, body + size):
                    if c2 == b"avih":
                        if s2 < 40:
                            raise AviError("avih too short")
                        fields = struct.unpack("<10I", data[b2:b2 + 40])
                        avih = {
                            "usec_per_frame": fields[0],
                            "total_frames": fields[4],
                            "streams": fields[6],
                            "width": fields[8],
                            "height": fields[9],
                        }
                    elif c2 == b"LIST" and data[b2:b2 + 4] == b"strl":
                        strh = None
                        for c3, b3, s3 in _chunks(data, b2 + 4, b2 + s2):
                            if c3 == b"strh":
                                strh = _parse_strh(data[b3:b3 + s3])
                        if strh and strh["type"] == b"vids":
                            if strh["handler"] not in (b"MJPG", b"mjpg"):
                                raise AviError(
                                    "unsupported video handler "
                                    f"{strh['handler']!r} (only MJPG; "
                                    "other codecs need ffmpeg)"
                                )
                            vids = strh
            elif ltype == b"movi":
                for c2, b2, s2 in _chunks(data, body + 4, body + size):
                    # NNdc = compressed video, NNdb = uncompressed DIB
                    # slot reused by some MJPEG writers; both hold JPEG
                    # bytes for an MJPG stream
                    if c2[2:4] in (b"dc", b"db"):
                        movi_chunks.append((b2, s2))
        # idx1 / JUNK / INFO are skipped: the movi walk above is the
        # source of truth (tolerant-reader rule, like kernels/wav.py)
    if avih is None:
        raise AviError("missing avih header")
    if vids is None:
        raise AviError("no MJPG video stream (missing strl/strh vids)")
    if not movi_chunks:
        raise AviError("no movi frame chunks")
    if len(movi_chunks) > max_frames:
        raise AviError(
            f"frame count {len(movi_chunks)} exceeds max_frames={max_frames}"
        )
    scale, rate = vids["scale"], vids["rate"]
    if not scale or not rate:
        raise AviError("strh dwScale/dwRate must be non-zero")

    frames = []
    width = height = None
    for i, (b, s) in enumerate(movi_chunks):
        try:
            img = jpeg.decode_jpeg(data[b:b + s])
        except jpeg.JpegError as e:
            raise AviError(f"frame {i}: {e}") from e
        if width is None:
            width, height = img["width"], img["height"]
        elif (img["width"], img["height"]) != (width, height):
            raise AviError(
                f"frame {i} size {img['width']}x{img['height']} != "
                f"stream size {width}x{height}"
            )
        frames.append({
            "frame_idx": i,
            "ts_ms": i * 1000 * scale // rate,
            "n_components": img["n_components"],
            "pixels": img["pixels"],
        })
    return {
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "scale": scale,
        "rate": rate,
        "duration_ms": len(frames) * 1000 * scale // rate,
        "frames": frames,
    }


# --------------------------------------------------------------------------
# minimal writer (tests + deterministic synthetic corpora)
# --------------------------------------------------------------------------

def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def build_avi_mjpeg(
    width: int,
    height: int,
    jpeg_frames: list[bytes],
    rate: int = 4,
    scale: int = 1,
) -> bytes:
    """Write a minimal valid single-stream MJPEG AVI: hdrl (avih +
    strl(strh 'vids'/'MJPG' + strf BITMAPINFOHEADER)), movi with one
    ``00dc`` chunk per frame, and an idx1 index — the shapes the reader
    (and every classic MJPEG AVI) uses. ``rate``/``scale`` give the
    constant frame rate ``rate/scale`` fps."""
    if not jpeg_frames:
        raise AviError("at least one frame required")
    n = len(jpeg_frames)
    max_size = max(len(f) for f in jpeg_frames)
    usec = 1_000_000 * scale // rate

    avih = struct.pack(
        "<10I16x",
        usec,            # dwMicroSecPerFrame
        max_size * rate // scale,  # dwMaxBytesPerSec (approx)
        0,               # dwPaddingGranularity
        0x10,            # dwFlags = AVIF_HASINDEX
        n,               # dwTotalFrames
        0,               # dwInitialFrames
        1,               # dwStreams
        max_size,        # dwSuggestedBufferSize
        width,
        height,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi",
            0, 0, 0,     # dwFlags, wPriority, wLanguage
            0,           # dwInitialFrames
            scale, rate,
            0,           # dwStart
            n,           # dwLength (frames)
            max_size,    # dwSuggestedBufferSize
            0,           # dwQuality
            0,           # dwSampleSize (0 = variable, one sample/chunk)
        )
        + struct.pack("<4h", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b""
    idx_entries = []
    for f in jpeg_frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_body), len(f)))
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_body)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body
