"""Text decoding and MIME sniffing.

Semantics match ``/root/reference/src/converter/mod.rs``:
decode_text :149-195 (UTF-8 fast path with BOM strip -> UTF-16 by BOM ->
Windows-1252 fallback, with warnings) and mime_from_image :200-235.
"""

from __future__ import annotations

# Warning codes (converter/mod.rs:53-63)
SKIPPED_ELEMENT = "SkippedElement"
UNSUPPORTED_FEATURE = "UnsupportedFeature"
RESOURCE_LIMIT_REACHED = "ResourceLimitReached"
MALFORMED_SEGMENT = "MalformedSegment"


def warning(code: str, message: str, location: str | None = None) -> dict:
    return {"code": code, "message": message, "location": location}


def decode_text(data: bytes) -> tuple[str, dict | None]:
    """Decode bytes to str: UTF-8 (strip BOM) -> UTF-16 LE/BE by BOM -> cp1252.

    Returns (text, warning|None). Mirrors encoding_rs behavior: the UTF-16
    decoders never hard-fail (lone surrogates / odd trailing byte become
    U+FFFD and flag MalformedSegment); cp1252 maps every byte so the fallback
    always succeeds with an UnsupportedFeature warning.
    """
    try:
        text = data.decode("utf-8")
        if text.startswith("﻿"):
            text = text[1:]
        return text, None
    except UnicodeDecodeError:
        pass

    if data.startswith(b"\xff\xfe") or data.startswith(b"\xfe\xff"):
        if data.startswith(b"\xff\xfe"):
            enc, name, body = "utf-16-le", "UTF-16LE", data[2:]
        else:
            enc, name, body = "utf-16-be", "UTF-16BE", data[2:]
        decoded = body.decode(enc, errors="replace")
        # encoding_rs pads an odd trailing byte to U+FFFD; Python 'replace'
        # does the same. had_errors iff any replacement char was inserted
        # where the input wasn't one.
        had_errors = False
        try:
            body.decode(enc)
        except UnicodeDecodeError:
            had_errors = True
        if had_errors:
            w = warning(
                MALFORMED_SEGMENT,
                f"replacement characters inserted during {name} decoding",
            )
        else:
            w = warning(UNSUPPORTED_FEATURE, f"decoded from {name} encoding")
        return decoded, w

    # Windows-1252 fallback. encoding_rs WINDOWS_1252 maps the five
    # undefined bytes (0x81 0x8D 0x8F 0x90 0x9D) to C1 controls and never
    # errors; Python cp1252 raises on them, so mimic with a byte-wise map.
    try:
        decoded = data.decode("cp1252")
    except UnicodeDecodeError:
        decoded = "".join(
            chr(b) if b in _CP1252_GAP else bytes([b]).decode("cp1252")
            for b in data
        )
    return decoded, warning(
        UNSUPPORTED_FEATURE, "decoded from windows-1252 encoding (fallback)"
    )


_CP1252_GAP = {0x81, 0x8D, 0x8F, 0x90, 0x9D}


def mime_from_image(filename: str, data: bytes) -> str:
    """PNG/JPEG/GIF/WEBP magic first, then extension, else octet-stream."""
    if len(data) >= 8:
        if data.startswith(b"\x89PNG\r\n\x1a\n"):
            return "image/png"
        if data.startswith(b"\xff\xd8\xff"):
            return "image/jpeg"
        if data.startswith(b"GIF87a") or data.startswith(b"GIF89a"):
            return "image/gif"
        if data.startswith(b"RIFF") and len(data) >= 12 and data[8:12] == b"WEBP":
            return "image/webp"
    ext = filename.rsplit(".", 1)[-1].lower() if "." in filename else ""
    return {
        "png": "image/png",
        "jpg": "image/jpeg",
        "jpeg": "image/jpeg",
        "gif": "image/gif",
        "webp": "image/webp",
        "bmp": "image/bmp",
        "tiff": "image/tiff",
        "tif": "image/tiff",
        "svg": "image/svg+xml",
        "heic": "image/heic",
        "heif": "image/heic",
        "avif": "image/avif",
    }.get(ext, "application/octet-stream")
