"""Format detection for turn payloads.

Mirrors ``/root/reference/src/detection.rs`` (detect_format :18-48,
detect_zip_format :54-74, detect_by_extension :77-100) and the dispatcher
priority of ``src/lib.rs:95-139``: magic bytes -> container introspection ->
extension hint -> JSON heuristic.

Transcript turns carry payloads in a *string* column, so binary formats
(DOCX/PPTX/XLSX ZIPs, XLS compound files) arrive base64-encoded
(SURVEY.md §7.4): ``PK\\x03\\x04`` -> ``UEsDB``, OLE2 ``\\xd0\\xcf\\x11\\xe0``
-> ``0M8R``. The ``tool`` column plays the role of the filename extension.
"""

from __future__ import annotations

import base64
import binascii
import io
import zipfile

# detection.rs:90-98 extension tables
_TXT_EXTS = {
    "txt", "text", "log", "md", "markdown", "rst", "ini", "cfg", "conf",
    "toml", "yaml", "yml",
}
_IMAGE_EXTS = {
    "png", "jpg", "jpeg", "gif", "webp", "bmp", "tiff", "tif", "svg",
    "heic", "heif", "avif",
}
CODE_EXTS = {
    "c", "h", "cpp", "cc", "cxx", "hpp", "hxx", "hh", "py", "pyw", "js",
    "mjs", "cjs", "jsx", "ts", "mts", "cts", "tsx", "rs", "go", "java",
    "kt", "kts", "rb", "swift", "cs", "php", "sh", "bash", "zsh", "fish",
    "pl", "pm", "lua", "r", "scala", "dart", "ex", "exs", "erl", "hs",
    "ml", "mli", "sql", "m", "mm", "zig", "nim", "v", "groovy", "ps1",
    "bat", "cmd",
}

_DIRECT = {"docx", "pptx", "xlsx", "xls", "csv", "ipynb", "json", "pdf", "xml"}


def normalize_extension(ext: str) -> str:
    """Trim, strip one leading dot, lowercase (lib.rs:233-238)."""
    ext = ext.strip()
    if ext.startswith("."):
        ext = ext[1:]
    return ext.lower()


def detect_by_extension(ext: str) -> str | None:
    """Extension -> format name (detection.rs:77-100). ``ext`` pre-normalized."""
    if ext in _DIRECT:
        return ext
    if ext in ("html", "htm"):
        return "html"
    if ext in _TXT_EXTS:
        return "txt"
    if ext in _IMAGE_EXTS:
        return "image"
    if ext in CODE_EXTS:
        return "code"
    return None


def _zip_names_raw(data: bytes) -> "list[bytes] | None":
    """Entry name bytes from the central directory, in directory order,
    or None when the archive doesn't parse cleanly (caller falls back
    to zipfile). A fraction of ZipFile's cost: no ZipInfo objects, no
    name decoding — the introspection prefixes are ASCII, identical
    under both cp437 and utf-8, so raw bytes suffice."""
    try:
        eocd = data.rfind(b"PK\x05\x06", max(0, len(data) - 65557))
        if eocd < 0 or eocd + 22 > len(data):
            return None
        n_entries = int.from_bytes(data[eocd + 10:eocd + 12], "little")
        cd_off = int.from_bytes(data[eocd + 16:eocd + 20], "little")
        names: list[bytes] = []
        pos = cd_off
        for _ in range(n_entries):
            if data[pos:pos + 4] != b"PK\x01\x02":
                return None
            nlen = int.from_bytes(data[pos + 28:pos + 30], "little")
            elen = int.from_bytes(data[pos + 30:pos + 32], "little")
            clen = int.from_bytes(data[pos + 32:pos + 34], "little")
            names.append(data[pos + 46:pos + 46 + nlen])
            pos += 46 + nlen + elen + clen
        return names
    except Exception:
        return None


def detect_zip_format(data: bytes) -> str | None:
    """Introspect ZIP entry names (detection.rs:54-74)."""
    names = _zip_names_raw(data)
    if names is not None:
        for raw in names:
            if raw.startswith(b"word/"):
                return "docx"
            if raw.startswith(b"ppt/"):
                return "pptx"
            if raw.startswith(b"xl/"):
                return "xlsx"
        return None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for name in zf.namelist():
                if name.startswith("word/"):
                    return "docx"
                if name.startswith("ppt/"):
                    return "pptx"
                if name.startswith("xl/"):
                    return "xlsx"
    except Exception:
        return None
    return None


def maybe_base64_binary(payload: str) -> bytes | None:
    """Decode payloads that look like base64-carried ZIP/OLE binaries.

    ``UEsDB`` is base64 of ``PK\\x03\\x04``; ``0M8R`` is base64 of the OLE2
    compound-document magic ``\\xd0\\xcf\\x11\\xe0`` (legacy .xls).
    """
    if payload.startswith("UEsDB") or payload.startswith("0M8R"):
        try:
            return base64.b64decode(payload, validate=True)
        except (binascii.Error, ValueError):
            return None
    return None


def _sniff_text_content(payload: str) -> str | None:
    """Textual content heuristics shared by :func:`sniff_format` (turn
    payloads) and :func:`sniff_bytes` (archive members): the JSON
    heuristic of detection.rs:38-46, then html-ish / xml-ish markup."""
    stripped = payload[1:] if payload.startswith("﻿") else payload
    head = stripped.lstrip(" \t\r\n\x0b\x0c")
    if head[:1] in ("{", "["):
        return "json"
    low = head[:256].lower()
    if low.startswith("<!doctype html") or low.startswith("<html"):
        return "html"
    for tag in ("<head", "<body", "<div", "<p>", "<p ", "<table", "<h1", "<ul", "<span", "<br"):
        if tag in low:
            return "html"
    if low.startswith("<?xml") or (head[:1] == "<" and ">" in head):
        return "xml"
    return None


def sniff_bytes(data: bytes) -> str | None:
    """Magic-first detection for raw member bytes (archive ingestion).

    Mirrors the reference's detection priority (detection.rs:18-48):
    magic bytes first — ZIP magic -> container introspection (OOXML or
    a plain ``zip`` the dispatcher will reject loudly), OLE2 -> xls,
    ``%PDF`` -> pdf — then the shared textual heuristics over a lossy
    UTF-8 decode of the head. Returns None when nothing matches (the
    caller falls back to plain text, detection.rs's final arm).
    """
    if data[:4] == b"PK\x03\x04":
        return detect_zip_format(data) or "zip"
    if data[:4] == b"\xd0\xcf\x11\xe0":
        return "xls"
    if data[:4] == b"%PDF":
        return "pdf"
    return _sniff_text_content(data[:4096].decode("utf-8", errors="replace"))


def sniff_format(payload: str, ext_hint: str | None) -> tuple[str | None, bytes | None]:
    """Resolve the format of one turn payload.

    Returns (format, binary_bytes|None). Priority mirrors convert_file
    (lib.rs:95-139): magic -> ZIP introspection -> extension hint -> JSON
    heuristic; plus a content fallback for hint-less transcript turns
    (documented extension beyond the reference, which requires a filename).
    """
    # 1. Magic bytes (textual or base64-carried binary)
    binary = maybe_base64_binary(payload)
    if binary is not None:
        if binary.startswith(b"PK\x03\x04"):
            fmt = detect_zip_format(binary)
            return (fmt, binary) if fmt else (None, binary)
        if binary.startswith(b"\xd0\xcf\x11\xe0"):
            return "xls", binary
    if payload.startswith("%PDF"):
        return "pdf", None

    # 2. Extension hint (the `tool` column)
    if ext_hint:
        fmt = detect_by_extension(normalize_extension(ext_hint))
        if fmt is not None:
            return fmt, None

    # 3 + 4. Shared textual heuristics (JSON, then markup fallback)
    fmt = _sniff_text_content(payload)
    return (fmt, None) if fmt else (None, None)
