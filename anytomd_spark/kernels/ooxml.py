"""Shared OOXML helpers: ZIP reads, .rels parsing, expat event streaming.

Reference semantics: ``/root/reference/src/zip_utils.rs`` (budget from the
central directory :11-28, member reads :31-58) and
``/root/reference/src/converter/ooxml_utils.rs`` (parse_relationships
:40-83, resolve_image_placeholders :148-213 — default no-describer path
replaces each ``__img_N__`` placeholder with the original alt text).
"""

from __future__ import annotations

import io
import zipfile
from xml.parsers import expat

from anytomd_spark.kernels.markdown import replace_image_alt_by_placeholder


class InputTooLarge(Exception):
    pass


def open_zip(data: bytes) -> zipfile.ZipFile:
    return zipfile.ZipFile(io.BytesIO(data))


def validate_zip_budget(zf: zipfile.ZipFile, budget: int) -> None:
    """Sum uncompressed sizes from the central directory (no decompression)."""
    total = sum(info.file_size for info in zf.infolist())
    if total > budget:
        raise InputTooLarge(
            f"input size {total} exceeds limit {budget}"
        )


def read_zip_text(zf: zipfile.ZipFile, path: str) -> str | None:
    try:
        raw = zf.read(path)
    except KeyError:
        return None
    return raw.decode("utf-8")


def read_zip_bytes(zf: zipfile.ZipFile, path: str) -> bytes | None:
    try:
        return zf.read(path)
    except KeyError:
        return None


def local_name(tag: str) -> str:
    """``w:p`` -> ``p`` (quick-xml ``local_name`` equivalent)."""
    pos = tag.rfind(":")
    return tag[pos + 1:] if pos >= 0 else tag


def parse_xml_events(xml: str, start, end, text) -> None:
    """Stream SAX events through the given callbacks.

    ``start(local, attrs)`` receives the element local name and a dict of
    raw attribute names (prefixed, e.g. ``w:val``) -> values. ``end(local)``
    and ``text(data)`` follow expat semantics (text may arrive in chunks).
    Parse errors terminate the stream silently, matching the reference's
    ``Err(_) => break`` loops.
    """
    parser = expat.ParserCreate()
    parser.buffer_text = True

    def _start(name, attrs):
        start(local_name(name), attrs)

    def _end(name):
        end(local_name(name))

    parser.StartElementHandler = _start
    parser.EndElementHandler = _end
    parser.CharacterDataHandler = text
    try:
        parser.Parse(xml, True)
    except expat.ExpatError:
        pass


def attr_local(attrs: dict, local: str) -> str | None:
    """First attribute whose *local* name matches (ooxml attr lookups)."""
    for key, val in attrs.items():
        pos = key.rfind(":")
        if (key[pos + 1:] if pos >= 0 else key) == local:
            return val
    return None


def attr_suffix(attrs: dict, suffix: str) -> str | None:
    """Namespaced attribute match: ``r:id``-style keys ending in ``:suffix``.

    Mirrors the reference's ``key == "r:id" || key.ends_with(":id")`` checks
    — a bare un-prefixed attribute (e.g. ``id="256"``) does NOT match.
    """
    want = ":" + suffix
    for key, val in attrs.items():
        if key.endswith(want):
            return val
    return None


def parse_relationships(xml: str) -> dict[str, tuple[str, str]]:
    """Parse a .rels file: rId -> (target, rel_type)."""
    rels: dict[str, tuple[str, str]] = {}

    def start(local, attrs):
        if local == "Relationship":
            rid = attrs.get("Id")
            target = attrs.get("Target")
            rel_type = attrs.get("Type", "")
            if rid is not None and target is not None:
                rels[rid] = (target, rel_type)

    parse_xml_events(xml, start, lambda local: None, lambda data: None)
    return rels


def resolve_image_placeholders(
    markdown: str, plain_text: str, image_infos: list[dict]
) -> tuple[str, str]:
    """Default no-describer path: placeholder -> original alt text."""
    for info in image_infos:
        markdown = replace_image_alt_by_placeholder(
            markdown, info["placeholder"], info["original_alt"], info["filename"]
        )
        plain_text = plain_text.replace(info["placeholder"], info["original_alt"], 1)
    return markdown, plain_text
