"""SVG feature extraction — the one image format of the reference's
extension table (/root/reference/src/converter/image.rs:125: "svg")
that is a TEXT format, so this container can parse it fully with
stdlib expat (the same parser the OOXML kernels drive).

Not a rasterizer: a multimodal pipeline treats vector images as
structured documents — dimensions, element census, embedded text, and
the security-relevant bits (script/foreignObject presence, external
hrefs) are the features a curation pass wants. Malformed XML or a
non-SVG root raises :class:`SvgError` — fail loudly, never a wrong
answer.

Dimension parsing: unitless / ``px`` width/height attributes are taken
directly; other units (em, %, mm, ...) fall back to the viewBox, whose
third/fourth numbers give the user-space size. Missing both -> size
(0, 0) with ``has_size`` False.
"""

from __future__ import annotations

import re
import xml.parsers.expat


class SvgError(ValueError):
    """Not an SVG or malformed XML."""


_NUM = re.compile(r"^\s*([+-]?\d*\.?\d+(?:[eE][+-]?\d+)?)\s*(px)?\s*$")

_TEXT_TAGS = {"text", "tspan", "textPath", "title", "desc"}
_RISK_TAGS = {"script", "foreignObject"}


def _parse_len(value: str | None) -> float | None:
    if not value:
        return None
    m = _NUM.match(value)
    return float(m.group(1)) if m else None


def looks_like_svg(data: bytes, sniff: int = 1024) -> bool:
    """Cheap magic test: XML prologue / svg root within the head."""
    head = data[:sniff].lstrip(b"\xef\xbb\xbf \t\r\n")
    return head.startswith(b"<svg") or (
        head.startswith(b"<?xml") and b"<svg" in data[:sniff]
    )


def svg_features(data: bytes, max_bytes: int = 16 << 20) -> dict:
    """Parse an SVG and return
    ``{"width", "height", "has_size", "n_elements", "counts" (dict of
    the common shape tags), "text" (joined text content), "has_script",
    "n_external_refs"}``."""
    if len(data) > max_bytes:
        raise SvgError(f"SVG exceeds {max_bytes} byte budget")

    state = {
        "root_seen": False,
        "width": None,
        "height": None,
        "n_elements": 0,
        "counts": {},
        "text_parts": [],
        "in_text_depth": 0,
        "has_script": False,
        "n_external_refs": 0,
    }

    def local(name: str) -> str:
        return name.rsplit(":", 1)[-1]

    def start(name, attrs):
        tag = local(name)
        if not state["root_seen"]:
            if tag != "svg":
                raise SvgError(f"root element is <{tag}>, not <svg>")
            state["root_seen"] = True
            w = _parse_len(attrs.get("width"))
            h = _parse_len(attrs.get("height"))
            if w is None or h is None:
                vb = (attrs.get("viewBox") or "").replace(",", " ").split()
                if len(vb) == 4:
                    try:
                        w = w if w is not None else float(vb[2])
                        h = h if h is not None else float(vb[3])
                    except ValueError:
                        pass
            state["width"], state["height"] = w, h
        state["n_elements"] += 1
        state["counts"][tag] = state["counts"].get(tag, 0) + 1
        if tag in _RISK_TAGS:
            state["has_script"] = True
        if tag in _TEXT_TAGS:
            state["in_text_depth"] += 1
        for k, v in attrs.items():
            if local(k) == "href" and re.match(r"^\s*[a-z][a-z0-9+.-]*:",
                                               v or "", re.I):
                if not (v or "").lstrip().lower().startswith("data:"):
                    state["n_external_refs"] += 1

    def end(name):
        if local(name) in _TEXT_TAGS:
            state["in_text_depth"] -= 1

    def chars(text):
        if state["in_text_depth"] > 0 and text.strip():
            state["text_parts"].append(text.strip())

    p = xml.parsers.expat.ParserCreate()
    p.StartElementHandler = start
    p.EndElementHandler = end
    p.CharacterDataHandler = chars
    try:
        p.Parse(data, True)
    except xml.parsers.expat.ExpatError as e:
        raise SvgError(f"malformed SVG XML: {e}") from e
    if not state["root_seen"]:
        raise SvgError("empty document (no <svg> root)")
    return {
        "width": state["width"] or 0.0,
        "height": state["height"] or 0.0,
        "has_size": state["width"] is not None and state["height"] is not None,
        "n_elements": state["n_elements"],
        "counts": state["counts"],
        "text": " ".join(state["text_parts"]),
        "has_script": state["has_script"],
        "n_external_refs": state["n_external_refs"],
    }


def build_svg(width: float, height: float, shapes: list[str],
              texts: list[str] = ()) -> bytes:
    """Minimal writer for tests/synthetic corpora: emits the named
    shape elements and <text> nodes inside a sized root."""
    body = "".join(f"<{s}/>" for s in shapes)
    body += "".join(f"<text>{t}</text>" for t in texts)
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}">{body}</svg>'
    ).encode()
