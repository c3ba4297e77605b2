"""Pure-stdlib PDF text extraction (north rule: "PDF/layout parse").

The reference converter REJECTS PDFs by design (src/converter/mod.rs —
dispatch parity for that path is kept in kernels/convert.py); this
module is the training-pipeline operator that goes beyond it: pull the
text-showing operators out of PDF content streams with nothing but
stdlib ``zlib`` + ``re``.

Scope (honest): classic PDFs whose content streams are plain or
FlateDecode — covers PDF 1.1-1.4 writers and most simple generators.
Text comes from ``Tj`` / ``'`` / ``"`` / ``TJ`` operators inside BT/ET
blocks; literal strings with all escape forms (\\n, \\t, \\ooo, line
continuations, balanced parens) and hex strings are decoded as
PDFDocEncoding≈Latin-1 (no CMap/ToUnicode — composite-font PDFs
extract garbage-free but possibly empty, flagged via ``n_fonts_skipped``
when a /Type0 font is seen). Layout: ``Td/TD/T*`` and ET close a line;
TJ kerning adjustments <= -180/1000 em insert a space (the standard
word-gap heuristic). Encrypted PDFs raise :class:`PdfError`.

Objects are discovered by scanning ``N G obj ... endobj`` spans rather
than parsing the xref (robust to the linearized/incremental files whose
tables lie); stream lengths come from the actual ``stream``/
``endstream`` delimiters.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")


class PdfError(ValueError):
    """Not a PDF / encrypted / unsupported structure."""


def _decode_literal(body: bytes) -> str:
    """PDF literal string body (between parens) -> text."""
    out = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = body[i]
            if e in b"nrtbf":
                out.append({0x6E: "\n", 0x72: "\r", 0x74: "\t",
                            0x62: "\b", 0x66: "\f"}[e])
                i += 1
            elif e in b"()\\":
                out.append(chr(e))
                i += 1
            elif 0x30 <= e <= 0x37:  # \ooo — up to 3 octal digits
                j = i
                while j < min(i + 3, n) and 0x30 <= body[j] <= 0x37:
                    j += 1
                out.append(chr(int(body[i:j], 8) & 0xFF))
                i = j
            elif e in b"\r\n":  # line continuation
                i += 1
                if e == 0x0D and i < n and body[i] == 0x0A:
                    i += 1
            else:
                out.append(chr(e))
                i += 1
        else:
            out.append(chr(c))
            i += 1
    return "".join(out)


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.|\((?:[^()\\]|\\.)*\))*\)"  # literal string (1 nest)
    rb"|<[0-9A-Fa-f\s]*>"                          # hex string
    rb"|\[|\]"
    rb"|[-+]?\d*\.?\d+"
    rb"|/[^\s/\[\]()<>{}]*"
    rb"|[A-Za-z'\"*]+",
    re.S,  # '.' must span EOLs: '\<newline>' is a line continuation
)


def _ops(stream: bytes):
    """Tokenize one content stream into (operator, operands) events.

    Operands are decoded strings (from literal/hex string tokens) and
    floats, in source order; TJ's bracketed array arrives as the
    operand list of the ``TJ`` event. Name tokens are dropped."""
    operands: list = []
    in_array = False
    array_parts: list = []
    for m in _TOKEN_RE.finditer(stream):
        tok = m.group(0)
        c = tok[:1]
        if c == b"(":
            (array_parts if in_array else operands).append(
                _decode_literal(tok[1:-1])
            )
        elif c == b"<":
            hx = re.sub(rb"\s", b"", tok[1:-1])
            if len(hx) % 2:
                hx += b"0"
            (array_parts if in_array else operands).append(
                bytes.fromhex(hx.decode("ascii")).decode("latin-1")
            )
        elif tok == b"[":
            in_array, array_parts = True, []
        elif tok == b"]":
            in_array = False
        elif c in b"-+0123456789.":
            try:
                num = float(tok)
            except ValueError:
                num = 0.0
            (array_parts if in_array else operands).append(num)
        elif c == b"/":
            continue
        else:  # operator
            if tok == b"TJ":
                yield tok, array_parts
                array_parts = []
            else:
                yield tok, operands
            operands = []


def _shown(args: list) -> str:
    """Concatenate a show-op's operand list; TJ kerning adjustments
    <= -180/1000 em become word gaps."""
    out = []
    for a in args:
        if isinstance(a, str):
            out.append(a)
        elif a <= -180:
            out.append(" ")
    return "".join(out)


def _content_text(stream: bytes) -> str:
    """Walk one content stream's op sequence; emit shown text."""
    lines: list[str] = [""]
    for op, args in _ops(stream):
        if op in (b"Tj", b"TJ"):
            lines[-1] += _shown(args)
        elif op in (b"'", b'"'):
            lines.append(_shown([a for a in args if isinstance(a, str)]))
        elif op in (b"Td", b"TD", b"T*", b"ET"):
            if lines[-1]:
                lines.append("")
    return "\n".join(l for l in lines if l)


def _content_fragments(stream: bytes) -> list[tuple[float, float, str]]:
    """Positioned text fragments (line-anchor x, y, text) from one
    content stream — the LAYOUT view. Tracks the text-line origin
    through Td/TD (relative moves), Tm (absolute set, its e/f
    translation), T* and '/" (next line by the TL leading, which TD
    sets to -ty). Intra-line glyph advance is not modeled: fragments
    anchor at their line start, which is what reading-order sorting
    needs."""
    frags: list[tuple[float, float, str]] = []
    x = y = 0.0
    tl = 0.0
    for op, args in _ops(stream):
        nums = [a for a in args if isinstance(a, float)]
        if op == b"BT":
            x = y = 0.0
        elif op == b"Td" and len(nums) >= 2:
            x += nums[-2]
            y += nums[-1]
        elif op == b"TD" and len(nums) >= 2:
            x += nums[-2]
            y += nums[-1]
            tl = -nums[-1]
        elif op == b"TL" and nums:
            tl = nums[-1]
        elif op == b"Tm" and len(nums) >= 6:
            x, y = nums[-2], nums[-1]
        elif op == b"T*":
            y -= tl
        elif op in (b"Tj", b"TJ"):
            s = _shown(args)
            if s:
                frags.append((x, y, s))
        elif op in (b"'", b'"'):
            y -= tl
            s = _shown([a for a in args if isinstance(a, str)])
            if s:
                frags.append((x, y, s))
    return frags


def _check_header(data: bytes) -> None:
    if not data.startswith(b"%PDF-"):
        raise PdfError("not a PDF (missing %PDF- header)")
    if re.search(rb"/Encrypt\b", data):
        raise PdfError("encrypted PDF not supported")


def _content_streams(data: bytes):
    """Yield each decoded content stream (contains BT text blocks)."""
    for om in _OBJ_RE.finditer(data):
        body = om.group(3)
        sm = _STREAM_RE.search(body)
        if not sm:
            continue
        raw_full = sm.group(1)
        head = body[: sm.start()]
        # candidate data spans, most-reliable first: the dict's direct
        # /Length, then EOL-stripped (the EOL before 'endstream' is a
        # delimiter — but compressed data can itself END in \n or \r,
        # ~1/64 of Flate streams, so a blind strip corrupts those),
        # then the raw span
        candidates = []
        mlen = re.match(rb".*?/Length\s+(\d+)(?!\s+\d+\s+R)", head, re.S)
        if mlen:
            candidates.append(raw_full[: int(mlen.group(1))])
        if raw_full.endswith(b"\r\n"):
            candidates.append(raw_full[:-2])
        elif raw_full.endswith((b"\n", b"\r")):
            candidates.append(raw_full[:-1])
        candidates.append(raw_full)
        if b"/FlateDecode" in head:
            raw = None
            for cand in candidates:
                try:
                    raw = zlib.decompress(cand)
                    break
                except zlib.error:
                    continue
            if raw is None:
                continue  # image or corrupt stream — skip
        elif re.search(rb"/Filter\b", head):
            continue  # other filters (DCT, LZW, ...) — not text
        else:
            raw = candidates[0]
        # content streams contain text blocks; skip fonts/images
        if b"BT" in raw:
            yield raw


def extract_pdf_text(data: bytes) -> dict:
    """Extract text from a PDF.

    Returns ``{"text", "n_pages", "n_streams", "n_fonts_skipped"}``.
    Raises :class:`PdfError` on non-PDF or encrypted input.
    """
    _check_header(data)
    texts: list[str] = []
    n_streams = 0
    for raw in _content_streams(data):
        n_streams += 1
        t = _content_text(raw)
        if t:
            texts.append(t)
    return {
        "text": "\n".join(texts),
        "n_pages": len(re.findall(rb"/Type\s*/Page[^s]", data)),
        "n_streams": n_streams,
        "n_fonts_skipped": len(_TYPE0_RE.findall(data)),
    }


def extract_pdf_layout(data: bytes) -> list[dict]:
    """LAYOUT view: positioned text lines in reading order.

    Each content stream (page, in stream order) yields its fragments
    anchored at their text-line origin; fragments sharing a (rounded)
    baseline merge left-to-right into one line, and lines sort
    top-to-bottom (PDF y grows upward). Returns
    ``[{"page", "line", "x", "y", "text"}, ...]``.
    """
    _check_header(data)
    out: list[dict] = []
    for page, raw in enumerate(_content_streams(data)):
        by_line: dict[float, list[tuple[float, str]]] = {}
        for x, y, s in _content_fragments(raw):
            by_line.setdefault(round(y, 3), []).append((x, s))
        for li, yk in enumerate(sorted(by_line, reverse=True)):
            parts = sorted(by_line[yk], key=lambda p: p[0])
            out.append({
                "page": page, "line": li, "x": parts[0][0], "y": yk,
                "text": " ".join(p[1] for p in parts),
            })
    return out


# --------------------------------------------------------------------------
# minimal writer (tests + deterministic synthetic corpora)
# --------------------------------------------------------------------------

def _esc(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        .encode("latin-1", "replace")
    )


def build_pdf(pages: list[list[str]], compress: bool = True) -> bytes:
    """Write a minimal valid PDF: one content stream per page, each line
    shown with Tj after a Td line move — the shapes the extractor (and
    every classic text PDF) uses. With ``compress``, streams are
    FlateDecode."""
    objs: list[bytes] = []

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)  # 1-based object number

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    page_ids = []
    content_ids = []
    for lines in pages:
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for i, line in enumerate(lines):
            if i:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _esc(line) + b") Tj")
        ops.append(b"ET")
        stream = b" ".join(ops)
        filt = b""
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        content_ids.append(add(
            b"<< " + filt + b"/Length " + str(len(stream)).encode()
            + b" >>\nstream\n" + stream + b"\nendstream"
        ))
    pages_id = len(objs) + len(pages) + 1
    for cid in content_ids:
        page_ids.append(add(
            b"<< /Type /Page /Parent " + str(pages_id).encode()
            + b" 0 R /MediaBox [0 0 612 792] /Contents "
            + str(cid).encode() + b" 0 R /Resources << /Font << /F1 "
            + str(font).encode() + b" 0 R >> >> >>"
        ))
    kids = b" ".join(str(p).encode() + b" 0 R" for p in page_ids)
    assert add(
        b"<< /Type /Pages /Kids [" + kids + b"] /Count "
        + str(len(pages)).encode() + b" >>"
    ) == pages_id
    catalog = add(b"<< /Type /Catalog /Pages " + str(pages_id).encode()
                  + b" 0 R >>")
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, 1):
        offsets.append(len(out))
        out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root " + str(catalog).encode() + b" 0 R >>\n"
            b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n")
    return bytes(out)
