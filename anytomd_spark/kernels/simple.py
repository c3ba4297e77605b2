"""CSV / JSON / XML / code / plain-text / ipynb conversion kernels.

Reference semantics:
- CSV:   /root/reference/src/converter/csv.rs:18-84 (RFC-4180, flexible row
         widths, first record = header, markdown pipe table, plain = TSV)
- JSON:  /root/reference/src/converter/json.rs:16-48 (pretty 2-space indent,
         sorted keys — serde_json BTreeMap ordering — in a ```json fence)
- XML:   /root/reference/src/converter/xml.rs:26-86 (quick-xml event
         pretty-printer, 2-space indent, text trimmed both ends)
- code:  /root/reference/src/converter/code.rs:13-99 (extension -> language
         id, content trim_end'd, fenced)
- txt:   /root/reference/src/converter/plain_text.rs:21-38 (passthrough)
- ipynb: /root/reference/src/converter/ipynb.rs:19-165
"""

from __future__ import annotations

import csv as _csv
import io
import json as _json
import re

# C-accelerated when available (it is on CPython); the ensure_ascii=False
# string emitter the stdlib itself uses
from json.encoder import encode_basestring as _enc_str

from anytomd_spark.kernels.decode import (
    MALFORMED_SEGMENT,
    SKIPPED_ELEMENT,
    decode_text,
    warning,
)
from anytomd_spark.kernels.markdown import build_table, build_table_plain


class MalformedDocument(Exception):
    """Per-document conversion failure (error.rs MalformedDocument)."""


# --------------------------------------------------------------------------
# CSV
# --------------------------------------------------------------------------

def convert_csv(data: bytes) -> dict:
    text, enc_warning = decode_text(data)
    try:
        records = list(_csv.reader(io.StringIO(text)))
    except _csv.Error as e:  # pragma: no cover - csv module rarely raises
        raise MalformedDocument(f"failed to parse CSV row: {e}") from e
    if not records:
        return _result("", "")
    headers = records[0]
    rows = records[1:]
    markdown = build_table(headers, rows)
    plain = build_table_plain(headers, rows)
    warnings = [enc_warning] if enc_warning else []
    return _result(markdown, plain, warnings=warnings)


# --------------------------------------------------------------------------
# JSON
# --------------------------------------------------------------------------

def _float_repr(o: float) -> str:
    if o != o:
        return "NaN"
    if o == _INF:
        return "Infinity"
    if o == -_INF:
        return "-Infinity"
    return float.__repr__(o)


_INF = float("inf")


def _pretty_sorted(o, ind: str, out: list) -> None:
    """Emit ``json.dumps(o, indent=2, ensure_ascii=False, sort_keys=True)``
    byte-for-byte, for the types :func:`json.loads` can produce.

    The stdlib routes every ``indent is not None`` dump through its
    pure-Python generator encoder (the C encoder only handles compact
    form), which made JSON ~6% of mixed-corpus convert CPU; this direct
    recursive emitter uses the same C ``encode_basestring`` for strings
    and is ~3x faster. Differential-locked against the stdlib in
    tests/test_properties.py.
    """
    if o is None:
        out.append("null")
    elif o is True:
        out.append("true")
    elif o is False:
        out.append("false")
    elif isinstance(o, str):
        out.append(_enc_str(o))
    elif isinstance(o, int):
        out.append(int.__repr__(o))
    elif isinstance(o, float):
        out.append(_float_repr(o))
    elif isinstance(o, list):
        if not o:
            out.append("[]")
            return
        inner = ind + "  "
        first = True
        for v in o:
            out.append("[\n" + inner if first else ",\n" + inner)
            first = False
            _pretty_sorted(v, inner, out)
        out.append("\n" + ind + "]")
    elif isinstance(o, dict):
        if not o:
            out.append("{}")
            return
        inner = ind + "  "
        first = True
        for k, v in sorted(o.items()):
            out.append("{\n" + inner if first else ",\n" + inner)
            first = False
            out.append(_enc_str(k))
            out.append(": ")
            _pretty_sorted(v, inner, out)
        out.append("\n" + ind + "}")
    else:  # non-loads type (caller passed a custom object): stdlib path
        out.append(_json.dumps(
            o, indent=2, ensure_ascii=False, sort_keys=True,
        ) if ind == "" else _indent_shift(o, ind))


def _indent_shift(o, ind: str) -> str:
    s = _json.dumps(o, indent=2, ensure_ascii=False, sort_keys=True)
    return s.replace("\n", "\n" + ind)


def convert_json(data: bytes) -> dict:
    text, enc_warning = decode_text(data)
    try:
        value = _json.loads(text)
    except ValueError as e:
        raise MalformedDocument(f"invalid JSON: {e}") from e
    # serde_json::Value uses a BTreeMap => keys sorted; to_string_pretty uses
    # 2-space indent, ", " / ": " item separators (json.rs:29-32).
    parts: list[str] = []
    _pretty_sorted(value, "", parts)
    pretty = "".join(parts)
    markdown = f"```json\n{pretty}\n```\n"
    plain = f"{pretty}\n"
    warnings = [enc_warning] if enc_warning else []
    return _result(markdown, plain, warnings=warnings)


# --------------------------------------------------------------------------
# XML — event-stream pretty-printer matching quick-xml's Writer-with-indent
# --------------------------------------------------------------------------

_XML_TOKEN = re.compile(
    r"<\?.*?\?>"          # processing instruction / declaration
    r"|<!--.*?-->"        # comment
    r"|<!\[CDATA\[.*?\]\]>"  # CDATA
    r"|<!DOCTYPE[^>]*>"   # doctype (no internal-subset support)
    r"|</[^>]+>"          # end tag
    r"|<[^>]+/>"          # empty tag
    r"|<[^>]+>"           # start tag
    r"|[^<]+",            # text
    re.DOTALL,
)

_TAG_NAME = re.compile(r"[A-Za-z_:][\w.\-:]*")


def _prettify_xml(text: str) -> str:
    """Re-indent an XML event stream with 2 spaces, quick-xml Writer style.

    Every event except text writes ``\\n + indent`` before itself when the
    previous event was not text; text events suppress the next line break
    (xml.rs:26-55). Raw tag/text content is copied verbatim so escapes,
    attributes, and namespaces are byte-preserved.
    """
    out: list[str] = []
    level = 0
    should_line_break = False  # first event gets no leading newline
    stack: list[str] = []
    pos = 0
    n = len(text)
    saw_element = False
    while pos < n:
        m = _XML_TOKEN.match(text, pos)
        if m is None:
            raise MalformedDocument("invalid XML: unparseable content")
        token = m.group(0)
        pos = m.end()
        if token.startswith("<"):
            if token.startswith("</"):
                name = _TAG_NAME.match(token[2:].strip())
                if name is None or not stack or stack[-1] != name.group(0):
                    raise MalformedDocument("invalid XML: mismatched end tag")
                stack.pop()
                level -= 1
                if should_line_break:
                    out.append("\n" + "  " * level)
                out.append(token)
                should_line_break = True
            elif token.startswith("<!--") or token.startswith("<?") or token.startswith("<!DOCTYPE"):
                if token.startswith("<!--") and not token.endswith("-->"):
                    raise MalformedDocument("invalid XML: unterminated comment")
                if should_line_break:
                    out.append("\n" + "  " * level)
                out.append(token)
                should_line_break = True
            elif token.startswith("<![CDATA["):
                # CDATA is a text event: inline, suppresses next break
                out.append(token)
                should_line_break = False
                saw_element = True
            elif token.endswith("/>"):
                if should_line_break:
                    out.append("\n" + "  " * level)
                out.append(token)
                should_line_break = True
                saw_element = True
            else:
                name = _TAG_NAME.match(token[1:].strip())
                if name is None:
                    raise MalformedDocument("invalid XML: bad start tag")
                if should_line_break:
                    out.append("\n" + "  " * level)
                out.append(token)
                stack.append(name.group(0))
                level += 1
                should_line_break = True
                saw_element = True
        else:
            # Text event: trim both ends (trim_text_start/end); drop if empty
            trimmed = token.strip()
            if "&" in trimmed:
                _validate_entities(trimmed)
            if trimmed:
                out.append(trimmed)
                should_line_break = False
    if stack:
        raise MalformedDocument("invalid XML: unclosed element")
    if not saw_element:
        raise MalformedDocument("invalid XML: no root element")
    return "".join(out)


_ENTITY = re.compile(r"&(#[0-9]+|#x[0-9a-fA-F]+|[A-Za-z][\w.\-]*);")


def _validate_entities(text: str) -> None:
    """quick-xml rejects bare '&' not forming an entity reference."""
    i = 0
    while True:
        i = text.find("&", i)
        if i < 0:
            return
        m = _ENTITY.match(text, i)
        if m is None:
            raise MalformedDocument("invalid XML: bare '&'")
        i = m.end()


def convert_xml(data: bytes) -> dict:
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError as e:
        raise MalformedDocument(f"invalid UTF-8: {e}") from e
    if text.startswith("﻿"):
        text = text[1:]
    if not text.strip():
        raise MalformedDocument("empty XML input")
    pretty = _prettify_xml(text)
    return _result(f"```xml\n{pretty}\n```\n", f"{pretty}\n")


# --------------------------------------------------------------------------
# Code
# --------------------------------------------------------------------------

_LANGUAGE_FOR_EXT = {
    **dict.fromkeys(("c", "h"), "c"),
    **dict.fromkeys(("cpp", "cc", "cxx", "hpp", "hxx", "hh"), "cpp"),
    **dict.fromkeys(("py", "pyw"), "python"),
    **dict.fromkeys(("js", "mjs", "cjs"), "javascript"),
    "jsx": "jsx",
    **dict.fromkeys(("ts", "mts", "cts"), "typescript"),
    "tsx": "tsx",
    "rs": "rust",
    "go": "go",
    "java": "java",
    **dict.fromkeys(("kt", "kts"), "kotlin"),
    "rb": "ruby",
    "swift": "swift",
    "cs": "csharp",
    "php": "php",
    **dict.fromkeys(("sh", "bash", "zsh", "fish"), "bash"),
    **dict.fromkeys(("pl", "pm"), "perl"),
    "lua": "lua",
    "r": "r",
    "scala": "scala",
    "dart": "dart",
    **dict.fromkeys(("ex", "exs"), "elixir"),
    "erl": "erlang",
    "hs": "haskell",
    **dict.fromkeys(("ml", "mli"), "ocaml"),
    "sql": "sql",
    **dict.fromkeys(("m", "mm"), "objectivec"),
    "zig": "zig",
    "nim": "nim",
    "v": "v",
    "groovy": "groovy",
    "ps1": "powershell",
    **dict.fromkeys(("bat", "cmd"), "batch"),
}


def convert_code(data: bytes, extension: str = "code") -> dict:
    text, enc_warning = decode_text(data)
    language = _LANGUAGE_FOR_EXT.get(extension, "code")
    content = text.rstrip()
    markdown = f"```{language}\n{content}\n```\n"
    plain = f"{content}\n"
    warnings = [enc_warning] if enc_warning else []
    return _result(markdown, plain, warnings=warnings)


# --------------------------------------------------------------------------
# Plain text
# --------------------------------------------------------------------------

def convert_plain_text(data: bytes) -> dict:
    text, enc_warning = decode_text(data)
    warnings = [enc_warning] if enc_warning else []
    return _result(text, text, warnings=warnings)


# --------------------------------------------------------------------------
# IPYNB
# --------------------------------------------------------------------------

def convert_ipynb(data: bytes) -> dict:
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError as e:
        raise MalformedDocument(f"invalid UTF-8: {e}") from e
    try:
        root = _json.loads(text)
    except ValueError as e:
        raise MalformedDocument(f"invalid JSON: {e}") from e
    if not isinstance(root, dict):
        raise MalformedDocument("notebook root is not a JSON object")
    cells = root.get("cells")
    if not isinstance(cells, list):
        raise MalformedDocument('notebook missing "cells" array')

    language = _detect_nb_language(root)
    sections: list[str] = []
    plain_sections: list[str] = []
    title: str | None = None
    warnings: list[dict] = []

    for i, cell in enumerate(cells):
        cell_type = cell.get("cell_type", "") if isinstance(cell, dict) else ""
        source = _join_source(cell.get("source") if isinstance(cell, dict) else None)
        if cell_type == "markdown":
            if title is None:
                title = _extract_heading_title(source)
            if source:
                sections.append(source)
                plain_sections.append(source)
        elif cell_type == "code":
            if source:
                sections.append(f"```{language}\n{source}\n```")
                plain_sections.append(source)
        elif cell_type == "raw":
            if source:
                sections.append(f"```\n{source}\n```")
                plain_sections.append(source)
        else:
            warnings.append(
                warning(
                    SKIPPED_ELEMENT,
                    f'unknown cell type: "{cell_type}"',
                    f"cell {i}",
                )
            )

    meta = root.get("metadata")
    if isinstance(meta, dict):
        meta_title = meta.get("title")
        if isinstance(meta_title, str) and meta_title:
            title = meta_title

    return _result(
        "\n\n".join(sections), "\n\n".join(plain_sections), title=title,
        warnings=warnings,
    )


def _detect_nb_language(root: dict) -> str:
    meta = root.get("metadata")
    if isinstance(meta, dict):
        ks = meta.get("kernelspec")
        if isinstance(ks, dict):
            lang = ks.get("language")
            if isinstance(lang, str) and lang:
                return lang
        li = meta.get("language_info")
        if isinstance(li, dict):
            lang = li.get("name")
            if isinstance(lang, str) and lang:
                return lang
    return "python"


def _join_source(source) -> str:
    if isinstance(source, list):
        return "".join(s for s in source if isinstance(s, str))
    if isinstance(source, str):
        return source
    return ""


def _extract_heading_title(markdown: str) -> str | None:
    for line in markdown.splitlines():
        trimmed = line.strip()
        if trimmed.startswith("# "):
            heading = trimmed[2:].strip()
            if heading:
                return heading
    return None


# --------------------------------------------------------------------------

def _result(
    markdown: str,
    plain_text: str,
    title: str | None = None,
    warnings: list[dict] | None = None,
) -> dict:
    return {
        "markdown": markdown,
        "plain_text": plain_text,
        "title": title,
        "warnings": warnings or [],
    }
