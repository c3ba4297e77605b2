"""Shared Markdown generation utilities.

Semantics match the reference emitters in
``/root/reference/src/markdown.rs`` (escape_cell :9-16, build_table :23-61,
format_heading :64-68, build_table_plain :74-97, format_list_item_plain
:102-105, wrap_formatting :112-133, format_list_item :139-146) and
``/root/reference/src/converter/mod.rs:242-260``
(replace_image_alt_by_placeholder).
"""

from __future__ import annotations


def escape_cell(content: str) -> str:
    """Escape pipes/backslashes and fold newlines so a table cell stays one line.

    Order matters: backslash first, then pipe, then CRLF/NL -> <br>, drop CR.
    """
    if (
        "\\" in content or "|" in content
        or "\n" in content or "\r" in content
    ):
        return (
            content.replace("\\", "\\\\")
            .replace("|", "\\|")
            .replace("\r\n", "<br>")
            .replace("\n", "<br>")
            .replace("\r", "")
        )
    return content


def build_table(headers: list[str], rows: list[list[str]]) -> str:
    """Pipe-delimited Markdown table; rows padded/truncated to header count."""
    col_count = len(headers)
    if col_count == 0:
        return ""
    esc = escape_cell
    parts: list[str] = [
        "| " + " | ".join(map(esc, headers)) + " |\n|"
        + "---|" * col_count + "\n"
    ]
    append = parts.append
    for row in rows:
        if len(row) != col_count:  # pad/truncate off the hot path
            # list() first: rows may be any sequence (tuples included)
            row = list(row[:col_count]) + [""] * (col_count - len(row))
        append("| " + " | ".join(map(esc, row)) + " |\n")
    return "".join(parts)


def build_table_plain(headers: list[str], rows: list[list[str]]) -> str:
    """Tab-separated plain-text table: no pipes, no separator, no escaping."""
    col_count = len(headers)
    if col_count == 0:
        return ""
    out = ["\t".join(headers), "\n"]
    append = out.append
    for row in rows:
        if len(row) != col_count:
            row = list(row[:col_count]) + [""] * (col_count - len(row))
        append("\t".join(row))
        append("\n")
    return "".join(out)


def format_heading(level: int, text: str) -> str:
    """``#`` heading, level clamped to 1..=6, single trailing newline."""
    level = max(1, min(6, level))
    return "#" * level + " " + text + "\n"


def wrap_formatting(text: str, bold: bool, italic: bool) -> str:
    """Wrap with **/*/*** markers, hoisting surrounding whitespace outside."""
    if not bold and not italic:
        return text
    trimmed = text.strip()
    if not trimmed:
        return ""
    leading = text[: len(text) - len(text.lstrip())]
    trailing = text[len(text.rstrip()):]
    if bold and italic:
        wrapped = f"***{trimmed}***"
    elif bold:
        wrapped = f"**{trimmed}**"
    else:
        wrapped = f"*{trimmed}*"
    return f"{leading}{wrapped}{trailing}"


def format_list_item(level: int, ordered: bool, counter: int, text: str) -> str:
    """2-space indent per level; ``-`` or ``{n}.`` marker. No trailing newline."""
    indent = "  " * level
    if ordered:
        return f"{indent}{counter}. {text}"
    return f"{indent}- {text}"


def format_list_item_plain(level: int, text: str) -> str:
    """Plain-text list item: indentation only, no marker."""
    return "  " * level + text


def replace_image_alt_by_placeholder(
    markdown: str, placeholder: str, description: str, filename: str
) -> str:
    """Replace exactly the first ``![placeholder](filename)`` occurrence."""
    target = f"![{placeholder}]({filename})"
    replacement = f"![{description}]({filename})"
    return markdown.replace(target, replacement, 1)


# ---- OOXML package-path helpers (ooxml_utils.rs:88-144) ----


def derive_rels_path(file_path: str) -> str:
    """``ppt/slides/slide1.xml`` -> ``ppt/slides/_rels/slide1.xml.rels``."""
    pos = file_path.rfind("/")
    if pos >= 0:
        return f"{file_path[:pos]}/_rels/{file_path[pos + 1:]}.rels"
    return f"_rels/{file_path}.rels"


def normalize_package_path(path: str) -> str:
    """Collapse ``.``/``..`` segments, clamping ``..`` at the package root."""
    out: list[str] = []
    for part in path.split("/"):
        if not part or part == ".":
            continue
        if part == "..":
            if out:
                out.pop()
            continue
        out.append(part)
    return "/".join(out)


def resolve_relative_path(base_dir: str, target: str) -> str:
    if target.startswith("/") or not base_dir:
        joined = target
    else:
        joined = f"{base_dir}/{target}"
    return normalize_package_path(joined)


def resolve_relative_to_file(base_file: str, target: str) -> str:
    pos = base_file.rfind("/")
    base_dir = base_file[:pos] if pos >= 0 else ""
    return resolve_relative_path(base_dir, target)
