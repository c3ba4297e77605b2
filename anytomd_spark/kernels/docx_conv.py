"""DOCX to Markdown conversion kernel.

Reimplements ``/root/reference/src/converter/docx.rs``: styles parsing
(:56-139), numbering (:147-277), the document.xml state machine
(parse_document :356-1041), run merging (:317-347), paragraph finalization
(:1090-1153), and the ZIP orchestration (convert_inner :1162-1260). Images
follow the default no-describer path (placeholder -> original alt).

Expat caveat: ``<x/>`` and ``<x></x>`` both surface as Start+End, while
quick-xml distinguishes Empty events. The reference handles both shapes
identically for every tag it inspects, except that a literally empty
``<w:p/>`` would not run the paragraph-end handler there; here it runs and
finalizes an empty paragraph, which emits nothing either.
"""

from __future__ import annotations

from anytomd_spark.kernels.decode import SKIPPED_ELEMENT, warning
from anytomd_spark.kernels.markdown import (
    build_table,
    build_table_plain,
    format_heading,
    format_list_item,
    format_list_item_plain,
    resolve_relative_to_file,
    wrap_formatting,
)
from anytomd_spark.kernels.ooxml import (
    attr_local,
    attr_suffix,
    open_zip,
    parse_relationships,
    parse_xml_events,
    parse_xml_events_raw,
    read_zip_text,
    resolve_image_placeholders,
    validate_zip_budget,
)
from anytomd_spark.kernels.simple import MalformedDocument

_ORDERED_FORMATS = {
    "decimal", "upperRoman", "lowerRoman", "upperLetter", "lowerLetter",
    "decimalZero",
}


def _heading_level_from_id(style_id: str) -> int | None:
    lower = style_id.lower()
    if lower.startswith("heading"):
        rest = lower[len("heading"):]
        if rest.isdigit():
            level = int(rest)
            if 1 <= level <= 9:
                return level
    return None


def _heading_level_from_name(name: str) -> int | None:
    trimmed = name.lower().strip()
    if trimmed.startswith("heading"):
        rest = trimmed[len("heading"):].strip()
        if rest.isdigit():
            level = int(rest)
            if 1 <= level <= 9:
                return level
    return None


def parse_styles(xml: str) -> dict[str, int]:
    """styles.xml: styleId -> heading level (docx.rs:56-139)."""
    styles: dict[str, int] = {}
    state = {"style_id": None, "level": None}

    def start(local, attrs):
        if local == "style":
            state["style_id"] = None
            state["level"] = None
            val = attr_local(attrs, "styleId")
            if val is not None:
                level = _heading_level_from_id(val)
                if level is not None:
                    state["level"] = level
                state["style_id"] = val
        elif local == "name" and state["style_id"] is not None:
            val = attr_local(attrs, "val")
            if val is not None:
                level = _heading_level_from_name(val)
                if level is not None:
                    state["level"] = level

    def end(local):
        if local == "style":
            if state["style_id"] is not None and state["level"] is not None:
                styles[state["style_id"]] = state["level"]
            state["style_id"] = None
            state["level"] = None

    parse_xml_events(xml, start, end, lambda d: None)
    return styles


def parse_numbering(xml: str) -> dict[tuple[str, int], bool]:
    """numbering.xml: (numId, level) -> ordered (docx.rs:147-277)."""
    abstract_defs: dict[str, list[tuple[int, bool]]] = {}
    num_to_abstract: dict[str, str] = {}
    st = {
        "abstract_id": None, "lvl": None, "in_abstract": False,
        "in_lvl": False, "in_num": False, "num_id": None,
    }

    def start(local, attrs):
        if local == "abstractNum":
            st["in_abstract"] = True
            val = attr_local(attrs, "abstractNumId")
            if val is not None:
                st["abstract_id"] = val
                abstract_defs.setdefault(val, [])
        elif local == "lvl" and st["in_abstract"]:
            st["in_lvl"] = True
            val = attr_local(attrs, "ilvl")
            if val is not None and val.isdigit():
                st["lvl"] = int(val)
            else:
                st["lvl"] = None
        elif local == "numFmt" and st["in_lvl"]:
            if st["abstract_id"] is not None and st["lvl"] is not None:
                val = attr_local(attrs, "val")
                if val is not None:
                    abstract_defs.setdefault(st["abstract_id"], []).append(
                        (st["lvl"], val in _ORDERED_FORMATS)
                    )
        elif local == "num":
            st["in_num"] = True
            val = attr_local(attrs, "numId")
            if val is not None:
                st["num_id"] = val
        elif local == "abstractNumId" and st["in_num"]:
            if st["num_id"] is not None:
                val = attr_local(attrs, "val")
                if val is not None:
                    num_to_abstract[st["num_id"]] = val

    def end(local):
        if local == "abstractNum":
            st["in_abstract"] = False
            st["abstract_id"] = None
        elif local == "lvl":
            st["in_lvl"] = False
            st["lvl"] = None
        elif local == "num":
            st["in_num"] = False
            st["num_id"] = None

    parse_xml_events(xml, start, end, lambda d: None)

    result: dict[tuple[str, int], bool] = {}
    for num_id, abs_id in num_to_abstract.items():
        for lvl, ordered in abstract_defs.get(abs_id, ()):
            result[(num_id, lvl)] = ordered
    return result


def _is_val_false(attrs: dict) -> bool:
    val = attr_local(attrs, "val")
    if val is None:
        return False
    return val == "0" or val.lower() == "false"


_NORMAL = ("normal",)


def _resolve_paragraph_kind(style_val: str, styles: dict[str, int]):
    level = _heading_level_from_id(style_val)
    if level is not None:
        return ("heading", max(1, min(6, level)))
    if style_val in styles:
        return ("heading", max(1, min(6, styles[style_val])))
    return _NORMAL


def _merge_and_format_runs(runs: list[tuple[str, bool, bool]]) -> str:
    """Merge adjacent same-format segments, then wrap once per group."""
    if not runs:
        return ""
    result: list[str] = []
    i = 0
    n = len(runs)
    while i < n:
        _, bold, italic = runs[i][1], runs[i][1], runs[i][2]
        bold, italic = runs[i][1], runs[i][2]
        j = i + 1
        parts = [runs[i][0]]
        while j < n and runs[j][1] == bold and runs[j][2] == italic:
            parts.append(runs[j][0])
            j += 1
        result.append(wrap_formatting("".join(parts), bold, italic))
        i = j
    return "".join(result)


def _merge_runs_plain(runs: list[tuple[str, bool, bool]]) -> str:
    return "".join(r[0] for r in runs)


class _DocState:
    """Mutable parse_document state (docx.rs:356-438)."""

    def __init__(self) -> None:
        self.in_paragraph = False
        self.in_run = False
        self.in_text = False
        self.in_run_properties = False
        self.para_kind = _NORMAL
        self.para_runs: list[tuple[str, bool, bool]] = []
        self.para_runs_plain: list[tuple[str, bool, bool]] = []
        self.run_bold = False
        self.run_italic = False
        self.in_hyperlink = False
        self.hyperlink_url: str | None = None
        self.hyperlink_runs: list[tuple[str, bool, bool]] = []
        self.hyperlink_runs_plain: list[tuple[str, bool, bool]] = []
        self.in_para_properties = False
        self.in_num_pr = False
        self.num_id: str | None = None
        self.ilvl: int | None = None

    def snapshot(self) -> dict:
        return {k: (list(v) if isinstance(v, list) else v) for k, v in self.__dict__.items()}

    def restore(self, snap: dict) -> None:
        self.__dict__.update(snap)

    def reset(self) -> None:
        self.__init__()


def parse_document(
    xml: str,
    styles: dict[str, int],
    relationships: dict[str, tuple[str, str]],
    numbering: dict[tuple[str, int], bool],
    image_counter: list[int],
) -> tuple[str, str, str | None, list[dict], list[dict]]:
    warnings: list[dict] = []
    out: list[str] = []
    plain_out: list[str] = []
    title: list[str | None] = [None]

    s = _DocState()
    ctx = {
        "in_body": False,
        "last_was_list": False,
        "in_table": False, "in_table_row": False, "in_table_cell": False,
        "table_rows": [], "current_row": [], "cell_text": [],
        "cell_para_count": 0,
        "table_rows_plain": [], "current_row_plain": [], "cell_text_plain": [],
        "in_drawing": False, "image_alt": None, "image_rel_id": None,
        "in_mc_choice": False, "mc_depth": 0,
        "in_pict": False, "in_txbx": False, "saved": None,
    }
    list_counters: dict[tuple[str, int], int] = {}
    image_infos: list[dict] = []

    def push_seg(seg: tuple[str, bool, bool], seg_plain=None):
        if seg_plain is None:
            seg_plain = seg
        if s.in_hyperlink:
            s.hyperlink_runs.append(seg)
            s.hyperlink_runs_plain.append(seg_plain)
        else:
            s.para_runs.append(seg)
            s.para_runs_plain.append(seg_plain)

    local_names: dict[str, str] = {}

    def start(name, attrs):
        try:
            local = local_names[name]
        except KeyError:
            local = local_names[name] = name[name.rfind(":") + 1:]
        if ctx["in_mc_choice"]:
            ctx["mc_depth"] += 1
            return
        if local == "AlternateContent":
            return
        if local == "Choice":
            ctx["in_mc_choice"] = True
            ctx["mc_depth"] = 1
            return
        if local == "Fallback":
            return
        if local == "pict" and s.in_run:
            ctx["in_pict"] = True
            return
        if local == "txbxContent" and ctx["in_pict"]:
            ctx["saved"] = s.snapshot()
            s.reset()
            ctx["in_txbx"] = True
            return
        if ctx["in_pict"] and local in ("shape", "rect", "roundrect", "textbox", "group"):
            return

        if local == "body":
            ctx["in_body"] = True
        elif local == "tbl" and ctx["in_body"]:
            ctx["in_table"] = True
            ctx["table_rows"] = []
            ctx["table_rows_plain"] = []
        elif local == "tr" and ctx["in_table"]:
            ctx["in_table_row"] = True
            ctx["current_row"] = []
            ctx["current_row_plain"] = []
        elif local == "tc" and ctx["in_table_row"]:
            ctx["in_table_cell"] = True
            ctx["cell_text"] = []
            ctx["cell_text_plain"] = []
            ctx["cell_para_count"] = 0
        elif local == "p" and ctx["in_body"]:
            s.in_paragraph = True
            s.para_kind = _NORMAL
            s.para_runs = []
            s.para_runs_plain = []
            s.num_id = None
            s.ilvl = None
        elif local == "pPr" and s.in_paragraph:
            s.in_para_properties = True
        elif local == "pStyle" and s.in_para_properties:
            val = attr_local(attrs, "val")
            if val is not None:
                s.para_kind = _resolve_paragraph_kind(val, styles)
        elif local == "numPr" and s.in_para_properties:
            s.in_num_pr = True
        elif local == "ilvl" and s.in_num_pr:
            val = attr_local(attrs, "val")
            if val is not None and val.isdigit():
                s.ilvl = int(val)
        elif local == "numId" and s.in_num_pr:
            val = attr_local(attrs, "val")
            if val is not None and val != "0":
                s.num_id = val
        elif local == "hyperlink" and s.in_paragraph:
            s.in_hyperlink = True
            s.hyperlink_runs = []
            s.hyperlink_runs_plain = []
            s.hyperlink_url = None
            rid = attr_suffix(attrs, "id")
            if rid is not None:
                rel = relationships.get(rid)
                if rel is not None:
                    s.hyperlink_url = rel[0]
                else:
                    warnings.append(warning(
                        SKIPPED_ELEMENT,
                        f"hyperlink relationship '{rid}' not found in rels",
                        rid,
                    ))
        elif local == "r" and s.in_paragraph:
            s.in_run = True
            s.run_bold = False
            s.run_italic = False
        elif local == "rPr" and s.in_run:
            s.in_run_properties = True
        elif local == "b" and s.in_run_properties:
            s.run_bold = not _is_val_false(attrs)
        elif local == "i" and s.in_run_properties:
            s.run_italic = not _is_val_false(attrs)
        elif local == "t" and s.in_run:
            s.in_text = True
        elif local == "br" and s.in_run:
            push_seg(("\n", False, False))
        elif local == "drawing" and s.in_run:
            ctx["in_drawing"] = True
            ctx["image_alt"] = None
            ctx["image_rel_id"] = None
        elif local == "docPr" and ctx["in_drawing"]:
            val = attr_local(attrs, "descr")
            if val:
                ctx["image_alt"] = val
        elif local == "blip" and ctx["in_drawing"]:
            val = attr_suffix(attrs, "embed")
            if val is not None:
                ctx["image_rel_id"] = val

    def text(data):
        if ctx["in_mc_choice"]:
            return
        if s.in_text and s.in_run:
            push_seg((data, s.run_bold, s.run_italic))

    def end(name):
        try:
            local = local_names[name]
        except KeyError:
            local = local_names[name] = name[name.rfind(":") + 1:]
        if ctx["in_mc_choice"]:
            ctx["mc_depth"] -= 1
            if ctx["mc_depth"] == 0:
                ctx["in_mc_choice"] = False
            return
        if local in ("AlternateContent", "Fallback"):
            return
        if local == "txbxContent" and ctx["in_txbx"]:
            ctx["in_txbx"] = False
            if ctx["saved"] is not None:
                s.restore(ctx["saved"])
                ctx["saved"] = None
            return
        if local == "pict" and ctx["in_pict"]:
            ctx["in_pict"] = False
            return
        if ctx["in_pict"] and local in ("shape", "rect", "roundrect", "textbox", "group"):
            return

        if local == "body":
            ctx["in_body"] = False
        elif local == "tbl" and ctx["in_table"]:
            rows = ctx["table_rows"]
            if rows:
                out.append(build_table(rows[0], rows[1:]))
                out.append("\n")
                rows_p = ctx["table_rows_plain"]
                plain_out.append(build_table_plain(rows_p[0], rows_p[1:]))
                plain_out.append("\n")
            ctx["in_table"] = False
            ctx["table_rows"] = []
            ctx["table_rows_plain"] = []
            ctx["last_was_list"] = False
        elif local == "tr" and ctx["in_table_row"]:
            ctx["table_rows"].append(ctx["current_row"])
            ctx["current_row"] = []
            ctx["table_rows_plain"].append(ctx["current_row_plain"])
            ctx["current_row_plain"] = []
            ctx["in_table_row"] = False
        elif local == "tc" and ctx["in_table_cell"]:
            ctx["current_row"].append("".join(ctx["cell_text"]).strip())
            ctx["cell_text"] = []
            ctx["current_row_plain"].append("".join(ctx["cell_text_plain"]).strip())
            ctx["cell_text_plain"] = []
            ctx["in_table_cell"] = False
        elif local == "p" and s.in_paragraph:
            if s.num_id is not None and s.ilvl is not None:
                ordered = numbering.get((s.num_id, s.ilvl), False)
                s.para_kind = ("list", ordered, s.ilvl, s.num_id)
            para_text = _merge_and_format_runs(s.para_runs)
            para_text_plain = _merge_runs_plain(s.para_runs_plain)
            if ctx["in_table_cell"]:
                if ctx["cell_para_count"] > 0 and para_text:
                    ctx["cell_text"].append(" ")
                ctx["cell_text"].append(para_text.strip())
                if ctx["cell_para_count"] > 0 and para_text_plain:
                    ctx["cell_text_plain"].append(" ")
                ctx["cell_text_plain"].append(para_text_plain.strip())
                ctx["cell_para_count"] += 1
            else:
                is_list = s.para_kind[0] == "list"
                _finalize_paragraph(
                    s.para_kind, para_text, para_text_plain, out, plain_out,
                    title, list_counters, ctx["last_was_list"],
                )
                ctx["last_was_list"] = is_list
            s.in_paragraph = False
            s.para_runs = []
            s.para_runs_plain = []
            s.num_id = None
            s.ilvl = None
        elif local == "pPr":
            s.in_para_properties = False
        elif local == "numPr":
            s.in_num_pr = False
        elif local == "hyperlink" and s.in_hyperlink:
            link_text = _merge_and_format_runs(s.hyperlink_runs)
            link_text_plain = _merge_runs_plain(s.hyperlink_runs_plain)
            if s.hyperlink_url is not None:
                link_md = f"[{link_text}]({s.hyperlink_url})"
            else:
                link_md = link_text
            s.para_runs.append((link_md, False, False))
            s.para_runs_plain.append((link_text_plain, False, False))
            s.in_hyperlink = False
            s.hyperlink_runs = []
            s.hyperlink_runs_plain = []
            s.hyperlink_url = None
        elif local == "rPr":
            s.in_run_properties = False
        elif local == "r":
            s.in_run = False
            s.in_text = False
            s.run_bold = False
            s.run_italic = False
        elif local == "t":
            s.in_text = False
        elif local == "drawing" and ctx["in_drawing"]:
            rel_id = ctx["image_rel_id"]
            if rel_id is not None:
                rel = relationships.get(rel_id)
                filename = rel[0].rsplit("/", 1)[-1] if rel else ""
                if filename:
                    original_alt = ctx["image_alt"] or ""
                    placeholder = f"__img_{image_counter[0]}__"
                    image_counter[0] += 1
                    image_infos.append({
                        "placeholder": placeholder,
                        "original_alt": original_alt,
                        "filename": filename,
                        "bytes_key": rel_id,
                    })
                    push_seg(
                        (f"![{placeholder}]({filename})", False, False),
                        (placeholder, False, False),
                    )
                else:
                    warnings.append(warning(
                        SKIPPED_ELEMENT,
                        f"image relationship '{rel_id}' not found in rels",
                        rel_id,
                    ))
            ctx["in_drawing"] = False
            ctx["image_alt"] = None
            ctx["image_rel_id"] = None

    parse_xml_events_raw(xml, start, end, text)

    markdown = "".join(out).rstrip()
    if markdown:
        markdown += "\n"
    plain_text = "".join(plain_out).rstrip()
    if plain_text:
        plain_text += "\n"
    return markdown, plain_text, title[0], warnings, image_infos


def _finalize_paragraph(
    kind, text, text_plain, out, plain_out, title, list_counters, last_was_list
):
    trimmed = text.strip()
    trimmed_plain = text_plain.strip()
    if not trimmed:
        return
    if kind[0] == "heading":
        level = kind[1]
        if last_was_list:
            out.append("\n")
            plain_out.append("\n")
        out.append(format_heading(level, trimmed))
        out.append("\n")
        plain_out.append(trimmed_plain)
        plain_out.append("\n\n")
        if level == 1 and title[0] is None:
            title[0] = trimmed_plain
    elif kind[0] == "list":
        _, ordered, level, num_id = kind
        if ordered:
            key = (num_id, level)
            list_counters[key] = list_counters.get(key, 0) + 1
            counter = list_counters[key]
        else:
            counter = 1
        out.append(format_list_item(level, ordered, counter, trimmed))
        out.append("\n")
        plain_out.append(format_list_item_plain(level, trimmed_plain))
        plain_out.append("\n")
    else:
        if last_was_list:
            out.append("\n")
            plain_out.append("\n")
        out.append(trimmed)
        out.append("\n\n")
        plain_out.append(trimmed_plain)
        plain_out.append("\n\n")


def convert_docx(
    data: bytes,
    max_uncompressed_zip_bytes: int = 16 << 30,
    extract_images: bool = False,
    describer=None,
    max_image_bytes: int = 4 << 30,
) -> dict:
    """Convert DOCX bytes (docx.rs convert_inner :1162-1260).

    ``extract_images``/``describer`` mirror ConversionOptions: image
    bytes are read from the package (budgeted) when either is set; the
    describer replaces placeholder alts, and ``images`` carries
    (filename, bytes) pairs when extraction is on."""
    from anytomd_spark.kernels.ooxml import collect_relationship_images

    try:
        zf = open_zip(data)
    except Exception as e:
        raise MalformedDocument(f"invalid ZIP: {e}") from e
    images: list[tuple[str, bytes]] = []
    bytes_map: dict[str, bytes] = {}
    extraction_warnings: list[dict] = []
    with zf:
        validate_zip_budget(zf, max_uncompressed_zip_bytes)
        styles_xml = read_zip_text(zf, "word/styles.xml")
        styles = parse_styles(styles_xml) if styles_xml is not None else {}
        rels_xml = read_zip_text(zf, "word/_rels/document.xml.rels")
        relationships = parse_relationships(rels_xml) if rels_xml is not None else {}
        numbering_xml = read_zip_text(zf, "word/numbering.xml")
        numbering = parse_numbering(numbering_xml) if numbering_xml is not None else {}
        document_xml = read_zip_text(zf, "word/document.xml")
        if document_xml is None:
            raise MalformedDocument("missing word/document.xml")
        if extract_images or describer is not None:
            images, bytes_map, _ = collect_relationship_images(
                zf, relationships, "word/document.xml",
                max_image_bytes, extraction_warnings,
            )

    image_counter = [0]
    markdown, plain_text, title, warnings, image_infos = parse_document(
        document_xml, styles, relationships, numbering, image_counter
    )
    warnings.extend(extraction_warnings)
    markdown, plain_text = resolve_image_placeholders(
        markdown, plain_text, image_infos,
        image_bytes=bytes_map, describer=describer, warnings=warnings,
    )
    return {
        "markdown": markdown,
        "plain_text": plain_text,
        "title": title,
        "warnings": warnings,
        "images": images if extract_images else [],
    }


# referenced by image extraction (unused in the no-describer turn pipeline)
_ = resolve_relative_to_file
