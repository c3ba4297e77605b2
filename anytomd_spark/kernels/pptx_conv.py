"""PPTX to Markdown conversion kernel.

Reimplements ``/root/reference/src/converter/pptx.rs``: slide-order
resolution (:68-114), per-slide shape parsing (:121-388), notes parsing
(:590-714), slide rendering (:736-827), and ZIP orchestration
(convert_inner :838-1012). Slides join with ``\\n\\n---\\n\\n``; notes render
as ``> Note:`` blockquotes; the first slide's title becomes the document
title. Images take the default no-describer path.
"""

from __future__ import annotations

from anytomd_spark.kernels.decode import (
    MALFORMED_SEGMENT,
    SKIPPED_ELEMENT,
    warning,
)
from anytomd_spark.kernels.markdown import (
    build_table,
    build_table_plain,
    derive_rels_path,
    resolve_relative_to_file,
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

_PH_TITLE = "title"
_PH_CTR_TITLE = "ctrTitle"


def resolve_slide_order(pres_xml: str, pres_rels: dict) -> list[tuple[int, str]]:
    """presentation.xml <p:sldIdLst> order -> [(number, path)]."""
    rel_ids: list[str] = []

    def start(local, attrs):
        if local == "sldId":
            val = attr_suffix(attrs, "id")
            if val is not None:
                rel_ids.append(val)

    parse_xml_events(pres_xml, start, lambda l: None, lambda d: None)

    slides = []
    for i, rid in enumerate(rel_ids):
        rel = pres_rels.get(rid)
        if rel is not None:
            target = rel[0]
            path = target if target.startswith("ppt/") else f"ppt/{target}"
            slides.append((i + 1, path))
    return slides


def parse_slide(xml: str) -> tuple[list[tuple], list[dict]]:
    """Extract shape contents in document order (pptx.rs:121-388).

    Shape tuples: ("title", text) | ("body", text) |
    ("table", headers, rows) | ("image", rel_id, alt|None).
    """
    shapes: list[tuple] = []
    warnings: list[dict] = []
    # hot path (xlsx round-3 pattern): nonlocal scalars instead of a
    # state dict, raw-name handlers with inline local-name memoization
    # (one Python call per event instead of two), inner dispatchers
    # inlined, common-state (inside a shape) branch first. expat reports
    # <x/> as Start+End; depth pairs track shape nesting.
    in_shape = in_frame = in_pic = False
    ph = None
    shape_depth = frame_depth = pic_depth = group_depth = 0
    in_text_body = in_paragraph = in_run = in_text = False
    paragraph: list[str] = []
    shape_paragraphs: list[str] = []
    in_table = in_tr = in_tc = False
    table_rows: list[list[str]] = []
    row: list[str] = []
    cell: list[str] = []
    in_cell_p = in_cell_r = in_cell_t = False
    blip = None
    alt = None
    local_names: dict[str, str] = {}

    def ph_from(attrs):
        val = attr_local(attrs, "type")
        if val in ("title", "ctrTitle", "subTitle", "body"):
            return val
        return "other"

    def start(name, attrs):
        nonlocal in_shape, in_frame, in_pic, ph, shape_depth, frame_depth, \
            pic_depth, group_depth, in_text_body, in_paragraph, in_run, \
            in_text, paragraph, shape_paragraphs, in_table, in_tr, in_tc, \
            table_rows, row, cell, in_cell_p, in_cell_r, in_cell_t, blip, alt
        try:
            local = local_names[name]
        except KeyError:
            local = local_names[name] = name[name.rfind(":") + 1:]
        if in_shape:
            shape_depth += 1
            if local == "ph":
                ph = ph_from(attrs)
            elif local == "txBody":
                in_text_body = True
            elif local == "p" and in_text_body:
                in_paragraph = True
                paragraph = []
            elif local == "r" and in_paragraph:
                in_run = True
            elif local == "t" and in_run:
                in_text = True
            elif local == "br" and in_run:
                paragraph.append("\n")
        elif in_frame:
            frame_depth += 1
            if local == "tbl":
                in_table = True
                table_rows = []
            elif local == "tr" and in_table:
                in_tr = True
                row = []
            elif local == "tc" and in_tr:
                in_tc = True
                cell = []
            elif local == "p" and in_tc:
                if cell:
                    cell.append(" ")
                in_cell_p = True
            elif local == "r" and in_cell_p:
                in_cell_r = True
            elif local == "t" and in_cell_r:
                in_cell_t = True
            elif local == "br" and in_cell_r:
                cell.append(" ")
        elif in_pic:
            pic_depth += 1
            if local == "blip":
                val = attr_suffix(attrs, "embed")
                if val is not None:
                    blip = val
            elif local == "cNvPr":
                val = attr_local(attrs, "descr")
                if val:
                    alt = val
        elif local == "sp":
            in_shape = True
            shape_depth = 1
            ph = None
            shape_paragraphs = []
        elif local == "graphicFrame":
            in_frame = True
            frame_depth = 1
        elif local == "pic":
            in_pic = True
            pic_depth = 1
            blip = None
            alt = None
        elif local == "grpSp":
            group_depth += 1

    def text(data):
        if in_shape and in_text and in_run:
            paragraph.append(data)
        elif in_frame and in_cell_t and in_cell_r:
            cell.append(data)

    def end(name):
        nonlocal in_shape, in_frame, in_pic, ph, shape_depth, frame_depth, \
            pic_depth, group_depth, in_text_body, in_paragraph, in_run, \
            in_text, paragraph, shape_paragraphs, in_table, in_tr, in_tc, \
            table_rows, row, cell, in_cell_p, in_cell_r, in_cell_t, blip, alt
        try:
            local = local_names[name]
        except KeyError:
            local = local_names[name] = name[name.rfind(":") + 1:]
        if in_shape:
            shape_depth -= 1
            if local == "t":
                in_text = False
            elif local == "r":
                in_run = False
                in_text = False
            elif local == "p" and in_paragraph:
                para = "".join(paragraph)
                if para:
                    shape_paragraphs.append(para)
                paragraph = []
                in_paragraph = False
            elif local == "txBody":
                in_text_body = False
            if shape_depth == 0:
                content = _finalize_shape(ph, shape_paragraphs)
                if content is not None:
                    shapes.append(content)
                in_shape = False
                ph = None
                shape_paragraphs = []
                in_text_body = False
                in_paragraph = False
                in_run = False
                in_text = False
        elif in_frame:
            frame_depth -= 1
            if local == "t" and in_tc:
                in_cell_t = False
            elif local == "r" and in_tc:
                in_cell_r = False
                in_cell_t = False
            elif local == "p" and in_cell_p:
                in_cell_p = False
            elif local == "tc" and in_tc:
                row.append("".join(cell).strip())
                cell = []
                in_tc = False
                in_cell_p = False
                in_cell_r = False
                in_cell_t = False
            elif local == "tr" and in_tr:
                table_rows.append(row)
                row = []
                in_tr = False
            elif local == "tbl" and in_table:
                if table_rows:
                    shapes.append(("table", table_rows[0], table_rows[1:]))
                table_rows = []
                in_table = False
            if frame_depth == 0:
                in_frame = False
                in_table = False
                in_tr = False
                in_tc = False
                in_cell_p = False
                in_cell_r = False
                in_cell_t = False
        elif in_pic:
            pic_depth -= 1
            if pic_depth == 0:
                if blip is not None:
                    shapes.append(("image", blip, alt))
                    blip = None
                in_pic = False
                alt = None
        elif local == "grpSp" and group_depth > 0:
            group_depth -= 1

    parse_xml_events_raw(xml, start, end, text)
    return shapes, warnings


def _finalize_shape(ph: str | None, paragraphs: list[str]):
    if not paragraphs:
        return None
    text = "\n".join(paragraphs).strip()
    if not text:
        return None
    if ph in (_PH_TITLE, _PH_CTR_TITLE):
        return ("title", text)
    return ("body", text)


def parse_notes(xml: str) -> str | None:
    """Extract the body-placeholder text of a notes slide (pptx.rs:590-714)."""
    st = {
        "in_shape": False, "depth": 0, "is_body": False,
        "in_text_body": False, "in_paragraph": False, "in_run": False,
        "in_text": False, "paragraph": [], "paragraphs": [],
        "result": None,
    }

    def start(local, attrs):
        if st["result"] is not None:
            return
        if local == "sp" and not st["in_shape"]:
            st["in_shape"] = True
            st["depth"] = 1
            st["is_body"] = False
            st["paragraphs"] = []
        elif st["in_shape"]:
            st["depth"] += 1
            if local == "ph":
                if attr_local(attrs, "type") == "body":
                    st["is_body"] = True
            elif local == "txBody":
                st["in_text_body"] = True
            elif local == "p" and st["in_text_body"]:
                st["in_paragraph"] = True
                st["paragraph"] = []
            elif local == "r" and st["in_paragraph"]:
                st["in_run"] = True
            elif local == "t" and st["in_run"]:
                st["in_text"] = True
            elif local == "br" and st["in_run"]:
                st["paragraph"].append("\n")

    def text(data):
        if st["result"] is None and st["in_shape"] and st["in_text"] and st["in_run"]:
            st["paragraph"].append(data)

    def end(local):
        if st["result"] is not None or not st["in_shape"]:
            return
        st["depth"] -= 1
        if local == "t":
            st["in_text"] = False
        elif local == "r":
            st["in_run"] = False
            st["in_text"] = False
        elif local == "p" and st["in_paragraph"]:
            if st["paragraph"]:
                st["paragraphs"].append("".join(st["paragraph"]))
            st["paragraph"] = []
            st["in_paragraph"] = False
        elif local == "txBody":
            st["in_text_body"] = False
        if st["depth"] == 0:
            if st["is_body"] and st["paragraphs"]:
                joined = "\n".join(st["paragraphs"]).strip()
                if joined:
                    st["result"] = joined
            st["in_shape"] = False
            st["is_body"] = False
            st["paragraphs"] = []
            st["in_text_body"] = False
            st["in_paragraph"] = False
            st["in_run"] = False
            st["in_text"] = False

    parse_xml_events(xml, start, end, text)
    return st["result"]


def _resolve_notes_path(slide_rels: dict) -> str | None:
    for target, rel_type in slide_rels.values():
        if "notesSlide" in rel_type:
            return target
    return None


def render_slide(
    number: int,
    shapes: list[tuple],
    notes: str | None,
    image_filenames: dict[str, str],
    slide_key: str,
    image_counter: list[int],
) -> tuple[str, str, list[dict]]:
    out: list[str] = []
    plain: list[str] = []
    image_infos: list[dict] = []

    title = next((s[1] for s in shapes if s[0] == "title"), None)
    if title is not None:
        out.append(f"## Slide {number}: {title}\n\n")
        plain.append(f"{title}\n\n")
    else:
        out.append(f"## Slide {number}\n\n")
        plain.append("\n")

    for shape in shapes:
        kind = shape[0]
        if kind == "title":
            continue
        if kind == "body":
            out.append(shape[1])
            out.append("\n\n")
            plain.append(shape[1])
            plain.append("\n\n")
        elif kind == "table":
            _, headers, rows = shape
            out.append(build_table(headers, rows))
            out.append("\n")
            plain.append(build_table_plain(headers, rows))
            plain.append("\n")
        elif kind == "image":
            _, rel_id, alt_text = shape
            filename = image_filenames.get(rel_id)
            if filename is not None:
                original_alt = alt_text or ""
                placeholder = f"__img_{image_counter[0]}__"
                image_counter[0] += 1
                image_infos.append({
                    "placeholder": placeholder,
                    "original_alt": original_alt,
                    "filename": filename,
                    "bytes_key": f"{slide_key}::{rel_id}",
                })
                out.append(f"![{placeholder}]({filename})\n\n")
                plain.append(f"{placeholder}\n\n")

    if notes is not None:
        lines = notes.splitlines()
        if lines:
            out.append(f"> Note: {lines[0]}")
            for line in lines[1:]:
                out.append(f"\n> {line}")
            out.append("\n\n")
            plain.append(notes)
            plain.append("\n\n")

    return "".join(out).rstrip(), "".join(plain).rstrip(), image_infos


def convert_pptx(
    data: bytes,
    max_uncompressed_zip_bytes: int = 16 << 30,
    extract_images: bool = False,
    describer=None,
    max_image_bytes: int = 4 << 30,
) -> dict:
    """pptx.rs convert_inner; image bytes are collected per slide under a
    shared budget when extraction or a describer is requested, keyed
    ``{slide_path}::{rel_id}`` (pptx.rs:923-951)."""
    from anytomd_spark.kernels.ooxml import collect_relationship_images

    try:
        zf = open_zip(data)
    except Exception as e:
        raise MalformedDocument(f"invalid ZIP: {e}") from e
    warnings: list[dict] = []
    need_image_bytes = extract_images or describer is not None
    images: list[tuple[str, bytes]] = []
    bytes_map: dict[str, bytes] = {}
    total_image_bytes = 0
    with zf:
        validate_zip_budget(zf, max_uncompressed_zip_bytes)
        rels_xml = read_zip_text(zf, "ppt/_rels/presentation.xml.rels")
        pres_rels = parse_relationships(rels_xml) if rels_xml is not None else {}
        pres_xml = read_zip_text(zf, "ppt/presentation.xml")
        if pres_xml is None:
            raise MalformedDocument("missing ppt/presentation.xml")
        slides = resolve_slide_order(pres_xml, pres_rels)
        if not slides:
            return {"markdown": "", "plain_text": "", "title": None,
                    "warnings": [], "images": []}

        slide_markdowns: list[str] = []
        slide_plains: list[str] = []
        document_title: str | None = None
        image_counter = [0]
        all_image_infos: list[dict] = []

        for number, path in slides:
            slide_xml = read_zip_text(zf, path)
            if slide_xml is None:
                warnings.append(warning(
                    SKIPPED_ELEMENT, f"slide file not found: {path}", path
                ))
                continue
            shapes, slide_warnings = parse_slide(slide_xml)
            warnings.extend(slide_warnings)

            slide_rels_xml = read_zip_text(zf, derive_rels_path(path))
            slide_rels = (
                parse_relationships(slide_rels_xml)
                if slide_rels_xml is not None else {}
            )

            notes = None
            notes_target = _resolve_notes_path(slide_rels)
            if notes_target is not None:
                notes_xml = read_zip_text(
                    zf, resolve_relative_to_file(path, notes_target)
                )
                if notes_xml is not None:
                    notes = parse_notes(notes_xml)

            image_filenames: dict[str, str] = {}
            for shape in shapes:
                if shape[0] == "image":
                    rel = slide_rels.get(shape[1])
                    if rel is not None:
                        image_path = resolve_relative_to_file(path, rel[0])
                        image_filenames[shape[1]] = image_path.rsplit("/", 1)[-1]

            if need_image_bytes:
                slide_images, slide_bytes, total_image_bytes = (
                    collect_relationship_images(
                        zf, slide_rels, path, max_image_bytes, warnings,
                        bytes_key_prefix=f"{path}::",
                        total_so_far=total_image_bytes,
                    )
                )
                images.extend(slide_images)
                bytes_map.update(slide_bytes)

            if document_title is None:
                document_title = next(
                    (s[1] for s in shapes if s[0] == "title"), None
                )

            slide_md, slide_plain, slide_infos = render_slide(
                number, shapes, notes, image_filenames, path, image_counter
            )
            all_image_infos.extend(slide_infos)
            slide_markdowns.append(slide_md)
            slide_plains.append(slide_plain)

    markdown = "\n\n---\n\n".join(slide_markdowns)
    if markdown:
        markdown += "\n"
    plain_text = "\n\n".join(slide_plains)
    if plain_text:
        plain_text += "\n"
    markdown, plain_text = resolve_image_placeholders(
        markdown, plain_text, all_image_infos,
        image_bytes=bytes_map, describer=describer, warnings=warnings,
    )
    return {
        "markdown": markdown,
        "plain_text": plain_text,
        "title": document_title,
        "warnings": warnings,
        "images": images if extract_images else [],
    }


_ = MALFORMED_SEGMENT  # reserved for slide XML parse-error warnings
