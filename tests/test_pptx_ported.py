"""Port of the reference PPTX converter test suite
(/root/reference/src/converter/pptx.rs:1238-2065): slides, titles,
notes, tables, images, group shapes, and missing-part grace. The
builder mirrors build_test_pptx; parse-level assertions use
parse_slide's shape tuples (("title", t) | ("body", t) |
("table", headers, rows) | ("image", rel_id, alt))."""

from __future__ import annotations

import io
import zipfile

from anytomd_spark.kernels.markdown import (
    derive_rels_path,
    resolve_relative_to_file,
)
from anytomd_spark.kernels.pptx_conv import convert_pptx, parse_slide

P = ('xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
     'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
     'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
     'relationships"')
RELS_NS = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'
IMAGE_TYPE = ("http://schemas.openxmlformats.org/officeDocument/2006/"
              "relationships/image")


def sld(inner: str) -> str:
    return (f'<?xml version="1.0"?><p:sld {P}><p:cSld><p:spTree>{inner}'
            "</p:spTree></p:cSld></p:sld>")


def sp(ph_type: str | None, texts: list[str]) -> str:
    ph = f'<p:ph type="{ph_type}"/>' if ph_type else ""
    paras = "".join(f"<a:p><a:r><a:t>{t}</a:t></a:r></a:p>" for t in texts)
    return (f"<p:sp><p:nvSpPr><p:nvPr>{ph}</p:nvPr></p:nvSpPr>"
            f"<p:txBody>{paras}</p:txBody></p:sp>")


def tbl(headers: list[str], rows: list[list[str]]) -> str:
    def tr(cells: list[str]) -> str:
        return "<a:tr>" + "".join(
            f"<a:tc><a:txBody><a:p><a:r><a:t>{c}</a:t></a:r></a:p>"
            "</a:txBody></a:tc>" for c in cells
        ) + "</a:tr>"

    return ("<p:graphicFrame><a:graphic><a:graphicData><a:tbl>"
            + tr(headers) + "".join(tr(r) for r in rows)
            + "</a:tbl></a:graphicData></a:graphic></p:graphicFrame>")


def pic(rid: str, descr: str | None = None) -> str:
    d = f' descr="{descr}"' if descr is not None else ""
    return (f'<p:pic><p:nvPicPr><p:cNvPr id="10"{d} name="Picture"/>'
            f"</p:nvPicPr><p:blipFill><a:blip r:embed=\"{rid}\"/>"
            f"</p:blipFill></p:pic>")


def build_pptx(slides: list[str], notes: dict[int, str] | None = None,
               image_rels: dict[int, list[tuple[str, str]]] | None = None) -> bytes:
    notes = notes or {}
    image_rels = image_rels or {}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        sld_ids, rels = [], []
        for i, slide in enumerate(slides, 1):
            zf.writestr(f"ppt/slides/slide{i}.xml", sld(slide))
            sld_ids.append(f'<p:sldId id="{255 + i}" r:id="rId{i}"/>')
            rels.append(f'<Relationship Id="rId{i}" Type=".../slide" '
                        f'Target="slides/slide{i}.xml"/>')
            slide_rels = []
            if i in notes:
                zf.writestr(
                    f"ppt/notesSlides/notesSlide{i}.xml",
                    f'<?xml version="1.0"?><p:notes {P}><p:cSld><p:spTree>'
                    '<p:sp><p:nvSpPr><p:nvPr><p:ph type="body"/></p:nvPr>'
                    "</p:nvSpPr><p:txBody>"
                    + "".join(f"<a:p><a:r><a:t>{line}</a:t></a:r></a:p>"
                              for line in notes[i].split("\n"))
                    + "</p:txBody></p:sp></p:spTree></p:cSld></p:notes>",
                )
                slide_rels.append(
                    '<Relationship Id="rIdN" Type="http://x/notesSlide" '
                    f'Target="../notesSlides/notesSlide{i}.xml"/>'
                )
            for rid, target in image_rels.get(i, []):
                slide_rels.append(
                    f'<Relationship Id="{rid}" Type="{IMAGE_TYPE}" '
                    f'Target="{target}"/>'
                )
            if slide_rels:
                zf.writestr(
                    f"ppt/slides/_rels/slide{i}.xml.rels",
                    f"<Relationships {RELS_NS}>{''.join(slide_rels)}"
                    "</Relationships>",
                )
        zf.writestr(
            "ppt/presentation.xml",
            f'<?xml version="1.0"?><p:presentation {P}><p:sldIdLst>'
            f"{''.join(sld_ids)}</p:sldIdLst></p:presentation>",
        )
        zf.writestr(
            "ppt/_rels/presentation.xml.rels",
            f"<Relationships {RELS_NS}>{''.join(rels)}</Relationships>",
        )
    return buf.getvalue()


class TestPptxSlides:
    def test_empty_presentation(self):
        out = convert_pptx(build_pptx([]))
        assert out["markdown"] == "" and out["title"] is None

    def test_single_slide_title_and_body(self):
        md = convert_pptx(build_pptx([
            sp("title", ["Hello World"]) + sp("body", ["This is the body text."])
        ]))["markdown"]
        assert "## Slide 1: Hello World" in md
        assert "This is the body text." in md

    def test_multiple_slides_with_separator(self):
        md = convert_pptx(build_pptx([
            sp("title", ["First"]) + sp("body", ["Body one."]),
            sp("title", ["Second"]) + sp("body", ["Body two."]),
        ]))["markdown"]
        assert "## Slide 1: First" in md and "## Slide 2: Second" in md
        assert "\n\n---\n\n" in md

    def test_slide_without_title(self):
        md = convert_pptx(build_pptx([sp("body", ["Just body text."])]))["markdown"]
        assert "## Slide 1\n" in md and "## Slide 1:" not in md

    def test_document_title_from_first_slide(self):
        out = convert_pptx(build_pptx([
            sp("title", ["Presentation Title"]),
            sp("title", ["Second Slide"]),
        ]))
        assert out["title"] == "Presentation Title"

    def test_table_basic(self):
        md = convert_pptx(build_pptx([
            sp("title", ["Data"]) + tbl(["Name", "Value"],
                                        [["Alpha", "100"], ["Beta", "200"]])
        ]))["markdown"]
        assert "| Name | Value |" in md and "|---|---|" in md
        assert "| Alpha | 100 |" in md and "| Beta | 200 |" in md

    def test_table_empty_cells(self):
        md = convert_pptx(build_pptx([
            tbl(["A", "B", "C"], [["1", "", "3"]])
        ]))["markdown"]
        assert "| A | B | C |" in md and "| 1 |  | 3 |" in md

    def test_notes_basic(self):
        md = convert_pptx(build_pptx(
            [sp("title", ["Slide"]) + sp("body", ["Content."])],
            notes={1: "This is a speaker note."},
        ))["markdown"]
        assert "> Note: This is a speaker note." in md

    def test_notes_multiline(self):
        md = convert_pptx(build_pptx(
            [sp("title", ["Slide"])],
            notes={1: "First line\nSecond line\nThird line"},
        ))["markdown"]
        assert "> Note: First line" in md
        assert "> Second line" in md and "> Third line" in md

    def test_notes_missing(self):
        md = convert_pptx(build_pptx(
            [sp("title", ["Slide"]) + sp("body", ["Text."])]
        ))["markdown"]
        assert "> Note:" not in md

    def test_unicode_cjk(self):
        md = convert_pptx(build_pptx([
            sp("title", ["다국어"])
            + sp("body", ["한국어 테스트", "中文测试", "日本語テスト"])
        ]))["markdown"]
        for s in ("다국어", "한국어 테스트", "中文测试", "日本語テスト"):
            assert s in md

    def test_emoji(self):
        md = convert_pptx(build_pptx([
            sp("title", ["Emoji Test"])
            + sp("body", ["Rocket: 🚀 Stars: ✨ Earth: 🌍"])
        ]))["markdown"]
        assert "🚀" in md and "✨" in md and "🌍" in md

    def test_image_alt_text_in_markdown(self):
        md = convert_pptx(build_pptx(
            [sp("title", ["Images"]) + pic("rIdImg1",
                                           "A diagram of the architecture")],
            image_rels={1: [("rIdImg1", "../media/image1.png")]},
        ))["markdown"]
        assert "![A diagram of the architecture](image1.png)" in md

    def test_missing_slide_file_graceful(self):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as zf:
            zf.writestr(
                "ppt/presentation.xml",
                f'<?xml version="1.0"?><p:presentation {P}><p:sldIdLst>'
                '<p:sldId id="256" r:id="rId1"/></p:sldIdLst>'
                "</p:presentation>",
            )
            zf.writestr(
                "ppt/_rels/presentation.xml.rels",
                f'<Relationships {RELS_NS}><Relationship Id="rId1" '
                'Type=".../slide" Target="slides/slide1.xml"/>'
                "</Relationships>",
            )
        out = convert_pptx(buf.getvalue())
        assert out["warnings"]
        assert out["warnings"][0]["code"] == "SkippedElement"
        assert "slide file not found" in out["warnings"][0]["message"]


class TestPptxParseSlide:
    def test_title_center_title(self):
        shapes, _ = parse_slide(sld(sp("ctrTitle", ["Center Title"])))
        assert shapes == [("title", "Center Title")]

    def test_body_text_multiple_paragraphs(self):
        shapes, _ = parse_slide(sld(
            sp("body", ["First paragraph", "Second paragraph"])
        ))
        (kind, text), = shapes
        assert kind == "body"
        assert "First paragraph" in text and "Second paragraph" in text
        assert "\n" in text

    def test_body_text_multiple_runs_joined(self):
        inner = ('<p:sp><p:nvSpPr><p:nvPr><p:ph type="body"/></p:nvPr>'
                 "</p:nvSpPr><p:txBody><a:p><a:r><a:t>Hello </a:t></a:r>"
                 "<a:r><a:t>World</a:t></a:r></a:p></p:txBody></p:sp>")
        shapes, _ = parse_slide(sld(inner))
        assert shapes == [("body", "Hello World")]

    def test_subtitle_treated_as_body(self):
        shapes, _ = parse_slide(sld(
            sp("title", ["Main Title"]) + sp("subTitle", ["The subtitle"])
        ))
        assert shapes == [("title", "Main Title"), ("body", "The subtitle")]

    def test_image_reference_detected(self):
        shapes, _ = parse_slide(sld(pic("rId2")))
        assert shapes == [("image", "rId2", None)]

    def test_image_alt_text_extracted(self):
        shapes, _ = parse_slide(sld(pic("rId2", "A beautiful chart")))
        assert shapes == [("image", "rId2", "A beautiful chart")]

    def test_line_break(self):
        inner = ('<p:sp><p:nvSpPr><p:nvPr><p:ph type="body"/></p:nvPr>'
                 "</p:nvSpPr><p:txBody><a:p><a:r><a:t>Line one</a:t>"
                 "<a:br/><a:t>Line two</a:t></a:r></a:p></p:txBody></p:sp>")
        shapes, _ = parse_slide(sld(inner))
        (kind, text), = shapes
        assert "Line one\nLine two" in text


def grp(inner: str) -> str:
    return f"<p:grpSp><p:grpSpPr/>{inner}</p:grpSp>"


class TestPptxGroupShapes:
    def test_group_shape_text_extracted(self):
        shapes, warnings = parse_slide(sld(grp(sp(None, ["Group text"]))))
        assert not warnings
        assert shapes == [("body", "Group text")]

    def test_group_shape_multiple_children(self):
        shapes, warnings = parse_slide(sld(grp(
            sp(None, ["First shape"]) + sp(None, ["Second shape"])
        )))
        assert not warnings
        assert shapes == [("body", "First shape"), ("body", "Second shape")]

    def test_group_shape_nested(self):
        shapes, warnings = parse_slide(sld(grp(grp(
            sp(None, ["Nested group text"])
        ))))
        assert not warnings
        assert shapes == [("body", "Nested group text")]

    def test_group_shape_with_table(self):
        shapes, warnings = parse_slide(sld(grp(
            tbl(["H1", "H2"], [["A", "B"]])
        )))
        assert not warnings
        assert shapes == [("table", ["H1", "H2"], [["A", "B"]])]

    def test_group_shape_with_image(self):
        shapes, warnings = parse_slide(sld(grp(pic("rIdImg1", "Alt text"))))
        assert not warnings
        assert shapes == [("image", "rIdImg1", "Alt text")]

    def test_group_shape_empty(self):
        shapes, warnings = parse_slide(sld(grp("")))
        assert not warnings and shapes == []


class TestPptxPathHelpers:
    def test_derive_rels_path(self):
        assert derive_rels_path(
            "ppt/slides/slide1.xml") == "ppt/slides/_rels/slide1.xml.rels"
        assert derive_rels_path(
            "ppt/presentation.xml") == "ppt/_rels/presentation.xml.rels"
        assert derive_rels_path("file.xml") == "_rels/file.xml.rels"

    def test_resolve_relative_to_file(self):
        assert resolve_relative_to_file(
            "ppt/slides/slide1.xml", "../media/image1.png"
        ) == "ppt/media/image1.png"
        assert resolve_relative_to_file(
            "ppt/slides/slide1.xml", "/ppt/media/image1.png"
        ) == "ppt/media/image1.png"
        assert resolve_relative_to_file(
            "ppt/slides/slide1.xml", "../notesSlides/notesSlide1.xml"
        ) == "ppt/notesSlides/notesSlide1.xml"
        assert resolve_relative_to_file(
            "ppt/slides/slide1.xml", "chart1.xml"
        ) == "ppt/slides/chart1.xml"
