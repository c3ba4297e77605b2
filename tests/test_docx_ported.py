"""Port of the reference DOCX converter test suite
(/root/reference/src/converter/docx.rs:1405-3030): hyperlinks, images,
mc:AlternateContent, VML textboxes, list renumbering, plain-text
projection, and resource-budget errors. Structural builders mirror
docx.rs:1296-1403 (in-memory ZIP with document/styles/rels/numbering)."""

from __future__ import annotations

import io
import zipfile

import pytest

from anytomd_spark.kernels.docx_conv import convert_docx
from anytomd_spark.kernels.ooxml import InputTooLarge

NSDECL = (
    'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" '
    'xmlns:mc="http://schemas.openxmlformats.org/markup-compatibility/2006" '
    'xmlns:v="urn:schemas-microsoft-com:vml" '
    'xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing" '
    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
    'xmlns:pic="http://schemas.openxmlformats.org/drawingml/2006/picture"'
)
RELS_NS = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'
HYPERLINK_TYPE = ("http://schemas.openxmlformats.org/officeDocument/2006/"
                  "relationships/hyperlink")
IMAGE_TYPE = ("http://schemas.openxmlformats.org/officeDocument/2006/"
              "relationships/image")


def build(body: str, rels: str = "", numbering: str = "") -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "word/document.xml",
            f'<?xml version="1.0"?><w:document {NSDECL}><w:body>{body}'
            "</w:body></w:document>",
        )
        zf.writestr(
            "word/_rels/document.xml.rels",
            f"<Relationships {RELS_NS}>{rels}</Relationships>",
        )
        if numbering:
            zf.writestr(
                "word/numbering.xml",
                f'<?xml version="1.0"?><w:numbering {NSDECL}>{numbering}'
                "</w:numbering>",
            )
    return buf.getvalue()


def para(text: str) -> str:
    return f"<w:p><w:r><w:t>{text}</w:t></w:r></w:p>"


def heading_para(text: str, level: int) -> str:
    return (f'<w:p><w:pPr><w:pStyle w:val="Heading{level}"/></w:pPr>'
            f"<w:r><w:t>{text}</w:t></w:r></w:p>")


def drawing(descr: str, rid: str) -> str:
    return (f'<w:p><w:r><w:drawing><wp:inline><wp:docPr descr="{descr}"/>'
            f"<a:graphic><a:graphicData><pic:pic><pic:blipFill>"
            f'<a:blip r:embed="{rid}"/></pic:blipFill></pic:pic>'
            f"</a:graphicData></a:graphic></wp:inline></w:drawing></w:r></w:p>")


def image_rel(rid: str, target: str) -> str:
    return (f'<Relationship Id="{rid}" Type="{IMAGE_TYPE}" '
            f'Target="{target}"/>')


TEXTBOX = ("<w:p><w:r><w:pict><v:shape><v:textbox><w:txbxContent>{inner}"
           "</w:txbxContent></v:textbox></v:shape></w:pict></w:r></w:p>")


class TestDocxHyperlinks:
    def test_hyperlink(self):
        body = ('<w:p><w:hyperlink r:id="rId1"><w:r><w:t>Example</w:t>'
                "</w:r></w:hyperlink></w:p>")
        rels = (f'<Relationship Id="rId1" Type="{HYPERLINK_TYPE}" '
                'Target="https://example.com" TargetMode="External"/>')
        out = convert_docx(build(body, rels=rels))
        assert "[Example](https://example.com)" in out["markdown"]

    def test_hyperlink_missing_rel(self):
        body = ('<w:p><w:hyperlink r:id="rId99"><w:r><w:t>Broken Link</w:t>'
                "</w:r></w:hyperlink></w:p>")
        out = convert_docx(build(body))
        assert "Broken Link" in out["markdown"]
        assert "[" not in out["markdown"]
        assert out["warnings"]
        assert out["warnings"][0]["code"] == "SkippedElement"

    def test_line_break(self):
        body = ("<w:p><w:r><w:t>Line one</w:t><w:br/><w:t>Line two</w:t>"
                "</w:r></w:p>")
        assert "Line one\nLine two" in convert_docx(build(body))["markdown"]

    def test_multiple_runs_joined(self):
        body = ('<w:p><w:r><w:t xml:space="preserve">Hello </w:t></w:r>'
                "<w:r><w:t>world</w:t></w:r></w:p>")
        assert "Hello world" in convert_docx(build(body))["markdown"]

    def test_split_word_across_bold_runs(self):
        body = ("<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>Hel</w:t></w:r>"
                "<w:r><w:rPr><w:b/></w:rPr><w:t>lo</w:t></w:r></w:p>")
        md = convert_docx(build(body))["markdown"]
        assert "**Hello**" in md and "****" not in md


class TestDocxImages:
    def test_inline_image(self):
        out = convert_docx(build(
            drawing("", "rId2"), rels=image_rel("rId2", "media/image1.png")
        ))
        assert "![](image1.png)" in out["markdown"]

    def test_image_with_alt_text(self):
        out = convert_docx(build(
            drawing("A nice photo", "rId2"),
            rels=image_rel("rId2", "media/photo.jpg"),
        ))
        assert "![A nice photo](photo.jpg)" in out["markdown"]

    def test_image_missing_rel_graceful(self):
        out = convert_docx(build(drawing("Missing", "rId99")))
        assert out["warnings"]
        assert "not found" in out["warnings"][0]["message"]


class TestDocxAlternateContent:
    def test_fallback_used(self):
        body = ('<mc:AlternateContent><mc:Choice Requires="wps">'
                + para("Choice text (should be hidden)")
                + "</mc:Choice><mc:Fallback>"
                + para("Fallback text visible")
                + "</mc:Fallback></mc:AlternateContent>")
        md = convert_docx(build(body))["markdown"]
        assert "Fallback text visible" in md
        assert "Choice text" not in md

    def test_choice_skipped_without_fallback(self):
        body = (para("Before AC")
                + '<mc:AlternateContent><mc:Choice Requires="wps">'
                + para("Hidden") + "</mc:Choice></mc:AlternateContent>"
                + para("After AC"))
        md = convert_docx(build(body))["markdown"]
        assert "Before AC" in md and "After AC" in md
        assert "Hidden" not in md


class TestDocxTextbox:
    def test_textbox_basic(self):
        body = TEXTBOX.format(inner=para("Text box content"))
        assert "Text box content" in convert_docx(build(body))["markdown"]

    def test_textbox_with_formatting(self):
        inner = ("<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>Bold in box</w:t>"
                 "</w:r></w:p>")
        md = convert_docx(build(TEXTBOX.format(inner=inner)))["markdown"]
        assert "**Bold in box**" in md

    def test_textbox_multiple_paragraphs(self):
        inner = para("First TB para") + para("Second TB para")
        md = convert_docx(build(TEXTBOX.format(inner=inner)))["markdown"]
        assert "First TB para" in md and "Second TB para" in md

    def test_textbox_via_alternate_content(self):
        body = ('<mc:AlternateContent><mc:Choice Requires="wps">'
                + para("DrawingML choice") + "</mc:Choice><mc:Fallback>"
                + TEXTBOX.format(inner=para("VML text box"))
                + "</mc:Fallback></mc:AlternateContent>")
        md = convert_docx(build(body))["markdown"]
        assert "VML text box" in md
        assert "DrawingML choice" not in md

    def test_textbox_between_paragraphs(self):
        body = (para("Before text box.")
                + TEXTBOX.format(inner=para("Inside box"))
                + para("After text box."))
        md = convert_docx(build(body))["markdown"]
        assert "Before text box." in md
        assert "Inside box" in md
        assert "After text box." in md

    def test_textbox_unicode(self):
        md = convert_docx(build(
            TEXTBOX.format(inner=para("한국어 🚀 中文"))
        ))["markdown"]
        assert "한국어" in md and "🚀" in md and "中文" in md

    def test_textbox_empty(self):
        md = convert_docx(build(TEXTBOX.format(inner="")))["markdown"]
        assert md.strip() == ""


class TestDocxLists:
    def test_two_separate_ordered_lists_restart_numbering(self):
        numbering = (
            '<w:abstractNum w:abstractNumId="0"><w:lvl w:ilvl="0">'
            '<w:numFmt w:val="decimal"/></w:lvl></w:abstractNum>'
            '<w:abstractNum w:abstractNumId="1"><w:lvl w:ilvl="0">'
            '<w:numFmt w:val="decimal"/></w:lvl></w:abstractNum>'
            '<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>'
            '<w:num w:numId="2"><w:abstractNumId w:val="1"/></w:num>'
        )

        def li(num_id: int, text: str) -> str:
            return (f'<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/>'
                    f'<w:numId w:val="{num_id}"/></w:numPr></w:pPr>'
                    f"<w:r><w:t>{text}</w:t></w:r></w:p>")

        body = (li(1, "Alpha") + li(1, "Beta") + li(1, "Gamma")
                + para("Separator paragraph.")
                + li(2, "First") + li(2, "Second") + li(2, "Third"))
        md = convert_docx(build(body, numbering=numbering))["markdown"]
        for want in ("1. Alpha", "2. Beta", "3. Gamma",
                     "1. First", "2. Second", "3. Third"):
            assert want in md, md


class TestDocxPlainText:
    def test_paragraphs_and_headings(self):
        body = (heading_para("My Title", 1) + para("Normal paragraph.")
                + heading_para("Section", 2))
        out = convert_docx(build(body))
        assert "# My Title" in out["markdown"]
        assert "## Section" in out["markdown"]
        assert "#" not in out["plain_text"]
        for want in ("My Title", "Normal paragraph.", "Section"):
            assert want in out["plain_text"]

    def test_no_bold_italic_markers(self):
        body = ("<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>bold</w:t></w:r>"
                "<w:r><w:rPr><w:i/></w:rPr><w:t>italic</w:t></w:r></w:p>")
        out = convert_docx(build(body))
        assert "bold" in out["plain_text"] and "italic" in out["plain_text"]
        assert "**" not in out["plain_text"]
        assert "*italic*" not in out["plain_text"]

    def test_hyperlink_no_markdown_syntax(self):
        body = ('<w:p><w:hyperlink r:id="rId1"><w:r><w:t>Example</w:t>'
                "</w:r></w:hyperlink></w:p>")
        rels = (f'<Relationship Id="rId1" Type="{HYPERLINK_TYPE}" '
                'Target="https://example.com"/>')
        out = convert_docx(build(body, rels=rels))
        assert "Example" in out["plain_text"]
        assert "[" not in out["plain_text"]
        assert "https://example.com" not in out["plain_text"]

    def test_image_no_markdown_syntax(self):
        out = convert_docx(build(
            drawing("Chart", "rId2"), rels=image_rel("rId2", "media/c.png")
        ))
        assert "![" not in out["plain_text"]
        assert "Chart" in out["plain_text"]

    def test_table_tab_separated(self):
        def tc(t: str) -> str:
            return f"<w:tc><w:p>{para(t)[5:-6].join(['<w:p>', '</w:p>'])}</w:tc>"

        body = (
            "<w:tbl>"
            "<w:tr><w:tc><w:p><w:r><w:t>H1</w:t></w:r></w:p></w:tc>"
            "<w:tc><w:p><w:r><w:t>H2</w:t></w:r></w:p></w:tc></w:tr>"
            "<w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>"
            "<w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr>"
            "</w:tbl>"
        )
        out = convert_docx(build(body))
        assert "H1\tH2" in out["plain_text"]
        assert "a\tb" in out["plain_text"]
        assert "|" not in out["plain_text"]

    def test_list_no_markers(self):
        numbering = (
            '<w:abstractNum w:abstractNumId="0"><w:lvl w:ilvl="0">'
            '<w:numFmt w:val="bullet"/></w:lvl></w:abstractNum>'
            '<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>'
        )
        body = ('<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/>'
                '<w:numId w:val="1"/></w:numPr></w:pPr>'
                "<w:r><w:t>Apple</w:t></w:r></w:p>")
        out = convert_docx(build(body, numbering=numbering))
        assert "Apple" in out["plain_text"]
        assert "- " not in out["plain_text"]


class TestDocxBudgetsAndErrors:
    def test_zip_budget_exceeded_raises(self):
        data = build(para("Hello"))
        with pytest.raises(InputTooLarge, match="exceeds limit"):
            convert_docx(data, 1)

    def test_invalid_data_raises(self):
        with pytest.raises(Exception):
            convert_docx(b"this is not a zip file")

    def test_empty_document(self):
        assert convert_docx(build(""))["markdown"].strip() == ""

    def test_first_heading1_becomes_title(self):
        body = heading_para("Doc Title", 1) + para("Body text.")
        assert convert_docx(build(body))["title"] == "Doc Title"


def bold_para(text: str) -> str:
    return f"<w:p><w:r><w:rPr><w:b/></w:rPr><w:t>{text}</w:t></w:r></w:p>"


def italic_para(text: str) -> str:
    return f"<w:p><w:r><w:rPr><w:i/></w:rPr><w:t>{text}</w:t></w:r></w:p>"


class TestDocxFormattingPorted:
    def test_heading_from_styles_xml(self):
        body = ('<w:p><w:pPr><w:pStyle w:val="CustomTitle"/></w:pPr>'
                "<w:r><w:t>My Title</w:t></w:r></w:p>")
        styles_xml = ('<w:style w:type="paragraph" w:styleId="CustomTitle">'
                      '<w:name w:val="heading 1"/></w:style>')
        data = build_with_styles(body, styles_xml)
        assert "# My Title\n" in convert_docx(data)["markdown"]

    def test_first_heading1_becomes_title(self):
        body = (heading_para("Document Title", 1) + para("Some text.")
                + heading_para("Another H1", 1))
        assert convert_docx(build(body))["title"] == "Document Title"

    def test_missing_styles_xml_graceful(self):
        body = heading_para("Title", 1) + para("Body text.")
        out = convert_docx(build(body))
        assert "# Title\n" in out["markdown"]
        assert "Body text." in out["markdown"]
        assert out["warnings"] == []

    def test_bold_text(self):
        assert "**Bold text**" in convert_docx(
            build(bold_para("Bold text")))["markdown"]

    def test_italic_text(self):
        assert "*Italic text*" in convert_docx(
            build(italic_para("Italic text")))["markdown"]

    def test_bold_italic_nested(self):
        body = ("<w:p><w:r><w:rPr><w:b/><w:i/></w:rPr>"
                "<w:t>Bold and italic</w:t></w:r></w:p>")
        assert "***Bold and italic***" in convert_docx(build(body))["markdown"]

    def test_bold_val_false_not_bold(self):
        body = ('<w:p><w:r><w:rPr><w:b w:val="0"/></w:rPr>'
                "<w:t>Not bold</w:t></w:r></w:p>")
        md = convert_docx(build(body))["markdown"]
        assert "Not bold" in md and "**" not in md

    def test_mixed_formatting_runs(self):
        body = ('<w:p><w:r><w:t xml:space="preserve">Normal </w:t></w:r>'
                '<w:r><w:rPr><w:b/></w:rPr><w:t xml:space="preserve">bold '
                "</w:t></w:r><w:r><w:t>normal</w:t></w:r></w:p>")
        assert "Normal **bold** normal" in convert_docx(build(body))["markdown"]

    def test_bold_in_hyperlink(self):
        body = ('<w:p><w:hyperlink r:id="rId1"><w:r><w:rPr><w:b/></w:rPr>'
                "<w:t>Bold Link</w:t></w:r></w:hyperlink></w:p>")
        rels = (f'<Relationship Id="rId1" Type="{HYPERLINK_TYPE}" '
                'Target="https://example.com" TargetMode="External"/>')
        md = convert_docx(build(body, rels=rels))["markdown"]
        assert "[**Bold Link**](https://example.com)" in md

    def test_empty_run_no_markers(self):
        body = ("<w:p><w:r><w:rPr><w:b/></w:rPr><w:t></w:t></w:r>"
                "<w:r><w:t>text</w:t></w:r></w:p>")
        md = convert_docx(build(body))["markdown"]
        assert "****" not in md and "text" in md

    def test_adjacent_bold_runs_merged(self):
        body = ('<w:p><w:r><w:rPr><w:b/></w:rPr>'
                '<w:t xml:space="preserve">Hello </w:t></w:r>'
                "<w:r><w:rPr><w:b/></w:rPr><w:t>World</w:t></w:r></w:p>")
        md = convert_docx(build(body))["markdown"]
        assert "**Hello World**" in md and "** **" not in md

    def test_adjacent_italic_runs_merged(self):
        body = ('<w:p><w:r><w:rPr><w:i/></w:rPr>'
                '<w:t xml:space="preserve">Hello </w:t></w:r>'
                "<w:r><w:rPr><w:i/></w:rPr><w:t>World</w:t></w:r></w:p>")
        assert "*Hello World*" in convert_docx(build(body))["markdown"]

    def test_formatting_change_between_runs(self):
        body = ('<w:p><w:r><w:rPr><w:b/></w:rPr>'
                '<w:t xml:space="preserve">bold </w:t></w:r>'
                "<w:r><w:rPr><w:i/></w:rPr><w:t>italic</w:t></w:r></w:p>")
        assert "**bold** *italic*" in convert_docx(build(body))["markdown"]

    def test_title_no_markdown_formatting(self):
        # bold inside the title heading: title is plain text
        body = ('<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
                "<w:r><w:rPr><w:b/></w:rPr><w:t>Styled Title</w:t></w:r>"
                "</w:p>")
        out = convert_docx(build(body))
        assert out["title"] == "Styled Title"
        assert "**" not in (out["title"] or "")


def build_with_styles(body: str, styles_xml: str) -> str:
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "word/document.xml",
            f'<?xml version="1.0"?><w:document {NSDECL}><w:body>{body}'
            "</w:body></w:document>",
        )
        zf.writestr(
            "word/styles.xml",
            f'<?xml version="1.0"?><w:styles {NSDECL}>{styles_xml}</w:styles>',
        )
        zf.writestr(
            "word/_rels/document.xml.rels",
            f"<Relationships {RELS_NS}></Relationships>",
        )
    return buf.getvalue()
