"""Edge-path unit tests ported from the reference's in-module suites
(docx.rs:1288+, pptx.rs:1040+, xlsx.rs:431+, html.rs:693+): in-memory
document builders exercising textboxes, mc:AlternateContent, numbering,
run merging, notes, date cells, and HTML structures the golden fixture
doesn't contain."""

from __future__ import annotations

import io
import zipfile

from anytomd_spark.kernels.docx_conv import convert_docx
from anytomd_spark.kernels.html_conv import convert_html
from anytomd_spark.kernels.pptx_conv import convert_pptx
from anytomd_spark.kernels.xlsx_conv import convert_xlsx

W = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" ' \
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" ' \
    'xmlns:mc="http://schemas.openxmlformats.org/markup-compatibility/2006" ' \
    'xmlns:v="urn:schemas-microsoft-com:vml"'
RELS_NS = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'


def make_docx(body: str, styles: str = "", numbering: str = "",
              rels: str = "") -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "word/document.xml",
            f'<?xml version="1.0"?><w:document {W}><w:body>{body}</w:body>'
            f"</w:document>",
        )
        zf.writestr(
            "word/styles.xml",
            f'<?xml version="1.0"?><w:styles {W}>{styles}</w:styles>',
        )
        if numbering:
            zf.writestr(
                "word/numbering.xml",
                f'<?xml version="1.0"?><w:numbering {W}>{numbering}'
                f"</w:numbering>",
            )
        zf.writestr(
            "word/_rels/document.xml.rels",
            f"<Relationships {RELS_NS}>{rels}</Relationships>",
        )
    return buf.getvalue()


def run(t: str) -> str:
    return f"<w:r><w:t>{t}</w:t></w:r>"


class TestDocxEdges:
    def test_run_merging_single_wrap(self):
        # adjacent same-format runs merge before wrapping (docx.rs:317-338)
        body = (
            "<w:p>"
            "<w:r><w:rPr><w:b/></w:rPr><w:t>bo</w:t></w:r>"
            "<w:r><w:rPr><w:b/></w:rPr><w:t>ld</w:t></w:r>"
            '<w:r><w:t xml:space="preserve"> plain</w:t></w:r>'
            "</w:p>"
        )
        out = convert_docx(make_docx(body))
        assert out["markdown"] == "**bold** plain\n"
        assert out["plain_text"] == "bold plain\n"

    def test_bold_val_false(self):
        body = ('<w:p><w:r><w:rPr><w:b w:val="0"/></w:rPr>'
                "<w:t>notbold</w:t></w:r></w:p>")
        assert convert_docx(make_docx(body))["markdown"] == "notbold\n"

    def test_heading_from_style_name(self):
        styles = ('<w:style w:styleId="Custom1">'
                  '<w:name w:val="heading 2"/></w:style>')
        body = ('<w:p><w:pPr><w:pStyle w:val="Custom1"/></w:pPr>'
                + run("Sub") + "</w:p>")
        out = convert_docx(make_docx(body, styles=styles))
        assert out["markdown"] == "## Sub\n"

    def test_numbered_and_bulleted_lists(self):
        numbering = (
            '<w:abstractNum w:abstractNumId="0"><w:lvl w:ilvl="0">'
            '<w:numFmt w:val="decimal"/></w:lvl></w:abstractNum>'
            '<w:abstractNum w:abstractNumId="1"><w:lvl w:ilvl="0">'
            '<w:numFmt w:val="bullet"/></w:lvl></w:abstractNum>'
            '<w:num w:numId="1"><w:abstractNumId w:val="0"/></w:num>'
            '<w:num w:numId="2"><w:abstractNumId w:val="1"/></w:num>'
        )

        def li(num_id, text):
            return (f'<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/>'
                    f'<w:numId w:val="{num_id}"/></w:numPr></w:pPr>'
                    f"{run(text)}</w:p>")

        body = li(1, "first") + li(1, "second") + li(2, "bullet")
        out = convert_docx(make_docx(body, numbering=numbering))
        assert out["markdown"] == "1. first\n2. second\n- bullet\n"

    def test_numid_zero_is_not_list(self):
        body = ('<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/>'
                '<w:numId w:val="0"/></w:numPr></w:pPr>' + run("plain")
                + "</w:p>")
        assert convert_docx(make_docx(body))["markdown"] == "plain\n"

    def test_table_first_row_header(self):
        def tc(t):
            return f"<w:tc><w:p>{run(t)}</w:p></w:tc>"

        body = (
            "<w:tbl>"
            f"<w:tr>{tc('H1')}{tc('H2')}</w:tr>"
            f"<w:tr>{tc('a')}{tc('b')}</w:tr>"
            "</w:tbl>"
        )
        out = convert_docx(make_docx(body))
        assert "| H1 | H2 |" in out["markdown"]
        assert "|---|---|" in out["markdown"]
        assert "| a | b |" in out["markdown"]
        assert "H1\tH2" in out["plain_text"]

    def test_multi_paragraph_cell_joined_by_space(self):
        body = ("<w:tbl><w:tr><w:tc>"
                f"<w:p>{run('one')}</w:p><w:p>{run('two')}</w:p>"
                "</w:tc></w:tr></w:tbl>")
        assert "| one two |" in convert_docx(make_docx(body))["markdown"]

    def test_hyperlink_with_rel(self):
        rels = ('<Relationship Id="rId9" Type=".../hyperlink" '
                'Target="https://example.com"/>')
        body = ('<w:p><w:hyperlink r:id="rId9">' + run("Link")
                + "</w:hyperlink></w:p>")
        out = convert_docx(make_docx(body, rels=rels))
        assert out["markdown"] == "[Link](https://example.com)\n"
        assert out["plain_text"] == "Link\n"

    def test_hyperlink_missing_rel_warns(self):
        body = ('<w:p><w:hyperlink r:id="rIdX">' + run("Link")
                + "</w:hyperlink></w:p>")
        out = convert_docx(make_docx(body))
        assert out["markdown"] == "Link\n"
        assert any("rIdX" in w["message"] for w in out["warnings"])

    def test_br_becomes_newline(self):
        body = "<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t></w:r></w:p>"
        assert convert_docx(make_docx(body))["markdown"] == "a\nb\n"

    def test_textbox_content_extracted(self):
        # w:pict > v:shape > v:textbox > w:txbxContent (docx.rs:469-521)
        body = (
            "<w:p><w:r><w:pict><v:shape><v:textbox><w:txbxContent>"
            f"<w:p>{run('inside box')}</w:p>"
            "</w:txbxContent></v:textbox></v:shape></w:pict></w:r>"
            f"{run('outside')}</w:p>"
        )
        out = convert_docx(make_docx(body))
        assert "inside box" in out["markdown"]
        assert "outside" in out["markdown"]

    def test_alternate_content_choice_skipped_fallback_used(self):
        body = (
            "<w:p><w:r><mc:AlternateContent>"
            f"<mc:Choice><w:r><w:t>modern-SKIP</w:t></w:r></mc:Choice>"
            "<mc:Fallback><w:pict><v:shape><v:textbox><w:txbxContent>"
            f"<w:p>{run('fallback text')}</w:p>"
            "</w:txbxContent></v:textbox></v:shape></w:pict></mc:Fallback>"
            "</mc:AlternateContent></w:r></w:p>"
        )
        out = convert_docx(make_docx(body))
        assert "modern-SKIP" not in out["markdown"]
        assert "fallback text" in out["markdown"]

    def test_heading_sets_title_and_list_separation(self):
        styles = ('<w:style w:styleId="Heading1">'
                  '<w:name w:val="heading 1"/></w:style>')
        body = ('<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
                + run("Title Here") + "</w:p><w:p>" + run("body") + "</w:p>")
        out = convert_docx(make_docx(body, styles=styles))
        assert out["title"] == "Title Here"
        assert out["markdown"] == "# Title Here\n\nbody\n"

    def test_image_placeholder_resolved_to_alt(self):
        rels = ('<Relationship Id="rId5" '
                'Type="http://x/image" Target="media/image1.png"/>')
        body = ('<w:p><w:r><w:drawing>'
                '<wp:docPr xmlns:wp="http://x" descr="My Alt"/>'
                '<a:blip xmlns:a="http://y" r:embed="rId5"/>'
                "</w:drawing></w:r></w:p>")
        out = convert_docx(make_docx(body, rels=rels))
        assert out["markdown"] == "![My Alt](image1.png)\n"
        assert out["plain_text"] == "My Alt\n"


P = ('xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
     'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
     'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
     'relationships"')


def make_pptx(slides: list[str], notes: dict[int, str] | None = None) -> bytes:
    notes = notes or {}
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        sld_ids, rels = [], []
        for i, slide in enumerate(slides, 1):
            zf.writestr(
                f"ppt/slides/slide{i}.xml",
                f'<?xml version="1.0"?><p:sld {P}><p:cSld><p:spTree>{slide}'
                f"</p:spTree></p:cSld></p:sld>",
            )
            sld_ids.append(f'<p:sldId id="{255+i}" r:id="rId{i}"/>')
            rels.append(f'<Relationship Id="rId{i}" Type=".../slide" '
                        f'Target="slides/slide{i}.xml"/>')
            if i in notes:
                zf.writestr(
                    f"ppt/notesSlides/notesSlide{i}.xml",
                    f'<?xml version="1.0"?><p:notes {P}><p:cSld><p:spTree>'
                    f'<p:sp><p:nvSpPr><p:nvPr><p:ph type="body"/></p:nvPr>'
                    f"</p:nvSpPr><p:txBody>"
                    + "".join(
                        f"<a:p><a:r><a:t>{line}</a:t></a:r></a:p>"
                        for line in notes[i].split("\n")
                    )
                    + "</p:txBody></p:sp></p:spTree></p:cSld></p:notes>",
                )
                zf.writestr(
                    f"ppt/slides/_rels/slide{i}.xml.rels",
                    f'<Relationships {RELS_NS}><Relationship Id="rIdN" '
                    f'Type="http://x/notesSlide" '
                    f'Target="../notesSlides/notesSlide{i}.xml"/>'
                    f"</Relationships>",
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


def sp(ph_type: str | None, text: str) -> str:
    ph = f'<p:ph type="{ph_type}"/>' if ph_type else ""
    return (f"<p:sp><p:nvSpPr><p:nvPr>{ph}</p:nvPr></p:nvSpPr><p:txBody>"
            f"<a:p><a:r><a:t>{text}</a:t></a:r></a:p></p:txBody></p:sp>")


class TestPptxEdges:
    def test_titleless_slide(self):
        out = convert_pptx(make_pptx([sp("body", "just body")]))
        assert out["markdown"].startswith("## Slide 1\n\njust body")
        assert out["title"] is None

    def test_subtitle_is_body(self):
        out = convert_pptx(make_pptx([sp("title", "T") + sp("subTitle", "S")]))
        assert "## Slide 1: T" in out["markdown"]
        assert "S" in out["markdown"]

    def test_multiline_notes_blockquote(self):
        out = convert_pptx(make_pptx([sp("title", "T")], notes={1: "l1\nl2"}))
        assert "> Note: l1\n> l2" in out["markdown"]
        assert "l1\nl2" in out["plain_text"]

    def test_group_shape_transparent(self):
        slide = f"<p:grpSp>{sp('body', 'grouped text')}</p:grpSp>"
        out = convert_pptx(make_pptx([slide]))
        assert "grouped text" in out["markdown"]

    def test_table_first_row_header(self):
        tbl = (
            "<p:graphicFrame><a:tbl>"
            "<a:tr><a:tc><a:txBody><a:p><a:r><a:t>H</a:t></a:r></a:p>"
            "</a:txBody></a:tc></a:tr>"
            "<a:tr><a:tc><a:txBody><a:p><a:r><a:t>v</a:t></a:r></a:p>"
            "</a:txBody></a:tc></a:tr>"
            "</a:tbl></p:graphicFrame>"
        )
        out = convert_pptx(make_pptx([tbl]))
        assert "| H |" in out["markdown"]
        assert "| v |" in out["markdown"]

    def test_slides_joined_by_hr(self):
        out = convert_pptx(make_pptx([sp("title", "A"), sp("title", "B")]))
        assert "\n\n---\n\n" in out["markdown"]
        assert out["title"] == "A"


X = ('xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
     'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
     'relationships"')


def make_xlsx(sheet_data: str, styles: str = "",
              shared: list[str] | None = None) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {X}><sheets>'
            f'<sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships {RELS_NS}><Relationship Id="rId1" '
            f'Type=".../worksheet" Target="worksheets/sheet1.xml"/>'
            f"</Relationships>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet {X}><sheetData>{sheet_data}'
            f"</sheetData></worksheet>",
        )
        if styles:
            zf.writestr("xl/styles.xml",
                        f'<?xml version="1.0"?><styleSheet {X}>{styles}'
                        f"</styleSheet>")
        if shared is not None:
            items = "".join(f"<si><t>{s}</t></si>" for s in shared)
            zf.writestr("xl/sharedStrings.xml",
                        f'<?xml version="1.0"?><sst {X}>{items}</sst>')
    return buf.getvalue()


class TestXlsxEdges:
    def test_bool_and_error_cells(self):
        data = ('<row r="1"><c r="A1" t="inlineStr"><is><t>H</t></is></c></row>'
                '<row r="2"><c r="A2" t="b"><v>1</v></c></row>'
                '<row r="3"><c r="A3" t="e"><v>#DIV/0!</v></c></row>')
        out = convert_xlsx(make_xlsx(data))
        assert "| TRUE |" in out["markdown"]
        assert "| #DIV/0! |" in out["markdown"]
        assert any("#DIV/0!" in w["message"] for w in out["warnings"])
        assert out["warnings"][0]["location"] == "S!A3"

    def test_shared_strings(self):
        data = ('<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
                '<row r="2"><c r="A2" t="s"><v>1</v></c></row>')
        out = convert_xlsx(make_xlsx(data, shared=["Header", "Value"]))
        assert "| Header |" in out["markdown"]
        assert "| Value |" in out["markdown"]

    def test_date_cell_via_builtin_numfmt(self):
        # style 1 -> numFmtId 14 (built-in date); serial 45000 = 2023-03-15
        styles = ('<cellXfs count="2"><xf numFmtId="0"/>'
                  '<xf numFmtId="14"/></cellXfs>')
        data = ('<row r="1"><c r="A1" t="inlineStr"><is><t>D</t></is></c></row>'
                '<row r="2"><c r="A2" s="1"><v>45000</v></c></row>')
        out = convert_xlsx(make_xlsx(data, styles=styles))
        assert "| 2023-03-15 |" in out["markdown"]

    def test_datetime_with_time_component(self):
        styles = ('<cellXfs count="2"><xf numFmtId="0"/>'
                  '<xf numFmtId="22"/></cellXfs>')
        data = ('<row r="1"><c r="A1" t="inlineStr"><is><t>D</t></is></c></row>'
                '<row r="2"><c r="A2" s="1"><v>45000.5</v></c></row>')
        out = convert_xlsx(make_xlsx(data, styles=styles))
        assert "| 2023-03-15 12:00:00 |" in out["markdown"]

    def test_whole_floats_as_ints(self):
        data = ('<row r="1"><c r="A1"><v>3.0</v></c></row>'
                '<row r="2"><c r="A2"><v>2.5</v></c></row>')
        out = convert_xlsx(make_xlsx(data))
        assert "| 3 |" in out["markdown"]
        assert "| 2.5 |" in out["markdown"]

    def test_empty_sheet_skipped(self):
        out = convert_xlsx(make_xlsx(""))
        assert out["markdown"] == ""

    def test_huge_row_attr_clamped(self):
        """A crafted <row r="99999999999"> (no cell refs) must not blow
        the bounding box into billions of grid rows — out-of-range row
        attributes fall back to sequential numbering, mirroring the
        cell-ref bounds guard (ADVICE r3)."""
        data = ('<row r="1"><c t="inlineStr"><is><t>H</t></is></c></row>'
                '<row r="99999999999"><c><v>1</v></c></row>')
        out = convert_xlsx(make_xlsx(data))  # must return promptly
        assert "| H |" in out["markdown"]
        assert "| 1 |" in out["markdown"]
        # two consecutive rows, not ~1e11 blank-padded ones
        assert out["markdown"].count("\n") < 10

    def test_bounding_box_offset(self):
        # data starting at C3: range is trimmed like calamine's
        data = ('<row r="3"><c r="C3" t="inlineStr"><is><t>H</t></is></c>'
                '<c r="D3"><v>1</v></c></row>'
                '<row r="4"><c r="C4" t="inlineStr"><is><t>x</t></is></c>'
                '<c r="D4"><v>2</v></c></row>')
        out = convert_xlsx(make_xlsx(data))
        assert "| H | 1 |" in out["markdown"]
        assert "| x | 2 |" in out["markdown"]


class TestHtmlEdges:
    def test_nested_blockquote(self):
        out = convert_html(b"<blockquote><blockquote><p>deep</p>"
                           b"</blockquote></blockquote>")
        assert "> > deep" in out["markdown"]

    def test_checkboxes(self):
        out = convert_html(
            b'<p><input type="checkbox" checked> done</p>'
            b'<p><input type="checkbox"> todo</p>'
        )
        assert "[x] done" in out["markdown"]
        assert "[ ] todo" in out["markdown"]

    def test_table_without_thead_first_row_header(self):
        out = convert_html(
            b"<table><tr><td>H1</td><td>H2</td></tr>"
            b"<tr><td>a</td><td>b</td></tr></table>"
        )
        assert "| H1 | H2 |" in out["markdown"]
        assert "|---|---|" in out["markdown"]
        assert "| a | b |" in out["markdown"]

    def test_link_without_href_bare_text(self):
        out = convert_html(b"<p><a>bare</a></p>")
        assert out["markdown"] == "bare\n"

    def test_ordered_list_counters_nested(self):
        out = convert_html(
            b"<ol><li>one</li><li>two<ol><li>sub</li></ol></li></ol>"
        )
        md = out["markdown"]
        assert "1. one" in md
        assert "2. two" in md
        assert "  1. sub" in md

    def test_h1_fallback_title(self):
        out = convert_html(b"<body><h1>Fallback</h1></body>")
        assert out["title"] == "Fallback"

    def test_unclosed_li_implied_end(self):
        out = convert_html(b"<ul><li>a<li>b</ul>")
        assert "- a" in out["markdown"]
        assert "- b" in out["markdown"]

    def test_unclosed_p_implied_end(self):
        out = convert_html(b"<p>one<p>two")
        assert out["markdown"] == "one\n\ntwo\n"

    def test_hr_and_code(self):
        out = convert_html(b"<p>x <code>y</code></p><hr>")
        assert "`y`" in out["markdown"]
        assert "---" in out["markdown"]

    def test_entities_decoded(self):
        out = convert_html(b"<p>a &amp; b &lt;tag&gt; &#169;</p>")
        assert out["markdown"] == "a & b <tag> ©\n"


class TestFormatFloatLarge:
    def test_huge_whole_float_positional(self):
        # reference format_cell expands digits; repr() would give '1e+20'
        from anytomd_spark.kernels.xlsx_conv import format_float
        assert format_float(1e20) == "100000000000000000000"
        assert format_float(-1e18) == "-1000000000000000000"
        assert format_float(123.0) == "123"
        assert format_float(0.5) == "0.5"
