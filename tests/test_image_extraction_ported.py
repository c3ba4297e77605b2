"""Port of the reference image-extraction and describer suites
(docx.rs:2178-2546, pptx.rs:1864-1969, xlsx.rs:1176-1334,
test_plain_text/xlsx describer tests): extract_images gating, the
shared total-image-byte budget, describer alt replacement and error
fallback, and duplicate-filename disambiguation."""

from __future__ import annotations

import io
import zipfile

from anytomd_spark.kernels.docx_conv import convert_docx
from anytomd_spark.kernels.pptx_conv import convert_pptx
from anytomd_spark.kernels.xlsx_conv import convert_xlsx

W = ('xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" '
     'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" '
     'xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing" '
     'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
     'xmlns:pic="http://schemas.openxmlformats.org/drawingml/2006/picture"')
P = ('xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
     'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
     'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"')
X = ('xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
     'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"')
XDR = ('xmlns:xdr="http://schemas.openxmlformats.org/drawingml/2006/'
       'spreadsheetDrawing" '
       'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
       'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
       'relationships"')
RELS_NS = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'
IMG_T = ("http://schemas.openxmlformats.org/officeDocument/2006/"
         "relationships/image")

PNG = b"\x89PNG\r\n\x1a\nfakepixels"


def docx_with_images(images: list[tuple[str, str, bytes]],
                     descr: str = "") -> bytes:
    """images: [(rel_id, media name, bytes)] — one drawing per image."""
    body = "".join(
        f'<w:p><w:r><w:drawing><wp:inline><wp:docPr descr="{descr}"/>'
        "<a:graphic><a:graphicData><pic:pic><pic:blipFill>"
        f'<a:blip r:embed="{rid}"/></pic:blipFill></pic:pic>'
        "</a:graphicData></a:graphic></wp:inline></w:drawing></w:r></w:p>"
        for rid, _name, _data in images
    )
    rels = "".join(
        f'<Relationship Id="{rid}" Type="{IMG_T}" Target="media/{name}"/>'
        for rid, name, _ in images
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml",
                    f'<?xml version="1.0"?><w:document {W}><w:body>{body}'
                    "</w:body></w:document>")
        zf.writestr("word/_rels/document.xml.rels",
                    f"<Relationships {RELS_NS}>{rels}</Relationships>")
        for _rid, name, data in images:
            zf.writestr(f"word/media/{name}", data)
    return buf.getvalue()


class TestDocxImageExtraction:
    def test_disabled_by_default(self):
        out = convert_docx(docx_with_images([("rId1", "image1.png", PNG)]))
        assert out["images"] == []
        assert "![](image1.png)" in out["markdown"]

    def test_extraction_enabled(self):
        out = convert_docx(
            docx_with_images([("rId1", "image1.png", PNG)]),
            extract_images=True,
        )
        assert out["images"] == [("image1.png", PNG)]

    def test_extraction_respects_budget(self):
        big = PNG * 100
        out = convert_docx(
            docx_with_images([("rId1", "image1.png", big)]),
            extract_images=True, max_image_bytes=10,
        )
        assert out["images"] == []
        assert any(w["code"] == "ResourceLimitReached"
                   for w in out["warnings"])

    def test_describer_replaces_alt_text(self):
        out = convert_docx(
            docx_with_images([("rId1", "image1.png", PNG)]),
            describer=lambda d, m, p: "A described chart",
        )
        assert "![A described chart](image1.png)" in out["markdown"]
        assert "A described chart" in out["plain_text"]

    def test_describer_error_keeps_original_alt(self):
        def boom(d, m, p):
            raise RuntimeError("llm down")

        out = convert_docx(
            docx_with_images([("rId1", "image1.png", PNG)], descr="Orig"),
            describer=boom,
        )
        assert "![Orig](image1.png)" in out["markdown"]
        assert any(w["code"] == "SkippedElement" for w in out["warnings"])

    def test_duplicate_filenames_independent_descriptions(self):
        # two rels pointing at DIFFERENT media with the same basename is
        # not expressible; two images with distinct media but same-alt
        # placeholders must still resolve in order (docx.rs:2430-2516)
        seen = []

        def desc(d, m, p):
            seen.append(bytes(d))
            return f"img{len(seen)}"

        out = convert_docx(
            docx_with_images([
                ("rId1", "image1.png", PNG),
                ("rId2", "image2.png", PNG + b"2"),
            ]),
            describer=desc,
        )
        assert "![img1](image1.png)" in out["markdown"]
        assert "![img2](image2.png)" in out["markdown"]
        assert seen == [PNG, PNG + b"2"]


def pptx_with_image(rid: str = "rIdImg1", name: str = "image1.png",
                    data: bytes = PNG, descr: str | None = None) -> bytes:
    d = f' descr="{descr}"' if descr else ""
    slide = (f'<p:pic><p:nvPicPr><p:cNvPr id="5"{d} name="Pic"/></p:nvPicPr>'
             f'<p:blipFill><a:blip r:embed="{rid}"/></p:blipFill></p:pic>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ppt/slides/slide1.xml",
                    f'<?xml version="1.0"?><p:sld {P}><p:cSld><p:spTree>'
                    f"{slide}</p:spTree></p:cSld></p:sld>")
        zf.writestr("ppt/slides/_rels/slide1.xml.rels",
                    f'<Relationships {RELS_NS}><Relationship Id="{rid}" '
                    f'Type="{IMG_T}" Target="../media/{name}"/>'
                    "</Relationships>")
        zf.writestr(f"ppt/media/{name}", data)
        zf.writestr("ppt/presentation.xml",
                    f'<?xml version="1.0"?><p:presentation {P}><p:sldIdLst>'
                    '<p:sldId id="256" r:id="rId1"/></p:sldIdLst>'
                    "</p:presentation>")
        zf.writestr("ppt/_rels/presentation.xml.rels",
                    f'<Relationships {RELS_NS}><Relationship Id="rId1" '
                    'Type=".../slide" Target="slides/slide1.xml"/>'
                    "</Relationships>")
    return buf.getvalue()


class TestPptxImageExtraction:
    def test_extraction_enabled(self):
        out = convert_pptx(pptx_with_image(), extract_images=True)
        assert out["images"] == [("image1.png", PNG)]
        assert "![](image1.png)" in out["markdown"]

    def test_disabled_by_default(self):
        assert convert_pptx(pptx_with_image())["images"] == []

    def test_describer_replaces_alt(self):
        out = convert_pptx(
            pptx_with_image(), describer=lambda d, m, p: "Slide art"
        )
        assert "![Slide art](image1.png)" in out["markdown"]

    def test_describer_error_keeps_original_alt(self):
        def boom(d, m, p):
            raise RuntimeError("nope")

        out = convert_pptx(pptx_with_image(descr="Orig"), describer=boom)
        assert "![Orig](image1.png)" in out["markdown"]
        assert any(w["code"] == "SkippedElement" for w in out["warnings"])

    def test_budget(self):
        out = convert_pptx(
            pptx_with_image(data=PNG * 100), extract_images=True,
            max_image_bytes=10,
        )
        assert out["images"] == []
        assert any(w["code"] == "ResourceLimitReached"
                   for w in out["warnings"])


def xlsx_with_image(name: str = "image1.png", data: bytes = PNG) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml",
                    f'<?xml version="1.0"?><workbook {X}><sheets>'
                    '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>'
                    "</workbook>")
        zf.writestr("xl/_rels/workbook.xml.rels",
                    f'<Relationships {RELS_NS}><Relationship Id="rId1" '
                    'Type=".../worksheet" Target="worksheets/sheet1.xml"/>'
                    "</Relationships>")
        zf.writestr("xl/worksheets/sheet1.xml",
                    f'<?xml version="1.0"?><worksheet {X}><sheetData>'
                    '<row r="1"><c r="A1" t="inlineStr"><is><t>Name</t></is>'
                    '</c></row><row r="2"><c r="A2" t="inlineStr"><is>'
                    "<t>Alice</t></is></c></row></sheetData>"
                    '<drawing r:id="rIdD"/></worksheet>')
        zf.writestr("xl/worksheets/_rels/sheet1.xml.rels",
                    f'<Relationships {RELS_NS}><Relationship Id="rIdD" '
                    'Type=".../drawing" Target="../drawings/drawing1.xml"/>'
                    "</Relationships>")
        zf.writestr("xl/drawings/drawing1.xml",
                    f'<?xml version="1.0"?><xdr:wsDr {XDR}>'
                    "<xdr:oneCellAnchor><xdr:pic><xdr:blipFill>"
                    '<a:blip r:embed="rIdI"/></xdr:blipFill></xdr:pic>'
                    "</xdr:oneCellAnchor></xdr:wsDr>")
        zf.writestr("xl/drawings/_rels/drawing1.xml.rels",
                    f'<Relationships {RELS_NS}><Relationship Id="rIdI" '
                    f'Type="{IMG_T}" Target="../media/{name}"/>'
                    "</Relationships>")
        zf.writestr(f"xl/media/{name}", data)
    return buf.getvalue()


class TestXlsxImageExtraction:
    def test_image_in_markdown_after_table(self):
        out = convert_xlsx(xlsx_with_image(), extract_images=True)
        md = out["markdown"]
        assert "## Sheet1" in md
        assert "![](image1.png)" in md
        assert md.index("![](image1.png)") > md.index("| Alice |")
        assert out["images"] == [("image1.png", PNG)]

    def test_no_images_without_flag(self):
        out = convert_xlsx(xlsx_with_image())
        assert out["images"] == []
        assert "![](image1.png)" not in out["markdown"]

    def test_describer_replaces_alt(self):
        out = convert_xlsx(
            xlsx_with_image(), describer=lambda d, m, p: "A chart"
        )
        assert "![A chart](image1.png)" in out["markdown"]
        assert "A chart" in out["plain_text"]

    def test_describer_error_keeps_empty_alt(self):
        def boom(d, m, p):
            raise RuntimeError("down")

        out = convert_xlsx(xlsx_with_image(), describer=boom)
        assert "![](image1.png)" in out["markdown"]
        assert any(w["code"] == "SkippedElement" for w in out["warnings"])

    def test_budget(self):
        out = convert_xlsx(
            xlsx_with_image(data=PNG * 1000), extract_images=True,
            max_image_bytes=10,
        )
        assert out["images"] == []
        assert any(w["code"] == "ResourceLimitReached"
                   for w in out["warnings"])

    def test_plain_text_contains_no_placeholder_after_resolution(self):
        out = convert_xlsx(xlsx_with_image(), extract_images=True)
        assert "__img_" not in out["plain_text"]
        assert "__img_" not in out["markdown"]


def xlsx_with_absolute_paths(name: str = "image1.png",
                             data: bytes = PNG) -> bytes:
    """Drawing and image targets given as absolute package paths
    (xlsx.rs:1574-1614)."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml",
                    f'<?xml version="1.0"?><workbook {X}><sheets>'
                    '<sheet name="S" sheetId="1" r:id="rId1"/></sheets>'
                    "</workbook>")
        zf.writestr("xl/_rels/workbook.xml.rels",
                    f'<Relationships {RELS_NS}><Relationship Id="rId1" '
                    'Type=".../worksheet" Target="worksheets/sheet1.xml"/>'
                    "</Relationships>")
        zf.writestr("xl/worksheets/sheet1.xml",
                    f'<?xml version="1.0"?><worksheet {X}><sheetData>'
                    '<row r="1"><c r="A1" t="inlineStr"><is><t>H</t></is></c>'
                    "</row></sheetData></worksheet>")
        zf.writestr("xl/worksheets/_rels/sheet1.xml.rels",
                    f'<Relationships {RELS_NS}><Relationship Id="rIdD" '
                    'Type=".../drawing" Target="/xl/drawings/drawing1.xml"/>'
                    "</Relationships>")
        zf.writestr("xl/drawings/drawing1.xml",
                    f'<?xml version="1.0"?><xdr:wsDr {XDR}>'
                    '<xdr:pic><xdr:blipFill><a:blip r:embed="rIdI"/>'
                    "</xdr:blipFill></xdr:pic></xdr:wsDr>")
        zf.writestr("xl/drawings/_rels/drawing1.xml.rels",
                    f'<Relationships {RELS_NS}><Relationship Id="rIdI" '
                    f'Type="{IMG_T}" Target="/xl/media/{name}"/>'
                    "</Relationships>")
        zf.writestr(f"xl/media/{name}", data)
    return buf.getvalue()


class TestXlsxAbsolutePaths:
    def test_extraction_absolute_paths(self):
        out = convert_xlsx(xlsx_with_absolute_paths(), extract_images=True)
        assert out["images"] == [("image1.png", PNG)]

    def test_image_in_markdown_absolute_paths(self):
        out = convert_xlsx(xlsx_with_absolute_paths(), extract_images=True)
        assert "![](image1.png)" in out["markdown"]

    def test_describer_absolute_paths(self):
        out = convert_xlsx(
            xlsx_with_absolute_paths(), describer=lambda d, m, p: "Abs chart"
        )
        assert "![Abs chart](image1.png)" in out["markdown"]
