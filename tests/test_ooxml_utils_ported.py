"""Port of the reference OOXML utility test suite
(/root/reference/src/converter/ooxml_utils.rs:289-590): .rels parsing,
package-path resolution incl. traversal clamping, and placeholder
resolution."""

from __future__ import annotations

from anytomd_spark.kernels.markdown import (
    derive_rels_path,
    replace_image_alt_by_placeholder,
    resolve_relative_path,
    resolve_relative_to_file,
)
from anytomd_spark.kernels.ooxml import (
    parse_relationships,
    resolve_image_placeholders,
)

RELS_NS = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'
IMG = "http://schemas.openxmlformats.org/officeDocument/2006/relationships/image"
LNK = ("http://schemas.openxmlformats.org/officeDocument/2006/relationships/"
       "hyperlink")


class TestParseRelationships:
    def test_basic(self):
        xml = (f'<?xml version="1.0"?><Relationships {RELS_NS}>'
               f'<Relationship Id="rId1" Type="{IMG}" '
               'Target="media/image1.png"/>'
               f'<Relationship Id="rId2" Type="{LNK}" '
               'Target="https://example.com" TargetMode="External"/>'
               "</Relationships>")
        rels = parse_relationships(xml)
        assert len(rels) == 2
        target, rel_type = rels["rId1"]
        assert target == "media/image1.png" and "image" in rel_type
        target2, rel_type2 = rels["rId2"]
        assert target2 == "https://example.com" and "hyperlink" in rel_type2

    def test_unescapes_target_entities(self):
        xml = (f'<Relationships {RELS_NS}><Relationship Id="rId1" '
               f'Type="{LNK}" Target="https://example.com?a=1&amp;b=2"/>'
               "</Relationships>")
        assert parse_relationships(xml)["rId1"][0] == (
            "https://example.com?a=1&b=2"
        )

    def test_empty(self):
        assert parse_relationships(
            f'<?xml version="1.0"?><Relationships {RELS_NS}></Relationships>'
        ) == {}

    def test_missing_id(self):
        assert parse_relationships(
            '<Relationships><Relationship Type="foo" Target="bar"/>'
            "</Relationships>"
        ) == {}

    def test_missing_target(self):
        assert parse_relationships(
            '<Relationships><Relationship Id="rId1" Type="foo"/>'
            "</Relationships>"
        ) == {}


class TestPathHelpers:
    def test_derive_rels_path_with_directory(self):
        assert derive_rels_path(
            "ppt/slides/slide1.xml") == "ppt/slides/_rels/slide1.xml.rels"
        assert derive_rels_path(
            "xl/drawings/drawing1.xml"
        ) == "xl/drawings/_rels/drawing1.xml.rels"

    def test_derive_rels_path_no_directory(self):
        assert derive_rels_path("file.xml") == "_rels/file.xml.rels"

    def test_resolve_relative_path_same_dir(self):
        assert resolve_relative_path(
            "xl/drawings", "image1.png") == "xl/drawings/image1.png"

    def test_resolve_relative_path_parent_dir(self):
        assert resolve_relative_path(
            "xl/drawings", "../media/image1.png") == "xl/media/image1.png"

    def test_resolve_relative_path_current_dir_segment(self):
        assert resolve_relative_path(
            "xl/drawings", "./media/image1.png"
        ) == "xl/drawings/media/image1.png"

    def test_resolve_relative_path_empty_base(self):
        assert resolve_relative_path("", "image1.png") == "image1.png"

    def test_resolve_relative_to_file_same_dir(self):
        assert resolve_relative_to_file(
            "ppt/slides/slide1.xml", "image1.png") == "ppt/slides/image1.png"

    def test_resolve_relative_to_file_current_dir_segment(self):
        assert resolve_relative_to_file(
            "word/document.xml", "./media/image1.png"
        ) == "word/media/image1.png"

    def test_resolve_relative_to_file_no_dir(self):
        assert resolve_relative_to_file("slide.xml", "image1.png") == "image1.png"

    def test_excessive_parent_stops_at_root(self):
        # ZIP path traversal clamped at the package root
        assert resolve_relative_path("a", "../../etc/passwd") == "etc/passwd"
        assert resolve_relative_to_file(
            "a/b.xml", "../../etc/passwd") == "etc/passwd"

    def test_exact_parent_count(self):
        assert resolve_relative_path(
            "a/b", "../media/image.png") == "a/media/image.png"


class TestResolvePlaceholders:
    def test_no_describer_uses_original_alt(self):
        md = "before ![__img_0__](pic.png) after"
        plain = "before __img_0__ after"
        infos = [{"placeholder": "__img_0__", "original_alt": "My Alt",
                  "filename": "pic.png"}]
        got_md, got_plain = resolve_image_placeholders(md, plain, infos)
        assert got_md == "before ![My Alt](pic.png) after"
        assert got_plain == "before My Alt after"

    def test_multiple_placeholders_independent(self):
        md = "![__img_0__](a.png) ![__img_1__](b.png)"
        plain = "__img_0__ __img_1__"
        infos = [
            {"placeholder": "__img_0__", "original_alt": "A", "filename": "a.png"},
            {"placeholder": "__img_1__", "original_alt": "B", "filename": "b.png"},
        ]
        got_md, got_plain = resolve_image_placeholders(md, plain, infos)
        assert got_md == "![A](a.png) ![B](b.png)"
        assert got_plain == "A B"

    def test_same_filename_distinct_placeholders(self):
        # duplicate basenames resolve independently (docx.rs:2430-2516)
        md = "![__img_0__](image1.png) ![__img_1__](image1.png)"
        md = replace_image_alt_by_placeholder(md, "__img_0__", "first", "image1.png")
        md = replace_image_alt_by_placeholder(md, "__img_1__", "second", "image1.png")
        assert md == "![first](image1.png) ![second](image1.png)"
