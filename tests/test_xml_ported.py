"""Port of the reference XML converter test suite
(/root/reference/src/converter/xml.rs tests): pretty-printed indentation,
declarations, attributes, CDATA/comments/namespaces, fences, and error
paths."""

from __future__ import annotations

import pytest

from anytomd_spark.kernels.simple import MalformedDocument, convert_xml


class TestXmlStructure:
    def test_simple_element(self):
        md = convert_xml(b"<root><child>text</child></root>")["markdown"]
        assert "<root>" in md
        assert "<child>text</child>" in md
        assert "</root>" in md

    def test_pretty_printed_indentation(self):
        md = convert_xml(b"<root><a><b>deep</b></a></root>")["markdown"]
        xml = md.removeprefix("```xml\n").removesuffix("\n```\n")
        lines = xml.splitlines()
        for want in ("<root>", "  <a>", "    <b>deep</b>", "  </a>",
                     "</root>"):
            assert want in lines, lines

    def test_with_declaration(self):
        md = convert_xml(
            b'<?xml version="1.0" encoding="UTF-8"?><root/>'
        )["markdown"]
        assert '<?xml version="1.0" encoding="UTF-8"?>' in md

    def test_with_attributes(self):
        md = convert_xml(b'<elem attr="val" id="1">content</elem>')["markdown"]
        assert 'attr="val"' in md and 'id="1"' in md and "content" in md

    def test_self_closing_tags(self):
        md = convert_xml(b"<root><br/><hr/></root>")["markdown"]
        assert "<br/>" in md and "<hr/>" in md

    def test_with_comments(self):
        md = convert_xml(
            b"<root><!-- this is a comment --><child/></root>"
        )["markdown"]
        assert "<!-- this is a comment -->" in md

    def test_with_cdata(self):
        md = convert_xml(b"<root><![CDATA[some <raw> data]]></root>")["markdown"]
        assert ("some <raw> data" in md
                or "<![CDATA[some <raw> data]]>" in md)

    def test_with_namespaces(self):
        md = convert_xml(
            b'<ns:root xmlns:ns="http://example.com">'
            b"<ns:child>text</ns:child></ns:root>"
        )["markdown"]
        assert "ns:root" in md and "ns:child" in md and "xmlns:ns" in md

    def test_nested_elements_indent(self):
        md = convert_xml(b"<a><b><c><d>deep</d></c></b></a>")["markdown"]
        xml = md.removeprefix("```xml\n").removesuffix("\n```\n")
        assert "      <d>deep</d>" in xml.splitlines()

    def test_unicode_cjk(self):
        md = convert_xml(
            "<root><ko>한국어</ko><zh>中文</zh><ja>日本語</ja></root>".encode()
        )["markdown"]
        assert "한국어" in md and "中文" in md and "日本語" in md

    def test_emoji(self):
        md = convert_xml("<root><emoji>🚀✨🌍</emoji></root>".encode())["markdown"]
        assert "🚀✨🌍" in md

    def test_utf8_bom_stripped(self):
        md = convert_xml(b"\xef\xbb\xbf<root>bom</root>")["markdown"]
        assert "<root>bom</root>" in md and "﻿" not in md


class TestXmlFencesAndProjection:
    def test_output_starts_with_code_fence(self):
        assert convert_xml(b"<root/>")["markdown"].startswith("```xml\n")

    def test_output_ends_with_code_fence(self):
        assert convert_xml(b"<root/>")["markdown"].endswith("\n```\n")

    def test_no_title_or_warnings(self):
        out = convert_xml(b"<root/>")
        assert out["title"] is None and out["warnings"] == []

    def test_plain_text_no_fences(self):
        pt = convert_xml(b"<root><child>text</child></root>")["plain_text"]
        assert "```" not in pt
        assert "<root>" in pt and "<child>text</child>" in pt

    def test_plain_text_pretty_printed(self):
        pt = convert_xml(b"<root><a>val</a></root>")["plain_text"]
        assert "  <a>val</a>" in pt and "```" not in pt


class TestXmlErrors:
    def test_empty_input_raises(self):
        with pytest.raises(MalformedDocument):
            convert_xml(b"")

    def test_whitespace_only_raises(self):
        with pytest.raises(MalformedDocument):
            convert_xml(b"   \n\t  ")

    def test_invalid_xml_raises(self):
        with pytest.raises(MalformedDocument):
            convert_xml(b"<root attr=")

    def test_invalid_utf8_raises(self):
        with pytest.raises(Exception):
            convert_xml(b"\xff\xfe")
