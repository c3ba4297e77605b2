"""High-value unit assertions ported from the reference in-module tests
(src/markdown.rs:148-359, src/converter/csv.rs:87-401, json/xml/code/
plain_text/ipynb suites, src/converter/mod.rs decode_text tests)."""

from __future__ import annotations

from anytomd_spark.kernels.decode import decode_text
from anytomd_spark.kernels.markdown import (
    build_table,
    build_table_plain,
    escape_cell,
    format_heading,
    format_list_item,
    format_list_item_plain,
    wrap_formatting,
)
from anytomd_spark.kernels.simple import (
    MalformedDocument,
    convert_code,
    convert_csv,
    convert_ipynb,
    convert_json,
    convert_xml,
)


class TestEscapeCell:
    def test_pipe(self):
        assert escape_cell("a|b") == "a\\|b"

    def test_backslash_pipe(self):
        assert escape_cell("a\\|b") == "a\\\\\\|b"

    def test_newline_crlf(self):
        assert escape_cell("line1\nline2") == "line1<br>line2"
        assert escape_cell("line1\r\nline2") == "line1<br>line2"

    def test_cr_stripped(self):
        assert escape_cell("a\rb") == "ab"


class TestBuildTable:
    def test_basic(self):
        out = build_table(["A", "B"], [["1", "2"], ["3", "4"]])
        assert "| A | B |" in out
        assert "|---|---|" in out
        assert "| 1 | 2 |" in out

    def test_empty_headers(self):
        assert build_table([], [["x"]]) == ""

    def test_short_rows_padded(self):
        assert "| 1 |  |  |" in build_table(["A", "B", "C"], [["1"]])

    def test_long_rows_truncated(self):
        out = build_table(["A"], [["1", "2", "3"]])
        assert "| 1 |\n" in out and "2" not in out

    def test_plain_tsv(self):
        assert build_table_plain(["A", "B"], [["1", "2"]]) == "A\tB\n1\t2\n"

    def test_plain_pipes_preserved(self):
        assert "echo | grep" in build_table_plain(["Cmd"], [["echo | grep"]])

    def test_tuple_rows_accepted(self):
        # rows may be any sequence (the pre-r6 index loop accepted
        # tuples); the pad/truncate fast path must keep that contract
        assert "| 1 |  |" in build_table(["A", "B"], [("1",)])
        assert "| 1 | 2 |" in build_table(["A", "B"], [("1", "2")])
        assert build_table_plain(["A", "B"], [("1",)]) == "A\tB\n1\t\n"


class TestFormatting:
    def test_heading_clamps(self):
        assert format_heading(0, "Z") == "# Z\n"
        assert format_heading(7, "S") == "###### S\n"
        assert format_heading(3, "H") == "### H\n"

    def test_wrap(self):
        assert wrap_formatting("hello", True, False) == "**hello**"
        assert wrap_formatting("hello", False, True) == "*hello*"
        assert wrap_formatting("hello", True, True) == "***hello***"
        assert wrap_formatting("hello", False, False) == "hello"
        assert wrap_formatting("", True, False) == ""
        assert wrap_formatting(" hi ", True, False) == " **hi** "

    def test_list_items(self):
        assert format_list_item(0, False, 1, "Item") == "- Item"
        assert format_list_item(0, True, 3, "Third") == "3. Third"
        assert format_list_item(1, False, 1, "Nested") == "  - Nested"
        assert format_list_item_plain(2, "Deep") == "    Deep"


class TestCsv:
    def test_multiline_quoted_field(self):
        out = convert_csv(b'Name,Bio\nAlice,"Line one\nLine two"\n')
        assert "Line one<br>Line two" in out["markdown"]

    def test_escaped_quotes(self):
        out = convert_csv(b'Name,Quote\nAlice,"She said ""hello"""\n')
        assert 'She said "hello"' in out["markdown"]

    def test_pipe_escaped_md_only(self):
        out = convert_csv(b'Name,Command\nAlice,"echo | grep"\n')
        assert "\\|" in out["markdown"]
        assert "echo | grep" in out["plain_text"]

    def test_backslash(self):
        out = convert_csv(b'Path,Value\nroot,"C:\\Users\\test"\n')
        assert "C:\\\\Users\\\\test" in out["markdown"]

    def test_empty(self):
        assert convert_csv(b"")["markdown"] == ""

    def test_non_utf8_decoded_with_warning(self):
        out = convert_csv(b"Name,City\nAlice,Montr\xe9al\n")
        assert "Montr\u00e9al" in out["markdown"]
        assert out["warnings"]


class TestJson:
    def test_sorted_keys(self):
        out = convert_json(b'{"b": 1, "a": 2}')
        assert out["markdown"].index('"a"') < out["markdown"].index('"b"')

    def test_invalid_raises(self):
        try:
            convert_json(b"{not json")
            raise AssertionError("should raise")
        except MalformedDocument:
            pass

    def test_unicode_not_escaped(self):
        out = convert_json('{"k": "한국어"}'.encode())
        assert "한국어" in out["markdown"]


class TestXml:
    def test_indentation(self):
        out = convert_xml(b"<root><a><b>deep</b></a></root>")
        body = out["markdown"].removeprefix("```xml\n").removesuffix("\n```\n")
        lines = body.split("\n")
        assert "<root>" in lines
        assert "  <a>" in lines
        assert "    <b>deep</b>" in lines

    def test_empty_raises(self):
        try:
            convert_xml(b"   ")
            raise AssertionError("should raise")
        except MalformedDocument:
            pass

    def test_mismatched_raises(self):
        try:
            convert_xml(b"<a><b></a></b>")
            raise AssertionError("should raise")
        except MalformedDocument:
            pass

    def test_preserves_decl_comment_selfclosing(self):
        out = convert_xml(b'<?xml version="1.0"?><r><!-- c --><x/></r>')
        md = out["markdown"]
        assert '<?xml version="1.0"?>' in md
        assert "<!-- c -->" in md
        assert "<x/>" in md

    def test_entities_preserved(self):
        out = convert_xml(b"<r>a &amp; b</r>")
        assert "a &amp; b" in out["markdown"]


class TestCode:
    def test_language_mapping(self):
        assert "```python\n" in convert_code(b"x=1", "py")["markdown"]
        assert "```rust\n" in convert_code(b"fn f(){}", "rs")["markdown"]
        assert "```code\n" in convert_code(b"??", "unknown")["markdown"]

    def test_trailing_ws_trimmed(self):
        out = convert_code(b"x = 1\n\n\n", "py")
        assert out["markdown"] == "```python\nx = 1\n```\n"


class TestIpynb:
    def test_unknown_cell_warns(self):
        nb = b'{"cells": [{"cell_type": "magic", "source": "x"}]}'
        out = convert_ipynb(nb)
        assert out["warnings"]
        assert out["warnings"][0]["location"] == "cell 0"

    def test_kernelspec_language(self):
        nb = (b'{"cells": [{"cell_type": "code", "source": "1"}], '
              b'"metadata": {"kernelspec": {"language": "julia"}}}')
        assert "```julia" in convert_ipynb(nb)["markdown"]

    def test_metadata_title_overrides(self):
        nb = (b'{"cells": [{"cell_type": "markdown", "source": "# H"}], '
              b'"metadata": {"title": "Meta"}}')
        assert convert_ipynb(nb)["title"] == "Meta"


class TestDecodeText:
    def test_utf8_bom_stripped(self):
        text, w = decode_text("\ufeffhi".encode("utf-8"))
        assert text == "hi" and w is None

    def test_utf16_le(self):
        text, w = decode_text(b"\xff\xfe" + "hi".encode("utf-16-le"))
        assert text == "hi"
        assert w is not None and "UTF-16LE" in w["message"]

    def test_utf16_be(self):
        text, w = decode_text(b"\xfe\xff" + "hi".encode("utf-16-be"))
        assert text == "hi"
        assert w is not None and "UTF-16BE" in w["message"]

    def test_cp1252_fallback(self):
        text, w = decode_text(b"caf\xe9")
        assert text == "café"
        assert w is not None and "windows-1252" in w["message"]
