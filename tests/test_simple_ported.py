"""Port of the remaining simple-converter in-module suites
(/root/reference/src/converter/json.rs, code.rs, plain_text.rs):
fences, pretty-printing, encoding fallbacks, language mapping, and
plain-text projections."""

from __future__ import annotations

import pytest

from anytomd_spark.kernels.simple import (
    MalformedDocument,
    convert_code,
    convert_json,
    convert_plain_text,
)


class TestJsonPorted:
    def test_simple_object(self):
        md = convert_json(b'{"key": "value"}')["markdown"]
        assert md.startswith("```json\n") and md.endswith("\n```\n")
        assert '"key"' in md and '"value"' in md

    def test_pretty_printed(self):
        md = convert_json(b'{"a":1,"b":2}')["markdown"]
        assert '  "a": 1' in md and '  "b": 2' in md

    def test_array(self):
        md = convert_json(b"[1, 2, 3]")["markdown"]
        assert md.startswith("```json\n")
        assert "1" in md and "2" in md and "3" in md

    def test_nested_object(self):
        md = convert_json(b'{"outer": {"inner": "value"}}')["markdown"]
        assert '"outer"' in md and '"inner"' in md and '"value"' in md

    def test_unicode_cjk(self):
        md = convert_json('{"name": "한국어 中文 日本語"}'.encode())["markdown"]
        assert "한국어 中文 日本語" in md

    def test_emoji(self):
        md = convert_json('{"emoji": "🚀✨🌍"}'.encode())["markdown"]
        assert "🚀✨🌍" in md

    def test_invalid_raises(self):
        with pytest.raises(MalformedDocument):
            convert_json(b"{ invalid json }")

    def test_empty_object(self):
        assert "{}" in convert_json(b"{}")["markdown"]

    def test_empty_array(self):
        assert "[]" in convert_json(b"[]")["markdown"]

    def test_no_title_or_warnings(self):
        out = convert_json(b"{}")
        assert out["title"] is None and out["warnings"] == []

    def test_plain_text_no_fences(self):
        out = convert_json(b'{"name": "Alice"}')
        assert "```" not in out["plain_text"]
        assert '"name"' in out["plain_text"] and '"Alice"' in out["plain_text"]

    def test_plain_text_pretty_printed(self):
        pt = convert_json(b'{"a":1,"b":2}')["plain_text"]
        assert '  "a": 1' in pt and "```" not in pt

    def test_invalid_utf8_raises(self):
        with pytest.raises(Exception):
            convert_json(b"\xff\xfe")

    def test_utf8_bom_accepted(self):
        md = convert_json(b'\xef\xbb\xbf{"k":1}')["markdown"]
        assert '"k"' in md and "1" in md

    def test_utf16_le_bom_accepted_with_warning(self):
        payload = b"\xff\xfe" + '{"k":1}'.encode("utf-16-le")
        out = convert_json(payload)
        assert '"k"' in out["markdown"]
        assert out["warnings"]


class TestCodePorted:
    def test_python_fenced_block(self):
        md = convert_code(b"def hello():\n    print('Hello, world!')\n",
                          "py")["markdown"]
        assert md.startswith("```python\n") and md.endswith("\n```\n")
        assert "def hello():" in md

    def test_c_fenced_block(self):
        md = convert_code(b"#include <stdio.h>\nint main() { return 0; }\n",
                          "c")["markdown"]
        assert md.startswith("```c\n") and "#include <stdio.h>" in md

    def test_javascript_fenced_block(self):
        md = convert_code(b"console.log('hello');\n", "js")["markdown"]
        assert md.startswith("```javascript\n") and "console.log" in md

    def test_empty_input(self):
        assert convert_code(b"", "py")["markdown"] == "```python\n\n```\n"
        assert convert_code(b"  \n\n", "py")["markdown"] == "```python\n\n```\n"

    def test_unicode_cjk(self):
        md = convert_code("# 한국어 주석\nprint('中文')\n".encode(), "py")["markdown"]
        assert "한국어" in md and "中文" in md

    def test_emoji(self):
        assert "🚀✨🌍" in convert_code("msg = '🚀✨🌍'\n".encode(), "py")["markdown"]

    def test_non_utf8_decoded_with_warning(self):
        out = convert_code(b"caf\xe9", "py")
        assert "café" in out["markdown"]
        assert len(out["warnings"]) == 1
        assert out["warnings"][0]["code"] == "UnsupportedFeature"

    def test_header_extension_mapping(self):
        assert convert_code(b"int x;", "h")["markdown"].startswith("```c\n")
        assert convert_code(b"int x;", "hpp")["markdown"].startswith("```cpp\n")

    def test_no_title_or_warnings(self):
        out = convert_code(b"x = 1", "py")
        assert out["title"] is None and out["warnings"] == []

    def test_plain_text_no_fences(self):
        out = convert_code(b"def hello():\n    print('Hello')\n", "py")
        assert "```" not in out["plain_text"]
        assert "def hello():" in out["plain_text"]

    def test_plain_text_empty_input(self):
        out = convert_code(b"", "py")
        assert out["plain_text"] == "\n" and "```" not in out["plain_text"]

    def test_backtick_content_not_broken(self):
        md = convert_code(b"code = '''```triple backticks```'''\n",
                          "py")["markdown"]
        assert md.startswith("```python\n")
        assert "```triple backticks```" in md
        assert md.endswith("\n```\n")


class TestPlainTextPorted:
    def test_simple_passthrough(self):
        out = convert_plain_text(b"hello world")
        assert out["markdown"] == "hello world"

    def test_plain_field_equals_markdown(self):
        out = convert_plain_text(b"Line 1\nLine 2\n")
        assert out["plain_text"] == out["markdown"]

    def test_empty_input(self):
        assert convert_plain_text(b"")["markdown"] == ""

    def test_multiline(self):
        md = convert_plain_text(b"a\nb\nc")["markdown"]
        assert md == "a\nb\nc"

    def test_utf8_bom_stripped(self):
        assert convert_plain_text(
            b"\xef\xbb\xbfBOM content")["markdown"] == "BOM content"

    def test_unicode_cjk(self):
        md = convert_plain_text("한국어 中文 日本語".encode())["markdown"]
        assert "한국어 中文 日本語" in md

    def test_emoji(self):
        assert "🚀" in convert_plain_text("go 🚀".encode())["markdown"]

    def test_windows_1252_decoded_with_warning(self):
        out = convert_plain_text(b"\xfcber")
        assert "über" in out["markdown"]
        assert out["warnings"]

    def test_utf16_le_decoded_with_warning(self):
        out = convert_plain_text(b"\xff\xfeH\x00i\x00")
        assert out["markdown"] == "Hi"
        assert out["warnings"]

    def test_no_title(self):
        assert convert_plain_text(b"text")["title"] is None

    def test_clean_input_no_warnings(self):
        assert convert_plain_text(b"plain ascii")["warnings"] == []
