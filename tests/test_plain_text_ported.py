"""Port of the reference plain-text integration suites
(/root/reference/tests/test_plain_text_output.rs and test_plain_text.rs):
plain projection has no markdown syntax, unicode survives, convert_file
and convert_bytes agree, and plain-text fixtures/unsupported paths."""

from __future__ import annotations

import pytest

from anytomd_spark.kernels.convert import convert_bytes, convert_file

FIXTURES = "/root/reference/tests/fixtures"


class TestPlainTextOutput:
    def test_csv_no_table_markers(self):
        plain = convert_bytes(
            b"Name,Age,City\nAlice,30,Seoul\nBob,25,Tokyo", "csv"
        )["plain_text"]
        for s in ("Alice", "Seoul", "Bob", "Tokyo"):
            assert s in plain
        assert "|---" not in plain and "| " not in plain

    def test_html_no_markdown_markers(self):
        plain = convert_bytes(
            b"<html><body><h1>Title</h1><p>Hello <b>world</b></p>"
            b"</body></html>", "html"
        )["plain_text"]
        assert "Title" in plain and "Hello" in plain and "world" in plain
        assert "# " not in plain and "**" not in plain

    def test_docx_content_preserved(self):
        plain = convert_file(f"{FIXTURES}/sample.docx")["plain_text"]
        assert plain.strip()
        assert "# " not in plain or "C# " in plain

    def test_xlsx_tab_separated(self):
        plain = convert_file(f"{FIXTURES}/sample.xlsx")["plain_text"]
        assert plain.strip()
        assert "|---" not in plain
        assert "\t" in plain

    def test_unicode_preserved(self):
        plain = convert_bytes(
            "Name,City\n다영,서울\n太郎,東京\n🚀,🎉".encode(), "csv"
        )["plain_text"]
        for s in ("다영", "서울", "太郎", "東京", "🚀", "🎉"):
            assert s in plain

    def test_json_code_block_preserved(self):
        plain = convert_bytes(
            b'{"name": "Alice", "age": 30}', "json"
        )["plain_text"]
        assert '"name"' in plain and '"Alice"' in plain
        assert "```" not in plain

    def test_file_vs_bytes_consistent(self):
        by_file = convert_file(f"{FIXTURES}/sample.csv")["plain_text"]
        with open(f"{FIXTURES}/sample.csv", "rb") as f:
            by_bytes = convert_bytes(f.read(), "csv")["plain_text"]
        assert by_file == by_bytes


class TestPlainTextFormat:
    def test_convert_file_sample(self):
        out = convert_file(f"{FIXTURES}/sample.txt")
        assert out["markdown"].strip()

    def test_md_extension_detected(self, tmp_path):
        p = tmp_path / "notes.md"
        p.write_text("# Already markdown\n")
        out = convert_file(str(p))
        assert "Already markdown" in out["markdown"]

    def test_unsupported_format_raises(self, tmp_path):
        p = tmp_path / "file.xyz"
        p.write_bytes(b"\x00\x01binary junk")
        with pytest.raises(Exception, match="unsupported|xyz"):
            convert_file(str(p))
