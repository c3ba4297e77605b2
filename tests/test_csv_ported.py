"""Port of the reference CSV converter test suite
(/root/reference/src/converter/csv.rs tests): RFC-4180 quoting,
multiline cells as <br>, pipe/backslash escaping, encoding fallback,
and tab-separated plain text."""

from __future__ import annotations

from anytomd_spark.kernels.simple import convert_csv


class TestCsvTables:
    def test_simple_table(self):
        md = convert_csv(b"A,B,C\n1,2,3\n4,5,6\n")["markdown"]
        assert "| A | B | C |" in md and "|---|---|---|" in md
        assert "| 1 | 2 | 3 |" in md and "| 4 | 5 | 6 |" in md

    def test_single_row_header_only(self):
        md = convert_csv(b"X,Y,Z\n")["markdown"]
        assert "| X | Y | Z |" in md and "|---|---|---|" in md
        assert len([ln for ln in md.splitlines() if ln]) == 2

    def test_single_column(self):
        md = convert_csv(b"Name\nAlice\nBob\n")["markdown"]
        assert "| Name |" in md and "| Alice |" in md and "| Bob |" in md

    def test_empty_input(self):
        assert convert_csv(b"")["markdown"] == ""

    def test_unicode_cjk(self):
        md = convert_csv("이름,성\n홍길동,田中\n".encode())["markdown"]
        assert "홍길동" in md and "田中" in md and "이름" in md

    def test_emoji(self):
        md = convert_csv("Icon\n🚀\n✨\n".encode())["markdown"]
        assert "🚀" in md and "✨" in md

    def test_quoted_fields(self):
        md = convert_csv(
            b'City\n"New York"\n"San Francisco"\n'
        )["markdown"]
        assert "New York" in md and "San Francisco" in md

    def test_short_rows_padded(self):
        md = convert_csv(b"A,B,C\n1\n")["markdown"]
        assert "| 1 |  |  |" in md

    def test_whitespace_in_cells(self):
        md = convert_csv(b"A,B\n hello , world \n")["markdown"]
        assert " hello " in md and " world " in md

    def test_no_title_or_warnings(self):
        out = convert_csv(b"A\n1\n")
        assert out["title"] is None and out["warnings"] == []


class TestCsvEscaping:
    def test_pipe_in_cell_escaped(self):
        md = convert_csv(
            b'Name,Command\nAlice,echo "hello" | grep h\n'
        )["markdown"]
        assert '| echo "hello" | grep h |' not in md
        assert "grep h" in md

    def test_multiline_quoted_field_br(self):
        md = convert_csv(b'Name,Bio\nAlice,"Line one\nLine two"\n')["markdown"]
        assert "Line one<br>Line two" in md

    def test_escaped_quotes_unescaped(self):
        md = convert_csv(
            b'Name,Quote\nAlice,"She said ""hello"""\n'
        )["markdown"]
        assert 'She said "hello"' in md

    def test_multiline_with_unicode(self):
        md = convert_csv(
            'Name,Note\n홍길동,"첫째 줄\n둘째 줄 🎉"\n'.encode()
        )["markdown"]
        assert "홍길동" in md and "첫째 줄<br>둘째 줄 🎉" in md

    def test_crlf_in_quoted_field(self):
        md = convert_csv(b'A,B\nX,"line1\r\nline2"\n')["markdown"]
        assert "line1<br>line2" in md

    def test_pipe_and_newline_combined(self):
        md = convert_csv(b'Cmd,Output\ntest,"echo | grep\nhello"\n')["markdown"]
        assert "\\|" in md and "<br>" in md

    def test_backslash_escaped(self):
        md = convert_csv(b'Path,Value\nroot,"C:\\Users\\test"\n')["markdown"]
        assert "C:\\\\Users\\\\test" in md

    def test_empty_quoted_field(self):
        md = convert_csv(b'A,B,C\n1,"",3\n')["markdown"]
        assert "| 1 |  | 3 |" in md

    def test_non_utf8_decoded_with_warning(self):
        out = convert_csv(b"Name,City\nAlice,Montr\xe9al\n")
        assert "Montréal" in out["markdown"]
        assert out["warnings"]


class TestCsvPlainText:
    def test_tab_separated(self):
        pt = convert_csv(
            b"Name,Age,City\nAlice,30,Seoul\nBob,25,Tokyo\n"
        )["plain_text"]
        assert "Name\tAge\tCity" in pt
        assert "Alice\t30\tSeoul" in pt and "Bob\t25\tTokyo" in pt
        assert "|" not in pt and "---" not in pt

    def test_pipe_in_cell_preserved(self):
        pt = convert_csv(b'Name,Command\nAlice,"echo | grep"\n')["plain_text"]
        assert "echo | grep" in pt

    def test_multiline_preserved(self):
        pt = convert_csv(b'Name,Bio\nAlice,"Line one\nLine two"\n')["plain_text"]
        assert "Name\tBio" in pt and "Alice\t" in pt
        assert "Line one" in pt and "Line two" in pt
