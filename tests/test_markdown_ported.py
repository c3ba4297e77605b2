"""Full port of the reference markdown emitter test suite
(/root/reference/src/markdown.rs:153-360, 33 tests) — exact-equality
checks on every emitter, complementing test_markdown_units' edge tests."""

from __future__ import annotations

from anytomd_spark.kernels.markdown import (
    build_table,
    build_table_plain,
    escape_cell,
    format_heading,
    format_list_item,
    format_list_item_plain,
    wrap_formatting,
)


class TestBuildTable:
    def test_basic(self):
        out = build_table(["A", "B"], [["1", "2"], ["3", "4"]])
        assert "| A | B |" in out and "|---|---|" in out
        assert "| 1 | 2 |" in out and "| 3 | 4 |" in out

    def test_empty_headers(self):
        assert build_table([], [["x"]]) == ""

    def test_short_rows_padded(self):
        assert "| 1 |  |  |" in build_table(["A", "B", "C"], [["1"]])

    def test_no_rows(self):
        out = build_table(["X", "Y"], [])
        assert "| X | Y |" in out and "|---|---|" in out
        assert len(out.splitlines()) == 2

    def test_pipe_in_cell_escaped(self):
        assert "| x\\|y | z |" in build_table(["A", "B"], [["x|y", "z"]])

    def test_pipe_in_header_escaped(self):
        assert "| A\\|1 | B |" in build_table(["A|1", "B"], [["x", "y"]])

    def test_newline_in_cell_replaced(self):
        assert "| line1<br>line2 |" in build_table(["A"], [["line1\nline2"]])


class TestFormatHeading:
    def test_levels_1_through_6(self):
        assert format_heading(1, "Title") == "# Title\n"
        assert format_heading(2, "Sub") == "## Sub\n"
        assert format_heading(3, "H3") == "### H3\n"
        assert format_heading(4, "H4") == "#### H4\n"
        assert format_heading(5, "H5") == "##### H5\n"
        assert format_heading(6, "H6") == "###### H6\n"

    def test_clamped_below(self):
        assert format_heading(0, "Zero") == "# Zero\n"

    def test_clamped_above(self):
        assert format_heading(7, "Seven") == "###### Seven\n"
        assert format_heading(255, "Max") == "###### Max\n"


class TestWrapFormatting:
    def test_bold(self):
        assert wrap_formatting("hello", True, False) == "**hello**"

    def test_italic(self):
        assert wrap_formatting("hello", False, True) == "*hello*"

    def test_bold_italic(self):
        assert wrap_formatting("hello", True, True) == "***hello***"

    def test_none(self):
        assert wrap_formatting("hello", False, False) == "hello"

    def test_empty_no_markers(self):
        assert wrap_formatting("", True, False) == ""
        assert wrap_formatting("", False, True) == ""
        assert wrap_formatting("", True, True) == ""


class TestFormatListItem:
    def test_unordered(self):
        assert format_list_item(0, False, 1, "Item") == "- Item"

    def test_ordered(self):
        assert format_list_item(0, True, 1, "First") == "1. First"
        assert format_list_item(0, True, 3, "Third") == "3. Third"

    def test_nested(self):
        assert format_list_item(1, False, 1, "Nested") == "  - Nested"
        assert format_list_item(2, False, 1, "Deep") == "    - Deep"
        assert format_list_item(1, True, 2, "Sub") == "  2. Sub"

    def test_plain_level_zero(self):
        assert format_list_item_plain(0, "Item") == "Item"

    def test_plain_nested(self):
        assert format_list_item_plain(1, "Nested") == "  Nested"
        assert format_list_item_plain(2, "Deep") == "    Deep"


class TestEscapeCell:
    def test_pipe(self):
        assert escape_cell("a|b") == "a\\|b"

    def test_multiple_pipes(self):
        assert escape_cell("a|b|c") == "a\\|b\\|c"

    def test_newline(self):
        assert escape_cell("line1\nline2") == "line1<br>line2"

    def test_crlf(self):
        assert escape_cell("line1\r\nline2") == "line1<br>line2"

    def test_backslash(self):
        assert escape_cell("a\\b") == "a\\\\b"

    def test_backslash_pipe(self):
        assert escape_cell("a\\|b") == "a\\\\\\|b"

    def test_empty_and_plain(self):
        assert escape_cell("") == ""
        assert escape_cell("plain text") == "plain text"


class TestBuildTablePlain:
    def test_basic(self):
        assert build_table_plain(
            ["A", "B"], [["1", "2"], ["3", "4"]]
        ) == "A\tB\n1\t2\n3\t4\n"

    def test_empty_headers(self):
        assert build_table_plain([], [["x"]]) == ""

    def test_short_rows_padded(self):
        assert build_table_plain(["A", "B", "C"], [["1"]]) == "A\tB\tC\n1\t\t\n"

    def test_no_rows(self):
        assert build_table_plain(["X", "Y"], []) == "X\tY\n"

    def test_pipes_preserved(self):
        assert "echo | grep" in build_table_plain(["Cmd"], [["echo | grep"]])

    def test_unicode(self):
        out = build_table_plain(["이름", "도시"], [["다영", "서울"]])
        assert "이름\t도시" in out and "다영\t서울" in out
