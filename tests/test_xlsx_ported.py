"""Port of the reference XLSX converter test suite
(/root/reference/src/converter/xlsx.rs:575-955): sheet layout, cell
types, uneven rows, col_letter, error-cell warnings, and Excel-serial
datetime rendering. The builder mirrors build_test_xlsx
(xlsx.rs:451-570) with a multi-sheet in-memory ZIP."""

from __future__ import annotations

import io
import zipfile

import pytest

from anytomd_spark.kernels.simple import MalformedDocument
from anytomd_spark.kernels.ooxml import InputTooLarge
from anytomd_spark.kernels.xlsx_conv import (
    _format_cell,
    col_letter,
    convert_xlsx,
)

X = ('xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
     'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
     'relationships"')
RELS_NS = 'xmlns="http://schemas.openxmlformats.org/package/2006/relationships"'


def build_xlsx(sheets: list[tuple[str, list[list]]]) -> bytes:
    """sheets: [(name, rows)] where a cell is str | float | bool | None."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        decls, rels = [], []
        for i, (name, _rows) in enumerate(sheets, 1):
            decls.append(f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>')
            rels.append(f'<Relationship Id="rId{i}" Type=".../worksheet" '
                        f'Target="worksheets/sheet{i}.xml"/>')
        zf.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook {X}><sheets>{"".join(decls)}'
            "</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            f"<Relationships {RELS_NS}>{''.join(rels)}</Relationships>",
        )
        for i, (_name, rows) in enumerate(sheets, 1):
            body = []
            for ri, row in enumerate(rows, 1):
                cells = []
                for ci, cell in enumerate(row):
                    ref = f"{col_letter(ci)}{ri}"
                    if cell is None:
                        continue
                    if isinstance(cell, bool):
                        cells.append(
                            f'<c r="{ref}" t="b"><v>{int(cell)}</v></c>')
                    elif isinstance(cell, (int, float)):
                        cells.append(f'<c r="{ref}"><v>{cell}</v></c>')
                    else:
                        esc = (str(cell).replace("&", "&amp;")
                               .replace("<", "&lt;").replace(">", "&gt;"))
                        cells.append(f'<c r="{ref}" t="inlineStr"><is>'
                                     f"<t>{esc}</t></is></c>")
                body.append(f'<row r="{ri}">{"".join(cells)}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i}.xml",
                f'<?xml version="1.0"?><worksheet {X}><sheetData>'
                f'{"".join(body)}</sheetData></worksheet>',
            )
    return buf.getvalue()


class TestXlsxSheets:
    def test_empty_workbook(self):
        assert convert_xlsx(build_xlsx([("Sheet1", [])]))["markdown"] == ""

    def test_single_sheet_basic(self):
        md = convert_xlsx(build_xlsx([(
            "Sheet1",
            [["Name", "Age"], ["Alice", 30.0], ["Bob", 25.0]],
        )]))["markdown"]
        assert "## Sheet1" in md
        assert "| Name | Age |" in md
        assert "| Alice | 30 |" in md and "| Bob | 25 |" in md

    def test_multiple_sheets(self):
        md = convert_xlsx(build_xlsx([
            ("First", [["A"], ["1"]]),
            ("Second", [["B"], ["2"]]),
        ]))["markdown"]
        assert "## First" in md and "| A |" in md and "| 1 |" in md
        assert "## Second" in md and "| B |" in md and "| 2 |" in md

    def test_empty_sheet_skipped(self):
        md = convert_xlsx(build_xlsx([
            ("HasData", [["X"], ["1"]]), ("Empty", []),
        ]))["markdown"]
        assert "## HasData" in md and "## Empty" not in md

    def test_header_only_sheet(self):
        md = convert_xlsx(build_xlsx([("Sheet1", [["Col1", "Col2"]])]))["markdown"]
        assert "| Col1 | Col2 |" in md and "|---|---|" in md
        after_sep = md[md.find("|---|---|") + len("|---|---|"):]
        assert "|" not in after_sep.strip()

    def test_numeric_cells(self):
        md = convert_xlsx(build_xlsx([(
            "Numbers", [["Int", "Float", "Whole"], [42.0, 3.14, 100.0]],
        )]))["markdown"]
        assert "| 42 |" in md and "3.14" in md and "| 100 |" in md

    def test_bool_cells(self):
        md = convert_xlsx(build_xlsx([(
            "Bools", [["Value"], [True], [False]],
        )]))["markdown"]
        assert "| TRUE |" in md and "| FALSE |" in md

    def test_unicode_cjk(self):
        md = convert_xlsx(build_xlsx([(
            "CJK", [["한국어", "中文", "日本語"], ["서울", "北京", "東京"]],
        )]))["markdown"]
        for s in ("한국어", "中文", "日本語", "서울", "北京", "東京"):
            assert s in md

    def test_emoji(self):
        md = convert_xlsx(build_xlsx([(
            "Emoji", [["Icon"], ["🚀"], ["✨"], ["🌍"]],
        )]))["markdown"]
        assert "🚀" in md and "✨" in md and "🌍" in md

    def test_mixed_types(self):
        md = convert_xlsx(build_xlsx([(
            "Mixed",
            [["Str", "Num", "Bool", "Empty"], ["hello", 42.0, True, None]],
        )]))["markdown"]
        assert "| hello | 42 | TRUE |  |" in md

    def test_uneven_row_lengths(self):
        md = convert_xlsx(build_xlsx([(
            "Sheet1", [["A", "B", "C"], ["1", "2"], ["x", "y", "z"]],
        )]))["markdown"]
        assert "| A | B | C |" in md
        assert "1" in md and "2" in md
        assert "| x | y | z |" in md

    def test_zip_budget_exceeded_raises(self):
        data = build_xlsx([("Sheet1", [["A"], ["1"]])])
        with pytest.raises(InputTooLarge, match="exceeds limit"):
            convert_xlsx(data, 1)

    def test_no_title(self):
        out = convert_xlsx(build_xlsx([("Sheet1", [["A"], ["1"]])]))
        assert out["title"] is None

    def test_invalid_data_raises(self):
        with pytest.raises((MalformedDocument, Exception)):
            convert_xlsx(b"not a valid xlsx file")


class TestColLetter:
    def test_single(self):
        assert col_letter(0) == "A"
        assert col_letter(1) == "B"
        assert col_letter(25) == "Z"

    def test_multi(self):
        assert col_letter(26) == "AA"
        assert col_letter(27) == "AB"
        assert col_letter(51) == "AZ"
        assert col_letter(52) == "BA"
        assert col_letter(701) == "ZZ"
        assert col_letter(702) == "AAA"


class TestFormatCellErrors:
    def test_error_displays_text(self):
        warnings: list[dict] = []
        assert "DIV" in _format_cell(("e", "#DIV/0!"), "Sheet1!A1", warnings)

    def test_error_na(self):
        warnings: list[dict] = []
        assert "N/A" in _format_cell(("e", "#N/A"), "Sheet1!B2", warnings)

    def test_error_emits_warning(self):
        warnings: list[dict] = []
        _format_cell(("e", "#DIV/0!"), "Sheet1!C3", warnings)
        assert len(warnings) == 1
        assert warnings[0]["code"] == "MalformedSegment"
        assert warnings[0]["location"] == "Sheet1!C3"
        assert "error" in warnings[0]["message"]


class TestFormatCellDateTime:
    def test_date_only(self):
        warnings: list[dict] = []
        assert _format_cell(("d", 45306.0), "S!A1", warnings) == "2024-01-15"
        assert not warnings

    def test_full_datetime(self):
        warnings: list[dict] = []
        assert _format_cell(
            ("d", 45306.5), "S!A1", warnings
        ) == "2024-01-15 12:00:00"

    def test_with_time(self):
        frac = (14 * 3600 + 30 * 60 + 15) / 86400
        warnings: list[dict] = []
        assert _format_cell(
            ("d", 45306.0 + frac), "S!A1", warnings
        ) == "2024-01-15 14:30:15"

    def test_time_only(self):
        warnings: list[dict] = []
        assert "12:00:00" in _format_cell(("d", 0.5), "S!A1", warnings)
