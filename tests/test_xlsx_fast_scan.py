"""Differential battery for the fast worksheet scanner.

``_fast_sheet_cells`` must either return EXACTLY what the expat path
(`parse_sheet_cells` with the fast path bypassed) returns, or return
``None`` (fall back). Every test asserts that contract; several also pin
WHICH side of it a construct lands on, so a silent fallback regression
(fast path never engaging) would be caught too.
"""

from __future__ import annotations

import os as _os

# deep-fuzz knob: SPARK_GRAFT_FUZZ_MULT=50 multiplies every
# max_examples for long background fuzz runs (default 1)
_FUZZ_MULT = int(_os.environ.get("SPARK_GRAFT_FUZZ_MULT", "1"))

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import anytomd_spark.kernels.xlsx_conv as X

_X_NS = (
    'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships"'
)


def sheet(body: str, ns: str = _X_NS) -> str:
    return (
        f'<?xml version="1.0"?><worksheet {ns}>'
        f"<sheetData>{body}</sheetData></worksheet>"
    )


def expat_cells(xml, shared=(), date_styles=frozenset()):
    orig = X._fast_sheet_cells
    X._fast_sheet_cells = lambda *a: None
    try:
        return X.parse_sheet_cells(xml, list(shared), set(date_styles))
    finally:
        X._fast_sheet_cells = orig


def check(xml, shared=(), date_styles=frozenset(), expect_fast=None):
    """Assert the equivalence contract; optionally pin fast vs fallback."""
    fast = X._fast_sheet_cells(xml, list(shared), set(date_styles))
    slow = expat_cells(xml, shared, date_styles)
    if fast is not None:
        assert fast == slow, f"fast/expat divergence on: {xml[:200]!r}"
    if expect_fast is True:
        assert fast is not None, f"expected fast path on: {xml[:200]!r}"
    if expect_fast is False:
        assert fast is None, f"expected fallback on: {xml[:200]!r}"
    return slow


class TestFastPathEngages:
    def test_plain_numeric(self):
        out = check(sheet(
            '<row r="1"><c r="A1"><v>1.5</v></c><c r="B1"><v>2</v></c></row>'
        ), expect_fast=True)
        assert out[0] == {0: "1.5", 1: "2"}

    def test_inline_str(self):
        out = check(sheet(
            '<row r="1"><c r="A1" t="inlineStr"><is><t>hello</t></is></c>'
            "</row>"
        ), expect_fast=True)
        assert out[0] == {0: "hello"}

    def test_shared_strings_and_styles(self):
        out = check(sheet(
            '<row r="2"><c r="B2" t="s"><v>1</v></c>'
            '<c r="C2" s="0"><v>45000</v></c></row>'
        ), shared=["zero", "one"], date_styles={0}, expect_fast=True)
        assert out[0][(1 << 32) | 1] == "one"
        assert out[0][(1 << 32) | 2] == "2023-03-15"

    def test_bool_error_str_types(self):
        out = check(sheet(
            '<row r="1"><c r="A1" t="b"><v>1</v></c>'
            '<c r="B1" t="e"><v>#DIV/0!</v></c>'
            '<c r="C1" t="str"><v>=A1</v></c></row>'
        ), expect_fast=True)
        assert out[0][0] == "TRUE"
        assert out[0][1] == "#DIV/0!"
        assert out[1] == {1: "#DIV/0!"}
        assert out[0][2] == "=A1"

    def test_missing_refs_use_running_position(self):
        # cells without r=, rows without r=
        check(sheet(
            "<row><c><v>1</v></c><c><v>2</v></c></row>"
            "<row><c><v>3</v></c></row>"
        ), expect_fast=True)

    def test_formula_cells_and_empty(self):
        check(sheet(
            '<row r="1"><c r="A1"><f>SUM(B1:C1)</f><v>5</v></c>'
            '<c r="B1"/><c r="C1"><v/></c>'
            '<c r="D1" t="inlineStr"/></row>'
        ), expect_fast=True)

    def test_entities_and_charrefs(self):
        out = check(sheet(
            '<row r="1"><c r="A1" t="inlineStr"><is><t>a&amp;b&#65;&#x42;'
            "</t></is></c>"
            '<c r="B1" t="str"><v>&lt;x&gt;</v></c></row>'
        ), expect_fast=True)
        assert out[0][0] == "a&bAB"
        assert out[0][1] == "<x>"

    def test_crlf_normalization(self):
        # literal CRLF in text -> \n (expat newline normalization)
        check(sheet(
            '<row r="1"><c r="A1" t="inlineStr"><is><t>a\r\nb\rc</t></is>'
            "</c></row>"
        ), expect_fast=True)

    def test_rich_inline_str_runs(self):
        out = check(sheet(
            '<row r="1"><c r="A1" t="inlineStr"><is><r><t>a</t></r>'
            "<r><t>b</t></r></is></c></row>"
        ), expect_fast=True)
        assert out[0][0] == "ab"

    def test_out_of_order_and_duplicate_refs(self):
        # later write to the same ref wins; huge/invalid refs fall back to
        # running position (same guards both paths)
        check(sheet(
            '<row r="3"><c r="A3"><v>1</v></c></row>'
            '<row r="1"><c r="A1"><v>2</v></c><c r="A3"><v>9</v></c></row>'
            '<row><c r="AAAA1"><v>7</v></c><c r="A99999999"><v>8</v></c>'
            "</row>"
        ), expect_fast=True)

    def test_nonstandard_attr_order_still_fast(self):
        # t before r: positional capture misses, leftover path recovers
        out = check(sheet(
            '<row r="1"><c t="inlineStr" r="A1"><is><t>x</t></is></c>'
            '<c s="0" r="B1"><v>45000</v></c></row>'
        ), date_styles={0}, expect_fast=True)
        assert out[0][0] == "x"
        assert out[0][1] == "2023-03-15"

    def test_extra_attributes(self):
        check(sheet(
            '<row r="1" spans="1:2" ht="15" customHeight="1">'
            '<c r="A1" cm="1" vm="2"><v>1</v></c></row>'
        ), expect_fast=True)

    def test_multiple_v_elements_concatenate(self):
        check(sheet(
            '<row r="1"><c r="A1" t="str"><v>a</v><v>b</v></c></row>'
        ), expect_fast=True)

    def test_row_counter_interplay_with_cell_refs(self):
        # a cell ref advances the row var; a following r-less row continues
        # from it (expat start-c sets row from digits)
        check(sheet(
            '<row r="1"><c r="A5"><v>1</v></c></row>'
            "<row><c><v>2</v></c></row>"
        ), expect_fast=True)

    def test_trailing_junk_ref(self):
        # _CELL_REF.match tolerates trailing junk: r="A1B2" parses as A1
        check(sheet('<row><c r="A1B2"><v>3</v></c></row>'), expect_fast=True)

    def test_xml_space_preserve_t(self):
        check(sheet(
            '<row r="1"><c r="A1" t="inlineStr"><is>'
            '<t xml:space="preserve"> padded </t></is></c></row>'
        ), expect_fast=True)


class TestFallsBack:
    def test_malformed_truncates_identically(self):
        # stray close tag: expat truncates at the error; fast path must
        # decline (well-formedness pre-check)
        xml = sheet('<row r="1"><c r="A1"><v>1</v></c></extra></row>')
        check(xml, expect_fast=False)

    def test_doctype(self):
        xml = (
            '<?xml version="1.0"?><!DOCTYPE worksheet [<!ENTITY e "v">]>'
            f"<worksheet {_X_NS}><sheetData>"
            '<row r="1"><c r="A1" t="str"><v>&e;</v></c></row>'
            "</sheetData></worksheet>"
        )
        check(xml, expect_fast=False)

    def test_cdata(self):
        check(sheet(
            '<row r="1"><c r="A1" t="inlineStr"><is><t><![CDATA[x]]></t>'
            "</is></c></row>"
        ), expect_fast=False)

    def test_comment(self):
        check(sheet(
            '<row r="1"><!-- note --><c r="A1"><v>1</v></c></row>'
        ), expect_fast=False)

    def test_processing_instruction(self):
        check(sheet(
            '<row r="1"><?pi data?><c r="A1"><v>1</v></c></row>'
        ), expect_fast=False)

    def test_prefixed_elements(self):
        xml = (
            '<?xml version="1.0"?><x:worksheet xmlns:x='
            '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            '<x:sheetData><x:row r="1"><x:c r="A1"><x:v>1</x:v></x:c>'
            "</x:row></x:sheetData></x:worksheet>"
        )
        check(xml, expect_fast=False)

    def test_single_quoted_attrs(self):
        # count self-check catches the unmatched strict token shape
        check(sheet("<row r='1'><c r='A1'><v>1</v></c></row>"),
              expect_fast=False)

    def test_gt_in_attr_value(self):
        check(sheet(
            '<row r="1"><c r="A1" x="a>b"><v>1</v></c></row>'
        ), expect_fast=False)

    def test_markup_inside_v(self):
        check(sheet(
            '<row r="1"><c r="A1" t="str"><v>a<b/>c</v></c></row>'
        ), expect_fast=False)

    def test_undefined_entity_truncates(self):
        # &nbsp; is undefined in XML: expat errors mid-parse and the expat
        # path keeps only what it saw before the error
        xml = sheet(
            '<row r="1"><c r="A1"><v>1</v></c>'
            '<c r="B1" t="str"><v>&nbsp;</v></c></row>'
        )
        slow = check(xml, expect_fast=False)
        assert slow[0] == {0: "1"}  # truncation semantics preserved


class TestConvertIntegration:
    def test_large_sheet_uses_fast_scan(self, monkeypatch):
        """convert_xlsx on a >=64 KB sheet goes through the fast scan and
        produces the same markdown as the expat path."""
        rows = "".join(
            f'<row r="{r}"><c r="A{r}" t="inlineStr"><is><t>v{r}</t></is>'
            f'</c><c r="B{r}"><v>{r}.5</v></c></row>'
            for r in range(1, 900)
        )
        xml = sheet(rows)
        assert len(xml) >= 65536
        shared: list[str] = []
        fast = X._fast_sheet_cells(xml, shared, set())
        assert fast is not None
        assert fast == expat_cells(xml)

    def test_golden_fixture_unchanged(self):
        import pathlib
        fx = pathlib.Path("/root/reference/tests/fixtures/sample.xlsx")
        expected = pathlib.Path(
            "/root/reference/tests/fixtures/expected/sample.xlsx.md"
        )
        if not fx.exists() or not expected.exists():
            pytest.skip("reference fixtures unavailable")
        out = X.convert_xlsx(fx.read_bytes())
        assert out["markdown"] == expected.read_text()


_TYPES = ["", ' t="s"', ' t="str"', ' t="b"', ' t="e"', ' t="inlineStr"',
          ' t="x"']
_VALS = ["", "1", "1.5", "0", "true", "#REF!", "abc", "a&amp;b", " x ",
         "1e3", "nan", "-2.5", "99999999999999999999"]


class TestSoupDifferential:
    @given(st.lists(st.tuples(
        st.sampled_from(["row", "rowr", "cell"]),
        st.sampled_from(_TYPES),
        st.sampled_from(_VALS),
        st.integers(min_value=0, max_value=9),
    ), min_size=0, max_size=12))
    @settings(max_examples=200 * _FUZZ_MULT, deadline=2000)
    def test_generated_sheets(self, parts):
        body = []
        for kind, t, val, n in parts:
            if kind == "row":
                body.append("<row>")
            elif kind == "rowr":
                body.append(f'<row r="{n + 1}">')
            elif t == ' t="inlineStr"':
                body.append(f'<c r="{chr(65 + n)}{n + 1}"{t}>'
                            f"<is><t>{val}</t></is></c>")
            else:
                body.append(f'<c r="{chr(65 + n)}{n + 1}"{t} s="{n}">'
                            f"<v>{val}</v></c>")
        xml = sheet("".join(body))
        check(xml, shared=["s0", "s1"], date_styles={3})


class TestWhitespaceAttrSeparators:
    """XML allows any whitespace run (tab/newline/CR) between
    attributes and pretty-printing writers emit them; round-6 review
    found the positional captures and leftover markers required a
    single literal space, silently misreading such sheets."""

    def test_tab_before_type_attr(self):
        out = check(sheet('<row r="1"><c\tt="s"><v>1</v></c></row>'),
                    shared=["s0", "s1"], expect_fast=True)
        assert out[0][0] == "s1"

    def test_newline_separated_refs(self):
        out = check(sheet('<row\nr="7"><c\nr="B7"><v>42</v></c></row>'),
                    expect_fast=True)
        assert out[0][(6 << 32) | 1] == "42"

    @pytest.mark.parametrize("ws", ["\t", "\n", "\t\n ", " \t"])
    def test_every_attr_position(self, ws):
        out = check(sheet(
            f'<row{ws}r="2"><c{ws}r="A2"{ws}s="3"{ws}t="s"><v>0</v></c>'
            f'<c{ws}t="inlineStr"{ws}r="C2"><is><t>inl</t></is></c></row>'
        ), shared=["hit"], date_styles={3}, expect_fast=True)
        assert out[0][(1 << 32) | 0] == "hit"
        assert out[0][(1 << 32) | 2] == "inl"

    def test_leftover_attrs_whitespace_separated(self):
        # out-of-order AND tab/newline separated: the generic
        # _attr_value path must find r/s/t through any separator
        out = check(sheet(
            '<row spans="1:2"\tr="3"><c\tt="s"\nr="A3"><v>0</v></c></row>'
        ), shared=["hit"], expect_fast=True)
        assert out[0][(2 << 32) | 0] == "hit"

    def test_value_containing_attr_lookalike(self):
        # an attribute VALUE containing ' r="' must not be misread as
        # the r attribute (structural pair walk, not substring search)
        out = check(sheet(
            '<row r="1"><c ph="x r=" t="s" r="B1"><v>0</v></c></row>'
        ), shared=["v0"], expect_fast=True)
        assert out[0][1] == "v0"

    def test_error_cells_with_tab_separator(self):
        # t="e" behind a tab: errors map must populate identically
        check(sheet('<row r="1"><c\tt="e"><v>#DIV/0!</v></c></row>'),
              expect_fast=True)

    @given(st.lists(st.sampled_from([" ", "\t", "\n", " \t", "\n  "]),
                    min_size=4, max_size=4))
    @settings(max_examples=60 * _FUZZ_MULT, deadline=2000)
    def test_separator_soup(self, seps):
        a, b, c, d = seps
        xml = sheet(
            f'<row{a}r="1"><c{b}r="A1"{c}t="s"><v>1</v></c>'
            f'<c{d}s="0"><v>45000</v></c></row>'
        )
        out = check(xml, shared=["s0", "s1"], date_styles={0},
                    expect_fast=True)
        assert out[0][0] == "s1"


_SST_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def sst(body: str, ns: str = _SST_NS) -> str:
    return f'<?xml version="1.0"?><sst {ns}>{body}</sst>'


class TestSharedStringsSemantics:
    """parse_shared_strings is deliberately expat-only (a single-regex
    fast path measured 0.81x — PLANS.md round-6 negative result); these
    pin the semantics that experiment's differential battery exercised:
    phonetic-run exclusion, rich-run concatenation, entity decoding."""

    def test_plain_strings(self):
        assert X.parse_shared_strings(
            sst("<si><t>alpha</t></si><si><t>beta</t></si>")
        ) == ["alpha", "beta"]

    def test_rich_text_runs_concatenate(self):
        assert X.parse_shared_strings(sst(
            "<si><r><rPr><b/></rPr><t>bold</t></r><r><t> tail</t></r></si>"
        )) == ["bold tail"]

    def test_entities_charrefs_and_crlf(self):
        out = X.parse_shared_strings(sst(
            "<si><t>a&amp;b&#xE9;&#233;</t></si>"
            "<si><t>line1&#13;&#10;line2</t></si>"
        ))
        assert out[0] == "a&b\xe9\xe9"
        assert out[1] == "line1\r\nline2"

    def test_space_preserve_empty_t_and_empty_si(self):
        assert X.parse_shared_strings(sst(
            '<si><t xml:space="preserve"> padded </t></si>'
            "<si><t/></si><si/>"
        )) == [" padded ", "", ""]

    def test_phonetic_runs_excluded(self):
        # rPh furigana and phoneticPr must not leak into the string
        assert X.parse_shared_strings(sst(
            '<si><t>\u6f22\u5b57</t><rPh sb="0" eb="2">'
            '<t>\u304b\u3093\u3058</t></rPh>'
            '<phoneticPr fontId="1"/></si>'
        )) == ["\u6f22\u5b57"]

    def test_text_outside_t_ignored(self):
        assert X.parse_shared_strings(
            sst("<si>stray<t>kept</t>stray2</si>")
        ) == ["kept"]

    def test_malformed_truncates_at_error(self):
        # expat silent-truncation semantics (xlsx.rs Err(_) => break)
        assert X.parse_shared_strings(
            '<?xml version="1.0"?><sst><si><t>ok</t></si><si><t>bad'
        ) == ["ok"]

    def test_prefixed_elements_still_parse(self):
        assert X.parse_shared_strings(
            '<?xml version="1.0"?><x:sst xmlns:x="urn:x">'
            "<x:si><x:t>x</x:t></x:si></x:sst>"
        ) == ["x"]
