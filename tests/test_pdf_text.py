"""PDF text-extraction kernel tests. The operator-level cases are
hand-authored content streams derived from the PDF spec (ISO 32000
§9.4.3 text-showing operators), not round-trips through the sibling
writer; writer round-trips then cover the end-to-end path."""

import zlib

import pytest

from anytomd_spark.kernels.pdf_text import (
    PdfError,
    _content_text,
    build_pdf,
    extract_pdf_layout,
    extract_pdf_text,
)


def _pdf_with_stream(stream: bytes, compress: bool = False,
                     extra: bytes = b"") -> bytes:
    if compress:
        body = zlib.compress(stream)
        head = b"<< /Filter /FlateDecode /Length %d >>" % len(body)
    else:
        body = stream
        head = b"<< /Length %d >>" % len(body)
    return (
        b"%PDF-1.4\n" + extra +
        b"1 0 obj\n" + head + b"\nstream\n" + body + b"\nendstream\nendobj\n"
        b"%%EOF\n"
    )


class TestContentStream:
    def test_tj_and_line_moves(self):
        s = b"BT /F1 12 Tf 72 720 Td (Hello) Tj 0 -14 Td (World) Tj ET"
        assert _content_text(s) == "Hello\nWorld"

    def test_escapes(self):
        # \ooo octal, \n, escaped parens, backslash
        s = rb"BT (A\052B\nC\(D\)\\E) Tj ET"
        assert _content_text(s) == "A*B\nC(D)\\E"

    def test_line_continuation_backslash_eol(self):
        s = b"BT (split\\\nline) Tj ET"
        assert _content_text(s) == "splitline"

    def test_hex_string(self):
        s = b"BT <48656C6C6F> Tj ET"
        assert _content_text(s) == "Hello"

    def test_hex_odd_digits_padded(self):
        s = b"BT <48656C6C6F2> Tj ET"  # trailing nibble -> ' ' (0x20)
        assert _content_text(s) == "Hello "

    def test_tj_array_kerning_word_gap(self):
        # adjustments <= -180 are word gaps; small kerning is not
        s = b"BT [(Hel) -20 (lo) -250 (world)] TJ ET"
        assert _content_text(s) == "Hello world"

    def test_quote_operators_new_line(self):
        s = b"BT (first) Tj (second) ' ET"
        assert _content_text(s) == "first\nsecond"


class TestDocument:
    def test_uncompressed_and_flate(self):
        s = b"BT (Hi there friend) Tj ET"
        for compress in (False, True):
            out = extract_pdf_text(_pdf_with_stream(s, compress))
            assert out["text"] == "Hi there friend"
            assert out["n_streams"] == 1

    def test_non_pdf_rejected(self):
        with pytest.raises(PdfError, match="header"):
            extract_pdf_text(b"not a pdf")

    def test_encrypted_rejected(self):
        data = _pdf_with_stream(b"BT (secret) Tj ET",
                                extra=b"<< /Encrypt 5 0 R >>\n")
        with pytest.raises(PdfError, match="encrypted"):
            extract_pdf_text(data)

    def test_image_stream_skipped(self):
        # a Flate stream with no BT is not a content stream
        img = zlib.compress(b"\x00" * 64)
        img_head = (b"<< /Filter /FlateDecode /Subtype /Image /Length "
                    + str(len(img)).encode() + b" >>")
        data = (
            b"%PDF-1.4\n1 0 obj\n" + img_head + b"\nstream\n" + img
            + b"\nendstream\nendobj\n"
            b"2 0 obj\n<< /Length 22 >>\nstream\nBT (visible text) Tj ET"
            b"\nendstream\nendobj\n%%EOF\n"
        )
        out = extract_pdf_text(data)
        assert out["text"] == "visible text"
        assert out["n_streams"] == 1

    def test_type0_fonts_counted(self):
        data = _pdf_with_stream(
            b"BT (x) Tj ET",
            extra=b"9 0 obj\n<< /Type /Font /Subtype /Type0 >>\nendobj\n",
        )
        assert extract_pdf_text(data)["n_fonts_skipped"] == 1


class TestStreamDelimiters:
    def test_flate_data_ending_in_newline_byte(self):
        """~1/64 of Flate streams END in 0x0A/0x0D as real data; a blind
        EOL strip before 'endstream' corrupts them (found by the sf0.01
        oracle gate — docs 339/384). The /Length-first candidate order
        must recover these."""
        found = 0
        for n in (469, 520, 548, 576, 599):  # pre-searched EOL-enders
            body = "word " * (n % 97) + "x" * (n % 13) + " end"
            stream = f"BT ({body}) Tj ET".encode()
            assert zlib.compress(stream)[-1:] in (b"\n", b"\r")
            found += 1
            out = extract_pdf_text(_pdf_with_stream(stream, compress=True))
            assert out["text"] == body
        assert found == 5


class TestLayout:
    """Positioned lines — coordinates hand-derived from the spec's
    text-positioning operator semantics (ISO 32000 §9.4.2)."""

    def _rows(self, stream):
        return extract_pdf_layout(_pdf_with_stream(stream))

    def test_td_relative_moves(self):
        rows = self._rows(b"BT 72 720 Td (first) Tj 0 -14 Td (second) Tj ET")
        assert [(r["x"], r["y"], r["text"]) for r in rows] == [
            (72.0, 720.0, "first"), (72.0, 706.0, "second")]
        assert [r["line"] for r in rows] == [0, 1]

    def test_tm_absolute_and_t_star_leading(self):
        rows = self._rows(b"BT 1 0 0 1 100 500 Tm (a) Tj 20 TL T* (b) Tj ET")
        assert [(r["x"], r["y"], r["text"]) for r in rows] == [
            (100.0, 500.0, "a"), (100.0, 480.0, "b")]

    def test_td_uppercase_sets_leading_for_quote(self):
        # TD sets TL = -ty; ' advances one leading before showing
        rows = self._rows(b"BT 72 720 Td 0 -14 TD (a) Tj (b) ' ET")
        assert [(r["y"], r["text"]) for r in rows] == [
            (706.0, "a"), (692.0, "b")]

    def test_same_baseline_merges_left_to_right(self):
        rows = self._rows(
            b"BT 300 700 Td (right) Tj 1 0 0 1 72 700 Tm (left) Tj ET")
        assert len(rows) == 1
        assert rows[0]["text"] == "left right"
        assert rows[0]["x"] == 72.0

    def test_pages_in_stream_order(self):
        data = build_pdf([["page one line"], ["page two line"]])
        rows = extract_pdf_layout(data)
        assert [(r["page"], r["text"]) for r in rows] == [
            (0, "page one line"), (1, "page two line")]
        assert all(r["x"] == 72.0 and r["y"] == 720.0 for r in rows)


class TestWriterRoundTrip:
    def test_multipage_round_trip(self):
        pages = [["alpha beta gamma", "second line here"],
                 ["page two starts", "and continues on"]]
        for compress in (False, True):
            data = build_pdf(pages, compress=compress)
            out = extract_pdf_text(data)
            assert out["n_pages"] == 2
            assert out["n_streams"] == 2
            assert out["text"] == (
                "alpha beta gamma\nsecond line here\n"
                "page two starts\nand continues on"
            )

    def test_special_chars_round_trip(self):
        data = build_pdf([["parens (here) and \\ backslash"]])
        assert extract_pdf_text(data)["text"] == \
            "parens (here) and \\ backslash"

    def test_is_structurally_valid(self):
        data = build_pdf([["x"]])
        assert data.startswith(b"%PDF-1.4")
        assert b"/Type /Catalog" in data and b"startxref" in data
        assert data.rstrip().endswith(b"%%EOF")
