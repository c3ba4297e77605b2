"""Port of the reference detection test suite
(/root/reference/src/detection.rs tests), mapped onto the transcript-turn
sniffing API: ``detect_by_extension`` mirrors the extension table,
``sniff_format(payload, hint)`` mirrors detect_format's magic/heuristic
priority (binary magics arrive base64-encoded in a text column)."""

from __future__ import annotations

import base64

import pytest

from anytomd_spark.kernels import sniff


class TestDetectByExtension:
    @pytest.mark.parametrize("ext,want", [
        ("docx", "docx"), ("pptx", "pptx"), ("xlsx", "xlsx"),
        ("csv", "csv"), ("json", "json"), ("txt", "txt"),
        ("pdf", "pdf"), ("html", "html"), ("htm", "html"),
        ("ipynb", "ipynb"), ("xml", "xml"), ("xls", "xls"),
    ])
    def test_direct_extensions(self, ext, want):
        assert sniff.detect_by_extension(ext) == want

    @pytest.mark.parametrize("ext", [
        "log", "md", "markdown", "rst", "ini", "cfg", "conf", "toml",
        "yaml", "yml",
    ])
    def test_text_variants(self, ext):
        assert sniff.detect_by_extension(ext) == "txt"

    @pytest.mark.parametrize("ext", [
        "png", "jpg", "jpeg", "gif", "webp", "bmp", "tiff", "tif", "svg",
        "heic", "heif", "avif",
    ])
    def test_image_variants(self, ext):
        assert sniff.detect_by_extension(ext) == "image"

    @pytest.mark.parametrize("ext", sorted(sniff.CODE_EXTS))
    def test_code_variants(self, ext):
        assert sniff.detect_by_extension(ext) == "code"

    def test_unknown_returns_none(self):
        assert sniff.detect_by_extension("xyz") is None

    def test_no_extension_returns_none(self):
        assert sniff.detect_by_extension("") is None


class TestSniffPriority:
    def test_zip_magic_overrides_extension(self):
        # a base64 ZIP in a turn hinted csv still resolves by introspection
        payload = base64.b64encode(b"PK\x03\x04junk").decode()
        fmt, binary = sniff.sniff_format(payload, "csv")
        assert binary is not None
        assert fmt != "csv"

    def test_pdf_magic_overrides_extension(self):
        fmt, _ = sniff.sniff_format("%PDF-1.7 content", "txt")
        assert fmt == "pdf"

    def test_json_heuristic_object(self):
        fmt, _ = sniff.sniff_format('  { "key": "value" }', None)
        assert fmt == "json"

    def test_json_heuristic_array(self):
        fmt, _ = sniff.sniff_format("[1, 2, 3]", None)
        assert fmt == "json"

    def test_txt_hint_beats_json_heuristic(self):
        fmt, _ = sniff.sniff_format("{ this is just a text file }", "txt")
        assert fmt == "txt"

    def test_csv_hint_beats_bracket_heuristic(self):
        fmt, _ = sniff.sniff_format("[header1],header2\nval1,val2", "csv")
        assert fmt == "csv"

    def test_json_heuristic_with_utf8_bom(self):
        fmt, _ = sniff.sniff_format('﻿{"key":"value"}', None)
        assert fmt == "json"

    def test_ipynb_hint_not_caught_by_json_heuristic(self):
        fmt, _ = sniff.sniff_format('{ "cells": [] }', "ipynb")
        assert fmt == "ipynb"

    def test_ole_magic_is_xls(self):
        payload = base64.b64encode(
            b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 8
        ).decode()
        fmt, binary = sniff.sniff_format(payload, None)
        assert fmt == "xls" and binary is not None
