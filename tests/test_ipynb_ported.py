"""Port of the reference IPYNB converter test suite
(/root/reference/src/converter/ipynb.rs tests): cell rendering, kernel
language resolution, titles, plain-text projection, and error paths."""

from __future__ import annotations

import json

import pytest

from anytomd_spark.kernels.simple import MalformedDocument, convert_ipynb


def make_notebook(cells: list[dict], metadata: dict | None = None) -> bytes:
    if metadata is None:
        metadata = {"kernelspec": {"language": "python"}}
    return json.dumps({
        "nbformat": 4, "nbformat_minor": 2,
        "metadata": metadata, "cells": cells,
    }).encode()


def cell(cell_type: str, source) -> dict:
    return {"cell_type": cell_type, "metadata": {}, "source": source}


class TestIpynbCells:
    def test_markdown_cell_passthrough(self):
        md = convert_ipynb(make_notebook(
            [cell("markdown", ["# Hello\n", "\n", "World"])]
        ))["markdown"]
        assert "# Hello" in md and "World" in md

    def test_code_cell_fenced_block(self):
        md = convert_ipynb(make_notebook(
            [cell("code", ["print('hello')"])]
        ))["markdown"]
        assert "```python\nprint('hello')\n```" in md

    def test_raw_cell_fenced_block(self):
        md = convert_ipynb(make_notebook(
            [cell("raw", ["raw content here"])]
        ))["markdown"]
        assert "```\nraw content here\n```" in md

    def test_mixed_cells_ordered(self):
        md = convert_ipynb(make_notebook([
            cell("markdown", ["# Title"]),
            cell("code", ["x = 1"]),
            cell("raw", ["raw data"]),
            cell("markdown", ["## Section"]),
        ]))["markdown"]
        assert "# Title" in md
        assert "```python\nx = 1\n```" in md
        assert "```\nraw data\n```" in md
        assert "## Section" in md
        assert (md.find("# Title") < md.find("```python")
                < md.find("```\nraw data") < md.find("## Section"))

    def test_empty_notebook(self):
        out = convert_ipynb(make_notebook([]))
        assert out["markdown"] == "" and out["title"] is None

    def test_source_as_string(self):
        md = convert_ipynb(make_notebook(
            [cell("code", "x = 42")]
        ))["markdown"]
        assert "x = 42" in md

    def test_outputs_ignored(self):
        nb = make_notebook([{
            "cell_type": "code", "metadata": {},
            "source": ["print('hello')"],
            "outputs": [{"output_type": "stream", "name": "stdout",
                         "text": ["hello\n"]}],
        }])
        md = convert_ipynb(nb)["markdown"]
        assert "print('hello')" in md
        assert "output_type" not in md and "stdout" not in md

    def test_unicode_cjk(self):
        md = convert_ipynb(make_notebook([
            cell("markdown", ["# 한국어 제목"]),
            cell("code", ["# 中文注释\nprint('日本語')"]),
        ]))["markdown"]
        assert "한국어 제목" in md and "中文注释" in md and "日本語" in md

    def test_emoji(self):
        md = convert_ipynb(make_notebook([
            cell("markdown", ["# Emoji Test 🚀"]),
            cell("code", ["x = '✨🌍'"]),
        ]))["markdown"]
        assert "🚀" in md and "✨🌍" in md


class TestIpynbTitlesAndLanguage:
    def test_title_from_heading(self):
        out = convert_ipynb(make_notebook([
            cell("markdown", ["Some text without heading"]),
            cell("markdown", ["# My Notebook Title\n", "\n", "Body"]),
        ]))
        assert out["title"] == "My Notebook Title"

    def test_title_from_metadata_overrides(self):
        out = convert_ipynb(make_notebook(
            [cell("markdown", ["# Heading Title"])],
            metadata={"title": "Metadata Title",
                      "kernelspec": {"language": "python"}},
        ))
        assert out["title"] == "Metadata Title"

    def test_kernel_language_detected(self):
        md = convert_ipynb(make_notebook(
            [cell("code", ["val x = 1"])],
            metadata={"kernelspec": {"language": "scala"}},
        ))["markdown"]
        assert "```scala\n" in md

    def test_language_info_fallback(self):
        md = convert_ipynb(make_notebook(
            [cell("code", ["puts 'hi'"])],
            metadata={"language_info": {"name": "ruby"}},
        ))["markdown"]
        assert "```ruby\n" in md

    def test_default_language_python(self):
        md = convert_ipynb(make_notebook(
            [cell("code", ["x = 1"])], metadata={}
        ))["markdown"]
        assert "```python\n" in md


class TestIpynbErrors:
    def test_invalid_json_raises(self):
        with pytest.raises(MalformedDocument):
            convert_ipynb(b"{ not valid json }")

    def test_missing_cells_raises(self):
        with pytest.raises(MalformedDocument, match="cells"):
            convert_ipynb(b'{"metadata": {}}')

    def test_unknown_cell_type_warning(self):
        out = convert_ipynb(make_notebook(
            [cell("custom_type", ["some content"])]
        ))
        assert len(out["warnings"]) == 1
        assert out["warnings"][0]["code"] == "SkippedElement"
        assert "custom_type" in out["warnings"][0]["message"]

    def test_no_warnings_on_clean_notebook(self):
        out = convert_ipynb(make_notebook([
            cell("markdown", ["# Clean"]), cell("code", ["x = 1"]),
        ]))
        assert out["warnings"] == []


class TestIpynbPlainText:
    def test_code_no_fences(self):
        out = convert_ipynb(make_notebook([
            cell("markdown", ["# Title"]),
            cell("code", ["x = 1\ny = 2"]),
        ]))
        assert "```" not in out["plain_text"]
        assert "x = 1\ny = 2" in out["plain_text"]
        assert "# Title" in out["plain_text"]

    def test_raw_no_fences(self):
        out = convert_ipynb(make_notebook([cell("raw", ["raw data here"])]))
        assert "```" not in out["plain_text"]
        assert "raw data here" in out["plain_text"]

    def test_mixed_cells_ordered(self):
        pt = convert_ipynb(make_notebook([
            cell("markdown", ["## Section"]),
            cell("code", ["print('hello')"]),
            cell("raw", ["raw content"]),
        ]))["plain_text"]
        assert (pt.find("## Section") < pt.find("print('hello')")
                < pt.find("raw content"))

    def test_empty_notebook(self):
        assert convert_ipynb(make_notebook([]))["plain_text"] == ""
