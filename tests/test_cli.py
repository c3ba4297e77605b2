"""CLI parity tests (reference src/runner.rs): multi-file separators,
stdin mode, warning/error streams, exit codes, and file-level detection
(lib.rs convert_file + detection.rs magic/extension/heuristic)."""

from __future__ import annotations

import base64
import io
import sys

import pytest

from anytomd_spark.binfixtures import BIN_FIXTURES
from anytomd_spark.cli import main
from anytomd_spark.kernels.convert import convert_file


@pytest.fixture()
def files(tmp_path):
    (tmp_path / "a.csv").write_text("x,y\n1,2\n")
    (tmp_path / "b.html").write_text("<h1>T</h1><p>body</p>")
    (tmp_path / "doc.docx").write_bytes(
        base64.b64decode(BIN_FIXTURES["docx"][0])
    )
    return tmp_path


def run_cli(argv, stdin: bytes = b""):
    out, err = io.StringIO(), io.StringIO()
    old = sys.stdout, sys.stderr, sys.stdin
    sys.stdout, sys.stderr = out, err
    sys.stdin = io.TextIOWrapper(io.BytesIO(stdin))
    try:
        code = main(argv)
    except SystemExit as e:  # argparse errors
        code = e.code
    finally:
        sys.stdout, sys.stderr, sys.stdin = old
    return code, out.getvalue(), err.getvalue()


class TestCliFiles:
    def test_single_file_no_separator(self, files):
        code, out, err = run_cli([str(files / "a.csv")])
        assert code == 0
        assert "<!-- source:" not in out
        assert "| x | y |" in out

    def test_multi_file_separators(self, files):
        code, out, _ = run_cli([str(files / "a.csv"), str(files / "b.html")])
        assert code == 0
        assert out.count("<!-- source:") == 2
        # blank line between outputs (runner.rs:186-188)
        assert f"\n<!-- source: {files / 'b.html'} -->\n\n" in out

    def test_multi_file_plain_text_no_separator(self, files):
        code, out, _ = run_cli(
            [str(files / "a.csv"), str(files / "b.html"), "--plain-text"]
        )
        assert code == 0
        assert "<!-- source:" not in out
        assert "x\ty" in out and "body" in out

    def test_docx_by_magic(self, files):
        code, out, _ = run_cli([str(files / "doc.docx")])
        assert code == 0
        assert "# Quarterly Report" in out

    def test_missing_file_continues_exit_1(self, files):
        code, out, err = run_cli(
            [str(files / "nope.html"), str(files / "a.csv")]
        )
        assert code == 1
        assert "error:" in err and "nope.html" in err
        assert "| x | y |" in out  # second file still converted

    def test_pdf_rejected(self, tmp_path):
        p = tmp_path / "t.pdf"
        p.write_bytes(b"%PDF-1.7 fake")
        code, _, err = run_cli([str(p)])
        assert code == 1
        assert "intentionally unsupported" in err

    def test_output_file(self, files, tmp_path):
        dest = tmp_path / "out.md"
        code, out, _ = run_cli([str(files / "a.csv"), "-o", str(dest)])
        assert code == 0 and out == ""
        assert "| x | y |" in dest.read_text()

    def test_format_override(self, files):
        # treat the csv as plain text via --format
        code, out, _ = run_cli([str(files / "a.csv"), "--format", "txt"])
        assert code == 0
        assert "| x | y |" not in out and "x,y" in out


class TestCliStdin:
    def test_stdin_requires_format(self):
        code, _, err = run_cli([])
        assert code == 2
        assert "--format is required" in err

    def test_stdin_html(self):
        code, out, _ = run_cli(
            ["--format", "html"], stdin=b"<h1>Hi</h1><p>there</p>"
        )
        assert code == 0
        assert "# Hi" in out and "there" in out

    def test_stdin_conversion_error_exit_1(self):
        code, _, err = run_cli(["--format", "xml"], stdin=b"<broken")
        assert code == 1 and "error: stdin:" in err

    def test_bad_size_exit_2(self):
        code, _, err = run_cli(["--max-input-size", "nonsense", "x.txt"])
        assert code == 2 and "invalid number" in err


class TestConvertFile:
    def test_detection_by_magic_beats_extension(self, tmp_path):
        # DOCX bytes with a .csv name still convert as DOCX
        p = tmp_path / "mislabeled.csv"
        p.write_bytes(base64.b64decode(BIN_FIXTURES["docx"][0]))
        out = convert_file(str(p))
        assert "# Quarterly Report" in out["markdown"]

    def test_json_heuristic_unknown_extension(self, tmp_path):
        p = tmp_path / "data.dat"
        p.write_text('{"k": 1}')
        assert "```json" in convert_file(str(p))["markdown"]

    def test_unknown_zip_rejected(self, tmp_path):
        import zipfile
        p = tmp_path / "x.bin"
        with zipfile.ZipFile(p, "w") as zf:
            zf.writestr("random/file.txt", "hi")
        with pytest.raises(Exception, match="zip"):
            convert_file(str(p))

    def test_size_guard(self, tmp_path):
        p = tmp_path / "big.txt"
        p.write_text("x" * 1000)
        with pytest.raises(Exception, match="exceeds limit"):
            convert_file(str(p), max_input_bytes=100)

    def test_code_keeps_extension(self, tmp_path):
        p = tmp_path / "script.py"
        p.write_text("print('hi')\n")
        assert "```python" in convert_file(str(p))["markdown"]


class TestCliPortedIntegration:
    """Port of /root/reference/tests/test_cli.rs expectations."""

    def test_stdin_uppercase_format(self):
        code, out, _ = run_cli(["--format", "TXT"], stdin=b"hello world")
        assert code == 0 and "hello world" in out

    def test_stdin_dotted_format(self):
        code, out, _ = run_cli(["--format", ".txt"], stdin=b"hello world")
        assert code == 0 and "hello world" in out

    def test_stdin_csv_format(self):
        code, out, _ = run_cli(["--format", "csv"],
                               stdin=b"Name,Age\nAlice,30\n")
        assert code == 0
        assert "Alice" in out and "| Name | Age |" in out

    def test_stdin_json_utf16_bom(self):
        payload = b"\xff\xfe" + '{"k":1}\n'.encode("utf-16-le")
        code, out, _ = run_cli(["--format", "json"], stdin=payload)
        assert code == 0 and '"k"' in out

    def test_strict_fails_on_warning(self):
        code, _, err = run_cli(["--strict", "--format", "txt"],
                               stdin=b"\xe9")
        assert code == 1 and "strict mode" in err

    def test_strict_clean_file_succeeds(self, files):
        code, out, _ = run_cli(["--strict", str(files / "a.csv")])
        assert code == 0 and "| x | y |" in out

    def test_max_input_size_rejects_large(self, files):
        code, _, err = run_cli(
            ["--max-input-size", "1B", str(files / "a.csv")]
        )
        assert code == 1 and "error:" in err

    def test_max_input_size_accepts_valid(self, files):
        code, out, _ = run_cli(
            ["--max-input-size", "1GiB", str(files / "a.csv")]
        )
        assert code == 0 and "| x | y |" in out

    def test_max_image_and_zip_size_accepted(self, files):
        code, _, _ = run_cli(
            ["--max-image-size", "100MB", "--max-zip-size", "2GiB",
             str(files / "a.csv")]
        )
        assert code == 0

    def test_gemini_without_api_key_exit_2(self, files, monkeypatch):
        monkeypatch.delenv("GEMINI_API_KEY", raising=False)
        code, _, err = run_cli(["--gemini", str(files / "a.csv")])
        assert code == 2 and "--gemini" in err

    def test_gemini_model_requires_gemini(self, files):
        code, _, err = run_cli(
            ["--gemini-model", "some-model", str(files / "a.csv")]
        )
        assert code == 2
