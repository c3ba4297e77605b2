"""Local (non-Spark) CLI mirroring the reference binary's runner
(/root/reference/src/runner.rs): convert files or stdin to Markdown.

    python -m anytomd_spark.cli doc.docx page.html -o out.md
    cat page.html | python -m anytomd_spark.cli --format html

Semantics ported from runner.rs:
* no files -> read stdin; ``--format`` is then required (runner.rs:161-181)
* multiple files -> a blank line between outputs and a
  ``<!-- source: path -->`` separator before each (markdown mode only,
  runner.rs:186-192)
* warnings to stderr as ``warning: [Code] message (loc)`` (runner.rs:108-115)
* per-file errors to stderr as ``error: path: message``; conversion
  continues and the exit code is 1 if any file failed (runner.rs:199-215)
* argument errors (e.g. stdin without --format, bad sizes) exit 2
"""

from __future__ import annotations

import argparse
import sys

from anytomd_spark.kernels.convert import convert_bytes, convert_file
from anytomd_spark.kernels.parse import ByteSizeError, byte_size


def _print_warnings(warnings: list[dict]) -> None:
    for w in warnings:
        loc = w.get("location")
        if loc:
            print(f"warning: [{w['code']}] {w['message']} ({loc})",
                  file=sys.stderr)
        else:
            print(f"warning: [{w['code']}] {w['message']}", file=sys.stderr)


def _size(ap: argparse.ArgumentParser, flag: str, value: str | None,
          default: int) -> int:
    if value is None:
        return default
    try:
        return byte_size(value)
    except ByteSizeError as e:
        ap.error(f"{flag}: {e}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="anytomd", description="Convert various document formats to Markdown."
    )
    ap.add_argument("files", nargs="*", help="input files; omit to read stdin")
    ap.add_argument("-o", "--output", metavar="PATH",
                    help="write output to a file instead of stdout")
    ap.add_argument("-f", "--format", metavar="FMT",
                    help="format hint (e.g. html, csv); required for stdin")
    ap.add_argument("--strict", action="store_true",
                    help="treat recoverable errors as hard errors")
    ap.add_argument("--plain-text", action="store_true",
                    help="output plain text instead of Markdown")
    ap.add_argument("--max-input-size", metavar="SIZE", default=None)
    ap.add_argument("--max-image-size", metavar="SIZE", default=None)
    ap.add_argument("--max-zip-size", metavar="SIZE", default=None)
    ap.add_argument("--gemini", action="store_true",
                    help="use Gemini for image descriptions "
                         "(requires GEMINI_API_KEY)")
    ap.add_argument("--gemini-model", metavar="MODEL", default=None)
    args = ap.parse_args(argv)

    if args.gemini_model and not args.gemini:
        ap.error("--gemini-model requires --gemini")
    if args.gemini:
        # flag parity with runner.rs:128-137 — from_env fails -> exit 2;
        # this build additionally has no network path to the API
        import os
        if not os.environ.get("GEMINI_API_KEY"):
            print("error: --gemini: GEMINI_API_KEY not set", file=sys.stderr)
            return 2
        print("error: --gemini: image description is not available in the "
              "Spark build (no network); run the describer on-cluster via "
              "convert_image(describer=...)", file=sys.stderr)
        return 2

    max_input = _size(ap, "--max-input-size", args.max_input_size, 8 << 30)
    max_image = _size(ap, "--max-image-size", args.max_image_size, 4 << 30)
    max_zip = _size(ap, "--max-zip-size", args.max_zip_size, 16 << 30)
    kw = dict(strict=args.strict, max_input_bytes=max_input,
              max_zip_bytes=max_zip, max_image_bytes=max_image)

    out = open(args.output, "w", encoding="utf-8") if args.output else sys.stdout

    def emit(result: dict) -> None:
        _print_warnings(result["warnings"])
        out.write(result["plain_text" if args.plain_text else "markdown"] or "")

    had_error = False
    try:
        if not args.files:
            if not args.format:
                ap.error("--format is required when reading from stdin")
            data = sys.stdin.buffer.read()
            try:
                emit(convert_bytes(data, args.format, **kw))
            except Exception as e:  # noqa: BLE001 - CLI error surface
                print(f"error: stdin: {e}", file=sys.stderr)
                return 1
            return 0

        multiple = len(args.files) > 1
        for i, path in enumerate(args.files):
            if multiple and i > 0:
                out.write("\n")
            if multiple and not args.plain_text:
                out.write(f"<!-- source: {path} -->\n\n")
            try:
                if args.format:
                    with open(path, "rb") as f:
                        result = convert_bytes(f.read(), args.format, **kw)
                else:
                    result = convert_file(path, **kw)
            except OSError as e:
                print(f"error: {path}: {e}", file=sys.stderr)
                had_error = True
                continue
            except Exception as e:  # noqa: BLE001 - per-file best effort
                print(f"error: {path}: {e}", file=sys.stderr)
                had_error = True
                continue
            emit(result)
    finally:
        out.flush()
        if out is not sys.stdout:
            out.close()
    return 1 if had_error else 0


if __name__ == "__main__":
    sys.exit(main())
