"""Arrow-batched conversion kernel: pandas DataFrame -> pandas DataFrame.

This is the single JVM<->Python crossing of the pipeline (SURVEY.md §3.4).
Format resolution is vectorized with pandas string ops over the whole batch
(the reference's per-file ``detect_format`` priority, detection.rs:18-48,
re-expressed as column masks); the per-format kernels then run over each
format's sub-frame. No per-row Python dispatch happens on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from anytomd_spark.kernels import sniff
from anytomd_spark.kernels.convert import convert_bytes

OUTPUT_FIELDS = [
    ("markdown", "string"),
    ("plain_text", "string"),
    ("title", "string"),
    ("fmt", "string"),
    ("error", "string"),
    ("n_warnings", "int32"),
    ("warning_codes", "object"),  # list[str]
    ("bytes_in", "int64"),
    ("chars_out", "int64"),
]

OUTPUT_SPARK_SCHEMA = (
    "markdown string, plain_text string, title string, fmt string, "
    "error string, n_warnings int, warning_codes array<string>, "
    "bytes_in long, chars_out long"
)

# tool-column hint -> format, precomputed from the detection tables
_HINT_TO_FMT: dict[str, str] = {}
for _ext in list(sniff.CODE_EXTS):
    _HINT_TO_FMT[_ext] = "code"
for _ext in ("html", "htm"):
    _HINT_TO_FMT[_ext] = "html"
for _ext in ("docx", "pptx", "xlsx", "xls", "csv", "ipynb", "json", "pdf", "xml"):
    _HINT_TO_FMT[_ext] = _ext
for _ext in ("txt", "text", "log", "md", "markdown", "rst", "ini", "cfg",
             "conf", "toml", "yaml", "yml"):
    _HINT_TO_FMT[_ext] = "txt"
for _ext in sniff._IMAGE_EXTS:
    _HINT_TO_FMT[_ext] = "image"


def classify_formats(text: pd.Series, tool: pd.Series) -> pd.Series:
    """Vectorized format resolution over a batch (detection priority:
    base64 binary magic -> %PDF -> tool hint -> JSON heuristic -> markup)."""
    n = len(text)
    fmt = pd.Series([None] * n, index=text.index, dtype=object)
    t = text.fillna("")

    # 1. magic prefixes
    is_zip = t.str.startswith("UEsDB")
    is_ole = t.str.startswith("0M8R")
    is_pdf = t.str.startswith("%PDF")
    fmt[is_zip] = "zipb64"  # refined per-row below (needs ZIP introspection)
    fmt[is_ole] = "xls"
    fmt[is_pdf & fmt.isna()] = "pdf"

    # 2. tool hint
    hints = tool.fillna("").str.strip().str.lstrip(".").str.lower()
    hinted = hints.map(_HINT_TO_FMT)
    take_hint = fmt.isna() & hinted.notna()
    fmt[take_hint] = hinted[take_hint]

    # 3. JSON heuristic: first non-ws char is { or [
    head = t.str.replace("﻿", "", n=1).str.lstrip(" \t\r\n\x0b\x0c").str[:1]
    fmt[fmt.isna() & head.isin(("{", "["))] = "json"

    # 4. markup fallback for hint-less turns
    low = t.str.lstrip(" \t\r\n\x0b\x0c").str[:256].str.lower()
    html_like = (
        low.str.startswith("<!doctype html")
        | low.str.startswith("<html")
        | low.str.contains(
            r"<head|<body|<div|<p>|<p |<table|<h1|<ul|<span|<br",
            regex=True,
        )
    )
    fmt[fmt.isna() & html_like] = "html"
    xml_like = low.str.startswith("<?xml") | (
        low.str.startswith("<") & low.str.contains(">", regex=False)
    )
    fmt[fmt.isna() & xml_like] = "xml"
    return fmt


def convert_batch(
    pdf: pd.DataFrame,
    strict: bool = False,
    max_input_bytes: int | None = None,
) -> pd.DataFrame:
    """Convert a batch of turns. Requires ``text`` and ``tool`` columns;
    passthrough columns are preserved. Never raises on a row."""
    n = len(pdf)
    text = pdf["text"].astype(object).fillna("")
    tool = pdf.get("tool", pd.Series([""] * n, index=pdf.index))

    fmt = classify_formats(text, tool)

    markdown = np.full(n, None, dtype=object)
    plain = np.full(n, None, dtype=object)
    title = np.full(n, None, dtype=object)
    error = np.full(n, None, dtype=object)
    n_warnings = np.zeros(n, dtype=np.int32)
    warning_codes = np.full(n, None, dtype=object)
    bytes_in = np.zeros(n, dtype=np.int64)
    chars_out = np.zeros(n, dtype=np.int64)
    out_fmt = np.full(n, None, dtype=object)

    text_arr = text.to_numpy(dtype=object)
    fmt_arr = fmt.to_numpy(dtype=object)
    hints_arr = tool.fillna("").astype(str).to_numpy(dtype=object)

    for i in range(n):
        payload = text_arr[i]
        row_fmt = fmt_arr[i]
        if row_fmt is None:
            bytes_in[i] = len(payload.encode("utf-8"))
            error[i] = "unsupported format"
            continue
        data = None
        if row_fmt == "image":
            # image payloads may arrive base64-encoded (like the binary
            # formats) — decode for magic-based mime sniffing if possible
            import base64 as _b64
            import binascii as _ba
            try:
                data = _b64.b64decode(payload, validate=True)
            except (_ba.Error, ValueError):
                data = None
        elif row_fmt in ("zipb64", "xls") and (
            payload.startswith("UEsDB") or payload.startswith("0M8R")
        ):
            data = sniff.maybe_base64_binary(payload)
            if data is None:
                error[i] = "invalid base64 binary payload"
                bytes_in[i] = len(payload.encode("utf-8"))
                continue
            if row_fmt == "zipb64":
                row_fmt = sniff.detect_zip_format(data)
                if row_fmt is None:
                    error[i] = "unsupported format: unrecognized ZIP"
                    out_fmt[i] = "zip"
                    bytes_in[i] = len(data)
                    continue
        if data is None:
            data = payload.encode("utf-8")
        bytes_in[i] = len(data)
        out_fmt[i] = row_fmt
        if row_fmt == "pdf":
            error[i] = "unsupported format: pdf"
            continue
        ext = row_fmt
        if row_fmt in ("code", "txt", "image"):
            # keep the concrete extension (language tag / image filename)
            h = hints_arr[i].strip().lstrip(".").lower()
            if h and h != row_fmt:
                ext = h
        try:
            kw = {} if max_input_bytes is None else {
                "max_input_bytes": max_input_bytes
            }
            result = convert_bytes(data, ext, strict=strict, **kw)
        except Exception as e:  # noqa: BLE001 best-effort row semantics
            error[i] = f"{type(e).__name__}: {e}"
            continue
        markdown[i] = result["markdown"]
        plain[i] = result["plain_text"]
        title[i] = result["title"]
        warns = result["warnings"]
        n_warnings[i] = len(warns)
        if warns:
            warning_codes[i] = [w["code"] for w in warns]
        chars_out[i] = len(result["markdown"])

    out = pdf.copy()
    out["markdown"] = markdown
    out["plain_text"] = plain
    out["title"] = title
    out["fmt"] = out_fmt
    out["error"] = error
    out["n_warnings"] = n_warnings
    out["warning_codes"] = warning_codes
    out["bytes_in"] = bytes_in
    out["chars_out"] = chars_out
    return out
