"""Spark binding for main-content extraction (HTML boilerplate strip).

A struct-returning Arrow-batched pandas UDF over the HTML column — the
binding style measured in PLANS.md round-3: Catalyst prunes THROUGH a
scalar UDF, so a consumer that only reads e.g. ``boilerplate_ratio``
still runs the kernel once per row but ships no unused passthrough
columns, and a consumer referencing none of the outputs skips
extraction entirely.

Kernel: :mod:`anytomd_spark.kernels.main_content` (block segmentation +
the WSDM'10 link-density / word-count decision rules).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from anytomd_spark.kernels.main_content import extract_main_content

MAIN_CONTENT_SCHEMA = (
    "content string, n_blocks int, n_content_blocks int, "
    "n_words int, n_content_words int, boilerplate_ratio double"
)

_COLS = ["content", "n_blocks", "n_content_blocks", "n_words",
         "n_content_words", "boilerplate_ratio"]


@pandas_udf(MAIN_CONTENT_SCHEMA)
def extract_main_content_udf(htmls: pd.Series) -> pd.DataFrame:
    rows = [extract_main_content(h) for h in htmls]
    return pd.DataFrame([[r[c] for c in _COLS] for r in rows],
                        columns=_COLS)


def main_content(docs: DataFrame, html_col: str = "html") -> DataFrame:
    """Append the extraction struct as ``mc`` (map-side only, no
    shuffle; Arrow-batched)."""
    return docs.withColumn("mc", extract_main_content_udf(F.col(html_col)))


PDF_TEXT_SCHEMA = (
    "text string, n_pages int, n_streams int, n_fonts_skipped int, "
    "error string"
)

_PDF_COLS = ["text", "n_pages", "n_streams", "n_fonts_skipped", "error"]


@pandas_udf(PDF_TEXT_SCHEMA)
def extract_pdf_text_udf(payloads: pd.Series) -> pd.DataFrame:
    from anytomd_spark.kernels.pdf_text import PdfError, extract_pdf_text

    rows = []
    for p in payloads:
        try:
            r = extract_pdf_text(bytes(p) if p is not None else b"")
            rows.append([r["text"], r["n_pages"], r["n_streams"],
                         r["n_fonts_skipped"], None])
        except PdfError as e:
            rows.append([None, None, None, None, str(e)])
    return pd.DataFrame(rows, columns=_PDF_COLS)


@pandas_udf("binary")
def typeset_pdf_udf(texts: pd.Series) -> pd.Series:
    """Deterministic typesetter for tests/synthetic corpora: 8-word
    lines, 20-line pages, FlateDecode streams (kernels/pdf_text
    build_pdf)."""
    from anytomd_spark.kernels.pdf_text import build_pdf

    out = []
    for t in texts:
        # the writer emits latin-1 PDF string literals; transliterate
        # non-latin-1 codepoints to '?' HERE (one '?' per char, same as
        # codecs 'replace') so the oracle can apply the identical
        # regexp_replace and both engines hash the same words
        t = "".join(c if ord(c) < 256 else "?" for c in (t or ""))
        words = t.split()
        lines = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
        pages = [lines[i:i + 20] for i in range(0, len(lines), 20)]
        out.append(build_pdf(pages or [[""]]))
    return pd.Series(out)


def pdf_text(docs: DataFrame, pdf_col: str = "pdf") -> DataFrame:
    """PDF text extraction over an opaque binary column (north rule:
    "PDF/layout parse") — stdlib content-stream walker, per-row error
    capture, map-side Arrow batches. The CONVERTER dispatch still
    rejects PDFs (reference parity, kernels/convert.py); this is the
    beyond-reference pipeline operator."""
    return docs.withColumn("pdf_text", extract_pdf_text_udf(F.col(pdf_col)))


URL_PATTERN = r"https?://[^\s]+"

# deliberately-small public-suffix subset (the full PSL is a data file a
# real deployment ships; the LOGIC — 2-part suffixes take 3 labels — is
# what matters and is engine-reproducible)
TWO_PART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "co.in", "co.nz",
    "com.au", "com.br", "com.cn",
)


def extract_urls(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, url) per URL occurrence in the text — regexp_extract_all
    JVM-side, map-only."""
    return docs.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)
        ).alias("url"),
    )


def registered_domain(host_col) -> "F.Column":
    """eTLD+1 under the suffix subset above: hosts ending in a 2-part
    public suffix keep 3 labels, everything else 2."""
    parts = F.split(host_col, r"\.")
    last2 = F.array_join(F.slice(parts, -2, 2), ".")
    return F.when(
        last2.isin(*TWO_PART_SUFFIXES) & (F.size(parts) >= 3),
        F.array_join(F.slice(parts, -3, 3), "."),
    ).otherwise(last2)


def domain_stats(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Per-registered-domain URL/document counts — the corpus-curation
    view behind domain blocklists and mix dashboards. One explode + one
    groupBy on the near-uniform domain key."""
    urls = extract_urls(docs, id_col, text_col)
    host = F.regexp_extract("url", r"https?://([^/?#]+)", 1)
    return (
        urls.select(id_col, registered_domain(host).alias("domain"))
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct(id_col).alias("n_docs"),
        )
    )


def blocklist_filter(docs: DataFrame, blocked: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Drop documents containing any URL whose registered domain is on
    the blocklist (``blocked`` has a ``domain`` column — small, so it
    BROADCASTS; the corpus side never shuffles)."""
    urls = extract_urls(docs, id_col, text_col)
    host = F.regexp_extract("url", r"https?://([^/?#]+)", 1)
    hits = (
        urls.select(id_col, registered_domain(host).alias("domain"))
        .join(F.broadcast(blocked.select("domain")), "domain", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(hits, id_col, "left_anti")


WARC_SCHEMA = (
    "blob_id long, rec_idx int, warc_type string, url string, "
    "status int, content_type string, body_md5 string, content_md5 string"
)


def warc_extract(blobs: DataFrame, id_col: str = "blob_id",
                 payload_col: str = "payload") -> DataFrame:
    """Crawl-ingest edge: parse WARC blobs (plain or member-gzip) and
    run the main-content extractor over every HTML response body — the
    Common-Crawl-shaped pipeline head, one Arrow batch of blobs at a
    time, one output row per WARC record. Non-response records carry
    status=-1 and empty content fields (no NULLs — keeps the row shape
    engine-uniform); a malformed blob yields a single error row
    (warc_type='error')."""
    import hashlib

    from anytomd_spark.kernels.main_content import extract_main_content
    from anytomd_spark.kernels.warc import WarcError, parse_warc

    def run(iterator):
        for pdf in iterator:
            rows = []
            for blob_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    recs = parse_warc(data)
                except WarcError as e:
                    rows.append((int(blob_id), 0, "error", str(e)[:200],
                                 -1, "", "", ""))
                    continue
                for ri, r in enumerate(recs):
                    if "body" in r:
                        body = r["body"]
                        content = ""
                        if r["content_type"].startswith("text/html"):
                            content = extract_main_content(
                                body.decode("utf-8", "replace"))["content"]
                        rows.append((
                            int(blob_id), ri, r["warc_type"], r["url"],
                            r["status"], r["content_type"],
                            hashlib.md5(body).hexdigest(),
                            hashlib.md5(content.encode()).hexdigest(),
                        ))
                    else:
                        rows.append((
                            int(blob_id), ri, r["warc_type"], r["url"],
                            -1, "",
                            hashlib.md5(r["payload"]).hexdigest(), "",
                        ))
            yield pd.DataFrame(
                rows,
                columns=["blob_id", "rec_idx", "warc_type", "url",
                         "status", "content_type", "body_md5",
                         "content_md5"],
            )

    return blobs.select(id_col, payload_col).mapInPandas(
        run, schema=WARC_SCHEMA)


PDF_LAYOUT_SCHEMA = (
    "doc_id long, page int, line int, x double, y double, text string"
)


def pdf_layout(docs: DataFrame, id_col: str = "doc_id",
               pdf_col: str = "pdf") -> DataFrame:
    """LAYOUT parse: one output row per positioned text line, in
    reading order (page, top-to-bottom, baseline-merged left-to-right)
    — the one-to-many Arrow batch shape (same contract as frame
    sampling). Unparseable payloads emit no rows."""
    from anytomd_spark.kernels.pdf_text import PdfError, extract_pdf_layout

    def run(iterator):
        for pdf in iterator:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[pdf_col]):
                try:
                    lines = extract_pdf_layout(
                        bytes(payload) if payload is not None else b"")
                except PdfError:
                    continue
                for r in lines:
                    rows.append((int(doc_id), r["page"], r["line"],
                                 r["x"], r["y"], r["text"]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "line", "x", "y", "text"])

    return docs.select(id_col, pdf_col).mapInPandas(
        run, schema=PDF_LAYOUT_SCHEMA)
