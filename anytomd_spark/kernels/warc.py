"""Pure-stdlib WARC reader/writer (ISO 28500) — the container format of
web-scale crawls (Common Crawl ships WARC; a 100 TB text pipeline's
ingest edge starts here).

Reader: concatenated WARC records, plain or gzip (including the
member-per-record gzip layout crawlers emit — stdlib ``zlib`` consumes
concatenated members). Each record: a ``WARC/1.x`` version line,
CRLF-terminated headers, a mandatory ``Content-Length`` payload block,
and a CRLF CRLF record separator. ``response`` records additionally get
their HTTP/1.x status line, headers, and body split out (chunked
transfer encoding raises — fail loudly, never a wrong body).

Writer: minimal conformant records for tests and the deterministic
synthetic-crawl generator.
"""

from __future__ import annotations

import zlib


class WarcError(ValueError):
    """Malformed WARC / HTTP structure."""


def _gunzip_members(data: bytes) -> bytes:
    """Decompress one or more concatenated gzip members."""
    out = bytearray()
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out += d.decompress(data)
            out += d.flush()
        except zlib.error as e:
            raise WarcError(f"gzip member decode failed: {e}") from None
        data = d.unused_data
    return bytes(out)


def _parse_headers(block: bytes) -> dict:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if not line:
            continue
        k, sep, v = line.partition(b":")
        if not sep:
            raise WarcError(f"malformed header line {line[:60]!r}")
        headers[k.strip().decode("latin-1").lower()] = \
            v.strip().decode("latin-1")
    return headers


def parse_http_response(payload: bytes) -> dict:
    """HTTP/1.x response payload -> {"status", "http_headers", "body"}."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        raise WarcError("HTTP response without header terminator")
    status_line, _, header_block = head.partition(b"\r\n")
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcError(f"bad HTTP status line {status_line[:60]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise WarcError(f"bad HTTP status {parts[1]!r}") from None
    headers = _parse_headers(header_block)
    if headers.get("transfer-encoding", "").lower() == "chunked":
        raise WarcError("chunked transfer encoding not supported")
    return {"status": status, "http_headers": headers, "body": body}


def parse_warc(data: bytes) -> list[dict]:
    """Parse a WARC file (plain or gzip) into records.

    Each record dict: ``warc_type``, ``url``, ``headers`` (WARC
    headers, lower-cased keys), ``payload``; response records add
    ``status``, ``content_type``, ``body``.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data[pos:pos + 5] == b"WARC/":
            raise WarcError(
                f"expected WARC version line at offset {pos}, got "
                f"{data[pos:pos + 20]!r}"
            )
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise WarcError("record headers without terminator")
        header_block = data[pos:head_end]
        _version, _, header_lines = header_block.partition(b"\r\n")
        headers = _parse_headers(header_lines)
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise WarcError("record without Content-Length") from None
        except ValueError:
            raise WarcError("non-integer Content-Length") from None
        body_start = head_end + 4
        payload = data[body_start:body_start + length]
        if len(payload) != length:
            raise WarcError("truncated record payload")
        rec: dict = {
            "warc_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "headers": headers,
            "payload": payload,
        }
        if rec["warc_type"] == "response" and payload[:5] == b"HTTP/":
            http = parse_http_response(payload)
            rec["status"] = http["status"]
            rec["content_type"] = http["http_headers"].get(
                "content-type", "")
            rec["body"] = http["body"]
        records.append(rec)
        pos = body_start + length
    return records


# --------------------------------------------------------------------------
# minimal writer (tests + deterministic synthetic crawls)
# --------------------------------------------------------------------------

def build_record(
    warc_type: str,
    url: str,
    payload: bytes,
    record_id: str = "<urn:uuid:00000000-0000-0000-0000-000000000000>",
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: {record_id}\r\n"
        f"WARC-Date: {date}\r\n"
        + (f"WARC-Target-URI: {url}\r\n" if url else "")
        + f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("latin-1")
    return head + payload + b"\r\n\r\n"


def build_response_payload(
    body: bytes,
    status: int = 200,
    content_type: str = "text/html; charset=utf-8",
) -> bytes:
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found",
              500: "Internal Server Error"}.get(status, "OK")
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("latin-1") + body


def build_warc(records: list[bytes], gzip_per_record: bool = False) -> bytes:
    """Concatenate records; optionally one gzip member per record (the
    crawl-standard layout that keeps records independently seekable)."""
    if not gzip_per_record:
        return b"".join(records)
    out = bytearray()
    for r in records:
        c = zlib.compressobj(6, zlib.DEFLATED, 31)
        out += c.compress(r) + c.flush()
    return bytes(out)


def warc_crawl_payloads(n: int = 16) -> tuple[list, list]:
    """Deterministic synthetic crawl: n blobs x 3 records (warcinfo /
    request / response), alternating plain and member-gzip framing,
    html and json bodies, three HTTP statuses; page paragraphs cross
    the WSDM'10 ">40 words after a linky block" threshold mid-range so
    the main-content rule fires both ways. Returns (blobs, truth) where
    truth rows are computed from the GENERATOR's structure (never the
    kernels)."""
    import hashlib

    words = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa").split()
    blobs, truth = [], []
    for i in range(n):
        k = 5 + 3 * i
        para = " ".join(words[j % 10] + str(j) for j in range(k))
        url = f"http://site{i}.example.com/p{i}"
        if i % 4 == 3:
            ctype = "application/json"
            body = (b'{"page": %d}' % i)
            content = ""
        else:
            ctype = "text/html; charset=utf-8"
            body = (
                '<html><body><nav><a href="/">Home</a> <a href="/a">'
                'About</a> <a href="/c">Contact</a></nav><p>' + para +
                '</p><footer>Copyright 2026 <a href="/t">Terms</a> '
                '<a href="/p">Privacy</a></footer></body></html>'
            ).encode()
            # blocks: nav(3 words, ld=1) | para(k, ld=0) | footer(4,
            # ld=0.5): para is content iff k > 40 (prev ld > 0.555,
            # next has only 4 words)
            content = para if k > 40 else ""
        status = (200, 301, 404)[i % 3]
        info = b"software: anytomd-spark-tests\r\n"
        req = f"GET /p{i} HTTP/1.1\r\nHost: site{i}.example.com\r\n\r\n" \
            .encode()
        recs = [
            build_record("warcinfo", "", info),
            build_record("request", url, req),
            build_record("response", url,
                         build_response_payload(body, status, ctype)),
        ]
        blobs.append((i, build_warc(recs, gzip_per_record=bool(i % 2))))
        truth += [
            (i, 0, "warcinfo", "", -1, "",
             hashlib.md5(info).hexdigest(), ""),
            (i, 1, "request", url, -1, "",
             hashlib.md5(req).hexdigest(), ""),
            (i, 2, "response", url, status, ctype,
             hashlib.md5(body).hexdigest(),
             hashlib.md5(content.encode()).hexdigest()),
        ]
    return blobs, truth
