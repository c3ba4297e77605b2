"""WARC reader tests — hand-framed records per ISO 28500, then the
writer round-trips and the gzip-member layout."""

import zlib

import pytest

from anytomd_spark.kernels.warc import (
    WarcError,
    build_record,
    build_response_payload,
    build_warc,
    parse_http_response,
    parse_warc,
)


def _hand_record(wtype: str, payload: bytes, url: str = "") -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        + (f"WARC-Target-URI: {url}\r\n" if url else "")
        + f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


class TestParsing:
    def test_two_records_plain(self):
        data = (_hand_record("warcinfo", b"software: test\r\n")
                + _hand_record("response",
                               b"HTTP/1.1 200 OK\r\nContent-Type: "
                               b"text/plain\r\n\r\nhello body",
                               url="http://x.example/a"))
        recs = parse_warc(data)
        assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
        assert recs[1]["url"] == "http://x.example/a"
        assert recs[1]["status"] == 200
        assert recs[1]["content_type"] == "text/plain"
        assert recs[1]["body"] == b"hello body"

    def test_payload_may_contain_crlf_crlf(self):
        # Content-Length framing, not delimiter scanning
        payload = b"AAAA\r\n\r\nBBBB"
        recs = parse_warc(_hand_record("resource", payload))
        assert recs[0]["payload"] == payload

    def test_gzip_member_per_record(self):
        r1 = _hand_record("warcinfo", b"a: 1\r\n")
        r2 = _hand_record("resource", b"xyz")
        blob = build_warc([r1, r2], gzip_per_record=True)
        assert blob[:2] == b"\x1f\x8b"
        recs = parse_warc(blob)
        assert [r["warc_type"] for r in recs] == ["warcinfo", "resource"]
        assert recs[1]["payload"] == b"xyz"

    def test_http_status_variants(self):
        for status in (200, 301, 404, 500):
            p = build_response_payload(b"b", status=status)
            assert parse_http_response(p)["status"] == status


class TestErrors:
    def test_garbage_rejected(self):
        with pytest.raises(WarcError, match="version line"):
            parse_warc(b"NOT A WARC AT ALL\r\n\r\n")

    def test_truncated_payload(self):
        rec = _hand_record("resource", b"full payload")
        with pytest.raises(WarcError, match="truncated"):
            parse_warc(rec[:-12])

    def test_missing_content_length(self):
        data = b"WARC/1.0\r\nWARC-Type: resource\r\n\r\nbody\r\n\r\n"
        with pytest.raises(WarcError, match="Content-Length"):
            parse_warc(data)

    def test_chunked_rejected(self):
        p = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
             b"5\r\nhello\r\n0\r\n\r\n")
        with pytest.raises(WarcError, match="chunked"):
            parse_http_response(p)

    def test_corrupt_gzip(self):
        with pytest.raises(WarcError, match="gzip"):
            parse_warc(b"\x1f\x8b" + b"\x00" * 30)


class TestRoundTrip:
    def test_writer_reader(self):
        body = b"<html><body><p>words here</p></body></html>"
        recs = [
            build_record("warcinfo", "", b"software: t\r\n"),
            build_record("request", "http://s.example/p",
                         b"GET /p HTTP/1.1\r\nHost: s\r\n\r\n"),
            build_record("response", "http://s.example/p",
                         build_response_payload(body)),
        ]
        for gz in (False, True):
            parsed = parse_warc(build_warc(recs, gzip_per_record=gz))
            assert [r["warc_type"] for r in parsed] == [
                "warcinfo", "request", "response"]
            assert parsed[2]["body"] == body
