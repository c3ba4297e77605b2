"""SVG feature-extraction tests: hand-written documents, dimension
fallback rules, risk flags, writer round-trip, garbage fuzz."""

import numpy as np
import pytest

from anytomd_spark.kernels.svg import (
    SvgError,
    build_svg,
    looks_like_svg,
    svg_features,
)


class TestFeatures:
    def test_basic_shapes_and_size(self):
        out = svg_features(build_svg(120, 80, ["rect", "circle", "circle"]))
        assert (out["width"], out["height"]) == (120, 80)
        assert out["has_size"]
        assert out["n_elements"] == 4  # root + 3 shapes
        assert out["counts"]["circle"] == 2
        assert not out["has_script"]

    def test_viewbox_fallback(self):
        svg = b'<svg viewBox="0 0 300 150"><path d="M0 0"/></svg>'
        out = svg_features(svg)
        assert (out["width"], out["height"]) == (300, 150)
        svg = b'<svg viewBox="0,0,40,20"/>'
        assert svg_features(svg)["width"] == 40

    def test_px_and_unit_handling(self):
        assert svg_features(b'<svg width="10px" height="5px"/>')["width"] == 10
        # mm units fall back to viewBox, else unsized
        out = svg_features(b'<svg width="10mm" height="5mm"/>')
        assert not out["has_size"] and out["width"] == 0.0

    def test_text_extraction_nested(self):
        svg = (b'<svg width="1" height="1"><text>Hello '
               b"<tspan>nested</tspan> world</text>"
               b"<rect/><desc>meta</desc></svg>")
        out = svg_features(svg)
        assert "Hello" in out["text"] and "nested" in out["text"]
        assert "meta" in out["text"]

    def test_script_and_foreignobject_flagged(self):
        assert svg_features(
            b'<svg width="1" height="1"><script>x()</script></svg>'
        )["has_script"]
        assert svg_features(
            b'<svg width="1" height="1"><foreignObject/></svg>'
        )["has_script"]

    def test_external_refs_counted_data_uris_not(self):
        svg = (b'<svg xmlns:xlink="http://www.w3.org/1999/xlink" width="1" '
               b'height="1">'
               b'<image xlink:href="https://x.test/a.png"/>'
               b'<image xlink:href="data:image/png;base64,AA=="/>'
               b'<use href="#local"/></svg>')
        assert svg_features(svg)["n_external_refs"] == 1

    def test_namespaced_tags_localized(self):
        svg = (b'<s:svg xmlns:s="http://www.w3.org/2000/svg" width="3" '
               b'height="4"><s:rect/></s:svg>')
        out = svg_features(svg)
        assert out["counts"]["rect"] == 1 and out["width"] == 3


class TestValidation:
    def test_non_svg_root(self):
        with pytest.raises(SvgError, match="not <svg>"):
            svg_features(b"<html><body/></html>")

    def test_malformed_xml(self):
        with pytest.raises(SvgError, match="malformed"):
            svg_features(b'<svg width="1"><rect></svg>')

    def test_empty(self):
        with pytest.raises(SvgError):
            svg_features(b"")

    def test_byte_budget(self):
        with pytest.raises(SvgError, match="budget"):
            svg_features(b"<svg/>" + b" " * 100, max_bytes=10)


class TestSniff:
    def test_magic(self):
        assert looks_like_svg(b'<svg width="1"/>')
        assert looks_like_svg(b'\xef\xbb\xbf  <?xml version="1.0"?><svg/>')
        assert not looks_like_svg(b"<html></html>")
        assert not looks_like_svg(b"\x89PNG\r\n\x1a\n")


class TestFuzz:
    def test_garbage_never_panics(self):
        rng = np.random.default_rng(41)
        for n in (0, 3, 40, 300):
            blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            try:
                svg_features(b"<svg>" + blob + b"</svg>")
            except (SvgError, ValueError):
                pass

    def test_truncation_ladder(self):
        data = build_svg(9, 9, ["rect", "circle"], ["hi"])
        for cut in range(len(data)):
            try:
                svg_features(data[:cut])
            except (SvgError, ValueError):
                pass
