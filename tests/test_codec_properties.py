"""Hypothesis property tests for the lossless codec family: for ANY
pixel grid / integer signal in range, decode(encode(x)) == x, across
every shape the strategies can reach (1x1, single-row, single-column,
padding-boundary widths, tiny/odd sample counts)."""

import numpy as np
import pytest

import os as _os

# deep-fuzz knob: SPARK_GRAFT_FUZZ_MULT=50 multiplies every
# max_examples for long background fuzz runs (default 1)
_FUZZ_MULT = int(_os.environ.get("SPARK_GRAFT_FUZZ_MULT", "1"))

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from anytomd_spark.kernels import bmp, flac, png, tiff, wav, webp  # noqa: E402

_SETTINGS = dict(
    max_examples=40 * _FUZZ_MULT,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_dims = st.tuples(st.integers(1, 12), st.integers(1, 12))


def _pixels(draw, w, h, ch):
    data = draw(st.binary(min_size=w * h * ch, max_size=w * h * ch))
    return np.frombuffer(data, np.uint8).reshape(h, w, ch)


class TestImageRoundTrips:
    @given(dims=_dims, data=st.data())
    @settings(**_SETTINGS)
    def test_bmp_24(self, dims, data):
        w, h = dims
        px = _pixels(data.draw, w, h, 3)
        out = bmp.decode_bmp(bmp.encode_bmp(w, h, px.tobytes()))
        assert out["pixels"] == px.tobytes()

    @given(dims=_dims, data=st.data(),
           ct=st.sampled_from([0, 2, 6]))
    @settings(**_SETTINGS)
    def test_png_color_types(self, dims, data, ct):
        w, h = dims
        ch = {0: 1, 2: 3, 6: 4}[ct]
        px = _pixels(data.draw, w, h, ch)
        out = png.decode_png(png.encode_png(w, h, px.tobytes(),
                                            color_type=ct))
        assert out["pixels"] == px.tobytes()

    @given(dims=_dims, data=st.data(), sg=st.booleans())
    @settings(**_SETTINGS)
    def test_webp_vp8l(self, dims, data, sg):
        w, h = dims
        px = _pixels(data.draw, w, h, 4)
        out = webp.decode_webp(
            webp.encode_webp(w, h, px.tobytes(), subtract_green=sg))
        assert out["pixels"] == px.tobytes()

    @given(dims=_dims, data=st.data(),
           comp=st.sampled_from([1, 32773]),
           ch=st.sampled_from([1, 3, 4]))
    @settings(**_SETTINGS)
    def test_tiff(self, dims, data, comp, ch):
        w, h = dims
        px = _pixels(data.draw, w, h, ch)
        out = tiff.decode_tiff(tiff.encode_tiff(
            w, h, px.tobytes(), channels=ch, compression=comp))
        assert out["pixels"] == px.tobytes()


class TestAudioRoundTrips:
    @given(n=st.integers(1, 600),
           channels=st.integers(1, 3),
           block=st.sampled_from([192, 256, 576]),
           seed=st.integers(0, 2 ** 31))
    @settings(**_SETTINGS)
    def test_flac_integer_exact(self, n, channels, block, seed):
        rng = np.random.default_rng(seed)
        x = rng.integers(-32768, 32768, (n, channels)).astype(np.int64)
        out = flac.decode_flac(
            flac.encode_flac(x, 8000, bit_depth=16, block_size=block))
        assert (out["samples"] == x).all()

    @given(n=st.integers(1, 500), seed=st.integers(0, 2 ** 31))
    @settings(**_SETTINGS)
    def test_wav_16bit_quantization_formula(self, n, seed):
        # the PCM convention scales by 32767 on encode and 32768 on
        # decode (deliberately asymmetric, so repeated transcoding is
        # NOT a fixpoint); the invariant is the exact formula:
        # decoded == round_f32(f * 32767) / 32768
        rng = np.random.default_rng(seed)
        f = rng.uniform(-1, 1, (n, 1)).astype(np.float32)
        got = wav.decode_wav(wav.encode_wav(f, 8000))["samples"]
        want = np.clip(np.round(f * np.float32(32767.0)),
                       -32768, 32767).astype(np.float32) / np.float32(32768.0)
        assert (got == want).all()
