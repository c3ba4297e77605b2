"""GIF decoder tests. The LZW bit-packing vector is hand-assembled from
the spec (LSB-first packing, 3-bit codes), not produced by the sibling
writer; round-trips then cover the writer."""

import struct

import numpy as np
import pytest

from anytomd_spark.kernels.gif import (
    GifError,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
)

PAL4 = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # 4 RGB entries


def _gif_bytes(w, h, lzw_payload, min_code=2, gct=PAL4, ipacked=0):
    gct_bits = (len(gct) // 3).bit_length() - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), 0, 0)
    out += gct
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    out.append(min_code)
    out.append(len(lzw_payload))
    out += lzw_payload
    out.append(0)
    out += b"\x3B"
    return bytes(out)


class TestHandVectors:
    def test_lzw_bit_packing_3bit_codes(self):
        # codes [CLEAR=4, 1, 2, END=5] at 3 bits, LSB-first:
        # acc = 4 | 1<<3 | 2<<6 | 5<<9 = 2700 -> bytes [140, 10]
        img = decode_gif(_gif_bytes(2, 1, bytes([140, 10])))
        assert (img["width"], img["height"], img["n_frames"]) == (2, 1, 1)
        assert img["pixels"] == bytes([0, 255, 0, 0, 0, 255])  # pal[1],pal[2]

    def test_extension_blocks_skipped(self):
        # graphic-control extension before the image descriptor
        base = bytearray(_gif_bytes(2, 1, bytes([140, 10])))
        ext = b"\x21\xF9\x04\x00\x00\x00\x00\x00"
        data = bytes(base[:13 + 12]) + ext + bytes(base[13 + 12:])
        assert decode_gif(data)["pixels"] == bytes([0, 255, 0, 0, 0, 255])


class TestErrors:
    def test_bad_signature(self):
        with pytest.raises(GifError, match="signature"):
            decode_gif(b"NOTGIF00" + b"\0" * 20)

    def test_truncated_color_table(self):
        data = b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0) + b"\0\0"
        with pytest.raises(GifError, match="color table"):
            decode_gif(data)

    def test_no_frames(self):
        data = b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0, 0, 0) + b"\x3B"
        with pytest.raises(GifError, match="no image"):
            decode_gif(data)

    def test_lzw_output_capped(self):
        # lies about dimensions: 1x1 but the stream emits 2 pixels
        with pytest.raises(GifError, match="exceeds|shorter"):
            decode_gif(_gif_bytes(1, 1, bytes([140, 10])))


class TestRoundTrip:
    @pytest.mark.parametrize("n_colors", [4, 16, 256])
    def test_palette_sizes(self, n_colors):
        rng = np.random.default_rng(n_colors)
        pal = rng.integers(0, 256, size=3 * n_colors, dtype=np.uint8)
        idx = rng.integers(0, n_colors, size=23 * 17, dtype=np.uint8)
        data = encode_gif(23, 17, idx.tobytes(), pal.tobytes())
        img = decode_gif(data)
        assert (img["width"], img["height"]) == (23, 17)
        expected = pal.reshape(n_colors, 3)[idx].tobytes()
        assert img["pixels"] == expected

    def test_interlaced_round_trip(self):
        rng = np.random.default_rng(7)
        pal = rng.integers(0, 256, size=12, dtype=np.uint8)
        idx = rng.integers(0, 4, size=9 * 11, dtype=np.uint8)
        data = encode_gif(9, 11, idx.tobytes(), pal.tobytes(),
                          interlace=True)
        img = decode_gif(data)
        assert img["pixels"] == pal.reshape(4, 3)[idx].tobytes()

    def test_long_stream_clear_codes(self):
        # > 254 pixels at 256 colors forces the periodic CLEAR path
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, size=768, dtype=np.uint8)
        idx = rng.integers(0, 256, size=40 * 30, dtype=np.uint8)
        img = decode_gif(encode_gif(40, 30, idx.tobytes(), pal.tobytes()))
        assert img["pixels"] == pal.reshape(256, 3)[idx].tobytes()


class TestAnimation:
    def test_multi_frame_round_trip_with_delays(self):
        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 4, size=12, dtype=np.uint8).tobytes()
                  for _ in range(3)]
        data = encode_gif_animation(4, 3, frames, PAL4, [100, 250, 70])
        anim = decode_gif_frames(data)
        assert (anim["width"], anim["height"]) == (4, 3)
        assert anim["duration_ms"] == 420
        assert [f["ts_ms"] for f in anim["frames"]] == [0, 100, 350]
        assert [f["delay_ms"] for f in anim["frames"]] == [100, 250, 70]
        pal = np.frombuffer(PAL4, np.uint8).reshape(4, 3)
        for got, idx in zip(anim["frames"], frames):
            assert got["pixels"] == pal[np.frombuffer(idx, np.uint8)].tobytes()

    def test_gce_delay_is_centisecond_quantized(self):
        # 125 ms stores as 12 cs -> decodes as 120 ms (format precision)
        idx = bytes(12)
        data = encode_gif_animation(4, 3, [idx, idx], PAL4, [125, 100])
        anim = decode_gif_frames(data)
        assert anim["frames"][1]["ts_ms"] == 120

    def test_decode_gif_still_counts_frames(self):
        idx = bytes(12)
        data = encode_gif_animation(4, 3, [idx] * 4, PAL4, [50] * 4)
        img = decode_gif(data)
        assert img["n_frames"] == 4

    def test_sub_rectangle_frame_rejected(self):
        data = bytearray(encode_gif_animation(4, 3, [bytes(12)], PAL4, [100]))
        # image descriptor starts after header(13) + GCT(12) + GCE(8)
        i = bytes(data).index(b"\x2c", 13)
        struct.pack_into("<HH", data, i + 1, 1, 0)  # left=1
        with pytest.raises(GifError, match="sub-rectangle"):
            decode_gif_frames(bytes(data))

    def test_frames_delays_mismatch(self):
        with pytest.raises(GifError):
            encode_gif_animation(4, 3, [bytes(12)], PAL4, [100, 200])

    def test_single_frame_plain_gif_decodes_with_zero_delay(self):
        idx = bytes(12)
        anim = decode_gif_frames(encode_gif(4, 3, idx, PAL4))
        assert anim["duration_ms"] == 0
        assert len(anim["frames"]) == 1


class TestVideoSampling:
    def test_generator_truth_matches_decoder(self):
        import hashlib

        from anytomd_spark.analysis.multimodal import gif_video_payloads

        for r in gif_video_payloads(6):
            anim = decode_gif_frames(r["payload"])
            assert anim["duration_ms"] == r["duration_ms"]
            starts = [f["ts_ms"] for f in anim["frames"]]
            for s in r["samples"]:
                j = max(0, int(np.searchsorted(
                    np.array(starts), s["ts_ms"], side="right")) - 1)
                px = anim["frames"][j]["pixels"]
                assert len(px) == s["n_bytes"]
                assert hashlib.sha256(px).hexdigest() == s["sha256"]
