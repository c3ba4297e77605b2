"""Per-codec decode throughput evidence for BENCH/BASELINE.md.

Two legs:
1. kernel leg — single-core decode wall time per format over
   deterministic generated payloads (the honest per-blob cost a 100-TB
   media column pays inside each Arrow batch);
2. spark leg — extract_features over the union of all formats on
   local[N] (the batch path actually shipped), reporting blobs/s.

Prints one JSON line. Deterministic payloads, no external files.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from anytomd_spark.kernels import (avi, bmp, flac, gif, jpeg, mp4, png,  # noqa: E402
                                   tiff, wav, webp)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _gen(fmt: str, n: int, side: int, rng) -> list[bytes]:
    out = []
    for i in range(n):
        if fmt == "png":
            px = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
            out.append(png.encode_png(side, side, px.tobytes(), color_type=2,
                                      filters=[(i + y) % 5 for y in range(side)]))
        elif fmt == "gif":
            pal = rng.integers(0, 256, 768, dtype=np.uint8)
            idx = rng.integers(0, 256, side * side, dtype=np.uint8)
            out.append(gif.encode_gif(side, side, idx.tobytes(), pal.tobytes()))
        elif fmt == "jpeg":
            b = side // 8
            vals = rng.integers(0, 256, (b, b, 3), dtype=np.uint8)
            px = np.repeat(np.repeat(vals, 8, 0), 8, 1)
            out.append(jpeg.encode_jpeg(side, side, px.tobytes(), mode="RGB"))
        elif fmt == "bmp":
            px = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
            out.append(bmp.encode_bmp(side, side, px.tobytes()))
        elif fmt == "webp":
            px = rng.integers(0, 256, (side, side, 4), dtype=np.uint8)
            out.append(webp.encode_webp(side, side, px.tobytes()))
        elif fmt == "tiff":
            px = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
            out.append(tiff.encode_tiff(side, side, px.tobytes(),
                                        compression=32773))
        elif fmt == "flac":
            t = np.arange(8000)
            sig = np.rint(8000 * np.sin(t / (20 + i))).astype(np.int64)
            out.append(flac.encode_flac(sig.reshape(-1, 1), 16000))
        elif fmt == "wav":
            sig = (rng.standard_normal(8000) * 0.3).astype(np.float32)
            out.append(wav.encode_wav(sig.reshape(-1, 1), 16000,
                                      bit_depth=16))
        elif fmt in ("avi", "mp4"):
            b = side // 8
            frames = []
            for _ in range(4):
                vals = rng.integers(0, 256, (b, b), dtype=np.uint8)
                fpx = np.repeat(np.repeat(vals, 8, 0), 8, 1)
                frames.append(jpeg.encode_jpeg(side, side, fpx.tobytes(),
                                               mode="L"))
            build = (avi.build_avi_mjpeg if fmt == "avi"
                     else mp4.build_mp4_mjpeg)
            out.append(build(side, side, frames))
    return out


_DECODE = {
    "png": png.decode_png,
    "gif": gif.decode_gif,
    "jpeg": jpeg.decode_jpeg,
    "bmp": bmp.decode_bmp,
    "webp": webp.decode_webp,
    "tiff": tiff.decode_tiff,
    "wav": wav.decode_wav,
    "flac": flac.decode_flac,
    "avi": avi.decode_avi_frames,
    "mp4": mp4.decode_mp4_frames,
}

# per-format blob counts sized so each kernel leg runs ~1-5 s
_PLAN = {
    "png": (400, 64),
    "gif": (100, 64),
    "jpeg": (400, 64),
    "bmp": (2000, 64),
    "webp": (40, 32),   # per-pixel Python bit reader: honest slow path
    "tiff": (1000, 64),
    "wav": (1000, 64),
    "flac": (30, 64),
    "avi": (100, 64),
    "mp4": (100, 64),
}


def main() -> int:
    rng = np.random.default_rng(7)
    kernel_leg = {}
    all_payloads = []
    for fmt, (n, side) in _PLAN.items():
        payloads = _gen(fmt, n, side, rng)
        mb = sum(len(p) for p in payloads) / 1e6
        dec = _DECODE[fmt]
        t0 = time.perf_counter()
        for p in payloads:
            dec(p)
        dt = time.perf_counter() - t0
        kernel_leg[fmt] = {
            "blobs": n,
            "payload_mb": round(mb, 3),
            "sec": round(dt, 3),
            "blobs_per_sec": round(n / dt, 1),
            "mb_per_sec": round(mb / dt, 2),
        }
        kind = ("audio" if fmt in ("wav", "flac")
                else "video" if fmt in ("avi", "mp4") else "image")
        all_payloads += [(kind, p) for p in payloads]

    from pyspark.sql import SparkSession

    import pandas as pd
    from anytomd_spark.analysis.multimodal import MEDIA_SCHEMA, extract_features

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("codec-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .getOrCreate()
    )
    rows = [
        (i, kind, bytearray(p),
         {"width": None, "height": None, "sample_rate": None,
          "duration_ms": None})
        for i, (kind, p) in enumerate(all_payloads)
    ]
    pdf = pd.DataFrame(rows, columns=["media_id", "kind", "payload", "meta"])
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA).repartition(CPUS)
    media.persist().count()
    # untimed warmup: python-worker spin-up + Arrow init dominate a cold
    # first pass at local[32]; the steady-state number is the honest one
    extract_features(media).filter("decode_error is null").count()
    t0 = time.perf_counter()
    feats = extract_features(media)
    n_ok = feats.filter("decode_error is null").count()
    dt = time.perf_counter() - t0
    spark_leg = {
        "blobs": len(all_payloads),
        "decoded_ok": n_ok,
        "sec": round(dt, 3),
        "blobs_per_sec": round(len(all_payloads) / dt, 1),
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps({"kernel_leg": kernel_leg, "spark_leg": spark_leg}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
