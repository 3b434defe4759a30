#!/usr/bin/env python
"""Media-plane throughput stress: per-codec decode rate through the
REAL distributed path (extract_media_features_decoded's mapInPandas),
plus the kernel-only rate, on local[N].

Evidence for the 100 TB design claim: media decoding is map-side work
that scales with cores — no shuffle touches a payload byte; only the
64-hex hashes move.  Run: python scripts/media_stress.py  (~2-3 min)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

from puma_matcher_spark.llmdata.multimodal import (
    decode_image,
    extract_media_features_decoded,
)
from puma_matcher_spark.session import get_spark


def _payloads(n_per_format: int, dim: int = 128):
    from test_jpeg import encode_jpeg, encode_jpeg_progressive
    from test_multimodal import _bmp_bytes, _gif_bytes, _png_bytes_generic, _ppm_bytes
    from test_tiff import encode_tiff
    from test_vp8l import encode_vp8l

    rng = np.random.default_rng(0)
    out = {}
    pal = rng.integers(0, 256, size=(64, 3), dtype=np.uint8)
    for i in range(n_per_format):
        # smooth-ish content (realistic for photos, kinder to PNG filters)
        base = rng.integers(0, 64, size=(dim, dim, 3), dtype=np.int16)
        px = np.clip(
            np.cumsum(np.cumsum(base - 31, axis=0), axis=1) % 256, 0, 255
        ).astype(np.uint8)
        idx = rng.integers(0, 64, size=(dim, dim), dtype=np.uint8)
        out.setdefault("ppm", []).append(_ppm_bytes(px))
        out.setdefault("bmp", []).append(_bmp_bytes(px))
        out.setdefault("png", []).append(_png_bytes_generic(px))
        out.setdefault("gif", []).append(_gif_bytes(idx, pal))
        out.setdefault("jpeg", []).append(encode_jpeg(px, quality=85))
        out.setdefault("jpeg_prog", []).append(encode_jpeg_progressive(px, quality=85))
        out.setdefault("webp_vp8l", []).append(
            encode_vp8l(pal[idx], cache_bits=6, backrefs=True)
        )
        out.setdefault("tiff_lzw", []).append(encode_tiff(px, compression=5))
    return out


def main() -> None:
    spark = get_spark("media-stress")
    spark.sparkContext.setLogLevel("ERROR")
    n = int(os.environ.get("MEDIA_STRESS_N", "64"))
    payloads = _payloads(n)
    print(f"{n} images per format at 128x128")
    for fmt, blobs in payloads.items():
        mb = sum(len(b) for b in blobs) / 1e6
        # kernel-only rate (single core)
        t0 = time.monotonic()
        for b in blobs[: max(n // 4, 1)]:
            decode_image(b)
        kernel = (max(n // 4, 1)) / (time.monotonic() - t0)
        # distributed rate through mapInPandas
        media = spark.createDataFrame(
            [(i, bytearray(b)) for i, b in enumerate(blobs)],
            "media_id LONG, payload BINARY",
        ).repartition(32)
        t0 = time.monotonic()
        got = extract_media_features_decoded(media).count()
        dt = time.monotonic() - t0
        print(
            f"  {fmt:10s} {mb:6.2f} MB  kernel {kernel:7.1f} img/s/core  "
            f"distributed {got / dt:7.1f} img/s ({got} rows in {dt:.2f}s)"
        )


if __name__ == "__main__":
    main()
