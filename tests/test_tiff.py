"""Baseline-TIFF decoder (llmdata/tiff.py) tests.

The tests carry a minimal TIFF ENCODER (IFD writer + PackBits + the
TIFF-variant LZW with early code-width change, written from the TIFF
6.0 spec independently of the decoder) and round-trip every supported
axis: both byte orders, each compression, the horizontal-differencing
predictor, multi-strip layout, gray both polarities, palette, RGBA
extra samples, and 16-bit depth.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest

from puma_matcher_spark.llmdata.tiff import decode_tiff


def _packbits(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch until next run of >= 3
        start = i
        while (
            i < n
            and i - start < 128
            and not (i + 2 < n and data[i] == data[i + 1] == data[i + 2])
        ):
            i += 1
        out += bytes([i - start - 1]) + data[start:i]
    return bytes(out)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF §13 LZW writer: MSB-first, Clear/EOI, EARLY width change
    (switch after ASSIGNING code 2^w - 1), reset at table limit."""
    out = bytearray()
    acc = 0
    nacc = 0

    def put(code: int, width: int):
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    put(256, width)  # initial Clear
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) - 1 and width < 12:
            width += 1
        prefix = bytes([byte])
        if nxt == 4094:  # reset before the 12-bit table fills
            put(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
    if prefix:
        put(table[prefix], width)
    put(257, width)  # EOI
    if nacc:
        out.append((acc << (8 - nacc)) & 0xFF)
    return bytes(out)


def _entry(bo, tag, typ, values):
    sizes = {1: 1, 3: 2, 4: 4}
    size = sizes[typ] * len(values)
    inline = b"".join(v.to_bytes(sizes[typ], bo) for v in values)
    return tag, typ, len(values), inline, size


def encode_tiff(
    px: np.ndarray,
    bo: str = "little",
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    photometric: int = 2,
    palette: np.ndarray | None = None,
    indices: np.ndarray | None = None,
    extra_alpha: bool = False,
    depth: int = 8,
) -> bytes:
    """Minimal strip-organised TIFF writer (test harness)."""
    if photometric == 3:
        h, w = indices.shape
        spp = 1
        samples = indices[:, :, None].astype(np.int64)
    elif photometric in (0, 1):
        h, w = px.shape[:2]
        spp = 1
        g = px[:, :, 0].astype(np.int64)
        samples = (255 - g if photometric == 0 else g)[:, :, None]
    else:
        h, w = px.shape[:2]
        spp = 4 if extra_alpha else 3
        samples = px.astype(np.int64)
        if extra_alpha:
            samples = np.concatenate(
                [samples, np.full((h, w, 1), 255, dtype=np.int64)], axis=2
            )
    if depth == 16:
        samples = samples * 257
    if predictor == 2:
        diff = samples.copy()
        diff[:, 1:, :] = (samples[:, 1:, :] - samples[:, :-1, :]) % (
            65536 if depth == 16 else 256
        )
        samples = diff
    if depth == 16:
        dt = "<u2" if bo == "little" else ">u2"
        rows = samples.astype(dt).tobytes()
        row_bytes = w * spp * 2
    else:
        rows = samples.astype(np.uint8).tobytes()
        row_bytes = w * spp
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        nrows = min(rps, h - y0)
        chunk = rows[y0 * row_bytes : (y0 + nrows) * row_bytes]
        if compression == 1:
            strips.append(chunk)
        elif compression in (8, 32946):
            strips.append(zlib.compress(chunk))
        elif compression == 32773:
            strips.append(_packbits(chunk))
        elif compression == 5:
            strips.append(_tiff_lzw_encode(chunk))
        else:
            raise ValueError(compression)

    entries = [
        _entry(bo, 256, 4, [w]),
        _entry(bo, 257, 4, [h]),
        _entry(bo, 258, 3, [depth] * spp),
        _entry(bo, 259, 3, [compression]),
        _entry(bo, 262, 3, [photometric]),
        _entry(bo, 277, 3, [spp]),
        _entry(bo, 278, 4, [rps]),
        _entry(bo, 279, 4, [len(s) for s in strips]),
        _entry(bo, 284, 3, [1]),
    ]
    if predictor == 2:
        entries.append(_entry(bo, 317, 3, [2]))
    if extra_alpha:
        entries.append(_entry(bo, 338, 3, [2]))  # unassociated alpha
    cmap_vals = None
    if photometric == 3:
        ncol = len(palette)
        cmap_vals = (
            [int(v) << 8 for v in palette[:, 0]]
            + [int(v) << 8 for v in palette[:, 1]]
            + [int(v) << 8 for v in palette[:, 2]]
        )
        entries.append(_entry(bo, 320, 3, cmap_vals))
    entries.append(_entry(bo, 273, 4, [0] * len(strips)))  # patched below

    entries.sort(key=lambda e: e[0])
    header = (b"II*\x00" if bo == "little" else b"MM\x00*") + (8).to_bytes(4, bo)
    ifd_off = 8
    n = len(entries)
    # layout: IFD, then out-of-line tag data, then strips
    data_off = ifd_off + 2 + 12 * n + 4
    blobs = []
    fixed = []
    for tag, typ, count, inline, size in entries:
        if size <= 4:
            fixed.append((tag, typ, count, inline.ljust(4, b"\x00"), None))
        else:
            fixed.append((tag, typ, count, data_off.to_bytes(4, bo), inline))
            blobs.append(inline)
            data_off += size
    strip_offsets = []
    for s in strips:
        strip_offsets.append(data_off)
        data_off += len(s)
    out = bytearray(header)
    out += n.to_bytes(2, bo)
    for tag, typ, count, val4, _blob in fixed:
        if tag == 273:
            if len(strips) == 1:
                val4 = strip_offsets[0].to_bytes(4, bo)
            else:
                # the placeholder blob for 273 is replaced in `blobs`
                pass
        out += tag.to_bytes(2, bo) + typ.to_bytes(2, bo) + count.to_bytes(4, bo) + val4
    out += (0).to_bytes(4, bo)  # next IFD
    bi = 0
    for tag, typ, count, val4, blob in fixed:
        if blob is None:
            continue
        if tag == 273:
            blob = b"".join(o.to_bytes(4, bo) for o in strip_offsets)
        out += blob
        bi += 1
    for s in strips:
        out += s
    return bytes(out)


def _pix(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("bo", ["little", "big"])
@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
def test_tiff_rgb_compressions_both_orders(bo, comp):
    px = _pix(13, 9, comp)
    assert np.array_equal(decode_tiff(encode_tiff(px, bo=bo, compression=comp)), px)


@pytest.mark.parametrize("comp", [1, 5, 8, 32773])
def test_tiff_predictor_and_strips(comp):
    px = _pix(17, 11, 50 + comp)
    blob = encode_tiff(px, compression=comp, predictor=2, rows_per_strip=5)
    assert np.array_equal(decode_tiff(blob), px)


def test_tiff_lzw_width_growth_and_reset():
    # 64x64 RGB random → >4094 table entries → Clear/reset exercised
    px = _pix(64, 64, 3)
    assert np.array_equal(decode_tiff(encode_tiff(px, compression=5)), px)


def test_tiff_grayscale_both_polarities():
    px = _pix(8, 6, 4)
    g = np.repeat(px[:, :, :1], 3, axis=2)
    assert np.array_equal(decode_tiff(encode_tiff(px, photometric=1)), g)
    assert np.array_equal(decode_tiff(encode_tiff(px, photometric=0)), g)


def test_tiff_palette_and_extra_samples():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(7, 9), dtype=np.uint8)
    blob = encode_tiff(None, photometric=3, palette=pal, indices=idx)
    assert np.array_equal(decode_tiff(blob), pal[idx])
    # RGBA: alpha dropped
    px = _pix(6, 5, 6)
    assert np.array_equal(decode_tiff(encode_tiff(px, extra_alpha=True)), px)


def test_tiff_16bit_rescales():
    px = _pix(9, 7, 7)
    for bo in ("little", "big"):
        assert np.array_equal(decode_tiff(encode_tiff(px, bo=bo, depth=16)), px)
    # 16-bit with predictor
    blob = encode_tiff(px, depth=16, predictor=2, compression=8)
    assert np.array_equal(decode_tiff(blob), px)


def test_tiff_errors_and_honest_boundaries():
    px = _pix(5, 5, 8)
    blob = encode_tiff(px)
    with pytest.raises(ValueError):
        decode_tiff(b"not a tiff")
    with pytest.raises(ValueError):
        decode_tiff(blob[:40])  # truncated IFD / strips
    fax = bytearray(encode_tiff(px))
    # flip the compression SHORT (tag 259) to CCITT group 3
    i = fax.index((259).to_bytes(2, "little"))
    fax[i + 8] = 3
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(fax))


def test_tiff_media_dispatch(spark):
    from puma_matcher_spark.llmdata.multimodal import (
        blockhash_256,
        decode_image,
        extract_media_features_decoded,
    )

    px = _pix(32, 32, 9)
    blob = encode_tiff(px, compression=5, predictor=2)
    assert np.array_equal(decode_image(blob), px)
    media = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id LONG, payload BINARY"
    )
    got = extract_media_features_decoded(media).collect()[0]
    assert got["perceptual_hash"] == blockhash_256(px)


def test_tiff_16bit_palette_refused():
    rng = np.random.default_rng(10)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, size=(4, 4), dtype=np.uint8)
    blob = bytearray(encode_tiff(None, photometric=3, palette=pal, indices=idx))
    # flip BitsPerSample (tag 258, single SHORT) to 16
    i = blob.index((258).to_bytes(2, "little"))
    blob[i + 8] = 16
    with pytest.raises(NotImplementedError, match="palette"):
        decode_tiff(bytes(blob))
