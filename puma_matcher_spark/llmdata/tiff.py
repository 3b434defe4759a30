"""Baseline TIFF 6.0 decoder in pure numpy + stdlib.

Completes the still-image matrix for archival/scanned corpora: both
byte orders (II/MM), strip-organised images with Compression 1 (none),
5 (TIFF-variant LZW with early code-width change), 8/32946 (Deflate via
stdlib zlib), and 32773 (PackBits), Predictor 2 (horizontal
differencing), PhotometricInterpretation 0/1 (grayscale, either
polarity), 2 (RGB, extra samples dropped) and 3 (palette via the
16-bit ColorMap), 8- and 16-bit samples (16-bit rescaled to 8 like the
PNG/netpbm paths).

Out of scope (honest ``NotImplementedError``): tiled organisation,
JPEG-in-TIFF, CCITT fax codings, sub-byte depths, planar configuration
2 — the profiles baseline readers are not required to handle.
"""

from __future__ import annotations

import zlib

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_entries(payload: bytes, bo: str, ifd_off: int) -> dict[int, list[int]]:
    if ifd_off + 2 > len(payload):
        raise ValueError("truncated TIFF IFD")
    n = int.from_bytes(payload[ifd_off : ifd_off + 2], bo)
    tags: dict[int, list[int]] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        if e + 12 > len(payload):
            raise ValueError("truncated TIFF IFD entry")
        tag = int.from_bytes(payload[e : e + 2], bo)
        typ = int.from_bytes(payload[e + 2 : e + 4], bo)
        count = int.from_bytes(payload[e + 4 : e + 8], bo)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            data = payload[e + 8 : e + 8 + size]
        else:
            off = int.from_bytes(payload[e + 8 : e + 12], bo)
            data = payload[off : off + size]
            if len(data) < size:
                raise ValueError("truncated TIFF tag data")
        step = _TYPE_SIZES.get(typ, 1)
        if typ in (3, 4, 1, 6, 8, 9):
            tags[tag] = [
                int.from_bytes(data[j : j + step], bo, signed=typ in (6, 8, 9))
                for j in range(0, size, step)
            ]
        else:
            tags[tag] = [int.from_bytes(data, bo)] if size else []
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            if i >= len(data):
                raise ValueError("truncated PackBits stream")
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits stream ended early")
    return bytes(out[:expected])


def _tiff_lzw(data: bytes, expected: int) -> bytes:
    """TIFF-variant LZW (§13): MSB-first bit packing, 9-bit start,
    ClearCode 256 / EOI 257, and the EARLY code-width change (the width
    grows when the next code WOULD reach the limit — one code earlier
    than GIF)."""
    out = bytearray()
    n = len(data)
    acc = 0
    nacc = 0
    p = 0

    def read_code(width: int) -> int:
        nonlocal acc, nacc, p
        while nacc < width:
            if p >= n:
                raise ValueError("truncated TIFF LZW stream")
            # trim consumed high bits so acc stays bounded
            acc = ((acc & ((1 << nacc) - 1)) << 8) | data[p]
            p += 1
            nacc += 8
        v = (acc >> (nacc - width)) & ((1 << width) - 1)
        nacc -= width
        return v

    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = read_code(width)
        if code == 256:  # Clear
            reset()
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW code")
        out += entry
        prev = entry
        # early change: bump width when the NEXT added code would not fit
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("TIFF LZW stream ended early")
    return bytes(out[:expected])


def decode_tiff(payload: bytes) -> np.ndarray:
    """TIFF bytes → (height, width, 3) uint8 RGB (first IFD only)."""
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload")
    ifd_off = int.from_bytes(payload[4:8], bo)
    tags = _read_entries(payload, bo, ifd_off)

    def one(tag, default=None):
        v = tags.get(tag)
        if v:
            return v[0]
        if default is None:
            raise ValueError(f"TIFF missing required tag {tag}")
        return default

    w = one(256)
    h = one(257)
    compression = one(259, 1)
    photometric = one(262, 1)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    rows_per_strip = one(278, h)
    offsets = tags.get(273)
    counts = tags.get(279)
    if one(284, 1) != 1:
        raise NotImplementedError("TIFF planar configuration 2 not supported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF not supported")
    if compression in (6, 7):
        raise NotImplementedError("JPEG-in-TIFF not supported")
    if compression in (2, 3, 4, 32771):
        raise NotImplementedError("CCITT/fax TIFF codings not supported")
    if compression not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(f"TIFF compression {compression} not supported")
    depth = bits[0]
    if any(b != depth for b in bits) or depth not in (8, 16):
        raise NotImplementedError(f"TIFF bits-per-sample {bits} not supported")
    if photometric == 3 and depth != 8:
        # TIFF 6.0 limits palette images to 4/8-bit; rescaling 16-bit
        # samples before the ColorMap lookup would silently garble
        # indices, so refuse instead
        raise NotImplementedError("palette TIFF requires 8-bit indices")
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/counts")
    nbytes = depth // 8
    row_bytes = w * spp * nbytes

    raw = bytearray()
    rows_left = h
    for off, cnt in zip(offsets, counts):
        strip = payload[off : off + cnt]
        if len(strip) < cnt:
            raise ValueError("truncated TIFF strip")
        strip_rows = min(rows_per_strip, rows_left)
        expected = strip_rows * row_bytes
        if compression == 1:
            if len(strip) < expected:
                raise ValueError("short uncompressed TIFF strip")
            raw += strip[:expected]
        elif compression in (8, 32946):
            raw += zlib.decompress(strip)[:expected]
        elif compression == 32773:
            raw += _unpackbits(strip, expected)
        else:  # 5 — LZW
            raw += _tiff_lzw(strip, expected)
        rows_left -= strip_rows
    if len(raw) < h * row_bytes:
        raise ValueError("TIFF pixel data ended early")

    if depth == 16:
        # sample endianness follows the file byte order
        dt = "<u2" if bo == "little" else ">u2"
        wide = np.frombuffer(bytes(raw), dtype=dt, count=h * w * spp)
        samples = wide.reshape(h, w, spp).astype(np.int64)
        if one(317, 1) == 2:  # horizontal differencing on SAMPLES
            samples = np.cumsum(samples, axis=1) % 65536
        arr = np.round(samples.astype(np.float64) * 255.0 / 65535.0).astype(
            np.uint8
        )
    else:
        arr = np.frombuffer(
            bytes(raw), dtype=np.uint8, count=h * w * spp
        ).reshape(h, w, spp)
        if one(317, 1) == 2:
            arr = (np.cumsum(arr.astype(np.int64), axis=1) % 256).astype(
                np.uint8
            )

    if photometric == 3:  # palette
        cmap = tags.get(320)
        if not cmap:
            raise ValueError("palette TIFF without ColorMap")
        ncol = len(cmap) // 3
        pal = (
            np.array(cmap, dtype=np.int64).reshape(3, ncol).T >> 8
        ).astype(np.uint8)
        idx = arr[:, :, 0]
        if int(idx.max(initial=0)) >= ncol:
            raise ValueError("TIFF palette index out of range")
        return pal[idx].copy()
    if photometric == 2:  # RGB (+ ignored extra samples)
        if spp < 3:
            raise ValueError("RGB TIFF with fewer than 3 samples")
        return arr[:, :, :3].copy()
    if photometric in (0, 1):  # grayscale
        g = arr[:, :, 0]
        if photometric == 0:  # white-is-zero
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    raise NotImplementedError(f"TIFF photometric {photometric} not supported")
