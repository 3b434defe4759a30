"""Baseline JPEG (ITU T.81 sequential DCT, JFIF) decoder in pure
numpy — closes the last stubbed codec in the media plane (S7).

The reference's picture pipeline shells out to Python-with-PIL per row
(PictureHashAnalyser2.scala:48-125); this container has no PIL/opencv,
so rounds 1-3 kept JPEG behind an honest ``NotImplementedError``.  The
baseline profile is, however, implementable from the public spec with
nothing beyond numpy:

* marker parse  — DQT / DHT / SOF0 / SOS / DRI, APPn/COM skipped;
* entropy layer — canonical Huffman decode over the byte-unstuffed
  scan, per-component DC prediction, AC run-length with ZRL/EOB,
  restart-interval resets;
* transform     — dequantize, inverse zigzag, separable float IDCT
  (the 8×8 DCT-II basis as one matrix product per side);
* color         — per-SOF sampling factors (4:4:4 / 4:2:2 / 4:2:0),
  nearest-neighbour chroma upsample, JFIF YCbCr→RGB.

Supported: 8-bit baseline sequential (SOF0), 1 or 3 components, any
sampling factors, optional restart markers.  Progressive (SOF2),
arithmetic coding, and 12-bit precision raise ``NotImplementedError``.

Decoding is deterministic (pure float ops in fixed order), so media
fingerprints built on it are reproducible across executors — the same
contract as the PNG/netpbm/BMP decoders in ``multimodal.py``.
"""

from __future__ import annotations

import numpy as np

# zigzag order: index i of the scan → (row, col) in the 8×8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: D[u, x] = c(u)/2 · cos((2x+1)uπ/16)
_D = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5)
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def idct2(block: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one 8×8 coefficient block."""
    return _D.T @ block @ _D


def fdct2(block: np.ndarray) -> np.ndarray:
    """2-D forward DCT (the encoder/test-side inverse of :func:`idct2`)."""
    return _D @ block @ _D.T


class HuffmanTable:
    """Canonical Huffman table from a DHT segment (bits + values)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; restart markers are handled by the caller via resync."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated JPEG entropy stream")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # EOI or stray marker: pad with 1-bits per spec behaviour
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def resync(self) -> None:
        """Drop partial bits and skip the restart marker itself."""
        self.bitbuf = 0
        self.nbits = 0
        # pos currently sits AT the 0xFF of the restart marker
        self.pos += 2

    def decode(self, table: HuffmanTable) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(value: int, nbits: int) -> int:
    """T.81 F.2.2.1 sign extension of an nbits magnitude value."""
    if nbits == 0:
        return 0
    if value < (1 << (nbits - 1)):
        return value - (1 << nbits) + 1
    return value


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline JPEG bytes to (height, width, 3) uint8 RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], HuffmanTable] = {}  # (class, id)
    frame = None
    restart_interval = 0
    n = len(payload)
    while pos < n:
        if pos + 1 >= n:
            raise ValueError("truncated JPEG stream (no EOI)")
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = int.from_bytes(payload[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated JPEG segment")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    q = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    q = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                qtables[tid] = q
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = seg[p + 17 : p + 17 + nsym]
                htables[(tc, th)] = HuffmanTable(counts, symbols)
                p += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0}: only baseline sequential "
                "(SOF0) is supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cid, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan_tables[cid] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(
                payload,
                pos + seglen,
                frame,
                qtables,
                htables,
                scan_tables,
                restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG contained no scan")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    qtables: dict,
    htables: dict,
    scan_tables: dict,
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_done = 0
    my = mx = 0
    while my < mcuy:
        try:
            for ci, c in enumerate(comps):
                dc_t = htables[(0, scan_tables[c["id"]][0])]
                ac_t = htables[(1, scan_tables[c["id"]][1])]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int32)
                        s = reader.decode(dc_t)
                        diff = _extend(reader.bits(s), s)
                        preds[ci] += diff
                        coef[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_t)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(reader.bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coef * q
                        px = idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_done += 1
            mx += 1
            if mx == mcux:
                mx = 0
                my += 1
            if (
                restart_interval
                and mcu_done % restart_interval == 0
                and my < mcuy
            ):
                reader.resync()
                preds = [0] * len(comps)
        except _RestartMarker:
            # tolerate encoder-side early restarts: resync and continue
            reader.resync()
            preds = [0] * len(comps)
    out_planes = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        # nearest-neighbour upsample to full resolution, crop to (h, w)
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
