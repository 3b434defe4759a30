"""Baseline-JPEG decoder (llmdata/jpeg.py) tests.

No codec library exists in this container, so the tests carry a minimal
baseline ENCODER (Annex K tables, canonical Huffman, 4:4:4 / 4:2:0,
restart markers) and round-trip through the decoder with lossy-bounded
tolerances.  Spec constants are additionally spot-checked independently
(DCT orthonormality, zigzag permutation, Annex K values) so a shared
transcription error cannot silently cancel out.
"""

from __future__ import annotations

import numpy as np
import pytest

from puma_matcher_spark.llmdata.jpeg import ZIGZAG, HuffmanTable, fdct2, idct2

# ---- Annex K tables (ITU T.81) --------------------------------------------

QL = np.array(  # K.1 luminance quantization (natural order)
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QC = np.array(  # K.2 chrominance quantization
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], bytes(range(12)))
DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], bytes(range(12)))
# Annex K AC tables, K.3.3.2 (luminance) / K.3.3.4 (chrominance):
# (code-length counts, symbol sequence)
AC_L = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    bytes.fromhex(
        "01020300041105122131410613516107227114328191a108"
        "2342b1c11552d1f02433627282090a161718191a25262728"
        "292a3435363738393a434445464748494a53545556575859"
        "5a636465666768696a737475767778797a83848586878889"
        "8a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6"
        "b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9dae1e2"
        "e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9fa"
    ),
)
AC_C = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    bytes.fromhex(
        "000102031104052131061241510761711322328108144291"
        "a1b1c109233352f0156272d10a162434e125f11718191a26"
        "2728292a35363738393a434445464748494a535455565758"
        "595a636465666768696a737475767778797a828384858687"
        "88898a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4"
        "b5b6b7b8b9bac2c3c4c5c6c7c8c9cad2d3d4d5d6d7d8d9da"
        "e2e3e4e5e6e7e8e9eaf2f3f4f5f6f7f8f9fa"
    ),
)


def _encode_map(counts, symbols):
    """symbol → (code, length) via the same canonical construction the
    decoder uses (shared rule, independent direction)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.put(1, 1)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255).astype(np.int32)


def _seg(marker: int, data: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(data) + 2).to_bytes(2, "big") + data


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Minimal baseline JFIF encoder (test harness for the decoder)."""
    h, w = px.shape[:2]
    r, g, b = [px[:, :, i].astype(np.float64) for i in range(3)]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    ql = _quality_scale(QL, quality)
    qc = _quality_scale(QC, quality)
    ql_z = ql.reshape(-1)[ZIGZAG]
    qc_z = qc.reshape(-1)[ZIGZAG]

    if grayscale:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y, "qz": ql_z}]
    elif subsample:  # 4:2:0

        def down(p):
            hh = (h + 1) // 2 * 2
            ww = (w + 1) // 2 * 2
            p2 = np.pad(p, ((0, hh - h), (0, ww - w)), mode="edge")
            return (
                p2.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
            )

        comps = [
            {"id": 1, "h": 2, "v": 2, "tq": 0, "plane": y, "qz": ql_z},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": down(cb), "qz": qc_z},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": down(cr), "qz": qc_z},
        ]
    else:  # 4:4:4
        comps = [
            {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": y, "qz": ql_z},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb, "qz": qc_z},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr, "qz": qc_z},
        ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        ph = mcuy * c["v"] * 8
        pw = mcux * c["h"] * 8
        p = c["plane"]
        c["plane"] = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )

    dc_maps = [_encode_map(*DC_L), _encode_map(*DC_C)]
    ac_maps = [_encode_map(*AC_L), _encode_map(*AC_C)]

    wtr = _BitWriter()
    preds = [0] * len(comps)
    mcu_done = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                tid = 0 if ci == 0 else 1
                dc_m, ac_m = dc_maps[tid], ac_maps[tid]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        blk = c["plane"][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        coef = fdct2(blk).reshape(-1)[ZIGZAG]
                        qz = np.round(coef / c["qz"]).astype(np.int64)
                        diff = int(qz[0]) - preds[ci]
                        preds[ci] = int(qz[0])
                        s = _cat(diff)
                        code, ln = dc_m[s]
                        wtr.put(code, ln)
                        if s:
                            v = diff if diff > 0 else diff + (1 << s) - 1
                            wtr.put(v, s)
                        run = 0
                        for k in range(1, 64):
                            v = int(qz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_m[0xF0]
                                wtr.put(code, ln)
                                run -= 16
                            s = _cat(v)
                            code, ln = ac_m[(run << 4) | s]
                            wtr.put(code, ln)
                            vb = v if v > 0 else v + (1 << s) - 1
                            wtr.put(vb, s)
                            run = 0
                        if run:
                            code, ln = ac_m[0x00]
                            wtr.put(code, ln)
            mcu_done += 1
            if (
                restart_interval
                and mcu_done % restart_interval == 0
                and mcu_done < mcux * mcuy
            ):
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
    wtr.flush()

    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql_z.tolist()))
    out += _seg(0xDB, bytes([1]) + bytes(qc_z.tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC0, sof)
    for tc, (counts, symbols) in (
        (0x00, DC_L), (0x10, AC_L), (0x01, DC_C), (0x11, AC_C)
    ):
        out += _seg(0xC4, bytes([tc]) + bytes(counts) + symbols)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for ci, c in enumerate(comps):
        tid = 0 if ci == 0 else 1
        sos += bytes([c["id"], (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---- spec-constant spot checks (independent of the round trip) ------------


def test_dct_basis_is_orthonormal():
    from puma_matcher_spark.llmdata.jpeg import _D

    assert np.allclose(_D @ _D.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(3)
    blk = rng.uniform(-128, 127, (8, 8))
    assert np.allclose(idct2(fdct2(blk)), blk, atol=1e-9)


def test_zigzag_is_spec_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    assert ZIGZAG[:8].tolist() == [0, 1, 8, 16, 9, 2, 3, 10]
    assert ZIGZAG[-3:].tolist() == [47, 55, 62, 63][-3:]


def test_annex_k_spot_values():
    assert QL[0, 0] == 16 and QL[7, 7] == 99 and QL[4, 5] == 109
    assert QC[0, 0] == 17 and QC[2, 2] == 56
    assert sum(DC_L[0]) == 12 and sum(AC_L[0]) == 162 and sum(AC_C[0]) == 162


def test_huffman_tables_are_canonical_and_prefix_free():
    for counts, symbols in (DC_L, DC_C, AC_L, AC_C):
        t = HuffmanTable(counts, symbols)
        assert len(t.lookup) == sum(counts)
        # prefix-freeness: no code is a prefix of a longer one
        codes = sorted(
            (ln, code) for (ln, code) in t.lookup
        )
        for i, (ln1, c1) in enumerate(codes):
            for ln2, c2 in codes[i + 1 :]:
                assert not (ln2 > ln1 and (c2 >> (ln2 - ln1)) == c1)


# ---- round trips ----------------------------------------------------------


def _smooth(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 / max(w - 1, 1)).astype(np.uint8)
    g = (yy * 255 / max(h - 1, 1)).astype(np.uint8)
    b = ((xx + yy) * 127 / max(h + w - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=2)


def test_jpeg_roundtrip_uniform_is_near_exact():
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg

    px = np.full((16, 24, 3), [120, 64, 200], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(px, quality=90))
    assert out.shape == px.shape
    assert np.max(np.abs(out.astype(int) - px.astype(int))) <= 2


def test_jpeg_roundtrip_smooth_gradient_444():
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg

    px = _smooth(40, 56)  # non-multiple-of-8 height/width padding path
    out = decode_jpeg(encode_jpeg(px, quality=90))
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.mean() <= 3.0 and err.max() <= 40


def test_jpeg_roundtrip_420_subsampled():
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg

    px = _smooth(33, 45)
    out = decode_jpeg(encode_jpeg(px, quality=90, subsample=True))
    err = np.abs(out.astype(int) - px.astype(int))
    assert out.shape == px.shape
    assert err.mean() <= 5.0 and err.max() <= 64


def test_jpeg_roundtrip_grayscale():
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg

    px = np.repeat(_smooth(24, 24)[:, :, :1], 3, axis=2)
    out = decode_jpeg(encode_jpeg(px, quality=90, grayscale=True))
    err = np.abs(out.astype(int) - px.astype(int))
    assert err.mean() <= 3.0


def test_jpeg_restart_intervals():
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg

    px = _smooth(32, 64)
    plain = decode_jpeg(encode_jpeg(px, quality=90))
    rst = decode_jpeg(encode_jpeg(px, quality=90, restart_interval=2))
    assert np.array_equal(plain, rst)


def test_jpeg_determinism_and_media_dispatch():
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg
    from puma_matcher_spark.llmdata.multimodal import decode_image

    px = _smooth(16, 16)
    blob = encode_jpeg(px, quality=90)
    a, b = decode_jpeg(blob), decode_jpeg(blob)
    assert np.array_equal(a, b)
    # decode_image routes JPEG magic to the real decoder now
    assert np.array_equal(decode_image(blob), a)


def test_jpeg_unsupported_profiles_stay_honest():
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg

    px = _smooth(8, 8)
    blob = bytearray(encode_jpeg(px))
    # flip SOF0 → SOF2 (progressive)
    i = blob.index(bytes([0xFF, 0xC0]))
    blob[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00not a jpeg")


def test_jpeg_truncation_raises_valueerror_not_indexerror():
    """Malformed-input contract: every truncation point raises ValueError
    (the classifiable 'bad payload' signal), never IndexError."""
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg

    blob = encode_jpeg(_smooth(16, 16), quality=90)
    # cut inside headers, at segment boundaries, and mid-entropy-stream
    # (cutting only the trailing EOI is benign: the scan already ended)
    for cut in [2, 3, 4, 10, len(blob) // 2, len(blob) - 20]:
        with pytest.raises(ValueError):
            decode_jpeg(blob[:cut])
    # payload ending on a lone 0xFF mid-entropy-stream
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2] + b"\xff")
