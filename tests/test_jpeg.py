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


def _quantized_components(
    px: np.ndarray, quality: int, subsample: bool, grayscale: bool
):
    """Color transform + DCT + quantization shared by the baseline and
    progressive writers.  Returns (h, w, comps, ql_z, qc_z, mcux, mcuy)
    where each comp carries ``blocks``: int64 (by, bx, 64) quantized
    zigzag coefficients over the padded MCU grid."""
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
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge")
        by, bx = ph // 8, pw // 8
        blk = p.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
        coef = fdct2(blk)  # numpy matmul broadcasts over the block grid
        zz = coef.reshape(by, bx, 64)[:, :, ZIGZAG]
        c["blocks"] = np.round(zz / c["qz"]).astype(np.int64)
        del c["plane"]
    return h, w, comps, ql_z, qc_z, mcux, mcuy


def _headers(
    h, w, comps, ql_z, qc_z, restart_interval, sof_marker: int
) -> bytearray:
    out = bytearray(b"\xff\xd8")
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(ql_z.tolist()))
    out += _seg(0xDB, bytes([1]) + bytes(qc_z.tolist()))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof += bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(sof_marker, sof)
    for tc, (counts, symbols) in (
        (0x00, DC_L), (0x10, AC_L), (0x01, DC_C), (0x11, AC_C)
    ):
        out += _seg(0xC4, bytes([tc]) + bytes(counts) + symbols)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    return out


def encode_jpeg(
    px: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    grayscale: bool = False,
) -> bytes:
    """Minimal baseline JFIF encoder (test harness for the decoder)."""
    h, w, comps, ql_z, qc_z, mcux, mcuy = _quantized_components(
        px, quality, subsample, grayscale
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
                        qz = c["blocks"][my * c["v"] + by, mx * c["h"] + bx]
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

    out = _headers(h, w, comps, ql_z, qc_z, restart_interval, 0xC0)
    sos = bytes([len(comps)])
    for ci, c in enumerate(comps):
        tid = 0 if ci == 0 else 1
        sos += bytes([c["id"], (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# ---- progressive writer (T.81 §G encoder twin for the decoder tests) ------

# Progressive AC scans emit EOBn symbols (0x10..0xE0) that the Annex-K
# baseline tables do not contain; use a flat canonical table carrying
# every (run<<4)|size symbol with size 0..14 at code length 8
# (Kraft sum 240/256 < 1 — valid, merely suboptimal, which tests don't
# care about).
AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 240, 0, 0, 0, 0, 0, 0, 0, 0],
    bytes(sorted((r << 4) | s for r in range(16) for s in range(15))),
)


def _shift_toward_zero(v: int, al: int) -> int:
    """The §G point transform: magnitude shift, sign preserved."""
    return (v >> al) if v >= 0 else -((-v) >> al)


class _ProgressiveWriter:
    """Serializes one scan script over pre-quantized blocks.  Mirrors the
    published successive-approximation encoder structure (EOB runs,
    buffered correction bits) independently of the decoder."""

    def __init__(self, comps, mcux, mcuy, h, w):
        self.comps = comps
        self.mcux, self.mcuy = mcux, mcuy
        self.h, self.w = h, w
        self.dc_maps = [_encode_map(*DC_L), _encode_map(*DC_C)]
        self.ac_maps = [_encode_map(*AC_PROG), _encode_map(*AC_PROG)]

    def _tid(self, ci: int) -> int:
        return 0 if ci == 0 else 1

    def scan_bytes(self, scan: dict, restart_interval: int = 0) -> bytes:
        """SOS segment + entropy data for one scan dict:
        {"comps": [indices], "ss": int, "se": int, "ah": int, "al": int}."""
        cis = scan["comps"]
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        sos = bytes([len(cis)])
        for ci in cis:
            tid = self._tid(ci)
            sos += bytes([self.comps[ci]["id"], (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        wtr = _BitWriter()
        if ss == 0:
            self._write_dc(wtr, cis, ah, al, restart_interval)
        else:
            self._write_ac(wtr, cis[0], ss, se, ah, al, restart_interval)
        wtr.flush()
        return bytes(_seg(0xDA, sos)) + bytes(wtr.out)

    # -- DC ----------------------------------------------------------------

    def _dc_units(self, cis):
        if len(cis) == 1:
            # non-interleaved: the component's own ceil grid (§A.2.2)
            ci = cis[0]
            c = self.comps[ci]
            hmax = max(x["h"] for x in self.comps)
            vmax = max(x["v"] for x in self.comps)
            cw = -(-self.w * c["h"] // hmax)
            ch = -(-self.h * c["v"] // vmax)
            for by in range(-(-ch // 8)):
                for bx in range(-(-cw // 8)):
                    yield [(ci, by, bx)]
            return
        for my in range(self.mcuy):
            for mx in range(self.mcux):
                unit = []
                for ci in cis:
                    c = self.comps[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            unit.append(
                                (ci, my * c["v"] + by, mx * c["h"] + bx)
                            )
                yield unit

    def _write_dc(self, wtr, cis, ah, al, restart_interval):
        preds = {ci: 0 for ci in cis}
        done = 0
        rst = 0
        units = list(self._dc_units(cis))
        for ui, unit in enumerate(units):
            for ci, by, bx in unit:
                dc = int(self.comps[ci]["blocks"][by, bx, 0])
                if ah == 0:
                    t = dc >> al  # arithmetic shift, matches decode <<
                    diff = t - preds[ci]
                    preds[ci] = t
                    s = _cat(diff)
                    code, ln = self.dc_maps[self._tid(ci)][s]
                    wtr.put(code, ln)
                    if s:
                        v = diff if diff > 0 else diff + (1 << s) - 1
                        wtr.put(v, s)
                else:
                    wtr.put((dc >> al) & 1, 1)
            done += 1
            if (
                restart_interval
                and done % restart_interval == 0
                and ui + 1 < len(units)
            ):
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = {ci: 0 for ci in cis}

    # -- AC ----------------------------------------------------------------

    def _ac_blocks(self, ci):
        c = self.comps[ci]
        hmax = max(x["h"] for x in self.comps)
        vmax = max(x["v"] for x in self.comps)
        cw = -(-self.w * c["h"] // hmax)
        ch = -(-self.h * c["v"] // vmax)
        for by in range(-(-ch // 8)):
            for bx in range(-(-cw // 8)):
                yield c["blocks"][by, bx]

    def _write_ac(self, wtr, ci, ss, se, ah, al, restart_interval):
        ac_m = self.ac_maps[self._tid(ci)]
        state = {"eobrun": 0, "pending": []}

        def flush_eobrun():
            if state["eobrun"]:
                rb = state["eobrun"].bit_length() - 1
                code, ln = ac_m[rb << 4]
                wtr.put(code, ln)
                if rb:
                    wtr.put(state["eobrun"] - (1 << rb), rb)
                for bit in state["pending"]:
                    wtr.put(bit, 1)
                state["pending"] = []
                state["eobrun"] = 0

        blocks = list(self._ac_blocks(ci))
        done = 0
        rst = 0
        for bi, qz in enumerate(blocks):
            if ah == 0:
                self._ac_first_block(wtr, ac_m, qz, ss, se, al, state,
                                     flush_eobrun)
            else:
                self._ac_refine_block(wtr, ac_m, qz, ss, se, al, state,
                                      flush_eobrun)
            done += 1
            if (
                restart_interval
                and done % restart_interval == 0
                and bi + 1 < len(blocks)
            ):
                flush_eobrun()
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
        flush_eobrun()

    def _ac_first_block(self, wtr, ac_m, qz, ss, se, al, state, flush_eobrun):
        t = [_shift_toward_zero(int(qz[k]), al) for k in range(ss, se + 1)]
        if not any(t):
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                flush_eobrun()
            return
        flush_eobrun()
        r = 0
        for tv in t:
            if tv == 0:
                r += 1
                continue
            while r > 15:
                code, ln = ac_m[0xF0]
                wtr.put(code, ln)
                r -= 16
            s = _cat(tv)
            code, ln = ac_m[(r << 4) | s]
            wtr.put(code, ln)
            vb = tv if tv > 0 else tv + (1 << s) - 1
            wtr.put(vb, s)
            r = 0
        if r:
            state["eobrun"] += 1
            if state["eobrun"] == 0x7FFF:
                flush_eobrun()

    def _ac_refine_block(self, wtr, ac_m, qz, ss, se, al, state, flush_eobrun):
        vals = [int(qz[k]) for k in range(ss, se + 1)]
        absv = [abs(v) >> al for v in vals]
        eob = -1  # index of the last NEWLY-significant coefficient
        for i, a in enumerate(absv):
            if a == 1:
                eob = i
        r = 0
        br: list[int] = []
        for i, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            # emit pending ZRLs at the FIRST nonzero (history or new) so
            # the wire order of buffered correction bits matches the
            # decoder's advance order; ZRLs past the last new coefficient
            # fold into the EOB run instead
            while r > 15 and i <= eob:
                flush_eobrun()
                code, ln = ac_m[0xF0]
                wtr.put(code, ln)
                r -= 16
                for bit in br:
                    wtr.put(bit, 1)
                br = []
            if a > 1:  # history coefficient → buffered correction bit
                br.append(a & 1)
                continue
            # newly significant (a == 1)
            flush_eobrun()
            code, ln = ac_m[(r << 4) | 1]
            wtr.put(code, ln)
            wtr.put(1 if vals[i] > 0 else 0, 1)
            for bit in br:
                wtr.put(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            state["eobrun"] += 1
            state["pending"].extend(br)
            if state["eobrun"] == 0x7FFF:
                flush_eobrun()


def encode_jpeg_progressive(
    px: np.ndarray,
    scans: list[dict] | None = None,
    quality: int = 90,
    subsample: bool = False,
    grayscale: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Progressive JFIF encoder over an explicit scan script (defaults to
    a libjpeg-style spectral-selection + successive-approximation plan)."""
    h, w, comps, ql_z, qc_z, mcux, mcuy = _quantized_components(
        px, quality, subsample, grayscale
    )
    n = len(comps)
    if scans is None:
        scans = default_progressive_scans(n)
    out = _headers(h, w, comps, ql_z, qc_z, restart_interval, 0xC2)
    # override the Annex-K AC tables with the EOBn-capable flat table
    for tc in (0x10, 0x11):
        out += _seg(0xC4, bytes([tc]) + bytes(AC_PROG[0]) + AC_PROG[1])
    pw = _ProgressiveWriter(comps, mcux, mcuy, h, w)
    for scan in scans:
        out += pw.scan_bytes(scan, restart_interval)
    out += b"\xff\xd9"
    return bytes(out)


def default_progressive_scans(ncomp: int) -> list[dict]:
    """The classic libjpeg-ish script: approximated DC, split AC bands at
    Al=2, then two AC refinement sweeps and a DC refinement."""
    all_c = list(range(ncomp))
    scans = [{"comps": all_c, "ss": 0, "se": 0, "ah": 0, "al": 1}]
    for ci in all_c:
        scans += [
            {"comps": [ci], "ss": 1, "se": 5, "ah": 0, "al": 2},
            {"comps": [ci], "ss": 6, "se": 63, "ah": 0, "al": 2},
        ]
    for al in (1, 0):
        for ci in all_c:
            scans.append({"comps": [ci], "ss": 1, "se": 63, "ah": al + 1,
                          "al": al})
    scans.append({"comps": all_c, "ss": 0, "se": 0, "ah": 1, "al": 0})
    return scans


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
    # flip SOF0 → SOF3 (lossless) — still honestly unsupported
    i = blob.index(bytes([0xFF, 0xC0]))
    blob[i + 1] = 0xC3
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x00not a jpeg")


# ---- progressive (SOF2) ----------------------------------------------------
#
# The strongest oracle available without a codec library: progressive
# scans are a LOSSLESS re-serialization of the same quantized
# coefficients, so the progressive decode must equal the baseline decode
# of the same image BIT-FOR-BIT — any EOB-run / refinement / band
# mistake on either side breaks exact equality over random content.


def _assert_progressive_matches_baseline(px, scans=None, **kw):
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg

    restart = kw.pop("restart_interval", 0)
    base = decode_jpeg(encode_jpeg(px, **kw))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            px, scans=scans, restart_interval=restart, **kw
        )
    )
    assert np.array_equal(base, prog)


def _noise(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_progressive_default_script_444():
    _assert_progressive_matches_baseline(_smooth(24, 17), quality=90)
    _assert_progressive_matches_baseline(_noise(16, 16, 1), quality=85)


def test_progressive_default_script_420_and_grayscale():
    _assert_progressive_matches_baseline(
        _smooth(23, 21), quality=80, subsample=True
    )
    _assert_progressive_matches_baseline(
        _noise(20, 19, 2), quality=90, subsample=True
    )
    _assert_progressive_matches_baseline(
        _smooth(15, 22), quality=90, grayscale=True
    )


def test_progressive_spectral_selection_only():
    scans = [
        {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 0},
        {"comps": [0], "ss": 1, "se": 63, "ah": 0, "al": 0},
        {"comps": [1], "ss": 1, "se": 9, "ah": 0, "al": 0},
        {"comps": [1], "ss": 10, "se": 63, "ah": 0, "al": 0},
        {"comps": [2], "ss": 1, "se": 63, "ah": 0, "al": 0},
    ]
    _assert_progressive_matches_baseline(_noise(17, 25, 3), scans=scans)


def test_progressive_noninterleaved_dc_scans():
    # per-component DC scans (ns=1) walk the component's own ceil grid
    scans = []
    for ci in range(3):
        scans.append({"comps": [ci], "ss": 0, "se": 0, "ah": 0, "al": 1})
    for ci in range(3):
        scans.append({"comps": [ci], "ss": 1, "se": 63, "ah": 0, "al": 1})
    for ci in range(3):
        scans.append({"comps": [ci], "ss": 1, "se": 63, "ah": 1, "al": 0})
    for ci in range(3):
        scans.append({"comps": [ci], "ss": 0, "se": 0, "ah": 1, "al": 0})
    _assert_progressive_matches_baseline(_noise(21, 18, 4), scans=scans)
    _assert_progressive_matches_baseline(
        _smooth(19, 27), scans=scans, subsample=True
    )


def test_progressive_with_restart_intervals():
    _assert_progressive_matches_baseline(
        _noise(24, 24, 5), restart_interval=3
    )
    _assert_progressive_matches_baseline(
        _smooth(33, 18), restart_interval=2, subsample=True
    )


def test_progressive_deep_successive_approximation():
    # start at Al=3 and refine down in three sweeps — long EOB runs and
    # many correction bits in the early low-precision passes
    scans = [{"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 3}]
    for ci in range(3):
        scans.append({"comps": [ci], "ss": 1, "se": 63, "ah": 0, "al": 3})
    for al in (2, 1, 0):
        for ci in range(3):
            scans.append(
                {"comps": [ci], "ss": 1, "se": 63, "ah": al + 1, "al": al}
            )
    for al in (2, 1, 0):
        scans.append(
            {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": al + 1, "al": al}
        )
    _assert_progressive_matches_baseline(_noise(16, 23, 6), scans=scans)
    _assert_progressive_matches_baseline(_smooth(26, 26), scans=scans)


def test_progressive_truncation_raises_valueerror():
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg

    blob = encode_jpeg_progressive(_smooth(16, 16))
    for cut in [len(blob) // 3, len(blob) // 2, len(blob) - 10]:
        with pytest.raises(ValueError):
            decode_jpeg(blob[:cut])


def test_progressive_media_dispatch_and_determinism():
    from puma_matcher_spark.llmdata.jpeg import decode_jpeg
    from puma_matcher_spark.llmdata.multimodal import decode_image

    blob = encode_jpeg_progressive(_smooth(16, 16))
    a, b = decode_jpeg(blob), decode_image(blob)
    assert np.array_equal(a, b)


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
