"""WebP-lossless (VP8L) decoder tests.

No codec library exists in this container, so the tests carry a minimal
VP8L ENCODER — written from RFC 9649 independently of the decoder —
plus spec spot-checks (distance-map geometry, prefix-value mapping,
cache hash) so a shared transcription error cannot silently cancel out.
The encoder can emit every bitstream feature the decoder supports:
full and simple prefix codes, 17/18 zero-run code lengths, LZ77
backrefs (plain and 2-D distance codes), the color cache, the meta
prefix image, and all four transforms.
"""

from __future__ import annotations

import heapq

import numpy as np
import pytest

from puma_matcher_spark.llmdata.vp8l import (
    KCODE_LENGTH_ORDER,
    KDISTANCE_MAP,
    decode_webp,
)


class _WBits:
    """LSB-first bit writer (mirror of the decoder's reader)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits):
            self.acc |= ((value >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def put_code(self, code: int, nbits: int) -> None:
        """Prefix codes are read MSB-of-code-first — emit reversed."""
        for i in range(nbits - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc)
            self.acc = self.n = 0
        return bytes(self.out)


def _huffman_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code lengths from symbol frequencies (complete code by
    construction); single-symbol alphabets get the degenerate 0-cost
    code the spec's simple form expresses."""
    items = [(f, i, (sym,)) for i, (sym, f) in enumerate(sorted(freqs.items()))]
    if not items:
        return {}
    if len(items) == 1:
        return {items[0][2][0]: 1}
    heapq.heapify(items)
    depths = {sym: 0 for sym in freqs}
    tick = len(items)
    while len(items) > 1:
        f1, _, s1 = heapq.heappop(items)
        f2, _, s2 = heapq.heappop(items)
        for sym in s1 + s2:
            depths[sym] += 1
        heapq.heappush(items, (f1 + f2, tick, s1 + s2))
        tick += 1
    return depths


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Smallest-symbol-first canonical codes (the decoder's rule)."""
    out = {}
    code = 0
    for length in range(1, max(lengths.values(), default=0) + 1):
        for sym in sorted(s for s, ln in lengths.items() if ln == length):
            out[sym] = (code, length)
            code += 1
        code <<= 1
    return out


def _write_prefix_code(w: _WBits, lengths: dict[int, int], alphabet: int):
    """Emit one prefix code.  1-2 symbol codes use the simple form;
    larger codes use the code-length-coded form with 17/18 runs."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        w.put(1, 1)  # simple
        w.put(len(syms) - 1, 1)
        first = syms[0]
        if first > 1:
            w.put(1, 1)
            w.put(first, 8)
        else:
            w.put(0, 1)
            w.put(first, 1)
        if len(syms) == 2:
            w.put(syms[1], 8)
        return
    w.put(0, 1)  # full form
    # per-symbol lengths with zero runs compressed via 17/18
    seq: list[tuple[int, int]] = []  # (cl_symbol, extra_bits_value)
    i = 0
    while i < alphabet:
        ln = lengths.get(i, 0)
        if ln == 0:
            run = 0
            while i + run < alphabet and lengths.get(i + run, 0) == 0:
                run += 1
            while run >= 11:
                chunk = min(run, 11 + 127)
                seq.append((18, chunk - 11))
                run -= chunk
                i += chunk
            while run >= 3:
                chunk = min(run, 3 + 7)
                seq.append((17, chunk - 3))
                run -= chunk
                i += chunk
            for _ in range(run):
                seq.append((0, 0))
                i += 1
        else:
            seq.append((ln, 0))
            i += 1
    # the explicit "max symbol" field bounds the number of code-length
    # TOKENS the decoder reads — trim trailing zero-run tokens and
    # declare the token count, exercising that decoder path whenever a
    # tail exists
    trimmed = False
    if seq and seq[-1][0] in (0, 17, 18):
        kept = list(seq)
        while kept and kept[-1][0] in (0, 17, 18):
            kept.pop()
        if len(kept) >= 2:
            seq = kept
            trimmed = True
    cl_freq: dict[int, int] = {}
    for s, _ in seq:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq)
    if len(cl_lengths) == 1:
        # degenerate CL code needs an explicit bit; give the symbol
        # length 1 plus a never-used partner to keep the code readable
        only = next(iter(cl_lengths))
        partner = 0 if only != 0 else 1
        cl_lengths = {only: 1, partner: 1}
    if any(ln > 7 for ln in cl_lengths.values()):
        raise AssertionError("test encoder: CL code too deep")
    # emit CL lengths in spec order, covering every used symbol
    used = set(cl_lengths)
    num = len(KCODE_LENGTH_ORDER)
    while num > 4 and cl_lengths.get(KCODE_LENGTH_ORDER[num - 1], 0) == 0:
        num -= 1
    covered = {KCODE_LENGTH_ORDER[i] for i in range(num)}
    assert used <= covered, (used, covered)
    w.put(num - 4, 4)
    for i in range(num):
        w.put(cl_lengths.get(KCODE_LENGTH_ORDER[i], 0), 3)
    if trimmed:
        w.put(1, 1)
        value = len(seq) - 2
        nbitpairs = max(1, (max(value.bit_length(), 1) + 1) // 2)
        w.put(nbitpairs - 1, 3)
        w.put(value, nbitpairs * 2)
    else:
        w.put(0, 1)  # token budget = full alphabet
    cl_canon = _canonical(cl_lengths)
    for s, extra in seq:
        code, ln = cl_canon[s]
        w.put_code(code, ln)
        if s == 17:
            w.put(extra, 3)
        elif s == 18:
            w.put(extra, 7)
        elif s == 16:
            w.put(extra, 2)


def _len_dist_symbol(value: int) -> tuple[int, int, int]:
    """Inverse of the decoder's prefix-value mapping: value → (symbol,
    extra_bits_value, extra_bits_count)."""
    if value <= 4:
        return value - 1, 0, 0
    x = value - 1
    eb = x.bit_length() - 2
    hi = x >> eb
    sym = 2 * eb + hi
    return sym, x - (hi << eb), eb


_HASH = 0x1E35A7BD


def _argb_int(a, r, g, b) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _encode_entropy_image(
    w: _WBits,
    pixels: list[int],
    width: int,
    height: int,
    is_argb: bool,
    cache_bits: int = 0,
    backrefs: bool = False,
    use_2d: bool = False,
    meta_bits: int | None = None,
):
    """Two-pass: tokenize (literal / cache / backref), then emit codes
    and tokens.  With meta_bits, two code groups split at the horizontal
    middle tile boundary."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    # --- tokenize -------------------------------------------------------
    tokens = []  # (group, kind, payload)
    n = len(pixels)

    def group_of(pos: int) -> int:
        if meta_bits is None:
            return 0
        x = pos % width
        return 1 if (x >> meta_bits) >= max((width >> meta_bits) // 2, 1) else 0

    pos = 0
    while pos < n:
        g = group_of(pos)
        px = pixels[pos]
        if backrefs and pos >= 1:
            run = 0
            while pos + run < n and pixels[pos + run] == pixels[pos - 1] and run < 100:
                run += 1
            if run >= 3:
                tokens.append((g, "ref", (run, 1)))
                for i in range(run):
                    if cache_size:
                        cache[(_HASH * pixels[pos + i] & 0xFFFFFFFF) >> (32 - cache_bits)] = pixels[pos + i]
                pos += run
                continue
        if cache_size:
            slot = (_HASH * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == px:
                tokens.append((g, "cache", slot))
                pos += 1
                continue
            cache[slot] = px
        tokens.append((g, "lit", px))
        pos += 1

    # --- frequencies ----------------------------------------------------
    n_groups = 2 if meta_bits is not None else 1
    freqs = [
        {"g": {}, "r": {}, "b": {}, "a": {}, "d": {}} for _ in range(n_groups)
    ]

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    for g, kind, payload in tokens:
        f = freqs[g]
        if kind == "lit":
            px = payload
            bump(f["g"], (px >> 8) & 0xFF)
            bump(f["r"], (px >> 16) & 0xFF)
            bump(f["b"], px & 0xFF)
            bump(f["a"], (px >> 24) & 0xFF)
        elif kind == "cache":
            bump(f["g"], 256 + 24 + payload)
        else:
            length, dist = payload
            sym, _, _ = _len_dist_symbol(length)
            bump(f["g"], 256 + sym)
            dcode = 2 if use_2d else dist + 120  # 2-D code 2 is (1, 0)
            dsym, _, _ = _len_dist_symbol(dcode)
            bump(f["d"], dsym)

    # --- header ---------------------------------------------------------
    if cache_bits:
        w.put(1, 1)
        w.put(cache_bits, 4)
    else:
        w.put(0, 1)
    if is_argb:
        if meta_bits is not None:
            w.put(1, 1)
            w.put(meta_bits - 2, 3)
            mw = -(-width // (1 << meta_bits))
            mh = -(-height // (1 << meta_bits))
            meta_px = [
                _argb_int(255, 0, group_of((y << meta_bits) * width + (x << meta_bits)), 0)
                for y in range(mh)
                for x in range(mw)
            ]
            _encode_entropy_image(w, meta_px, mw, mh, False)
        else:
            w.put(0, 1)

    green_alpha = 256 + 24 + cache_size
    canons = []
    for f in freqs:
        chans = []
        for key, alpha_size in (
            ("g", green_alpha), ("r", 256), ("b", 256), ("a", 256), ("d", 40)
        ):
            fr = f[key] or {0: 1}  # unused channel: 1-symbol code
            lengths = _huffman_lengths(fr)
            _write_prefix_code(w, lengths, alpha_size)
            chans.append(_canonical(lengths) if len(lengths) > 1 else
                         {next(iter(lengths)): (0, 0)})
        canons.append(chans)

    # --- tokens ---------------------------------------------------------
    def emit(canon, sym):
        code, ln = canon[sym]
        if ln:
            w.put_code(code, ln)

    for g, kind, payload in tokens:
        cg, cr, cb, ca, cd = canons[g]
        if kind == "lit":
            px = payload
            emit(cg, (px >> 8) & 0xFF)
            emit(cr, (px >> 16) & 0xFF)
            emit(cb, px & 0xFF)
            emit(ca, (px >> 24) & 0xFF)
        elif kind == "cache":
            emit(cg, 256 + 24 + payload)
        else:
            length, dist = payload
            sym, extra, ebits = _len_dist_symbol(length)
            emit(cg, 256 + sym)
            if ebits:
                w.put(extra, ebits)
            dcode = 2 if use_2d else dist + 120
            dsym, dextra, debits = _len_dist_symbol(dcode)
            emit(cd, dsym)
            if debits:
                w.put(dextra, debits)


def _predict_ref(mode: int, L, T, TL, TR) -> tuple:
    """RFC 9649 §4.2.2 predictor modes, transcribed here INDEPENDENTLY
    of puma_matcher_spark.llmdata.vp8l._predict (channel order A,R,G,B).
    Spec pseudocode, abbreviated:

      Average2(a, b) = (a + b) / 2          -- integer
      Select: pX = L+T-TL per channel; pL = Σ|pX-L|; pT = Σ|pX-T|;
              if (pL < pT) return L; else return T;
      ClampAddSubtractFull(L, T, TL) = clamp(L + T - TL) per channel
      ClampAddSubtractHalf: a = Average2(L, T) per channel;
              clamp(a + (a - TL) / 2)       -- C division (trunc)
    """

    def av(x, y):
        return (int(x) + int(y)) >> 1

    def clamp(v):
        return 0 if v < 0 else (255 if v > 255 else v)

    table = {
        0: lambda c: (255, 0, 0, 0)[c],
        1: lambda c: L[c],
        2: lambda c: T[c],
        3: lambda c: TR[c],
        4: lambda c: TL[c],
        5: lambda c: av(av(L[c], TR[c]), T[c]),
        6: lambda c: av(L[c], TL[c]),
        7: lambda c: av(L[c], T[c]),
        8: lambda c: av(TL[c], T[c]),
        9: lambda c: av(T[c], TR[c]),
        10: lambda c: av(av(L[c], TL[c]), av(T[c], TR[c])),
        12: lambda c: clamp(int(L[c]) + int(T[c]) - int(TL[c])),
    }
    if mode in table:
        return tuple(table[mode](c) for c in range(4))
    if mode == 11:
        pX = [int(L[c]) + int(T[c]) - int(TL[c]) for c in range(4)]
        pL = sum(abs(pX[c] - int(L[c])) for c in range(4))
        pT = sum(abs(pX[c] - int(T[c])) for c in range(4))
        return tuple(L) if pL < pT else tuple(T)
    if mode == 13:
        out = []
        for c in range(4):
            ave = av(L[c], T[c])
            d = ave - int(TL[c])
            out.append(clamp(ave + int(d / 2)))  # trunc toward zero
        return tuple(out)
    raise ValueError(mode)


def encode_vp8l(
    px: np.ndarray,
    cache_bits: int = 0,
    backrefs: bool = False,
    use_2d: bool = False,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    meta_bits: int | None = None,
    color_transform: tuple[int, int, int] | None = None,
    palette: bool = False,
) -> bytes:
    """RGB (h, w, 3) → RIFF/WEBP/VP8L bytes (alpha = 255)."""
    h, wd = px.shape[:2]
    w = _WBits()
    w.put(0x2F, 8)
    w.put(wd - 1, 14)
    w.put(h - 1, 14)
    w.put(0, 1)  # alpha hint
    w.put(0, 3)  # version

    arr = px.astype(np.int32)
    a = np.full((h, wd), 255, dtype=np.int32)
    r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]

    if predictor_mode is not None:
        # one block covering the whole image: size_bits 9 (value 7)
        size_bits = 9
        w.put(1, 1)
        w.put(0, 2)  # PREDICTOR
        w.put(size_bits - 2, 3)
        sub_px = [_argb_int(255, 0, predictor_mode, 0)]
        _encode_entropy_image(w, sub_px, 1, 1, False)
        # forward-transform: residual = pixel - predicted (mod 256),
        # mirroring the decoder's border rules.  The predictor itself is
        # _predict_ref — an INDEPENDENT transcription of RFC 9649
        # §4.2.2, so a spec misreading in the decoder cannot cancel out.
        res_a = a.copy()
        res_r = r.copy()
        res_g = g.copy()
        res_b = b.copy()
        for y in range(h):
            for x in range(wd):
                if x == 0 and y == 0:
                    pred = (255, 0, 0, 0)
                elif y == 0:
                    pred = (a[0, x - 1], r[0, x - 1], g[0, x - 1], b[0, x - 1])
                elif x == 0:
                    pred = (a[y - 1, 0], r[y - 1, 0], g[y - 1, 0], b[y - 1, 0])
                else:
                    L = (a[y, x - 1], r[y, x - 1], g[y, x - 1], b[y, x - 1])
                    T = (a[y - 1, x], r[y - 1, x], g[y - 1, x], b[y - 1, x])
                    TL = (
                        a[y - 1, x - 1], r[y - 1, x - 1],
                        g[y - 1, x - 1], b[y - 1, x - 1],
                    )
                    TR = (
                        (a[y - 1, x + 1], r[y - 1, x + 1],
                         g[y - 1, x + 1], b[y - 1, x + 1])
                        if x + 1 < wd
                        else (a[y, 0], r[y, 0], g[y, 0], b[y, 0])
                    )
                    pred = _predict_ref(predictor_mode, L, T, TL, TR)
                res_a[y, x] = (a[y, x] - pred[0]) % 256
                res_r[y, x] = (r[y, x] - pred[1]) % 256
                res_g[y, x] = (g[y, x] - pred[2]) % 256
                res_b[y, x] = (b[y, x] - pred[3]) % 256
        a, r, g, b = res_a, res_r, res_g, res_b

    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        w.put(1, 1)
        w.put(1, 2)  # COLOR_TRANSFORM
        size_bits = 9  # one block for the whole image
        w.put(size_bits - 2, 3)
        cte = _argb_int(255, r2b & 0xFF, g2b & 0xFF, g2r & 0xFF)
        _encode_entropy_image(w, [cte], 1, 1, False)

        def delta(t, c):
            ts = t if t < 128 else t - 256
            cs = c if c < 128 else c - 256
            return (ts * cs) >> 5

        # forward transform: the decoder adds deltas back, with its
        # "red" input equal to the ORIGINAL red
        new_r = np.empty_like(r)
        new_b = np.empty_like(b)
        for y in range(h):
            for x in range(wd):
                gv, rv, bv = int(g[y, x]), int(r[y, x]), int(b[y, x])
                new_r[y, x] = (rv - delta(g2r & 0xFF, gv)) % 256
                new_b[y, x] = (
                    bv - delta(g2b & 0xFF, gv) - delta(r2b & 0xFF, rv)
                ) % 256
        r, b = new_r, new_b

    if subtract_green:
        w.put(1, 1)
        w.put(2, 2)  # SUBTRACT_GREEN
        r = (r - g) % 256
        b = (b - g) % 256

    ewd = wd
    if palette:
        colors = sorted(
            {
                (int(a[y, x]), int(r[y, x]), int(g[y, x]), int(b[y, x]))
                for y in range(h)
                for x in range(wd)
            }
        )
        assert len(colors) <= 256
        index_of = {c: i for i, c in enumerate(colors)}
        w.put(1, 1)
        w.put(3, 2)  # COLOR_INDEXING
        w.put(len(colors) - 1, 8)
        # palette rows are component-delta-coded
        deltas = []
        prev = (0, 0, 0, 0)
        for c in colors:
            deltas.append(
                _argb_int(*[(c[i] - prev[i]) % 256 for i in range(4)])
            )
            prev = c
        _encode_entropy_image(w, deltas, len(colors), 1, False)
        idx = np.array(
            [
                [index_of[(int(a[y, x]), int(r[y, x]), int(g[y, x]), int(b[y, x]))]
                 for x in range(wd)]
                for y in range(h)
            ],
            dtype=np.int64,
        )
        n = len(colors)
        width_bits = 3 if n <= 2 else (2 if n <= 4 else (1 if n <= 16 else 0))
        if width_bits:
            per_byte = 1 << width_bits
            bits_pp = 8 >> width_bits
            ewd = -(-wd // per_byte)
            packed = np.zeros((h, ewd), dtype=np.int64)
            for x in range(wd):
                packed[:, x // per_byte] |= idx[:, x] << (
                    (x % per_byte) * bits_pp
                )
            g = packed
        else:
            g = idx
        a = np.full((h, ewd), 255, dtype=np.int64)
        r = np.zeros((h, ewd), dtype=np.int64)
        b = np.zeros((h, ewd), dtype=np.int64)

    w.put(0, 1)  # end of transforms
    pixels = [
        _argb_int(int(a[y, x]), int(r[y, x]), int(g[y, x]), int(b[y, x]))
        for y in range(h)
        for x in range(ewd)
    ]
    _encode_entropy_image(
        w, pixels, ewd, h, True, cache_bits=cache_bits, backrefs=backrefs,
        use_2d=use_2d, meta_bits=meta_bits,
    )
    body = b"\x2f" + w.flush()[1:]  # signature byte is bit-exact already
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _pix(h, w, seed=0, colors=None):
    rng = np.random.default_rng(seed)
    if colors is None:
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, colors, size=(h, w))]


# ---- spec spot-checks ------------------------------------------------------


def test_distance_map_geometry():
    assert len(KDISTANCE_MAP) == 120
    assert len(set(KDISTANCE_MAP)) == 120
    # RFC 9649 first entries, verbatim
    assert KDISTANCE_MAP[:8] == (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2)
    )
    assert KDISTANCE_MAP[-1] == (8, 7)
    for dx, dy in KDISTANCE_MAP:
        assert 0 <= dy <= 7 or (dy in range(8) or dx == 8)
        assert -8 <= dx <= 8


def test_prefix_value_mapping():
    from puma_matcher_spark.llmdata.vp8l import _Bits, _prefix_value

    # code < 4 → code + 1 with no extra bits
    for code in range(4):
        assert _prefix_value(_Bits(b"\x00"), code) == code + 1
    # code 4, extra bit 0 → 5;  code 4, extra 1 → 6;  code 5 → 7/8
    assert _prefix_value(_Bits(b"\x00"), 4) == 5
    assert _prefix_value(_Bits(b"\x01"), 4) == 6
    assert _prefix_value(_Bits(b"\x00"), 5) == 7
    # and the encoder inverse round-trips every value
    for v in list(range(1, 70)) + [120, 121, 1000, 4096]:
        sym, extra, ebits = _len_dist_symbol(v)
        w = _WBits()
        w.put(extra, ebits)
        assert _prefix_value(_Bits(w.flush() or b"\x00"), sym) == v


def test_cache_hash_is_spec_constant():
    # §3.7: index = (0x1e35a7bd * argb) >> (32 - cache_bits), uint32
    px = 0x80FF1234
    assert ((0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - 8)) == (
        (0x1E35A7BD * px) % (1 << 32)
    ) >> 24


# ---- round-trips -----------------------------------------------------------


def test_vp8l_literals_only():
    px = _pix(11, 7, 1)
    assert np.array_equal(decode_webp(encode_vp8l(px)), px)


def test_vp8l_simple_codes_two_color():
    # 2 distinct colors → simple 1-2-symbol codes on every channel
    pal = np.array([[10, 200, 30], [240, 5, 90]], dtype=np.uint8)
    rng = np.random.default_rng(2)
    px = pal[rng.integers(0, 2, size=(9, 13))]
    assert np.array_equal(decode_webp(encode_vp8l(px)), px)
    # single flat color → degenerate 1-symbol codes
    flat = np.full((5, 6, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_webp(encode_vp8l(flat)), flat)


def test_vp8l_color_cache():
    px = _pix(16, 16, 3, colors=7)
    assert np.array_equal(
        decode_webp(encode_vp8l(px, cache_bits=6)), px
    )


def test_vp8l_backrefs_plain_and_2d():
    # long horizontal runs → LZ77 distance-1 references
    px = np.repeat(_pix(12, 4, 4, colors=5), 4, axis=1)
    assert np.array_equal(
        decode_webp(encode_vp8l(px, backrefs=True)), px
    )
    # same stream with the 2-D distance code for (dx=1, dy=0)
    assert np.array_equal(
        decode_webp(encode_vp8l(px, backrefs=True, use_2d=True)), px
    )


def test_vp8l_subtract_green():
    px = _pix(10, 10, 5)
    assert np.array_equal(
        decode_webp(encode_vp8l(px, subtract_green=True)), px
    )


@pytest.mark.parametrize("mode", list(range(14)))
def test_vp8l_predictor_modes(mode):
    px = _pix(9, 11, 6 + mode)
    out = decode_webp(encode_vp8l(px, predictor_mode=mode))
    assert np.array_equal(out, px), f"predictor mode {mode}"


def test_vp8l_meta_prefix_groups():
    px = _pix(24, 32, 7, colors=9)
    assert np.array_equal(
        decode_webp(encode_vp8l(px, meta_bits=3)), px
    )


def test_vp8l_stacked_features():
    px = np.repeat(_pix(14, 5, 8, colors=6), 3, axis=1)
    blob = encode_vp8l(
        px, cache_bits=5, backrefs=True, subtract_green=True
    )
    assert np.array_equal(decode_webp(blob), px)


@pytest.mark.parametrize("cte", [(5, 3, 2), (251, 130, 255), (0, 0, 0), (127, 64, 200)])
def test_vp8l_color_transform(cte):
    px = _pix(8, 9, 30 + cte[0])
    out = decode_webp(encode_vp8l(px, color_transform=cte))
    assert np.array_equal(out, px), cte


@pytest.mark.parametrize("n_colors", [2, 3, 4, 9, 16, 17, 40])
def test_vp8l_palette_with_packing(n_colors):
    # odd width stresses the packed-pixel crop for every packing level
    px = _pix(7, 13, 40 + n_colors, colors=n_colors)
    out = decode_webp(encode_vp8l(px, palette=True))
    assert np.array_equal(out, px), n_colors


def test_vp8l_color_transform_stacks_with_subtract_green():
    px = _pix(10, 8, 55)
    blob = encode_vp8l(px, color_transform=(9, 250, 17), subtract_green=True)
    assert np.array_equal(decode_webp(blob), px)


def test_vp8l_errors_and_honest_boundaries():
    px = _pix(6, 6, 9)
    blob = encode_vp8l(px)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_webp(blob[: len(blob) // 2])  # truncated bitstream
    lossy = bytearray(blob)
    lossy[12:16] = b"VP8 "
    with pytest.raises(NotImplementedError):
        decode_webp(bytes(lossy))


def test_vp8l_media_dispatch_end_to_end(spark):
    from puma_matcher_spark.llmdata.multimodal import (
        blockhash_256,
        decode_image,
        extract_media_features_decoded,
    )

    px = _pix(32, 32, 77, colors=11)
    blob = encode_vp8l(px, cache_bits=4, backrefs=True, subtract_green=True)
    assert np.array_equal(decode_image(blob), px)  # magic routing
    media = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id LONG, payload BINARY"
    )
    got = extract_media_features_decoded(media).collect()[0]
    # VP8L is lossless → hash of the original pixels
    assert got["perceptual_hash"] == blockhash_256(px)


def test_select_tie_breaks_toward_top():
    """RFC 9649 Select: `if (pL < pT) return L else T` — a TIE returns
    T.  Hand-computed: L=(255,0,0,2), T=(255,0,2,0), TL=(255,0,0,0) →
    p=(255,0,2,2), pL = |2| = 2, pT = |2| = 2 → tie → T."""
    from puma_matcher_spark.llmdata.vp8l import _predict

    L, T, TL = (255, 0, 0, 2), (255, 0, 2, 0), (255, 0, 0, 0)
    assert _predict(11, L, T, TL, (0, 0, 0, 0)) == T
    assert _predict_ref(11, L, T, TL, (0, 0, 0, 0)) == T
    # strict inequality still picks L
    L2 = (255, 0, 2, 0)
    assert _predict(11, L2, T, TL, (0, 0, 0, 0)) == L2
