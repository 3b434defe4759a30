"""WebP lossless (VP8L) decoder in pure numpy — RFC 9649 §3-5.

The media plane's last named codec gap: WebP.  The LOSSLESS profile is
a huffman-coded ARGB bitstream (no DCT, no arithmetic coder) and is
implementable from the public spec with nothing beyond numpy:

* RIFF container parse (``WEBP`` → ``VP8L`` chunk);
* LSB-first bit reader; canonical prefix codes, both the "simple"
  1-2-symbol form and the code-length-coded form with the DEFLATE-style
  16/17/18 repeat codes (§3.5);
* the entropy image: literals, LZ77 backward references with the 120
  2-D distance codes, and the hash-addressed color cache (§3.6-3.7,
  §4.3), plus the meta-prefix image selecting per-tile code groups;
* the four inverse transforms in reverse bitstream order (§4):
  predictor (14 modes incl. Select / ClampAddSubtract*), color
  transform (signed cross-channel deltas), subtract-green, and color
  indexing (palette, incl. sub-byte pixel packing).

Lossy WebP (``VP8 `` chunks — a full video intra codec) and the
extended container (``VP8X``: animation, fragments) raise
``NotImplementedError`` honestly.  Alpha is decoded but dropped on
output, matching the PNG path's RGB contract.

Determinism: integer arithmetic end-to-end; same bytes → same pixels on
every executor — the contract every media fingerprint relies on.
"""

from __future__ import annotations

import numpy as np

# §3.5: order in which code-length-code lengths are stored
KCODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: §4.3: the 120 two-dimensional distance codes, (dx, dy) pairs scanned
#: nearest-first.  Index i (1-based code) maps to offset dy*width + dx.
KDISTANCE_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


class _Bits:
    """LSB-first bit reader over the VP8L payload (§2), buffered: bytes
    load in bulk and the next stream bit is always bit 0 of ``buf``."""

    __slots__ = ("data", "byte", "buf", "nb")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.buf = 0
        self.nb = 0

    def _refill(self) -> None:
        d = self.data
        p = self.byte
        take = min(6, len(d) - p)
        if take > 0:
            self.buf |= int.from_bytes(d[p : p + take], "little") << self.nb
            self.nb += 8 * take
            self.byte = p + take

    def read(self, n: int) -> int:
        if self.nb < n:
            self._refill()
            if self.nb < n:
                raise ValueError("truncated VP8L bitstream")
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nb -= n
        return v


class _Prefix:
    """Canonical prefix code from per-symbol code lengths (§3.4): codes
    assigned smallest-first within each length, read MSB-of-code-first
    from the LSB-first byte stream (the DEFLATE convention)."""

    __slots__ = ("lookup", "single", "fast")

    def __init__(self, lengths: list[int]):
        self.single = None
        nonzero = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(nonzero) == 1:
            # degenerate code: the single symbol costs zero bits
            self.single = nonzero[0][1]
            self.lookup = {}
            self.fast = {}
            return
        self.lookup = {}
        # fast path keyed by the next 8 STREAM bits (LSB-first order):
        # the canonical code, bit-reversed, padded with every suffix
        self.fast = {}
        code = 0
        for length in range(1, max((ln for ln, _ in nonzero), default=0) + 1):
            for ln, sym in nonzero:
                if ln == length:
                    self.lookup[(length, code)] = sym
                    if length <= 8:
                        rev = 0
                        for i in range(length):
                            rev |= ((code >> (length - 1 - i)) & 1) << i
                        for hi in range(1 << (8 - length)):
                            self.fast[rev | (hi << length)] = (sym, length)
                    code += 1
            code <<= 1

    def read(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        if bits.nb < 8:
            bits._refill()
        if bits.nb >= 8:
            hit = self.fast.get(bits.buf & 0xFF)
            if hit is not None:
                sym, ln = hit
                bits.buf >>= ln
                bits.nb -= ln
                return sym
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | bits.read(1)
            length += 1
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Prefix:
    """§3.5: either a simple (1-2 symbol) code or a code-length-coded
    canonical code with 16/17/18 repeat semantics."""
    if bits.read(1):  # simple code
        num_symbols = bits.read(1) + 1
        if bits.read(1):  # first symbol is 8 bits
            first = bits.read(8)
        else:
            first = bits.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            second = bits.read(8)
            lengths[first] = 1
            lengths[second] = 1
        else:
            lengths[first] = 1
        return _Prefix(lengths)
    # code-length-coded
    num_codes = bits.read(4) + 4
    cl_lengths = [0] * len(KCODE_LENGTH_ORDER)
    for i in range(num_codes):
        cl_lengths[KCODE_LENGTH_ORDER[i]] = bits.read(3)
    cl_code = _Prefix(cl_lengths)
    if bits.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    sym = 0
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(bits)
        if code_len < 16:
            lengths[sym] = code_len
            sym += 1
            if code_len:
                prev_len = code_len
        elif code_len == 16:
            repeat = 3 + bits.read(2)
            for _ in range(repeat):
                if sym < alphabet_size:
                    lengths[sym] = prev_len
                    sym += 1
        elif code_len == 17:
            sym += 3 + bits.read(3)
        else:  # 18
            sym += 11 + bits.read(7)
    return _Prefix(lengths)


def _prefix_value(bits: _Bits, code: int) -> int:
    """§3.6.2 length/distance prefix decoding: code < 4 → code+1, else
    (2 + (code&1)) << extra  plus extra bits, plus one."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + bits.read(extra) + 1


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_image_stream(
    bits: _Bits, width: int, height: int, is_argb: bool
) -> np.ndarray:
    """§5 decodeImageStream: optional transforms (top level only), then
    the entropy-coded image.  Returns (height, width, 4) uint8 ARGB."""
    transforms = []
    xsize = width
    if is_argb:
        seen = set()
        while bits.read(1):
            ttype = bits.read(2)
            if ttype in seen:
                raise ValueError("VP8L transform repeated")
            seen.add(ttype)
            if ttype == 0:  # PREDICTOR
                size_bits = bits.read(3) + 2
                bs = 1 << size_bits
                sub = _decode_image_stream(
                    bits, _div_round_up(xsize, bs), _div_round_up(height, bs),
                    False,
                )
                transforms.append(("predictor", size_bits, sub))
            elif ttype == 1:  # COLOR_TRANSFORM
                size_bits = bits.read(3) + 2
                bs = 1 << size_bits
                sub = _decode_image_stream(
                    bits, _div_round_up(xsize, bs), _div_round_up(height, bs),
                    False,
                )
                transforms.append(("color", size_bits, sub))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append(("subtract_green",))
            else:  # COLOR_INDEXING
                n_colors = bits.read(8) + 1
                palette = _decode_image_stream(bits, n_colors, 1, False)
                # palette entries are DELTA-coded component-wise (§4.2.4)
                pal = np.cumsum(
                    palette[0].astype(np.int64), axis=0
                ) % 256
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append(
                    ("palette", pal.astype(np.uint8), width_bits, xsize)
                )
                if width_bits:
                    xsize = _div_round_up(xsize, 1 << width_bits)
    argb = _decode_entropy_image(bits, xsize, height, is_argb)
    for t in reversed(transforms):
        argb = _apply_inverse_transform(argb, t)
    return argb


def _decode_entropy_image(
    bits: _Bits, width: int, height: int, is_argb: bool
) -> np.ndarray:
    cache_bits = 0
    if bits.read(1):  # color cache present
        cache_bits = bits.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad VP8L color-cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_argb and bits.read(1):  # meta prefix image
        meta_bits = bits.read(3) + 2
        meta = _decode_image_stream(
            bits,
            _div_round_up(width, 1 << meta_bits),
            _div_round_up(height, 1 << meta_bits),
            False,
        )
        # meta index lives in (red << 8) | green
        meta_idx = (
            meta[:, :, 1].astype(np.int32) << 8
        ) | meta[:, :, 2].astype(np.int32)
        n_groups = int(meta_idx.max()) + 1
    green_size = 256 + 24 + cache_size
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(bits, green_size),
                _read_prefix_code(bits, 256),  # red
                _read_prefix_code(bits, 256),  # blue
                _read_prefix_code(bits, 256),  # alpha
                _read_prefix_code(bits, 40),   # distance
            )
        )
    out = np.zeros(width * height, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    total = width * height
    while pos < total:
        if meta is not None:
            x = pos % width
            y = pos // width
            gi = int(meta_idx[y >> meta_bits, x >> meta_bits])
            g_green, g_red, g_blue, g_alpha, g_dist = groups[gi]
        else:
            g_green, g_red, g_blue, g_alpha, g_dist = groups[0]
        sym = g_green.read(bits)
        if sym < 256:  # literal
            green = sym
            red = g_red.read(bits)
            blue = g_blue.read(bits)
            alpha = g_alpha.read(bits)
            pixel = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[pos] = pixel
            pos += 1
            if cache_size:
                cache[(0x1E35A7BD * pixel & 0xFFFFFFFF) >> (32 - cache_bits)] = pixel
        elif sym < 256 + 24:  # LZ77 backward reference
            length = _prefix_value(bits, sym - 256)
            dist_code = _prefix_value(bits, g_dist.read(bits))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = KDISTANCE_MAP[dist_code - 1]
                dist = dy * width + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > total:
                raise ValueError("VP8L backward reference out of range")
            for i in range(length):
                pixel = int(out[pos - dist])
                out[pos] = pixel
                pos += 1
                if cache_size:
                    cache[
                        (0x1E35A7BD * pixel & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = pixel
        else:  # color-cache hit
            idx = sym - 256 - 24
            if idx >= cache_size:
                raise ValueError("VP8L cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    px = out.reshape(height, width)
    argb = np.empty((height, width, 4), dtype=np.uint8)
    argb[:, :, 0] = (px >> 24) & 0xFF
    argb[:, :, 1] = (px >> 16) & 0xFF
    argb[:, :, 2] = (px >> 8) & 0xFF
    argb[:, :, 3] = px & 0xFF
    return argb


# ---------------------------------------------------------------------------
# Inverse transforms (§4) — channel order in arrays is A,R,G,B.
# ---------------------------------------------------------------------------


def _avg2(a, b):
    return (int(a) + int(b)) >> 1


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _predict(mode: int, L, T, TL, TR) -> tuple:
    """One predicted ARGB pixel (§4.2.2); channel tuples A,R,G,B."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return tuple(_avg2(_avg2(L[c], TR[c]), T[c]) for c in range(4))
    if mode == 6:
        return tuple(_avg2(L[c], TL[c]) for c in range(4))
    if mode == 7:
        return tuple(_avg2(L[c], T[c]) for c in range(4))
    if mode == 8:
        return tuple(_avg2(TL[c], T[c]) for c in range(4))
    if mode == 9:
        return tuple(_avg2(T[c], TR[c]) for c in range(4))
    if mode == 10:
        return tuple(
            _avg2(_avg2(L[c], TL[c]), _avg2(T[c], TR[c])) for c in range(4)
        )
    if mode == 11:  # Select — RFC 9649: `if (pL < pT) return L else T`,
        # so a TIE picks T (verified against the spec pseudocode)
        p = [int(L[c]) + int(T[c]) - int(TL[c]) for c in range(4)]
        p_left = sum(abs(p[c] - int(L[c])) for c in range(4))
        p_top = sum(abs(p[c] - int(T[c])) for c in range(4))
        return L if p_left < p_top else T
    if mode == 12:  # ClampAddSubtractFull
        return tuple(
            _clamp(int(L[c]) + int(T[c]) - int(TL[c])) for c in range(4)
        )
    if mode == 13:  # ClampAddSubtractHalf
        out = []
        for c in range(4):
            ave = _avg2(L[c], T[c])
            d = ave - int(TL[c])
            # C integer division truncates toward zero (spec pseudocode)
            half = d // 2 if d >= 0 else -((-d) // 2)
            out.append(_clamp(ave + half))
        return tuple(out)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _apply_inverse_transform(argb: np.ndarray, t: tuple) -> np.ndarray:
    kind = t[0]
    h, w = argb.shape[:2]
    if kind == "subtract_green":
        g = argb[:, :, 2].astype(np.int16)
        argb = argb.copy()
        argb[:, :, 1] = ((argb[:, :, 1].astype(np.int16) + g) & 0xFF).astype(
            np.uint8
        )
        argb[:, :, 3] = ((argb[:, :, 3].astype(np.int16) + g) & 0xFF).astype(
            np.uint8
        )
        return argb
    if kind == "predictor":
        _, size_bits, sub = t
        out = argb.astype(np.int32)
        modes = sub[:, :, 2]  # green channel holds the mode
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = (255, 0, 0, 0)
                elif y == 0:
                    pred = tuple(out[0, x - 1])  # L
                elif x == 0:
                    pred = tuple(out[y - 1, 0])  # T
                else:
                    mode = int(modes[y >> size_bits, x >> size_bits])
                    L = tuple(out[y, x - 1])
                    T = tuple(out[y - 1, x])
                    TL = tuple(out[y - 1, x - 1])
                    # §4.2.2: TR is the pixel one row up, one to the
                    # right — in linear scan order, for the rightmost
                    # column that wraps to the CURRENT row's leftmost
                    # pixel (index p - width + 1), which is already
                    # decoded
                    TR = (
                        tuple(out[y - 1, x + 1])
                        if x + 1 < w
                        else tuple(out[y, 0])
                    )
                    pred = _predict(mode, L, T, TL, TR)
                for c in range(4):
                    out[y, x, c] = (out[y, x, c] + pred[c]) & 0xFF
        return out.astype(np.uint8)
    if kind == "color":
        _, size_bits, sub = t
        out = argb.astype(np.int32)
        # per-block factors: green_to_red in blue ch, green_to_blue in
        # green ch, red_to_blue in red ch — all signed 3.5 fixed point
        def s8(v):
            return v - 256 if v >= 128 else v

        for y in range(h):
            by = y >> size_bits
            for x in range(w):
                bx = x >> size_bits
                g2r = s8(int(sub[by, bx, 3]))
                g2b = s8(int(sub[by, bx, 2]))
                r2b = s8(int(sub[by, bx, 1]))
                g = out[y, x, 2]
                # signed green as int8 per spec ColorTransformDelta
                gs = g - 256 if g >= 128 else g
                r = (out[y, x, 1] + ((g2r * gs) >> 5)) & 0xFF
                rs = r - 256 if r >= 128 else r
                b = (
                    out[y, x, 3] + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)
                ) & 0xFF
                out[y, x, 1] = r
                out[y, x, 3] = b
        return out.astype(np.uint8)
    if kind == "palette":
        _, pal, width_bits, orig_w = t
        if width_bits == 0:
            idx = argb[:, :, 2].astype(np.int64)  # green channel
        else:
            packed = argb[:, :, 2].astype(np.int64)
            per_byte = 1 << width_bits
            bits_pp = 8 >> width_bits
            mask = (1 << bits_pp) - 1
            cols = []
            for i in range(per_byte):
                cols.append((packed >> (i * bits_pp)) & mask)
            idx = np.stack(cols, axis=2).reshape(h, -1)[:, :orig_w]
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("VP8L palette index out of range")
        return pal[idx]
    raise ValueError(f"unknown transform {kind}")


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container → (h, w, 3) uint8 RGB via the VP8L path.

    Lossy ``VP8 `` and extended ``VP8X`` payloads raise
    NotImplementedError (a video intra codec / animation container —
    out of scope for a numpy-only environment)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    pos = 12
    n = len(payload)
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"VP8L":
            return _decode_vp8l(body)
        if cid in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                f"WebP {cid.decode().strip()} (lossy/extended) not "
                "supported — lossless VP8L only"
            )
    raise ValueError("WebP container held no image chunk")


def _decode_vp8l(body: bytes) -> np.ndarray:
    if not body or body[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    bits = _Bits(body, 1)
    w = bits.read(14) + 1
    h = bits.read(14) + 1
    bits.read(1)  # alpha-is-used hint
    version = bits.read(3)
    if version != 0:
        raise NotImplementedError(f"VP8L version {version}")
    argb = _decode_image_stream(bits, w, h, True)
    return argb[:, :, 1:4].copy()  # drop alpha → RGB
