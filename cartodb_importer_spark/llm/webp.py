"""Pure-Python WebP **lossless** (VP8L) decoder (RFC 9649 bitstream).

Scope: the lossless half of WebP — the format web pipelines meet for
screenshots, diagrams, and transparent images. Covers the full VP8L
feature set: LSB-first bitstream, simple and normal prefix codes
(code-length codes, repeat ops 16/17/18, optional max-symbol cap),
color cache, LZ77 backward references with the 120-entry 2D distance
map, Huffman meta-groups via the entropy image, and all four inverse
transforms (predictor with its 14 modes, cross-color, subtract-green,
color-indexing incl. sub-byte pixel bundling). Lossy VP8 and
VP8X-wrapped lossy+alpha raise ValueError — a DCT video intra codec is
GDAL/Pillow territory.

Validation: an own-pair encoder (`encode_webp_lossless`) exercises the
literal, LZ77, color-cache, and subtract-green paths bit-exactly, and
transform unit tests pin the predictor modes to RFC 9649's formulas.
No independent VP8L encoder exists in this container (the CPython
test-suite .webp is lossy VP8), so, unlike the JPEG/CCITT codecs, the
cross-engine fixture check is not available; the decoder follows the
RFC text and the encoder is written from the same text *independently
enough* that a disagreement would round-trip-fail, not silently agree.

Like the other codecs this runs inside Arrow-batched ``mapInPandas``
workers; per-pixel Python cost is acceptable at fixture scale.
"""

from __future__ import annotations

import struct

import numpy as np

#: order in which code-length-code lengths are stored (RFC 9649 §3.7.1.2)
_CLC_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

#: 2D distance map: (dx, dy) pairs for distance codes 1..120 (§3.6.3)
_DIST_MAP = [
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
]

_MAX_PIXELS = 1 << 26


class _LsbReader:
    """LSB-first bit reader (VP8L convention — opposite of JPEG)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L stream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def bit(self) -> int:
        return self.bits(1)


class _Prefix:
    """Canonical prefix code: decode via (length, code) lookup like the
    JPEG tables; also stores the 0-bit trivial case."""

    def __init__(self, lengths: list[int]):
        nonzero = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nonzero:
            raise ValueError("VP8L prefix code with no symbols")
        if len(nonzero) == 1:
            self.trivial = nonzero[0][1]
            self.table = {}
            return
        self.trivial = None
        # canonical assignment: shorter codes first, then symbol order
        self.table = {}
        code = 0
        prev_len = 0
        for ln, sym in sorted(nonzero):
            code <<= ln - prev_len
            self.table[(ln, code)] = sym
            code += 1
            prev_len = ln
        # completeness check: kraft sum must be exactly 1
        if sum(1 / (1 << ln) for ln, _ in nonzero) != 1.0:
            raise ValueError("VP8L prefix code is not complete")

    def read(self, br: _LsbReader) -> int:
        if self.trivial is not None:
            return self.trivial
        code = 0
        for length in range(1, 16):
            # VP8L prefix codes read MSB-first within the code
            code = (code << 1) | br.bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad VP8L prefix code")


def _read_prefix_code(br: _LsbReader, alphabet_size: int) -> _Prefix:
    """§3.7.1: simple (1-2 symbols) or normal (code-length coded)."""
    if br.bit():  # simple
        num_symbols = br.bit() + 1
        if br.bit():  # first symbol is 8-bit
            sym0 = br.bits(8)
        else:
            sym0 = br.bit()
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple code symbol out of range")
        if num_symbols == 2:
            sym1 = br.bits(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L simple code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = -1  # trivial marker
            p = _Prefix.__new__(_Prefix)
            p.trivial = sym0
            p.table = {}
            return p
        return _Prefix(lengths)
    # normal: code-length code
    num_clc = 4 + br.bits(4)
    clc_lengths = [0] * 19
    for i in range(num_clc):
        clc_lengths[_CLC_ORDER[i]] = br.bits(3)
    clc = _Prefix(clc_lengths)
    # optional cap on coded symbols
    if br.bit():
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_len = s
        elif s == 16:
            rep = 3 + br.bits(2)
            lengths[i : i + rep] = [prev_len] * min(rep, alphabet_size - i)
            i += rep
        elif s == 17:
            i += 3 + br.bits(3)
        else:  # 18
            i += 11 + br.bits(7)
    if i > alphabet_size:
        raise ValueError("VP8L code lengths overflow alphabet")
    return _Prefix(lengths)


def _prefix_value(br: _LsbReader, code: int) -> int:
    """LZ77 length/distance prefix decoding (§3.6.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.bits(extra) + 1


def _decode_entropy_image(
    br: _LsbReader, w: int, h: int, allow_meta: bool
) -> np.ndarray:
    """§3.7.2 'entropy-coded image': color-cache + prefix groups + LZ77
    pixel stream -> (h, w) uint32 ARGB array. ``allow_meta`` enables the
    meta-Huffman entropy image (spatially-varying code groups, ARGB
    images only)."""
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"VP8L dimensions {w}x{h} out of range")
    # spec order (RFC 9649 §5 / libwebp DecodeImageStream): color-cache
    # info FIRST, then the meta-prefix flag (only read when recursion
    # is allowed, i.e. for the main ARGB image), then the prefix codes
    cache_bits = 0
    if br.bit():
        cache_bits = br.bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad VP8L color-cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    num_groups = 1
    if allow_meta and br.bit():
        meta_bits = br.bits(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_entropy_image(br, mw, mh, False)
        # meta index = (red << 8) | green
        meta = (((meta_img >> 16) & 0xFF) << 8) | ((meta_img >> 8) & 0xFF)
        num_groups = int(meta.max()) + 1
    groups = []
    for _ in range(num_groups):
        green = _read_prefix_code(br, 256 + 24 + cache_size)
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    out = np.zeros(w * h, np.uint32)
    cache = [0] * cache_size
    pos = 0
    n = w * h

    def cache_insert(argb: int) -> None:
        if cache_size:
            cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while pos < n:
        if meta is None:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        else:
            x = pos % w
            y = pos // w
            g_code, r_code, b_code, a_code, d_code = groups[
                int(meta[y >> meta_bits, x >> meta_bits])
            ]
        s = g_code.read(br)
        if s < 256:
            g = s
            r = r_code.read(br)
            b = b_code.read(br)
            a = a_code.read(br)
            argb = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = argb
            cache_insert(argb)
            pos += 1
        elif s < 256 + 24:
            length = _prefix_value(br, s - 256)
            d_sym = d_code.read(br)
            d_val = _prefix_value(br, d_sym)
            if d_val > 120:
                dist = d_val - 120
            else:
                dx, dy = _DIST_MAP[d_val - 1]
                dist = max(1, dy * w + dx)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                cache_insert(argb)
                pos += 1
        else:
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("VP8L color-cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out.reshape(h, w)


# ------------------------------------------------------------- transforms


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a.astype(np.uint16) + b.astype(np.uint16)) // 2


def _predict(mode: int, L, T, TL, TR) -> np.ndarray:
    """§3.5.2 predictor modes over per-channel uint8 vectors [A,R,G,B]."""
    if mode == 0:
        return np.array([255, 0, 0, 0], np.uint8)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T).astype(np.uint8)
    if mode == 6:
        return _avg2(L, TL).astype(np.uint8)
    if mode == 7:
        return _avg2(L, T).astype(np.uint8)
    if mode == 8:
        return _avg2(TL, T).astype(np.uint8)
    if mode == 9:
        return _avg2(T, TR).astype(np.uint8)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR)).astype(np.uint8)
    if mode == 11:  # Select
        p = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        pl = int(np.abs(p - L.astype(np.int32)).sum())
        pt = int(np.abs(p - T.astype(np.int32)).sum())
        return L if pl < pt else T
    if mode == 12:  # ClampAddSubtractFull
        v = L.astype(np.int32) + T.astype(np.int32) - TL.astype(np.int32)
        return np.clip(v, 0, 255).astype(np.uint8)
    if mode == 13:  # ClampAddSubtractHalf
        avg = _avg2(L, T).astype(np.int32)
        diff = avg - TL.astype(np.int32)
        # C integer division truncates toward zero; numpy // floors
        v = avg + np.trunc(diff / 2).astype(np.int32)
        return np.clip(v, 0, 255).astype(np.uint8)
    raise ValueError(f"bad VP8L predictor mode {mode}")


def _apply_predictor_inverse(
    pix: np.ndarray, modes: np.ndarray, size_bits: int
) -> np.ndarray:
    """pix: (h, w, 4) uint8 residuals [A,R,G,B]; add predictions in
    scan order."""
    h, w, _ = pix.shape
    out = pix.astype(np.uint16).copy()
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.uint16)
            elif y == 0:
                pred = out[0, x - 1]  # first row: always L
            elif x == 0:
                pred = out[y - 1, 0]  # first column: always T
            else:
                mode = int(modes[y >> size_bits, x >> size_bits])
                L = out[y, x - 1].astype(np.uint8)
                T = out[y - 1, x].astype(np.uint8)
                TL = out[y - 1, x - 1].astype(np.uint8)
                # top-right of the last column: libwebp predicts from
                # top[x+1], which in the flat pixel buffer wraps to the
                # CURRENT row's leftmost (already decoded) pixel
                TR = (
                    out[y - 1, x + 1].astype(np.uint8)
                    if x + 1 < w
                    else out[y, 0].astype(np.uint8)
                )
                pred = _predict(mode, L, T, TL, TR).astype(np.uint16)
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _color_delta(t: int, c: np.ndarray) -> np.ndarray:
    """(int8 transform byte * int8 channel) >> 5 per §3.5.3."""
    td = ((int(t) + 128) % 256) - 128  # reinterpret byte as int8
    cs = ((c.astype(np.int32) + 128) % 256) - 128
    return (td * cs) >> 5


def _apply_color_inverse(
    pix: np.ndarray, elems: np.ndarray, size_bits: int
) -> np.ndarray:
    """Cross-color inverse: red += f(green); blue += f(green) + f(red)."""
    h, w, _ = pix.shape
    out = pix.copy()
    for y in range(h):
        for x in range(w):
            e = int(elems[y >> size_bits, x >> size_bits])
            g2r = e & 0xFF
            g2b = (e >> 8) & 0xFF
            r2b = (e >> 16) & 0xFF
            a, r, g, b = (int(v) for v in out[y, x])
            r = (r + int(_color_delta(g2r, np.array(g)))) & 0xFF
            b = (b + int(_color_delta(g2b, np.array(g)))) & 0xFF
            b = (b + int(_color_delta(r2b, np.array(r)))) & 0xFF
            out[y, x] = (a, r, g, b)
    return out


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP container -> (H, W, 3) uint8 RGB (alpha dropped). Lossless
    (VP8L) only; lossy VP8 raises ValueError."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    i = 12
    vp8l = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        ln = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"VP8L":
            vp8l = payload[i + 8 : i + 8 + ln]
            break
        if cid == b"VP8 ":
            raise ValueError("lossy VP8 WebP unsupported (Pillow territory)")
        i += 8 + ln + (ln & 1)
    if vp8l is None:
        raise ValueError("WebP without a VP8L chunk unsupported")
    return _decode_vp8l(vp8l)


def _decode_vp8l(data: bytes) -> np.ndarray:
    if not data or data[0] != 0x2F:
        raise ValueError("bad VP8L signature")
    br = _LsbReader(data)
    br.bits(8)
    w = br.bits(14) + 1
    h = br.bits(14) + 1
    br.bit()  # alpha hint
    if br.bits(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > _MAX_PIXELS:
        raise ValueError("VP8L dimensions exceed decode ceiling")

    # transforms, in bitstream order; applied inverse in reverse
    transforms: list[tuple] = []
    xsize = w
    seen = set()
    while br.bit():
        ttype = br.bits(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 0:  # predictor
            sb = br.bits(3) + 2
            mw = (xsize + (1 << sb) - 1) >> sb
            mh = (h + (1 << sb) - 1) >> sb
            modes = (_decode_entropy_image(br, mw, mh, False) >> 8) & 0xFF
            transforms.append(("predictor", sb, modes))
        elif ttype == 1:  # cross-color
            sb = br.bits(3) + 2
            mw = (xsize + (1 << sb) - 1) >> sb
            mh = (h + (1 << sb) - 1) >> sb
            elems = _decode_entropy_image(br, mw, mh, False) & 0xFFFFFF
            transforms.append(("color", sb, elems))
        elif ttype == 2:  # subtract green
            transforms.append(("subtract_green",))
        else:  # color indexing
            n_colors = br.bits(8) + 1
            pal_img = _decode_entropy_image(br, n_colors, 1, False)[0]
            # palette entries are delta-coded componentwise
            palette = np.zeros((n_colors, 4), np.uint8)
            prev = np.zeros(4, np.uint16)
            for ci in range(n_colors):
                v = int(pal_img[ci])
                cur = np.array(
                    [v >> 24 & 0xFF, v >> 16 & 0xFF, v >> 8 & 0xFF, v & 0xFF],
                    np.uint16,
                )
                prev = (prev + cur) & 0xFF
                palette[ci] = prev
            if n_colors <= 2:
                wb = 3
            elif n_colors <= 4:
                wb = 2
            elif n_colors <= 16:
                wb = 1
            else:
                wb = 0
            transforms.append(("palette", wb, palette, xsize))
            xsize = (xsize + (1 << wb) - 1) >> wb

    argb = _decode_entropy_image(br, xsize, h, True)
    # unpack into (h, w', 4) uint8 [A, R, G, B]
    pix = np.stack(
        [
            (argb >> 24) & 0xFF,
            (argb >> 16) & 0xFF,
            (argb >> 8) & 0xFF,
            argb & 0xFF,
        ],
        axis=2,
    ).astype(np.uint8)

    for t in reversed(transforms):
        if t[0] == "palette":
            _, wb, palette, full_w = t
            if wb:
                per = 1 << wb
                bits_per = 8 >> wb
                g = pix[:, :, 2]
                cols = []
                for slot in range(per):
                    cols.append((g >> (slot * bits_per)) & ((1 << bits_per) - 1))
                idx = np.stack(cols, axis=2).reshape(h, -1)[:, :full_w]
            else:
                idx = pix[:, :, 2][:, :full_w]
            idx = np.clip(idx, 0, len(palette) - 1)
            pix = palette[idx]
        elif t[0] == "subtract_green":
            g = pix[:, :, 2].astype(np.uint16)
            pix[:, :, 1] = ((pix[:, :, 1] + g) & 0xFF).astype(np.uint8)
            pix[:, :, 3] = ((pix[:, :, 3] + g) & 0xFF).astype(np.uint8)
        elif t[0] == "predictor":
            pix = _apply_predictor_inverse(pix, t[2], t[1])
        elif t[0] == "color":
            pix = _apply_color_inverse(pix, t[2], t[1])

    return np.ascontiguousarray(pix[:, :, 1:4])  # drop alpha -> RGB


# ---------------------------------------------------------------- encoder


class _LsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _two_level_lengths(symbols: list[int]) -> dict[int, int]:
    """Complete canonical code over >=2 symbols: 2^w - k symbols get
    length w-1, the remaining 2k - 2^w get length w (w = ceil(log2 k)).
    Kraft sum is exactly 1 by construction."""
    k = len(symbols)
    w = max(1, (k - 1).bit_length())
    n_short = (1 << w) - k
    return {
        s: (w - 1 if i < n_short and w > 1 else w)
        for i, s in enumerate(symbols)
    }


def _write_code_lengths(bw: _LsbWriter, lengths: list[int]) -> None:
    """Normal prefix-code header: 3-bit code-length-code lengths for all
    19 slots, then the symbol lengths coded with a complete two-level
    CLC over the used code-length values."""
    used = sorted({ln for ln in lengths} | {17})
    clc_map = _two_level_lengths(used)
    clc_lengths = [0] * 19
    for c, ln in clc_map.items():
        clc_lengths[c] = ln
    bw.write(15, 4)  # num_clc = 4 + 15 = 19: emit all, in _CLC_ORDER
    for c in _CLC_ORDER:
        bw.write(clc_lengths[c], 3)
    clc = _canonical(clc_map)
    bw.write(0, 1)  # no max-symbol cap

    def put(sym: int) -> None:
        code, cn = clc[sym]
        for k in range(cn - 1, -1, -1):  # prefix codes are MSB-first
            bw.write((code >> k) & 1, 1)

    i = 0
    n = len(lengths)
    while i < n:
        ln = lengths[i]
        if ln == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            left = run
            while left >= 3:
                chunk = min(left, 10)
                put(17)
                bw.write(chunk - 3, 3)
                left -= chunk
            for _ in range(left):
                put(0)
            i += run
        else:
            put(ln)
            i += 1


def _canonical(length_by_sym: dict[int, int]) -> dict[int, tuple[int, int]]:
    """{symbol: length} -> {symbol: (MSB-first code, length)}."""
    out = {}
    code = 0
    prev = 0
    for ln, sym in sorted((ln, sym) for sym, ln in length_by_sym.items() if ln):
        code <<= ln - prev
        out[sym] = (code, ln)
        code += 1
        prev = ln
    return out


def _build_lengths(freqs: dict[int, int], alphabet: int) -> list[int]:
    """Huffman code lengths over the used symbols (always complete for
    >=2 symbols); falls back to the complete two-level balanced code if
    any Huffman depth exceeds VP8L's 15-bit cap. Callers guarantee
    >=2 used symbols (the simple-code/dummy paths handle fewer)."""
    import heapq

    heap = [(f, [s]) for s, f in freqs.items()]
    heapq.heapify(heap)
    depth = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, s1 = heapq.heappop(heap)
        f2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, s1 + s2))
    if max(depth.values()) > 15:
        depth = _two_level_lengths(
            sorted(freqs, key=lambda s: -freqs[s])
        )
    lengths = [0] * alphabet
    for s, d in depth.items():
        lengths[s] = d
    return lengths


def _emit_prefix_code(
    bw: _LsbWriter, freqs: dict[int, int], alphabet: int
) -> dict[int, tuple[int, int]]:
    """Write a prefix-code header for ``freqs`` and return the encode
    table. Uses the simple form for <=2 symbols."""
    used = sorted(freqs)
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple
        if not used:
            used = [0]
        bw.write(len(used) - 1, 1)
        if used[0] < 2 and len(used) == 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        if len(used) == 1:
            return {used[0]: (0, 0)}
        return {used[0]: (0, 1), used[1]: (1, 1)}
    bw.write(0, 1)  # normal
    if len(used) < 2:
        # a complete normal code needs >=2 symbols: add an unused dummy
        freqs = dict(freqs)
        dummy = 0 if 0 not in freqs else 1
        freqs[dummy] = 1
    lengths = _build_lengths(freqs, alphabet)
    _write_code_lengths(bw, lengths)
    return _canonical({s: ln for s, ln in enumerate(lengths) if ln})


def encode_webp_lossless(
    rgb: np.ndarray,
    use_subtract_green: bool = True,
    cache_bits: int = 4,
    use_palette: bool = False,
) -> bytes:
    """(H, W, 3) uint8 -> lossless WebP. Fixture counterpart of
    decode_webp: literals + a greedy run-detecting LZ77 (distance 1) +
    color cache + optional subtract-green OR color-indexing (palette
    with sub-byte pixel bundling, <=16 distinct colors), single Huffman
    group. Bit-exact round-trip by construction."""
    h, w, _ = rgb.shape
    if w > 16384 or h > 16384:
        # the VP8L header stores width-1/height-1 in 14-bit fields;
        # anything larger would silently wrap modulo 16384
        raise ValueError(
            f"VP8L dimensions limited to 16384x16384, got {w}x{h}"
        )
    a = np.full((h, w), 255, np.uint8)
    palette = None
    if use_palette:
        colors = np.unique(rgb.reshape(-1, 3), axis=0)
        if len(colors) > 256:
            raise ValueError("too many colors for palette mode")
        palette = colors  # (n, 3) RGB
        lut = {tuple(c): i for i, c in enumerate(colors)}
        idx = np.array(
            [lut[tuple(px)] for px in rgb.reshape(-1, 3)], np.uint16
        ).reshape(h, w)
        n_colors = len(colors)
        if n_colors <= 2:
            wb = 3
        elif n_colors <= 4:
            wb = 2
        elif n_colors <= 16:
            wb = 1
        else:
            wb = 0
        bw_width = (w + (1 << wb) - 1) >> wb
        packed = np.zeros((h, bw_width), np.uint16)
        bits_per = 8 >> wb
        for x in range(w):
            packed[:, x >> wb] |= idx[:, x] << ((x & ((1 << wb) - 1)) * bits_per)
        # bundled image: green channel carries the packed indices
        r = np.zeros((h, bw_width), np.uint16)
        g = packed
        b = np.zeros((h, bw_width), np.uint16)
        a = np.full((h, bw_width), 255, np.uint8)
        use_subtract_green = False
        w_coded = bw_width
    else:
        r = rgb[:, :, 0].astype(np.uint16)
        g = rgb[:, :, 1].astype(np.uint16)
        b = rgb[:, :, 2].astype(np.uint16)
        if use_subtract_green:
            r = (r - g) & 0xFF
            b = (b - g) & 0xFF
        w_coded = w
    argb = (
        (a.astype(np.uint32) << 24)
        | (r.astype(np.uint32) << 16)
        | (g.astype(np.uint32) << 8)
        | b.astype(np.uint32)
    ).reshape(-1)

    cache_size = 1 << cache_bits
    # token stream: ('lit', argb) | ('cache', idx) | ('copy', len, dist)
    tokens = []
    cache = [None] * cache_size
    n = len(argb)
    i = 0
    while i < n:
        v = int(argb[i])
        # greedy: run of the previous pixel (distance 1)
        if i > 0 and v == int(argb[i - 1]):
            run = 1
            while i + run < n and int(argb[i + run]) == int(argb[i - 1 + run]):
                run += 1
                if run >= 4096:
                    break
            if run >= 3:
                tokens.append(("copy", run, 1))
                for k in range(run):
                    key = (0x1E35A7BD * int(argb[i + k]) & 0xFFFFFFFF) >> (
                        32 - cache_bits
                    )
                    cache[key] = int(argb[i + k])
                i += run
                continue
        key = (0x1E35A7BD * v & 0xFFFFFFFF) >> (32 - cache_bits)
        if cache[key] == v:
            tokens.append(("cache", key))
        else:
            tokens.append(("lit", v))
            cache[key] = v
        i += 1

    # frequencies
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}

    def bump(d, k):
        d[k] = d.get(k, 0) + 1

    def len_to_prefix(val: int) -> tuple[int, int, int]:
        """value -> (prefix code, extra bits, extra value)."""
        if val <= 4:
            return val - 1, 0, 0
        bits_used = (val - 1).bit_length() - 1
        rest = val - 1 - (1 << bits_used)
        hi = rest >> (bits_used - 1) if bits_used > 0 else 0
        # prefix = 2*bits_used + hi ... derive by inverting _prefix_value
        for code in range(24):
            if code < 4:
                lo, span = code + 1, 1
            else:
                extra = (code - 2) >> 1
                lo = ((2 + (code & 1)) << extra) + 1
                span = 1 << extra
            if lo <= val < lo + span:
                return code, (0 if code < 4 else (code - 2) >> 1), val - lo
        raise ValueError("length out of LZ77 range")

    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            bump(gf, (v >> 8) & 0xFF)
            bump(rf, (v >> 16) & 0xFF)
            bump(bf, v & 0xFF)
            bump(af, (v >> 24) & 0xFF)
        elif t[0] == "cache":
            bump(gf, 256 + 24 + t[1])
        else:
            code, _, _ = len_to_prefix(t[1])
            bump(gf, 256 + code)
            dcode, _, _ = len_to_prefix(t[2] + 120)  # plain distance
            bump(df, dcode)

    bw = _LsbWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha hint
    bw.write(0, 3)  # version
    if use_subtract_green:
        bw.write(1, 1)  # transform present
        bw.write(2, 2)  # subtract-green
    if palette is not None:
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # color indexing
        bw.write(len(palette) - 1, 8)
        # palette as a 1xN entropy image, componentwise delta-coded,
        # literal-only with trivial codes per channel
        prev = np.zeros(4, np.uint16)
        pal_freqs = [dict() for _ in range(4)]  # a, r, g, b channels
        deltas = []
        for color in palette:
            cur = np.array([255, color[0], color[1], color[2]], np.uint16)
            d = (cur - prev) & 0xFF
            prev = cur
            deltas.append(d)
            for ch in range(4):
                pal_freqs[ch][int(d[ch])] = (
                    pal_freqs[ch].get(int(d[ch]), 0) + 1
                )
        bw.write(0, 1)  # no color cache for the palette image
        pg = _emit_prefix_code(bw, pal_freqs[3 - 1], 256 + 24)  # green
        pr = _emit_prefix_code(bw, pal_freqs[1], 256)
        pb = _emit_prefix_code(bw, pal_freqs[3], 256)
        pa = _emit_prefix_code(bw, pal_freqs[0], 256)
        pd = _emit_prefix_code(bw, {}, 40)

        def putp(codes, sym):
            code, ln = codes[sym]
            for k in range(ln - 1, -1, -1):
                bw.write((code >> k) & 1, 1)

        for d in deltas:
            putp(pg, int(d[2]))
            putp(pr, int(d[1]))
            putp(pb, int(d[3]))
            putp(pa, int(d[0]))
    bw.write(0, 1)  # no more transforms
    bw.write(1, 1)  # color cache used (spec order: cache before meta)
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta huffman
    gcodes = _emit_prefix_code(bw, gf, 256 + 24 + cache_size)
    rcodes = _emit_prefix_code(bw, rf, 256)
    bcodes = _emit_prefix_code(bw, bf, 256)
    acodes = _emit_prefix_code(bw, af, 256)
    dcodes = _emit_prefix_code(bw, df, 40)

    def put(codes, sym):
        code, ln = codes[sym]
        for k in range(ln - 1, -1, -1):  # MSB-first within the code
            bw.write((code >> k) & 1, 1)

    for t in tokens:
        if t[0] == "lit":
            v = t[1]
            put(gcodes, (v >> 8) & 0xFF)
            put(rcodes, (v >> 16) & 0xFF)
            put(bcodes, v & 0xFF)
            put(acodes, (v >> 24) & 0xFF)
        elif t[0] == "cache":
            put(gcodes, 256 + 24 + t[1])
        else:
            code, extra, rest = len_to_prefix(t[1])
            put(gcodes, 256 + code)
            if extra:
                bw.write(rest, extra)
            dcode, dextra, drest = len_to_prefix(t[2] + 120)
            put(dcodes, dcode)
            if dextra:
                bw.write(drest, dextra)

    body = bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
