"""Pure-Python FLAC decoder (stdlib + numpy).

Covers the format's full decode surface for integer PCM: STREAMINFO
parsing, frame sync + header (block size / sample rate / channel
assignment codes, UTF-8-coded frame number, CRC-8 verified), all four
subframe types (CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
with quantized coefficients and shift), wasted bits, Rice/Rice2 residual
partitions (including escape partitions), and the stereo decorrelation
modes (left-side, right-side, mid-side). Sample widths up to 24 bits.

Validation is own-pair (no FLAC encoder exists in this container):
``encode_flac`` writes fixed-predictor frames with real Rice coding and
the decoder round-trips bit-exact; LPC and stereo-decorrelation paths
are additionally pinned by hand-built frames in the tests. The
(samples, rate) output contract matches decode_wav/decode_aiff, so the
audio feature path treats .flac like any other PCM container.
"""

from __future__ import annotations

import struct

import numpy as np

_CRC8_POLY = 0x07
_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ _CRC8_POLY) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096, 13: 8192,
    14: 16384, 15: 32768,
}
_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class _MsbReader:
    """MSB-first bit reader (FLAC convention)."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes * 8

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("FLAC stream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
            if q > 1 << 24:
                raise ValueError("FLAC unary run does not terminate")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _utf8_coded(br: _MsbReader) -> int:
    """FLAC's extended UTF-8 number (frame or sample index)."""
    b0 = br.bits(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("bad FLAC UTF-8 coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.bits(8)
        if c & 0xC0 != 0x80:
            raise ValueError("bad FLAC UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _rice_read(br: _MsbReader, k: int) -> int:
    q = br.unary()
    v = (q << k) | br.bits(k) if k else q
    return (v >> 1) ^ -(v & 1)  # zigzag


def _read_residual(br: _MsbReader, block: int, order: int) -> list[int]:
    method = br.bits(2)
    if method > 1:
        raise ValueError("reserved FLAC residual method")
    k_escape = 15 if method == 0 else 31
    k_bits = 4 if method == 0 else 5
    part_order = br.bits(4)
    n_parts = 1 << part_order
    if block % n_parts:
        raise ValueError("FLAC partition order does not divide block size")
    out: list[int] = []
    for p in range(n_parts):
        n = block >> part_order
        if p == 0:
            n -= order
        k = br.bits(k_bits)
        if k == k_escape:
            width = br.bits(5)
            out.extend(br.signed(width) if width else 0 for _ in range(n))
        else:
            out.extend(_rice_read(br, k) for _ in range(n))
    return out


def _decode_subframe(br: _MsbReader, block: int, bps: int) -> np.ndarray:
    if br.bits(1):
        raise ValueError("bad FLAC subframe padding bit")
    ftype = br.bits(6)
    wasted = 0
    if br.bits(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = br.signed(eff)
        samples = np.full(block, v, np.int64)
    elif ftype == 1:  # VERBATIM
        samples = np.array([br.signed(eff) for _ in range(block)], np.int64)
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [br.signed(eff) for _ in range(order)]
        resid = _read_residual(br, block, order)
        coefs = _FIXED_COEFS[order]
        samples = np.empty(block, np.int64)
        samples[:order] = warm
        for i in range(order, block):
            pred = sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
            samples[i] = pred + resid[i - order]
    elif ftype >= 32:  # LPC order 1-32
        order = ftype - 31
        warm = [br.signed(eff) for _ in range(order)]
        precision = br.bits(4) + 1
        if precision == 16:
            raise ValueError("invalid FLAC LPC precision")
        shift = br.signed(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [br.signed(precision) for _ in range(order)]
        resid = _read_residual(br, block, order)
        samples = np.empty(block, np.int64)
        samples[:order] = warm
        for i in range(order, block):
            acc = sum(c * int(samples[i - 1 - j]) for j, c in enumerate(coefs))
            samples[i] = (acc >> shift) + resid[i - order]
    else:
        raise ValueError(f"reserved FLAC subframe type {ftype}")
    return samples << wasted


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC -> (float32 samples in [-1, 1] shaped (n, channels),
    sample_rate) — the same contract as decode_wav/decode_aiff."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        btype = hdr & 0x7F
        last = bool(hdr & 0x80)
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if btype == 0:
            streaminfo = payload[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if last:
            break
    if streaminfo is None or len(streaminfo) < 18:
        raise ValueError("FLAC missing STREAMINFO")
    rate = int.from_bytes(streaminfo[10:13], "big") >> 4
    nch = ((streaminfo[12] >> 1) & 0x07) + 1
    bps = (((streaminfo[12] & 1) << 4) | (streaminfo[13] >> 4)) + 1
    total = (
        (streaminfo[13] & 0x0F) << 32
    ) | int.from_bytes(streaminfo[14:18], "big")
    if rate == 0 or not 4 <= bps <= 24:
        raise ValueError(f"unsupported FLAC rate={rate} bps={bps}")
    if total and total * nch > 1 << 28:
        raise ValueError("FLAC stream exceeds decode ceiling")

    chans: list[list[int]] = [[] for _ in range(nch)]
    decoded = 0
    while pos < len(payload) - 1:
        # frame sync: 14 bits 0b11111111111110
        if payload[pos] != 0xFF or (payload[pos + 1] & 0xFC) != 0xF8:
            raise ValueError("lost FLAC frame sync")
        br = _MsbReader(payload, pos)
        hdr_start = pos
        br.bits(14)
        br.bits(1)  # reserved
        br.bits(1)  # blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        bps_code = br.bits(3)
        br.bits(1)  # reserved
        _utf8_coded(br)
        if bs_code == 0:
            raise ValueError("reserved FLAC block-size code")
        elif bs_code == 6:
            block = br.bits(8) + 1
        elif bs_code == 7:
            block = br.bits(16) + 1
        else:
            block = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            br.bits(8)
        elif sr_code in (13, 14):
            br.bits(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample-rate code")
        crc_calc = 0
        for b in payload[hdr_start : br.byte_pos()]:
            crc_calc = _CRC8_TABLE[crc_calc ^ b]
        if br.bits(8) != crc_calc:
            raise ValueError("FLAC frame header CRC mismatch")

        if ch_code < 8:
            if ch_code + 1 != nch:
                raise ValueError("FLAC frame channel count mismatch")
            subs = [_decode_subframe(br, block, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            if ch_code == 8:  # left-side: left, diff
                left = _decode_subframe(br, block, bps)
                side = _decode_subframe(br, block, bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:  # right-side: diff, right
                side = _decode_subframe(br, block, bps + 1)
                right = _decode_subframe(br, block, bps)
                subs = [right + side, right]
            else:  # mid-side
                mid = _decode_subframe(br, block, bps)
                side = _decode_subframe(br, block, bps + 1)
                left = (2 * mid + (side & 1) + side) >> 1
                subs = [left, left - side]
        else:
            raise ValueError("reserved FLAC channel assignment")
        br.align()
        crc16_calc = 0
        for b in payload[hdr_start : br.byte_pos()]:
            crc16_calc ^= b << 8
            for _ in range(8):
                crc16_calc = (
                    ((crc16_calc << 1) ^ 0x8005) & 0xFFFF
                    if crc16_calc & 0x8000
                    else (crc16_calc << 1) & 0xFFFF
                )
        if br.bits(16) != crc16_calc:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = br.byte_pos()
        for c in range(nch):
            chans[c].extend(int(v) for v in subs[c])
        decoded += block
        if total and decoded >= total:
            break

    n = total or decoded
    arr = np.zeros((n, nch), np.float32)
    scale = float(1 << (bps - 1))
    for c in range(nch):
        vals = np.array(chans[c][:n], np.int64)
        arr[: len(vals), c] = vals.astype(np.float32) / scale
    return arr, rate


# ---------------------------------------------------------------- encoder


class _MsbWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


def _rice_write(bw: _MsbWriter, v: int, k: int) -> None:
    u = (abs(v) << 1) - (1 if v < 0 else 0)  # zigzag: 2|v| - [v<0]
    q = u >> k
    if q > 1 << 20:
        raise ValueError("rice quotient too large; pick a bigger k")
    for _ in range(q):
        bw.write(0, 1)
    bw.write(1, 1)
    if k:
        bw.write(u & ((1 << k) - 1), k)


def encode_flac(
    samples: np.ndarray, rate: int, bps: int = 16, block_size: int = 4096
) -> bytes:
    """(n, channels) float32 in [-1, 1] -> FLAC with FIXED order-2
    predictors and single-partition Rice residuals — the own-pair
    fixture counterpart of decode_flac (bit-exact round-trip at the
    quantized precision)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, nch = samples.shape
    pcm = np.clip(
        np.round(samples.astype(np.float64) * (1 << (bps - 1))),
        -(1 << (bps - 1)),
        (1 << (bps - 1)) - 1,
    ).astype(np.int64)

    out = bytearray(b"fLaC")
    info = bytearray(34)
    info[0:2] = block_size.to_bytes(2, "big")  # min block
    info[2:4] = block_size.to_bytes(2, "big")  # max block
    # min/max frame size: 0 = unknown
    sr_bits = (rate << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4)
    info[10:13] = sr_bits.to_bytes(3, "big")
    info[13] = (((bps - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F)
    info[14:18] = (n & 0xFFFFFFFF).to_bytes(4, "big")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + bytes(info)

    frame_no = 0
    i = 0
    while i < n:
        block = min(block_size, n - i)
        bw = _MsbWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocking
        bw.write(7, 4)  # block size: 16-bit follows
        bw.write(0, 4)  # rate: from STREAMINFO
        bw.write(nch - 1, 4)  # independent channels
        bps_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}.get(bps)
        if bps_code is None:
            raise ValueError(f"unsupported encode bps {bps}")
        bw.write(bps_code, 3)
        bw.write(0, 1)
        # UTF-8 frame number (fits 7 bits for fixture-scale data)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        else:
            bw.write(0xC0 | (frame_no >> 6), 8)
            bw.write(0x80 | (frame_no & 0x3F), 8)
        bw.write(block - 1, 16)
        hdr = bw.flush()
        crc = 0
        for b in hdr:
            crc = _CRC8_TABLE[crc ^ b]
        body = _MsbWriter()
        for c in range(nch):
            ch = pcm[i : i + block, c]
            order = 2 if block > 2 else 0
            body.write(0, 1)
            body.write(8 + order, 6)  # FIXED
            body.write(0, 1)  # no wasted bits
            for j in range(order):
                body.write(int(ch[j]) & ((1 << bps) - 1), bps)
            if order:
                resid = [
                    int(ch[j]) - (2 * int(ch[j - 1]) - int(ch[j - 2]))
                    for j in range(order, block)
                ]
            else:
                resid = [int(v) for v in ch]
            # single Rice partition, k chosen from the mean magnitude
            mean = sum(abs(r) for r in resid) / max(len(resid), 1)
            k = max(0, min(14, int(mean).bit_length()))
            body.write(0, 2)  # 4-bit Rice method
            body.write(0, 4)  # partition order 0
            body.write(k, 4)
            for r in resid:
                _rice_write(body, r, k)
        body.align()
        frame = hdr + bytes([crc]) + body.flush()
        crc16 = 0
        for b in frame:
            crc16 ^= b << 8
            for _ in range(8):
                crc16 = (
                    ((crc16 << 1) ^ 0x8005) & 0xFFFF
                    if crc16 & 0x8000
                    else (crc16 << 1) & 0xFFFF
                )
        out += frame + crc16.to_bytes(2, "big")
        i += block
        frame_no += 1
    return bytes(out)
