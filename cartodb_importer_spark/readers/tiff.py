"""Minimal pure-Python classic TIFF/GeoTIFF reader.

Covers the subset the raster import path (O18, importer.rb:406-459) needs
when rasterio/GDAL is absent: classic AND BigTIFF containers, either byte
order, strip- OR tile-organized, integer or float samples, band 1, with
the compression schemes that need no native codec:

* 1     — uncompressed
* 5     — TIFF-LZW (MSB-first variable-width codes, early change)
* 8 / 32946 — DEFLATE (stdlib zlib)
* 32773 — PackBits RLE

plus Predictor=2 (horizontal differencing, the usual companion of LZW/
DEFLATE) and Predictor=3 (TechNote 3 floating-point byte-plane
differencing). GeoTIFF georeferencing is read from ModelPixelScale/
ModelTiepoint and the EPSG code from the GeoKey directory
(GeographicType 2048 / ProjectedCSType 3072 keys).

Anything outside that subset (JPEG/CCITT compression) raises ValueError
so the caller can fall back to the stub — those are where GDAL genuinely
earns its dependency.
"""

from __future__ import annotations

import struct

import numpy as np

# field type -> (struct code, size)
_TYPES = {
    1: ("B", 1),   # BYTE
    2: ("s", 1),   # ASCII
    3: ("H", 2),   # SHORT
    4: ("I", 4),   # LONG
    5: ("II", 8),  # RATIONAL
    8: ("h", 2),   # SSHORT
    9: ("i", 4),   # SLONG
    11: ("f", 4),  # FLOAT
    12: ("d", 8),  # DOUBLE
    16: ("Q", 8),  # LONG8 (BigTIFF)
    17: ("q", 8),  # SLONG8 (BigTIFF)
    18: ("Q", 8),  # IFD8 (BigTIFF)
}


def _read_ifd_values(
    data: bytes, bo: str, ftype: int, count: int, raw: bytes, inline: int
):
    """``raw`` is the entry's value field (4 bytes classic, 8 BigTIFF);
    larger payloads live at the offset it encodes."""
    code, size = _TYPES.get(ftype, (None, None))
    if code is None:
        return None
    total = size * count
    buf = raw[:total] if total <= inline else None
    if buf is None:
        offset = struct.unpack(bo + ("I" if inline == 4 else "Q"), raw)[0]
        buf = data[offset : offset + total]
    if ftype == 2:
        return buf.rstrip(b"\x00").decode("ascii", "replace")
    if ftype == 5:
        vals = struct.unpack(bo + "II" * count, buf)
        return [vals[i] / vals[i + 1] if vals[i + 1] else 0.0 for i in range(0, len(vals), 2)]
    return list(struct.unpack(bo + code * count, buf[:total]))


def parse_tiff(data: bytes) -> dict:
    """Parse the first IFD of a classic OR BigTIFF file into a
    {tag: values} dict. BigTIFF (magic 43): 8-byte IFD offsets, 8-entry
    counts, 20-byte entries with an 8-byte inline value field, and the
    LONG8/SLONG8/IFD8 field types — same tags otherwise."""
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order mark)")
    magic = struct.unpack_from(bo + "H", data, 2)[0]
    tags: dict[int, object] = {"__bo__": bo}
    if magic == 43:
        offsize, reserved = struct.unpack_from(bo + "HH", data, 4)
        if offsize != 8 or reserved != 0:
            raise ValueError("malformed BigTIFF header")
        ifd_off = struct.unpack_from(bo + "Q", data, 8)[0]
        n = struct.unpack_from(bo + "Q", data, ifd_off)[0]
        for i in range(n):
            base = ifd_off + 8 + i * 20
            tag, ftype = struct.unpack_from(bo + "HH", data, base)
            count = struct.unpack_from(bo + "Q", data, base + 4)[0]
            tags[tag] = _read_ifd_values(
                data, bo, ftype, count, data[base + 12 : base + 20], 8
            )
        return tags
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    ifd_off = struct.unpack_from(bo + "I", data, 4)[0]
    n = struct.unpack_from(bo + "H", data, ifd_off)[0]
    for i in range(n):
        base = ifd_off + 2 + i * 12
        tag, ftype, count = struct.unpack_from(bo + "HHI", data, base)
        tags[tag] = _read_ifd_values(
            data, bo, ftype, count, data[base + 8 : base + 12], 4
        )
    return tags


def _dtype(bits: int, sample_format: int, bo: str):
    kind = {1: "u", 2: "i", 3: "f"}.get(sample_format, "u")
    return np.dtype(f"{bo}{kind}{bits // 8}")


def _packbits_decode(data: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 §9): n<128 -> copy n+1 literals; n>128 ->
    repeat next byte 257-n times; 128 -> noop."""
    out = bytearray()
    i = 0
    ln = len(data)
    while i < ln:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
    return bytes(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, 9->12 bit
    codes, ClearCode=256, EOI=257, 'early change' width bump at
    next_code == 2^width - 1."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    width = 9

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    reset()
    prev: bytes | None = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + width <= total_bits:
        byte_idx = bitpos >> 3
        chunk = int.from_bytes(data[byte_idx : byte_idx + 3].ljust(3, b"\0"), "big")
        code = (chunk >> (24 - width - (bitpos & 7))) & ((1 << width) - 1)
        bitpos += width
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            prev = None
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _decompress_strip(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression in (8, 32946):  # DEFLATE / AdobeDeflate
        import zlib

        return zlib.decompress(raw)
    if compression == 32773:
        return _packbits_decode(raw)
    if compression == 5:
        return _lzw_decode(raw)
    raise ValueError(f"unsupported TIFF compression {compression}")


def _undo_predictor(block: np.ndarray, bits: int, spp: int, dt) -> np.ndarray:
    """Undo TIFF predictor 2 (horizontal differencing): each sample stores
    the delta to the same channel of the previous pixel; a wrapping
    cumulative sum per row restores the values."""
    if dt.kind == "f":
        raise ValueError("predictor 2 with float samples unsupported")
    wide = block.astype(np.int64).cumsum(
        axis=1 if spp > 1 else -1, dtype=np.int64
    )
    return (wide & ((1 << bits) - 1)).astype(dt)


def _undo_float_predictor(
    raw: bytes, nrows: int, rowsamples: int, itemsize: int, bo: str
) -> np.ndarray:
    """Undo TIFF predictor 3 (TechNote 3 floating-point prediction): each
    row's samples are split into big-endian byte planes (all byte-0s, then
    all byte-1s, ...) and horizontally byte-differenced. Reverse: wrapping
    byte cumsum per row, then reassemble planes into big-endian floats."""
    rowbytes = rowsamples * itemsize
    arr = np.frombuffer(raw, np.uint8, count=nrows * rowbytes).reshape(
        nrows, rowbytes
    )
    arr = (arr.astype(np.int64).cumsum(axis=1) & 0xFF).astype(np.uint8)
    planes = arr.reshape(nrows, itemsize, rowsamples)
    be = np.transpose(planes, (0, 2, 1)).reshape(nrows, rowbytes)
    floats = np.frombuffer(
        np.ascontiguousarray(be).tobytes(), dtype=np.dtype(f">f{itemsize}")
    ).reshape(nrows, rowsamples)
    return floats.astype(np.dtype(f"{bo}f{itemsize}"))


def decode_tiff(data: bytes) -> tuple[np.ndarray, dict]:
    """Strip- OR tile-organized TIFF -> (band-1 2D array, georef metadata).

    metadata keys: srid (int, 0 if absent), pixel_scale (x, y) or None,
    tiepoint (i, j, k, x, y, z) or None, samples_per_pixel.
    """
    t = parse_tiff(data)
    bo = t["__bo__"]
    compression = int(t.get(259, [1])[0])
    predictor = int(t.get(317, [1])[0])
    if predictor not in (1, 2, 3):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    width = int(t[256][0])
    height = int(t[257][0])
    spp = int(t.get(277, [1])[0])
    bits = int(t.get(258, [8])[0])
    fmt = int(t.get(339, [1])[0])
    dt = _dtype(bits, fmt, bo)
    if predictor == 3 and dt.kind != "f":
        raise ValueError("predictor 3 requires float samples")

    if 322 in t or 324 in t:
        # Tiled layout (tags 322/323/324/325): fixed-size tiles in
        # row-major order, right/bottom edge tiles padded to full size.
        tw = int(t[322][0])
        th = int(t[323][0])
        toffsets = t.get(324)
        tcounts = t.get(325)
        if toffsets is None:
            raise ValueError("tiled TIFF missing TileOffsets")
        if compression != 1 and tcounts is None:
            raise ValueError("compressed tiled TIFF missing TileByteCounts")
        across = (width + tw - 1) // tw
        down = (height + th - 1) // th
        tile_bytes = th * tw * spp * dt.itemsize
        shape = (down * th, across * tw, spp) if spp > 1 else (down * th, across * tw)
        img = np.zeros(shape, dtype=dt)
        for ti, off in enumerate(toffsets):
            if compression == 1:
                nbytes = tcounts[ti] if tcounts else tile_bytes
                raw = data[off : off + nbytes]
            else:
                raw = _decompress_strip(
                    data[off : off + tcounts[ti]], compression
                )
            if predictor == 3:
                tile = _undo_float_predictor(
                    raw, th, tw * spp, dt.itemsize, bo
                )
                tile = tile.reshape(th, tw, spp) if spp > 1 else tile
            else:
                tile = np.frombuffer(raw, dtype=dt, count=th * tw * spp)
                tile = (
                    tile.reshape(th, tw, spp)
                    if spp > 1
                    else tile.reshape(th, tw)
                )
                if predictor == 2:
                    tile = _undo_predictor(tile, bits, spp, dt)
            r, c = (ti // across) * th, (ti % across) * tw
            img[r : r + th, c : c + tw] = tile
        img = img[:height, :width]
    else:
        offsets = t.get(273)
        counts = t.get(279)
        if offsets is None:
            raise ValueError("TIFF missing StripOffsets")
        if compression != 1 and counts is None:
            raise ValueError("compressed TIFF missing StripByteCounts")
        rows_per_strip = int(t.get(278, [height])[0])
        row_bytes = width * spp * dt.itemsize

        parts = []
        for si, off in enumerate(offsets):
            nrows = min(rows_per_strip, height - si * rows_per_strip)
            if compression == 1:
                nbytes = counts[si] if counts else nrows * row_bytes
                raw = data[off : off + nbytes]
            else:
                raw = _decompress_strip(
                    data[off : off + counts[si]], compression
                )
            if predictor == 3:
                strip = _undo_float_predictor(
                    raw, nrows, width * spp, dt.itemsize, bo
                )
                strip = strip.reshape(nrows, width, spp) if spp > 1 else strip
            else:
                strip = np.frombuffer(raw, dtype=dt, count=nrows * width * spp)
                strip = (
                    strip.reshape(nrows, width, spp)
                    if spp > 1
                    else strip.reshape(nrows, width)
                )
                if predictor == 2:
                    strip = _undo_predictor(strip, bits, spp, dt)
            parts.append(strip)
        img = np.concatenate(parts, axis=0)
    band1 = img[..., 0] if spp > 1 else img

    srid = 0
    geokeys = t.get(34735)
    if geokeys:
        # GeoKeyDirectory: header (4 shorts) then 4-short key entries;
        # value is inline when tag-location == 0
        for k in range(4, len(geokeys), 4):
            key_id, tag_loc, _cnt, val = geokeys[k : k + 4]
            if key_id in (2048, 3072) and tag_loc == 0:
                srid = int(val)
    meta = {
        "srid": srid,
        "pixel_scale": tuple(t[33550][:2]) if 33550 in t else None,
        "tiepoint": tuple(t[33922][:6]) if 33922 in t else None,
        "samples_per_pixel": spp,
    }
    return band1, meta


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (fixture counterpart of _lzw_decode)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    buf = 0
    nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR)
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # the decoder's table is one entry BEHIND the encoder's when it
        # reads each code, so the encoder bumps one code later than the
        # decoder's len(table) == 2^width - 1 early-change point
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4093:  # table nearly full -> restart
            emit(CLEAR)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(EOI)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Literal-only PackBits (valid per spec; fixture use, not optimal)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


_COMPRESSION_CODES = {None: 1, "deflate": 8, "packbits": 32773, "lzw": 5}


def encode_tiff_gray(
    band: np.ndarray,
    srid: int = 0,
    pixel_scale: tuple[float, float] | None = None,
    tiepoint: tuple[float, ...] | None = None,
    compression: str | None = None,
    predictor: int = 1,
) -> bytes:
    """(H, W) array -> minimal little-endian GeoTIFF — the fixture-builder
    counterpart of decode_tiff (single strip, band 1; optional deflate/
    packbits/lzw compression and horizontal-differencing predictor)."""
    band = np.ascontiguousarray(band)
    h, w = band.shape
    kind = {"u": 1, "i": 2, "f": 3}[band.dtype.kind]
    bits = band.dtype.itemsize * 8
    comp_code = _COMPRESSION_CODES[compression]
    if predictor == 3:
        # TechNote 3 float prediction: big-endian byte planes per row,
        # then horizontal byte differencing
        if band.dtype.kind != "f":
            raise ValueError("predictor 3 requires float samples")
        isz = band.dtype.itemsize
        be = np.frombuffer(
            band.astype(np.dtype(f">f{isz}")).tobytes(), np.uint8
        ).reshape(h, w, isz)
        planes = np.transpose(be, (0, 2, 1)).reshape(h, w * isz)
        diffed = np.concatenate(
            [
                planes[:, :1].astype(np.int16),
                np.diff(planes.astype(np.int16), axis=1) & 0xFF,
            ],
            axis=1,
        ).astype(np.uint8)
        pixels = diffed.tobytes()
    else:
        stored = band
        if predictor == 2:
            stored = np.concatenate(
                [band[:, :1], np.diff(band, axis=1)], axis=1
            )  # wraps in-dtype
        pixels = stored.astype(stored.dtype.newbyteorder("<")).tobytes()
    if compression == "deflate":
        import zlib

        pixels = zlib.compress(pixels)
    elif compression == "packbits":
        pixels = _packbits_encode(pixels)
    elif compression == "lzw":
        pixels = _lzw_encode(pixels)

    entries = []  # (tag, type, count, value or payload-bytes placeholder)
    extra: list[bytes] = []

    def entry(tag, ftype, count, inline=None, payload=None):
        entries.append([tag, ftype, count, inline, payload])

    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    entry(258, 3, 1, bits)
    entry(259, 3, 1, comp_code)
    entry(262, 3, 1, 1)       # BlackIsZero
    if predictor in (2, 3):
        entry(317, 3, 1, predictor)
    entry(273, 4, 1, None)    # strip offset (patched below)
    entry(277, 3, 1, 1)
    entry(278, 4, 1, h)
    entry(279, 4, 1, len(pixels))
    entry(339, 3, 1, kind)
    if pixel_scale:
        entry(33550, 12, 3, None, struct.pack("<3d", pixel_scale[0], pixel_scale[1], 0.0))
    if tiepoint:
        tp = tuple(tiepoint) + (0.0,) * (6 - len(tiepoint))
        entry(33922, 12, 6, None, struct.pack("<6d", *tp))
    if srid:
        key_id = 2048 if srid < 32767 and srid not in range(20000, 32761) else 3072
        # 1.1.0 revision header + one inline key
        geod = struct.pack("<8H", 1, 1, 0, 1, key_id, 0, 1, srid)
        entry(34735, 3, 8, None, geod)

    entries.sort(key=lambda e: e[0])
    ifd_off = 8
    ifd_size = 2 + len(entries) * 12 + 4
    heap_off = ifd_off + ifd_size
    # lay out out-of-line payloads
    for e in entries:
        if e[4] is not None:
            extra.append(e[4])
            e[3] = heap_off
            heap_off += len(e[4])
    strip_off = heap_off
    for e in entries:
        if e[0] == 273:
            e[3] = strip_off

    out = [struct.pack("<2sHI", b"II", 42, ifd_off), struct.pack("<H", len(entries))]
    for tag, ftype, count, val, payload in entries:
        if payload is not None or ftype == 4 or (ftype == 12):
            raw = struct.pack("<I", val)
        elif ftype == 3:
            raw = struct.pack("<HH", val, 0)
        else:
            raw = struct.pack("<I", val)
        out.append(struct.pack("<HHI", tag, ftype, count) + raw)
    out.append(struct.pack("<I", 0))  # next-IFD pointer
    out.extend(extra)
    out.append(pixels)
    return b"".join(out)


def encode_tiff_gray_tiled(
    band: np.ndarray,
    tile: tuple[int, int] = (16, 16),
    compression: str | None = None,
    predictor: int = 1,
    srid: int = 0,
) -> bytes:
    """(H, W) array -> minimal little-endian tiled GeoTIFF (tags
    322/323/324/325) — the fixture-builder counterpart of decode_tiff's
    tiled branch. Edge tiles are zero-padded to full tile size per spec."""
    band = np.ascontiguousarray(band)
    h, w = band.shape
    th, tw = tile[1], tile[0]
    kind = {"u": 1, "i": 2, "f": 3}[band.dtype.kind]
    bits = band.dtype.itemsize * 8
    comp_code = _COMPRESSION_CODES[compression]

    across = (w + tw - 1) // tw
    down = (h + th - 1) // th
    padded = np.zeros((down * th, across * tw), dtype=band.dtype)
    padded[:h, :w] = band
    tiles: list[bytes] = []
    for r in range(down):
        for c in range(across):
            blk = padded[r * th : (r + 1) * th, c * tw : (c + 1) * tw]
            if predictor == 2:
                blk = np.concatenate(
                    [blk[:, :1], np.diff(blk, axis=1)], axis=1
                )
            raw = blk.astype(blk.dtype.newbyteorder("<")).tobytes()
            if compression == "deflate":
                import zlib

                raw = zlib.compress(raw)
            elif compression == "packbits":
                raw = _packbits_encode(raw)
            elif compression == "lzw":
                raw = _lzw_encode(raw)
            tiles.append(raw)

    n = len(tiles)
    entries: list[list] = []

    def entry(tag, ftype, count, inline=None, payload=None):
        entries.append([tag, ftype, count, inline, payload])

    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    entry(258, 3, 1, bits)
    entry(259, 3, 1, comp_code)
    entry(262, 3, 1, 1)
    entry(277, 3, 1, 1)
    if predictor == 2:
        entry(317, 3, 1, 2)
    entry(322, 4, 1, tw)
    entry(323, 4, 1, th)
    entry(324, 4, n, None, b"\x00" * (4 * n))  # offsets patched below
    entry(325, 4, n, None, struct.pack(f"<{n}I", *[len(b) for b in tiles]))
    entry(339, 3, 1, kind)
    if srid:
        geod = struct.pack("<8H", 1, 1, 0, 1, 2048, 0, 1, srid)
        entry(34735, 3, 8, None, geod)

    entries.sort(key=lambda e: e[0])
    ifd_off = 8
    heap_off = ifd_off + 2 + len(entries) * 12 + 4
    for e in entries:
        if e[4] is not None:
            e[3] = heap_off
            heap_off += len(e[4])
    # tile data begins after the payload heap; patch the offsets payload
    data_off = heap_off
    offs = []
    for b in tiles:
        offs.append(data_off)
        data_off += len(b)
    for e in entries:
        if e[0] == 324:
            e[4] = struct.pack(f"<{n}I", *offs)

    out = [struct.pack("<2sHI", b"II", 42, ifd_off), struct.pack("<H", len(entries))]
    for tag, ftype, count, val, payload in entries:
        if payload is not None or ftype == 4:
            raw = struct.pack("<I", val)
        elif ftype == 3:
            raw = struct.pack("<HH", val, 0)
        else:
            raw = struct.pack("<I", val)
        out.append(struct.pack("<HHI", tag, ftype, count) + raw)
    out.append(struct.pack("<I", 0))
    out.extend(e[4] for e in entries if e[4] is not None)
    out.extend(tiles)
    return b"".join(out)


def encode_bigtiff_gray(band: np.ndarray, srid: int = 0) -> bytes:
    """(H, W) array -> minimal little-endian single-strip BigTIFF (magic
    43, 20-byte IFD entries, LONG8 offsets) — fixture counterpart of
    parse_tiff's BigTIFF branch."""
    band = np.ascontiguousarray(band)
    h, w = band.shape
    kind = {"u": 1, "i": 2, "f": 3}[band.dtype.kind]
    bits = band.dtype.itemsize * 8
    pixels = band.astype(band.dtype.newbyteorder("<")).tobytes()

    entries: list[tuple[int, int, int, int | None, bytes | None]] = []

    def entry(tag, ftype, count, inline=None, payload=None):
        entries.append([tag, ftype, count, inline, payload])

    entry(256, 4, 1, w)
    entry(257, 4, 1, h)
    entry(258, 3, 1, bits)
    entry(259, 3, 1, 1)
    entry(262, 3, 1, 1)
    entry(273, 16, 1, None)  # strip offset, patched below
    entry(277, 3, 1, 1)
    entry(278, 4, 1, h)
    entry(279, 16, 1, len(pixels))
    entry(339, 3, 1, kind)
    if srid:
        geod = struct.pack("<8H", 1, 1, 0, 1, 2048, 0, 1, srid)
        entry(34735, 3, 8, None, geod)

    entries.sort(key=lambda e: e[0])
    ifd_off = 16
    heap_off = ifd_off + 8 + len(entries) * 20 + 8
    extra: list[bytes] = []
    for e in entries:
        if e[4] is not None:
            extra.append(e[4])
            e[3] = heap_off
            heap_off += len(e[4])
    for e in entries:
        if e[0] == 273:
            e[3] = heap_off  # pixel data starts after the payload heap

    out = [struct.pack("<2sHHHQ", b"II", 43, 8, 0, ifd_off)]
    out.append(struct.pack("<Q", len(entries)))
    for tag, ftype, count, val, payload in entries:
        if ftype == 3 and payload is None:
            raw = struct.pack("<H6x", val)
        else:
            raw = struct.pack("<Q", val)
        out.append(struct.pack("<HHQ", tag, ftype, count) + raw)
    out.append(struct.pack("<Q", 0))
    out.extend(extra)
    out.append(pixels)
    return b"".join(out)
