"""Minimal legacy .xls (BIFF8) reader — no xlrd dependency.

Covers the reference's O5 spreadsheet path (importer.rb:124-140) for
Excel 97-2003 binaries: the file is an OLE2/CFB compound document whose
"Workbook" stream holds BIFF records. We implement just enough of both
public formats ([MS-CFB], [MS-XLS]) to extract the first worksheet's cell
grid as strings; downstream the normal §2.2 inference applies, matching
the reference's convert-to-CSV-then-infer pipeline.

Supported records: SST/CONTINUE (shared strings, including strings that
span a CONTINUE boundary where the compression flag is re-emitted),
LABELSST, LABEL, NUMBER, RK, MULRK, BOOLERR, BLANK, and FORMULA's cached
numeric/string results. Dates surface as raw serial numbers (the
reference's roo conversion does locale-dependent formatting we do not
reproduce). Everything driver-side: spreadsheet files are single-MB
artifacts; scale lives in the parquet query surface, not here.
"""

from __future__ import annotations

import struct

_CFB_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE


# --------------------------------------------------------------------- CFB


def _read_fat_chain(data: bytes, fat: list[int], start: int, sector_size: int,
                    size: int) -> bytes:
    out = bytearray()
    sec = start
    while sec not in (_ENDOFCHAIN, _FREESECT) and len(out) < size:
        off = sector_size * (sec + 1)
        out += data[off: off + sector_size]
        sec = fat[sec]
    return bytes(out[:size])


def _cfb_stream(data: bytes, name: bytes) -> bytes:
    """Extract a named stream from an OLE2 compound document."""
    if data[:8] != _CFB_MAGIC:
        raise ValueError("not an OLE2 compound document (bad magic)")
    sector_size = 1 << struct.unpack_from("<H", data, 30)[0]
    mini_size = 1 << struct.unpack_from("<H", data, 32)[0]
    n_fat = struct.unpack_from("<I", data, 44)[0]
    dir_start = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    minifat_start = struct.unpack_from("<I", data, 60)[0]
    n_minifat = struct.unpack_from("<I", data, 64)[0]
    difat_start = struct.unpack_from("<I", data, 68)[0]
    n_difat = struct.unpack_from("<I", data, 72)[0]

    # DIFAT: 109 entries in the header, then chained DIFAT sectors whose
    # last u32 points at the next DIFAT sector.
    difat = list(struct.unpack_from("<109I", data, 76))
    sec = difat_start
    for _ in range(n_difat):
        off = sector_size * (sec + 1)
        entries = struct.unpack_from(f"<{sector_size // 4}I", data, off)
        difat += entries[:-1]
        sec = entries[-1]
    fat_sectors = [s for s in difat[:n_fat] if s != _FREESECT]

    fat: list[int] = []
    for s in fat_sectors:
        off = sector_size * (s + 1)
        fat += struct.unpack_from(f"<{sector_size // 4}I", data, off)

    # Directory entries are 128 bytes: UTF-16 name, type, start, size.
    directory = bytearray()
    sec = dir_start
    while sec != _ENDOFCHAIN:
        off = sector_size * (sec + 1)
        directory += data[off: off + sector_size]
        sec = fat[sec]

    root_start = root_size = None
    target_start = target_size = None
    for off in range(0, len(directory), 128):
        entry = directory[off: off + 128]
        if len(entry) < 128:
            break
        name_len = struct.unpack_from("<H", entry, 64)[0]
        ename = bytes(entry[: max(0, name_len - 2)])  # strip trailing NUL
        etype = entry[66]
        start = struct.unpack_from("<I", entry, 116)[0]
        size = struct.unpack_from("<Q", entry, 120)[0]
        if etype == 5:  # root storage: its stream is the mini-stream pool
            root_start, root_size = start, size
        decoded = ename.decode("utf-16-le", errors="replace")
        if decoded == name.decode():
            target_start, target_size = start, size
    if target_start is None:
        raise ValueError(f"stream {name!r} not found in compound document")

    if target_size >= mini_cutoff:
        return _read_fat_chain(data, fat, target_start, sector_size, target_size)

    # Small stream: lives in the mini-stream, chained via the mini FAT.
    minifat: list[int] = []
    sec = minifat_start
    for _ in range(n_minifat):
        off = sector_size * (sec + 1)
        minifat += struct.unpack_from(f"<{sector_size // 4}I", data, off)
        sec = fat[sec]
    ministream = _read_fat_chain(data, fat, root_start, sector_size, root_size)
    out = bytearray()
    sec = target_start
    while sec != _ENDOFCHAIN and len(out) < target_size:
        out += ministream[mini_size * sec: mini_size * (sec + 1)]
        sec = minifat[sec]
    return bytes(out[:target_size])


# -------------------------------------------------------------------- BIFF


def _decode_rk(rk: int) -> float:
    """RK-packed number: bit0 = divide by 100, bit1 = integer payload."""
    div100 = rk & 0x01
    if rk & 0x02:
        v = float(rk >> 2 if rk >> 2 < (1 << 29) else (rk >> 2) - (1 << 30))
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    return v / 100.0 if div100 else v


def _fmt_num(v: float) -> str:
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


class _RecordStream:
    """Iterate BIFF records; exposes a reader that continues transparently
    into CONTINUE records (needed by SST, where a string may be split at
    any point and the compression flag byte is re-emitted after the
    split)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def __iter__(self):
        while self.pos + 4 <= len(self.buf):
            opcode, length = struct.unpack_from("<HH", self.buf, self.pos)
            data_off = self.pos + 4
            self.pos = data_off + length
            yield opcode, self.buf[data_off: data_off + length], data_off

    def continued_reader(self, first_payload: bytes, after: int):
        return _ContinuedReader(self, first_payload, after)


class _ContinuedReader:
    def __init__(self, rs: _RecordStream, payload: bytes, after: int):
        self.rs = rs
        self.chunks = [payload]
        self.ci = 0
        self.off = 0
        self.next_pos = after + len(payload)
        self.at_boundary = False  # True right after crossing into CONTINUE

    def _advance(self) -> None:
        buf = self.rs.buf
        if self.next_pos + 4 > len(buf):
            raise EOFError("SST ran past end of stream")
        opcode, length = struct.unpack_from("<HH", buf, self.next_pos)
        if opcode != 0x003C:  # CONTINUE
            raise EOFError("expected CONTINUE record")
        payload = buf[self.next_pos + 4: self.next_pos + 4 + length]
        self.next_pos += 4 + length
        self.chunks.append(payload)
        self.ci += 1
        self.off = 0
        self.at_boundary = True
        # the outer iterator must skip records we consumed
        self.rs.pos = self.next_pos

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            cur = self.chunks[self.ci]
            if self.off >= len(cur):
                self._advance()
                cur = self.chunks[self.ci]
            take = min(n, len(cur) - self.off)
            out += cur[self.off: self.off + take]
            self.off += take
            n -= take
            if n > 0:
                self.at_boundary = False
        return bytes(out)

    def read_xl_string(self) -> str:
        """XLUnicodeRichExtendedString: cch, flags, [cRun], [cbExt],
        chars (possibly split across CONTINUE with a fresh flags byte),
        rich runs, ext data."""
        cch = struct.unpack("<H", self.read(2))[0]
        flags = self.read(1)[0]
        high = flags & 0x01
        c_run = struct.unpack("<H", self.read(2))[0] if flags & 0x08 else 0
        cb_ext = struct.unpack("<I", self.read(4))[0] if flags & 0x04 else 0
        chars: list[str] = []
        remaining = cch
        while remaining:
            cur = self.chunks[self.ci]
            avail = len(cur) - self.off
            if avail == 0:
                self._advance()
                # a split string re-declares its compression in the first
                # byte of the CONTINUE payload
                high = self.read(1)[0] & 0x01
                continue
            width = 2 if high else 1
            n_here = min(remaining, avail // width)
            if n_here == 0:  # char split across boundary (2-byte chars)
                raw = self.read(width)
                chars.append(raw.decode("utf-16-le" if high else "latin-1",
                                        errors="replace"))
                remaining -= 1
                continue
            raw = self.read(n_here * width)
            chars.append(raw.decode("utf-16-le" if high else "latin-1",
                                    errors="replace"))
            remaining -= n_here
        self.read(4 * c_run)
        self.read(cb_ext)
        return "".join(chars)


def _parse_sst(rs: _RecordStream, payload: bytes, data_off: int) -> list[str]:
    rd = rs.continued_reader(payload, data_off)
    rd.read(4)  # total refs
    n_unique = struct.unpack("<I", rd.read(4))[0]
    return [rd.read_xl_string() for _ in range(n_unique)]


def _short_string(data: bytes, off: int) -> str:
    """BIFF8 unlengthened-record string (LABEL body): u16 cch + flags."""
    cch, flags = struct.unpack_from("<HB", data, off)
    if flags & 0x01:
        return data[off + 3: off + 3 + 2 * cch].decode("utf-16-le", "replace")
    return data[off + 3: off + 3 + cch].decode("latin-1", "replace")


def read_xls_rows(path: str) -> list[list[str]]:
    """Parse the first worksheet of a BIFF8 .xls into a dense string grid
    (same contract as the XLSX/ODS stdlib readers in excel.py)."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        stream = _cfb_stream(data, b"Workbook")
    except ValueError:
        stream = _cfb_stream(data, b"Book")  # BIFF5/7 naming

    rs = _RecordStream(stream)
    sst: list[str] = []
    sheet_offsets: list[int] = []
    cells: dict[tuple[int, int], str] = {}
    in_sheet = False
    bof_depth = 0
    pending_formula: tuple[int, int] | None = None

    it = iter(rs)
    for opcode, payload, data_off in it:
        if opcode == 0x0809:  # BOF
            bof_depth += 1
            if sheet_offsets and data_off - 4 >= sheet_offsets[0]:
                in_sheet = True
        elif opcode == 0x000A:  # EOF
            bof_depth -= 1
            if in_sheet:
                break  # first worksheet done
        elif opcode == 0x00FC:  # SST (workbook globals)
            sst = _parse_sst(rs, payload, data_off)
        elif opcode == 0x0085:  # BOUNDSHEET
            sheet_offsets.append(struct.unpack_from("<I", payload, 0)[0])
        elif not in_sheet:
            continue
        elif opcode == 0x00FD:  # LABELSST
            row, col, _ixfe, isst = struct.unpack_from("<HHHI", payload, 0)
            cells[(row, col)] = sst[isst] if isst < len(sst) else ""
        elif opcode == 0x0204:  # LABEL (inline string)
            row, col = struct.unpack_from("<HH", payload, 0)
            cells[(row, col)] = _short_string(payload, 6)
        elif opcode == 0x0203:  # NUMBER
            row, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
            cells[(row, col)] = _fmt_num(struct.unpack_from("<d", payload, 6)[0])
        elif opcode == 0x027E:  # RK
            row, col, _ixfe, rk = struct.unpack_from("<HHHI", payload, 0)
            cells[(row, col)] = _fmt_num(_decode_rk(rk))
        elif opcode == 0x00BD:  # MULRK
            row, col_first = struct.unpack_from("<HH", payload, 0)
            n = (len(payload) - 6) // 6
            for i in range(n):
                rk = struct.unpack_from("<I", payload, 4 + 6 * i + 2)[0]
                cells[(row, col_first + i)] = _fmt_num(_decode_rk(rk))
        elif opcode == 0x0205:  # BOOLERR
            row, col, _ixfe, val, is_err = struct.unpack_from("<HHHBB", payload, 0)
            cells[(row, col)] = "" if is_err else ("TRUE" if val else "FALSE")
        elif opcode == 0x0006:  # FORMULA (cached result)
            row, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
            result = payload[6:14]
            if result[6:8] == b"\xff\xff":
                kind = result[0]
                if kind == 0:  # string result arrives in a STRING record
                    pending_formula = (row, col)
                elif kind == 1:
                    cells[(row, col)] = "TRUE" if result[2] else "FALSE"
                else:
                    cells[(row, col)] = ""
            else:
                cells[(row, col)] = _fmt_num(struct.unpack("<d", result)[0])
        elif opcode == 0x0207 and pending_formula is not None:  # STRING
            rd = rs.continued_reader(payload, data_off)
            cells[pending_formula] = rd.read_xl_string()
            pending_formula = None

    if not cells:
        return []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    return [
        [cells.get((r, c), "") for c in range(n_cols)] for r in range(n_rows)
    ]
