"""BIFF8 .xls reader tests against a hand-assembled fixture.

The fixture is built byte-by-byte from the public [MS-CFB]/[MS-XLS]
layouts (NOT with any xls library, so the reader is checked against the
spec, not against a sibling implementation): a 512-byte-sector compound
document with one FAT sector, one directory sector, and a Workbook stream
padded past the 4096-byte mini-stream cutoff. The SST deliberately splits
one shared string across a CONTINUE record — the corner that breaks naive
readers — and the sheet exercises LABELSST, LABEL, NUMBER, RK (both
packings), MULRK, BOOLERR, and a FORMULA cached result.
"""

import struct

import pytest

from cartodb_importer_spark.readers.xls_biff import read_xls_rows

ENDOFCHAIN = 0xFFFFFFFE
FREESECT = 0xFFFFFFFF
FATSECT = 0xFFFFFFFD


def _rec(opcode: int, payload: bytes) -> bytes:
    return struct.pack("<HH", opcode, len(payload)) + payload


def _sst_string(s: str) -> bytes:
    return struct.pack("<HB", len(s), 0) + s.encode("latin-1")


def _labelsst(row: int, col: int, isst: int) -> bytes:
    return _rec(0x00FD, struct.pack("<HHHI", row, col, 0, isst))


def _build_workbook_stream() -> bytes:
    # ---- globals section
    bof_globals = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0005, 0, 0, 0, 0))

    # SST: 4 unique strings; the last ("LONGCITYNAME", 12 chars) is split
    # after 4 chars, the rest carried by a CONTINUE whose first byte
    # re-declares the compression flag.
    head = struct.pack("<II", 4, 4)
    s_complete = b"".join(_sst_string(s) for s in ("name", "city", "val"))
    long_s = "LONGCITYNAME"
    split_at = 4
    sst_payload = (
        head
        + s_complete
        + struct.pack("<HB", len(long_s), 0)
        + long_s[:split_at].encode()
    )
    cont_payload = b"\x00" + long_s[split_at:].encode()
    sst = _rec(0x00FC, sst_payload) + _rec(0x003C, cont_payload)

    eof = _rec(0x000A, b"")

    # ---- worksheet section
    rk_int_42 = (42 << 2) | 0x02
    rk_div100_250 = (250 << 2) | 0x02 | 0x01  # 250/100 = 2.5
    # RK float packing: top 30 bits of the IEEE double for 1.5
    rk_float_1_5 = struct.unpack("<Q", struct.pack("<d", 1.5))[0] >> 32 & 0xFFFFFFFC

    sheet_records = (
        _labelsst(0, 0, 0)
        + _labelsst(0, 1, 1)
        + _labelsst(0, 2, 2)
        + _labelsst(1, 0, 3)
        + _rec(0x027E, struct.pack("<HHHI", 1, 1, 0, rk_int_42))
        + _rec(0x0203, struct.pack("<HHHd", 1, 2, 0, 3.14))
        + _rec(
            0x0204,
            struct.pack("<HHH", 2, 0, 0) + struct.pack("<HB", 6, 0) + b"inline",
        )
        + _rec(
            0x00BD,
            struct.pack("<HH", 2, 1)
            + struct.pack("<HI", 0, rk_div100_250)
            + struct.pack("<HI", 0, rk_float_1_5)
            + struct.pack("<H", 2),
        )
        + _rec(0x0205, struct.pack("<HHHBB", 3, 0, 0, 1, 0))
        + _rec(
            0x0006,
            struct.pack("<HHH", 3, 1, 0)
            + struct.pack("<d", 7.0)
            + struct.pack("<HI H", 0, 0, 0),
        )
    )
    bof_sheet = _rec(0x0809, struct.pack("<HHHHII", 0x0600, 0x0010, 0, 0, 0, 0))
    sheet = bof_sheet + sheet_records + eof

    # BOUNDSHEET needs the sheet BOF's offset within the stream; compute
    # with the real globals length (two passes).
    name = b"Sheet1"
    bs_payload = struct.pack("<IBB", 0, 0, 0) + struct.pack(
        "<BB", len(name), 0
    ) + name
    boundsheet = _rec(0x0085, bs_payload)
    globals_len = len(bof_globals) + len(boundsheet) + len(sst) + len(eof)
    bs_payload = struct.pack("<IBB", globals_len, 0, 0) + struct.pack(
        "<BB", len(name), 0
    ) + name
    boundsheet = _rec(0x0085, bs_payload)

    stream = bof_globals + boundsheet + sst + eof + sheet
    # pad past the 4096 mini-stream cutoff so the stream lives in the
    # regular FAT (the generator stays simple; trailing zeros sit after
    # the sheet EOF and are never parsed)
    stream += b"\x00" * max(0, 4608 - len(stream))
    return stream


def _dir_entry(name: str, etype: int, start: int, size: int) -> bytes:
    raw = name.encode("utf-16-le") + b"\x00\x00"
    entry = bytearray(128)
    entry[: len(raw)] = raw
    struct.pack_into("<H", entry, 64, len(raw))
    entry[66] = etype
    entry[67] = 1  # black node (unchecked by the reader)
    struct.pack_into("<i", entry, 68, -1)  # left sibling
    struct.pack_into("<i", entry, 72, -1)  # right sibling
    struct.pack_into("<i", entry, 76, -1)  # child
    struct.pack_into("<I", entry, 116, start)
    struct.pack_into("<Q", entry, 120, size)
    return bytes(entry)


def build_xls(path: str) -> None:
    stream = _build_workbook_stream()
    n_stream_sectors = (len(stream) + 511) // 512
    stream += b"\x00" * (512 * n_stream_sectors - len(stream))

    # sector 0: FAT; sector 1: directory; sectors 2..: workbook stream
    fat = [FREESECT] * 128
    fat[0] = FATSECT
    fat[1] = ENDOFCHAIN
    for i in range(n_stream_sectors):
        fat[2 + i] = 2 + i + 1 if i < n_stream_sectors - 1 else ENDOFCHAIN
    fat_sector = struct.pack("<128I", *fat)

    directory = (
        _dir_entry("Root Entry", 5, ENDOFCHAIN, 0)
        + _dir_entry("Workbook", 2, 2, len(stream))
        + bytes(128) * 2
    )

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major version 3
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)  # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)  # 64-byte minisectors
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # directory at sector 1
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, ENDOFCHAIN)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, ENDOFCHAIN)  # no extra DIFAT
    struct.pack_into("<I", header, 72, 0)
    difat = [0] + [FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)

    with open(path, "wb") as f:
        f.write(bytes(header) + fat_sector + directory + bytes(256) + stream)


@pytest.fixture()
def xls_path(tmp_path):
    p = tmp_path / "fixture.xls"
    build_xls(str(p))
    return str(p)


def test_read_xls_grid(xls_path):
    rows = read_xls_rows(xls_path)
    assert rows == [
        ["name", "city", "val"],
        ["LONGCITYNAME", "42", "3.14"],
        ["inline", "2.5", "1.5"],
        ["TRUE", "7", ""],
    ]


def test_read_excel_entry_point(spark, xls_path):
    from cartodb_importer_spark.readers.excel import read_excel

    df, meta = read_excel(spark, xls_path)
    assert df.columns == ["name", "city", "val"]
    assert df.count() == 3
    # inference: 'val' = 3.14/1.5/"" -> float; 'city' = 42/2.5/7 -> float;
    # 'name' = LONGCITYNAME/inline/TRUE -> varchar
    assert meta["inferred_types"]["val"] == "float"
    assert meta["inferred_types"]["city"] == "float"
    assert meta["inferred_types"]["name"] == "varchar"
