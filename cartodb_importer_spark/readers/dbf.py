"""dBase (DBF) binary reader/writer — a fresh Python-3 implementation of the
record semantics the reference delegates to misc/dbfUtils.py:

* reader (dbfUtils.py:3-56): header-driven field specs (name, type, size,
  deci); deleted records ('*' flag) skipped; type decoding C=char,
  N=numeric (Decimal when deci>0, empty -> 0), D=date, L=logical T/F/?,
  M=memo passthrough.
* writer (dbfUtils.py:59-113): version-3 header, 32-byte field descriptors,
  0x0D terminator, space deletion flags, 0x1A EOF.

Used by the SHP reader (attribute table) and the SHP exporter. Driver-side
by design: individual DBF sidecars are small; the 100 TB path is parquet.
"""

from __future__ import annotations

import datetime
import struct
from decimal import Decimal
from typing import BinaryIO, Iterator


def read_dbf(f: BinaryIO) -> Iterator[list]:
    """Yield field names, then (type, size, deci) specs, then records —
    the same iteration contract as the reference helper."""
    numrec, lenheader = struct.unpack("<xxxxLH22x", f.read(32))
    numfields = (lenheader - 33) // 32

    fields: list[tuple[str, str, int, int]] = []
    for _ in range(numfields):
        name_b, typ_b, size, deci = struct.unpack("<11sc4xBB14x", f.read(32))
        name = name_b.replace(b"\x00", b"").decode("latin-1")
        fields.append((name, typ_b.decode("ascii"), size, deci))
    yield [fld[0] for fld in fields]
    yield [tuple(fld[1:]) for fld in fields]

    terminator = f.read(1)
    if terminator != b"\r":
        raise ValueError(f"bad DBF header terminator: {terminator!r}")

    rec_fields = [("DeletionFlag", "C", 1, 0)] + fields
    fmt = "".join(f"{size}s" for _, _, size, _ in rec_fields)
    fmtsiz = struct.calcsize(fmt)
    for _ in range(numrec):
        record = struct.unpack(fmt, f.read(fmtsiz))
        if record[0] != b" ":
            continue  # deleted record (dbfUtils.py:36-37)
        result = []
        for (name, typ, size, deci), raw in zip(rec_fields, record):
            if name == "DeletionFlag":
                continue
            if typ == "N":
                text = raw.replace(b"\x00", b"").lstrip().decode("latin-1")
                if text == "":
                    value: object = 0  # dbfUtils.py:44-45
                elif deci:
                    # real-world DBFs carry garbage in N fields (e.g. the
                    # simon-search-spain fixture); NULL them rather than
                    # abort the import (shp2pgsql tolerance)
                    try:
                        value = Decimal(text)
                    except ArithmeticError:
                        value = None
                else:
                    try:
                        value = int(text)
                    except ValueError:
                        value = None
            elif typ == "D":
                text = raw.decode("latin-1")
                try:
                    value = datetime.date(
                        int(text[:4]), int(text[4:6]), int(text[6:8])
                    )
                except ValueError:
                    value = None
            elif typ == "L":
                ch = raw.decode("latin-1")
                value = (
                    "T" if ch in "YyTt" else "F" if ch in "NnFf" else "?"
                )  # dbfUtils.py:53-54
            else:  # C / M: character data
                value = raw.decode("latin-1").rstrip("\x00").rstrip()
            result.append(value)
        yield result


def write_dbf(
    f: BinaryIO,
    fieldnames: list[str],
    fieldspecs: list[tuple[str, int, int]],
    records: list[list],
) -> None:
    """Binary DBF emitter (O31). Field names truncate to 10 chars per the
    format; N right-justifies, D formats YYYYMMDD, L single char, C left-
    justifies/truncates."""
    now = datetime.datetime.now()
    numrec = len(records)
    numfields = len(fieldspecs)
    lenheader = numfields * 32 + 33
    lenrecord = sum(size for _, size, _ in fieldspecs) + 1
    f.write(
        struct.pack(
            "<BBBBLHH20x", 3, now.year - 1900, now.month, now.day,
            numrec, lenheader, lenrecord,
        )
    )
    for name, (typ, size, deci) in zip(fieldnames, fieldspecs):
        f.write(
            struct.pack(
                "<11sc4xBB14x",
                name[:10].encode("latin-1").ljust(11, b"\x00"),
                typ.encode("ascii"),
                size,
                deci,
            )
        )
    f.write(b"\r")
    for record in records:
        f.write(b" ")
        for (typ, size, deci), value in zip(fieldspecs, record):
            if typ == "N":
                if isinstance(value, Decimal) or deci:
                    text = f"{value:.{deci}f}" if value is not None else ""
                else:
                    text = str(value if value is not None else "")
                text = text.rjust(size)
            elif typ == "D":
                text = value.strftime("%Y%m%d") if value else " " * 8
            elif typ == "L":
                text = (str(value)[:1].upper() or "?") if value is not None else "?"
            else:
                text = str(value if value is not None else "")[:size].ljust(size)
            if len(text) != size:
                raise ValueError(
                    f"field overflow: {text!r} does not fit width {size}"
                )
            f.write(text.encode("latin-1", errors="replace"))
    f.write(b"\x1a")
