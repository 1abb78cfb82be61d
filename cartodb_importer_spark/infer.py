"""CSV sniffing + distributed schema inference (SURVEY §2.2, O25-O27).

The reference's ``guess_schema`` (importer.rb:480-560) types CSV columns
with per-cell regexes and a monotone promotion lattice
``integer < float < varchar`` (blanks skipped, int32 overflow promotes
integer -> float). Its row-at-a-time loop becomes ONE Spark aggregate job
here: the lattice is an ordinal max, so inference over 100 TB is a single
map-side-combined pass.

Divergence note (documented, deliberate): the reference only ever promotes
from ``integer`` — a column whose FIRST non-blank cell parses as float stays
float even if later cells are text (importer.rb:536-547). That rule is
row-order-dependent and does not distribute; we use the pure lattice (any
text cell => varchar), which is also what the reference's comments describe.

Sniffers (delimiter/encoding/quote) run driver-side over a bounded head
sample — same as the reference, which sniffs the header line only.
"""

from __future__ import annotations

import codecs
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as st

# importer.rb:528-531 — per-cell typing regexes, verbatim (the float class
# [\.|\,] genuinely contains '|'; quirk preserved).
FLOAT_RX = r"^\-?[0-9]+[.|,][0-9]+$"
INT_RX = r"^[0-9]+$"
INT32_MAX = 2147483647  # importer.rb:544

_ORD_TO_TYPE = {0: "integer", 1: "float", 2: "varchar"}


def infer_column_types(df: DataFrame, columns: list[str] | None = None) -> dict[str, str]:
    """Distributed §2.2 inference: one aggregate computing, per column,
    ``max(ordinal(cell))`` with blanks contributing nothing.

    Returns {column: 'integer'|'float'|'varchar'} — columns that never held
    a non-blank value default to 'varchar' (importer.rb:557).
    """
    columns = columns or df.columns
    aggs = []
    for c in columns:
        cell = F.col(c)
        ordinal = (
            F.when(cell.isNull() | ~cell.rlike(r"\S"), F.lit(None))
            .when(
                cell.rlike(INT_RX),
                F.when(cell.cast("double") > INT32_MAX, 1).otherwise(0),
            )
            .when(cell.rlike(FLOAT_RX), F.lit(1))
            .otherwise(F.lit(2))
        )
        aggs.append(F.max(ordinal).alias(c))
    row = df.agg(*aggs).first()
    return {
        c: _ORD_TO_TYPE[row[c]] if row[c] is not None else "varchar"
        for c in columns
    }


def apply_inferred_types(df: DataFrame, types: dict[str, str]) -> DataFrame:
    """Cast string columns per the inferred lattice. Floats accept ',' as
    the decimal separator (importer.rb:528: the regex admits it), so a
    comma-decimal cell is normalized before the cast."""
    out = []
    for c in df.columns:
        t = types.get(c)
        if t == "integer":
            out.append(F.col(c).cast("int").alias(c))
        elif t == "float":
            out.append(
                F.regexp_replace(F.col(c), ",", ".").cast("double").alias(c)
            )
        else:
            out.append(F.col(c))
    return df.select(*out)


def spark_schema_for(types: dict[str, str]) -> st.StructType:
    m = {
        "integer": st.IntegerType(),
        "float": st.DoubleType(),
        "varchar": st.StringType(),
    }
    return st.StructType([st.StructField(c, m[t], True) for c, t in types.items()])


# ------------------------------------------------------------------ sniffers


def sniff_delimiter(header_line: str) -> str:
    """O25 (importer.rb:489-502): if the header doesn't split on ',', count
    columns under every candidate non-word character and pick the max."""
    if len(header_line.split(",")) > 1:
        return ","
    candidates = {c for c in re.findall(r"[^\w\s]", header_line)}
    if not candidates:
        return ","
    counts = {c: len(header_line.split(c)) for c in candidates}
    # reference sorts by count and takes the last (max); ties resolve by
    # sort order, which we make deterministic on (count, char)
    return max(sorted(counts), key=lambda c: counts[c])


def sniff_quote(sample_cells: list[str]) -> str | None:
    """O27 (importer.rb:510-526): detect ", `, or ' wrapping on cells."""
    for cell in sample_cells:
        m = re.match(r"^([\"`'])[^\"`']+([\"`'])$", cell or "")
        if m and m.group(1) == m.group(2):
            return m.group(1)
    return None


def sniff_encoding(path: str, sample_bytes: int = 1 << 20) -> str:
    """O26 (csv_normalizer.py:8-27): chardet over a head sample with the
    reference's ascii->LATIN1 override; BOM wins outright."""
    with open(path, "rb") as f:
        head = f.read(sample_bytes)
    if head.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    try:
        import chardet

        guess = (chardet.detect(head) or {}).get("encoding") or "utf-8"
    except ImportError:
        try:
            head.decode("utf-8")
            guess = "utf-8"
        except UnicodeDecodeError:
            guess = "latin-1"
    if guess.lower() in ("ascii", "us-ascii"):
        return "latin-1"  # shp_normalizer.py:55-56 override
    return guess
