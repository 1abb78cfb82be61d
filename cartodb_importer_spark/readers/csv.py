"""CSV reader (O8 + §2.2): spark.read.csv with the reference's sniffing and
type-inference semantics instead of Spark's inferSchema (whose rules differ
— Spark infers dates/timestamps; the reference's lattice never does).

Scale: the sniffers read a bounded head sample on the driver; the data scan
and the inference aggregate are distributed. One extra pass over the data
for inference (a single map-side-combined max), then the typed scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import naming
from ..infer import (
    apply_inferred_types,
    infer_column_types,
    sniff_delimiter,
    sniff_encoding,
    sniff_quote,
)


def read_csv(
    spark: SparkSession,
    path: str,
    delimiter: str | None = None,
    encoding: str | None = None,
    quote: str | None = None,
    sanitize: bool = True,
    infer: bool = True,
) -> tuple[DataFrame, dict]:
    """Returns (typed DataFrame, metadata). Column names are sanitized per
    O10 (blank headers -> unknow_name_<n>, reserved escapes)."""
    import csv as csvmod
    import io

    from pyspark.sql import types as st

    encoding = encoding or sniff_encoding(path)
    with open(path, encoding=encoding, errors="replace") as f:
        header_line = f.readline().rstrip("\r\n")
        sample_line = f.readline().rstrip("\r\n")
    delimiter = delimiter or sniff_delimiter(header_line)
    quote = quote or sniff_quote(
        header_line.split(delimiter) + sample_line.split(delimiter)
    ) or '"'

    # Parse the header driver-side and hand Spark an explicit schema:
    # blank/duplicate/reserved raw headers (all of which real CSVs carry)
    # would otherwise trip Spark's header-vs-schema checker.
    raw_names = next(
        csvmod.reader(io.StringIO(header_line), delimiter=delimiter, quotechar=quote)
    )
    names = (
        naming.sanitize_columns(raw_names)
        if sanitize
        else [n or f"_c{i}" for i, n in enumerate(raw_names)]
    )
    schema = st.StructType(
        [st.StructField(n, st.StringType(), True) for n in names]
    )
    # 'utf-8-sig' is a Python-only codec name; Spark/Java needs UTF-8.
    # The BOM lives on the header line, which the read skips (names come
    # from `schema`, parsed driver-side with the sig-aware codec above).
    spark_encoding = "UTF-8" if encoding == "utf-8-sig" else encoding
    df = spark.read.csv(
        path,
        header=True,  # skip the header line; names come from `schema`
        schema=schema,
        sep=delimiter,
        encoding=spark_encoding,
        quote=quote,
        # RFC4180 doubled-quote escaping ("" inside a quoted field), the
        # dialect Ruby CSV writes/reads (importer.rb's column_stripper) —
        # Spark's default escape is backslash, which leaves `""` verbatim.
        escape=quote,
        enforceSchema=True,
        mode="PERMISSIVE",
    )
    meta: dict = {
        "delimiter": delimiter,
        "encoding": encoding,
        "quote": quote,
        "import_type": ".csv",
    }
    if infer:
        types = infer_column_types(df)
        df = apply_inferred_types(df, types)
        meta["inferred_types"] = types
    return df, meta
