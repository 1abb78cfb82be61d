"""Spreadsheet reader (O5, importer.rb:124-140): XLS(X)/ODS -> table.

The reference converts to CSV via the roo gem, then runs the CSV path; the
Spark-native equivalent extracts the first sheet driver-side (openpyxl when
importable) into a stringified DataFrame and runs the SAME §2.2 inference,
so type behavior matches the CSV path exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import naming
from ..infer import apply_inferred_types, infer_column_types


def _load_rows(path: str) -> tuple[list[str], list[list[str | None]]]:
    ext = path.rsplit(".", 1)[-1].lower()
    if ext in ("xlsx", "xlsm"):
        try:
            from openpyxl import load_workbook
        except ImportError as e:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "xlsx import requires openpyxl (not installed in this env)"
            ) from e
        wb = load_workbook(path, read_only=True, data_only=True)
        ws = wb.worksheets[0]
        rows = [
            ["" if c is None else str(c) for c in row]
            for row in ws.iter_rows(values_only=True)
        ]
    elif ext == "ods":
        raise NotImplementedError("ods import requires odfpy (not installed)")
    else:  # legacy .xls
        raise NotImplementedError("legacy .xls import requires xlrd (not installed)")
    if not rows:
        return [], []
    return rows[0], rows[1:]


def read_excel(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    header, data = _load_rows(path)
    names = naming.sanitize_columns([h or "" for h in header])
    df = spark.createDataFrame(
        [[cell if cell != "" else None for cell in row] for row in data],
        schema=", ".join(f"`{n}` string" for n in names),
    )
    types = infer_column_types(df)
    df = apply_inferred_types(df, types)
    return df, {"import_type": path[path.rfind(".") :], "inferred_types": types}
