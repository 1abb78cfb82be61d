#!/usr/bin/env python
"""Mixed-format importer-fleet rehearsal — VERDICT r08 item 6.

tools/import_scale.py proved the CSV fleet scales; real backlogs are
heterogeneous, so this runner drives O3-O7 ROUTING under parallelism: a
shuffled backlog of CSV + zipped-CSV (O4 explosion) + XLSX (O5
spreadsheet->rows) + zipped SHP (O4 + O14/O15 dbf/shp decode) through the
same import_fleet, reporting throughput per format class. The SHP files
share one stem, so fleet-level name pre-reservation (importer.py, the
reference's _n suffix behavior) is exercised 8-wide concurrently.

Spreadsheets and shapefiles are driver-decoded formats (the reference
shells to ogr2ogr/converts to CSV; we parse in-process) — their
per-format rows/s is expected to sit far below the distributed CSV path
and the interesting property is that a slow format class does NOT stall
the rest of the fleet (thread-pool interleaving).

    IMPORT_COPIES=10 IMPORT_FILES=64 python tools/import_mix.py

One JSON line: per-format {files, rows, rows/s-share} + fleet totals.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = int(os.environ.get("IMPORT_FILES", "64"))
COPIES = int(os.environ.get("IMPORT_COPIES", "10"))
PARALLEL = int(os.environ.get("IMPORT_PARALLEL", "8"))
XLSX_ROWS = int(os.environ.get("IMPORT_XLSX_ROWS", "2000"))
SHP_ROWS = int(os.environ.get("IMPORT_SHP_ROWS", "5000"))

_SHEET_HEAD = (
    '<?xml version="1.0" encoding="UTF-8"?>\n<worksheet xmlns='
    '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">\n<sheetData>\n'
)


def _xlsx_bytes_rows(header: list[str], data_rows) -> dict[str, str]:
    """Minimal workbook members: header via inlineStr, data as numeric
    cells — the subset readers/excel.py parses (same shape as the O5
    fixtures, scaled up)."""
    cols = "ABCDEFGH"
    parts = [_SHEET_HEAD, "<row r=\"1\">"]
    for j, h in enumerate(header):
        parts.append(
            f'<c r="{cols[j]}1" t="inlineStr"><is><t>{h}</t></is></c>'
        )
    parts.append("</row>\n")
    for i, row in enumerate(data_rows, start=2):
        parts.append(f'<row r="{i}">')
        for j, v in enumerate(row):
            parts.append(f'<c r="{cols[j]}{i}"><v>{v}</v></c>')
        parts.append("</row>\n")
    parts.append("</sheetData></worksheet>")
    return {
        "[Content_Types].xml": "<Types/>",
        "xl/workbook.xml": "<workbook/>",
        "xl/worksheets/sheet1.xml": "".join(parts),
    }


def build_backlog(spark) -> list[str]:
    import import_scale

    out = f"/tmp/import_mix_{COPIES}x_{N_FILES}f"
    done = os.path.join(out, ".corpus_complete")
    n_csv = N_FILES // 2
    n_zip = N_FILES // 4
    n_xlsx = (N_FILES - n_csv - n_zip) // 2
    n_shp = N_FILES - n_csv - n_zip - n_xlsx
    if os.path.exists(done):
        return sorted(
            os.path.join(out, f)
            for f in os.listdir(out)
            if not f.startswith(".")
        )
    os.makedirs(out, exist_ok=True)
    base = import_scale.corpus(
        sf_dir=SF_DIR, n_files=n_csv + n_zip, copies=COPIES
    )
    for p in base[:n_csv]:
        shutil.copy(p, os.path.join(out, os.path.basename(p)))
    for p in base[n_csv:]:
        stem = os.path.splitext(os.path.basename(p))[0]
        zp = os.path.join(out, f"{stem}.zip")
        with zipfile.ZipFile(zp, "w", zipfile.ZIP_DEFLATED) as zf:
            zf.write(p, f"{stem}.csv")

    import duckdb

    con = duckdb.connect()
    header = ["o_orderkey", "o_totalprice", "latitude", "longitude"]
    for i in range(n_xlsx):
        rows = con.sql(f"""
          SELECT o_orderkey, o_totalprice,
                 30 + (o_orderkey % 6000) / 100.0,
                 -120 + (o_custkey % 9000) / 100.0
          FROM read_parquet('{SF_DIR}/orders.parquet')
          WHERE o_orderkey % {n_xlsx} = {i} LIMIT {XLSX_ROWS}""").fetchall()
        members = _xlsx_bytes_rows(header, rows)
        with zipfile.ZipFile(
            os.path.join(out, f"orders_sheet_{i:02d}.xlsx"), "w"
        ) as zf:
            for name, content in members.items():
                zf.writestr(name, content)

    from pyspark.sql import functions as F

    from cartodb_importer_spark.sinks.files import export_shp_zip

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(SHP_ROWS)
    pts = orders.select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_totalprice").alias("totalprice"),
        F.format_string(
            "POINT (%s %s)",
            (-120 + F.col("o_custkey") % 9000 / 100.0),
            (30 + F.col("o_orderkey") % 6000 / 100.0),
        ).alias("the_geom"),
    )
    with tempfile.TemporaryDirectory() as tmp:
        shp = export_shp_zip(pts, "orders_points", tmp)
        for i in range(n_shp):
            # identical stems on purpose: 8 concurrent imports race for
            # 'orders_points' and must land as _1.._7 via pre-reservation
            shutil.copy(shp, os.path.join(out, f"orders_points ({i}).zip"))

    with open(done, "w") as f:
        f.write(f"{n_csv} csv / {n_zip} zip / {n_xlsx} xlsx / {n_shp} shp\n")
    return sorted(
        os.path.join(out, f) for f in os.listdir(out) if not f.startswith(".")
    )


def main() -> int:
    from cartodb_importer_spark.importer import import_fleet
    from cartodb_importer_spark.session import get_spark
    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    spark = get_spark(app_name="import-mix")
    paths = build_backlog(spark)
    wh = tempfile.mkdtemp(prefix="import_mix_wh_")
    try:
        t0 = time.perf_counter()
        items = import_fleet(
            spark, LocalCatalog(wh), paths, max_parallel=PARALLEL
        )
        wall = time.perf_counter() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    def fmt_of(path: str) -> str:
        ext = os.path.splitext(path)[1].lower()
        if ext == ".zip":
            return "shp_zip" if "points" in os.path.basename(path) else "csv_zip"
        return ext.lstrip(".")

    per: dict[str, dict] = {}
    errors = []
    for it in items:
        f = fmt_of(it.path)
        d = per.setdefault(f, {"files": 0, "rows": 0})
        d["files"] += 1
        if it.result:
            d["rows"] += it.result.rows_imported
        if it.error:
            errors.append(f"{os.path.basename(it.path)}: {it.error[:120]}")
    total_rows = sum(d["rows"] for d in per.values())
    print(
        json.dumps(
            {
                "copies": COPIES,
                "files": len(paths),
                "parallel": PARALLEL,
                "per_format": per,
                "rows": total_rows,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(total_rows / max(wall, 1e-9), 1),
                "errors": errors[:5],
                "n_errors": len(errors),
            }
        )
    )
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
