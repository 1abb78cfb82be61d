#!/usr/bin/env python
"""Importer-fleet scale rehearsal: the reference's actual job (a backlog
of CSV files through read -> sniff/infer -> sanitize -> georef -> staged
catalog publish) at growing file counts and corpus sizes.

The fleet is the parallel unit (one file = one inherently-serial
pipeline; many files = embarrassingly parallel), so throughput should
grow with the backlog until the 32 local cores saturate, and per-file
overhead (sniffing, schema inference, publish DDL) should amortize as
files carry more rows.

    IMPORT_COPIES=10 IMPORT_FILES=64 python tools/import_scale.py

Emits one JSON line: files, rows, wall seconds, rows/sec.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_FILES = int(os.environ.get("IMPORT_FILES", "64"))
COPIES = int(os.environ.get("IMPORT_COPIES", "10"))
PARALLEL = int(os.environ.get("IMPORT_PARALLEL", "8"))


def corpus(
    sf_dir: str | None = None,
    n_files: int | None = None,
    copies: int | None = None,
) -> list[str]:
    import duckdb

    global SF_DIR, N_FILES, COPIES  # noqa: PLW0603 — CLI module, env-driven
    SF_DIR = sf_dir or SF_DIR
    N_FILES = n_files if n_files is not None else N_FILES
    COPIES = copies if copies is not None else COPIES
    tag = SF_DIR.rstrip("/").rsplit("/", 1)[-1]
    out = f"/tmp/import_scale_{tag}_{COPIES}x_{N_FILES}f"
    paths = [
        os.path.join(out, f"orders_geo_{i:03d}.csv") for i in range(N_FILES)
    ]
    # done-marker written AFTER the generation loop: an interrupted run
    # leaves a partial last CSV that would pass a bare exists() check, and
    # every later run would silently benchmark a truncated corpus
    # (ADVICE r08).
    done = os.path.join(out, ".corpus_complete")
    if os.path.exists(done) and all(os.path.exists(p) for p in paths):
        return paths
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    mx = con.sql(
        f"SELECT max(o_orderkey) FROM read_parquet('{SF_DIR}/orders.parquet')"
    ).fetchone()[0]
    for i, p in enumerate(paths):
        con.sql(f"""
          COPY (SELECT o_orderkey + c.i*{mx + 1} AS o_orderkey, o_custkey,
                       o_orderstatus, o_totalprice, o_orderdate,
                       o_orderpriority,
                       30 + (o_orderkey % 6000) / 100.0  AS latitude,
                       -120 + (o_custkey % 9000) / 100.0 AS longitude
                FROM read_parquet('{SF_DIR}/orders.parquet'),
                     generate_series(0, {COPIES - 1}) c(i)
                WHERE (o_orderkey + c.i) % {N_FILES} = {i})
          TO '{p}' (FORMAT CSV, HEADER)""")
    with open(done, "w") as f:
        f.write(f"{N_FILES}\n")
    return paths


def main() -> int:
    from cartodb_importer_spark.importer import import_fleet
    from cartodb_importer_spark.session import get_spark
    from cartodb_importer_spark.sinks.catalog import LocalCatalog

    paths = corpus()
    spark = get_spark(app_name="import-scale")
    wh = tempfile.mkdtemp(prefix="import_scale_wh_")
    try:
        t0 = time.perf_counter()
        items = import_fleet(spark, LocalCatalog(wh), paths, max_parallel=PARALLEL)
        wall = time.perf_counter() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)
    rows = sum(i.result.rows_imported for i in items if i.result)
    errors = [i.error for i in items if i.error]
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "copies": COPIES,
                "files": len(paths),
                "parallel": PARALLEL,
                "rows": rows,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(rows / max(wall, 1e-9), 1),
                "errors": errors[:3],
                "n_errors": len(errors),
            }
        )
    )
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
