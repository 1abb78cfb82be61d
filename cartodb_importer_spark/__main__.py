"""Command-line entry point mirroring the reference gem's usage:

    python -m cartodb_importer_spark import <file> [--name N] [--warehouse DIR | --jdbc-url URL]
    python -m cartodb_importer_spark export <table> --type csv|kml|shp|json|parquet [--out DIR]
    python -m cartodb_importer_spark tables [--warehouse DIR | --jdbc-url URL]

The reference's `CartoDB::Importer.new(:import_from_file => ...).import!`
becomes `import`; `CartoDB::Exporter` becomes `export`. Default sink is a
local parquet warehouse at ./warehouse; pass --jdbc-url for Postgres parity.
"""

from __future__ import annotations

import argparse
import json
import sys


def _catalog(spark, args):
    from .sinks.catalog import JdbcCatalog, LocalCatalog

    if getattr(args, "jdbc_url", None):
        return JdbcCatalog(spark, args.jdbc_url, dialect=args.dialect)
    return LocalCatalog(args.warehouse)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="cartodb_importer_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    def add_sink_args(p):
        p.add_argument("--warehouse", default="./warehouse")
        p.add_argument("--jdbc-url", default=None)
        p.add_argument("--dialect", default="postgresql",
                       choices=["postgresql", "derby"])

    p_imp = sub.add_parser("import", help="import a file into a table")
    p_imp.add_argument("source", help="path or URL (csv/zip/json/kml/gpx/shp/...)")
    p_imp.add_argument("--name", default=None, help="suggested table name")
    p_imp.add_argument("--debug", action="store_true")
    add_sink_args(p_imp)

    p_exp = sub.add_parser("export", help="export a table to a file")
    p_exp.add_argument("table")
    p_exp.add_argument("--type", default="csv",
                       choices=["csv", "kml", "shp", "json", "parquet"])
    p_exp.add_argument("--out", default=".")
    add_sink_args(p_exp)

    p_ls = sub.add_parser("tables", help="list warehouse tables")
    add_sink_args(p_ls)

    args = parser.parse_args(argv)

    from .session import get_spark

    spark = get_spark(app_name=f"cartodb-{args.cmd}")
    try:
        cat = _catalog(spark, args)
        if args.cmd == "import":
            from .importer import Importer

            res = Importer(
                spark, cat, args.source, suggested_name=args.name,
                debug=args.debug,
            ).run()
            print(json.dumps({
                "name": res.name,
                "rows_imported": res.rows_imported,
                "import_type": res.import_type,
                "log": res.log,
            }))
        elif args.cmd == "export":
            from .importer import Exporter

            res = Exporter(
                spark, cat, args.table, type=args.type, out_dir=args.out
            ).run()
            print(json.dumps({
                "name": res.name, "type": res.import_type, "path": res.path,
            }))
        else:
            print(json.dumps({"tables": cat.table_names()}))
        return 0
    except Exception as e:
        print(json.dumps({"error": str(e)}), file=sys.stderr)
        return 1
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
