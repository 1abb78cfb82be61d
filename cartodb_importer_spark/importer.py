"""The two public entry points, mirroring the reference API surface:

* ``Importer`` — CartoDB::Importer#import! (importer.rb:87-476): stage ->
  route -> normalize -> georeference -> publish (staging+rename) -> count,
  returning ``ImportResult(name, rows_imported, import_type, log)``.
* ``Exporter`` — CartoDB::Exporter#export! (exporter.rb:43-173): read table
  -> csv/kml/shp file -> zip, returning ``ExportResult(name, import_type,
  path)``.

Lifecycle parity notes (SURVEY §3): the eager DB connection becomes a lazy
catalog; the subprocess boundaries (wget/ogr2ogr/shp2pgsql/psql) are gone —
readers produce DataFrames directly; rollback drops only not-yet-published
staging tables so a failed import never clobbers an existing table
(spec/import_spec.rb:23-52).
"""

from __future__ import annotations

import errno
import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from . import naming
from .georef import georeference_points, rebuild_the_geom
from .sinks.catalog import Catalog


@dataclass
class ImportResult:
    """importer.rb:341-346 OpenStruct equivalent."""

    name: str
    rows_imported: int
    import_type: str
    log: list[str] = field(default_factory=list)


@dataclass
class ExportResult:
    """exporter.rb:67-71 OpenStruct equivalent."""

    name: str
    import_type: str
    path: str


class Importer:
    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        import_from_file: str,
        suggested_name: str | None = None,
        debug: bool = False,
    ):
        self.spark = spark
        self.catalog = catalog
        self.source = import_from_file
        self.debug = debug
        self.runlog: list[str] = []
        # a user-supplied name is forced: archive explosion must not
        # retarget it (importer.rb:52-57 + the `unless @force_name`
        # guard at importer.rb:106)
        self.force_name = bool(suggested_name)
        base = os.path.splitext(os.path.basename(import_from_file))[0]
        self.suggested_name = naming.get_valid_name(
            naming.sanitize(suggested_name or base), self.catalog.table_names()
        )  # importer.rb:52-57

    def log(self, msg: str) -> None:
        self.runlog.append(msg)
        if self.debug:
            print(msg)

    def run(self) -> ImportResult:
        from .readers.router import route

        workdir = None
        try:
            df, meta = route(self.spark, self.source)
            workdir = meta.get("workdir")
            # archive explosion may retarget the name (importer.rb:106),
            # unless the user forced one
            if meta.get("suggested_name") and not self.force_name:
                self.suggested_name = naming.get_valid_name(
                    naming.sanitize(meta["suggested_name"]),
                    self.catalog.table_names(),
                )
            # O9 empty guard (importer.rb:238-242) — enforced inside
            # publish (reject_empty below), where the emptiness check
            # rides the staging write's Observation instead of paying a
            # dedicated isEmpty() job per file; an empty input still
            # raises ValueError("Empty table") with nothing published.
            # O10 name sanitation (readers already sanitize; idempotent)
            df = df.toDF(*naming.sanitize_columns(df.columns))
            # O11 GeoJSON the_geom rebuild — only when the column holds
            # GeoJSON text (probe one non-null cell driver-side)
            if "the_geom" in df.columns:
                probe = (
                    df.select("the_geom")
                    .filter("the_geom IS NOT NULL")
                    .first()
                )
                if probe and str(probe[0]).lstrip().startswith("{"):
                    df = rebuild_the_geom(df)
                    self.log("rebuilt the_geom from GeoJSON")
            # O12/O13 lat-lon georeferencing
            before_cols = set(df.columns)
            df = georeference_points(df)
            if "the_geom" in set(df.columns) - before_cols:
                self.log("georeferenced POINT from lat/lon columns")
            # O15/O17 staged publish + O19 count, with Observation metrics
            # riding the write action (no extra job — the Spark-native form
            # of the reference's runlog row accounting)
            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            obs = None
            if "the_geom" in df.columns:
                obs = Observation("import_metrics")
                df = df.observe(
                    obs,
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum(
                        F.col("the_geom").isNull().cast("int")
                    ).alias("n_null_geom"),
                )
            # Publish with collision retry: the name was unique when this
            # import derived it, but a concurrent import can win it in the
            # meantime — in a fleet, archive explosion retargets names mid-
            # run (importer.rb:106), AFTER import_fleet's pre-reservation,
            # so N zips sharing one member stem all race for the same table
            # (found by the r09 mixed-format rehearsal). The no-clobber
            # guard makes the loser safe; re-deriving against the live
            # catalog and retrying gives it the reference's _n suffix
            # behavior instead of a failed import.
            attempts = 0
            while True:
                try:
                    rows = self.catalog.publish(
                        df, self.suggested_name, reject_empty=True
                    )
                    break
                except (ValueError, OSError) as exc:
                    # Only genuine name collisions retry (ADVICE r09: a
                    # bare-OSError catch re-published full datasets on
                    # disk-full etc.): publish's explicit no-clobber
                    # ValueError, or LocalCatalog's rename losing the
                    # race (EEXIST/ENOTEMPTY on the target dir).
                    is_collision = (
                        isinstance(exc, ValueError)
                        and "already exists" in str(exc)
                    ) or (
                        isinstance(exc, OSError)
                        and exc.errno in (errno.EEXIST, errno.ENOTEMPTY)
                    )
                    attempts += 1
                    if (
                        not is_collision
                        or attempts > 8
                        or not self.catalog.exists(self.suggested_name)
                    ):
                        raise  # not a name collision (or livelock): surface
                    self.suggested_name = naming.get_valid_name(
                        self.suggested_name, self.catalog.table_names()
                    )
                    self.log(
                        f"publish collision, retrying as {self.suggested_name}"
                    )
            self.log(f"published {self.suggested_name} ({rows} rows)")
            if obs is not None:
                metrics = obs.get
                self.log(
                    f"georef metrics: {metrics['n_null_geom']} of "
                    f"{metrics['n_rows']} rows have null geometry"
                )
            return ImportResult(
                name=self.suggested_name,
                rows_imported=rows,
                import_type=meta.get("import_type", ""),
                log=self.runlog,
            )
        finally:
            # O20 ensure: unlink temp files (importer.rb:469-475)
            if workdir and os.path.isdir(workdir):
                shutil.rmtree(workdir, ignore_errors=True)


class Exporter:
    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        table: str,
        type: str = "csv",
        out_dir: str = ".",
    ):
        self.spark = spark
        self.catalog = catalog
        self.table = table
        self.type = type
        self.out_dir = out_dir

    def run(self) -> ExportResult:
        from .sinks import files as fsinks

        import os

        df = self.catalog.read(self.spark, self.table)
        if self.type == "csv":
            path = fsinks.export_csv_zip(df, self.table, self.out_dir)
        elif self.type == "kml":
            path = fsinks.export_kmz(df, self.table, self.out_dir)
        elif self.type == "shp":
            path = fsinks.export_shp_zip(df, self.table, self.out_dir)
        elif self.type == "json":
            # engine extension: partitioned JSON directory (scalable sink)
            path = os.path.join(self.out_dir, f"{self.table}_json")
            fsinks.write_json_dir(df, path)
        elif self.type == "parquet":
            # engine extension: partitioned parquet directory
            path = os.path.join(self.out_dir, f"{self.table}_parquet")
            fsinks.write_parquet_dir(df, path)
        else:
            raise ValueError(f"unsupported export type {self.type!r}")
        # exporter.rb:51: export_type carries the leading dot
        return ExportResult(
            name=self.table, import_type=f".{self.type}", path=path
        )


@dataclass
class FleetItem:
    """One file's outcome in a fleet import: result XOR error."""

    path: str
    result: ImportResult | None = None
    error: str | None = None


def import_fleet(
    spark: SparkSession,
    catalog: Catalog,
    paths: list[str],
    max_parallel: int = 8,
    debug: bool = False,
) -> list[FleetItem]:
    """Parallel multi-file import — the FLEET is the parallel unit
    (SCALE.md: a single-file import is inherently one pipeline, but a
    backlog of files is embarrassingly parallel). Thread-based: each
    import submits its Spark jobs concurrently and the shared scheduler
    interleaves stages across all 32 (or 1000-executor) slots; the
    catalog's staged-publish protocol keeps each table's appearance
    atomic regardless of interleaving.

    Names are reserved up front against both the live catalog and the
    fleet itself, so two files with the same stem cannot race to the
    same table (the publish no-clobber guard would catch it, but
    pre-reservation turns a runtime failure into the reference's _n
    suffix behavior, importer.rb:567-574). One file's failure never
    affects the others — per-file errors are returned, not raised."""
    from concurrent.futures import ThreadPoolExecutor

    reserved = set(catalog.table_names())
    importers: list[Importer] = []
    for p in paths:
        imp = Importer(spark, catalog, p, debug=debug)
        name = naming.get_valid_name(imp.suggested_name, sorted(reserved))
        imp.suggested_name = name
        reserved.add(name)
        importers.append(imp)

    items = [FleetItem(path=p) for p in paths]

    def work(i: int) -> None:
        try:
            items[i].result = importers[i].run()
        except Exception as e:  # per-file isolation by contract
            items[i].error = f"{type(e).__name__}: {e}"

    with ThreadPoolExecutor(max_workers=max_parallel) as ex:
        list(ex.map(work, range(len(importers))))
    return items
