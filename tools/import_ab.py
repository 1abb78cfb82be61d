#!/usr/bin/env python
"""Import-path A/B bisect harness (VERDICT r12 item 1).

The driver measured import_rows_per_sec at 0.47x of r11 (29,527 ->
13,860 at 32 cores; 14,784 at 8) while the builder's own recordings of
the same code read 30.9k-58.2k. Two code suspects changed in r12 —
the global FAIR scheduler (session.py) and the Observation-based
publish count (catalog.py) — plus one CONTEXT difference: the driver's
number comes from the END of a full bench session (19 queries x 6 runs
of leaked persists + listener-bus traffic), while every builder A/B ran
in a fresh session.

One variant per process (scheduler.mode is a static conf):

    python tools/import_ab.py obs          # current code, FAIR
    python tools/import_ab.py count        # r11 publish (count job), FAIR
    python tools/import_ab.py obs-fifo     # current code, FIFO
    python tools/import_ab.py count-fifo   # r11 publish, FIFO
    python tools/import_ab.py obs-aged     # current code, FAIR, after a
                                           # simulated bench session
                                           # (headline queries first)

Prints one JSON line with the run_import_bench dict + variant metadata.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RUNS = int(os.environ.get("RUNS", "5"))


def patch_r11_publish() -> None:
    """Restore the pre-a6c93fa publish (dedicated count() job) and the
    importer's dedicated isEmpty() O9 guard, exactly as r11 ran them."""
    from cartodb_importer_spark import importer as imp_mod
    from cartodb_importer_spark.sinks.catalog import Catalog

    def publish(self, df, name, reject_empty=False):
        if reject_empty and df.isEmpty():  # r11: Importer-side guard
            raise ValueError("Empty table")
        staging = self.staging_name(name)
        try:
            self.write(df, staging)
            if self.exists(name):
                self.drop(staging)
                raise ValueError(f"table {name!r} already exists")
            self.rename(staging, name)
        except Exception:
            try:
                self.drop(staging)
            finally:
                pass
            raise
        return self.count(df.sparkSession, name)

    Catalog.publish = publish
    assert imp_mod  # imported for parity; Importer calls Catalog.publish


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "obs"
    scheduler = "FIFO" if variant.endswith("-fifo") else "FAIR"
    base = variant.split("-")[0]
    aged = variant.endswith("-aged")

    if base == "count":
        patch_r11_publish()

    extra = {}
    if scheduler == "FIFO":
        extra["spark.scheduler.mode"] = "FIFO"

    from cartodb_importer_spark.session import get_spark

    spark = get_spark(app_name=f"import-ab-{variant}", extra_conf=extra)
    assert spark.sparkContext.getConf().get("spark.scheduler.mode") == scheduler
    spark.range(1000).selectExpr("sum(id)").collect()

    if variant == "abtest":
        # Within-one-session A/B (host noise windows make cross-session
        # comparisons useless): age the session like the driver's bench
        # does, warm the import JVM paths, then time import WITH the
        # leaked query caches vs AFTER releasing them — same window,
        # same JVM, order bias removed by the warmup pass.
        import bench
        from cartodb_importer_spark.queries import QUERIES

        for name in bench.HEADLINE + bench.HEAVY_TAIL:
            fn = QUERIES[name]
            for _ in range(3):
                fn(spark, bench.SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
        bench.run_import_bench(spark, n_runs=2)  # untimed JVM warmup
        calib_a = bench.host_calibration()
        res_a = bench.run_import_bench(spark, n_runs=N_RUNS)
        calib_mid = bench.host_calibration()
        try:
            from cartodb_importer_spark.caching import release_tracked_caches

            release_tracked_caches()
        except ImportError:
            pass
        spark.catalog.clearCache()
        res_b = bench.run_import_bench(spark, n_runs=N_RUNS)
        calib_b = bench.host_calibration()
        print(
            json.dumps(
                {
                    "variant": "abtest",
                    "scheduler": scheduler,
                    "with_leftover_caches": res_a,
                    "after_release": res_b,
                    "calib": [calib_a, calib_mid, calib_b],
                }
            )
        )
        return 0

    released = variant.endswith("-released")
    if released:
        variant_base_aged = True
    if aged or released:
        # simulate the driver's context: the import bench runs AFTER the
        # full headline+heavy sweep in the same session
        import bench
        from cartodb_importer_spark.queries import QUERIES

        t0 = time.perf_counter()
        for name in bench.HEADLINE + bench.HEAVY_TAIL:
            fn = QUERIES[name]
            for _ in range(3):
                fn(spark, bench.SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
        age_wall = time.perf_counter() - t0
    else:
        age_wall = 0.0

    import bench

    if released:
        # the r13 bench.py fix: drop every leaked query cache before the
        # import window (tracked release is a no-op here if the tracked
        # wrappers aren't on this checkout; clearCache covers CacheManager)
        try:
            from cartodb_importer_spark.caching import release_tracked_caches

            release_tracked_caches()
        except ImportError:
            pass
        spark.catalog.clearCache()

    calib_pre = bench.host_calibration()
    res = bench.run_import_bench(spark, n_runs=N_RUNS)
    calib_post = bench.host_calibration()
    res.update(
        {
            "variant": variant,
            "scheduler": scheduler,
            "aged_session_sec": round(age_wall, 1),
            "calib_pre": calib_pre,
            "calib_post": calib_post,
        }
    )
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
