#!/usr/bin/env python
"""Out-of-band landing-zone maintenance runner (VERDICT r11 item 3).

Runs ``sinks.maintenance.run_maintenance`` as a standalone process: the
deployment shape for latency-sensitive streams, where the stream carries
only the ``landing_max_dirs`` listdir alarm and THIS process does the
folding under the table's advisory lock. Safe next to the live stream
and next to a second copy of itself (claim-by-rename lock; every lost
race is a warned, counted skip — see SCALE.md r12 two-runner rehearsal).

    python tools/maintenance_runner.py --warehouse /data/wh \
        --table events_landed --checkpoint /data/ckpt/events \
        [--poll-sec 30] [--min-live-dirs 16] [--target-file-mb 128]

Stops cleanly on SIGTERM/SIGINT (finishes the in-flight fold, releases
its own lock, prints the stats line). On a cluster this is a tiny
always-on driver (or a scheduled job with --max-cycles); executors are
only held while a fold is running.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import signal
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warehouse", required=True, help="LocalCatalog root dir")
    p.add_argument("--table", required=True)
    p.add_argument(
        "--checkpoint",
        required=True,
        help="the STREAM's checkpoint dir (its commits/ high-water mark "
        "bounds what may fold)",
    )
    p.add_argument("--poll-sec", type=float, default=30.0)
    p.add_argument("--min-live-dirs", type=int, default=16)
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument(
        "--reader-grace-sec",
        type=float,
        default=600.0,
        help="folded batch dirs (already read-invisible via the base "
        "marker filter) are deleted only this long after the last fold, "
        "so concurrent readers that planned a scan before the fold keep "
        "their files; size >= the deployment's p99 query wall, 0 for "
        "the tightest landing zone",
    )
    p.add_argument(
        "--max-cycles",
        type=int,
        default=0,
        help="stop after N poll cycles (0 = run until signalled) — for "
        "cron-style scheduled maintenance instead of an always-on loop",
    )
    args = p.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s %(message)s",
    )

    from cartodb_importer_spark.session import get_spark
    from cartodb_importer_spark.sinks.catalog import LocalCatalog
    from cartodb_importer_spark.sinks.maintenance import run_maintenance

    stop = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: stop.set())

    spark = get_spark(app_name=f"maintenance-{args.table}")
    cat = LocalCatalog(args.warehouse)

    if args.max_cycles:
        # budgeted mode: a watcher trips the same stop event after N cycles
        # (cycle counting lives in run_maintenance's stats; cheapest proxy
        # here is time — max_cycles * poll_sec, plus one in-flight fold)
        threading.Timer(
            args.max_cycles * args.poll_sec, stop.set
        ).start()

    stats = run_maintenance(
        spark,
        cat,
        args.table,
        args.checkpoint,
        stop,
        poll_sec=args.poll_sec,
        min_live_dirs=args.min_live_dirs,
        target_file_bytes=args.target_file_mb * 1024 * 1024,
        reader_grace_sec=args.reader_grace_sec,
    )
    print(json.dumps({"table": args.table, **stats}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
