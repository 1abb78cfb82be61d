#!/usr/bin/env python
"""Dump the formatted physical plan of any registered query — the
plan-review loop (`.explain("formatted")` on demand).

Usage: python tools/explain_dump.py q1_pricing_summary [q5_nation_revenue ...]
       SF_DIR=/root/testdata/sf0.1 python tools/explain_dump.py join_asof
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    from cartodb_importer_spark.queries import QUERIES
    from cartodb_importer_spark.session import get_spark

    names = sys.argv[1:]
    if not names:
        print("usage: explain_dump.py <query> [...]; known queries:")
        print("  " + "\n  ".join(sorted(QUERIES)))
        return 1
    spark = get_spark(shuffle_partitions=8)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        df.explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
