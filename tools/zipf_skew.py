#!/usr/bin/env python
"""Multi-hot-key (Zipf) skew rehearsal — VERDICT r09 item 5.

r09's rehearsal proved 20% SINGLE-key heat benign; real corpora are
Zipf-distributed — MANY warm keys, which stresses AQE partition
coalescing differently (many medium partitions vs one giant). This
runner builds a 30x corpus whose join/window keys are drawn from
Zipf(s=1.1):

* ``lineitem.l_orderkey`` ~ Zipf over the full 30x orderkey domain —
  order "sizes" become Zipf, so the orders-lineitem shuffle join and the
  per-order aggregations see a heavy head (top key ~12% of all lines)
  plus a long warm tail;
* ``events.user_id`` ~ Zipf over the matching 30x user domain — window
  and sessionization partitions get the same shape (window partitions
  cannot be split by AQE, so the head user IS one task by design).

Orders/dims/documents/embeddings duplicate exactly as the uniform 30x
control (tools/stress_10x.py, HOT=0), so ratios vs /tmp/sfstress_30x
isolate the key-distribution change. Zipf sampling is exact inverse-CDF:
numpy builds the normalized cumulative over K ranks, duckdb ASOF-joins
each row's uniform draw to it (rank -> key via a hashed permutation of
the real key domain, so hot keys aren't clustered in key order).

    python tools/zipf_skew.py            # generate + run, one JSON/query
    ZIPF_ONLY=q3_top_revenue_orders python tools/zipf_skew.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

import skew_rehearsal  # noqa: E402 — run_one + families + thresholds
import stress_10x  # noqa: E402

SRC = os.environ.get("STRESS_SRC", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("ZIPF_COPIES", "30"))
S_EXP = float(os.environ.get("ZIPF_S", "1.1"))
UNIFORM_DIR = f"/tmp/sfstress_{COPIES}x" if COPIES != 10 else "/tmp/sfstress"
ZIPF_DIR = f"/tmp/sfzipf_{COPIES}x_s{int(S_EXP * 10)}"

#: the skew-sensitive families whose keys this corpus reshapes (the dedup
#: family keeps uniform documents — boilerplate heat was the r09 run)
QUERIES = skew_rehearsal.JOIN + skew_rehearsal.WINDOW + skew_rehearsal.EVENTS


def _write_cdf(con, name: str, k: int) -> None:
    """Register a duckdb relation ``name``(lo DOUBLE, rank BIGINT): the
    Zipf(S_EXP) inverse-CDF lower bounds over ranks 1..k."""
    import numpy as np
    import pandas as pd

    r = np.arange(1, k + 1, dtype=np.float64)
    p = r ** (-S_EXP)
    cum = np.cumsum(p)
    cum /= cum[-1]
    lo = np.concatenate(([0.0], cum[:-1]))
    df = pd.DataFrame({"lo": lo, "rank": np.arange(1, k + 1, dtype=np.int64)})
    con.register(name, df)


def generate() -> None:
    if os.path.exists(f"{ZIPF_DIR}/.corpus_complete"):
        return
    import duckdb

    print(f"generating {ZIPF_DIR} ({COPIES}x {SRC}, zipf s={S_EXP}) ...", flush=True)
    # control corpus first (dims + uniform orders/documents/embeddings are
    # shared byte-for-byte; only lineitem/events differ)
    if not os.path.exists(f"{UNIFORM_DIR}/.corpus_complete"):
        stress_10x.generate(src=SRC, dst=UNIFORM_DIR, copies=COPIES, hot=0.0)
        with open(f"{UNIFORM_DIR}/.corpus_complete", "w") as f:
            f.write(f"{COPIES} 0.0\n")
    os.makedirs(ZIPF_DIR, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "documents", "embeddings",
    ]:
        shutil.copy(f"{UNIFORM_DIR}/{t}.parquet", f"{ZIPF_DIR}/{t}.parquet")

    con = duckdb.connect()
    n = COPIES - 1

    # lineitem: keep every non-key column (30x duplication), draw
    # l_orderkey from Zipf over the 30x orders domain. Permute rank->key by
    # hash so the hot head isn't the numerically-first orderkeys (which
    # TPC-H clusters in o_orderdate order — a correlation no real corpus has).
    n_orders = con.sql(
        f"SELECT count(*) FROM read_parquet('{UNIFORM_DIR}/orders.parquet')"
    ).fetchone()[0]
    _write_cdf(con, "cdf_ok", int(n_orders))
    con.sql(f"""
      CREATE TEMP TABLE okeys AS
      SELECT o_orderkey AS key,
             row_number() OVER (ORDER BY hash(o_orderkey)) AS rank
      FROM read_parquet('{UNIFORM_DIR}/orders.parquet')""")
    con.sql(f"""
      COPY (
        WITH drawn AS (
          SELECT l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus, l_shipdate, random() AS u
          FROM read_parquet('{SRC}/lineitem.parquet'),
               generate_series(0,{n}) t(i))
        SELECT k.key AS l_orderkey, d.l_partkey, d.l_suppkey,
               d.l_linenumber, d.l_quantity, d.l_extendedprice,
               d.l_discount, d.l_tax, d.l_returnflag, d.l_linestatus,
               d.l_shipdate
        FROM drawn d
        ASOF JOIN cdf_ok c ON d.u >= c.lo
        JOIN okeys k ON k.rank = c.rank)
      TO '{ZIPF_DIR}/lineitem.parquet' (FORMAT PARQUET)""")

    # events: user_id from Zipf over the 30x user domain (the uniform
    # control shifts user ids per copy, growing the domain 30x — match it
    # so distinct-key counts stay comparable and only frequencies change)
    mu = con.sql(
        f"SELECT max(user_id) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]
    me = con.sql(
        f"SELECT max(event_id) FROM read_parquet('{SRC}/events.parquet')"
    ).fetchone()[0]
    k_users = int((mu + 1) * COPIES)
    _write_cdf(con, "cdf_uid", k_users)
    # rank -> user_id via an affine BIJECTION (multiplier coprime to the
    # domain), so warm ranks never merge and the hot head isn't clustered
    # in id order
    import math

    mult = 2654435761
    while math.gcd(mult, k_users) != 1:
        mult += 1
    con.sql(f"""
      COPY (
        WITH drawn AS (
          SELECT event_id + i*{me + 1} AS event_id, ts, event_type, value,
                 props, random() AS u
          FROM read_parquet('{SRC}/events.parquet'),
               generate_series(0,{n}) t(i))
        SELECT d.event_id, d.ts,
               (c.rank * {mult}) % {k_users} AS user_id,
               d.event_type, d.value, d.props
        FROM drawn d
        ASOF JOIN cdf_uid c ON d.u >= c.lo)
      TO '{ZIPF_DIR}/events.parquet' (FORMAT PARQUET)""")

    with open(f"{ZIPF_DIR}/.corpus_complete", "w") as f:
        f.write(f"{COPIES} zipf {S_EXP}\n")


def main() -> int:
    generate()
    from cartodb_importer_spark.session import get_spark

    spark = get_spark(app_name="zipf-rehearsal")
    only = os.environ.get("ZIPF_ONLY")
    names = [q for q in only.split(",") if q] if only else QUERIES

    # same threshold protocol as skew_rehearsal: joins once under stock
    # thresholds on the zipf corpus (records the honest default), then
    # fleet-relative scaled thresholds for the measured ratios
    stock: dict[str, int] = {}
    for name in [q for q in names if q in skew_rehearsal.JOIN]:
        r = skew_rehearsal.run_one(spark, name, ZIPF_DIR, capture_plan=True)
        stock[name] = r.get("skew_splits", 0)
        print(json.dumps({"mode": "zipf_stock_thresholds", **r}), flush=True)
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        skew_rehearsal.THRESH,
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        skew_rehearsal.ADVISORY,
    )

    results: dict[str, dict] = {}
    for name in names:
        capture = name in skew_rehearsal.JOIN
        u = skew_rehearsal.run_one(spark, name, UNIFORM_DIR, capture_plan=capture)
        z = skew_rehearsal.run_one(spark, name, ZIPF_DIR, capture_plan=capture)
        row = {
            "query": name,
            "uniform_sec": u["wall_sec"],
            "zipf_sec": z["wall_sec"],
            "ratio": round(z["wall_sec"] / max(u["wall_sec"], 1e-9), 2),
        }
        if capture:
            row["skew_splits_zipf"] = z.get("skew_splits", 0)
            row["skew_splits_zipf_stock"] = stock.get(name, 0)
        for side, r in (("uniform", u), ("zipf", z)):
            if "error" in r:
                row[f"{side}_error"] = r["error"]
        results[name] = row
        print(json.dumps(row), flush=True)

    summary = {
        "copies": COPIES,
        "zipf_s": S_EXP,
        "skew_threshold": skew_rehearsal.THRESH,
        "advisory": skew_rehearsal.ADVISORY,
        "worst_ratio": max(
            (r["ratio"] for r in results.values() if "zipf_error" not in r),
            default=0.0,
        ),
        "errors": sum(
            1
            for r in results.values()
            if "zipf_error" in r or "uniform_error" in r
        ),
        "results": results,
    }
    print(json.dumps(summary), flush=True)
    return 1 if summary["errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
