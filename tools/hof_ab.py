#!/usr/bin/env python
"""Interpreted-HOF A/B probe (VERDICT r12 item 3): isolate the cost of
assign_lsh_bucket / assign_ivf_cell expression forests vs Arrow-batched
variants at sf0.1 and at a duplicated 10x/NXx embedding corpus, and
check value-identity of the Arrow forms row-for-row.

    python tools/hof_ab.py            # sf0.1 (2k vectors) + 10x (20k)
    COPIES=30 python tools/hof_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as st

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("COPIES", "10"))
RUNS = int(os.environ.get("RUNS", "3"))


def arrow_lsh_bucket(df, planes, vec_col="embedding"):
    """Arrow-batched sign-LSH bucket: per-plane dot accumulated
    left-to-right over dims, exactly like the zip_with/aggregate fold."""
    pm = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    schema = st.StructType(
        df.schema.fields + [st.StructField("lsh_bucket", st.LongType())]
    )
    weights = (1 << np.arange(pm.shape[0])).astype(np.int64)

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                pdf["lsh_bucket"] = np.array([], dtype="int64")
                yield pdf
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            acc = np.zeros((len(x), pm.shape[0]))
            for t in range(pm.shape[1]):  # left-to-right like the fold
                acc += x[:, t, None] * pm[None, :, t]
            pdf = pdf.copy()
            pdf["lsh_bucket"] = ((acc >= 0) @ weights).astype("int64")
            yield pdf

    return df.mapInPandas(assign, schema)


def arrow_ivf_cell(df, centroids, vec_col="embedding"):
    """Arrow-batched nearest-centroid: d2 accumulated left-to-right over
    dims (fold order); argmin first-min = lowest cell id on exact ties
    (the greatest(struct(-d2, -i)) rule)."""
    cm = np.asarray(centroids, dtype=np.float64)
    schema = st.StructType(
        df.schema.fields + [st.StructField("ivf_cell", st.IntegerType())]
    )

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                pdf["ivf_cell"] = np.array([], dtype="int32")
                yield pdf
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d2 = np.zeros((len(x), len(cm)))
            for t in range(cm.shape[1]):
                diff = x[:, t, None] - cm[None, :, t]
                d2 += diff * diff
            pdf = pdf.copy()
            pdf["ivf_cell"] = np.argmin(d2, axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(assign, schema)


def timeit(label, df, runs=RUNS):
    walls = []
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
    print(f"  {label:28s} min={min(walls):6.3f} med={sorted(walls)[len(walls)//2]:6.3f}")
    return min(walls)


def main() -> int:
    from cartodb_importer_spark.llm import similarity as S
    from cartodb_importer_spark.queries import Tables
    from cartodb_importer_spark.session import get_spark

    spark = get_spark(app_name="hof-ab")
    spark.range(1000).selectExpr("sum(id)").collect()

    t = Tables(spark, SF_DIR)
    emb1 = t.embeddings.select("vec_id", "embedding")
    n_big = COPIES
    emb_big = (
        emb1.crossJoin(
            spark.range(n_big).select(F.col("id").alias("__c"))
        )
        .select(
            (F.col("vec_id") * n_big + F.col("__c")).alias("vec_id"),
            "embedding",
        )
        .repartition(64)
        .localCheckpoint()
    )
    dim = len(emb1.select("embedding").first()[0])
    planes8 = S.train_hyperplanes(dim=dim, n_planes=8)
    planes16 = S.train_hyperplanes(dim=dim, n_planes=16)
    cents8 = [
        [float((i * 37 + j * 13) % 29) / 29.0 for j in range(dim)]
        for i in range(8)
    ]
    cents64 = [
        [float((i * 37 + j * 13) % 53) / 53.0 for j in range(dim)]
        for i in range(64)
    ]

    for tag, emb in [("2k", emb1), (f"{2000 * n_big // 1000}k", emb_big)]:
        print(f"corpus {tag}:")
        for np_, planes in [(8, planes8), (16, planes16)]:
            timeit(f"lsh expr {np_}p", S.assign_lsh_bucket(emb, planes))
            timeit(f"lsh arrow {np_}p", arrow_lsh_bucket(emb, planes))
        for nc, cents in [(8, cents8), (64, cents64)]:
            timeit(f"ivf expr {nc}c", S.assign_ivf_cell(emb, cents))
            timeit(f"ivf arrow {nc}c", arrow_ivf_cell(emb, cents))

    # value identity on the full 2k corpus (all plane/cell configs)
    for planes in (planes8, planes16):
        a = {
            r.vec_id: r.lsh_bucket
            for r in S.assign_lsh_bucket(emb1, planes).collect()
        }
        b = {
            r.vec_id: r.lsh_bucket
            for r in arrow_lsh_bucket(emb1, planes).collect()
        }
        assert a == b, "lsh bucket mismatch"
    for cents in (cents8, cents64):
        a = {
            r.vec_id: r.ivf_cell
            for r in S.assign_ivf_cell(emb1, cents).collect()
        }
        b = {
            r.vec_id: r.ivf_cell
            for r in arrow_ivf_cell(emb1, cents).collect()
        }
        assert a == b, "ivf cell mismatch"
    print(json.dumps({"identity": "ok", "corpus": 2000, "copies": n_big}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
