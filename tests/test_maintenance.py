"""Compaction: fewer, range-clustered files; data preserved byte-for-byte.

The scan-pruning payoff is asserted structurally: after compacting on
o_orderkey, per-file [min,max] key ranges must be pairwise disjoint (so a
point/range predicate can skip every other file), which hash-sprayed
small files never are.
"""

import glob

import pyspark.sql.functions as F

from cartodb_importer_spark.sinks import maintenance as M

SF = "/root/testdata/sf0.001"


def _parquet_files(path):
    return sorted(glob.glob(f"{path}/*.parquet"))


def test_compact_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    # simulate micro-batch accretion: 40 hash-sprayed small files
    orders.repartition(40).write.mode("overwrite").parquet(src)
    assert len(_parquet_files(src)) == 40

    df = spark.read.parquet(src)
    n = M.compact(df, out, cluster_by=["o_orderkey"])
    files = _parquet_files(out)
    assert len(files) < 40 and len(files) == n

    a = spark.read.parquet(out)
    assert a.count() == orders.count()
    assert (
        a.agg(F.sum("o_orderkey")).collect()[0][0]
        == orders.agg(F.sum("o_orderkey")).collect()[0][0]
    )


def test_compacted_key_ranges_disjoint(spark, tmp_path):
    src = str(tmp_path / "small_files")
    out = str(tmp_path / "compacted")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orders.repartition(40).write.mode("overwrite").parquet(src)
    M.compact(
        spark.read.parquet(src),
        out,
        cluster_by=["o_orderkey"],
        target_file_bytes=16 * 1024,  # force several output files
    )
    stats = (
        M.file_stats(spark, out)
        .select("min_o_orderkey", "max_o_orderkey")
        .collect()
    )
    assert len(stats) >= 3
    spans = sorted((r[0], r[1]) for r in stats)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file key ranges overlap; pruning defeated"

    # the hash-sprayed source, by contrast, has every file spanning the
    # whole key domain (sanity check that the assertion is meaningful)
    src_stats = (
        M.file_stats(spark, src)
        .select("min_o_orderkey", "max_o_orderkey")
        .collect()
    )
    src_spans = sorted((r[0], r[1]) for r in src_stats)
    overlaps = sum(
        1
        for (l1, h1), (l2, h2) in zip(src_spans, src_spans[1:])
        if h1 > l2
    )
    assert overlaps > 0
