"""read_parquet_normalized: timestamp-encoding normalization, including
NTZ timestamps nested inside struct/array/map columns (ADVICE r2 item 3).

The driver regenerates testdata between rounds and has switched events.ts
between TIMESTAMP(NANOS) and timestamp[us]/NTZ once already — every
encoding must normalize to session-tz-UTC TimestampType regardless of the
session's own conf state.
"""

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from cartodb_importer_spark.queries import read_parquet_normalized


def _roundtrip(spark, tmp_path, table: pa.Table):
    p = str(tmp_path / "t.parquet")
    pq.write_table(table, p)
    return read_parquet_normalized(spark, p)


def test_flat_micros_ntz_normalized(spark, tmp_path):
    ts = pa.array([dt.datetime(2024, 1, 1, 12, 0, 0)], type=pa.timestamp("us"))
    df = _roundtrip(spark, tmp_path, pa.table({"ts": ts}))
    assert df.schema.simpleString() == "struct<ts:timestamp>"
    assert df.collect()[0].ts == dt.datetime(2024, 1, 1, 12, 0, 0)


def test_nested_ntz_normalized(spark, tmp_path):
    ts = pa.array([dt.datetime(2024, 1, 1, 12, 0, 0)], type=pa.timestamp("us"))
    tbl = pa.table(
        {
            "st": pa.StructArray.from_arrays([ts], names=["inner_ts"]),
            "arr": pa.array(
                [[dt.datetime(2024, 1, 2, 3, 4, 5)]],
                type=pa.list_(pa.timestamp("us")),
            ),
            "keep": pa.array([7], type=pa.int64()),
        }
    )
    df = _roundtrip(spark, tmp_path, tbl)
    assert (
        df.schema.simpleString()
        == "struct<st:struct<inner_ts:timestamp>,arr:array<timestamp>,keep:bigint>"
    )
    row = df.collect()[0]
    assert row.st.inner_ts == dt.datetime(2024, 1, 1, 12, 0, 0)
    assert row.arr == [dt.datetime(2024, 1, 2, 3, 4, 5)]
    assert row.keep == 7


def test_nanos_normalized(spark, tmp_path):
    ts = pa.array([dt.datetime(2024, 6, 1, 0, 0, 1)], type=pa.timestamp("ns"))
    df = _roundtrip(spark, tmp_path, pa.table({"ts": ts, "v": pa.array([1.5])}))
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.collect()[0].ts == dt.datetime(2024, 6, 1, 0, 0, 1)


def test_untouched_columns_keep_types(spark, tmp_path):
    tbl = pa.table({"a": pa.array([1]), "b": pa.array(["x"])})
    df = _roundtrip(spark, tmp_path, tbl)
    assert df.schema.simpleString() == "struct<a:bigint,b:string>"
