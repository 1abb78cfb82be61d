"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
a typed metadata struct, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

Container reality: no image/audio libraries are installed here, so the
DECODE step is stubbed (deterministic fake features derived from the bytes,
clearly marked) — but everything Spark-side is real and tested: the schema,
the batch iteration shape, the partitioning story, and the UDF signatures.
Swapping ``_decode_image_stub`` for a Pillow/torchvision call is a one-
function change; the plumbing does not move.

Scale notes: binary payloads ride in the same parquet row group as their
metadata (no small-file problem, no side-channel object store); decode
parallelism is per-partition with Arrow batches, so Python overhead
amortizes over ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows at a
time; metadata-only queries never touch the bytes thanks to parquet column
pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as st

MEDIA_SCHEMA = st.StructType(
    [
        st.StructField("media_id", st.LongType()),
        st.StructField("kind", st.StringType()),  # image | audio | video
        st.StructField("mime", st.StringType()),
        st.StructField("payload", st.BinaryType()),
        st.StructField(
            "meta",
            st.StructType(
                [
                    st.StructField("width", st.IntegerType()),
                    st.StructField("height", st.IntegerType()),
                    st.StructField("duration_ms", st.IntegerType()),
                    st.StructField("n_bytes", st.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = st.StructType(
    [
        st.StructField("media_id", st.LongType()),
        st.StructField("kind", st.StringType()),
        st.StructField("sha256", st.StringType()),
        st.StructField("feature", st.ArrayType(st.FloatType())),
    ]
)


def media_from_documents(df: DataFrame, payload_col: str = "text") -> DataFrame:
    """Build a media table from any table with an id + a payload-able
    column — the testdata has no real media, so documents' bytes stand in.
    Produces the canonical MEDIA_SCHEMA."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col(payload_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.length(F.encode(F.col(payload_col), "UTF-8"))
            .cast("long")
            .alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB DECODER — deterministic fake feature vector from the payload
    bytes (sha256-seeded). Replace with a real decode+embed (Pillow /
    torchvision / torchaudio) in a full container; the signature
    (bytes -> list[float] of FEATURE_DIM) is the real contract."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    The iterator shape means constant memory per task regardless of
    partition size — the 100 TB contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: _decode_image_stub(bytes(b))
                    ),
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize plumbing: filters to kind='image', maps payloads through
    the (stubbed) resizer, updates metadata. The stub passes bytes through
    and records the requested dimensions — schema/flow identical to a real
    Pillow resize."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["meta"] = [
                {
                    "width": width,
                    "height": height,
                    "duration_ms": m["duration_ms"] if m else None,
                    "n_bytes": m["n_bytes"] if m else None,
                }
                for m in pdf["meta"]
            ]
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, MEDIA_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame (media_id, frame_idx, ts_ms, frame binary). Stub slices
    the payload bytes deterministically per frame."""
    schema = st.StructType(
        [
            st.StructField("media_id", st.LongType()),
            st.StructField("frame_idx", st.IntegerType()),
            st.StructField("ts_ms", st.IntegerType()),
            st.StructField("frame", st.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload)
                n = min(max_frames, max(len(data) // 64, 1))
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["ts_ms"].append(i * every_ms)
                    rows["frame"].append(data[i * 64 : (i + 1) * 64])
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(batches, schema)
