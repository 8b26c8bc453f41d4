"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The decode libraries (PIL/ffmpeg/etc.) are NOT in this container, so the
decode kernels are deterministic fakes behind `_decode_*` seams — the Spark
side (schemas, batch iteration, partitioning, UDF signatures) is real and
tested.  Swapping in a real decoder is a one-function change.

Scale notes: binary payloads never pass through a shuffle — `mapInPandas`
is a narrow transformation; downstream aggregations carry only the small
extracted features.  `spark.sql.execution.arrow.maxRecordsPerBatch` bounds
batch memory for large blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha1", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: derives (width, height, 8-dim feature)
    from a sha1 of the bytes.  Replace with a real decoder (PIL) when the
    library is available; the function contract is the integration seam.
    """
    h = hashlib.sha1(payload).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    feature = [round(b / 255.0, 6) for b in h[2:10]]
    return width, height, feature


def extract_image_features(df: DataFrame, id_col: str = "media_id", blob_col: str = "blob") -> DataFrame:
    """`mapInPandas` feature extraction over binary blobs.

    Input: (media_id long, media_type string, blob binary). Output:
    IMAGE_FEATURE_SCHEMA.  One Arrow batch in, one out — vectorized
    transfer; per-blob work happens in numpy/bytes land.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, blob in zip(pdf[id_col], pdf["media_type"], pdf[blob_col]):
                payload = bytes(blob) if blob is not None else b""
                w, hgt, feat = _decode_image_stub(payload)
                rows.append(
                    (
                        int(mid),
                        str(mtype),
                        len(payload),
                        hashlib.sha1(payload).hexdigest(),
                        w,
                        hgt,
                        feat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields],
            )

    return df.mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: blob = repeated md5 bytes."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, F.lit("image/png"))
        .when(F.col("id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
        F.to_binary(F.repeat(F.md5(F.col("id").cast("string")), 4), F.lit("hex")).alias("blob"),
    )
    return rows
