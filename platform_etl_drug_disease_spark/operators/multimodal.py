"""Multimodal-column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested — schemas, partition-preserving
batch iteration, UDF signatures, output contracts. The actual media decode is
STUBBED: this container has no image/audio libraries, so ``mode="real"``
raises NotImplementedError at the decode call site, and ``mode="fake"`` runs a
deterministic md5-based pseudo-decoder with the same shapes a real decoder
(PIL / torchaudio / pyav) would produce. Swapping in a real decoder touches
only ``_fake_decode`` — the distributed plumbing is unchanged.

At 100 TB: payloads stay in executor-local Arrow batches end to end (never
collected), batch size is bounded by ``spark.sql.execution.arrow
.maxRecordsPerBatch``, and feature extraction parallelism is the source
partitioning — repartition upstream by a size-balancing key when payload
sizes are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_FIELDS = [
    T.StructField("payload_bytes", T.LongType()),
    T.StructField("content_digest", T.StringType()),
    T.StructField("feature_vec", T.ArrayType(T.FloatType())),
]


def _fake_decode(payload: bytes, dim: int = 8) -> dict[str, Any]:
    """Deterministic pseudo-decoder: digest + an md5-derived feature vector
    with the shape a real embedding extractor would return."""
    digest = hashlib.md5(payload or b"").hexdigest()
    raw = hashlib.md5(digest.encode()).digest()
    vec = [round(b / 255.0, 6) for b in raw[:dim]]
    return {
        "payload_bytes": len(payload or b""),
        "content_digest": digest,
        "feature_vec": vec,
    }


def extract_media_features(
    df: DataFrame, payload_col: str = "payload", mode: str = "fake"
) -> DataFrame:
    """Arrow-batched feature extraction over a binary payload column.

    Output: all input columns plus FEATURE_FIELDS. ``mode="real"`` is the
    integration point for an actual decoder and intentionally raises here.
    """
    import pandas as pd

    out_schema = T.StructType(list(df.schema.fields) + FEATURE_FIELDS)

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real media decode requires image/audio libraries not "
                    "present in this environment; use mode='fake' for the "
                    "deterministic stub"
                )
            feats = pdf[payload_col].map(_fake_decode)
            pdf = pdf.assign(
                payload_bytes=feats.map(lambda d: d["payload_bytes"]),
                content_digest=feats.map(lambda d: d["content_digest"]),
                feature_vec=feats.map(lambda d: d["feature_vec"]),
            )
            yield pdf

    return df.mapInPandas(fn, out_schema)


def sample_frames(
    df: DataFrame, every_n: int = 10, payload_col: str = "payload"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index, frame
    payload stubbed as a sliced digest of the source payload. Real decoder
    would emit actual frame bytes; row-explosion shape is identical."""
    n_frames = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    out = df.where(n_frames > 0).select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
        F.sha2(F.concat(F.col(payload_col).cast("string"), F.lit("#")), 256).alias(
            "frame_digest"
        ),
    )
    return out.withColumn(
        "frame_digest",
        F.sha2(F.concat(F.col("frame_digest"), F.col("frame_idx").cast("string")), 256),
    )


def resize_images(
    df: DataFrame, width: int, height: int, payload_col: str = "payload", mode: str = "fake"
) -> DataFrame:
    """Image resize stub: updates metadata to the target dimensions and tags
    the payload digest; a real implementation would re-encode payload bytes
    inside the same mapInPandas contract as extract_media_features."""
    if mode == "real":
        raise NotImplementedError("real image resize requires an image library")
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    ).withColumn("resize_digest", F.sha2(F.col(payload_col).cast("string"), 256))
