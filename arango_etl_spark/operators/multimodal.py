"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries ship in this
container): ``decode_image_stub`` raises NotImplementedError unless
``fake=True``, in which case it produces a deterministic fake feature
vector from the bytes — so the Spark-side plumbing (schema, partitioning,
UDF signature, Arrow batch shape) is real and tested end-to-end, and
swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int, "
    "sample_rate int"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, feature array<float>"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic opaque binary payload + metadata per doc
    (stand-in for real image/audio bytes; testdata has no media column)."""
    return docs.select(
        "doc_id",
        F.when(F.pmod("doc_id", F.lit(3)) == 0, "image")
        .when(F.pmod("doc_id", F.lit(3)) == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        F.lit(16000).alias("sample_rate"),
    )


def decode_image_stub(payload: bytes, fake: bool) -> list[float]:
    """Placeholder for a real decoder (PIL/torchvision/librosa…)."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in "
            "this container; pass fake=True for the deterministic stub"
        )
    # deterministic 8-dim 'feature' from byte content
    n = len(payload)
    return [float((payload[i % n] if n else 0) + i) for i in range(8)]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.

    Partition-parallel, no driver collect; this is the exact shape a real
    decode/resize/frame-sample stage takes at cluster scale (CPU-bound per
    batch → size partitions by payload bytes, not row count).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_image_stub(p if p is not None else b"", fake)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
