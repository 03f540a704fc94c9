"""Multimodal columns: image/audio/video as opaque `binary` columns with typed
metadata. The Spark-side plumbing (schema, partitioning, Arrow batch shape,
mapInPandas signatures) is real and tested; the actual media decode is STUBBED
— the container has no image/audio libraries — behind a deterministic fake
keyed on the content hash, or NotImplementedError when `strict`.

At 100 TB the pattern is: binary assets in their own parquet column chunk
(never shuffled), metadata extracted once via Arrow-batched mapInPandas with
`spark.sql.execution.arrow.maxRecordsPerBatch` bounding executor memory, and
downstream joins on the compact metadata only."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

ASSET_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("content", BinaryType()),
    StructField("mime", StringType()),
])

DECODED_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha1", StringType()),
    StructField("width", IntegerType()),        # image/video (fake-decoded)
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),     # video
    StructField("sample_rate", IntegerType()),  # audio
])


def _fake_decode(content: bytes, modality: str) -> dict:
    """Deterministic stand-in for the real decoder: derives plausible
    dimensions from the content hash so tests are stable. Replace with
    PIL/librosa/pyav when available."""
    h = hashlib.sha1(content or b"").digest()
    return {
        "width": 64 + h[0] % 192 if modality in ("image", "video") else None,
        "height": 64 + h[1] % 192 if modality in ("image", "video") else None,
        "n_frames": 1 + h[2] % 300 if modality == "video" else None,
        "sample_rate": (8000, 16000, 44100)[h[3] % 3] if modality == "audio" else None,
    }


def decode_assets(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched metadata extraction. The per-batch pandas work is the
    ONLY Python in this module; everything upstream/downstream is columnar."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"] or b"")
                if strict:
                    raise NotImplementedError(
                        "real media decoding requires image/audio libraries "
                        "not present in this environment")
                meta = _fake_decode(content, r["modality"])
                rows.append({
                    "asset_id": r["asset_id"],
                    "modality": r["modality"],
                    "n_bytes": len(content),
                    "sha1": hashlib.sha1(content).hexdigest(),
                    **meta,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return assets.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def documents_as_assets(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Adapter for tests/benchmarks: treats document text bytes as binary
    image-like assets so the plumbing can be exercised without media files."""
    return docs.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"))
