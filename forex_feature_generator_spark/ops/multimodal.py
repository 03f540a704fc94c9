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
    StructField("sha256", StringType()),
    StructField("width", IntegerType()),        # image/video (fake-decoded)
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),     # video
    StructField("sample_rate", IntegerType()),  # audio
])


def _fake_decode(digest: bytes, modality: str) -> tuple:
    """Deterministic stand-in for the real decoder: derives plausible
    dimensions from the sha256 content digest so tests are stable AND the
    whole stub is a pure function of the bytes — expressible in the DuckDB
    oracle (q23). Replace with PIL/librosa/pyav when available."""
    h = digest
    return (
        64 + h[0] % 192 if modality in ("image", "video") else None,
        64 + h[1] % 192 if modality in ("image", "video") else None,
        1 + h[2] % 300 if modality == "video" else None,
        (8000, 16000, 44100)[h[3] % 3] if modality == "audio" else None,
    )


def decode_assets(assets: DataFrame, strict: bool = False) -> DataFrame:
    """Arrow-batched metadata extraction. The per-batch pandas work is the
    ONLY Python in this module (columnar list comprehensions, no iterrows);
    everything upstream/downstream is columnar."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict and len(pdf):
                raise NotImplementedError(
                    "real media decoding requires image/audio libraries "
                    "not present in this environment")
            contents = [bytes(c or b"") for c in pdf["content"]]
            digests = [hashlib.sha256(c).digest() for c in contents]
            metas = [_fake_decode(d, m) for d, m in zip(digests, pdf["modality"])]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].to_numpy(),
                "modality": pdf["modality"].to_numpy(),
                "n_bytes": [len(c) for c in contents],
                "sha256": [d.hex() for d in digests],
                "width": pd.array([m[0] for m in metas], dtype="Int32"),
                "height": pd.array([m[1] for m in metas], dtype="Int32"),
                "n_frames": pd.array([m[2] for m in metas], dtype="Int32"),
                "sample_rate": pd.array([m[3] for m in metas], dtype="Int32"),
            })

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
