"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by Arrow-batched pandas functions over mapInPandas.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake features derived from the
bytes). Everything Spark-side is real and tested: the schema contract
(binary + struct metadata), the mapInPandas batch shape, and the
partitioning story (payloads never shuffle unless the caller
repartitions; feature extraction is a map-only stage).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

from . import ensure_min_partitions

# Contract for a multimodal asset table.
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), True),    # 'image'|'audio'|'video'
    StructField("payload", BinaryType(), True),     # opaque encoded bytes
    StructField("media_format", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), True),
    StructField("byte_len", LongType(), True),
    StructField("feature_hash", LongType(), True),  # stand-in for real features
])


def attach_payload(df: DataFrame, id_col: str, text_col: str,
                   modality: str = "image") -> DataFrame:
    """Build an asset table from any string column (test harness for the
    binary plumbing: encode() gives a real BinaryType payload)."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("utf8-blob").alias("media_format"),
    )


def _decode_stub(payload: bytes) -> int:
    """STUB for the real decoder (PIL/libav are not in this container).

    Deterministic fake 'feature': a polynomial hash of the bytes. A real
    implementation returns pixel/waveform tensors; the Spark-side batch
    contract is identical either way.
    """
    h = 0
    for b in payload[:4096]:  # bounded work per asset, like a thumbnail decode
        h = (h * 1_000_003 + b) & 0x7FFF_FFFF_FFFF_FFFF
    return h


def extract_features(assets: DataFrame, *, batch_rows_hint: int = 1024) -> DataFrame:
    """Map-only feature extraction via mapInPandas (Arrow batches).

    No shuffle at scale: each partition's assets are decoded in place
    (ensure_min_partitions only fires on under-split local inputs).
    Batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch;
    keep payload partitions ≲128 MB via the reader settings so a batch
    of decoded frames fits executor memory at 100 TB scale.
    """
    assets = ensure_min_partitions(assets)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "byte_len": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0).astype("int64"),
                "feature_hash": pdf["payload"].map(
                    lambda p: _decode_stub(p) if p is not None else 0).astype("int64"),
            })
            yield out

    return assets.mapInPandas(_extract, schema=FEATURE_SCHEMA)
