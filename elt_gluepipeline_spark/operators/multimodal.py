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


# Resize output contract: original payload replaced by the (stub-)resized
# payload plus a typed dims struct — the schema a real PIL/libav resize
# would produce.
RESIZED_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), True),
    StructField("payload", BinaryType(), True),
    StructField("media_format", StringType(), True),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
])


def resize_assets(assets: DataFrame, *, width: int = 64,
                  height: int = 64) -> DataFrame:
    """Map-only 'resize': per-asset payload transform via mapInPandas.

    STUB transform (no codecs in this container): deterministically
    derives a width*height-byte pseudo-raster by tiling the payload.
    The Spark-side contract is the real one — binary in, binary out,
    typed dimension metadata, zero shuffle, partition-bounded memory.
    A real decoder replaces only `_fake_raster`.
    """
    def _fake_raster(p: bytes | None) -> bytes:
        if not p:
            return b"\x00" * (width * height)
        reps = (width * height) // len(p) + 1
        return (p * reps)[: width * height]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "payload": pdf["payload"].map(_fake_raster),
                "media_format": "raw-raster",
                "width": width,
                "height": height,
            })

    return assets.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("frame_idx", LongType(), False),
    StructField("frame_payload", BinaryType(), True),
])


def sample_frames(assets: DataFrame, *, every_n_bytes: int = 1024,
                  max_frames: int = 8) -> DataFrame:
    """One-to-many frame sampling: each asset expands to <= max_frames
    rows via mapInPandas (an Arrow-native generator — the UDF yields
    MORE rows than it consumes, which a scalar pandas_udf cannot).

    STUB sampler: a 'frame' is a byte-slice window at a fixed stride; a
    real implementation seeks keyframes with a codec. The expansion
    contract (fan-out bounded by max_frames, frame index + payload per
    row) and the partitioning story are the real ones: fan-out happens
    in place, no shuffle, and downstream per-frame operators see a
    normal (asset_id, frame_idx) keyed table.
    """
    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None:
                    continue
                for i in range(min(max_frames, max(1, len(p) // every_n_bytes))):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(bytes(p[i * every_n_bytes:(i + 1) * every_n_bytes]))
            yield pd.DataFrame({"asset_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int64"),
                                "frame_payload": frames})

    return assets.mapInPandas(_sample, schema=FRAME_SCHEMA)
