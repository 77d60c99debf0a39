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


# --------------------------------------------------------------------
# RAW-RASTER path: REAL computation, no codec required. Training
# pipelines routinely store preprocessed uncompressed tensors (raw
# uint8 rasters) precisely so downstream stages don't pay a decode;
# for that format the math below is the production math, not a stub —
# only codec formats (jpeg/mp3/mp4) keep the stubbed decode above.
# --------------------------------------------------------------------

RASTER_STATS_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("width", LongType(), False),
    StructField("height", LongType(), False),
    StructField("mean_lum", StringType(), True),    # fixed 4-dp string:
    StructField("std_lum", StringType(), True),     # engine-stable form
    StructField("edge_energy", StringType(), True),
])


def raster_stats(assets: DataFrame, *, width: int, height: int) -> DataFrame:
    """Real per-image statistics over raw uint8 rasters: mean/σ of
    luminance and mean absolute horizontal gradient (edge energy — the
    cheap blur/blank-image quality signal). Vectorized numpy over
    Arrow batches, map-only; payloads shorter than width*height are
    zero-padded (truncated tail = black), longer ones truncated.
    Stats are emitted as fixed 4-decimal strings so results are
    bit-stable across engines and partitionings.
    """
    import numpy as np

    n = width * height
    assets = ensure_min_partitions(assets)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, stds, edges = [], [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None:
                    continue
                buf = np.frombuffer(bytes(p[:n]).ljust(n, b"\0"),
                                    dtype=np.uint8)
                img = buf.reshape(height, width).astype(np.float64)
                ids.append(aid)
                means.append(f"{img.mean():.4f}")
                stds.append(f"{img.std():.4f}")
                edges.append(f"{np.abs(np.diff(img, axis=1)).mean():.4f}")
            yield pd.DataFrame({
                "asset_id": pd.Series(ids, dtype="int64"),
                "width": width, "height": height,
                "mean_lum": means, "std_lum": stds, "edge_energy": edges})

    return assets.mapInPandas(_stats, schema=RASTER_STATS_SCHEMA)


def downsample_raster(assets: DataFrame, *, width: int, height: int,
                      factor: int) -> DataFrame:
    """Real raster downsampling: factor×factor block mean (area
    interpolation) over raw uint8 rasters — the actual resize math for
    uncompressed images, vectorized numpy, map-only, zero shuffle.
    Output payload is the (width//factor)×(height//factor) raster.
    """
    import numpy as np

    if width % factor or height % factor:
        raise ValueError(f"factor {factor} must divide {width}x{height}")
    n = width * height
    ow, oh = width // factor, height // factor
    assets = ensure_min_partitions(assets)

    def _down(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mods, payloads = [], [], []
            for aid, mod, p in zip(pdf["asset_id"], pdf["modality"],
                                   pdf["payload"]):
                if p is None:
                    continue
                buf = np.frombuffer(bytes(p[:n]).ljust(n, b"\0"),
                                    dtype=np.uint8)
                img = buf.reshape(height, width).astype(np.float64)
                small = img.reshape(oh, factor, ow, factor).mean(axis=(1, 3))
                ids.append(aid)
                mods.append(mod)
                payloads.append(np.round(small).clip(0, 255)
                                  .astype(np.uint8).tobytes())
            yield pd.DataFrame({
                "asset_id": pd.Series(ids, dtype="int64"),
                "modality": mods, "payload": payloads,
                "media_format": "raw-raster",
                "width": ow, "height": oh})

    return assets.mapInPandas(_down, schema=RESIZED_SCHEMA)
