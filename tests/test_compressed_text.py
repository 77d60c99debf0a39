"""Per-row compressed text columns (operators.multimodal
.compress_text / decompress_text): all four stdlib codecs, NULL and
corrupt-payload behavior."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elt_gluepipeline_spark.operators.multimodal import (_TEXT_CODECS,
                                                         compress_text,
                                                         decompress_text)


@pytest.mark.parametrize("codec", _TEXT_CODECS)
def test_roundtrip_identity(spark, codec):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "répétition é"),
         (4, "x" * 5000), (5, None)], "id long, text string")
    back = df.select(
        "id", "text",
        decompress_text(compress_text(F.col("text"), codec), codec)
        .alias("back"))
    for r in back.collect():
        assert r.back == r.text


def test_corrupt_payload_yields_null_not_error(spark):
    df = spark.createDataFrame([(1, bytearray(b"not compressed")),
                                (2, None)], "id long, blob binary")
    out = df.select("id", decompress_text(F.col("blob"), "zlib")
                    .alias("back")).collect()
    assert all(r.back is None for r in out)


def test_unknown_codec_raises():
    with pytest.raises(ValueError):
        compress_text(F.lit("x"), "zstd-not-here")
