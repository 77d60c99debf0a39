import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from elt_gluepipeline_spark.operators.multimodal import (attach_payload,
                                                         extract_features)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 25  # one per nation
    assert "rank" in df.columns and "revenue" in df.columns


def test_queries_and_oracles_align(spark):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
    # rows-only queries are the documented probabilistic/hash-specific ones
    # rows-only is reserved for deliberately Spark-hash/sketch-specific
    # variants; each has an oracle-checked portable twin (q41, q40, q08,
    # q24 respectively)
    assert set(q) - set(o) == {"q17_minhash_neardup", "q21_simhash",
                               "q36_top_locations_approx",
                               "q38_rolling_fingerprint"}


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame([(1, "hello world"), (2, "")],
                                 "doc_id long, text string")
    assets = attach_payload(docs, "doc_id", "text")
    assert dict(assets.dtypes)["payload"] == "binary"
    feats = extract_features(assets)
    got = {r.asset_id: r.byte_len for r in feats.collect()}
    assert got == {1: 11, 2: 0}
    # deterministic stub features
    again = {r.asset_id: r.feature_hash for r in extract_features(assets).collect()}
    assert again == {r.asset_id: r.feature_hash for r in feats.collect()}


def test_resize_assets_contract(spark):
    from elt_gluepipeline_spark.operators.multimodal import (attach_payload,
                                                             resize_assets)
    df = spark.createDataFrame([(1, "hello"), (2, "")], "id long, t string")
    out = resize_assets(attach_payload(df, "id", "t"), width=8, height=4).collect()
    by_id = {r.asset_id: r for r in out}
    assert all(len(r.payload) == 32 for r in out)      # w*h bytes always
    assert by_id[1].width == 8 and by_id[1].height == 4
    assert by_id[1].payload.startswith(b"hello")       # deterministic tiling
    assert by_id[2].payload == b"\x00" * 32            # empty payload path
    assert by_id[1].media_format == "raw-raster"


def test_sample_frames_fanout_bounds(spark):
    from elt_gluepipeline_spark.operators.multimodal import (attach_payload,
                                                             sample_frames)
    df = spark.createDataFrame(
        [(1, "x" * 300), (2, "y" * 10), (3, "z" * 10_000)], "id long, t string")
    frames = sample_frames(attach_payload(df, "id", "t"),
                           every_n_bytes=64, max_frames=8)
    counts = {r.asset_id: r.n for r in
              frames.groupBy("asset_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {1: 4, 2: 1, 3: 8}                # floor, min-1, capped
    one = frames.filter((F.col("asset_id") == 1) & (F.col("frame_idx") == 0)).collect()[0]
    assert one.frame_payload == b"x" * 64              # windowed slice


def test_median_udaf_matches_exact_median_any_partitioning(spark):
    from pyspark.sql import functions as F

    from elt_gluepipeline_spark.operators.udx import median_udaf
    med = median_udaf()
    df = spark.createDataFrame(
        [("a", float(v)) for v in [5, 1, 9, 3]]
        + [("b", float(v)) for v in [10, 20, 30]],
        "k string, v double")
    for frame in (df, df.repartition(7)):
        got = {r.k: r.m
               for r in frame.groupBy("k").agg(med("v").alias("m")).collect()}
        assert got == {"a": 4.0, "b": 20.0}   # even count interpolates


def test_kv_pairs_udtf_lateral_explode(spark):
    from elt_gluepipeline_spark.operators.udx import kv_pairs_udtf
    kv = kv_pairs_udtf()
    spark.udtf.register("kv_pairs", kv)
    spark.createDataFrame(
        [(1, "color=red;size=L"), (2, "broken;x=1"), (3, "")],
        "id long, opts string").createOrReplaceTempView("t_opts")
    rows = spark.sql("""
        SELECT t.id, p.key, p.value
        FROM t_opts t, LATERAL kv_pairs(t.opts) p
    """).collect()
    got = {(r.id, r.key): r.value for r in rows}
    assert got == {(1, "color"): "red", (1, "size"): "L", (2, "x"): "1"}


def test_raster_stats_match_pure_python(spark):
    import numpy as np

    from elt_gluepipeline_spark.operators.multimodal import (attach_payload,
                                                             raster_stats)

    w, h = 8, 4
    texts = [(1, "x" * 40), (2, "abcdefgh" * 4), (3, "short")]
    df = spark.createDataFrame(texts, "id long, t string")
    assets = attach_payload(df, "id", "t")
    got = {r.asset_id: r for r in
           raster_stats(assets, width=w, height=h).collect()}
    for i, t in texts:
        raw = t.encode()[: w * h].ljust(w * h, b"\0")
        img = np.frombuffer(raw, np.uint8).reshape(h, w).astype(float)
        assert got[i].mean_lum == f"{img.mean():.4f}"
        assert got[i].std_lum == f"{img.std():.4f}"
        assert got[i].edge_energy == f"{np.abs(np.diff(img, 1)).mean():.4f}"


def test_downsample_raster_is_block_mean(spark):
    import numpy as np

    from elt_gluepipeline_spark.operators.multimodal import (attach_payload,
                                                             downsample_raster)

    w, h, f = 8, 4, 2
    payload = bytes(range(w * h))
    df = spark.createDataFrame([(1, payload.decode("latin-1"))],
                               "id long, t string")
    # attach_payload utf8-encodes; bytes 0..31 are ASCII-safe latin-1
    assets = attach_payload(df, "id", "t")
    out = downsample_raster(assets, width=w, height=h, factor=f).collect()[0]
    assert (out.width, out.height) == (w // f, h // f)
    img = np.frombuffer(payload, np.uint8).reshape(h, w).astype(float)
    expect = np.round(img.reshape(h // f, f, w // f, f).mean(axis=(1, 3))) \
        .clip(0, 255).astype(np.uint8).tobytes()
    assert bytes(out.payload) == expect
    # downsample then stats composes (the preprocessing chain shape)
    from elt_gluepipeline_spark.operators.multimodal import raster_stats
    st = raster_stats(downsample_raster(assets, width=w, height=h, factor=f),
                      width=w // f, height=h // f).collect()[0]
    assert st.mean_lum == f"{np.frombuffer(expect, np.uint8).mean():.4f}"
