"""Bucketed tables must prove their value in the PLAN: a join of two
tables bucketed on the join key runs with no Exchange (shuffle) at all."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from elt_gluepipeline_spark.sources.bucketing import (read_bucketed,
                                                      write_bucketed)


@pytest.fixture()
def bucketed_pair(spark):
    # managed tables land in the default warehouse dir; DROP TABLE below
    # removes the files (warehouse.dir is a static conf — not settable here)
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000, 3).select(
        F.col("id").alias("k"), (F.col("id") * 5).alias("vb"))
    write_bucketed(a, "bkt_a", ["k"], 4, sort_keys=["k"])
    write_bucketed(b, "bkt_b", ["k"], 4, sort_keys=["k"])
    yield "bkt_a", "bkt_b"
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    ta, tb = bucketed_pair
    # disable broadcast so the test proves co-location, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "k")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan   # co-located: zero shuffle
        assert joined.count() == 334          # rows of b that joined
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_join_beats_per_run_repartition(spark, bucketed_pair):
    # the reference re-repartitions both join sides on the key EVERY
    # run (go-quality-elt.py:262-267) — that plan pays >=2 Exchanges
    # per run; the bucketed plan paid its shuffle once at write time
    # and runs with zero
    ta, tb = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
        b = spark.range(0, 1000, 3).select(
            F.col("id").alias("k"), (F.col("id") * 5).alias("vb"))
        ref_style = a.repartition(8, "k").join(b.repartition(8, "k"), "k")
        assert _plan(ref_style).count("Exchange") >= 2
        bucketed = read_bucketed(spark, ta).join(read_bucketed(spark, tb), "k")
        assert "Exchange" not in _plan(bucketed)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_pair):
    ta, _ = bucketed_pair
    agg = read_bucketed(spark, ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 1000


def test_bucketed_join_correct_results(spark, bucketed_pair):
    ta, tb = bucketed_pair
    got = (read_bucketed(spark, ta).join(read_bucketed(spark, tb), "k")
           .agg(F.sum(F.col("va") + F.col("vb")).alias("t")).collect()[0].t)
    a = spark.range(0, 1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000, 3).select(F.col("id").alias("k"), (F.col("id") * 5).alias("vb"))
    want = a.join(b, "k").agg(F.sum(F.col("va") + F.col("vb")).alias("t")).collect()[0].t
    assert got == want


def test_zorder_key_locality_and_pruning(spark, tmp_path):
    """Z-order locality: sorting by the interleaved key keeps row-group
    min/max ranges tight on BOTH dimensions, unlike a single-column
    sort (tight on one, full-range on the other)."""
    from pyspark.sql import functions as F

    from elt_gluepipeline_spark.sources.writers import write_parquet, zorder_key

    grid = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("v"))
    zpath = str(tmp_path / "z")
    write_parquet(grid.withColumn("_zk", zorder_key("x", "y", bits=6))
                      .repartition(1).sortWithinPartitions("_zk").drop("_zk"),
                  zpath, max_files=1)

    # locality measured on the key order itself (the small fixture fits
    # one row group, so row-group stats can't show the effect directly):
    # consecutive z-key blocks must span small x/y RECTANGLES, where a
    # row-major sort would span the full 64 range on the minor dim
    rows = (spark.read.parquet(zpath)
                 .withColumn("_zk", zorder_key("x", "y", bits=6))
                 .orderBy("_zk").collect())
    blk = 256  # 4096 rows / 16 blocks
    for i in range(0, len(rows), blk):
        chunk = rows[i:i + blk]
        xs = [r.x for r in chunk]
        ys = [r.y for r in chunk]
        # a 256-cell z-curve block covers a ~16x16 rectangle, far less
        # than the full 64-wide range a row-major block would span on y
        assert max(xs) - min(xs) <= 24, (min(xs), max(xs))
        assert max(ys) - min(ys) <= 24, (min(ys), max(ys))
    # and the key is a bijection on the grid (no collisions)
    keys = {r._zk for r in rows}
    assert len(keys) == 64 * 64
