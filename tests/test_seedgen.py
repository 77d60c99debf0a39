"""Custom Python DataSource (sources/generate.py): deterministic
distributed generation with zero driver materialization."""

import pytest
from pyspark.sql import functions as F

from elt_gluepipeline_spark.sources.generate import SeedGen


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SeedGen)


def _gen(spark, rows, seed=7, partitions=8):
    return (spark.read.format("seedgen")
                 .option("rows", rows).option("seed", seed)
                 .option("partitions", partitions).load())


def test_seedgen_rowcount_and_parallelism(spark):
    df = _gen(spark, 10_000, partitions=16)
    assert df.count() == 10_000
    assert df.rdd.getNumPartitions() == 16
    assert df.select("id").distinct().count() == 10_000


def test_seedgen_partitioning_invariant(spark):
    """Values derive from the GLOBAL row index: re-splitting the source
    must yield bit-identical data (the property scale/determinism
    tests rely on)."""
    a = _gen(spark, 5_000, partitions=4)
    b = _gen(spark, 5_000, partitions=13)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # different seed -> different data
    c = _gen(spark, 5_000, seed=8, partitions=4)
    assert a.exceptAll(c).count() > 0


def test_seedgen_composes_with_engine_operators(spark):
    """The source is a normal DataFrame: windows/aggregations over it
    run the engine's plans (here: per-user daily rollup)."""
    df = _gen(spark, 20_000, partitions=8)
    roll = (df.groupBy(F.date_trunc("day", "ts").alias("day"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum("value"), 2).alias("v")))
    assert roll.count() > 0
    assert roll.agg(F.sum("n")).collect()[0][0] == 20_000


def test_seedgen_arrow_path_matches_scalar_reference(spark):
    """The vectorized numpy mix must be bit-identical to the scalar
    splitmix64 reference the docstring promises."""
    import numpy as np

    from elt_gluepipeline_spark.sources.generate import (_mix_np, _row,
                                                         _splitmix64)

    idx = np.arange(0, 2000, dtype=np.uint64)
    vec = _mix_np(np.uint64(7 << 32) ^ idx)
    for i in (0, 1, 999, 1999):
        assert int(vec[i]) == _splitmix64((7 << 32) ^ i)
    # and through the DataFrame: row values equal the scalar derivation
    df = _gen(spark, 50, seed=7, partitions=3)
    got = {r.id: (r.user_id, r.ts, r.value) for r in df.collect()}
    for i in (0, 17, 49):
        _, uid, ts, val = _row(7, i)
        assert got[i] == (uid, ts, val)
