"""Round-8 operator units: Unicode script profiling and the Z-order
bucket arithmetic backing q194/q197 (the gate certifies them end-to-end
against DuckDB; these pin the operator-level contracts directly)."""

from pyspark.sql import functions as F

from elt_gluepipeline_spark.operators.textstats import (SCRIPT_RANGES,
                                                        dominant_script,
                                                        script_char_count)
from elt_gluepipeline_spark.sources.writers import zorder_key


def test_script_char_count_known_mix(spark):
    df = spark.createDataFrame(
        [("abc таблица 查询 بيانات 123",)], ["t"])
    got = df.select(*[
        script_char_count(F.col("t"), rng).alias(name)
        for name, rng in SCRIPT_RANGES]).first()
    assert got.latin == 3          # 'abc'
    assert got.cyrillic == 7       # 'таблица'
    assert got.cjk == 2            # '查询'
    assert got.arabic == 6         # 'بيانات'


def test_dominant_script_priority_chain(spark):
    rows = [("ab",), ("яя",), ("яя查查",), ("",)]
    df = spark.createDataFrame(rows, ["t"])
    counts = {name: script_char_count(F.col("t"), rng)
              for name, rng in SCRIPT_RANGES}
    got = [r.d for r in df.select(dominant_script(counts).alias("d"))
                          .collect()]
    # ties resolve to the earlier non-Latin script; all-zero (empty /
    # whitespace / digits-only docs) routes to latin, not cyrillic
    assert got == ["latin", "cyrillic", "cyrillic", "latin"]


def test_zorder_bucket_is_quadtree_cell(spark):
    # 6 bits/dim, top 2 bits/dim -> bucket = 4x4 grid cell of (x,y):
    # bucket bits are (y5 x5 y4 x4)
    df = spark.createDataFrame(
        [(0, 0), (63, 63), (0, 63), (17, 40)], ["x", "y"])
    got = (df.select("x", "y", F.shiftright(
               zorder_key(F.col("x"), F.col("y"), bits=6), 8)
               .alias("b"))
             .collect())
    cell = {(r.x, r.y): r.b for r in got}
    assert cell[(0, 0)] == 0
    assert cell[(63, 63)] == 15           # (11,11) interleaved
    assert cell[(0, 63)] == 0b1010        # y bits at odd positions
    # x=17 -> x5x4=01, y=40 -> y5y4=10 -> (y5 x5 y4 x4) = 1001
    assert cell[(17, 40)] == 0b1001
