from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, IntegerType, StringType,
                               StructField, StructType)

from elt_gluepipeline_spark.functions.conform import (conform,
                                                      normalize_names,
                                                      require_columns)
import pytest

CONTRACT = StructType([
    StructField("a", StringType()),
    StructField("b", DoubleType()),
    StructField("c", IntegerType()),
])


def test_conform_adds_missing_casts_and_orders(spark):
    df = spark.createDataFrame([Row(b="1.5", a=2)])  # b needs cast, a needs cast, c missing
    out = conform(df, CONTRACT)
    assert out.columns == ["a", "b", "c"]
    row = out.collect()[0]
    assert row.a == "2" and row.b == 1.5 and row.c is None
    assert [f.dataType for f in out.schema.fields] == \
        [f.dataType for f in CONTRACT.fields]


def test_conform_drops_extras_and_is_idempotent(spark):
    df = spark.createDataFrame([Row(a="x", b=1.0, c=1, extra="drop me")])
    once = conform(df, CONTRACT)
    twice = conform(once, CONTRACT)
    assert once.columns == twice.columns == ["a", "b", "c"]
    assert once.collect() == twice.collect()


def test_conform_repairs_nulltype(spark):
    # all-null column comes back as NullType from createDataFrame
    df = spark.createDataFrame([(None,), (None,)], "a: void")
    out = conform(df, StructType([StructField("a", StringType())]))
    assert out.schema.fields[0].dataType == StringType()
    assert [r.a for r in out.collect()] == [None, None]


def test_normalize_names(spark):
    df = spark.createDataFrame([Row(x=1)]).toDF(" MiXeD Case ")
    assert normalize_names(df).columns == ["mixed case"]


def test_require_columns(spark):
    df = spark.createDataFrame([Row(a=1)])
    require_columns(df, ["a"])
    with pytest.raises(ValueError, match="missing required"):
        require_columns(df, ["a", "zz"])
