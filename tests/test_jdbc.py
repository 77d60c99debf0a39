"""Embedded-JDBC smoke tests for the S1/S2/S8/S9 surface, using the
Derby driver that ships inside Spark's own jars — a real database
round-trip (DDL-from-data, batch insert, full scan, typed-watermark
pushdown) with no external service.

Derby is STRICT about type comparisons, which is exactly the point:
the old string-interpolated watermark (`wm > '5'` against an INT
column) fails here, proving the typed-literal rendering
(sources.readers.sql_literal) is load-bearing, not cosmetic.
"""

import datetime as dt

import pytest

from elt_gluepipeline_spark.sources.readers import (read_jdbc_incremental,
                                                    read_jdbc_table,
                                                    sql_literal)
from elt_gluepipeline_spark.sources.writers import write_jdbc

DRIVER = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def _seed(spark, url, table="events_src"):
    # Column names are UPPERCASE on purpose: Spark's JDBC writer
    # creates QUOTED identifiers, and Derby folds the unquoted names in
    # our watermark predicate to uppercase — the ANSI folding rule any
    # strict database applies.
    df = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 1, 8, 0, 0), "click"),
         (2, 20, dt.datetime(2024, 1, 1, 9, 0, 0), "view"),
         (3, 30, dt.datetime(2024, 1, 2, 10, 0, 0), "click")],
        "EVENT_ID int, AMOUNT int, TS timestamp, KIND string")
    # S8 sink + S9 DDL-from-data: overwrite creates the table with
    # types inferred from the frame (VARCHAR override for the string)
    write_jdbc(df, url, table, mode="overwrite", properties=DRIVER,
               create_table_column_types="KIND VARCHAR(16)")
    return df


def test_jdbc_roundtrip_full_scan(spark, derby_url):
    df = _seed(spark, derby_url)
    back = read_jdbc_table(spark, derby_url, "events_src", properties=DRIVER)
    assert sorted(r.EVENT_ID for r in back.collect()) == [1, 2, 3]
    assert dict(back.dtypes)["AMOUNT"] == "int"
    assert {tuple(r) for r in back.select("EVENT_ID", "KIND").collect()} == \
           {(1, "click"), (2, "view"), (3, "click")}
    assert back.count() == df.count()


def test_jdbc_incremental_numeric_watermark(spark, derby_url):
    _seed(spark, derby_url)
    # numeric bookmark renders BARE — Derby rejects INT > 'string'
    inc = read_jdbc_incremental(spark, derby_url, "events_src",
                                "event_id", 1, properties=DRIVER)
    assert sorted(r.EVENT_ID for r in inc.collect()) == [2, 3]


def test_jdbc_incremental_timestamp_watermark(spark, derby_url):
    _seed(spark, derby_url)
    inc = read_jdbc_incremental(spark, derby_url, "events_src", "ts",
                                dt.datetime(2024, 1, 1, 9, 0, 0),
                                properties=DRIVER)
    assert [r.EVENT_ID for r in inc.collect()] == [3]


def test_jdbc_incremental_none_reads_all(spark, derby_url):
    _seed(spark, derby_url)
    assert read_jdbc_incremental(spark, derby_url, "events_src",
                                 "event_id", None,
                                 properties=DRIVER).count() == 3


def test_sql_literal_rendering():
    assert sql_literal(5) == "5"
    assert sql_literal(2.5) == "2.5"
    assert sql_literal(True) == "TRUE"
    assert sql_literal(dt.date(2024, 3, 1)) == "{d '2024-03-01'}"
    assert sql_literal(dt.datetime(2024, 3, 1, 12, 30, 0, 500)) == \
        "{ts '2024-03-01 12:30:00.000500'}"  # full us precision kept
    assert sql_literal("o'brien") == "'o''brien'"


def test_jdbc_partitioned_parallel_read(spark, derby_url):
    """S1 parallel path actually EXECUTED: partitionColumn/bounds with
    numPartitions > 1 against live Derby (embedded Derby supports
    concurrent connections within one JVM). Asserts (a) the scan is
    split into the requested partitions, (b) Spark generated disjoint
    per-partition range predicates covering everything exactly once —
    the union equals the table, multiset-exact."""
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 101)], "PK int, VAL int")
    write_jdbc(df, derby_url, "parts_src", mode="overwrite",
               properties=DRIVER)
    back = read_jdbc_table(spark, derby_url, "parts_src",
                           properties=DRIVER, partition_column="PK",
                           num_partitions=4, lower_bound=1,
                           upper_bound=101)
    # the reader plan carries one JDBC partition per stride
    assert back.rdd.getNumPartitions() == 4
    # every partition did real work (bounds split 1..101 into 4 strides
    # of 25 over pk 1..100)
    sizes = sorted(back.rdd.mapPartitions(
        lambda it: [sum(1 for _ in it)]).collect())
    assert sum(sizes) == 100 and len(sizes) == 4
    assert all(s > 0 for s in sizes)
    # disjoint + complete: no row lost or duplicated by the predicates
    got = sorted(r.PK for r in back.collect())
    assert got == list(range(1, 101))
    assert sorted(r.VAL for r in back.collect()) == \
        [i * 10 for i in range(1, 101)]


def test_jdbc_partitioned_read_skewed_bounds(spark, derby_url):
    """Bounds narrower than the data: Spark's first/last partitions
    are unbounded (pk < low stride, pk >= high stride), so rows outside
    [lowerBound, upperBound) must still ALL arrive — the bounds shape
    parallelism, never filter."""
    df = spark.createDataFrame(
        [(i, i) for i in range(1, 51)], "PK int, VAL int")
    write_jdbc(df, derby_url, "parts_skew", mode="overwrite",
               properties=DRIVER)
    back = read_jdbc_table(spark, derby_url, "parts_skew",
                           properties=DRIVER, partition_column="PK",
                           num_partitions=3, lower_bound=20,
                           upper_bound=30)
    assert back.rdd.getNumPartitions() == 3
    assert sorted(r.PK for r in back.collect()) == list(range(1, 51))
