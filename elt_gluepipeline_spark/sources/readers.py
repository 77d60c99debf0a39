"""Readers (SURVEY.md §2.1 S1-S4, S10).

All readers return plain DataFrames and keep the scan declarative so
Catalyst can push filters/projections into the source (parquet
PushedFilters; JDBC WHERE pushdown). The JDBC paths are written for a
real database but are exercised in tests only where a JDBC driver is
available — the testdata pipeline is parquet-first.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver's TPC-H-ish testdata tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S3/S10: parquet scan with native Hive-partition discovery.

    Spark discovers ``key=value`` directories and reattaches partition
    columns automatically (the reference hand-rolled this,
    streamlit/go_streamlit.py:21-63 — native discovery replaces it).
    """
    return spark.read.parquet(path)


# Parquet TIMESTAMP(NANOS) columns per table: Spark has no ns timestamp
# type, so these are read as long (nanosAsLong) and normalized to
# microsecond timestamps (truncation — matching a DuckDB
# CAST(ts AS TIMESTAMP) oracle twin).
NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, e.g. read_table(spark, '/root/testdata/sf0.01', 'lineitem')."""
    nanos_cols = NANOS_TS_COLUMNS.get(name, ())
    if nanos_cols:
        # runtime-settable legacy conf; needed because the driver's own
        # session won't have it at build time
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # naive parquet timestamps must stay timezone-naive (TIMESTAMP_NTZ)
    # so formatted output is session-timezone-independent
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            # ns → µs as NTZ via pure arithmetic on an NTZ epoch:
            # timezone-independent (timestamp_micros() would build an
            # instant that renders shifted under non-UTC sessions)
            df = df.withColumn(
                c, F.expr(f"timestampadd(MICROSECOND, {c} div 1000, "
                          f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    """Load several tables and register each as a temp view (so every
    declared query also runs via spark.sql — SURVEY.md §7.1 engine/sql)."""
    out: dict[str, DataFrame] = {}
    for n in names:
        df = read_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out


def read_csv(spark: SparkSession, path: str, *, infer: bool = False,
             schema=None) -> DataFrame:
    """S4: CSV scan. Default is typed-as-string (matching the loader's
    ``dtype=str`` read, rds/load_to_sqlserver.py:270); pass infer=True
    for Spark's sampler or an explicit schema for a contract."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jdbc_table(spark: SparkSession, url: str, table: str,
                    properties: dict[str, str] | None = None,
                    partition_column: str | None = None,
                    num_partitions: int = 8,
                    lower_bound=None, upper_bound=None) -> DataFrame:
    """S1: full JDBC table scan (reference: scripts/go-ingest-elt.py:30-45).

    At scale, pass partition_column/bounds so the read parallelizes
    across executors instead of a single connection.
    """
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    return reader.load()


def read_jdbc_incremental(spark: SparkSession, url: str, table: str,
                          watermark_column: str, last_value,
                          properties: dict[str, str] | None = None) -> DataFrame:
    """S2/T1: high-watermark pushdown scan (reference:
    go-incremental-ingest-elt.py:162-195). The predicate is evaluated in
    the source database, not in Spark — bookmark values live outside the
    plan, so the explicit query form is the right call (SURVEY.md §4).
    """
    if last_value is None:
        query = f"SELECT * FROM {table}"
    else:
        query = f"SELECT * FROM {table} WHERE {watermark_column} > '{last_value}'"
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("query", query))
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
