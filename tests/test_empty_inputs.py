"""Degenerate-input robustness: every declared query must plan and run
against EMPTY tables (same schemas, zero rows) without raising —
empty-group percentiles, empty windows, empty LSH/GEMM matrices, empty
streams. The 100 TB failure mode this guards: one empty partition or an
empty incremental window taking down a whole pipeline run."""

import pytest

from elt_gluepipeline_spark.plans import registry
from elt_gluepipeline_spark.sources.readers import TESTDATA_TABLES, read_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    for name in TESTDATA_TABLES:
        df = read_table(spark, SF, name)
        if name == "events":
            # keep the physical shape read_table expects (nanos-as-long)
            df = df.selectExpr(
                "event_id", "CAST(0 AS LONG) AS ts", "user_id",
                "event_type", "value", "props")
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{name}.parquet"))
    return str(out)


# queries whose INPUT is not the sf_dir tables: q130 reads the seedgen
# generator source (its rows exist by construction — "empty tables"
# doesn't apply; its own degenerate case is rows=0, covered below)
_TABLE_FREE = {"q130_generated_rollup"}


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = {}
    for name, spec in sorted(registry().items()):
        if name in _TABLE_FREE:
            continue
        try:
            n = spec.build(spark, empty_sf_dir).count()
            assert n == 0, f"{name} fabricated {n} rows from nothing"
        except AssertionError:
            raise
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures[name] = repr(e)[:200]
    assert not failures, failures


def test_seedgen_zero_rows_is_empty(spark):
    """q130's own degenerate case: a rows=0 generator source yields an
    empty frame and the rollup shape survives it."""
    from pyspark.sql import functions as F

    from elt_gluepipeline_spark.sources.generate import SeedGen

    spark.dataSource.register(SeedGen)
    df = (spark.read.format("seedgen")
               .option("rows", 0).option("partitions", 4).load())
    assert df.count() == 0
    assert (df.groupBy(F.date_trunc("hour", "ts"))
              .count().count()) == 0
