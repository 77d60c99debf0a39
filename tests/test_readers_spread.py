"""spread_if_narrow (round-11 optimization): a narrow single-file scan
is fanned out to defaultParallelism, WITHOUT losing scan-level filter
pushdown or column pruning; a scan whose estimated task count already
covers the cores is left untouched."""

from __future__ import annotations

from elt_gluepipeline_spark.sources.readers import (read_table,
                                                    spread_if_narrow)


def test_spread_widens_narrow_scan(spark, sf_dir):
    df = read_table(spark, sf_dir, "documents", spread=True)
    assert df.rdd.getNumPartitions() == \
        spark.sparkContext.defaultParallelism


def test_spread_preserves_pushdown_and_pruning(spark, sf_dir):
    from pyspark.sql import functions as F
    df = (read_table(spark, sf_dir, "documents", spread=True)
          .filter(F.col("doc_id") > 10).select("doc_id"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the filter must reach the parquet scan below the repartition
    assert "PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]" \
        in plan
    # and the scan must read only the projected column
    assert "ReadSchema: struct<doc_id:bigint>" in plan


def test_spread_noop_when_scan_wide_enough(spark, sf_dir, monkeypatch):
    # force the size estimate to look like a many-task table: the
    # repartition must NOT fire (the 100 TB no-op guarantee)
    import elt_gluepipeline_spark.sources.readers as readers
    monkeypatch.setattr(readers, "_table_bytes",
                        lambda path: 10 * (1 << 40))
    df = read_table(spark, sf_dir, "documents", spread=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_spread_results_identical(spark, sf_dir):
    a = read_table(spark, sf_dir, "documents").orderBy("doc_id")
    b = read_table(spark, sf_dir, "documents", spread=True) \
        .orderBy("doc_id")
    assert a.collect() == b.collect()


def test_spread_if_narrow_missing_path(spark, sf_dir):
    df = read_table(spark, sf_dir, "documents")
    out = spread_if_narrow(spark, df, "/nonexistent/nowhere.parquet")
    assert out is df
