"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship query; queries()/oracle_sql() expose every
declared query from SURVEY.md §2.10 plus the training-data extension
operators, with DuckDB oracle twins where SQL-expressible (see
elt_gluepipeline_spark/plans/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from elt_gluepipeline_spark.plans import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: top locations by revenue
    (joins + distinct-count agg + ranking — SURVEY.md §2.10 Q8)."""
    from elt_gluepipeline_spark.plans.reference import q08_top_locations
    return q08_top_locations(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator (SURVEY.md §2)."""
    return {name: spec.build for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL twin for every SQL-expressible query. Omitted keys
    (LSH/SimHash — probabilistic or Spark-hash-specific) get the
    driver's rows-only check."""
    return {name: spec.oracle for name, spec in registry().items()
            if spec.oracle is not None}
