"""Relational/dataflow operators (SURVEY.md §2.3-2.6) plus the
training-data extension operators (dedup, similarity, text analysis,
multimodal plumbing). All are pure DataFrame → DataFrame functions."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only if the plan has fewer partitions than the
    cluster's default parallelism.

    Expression-heavy per-row operators (shingling, hashing, decode
    UDFs) are CPU-bound; a small single-row-group parquet file scans as
    ONE partition and serializes the whole stage. At real scale the
    input already has >= parallelism splits and this is a no-op — the
    repartition only fires on pathologically under-split inputs.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
