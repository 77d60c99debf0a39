"""Table profiling: per-column null counts, exact NDV, and min/max in
ONE job — the warehouse ANALYZE/data-profiling surface the reference
approximates with ad-hoc pandas `.describe()` passes in its EDA
notebook (data_exploring/edafinal.ipynb cells 20-31, one driver pass
per column).

Scale shape: columns unpivot to (column_name, canonical_value) — a
map-side Expand, no shuffle — then a two-level aggregation computes
every statistic: groupBy(column, value) first (partial-agg friendly,
value space shards across reducers), then groupBy(column). This gets
EXACT per-column NDV without a COUNT(DISTINCT) Expand and without one
job per column; the shuffle carries (column, distinct value) pairs,
bounded by true cardinality, never row count.

Values canonicalize to strings deterministically per type (decimals
for doubles, fixed date formats) so min/max and the DuckDB oracle
hash-match; lexicographic min/max over the canonical form is the
documented contract (numeric min/max per type is a projection away).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def canonical_string(df: DataFrame, name: str) -> Column:
    """Deterministic, engine-portable string form of a column."""
    dt = df.schema[name].dataType
    c = F.col(name)
    if isinstance(dt, T.DoubleType) or isinstance(dt, T.FloatType):
        # decimal-quantized: both engines print DECIMAL(38,4) as
        # plain fixed-point, unlike raw doubles (shortest-repr
        # formatting differs on edge values). 38,4 represents
        # |v| < 1e34 — a narrower 18,2 overflowed |v| >= 1e16 to NULL
        # (non-ANSI cast), silently inflating n_nulls; values beyond
        # 1e34 would still do so, documented limit.
        return c.cast("decimal(38,4)").cast("string")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    if isinstance(dt, T.DateType):
        return F.date_format(c, "yyyy-MM-dd")
    return c.cast("string")


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One-pass profile: (column_name, n_rows, n_nulls, n_distinct,
    min_value, max_value) per column, exact, no per-column jobs."""
    cols = columns or df.columns
    long = df.select([
        F.struct(F.lit(c).alias("column_name"),
                 canonical_string(df, c).alias("v")).alias(f"_s{i}")
        for i, c in enumerate(cols)
    ]).select(F.explode(F.array(*[f"_s{i}" for i in range(len(cols))]))
               .alias("s")).select("s.column_name", "s.v")
    per_value = (long.groupBy("column_name", "v")
                     .agg(F.count(F.lit(1)).alias("cnt")))
    return (per_value.groupBy("column_name")
            .agg(F.sum("cnt").alias("n_rows"),
                 F.sum(F.when(F.col("v").isNull(), F.col("cnt"))
                        .otherwise(F.lit(0))).alias("n_nulls"),
                 F.count("v").alias("n_distinct"),
                 F.min("v").alias("min_value"),
                 F.max("v").alias("max_value")))
