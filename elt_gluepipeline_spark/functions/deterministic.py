"""Deterministic (engine- and order-independent) numeric aggregates.

Floating-point SUM/AVG depend on accumulation order, so the same query
can hash differently between Spark partial aggregation and a DuckDB
oracle — or even between two Spark runs with different partitioning.
For money-like columns the fix is exact decimal arithmetic: quantize
to DECIMAL(18,4), sum exactly (decimal addition is associative and
commutative), then cast the final value back to DOUBLE. The result is
bit-identical no matter how the rows were partitioned or which engine
ran it.

Every compared query in plans/ uses these helpers; the matching
DuckDB oracle SQL uses the same CAST(SUM(CAST(x AS DECIMAL(18,4)))
AS DOUBLE) shape. At 100 TB decimal aggregation is still whole-stage
codegen'd (Spark decimal sums run on UnsafeRow long/Decimal128), so
the overhead is a constant factor on the agg, not a scalability risk.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale used to quantize money-ish doubles before exact aggregation.
MONEY = "decimal(18,4)"


def dec(col: Column | str) -> Column:
    """Quantize a double column to exact DECIMAL(18,4)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: Column | str) -> Column:
    """Order-independent SUM for money columns: exact decimal sum → double."""
    return F.sum(dec(col)).cast("double")


def davg(col: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count → double.

    (decimal AVG in Spark rounds to scale+4 like the oracle's does not;
    dividing the exact sum by the count in double space is deterministic
    and matches CAST(SUM(..) AS DOUBLE)/COUNT(x) in DuckDB.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB twin of dsum() for oracle SQL strings."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    """DuckDB twin of davg()."""
    return (
        f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(18,4))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )


def rnd0(col: Column | str, scale: int) -> Column:
    """ROUND that canonicalizes negative zero: a value in (-5e-(scale+1), 0)
    rounds to -0.0, which equals 0.0 as a double but prints as "-0.0" —
    and the oracle gate hash-compares STRING forms, so one engine
    emitting -0.0 where the other emits 0.0 is a spurious mismatch.
    IEEE -0.0 + 0.0 = +0.0 makes the form canonical in every engine.
    Use for any rounded column whose value can be negative."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c, scale) + F.lit(0.0)


def rnd0_sql(expr: str, scale: int) -> str:
    """DuckDB twin of rnd0()."""
    return f"(ROUND({expr}, {scale}) + 0.0)"
