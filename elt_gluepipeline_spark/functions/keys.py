"""Deterministic surrogate keys (SURVEY.md §2.7 F15-F16).

The reference's loader derives a sha256 ``__pk`` from resolved business
keys with null normalization (rds/load_to_sqlserver.py:40-65,23-26) so
re-ingest of the same row yields the same key — that property (idempotent
replays dedupe cleanly, W1/T3) is what the incremental pipeline relies
on. Engine-portable: sha256 over a canonical string is identical in
Spark, DuckDB, and any warehouse.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Canonical stand-in for NULL inside the hashed key string. Must be a
# value that cannot appear in real key data after cast-to-string.
NULL_TOKEN = "␀"  # ␀ SYMBOL FOR NULL
SEP = "||"


def surrogate_key(table: str, cols: Sequence[str | Column]) -> Column:
    """sha256 hex over 'table||k1||k2||…' with nulls normalized.

    Column order is part of the key definition (pass business keys in
    canonical order). Pure projection — codegen'd, no shuffle; safe to
    compute during ingest at any scale.
    """
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"),
                   F.lit(NULL_TOKEN))
        for c in cols
    ]
    return F.sha2(F.concat_ws(SEP, F.lit(table), *parts), 256)


def surrogate_key_sql(table: str, cols: Sequence[str]) -> str:
    """DuckDB twin of surrogate_key() for oracle SQL strings."""
    parts = ", ".join(
        f"coalesce(CAST({c} AS VARCHAR), '{NULL_TOKEN}')" for c in cols)
    return f"sha256(concat_ws('{SEP}', '{table}', {parts}))"


def with_row_fingerprint(df: DataFrame, table: str,
                         pk_col: str = "__pk") -> DataFrame:
    """Full-row variant (reference fallback when no business keys are
    configured): hash every column in sorted-name order."""
    cols = sorted(df.columns)
    return df.withColumn(pk_col, surrogate_key(table, cols))
