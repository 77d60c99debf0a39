"""Schema-contract enforcement (SURVEY.md §2.2 P1/P2/P10, §1.3).

The reference enforces a mid-pipeline column contract by adding
missing columns as typed nulls, casting everything per a type map,
projecting in canonical order, and repairing all-null NullType columns
to string (reference: scripts/go-quality-elt.py:173-225). Here that is
one reusable operator over a StructType — a single ``select`` so
Catalyst sees one projection (column pruning reaches the scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NullType, StructType


def normalize_names(df: DataFrame) -> DataFrame:
    """Lowercase/trim every column name (reference: go-transform-elt.py:185-201).

    One ``toDF`` — a pure projection rename, no shuffle.
    """
    return df.toDF(*[c.strip().lower() for c in df.columns])


def conform(df: DataFrame, schema: StructType) -> DataFrame:
    """Project ``df`` onto ``schema``: canonical order, casts, typed nulls.

    - column present → cast to the contract type
    - column missing → NULL literal of the contract type
    - source column of NullType → cast via string repair first
      (reference: go-quality-elt.py:212-216)
    - extra columns are dropped (contract projection)

    Idempotent: conform(conform(df, s), s) == conform(df, s).
    """
    existing = {f.name: f for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        src = existing.get(field.name)
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif isinstance(src.dataType, NullType):
            cols.append(F.col(field.name).cast("string").cast(field.dataType).alias(field.name))
        else:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def normalize_strings(df: DataFrame) -> DataFrame:
    """P11: lower+trim every StringType column in ONE projection
    (reference: go-quality-elt.py:82-86 normalizes join keys and labels
    in a single-pass select). Non-string columns pass through untouched;
    a single select keeps it one codegen stage over the scan."""
    return df.select(*[
        F.lower(F.trim(F.col(f.name))).alias(f.name)
        if f.dataType.typeName() == "string" else F.col(f.name)
        for f in df.schema.fields
    ])


def require_columns(df: DataFrame, required: list[str]) -> None:
    """Fail fast when contract columns are absent (go-transform-elt.py:190-193)."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise ValueError(f"missing required columns: {missing}; have {df.columns}")
