"""Sampling-based schema inference for string-typed CSV ingest
(SURVEY.md §2.7 F17-F18; reference: rds/load_to_sqlserver.py:89-147,
195-222).

The reference loads CSV with every column as string, then infers SQL
types from the string values: regex classifiers for int / decimal /
scientific / boolean, comma-stripped numerics, a >=90%-parseable rule
for datetimes, BIGINT vs INT by magnitude, DECIMAL(18, s) with observed
scale, and all-null columns defaulting to string. This module
re-expresses those rules over a bounded sample (driver-side — the
sample is fixed-size regardless of table size, so inference cost does
not grow with the data), producing a Spark StructType that
``apply_inferred_schema`` then casts with the same value-coercion rules
the loader used on write (bool-ish token mapping, comma-stripped
numerics, half-up decimal rounding).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, DataType, DecimalType, DoubleType,
                               IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

_INT_RE = re.compile(r"^[+-]?\d{1,3}(,\d{3})*$|^[+-]?\d+$")
_DEC_RE = re.compile(r"^[+-]?\d{1,3}(,\d{3})*\.\d+$|^[+-]?\d*\.\d+$")
_SCI_RE = re.compile(r"^[+-]?\d+(\.\d+)?[eE][+-]?\d+$")
_BOOL_TOKENS = {"true", "false", "t", "f", "yes", "no", "y", "n", "0", "1"}
_TRUE_TOKENS = {"1", "true", "t", "yes", "y"}
_DT_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d+)?)?)?$"
    r"|^\d{2}[-/]\d{2}[-/]\d{4}([ T]\d{2}:\d{2}(:\d{2})?)?$")

_INT32_MAX = 2**31 - 1
DATETIME_RULE = 0.9  # >=90% parseable ⇒ timestamp (loader :103-109)


def _strip_commas(v: str) -> str:
    return v.replace(",", "")


def classify_value(v: str) -> str:
    """Classify one non-null string value (loader's regex rules)."""
    s = v.strip()
    if s == "":
        return "null"
    if _INT_RE.match(s):
        return "int"
    if _DEC_RE.match(s) or _SCI_RE.match(s):
        return "dec"
    if s.lower() in _BOOL_TOKENS:
        return "bool"
    if _DT_RE.match(s):
        return "datetime"
    return "str"


def _column_type(values: list[str | None]) -> DataType:
    non_null = [v for v in (x.strip() if x is not None else None for x in values)
                if v not in (None, "")]
    if not non_null:
        return StringType()  # all-null repair (NullType→string rule)
    kinds = [classify_value(v) for v in non_null]
    n = len(kinds)
    if sum(k == "datetime" for k in kinds) / n >= DATETIME_RULE:
        return TimestampType()
    # 0/1 are both int-ish and bool-ish; only call it boolean when a
    # non-numeric boolean token appears or everything is bool-classified
    if all(k == "bool" for k in kinds) and any(
            v.lower() in _BOOL_TOKENS - {"0", "1"} for v in non_null):
        return BooleanType()
    if all(k in ("int", "bool") for k in kinds) and all(
            v.lstrip("+-").replace(",", "").isdigit() for v in non_null):
        big = any(abs(int(_strip_commas(v))) > _INT32_MAX for v in non_null)
        return LongType() if big else IntegerType()
    if all(k in ("int", "dec", "bool") for k in kinds):
        if any(k == "dec" for k in kinds):
            sci = any(_SCI_RE.match(v) for v in non_null)
            if sci:
                return DoubleType()
            scale = max((len(v.split(".")[1]) for v in non_null if "." in v),
                        default=0)
            return DecimalType(18, min(scale, 17))
    return StringType()


def infer_schema(df: DataFrame, sample_rows: int = 10_000) -> StructType:
    """Infer a typed schema for an all-string frame from a bounded
    sample. Column order preserved; unknown/mixed → string (safe)."""
    sample = df.limit(sample_rows).collect()
    fields = []
    for i, name in enumerate(df.columns):
        values = [row[i] for row in sample]
        fields.append(StructField(name, _column_type(values), True))
    return StructType(fields)


def apply_inferred_schema(df: DataFrame, schema: StructType) -> DataFrame:
    """Cast a string frame to an inferred schema with the loader's
    value-coercion rules (F18): bool-ish token map, comma-stripped
    numerics, empty-string → null. One projection, codegen'd."""
    cols = []
    for field in schema.fields:
        c = F.trim(F.col(field.name))
        c = F.when(c == "", None).otherwise(c)
        t = field.dataType
        if isinstance(t, BooleanType):
            expr = F.lower(c).isin(*sorted(_TRUE_TOKENS))
            expr = F.when(c.isNull(), None).otherwise(expr)
        elif isinstance(t, (IntegerType, LongType, DecimalType, DoubleType)):
            expr = F.regexp_replace(c, ",", "").cast(t)
        else:
            expr = c.cast(t)
        cols.append(expr.alias(field.name))
    return df.select(*cols)
