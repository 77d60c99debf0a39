"""Scalar-function layer: deterministic aggregates, schema conform,
name normalization, cleaning expression builders, text statistics.

Everything here returns Column expressions or DataFrame→DataFrame
functions built from pyspark.sql.functions — JVM-side, codegen-friendly.
Python UDFs are deliberately absent (SURVEY.md §2.9: every reference
UDF is re-expressed as native expressions or broadcast joins).
"""
