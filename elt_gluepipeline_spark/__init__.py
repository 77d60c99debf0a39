"""elt_gluepipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ELT pipeline
(Jayboy628/ELT_GluePipeline, surveyed in SURVEY.md): its operator
inventory (SURVEY.md §2), cleaning/quality/metric semantics, and
incremental-load machinery — plus the large-scale training-data
operators (dedup, similarity search, text analysis, multimodal
plumbing) a 100 TB pipeline needs.

Design rules (see SURVEY.md §7):
- DataFrame/SQL only; no RDDs. Catalyst/AQE do the physical planning.
- Classification/lookup state becomes broadcast-joined rule TABLES,
  not Python UDFs (SURVEY.md §2.9).
- Every declared query ships with a DuckDB-runnable SQL twin so the
  correctness oracle can hash-compare results (see plans/*.py).
- Aggregates over floating-point money columns go through exact
  DECIMAL(18,4) sums (helpers in functions/deterministic.py) so
  results are bit-stable across engines and partition orders.
"""

__version__ = "0.1.0"
