"""Generated dimension tables.

The reference ships a 365-row calendar CSV (dataset/date_dim.csv:
date_key, year, month, week, day_of_week, is_weekend, …) and
broadcast-joins facts to it (J2, go-quality-elt.py:288-291). An engine
shouldn't depend on a hand-maintained file for a derivable dimension:
``date_dimension`` generates any date range as one sequence+explode —
a few KB even for a century, so the join side always broadcasts.

Day-of-week is ISO (Mon=1..Sun=7) — pinned explicitly because engines
disagree on weekday numbering (Spark dayofweek is Sun=1; DuckDB
isodow is Mon=1), and is_weekend derives from it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_dimension(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Calendar dimension for [start, end] inclusive (ISO date strings).

    Columns: date (date), date_key ('dd-MM-yyyy', the reference CSV's
    format), year, month, week (ISO), iso_dow (Mon=1..Sun=7),
    is_weekend.
    """
    days = F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
    df = spark.range(1).select(F.explode(days).alias("date"))
    iso_dow = ((F.dayofweek("date") + 5) % 7 + 1).cast("int")
    return df.select(
        "date",
        F.date_format("date", "dd-MM-yyyy").alias("date_key"),
        F.year("date").cast("int").alias("year"),
        F.month("date").cast("int").alias("month"),
        F.weekofyear("date").cast("int").alias("week"),
        iso_dow.alias("iso_dow"),
        (iso_dow >= 6).alias("is_weekend"),
    )
