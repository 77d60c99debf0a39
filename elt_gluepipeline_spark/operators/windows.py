"""Window operators (SURVEY.md §2.5 W1-W4, §2.6 O1).

Scale notes baked in:
- dedupe/top-n partition by the entity key, so the shuffle is the
  unavoidable one (by key) and no single task sees more than one key
  group's rows.
- the reference's global rank (W4: row_number over an UNPARTITIONED
  window, go-metric-elt.py:245) funnels the whole table through one
  task; ``ranked()`` here keeps that shape ONLY for provably-small
  inputs (post-aggregation tables), and ``top_n_global`` gives the
  scale-safe orderBy+limit alternative (TakeOrderedAndProject — a
  per-partition heap + driver merge, no single-partition shuffle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedupe_keep_latest(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column],
                       tie_breakers: Sequence[Column] = ()) -> DataFrame:
    """W1/T3: keep the newest row per key (reference:
    go-incremental-ingest-elt.py:207-212 — row_number over
    PARTITION BY pk ORDER BY watermark DESC NULLS LAST, keep rn=1).

    ``order_by`` should already be desc() columns; pass unique
    ``tie_breakers`` for deterministic output when watermarks collide.
    One shuffle by key; no driver round-trips.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by, *tie_breakers)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1)
              .drop("_rn"))


def top_n_per_key(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column],
                  n: int) -> DataFrame:
    """O1 (per-key variant): top-N rows per key via ranked window
    (reference dashboard's top_n_by_restaurant,
    streamlit/go_streamlit.py:163-177). Shuffles once by key; rank
    filter is pushed into the window operator (WindowGroupLimit in
    Spark 3.5+/4.x keeps only N rows per key per partition before the
    final sort — no full materialization)."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_by)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= n)
              .drop("_rn"))


def top_n_global(df: DataFrame, order_by: Sequence[Column], n: int) -> DataFrame:
    """Scale-safe global top-N: orderBy+limit compiles to
    TakeOrderedAndProject (per-partition heaps, driver-side merge of
    N-row heaps) instead of a single-partition window."""
    return df.orderBy(*order_by).limit(n)


def ranked(df: DataFrame, order_by: Sequence[Column], rank_col: str = "rank") -> DataFrame:
    """W4: global dense ranking column. Single-partition window — use
    ONLY on post-aggregation tables whose cardinality is bounded (e.g.
    per-restaurant rollups). For raw-fact ranking use top_n_global."""
    w = Window.orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w))


def lag_features(df: DataFrame, keys: Sequence[str], order_col: str,
                 lag_cols: dict[str, str]) -> DataFrame:
    """W2/W3: per-entity lag columns (reference: go-metric-elt.py:132-139
    order-gap and %-change lags). ``lag_cols`` maps new_name → source col.
    One window, one shuffle, all lags computed in a single pass."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(F.col(order_col))
    out = df
    for new_name, src in lag_cols.items():
        out = out.withColumn(new_name, F.lag(F.col(src)).over(w))
    return out
