"""Count-min sketch — mergeable frequency estimation (SURVEY
extension, same family as the Bloom filter artifact and the
histogram-quantile summary: bounded state, map-side combinable,
engine-replayable).

Why at 100 TB: exact per-key counts over a heavy-tailed key space
shuffle one row per DISTINCT key; a count-min sketch is depth×width
integers no matter the cardinality, merges by cell-wise addition
(partial aggregation does it for free), and answers point queries
with a one-sided error: est ≥ true, est ≤ true + εN with probability
1−δ (ε = e/width, δ = e^-depth — Cormode & Muthukrishnan 2005,
public). Row hashes are md5-derived (portable_hash60), so a DuckDB
oracle replays every cell and every estimate exactly — the
probabilistic structure gets a deterministic gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash60


def _cms_col(key: Column, row: int, width: int, seed: int) -> Column:
    h = portable_hash60(
        F.concat_ws("#", key, F.lit(str(row)), F.lit(str(seed))))
    return F.pmod(h, F.lit(width))


def cms_fit(df: DataFrame, key_col: str, *, depth: int = 4,
            width: int = 256, seed: int = 11) -> DataFrame:
    """Build the sketch: (row, col, cnt) cells, ≤ depth·width rows.

    Keys pre-aggregate per key FIRST (one shuffle bounded by distinct
    keys), then each key's count lands in one cell per row — the
    explode multiplies the already-aggregated table, never the raw
    rows. For a truly unbounded key space swap the pre-aggregate for
    direct cell accumulation (explode raw rows, partial-agg combines
    per cell map-side); same output, chosen by data shape.
    """
    key = F.col(key_col)
    per_key = df.groupBy(key.alias("_k")) \
                .agg(F.count(F.lit(1)).alias("_n"))
    cells = per_key.select(
        "_n",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _cms_col(F.col("_k"), r, width, seed).alias("col"))
            for r in range(depth)])).alias("_c"))
    return (cells.groupBy(F.col("_c.row").alias("row"),
                          F.col("_c.col").alias("col"))
                 .agg(F.sum("_n").cast("long").alias("cnt")))


def cms_estimate(probes: DataFrame, key_col: str, cms: DataFrame, *,
                 depth: int = 4, width: int = 256, seed: int = 11,
                 est_col: str = "est_n") -> DataFrame:
    """Point-query the sketch: probes gain ``est_col`` = min over the
    depth cells (missing cell = 0). The sketch broadcasts (≤
    depth·width rows); probes never shuffle."""
    key = F.col(key_col)
    pk = probes.select(key.alias("_k")).distinct().select(
        "_k",
        F.explode(F.array(*[
            F.struct(F.lit(r).alias("row"),
                     _cms_col(F.col("_k"), r, width, seed).alias("col"))
            for r in range(depth)])).alias("_c")) \
        .select("_k", "_c.row", "_c.col")
    est = (pk.join(F.broadcast(cms), ["row", "col"], "left")
             .groupBy("_k")
             .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long")
                   .alias(est_col)))
    return probes.join(est, probes[key_col] == est["_k"]).drop("_k")


def cms_sql_col(key_expr: str, row: int, width: int, seed: int) -> str:
    """DuckDB twin of _cms_col — embed in oracle SQL."""
    h = (f"CAST(('0x' || substr(md5(concat_ws('#', {key_expr}, "
         f"'{row}', '{seed}')), 1, 15)) AS BIGINT)")
    return f"(({h}) % {width} + {width}) % {width}"
