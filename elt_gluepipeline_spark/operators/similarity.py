"""Similarity search over embedding columns (array<float>).

Two paths, one contract:
- ``knn_bruteforce`` — exact top-k cosine. The candidate side stays
  partitioned; the (small) query side broadcasts, so the cross product
  is a broadcast nested-loop that streams candidates once. Per-query
  top-k via ranked window on the query id. Right for reranking or
  small query sets; O(|Q|·|N|) compute but no shuffle of the corpus.
- ``lsh_ann`` — sign-random-projection LSH: deterministic hyperplanes
  (seeded), bucket by sign-bit signature, search only within buckets.
  Sub-linear candidates at the cost of recall; the scale path when |Q|
  is large. Misses are possible by construction (rows-only check).

Dot products are higher-order array expressions in double precision —
deterministic, codegen'd, no Python. For very wide vectors (≥1k dims)
a pandas_udf BLAS path can slot behind the same signature.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import top_n_per_key


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def knn_bruteforce(queries: DataFrame, candidates: DataFrame, k: int, *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_to: int = 6) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-matches excluded).

    Output: (query_id, neighbor_id, cosine) with cosine rounded to
    ``round_to`` decimals — rounding happens BEFORE ranking so ordering
    is reproducible across engines; ties break on neighbor_id.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("q_vec"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"),
                          _as_double(F.col(vec_col)).alias("c_vec"))
    scored = (c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
               .withColumn("cosine",
                           F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to)))
    top = top_n_per_key(scored, ["query_id"],
                        [F.col("cosine").desc(), F.col("neighbor_id")], k)
    return top.select("query_id", "neighbor_id", "cosine")


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side, tiny)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def signature_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of a vector against fixed hyperplanes → long."""
    bits = []
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bit = F.when(dot(vec, p) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        bits.append(bit)
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_ann(queries: DataFrame, candidates: DataFrame, k: int, *,
            dim: int, n_planes: int = 8, seed: int = 42,
            id_col: str = "vec_id", vec_col: str = "embedding",
            round_to: int = 6) -> DataFrame:
    """Approximate top-k: candidates considered only when their sign
    signature equals the query's (one shuffle on the signature; at
    scale add multi-probe or fewer planes for recall)."""
    planes = _hyperplanes(dim, n_planes, seed)
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("q_vec"))
    q = q.withColumn("sig", signature_col(F.col("q_vec"), planes))
    c = candidates.select(F.col(id_col).alias("neighbor_id"),
                          _as_double(F.col(vec_col)).alias("c_vec"))
    c = c.withColumn("sig", signature_col(F.col("c_vec"), planes))
    scored = (c.join(F.broadcast(q), "sig")
               .filter(F.col("neighbor_id") != F.col("query_id"))
               .withColumn("cosine",
                           F.round(cosine(F.col("q_vec"), F.col("c_vec")), round_to)))
    top = top_n_per_key(scored, ["query_id"],
                        [F.col("cosine").desc(), F.col("neighbor_id")], k)
    return top.select("query_id", "neighbor_id", "cosine")
