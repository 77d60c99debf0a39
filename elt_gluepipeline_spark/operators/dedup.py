"""Deduplication operators for training-data pipelines: exact,
near-dup via n-gram Jaccard, MinHash+LSH, and SimHash.

Scale design:
- EXACT dedup is a hash-groupBy: one shuffle on a 128-bit digest, no
  full-text comparisons cross-partition (the digest is the shuffle key,
  so 100 TB of text moves only 16-byte keys + ids).
- NEAR-DUP never does all-pairs globally. Candidates come from a
  BLOCKING key (cheap, exact recall within block) or LSH BANDS
  (probabilistic recall tuned by bands×rows); only candidates are
  verified with the exact Jaccard. All-pairs appears solely WITHIN a
  bucket, and bucket size is bounded by the banding parameters.
- Everything is DataFrame ops: shingling/minhashing are higher-order
  array expressions (codegen), candidate joins are shuffle joins on
  bucket keys — the same plan a 1000-executor cluster wants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedupe(df: DataFrame, id_col: str, hash_col: Column) -> DataFrame:
    """Group rows by a content digest; keep min(id) as canonical.

    Returns (text_hash, canonical_id, n_copies). Join back on hash to
    materialize the deduped corpus.
    """
    return (df.select(hash_col.alias("text_hash"), F.col(id_col))
              .groupBy("text_hash")
              .agg(F.min(id_col).alias("canonical_id"),
                   F.count(F.lit(1)).alias("n_copies")))


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-grams as array<string> (empty-safe)."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(-1))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j + 1).cast("int"))
                                     for j in range(k)]),
    )
    return F.when(n < k, F.array().cast("array<string>")) \
            .otherwise(F.array_distinct(grams))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two DISTINCT-element arrays (set semantics);
    integer set sizes → deterministic double."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def blocked_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                          block_cols: list[Column], *, k: int = 3,
                          threshold: float = 0.4) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs WITHIN blocks.

    Blocking bounds the quadratic term: all-pairs only inside each
    block (self-join on block key with id_a < id_b). Recall is exact
    for any pair sharing a block; choose block_cols so near-dups
    collide (e.g. language + length bucket).
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), k).alias("shingles"),
        *[c.alias(f"_b{i}") for i, c in enumerate(block_cols)],
    )
    bkeys = [f"_b{i}" for i in range(len(block_cols))]
    a = base.select(*bkeys, F.col("doc_id").alias("id_a"),
                    F.col("shingles").alias("sh_a"))
    b = base.select(*bkeys, F.col("doc_id").alias("id_b"),
                    F.col("shingles").alias("sh_b"))
    pairs = a.join(b, bkeys).filter(F.col("id_a") < F.col("id_b"))
    return (pairs.withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
                 .filter(F.col("jaccard") >= threshold)
                 .select("id_a", "id_b", "jaccard"))


def minhash_signature(shingles: Column, n_hashes: int = 32) -> Column:
    """MinHash signature as array<long>: h_i = min over shingles of
    xxhash64(shingle, i). One pass over the shingle array per hash —
    codegen'd, no UDF."""
    return F.array(*[
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
        for i in range(n_hashes)
    ])


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str, *,
                      k: int = 3, n_hashes: int = 32, bands: int = 8,
                      threshold: float = 0.5) -> DataFrame:
    """MinHash + banded LSH candidate generation, exact-Jaccard verify.

    bands×rows = n_hashes; a pair becomes a candidate iff it collides
    in ≥1 band (P[candidate] ≈ 1-(1-j^r)^b). Candidates are found by a
    groupBy on (band_id, band_hash) — one shuffle keyed on band hashes,
    never all-pairs. Verification joins shingle arrays back by id.
    """
    rows_per_band = n_hashes // bands
    assert bands * rows_per_band == n_hashes, "bands must divide n_hashes"

    base = df.select(F.col(id_col).alias("doc_id"),
                     word_shingles(F.col(text_col), k).alias("shingles"))
    base = base.filter(F.size("shingles") > 0)
    sig = base.withColumn("sig", minhash_signature(F.col("shingles"), n_hashes))

    # explode into (band_id, band_hash, doc_id)
    band_entries = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band_id"),
                     F.xxhash64(*[F.element_at("sig", b * rows_per_band + r + 1)
                                  for r in range(rows_per_band)]).alias("band_hash"))
            for b in range(bands)
        ])).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")

    # candidate pairs: ids sharing a band bucket (dedup across bands)
    left = band_entries.select("band_id", "band_hash", F.col("doc_id").alias("id_a"))
    right = band_entries.select("band_id", "band_hash", F.col("doc_id").alias("id_b"))
    cand = (left.join(right, ["band_id", "band_hash"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())

    # verify with exact Jaccard
    sh_a = base.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = base.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (cand.join(sh_a, "id_a").join(sh_b, "id_b")
                .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
                .filter(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))


def simhash64(text: Column) -> Column:
    """64-bit SimHash over whitespace tokens: per-bit vote of token
    xxhash64 bits, sign-aggregated. Near-dups differ in few bits
    (compare with hamming ≤ r via band trick). Pure higher-order
    expressions; Spark-only semantics (xxhash64)."""
    toks = F.split(F.trim(text), r"\s+")
    # bit positions are unrolled as literals (shiftright/shiftleft take
    # literal bit counts); the per-token loop stays a codegen'd fold
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[
                F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1,
                       F.lit(1).cast("long")).otherwise(F.lit(-1).cast("long"))
                for b in range(64)
            ]),
            lambda x, y: x + y,
        ),
    )
    out = F.lit(0).cast("long")
    for b in range(64):
        out = out.bitwiseOR(
            F.when(F.element_at(votes, b + 1) > 0,
                   F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long")))
    return out
