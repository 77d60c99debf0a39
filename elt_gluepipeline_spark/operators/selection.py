"""Data-selection and distribution-drift operators for training-corpus
curation: DSIR-style hashed-feature importance weighting (Xie et al.
2023, "Data Selection for Language Models via Importance Resampling")
and Jensen-Shannon divergence between corpus slices (the standard
domain-mixture drift monitor).

Both are pure DataFrame compositions: token explode -> bucket/word
aggregation -> a broadcast-sized stats join -> decimal-exact scoring
sums. Nothing here collects rows or runs Python in the hot path, and
every plan's shuffle keys are (bucket) or (word) — linear in corpus
size at any scale.

Reference parity: none — the reference Glue pipeline is tabular-only
(/root/reference/scripts/go-metric-elt.py et al.); this module is part
of the LLM-data-pipeline extension family mandated by the brief.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import portable_hash60

__all__ = ["dsir_importance_weights", "js_divergence_slices"]


def _words(text_col: str) -> Column:
    return (F.when(F.length(F.trim(F.col(text_col))) == 0,
                   F.array().cast("array<string>"))
             .otherwise(F.split(F.trim(F.col(text_col)), r"\s+")))


def dsir_importance_weights(df: DataFrame, id_col: str, text_col: str,
                            target_pred: Column, *,
                            n_buckets: int = 512) -> DataFrame:
    """Hashed-unigram importance weights: score every document by how
    much its token distribution looks like the TARGET slice (rows
    where ``target_pred`` holds) relative to the raw corpus.

    DSIR's estimator: bag-of-hashed-ngrams bucket distributions for
    target (p) and raw (q), Laplace-smoothed; a document's log
    importance weight is sum over its tokens of ln(p_b / q_b). High
    weight = target-like; downstream resampling keeps documents with
    probability proportional to the weight. Here the feature space is
    hashed unigrams (``portable_hash60 % n_buckets``) so the whole
    pipeline — including the oracle — is engine-portable.

    Scale shape: one explode + one (doc, bucket) count aggregate, one
    GLOBAL bucket aggregate of exactly ``n_buckets`` rows (broadcast
    to the scoring join), one per-doc decimal sum. Per-term logs are
    rounded to 12 decimals and summed as DECIMAL(38,12) so the result
    hashes identically across engines and partitionings.

    Output: (doc_id, n_tokens, log_weight), one row per document with
    at least one token; log_weight rounded to 6.
    """
    base = df.select(F.col(id_col).alias("doc_id"),
                     target_pred.cast("int").alias("is_target"),
                     _words(text_col).alias("w"))
    toks = base.select("doc_id", "is_target",
                       F.explode("w").alias("word"))
    toks = toks.withColumn(
        "b", F.pmod(portable_hash60(F.col("word")), F.lit(n_buckets)))

    doc_b = (toks.groupBy("doc_id", "b")
                 .agg(F.count(F.lit(1)).alias("n_db")))
    # global bucket stats: n_buckets rows, map-side combinable
    stats = (toks.groupBy("b")
                 .agg(F.count(F.lit(1)).alias("c_raw"),
                      F.sum("is_target").alias("c_tgt")))
    tot = stats.agg(F.sum("c_raw").alias("t_raw"),
                    F.sum("c_tgt").alias("t_tgt"))
    rates = (stats.crossJoin(F.broadcast(tot))
                  .select("b", F.round(F.log(
                      ((F.col("c_tgt") + 1.0)
                       / (F.col("t_tgt") + F.lit(float(n_buckets))))
                      / ((F.col("c_raw") + 1.0)
                         / (F.col("t_raw") + F.lit(float(n_buckets))))),
                      12).alias("term")))
    scored = (doc_b.join(F.broadcast(rates), "b")
                   .groupBy("doc_id")
                   .agg(F.sum("n_db").cast("long").alias("n_tokens"),
                        F.sum((F.col("n_db") * F.col("term"))
                              .cast("decimal(38,12)")).alias("_lw")))
    return scored.select(
        "doc_id", "n_tokens",
        (F.round(F.col("_lw").cast("double"), 6) + 0.0)
         .alias("log_weight"))


def js_divergence_slices(df: DataFrame, text_col: str,
                         slice_pred: Column) -> DataFrame:
    """Jensen-Shannon divergence between the unigram distributions of
    two corpus slices (``slice_pred`` true vs false) — the symmetric,
    bounded ([0, ln 2] nats) drift measure used to monitor domain-
    mixture shift between corpus snapshots or shards.

    JS(P,Q) = 0.5*KL(P||M) + 0.5*KL(Q||M) with M = (P+Q)/2, computed
    over the union vocabulary with zero-count terms contributing 0 to
    their side's KL sum. One shuffle on word; per-word terms are
    rounded to 12 and summed as DECIMAL so the scalar result is
    engine- and partitioning-stable.

    Output: exactly one row (n_vocab, tokens_p, tokens_q, js_nats) —
    or zero rows when either slice is empty (divergence undefined).
    """
    toks = df.select(slice_pred.cast("int").alias("in_p"),
                     F.explode(_words(text_col)).alias("word"))
    wc = (toks.groupBy("word")
              .agg(F.sum("in_p").alias("cp"),
                   F.sum(1 - F.col("in_p")).alias("cq")))
    tot = wc.agg(F.sum("cp").alias("np"), F.sum("cq").alias("nq"))
    j = wc.crossJoin(F.broadcast(tot))
    p = F.col("cp") / F.col("np")
    q = F.col("cq") / F.col("nq")
    m = (p + q) / 2.0
    term_p = F.when(F.col("cp") > 0, p * F.log(p / m)).otherwise(0.0)
    term_q = F.when(F.col("cq") > 0, q * F.log(q / m)).otherwise(0.0)
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.max("np").cast("long").alias("tokens_p"),
        F.max("nq").cast("long").alias("tokens_q"),
        F.sum(F.round(0.5 * term_p + 0.5 * term_q, 12)
               .cast("decimal(38,12)")).alias("_js"))
    return (agg.filter((F.col("tokens_p") > 0) & (F.col("tokens_q") > 0))
               .select("n_vocab", "tokens_p", "tokens_q",
                       (F.round(F.col("_js").cast("double"), 6) + 0.0)
                        .alias("js_nats")))
