"""Round-12 interleaved A/B probes (the only measurement design that
survives this host's 2-3x wall-clock phases — see
OPTIMIZATION_r11.md "Measurement protocol note").

Each experiment builds every variant of ONE query shape in ONE
session and times them in alternating rounds (A,B,[C],A,B,[C],...),
reporting per-round seconds and the median/min per variant. Variants
are expressed against the CURRENT operator code (params that already
exist, or inline plan copies), so the probe itself never requires a
source edit — the measurement decides whether the edit happens.

Usage:
  python tools/r12_ab.py q172 [--sf DIR] [--rounds N]
  python tools/r12_ab.py q201 [--sf DIR] [--rounds N]
  python tools/r12_ab.py q63  [--sf DIR] [--rounds N]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from elt_gluepipeline_spark.operators._cache import (  # noqa: E402
    release_operator_caches)
from elt_gluepipeline_spark.session import get_spark  # noqa: E402
from elt_gluepipeline_spark.sources.readers import read_table  # noqa: E402


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def _warmup(spark, sf_dir):
    from elt_gluepipeline_spark.plans import registry
    registry()["q15_lang_id"].build(spark, sf_dir) \
        .write.format("noop").mode("overwrite").save()
    spark.range(32, numPartitions=32) \
        .mapInPandas(lambda it: iter(it), schema="id long") \
        .write.format("noop").mode("overwrite").save()


def _report(name: str, results: dict[str, list[float]]) -> None:
    out = {"experiment": name}
    for label, xs in results.items():
        out[label] = {"rounds": [round(x, 3) for x in xs],
                      "median": round(statistics.median(xs), 3),
                      "min": round(min(xs), 3)}
    print(json.dumps(out), flush=True)


# --------------------------------------------------------------------
# q172: blocked_jaccard_pairs' internal shingle-base persist under a
# connected-components loop consumer (VERDICT r11 "What's wrong #1").
# Variants: the r11 MEMORY_AND_DISK persist / no persist (the r10
# shape) / MEMORY_ONLY.
# --------------------------------------------------------------------

def exp_q172(spark, sf_dir: str, rounds: int) -> None:
    from pyspark.sql import Window

    from elt_gluepipeline_spark.operators.dedup import (
        blocked_jaccard_pairs, connected_components, shingle_base)
    from elt_gluepipeline_spark.operators.textstats import n_tokens

    def build(persist_mode: str):
        docs = read_table(spark, sf_dir, "documents")
        blocks = [F.col("lang"),
                  F.floor(n_tokens(F.col("text")) / 10).cast("long")]
        base = shingle_base(docs, "doc_id", "text", blocks, k=3)
        handle = None
        if persist_mode == "mem_disk":
            handle = base.persist(StorageLevel.MEMORY_AND_DISK)
        elif persist_mode == "mem_only":
            handle = base.persist(StorageLevel.MEMORY_ONLY)
        pairs = blocked_jaccard_pairs(docs, "doc_id", "text", blocks,
                                      k=3, threshold=0.2, base=base)
        comps = (connected_components(pairs)
                 .select(F.col("id").alias("doc_id"), "component"))
        n_tok = (F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
                  .otherwise(F.size(F.split(F.trim("text"), r"\s+"))))
        tagged = (docs.select("doc_id", n_tok.cast("long").alias("n_tokens"))
                      .join(comps, "doc_id", "left")
                      .select("doc_id",
                              F.coalesce("component", "doc_id")
                               .alias("component"), "n_tokens"))
        w = Window.partitionBy("component").orderBy(F.desc("n_tokens"),
                                                    F.asc("doc_id"))
        out = tagged.withColumn("keep", F.row_number().over(w) == 1) \
                    .select("doc_id", "component", "n_tokens", "keep")
        return out, handle

    variants = ("mem_disk", "none", "mem_only")
    # one untimed warmup pass so no variant pays the first-query
    # codegen/jit cost (it polluted the first timed round otherwise)
    df, handle = build("none")
    _noop(df)
    if handle is not None:
        handle.unpersist(blocking=False)
    release_operator_caches()
    results: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(rounds):
        for v in variants:
            # time build+sink together: connected_components runs its
            # eager checkpoint loop INSIDE build(), exactly as the
            # bench's spec.build(...).write timing sees it
            t0 = time.time()
            df, handle = build(v)
            _noop(df)
            results[v].append(time.time() - t0)
            if handle is not None:
                handle.unpersist(blocking=False)
            release_operator_caches()
    _report("q172_cc_persist", results)


# --------------------------------------------------------------------
# q201: bucketed_merge's eager localCheckpoint on bench-sized trickle
# batches (VERDICT r11 "What's wrong #2"). Variants: persist_batch
# True (r11 default) vs False (the param already exists).
# --------------------------------------------------------------------

def exp_q201(spark, sf_dir: str, rounds: int) -> None:
    import shutil

    from elt_gluepipeline_spark.streaming.bucketed_upsert import (
        bucketed_merge, read_bucketed_snapshot)

    orders = read_table(spark, sf_dir, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("cust"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("D"))
         .otherwise(F.lit("U")).alias("op"))

    def run(persist_batch: bool, tag: str) -> float:
        snap = f"spark-warehouse/r12ab_upsert_{tag}"
        shutil.rmtree(snap, ignore_errors=True)
        t0 = time.time()
        for i in (2, 0, 1):
            bucketed_merge(changes.filter(F.col("seq") % 3 == i),
                           snapshot_dir=snap, primary_keys=["cust"],
                           order_by=[F.col("seq").desc()], n_buckets=16,
                           op_col="op", persist_batch=persist_batch)
        snapshot = read_bucketed_snapshot(spark, snap, op_col="op")
        snapshot.select("cust", F.col("seq").alias("last_seq"),
                        F.col("price").alias("last_price"),
                        F.col("status").alias("last_status")) \
            .write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        shutil.rmtree(snap, ignore_errors=True)
        return dt

    results: dict[str, list[float]] = {"checkpoint": [], "plain": []}
    for r in range(rounds):
        results["checkpoint"].append(run(True, f"ck{r}"))
        results["plain"].append(run(False, f"pl{r}"))
        release_operator_caches()
    _report("q201_persist_batch", results)


# --------------------------------------------------------------------
# q63: repetition_stats_linear re-evaluates the tokenize+bigram HOF
# tree on the sizes side of its re-attach join (VERDICT r11 next #3).
# Variants: current operator / restructured single-evaluation (sizes
# from ONE split, _nb derived arithmetically).
# --------------------------------------------------------------------

def exp_q63(spark, sf_dir: str, rounds: int) -> None:
    from elt_gluepipeline_spark.operators.textstats import (
        bigrams, repetition_stats_linear, tokens)

    def build_new(df, id_col: str, text_col: str, round_to: int = 6):
        base = df.select(F.col(id_col),
                         tokens(F.col(text_col)).alias("_tok"))
        grams = base.select(
            F.col(id_col),
            F.explode(F.concat(
                F.transform("_tok", lambda t: F.struct(
                    F.lit("u").alias("k"), t.alias("g"))),
                F.transform(bigrams(F.col("_tok")), lambda t: F.struct(
                    F.lit("b").alias("k"), t.alias("g"))),
            )).alias("_e"))
        counts = (grams.groupBy(id_col, F.col("_e.k").alias("_k"),
                                F.col("_e.g").alias("_g"))
                       .agg(F.count(F.lit(1)).alias("_c")))
        stats = (counts.groupBy(id_col)
                 .agg(F.max(F.when(F.col("_k") == "u", F.col("_c")))
                       .alias("_maxu"),
                      F.max(F.when(F.col("_k") == "b", F.col("_c")))
                       .alias("_maxb"),
                      F.sum(F.when((F.col("_k") == "u") & (F.col("_c") == 1),
                                   1).otherwise(0)).alias("_singles")))
        # sizes side: ONE split per row; nb = 0 for n<2 else n-1
        # (exactly size(bigrams(tok)) by the bigrams contract)
        sizes = df.select(F.col(id_col),
                          F.size(tokens(F.col(text_col))).alias("_n"))
        sizes = sizes.select(id_col, "_n",
                             F.when(F.col("_n") < 2, F.lit(0))
                              .otherwise(F.col("_n") - 1).alias("_nb"))
        out = sizes.join(stats, [id_col], "left")
        n, nb = F.col("_n"), F.col("_nb")
        top_tok = F.when(n == 0, F.lit(0.0)).otherwise(F.col("_maxu") / n)
        top_big = F.when(nb == 0, F.lit(0.0)).otherwise(F.col("_maxb") / nb)
        dup_tok = F.when(n == 0, F.lit(0.0)) \
                   .otherwise((n - F.col("_singles")) / n)
        return out.select(
            F.col(id_col),
            n.cast("long").alias("n_tokens"),
            F.round(top_tok, round_to).alias("top_token_frac"),
            F.round(top_big, round_to).alias("top_bigram_frac"),
            F.round(dup_tok, round_to).alias("dup_token_frac"))

    results: dict[str, list[float]] = {"current": [], "single_eval": []}
    for _ in range(rounds):
        docs = read_table(spark, sf_dir, "documents", spread=True)
        results["current"].append(
            _noop(repetition_stats_linear(docs, "doc_id", "text")))
        release_operator_caches()
        docs = read_table(spark, sf_dir, "documents", spread=True)
        results["single_eval"].append(
            _noop(build_new(docs, "doc_id", "text")))
        release_operator_caches()
    _report("q63_repetition_single_eval", results)


# --------------------------------------------------------------------
# q171: the stats block consumes `truth` twice (count + hit semi-join)
# and `found` twice (count + hit), so the before-plan carries the full
# prefix-filter AND LSH pipelines ~2x each (326 nodes, 132 Exchange).
# Variant: persist the two tiny (id_a,id_b) pair frames so each
# pipeline materializes once (VERDICT r11 next #5 — must be A/B'd:
# AQE exchange reuse may already dedupe the repeated subtrees).
# --------------------------------------------------------------------

def exp_q171(spark, sf_dir: str, rounds: int) -> None:
    from elt_gluepipeline_spark.operators._cache import register_cache
    from elt_gluepipeline_spark.operators.dedup import (
        minhash_lsh_pairs, portable_band_hash, prefix_filter_jaccard_pairs,
        shingle_base_cached)
    from elt_gluepipeline_spark.plans import registry
    from elt_gluepipeline_spark.plans.training import _Q41_FAMILY

    spec = registry()["q171_lsh_recall"]

    def build_persisted():
        docs = read_table(spark, sf_dir, "documents")
        base = shingle_base_cached(docs, "doc_id", "text", k=3)
        truth = register_cache(
            prefix_filter_jaccard_pairs(docs, "doc_id", "text",
                                        k=3, threshold=0.3, base=base)
            .select("id_a", "id_b"))
        found = register_cache(
            minhash_lsh_pairs(docs, "doc_id", "text",
                              k=3, n_hashes=32, bands=8, threshold=0.3,
                              pair_family=_Q41_FAMILY,
                              band_hash=portable_band_hash,
                              base=base).select("id_a", "id_b"))
        hit = found.join(truth, ["id_a", "id_b"], "left_semi")
        stats = (truth.agg(F.count(F.lit(1)).alias("n_true"))
                 .crossJoin(found.agg(F.count(F.lit(1)).alias("n_found")))
                 .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit"))))
        return (stats.select(
            "n_true", "n_found", "n_hit",
            (F.round(F.col("n_hit") / F.col("n_true"), 6) + 0.0)
             .alias("recall"),
            (F.round(F.col("n_hit") / F.col("n_found"), 6) + 0.0)
             .alias("precision"))
            .filter(F.col("n_true") > 0))

    results: dict[str, list[float]] = {"current": [], "persist_pairs": []}
    for _ in range(rounds):
        results["current"].append(_noop(spec.build(spark, sf_dir)))
        release_operator_caches()
        results["persist_pairs"].append(_noop(build_persisted()))
        release_operator_caches()
    _report("q171_persist_pairs", results)


EXPERIMENTS = {"q172": exp_q172, "q201": exp_q201, "q63": exp_q63,
               "q171": exp_q171}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment", choices=sorted(EXPERIMENTS))
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--rounds", type=int, default=6)
    args = ap.parse_args()

    spark = get_spark("r12-ab")
    spark.sparkContext.setLogLevel("ERROR")
    _warmup(spark, args.sf)
    EXPERIMENTS[args.experiment](spark, args.sf, args.rounds)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
