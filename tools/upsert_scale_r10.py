"""Round-10 bucketed-merge scale experiment (predictions pre-committed
in tools/scale_r10_predictions.md §2): run the merge at a
data-plane-dominant snapshot size and measure the REBUCKET migration
between the two bucket-sizing disciplines on the same table.

1. seed a snapshot from the 64× const-dup lineitem table (~38 M keys,
   comment payload carried) at B=16 — the "table outgrew its bucket
   count" state;
2. merge a fixed 50-key batch (touched 16/16: the outgrown cost);
3. rebucket to B=1024 (streaming/bucketed_upsert.rebucket);
4. merge a fresh 50-key batch (touched ≤50/1024: regained pruning).

Usage: python tools/upsert_scale_r10.py [factor]   (default 64)
Output: one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elt_gluepipeline_spark.operators._cache import (  # noqa: E402
    release_operator_caches)
from elt_gluepipeline_spark.session import get_spark  # noqa: E402
from elt_gluepipeline_spark.sources.readers import read_table  # noqa: E402
from elt_gluepipeline_spark.streaming.bucketed_upsert import (  # noqa: E402
    bucketed_merge, rebucket)

SRC = "/root/testdata/sf0.1"
B_OUTGROWN = 16
B_RESIZED = 1024
BATCH_KEYS = 50
KEYS = ["okey", "lnum"]


def feed_of(lineitem):
    """One seed version per (l_orderkey, l_linenumber) key; a 128-char
    deterministic hex payload (md5 chain — incompressible, so parquet
    can't shrink it away) keeps the table GB-scale so the data plane
    dominates the merge clock."""
    key = F.concat_ws("|", "l_orderkey", "l_linenumber")
    return lineitem.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("lnum"),
        F.lit(1).cast("long").alias("seq"),
        F.col("l_extendedprice").alias("price"),
        F.concat(*[F.md5(F.concat(key, F.lit(str(i))))
                   for i in range(4)]).alias("payload"),
        F.lit("U").alias("op"))


def batch_of(base_feed, seq: int):
    """A fixed-size key sample from the BASE key range (present at
    every factor), bumped to a new version."""
    n = base_feed.count()
    step = max(1, n // BATCH_KEYS)
    # hash-sample the keys (an arithmetic (okey*10+lnum) % step can be
    # unsatisfiable — lnum ranges 1..7 while step is a multiple of 10);
    # orderBy before limit: a bare limit re-evaluates
    # nondeterministically between the merge's touched-collect and
    # staging write, which bucketed_merge rejects by design
    return (base_feed
            .filter(F.pmod(F.xxhash64("okey", "lnum", F.lit(seq)),
                           F.lit(step)) == 0)
            .orderBy("okey", "lnum").limit(BATCH_KEYS)
            .withColumn("seq", F.lit(seq).cast("long"))
            .withColumn("price", F.col("price") + 1.0))


def timed_merge(batch, snap: str, n_buckets: int, runs: int):
    """Time the merge on a MATERIALIZED batch (a real foreachBatch
    micro-batch arrives materialized; timing the harness's own
    600k-row sample scan + sort inside the merge — which evaluates the
    batch twice by contract — would charge batch construction to the
    merge clock)."""
    spark = batch.sparkSession
    mat = "spark-warehouse/upsert_scale_r10_batch"
    shutil.rmtree(mat, ignore_errors=True)
    batch.coalesce(1).write.mode("overwrite").parquet(mat)
    batch = spark.read.parquet(mat)
    best, touched = float("inf"), -1
    for _ in range(runs):
        t0 = time.time()
        t = bucketed_merge(batch, snapshot_dir=snap, primary_keys=KEYS,
                           order_by=[F.col("seq").desc()],
                           n_buckets=n_buckets)
        best = min(best, time.time() - t0)
        touched = len(t)
        release_operator_caches()
    shutil.rmtree(mat, ignore_errors=True)
    return round(best, 2), touched


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    runs = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3")))
    spark = get_spark("upsert-scale-r10")
    spark.sparkContext.setLogLevel("ERROR")

    src = SRC if factor == 1 else f"spark-warehouse/scale_x{factor}_cd"
    if factor != 1 and not os.path.isdir(src):
        from tools.scale_check import build_scaled
        build_scaled(spark, SRC, src, factor, const_dup=True)
    feed = feed_of(read_table(spark, src, "lineitem"))
    base_feed = feed_of(read_table(spark, SRC, "lineitem"))
    n_snapshot = feed.count()

    snap = f"spark-warehouse/upsert_scale_r10_x{factor}"
    shutil.rmtree(snap, ignore_errors=True)
    t0 = time.time()
    bucketed_merge(feed, snapshot_dir=snap, primary_keys=KEYS,
                   order_by=[F.col("seq").desc()], n_buckets=B_OUTGROWN)
    seed_sec = round(time.time() - t0, 2)
    release_operator_caches()
    snap_bytes = sum(os.path.getsize(os.path.join(b, f))
                     for b, _d, fs in os.walk(snap) for f in fs)

    merge_outgrown, touched_outgrown = timed_merge(
        batch_of(base_feed, 2), snap, B_OUTGROWN, runs)

    t0 = time.time()
    n_rows = rebucket(spark, snap, primary_keys=KEYS,
                      new_n_buckets=B_RESIZED)
    rebucket_sec = round(time.time() - t0, 2)
    release_operator_caches()

    merge_resized, touched_resized = timed_merge(
        batch_of(base_feed, 3), snap, B_RESIZED, runs)
    shutil.rmtree(snap, ignore_errors=True)

    print(json.dumps({
        "experiment": "bucketed_merge_rebucket_r10",
        "factor": factor, "best_of": runs,
        "n_snapshot_rows": n_snapshot, "n_rebucket_rows": n_rows,
        "snapshot_mb": round(snap_bytes / 1e6, 1),
        "seed_sec_b16": seed_sec,
        "merge_outgrown": {"n_buckets": B_OUTGROWN,
                           "merge_sec": merge_outgrown,
                           "touched": touched_outgrown},
        "rebucket_sec_16_to_1024": rebucket_sec,
        "merge_post_rebucket": {"n_buckets": B_RESIZED,
                                "merge_sec": merge_resized,
                                "touched": touched_resized},
        "separation_x": round(merge_outgrown / max(merge_resized, 1e-9),
                              1)},
        separators=(",", ":")))


if __name__ == "__main__":
    sys.exit(main())
