"""Bucketed CDC merge scale check (round 9, q201's operator): hold the
change BATCH fixed and grow the SNAPSHOT — the merge's claimed cost is
O(|batch| + touched·|snapshot|/B), so the experiment runs both sizing
disciplines:

- buckets-scaled (B ∝ snapshot, the operational guidance: size B so a
  bucket stays a few GB at any table size): with a small batch
  (50 keys ≪ B) per-merge wall time should stay ~FLAT as the snapshot
  grows — the batch touches ≤50 buckets of CONSTANT size;
- buckets-fixed (B pinned at the 1x value): bucket size grows ∝
  snapshot, so the same 50-key batch rewrites ~the whole table —
  the anti-pattern the guidance exists to prevent, measured on
  purpose as the contrast curve.

The snapshot is keyed by o_orderkey (the key whose space actually
grows under tools/scale_check.build_scaled replication: 150k → N·150k
distinct keys), seeded as one version per key from the scaled orders
table; the batch is a fixed 50-key update set drawn from the base
keys, so it exists at every factor.

Usage: python tools/upsert_scale.py [factor ...]   (default 1 4 20)
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
    bucketed_merge)

SRC = "/root/testdata/sf0.1"
BASE_BUCKETS = 16
BATCH_KEYS = 50


def feed_of(orders):
    """One change row per orderkey: the seed version of the snapshot."""
    return orders.select(
        F.col("o_orderkey").alias("okey"),
        F.lit(1).cast("long").alias("seq"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.lit("U").alias("op"))


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 20]
    runs = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3")))
    spark = get_spark("upsert-scale")
    spark.sparkContext.setLogLevel("ERROR")

    base = read_table(spark, SRC, "orders")
    n_base_keys = base.count()
    # fixed 50-key batch from the BASE key range (present at every factor)
    step = max(1, n_base_keys // BATCH_KEYS)
    batch = (feed_of(base)
             .filter((F.col("okey") % step == 0))
             .limit(BATCH_KEYS)
             .withColumn("seq", F.lit(2).cast("long"))
             .withColumn("price", F.col("price") + 1.0))
    n_batch = batch.count()

    points: dict[str, dict] = {}
    for factor in factors:
        src = SRC if factor == 1 else f"spark-warehouse/scale_x{factor}_cd"
        if factor != 1 and not os.path.isdir(src):
            from tools.scale_check import build_scaled
            build_scaled(spark, SRC, src, factor, const_dup=True)
        feed = feed_of(read_table(spark, src, "orders"))
        n_snapshot = feed.count()
        point: dict[str, dict] = {}
        for mode, n_buckets in (("buckets_scaled", BASE_BUCKETS * factor),
                                ("buckets_fixed", BASE_BUCKETS)):
            snap = f"spark-warehouse/upsert_scale_{factor}_{mode}"
            shutil.rmtree(snap, ignore_errors=True)
            t0 = time.time()
            bucketed_merge(feed, snapshot_dir=snap, primary_keys=["okey"],
                           order_by=[F.col("seq").desc()],
                           n_buckets=n_buckets)
            seed_sec = round(time.time() - t0, 2)
            release_operator_caches()
            best = float("inf")
            touched = -1
            for _ in range(runs):
                t0 = time.time()
                t = bucketed_merge(batch, snapshot_dir=snap,
                                   primary_keys=["okey"],
                                   order_by=[F.col("seq").desc()],
                                   n_buckets=n_buckets)
                best = min(best, time.time() - t0)
                touched = len(t)
                release_operator_caches()
            point[mode] = {"n_buckets": n_buckets, "seed_sec": seed_sec,
                           "merge_sec": round(best, 2),
                           "touched_buckets": touched}
            shutil.rmtree(snap, ignore_errors=True)
        points[str(factor)] = {"n_snapshot_rows": n_snapshot, **point}
    for mode in ("buckets_scaled", "buckets_fixed"):
        b = points.get("1", {}).get(mode, {}).get("merge_sec")
        if b:
            for p in points.values():
                p[mode]["ratio_vs_1x"] = round(p[mode]["merge_sec"] / b, 2)
    print(json.dumps({"experiment": "bucketed_merge_snapshot_growth",
                      "n_batch": n_batch, "best_of": runs,
                      "points": points}, separators=(",", ":")))


if __name__ == "__main__":
    main()
