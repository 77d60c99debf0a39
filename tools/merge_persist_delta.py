"""Measure bucketed_merge's persist_batch latency delta (VERDICT_r10
item #6): the merge consumes its batch twice (touched-bucket collect +
staging write); persist_batch=True localCheckpoints it so an EXPENSIVE
upstream plan (join/agg feeding the merge) is evaluated once instead
of twice. Predictions: tools/scale_r11_predictions.md §2.

Protocol: seed one snapshot per batch shape, then best-of-N idempotent
RE-merges of the same batch (keep-latest reproduces the same winners,
so every pass does identical work) under persist_batch=True and False.

  expensive: seedgen 10M rows -> groupBy(user_id) agg  (shuffle+agg
             upstream, ~|users| change rows)
  cheap:     seedgen 1M rows scan (no shuffle upstream)

Usage: python tools/merge_persist_delta.py [rows]
Prints ONE JSON line. Run SOLO (timed harness).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elt_gluepipeline_spark.operators._cache import (  # noqa: E402
    release_operator_caches)
from elt_gluepipeline_spark.session import get_spark  # noqa: E402
from elt_gluepipeline_spark.sources.generate import SeedGen  # noqa: E402
from elt_gluepipeline_spark.streaming.bucketed_upsert import (  # noqa: E402
    bucketed_merge)


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    runs = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3")))
    spark = get_spark("merge_persist_delta")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(SeedGen)
    from bench import calibration_sec
    cal_start = calibration_sec(spark)

    def gen(n):
        return (spark.read.format("seedgen")
                     .option("rows", n).option("seed", 7)
                     .option("partitions", 64).load())

    expensive = (gen(rows).groupBy("user_id")
                 .agg(F.max("ts").alias("ts"),
                      F.sum("value").alias("value"),
                      F.count(F.lit(1)).alias("n_events")))
    cheap = gen(rows // 10).select("id", "user_id", "ts", "value")

    out: dict = {"harness": "merge_persist_delta", "rows": rows,
                 "runs_best_of": runs, "shapes": {}}
    root = tempfile.mkdtemp(prefix="merge_persist_")
    try:
        for shape, batch, pks in (("expensive", expensive, ["user_id"]),
                                  ("cheap", cheap, ["id"])):
            snap = f"{root}/{shape}"
            bucketed_merge(batch, snapshot_dir=snap, primary_keys=pks,
                           order_by=[F.col("ts").desc()], n_buckets=64)
            rec = {}
            for persist in (True, False):
                samples = []
                for _ in range(runs):
                    release_operator_caches()
                    t0 = time.time()
                    bucketed_merge(batch, snapshot_dir=snap,
                                   primary_keys=pks,
                                   order_by=[F.col("ts").desc()],
                                   n_buckets=64, persist_batch=persist)
                    samples.append(round(time.time() - t0, 2))
                rec[f"persist_{persist}"] = {"sec": min(samples),
                                             "samples": samples}
            rec["speedup_persist"] = round(
                rec["persist_False"]["sec"] / rec["persist_True"]["sec"], 2)
            out["shapes"][shape] = rec
            print(json.dumps({shape: rec}), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    cal_end = calibration_sec(spark)
    out["calibration_sec"] = {"start": cal_start, "end": cal_end}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
