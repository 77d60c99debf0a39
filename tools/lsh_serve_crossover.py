"""Measure the flat-vs-partitioned ENTRIES crossover for the LSH
dedup index serve path (VERDICT_r10 "what's missing #3": the
partitioned layout was plan-shape-justified but measured SLOWER at
every point taken — find where it wins, or falsify the advice).

Predictions committed BEFORE measurement: tools/scale_r11_predictions.md.

Method: the serve path is the REAL ``incremental_lsh_dedup`` artifact
route end-to-end (batch minhash signatures + banded probe join +
candidate verify); only the ENTRIES table is synthetic, generated
directly at E rows (docs = E/bands, band_hash = xxhash64(doc_id,
band_id) — uniform 64-bit, so a real-text trickle batch collides with
~nothing, the realistic steady state for a clean batch). sizes/
postings are dummy-small: both are candidate-restricted in the serve
plan since r9/r11 (LeftSemi pins in tests/test_dedup.py), so their
cost is O(candidates) ≈ 0 regardless of corpus size — the entries
term is the ONLY corpus-sized term left, which is exactly what the
layout targets.

Usage:
  python tools/lsh_serve_crossover.py [E1,E2,... [P [batch_docs]]]
Defaults: E=20000000,100000000,400000000  P=4096  batch_docs=32.
Prints one JSON line per (E, layout) point and a final summary line.
Run SOLO (timed harness).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from elt_gluepipeline_spark.operators._cache import (  # noqa: E402
    release_operator_caches)
from elt_gluepipeline_spark.operators.dedup import (  # noqa: E402
    LshDedupIndex, incremental_lsh_dedup, load_lsh_dedup_index,
    save_lsh_dedup_index)
from elt_gluepipeline_spark.session import get_spark  # noqa: E402

BANDS = 8
N_HASHES = 32


def synthetic_index(spark, n_entries: int) -> LshDedupIndex:
    n_docs = n_entries // BANDS
    entries = (spark.range(n_docs)
               .select(F.col("id").alias("doc_id"),
                       F.explode(F.array(*[F.lit(b) for b in range(BANDS)]))
                        .alias("band_id"))
               .withColumn("band_hash", F.xxhash64("doc_id", "band_id")))
    sizes = spark.range(100).select(F.col("id").alias("doc_id"),
                                    F.lit(30).alias("n_shingles"))
    postings = spark.createDataFrame([(-1, "zz")], "doc_id long, s string")
    return LshDedupIndex(entries=entries, sizes=sizes, postings=postings)


def trickle_batch(spark, n_docs: int):
    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(5000)]
    rows = [(1_000_000 + i, " ".join(rng.choice(vocab) for _ in range(40)))
            for i in range(n_docs)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> int:
    es = ([int(x) for x in sys.argv[1].split(",")] if len(sys.argv) > 1
          else [20_000_000, 100_000_000, 400_000_000])
    p = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    batch_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    runs = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3")))

    spark = get_spark("lsh_serve_crossover")
    spark.sparkContext.setLogLevel("ERROR")
    from bench import calibration_sec
    cal_start = calibration_sec(spark)

    batch = trickle_batch(spark, batch_docs)
    results = []
    root = tempfile.mkdtemp(prefix="lsh_crossover_")
    try:
        for e in es:
            idx = synthetic_index(spark, e)
            paths = {"flat": f"{root}/flat_{e}", "part": f"{root}/part_{e}"}
            t0 = time.time()
            save_lsh_dedup_index(idx, paths["flat"])
            flat_write = round(time.time() - t0, 2)
            t0 = time.time()
            save_lsh_dedup_index(idx, paths["part"], partition_entries=p)
            part_write = round(time.time() - t0, 2)
            for layout, path in paths.items():
                loaded = load_lsh_dedup_index(spark, path)
                samples = []
                for _ in range(runs):
                    release_operator_caches()
                    t0 = time.time()
                    out = incremental_lsh_dedup(
                        None, batch, "doc_id", "text", k=3,
                        n_hashes=N_HASHES, bands=BANDS, threshold=0.5,
                        index=loaded)
                    n = out.count()
                    samples.append(round(time.time() - t0, 2))
                rec = {"entries_rows": e, "layout": layout,
                       "serve_sec": min(samples), "samples": samples,
                       "matches": n,
                       "write_sec": (flat_write if layout == "flat"
                                     else part_write)}
                results.append(rec)
                print(json.dumps(rec), flush=True)
            for path in paths.values():
                shutil.rmtree(path, ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    cal_end = calibration_sec(spark)
    print(json.dumps({
        "harness": "lsh_serve_crossover", "P": p, "batch_docs": batch_docs,
        "bands": BANDS, "runs_best_of": runs,
        "calibration_sec": {"start": cal_start, "end": cal_end},
        "points": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
