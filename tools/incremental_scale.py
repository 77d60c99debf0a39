"""Incremental-ingest flatness check for incremental_lsh_dedup (judge
r8 item #2 done-criterion): hold the BATCH fixed and grow the CORPUS —
with the verify served from a persisted LshDedupIndex artifact, the
per-batch serve time should stay ~flat (probe join against the stored
band entries + candidate-restricted postings verify), while only the
one-time FIT cost grows with the corpus.

Protocol (mirrors tools/scale_check.py round-8 discipline):
- batch = sf0.1 documents with doc_id % 10 == 0 (fixed, ~5k docs)
- corpus(1x)  = sf0.1 documents with doc_id % 10 != 0
- corpus(Nx)  = const-dup scaled documents (spark-warehouse/scale_xN_cd,
  built by tools/scale_check.build_scaled) minus the batch's ids —
  replicas interleave replica-unique tokens so the dup RATE stays
  constant as the corpus grows
- per factor: fit+save the index ONCE (reported as fit_sec), then time
  the batch serve best-of-$SPARK_GRAFT_SCALE_RUNS in the same warmed
  session, releasing operator caches between passes.

Usage: python tools/incremental_scale.py [factor ...]   (default 1 4 20)
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
from elt_gluepipeline_spark.operators.dedup import (  # noqa: E402
    PortableMinhashFamily, fit_lsh_dedup_index, incremental_lsh_dedup,
    load_lsh_dedup_index, portable_band_hash, save_lsh_dedup_index)
from elt_gluepipeline_spark.session import get_spark  # noqa: E402
from elt_gluepipeline_spark.sources.readers import read_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
FAM = PortableMinhashFamily(32, seed=7)
KW = dict(k=3, n_hashes=32, bands=8, pair_family=FAM,
          band_hash=portable_band_hash)


def corpus_for(spark, factor: int, max_orig: int):
    if factor == 1:
        return read_table(spark, SRC, "documents") \
            .filter(F.col("doc_id") % 10 != 0)
    path = f"spark-warehouse/scale_x{factor}_cd"
    if not os.path.isdir(path):
        from tools.scale_check import build_scaled
        build_scaled(spark, SRC, path, factor, const_dup=True)
    docs = read_table(spark, path, "documents")
    # drop exactly the batch's ids (originals with doc_id%10==0);
    # replica ids beyond max_orig stay — they are distinct documents
    return docs.filter(~((F.col("doc_id") % 10 == 0)
                         & (F.col("doc_id") <= max_orig)))


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 4, 20]
    runs = max(1, int(os.environ.get("SPARK_GRAFT_SCALE_RUNS", "3")))
    spark = get_spark("incremental-scale")
    spark.sparkContext.setLogLevel("ERROR")

    docs01 = read_table(spark, SRC, "documents")
    max_orig = docs01.agg(F.max("doc_id")).collect()[0][0]
    batch = docs01.filter(F.col("doc_id") % 10 == 0)
    n_batch = batch.count()

    points: dict[str, dict] = {}
    for factor in factors:
        corpus = corpus_for(spark, factor, max_orig)
        n_corpus = corpus.count()
        idx_path = f"spark-warehouse/lsh_idx_x{factor}"
        shutil.rmtree(idx_path, ignore_errors=True)
        t0 = time.time()
        save_lsh_dedup_index(
            fit_lsh_dedup_index(corpus, "doc_id", "text", **KW), idx_path)
        fit_sec = round(time.time() - t0, 2)
        release_operator_caches()

        def timed_serve(path):
            best, n_pairs = float("inf"), -1
            for _ in range(runs):
                loaded = load_lsh_dedup_index(spark, path)
                t0 = time.time()
                out = incremental_lsh_dedup(
                    None, batch, "doc_id", "text", threshold=0.3,
                    index=loaded, **KW)
                n_pairs = out.count()
                best = min(best, time.time() - t0)
                release_operator_caches()
            return round(best, 2), n_pairs

        serve_sec, n_pairs = timed_serve(idx_path)

        # round-10: the partitioned-entries layout (the named fix if
        # flat-layout serve ever drifts with corpus size) measured
        # side-by-side — same index content, entries Hive-partitioned
        # so the probe reads only the batch's band-hash partitions
        part_path = idx_path + "_part"
        shutil.rmtree(part_path, ignore_errors=True)
        save_lsh_dedup_index(
            load_lsh_dedup_index(spark, idx_path), part_path,
            partition_entries=64)
        release_operator_caches()
        serve_part_sec, n_pairs_part = timed_serve(part_path)
        assert n_pairs_part == n_pairs, (n_pairs_part, n_pairs)

        points[str(factor)] = {
            "n_corpus": n_corpus, "fit_sec": fit_sec,
            "serve_sec": serve_sec,
            "serve_partitioned_sec": serve_part_sec,
            "n_pairs": n_pairs,
            "serve_ratio_vs_1x": None}
    base = points.get("1", {}).get("serve_sec")
    if base:
        for p in points.values():
            p["serve_ratio_vs_1x"] = round(p["serve_sec"] / base, 2)
    print(json.dumps({"experiment": "incremental_lsh_corpus_growth",
                      "n_batch": n_batch, "best_of": runs,
                      "points": points}, separators=(",", ":")))


if __name__ == "__main__":
    main()
