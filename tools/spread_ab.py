"""A/B probe for the round-11 spread-if-narrow optimization: time a
set of queries with the stock read_table vs. a monkeypatched variant
that always applies spread_if_narrow, in ONE session (interleaved,
best-of-N each). Prints one JSON line per query with both timings.

Usage: python tools/spread_ab.py [--sf DIR] [--runs N] [q...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elt_gluepipeline_spark.plans import registry  # noqa: E402
from elt_gluepipeline_spark.plans import reference, training  # noqa: E402
from elt_gluepipeline_spark.session import get_spark  # noqa: E402
from elt_gluepipeline_spark.sources import readers  # noqa: E402

DEFAULT_QS = [
    # heavy text/python/self-join paths
    "q198_jpeg_progressive", "q170_prefix_join", "q41_minhash_portable",
    "q153_semdedup", "q162_tfidf_cosine", "q157_triangles",
    "q151_xml_roundtrip", "q152_repeated_spans", "q116_repetition_linear",
    "q177_winnowing", "q21_simhash", "q78_perplexity", "q158_pmi_cooc",
    "q145_copurchase_pagerank", "q103_corpus_pipeline", "q126_passage_dedupe",
    # cheap scan->agg paths (regression check)
    "q01_line_revenue", "q02_clv", "q94_priority_argmax",
    "q13_dedup_exact", "q11_transform_clean", "q44_urgent_customers",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    names = args.queries or DEFAULT_QS

    spark = get_spark("spread-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry()

    specs["q15_lang_id"].build(spark, args.sf) \
        .write.format("noop").mode("overwrite").save()
    spark.range(32, numPartitions=32) \
        .mapInPandas(lambda it: iter(it), schema="id long") \
        .write.format("noop").mode("overwrite").save()
    from elt_gluepipeline_spark.plans.training import warm_artifacts
    warm_artifacts(spark, args.sf)
    from elt_gluepipeline_spark.operators._cache import (
        release_operator_caches)

    stock = readers.read_table

    def spread_always(spark, sf_dir, name, *, spread=False):
        return stock(spark, sf_dir, name, spread=True)

    def run_once(name):
        t0 = time.time()
        specs[name].build(spark, args.sf).write.format("noop") \
            .mode("overwrite").save()
        dt = time.time() - t0
        release_operator_caches()
        return dt

    for name in names:
        res = {}
        for label, fn in (("base", stock), ("spread", spread_always)):
            training.read_table = fn
            reference.read_table = fn
            best = float("inf")
            for _ in range(max(1, args.runs)):
                best = min(best, run_once(name))
            res[label] = round(best, 3)
        training.read_table = stock
        reference.read_table = stock
        res["query"] = name
        res["delta"] = round(res["base"] - res["spread"], 3)
        print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
