"""Operator stress run on GENERATED data — scale evidence beyond the
testdata SFs, with zero driver materialization and zero disk.

Uses the seedgen Python DataSource (sources/generate.py) to stream N
deterministic events-shaped rows straight from executors into a
representative slice of the engine's operator families:

  rollup   A4  hourly time-bucket aggregation
  lag      W2  per-entity window lag (gap seconds)
  keep1    W1  dedupe-keep-latest per key
  sdist    A6  salted exact distinct (skew kit)
  sessions     gap-based sessionization count

Prints ONE JSON line {"rows": N, "timings": {...}, "rates_mrows_s":
{...}}. Rates are the honest end-to-end figure (generation included).

Usage: python tools/stress.py [rows] [partitions]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from elt_gluepipeline_spark.session import get_spark  # noqa: E402
from elt_gluepipeline_spark.sources.generate import SeedGen  # noqa: E402


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(SeedGen)

    def gen():
        return (spark.read.format("seedgen")
                     .option("rows", rows).option("seed", 7)
                     .option("partitions", parts).load())

    def rollup():
        return (gen().groupBy(F.date_trunc("hour", "ts").alias("h"))
                     .agg(F.count(F.lit(1)), F.sum("value")))

    def lag():
        w = Window.partitionBy("user_id").orderBy("ts", "id")
        return (gen().select("user_id",
                             (F.unix_micros(F.to_timestamp("ts"))
                              - F.lag(F.unix_micros(F.to_timestamp("ts")))
                                 .over(w)).alias("gap"))
                     .groupBy().agg(F.avg("gap")))

    def keep1():
        from elt_gluepipeline_spark.operators.windows import (
            dedupe_keep_latest)
        return (dedupe_keep_latest(gen(), ["user_id"],
                                   order_by=[F.col("ts").desc()],
                                   tie_breakers=[F.col("id").desc()])
                .groupBy().agg(F.count(F.lit(1))))

    def sdist():
        from elt_gluepipeline_spark.operators.skew import (
            salted_count_distinct)
        return salted_count_distinct(
            gen().withColumn("day", F.date_trunc("day", "ts")),
            ["day"], "user_id")

    def sessions():
        from pyspark.sql import Window as W
        w = W.partitionBy("user_id").orderBy("ts", "id")
        flagged = (gen().withColumn("_prev", F.lag("ts").over(w))
                        .withColumn("_new", F.when(
                            F.col("_prev").isNull()
                            | (F.expr("timestampdiff(SECOND, _prev, ts)")
                               > 3600), 1).otherwise(0)))
        return flagged.groupBy().agg(F.sum("_new"))

    timings: dict[str, float] = {}
    for name, fn in (("rollup", rollup), ("lag", lag), ("keep1", keep1),
                     ("sdist", sdist), ("sessions", sessions)):
        t0 = time.time()
        fn().collect()
        timings[name] = round(time.time() - t0, 2)
    print(json.dumps({
        "rows": rows, "partitions": parts, "timings": timings,
        "rates_mrows_s": {k: round(rows / v / 1e6, 1)
                          for k, v in timings.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
