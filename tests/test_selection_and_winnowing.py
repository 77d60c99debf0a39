"""Tests for winnowing fingerprints, DSIR importance weights,
JS-divergence drift, and the decimal-histogram quantile sketch
(queries q177-q180)."""
from __future__ import annotations

import math

import pyspark.sql.functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnowing_guarantees_shared_run_detection(spark):
    from elt_gluepipeline_spark.operators.dedup import winnowing_pairs

    # docs 1/2 share a run of 12 tokens >= w+k-1 = 8 -> MUST pair;
    # docs 3/4 share nothing.
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = [
        (1, "one two " + shared + " tail1 tail2 tail3"),
        (2, "x y z " + shared + " other end tokens here"),
        (3, "completely different words in this document body"),
        (4, "another unrelated set of terms with no overlap at all"),
    ]
    pairs = {(r.id_a, r.id_b): r.shared_fps
             for r in winnowing_pairs(_docs(spark, rows), "doc_id", "text",
                                      k=4, w=5, min_shared=1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert all(p == (1, 2) for p in pairs)


def test_winnowing_df_cap_drops_boilerplate(spark):
    from elt_gluepipeline_spark.operators.dedup import winnowing_pairs

    boiler = "this footer appears on every single page of the site"
    rows = [(i, f"unique{i} body{i} words{i} " + boiler)
            for i in range(1, 8)]
    # cap below the boilerplate df -> no pairs survive
    out = winnowing_pairs(_docs(spark, rows), "doc_id", "text",
                          k=4, w=5, min_shared=1, max_fp_df=3)
    assert out.count() == 0
    # with a generous cap the boilerplate pairs everyone
    out2 = winnowing_pairs(_docs(spark, rows), "doc_id", "text",
                           k=4, w=5, min_shared=1, max_fp_df=100)
    assert out2.count() == 7 * 6 // 2


def test_winnowing_selects_about_one_per_window(spark):
    from elt_gluepipeline_spark.operators.dedup import winnowing_pairs
    # indirect density check: a 100-token doc paired with its clone
    # shares every selected fingerprint; expect ~n/w selections, far
    # fewer than n grams.
    words = " ".join(f"tok{i * 7 % 53}x{i}" for i in range(100))
    rows = [(1, words), (2, words)]
    out = winnowing_pairs(_docs(spark, rows), "doc_id", "text",
                          k=4, w=5, min_shared=1).collect()
    assert len(out) == 1
    shared = out[0].shared_fps
    # 97 grams, window 5: expect roughly 2*97/(5+1) ~ 32 selections
    assert 10 <= shared <= 60


def test_dsir_weights_rank_target_like_docs_higher(spark):
    from elt_gluepipeline_spark.operators.selection import (
        dsir_importance_weights)

    tgt_vocab = "stock market trading finance earnings dividend"
    oth_vocab = "recette cuisine fromage baguette dejeuner vin"
    rows = []
    for i in range(10):
        rows.append((i, tgt_vocab + f" extra{i}", "en"))
    for i in range(10, 20):
        rows.append((i, oth_vocab + f" autre{i}", "fr"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.doc_id: r.log_weight for r in dsir_importance_weights(
        df, "doc_id", "text", F.col("lang") == "en",
        n_buckets=512).collect()}
    assert len(out) == 20
    worst_target = min(out[i] for i in range(10))
    best_other = max(out[i] for i in range(10, 20))
    assert worst_target > best_other
    # sign check on the MEANS: individual docs can lose a hash-
    # collision between their unique token and a hot other-slice
    # word (512 buckets), but the slices must separate around zero
    mean_t = sum(out[i] for i in range(10)) / 10
    mean_o = sum(out[i] for i in range(10, 20)) / 10
    assert mean_t > 0 > mean_o


def test_js_divergence_bounds(spark):
    from elt_gluepipeline_spark.operators.selection import (
        js_divergence_slices)

    # identical unigram distributions -> JS == 0
    same = [(i, "a b c d e", i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(same, "doc_id long, text string, p boolean")
    r = js_divergence_slices(df, "text", F.col("p")).first()
    assert abs(r.js_nats) < 1e-9
    # disjoint vocabularies -> JS == ln 2
    disj = [(1, "a b c", True), (2, "x y z", False)]
    df2 = spark.createDataFrame(disj, "doc_id long, text string, p boolean")
    r2 = js_divergence_slices(df2, "text", F.col("p")).first()
    assert abs(r2.js_nats - math.log(2.0)) < 1e-6
    # one empty slice -> zero rows, not a fabricated scalar
    one = [(1, "a b c", True)]
    df3 = spark.createDataFrame(one, "doc_id long, text string, p boolean")
    assert js_divergence_slices(df3, "text", F.col("p")).count() == 0


def test_quantile_sketch_relative_accuracy(spark):
    from elt_gluepipeline_spark.operators.sketches import (
        decimal_histogram_quantiles)

    rows = [(("g",), float(v)) for v in range(1, 10001)]
    df = spark.createDataFrame([(g[0], v) for g, v in rows],
                               "grp string, val double")
    out = decimal_histogram_quantiles(
        df, ["grp"], "val", quantiles=[0.5, 0.95, 0.99]).first()
    assert out.n == 10000
    # estimate = lower bound of the covering bucket: within 10% below
    for est, exact in [(out.p50, 5000.0), (out.p95, 9500.0),
                       (out.p99, 9900.0)]:
        assert exact * 0.9 <= est <= exact
    assert out.p50 <= out.p95 <= out.p99


def test_quantile_sketch_state_is_bounded(spark):
    from elt_gluepipeline_spark.operators.sketches import (
        decimal_histogram_quantiles)
    # 100k distinct values, but the plan's per-group state is bucket
    # counts: the intermediate histogram must stay tiny.
    df = spark.range(1, 100001).select(
        F.lit("g").alias("grp"), (F.col("id") * 0.37).alias("val"))
    out = decimal_histogram_quantiles(df, ["grp"], "val",
                                      quantiles=[0.5]).collect()
    assert len(out) == 1 and out[0].n == 100000
    exact = 50000 * 0.37
    assert exact * 0.9 <= out[0].p50 <= exact * 1.01


def test_decimal_histogram_merges_by_addition(spark):
    """The sketch property the streaming drain (q182) relies on:
    histograms of disjoint partitions re-aggregate to the histogram
    of the whole — so quantiles extracted from merged state equal the
    batch answer."""
    import pyspark.sql.functions as F
    from elt_gluepipeline_spark.operators.sketches import (
        decimal_histogram, decimal_histogram_quantiles,
        quantiles_from_histogram)

    df = spark.range(1, 5001).select(
        F.lit("g").alias("grp"), (F.col("id") * 1.7).alias("val"))
    h1 = decimal_histogram(df.filter(F.col("val") <= 4000), ["grp"], "val")
    h2 = decimal_histogram(df.filter(F.col("val") > 4000), ["grp"], "val")
    merged = (h1.unionByName(h2)
                .groupBy("grp", "bucket", "lower_cents")
                .agg(F.sum("cnt").alias("cnt")))
    got = quantiles_from_histogram(merged, ["grp"], [0.5, 0.99]).first()
    want = decimal_histogram_quantiles(df, ["grp"], "val",
                                       quantiles=[0.5, 0.99]).first()
    assert got.asDict() == want.asDict()


def test_hard_negative_mine_excludes_clones(spark):
    """Clones (cosine 1.0) must never appear as negatives; the
    returned set is the top-k below the duplicate band, fully filled
    when enough non-dup candidates exist."""
    import pyspark.sql.functions as F
    from elt_gluepipeline_spark.operators.similarity import (
        hard_negative_mine)

    rows = []
    base = [1.0, 0.0, 0.0, 0.0]
    rows.append((0, base))            # query
    rows.append((1, base))            # exact clone -> excluded
    rows.append((2, [0.8, 0.6, 0.0, 0.0]))   # hard negative (cos 0.8)
    rows.append((3, [0.0, 1.0, 0.0, 0.0]))   # easy negative (cos 0.0)
    rows.append((4, [0.5, 0.5, 0.0, 0.0]))   # medium (cos ~0.707)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")
    out = hard_negative_mine(df.filter(F.col("vec_id") == 0), df, k=3,
                             dup_threshold=0.98).collect()
    got = [(r.neighbor_id, r.neg_rank) for r in out]
    assert (1, 1) not in dict((n, r) for n, r in got).items()
    assert all(r.neighbor_id != 1 for r in out)       # clone excluded
    assert [r.neighbor_id for r in out] == [2, 4, 3]  # hardest first
    assert [r.neg_rank for r in out] == [1, 2, 3]
