"""Deterministic sampling/splitting + decontamination + repetition
stats — the curation operators a training corpus needs to be stable
and leak-free across reruns."""

from pyspark.sql import functions as F

from elt_gluepipeline_spark.operators.dedup import cross_corpus_containment
from elt_gluepipeline_spark.operators.sampling import (assign_split,
                                                       deterministic_sample,
                                                       stratified_sample)
from elt_gluepipeline_spark.operators.textstats import line_repetition


def _docs(spark, n=1000):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_split_deterministic_and_stable_under_growth(spark):
    small = assign_split(_docs(spark, 500), "doc_id")
    big = assign_split(_docs(spark, 1000), "doc_id")
    small_map = dict(small.collect())
    big_map = dict(big.collect())
    # growing the corpus never moves an existing key across the split
    assert all(big_map[k] == v for k, v in small_map.items())
    # split rate lands near 10% (hash uniformity, loose band)
    frac = sum(v == "test" for v in big_map.values()) / len(big_map)
    assert 0.05 < frac < 0.16


def test_split_disjoint_and_total(spark):
    out = assign_split(_docs(spark), "doc_id")
    assert out.filter(~F.col("split").isin("train", "test")).count() == 0
    assert out.count() == 1000


def test_deterministic_sample_is_subset_property(spark):
    s10 = {r.doc_id for r in
           deterministic_sample(_docs(spark), "doc_id", permille=100).collect()}
    s20 = {r.doc_id for r in
           deterministic_sample(_docs(spark), "doc_id", permille=200).collect()}
    assert s10 <= s20  # raising the rate only ADDS members


def test_stratified_sample_first_match_rates(spark):
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 1000, "en").otherwise("yo").alias("lang"))
    kept = stratified_sample(
        df, "doc_id",
        [(F.col("lang") == "yo", 1000),   # keep ALL rare-language docs
         (F.col("lang") == "en", 100)])   # ~10% of english
    counts = {r.lang: r.n for r in
              kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["yo"] == 1000
    assert 50 < counts.get("en", 0) < 160


def test_containment_catches_swallowed_benchmark(spark):
    # corpus doc 1 contains the whole bench doc verbatim inside longer
    # text: Jaccard is low but containment is 1.0 — the leak signal
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over dogs")],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, "padding words here " +
             "the quick brown fox jumps over dogs" +
             " and then a very long tail of unrelated filler text "
             "continues for a while with many extra tokens"),
         (2, "completely different content about ships and harbors")],
        "doc_id long, text string")
    out = cross_corpus_containment(corpus, bench, k=3, threshold=0.9)
    rows = [(r.corpus_id, r.bench_id, r.containment) for r in out.collect()]
    assert len(rows) == 1 and rows[0][:2] == (1, 100) and rows[0][2] == 1.0


def test_containment_hot_shingle_guard(spark):
    bench = spark.createDataFrame([(9, "alpha beta gamma")],
                                  "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(5)],
        "doc_id long, text string")
    exact = cross_corpus_containment(corpus, bench, k=3, threshold=0.5)
    assert exact.count() == 5
    # dropping shingles shared by >3 corpus docs removes those pairs
    guarded = cross_corpus_containment(corpus, bench, k=3, threshold=0.5,
                                       max_shingle_df=3)
    assert guarded.count() == 0


def test_line_repetition(spark):
    df = spark.createDataFrame(
        [(1, "buy now\nbuy now\nbuy now\nbuy now"),
         (2, "alpha\nbeta\ngamma"),
         (3, "   \n  \n")],
        "doc_id long, text string")
    got = {r.doc_id: round(r.rep, 4) for r in
           df.select("doc_id",
                     line_repetition(F.col("text")).alias("rep")).collect()}
    assert got[1] == 0.75   # 4 lines, 1 distinct
    assert got[2] == 0.0
    assert got[3] == 0.0    # blank-only doc
