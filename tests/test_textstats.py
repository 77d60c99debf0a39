from pyspark.sql import functions as F

from elt_gluepipeline_spark.operators.textstats import (bpe_ish_tokens,
                                                        fingerprint_md5,
                                                        fingerprint_rolling,
                                                        langid_en_heuristic,
                                                        n_tokens,
                                                        quality_score,
                                                        stopword_ratio)


def _one(spark, col, value):
    return (spark.createDataFrame([(value,)], "text string")
                 .select(col.alias("out")).collect()[0].out)


def test_n_tokens(spark):
    assert _one(spark, n_tokens(F.col("text")), "a  b\tc") == 3
    assert _one(spark, n_tokens(F.col("text")), "   ") == 0


def test_stopword_ratio(spark):
    assert _one(spark, stopword_ratio(F.col("text")), "the cat") == 0.5
    assert _one(spark, stopword_ratio(F.col("text")), "cat dog") == 0.0


def test_quality_score_bounds(spark):
    for text in ["the the the the the the the the the the",
                 "diverse words make this document quite unique overall today friend"]:
        v = _one(spark, quality_score(F.col("text")), text)
        assert 0.0 <= v <= 1.0


def test_langid(spark):
    en = "the cat sat on the mat and it was happy for a while"
    other = "gato perro casa arbol cielo mar tierra fuego agua viento"
    assert _one(spark, langid_en_heuristic(F.col("text")), en) == "en"
    assert _one(spark, langid_en_heuristic(F.col("text")), other) == "other"


def test_fingerprint_md5_normalizes_whitespace(spark):
    a = _one(spark, fingerprint_md5(F.col("text")), "Hello   World")
    b = _one(spark, fingerprint_md5(F.col("text")), "  hello world ")
    assert a == b


def test_fingerprint_rolling_order_sensitive(spark):
    a = _one(spark, fingerprint_rolling(F.col("text")), "a b c")
    b = _one(spark, fingerprint_rolling(F.col("text")), "c b a")
    assert a != b
    assert a == _one(spark, fingerprint_rolling(F.col("text")), "a b c")


def test_bpe_ish_tokens(spark):
    toks = _one(spark, bpe_ish_tokens(F.col("text")), "don't stop, now!")
    assert "don" in toks and "stop" in toks


def test_bpe_ish_tokens_matches_re2_extraction(spark):
    """The Java lookaround split and the RE2 'word runs + punct runs'
    extraction (used by the DuckDB oracle) must agree on hostile input."""
    import duckdb
    cases = ["hello, world!", "a!b?c", " !a", "!? ", "a ! ! b", "",
             "  spaced   out  ", "under_score-y 3.14 (x)", "...", "a..b..c"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "i long, text string")
    spark_counts = {r.i: r.n for r in df.select(
        "i", F.size(bpe_ish_tokens(F.col("text"))).alias("n")).collect()}
    con = duckdb.connect()
    for i, c in enumerate(cases):
        want = con.sql(
            r"SELECT len(regexp_extract_all(?, '\w+|[^\w\s]'))",
            params=[c]).fetchone()[0]
        assert spark_counts[i] == want, (c, spark_counts[i], want)
