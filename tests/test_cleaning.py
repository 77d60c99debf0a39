from pyspark.sql import functions as F

from elt_gluepipeline_spark.functions.cleaning import (clean_item_name,
                                                       clean_label,
                                                       drop_test_rows,
                                                       extract_size_token,
                                                       first_match_classify)


def _one(spark, col, value="x"):
    return spark.createDataFrame([(value,)], "s string").select(col.alias("out")).collect()[0].out


def test_clean_label_strips_urls_and_truncates(spark):
    val = "  Salads http://spam.example/x `quoted`  "
    assert _one(spark, clean_label(F.col("s")), val) == "Salads  quoted"
    long = "a" * 50
    assert _one(spark, clean_label(F.col("s")), long) == "a" * 30


def test_clean_label_compat_reproduces_b2(spark):
    # double-escaped pattern matches literal '\S', so URLs survive (bug B2)
    val = "Salads http://spam.example/x"
    assert "http" in _one(spark, clean_label(F.col("s"), compat=True), val)


def test_first_match_order_pins_overlap(spark):
    rules = [("bowl|salad", "bowls"), ("salad", "salads")]
    assert _one(spark, first_match_classify(F.col("s"), rules), "Garden Salad") == "bowls"
    reordered = [("salad", "salads"), ("bowl|salad", "bowls")]
    assert _one(spark, first_match_classify(F.col("s"), reordered), "Garden Salad") == "salads"


def test_first_match_default(spark):
    rules = [("bowl", "bowls")]
    assert _one(spark, first_match_classify(F.col("s"), rules), "Pizza") is None
    assert _one(spark, first_match_classify(F.col("s"), rules,
                                            default=F.lower(F.col("s"))), "Pizza") == "pizza"


def test_clean_item_name(spark):
    assert _one(spark, clean_item_name(F.col("s")), "*The  Best-Burger!*") == "best burger"


def test_extract_size_token(spark):
    size, rest = extract_size_token(F.col("s"), r"\((16oz|1/2)\)|\b16oz\b")
    df = spark.createDataFrame([("Cold Brew 16oz",)], "s string") \
              .select(size.alias("size"), rest.alias("rest")).collect()[0]
    assert df.size == "16oz" and df.rest == "Cold Brew"


def test_drop_test_rows(spark):
    df = spark.createDataFrame([("ok", "fine"), ("TEST item", "fine"), (None, "x")],
                               "a string, b string")
    kept = df.filter(drop_test_rows([F.col("a"), F.col("b")]))
    assert sorted(r.b for r in kept.collect()) == ["fine", "x"]


def test_nfc_and_fold_accents(spark):
    from elt_gluepipeline_spark.functions.cleaning import (fold_accents,
                                                           nfc_normalize)
    from pyspark.sql import functions as F
    rows = [(1, "café"),   # cafe + combining acute (NFD)
            (2, "café"),          # café composed (NFC already)
            (3, "plain"), (4, None)]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r.id: (r.n, r.f, r.ln) for r in
           df.select("id", nfc_normalize(F.col("t")).alias("n"),
                     fold_accents(F.col("t")).alias("f"),
                     F.length(nfc_normalize(F.col("t"))).alias("ln"))
             .collect()}
    # both input forms normalize to the SAME composed string...
    assert out[1][0] == out[2][0] == "café"
    assert out[1][2] == 4  # 5 codepoints composed down to 4
    # ...and both fold to the bare ASCII skeleton
    assert out[1][1] == out[2][1] == "cafe"
    assert out[3] == ("plain", "plain", 5)
    assert out[4] == (None, None, None)
