"""YAML rule ingestion → classification / severity queries
(SURVEY.md §7.1 engine/rules.py; reference consumes these configs at
go-transform-elt.py:58-99 and go-quality-elt.py:141-166)."""

from pyspark.sql import functions as F

from elt_gluepipeline_spark.functions.cleaning import first_match_classify
from elt_gluepipeline_spark.functions.rules import (load_regex_rules,
                                                    load_thresholds_df)
from elt_gluepipeline_spark.operators.quality import severity_from_thresholds

CATEGORY_YAML = """
patterns:
  "(?i)brk[\\\\s_-]*fst": "breakfast"
  "(?i)flat[\\\\s_-]*bread": "flatbreads"
  "(?i)bread": "bakery"
"""

BEVERAGE_YAML = """
patterns:
  - regex: "(fizz|spark)"
    category: "sodas"
  - regex: "\\\\b(aqua|still)\\\\b"
    category: "water"
"""

THRESHOLDS_YAML = """
r1:
  bakery:
    sourdough loaf:
      price: {min: 4, max: 9, mean: 6.5, stddev: 1.2}
      quantity: {min: 1, max: 3, mean: 1.4, stddev: 0.5}
  sodas:
    ginger fizz:
      price: {min: 2, max: 3, mean: 2.4, stddev: null}
      quantity: {min: 1, max: 2, mean: 1.1, stddev: null}
r2:
  bakery:
    rye loaf:
      price: {min: 5, max: 8, mean: 6.0, stddev: 0}
      quantity: {min: 1, max: 4, mean: 2.0, stddev: 0}
"""


def test_mapping_layout_preserves_first_match_order():
    rules = load_regex_rules(CATEGORY_YAML)
    assert rules[0] == ("(?i)brk[\\s_-]*fst", "breakfast")
    # "flatbread" must hit the flatbreads rule BEFORE the broader
    # bread rule — order in the file is the precedence
    assert [lbl for _, lbl in rules] == ["breakfast", "flatbreads", "bakery"]


def test_list_layout_loads_pairs():
    rules = load_regex_rules(BEVERAGE_YAML)
    assert rules == [("(fizz|spark)", "sodas"), ("\\b(aqua|still)\\b", "water")]


def test_yaml_rules_drive_q11_shaped_classification(spark):
    # q11's shape: first-match regex classification with fallthrough,
    # driven entirely from the YAML fixture
    rules = load_regex_rules(CATEGORY_YAML)
    df = spark.createDataFrame(
        [("Brk Fst Platter",), ("Stone FLATBREAD",), ("banana bread",),
         ("coffee",)], "raw string")
    got = dict(df.withColumn(
        "cat", first_match_classify(F.col("raw"), rules,
                                    default=F.lower(F.col("raw"))))
        .collect())
    assert got == {"Brk Fst Platter": "breakfast",
                   "Stone FLATBREAD": "flatbreads",
                   "banana bread": "bakery",
                   "coffee": "coffee"}  # fallthrough = lowercased input


def test_yaml_beverage_rules_null_default(spark):
    rules = load_regex_rules(BEVERAGE_YAML)
    df = spark.createDataFrame([("ginger fizz",), ("espresso",)], "raw string")
    got = dict(df.withColumn(
        "cat", first_match_classify(F.col("raw"), rules)).collect())
    assert got == {"ginger fizz": "sodas", "espresso": None}


def test_thresholds_flatten(spark):
    t = load_thresholds_df(spark, THRESHOLDS_YAML)
    rows = {(r.restaurant_id, r.item_category, r.item_name): r
            for r in t.collect()}
    assert set(rows) == {("r1", "bakery", "sourdough loaf"),
                         ("r1", "sodas", "ginger fizz"),
                         ("r2", "bakery", "rye loaf")}
    soda = rows[("r1", "sodas", "ginger fizz")]
    assert soda.price_min == 2.0 and soda.price_max == 3.0
    assert soda.price_stddev is None  # YAML null → typed null


def test_yaml_thresholds_drive_q32_shaped_severity(spark):
    # q32's shape: broadcast-join the flattened YAML table, count
    # violated metrics → severity none/low/high
    t = load_thresholds_df(spark, THRESHOLDS_YAML).select(
        "restaurant_id", "item_category", "item_name",
        "price_min", "price_max", "quantity_min", "quantity_max")
    facts = spark.createDataFrame(
        [("r1", "bakery", "sourdough loaf", 6.0, 2),    # in-bounds
         ("r1", "bakery", "sourdough loaf", 20.0, 2),   # price out → low
         ("r1", "sodas", "ginger fizz", 9.0, 9),        # both out → high
         ("r3", "bakery", "sourdough loaf", 999.0, 99)],  # no rule → none
        "restaurant_id string, item_category string, item_name string, "
        "price double, qty int")
    out = severity_from_thresholds(
        facts, t, ["restaurant_id", "item_category", "item_name"],
        [("price", "price_min", "price_max"),
         ("qty", "quantity_min", "quantity_max")])
    got = sorted((r.price, r.severity, r.flagged) for r in out.collect())
    assert got == [(6.0, "none", False), (9.0, "high", True),
                   (20.0, "low", True), (999.0, "none", False)]


def test_load_quality_rules_yaml_drives_pipeline(spark, sf_dir, tmp_path):
    from elt_gluepipeline_spark.functions.rules import load_quality_rules
    from elt_gluepipeline_spark.pipeline import PipelineConfig, run_pipeline

    yml = tmp_path / "rules.yml"
    yml.write_text(
        "lineitem:\n"
        "  - name: price_nonpos\n"
        "    expr: l_extendedprice <= 0\n"
        "  - name: qty_band\n"
        "    expr: l_quantity IS NULL OR l_quantity >= 48\n")
    rules = load_quality_rules(str(yml))
    assert rules == {"lineitem": (
        ("price_nonpos", "l_extendedprice <= 0"),
        ("qty_band", "l_quantity IS NULL OR l_quantity >= 48"))}

    cfg = PipelineConfig(source_dir=sf_dir,
                         warehouse=str(tmp_path / "wh"),
                         quality_rules=rules, metric_queries=())
    res = run_pipeline(spark, cfg,
                       stages=("ingest", "transform", "quality"),
                       run_id="y1")
    n_clean, n_bad = res["quality"]["lineitem"]
    assert n_bad > 0 and n_clean + n_bad == res["ingest"]["lineitem"]


def test_load_quality_rules_rejects_malformed():
    import pytest

    from elt_gluepipeline_spark.functions.rules import load_quality_rules

    with pytest.raises(ValueError):
        load_quality_rules("- just\n- a list\n")
    with pytest.raises(ValueError):
        load_quality_rules("t:\n  - name: a\n")           # missing expr
    with pytest.raises(ValueError):
        load_quality_rules(
            "t:\n  - {name: a, expr: x > 0}\n  - {name: a, expr: y > 0}\n")
