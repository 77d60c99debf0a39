"""Rule loaders driven by the REFERENCE'S OWN config files — not
fixtures. Proves the flatteners at real size and nesting:

- mapping/regex/category_regex_pattern.yml (28 ordered mapping-style
  rules, consumed at go-transform-elt.py:69-73 / applied :115-123)
  → first_match_classify with the file's first-match precedence;
- mapping/regex/beverage_regex_patterns.yml (list-style, :75-84)
  → NULL-default beverage classification;
- mapping/regex/size_regex_patterns.yml (fragment list joined by
  concatenation, :86-98) → one alternation pattern;
- mapping/dict_restaurant/restaurant_thresholds.yaml (13,551 lines,
  25 restaurants, consumed by the flag_row UDF at
  go-quality-elt.py:141-166) → flattened threshold table powering the
  q32-shaped broadcast-join severity scorer.

Row-count ground truth for the threshold file comes from a TEXTUAL
scan of the YAML (every item owns exactly one 6-space-indented
``price:`` block), independent of the YAML parser the loader uses.
"""

import os
import re

import pytest
from pyspark.sql import functions as F

from elt_gluepipeline_spark.functions.cleaning import first_match_classify
from elt_gluepipeline_spark.functions.rules import (load_regex_rules,
                                                    load_size_pattern,
                                                    load_thresholds_df)
from elt_gluepipeline_spark.operators.quality import severity_from_thresholds

REF = "/root/reference/mapping"
CATEGORY = f"{REF}/regex/category_regex_pattern.yml"
BEVERAGE = f"{REF}/regex/beverage_regex_patterns.yml"
SIZE = f"{REF}/regex/size_regex_patterns.yml"
THRESHOLDS = f"{REF}/dict_restaurant/restaurant_thresholds.yaml"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mapping files not present")


@needs_ref
def test_category_rules_real_file_first_match_order(spark):
    rules = load_regex_rules(CATEGORY)
    assert len(rules) == 28
    # mapping order IS precedence: the file lists espresso before its
    # more specific hot/iced variants, so those later rules are
    # shadowed — "iced espresso" must resolve via the FIRST match.
    pats = [p for p, _ in rules]
    assert pats.index("(?i)espresso") < pats.index("(?i)iced[\\s_-]*espresso")

    df = spark.createDataFrame(
        [("Break_Fast Menu",), ("Cold Brew",), ("Iced Espresso",),
         ("BBQ Chips",), ("sqalads",), ("Kid's",), ("mystery meat",)],
        "label string")
    # category semantics: fall through to the lowered label (:120-123)
    out = df.withColumn(
        "cat", first_match_classify(F.col("label"), rules,
                                    default=F.lower(F.col("label"))))
    got = {r.label: r.cat for r in out.collect()}
    assert got["Break_Fast Menu"] == "breakfast"
    assert got["Cold Brew"] == "coffee"
    assert got["Iced Espresso"] == "specialty coffee"   # first match wins
    assert got["BBQ Chips"] == "snacks"
    assert got["sqalads"] == "salads"
    assert got["Kid's"] == "kids"
    assert got["mystery meat"] == "mystery meat"        # fallthrough


@needs_ref
def test_beverage_rules_real_file_null_default(spark):
    rules = load_regex_rules(BEVERAGE)
    assert len(rules) == 4
    df = spark.createDataFrame(
        [("Java Monster Loca Moca",), ("Diet Coke 12oz",), ("Dasani",),
         ("Hibiscus Ginger Lime Kombucha",), ("espresso",)],
        "name string")
    out = df.withColumn("bev", first_match_classify(F.col("name"), rules))
    got = {r.name: r.bev for r in out.collect()}
    assert got["Java Monster Loca Moca"] == "energy drinks"
    assert got["Diet Coke 12oz"] == "sodas"
    assert got["Dasani"] == "water"
    assert got["Hibiscus Ginger Lime Kombucha"] == \
        "juices & kombuchas drinks"
    assert got["espresso"] is None                      # not a beverage


@needs_ref
def test_size_pattern_real_file_join_semantics(spark):
    import yaml

    pat = load_size_pattern(SIZE)
    with open(SIZE, encoding="utf-8") as fh:
        raw_parts = yaml.safe_load(fh)["patterns"]
    assert pat == "".join(raw_parts)        # reference's exact assembly
    # the assembled pattern must be a valid Java regex (regexp_extract
    # compiles it JVM-side). As-written it is buggy upstream: the
    # concatenation yields `(alts)\b\d+\s?oz\b|` — the stray suffix
    # plus the trailing empty alternative make EVERY name "match" the
    # empty string, so extraction returns "" even for size-bearing
    # names. The loader reproduces the assembly faithfully (it is
    # layout plumbing, not a linter) and this pins that behavior in
    # BOTH regex engines (Python here mirrors the reference UDF).
    df = spark.createDataFrame([("Latte (12 oz)",), ("House Salad",)],
                               "name string")
    got = {r.name: r.tok for r in df.select(
        "name",
        F.regexp_extract(F.lower(F.col("name")), pat, 0).alias("tok")
    ).collect()}
    assert got["Latte (12 oz)"] == "" and got["House Salad"] == ""
    # the individual fragments are sound: the first alternative alone
    # (minus its joining '|') extracts the size token — what the file
    # INTENDED, and what extract_size_token consumes downstream.
    # (drop the joining '|' AND the group-opening paren the file only
    # closes in its last fragment)
    sane = raw_parts[0].rstrip("|").lstrip("(")
    got_sane = df.select(F.regexp_extract(
        F.lower(F.col("name")), sane, 0).alias("tok")).collect()
    assert got_sane[0].tok == "(12 oz)" and got_sane[1].tok == ""

    # the {pattern: "..."} whole-string layout (go-transform-elt.py:89)
    assert load_size_pattern("pattern: 'abc|def'") == "abc|def"
    with pytest.raises(ValueError):
        load_size_pattern("unrelated: 1")


@needs_ref
def test_thresholds_real_file_flattens_fully(spark):
    with open(THRESHOLDS, encoding="utf-8") as fh:
        text = fh.read()
    # every item owns one price block: either a plain nested key
    # (6-space "price:") or the file's ONE explicit-key item (": price:"
    # — a YAML `? key` whose item name embeds a newline)
    n_items = (len(re.findall(r"^ {6}price:$", text, flags=re.M))
               + len(re.findall(r"^ {4}: price:$", text, flags=re.M)))
    assert n_items > 1000                    # real size, not a fixture

    thr = load_thresholds_df(spark, THRESHOLDS)
    assert thr.count() == n_items            # one row per item, none lost
    assert thr.select("restaurant_id").distinct().count() == 25
    # keys are unique — the broadcast join can't fan out fact rows
    assert thr.select("restaurant_id", "item_category",
                      "item_name").distinct().count() == n_items
    # stddev: null entries survive as typed NULL doubles
    assert thr.filter(F.col("price_stddev").isNull()).count() > 0
    assert dict(thr.dtypes)["price_min"] == "double"
    # the explicit-key item (name embeds a newline) survives verbatim
    assert thr.filter(
        F.col("item_name") == "mandarin cardamom\njuice").count() == 1


@needs_ref
def test_q32_shaped_severity_from_real_thresholds(spark):
    """go-quality-elt.py:144-166 end-to-end off the real file: craft
    fact rows around one real rule's bounds and score them."""
    thr = load_thresholds_df(spark, THRESHOLDS)
    rule = (thr.filter(F.col("price_min").isNotNull()
                       & F.col("price_max").isNotNull()
                       & F.col("quantity_min").isNotNull()
                       & F.col("quantity_max").isNotNull())
               .orderBy("restaurant_id", "item_category", "item_name")
               .first())
    keys = (rule.restaurant_id, rule.item_category, rule.item_name)
    fact = spark.createDataFrame(
        [(*keys, rule.price_min, rule.quantity_min, "in_band"),
         (*keys, rule.price_max + 1000.0, rule.quantity_min, "price_out"),
         (*keys, rule.price_max + 1000.0, rule.quantity_max + 1000.0,
          "both_out"),
         (rule.restaurant_id, rule.item_category, "no-such-item",
          1e9, 1e9, "unknown_item")],
        "restaurant_id string, item_category string, item_name string, "
        "price double, quantity double, tag string")
    out = severity_from_thresholds(
        fact, thr, ["restaurant_id", "item_category", "item_name"],
        [("price", "price_min", "price_max"),
         ("quantity", "quantity_min", "quantity_max")])
    got = {r.tag: r.severity for r in out.collect()}
    assert got == {"in_band": "none", "price_out": "low",
                   "both_out": "high", "unknown_item": "none"}
