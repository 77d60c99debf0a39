"""Config-driven rule ingestion (SURVEY.md §7.1 engine/rules.py).

Loaders that flatten the reference's YAML rule formats into the shapes
the engine's classification/quality operators consume:

- mapping-style regex rules (``patterns: {regex: label}`` — reference
  mapping/regex/category_regex_pattern.yml:1-28, compiled at
  go-transform-elt.py:58-73) → ordered ``[(pattern, label)]`` for
  ``functions.cleaning.first_match_classify``. YAML mapping order IS
  the first-match order, exactly like the reference's compiled-list
  loop.
- list-style regex rules (``patterns: [{regex, category}]`` —
  mapping/regex/beverage_regex_patterns.yml:1-12, compiled at
  go-transform-elt.py:75-84) → the same ordered pair list.
- nested threshold dict (``{restaurant: {category: {item: {price:
  {min,max,mean,stddev}, quantity: {...}}}}}`` —
  mapping/dict_restaurant/restaurant_thresholds.yaml:1-60, consumed by
  the flag_row UDF at go-quality-elt.py:141-166) → ONE flattened
  DataFrame (one row per (restaurant, category, item) with typed bound
  columns) for ``operators.quality.severity_from_thresholds``'s
  broadcast join.

Parsing is driver-side (configs are small); everything data-sized
stays in DataFrames. No Python UDFs anywhere downstream: the rule
lists become when()-chains and the threshold table becomes a broadcast
hash join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType)

try:
    import yaml
except ImportError:  # pragma: no cover - baked into this environment
    yaml = None


def _load_yaml(source: str):
    if yaml is None:
        raise ImportError("PyYAML is required for YAML rule ingestion")
    if os.path.exists(source):
        with open(source, encoding="utf-8") as fh:
            return yaml.safe_load(fh)
    return yaml.safe_load(source)


def load_regex_rules(source: str, *, key: str = "patterns",
                     pattern_field: str = "regex",
                     label_field: str = "category") -> list[tuple[str, str]]:
    """YAML → ordered [(pattern, label)] for first_match_classify.

    Accepts a path or a YAML string, in either reference layout:
    a mapping ``{regex: label}`` (category file) or a list of
    ``{regex: ..., category: ...}`` entries (beverage file). Order in
    the file is preserved — it IS the first-match precedence.
    """
    doc = _load_yaml(source)
    rules = doc.get(key, doc) if isinstance(doc, dict) else doc
    if isinstance(rules, dict):
        return [(str(p), str(lbl)) for p, lbl in rules.items()]
    out: list[tuple[str, str]] = []
    for entry in rules or []:
        out.append((str(entry[pattern_field]), str(entry[label_field])))
    return out


def load_size_pattern(source: str) -> str:
    """Size-regex YAML → ONE alternation pattern string for
    ``functions.cleaning.extract_size_token``.

    Reproduces the reference's assembly exactly
    (go-transform-elt.py:86-98): accept ``{pattern: "..."}`` whole, or
    ``{patterns: [...]}`` / ``{size_patterns: [...]}`` joined by plain
    string concatenation (each fragment carries its own trailing
    ``|``). Note the reference's shipped file
    (mapping/regex/size_regex_patterns.yml) concatenates to a pattern
    with a TRAILING ``|`` — an empty alternative that matches the
    empty string, so as-written extraction returns "" for non-size
    names rather than no-match; we preserve that faithfully (the
    loader is layout plumbing, not a linter).
    """
    doc = _load_yaml(source) or {}
    if doc.get("pattern"):
        return str(doc["pattern"])
    parts = doc.get("patterns") or doc.get("size_patterns")
    if parts:
        return "".join(str(p) for p in parts)
    raise ValueError(
        "Size regex missing: expected 'pattern' or 'patterns'/'size_patterns'")


THRESHOLDS_SCHEMA = StructType([
    StructField("restaurant_id", StringType()),
    StructField("item_category", StringType()),
    StructField("item_name", StringType()),
    StructField("price_min", DoubleType()),
    StructField("price_max", DoubleType()),
    StructField("price_mean", DoubleType()),
    StructField("price_stddev", DoubleType()),
    StructField("quantity_min", DoubleType()),
    StructField("quantity_max", DoubleType()),
    StructField("quantity_mean", DoubleType()),
    StructField("quantity_stddev", DoubleType()),
])


def _as_double(v) -> float | None:
    return None if v is None else float(v)


def load_thresholds_df(spark: SparkSession, source: str) -> DataFrame:
    """Nested threshold YAML → flattened rule DataFrame.

    One row per (restaurant_id, item_category, item_name) with nullable
    double bounds — null bounds mean "no rule for this metric", which
    severity_from_thresholds's both-bounds-present check handles
    (matching the reference UDF's skip path,
    go-quality-elt.py:158-163). The output is small (thousands of
    rows) and is meant to be F.broadcast()'d into the fact-side join.
    """
    doc = _load_yaml(source) or {}
    rows = []
    for rid, categories in doc.items():
        for cat, items in (categories or {}).items():
            for item, metrics in (items or {}).items():
                price = (metrics or {}).get("price") or {}
                qty = (metrics or {}).get("quantity") or {}
                rows.append((
                    str(rid), str(cat), str(item),
                    _as_double(price.get("min")), _as_double(price.get("max")),
                    _as_double(price.get("mean")), _as_double(price.get("stddev")),
                    _as_double(qty.get("min")), _as_double(qty.get("max")),
                    _as_double(qty.get("mean")), _as_double(qty.get("stddev")),
                ))
    return spark.createDataFrame(rows, THRESHOLDS_SCHEMA)


def load_quality_rules(source: str) -> dict[str, tuple[tuple[str, str], ...]]:
    """YAML → per-table quality rule lists for the pipeline runner
    (pipeline.PipelineConfig.quality_rules): the config-driven form of
    the reference's rule files (mapping/dict_restaurant YAMLs feeding
    go-quality-elt.py:141-166) for predicate rules.

    Layout::

        lineitem:
          - name: price_nonpos
            expr: l_extendedprice <= 0
          - name: qty_band
            expr: l_quantity IS NULL OR l_quantity >= 48
        orders:
          - name: total_nonpos
            expr: o_totalprice <= 0

    Exprs are Spark SQL boolean expressions compiled with F.expr at
    stage time; order is preserved (violation tags list rule names in
    rule order). Accepts a path or a YAML string.
    """
    data = _load_yaml(source)
    if not isinstance(data, dict):
        raise ValueError("quality rules YAML must map table -> rule list")
    out: dict[str, tuple[tuple[str, str], ...]] = {}
    for table, rules in data.items():
        if not isinstance(rules, list):
            raise ValueError(f"rules for {table!r} must be a list")
        parsed = []
        for r in rules:
            if not isinstance(r, dict) or "name" not in r or "expr" not in r:
                raise ValueError(f"rule entry needs name+expr: {r!r}")
            parsed.append((str(r["name"]), str(r["expr"])))
        names = [n for n, _ in parsed]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate rule names for {table!r}: {names}")
        out[str(table)] = tuple(parsed)
    return out
