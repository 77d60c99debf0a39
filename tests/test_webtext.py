"""Web-text curation operators (operators/webtext.py): HTML strip
edge cases, per-domain cap determinism, Gopher rule-mask semantics,
and the q149 leakage-safety property (a near-dup component never
straddles the train/test boundary)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from elt_gluepipeline_spark.operators.webtext import (cap_per_domain,
                                                      domain_of,
                                                      gopher_flags,
                                                      html_extract,
                                                      strip_html)


def _strip_one(spark, html: str) -> str:
    row = (spark.range(1).select(strip_html(F.lit(html)).alias("t"))
           .collect()[0])
    return row["t"]


def test_strip_html_drops_script_and_style_content(spark):
    html = ('<body><script>\nvar hidden = "<p>not text</p>";\n</script>'
            '<style>.x{a:1}</style><p>kept text</p></body>')
    assert _strip_one(spark, html) == "kept text"


def test_strip_html_multiline_comment_and_attrs(spark):
    html = ('<!-- multi\nline\ncomment --><div class="a" data-x=\'1\'>a'
            '</div>\n\n<span>b</span>')
    assert _strip_one(spark, html) == "a b"


def test_strip_html_tag_only_input_is_empty(spark):
    assert _strip_one(spark, "<html><head></head><body></body></html>") == ""


def test_strip_html_plain_text_passthrough(spark):
    assert _strip_one(spark, "  no markup   here ") == "no markup here"


def test_html_extract_stats(spark):
    df = spark.createDataFrame([(1, "<p>abcd</p>")], "id long, html string")
    out = html_extract(df, "html").collect()[0]
    assert out["clean_text"] == "abcd"
    assert out["n_raw"] == len("<p>abcd</p>")
    assert out["n_text"] == 4
    assert out["text_density"] == pytest.approx(4 / 11)


def test_domain_of(spark):
    got = (spark.range(1)
           .select(domain_of(F.lit("https://a.example.org/x/y?q=1"))
                   .alias("d")).collect()[0]["d"])
    assert got == "a.example.org"


def _domain_df(spark, n_partitions: int):
    rows = [(i, f"d{i % 3}") for i in range(30)]
    return (spark.createDataFrame(rows, "doc_id long, domain string")
            .repartition(n_partitions))


def test_cap_per_domain_cap_and_counts(spark):
    out = cap_per_domain(_domain_df(spark, 4), "domain", "doc_id", k=4)
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["domain"], []).append(r)
        assert r["n_domain_docs"] == 10
        assert 1 <= r["rk"] <= 4
    assert all(len(v) == 4 for v in per.values())


def test_cap_per_domain_partitioning_invariant(spark):
    a = {(r["doc_id"], r["rk"])
         for r in cap_per_domain(_domain_df(spark, 1), "domain",
                                 "doc_id", k=4).collect()}
    b = {(r["doc_id"], r["rk"])
         for r in cap_per_domain(_domain_df(spark, 7), "domain",
                                 "doc_id", k=4).collect()}
    assert a == b


def _flags_one(spark, text: str):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    return gopher_flags(df, "text").collect()[0]


def test_gopher_keep_good_doc(spark):
    good = "the quick brown fox jumps over a lazy dog near the old barn " \
           "and walks to a quiet river bend today"
    r = _flags_one(spark, good)
    assert r["rule_mask"] == 0 and r["keep"]


def test_gopher_short_doc_sets_word_bit(spark):
    r = _flags_one(spark, "too short")
    assert r["rule_mask"] & 1
    assert not r["keep"]


def test_gopher_no_stopwords_sets_bit4(spark):
    text = " ".join(f"w{i}" for i in range(20))
    r = _flags_one(spark, text)
    assert r["rule_mask"] & 4
    assert not (r["rule_mask"] & 8)  # all tokens distinct


def test_gopher_repetition_sets_uniq_bit(spark):
    text = " ".join(["the spam"] * 20)  # 40 words, 2 distinct
    r = _flags_one(spark, text)
    assert r["rule_mask"] & 8
    assert r["uniq_ratio"] == pytest.approx(2 / 40)


def test_gopher_empty_text(spark):
    r = _flags_one(spark, "   ")
    assert r["n_words"] == 0
    assert r["rule_mask"] & 1 and not r["keep"]


def test_component_split_is_leakage_safe(spark, sf_dir):
    from elt_gluepipeline_spark.plans.training import q149_component_split
    rows = q149_component_split(spark, sf_dir).collect()
    assert rows
    split_of = {}
    for r in rows:
        split_of.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in split_of.values())
