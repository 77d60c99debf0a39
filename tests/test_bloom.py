"""Portable Bloom filter (operators.bloom): structural no-false-
negative, deterministic false positives, duplicate-key probes, and
the broadcast plan shape."""

import pytest
from pyspark.sql import functions as F

from elt_gluepipeline_spark.operators.bloom import bloom_apply, bloom_fit


@pytest.fixture()
def keysets(spark):
    members = spark.createDataFrame(
        [(f"key{i}",) for i in range(300)], "k string")
    probes = spark.createDataFrame(
        [(f"key{i}",) for i in range(400)]      # 300 members + 100 not
        + [("key7",), ("key7",)],               # duplicates
        "k string")
    return members, probes


def test_bloom_no_false_negatives_and_dup_probes(spark, keysets):
    members, probes = keysets
    bloom = bloom_fit(members, "k", m_bits=1 << 12, k=4)
    out = bloom_apply(probes, "k", bloom, m_bits=1 << 12, k=4)
    rows = out.collect()
    # structural: every true member (incl. the duplicated key7 rows)
    # must hit — a miss here is the one error class a Bloom can't have
    for r in rows:
        if int(r.k[3:]) < 300:
            assert r.bloom_hit, f"false negative on {r.k}"
    # duplicate probe rows each come back, flagged identically
    assert sum(1 for r in rows if r.k == "key7") == 3
    assert all(r.bloom_hit for r in rows if r.k == "key7")


def test_bloom_false_positive_rate_bounded_and_deterministic(spark, keysets):
    members, _ = keysets
    bloom = bloom_fit(members, "k", m_bits=1 << 12, k=4)
    strangers = spark.createDataFrame(
        [(f"other{i}",) for i in range(2000)], "k string")
    out = bloom_apply(strangers, "k", bloom, m_bits=1 << 12, k=4)
    fp1 = {r.k for r in out.collect() if r.bloom_hit}
    # load 300*4/4096 ≈ 0.29 → fp ≈ (1-e^-0.29)^4 ≈ 0.4%; allow 5×
    assert len(fp1) < 0.02 * 2000
    # determinism: same inputs → the same false-positive SET
    out2 = bloom_apply(strangers, "k", bloom, m_bits=1 << 12, k=4)
    fp2 = {r.k for r in out2.collect() if r.bloom_hit}
    assert fp1 == fp2


def test_bloom_filter_is_broadcast_side(spark, keysets):
    members, probes = keysets
    bloom = bloom_fit(members, "k", m_bits=1 << 12, k=4)
    out = bloom_apply(probes, "k", bloom, m_bits=1 << 12, k=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan        # filter words broadcast
    # filter size bounded by m_bits/32 words regardless of corpus
    assert bloom.count() <= (1 << 12) // 32
